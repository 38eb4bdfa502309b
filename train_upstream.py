"""Upstream SSL pretraining CLI.

Preserves the reference CLI semantics (train_upstream.py:68-80):

    python train_upstream.py --upstream delores_m --input pre_train.csv [-c config.yaml]
                             [--load_checkpoint DIR] [--max_steps N]

but launches a single-process mesh-parallel JAX run instead of Lightning DDP.
"""
from __future__ import annotations

import argparse
import logging


def get_args():
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--input", type=str, required=True, help="pretraining manifest CSV (column `files`[, `label`])")
    parser.add_argument("--load_checkpoint", type=str, default=None, help="checkpoint dir to resume from")
    parser.add_argument("-c", "--config", metavar="CONFIG_PATH", default=None, help="experiment YAML (defaults to configs/<upstream>.yaml)")
    parser.add_argument("--upstream", type=str, default="delores_m", help="upstream objective name")
    parser.add_argument("--max_steps", type=int, default=None, help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--epochs", type=int, default=None, help="override config run.epochs")
    parser.add_argument("--batch_size", type=int, default=None, help="override config run.batch_size")
    parser.add_argument("--save_path", type=str, default=None, help="override config run.save_path")
    parser.add_argument("--profile", type=str, default=None, help="capture a jax.profiler trace to this dir")
    return parser.parse_args()


def main(args):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    from audiossl_tpu.config import load_config
    from audiossl_tpu.parallel.launch import maybe_init_distributed, setup_compilation_cache

    maybe_init_distributed()

    config = load_config(args.config, args.upstream)
    setup_compilation_cache(config.get("run"))
    if args.epochs is not None:
        config["run"]["epochs"] = args.epochs
    if args.batch_size is not None:
        config["run"]["batch_size"] = args.batch_size
    if args.save_path is not None:
        config["run"]["save_path"] = args.save_path
    print(config)
    import contextlib

    if args.profile:
        from audiossl_tpu.utils.profiling import trace

        profile_cm = trace(args.profile)
    else:
        profile_cm = contextlib.nullcontext()
    with profile_cm:
        run_training(args, config)


def run_training(args, config):
    if args.upstream == "decar_v2":
        # DECAR has its own trainer (per-epoch distributed k-means phase),
        # like the reference's standalone extras/decar-v2 codebase.
        from audiossl_tpu.train.decar_loop import train_decar

        state, ckpt_dir = train_decar(
            config, args.input, load_checkpoint=args.load_checkpoint, max_steps=args.max_steps
        )
    elif args.upstream == "decar_v1":
        # DeepCluster-v1 epoch mode: faiss-style k-means pseudo-labels +
        # UnifLabelSampler + per-epoch top-layer reset
        from audiossl_tpu.train.deepcluster_loop import train_deepcluster_v1

        state, ckpt_dir = train_deepcluster_v1(
            config, args.input, load_checkpoint=args.load_checkpoint, max_steps=args.max_steps
        )
    else:
        from audiossl_tpu.train.loop import train_upstream

        state, ckpt_dir = train_upstream(
            config, args.input, args.upstream, load_checkpoint=args.load_checkpoint, max_steps=args.max_steps
        )
    print(f"checkpoints written to {ckpt_dir} (final step {int(state.step)})")


if __name__ == "__main__":
    main(get_args())
