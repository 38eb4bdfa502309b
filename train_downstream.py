"""Downstream linear-probe / finetune CLI.

Preserves the reference CLI semantics (train_downstream.py:186-201):

    python train_downstream.py --task speech_commands_v2 \
        --train_csv t.csv --test_csv e.csv [--valid_csv v.csv] \
        --checkpoint <upstream ckpt dir> [--freeze] [-c downstream.yaml]

One process drives the whole device mesh (no torch.multiprocessing.spawn).
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_args():
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--task", type=str, default="test_task")
    parser.add_argument("--train_csv", type=str, default=None, help="CSV with columns wav,label")
    parser.add_argument("--valid_csv", type=str, default=None)
    parser.add_argument("--test_csv", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None, help="upstream checkpoint dir")
    parser.add_argument("--encoder", type=str, default="AudioNTT2020Task6")
    parser.add_argument("--freeze", action="store_true", help="freeze the encoder (linear probe)")
    parser.add_argument("--exp_dir", default="./exp", type=Path, help="experiment root directory")
    parser.add_argument("--data_root", type=str, default=None, help="LAPE task data root (AUDIOSSL_DATA_ROOT)")
    parser.add_argument("--upstream", type=str, default="delores_m")
    parser.add_argument("-c", "--config", metavar="CONFIG_PATH", default=None)
    parser.add_argument("--epochs", type=int, default=None, help="override config run.epochs")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    return parser.parse_args()


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    import os

    from audiossl_tpu.config import CONFIG_DIR, load_config
    from audiossl_tpu.downstream.probe import run_downstream
    from audiossl_tpu.parallel.launch import setup_compilation_cache

    config = load_config(args.config or os.path.join(CONFIG_DIR, "downstream.yaml"))
    setup_compilation_cache(config.get("run"))
    if args.encoder is not None:
        config["downstream"]["base_encoder"]["type"] = args.encoder
    if args.epochs is not None:
        config["run"]["epochs"] = args.epochs
    if args.batch_size is not None:
        config["run"]["batch_size"] = args.batch_size
    if args.lr is not None:
        config["run"]["lr"] = args.lr
    print(config)
    result = run_downstream(config, vars(args))
    print(f"max test accuracy : {result['best_test_acc']}")


if __name__ == "__main__":
    main()
