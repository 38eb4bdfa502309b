"""Supervised MAST fine-tuning: multi-label BCE on AudioSet-style data.

Completes the extras/mast_new story: the AudiosetDataset input pipeline we
already carry for SS-MAST (waveform mixup -> Kaldi fbank -> SpecMask ->
(x - mean)/(2 std) -> noise, dataloader.py:98-212) feeding a supervised
MViT classifier — λ-weighted multi-hot labels under mixup
(dataloader.py:148-160), LayerNorm+Linear head (src/encoder/mast.py:93),
BCEWithLogits loss (mvit/models/losses.py:38 'bce_logit'), AdamW with
per-layer LR decay / no-decay groups / grad clipping
(mvit/models/optimizer.py via train/layer_decay.py), and per-epoch
mAP / AUC / d-prime (utilities/stats.py:11-60).

TPU shape: the whole per-step pipeline (mixup incl. label mixing, fbank,
masking, norm, fwd+bwd, optimizer) is one jitted shard_map program over the
data mesh; evaluation reuses the mesh.
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.data.multilabel import multilabel_loader
from audiossl_tpu.frontend.fbank import FbankConfig, kaldi_fbank, pad_or_trim_frames
from audiossl_tpu.models.mast import MASTEncoder
from audiossl_tpu.ops.masking import spec_mask_batch
from audiossl_tpu.ops.stats import precomputed_norm
from audiossl_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from audiossl_tpu.train import checkpoint as ckptmod
from audiossl_tpu.train.accum import microbatched_value_and_grad
from audiossl_tpu.train.layer_decay import adamw_layer_decay
from audiossl_tpu.utils.metrics import auc_roc, d_prime, mean_average_precision

log = logging.getLogger("audiossl_tpu.finetune_mast")

MVIT_DEPTH = {"tiny": 10, "small": 16, "base": 24}


class MASTClassifier(nn.Module):
    """MAST trunk + the reference's mlp_head: LayerNorm -> Linear
    (src/encoder/mast.py:93)."""

    num_classes: int
    input_fdim: int = 128
    input_tdim: int = 1024
    model_size: str = "base"
    remat: bool = False
    droppath_rate: float | None = None  # None = variant default
    compute_dtype: jnp.dtype | None = jnp.bfloat16  # None = exact f32 trunk

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        z = MASTEncoder(
            input_fdim=self.input_fdim, input_tdim=self.input_tdim,
            model_size=self.model_size, remat=self.remat,
            droppath_rate=self.droppath_rate, compute_dtype=self.compute_dtype,
            name="mast",
        )(x, train)
        z = nn.LayerNorm(epsilon=1e-5, name="head_norm", dtype=jnp.float32)(z)
        return nn.Dense(self.num_classes, name="head", dtype=z.dtype)(z)


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch BCEWithLogitsLoss(reduction='mean') over all elements."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def mixup_waves_and_labels(
    waves: jax.Array, targets: jax.Array, key: jax.Array, rate: float
) -> tuple[jax.Array, jax.Array]:
    """Sample-pairing mixup with λ-weighted label combination
    (dataloader.py:148-160): per-sample Bernoulli(rate) gate, uniform
    partner, λ ~ Beta(10, 10); every wave is mean-centered either way."""
    b = waves.shape[0]
    kd, kp, kl = jax.random.split(key, 3)
    w = waves - jnp.mean(waves, axis=-1, keepdims=True)
    do = jax.random.uniform(kd, (b, 1)) < rate
    partner = jax.random.randint(kp, (b,), 0, b)
    lam = jax.random.beta(kl, 10.0, 10.0, (b, 1)).astype(w.dtype)
    mixed = lam * w + (1.0 - lam) * w[partner]
    mixed = mixed - jnp.mean(mixed, axis=-1, keepdims=True)
    mixed_t = lam * targets + (1.0 - lam) * targets[partner]
    return jnp.where(do, mixed, w), jnp.where(do, mixed_t, targets)


def _prepare_input(cfg: dict, waves: jax.Array, key: jax.Array | None, train: bool):
    """waveforms [B, L] -> normalized fbank views [B, F, T, 1]; SpecMask and
    the noise aug run only in train mode (dataloader.py:186-207)."""
    inp = cfg["input"]
    fb_cfg = FbankConfig(
        sample_rate=int(inp.get("sampling_rate", 16000)),
        num_mel_bins=int(inp.get("n_mels", 128)),
    )
    fb = kaldi_fbank(waves, fb_cfg)  # [B, T, M]
    fb = pad_or_trim_frames(fb, int(inp["target_length"]))
    x = jnp.swapaxes(fb, -1, -2)[:, None]  # [B, 1, F, T]
    if train and (int(cfg.get("freqm", 0)) or int(cfg.get("timem", 0))):
        key, k_mask = jax.random.split(key)
        x = spec_mask_batch(
            x, k_mask, freq_param=int(cfg.get("freqm", 0)), time_param=int(cfg.get("timem", 0))
        )
    ns = cfg["norm_stats"]
    x = precomputed_norm(x, float(ns["mean"]), 2.0 * float(ns["std"]))
    if train and bool(inp.get("noise", False)):
        from audiossl_tpu.data.augment import mast_noise

        key, k_noise = jax.random.split(key)
        x = mast_noise(x, k_noise)
    return jnp.transpose(x, (0, 2, 3, 1))  # NHWC [B, F, T, 1]


def train_finetune_mast(
    config: dict[str, Any],
    train_json: str,
    label_csv: str,
    eval_json: str | None = None,
    load_checkpoint: str | None = None,
    max_steps: int | None = None,
    seed: int = 31,
):
    run, ft = config["run"], config["finetune"]
    mesh = make_mesh(int(run.get("world_size", 0)) or None)
    n_dev = mesh.devices.size
    batch = n_dev * max(1, int(run["batch_size"]) // n_dev)
    axis = DATA_AXIS
    inp = ft["input"]
    sr = int(inp.get("sampling_rate", 16000))
    clip = int(float(inp.get("length_wave", 10.0)) * sr)

    loader, n_classes = multilabel_loader(
        train_json, label_csv, batch, clip, sr,
        num_workers=int(run.get("num_dataloader_workers", 8)), seed=seed,
        on_error=str(run.get("data_on_error", "raise")),
    )
    eval_loader = None
    if eval_json:
        eval_loader, _ = multilabel_loader(
            eval_json, label_csv, batch, clip, sr, shuffle=False, drop_last=False,
            num_workers=int(run.get("num_dataloader_workers", 8)),
        )

    model_size = str(ft.get("model_size", "base"))
    model = MASTClassifier(
        num_classes=n_classes,
        input_fdim=int(inp.get("n_mels", 128)),
        input_tdim=int(inp["target_length"]),
        model_size=model_size,
        remat=bool(ft.get("remat", False)),
        droppath_rate=(
            float(ft["droppath_rate"]) if ft.get("droppath_rate") is not None else None
        ),
        # finetune.compute_dtype: "f32" for an exact trunk (parity tests),
        # default bf16 compute / f32 LN stats
        compute_dtype=(None if ft.get("compute_dtype") == "f32" else jnp.bfloat16),
    )
    dummy = jnp.zeros((2, int(inp.get("n_mels", 128)), int(inp["target_length"]), 1), jnp.float32)
    variables = jax.jit(lambda k: model.init({"params": k}, dummy, False))(jax.random.key(seed))
    params = variables["params"]

    tx = adamw_layer_decay(
        float(run.get("learning_rate", 5e-4)),
        params,
        depth=MVIT_DEPTH[model_size],
        layer_decay=float(run.get("layer_decay", 0.75)),
        weight_decay=float(run.get("weight_decay", 0.05)),
        clip_grad_norm=float(run.get("clip_grad_norm", 1.0)),
    )
    opt_state = tx.init(params)

    mixup_rate = float(inp.get("mixup", 0.0) or 0.0)
    # grad accumulation (train/accum.py): A sequential microbatches per
    # optimizer update — exact for this per-sample BCE through a LayerNorm
    # model; the memory lever for MViT-base at reference batch sizes.
    accum = max(1, int(run.get("grad_accum_steps", 1)))
    if batch // n_dev % accum:
        raise ValueError(
            f"per-chip batch {batch // n_dev} not divisible by grad_accum_steps {accum}"
        )

    def micro_loss(p, mb, key):
        waves, targets = mb
        if mixup_rate > 0.0:
            key, k_mix = jax.random.split(key)
            waves, targets = mixup_waves_and_labels(waves, targets, k_mix, mixup_rate)
        key, k_drop = jax.random.split(key)
        x = _prepare_input(ft, waves, key, True)
        logits = model.apply({"params": p}, x, True, rngs={"dropout": k_drop})
        return bce_logits(logits, targets)

    grad_fn = microbatched_value_and_grad(micro_loss, accum)

    # run.fsdp: GSPMD fully sharded variant (parallel/fsdp.py) — params,
    # grads and the AdamW moments live 1/n per chip; XLA inserts the
    # per-use all-gathers and grad reduce-scatters. Step math is identical
    # to the shard_map path (micro_loss's jnp.mean is already the
    # global-batch mean under GSPMD; the layer-decay masks and global-norm
    # clip see logically whole tensors). RNG differs benignly: one global
    # key per step instead of the shard_map path's per-device fold_in —
    # same draw distribution, different draws (with augs off the two paths
    # produce identical losses, tests/test_finetune_mast.py).
    fsdp = bool(run.get("fsdp", False))
    p_sh = o_sh = None
    if fsdp:
        from audiossl_tpu.parallel.fsdp import tree_shardings

        p_sh = tree_shardings(params, mesh, axis)
        o_sh = tree_shardings(jax.eval_shape(tx.init, params), mesh, axis)
        batch_sh = NamedSharding(mesh, P(axis))
        repl_sh = NamedSharding(mesh, P())

        def step_fsdp(params, opt_state, waves, targets, key):
            if waves.dtype == jnp.int16:
                waves = waves.astype(jnp.float32) / 32768.0
            loss, grads = grad_fn(params, (waves, targets), key)
            grads = jax.lax.with_sharding_constraint(grads, p_sh)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        train_step = jax.jit(
            step_fsdp,
            in_shardings=(p_sh, o_sh, batch_sh, batch_sh, repl_sh),
            out_shardings=(p_sh, o_sh, repl_sh),
            donate_argnums=(0, 1),
        )
    else:

        def train_step(params, opt_state, waves, targets, key):
            if waves.dtype == jnp.int16:
                waves = waves.astype(jnp.float32) / 32768.0
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            loss, grads = grad_fn(params, (waves, targets), key)
            grads = jax.lax.pmean(grads, axis)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, jax.lax.pmean(loss, axis)

        train_step = jax.jit(
            shard_map(train_step, mesh=mesh,
                      in_specs=(P(), P(), P(axis), P(axis), P()),
                      out_specs=(P(), P(), P()), check_vma=False),
            donate_argnums=(0, 1),  # params/opt_state update in place
        )

    def eval_fn(params, waves):
        if waves.dtype == jnp.int16:
            waves = waves.astype(jnp.float32) / 32768.0
        x = _prepare_input(ft, waves, None, False)
        return jax.nn.sigmoid(model.apply({"params": params}, x, False))

    if fsdp:
        eval_step = jax.jit(
            eval_fn,
            in_shardings=(p_sh, NamedSharding(mesh, P(axis))),
            out_shardings=NamedSharding(mesh, P(axis)),
        )
    else:
        eval_step = jax.jit(
            shard_map(eval_fn, mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis),
                      check_vma=False)
        )

    repl = NamedSharding(mesh, P())
    params, opt_state = jax.tree.map(lambda a: jax.device_put(a, repl), (params, opt_state))
    resume_step = 0
    if load_checkpoint:
        restored = ckptmod.restore_checkpoint(
            load_checkpoint, {"params": params, "opt_state": opt_state, "step": 0}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        # resume the step counter too: a preempted run must continue with
        # the remaining epochs (and post-resume checkpoints must not land
        # at lower step numbers), not replay all of them from scratch
        resume_step = int(restored["step"])
        log.info("resumed from %s at step %d", load_checkpoint, resume_step)
    if fsdp:
        # re-place the (replicated) state into its sharded layout; from here
        # on params/moments never exist whole on any one chip
        params = jax.device_put(params, p_sh)
        opt_state = jax.device_put(opt_state, o_sh)

    def evaluate():
        scores, targets = [], []
        for waves, t in eval_loader.epoch(0):
            n = len(t)
            if n < batch:
                waves = np.pad(waves, ((0, batch - n), (0, 0)))
            s = np.asarray(eval_step(params, shard_batch(mesh, jnp.asarray(waves))))[:n]
            scores.append(s)
            targets.append(np.asarray(t))
        s, t = np.concatenate(scores), np.concatenate(targets)
        auc = auc_roc(s, t)
        return {"mAP": mean_average_precision(s, t), "AUC": auc, "d_prime": d_prime(auc)}

    save_path = run.get("save_path", "./runs/mast_ft")
    ckpt_dir = save_path + "_chkp"
    os.makedirs(ckpt_dir, exist_ok=True)
    stats_file = open(os.path.join(ckpt_dir, "stats.jsonl"), "a", buffering=1)
    from audiossl_tpu.train.loop import MetricsBuffer

    buf = MetricsBuffer(int(run.get("log_every", 10)), stats_file)

    epochs = int(run.get("epochs", 1))
    global_step = resume_step
    start_epoch = min(resume_step // max(len(loader), 1), epochs)
    done = False
    preempted = False
    keep_last = int(run.get("keep_checkpoints", 0)) or None
    stats: dict = {}
    from audiossl_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
      for epoch in range(start_epoch, epochs):
        if done:
            break
        buf.reset_avg()
        t0 = time.time()
        for waves, targets in loader.epoch(epoch):
            params, opt_state, loss = train_step(
                params, opt_state,
                shard_batch(mesh, jnp.asarray(waves)),
                shard_batch(mesh, jnp.asarray(targets, np.float32)),
                jax.random.key(seed * 7_919 + global_step),
            )
            global_step += 1
            if buf.push(epoch, global_step, {"train_loss": loss}) and guard.should_stop():
                # the epoch-end save below runs on break; SIGTERM grace
                # windows are short, so exit the epoch immediately
                log.warning("SIGTERM: stopping at step %d for preemption save", global_step)
                done = True
                preempted = True
                break
            if max_steps and global_step >= max_steps:
                done = True
                break
        buf.flush()
        stats = {"epoch": epoch, "train_loss": buf.avg_loss, "epoch_time_s": time.time() - t0}
        if eval_loader is not None and not preempted:  # no eval inside the grace window
            stats.update(evaluate())
        log.info("%s", stats)
        print(json.dumps(stats), file=stats_file)
        ckptmod.save_checkpoint(
            ckpt_dir, global_step,
            {"params": params, "opt_state": opt_state, "step": global_step},
            {"params": params["mast"], "batch_stats": {}},
            config,
            keep_last=keep_last,
        )
      # commit in-flight saves while SIGTERM is still deferred by the guard:
      # a repeat signal during the final async commit must not kill the write
      ckptmod.wait_until_finished()
    stats_file.close()
    return params, stats, ckpt_dir


def main():
    import argparse

    from audiossl_tpu.config import load_config

    p = argparse.ArgumentParser(description="Supervised MAST multi-label fine-tuning")
    p.add_argument("--train_json", required=True, help="AudioSet-style datafile JSON")
    p.add_argument("--label_csv", required=True, help="CSV with index,mid,display_name")
    p.add_argument("--eval_json", default=None)
    p.add_argument("-c", "--config", default=None, help="YAML (defaults to configs/mast_ft.yaml)")
    p.add_argument("--load_checkpoint", default=None)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--grad_accum_steps", type=int, default=None,
                   help="microbatches per optimizer update (memory lever)")
    p.add_argument("--fsdp", action="store_true",
                   help="fully shard params/grads/moments over the mesh (GSPMD)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    config = load_config(args.config, "mast_ft")
    from audiossl_tpu.parallel.launch import setup_compilation_cache

    setup_compilation_cache(config.get("run"))
    if args.epochs is not None:
        config["run"]["epochs"] = args.epochs
    if args.batch_size is not None:
        config["run"]["batch_size"] = args.batch_size
    if args.grad_accum_steps is not None:
        config["run"]["grad_accum_steps"] = args.grad_accum_steps
    if args.fsdp:
        config["run"]["fsdp"] = True
    _, stats, ckpt_dir = train_finetune_mast(
        config, args.train_json, args.label_csv, eval_json=args.eval_json,
        load_checkpoint=args.load_checkpoint, max_steps=args.max_steps,
    )
    print(f"checkpoints written to {ckpt_dir}; final stats: {stats}")


if __name__ == "__main__":
    main()
