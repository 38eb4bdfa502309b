"""MFU accounting for the heavyweight trainers (VERDICT r2 item 4).

For each target: XLA cost-analysis FLOPs of the compiled step, median-of-3
20-iter timing windows, MFU vs the v5e bf16 peak (197 TFLOP/s). Targets:

  * ssmast   — full MoCo-v3 step, MViT-base, B=64 batched views (PERF.md
               sweet spot: 2 concat passes of 128)
  * ast      — AST-base fwd+bwd, MAST geometry (1212 tokens), B=64
  * delores_s— covered by bench.py (train_mfu field); repeated here for a
               one-stop table

Usage: python profiling/mfu.py [ssmast|ast|delores_s ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12


def _median_time(fn, iters=20, repeats=3):
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = fn(iters)
        float(s)
        runs.append((time.perf_counter() - t0) / iters)
    return float(np.median(runs))


def _flops(lowered) -> float | None:
    try:
        a = lowered.compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a["flops"])
    except Exception as e:  # noqa: BLE001
        print(f"  cost_analysis unavailable: {e}")
        return None


def _report(name, batch, flops, dt):
    mfu = (flops / dt / V5E_BF16_PEAK) if flops else float("nan")
    gflops = (flops or 0) / 1e9
    print(
        f"{name}: {dt*1e3:.1f} ms/step, {batch/dt:.0f} clips/s, "
        f"{gflops:.0f} GFLOP/step, MFU {mfu*100:.1f}%",
        flush=True,
    )


def _train_target(objective_name, batch, clip, tx=None):
    from audiossl_tpu.config import load_config
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend import build_frontend
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    mesh = make_mesh()
    config = load_config(None, objective_name)
    config["run"]["batch_size"] = batch
    obj = get_objective(objective_name)(config)
    pre = config["pretrain"]
    pipe = AugmentPipeline(AugmentConfig.from_dict(pre), epoch_samples=10**6)
    mel_cfg = build_frontend(pre["input"])
    if tx is None:
        import optax

        tx = optax.adamw(3e-4)
    norm = pre.get("normalization", "mean_var")
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), batch, clip, normalization=norm
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, normalization=norm)
    waves = shard_batch(
        mesh, jnp.asarray(0.1 * np.random.default_rng(1).standard_normal((batch, clip)), jnp.float32)
    )
    flops = _flops(step.jitted.lower(state, waves, None))

    holder = {"state": state}

    def run(iters):
        for _ in range(iters):
            holder["state"], metrics = step(holder["state"], waves)
        return metrics["train_loss"]

    run(3)  # warm
    return flops, run


def ssmast():
    flops, run = _train_target("ssmast", 64, 160000)
    _report("ssmast B=64 (batched views, MViT-base)", 64, flops, _median_time(run, iters=10))


def delores_s():
    from audiossl_tpu.train.optim import sgd_torch

    flops, run = _train_target("delores_s", 256, 15200, tx=sgd_torch(0.03))
    _report("delores_s B=256", 256, flops, _median_time(run))


def ast():
    from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

    b = 64
    cfg = ASTConfig.base()  # MAST geometry (128 mels x 1024 frames)
    enc = ASTEncoder(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 128, 1024, 1)), jnp.float32
    )
    variables = jax.jit(lambda: enc.init(jax.random.key(0), x, False))()

    def loss_fn(v, x):
        return jnp.sum(enc.apply(v, x, True).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss_fn))
    flops = _flops(grad.lower(variables, x))
    holder = {"g": None}

    def run(iters):
        for _ in range(iters):
            holder["g"] = grad(variables, x)
        return jnp.sum(jax.tree.leaves(holder["g"])[0])

    run(2)
    _report("ast fwd+bwd B=64 (MAST geometry)", b, flops, _median_time(run, iters=10))


if __name__ == "__main__":
    targets = sys.argv[1:] or ["delores_s", "ast", "ssmast"]
    for t in targets:
        globals()[t]()
