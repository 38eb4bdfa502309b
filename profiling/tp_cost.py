"""Single-chip cost of the tensor-parallel encoder configuration.

`pretrain.tp` forces two things on the MViT/MAST encoder that have a
throughput price even before any communication enters (parallel/tp_mvit.py):
`fused_attention="off"` (GSPMD cannot partition the Pallas kernel) and
`pool_impl="unrolled"` (the grouped-conv filter-grad SPMD hazard). Real
multi-chip tp cannot be timed in this sandbox (one v5e), but THIS cost can:
run the full SS-MAST MoCo step (bench.py's measure_ssmast_step recipe,
B=64, MViT-base, 10 s clips) in the default config and in the tp-forced
config on the same chip and report both. The delta is the per-chip floor a
tp=2 run must amortize with its halved weights/moments before collectives
are even counted — recorded in PERF.md's tp section.

Run on the real chip:  python profiling/tp_cost.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP, ITERS, REPEATS = 3, 10, 3


def measure(overrides: dict, batch: int = 64) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiossl_tpu.config import load_config
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend import build_frontend
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    clip = 160000
    mesh = make_mesh()
    config = load_config(None, "ssmast")
    config["run"]["batch_size"] = batch
    config["pretrain"].update(overrides)
    obj = get_objective("ssmast")(config)
    pre = config["pretrain"]
    pipe = AugmentPipeline(AugmentConfig.from_dict(pre), epoch_samples=10**6)
    mel_cfg = build_frontend(pre["input"])
    tx = optax.adamw(3e-4)
    norm = pre.get("normalization", "mean_var")
    n_dev = mesh.devices.size
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), batch // n_dev, clip,
        normalization=norm,
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, normalization=norm)
    rng = np.random.default_rng(1)
    waves = shard_batch(mesh, jnp.asarray(0.1 * rng.standard_normal((batch, clip)), jnp.float32))

    for _ in range(WARMUP):
        state, metrics = step(state, waves)
    float(metrics["train_loss"])  # scalar fetch, not an array pull (CLAUDE.md)
    runs = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, waves)
        float(metrics["train_loss"])
        runs.append(batch / ((time.perf_counter() - t0) / ITERS))
    return {"clips_per_sec": float(np.median(runs)), "runs": [round(r, 1) for r in runs]}


def main():
    if "--no-cache" not in sys.argv:
        from audiossl_tpu.parallel.launch import setup_compilation_cache

        os.environ.setdefault(
            "AUDIOSSL_COMPILATION_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        setup_compilation_cache()
    default = measure({})
    tp_forced = measure({"fused_attention": "off", "pool_impl": "unrolled"})
    out = {
        "ssmast_default_clips_per_sec": default["clips_per_sec"],
        "ssmast_default_runs": default["runs"],
        "ssmast_tpcfg_clips_per_sec": tp_forced["clips_per_sec"],
        "ssmast_tpcfg_runs": tp_forced["runs"],
        "tp_config_cost_pct": round(
            100 * (1 - tp_forced["clips_per_sec"] / default["clips_per_sec"]), 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
