"""SS-MAST full MoCo train step on TPU, post fused-attention (scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.config import load_config
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend import build_frontend
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train.step import init_train_state, make_train_step

CLIP = 160000  # 10 s


def bench(batch, accum=1, remat=False, iters=10):
    mesh = make_mesh()
    config = load_config(None, "ssmast")
    config["run"]["batch_size"] = batch
    config["pretrain"]["grad_accum_steps"] = accum
    config["pretrain"]["remat"] = remat
    obj = get_objective("ssmast")(config)
    pre = config["pretrain"]
    pipe = AugmentPipeline(AugmentConfig.from_dict(pre), epoch_samples=10**6)
    mel_cfg = build_frontend(pre["input"])
    import optax

    tx = optax.adamw(3e-4)
    norm = pre.get("normalization", "mean_var")
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), batch, CLIP, normalization=norm
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, normalization=norm)
    waves = shard_batch(
        mesh, jnp.asarray(0.1 * np.random.default_rng(1).standard_normal((batch, CLIP)), jnp.float32)
    )
    for _ in range(3):
        state, metrics = step(state, waves)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, waves)
    float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / iters
    tag = " remat" if remat else ""
    print(
        f"ssmast B={batch} accum={accum}{tag}: {dt*1e3:.1f} ms/step  ({batch/dt:.0f} clips/s)",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    # args: B, BxA (batch B in A microbatches), or a trailing "r" for remat
    # (e.g. 256x4, 256r)
    for a in sys.argv[1:] or ["64", "128"]:
        remat = a.endswith("r")
        b, _, acc = a.rstrip("r").partition("x")
        bench(int(b), int(acc or 1), remat)
