"""Stage breakdown of bench.py's forward pipeline (frontend + aug + both-view
encode) to locate the next lever. Run on the real chip.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend import FrontendSpec
from audiossl_tpu.models.audiontt import AudioNTT2020Task6
from audiossl_tpu.train.step import prepare_views

BATCH, CLIP = 1024, 15200
WARMUP, ITERS = 3, 30


def timeit(name, fn, *args):
    # fetch exactly ONE scalar per window — every float() is a separate
    # tunnel round trip and would otherwise dominate the measurement
    scalar = lambda out: out[-1] if isinstance(out, tuple) else out
    for i in range(WARMUP):
        out = fn(*args, i)
    float(scalar(out))
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = fn(*args, WARMUP + i)
    float(scalar(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:7.2f} ms  {BATCH/dt:10,.0f} clips/s")
    return dt


def main():
    print("backend:", jax.default_backend())
    frontend = FrontendSpec(kind="logmel", n_mels=64, sample_rate=16000)
    pipe = AugmentPipeline(
        AugmentConfig(mixup_ratio=0.4, rrc=True, normalization="mean_var"), epoch_samples=10**6
    )
    model = AudioNTT2020Task6(n_mels=64, d=2048, return_all_layers=False)
    n_frames = frontend.num_frames(CLIP)
    aug_state = pipe.init_state(64, n_frames)

    rng = np.random.default_rng(0)
    waves = jnp.asarray(0.3 * rng.standard_normal((BATCH, CLIP)), jnp.float32)
    dummy = jnp.zeros((BATCH, 64, n_frames, 1), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, dummy, False)
    key = jax.random.key(1)

    @jax.jit
    def front_only(waves, i):
        return jnp.sum(frontend(waves))

    @jax.jit
    def views_only(aug_state, waves, i):
        k = jax.random.fold_in(key, i)
        aug_state, v1, v2 = prepare_views(pipe, frontend, "mean_var", aug_state, waves, k)
        return aug_state, jnp.sum(v1) + jnp.sum(v2)

    @jax.jit
    def enc_one(waves, i):
        v = frontend(waves)[..., None]
        return jnp.sum(model.apply(variables, v, False))

    @jax.jit
    def full(aug_state, waves, i):
        k = jax.random.fold_in(key, i)
        aug_state, v1, v2 = prepare_views(pipe, frontend, "mean_var", aug_state, waves, k)
        emb = model.apply(variables, v1, False) + model.apply(variables, v2, False)
        return aug_state, jnp.sum(emb)

    timeit("frontend only", front_only, waves)
    timeit("frontend + aug (2 views)", views_only, aug_state, waves)
    timeit("frontend + 1-view encode", enc_one, waves)
    timeit("full (frontend+aug+2-view enc)", full, aug_state, waves)


if __name__ == "__main__":
    main()
