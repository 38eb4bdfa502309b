"""Decompose the delores_s train step cost at B=256 (scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.config import load_config
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend import FrontendSpec
from audiossl_tpu.models.audiontt import AudioNTT2020Task6
from audiossl_tpu.train.step import prepare_views

B, CLIP = 256, 15200


def timeit(fn, *args, iters=30):
    r = fn(*args)
    jax.tree.map(lambda a: None, r)
    s = jnp.sum(r[-1]) if isinstance(r, tuple) else jnp.sum(r)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = jnp.sum(r[-1]) if isinstance(r, tuple) else jnp.sum(r)
    float(s)
    return (time.perf_counter() - t0) / iters * 1e3


frontend = FrontendSpec(kind="logmel", n_mels=64, sample_rate=16000)
pipe = AugmentPipeline(AugmentConfig(mixup_ratio=0.4, rrc=True, normalization="mean_var"), epoch_samples=10**6)
model = AudioNTT2020Task6(n_mels=64, d=2048, return_all_layers=False)
n_frames = frontend.num_frames(CLIP)
aug_state = pipe.init_state(64, n_frames)
rng = np.random.default_rng(0)
waves = jnp.asarray(0.3 * rng.standard_normal((B, CLIP)), jnp.float32)
dummy = jnp.zeros((B, 64, n_frames, 1), jnp.float32)
variables = jax.jit(lambda: model.init({"params": jax.random.key(0)}, dummy, False))()
key = jax.random.key(1)

f_front = jax.jit(lambda w: frontend(w))
print(f"frontend only           {timeit(f_front, waves):6.2f} ms", flush=True)

f_views = jax.jit(lambda s, w, k: prepare_views(pipe, frontend, 'mean_var', s, w, k)[1:])
print(f"frontend+aug (2 views)  {timeit(f_views, aug_state, waves, key):6.2f} ms", flush=True)

f_enc1 = jax.jit(lambda v: model.apply(variables, v, False))
v1, v2 = f_views(aug_state, waves, key)
print(f"encoder fwd (1 view)    {timeit(f_enc1, v1):6.2f} ms", flush=True)


def full_fwd(s, w, k):
    v1, v2 = prepare_views(pipe, frontend, "mean_var", s, w, k)[1:]
    return model.apply(variables, v1, False) + model.apply(variables, v2, False)

f_full = jax.jit(full_fwd)
print(f"pipeline fwd (2 views)  {timeit(f_full, aug_state, waves, key):6.2f} ms", flush=True)


def loss_fn(params, s, w, k):
    v1, v2 = prepare_views(pipe, frontend, "mean_var", s, w, k)[1:]
    e1 = model.apply({**variables, "params": params}, v1, True, mutable=["batch_stats"], rngs={"dropout": k})[0]
    e2 = model.apply({**variables, "params": params}, v2, True, mutable=["batch_stats"], rngs={"dropout": k})[0]
    return jnp.sum(e1 * e1) + jnp.sum(e2 * e2)

f_bwd = jax.jit(lambda p, s, w, k: jax.tree.reduce(
    lambda a, l: a + jnp.sum(jnp.abs(l)), jax.grad(loss_fn)(p, s, w, k), 0.0
))
print(f"fwd+bwd (2 views, no loss/opt) {timeit(f_bwd, variables['params'], aug_state, waves, key):6.2f} ms", flush=True)
