"""A/B the EVAL forward of AudioNTT block 1 at B=1024.

The fused Pallas block (ops/block1.py) currently engages only when
train=True; PERF.md's eval comparison was against the full train kernel.
But at eval BN uses running stats, so the fwd-only `_apply` kernel (conv
quadrants + folded affine + relu + pool, pooled output only) is all that's
needed — no stats quadratic forms, no backward. Stage profiling
(fwd_pipeline_stages.py) shows the eval encoder forward is 62% of the
headline bench pipeline, so if `_apply` beats XLA's fused conv+BN+relu+pool
here, it's a direct headline win.

Run on the real chip.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiossl_tpu.ops import block1 as b1

B, T, F, C = 1024, 96, 64, 64
WARMUP, ITERS = 3, 30


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:44s} {dt*1e3:7.3f} ms  {B/dt:10,.0f} clips/s")
    return dt


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.bfloat16)
    kernel = jnp.asarray(0.1 * rng.standard_normal((3, 3, 1, C)), jnp.float32)
    cbias = jnp.asarray(0.01 * rng.standard_normal((C,)), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal((C,)), jnp.float32)
    mean = jnp.asarray(0.05 * rng.standard_normal((C,)), jnp.float32)
    var = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)

    @jax.jit
    def xla_eval(x):
        y = jax.lax.conv_general_dilated(
            x[..., None], kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cbias.astype(x.dtype)
        yn = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + b1.BN_EPS) * gamma + beta
        y = nn.relu(yn.astype(x.dtype))
        return nn.max_pool(y, (2, 2), (2, 2))

    @partial(jax.jit, static_argnames=("rt",))
    def fused_eval(x, rt=512):
        xe, xo, n_valid = b1.block1_streams(x, rt)
        pooled = b1._apply(xe, xo, kernel, cbias, gamma, beta, mean, var, F, rt, False)[:n_valid]
        return pooled.reshape(B, T // 2, F // 2, C)

    a = xla_eval(x)
    bb = fused_eval(x)
    # fused pooled layout: row = (b, t'), col = (f', c) -> same as NHWC reshape
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
    print(f"max abs diff (bf16 inputs): {err:.3e}")

    timeit("XLA eval block1 (conv+BN+relu+pool)", xla_eval, x)
    for rt in (256, 512, 1024):
        timeit(f"fused _apply eval block1 (rt={rt})", partial(fused_eval, rt=rt), x)


if __name__ == "__main__":
    main()
