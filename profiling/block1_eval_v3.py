"""Eval block-1 kernel v3: zero-prep input.

Key idea: for F=64 the time-major spectrogram [B, T, F] bitcasts to
[B*T/2, 128] — one lane-tile-exact row per POOLED output row r, carrying
x[2r] | x[2r+1]. The three conv time-taps come from in-kernel row rolls
(+1 / -1) with clip-boundary masking (row index mod T/2), so the banded
streams (xe/xo) are never materialized in HBM. Quadrants:

  t-even out (t=2r):  taps x[2r-1] x[2r] x[2r+1] = [roll+1 | row] @ Me
  t-odd  out (t=2r+1): taps x[2r] x[2r+1] x[2r+2] = [row | roll-1] @ Mo

Me/Mo are [256, 4096] with the banded matrix placed at the right 64-row
offsets (zeros elsewhere); BN scale folded into columns; epilogue =
+shift, relu, max over the 4 (t-parity x f-parity) quadrants.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiossl_tpu.ops import block1 as b1

B, T, F, C = 1024, 96, 64, 64
WARMUP, ITERS = 3, 30
L = (F // 2) * C  # 2048


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:40s} {dt*1e3:7.3f} ms  {B/dt:10,.0f} clips/s")
    return dt


def _v3_kernel(x_ref, me_ref, mo_ref, sh_ref, out_ref, *, tpc):
    xs1 = x_ref[:]
    n = xs1.shape[0]
    tr = jax.lax.broadcasted_iota(jnp.int32, xs1.shape, 0) % tpc
    # Mosaic can't rotate 16-bit data along sublanes; roll in f32.
    xf = xs1.astype(jnp.float32)
    xs0 = jnp.where(tr == 0, 0, pltpu.roll(xf, 1, 0)).astype(xs1.dtype)
    xs2 = jnp.where(tr == tpc - 1, 0, pltpu.roll(xf, n - 1, 0)).astype(xs1.dtype)
    sh = sh_ref[0:1, :]
    o = None
    for xx, m_ref in (
        (jnp.concatenate([xs0, xs1], axis=1), me_ref),
        (jnp.concatenate([xs1, xs2], axis=1), mo_ref),
    ):
        y = jax.lax.dot_general(
            xx, m_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        for h in range(2):
            z = jnp.maximum(y[:, h * L : (h + 1) * L] + sh, 0.0)
            o = z if o is None else jnp.maximum(o, z)
    out_ref[:] = o.astype(out_ref.dtype)


def eval_v3(x, kernel, cbias, gamma, beta, mean, var, bt):
    """x [B, T, F] (F=64, T even) -> pooled [B, T//2, F//2, C]."""
    b, t, f = x.shape
    c = kernel.shape[-1]
    tpc = t // 2
    m = b1.banded_matrix(kernel, f, jnp.float32)  # [3F, 2L]
    istd = jax.lax.rsqrt(var + b1.BN_EPS)
    a = (gamma * istd).astype(jnp.float32)
    a_col = jnp.tile(a, (f // 2,))
    ms = (m.reshape(3 * f, 2, L) * a_col[None, None, :]).reshape(3 * f, 2 * L)
    zero = jnp.zeros((f, 2 * L), jnp.float32)
    me = jnp.concatenate([zero, ms], axis=0).astype(x.dtype)  # [4F=256, 2L]
    mo = jnp.concatenate([ms, zero], axis=0).astype(x.dtype)
    bapp = jnp.tile(beta - (mean - cbias) * a, (f // 2,))
    shift = jnp.broadcast_to(bapp.astype(jnp.float32)[None, :], (8, L))

    xr = x.reshape(b * tpc, 2 * f)  # pure bitcast for F=64
    (out,) = pl.pallas_call(
        partial(_v3_kernel, tpc=tpc),
        out_shape=[jax.ShapeDtypeStruct((b * tpc, L), x.dtype)],
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt * tpc, 2 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * f, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * f, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((bt * tpc, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * tpc) * 2 * (4 * f) * 2 * L,
            bytes_accessed=2 * (b * tpc) * (2 * f + L),
            transcendentals=0,
        ),
    )(xr, me, mo, shift)
    return out.reshape(b, tpc, f // 2, c)


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

    a = xla_eval(x)
    fns = {bt: jax.jit(partial(eval_v3, bt=bt)) for bt in (4, 8, 16)}
    for bt, fn in fns.items():
        out = fn(x, kernel, cbias, gamma, beta, mean, var)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
        print(f"v3 bt={bt}: max abs diff vs XLA = {err:.3e}")

    timeit("XLA eval block1", xla_eval, x)
    for bt, fn in fns.items():
        timeit(f"v3 in-kernel taps bt={bt}", fn, x, kernel, cbias, gamma, beta, mean, var)


if __name__ == "__main__":
    main()
