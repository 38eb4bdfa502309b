"""Eval block-1 kernel v4: isolate what pins v3 at ~4 ms.

v3 (in-kernel rolls + lane-concat to [n,256] + 2 dots) = 4.2 ms while the
same contraction on pre-staged streams = 2.03 ms. Two suspects:
  (a) the lane concat forcing an MXU operand relayout  -> v4a: split each
      quadrant into two K=128 dots (xs0 @ M_top + xs1 @ M_bot), no concat;
  (b) the boundary masks (iota + where)                -> v4b: v4a without
      masks (timing-only, numerically wrong at clip edges).
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


def _v4_kernel(x_ref, mt_ref, mb_ref, sh_ref, out_ref, *, tpc, masks):
    xs1 = x_ref[:]
    n = xs1.shape[0]
    xf = xs1.astype(jnp.float32)
    if masks:
        tr = jax.lax.broadcasted_iota(jnp.int32, xs1.shape, 0) % tpc
        xs0 = jnp.where(tr == 0, 0, pltpu.roll(xf, 1, 0)).astype(xs1.dtype)
        xs2 = jnp.where(tr == tpc - 1, 0, pltpu.roll(xf, n - 1, 0)).astype(xs1.dtype)
    else:
        xs0 = pltpu.roll(xf, 1, 0).astype(xs1.dtype)
        xs2 = pltpu.roll(xf, n - 1, 0).astype(xs1.dtype)
    sh = sh_ref[0:1, :]
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # even-t quadrants: taps (x[2r-1]=xs0 top half? no: xs0 rows carry
    # x[2r-2]|x[2r-1]); matrices are pre-split so top multiplies the rolled
    # row and bottom the centered row.
    mt, mb = mt_ref[:], mb_ref[:]
    o = None
    for a_op, b_op, ks in ((xs0, xs1, 0), (xs1, xs2, 1)):
        y = dot(a_op, mt[:, ks * 2 * L : (ks + 1) * 2 * L]) + dot(
            b_op, mb[:, ks * 2 * L : (ks + 1) * 2 * L]
        )
        for h in range(2):
            z = jnp.maximum(y[:, h * L : (h + 1) * L] + sh, 0.0)
            o = z if o is None else jnp.maximum(o, z)
    out_ref[:] = o.astype(out_ref.dtype)


def eval_v4(x, kernel, cbias, gamma, beta, mean, var, bt, masks=True):
    b, t, f = x.shape
    c = kernel.shape[-1]
    tpc = t // 2
    m = b1.banded_matrix(kernel, f, jnp.float32)  # [3F, 2L]
    istd = jax.lax.rsqrt(var + b1.BN_EPS)
    a = (gamma * istd).astype(jnp.float32)
    a_col = jnp.tile(a, (f // 2,))
    ms = (m.reshape(3 * f, 2, L) * a_col[None, None, :]).reshape(3 * f, 2 * L)
    zero = jnp.zeros((f, 2 * L), jnp.float32)
    me = jnp.concatenate([zero, ms], axis=0)  # [4F=256, 2L] (rolled | centered)
    mo = jnp.concatenate([ms, zero], axis=0)
    # split into the K=128 top (rolled operand) and bottom (centered operand)
    # halves, then pack even/odd side by side: [2F=128, 2 * 2L]
    mt = jnp.concatenate([me[: 2 * f], mo[: 2 * f]], axis=1).astype(x.dtype)
    mb = jnp.concatenate([me[2 * f :], mo[2 * f :]], axis=1).astype(x.dtype)
    bapp = jnp.tile(beta - (mean - cbias) * a, (f // 2,))
    shift = jnp.broadcast_to(bapp.astype(jnp.float32)[None, :], (8, L))

    xr = x.reshape(b * tpc, 2 * f)
    (out,) = pl.pallas_call(
        partial(_v4_kernel, tpc=tpc, masks=masks),
        out_shape=[jax.ShapeDtypeStruct((b * tpc, L), x.dtype)],
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt * tpc, 2 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((bt * tpc, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * tpc) * (4 * f) * 4 * L,
            bytes_accessed=2 * (b * tpc) * (2 * f + L),
            transcendentals=0,
        ),
    )(xr, mt, mb, shift)
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
    for bt in (4, 8):
        fn = jax.jit(partial(eval_v4, bt=bt))
        out = fn(x, kernel, cbias, gamma, beta, mean, var)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
        print(f"v4a bt={bt}: max abs diff vs XLA = {err:.3e}")

    timeit("XLA eval block1", xla_eval, x)
    for bt in (4, 8):
        timeit(
            f"v4a split-K dots bt={bt}",
            jax.jit(partial(eval_v4, bt=bt)),
            x, kernel, cbias, gamma, beta, mean, var,
        )
    timeit(
        "v4b no masks (timing only) bt=8",
        jax.jit(partial(eval_v4, bt=8, masks=False)),
        x, kernel, cbias, gamma, beta, mean, var,
    )


if __name__ == "__main__":
    main()
