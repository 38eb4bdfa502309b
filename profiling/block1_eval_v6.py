"""Eval block-1 kernel v6: diag3's winning structure, numerically real.

diag3 pinned the cost structure: a 1-D grid over row blocks (bt clips x
tpc rows), weights resident as two [2F, 4L] bf16 operands, in-kernel
rolls for the +-1 time taps, and per-ks dots that slice CONTIGUOUS 2L
column ranges (the 2-D-grid / middle-index slicing of v5 is what paid
5.6-7.1 ms). diag3's complete-math "full" mode ran 1.98 ms vs XLA 3.65.

v6 = that kernel with the real folded-BN weights (eval_v5's packing) and
the +shift epilogue, parity-checked against the XLA eval block.
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
L = (F // 2) * C  # 2048
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
    print(f"{name:40s} {dt*1e3:7.3f} ms  {B/dt:10,.0f} clips/s")
    return dt


def _v6_kernel(x_ref, mt_ref, mb_ref, sh_ref, out_ref, *, tpc):
    xs1 = x_ref[:]
    n = xs1.shape[0]
    xf = xs1.astype(jnp.float32)
    tr = jax.lax.broadcasted_iota(jnp.int32, xs1.shape, 0) % tpc
    xs0 = jnp.where(tr == 0, 0, pltpu.roll(xf, 1, 0)).astype(xs1.dtype)
    xs2 = jnp.where(tr == tpc - 1, 0, pltpu.roll(xf, n - 1, 0)).astype(xs1.dtype)
    sh = sh_ref[0:1, :]
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mt, mb = mt_ref[:], mb_ref[:]
    lw = mt.shape[1] // 2  # 2L
    o = None
    for ks, (a_op, b_op) in enumerate(((xs0, xs1), (xs1, xs2))):
        y = dot(a_op, mt[:, ks * lw : (ks + 1) * lw]) + dot(
            b_op, mb[:, ks * lw : (ks + 1) * lw]
        )
        for h in range(2):
            z = jnp.maximum(y[:, h * L : (h + 1) * L] + sh, 0.0)
            o = z if o is None else jnp.maximum(o, z)
    out_ref[:] = o.astype(out_ref.dtype)


def pack_weights(kernel, cbias, gamma, beta, mean, var, f, dtype):
    """Fold BN into the banded conv matrix; pack as two [2F, 4L] operands.

    Column layout: [ks=0 | ks=1], each 2L wide = [h=0 | h=1] halves.
    mt holds the top K=128 rows (the a_op operand), mb the bottom.
    """
    m = b1.banded_matrix(kernel, f, jnp.float32)  # [3F, 2L]
    istd = jax.lax.rsqrt(var + b1.BN_EPS)
    a = (gamma * istd).astype(jnp.float32)
    a_col = jnp.tile(a, (f // 2,))
    ms = (m.reshape(3 * f, 2, L) * a_col[None, None, :]).reshape(3 * f, 2 * L)
    zero = jnp.zeros((f, 2 * L), jnp.float32)
    me = jnp.concatenate([zero, ms], axis=0)  # [4F, 2L] (rolled | centered)
    mo = jnp.concatenate([ms, zero], axis=0)
    mt = jnp.concatenate([me[: 2 * f], mo[: 2 * f]], axis=1).astype(dtype)
    mb = jnp.concatenate([me[2 * f :], mo[2 * f :]], axis=1).astype(dtype)
    bapp = jnp.tile(beta - (mean - cbias) * a, (f // 2,))
    shift = jnp.broadcast_to(bapp.astype(jnp.float32)[None, :], (8, L))
    return mt, mb, shift


def eval_v6(x, kernel, cbias, gamma, beta, mean, var, bt):
    b, t, f = x.shape
    c = kernel.shape[-1]
    tpc = t // 2
    mt, mb, shift = pack_weights(kernel, cbias, gamma, beta, mean, var, f, x.dtype)
    xr = x.reshape(b * tpc, 2 * f)
    rt = bt * tpc
    (out,) = pl.pallas_call(
        partial(_v6_kernel, tpc=tpc),
        out_shape=[jax.ShapeDtypeStruct((b * tpc, L), x.dtype)],
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rt, 2 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((rt, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
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

    a = xla_eval(x).reshape(B, T // 2, F // 2, C)
    fns = {}
    for bt in (4, 8, 16):
        fn = jax.jit(partial(eval_v6, bt=bt))
        try:
            out = fn(x, kernel, cbias, gamma, beta, mean, var)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
            print(f"v6 bt={bt}: max abs diff vs XLA = {err:.3e}")
            fns[bt] = fn
        except Exception as e:  # noqa: BLE001 — VMEM OOM expected at big bt
            print(f"v6 bt={bt}: FAILED {type(e).__name__}: {str(e)[:120]}")

    timeit("XLA eval block1", xla_eval, x)
    for bt, fn in fns.items():
        timeit(f"v6 bt={bt}", fn, x, kernel, cbias, gamma, beta, mean, var)


if __name__ == "__main__":
    main()
