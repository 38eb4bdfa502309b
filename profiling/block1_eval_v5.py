"""Eval block-1 kernel v5: 2-D grid with an N-split so every block fits VMEM.

Diag history: all full-kernel variants (v3 in-kernel rolls, v4 split-K,
tuned pre-staged streams) pin at 4.07-4.5 ms vs XLA 3.52-3.60, while the
dots alone on pre-staged streams run 2.03 ms. The full variants' f32
[rt, 4096]/[rt, 2048] intermediates push per-step VMEM past the ~16 MB
budget, so Mosaic drops double buffering (bt=8) or the 1-D grid pays
256 launch steps (bt=4). v5 splits the 2048-wide output into W-column
blocks on a (j, i) grid: per-step live f32 shrinks to [rt, W], the
folded-BN weight blocks [128, 4, W] stay resident across the inner i
sweep, and rows scale up to 16-32 clips per step.

Light speed: 206 GFLOP bf16 -> ~1.05 ms MXU; 213 MB HBM -> ~0.26 ms.
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


def _v5_kernel(x_ref, mt_ref, mb_ref, sh_ref, out_ref, *, tpc):
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
    o = None
    for ks, (a_op, b_op) in enumerate(((xs0, xs1), (xs1, xs2))):
        for h in range(2):
            q = ks * 2 + h
            y = dot(a_op, mt_ref[:, q, :]) + dot(b_op, mb_ref[:, q, :])
            z = jnp.maximum(y + sh, 0.0)
            o = z if o is None else jnp.maximum(o, z)
    out_ref[:] = o.astype(out_ref.dtype)


def eval_v5(x, kernel, cbias, gamma, beta, mean, var, bt, w):
    b, t, f = x.shape
    c = kernel.shape[-1]
    tpc = t // 2
    m = b1.banded_matrix(kernel, f, jnp.float32)  # [3F, 2L]
    istd = jax.lax.rsqrt(var + b1.BN_EPS)
    a = (gamma * istd).astype(jnp.float32)
    a_col = jnp.tile(a, (f // 2,))
    ms = (m.reshape(3 * f, 2, L) * a_col[None, None, :]).reshape(3 * f, 2 * L)
    zero = jnp.zeros((f, 2 * L), jnp.float32)
    me = jnp.concatenate([zero, ms], axis=0)  # [4F, 2L] (rolled | centered)
    mo = jnp.concatenate([ms, zero], axis=0)
    # K=128 top (rolled operand) / bottom (centered operand) halves, packed
    # even/odd side by side then reshaped so quadrant q = ks*2 + h is a
    # middle index: [2F, 4, L]
    mt = jnp.concatenate([me[: 2 * f], mo[: 2 * f]], axis=1).astype(x.dtype)
    mb = jnp.concatenate([me[2 * f :], mo[2 * f :]], axis=1).astype(x.dtype)
    mt3 = mt.reshape(2 * f, 4, L)
    mb3 = mb.reshape(2 * f, 4, L)
    bapp = jnp.tile(beta - (mean - cbias) * a, (f // 2,))
    shift = jnp.broadcast_to(bapp.astype(jnp.float32)[None, :], (8, L))

    xr = x.reshape(b * tpc, 2 * f)
    rt = bt * tpc
    (out,) = pl.pallas_call(
        partial(_v5_kernel, tpc=tpc),
        out_shape=[jax.ShapeDtypeStruct((b * tpc, L), x.dtype)],
        grid=(L // w, b // bt),  # j outer, i inner: weights resident per j
        in_specs=[
            pl.BlockSpec((rt, 2 * f), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4, w), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, 4, w), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((rt, w), lambda j, i: (i, j), memory_space=pltpu.VMEM)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * tpc) * (4 * f) * 4 * L,
            bytes_accessed=2 * (b * tpc) * (2 * f + L),
            transcendentals=0,
        ),
    )(xr, mt3, mb3, shift)
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
    variants = [(8, 1024), (16, 1024), (16, 512), (32, 512)]
    fns = {}
    for bt, w in variants:
        fn = jax.jit(partial(eval_v5, bt=bt, w=w))
        try:
            out = fn(x, kernel, cbias, gamma, beta, mean, var)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
            print(f"v5 bt={bt} w={w}: max abs diff vs XLA = {err:.3e}")
            fns[(bt, w)] = fn
        except Exception as e:  # noqa: BLE001 — VMEM OOM is expected for big blocks
            print(f"v5 bt={bt} w={w}: FAILED {type(e).__name__}: {str(e)[:120]}")

    timeit("XLA eval block1", xla_eval, x)
    for (bt, w), fn in fns.items():
        timeit(f"v5 bt={bt} w={w}", fn, x, kernel, cbias, gamma, beta, mean, var)


if __name__ == "__main__":
    main()
