"""Tuned eval-only block-1 kernel variants vs XLA and the train `_apply`.

block1_eval_ab.py measured: XLA eval 3.555 ms (HBM-bound on the 805 MB conv
activation round-trip), train `_apply` at eval params 4.09 ms (f32 [rt, 4096]
intermediates leave no VMEM for double buffering; rt=1024 OOMs scoped vmem).
Roofline says a pooled-output kernel should run ~1 ms. Variants here:

  V1: per-half dots (live f32 [rt, 2048] instead of [rt, 4096]), BN scale
      folded into the banded matrix columns (a >= 0 not required — the fold
      is exact), bf16 epilogue (add shift, relu, max-accumulate in bf16).
  V2: V1 with f32 epilogue (isolate the bf16-epilogue effect).

Run on the real chip.
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


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:46s} {dt*1e3:7.3f} ms  {B/dt:10,.0f} clips/s")
    return dt


def _eval_kernel(xe_ref, xo_ref, ms_ref, shift_ref, out_ref, *, l, bf16_epi):
    """ms = banded matrix with BN scale folded per column ([3F, 2L]);
    shift row 0 = bapp per column ([1, L] broadcast over both halves)."""
    sh = shift_ref[0:1, :]
    o = None
    for x_ref in (xe_ref, xo_ref):
        x = x_ref[:]
        for h in range(2):
            q = jax.lax.dot_general(
                x, ms_ref[:, h * l : (h + 1) * l], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if bf16_epi:
                y = jnp.maximum(q.astype(jnp.bfloat16) + sh.astype(jnp.bfloat16), 0)
            else:
                y = jnp.maximum(q + sh, 0.0)
            o = y if o is None else jnp.maximum(o, y)
    out_ref[:] = o.astype(out_ref.dtype)


def eval_fused(x, kernel, cbias, gamma, beta, mean, var, rt, bf16_epi):
    f = x.shape[-1]
    c = kernel.shape[-1]
    xe, xo, n_valid = b1.block1_streams(x, rt)
    m = b1.banded_matrix(kernel, f, jnp.float32)  # [3F, 2L] f32
    istd = jax.lax.rsqrt(var + b1.BN_EPS)
    a = (gamma * istd).astype(jnp.float32)  # per channel
    l = m.shape[1] // 2
    a_col = jnp.tile(a, (l // c,))  # [L], column = (f_half, c)
    bapp = jnp.tile(beta - (mean - cbias) * a, (l // c,))  # fold conv bias in
    ms = (m.reshape(3 * f, 2, l) * a_col[None, None, :]).reshape(3 * f, 2 * l)
    ms = ms.astype(x.dtype)
    shift = jnp.broadcast_to(bapp.astype(jnp.float32)[None, :], (8, l))
    n_rows = xe.shape[0]
    (pooled,) = (
        pl.pallas_call(
            partial(_eval_kernel, l=l, bf16_epi=bf16_epi),
            out_shape=[jax.ShapeDtypeStruct((n_rows, l), x.dtype)],
            grid=(n_rows // rt,),
            in_specs=[
                pl.BlockSpec((rt, 3 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((rt, 3 * f), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * f, 2 * l), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((rt, l), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n_rows * 2 * (3 * f) * l,
                bytes_accessed=2 * (2 * n_rows * 3 * f + n_rows * l),
                transcendentals=0,
            ),
        )(xe, xo, ms, shift)
    )
    return pooled[:n_valid].reshape(x.shape[0], x.shape[1] // 2, f // 2, c)


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

    fns = {}
    for rt in (256, 512):
        for epi in (True, False):
            fns[f"V{'1' if epi else '2'} rt={rt}"] = jax.jit(
                partial(eval_fused, rt=rt, bf16_epi=epi)
            )

    a = xla_eval(x)
    for name, fn in fns.items():
        out = fn(x, kernel, cbias, gamma, beta, mean, var)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
        print(f"{name}: max abs diff vs XLA = {err:.3e}")

    timeit("XLA eval block1", xla_eval, x)
    for name, fn in fns.items():
        timeit(f"tuned {name}", fn, x, kernel, cbias, gamma, beta, mean, var)


if __name__ == "__main__":
    main()
