"""v8: last shot at the eval block-1 layout tax — write the 4-D consumer
layout from inside the kernel via explicit per-f2 lane slices.

Mosaic rejects o.reshape(rt, 32, 64) / (bt, tpc, 32, 64) (split-lane
reshape, v7). Here the 4-D out tile [bt, tpc, 32, 64] is filled one f2 at
a time: out_ref[:, :, f2, :] = o[:, f2*64:(f2+1)*64].reshape(bt, tpc, 64)
— lane slicing + a major-dim (sublane) split, both things Mosaic can do.
32 VMEM-local vector copies per block vs the 1.6 ms XLA HBM relayout.
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
from profiling.block1_eval_v6 import pack_weights

B, T, F, C = 1024, 96, 64, 64
L = (F // 2) * C
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


def _kernel(x_ref, mt_ref, mb_ref, sh_ref, out_ref, *, tpc, bt):
    xs1 = x_ref[:]
    n = xs1.shape[0]
    xf = xs1.astype(jnp.float32)
    tr = jax.lax.broadcasted_iota(jnp.int32, xs1.shape, 0) % tpc
    xs0 = jnp.where(tr == 0, 0, pltpu.roll(xf, 1, 0)).astype(xs1.dtype)
    xs2 = jnp.where(tr == tpc - 1, 0, pltpu.roll(xf, n - 1, 0)).astype(xs1.dtype)
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mt, mb = mt_ref[:], mb_ref[:]
    lw = mt.shape[1] // 2
    o = None
    for ks, (a_op, b_op) in enumerate(((xs0, xs1), (xs1, xs2))):
        y = dot(a_op, mt[:, ks * lw : (ks + 1) * lw]) + dot(
            b_op, mb[:, ks * lw : (ks + 1) * lw]
        )
        for h in range(2):
            yh = y[:, h * L : (h + 1) * L]
            o = yh if o is None else jnp.maximum(o, yh)
    o = jnp.maximum(o + sh_ref[0:1, :], 0.0).astype(out_ref.dtype)
    c = out_ref.shape[-1]
    for f2 in range(out_ref.shape[2]):
        out_ref[:, :, f2, :] = o[:, f2 * c : (f2 + 1) * c].reshape(bt, tpc, c)


def run(xr, mt, mb, shift, bt):
    tpc = T // 2
    rt = bt * tpc
    (out,) = pl.pallas_call(
        partial(_kernel, tpc=tpc, bt=bt),
        out_shape=[jax.ShapeDtypeStruct((B, tpc, F // 2, C), xr.dtype)],
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((rt, 2 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, tpc, F // 2, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        ],
    )(xr, mt, mb, shift)
    return out


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

    mt, mb, shift = jax.jit(partial(pack_weights, f=F, dtype=x.dtype))(
        kernel, cbias, gamma, beta, mean, var
    )
    mt, mb, shift = jax.block_until_ready((mt, mb, shift))
    xr = x.reshape(B * (T // 2), 2 * F)

    timeit("XLA eval block1", xla_eval, x)
    for bt in (4, 8):
        try:
            fn = jax.jit(partial(run, bt=bt))
            out = fn(xr, mt, mb, shift)
            err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
            print(f"v8 bt={bt}: max abs diff vs XLA = {err:.3e}")
            timeit(f"v8 bt={bt}", fn, xr, mt, mb, shift)
        except Exception as e:  # noqa: BLE001 — Mosaic may reject the slice-store
            print(f"v8 bt={bt}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
