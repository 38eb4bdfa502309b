"""Final bisect of the in-kernel block-1 eval cost.

v4a (rolls + 4 split-K dots + epilogue) = 4.15 ms; same dots on pre-staged
streams = 2.03 ms. Isolate per-step costs:
  A. DMA floor: kernel writes a constant          -> input/output DMA + launch
  B. dots only: no rolls, reuse xs1 for all taps  -> + MXU work
  C. rolls only: rolls + masks, out = xs0+xs2 sum -> + roll cost, no MXU
All timing-only (B/C numerically wrong).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, F = 1024, 96, 64
L = 2048
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
    print(f"{name:44s} {dt*1e3:7.3f} ms")
    return dt


def _kernel(x_ref, mt_ref, mb_ref, out_ref, *, tpc, mode):
    xs1 = x_ref[:]
    n = xs1.shape[0]
    if mode == "dma":
        s = jnp.sum(xs1.astype(jnp.float32), axis=1, keepdims=True)  # [n, 1]
        out_ref[:] = jnp.broadcast_to(s, out_ref.shape).astype(out_ref.dtype)
        return
    if mode in ("rolls", "full"):
        xf = xs1.astype(jnp.float32)
        tr = jax.lax.broadcasted_iota(jnp.int32, xs1.shape, 0) % tpc
        xs0 = jnp.where(tr == 0, 0, pltpu.roll(xf, 1, 0)).astype(xs1.dtype)
        xs2 = jnp.where(tr == tpc - 1, 0, pltpu.roll(xf, n - 1, 0)).astype(xs1.dtype)
    else:  # dots: skip rolls
        xs0 = xs1
        xs2 = xs1
    if mode == "rolls":
        s = (xs0.astype(jnp.float32) + xs2.astype(jnp.float32))[:, :128]
        out_ref[:] = jnp.broadcast_to(s[:, :1], out_ref.shape).astype(out_ref.dtype)
        return
    dot = partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    mt, mb = mt_ref[:], mb_ref[:]
    o = None
    for a_op, b_op, ks in ((xs0, xs1, 0), (xs1, xs2, 1)):
        y = dot(a_op, mt[:, ks * 2 * L : (ks + 1) * 2 * L]) + dot(
            b_op, mb[:, ks * 2 * L : (ks + 1) * 2 * L]
        )
        for h in range(2):
            z = jnp.maximum(y[:, h * L : (h + 1) * L], 0.0)
            o = z if o is None else jnp.maximum(o, z)
    out_ref[:] = o.astype(out_ref.dtype)


def run(x, mt, mb, bt, mode):
    b = B
    tpc = T // 2
    xr = x.reshape(b * tpc, 2 * F)
    (out,) = pl.pallas_call(
        partial(_kernel, tpc=tpc, mode=mode),
        out_shape=[jax.ShapeDtypeStruct((b * tpc, L), x.dtype)],
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt * tpc, 2 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((bt * tpc, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    )(xr, mt, mb)
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.bfloat16)
    mt = jnp.asarray(rng.standard_normal((2 * F, 4 * L)), jnp.bfloat16)
    mb = jnp.asarray(rng.standard_normal((2 * F, 4 * L)), jnp.bfloat16)
    for mode in ("dma", "dots", "rolls", "full"):
        for bt in (4, 8):
            timeit(
                f"{mode} bt={bt}",
                jax.jit(partial(run, bt=bt, mode=mode)),
                x, mt, mb,
            )


if __name__ == "__main__":
    main()
