"""Isolate what pins the eval block-1 kernel at ~4 ms (roofline says ~1.2).

Variants (same I/O shapes, same grid):
  dots-sum : 4 dots, epilogue = plain sum of quadrants (minimal VPU)
  dots-1   : 1 dot only, write it (quarter MXU work, minimal VPU)
  full     : dots + affine-shift + relu + max (the real kernel)
  matmul-xla: XLA [2*rows, 192] @ [192, 2048] for an MXU sanity floor
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiossl_tpu.ops import block1 as b1

B, T, F, C = 1024, 96, 64, 64
WARMUP, ITERS = 3, 30
RT = 512


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt*1e3:7.3f} ms")
    return dt


def _kern(xe_ref, xo_ref, ms_ref, sh_ref, out_ref, *, l, mode):
    sh = sh_ref[0:1, :]
    dot = lambda x, mh: jax.lax.dot_general(
        x, mh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if mode == "dots1":
        out_ref[:] = dot(xe_ref[:], ms_ref[:, :l]).astype(out_ref.dtype)
        return
    o = None
    for x_ref in (xe_ref, xo_ref):
        x = x_ref[:]
        for h in range(2):
            q = dot(x, ms_ref[:, h * l : (h + 1) * l])
            if mode == "sum":
                o = q if o is None else o + q
            else:
                y = jnp.maximum(q + sh, 0.0)
                o = y if o is None else jnp.maximum(o, y)
    out_ref[:] = o.astype(out_ref.dtype)


def run(x, ms, shift, mode):
    rows = x[0].shape[0]
    l = ms.shape[1] // 2
    (out,) = pl.pallas_call(
        partial(_kern, l=l, mode=mode),
        out_shape=[jax.ShapeDtypeStruct((rows, l), jnp.bfloat16)],
        grid=(rows // RT,),
        in_specs=[
            pl.BlockSpec((RT, ms.shape[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, ms.shape[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ms.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(shift.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((RT, l), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    )(x[0], x[1], ms, shift)
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    rows = B * T // 2
    xe = jnp.asarray(rng.standard_normal((rows, 3 * F)), jnp.bfloat16)
    xo = jnp.asarray(rng.standard_normal((rows, 3 * F)), jnp.bfloat16)
    ms = jnp.asarray(rng.standard_normal((3 * F, 2 * (F // 2) * C)), jnp.bfloat16)
    shift = jnp.zeros((8, (F // 2) * C), jnp.float32)

    for mode in ("full", "sum", "dots1"):
        timeit(f"kernel {mode}", jax.jit(partial(run, mode=mode)), (xe, xo), ms, shift)

    big = jnp.concatenate([xe, xo], axis=0)

    @jax.jit
    def matmul_xla(a, m):
        return (a @ m[:, : (F // 2) * C]).astype(jnp.bfloat16)

    timeit("XLA matmul (2 halves)", matmul_xla, big, ms)


if __name__ == "__main__":
    main()
