"""Bisect why the wrapped eval kernel (block1_eval_tuned.eval_fused, 4.05 ms)
is 2x slower than the bare kernel on pre-staged streams (2.07 ms).

Axes: streams built in-jit vs pre-staged; cost_estimate present vs absent.
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
L = (F // 2) * C


def timeit(name, fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    print(f"{name:40s} {(time.perf_counter() - t0) / ITERS * 1e3:7.3f} ms")


def _kern(xe_ref, xo_ref, ms_ref, sh_ref, out_ref):
    sh = sh_ref[0:1, :]
    o = None
    for x_ref in (xe_ref, xo_ref):
        x = x_ref[:]
        for h in range(2):
            q = jax.lax.dot_general(
                x, ms_ref[:, h * L : (h + 1) * L], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = jnp.maximum(q + sh, 0.0)
            o = y if o is None else jnp.maximum(o, y)
    out_ref[:] = o.astype(out_ref.dtype)


def call_kernel(xe, xo, ms, shift, cost):
    rows = xe.shape[0]
    kw = {}
    if cost:
        kw["cost_estimate"] = pl.CostEstimate(
            flops=2 * rows * 2 * (3 * F) * L,
            bytes_accessed=2 * (2 * rows * 3 * F + rows * L),
            transcendentals=0,
        )
    (out,) = pl.pallas_call(
        _kern,
        out_shape=[jax.ShapeDtypeStruct((rows, L), jnp.bfloat16)],
        grid=(rows // RT,),
        in_specs=[
            pl.BlockSpec((RT, 3 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 3 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * F, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((RT, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        **kw,
    )(xe, xo, ms, shift)
    return out


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, F)), jnp.bfloat16)
    rows = B * T // 2
    xe0 = jnp.asarray(rng.standard_normal((rows, 3 * F)), jnp.bfloat16)
    xo0 = jnp.asarray(rng.standard_normal((rows, 3 * F)), jnp.bfloat16)
    ms0 = jnp.asarray(rng.standard_normal((3 * F, 2 * L)), jnp.bfloat16)
    sh0 = jnp.zeros((8, L), jnp.float32)

    @partial(jax.jit, static_argnames=("cost",))
    def pre(xe, xo, ms, sh, cost=False):
        return call_kernel(xe, xo, ms, sh, cost)

    @partial(jax.jit, static_argnames=("cost",))
    def injit(x, ms, sh, cost=False):
        xe, xo, n_valid = b1.block1_streams(x, RT)
        out = call_kernel(xe, xo, ms, sh, cost)
        return out[:n_valid].reshape(B, T // 2, F // 2, C)

    timeit("pre-staged, no cost_estimate", partial(pre, cost=False), xe0, xo0, ms0, sh0)
    timeit("pre-staged, with cost_estimate", partial(pre, cost=True), xe0, xo0, ms0, sh0)
    timeit("in-jit streams, no cost_estimate", partial(injit, cost=False), x, ms0, sh0)
    timeit("in-jit streams, with cost_estimate", partial(injit, cost=True), x, ms0, sh0)

    @jax.jit
    def streams_only(x):
        xe, xo, _ = b1.block1_streams(x, RT)
        return jnp.sum(xe.astype(jnp.float32)) + jnp.sum(xo.astype(jnp.float32))

    timeit("block1_streams alone (+f32 sums)", streams_only, x)


if __name__ == "__main__":
    main()
