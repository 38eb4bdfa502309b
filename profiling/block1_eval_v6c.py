"""v6c: isolate why the real-weights kernel (4.1 ms) misses diag3-full (2.0 ms).

Deltas bisected here, one toggle each off a diag3-exact base:
  base      — diag3's 3-operand kernel verbatim, REAL packed weights,
              no shift, no reshape (numerically = eval minus the BN shift)
  +shep     — 4th [8, L] shift operand, applied ONCE after the quadrant
              max (relu(max_q y_q + sh) == max_q relu(y_q + sh)) — the
              numerically complete kernel with minimal epilogue
  +reshape  — epilogue reshape [b*tpc, L] -> [B, tpc, F/2, C] inside jit
  hostpack  — weights packed on host numpy (default layout) vs jit-packed
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


def _kernel(x_ref, mt_ref, mb_ref, *rest, tpc, shep):
    if shep:
        sh_ref, out_ref = rest
    else:
        (out_ref,) = rest
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
    if shep:
        o = jnp.maximum(o + sh_ref[0:1, :], 0.0)
    else:
        o = jnp.maximum(o, 0.0)
    out_ref[:] = o.astype(out_ref.dtype)


def run(xr, mt, mb, shift, bt, shep, reshape):
    rt = bt * (T // 2)
    in_specs = [
        pl.BlockSpec((rt, 2 * F), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * F, 4 * L), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [xr, mt, mb]
    if shep:
        in_specs.append(pl.BlockSpec((8, L), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(shift)
    (out,) = pl.pallas_call(
        partial(_kernel, tpc=T // 2, shep=shep),
        out_shape=[jax.ShapeDtypeStruct((xr.shape[0], L), xr.dtype)],
        grid=(B // bt,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((rt, L), lambda i: (i, 0), memory_space=pltpu.VMEM)],
    )(*args)
    if reshape:
        out = out.reshape(B, T // 2, F // 2, C)
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
    # host-packed twins with guaranteed default layouts
    mt_h = jnp.asarray(np.asarray(mt))
    mb_h = jnp.asarray(np.asarray(mb))
    sh_h = jnp.asarray(np.asarray(shift))
    xr = x.reshape(B * (T // 2), 2 * F)

    out = jax.jit(partial(run, bt=4, shep=True, reshape=True))(xr, mt, mb, shift)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"complete (+shep +reshape) bt=4: max abs diff vs XLA = {err:.3e}")

    timeit("XLA eval block1", xla_eval, x)
    grid = [
        ("base bt=4", dict(bt=4, shep=False, reshape=False), (xr, mt, mb, sh_h)),
        ("base bt=8", dict(bt=8, shep=False, reshape=False), (xr, mt, mb, sh_h)),
        ("base+shep bt=4", dict(bt=4, shep=True, reshape=False), (xr, mt, mb, shift)),
        ("base+shep bt=8", dict(bt=8, shep=True, reshape=False), (xr, mt, mb, shift)),
        ("shep+reshape bt=4", dict(bt=4, shep=True, reshape=True), (xr, mt, mb, shift)),
        ("shep+reshape bt=8", dict(bt=8, shep=True, reshape=True), (xr, mt, mb, shift)),
        ("hostpack base bt=4", dict(bt=4, shep=False, reshape=False), (xr, mt_h, mb_h, sh_h)),
        ("hostpack shep+reshape bt=4", dict(bt=4, shep=True, reshape=True), (xr, mt_h, mb_h, sh_h)),
    ]
    for name, kw, args in grid:
        try:
            timeit(name, jax.jit(partial(run, **kw)), *args)
        except Exception as e:  # noqa: BLE001 — VMEM OOM expected at big bt
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
