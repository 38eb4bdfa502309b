"""Ablate pieces of a stage-2 MViT block to find the cost center (scratch).

Real s2 blocks run q/k/v pools (3x3 depthwise, stride 1) + rel-pos.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.mvit import MultiScaleBlock

B = 64


def bench(name, blk_kwargs, dim, hw, iters=20):
    block = MultiScaleBlock(
        dim=dim, dim_out=dim, input_hw=hw,
        mlp_ratio=4.0, qkv_bias=True, droppath=0.0,
        residual_pooling=True, dim_mul_in_att=True, dtype=jnp.bfloat16,
        **blk_kwargs,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, hw[0] * hw[1], dim)), jnp.bfloat16)
    variables = jax.jit(lambda: block.init(jax.random.key(0), x, False))()
    fwd = jax.jit(lambda v, x: jnp.sum(block.apply(v, x, False).astype(jnp.float32)))
    r = fwd(variables, x); float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fwd(variables, x)
    float(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:7.2f} ms", flush=True)
    return dt


S2 = dict(dim=384, hw=(8, 64))
full = dict(num_heads=4, kernel_q=(3, 3), stride_q=(1, 1), kernel_kv=(3, 3), stride_kv=(1, 1), rel_pos_spatial=True)
bench("s2 FULL (q+kv pools, relpos)", full, **S2)
bench("s2 no q-pool", {**full, "kernel_q": (), "stride_q": ()}, **S2)
bench("s2 no kv-pool", {**full, "kernel_kv": (), "stride_kv": ()}, **S2)
bench("s2 no pools", {**full, "kernel_q": (), "stride_q": (), "kernel_kv": (), "stride_kv": ()}, **S2)
bench("s2 no pools, no relpos", {**full, "kernel_q": (), "stride_q": (), "kernel_kv": (), "stride_kv": (), "rel_pos_spatial": False}, **S2)
bench("s2 heads=1 (vs 4)", {**full, "num_heads": 1}, **S2)

S0 = dict(dim=96, hw=(32, 256))
f0 = dict(num_heads=1, kernel_q=(3, 3), stride_q=(1, 1), kernel_kv=(3, 3), stride_kv=(4, 4), rel_pos_spatial=True)
bench("s0 FULL", f0, **S0)
bench("s0 no relpos", {**f0, "rel_pos_spatial": False}, **S0)
bench("s0 no q-pool", {**f0, "kernel_q": (), "stride_q": ()}, **S0)
