"""Apportion MViT-base step time across stages (scratch probe).

MViT-base on 128x1024 fbank: grid 32x256 -> stages
  s0: 2 blocks  L=8192 dim96  heads1 kv-stride(4,4)
  s1: 3 blocks  L=2048 dim192 heads2 kv-stride(2,2)
  s2: 16 blocks L=512  dim384 heads4 kv-stride(1,1) (kernel-3 pool, stride 1)
  s3: 3 blocks  L=128  dim768 heads8 kv-stride(1,1)
Times one representative (non-transition) block per stage, fwd and
fwd+bwd, B=64 bf16. Scalar-fetch timing per CLAUDE.md.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.mvit import MultiScaleBlock

B = 64
STAGES = {
    "s0_L8192_d96": dict(dim=96, dim_out=96, num_heads=1, input_hw=(32, 256), stride_kv=(4, 4)),
    "s1_L2048_d192": dict(dim=192, dim_out=192, num_heads=2, input_hw=(16, 128), stride_kv=(2, 2)),
    "s2_L512_d384": dict(dim=384, dim_out=384, num_heads=4, input_hw=(8, 64), stride_kv=(1, 1)),
    "s3_L128_d768": dict(dim=768, dim_out=768, num_heads=8, input_hw=(4, 32), stride_kv=(1, 1)),
}
N_BLOCKS = {"s0_L8192_d96": 2, "s1_L2048_d192": 3, "s2_L512_d384": 16, "s3_L128_d768": 3}


def bench_stage(name, kw, iters=20):
    block = MultiScaleBlock(
        mlp_ratio=4.0,
        qkv_bias=True,
        droppath=0.0,
        kernel_q=(),
        kernel_kv=(3, 3),
        stride_q=(),
        rel_pos_spatial=True,
        residual_pooling=True,
        dim_mul_in_att=True,
        dtype=jnp.bfloat16,
        **kw,
    )
    h, w = kw["input_hw"]
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, h * w, kw["dim"])), jnp.bfloat16
    )
    variables = jax.jit(lambda: block.init(jax.random.key(0), x, False))()

    fwd = jax.jit(lambda v, x: jnp.sum(block.apply(v, x, False).astype(jnp.float32)))
    loss = lambda v, x: jnp.sum(block.apply(v, x, False).astype(jnp.float32))
    bwd = jax.jit(lambda v, x: jax.tree.reduce(
        lambda a, l: a + jnp.sum(jnp.abs(l)), jax.grad(loss)(v, x), 0.0
    ))

    out = {}
    for tag, fn in (("fwd", fwd), ("fwd+bwd", bwd)):
        r = fn(variables, x)
        float(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(variables, x)
        float(r)
        dt = (time.perf_counter() - t0) / iters * 1e3
        out[tag] = dt
        print(f"{name:16s} {tag:8s} {dt:7.2f} ms  (x{N_BLOCKS[name]} blocks -> {dt*N_BLOCKS[name]:7.1f} ms)", flush=True)
    return out


if __name__ == "__main__":
    tot_f = tot_b = 0.0
    for name, kw in STAGES.items():
        r = bench_stage(name, kw)
        tot_f += r["fwd"] * N_BLOCKS[name]
        tot_b += r["fwd+bwd"] * N_BLOCKS[name]
    print(f"\nsum over 24 blocks: fwd {tot_f:.1f} ms   fwd+bwd {tot_b:.1f} ms  (B={B})")
