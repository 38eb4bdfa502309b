"""On-TPU: fused-attention parity + block/full-model/MAST timings (scratch)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.mast import MASTEncoder
from audiossl_tpu.models.mvit import MViT, MViTConfig, MultiScaleAttention, MultiScaleBlock

B = 64


def timeit(fn, *args, iters=20):
    r = fn(*args); float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


# 1) on-device parity, single attention layer, f32 (stacked-block comparison
#    amplifies cross-compile reassociation noise chaotically — not a unit)
def attn(mode):
    return MultiScaleAttention(
        dim_out=96, num_heads=2, input_hw=(16, 32), kernel_q=(3, 3), kernel_kv=(3, 3),
        stride_q=(1, 1), stride_kv=(2, 2), qkv_bias=True, rel_pos_spatial=True,
        residual_pooling=True, dtype=None, fused=mode,
    )

x1 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 512, 96)), jnp.float32)
v1 = jax.jit(lambda: attn("off").init(jax.random.key(0), x1))()
a = jax.jit(lambda v, x: attn("off").apply(v, x)[0])(v1, x1)
bb = jax.jit(lambda v, x: attn("on").apply(v, x)[0])(v1, x1)
err = float(jnp.max(jnp.abs(a - bb)))
print(f"on-device f32 single-layer parity: max err {err:.3e}", flush=True)
assert err < 1e-3, err  # pooled inputs differ per-compile (conv fusion context); kernel-only parity is 1.5e-6

# 2) block timings, bf16, fused + shift-add pools
def bench_block(name, dim, hw, heads, stride_kv):
    block = MultiScaleBlock(
        dim=dim, dim_out=dim, num_heads=heads, input_hw=hw,
        mlp_ratio=4.0, qkv_bias=True, droppath=0.0,
        kernel_q=(3, 3), stride_q=(1, 1), kernel_kv=(3, 3), stride_kv=stride_kv,
        rel_pos_spatial=True, residual_pooling=True, dim_mul_in_att=True,
        dtype=jnp.bfloat16, fused="on",
    )
    xx = jnp.asarray(np.random.default_rng(0).standard_normal((B, hw[0] * hw[1], dim)), jnp.bfloat16)
    vs = jax.jit(lambda: block.init(jax.random.key(0), xx, False))()
    fwd = jax.jit(lambda v, x: jnp.sum(block.apply(v, x, False).astype(jnp.float32)))
    loss = lambda v, x: jnp.sum(block.apply(v, x, False).astype(jnp.float32))
    bwd = jax.jit(lambda v, x: jax.tree.reduce(lambda a, l: a + jnp.sum(jnp.abs(l)), jax.grad(loss)(v, x), 0.0))
    print(f"{name:24s} fwd {timeit(fwd, vs, xx):7.2f} ms   fwd+bwd {timeit(bwd, vs, xx):7.2f} ms", flush=True)


bench_block("s0 fused+gate", 96, (32, 256), 1, (4, 4))
bench_block("s2 fused+gate", 384, (8, 64), 4, (1, 1))

# 3) full MViT-base fwd, bf16 (32x256 grid geometry)
cfg = MViTConfig.base(compute_dtype=jnp.bfloat16, fused_attention="auto")
model = MViT(cfg, input_hw=(128, 1024), in_chans=1, final_norm=False)
xb = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 1024, 1)), jnp.float32)
vb = jax.jit(lambda: model.init(jax.random.key(0), xb, False))()
fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, False).astype(jnp.float32)))
dt = timeit(fwd, vb, xb)
print(f"MViT-base 32x256-grid fwd B={B}: {dt:.2f} ms  ({B/dt*1e3:.0f} clips/s)", flush=True)

# 4) MAST geometry (patch 16x16 stride 10 -> 101x12 grid), fused vs off
import dataclasses

import audiossl_tpu.models.mast as mastmod

orig = mastmod.mast_config
for mode in ("off", "auto"):
    mastmod.mast_config = (
        lambda *a, _m=mode, **k: dataclasses.replace(orig(*a, **k), fused_attention=_m)
    )
    enc = MASTEncoder(input_fdim=128, input_tdim=1024, model_size="base")
    xm = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 1024, 1)), jnp.float32)
    vm = jax.jit(lambda: enc.init(jax.random.key(0), xm, False))()
    fwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x, False)))
    loss = lambda v, x: jnp.sum(enc.apply(v, x, False))
    bwd = jax.jit(lambda v, x: jax.tree.reduce(lambda a, l: a + jnp.sum(jnp.abs(l)), jax.grad(loss)(v, x), 0.0))
    print(f"MAST-base 101x12-grid fused={mode}: fwd {timeit(fwd, vm, xm):7.2f} ms   fwd+bwd {timeit(bwd, vm, xm):7.2f} ms", flush=True)
    mastmod.mast_config = orig
