"""Where do MAST-geometry (101x12 grid) milliseconds go? (scratch)"""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import audiossl_tpu.models.mast as mastmod
from audiossl_tpu.models.mast import MASTEncoder
from audiossl_tpu.models.mvit import MViT, MViTConfig

B = 64


def timeit(fn, *args, iters=20):
    r = fn(*args); float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_model(name, model, x):
    vs = jax.jit(lambda: model.init(jax.random.key(0), x, False))()
    fwd = jax.jit(lambda v, x: jnp.sum(model.apply(v, x, False).astype(jnp.float32)))
    print(f"{name:34s} fwd {timeit(fwd, vs, x):7.2f} ms", flush=True)


xm = jnp.asarray(np.random.default_rng(0).standard_normal((B, 128, 1024, 1)), jnp.float32)

# full baseline
bench_model("MAST-base full", MASTEncoder(), xm)

# no rel-pos
orig = mastmod.mast_config
mastmod.mast_config = lambda *a, **k: dataclasses.replace(orig(*a, **k), rel_pos_spatial=False)
bench_model("MAST-base no relpos", MASTEncoder(), xm)
mastmod.mast_config = lambda *a, **k: dataclasses.replace(orig(*a, **k), pool_kv_stride_adaptive=None)
bench_model("MAST-base no kv pool", MASTEncoder(), xm)
mastmod.mast_config = orig


# patch_embed alone (16x16 stride-10 C_in=1 conv)
class PatchOnly(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = jnp.swapaxes(x, 1, 2)
        return nn.Conv(
            96, (16, 16), strides=(10, 10), padding=[(0, 0), (0, 0)],
            dtype=jnp.bfloat16, name="patch_embed",
        )(x)


bench_model("patch_embed alone", PatchOnly(), xm)


# trunk alone on ready tokens (skip patchify): feed [B, 101*12, 96]
class TrunkOnly(nn.Module):
    @nn.compact
    def __call__(self, t, train=False):
        cfg = mastmod.mast_config("base", compute_dtype=jnp.bfloat16)
        # reuse MViT but patchify on a pre-patchified token map: emulate by
        # a 1x1 patch conv over [B, 101, 12, 96]
        cfg = dataclasses.replace(cfg, patch_kernel=(1, 1), patch_stride=(1, 1), patch_padding=(0, 0))
        return MViT(cfg, input_hw=(101, 12), in_chans=96, final_norm=False)(t, train)


tok = jnp.asarray(np.random.default_rng(1).standard_normal((B, 101, 12, 96)), jnp.float32)
bench_model("trunk alone (1x1 patchify)", TrunkOnly(), tok)
