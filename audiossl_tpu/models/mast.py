"""MAST: spectrogram transformer = MViTv2 trunk with AST-style patchify.

Reference behavior (src/encoder/mast.py + extras/mast_new/mast/models_msn.py):
input log-fbank [B, 1, F, T] is transposed so time is the patch-grid H axis,
patchified by a 1-channel 16x16 conv with overlapping strides
(fstride=tstride=10, no padding — get_shape:175-181), run through the MViTv2
stages, and mean-pooled over tokens (mast.py:229; no cls token, the abs pos
embed and final norm are disabled in the reference forward). The SS-MAST
wrapper adds a Linear(768 -> output_dim) head (models_msn.py:167-173).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiossl_tpu.models.mvit import MViT, MViTConfig

VARIANTS = {
    "tiny": MViTConfig.tiny,
    "small": MViTConfig.small,
    "base": MViTConfig.base,
}


def mast_config(
    model_size: str = "base",
    fstride: int = 10,
    tstride: int = 10,
    compute_dtype=None,
    droppath_rate: float | None = None,
    fused_attention: str = "auto",
    pool_impl: str = "conv",
) -> MViTConfig:
    kw: dict = dict(
        patch_kernel=(16, 16),
        patch_stride=(tstride, fstride),  # H = time, W = freq after transpose
        patch_padding=(0, 0),
        use_abs_pos=False,
        cls_embed_on=False,
        compute_dtype=compute_dtype,
        fused_attention=fused_attention,
        pool_impl=pool_impl,
    )
    # MVIT.DROPPATH_RATE override (the reference's per-size yaml knob,
    # extras/mast_new/mast/configs/MVITv2_*.yaml); None keeps the variant
    # default (0.1 / 0.2 / 0.3 for T / S / B).
    if droppath_rate is not None:
        kw["droppath_rate"] = float(droppath_rate)
    return VARIANTS[model_size](**kw)


class MASTEncoder(nn.Module):
    """[B, F, T, 1] log-fbank -> [B, D] token-mean embedding."""

    input_fdim: int = 128
    input_tdim: int = 1024
    model_size: str = "base"
    fstride: int = 10
    tstride: int = 10
    remat: bool = False  # per-block activation checkpointing (MODEL.ACT_CHECKPOINT)
    # bf16 compute by default (same policy as AudioNTT: f32 norm stats,
    # f32 softmax, f32 output); set None for exact-f32
    compute_dtype: jnp.dtype | None = jnp.bfloat16
    droppath_rate: float | None = None  # None = variant default
    # "auto" | "on" | "off" for the fused Pallas rel-pos attention kernel;
    # GSPMD tensor parallelism requires "off" (parallel/tp_mvit.py)
    fused_attention: str = "auto"
    # "conv" | "unrolled" AttentionPool impl; tp requires "unrolled"
    # (grouped-conv filter-grad SPMD hazard, models/mvit.py)
    pool_impl: str = "conv"
    # PatchDrop (augmentations.py:64-79) is commented out of the reference MAST
    # forward (mast.py:208-217) — and token dropping is incompatible with
    # MViT's grid-structured pooled attention — so it is not wired in here;
    # ops.tokens.patch_drop provides the standalone op for plain-ViT users.

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # time on the H axis: [B, F, T, 1] -> [B, T, F, 1] (mast.py:191)
        x = jnp.swapaxes(x, 1, 2)
        cfg = mast_config(
            self.model_size,
            self.fstride,
            self.tstride,
            self.compute_dtype,
            droppath_rate=self.droppath_rate,
            fused_attention=self.fused_attention,
            pool_impl=self.pool_impl,
        )
        tokens = MViT(
            cfg,
            input_hw=(self.input_tdim, self.input_fdim),
            in_chans=1,
            name="mvit",
            final_norm=False,  # reference forward skips self.v.norm (mast.py:227)
            remat=self.remat,
        )(x, train)
        return jnp.mean(tokens.astype(jnp.float32), axis=1)


class MASTWithHead(nn.Module):
    """models_msn AudioNTT2020 wrapper: MAST + Linear(d -> output_dim)."""

    output_dim: int = 256
    input_fdim: int = 128
    input_tdim: int = 1024
    model_size: str = "base"
    remat: bool = False  # per-block activation checkpointing for big batches
    compute_dtype: jnp.dtype | None = jnp.bfloat16  # None = exact f32 trunk
    droppath_rate: float | None = None  # None = variant default
    fused_attention: str = "auto"  # "off" required under tensor parallelism
    pool_impl: str = "conv"  # "unrolled" required under tensor parallelism

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        z = MASTEncoder(
            input_fdim=self.input_fdim,
            input_tdim=self.input_tdim,
            model_size=self.model_size,
            remat=self.remat,
            compute_dtype=self.compute_dtype,
            droppath_rate=self.droppath_rate,
            fused_attention=self.fused_attention,
            pool_impl=self.pool_impl,
            name="mast",
        )(x, train)
        return nn.Dense(self.output_dim, name="mlp_fc1", dtype=z.dtype)(z)
