"""AST: the original (plain-ViT/DeiT) Audio Spectrogram Transformer.

Reference lineage: extras/mast_new/mast/models/{ast_work.py,
ast_models_pre_train.py} — DeiT-style ViT with cls + distillation tokens,
1-channel 16x16 patchify with overlapping (fstride, tstride) strides,
learned positional embedding sized to the patch grid, output = mean of the
cls and dist tokens. Variants tiny/small/base = 192/384/768 wide, depth 12,
heads 3/6/12 (the public AST "tiny224/small224/base384" family).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiossl_tpu.ops.attention import fused_rel_attention


@dataclasses.dataclass(frozen=True)
class ASTConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    fstride: int = 10
    tstride: int = 10
    patch: int = 16
    dropout: float = 0.0
    # fused attention kernel (ops/attention.py, no-bias mode): AST's plain
    # ViT attention materializes a [L, L] score matrix (L ~ 1.2k tokens at
    # the 128x1024 fbank geometry) that the kernel keeps in VMEM.
    # "auto" = on-TPU when L*L is large; "on" forces (interpret off-TPU).
    fused_attention: str = "auto"

    @staticmethod
    def tiny() -> "ASTConfig":
        return ASTConfig(embed_dim=192, num_heads=3)

    @staticmethod
    def small() -> "ASTConfig":
        return ASTConfig(embed_dim=384, num_heads=6)

    @staticmethod
    def base() -> "ASTConfig":
        return ASTConfig()


def _fused_attention_fn(interpret: bool):
    """flax MultiHeadDotProductAttention attention_fn -> fused kernel.

    Runs single-pass MXU dots with f32 accumulation (kernel f32=False):
    the flax default path it replaces uses JAX's DEFAULT matmul precision,
    which is also a single bf16 pass on TPU for f32 operands — HIGHEST
    here was measured 1.5x slower end-to-end with no baseline to match.
    Softmax stays f32 in the kernel either way.
    """

    def fn(query, key, value, **kwargs):
        # [B, L, H, Dh] each; flax scales q inside its default fn, so the
        # adapter applies the same 1/sqrt(Dh) via the kernel's scale arg.
        # On hardware, operands are cast bf16 up front — the MXU truncates
        # them to bf16 either way under DEFAULT precision, and the cast
        # halves the kernel's VMEM/HBM bytes (f32 accumulation unchanged).
        b, l, h, dh = query.shape
        dt = query.dtype if interpret else jnp.bfloat16
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, l, dh).astype(dt)
        out = fused_rel_attention(
            fold(query), fold(key), fold(value), None, None, dh**-0.5, False, interpret
        )
        return out.astype(query.dtype).reshape(b, h, l, dh).transpose(0, 2, 1, 3)

    return fn


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    dropout: float
    fused: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        l = x.shape[1]
        # same size gate as MViT (models/mvit.py), plus train-only: the
        # kernel's win is the backward pass (no [L, L] residuals/score
        # rematerialization — 1.64x on AST-base fwd+bwd at B=16, PERF.md)
        # while XLA's fused forward is on par, so inference keeps the XLA
        # path. Attention dropout would need in-kernel masking → also XLA.
        engage = self.fused == "on" or (
            self.fused == "auto"
            and jax.default_backend() == "tpu"
            and l * l >= 1 << 18
            and train
            and self.dropout == 0.0
        )
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=h.dtype,
            attention_fn=_fused_attention_fn(interpret=jax.default_backend() != "tpu")
            if engage
            else nn.dot_product_attention,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=h.dtype)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=h.dtype)(h)
        return x + h


class ASTEncoder(nn.Module):
    """[B, F, T, 1] log-fbank -> [B, embed_dim] ((cls + dist) / 2)."""

    input_fdim: int = 128
    input_tdim: int = 1024
    cfg: ASTConfig = ASTConfig()
    # None keeps the input's dtype (historical behavior); set f32/bf16 to
    # force the trunk compute dtype regardless of the caller's input —
    # serve/export.py --dtype relies on this being honored (ADVICE r2).
    compute_dtype: jnp.dtype | None = None
    # PatchDrop ratio (reference src/augmentations/augmentations.py:64-79,
    # intended call site src/encoder/mast.py:208-217 — commented out there).
    # Opt-in, train-only: after patchify + pos-embed, a random
    # floor(N*(1-ratio)) subset of PATCH tokens is kept per sample; the cls
    # and dist tokens always survive. Static keep-count keeps shapes
    # jit-friendly. Plain-ViT attention is permutation-safe over tokens;
    # MViT's grid-pooled attention is not, which is why MAST leaves this
    # off (models/mast.py:51-55) exactly as the reference does.
    patch_drop: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        x = jnp.swapaxes(x, 1, 2)  # time on H like the MAST patchify
        x = nn.Conv(
            cfg.embed_dim,
            (cfg.patch, cfg.patch),
            strides=(cfg.tstride, cfg.fstride),
            padding="VALID",
            name="patch_embed",
            dtype=x.dtype,
        )(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c))
        dist = self.param("dist_token", nn.initializers.truncated_normal(0.02), (1, 1, c))
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02), (1, h * w + 2, c))
        x = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), jnp.tile(dist, (b, 1, 1)), x], axis=1
        )
        x = x + pos

        if self.patch_drop > 0.0 and train:
            from audiossl_tpu.ops.tokens import patch_drop

            # dedicated rng stream when provided, else fold out of "dropout"
            # (the stream every trainer already threads)
            stream = "patch_drop" if self.has_rng("patch_drop") else "dropout"
            kept = patch_drop(x[:, 2:], self.make_rng(stream), self.patch_drop)
            x = jnp.concatenate([x[:, :2], kept], axis=1)

        if cfg.fused_attention not in ("auto", "on", "off"):
            raise ValueError(f"fused_attention must be auto|on|off, got {cfg.fused_attention!r}")
        for i in range(cfg.depth):
            x = ViTBlock(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.dropout,
                fused=cfg.fused_attention, name=f"block{i}",
            )(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=jnp.float32)(x)
        return (x[:, 0] + x[:, 1]) / 2.0
