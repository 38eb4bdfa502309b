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

    @staticmethod
    def tiny() -> "ASTConfig":
        return ASTConfig(embed_dim=192, num_heads=3)

    @staticmethod
    def small() -> "ASTConfig":
        return ASTConfig(embed_dim=384, num_heads=6)

    @staticmethod
    def base() -> "ASTConfig":
        return ASTConfig()


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    dropout: float

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout, deterministic=not train, dtype=h.dtype
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
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

        for i in range(cfg.depth):
            x = ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.dropout, name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=jnp.float32)(x)
        return (x[:, 0] + x[:, 1]) / 2.0
