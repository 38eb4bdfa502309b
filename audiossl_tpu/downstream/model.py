"""Downstream encoder + linear head (reference: src/downstream/downstream_encoder.py).

``finetune_layer == -1`` probes the final per-frame features (time-mean
pooled); 0/1/2 probe the per-block taps (already time-pooled, dims
2048/1024/512 — downstream_config.yaml:16). Note the reference's forward
applies ``mean(dim=1)`` to the 2-D taps, which would collapse the feature
axis (§2.5 defect); we use the pooled taps directly, as intended.

``num_classes == 0`` drops the linear head and returns the pooled
embedding itself — the feature-extraction / serving surface
(serve/export.py, downstream/extract_features.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiossl_tpu.models.audiontt import AudioNTT2020Task6


class DownstreamModel(nn.Module):
    n_mels: int
    d: int
    num_classes: int
    finetune_layer: int = -1
    axis_name: str | None = None
    encoder_type: str = "AudioNTT2020Task6"  # | Efficient_Net | MAST | AST
    input_tdim: int = 96  # frame count, needed by the transformer encoders
    model_size: str = "base"  # transformer variant (tiny | small | base)
    compute_dtype: jnp.dtype | None = None  # None = each encoder's default (bf16); f32 for exact serving parity
    # AudioNTT encoder dropout override (None = the encoder's 0.3 default,
    # src/encoder/audiontt.py's nn.Dropout(0.3)); 0.0 gives a deterministic
    # fine-tune forward (reference-equivalence harness, exact-parity eval)
    dropout_rate: float | None = None
    # PatchDrop ratio (reference src/augmentations/augmentations.py:64-79;
    # intended call site src/encoder/mast.py:208-217, commented out there).
    # Opt-in and AST-only: plain-ViT attention is permutation-safe over
    # tokens, MViT's grid-pooled attention is not (the reference's commented
    # draft would have broken its thw grid the same way).
    patch_drop: float = 0.0
    # fused-attention override for the AST encoder ("auto" | "on" | "off").
    # Tensor-parallel runs must pass "off": the Pallas kernel cannot be
    # partitioned by GSPMD (parallel/tp_ast.py module docstring).
    ast_fused_attention: str = "auto"

    @nn.compact
    def __call__(self, v: jax.Array, train: bool = False) -> jax.Array:
        if self.patch_drop > 0.0 and self.encoder_type != "AST":
            raise ValueError(
                f"patch_drop is AST-only (plain-ViT tokens); {self.encoder_type!r} "
                "uses grid-structured attention that cannot drop tokens "
                "(the reference leaves it commented out there too, "
                "src/encoder/mast.py:208-217)."
            )
        if self.dropout_rate is not None and self.encoder_type != "AudioNTT2020Task6":
            raise ValueError(
                f"dropout_rate override applies to the AudioNTT encoder only; "
                f"{self.encoder_type!r} uses droppath/attention-dropout knobs"
            )
        if self.encoder_type == "AudioNTT2020Task6":
            enc = AudioNTT2020Task6(
                n_mels=self.n_mels,
                d=self.d,
                return_all_layers=True,
                axis_name=self.axis_name,
                name="encoder",
                **({"compute_dtype": self.compute_dtype} if self.compute_dtype is not None else {}),
                **({"dropout_rate": self.dropout_rate} if self.dropout_rate is not None else {}),
            )
            l1, l2, l3, x = enc(v, train)
            h = jnp.mean(x, axis=1) if self.finetune_layer == -1 else (l1, l2, l3)[self.finetune_layer]
        elif self.encoder_type == "Efficient_Net":
            from audiossl_tpu.models.efficientnet import EfficientNetB0

            h = EfficientNetB0(axis_name=self.axis_name, name="encoder")(v, train)
        elif self.encoder_type == "MAST":
            from audiossl_tpu.models.mast import MASTEncoder

            h = MASTEncoder(
                input_fdim=self.n_mels, input_tdim=self.input_tdim,
                model_size=self.model_size, name="encoder",
                **({"compute_dtype": self.compute_dtype} if self.compute_dtype is not None else {}),
            )(v, train)
        elif self.encoder_type == "AST":
            import dataclasses

            from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

            cfg = dataclasses.replace(
                getattr(ASTConfig, self.model_size)(),
                fused_attention=self.ast_fused_attention,
            )
            h = ASTEncoder(
                input_fdim=self.n_mels, input_tdim=self.input_tdim,
                cfg=cfg, name="encoder",
                patch_drop=self.patch_drop,
                **({"compute_dtype": self.compute_dtype} if self.compute_dtype is not None else {}),
            )(v, train)
        else:
            raise NotImplementedError(f"unknown downstream encoder {self.encoder_type!r}")
        if self.num_classes == 0:
            return h
        return nn.Dense(self.num_classes, name="final", dtype=h.dtype)(h)
