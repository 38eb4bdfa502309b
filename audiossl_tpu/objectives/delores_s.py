"""DeLoRes-S: single shared encoder + Barlow-Twins decorrelation.

Reference behavior: src/upstream/delores_s/upstream_expert.py:191-203 —
both views through one AudioNTT encoder, max+mean temporal pooling
(upstream_encoder.py:26-28), a 2048->2048->2048->2048 projector, Barlow
cross-correlation loss. The cross-correlation matrix is psum'd across the
data mesh (the all_reduce of extras/delores-s/models_byol.py:112).
"""
from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn
from flax.core import FrozenDict

from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.models.heads import MLPProjector, barlow_loss
from audiossl_tpu.objectives.api import LossAux, register


class _Net(nn.Module):
    n_mels: int
    d: int
    projection_dim: int
    axis_name: str | None
    encoder_type: str = "AudioNTT2020Task6"
    # f32 override for exact-parity runs vs the reference trainer
    # (tests/test_reference_equiv.py); bf16 stays the TPU training default
    compute_dtype: Any = None
    dropout_rate: float | None = None

    @nn.compact
    def __call__(self, v: jax.Array, train: bool) -> jax.Array:
        dtype_kw = {"compute_dtype": self.compute_dtype} if self.compute_dtype is not None else {}
        if self.encoder_type == "Efficient_Net":
            # EfficientNet-Barlow variant (extras/delores-s/models.py:7-40):
            # pooled 1280-d features straight into the projector
            from audiossl_tpu.models.efficientnet import EfficientNetB0

            y = EfficientNetB0(axis_name=self.axis_name, name="encoder")(v, train)
        elif self.encoder_type == "AudioNTT2020Task6":
            enc = AudioNTT2020Task6(
                n_mels=self.n_mels, d=self.d, axis_name=self.axis_name, name="encoder",
                **dtype_kw,
                **({"dropout_rate": self.dropout_rate} if self.dropout_rate is not None else {}),
            )
            y = max_mean_pool(enc(v, train))
        else:
            raise NotImplementedError(
                f"DeLoRes-S supports AudioNTT2020Task6 | Efficient_Net, got {self.encoder_type!r}"
            )
        proj = MLPProjector(
            hidden=self.projection_dim, out=self.projection_dim,
            axis_name=self.axis_name, name="projector", **dtype_kw,
        )
        return proj(y, train)


@register("delores_s")
class DeloresS:
    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.lambd = float(pre.get("lambda_barlow", 5e-5) or 0.0)
        self.scale_loss = 1.0 / 32.0
        self.axis_name = axis_name
        enc_cfg = pre["base_encoder"]
        import jax.numpy as jnp

        self.net = _Net(
            n_mels=int(pre["input"]["n_mels"]),
            d=int(enc_cfg["output_dim"]),
            projection_dim=int(pre.get("projection_dim", 2048)),
            axis_name=axis_name,
            encoder_type=str(enc_cfg.get("type", "AudioNTT2020Task6")),
            compute_dtype=jnp.dtype(enc_cfg["compute_dtype"]) if enc_cfg.get("compute_dtype") else None,
            dropout_rate=float(enc_cfg["dropout"]) if enc_cfg.get("dropout") is not None else None,
        )

    def init(self, key: jax.Array, sample_views):
        kp, kd = jax.random.split(key)
        variables = self.net.init({"params": kp, "dropout": kd}, sample_views[0], train=True)
        return variables["params"], variables.get("batch_stats", FrozenDict()), ()

    def loss(self, params, batch_stats, ssl_state, views, key, train=True, axis_name=None):
        axis = axis_name if axis_name is not None else None
        v1, v2 = views
        k1, k2 = jax.random.split(key)
        z1, mut1 = self.net.apply(
            {"params": params, "batch_stats": batch_stats}, v1, train, rngs={"dropout": k1}, mutable=["batch_stats"]
        )
        z2, mut2 = self.net.apply(
            {"params": params, "batch_stats": mut1["batch_stats"]}, v2, train, rngs={"dropout": k2}, mutable=["batch_stats"]
        )
        loss = barlow_loss(z1, z2, self.lambd, self.scale_loss, axis_name=axis, variant="src")
        return loss, LossAux(batch_stats=mut2["batch_stats"], ssl_state=ssl_state, metrics={"train_loss": loss})

    def encoder_variables(self, params, batch_stats):
        return {
            "params": params["encoder"],
            "batch_stats": batch_stats["encoder"] if "encoder" in batch_stats else FrozenDict(),
        }
