"""UnFuSeD / SSSD: pseudo-label distillation over encoder layer taps.

Reference behavior: src/upstream/unfused/upstream_expert.py:126-168 — a
single encoder (no siamese pair); each layer tap goes through a Project MLP
sized to the pseudo-label count; losses:

    CE   = alpha * sum_i CE(p_i(tap_i), y)  +  CE(classifier(pooled), y)
    KL   = beta  * sum_i KL(log_softmax(p_i) || softmax(classifier))
    MSE  = gamma * sum_i (2 - 2 cos(p_i, classifier))   (loss_fn_mse, utils.py:191-197)

Labels are DECAR cluster IDs carried in the pretraining CSV (SURVEY.md §3.5).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.models.heads import MLPProjector
from audiossl_tpu.objectives.api import LossAux, register
from audiossl_tpu.ops.stats import l2_normalize


class EncoderUnfused(nn.Module):
    """UNFUSED wrapper (upstream_encoder.py:4-26): pooled final + raw taps."""

    n_mels: int
    d: int
    axis_name: str | None
    compute_dtype: Any = None  # None = AudioNTT default (bf16); f32 for exact parity
    dropout_rate: float | None = None

    @nn.compact
    def __call__(self, v: jax.Array, train: bool):
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
        return max_mean_pool(x), (l1, l2, l3)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(jax.nn.logsumexp(logits, axis=1) - jnp.take_along_axis(logits, labels[:, None], 1)[:, 0])


def kl_batchmean(log_pred: jax.Array, target_probs: jax.Array) -> jax.Array:
    """torch nn.KLDivLoss(reduction='batchmean') semantics."""
    t = target_probs
    elt = jnp.where(t > 0, t * (jnp.log(jnp.maximum(t, 1e-20)) - log_pred), 0.0)
    return jnp.sum(elt) / log_pred.shape[0]


def cosine_mse(x: jax.Array, y: jax.Array) -> jax.Array:
    """loss_fn_mse: mean(2 - 2 cos_sim) on L2-normalized rows.

    eps=1e-6 (vs torch's 1e-12): projector rows can collapse to ~0 early in
    training and the normalize backward scales as 1/eps there; 1e-6 keeps
    value parity (row norms in practice are ≫ 1e-6) with f32-safe gradients.
    """
    return jnp.mean(
        2.0 - 2.0 * jnp.sum(l2_normalize(x, eps=1e-6) * l2_normalize(y, eps=1e-6), axis=-1)
    )


@register("unfused")
class Unfused:
    labeled = True  # consumes (view, label) batches

    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.axis_name = axis_name
        self.num_classes = int(pre["task_label"])
        self.alpha = float(pre.get("alpha", 0.7))
        self.beta = float(pre.get("beta", 0.3))
        self.gamma = float(pre.get("gamma", 0.003))
        self.tap_dims = (2048, 1024, 512)
        enc_cfg = pre["base_encoder"]
        compute_dtype = jnp.dtype(enc_cfg["compute_dtype"]) if enc_cfg.get("compute_dtype") else None
        self.encoder = EncoderUnfused(
            n_mels=int(pre["input"]["n_mels"]),
            d=int(enc_cfg["output_dim"]),
            axis_name=axis_name,
            compute_dtype=compute_dtype,
            dropout_rate=float(enc_cfg["dropout"]) if enc_cfg.get("dropout") is not None else None,
        )
        self.projectors = [
            MLPProjector(
                hidden=self.num_classes,
                out=self.num_classes,
                axis_name=axis_name,
                **({"compute_dtype": compute_dtype} if compute_dtype is not None else {}),
            )
            for _ in self.tap_dims
        ]

    def init(self, key: jax.Array, sample_views):
        keys = jax.random.split(key, 6)
        enc_vars = self.encoder.init({"params": keys[0], "dropout": keys[1]}, sample_views[0], False)
        params = {"encoder": enc_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", FrozenDict())}
        b = sample_views[0].shape[0]
        for i, (proj, d) in enumerate(zip(self.projectors, self.tap_dims), 1):
            pv = proj.init(keys[1 + i], jnp.zeros((b, d), jnp.float32), train=False)
            params[f"p{i}"] = pv["params"]
            batch_stats[f"p{i}"] = pv.get("batch_stats", FrozenDict())
        clf = nn.Dense(self.num_classes)
        d = self.encoder.d  # pooled feature width (reference hardcodes 2048)
        params["classifier"] = clf.init(keys[5], jnp.zeros((b, d), jnp.float32))["params"]
        return params, batch_stats, ()

    def loss(self, params, batch_stats, ssl_state, views, key, train=True, axis_name=None):
        v1, labels = views[0], views[-1]
        (pooled, taps), mut = self.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            v1,
            train,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        q_clf = nn.Dense(self.num_classes).apply({"params": params["classifier"]}, pooled)

        new_bs = {"encoder": mut["batch_stats"]}
        tags = []
        for i, proj in enumerate(self.projectors, 1):
            tag, mut_p = proj.apply(
                {"params": params[f"p{i}"], "batch_stats": batch_stats[f"p{i}"]},
                taps[i - 1],
                train,
                mutable=["batch_stats"],
            )
            new_bs[f"p{i}"] = mut_p["batch_stats"]
            tags.append(tag)

        loss_ce = self.alpha * sum(cross_entropy(t, labels) for t in tags) + cross_entropy(
            q_clf, labels
        )
        targets = jax.nn.softmax(q_clf, axis=1)
        loss_kl = self.beta * sum(kl_batchmean(jax.nn.log_softmax(t, axis=1), targets) for t in tags)
        loss_mse = self.gamma * sum(cosine_mse(t, q_clf) for t in tags)
        loss = loss_ce + loss_kl + loss_mse
        metrics = {
            "train_loss": loss,
            "CE-loss": loss_ce,
            "kl-loss": loss_kl,
            "mse-loss": loss_mse,
        }
        return loss, LossAux(batch_stats=new_bs, ssl_state=ssl_state, metrics=metrics)

    def encoder_variables(self, params, batch_stats):
        return {
            "params": params["encoder"]["encoder"],
            "batch_stats": batch_stats["encoder"]["encoder"],
        }
