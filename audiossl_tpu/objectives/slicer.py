"""SLICER: symmetric MoCo InfoNCE + cluster-contrastive loss.

Reference behavior: src/upstream/slicer/upstream_expert.py (forward:180-220,
training_step:222-237) with the SLICER encoder (upstream_encoder.py:4-36 —
AudioNTT -> max+mean pool -> linear instance head + MLP+Softmax cluster
head) and ClusterLoss from extras/slicer/contrastive_loss.py:45-92 (the
src import of it is dangling — SURVEY.md §2.5).

Build-to-intent notes:
  * the reference training_step computes `loss_combine = sym_instance + cluster`
    but returns only the first-direction CE (upstream_expert.py:237) — a
    defect; we optimize the combined loss as the paper intends.
  * ClusterLoss' entropy term ne_loss is computed but excluded from the
    returned loss in the reference (`return loss  # + ne_loss`); we match.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.models.heads import ClusterProjector
from audiossl_tpu.objectives.api import LossAux, register
from audiossl_tpu.objectives.delores_m import MocoState, info_nce, queue_update
from audiossl_tpu.ops.stats import l2_normalize


class EncoderSlicer(nn.Module):
    n_mels: int
    d: int
    instance_dim: int
    cluster_dim: int
    axis_name: str | None
    compute_dtype: Any = None  # None = AudioNTT default (bf16); f32 for exact parity
    dropout_rate: float | None = None

    @nn.compact
    def __call__(self, v: jax.Array, train: bool):
        enc = AudioNTT2020Task6(
            n_mels=self.n_mels,
            d=self.d,
            axis_name=self.axis_name,
            name="encoder",
            **({"compute_dtype": self.compute_dtype} if self.compute_dtype is not None else {}),
            **({"dropout_rate": self.dropout_rate} if self.dropout_rate is not None else {}),
        )
        x = max_mean_pool(enc(v, train))
        inst = nn.Dense(self.instance_dim, name="instance_projector", dtype=x.dtype)(x)
        clus = ClusterProjector(hidden=self.d, num_clusters=self.cluster_dim, name="cluster_projector")(x)
        return inst, clus


def instance_loss(z_i: jax.Array, z_j: jax.Array, temperature: float = 0.5) -> jax.Array:
    """SimCLR-style instance loss (extras/slicer/contrastive_loss.py:6-42):
    2B-way contrastive over raw dot-product similarities, CE-sum / 2B.
    Used by the standalone SLICER trainer alongside the MoCo path."""
    b = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)  # [2B, D]
    sim = jnp.matmul(z, z.T, precision=jax.lax.Precision.HIGHEST) / temperature
    n = 2 * b
    idx = jnp.arange(n)
    pos = sim[idx, (idx + b) % n]
    mask = jnp.ones((n, n), bool).at[idx, idx].set(False).at[idx, (idx + b) % n].set(False)
    neg = jnp.where(mask, sim, -jnp.inf)
    logits = jnp.concatenate([pos[:, None], neg], axis=1)
    return jnp.sum(jax.nn.logsumexp(logits, axis=1) - pos) / n


def cluster_loss(c_i: jax.Array, c_j: jax.Array, temperature: float = 1.0) -> jax.Array:
    """Contrastive loss over cluster-assignment columns (ClusterLoss.forward).

    c_* are [B, K] softmax assignments; their K columns act as cluster
    prototypes contrasted across the two views via cosine similarity.
    """
    k = c_i.shape[1]
    c = jnp.concatenate([c_i.T, c_j.T], axis=0)  # [2K, B]
    cn = c / jnp.maximum(jnp.linalg.norm(c, axis=1, keepdims=True), 1e-8)
    sim = jnp.matmul(cn, cn.T, precision=jax.lax.Precision.HIGHEST) / temperature  # [2K, 2K]
    n = 2 * k
    idx = jnp.arange(n)
    pos = sim[idx, (idx + k) % n]  # diag offsets +/- K
    # mask out self and the positive pair; CE with the positive as class 0
    mask = jnp.ones((n, n), bool)
    mask = mask.at[idx, idx].set(False)
    mask = mask.at[idx, (idx + k) % n].set(False)
    neg = jnp.where(mask, sim, -jnp.inf)
    logits = jnp.concatenate([pos[:, None], neg], axis=1)
    loss = jnp.sum(jax.nn.logsumexp(logits, axis=1) - pos)
    return loss / n


@register("slicer")
class Slicer:
    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.axis_name = axis_name
        self.emb_dim = int(pre.get("instance_contrastive_dim", 128))
        self.cluster_dim = int(pre.get("cluster_contrastive_dim", 128))
        self.num_negatives = int(pre.get("num_negatives", 65536))
        self.momentum = float(pre.get("encoder_momentum", 0.999))
        self.temperature = float(pre.get("softmax_temperature", 0.07))
        self.cluster_temperature = float(pre.get("cluster_temperature", 1.0))
        self.shuffle_bn = bool(pre.get("shuffle_bn", False))
        enc_cfg = pre["base_encoder"]
        self.encoder = EncoderSlicer(
            n_mels=int(pre["input"]["n_mels"]),
            d=int(enc_cfg["output_dim"]),
            instance_dim=self.emb_dim,
            cluster_dim=self.cluster_dim,
            axis_name=axis_name,
            compute_dtype=jnp.dtype(enc_cfg["compute_dtype"]) if enc_cfg.get("compute_dtype") else None,
            dropout_rate=float(enc_cfg["dropout"]) if enc_cfg.get("dropout") is not None else None,
        )

    def init(self, key: jax.Array, sample_views):
        k1, k2, kq = jax.random.split(key, 3)
        enc_vars = self.encoder.init({"params": k1, "dropout": k2}, sample_views[0], False)
        params = {"encoder": enc_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", FrozenDict())}
        queue = jax.random.normal(kq, (self.emb_dim, self.num_negatives))
        queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
        ssl = MocoState(
            params_k=jax.tree.map(jnp.copy, params["encoder"]),
            batch_stats_k=jax.tree.map(jnp.copy, batch_stats["encoder"]),
            queue=queue,
            queue_ptr=jnp.zeros((), jnp.int32),
        )
        return params, batch_stats, ssl

    def _one_direction(self, params, batch_stats, ssl, vq, vk, key, train, axis_name):
        kq, kk = jax.random.split(key)
        (q_inst, q_clus), mut_q = self.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            vq,
            train,
            rngs={"dropout": kq},
            mutable=["batch_stats"],
        )
        q_inst = l2_normalize(q_inst, axis=1)
        params_k = jax.tree.map(
            lambda pk, pq: self.momentum * pk + (1.0 - self.momentum) * jax.lax.stop_gradient(pq),
            ssl.params_k,
            params["encoder"],
        )
        inv = None
        if self.shuffle_bn and axis_name is not None:
            from audiossl_tpu.objectives.delores_m import batch_shuffle, batch_unshuffle

            kk, ks = jax.random.split(kk)
            ks = jax.random.wrap_key_data(jax.lax.pmax(jax.random.key_data(ks), axis_name))
            vk, inv = batch_shuffle(vk, ks, axis_name)
        (k_inst, _), mut_k = self.encoder.apply(
            {"params": params_k, "batch_stats": ssl.batch_stats_k},
            vk,
            train,
            rngs={"dropout": kk},
            mutable=["batch_stats"],
        )
        if inv is not None:
            from audiossl_tpu.objectives.delores_m import batch_unshuffle

            k_inst = batch_unshuffle(k_inst, inv, axis_name)
        k_inst = jax.lax.stop_gradient(l2_normalize(k_inst, axis=1))
        ce = info_nce(q_inst, k_inst, ssl.queue, self.temperature)
        queue, ptr = queue_update(ssl.queue, ssl.queue_ptr, k_inst, axis_name)
        new_ssl = MocoState(params_k, mut_k["batch_stats"], queue, ptr)
        return ce, q_clus, mut_q["batch_stats"], new_ssl

    def loss(self, params, batch_stats, ssl_state: MocoState, views, key, train=True, axis_name=None):
        v1, v2 = views[:2]
        ka, kb = jax.random.split(key)
        ce_a, q_clus, bs, ssl = self._one_direction(
            params, batch_stats, ssl_state, v1, v2, ka, train, axis_name
        )
        ce_b, q_clus_1, bs2, ssl = self._one_direction(
            params, {"encoder": bs}, ssl, v2, v1, kb, train, axis_name
        )
        sym = ce_a + ce_b
        cl = cluster_loss(q_clus, q_clus_1, self.cluster_temperature)
        loss = sym + cl
        # per-direction CEs exposed for logging and for the reference-
        # equivalence harness (the reference backprops only instance_loss_12,
        # upstream_expert.py:237 — see module docstring)
        metrics = {
            "train_loss": loss,
            "sym_instance_loss": sym,
            "train_loss_cluster": cl,
            "instance_loss_12": ce_a,
            "instance_loss_21": ce_b,
        }
        return loss, LossAux(batch_stats={"encoder": bs2}, ssl_state=ssl, metrics=metrics)

    def encoder_variables(self, params, batch_stats):
        return {
            "params": params["encoder"]["encoder"],
            "batch_stats": batch_stats["encoder"]["encoder"],
        }
