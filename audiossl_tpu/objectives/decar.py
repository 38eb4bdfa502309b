"""DECAR-v2 (DeepCluster-v2): online distributed k-means pseudo-labeling.

Reference behavior: extras/decar-v2 —
  * model: AudioNTT (d=512) -> max+mean pool -> projection head
    (512 -> 2048 -> BN -> ReLU -> feat_dim) + bias-free prototype layer(s)
    (models_delores.py:80-122);
  * per epoch: spherical k-means over an embedding memory bank with
    all-reduced M-steps and rank-0-broadcast init centroids
    (utils.py:276-346 `cluster_memory`), centroids copied into the prototype
    weights, assignments all-gathered;
  * per step: CE(prototype scores / T, assignments[idx]) with
    ignore_index=-100, prototype grads frozen for the first
    `freeze_prototypes_niters` iterations, memory bank updated in place with
    the detached view-1 embeddings (main.py:216-291).

TPU design: the memory bank is mesh-sharded (one shard per device, the
`mb{rank}.pth` layout); k-means runs as one jitted shard_map program —
E-step is a local [M, D] x [D, K] matmul + argmax, M-step is a one-hot
[K, M] x [M, D] matmul psum'd across the mesh (MXU-friendly segment-sum),
centroid init broadcasts shard 0 via masked psum. No host round-trips.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.objectives.api import register

IGNORE_INDEX = -100


class DecarNet(nn.Module):
    """Encoder + projection head + prototype layers (scores per prototype K)."""

    n_mels: int = 64
    d: int = 512
    feat_dim: int = 128
    nmb_prototypes: Sequence[int] = (1024,)
    axis_name: str | None = None
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
        z = max_mean_pool(enc(v, train))
        z = nn.Dense(2048, name="proj_fc1", dtype=z.dtype)(z)
        z = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            name="proj_bn",
            dtype=jnp.float32,
        )(z)
        z = nn.relu(z)
        emb = nn.Dense(self.feat_dim, name="proj_fc2", dtype=z.dtype)(z)
        scores = [
            nn.Dense(k, use_bias=False, name=f"prototypes{i}", dtype=emb.dtype)(emb)
            for i, k in enumerate(self.nmb_prototypes)
        ]
        return emb, scores


class DecarMemory(NamedTuple):
    """Per-shard embedding memory bank (leading axis = shard)."""

    emb: jax.Array  # [W, M, D]
    index: jax.Array  # [W, M] dataset indices (-1 = unfilled)


def init_memory_state(n_shards: int, per_shard: int, feat_dim: int) -> DecarMemory:
    return DecarMemory(
        emb=jnp.zeros((n_shards, per_shard, feat_dim), jnp.float32),
        index=-jnp.ones((n_shards, per_shard), jnp.int32),
    )


def memory_update(mem_emb, mem_idx, emb, idx, step_in_epoch):
    """Write batch embeddings at the epoch-sequential slots (main.py:246-250)."""
    b = emb.shape[0]
    m = mem_emb.shape[0]
    slots = (step_in_epoch * b + jnp.arange(b)) % m
    return mem_emb.at[slots].set(jax.lax.stop_gradient(emb)), mem_idx.at[slots].set(idx)


def kmeans_on_mesh(
    mem_emb: jax.Array,  # [M, D] local shard
    mem_idx: jax.Array,  # [M] local
    n_total: int,
    k: int,
    key: jax.Array,
    n_iters: int = 10,
    axis_name: str | None = "data",
):
    """Distributed spherical k-means; returns (centroids [K, D], assignments [n_total])."""
    m, d = mem_emb.shape
    if k > m:
        raise ValueError(
            f"nmb_prototypes={k} exceeds per-shard memory {m}; reduce the number "
            "of centroids (reference assert, utils.py:287)"
        )
    valid = mem_idx >= 0

    # init: K random embeddings from shard 0, broadcast via masked psum
    pick = jax.random.permutation(key, m)[:k]
    centroids = mem_emb[pick]
    if axis_name is not None:
        is0 = (jax.lax.axis_index(axis_name) == 0).astype(centroids.dtype)
        centroids = jax.lax.psum(centroids * is0, axis_name)

    def one_iter(carry, _):
        centroids = carry
        dots = jnp.matmul(mem_emb, centroids.T, precision=jax.lax.Precision.HIGHEST)  # E
        assign = jnp.argmax(dots, axis=1)
        onehot = (assign[:, None] == jnp.arange(k)[None, :]) & valid[:, None]
        onehot = onehot.astype(mem_emb.dtype)
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = jnp.matmul(onehot.T, mem_emb, precision=jax.lax.Precision.HIGHEST)  # M
        if axis_name is not None:
            counts = jax.lax.psum(counts, axis_name)
            sums = jax.lax.psum(sums, axis_name)
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centroids)
        new_c = new_c / jnp.maximum(jnp.linalg.norm(new_c, axis=1, keepdims=True), 1e-12)
        return new_c, None

    centroids, _ = jax.lax.scan(one_iter, centroids, None, length=n_iters)
    # final E-step
    assign = jnp.argmax(jnp.matmul(mem_emb, centroids.T, precision=jax.lax.Precision.HIGHEST), axis=1)

    assignments = jnp.full((n_total,), IGNORE_INDEX, jnp.int32)
    if axis_name is not None:
        all_assign = jax.lax.all_gather(assign, axis_name, tiled=True)
        all_idx = jax.lax.all_gather(mem_idx, axis_name, tiled=True)
    else:
        all_assign, all_idx = assign, mem_idx
    ok = all_idx >= 0
    # unfilled slots scatter out of bounds and are dropped
    assignments = assignments.at[jnp.where(ok, all_idx, n_total)].set(
        all_assign.astype(jnp.int32), mode="drop"
    )
    return centroids, assignments


def decar_ce(scores: jax.Array, targets: jax.Array, temperature: float = 1.0) -> jax.Array:
    """CE with ignore_index=-100 (mean over non-ignored)."""
    logits = scores / temperature
    keep = targets != IGNORE_INDEX
    safe_t = jnp.where(keep, targets, 0)
    nll = jax.nn.logsumexp(logits, axis=1) - jnp.take_along_axis(logits, safe_t[:, None], 1)[:, 0]
    denom = jnp.maximum(jnp.sum(keep), 1)
    return jnp.sum(jnp.where(keep, nll, 0.0)) / denom


@register("decar_v2")
class DecarV2:
    """Config keys (pretrain.*): feat_dim, nmb_prototypes, temperature,
    freeze_prototypes_niters, kmeans_iters, base_encoder.output_dim (=512)."""

    labeled = True  # the "label" slot carries the dataset index

    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.axis_name = axis_name
        self.nmb_prototypes = tuple(pre.get("nmb_prototypes", [1024]))
        self.temperature = float(pre.get("temperature", 1.0))
        self.freeze_niters = int(pre.get("freeze_prototypes_niters", 300))
        self.kmeans_iters = int(pre.get("kmeans_iters", 10))
        self.feat_dim = int(pre.get("feat_dim", 128))
        enc_cfg = pre["base_encoder"]
        self.net = DecarNet(
            n_mels=int(pre["input"]["n_mels"]),
            d=int(enc_cfg.get("output_dim", 512)),
            feat_dim=self.feat_dim,
            nmb_prototypes=self.nmb_prototypes,
            axis_name=axis_name,
            compute_dtype=jnp.dtype(enc_cfg["compute_dtype"]) if enc_cfg.get("compute_dtype") else None,
            dropout_rate=float(enc_cfg["dropout"]) if enc_cfg.get("dropout") is not None else None,
        )

    def init(self, key: jax.Array, sample_views):
        kp, kd = jax.random.split(key)
        variables = self.net.init({"params": kp, "dropout": kd}, sample_views[0], False)
        return variables["params"], variables.get("batch_stats", FrozenDict()), ()

    def apply_net(self, params, batch_stats, v, key, train):
        return self.net.apply(
            {"params": params, "batch_stats": batch_stats},
            v,
            train,
            rngs={"dropout": key},
            mutable=["batch_stats"] if train else [],
        )

    def set_prototypes(self, params, centroids_list):
        """Copy k-means centroids into the prototype kernels (utils.py:320)."""
        params = jax.tree.map(lambda x: x, params)  # shallow copy
        new = dict(params)
        for i, c in enumerate(centroids_list):
            name = f"prototypes{i}"
            new[name] = dict(params[name]) | {"kernel": c.T}
        return new

    def freeze_prototype_grads(self, grads, step):
        """Zero prototype grads while step < freeze_prototypes_niters
        (main.py:239-242)."""

        def mask(path, g):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            if str(top).startswith("prototypes"):
                return jnp.where(step < self.freeze_niters, jnp.zeros_like(g), g)
            return g

        return jax.tree_util.tree_map_with_path(mask, grads)

    def encoder_variables(self, params, batch_stats):
        return {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
