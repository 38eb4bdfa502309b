"""DeLoRes-M: MoCo-v2 InfoNCE + per-layer Barlow decorrelation.

Reference behavior: src/upstream/delores_m/upstream_expert.py — query/key
AudioNTT encoders with layer taps, key encoder momentum-updated (m=0.999),
65536-key queue with all-gathered keys, InfoNCE at T=0.07, plus Barlow
projections p1/p2/p3 on the 2048/1024/512-d taps of both towers.

TPU notes: the queue lives in the replicated SSL state and advances by the
*global* batch via `lax.all_gather` (≙ concat_all_gather,
src/utils/utils.py:210-221). The reference's shuffle-BN exists only to
de-correlate per-GPU BN statistics; here encoder BatchNorm statistics are
psum'd across the mesh (SyncBN), which removes the leakage shuffle-BN works
around (SURVEY.md §2.3 closing note) — documented deviation.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.models.heads import MLPProjector, barlow_loss
from audiossl_tpu.objectives.api import LossAux, register
from audiossl_tpu.ops.stats import l2_normalize


def _parse_scale(scale: Any) -> float:
    """Parse loss_scale config values like 1/32 or "1/32" without eval().

    The reference YAML writes the Barlow loss scale as a bare fraction string
    (src/upstream/delores_m/config.yaml `loss_scale`); accept "a/b" and plain
    numerics, reject anything else loudly.
    """
    if isinstance(scale, str):
        from fractions import Fraction

        try:
            return float(Fraction(scale.strip()))
        except (ValueError, ZeroDivisionError) as e:
            raise ValueError(f"loss_scale must be a number or 'a/b' fraction, got {scale!r}") from e
    return float(scale)


class MocoState(NamedTuple):
    params_k: Any  # momentum copy of the encoder params
    batch_stats_k: Any  # key-encoder BN stats (evolve via key forwards only)
    queue: jax.Array  # [emb_dim, num_negatives], column-normalized
    queue_ptr: jax.Array  # int32


class EncoderM(nn.Module):
    """DELORES_M wrapper (src/upstream/delores_m/upstream_encoder.py:4-36):
    AudioNTT with taps -> max+mean pool -> Linear(d -> contrastive_dim).

    ``compute_dtype``/``dropout_rate`` overrides exist for exact-parity runs
    vs the reference trainer (tests/test_reference_equiv.py); bf16 + the
    reference dropout stay the TPU training defaults."""

    n_mels: int
    d: int
    contrastive_dim: int
    axis_name: str | None
    compute_dtype: Any = None
    dropout_rate: float | None = None

    @nn.compact
    def __call__(self, v: jax.Array, train: bool):
        kw: dict[str, Any] = {}
        if self.compute_dtype is not None:
            kw["compute_dtype"] = self.compute_dtype
        if self.dropout_rate is not None:
            kw["dropout_rate"] = self.dropout_rate
        enc = AudioNTT2020Task6(
            n_mels=self.n_mels, d=self.d, return_all_layers=True, axis_name=self.axis_name, name="encoder", **kw
        )
        l1, l2, l3, x = enc(v, train)
        q = nn.Dense(self.contrastive_dim, name="fc", dtype=x.dtype)(max_mean_pool(x))
        return q, l1, l2, l3


def info_nce(q: jax.Array, k: jax.Array, queue: jax.Array, temperature: float) -> jax.Array:
    """CE over [positive | queue-negatives] logits with label 0."""
    l_pos = jnp.sum(q * k, axis=1, keepdims=True)
    l_neg = jnp.matmul(q, queue, precision=jax.lax.Precision.HIGHEST)
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return jnp.mean(jax.nn.logsumexp(logits, axis=1) - logits[:, 0])


def batch_shuffle(x_local: jax.Array, key: jax.Array, axis_name: str) -> tuple[jax.Array, jax.Array]:
    """Cross-replica batch shuffle (MoCo shuffle-BN, upstream_expert.py:174-200).

    The permutation key is replicated, so every device computes the same
    global permutation (≙ broadcast from rank 0); each takes its shard of the
    gathered, permuted batch. Returns (shuffled local batch, inverse perm).
    """
    b_local = x_local.shape[0]
    x_all = jax.lax.all_gather(x_local, axis_name, tiled=True)
    n = x_all.shape[0]
    perm = jax.random.permutation(key, n)
    inv = jnp.argsort(perm)
    idx = perm.reshape(n // b_local, b_local)[jax.lax.axis_index(axis_name)]
    return x_all[idx], inv


def batch_unshuffle(x_local: jax.Array, inv: jax.Array, axis_name: str) -> jax.Array:
    b_local = x_local.shape[0]
    x_all = jax.lax.all_gather(x_local, axis_name, tiled=True)
    idx = inv.reshape(x_all.shape[0] // b_local, b_local)[jax.lax.axis_index(axis_name)]
    return x_all[idx]


def queue_update(queue: jax.Array, ptr: jax.Array, keys_local: jax.Array, axis_name: str | None):
    """Gather keys across the mesh and write at ptr (dequeue-and-enqueue)."""
    keys = jax.lax.all_gather(keys_local, axis_name, tiled=True) if axis_name else keys_local
    b = keys.shape[0]
    n = queue.shape[1]
    if n % b:
        # the reference asserts this too (upstream_expert.py:166); without it
        # dynamic_update_slice clamps near the end and desyncs the pointer
        raise ValueError(
            f"num_negatives={n} must be divisible by the global batch {b} "
            "(MoCo queue simplicity assert)"
        )
    queue = jax.lax.dynamic_update_slice(queue, keys.T.astype(queue.dtype), (0, ptr))
    return queue, (ptr + b) % n


@register("delores_m")
class DeloresM:
    def __init__(self, config: dict[str, Any], axis_name: str | None = "data"):
        pre = config["pretrain"]
        self.axis_name = axis_name
        self.emb_dim = int(pre.get("contrastive_dim", 128))
        self.num_negatives = int(pre.get("num_negatives", 65536))
        self.momentum = float(pre.get("encoder_momentum", 0.999))
        self.temperature = float(pre.get("softmax_temperature", 0.07))
        # compat mode: explicit cross-replica shuffle-BN instead of SyncBN
        # (the reference's default under DDP; here SyncBN is the default)
        self.shuffle_bn = bool(pre.get("shuffle_bn", False))
        lambdas = pre.get("lambda_barlow", [5e-5] * 3)
        self.lambdas = [float(l) for l in lambdas]
        scale = pre.get("loss_scale", "1/32")
        self.scale_loss = _parse_scale(scale)
        self.tap_dims = (2048, 1024, 512)
        enc_cfg = pre["base_encoder"]
        compute_dtype = jnp.dtype(enc_cfg["compute_dtype"]) if enc_cfg.get("compute_dtype") else None
        self.encoder = EncoderM(
            n_mels=int(pre["input"]["n_mels"]),
            d=int(enc_cfg["output_dim"]),
            contrastive_dim=self.emb_dim,
            axis_name=axis_name,
            compute_dtype=compute_dtype,
            dropout_rate=float(enc_cfg["dropout"]) if enc_cfg.get("dropout") is not None else None,
        )
        proj_kw = {"compute_dtype": compute_dtype} if compute_dtype is not None else {}
        self.projectors = [
            MLPProjector(hidden=2048, out=2048, axis_name=axis_name, **proj_kw) for _ in self.tap_dims
        ]

    def init(self, key: jax.Array, sample_views):
        keys = jax.random.split(key, 6)
        enc_vars = self.encoder.init({"params": keys[0], "dropout": keys[1]}, sample_views[0], False)
        params = {"encoder": enc_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", FrozenDict())}
        dummy_taps = [jnp.zeros((sample_views[0].shape[0], d), jnp.float32) for d in self.tap_dims]
        for i, (proj, tap) in enumerate(zip(self.projectors, dummy_taps), 1):
            pv = proj.init(keys[1 + i], tap, train=False)
            params[f"p{i}"] = pv["params"]
            batch_stats[f"p{i}"] = pv.get("batch_stats", FrozenDict())
        queue = jax.random.normal(keys[5], (self.emb_dim, self.num_negatives))
        queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
        ssl = MocoState(
            params_k=jax.tree.map(jnp.copy, params["encoder"]),
            batch_stats_k=jax.tree.map(jnp.copy, batch_stats["encoder"]),
            queue=queue,
            queue_ptr=jnp.zeros((), jnp.int32),
        )
        return params, batch_stats, ssl

    def _tap_barlow(self, params, batch_stats, key_dropout, q_taps, k_taps, train, axis_name):
        loss = 0.0
        new_bs = {}
        for i, proj in enumerate(self.projectors, 1):
            name = f"p{i}"
            bs = batch_stats[name]
            zq, mut = proj.apply(
                {"params": params[name], "batch_stats": bs}, q_taps[i - 1], train, mutable=["batch_stats"]
            )
            zk, mut = proj.apply(
                {"params": params[name], "batch_stats": mut["batch_stats"]},
                jax.lax.stop_gradient(k_taps[i - 1]),
                train,
                mutable=["batch_stats"],
            )
            new_bs[name] = mut["batch_stats"]
            loss = loss + barlow_loss(
                zq, zk, self.lambdas[i - 1], self.scale_loss, axis_name=axis_name, variant="src"
            )
        return loss, new_bs

    def loss(self, params, batch_stats, ssl_state: MocoState, views, key, train=True, axis_name=None):
        v1, v2 = views[:2]
        kq, kk, kp = jax.random.split(key, 3)

        # query tower
        (q, q1, q2, q3), mut_q = self.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            v1,
            train,
            rngs={"dropout": kq},
            mutable=["batch_stats"],
        )
        q = l2_normalize(q, axis=1)

        # momentum update (reference does it inside forward, pre-key-pass)
        params_k = jax.tree.map(
            lambda pk, pq: self.momentum * pk + (1.0 - self.momentum) * jax.lax.stop_gradient(pq),
            ssl_state.params_k,
            params["encoder"],
        )
        inv = None
        if self.shuffle_bn and axis_name is not None:
            kk, ks = jax.random.split(kk)
            # the per-device keys differ (folded with axis_index upstream);
            # pmax of the key bits gives one agreed key ≙ broadcast from rank 0
            ks = jax.random.wrap_key_data(jax.lax.pmax(jax.random.key_data(ks), axis_name))
            v2, inv = batch_shuffle(v2, ks, axis_name)
        (k, k1, k2, k3), mut_k = self.encoder.apply(
            {"params": params_k, "batch_stats": ssl_state.batch_stats_k},
            v2,
            train,
            rngs={"dropout": kk},
            mutable=["batch_stats"],
        )
        if inv is not None:
            # unshuffle the embedding AND the taps (the reference forgets the
            # taps, which would mismatch Barlow pairs under DDP — §2.5 family)
            k = batch_unshuffle(k, inv, axis_name)
            k1, k2, k3 = (batch_unshuffle(t, inv, axis_name) for t in (k1, k2, k3))
        k = jax.lax.stop_gradient(l2_normalize(k, axis=1))
        k1, k2, k3 = (jax.lax.stop_gradient(t) for t in (k1, k2, k3))

        loss_nce = info_nce(q, k, ssl_state.queue, self.temperature)
        loss_barlow, proj_bs = self._tap_barlow(
            params, batch_stats, kp, (q1, q2, q3), (k1, k2, k3), train, axis_name
        )
        loss = loss_nce + loss_barlow

        queue, ptr = queue_update(ssl_state.queue, ssl_state.queue_ptr, k, axis_name)
        new_ssl = MocoState(
            params_k=params_k, batch_stats_k=mut_k["batch_stats"], queue=queue, queue_ptr=ptr
        )
        new_bs = {"encoder": mut_q["batch_stats"], **proj_bs}
        metrics = {"train_loss": loss, "nce_loss": loss_nce, "barlow_loss": loss_barlow}
        return loss, LossAux(batch_stats=new_bs, ssl_state=new_ssl, metrics=metrics)

    def encoder_variables(self, params, batch_stats):
        # AudioNTT lives one level inside the DELORES_M wrapper; the reference
        # handoff keeps only the matching `encoder.*` keys (utils.py:199-207).
        return {
            "params": params["encoder"]["encoder"],
            "batch_stats": batch_stats["encoder"]["encoder"],
        }
