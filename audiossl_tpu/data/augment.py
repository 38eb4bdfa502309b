"""Jitted spectrogram augmentations with functionally-carried state.

Rebuilds the reference AugmentationModule (src/augmentations/__init__.py:5-35
+ augmentations.py) as pure batched functions: two independently augmented
views per step, a BYOL-A mixup FIFO memory bank reframed as a device ring
buffer, Kmix centroid-neighborhood partner selection, RandomResizeCrop via
matmul bicubic, and RunningNorm pre-normalization as carried scalars.

Deviation from the reference (documented per SURVEY.md §7 hard-part (e)):
the reference mixes each sample against *recent samples seen by its
dataloader worker* and pushes to the FIFO once per view; here the bank is
global per step and is updated once per view with the whole (pre-mix) batch,
so view 2 can draw view 1's pushes — the same visibility the sequential CPU
version has.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.ops.resize import random_resize_crop
from audiossl_tpu.ops.stats import RunningNormState, running_norm_apply, running_norm_init

EPS32 = 1.1920929e-7


def log_mixup_exp(xa: jax.Array, xb: jax.Array, alpha: jax.Array) -> jax.Array:
    """alpha * exp(xa) + (1-alpha) * exp(xb), back in log domain."""
    x = alpha * jnp.exp(xa) + (1.0 - alpha) * jnp.exp(xb)
    return jnp.log(x + EPS32)


class MixupBankState(NamedTuple):
    bank: jax.Array  # [N, F, T] bf16 — stored spectrograms (channel squeezed)
    fill: jax.Array  # int32 — how many slots are valid
    ptr: jax.Array  # int32 — next write position (ring)


def mixup_bank_init(n_memory: int, n_mels: int, n_frames: int) -> MixupBankState:
    return MixupBankState(
        bank=jnp.zeros((n_memory, n_mels, n_frames), jnp.bfloat16),
        fill=jnp.zeros((), jnp.int32),
        ptr=jnp.zeros((), jnp.int32),
    )


def mixup_bank_push(state: MixupBankState, x: jax.Array) -> MixupBankState:
    """Append batch ``x [B, C, F, T]`` to the ring buffer."""
    b = x.shape[0]
    n = state.bank.shape[0]
    idx = (state.ptr + jnp.arange(b)) % n
    bank = state.bank.at[idx].set(x[:, 0].astype(jnp.bfloat16))
    return MixupBankState(bank=bank, fill=jnp.minimum(state.fill + b, n), ptr=(state.ptr + b) % n)


def mixup_byola(
    state: MixupBankState, x: jax.Array, key: jax.Array, ratio: float = 0.4, log_domain: bool = True
) -> jax.Array:
    """Mix each sample of ``x [B, C, F, T]`` with a random bank entry.

    Matches MixupBYOLA.forward (augmentations.py:97-111): alpha ~ ratio*U(0,1);
    mixed = log_mixup_exp(x, z, 1 - alpha), identity while the bank is empty.
    """
    b = x.shape[0]
    ka, kz = jax.random.split(key)
    alpha = ratio * jax.random.uniform(ka, (b, 1, 1, 1))
    z_idx = jax.random.randint(kz, (b,), 0, jnp.maximum(state.fill, 1))
    z = state.bank[z_idx].astype(x.dtype)[:, None]  # [B, 1, F, T]
    mixed = log_mixup_exp(x, z, 1.0 - alpha) if log_domain else alpha * z + (1.0 - alpha) * x
    return jnp.where(state.fill > 0, mixed, x)


def _sq_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise squared euclidean distances [n, m] (monotone in cdist p=2)."""
    return (
        jnp.sum(a * a, -1, keepdims=True) - 2.0 * a @ b.T + jnp.sum(b * b, -1)[None, :]
    )


def kmix_partner_index(
    state: MixupBankState, x: jax.Array, centroids: jax.Array, key: jax.Array, top_k: int = 128
) -> jax.Array:
    """Kmix partner selection for one sample ``x [C, F, T]`` -> bank index.

    Matches Kmix.get_index (augmentations.py:140-162): centroids and bank
    items are time-averaged to [n_mels] and L2-normalized (the query point is
    *not* normalized, as in the reference); centroids are ranked by
    *descending* distance from the query's cluster (torch.topk largest-first);
    the partner is drawn uniformly from the first non-empty rank's items
    (first ``top_k`` in bank order).
    """
    n = state.bank.shape[0]
    c = centroids / jnp.maximum(jnp.linalg.norm(centroids, axis=-1, keepdims=True), 1e-12)
    bank_avg = jnp.mean(state.bank.astype(jnp.float32), axis=-1)  # [N, F] time-avg
    m = bank_avg / jnp.maximum(jnp.linalg.norm(bank_avg, axis=-1, keepdims=True), 1e-12)
    x_avg = jnp.mean(x[0].astype(jnp.float32), axis=-1)  # [F]

    assign = jnp.argmin(_sq_dist(m, c), axis=1)  # [N] bank item -> cluster
    pc = jnp.argmin(_sq_dist(x_avg[None], c)[0])  # query cluster
    order = jnp.argsort(-_sq_dist(c, c)[pc])  # farthest-first centroid ranking
    rank_of = jnp.zeros(c.shape[0], jnp.int32).at[order].set(jnp.arange(c.shape[0], dtype=jnp.int32))
    item_rank = rank_of[assign]
    valid = jnp.arange(n) < state.fill
    item_rank = jnp.where(valid, item_rank, c.shape[0] + 1)
    eligible = (item_rank == jnp.min(item_rank)) & valid
    eligible &= jnp.cumsum(eligible) <= top_k
    gumbel = jax.random.gumbel(key, (n,))
    return jnp.argmax(jnp.where(eligible, gumbel, -jnp.inf))


def kmix(
    state: MixupBankState,
    x: jax.Array,
    centroids: jax.Array,
    key: jax.Array,
    ratio: float = 0.4,
    log_domain: bool = True,
    top_k: int = 128,
) -> jax.Array:
    """Batched Kmix mixing (falls back to uniform partner while fill < top_k)."""
    b = x.shape[0]
    ka, kz, kg = jax.random.split(key, 3)
    alpha = ratio * jax.random.uniform(ka, (b, 1, 1, 1))
    rand_idx = jax.random.randint(kz, (b,), 0, jnp.maximum(state.fill, 1))
    smart_idx = jax.vmap(lambda xi, ki: kmix_partner_index(state, xi, centroids, ki, top_k))(
        x, jax.random.split(kg, b)
    )
    z_idx = jnp.where(state.fill >= top_k, smart_idx, rand_idx)
    z = state.bank[z_idx].astype(x.dtype)[:, None]
    mixed = log_mixup_exp(x, z, 1.0 - alpha) if log_domain else alpha * z + (1.0 - alpha) * x
    return jnp.where(state.fill > 0, mixed, x)


def mix_gaussian_noise(x: jax.Array, key: jax.Array, ratio: float = 0.3) -> jax.Array:
    """MixGaussianNoise (augmentations.py:193-208): exp-domain noise blend."""
    kl, kn = jax.random.split(key)
    lambd = ratio * jax.random.uniform(kl, ())
    ex = jnp.exp(x)
    z = jnp.exp(lambd * jax.random.normal(kn, x.shape))
    return jnp.log((1.0 - lambd) * ex + z + EPS32)


def mast_noise(x: jax.Array, key: jax.Array, max_shift: int = 10) -> jax.Array:
    """MAST fbank noise aug (extras/mast_new/mast/dataloader.py:205-207):
    add U(0,1) noise scaled by a U(0,1)/10 draw, then roll the time axis by
    randint(-10, 10). The reference draws both per clip (inside
    __getitem__); scale and shift are therefore per-sample here too.
    ``x`` is [B, C, F, T]; the reference fbank is [T, M] and rolls dim 0 —
    our time axis is last."""
    b = x.shape[0]
    kn, ks, kr = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (b, 1, 1, 1), x.dtype) / 10.0
    x = x + jax.random.uniform(kn, x.shape, x.dtype) * scale
    shifts = jax.random.randint(kr, (b,), -max_shift, max_shift)
    return jax.vmap(lambda xi, s: jnp.roll(xi, s, axis=-1))(x, shifts)


class AugmentState(NamedTuple):
    mixup: MixupBankState | None
    running_norm: RunningNormState | None


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Parsed from the YAML `pretrain.augmentations` + `pretrain.normalization`."""

    mixup_ratio: float | None = 0.4
    mixup_log: bool = True
    kmix_ratio: float | None = None
    kmix_log: bool = True
    kmix_top_k: int = 128
    rrc: bool = True
    virtual_crop_scale: tuple[float, float] = (1.0, 1.5)
    freq_scale: tuple[float, float] = (0.6, 1.5)
    time_scale: tuple[float, float] = (0.6, 1.5)
    gaussian_ratio: float | None = None
    spec_mask_freq: int = 0  # SpecAugment-style masking (MAST pipeline)
    spec_mask_time: int = 0
    normalization: str = "mean_var"  # mean_var | l2 | precomputed | none
    # dataset stats for `precomputed` — the MAST convention is
    # (x - mean) / (2 * std) (extras/mast_new/mast/dataloader.py:201-202)
    norm_mean: float | None = None
    norm_std: float | None = None
    norm_std_mult: float = 2.0
    # waveform-domain sample-pairing mixup rate (dataloader.py:117-127,148-160)
    wave_mixup_rate: float = 0.0
    mast_noise: bool = False  # post-norm uniform noise + time roll (dataloader.py:205-207)
    n_memory: int = 2048

    @classmethod
    def from_dict(cls, pretrain: dict[str, Any]) -> "AugmentConfig":
        aug = pretrain.get("augmentations", {}) or {}
        kw: dict[str, Any] = {"normalization": pretrain.get("normalization", "none")}
        if kw["normalization"] == "precomputed":
            ns = pretrain.get("norm_stats")
            if not ns:
                raise ValueError(
                    "normalization: precomputed needs pretrain.norm_stats "
                    "({mean, std} from `python -m audiossl_tpu.data.norm_stats`)"
                )
            mean, std = (ns["mean"], ns["std"]) if isinstance(ns, dict) else tuple(ns)
            kw["norm_mean"], kw["norm_std"] = float(mean), float(std)
            kw["norm_std_mult"] = float(pretrain.get("norm_std_mult", 2.0))
        inp = pretrain.get("input") or {}
        kw["wave_mixup_rate"] = float(inp.get("mixup", 0.0) or 0.0)
        kw["mast_noise"] = bool(inp.get("noise", False))
        if "MixupBYOLA" in aug:
            kw["mixup_ratio"] = float(aug["MixupBYOLA"].get("ratio", 0.4))
            kw["mixup_log"] = bool(aug["MixupBYOLA"].get("log_mixup_exp", True))
        else:
            kw["mixup_ratio"] = None
        cp = (aug.get("Kmix") or {}).get("centroid_path")
        if "Kmix" in aug and cp not in (None, "None"):
            kw["kmix_ratio"] = float(aug["Kmix"].get("ratio", 0.4))
            kw["kmix_log"] = bool(aug["Kmix"].get("log_mixup_exp", True))
            kw["kmix_top_k"] = int(aug["Kmix"].get("top_k", 128))
        if "RandomResizeCrop" in aug:
            r = aug["RandomResizeCrop"]
            kw["rrc"] = True
            kw["virtual_crop_scale"] = tuple(r.get("virtual_crop_scale", (1.0, 1.5)))
            kw["freq_scale"] = tuple(r.get("freq_crop_scale", (0.6, 1.5)))
            kw["time_scale"] = tuple(r.get("time_crop_scale", (0.6, 1.5)))
        else:
            kw["rrc"] = False
        if "MixGaussianNoise" in aug:
            kw["gaussian_ratio"] = float(aug["MixGaussianNoise"].get("ratio", 0.3))
        if "SpecMask" in aug:
            kw["spec_mask_freq"] = int(aug["SpecMask"].get("freq_param", 0))
            kw["spec_mask_time"] = int(aug["SpecMask"].get("time_param", 0))
        return cls(**kw)


class AugmentPipeline:
    """(state, batch [B,1,F,T], key) -> (state, view1, view2).

    Chain order follows AugmentationModule.get_augmentations: pre-norm, then
    Mixup -> Kmix -> RandomResizeCrop per view (PatchDrop is a token-level op
    applied inside the MAST encoder, see ops.tokens).
    """

    def __init__(self, cfg: AugmentConfig, epoch_samples: int, centroids: np.ndarray | None = None):
        self.cfg = cfg
        self.epoch_samples = epoch_samples
        self.centroids = None if centroids is None else jnp.asarray(centroids, jnp.float32)
        if cfg.kmix_ratio is not None and self.centroids is None:
            raise ValueError("Kmix enabled but no centroids provided")

    def init_state(self, n_mels: int, n_frames: int) -> AugmentState:
        needs_bank = self.cfg.mixup_ratio is not None or self.cfg.kmix_ratio is not None
        return AugmentState(
            mixup=mixup_bank_init(self.cfg.n_memory, n_mels, n_frames) if needs_bank else None,
            # reference sizes the cap as 2 * len(csv) samples/epoch: the FIFO
            # sees each clip twice per epoch (two views) — src/augmentations/__init__.py:14
            running_norm=running_norm_init(2 * self.epoch_samples)
            if self.cfg.normalization == "mean_var"
            else None,
        )

    def _one_view(self, mixup_state, x, key):
        k_mix, k_kmix, k_rrc, k_noise, k_mask, k_mnoise = jax.random.split(key, 6)
        if self.cfg.mixup_ratio is not None:
            x = mixup_byola(mixup_state, x, k_mix, self.cfg.mixup_ratio, self.cfg.mixup_log)
        if self.cfg.kmix_ratio is not None:
            x = kmix(
                mixup_state, x, self.centroids, k_kmix, self.cfg.kmix_ratio, self.cfg.kmix_log, self.cfg.kmix_top_k
            )
        if self.cfg.gaussian_ratio is not None:
            x = mix_gaussian_noise(x, k_noise, self.cfg.gaussian_ratio)
        if self.cfg.rrc:
            keys = jax.random.split(k_rrc, x.shape[0])
            x = jax.vmap(
                lambda xi, ki: random_resize_crop(
                    xi, ki, self.cfg.virtual_crop_scale, self.cfg.freq_scale, self.cfg.time_scale
                )
            )(x, keys)
        if self.cfg.spec_mask_freq or self.cfg.spec_mask_time:
            from audiossl_tpu.ops.masking import spec_mask_batch

            x = spec_mask_batch(
                x, k_mask, freq_param=self.cfg.spec_mask_freq, time_param=self.cfg.spec_mask_time
            )
        # MAST op order is mask THEN normalize (dataloader.py:186-202): masked
        # bins sit at (0 - mean) / (2 std) after the shift, as in the reference.
        if self.cfg.normalization == "precomputed":
            from audiossl_tpu.ops.stats import precomputed_norm

            x = precomputed_norm(x, self.cfg.norm_mean, self.cfg.norm_std_mult * self.cfg.norm_std)
        if self.cfg.mast_noise:
            x = mast_noise(x, k_mnoise)
        return x

    def __call__(self, state: AugmentState, x: jax.Array, key: jax.Array):
        if state.running_norm is not None:
            rn, x = running_norm_apply(state.running_norm, x)
        else:
            rn = None
        k1, k2 = jax.random.split(key)
        mix = state.mixup
        if mix is not None:
            v1 = self._one_view(mix, x, k1)
            mix = mixup_bank_push(mix, x)
            v2 = self._one_view(mix, x, k2)
            mix = mixup_bank_push(mix, x)
        else:
            v1 = self._one_view(None, x, k1)
            v2 = self._one_view(None, x, k2)
        return AugmentState(mixup=mix, running_norm=rn), v1, v2
