"""Sequence-parallel log-mel: the time axis sharded across the mesh.

SURVEY.md §5 marks long-audio scaling as the extension point the reference
never needed (~1 s windows). For minutes-long audio, one chip's HBM can't
hold the spectrogram pipeline — here each device computes the frames whose
hop-aligned starts fall in its time slice, fetching the ``n_fft - hop``
halo samples it needs from its right neighbor with one `ppermute`. The
output spectrogram stays time-sharded ([B, n_mels, T/W] per device), ready
for blockwise/ring attention downstream.

Constraints: the local slice length must be a multiple of hop (callers pad
the global signal to W * local_len; `sp_log_mel` handles it). Frames whose
window would run past the global end are computed against zero halo and
sliced away by the caller (`valid_frames`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from audiossl_tpu.frontend.stft import EPS32, EPS64, LogMelConfig, _constants, frame_signal


def sp_num_frames(cfg: LogMelConfig, n_samples: int) -> int:
    """Valid global frame count (same as the single-device frontend)."""
    return cfg.num_frames(n_samples)


def pad_for_sp(wave: jax.Array, cfg: LogMelConfig, n_shards: int) -> jax.Array:
    """Reflect-center-pad (librosa semantics) then right-pad so the length is
    n_shards * local_len with hop-aligned local slices."""
    if cfg.center:
        p = cfg.n_fft // 2
        wave = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(p, p)], mode="reflect")
    n = wave.shape[-1]
    unit = cfg.hop * n_shards
    target = -(-n // unit) * unit
    return jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(0, target - n)])


def sp_log_mel_local(wave_local: jax.Array, cfg: LogMelConfig, axis: str = "data") -> jax.Array:
    """Inside shard_map: [B, L/W] local slice -> [B, n_mels, (L/W)/hop] local
    spectrogram block. One ppermute supplies the cross-shard halo."""
    halo = cfg.n_fft - cfg.hop
    w = jax.lax.axis_size(axis)
    if wave_local.shape[-1] < halo:
        raise ValueError(
            f"local time slice ({wave_local.shape[-1]} samples) is shorter than "
            f"the frame halo ({halo}); use fewer shards or longer audio"
        )
    if wave_local.shape[-1] % cfg.hop:
        raise ValueError("local slice length must be a multiple of hop (use pad_for_sp)")
    # right neighbor's head -> this shard's tail extension (last shard: zeros)
    head = wave_local[:, :halo]
    perm = [(i, (i - 1) % w) for i in range(w)]
    recv = jax.lax.ppermute(head, axis, perm)
    is_last = jax.lax.axis_index(axis) == w - 1
    recv = jnp.where(is_last, jnp.zeros_like(recv), recv)
    ext = jnp.concatenate([wave_local, recv], axis=-1)

    local_cfg = LogMelConfig(
        sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, win_length=cfg.win_length,
        hop=cfg.hop, n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
        center=False, htk=cfg.htk, norm=cfg.norm, power=cfg.power,
    )
    bank, mfb_t = _constants(local_cfg)
    frames = frame_signal(ext.astype(jnp.float32), cfg.n_fft, cfg.hop, center=False)
    n_local = wave_local.shape[-1] // cfg.hop  # frames owned by this shard
    frames = frames[:, :n_local]
    spec = jnp.matmul(frames, jnp.asarray(bank), precision=jax.lax.Precision.HIGHEST)
    n_bins = cfg.n_fft // 2 + 1
    power = jnp.square(spec[..., :n_bins]) + jnp.square(spec[..., n_bins:])
    mel = jnp.matmul(power + EPS64, jnp.asarray(mfb_t), precision=jax.lax.Precision.HIGHEST)
    return jnp.swapaxes(jnp.log(mel + EPS32), -1, -2)  # [B, n_mels, n_local]
