"""Kaldi-compatible log-mel fbank, on-device (the MAST frontend).

Replicates ``torchaudio.compliance.kaldi.fbank(htk_compat=True,
window_type='hanning', num_mel_bins=128, dither=0.0, frame_shift=10,
use_energy=False)`` as used by the MAST dataloader
(extras/mast_new/mast/dataloader.py:131-132), implemented from the Kaldi
algorithm spec: snip-edges framing (25 ms / 10 ms), per-frame DC removal,
preemphasis 0.97 (first sample replicated), symmetric Hanning window,
zero-pad to the next power of two (512), power spectrum, HTK-scale
triangular mel banks (low 20 Hz to Nyquist, no area normalization, Nyquist
bin zero-padded), then log(max(x, eps)).

Same TPU shape as the librosa frontend: framing gather + two MXU matmuls.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.frontend import mel as melmod

EPS = float(np.finfo(np.float32).eps)  # torchaudio uses torch.finfo(float).eps


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def kaldi_mel_banks(num_bins: int, n_fft: int, sr: int, low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """(num_bins, n_fft // 2) HTK-mel triangular banks, Kaldi formulation."""
    if high_freq <= 0:
        high_freq = sr / 2.0 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)
    mel_low, mel_high = mel(low_freq), mel(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    fft_bin_width = sr / n_fft
    mel_k = mel(fft_bin_width * np.arange(n_fft // 2))  # [n_fft/2], excludes Nyquist
    left = mel_low + np.arange(num_bins)[:, None] * delta
    center = left + delta
    right = center + delta
    up = (mel_k[None, :] - left) / delta
    down = (right - mel_k[None, :]) / delta
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


def hanning_sym(n: int) -> np.ndarray:
    """Kaldi 'hanning': symmetric Hann (denominator N - 1)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 128
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    preemphasis: float = 0.97
    remove_dc_offset: bool = True
    low_freq: float = 20.0
    high_freq: float = 0.0
    use_power: bool = True

    @property
    def window_size(self) -> int:
        return int(self.sample_rate * self.frame_length_ms * 1e-3)

    @property
    def shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms * 1e-3)

    @property
    def padded_window(self) -> int:
        return _next_pow2(self.window_size)

    def num_frames(self, n_samples: int) -> int:
        if n_samples < self.window_size:
            return 0
        return 1 + (n_samples - self.window_size) // self.shift


@partial(jax.jit, static_argnames=("cfg",))
def kaldi_fbank(wave: jax.Array, cfg: FbankConfig = FbankConfig()) -> jax.Array:
    """[..., n_samples] -> [..., n_frames, num_mel_bins] log-fbank."""
    ws, shift = cfg.window_size, cfg.shift
    n_frames = cfg.num_frames(wave.shape[-1])
    idx = np.arange(n_frames)[:, None] * shift + np.arange(ws)[None, :]
    frames = jnp.take(wave.astype(jnp.float32), jnp.asarray(idx), axis=-1)  # [..., T, ws]
    return fbank_from_frames(frames, cfg)


def fbank_from_frames(frames: jax.Array, cfg: FbankConfig) -> jax.Array:
    """[..., T, window_size] raw frames -> [..., T, num_mel_bins] log-fbank.

    Kaldi's processing is strictly per-frame (snip-edges framing has no
    cross-frame state), so this is the shared tail of the batch path and the
    streaming frontend (frontend/streaming.py StreamingFbank)."""
    ws, nfft = cfg.window_size, cfg.padded_window
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    window = jnp.asarray(hanning_sym(ws))
    frames = frames * window

    c, s = melmod.rdft_matrices(nfft)  # [nfft, nfft//2 + 1]
    bank = np.concatenate([c, s], axis=1)[:ws]  # frames are zero-padded to nfft
    spec = jnp.matmul(frames, jnp.asarray(bank), precision=jax.lax.Precision.HIGHEST)
    n_bins = nfft // 2 + 1
    power = jnp.square(spec[..., :n_bins]) + jnp.square(spec[..., n_bins:])
    if not cfg.use_power:
        power = jnp.sqrt(power)

    mfb = kaldi_mel_banks(cfg.num_mel_bins, nfft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    mfb = np.pad(mfb, ((0, 0), (0, 1)))  # Nyquist column zero-padded (torchaudio)
    mel = jnp.matmul(power, jnp.asarray(mfb.T), precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, EPS))


def pad_or_trim_frames(fbank: jax.Array, target_length: int) -> jax.Array:
    """Zero-pad or cut the frame axis [..., T, M] to ``target_length``
    (dataloader.py:133-145)."""
    t = fbank.shape[-2]
    if t < target_length:
        pads = [(0, 0)] * (fbank.ndim - 2) + [(0, target_length - t), (0, 0)]
        return jnp.pad(fbank, pads)
    return fbank[..., :target_length, :]


def waveform_mixup(w1: jax.Array, w2: jax.Array, key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """MAST waveform-domain mixup: lambda ~ Beta(10, 10), mean-centered
    (dataloader.py:117-127). Returns (mixed, lambda)."""
    lam = jax.random.beta(key, 10.0, 10.0)
    mixed = lam * w1 + (1.0 - lam) * w2
    return mixed - jnp.mean(mixed, axis=-1, keepdims=True), lam


def batch_waveform_mixup(waves: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """Per-sample mixup over a batch [B, L] at probability ``rate``
    (dataloader.py:148-160 __getitem__ gate + 117-127 _wav2fbank math).

    Each wave is first mean-centered (the reference centers every loaded
    waveform, mixed or not); mixed samples draw lambda ~ Beta(10, 10) and a
    uniform partner. Deviation: the reference draws the partner from the whole
    dataset; on-device we draw from the local shard's batch — the batch is an
    i.i.d. shuffle of the dataset, so the partner distribution matches.
    """
    b = waves.shape[0]
    kd, kp, kl = jax.random.split(key, 3)
    w = waves - jnp.mean(waves, axis=-1, keepdims=True)
    do = jax.random.uniform(kd, (b, 1)) < rate
    partner = jax.random.randint(kp, (b,), 0, b)
    lam = jax.random.beta(kl, 10.0, 10.0, (b, 1)).astype(w.dtype)
    mixed = lam * w + (1.0 - lam) * w[partner]
    mixed = mixed - jnp.mean(mixed, axis=-1, keepdims=True)
    return jnp.where(do, mixed, w)
