"""Waveform -> log-mel spectrogram, as a pure jittable JAX function.

Numerically replicates the reference CPU frontend
(``MelSpectrogramLibrosa`` + ``extract_log_mel_spectrogram``,
reference: src/utils/utils.py:20-29,43-49, librosa==0.8.1):

    X   = stft(wave, n_fft=1024, hop=160, window=periodic-hann,
               center=True, pad_mode='reflect')
    mel = mfb @ (|X|**2 + eps64)          # slaney mel, fmin=60, fmax=7800
    out = log(mel + eps32)

but runs on-device: framing is a strided gather, the real DFT is one dense
MXU matmul (cos/sin banks stacked side by side), and the mel projection is a
second matmul. float32 throughout — parity target is max|err| <= 1e-3 vs the
CPU reference (BASELINE.md).

The TF-variant frontend of the reference (tf.signal.stft with
frame_length=400, no centering — extras/delores-s/utils.py:28-61) is the
same kernel with ``win_length=400, center=False``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.frontend import mel as melmod

# float64 eps added to the power-mel (np.finfo(float).eps in the reference),
# float32 eps added before the log (torch.finfo().eps in the reference).
EPS64 = float(np.finfo(np.float64).eps)
EPS32 = float(np.finfo(np.float32).eps)


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    win_length: int | None = None  # defaults to n_fft
    hop: int = 160
    n_mels: int = 64
    fmin: float = 60.0
    fmax: float = 7800.0
    center: bool = True  # librosa center=True reflect padding
    htk: bool = False
    norm: str | None = "slaney"
    power: float = 2.0

    @property
    def win(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    def num_frames(self, n_samples: int) -> int:
        padded = n_samples + (self.n_fft if self.center else 0)
        return 1 + (padded - self.n_fft) // self.hop


def _constants(cfg: LogMelConfig) -> tuple[np.ndarray, np.ndarray]:
    """(dft_bank [n_fft, 2*n_bins], mel_T [2*n_bins -> via power, n_bins, n_mels])."""
    c, s = melmod.rdft_matrices(cfg.n_fft)
    window = melmod.hann_window(cfg.win)
    if cfg.win < cfg.n_fft:  # pad window to n_fft, centered (librosa pad_center)
        lpad = (cfg.n_fft - cfg.win) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win - lpad))
    # Fold the analysis window into the DFT bank: frames @ (w[:,None]*[C|S]).
    bank = window[:, None] * np.concatenate([c, s], axis=1)
    mfb_t = melmod.mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk, cfg.norm
    ).T
    return bank.astype(np.float32), mfb_t.astype(np.float32)


def frame_signal(wave: jax.Array, n_fft: int, hop: int, center: bool) -> jax.Array:
    """[..., n] -> [..., n_frames, n_fft] overlapping frames (strided gather)."""
    if center:
        pad = n_fft // 2
        wave = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect")
    n = wave.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return jnp.take(wave, jnp.asarray(idx), axis=-1)


@partial(jax.jit, static_argnames=("cfg",))
def log_mel(wave: jax.Array, cfg: LogMelConfig = LogMelConfig()) -> jax.Array:
    """[..., n_samples] float -> [..., n_mels, n_frames] log-mel (natural log)."""
    bank, mfb_t = (jnp.asarray(a) for a in _constants(cfg))
    n_bins = cfg.n_fft // 2 + 1

    frames = frame_signal(wave.astype(jnp.float32), cfg.n_fft, cfg.hop, cfg.center)
    spec = jnp.matmul(frames, bank, precision=jax.lax.Precision.HIGHEST)
    power = jnp.square(spec[..., :n_bins]) + jnp.square(spec[..., n_bins:])
    if cfg.power != 2.0:
        power = jnp.power(jnp.sqrt(power), cfg.power)
    melspec = jnp.matmul(power + EPS64, mfb_t, precision=jax.lax.Precision.HIGHEST)
    out = jnp.log(melspec + EPS32)
    return jnp.swapaxes(out, -1, -2)  # [..., n_mels, n_frames]
