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
    # 'dense' = one [n_fft, 2*(n_fft/2+1)] MXU matmul — measured at the f32
    # matmul roofline on v5e (~17 TF/s) and faster end-to-end than 'ct', the
    # two-stage Cooley-Tukey variant whose K=8 stage is lane-layout-hostile.
    algo: str = "dense"

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
    """[..., n] -> [..., n_frames, n_fft] overlapping frames.

    Gather-free: view the signal as hop-sized rows; frame i is rows
    i .. i+ceil(n_fft/hop)-1 concatenated (every frame start is hop-aligned),
    so framing is a reshape + a handful of static slices — layout-friendly on
    TPU where a [n_frames, n_fft] strided gather is not.
    """
    if center:
        pad = n_fft // 2
        wave = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect")
    n = wave.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    nb = -(-n_fft // hop)  # hop-rows spanned by one frame
    total_rows = n_frames + nb
    wave = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(0, total_rows * hop - n)])
    rows = wave.reshape(*wave.shape[:-1], total_rows, hop)
    parts = [rows[..., j : j + n_frames, :] for j in range(nb)]
    return jnp.concatenate(parts, axis=-1)[..., :n_fft]


def _power_spectrum_dense(frames: jax.Array, cfg: LogMelConfig) -> jax.Array:
    """One dense [n_fft, 2 * n_bins] matmul (window folded in)."""
    bank, _ = _constants(cfg)
    n_bins = cfg.n_fft // 2 + 1
    spec = jnp.matmul(frames, jnp.asarray(bank), precision=jax.lax.Precision.HIGHEST)
    return jnp.square(spec[..., :n_bins]) + jnp.square(spec[..., n_bins:])


def _ct_constants(cfg: LogMelConfig, n1: int, n2: int):
    """Constants for the two-stage Cooley-Tukey DFT (n = i1 + n1 * i2)."""
    window = melmod.hann_window(cfg.win).astype(np.float64)
    if cfg.win < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win - lpad))
    # stage 1: DFT-n2 over i2 for each i1
    q = np.arange(n2)
    ang2 = 2.0 * np.pi * np.outer(q, q) / n2
    d2c, d2s = np.cos(ang2), -np.sin(ang2)  # [n2, n2]
    # twiddle W_N^{i1 k2}
    i1 = np.arange(n1)[:, None]
    k2 = np.arange(n2)[None, :]
    angt = 2.0 * np.pi * i1 * k2 / (n1 * n2)
    twc, tws = np.cos(angt), -np.sin(angt)  # [n1, n2]
    # stage 2: DFT-n1 over i1, only k1 = 0 .. n1//2 (rfft upper half via symmetry)
    k1_max = n1 // 2 + 1
    k1 = np.arange(k1_max)[None, :]
    ang1 = 2.0 * np.pi * np.arange(n1)[:, None] * k1 / n1
    d1c, d1s = np.cos(ang1), -np.sin(ang1)  # [n1, k1_max]
    f32 = lambda a: jnp.asarray(a.astype(np.float32))
    return f32(window), f32(d2c), f32(d2s), f32(twc), f32(tws), f32(d1c), f32(d1s)


def _power_spectrum_ct(frames: jax.Array, cfg: LogMelConfig, n1: int = 128) -> jax.Array:
    """Two-stage Cooley-Tukey power spectrum: ~3.7x fewer FLOPs than the dense
    DFT, with the large stage a full-K MXU matmul.

    X[k2 + n2*k1] = DFT_n1 over i1 of (twiddle * DFT_n2 over i2 of x[i1 + n1*i2]).
    Only k1 <= n1/2 is computed; the rest follows from real-input conjugate
    symmetry X[N - k] = conj(X[k]).
    """
    n = cfg.n_fft
    n2 = n // n1
    window, d2c, d2s, twc, tws, d1c, d1s = _ct_constants(cfg, n1, n2)
    hp = jax.lax.Precision.HIGHEST

    xw = frames * window  # [..., F, n]
    xr = xw.reshape(*xw.shape[:-1], n2, n1)  # x[i2, i1] (i2 major)
    # stage 1 (tiny K=n2 contraction): A[i1, k2]
    a_re = jnp.einsum("...qi,qk->...ik", xr, d2c, precision=hp)
    a_im = jnp.einsum("...qi,qk->...ik", xr, d2s, precision=hp)
    # twiddle (elementwise complex multiply)
    b_re = a_re * twc - a_im * tws
    b_im = a_re * tws + a_im * twc
    # stage 2 (K=n1 MXU matmul): X[k1, k2] for k1 in [0, n1/2]
    x_re = (
        jnp.einsum("...ik,im->...mk", b_re, d1c, precision=hp)
        - jnp.einsum("...ik,im->...mk", b_im, d1s, precision=hp)
    )
    x_im = (
        jnp.einsum("...ik,im->...mk", b_re, d1s, precision=hp)
        + jnp.einsum("...ik,im->...mk", b_im, d1c, precision=hp)
    )
    power_half = jnp.square(x_re) + jnp.square(x_im)  # [..., n1/2+1, n2] → k = k2 + n2*k1
    flat = power_half.reshape(*power_half.shape[:-2], -1)  # k2-minor? No: [m, k] -> m*n2 + k
    # layout: index (k1, k2) at position k1*n2 + k2 == k. ✓ for k ≤ n/2 we need
    # k1 ≤ n1/2; positions 0 .. (n1/2+1)*n2 - 1 cover k = 0 .. n/2 + (n2-1).
    return flat[..., : n // 2 + 1]


@partial(jax.jit, static_argnames=("cfg",))
def log_mel(wave: jax.Array, cfg: LogMelConfig = LogMelConfig()) -> jax.Array:
    """[..., n_samples] float -> [..., n_mels, n_frames] log-mel (natural log)."""
    _, mfb_t = _constants(cfg)
    frames = frame_signal(wave.astype(jnp.float32), cfg.n_fft, cfg.hop, cfg.center)
    if cfg.algo == "ct" and cfg.power == 2.0 and cfg.n_fft % 128 == 0 and cfg.n_fft // 128 in (2, 4, 8, 16):
        power = _power_spectrum_ct(frames, cfg)
    else:
        power = _power_spectrum_dense(frames, cfg)
        if cfg.power != 2.0:
            power = jnp.power(jnp.sqrt(power), cfg.power)
    melspec = jnp.matmul(power + EPS64, jnp.asarray(mfb_t), precision=jax.lax.Precision.HIGHEST)
    out = jnp.log(melspec + EPS32)
    return jnp.swapaxes(out, -1, -2)  # [..., n_mels, n_frames]
