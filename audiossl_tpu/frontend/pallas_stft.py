"""Fused Pallas STFT + mel kernel: window·DFT -> |·|² -> mel -> log.

One `pallas_call` computes the whole librosa-compatible log-mel over frame
tiles with no HBM intermediates between stages: the window-folded DFT bank
and the mel matrix stay resident in VMEM, and both contractions run on the
MXU in f32 (the 1e-3 librosa-parity target rules out bf16). Framing itself
(hop-blocked slice-concat, frontend/stft.py frame_signal) stays in XLA — it
is pure layout work at <5% of HBM bandwidth.

Mosaic layout notes: the rfft bin count (n_fft/2 + 1 = 513) is padded up to
a lane-aligned 640 so the re/im split of the spectrum slices on a 128-lane
boundary; the padded mel matrix rows are zero so the padding never leaks
into the output.

Roofline (PERF.md): the dense DFT matmul dominates and already runs at the
f32 MXU roofline in the XLA path, so this kernel targets parity + explicit
schedule control, and is the place to host future in-kernel factorizations.
bench.py picks whichever path measures faster.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiossl_tpu.frontend import mel as melmod
from audiossl_tpu.frontend.stft import EPS32, EPS64, LogMelConfig, frame_signal


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _padded_constants(cfg: LogMelConfig) -> tuple[np.ndarray, np.ndarray, int]:
    """(bank [n_fft, 2*nb_pad], mel [nb_pad, n_mels_pad], nb_pad)."""
    n_bins = cfg.n_fft // 2 + 1
    nb_pad = _round_up(n_bins, 128)
    c, s = melmod.rdft_matrices(cfg.n_fft)
    window = melmod.hann_window(cfg.win)
    if cfg.win < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win - lpad))
    cpad = np.pad(c, ((0, 0), (0, nb_pad - n_bins)))
    spad = np.pad(s, ((0, 0), (0, nb_pad - n_bins)))
    bank = window[:, None] * np.concatenate([cpad, spad], axis=1)
    mfb = melmod.mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk, cfg.norm)
    mel_pad = np.pad(mfb.T, ((0, nb_pad - n_bins), (0, _round_up(cfg.n_mels, 128) - cfg.n_mels)))
    return bank.astype(np.float32), mel_pad.astype(np.float32), nb_pad


def _kernel(frames_ref, bank_ref, mel_ref, out_ref, *, nb_pad: int, log_mode: str):
    spec = jnp.dot(frames_ref[:, :], bank_ref[:, :], preferred_element_type=jnp.float32)
    power = jnp.square(spec[:, :nb_pad]) + jnp.square(spec[:, nb_pad:])
    if log_mode == "librosa":
        # padded bins hit zero mel rows; EPS64 on them contributes nothing
        mel = jnp.dot(power + EPS64, mel_ref[:, :], preferred_element_type=jnp.float32)
        out_ref[:, :] = jnp.log(mel + EPS32)
    else:  # kaldi: log(max(mel, eps))
        mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32)
        out_ref[:, :] = jnp.log(jnp.maximum(mel, EPS32))


@partial(jax.jit, static_argnames=("cfg", "frames_per_tile", "interpret"))
def log_mel_fused(
    wave: jax.Array,
    cfg: LogMelConfig = LogMelConfig(),
    frames_per_tile: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[B, n_samples] (or [n_samples]) -> [B, n_mels, n_frames] log-mel."""
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    b, n = wave.shape
    frames = frame_signal(wave.astype(jnp.float32), cfg.n_fft, cfg.hop, cfg.center)
    n_frames = frames.shape[1]
    rows = b * n_frames
    frames = frames.reshape(rows, cfg.n_fft)

    bank, mel_pad, nb_pad = _padded_constants(cfg)
    mels_pad = mel_pad.shape[1]

    ft = min(frames_per_tile, rows)
    rows_pad = _round_up(rows, ft)
    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    out = _fused_rows(frames, bank, mel_pad, nb_pad, "librosa", frames_per_tile, interpret)
    out = out[:rows, : cfg.n_mels].reshape(b, n_frames, cfg.n_mels)
    out = jnp.swapaxes(out, -1, -2)  # [B, n_mels, n_frames]
    return out[0] if squeeze else out


def _fused_rows(frames, bank, mel_pad, nb_pad, log_mode, frames_per_tile, interpret):
    """Shared fused spectro kernel over frame rows ([rows, win] @ banks)."""
    rows, win = frames.shape
    mels_pad = mel_pad.shape[1]
    ft = min(frames_per_tile, rows)
    rows_pad = _round_up(rows, ft)
    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))
    return pl.pallas_call(
        partial(_kernel, nb_pad=nb_pad, log_mode=log_mode),
        out_shape=jax.ShapeDtypeStruct((rows_pad, mels_pad), jnp.float32),
        grid=(rows_pad // ft,),
        in_specs=[
            pl.BlockSpec((ft, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, 2 * nb_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ft, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * win * 2 * nb_pad + 2 * rows_pad * nb_pad * mels_pad,
            bytes_accessed=4 * (rows_pad * win + win * 2 * nb_pad + rows_pad * mels_pad),
            transcendentals=rows_pad * mels_pad,
        ),
    )(frames, jnp.asarray(bank), jnp.asarray(mel_pad))


@partial(jax.jit, static_argnames=("cfg", "frames_per_tile", "interpret"))
def kaldi_fbank_fused(wave: jax.Array, cfg=None, frames_per_tile: int = 1024, interpret: bool = False) -> jax.Array:
    """Fused Kaldi-compatible fbank: [B, n] -> [B, n_frames, num_mel_bins].

    Framing + DC removal + preemphasis stay in XLA (row-wise elementwise);
    the window is folded into the DFT bank (implicit zero-pad 400 -> 512 by
    using only the first `window_size` bank rows); window·DFT -> |·|² -> mel
    -> log(max(,eps)) run fused. Matches frontend.fbank.kaldi_fbank.
    """
    from audiossl_tpu.frontend.fbank import FbankConfig, hanning_sym, kaldi_mel_banks

    if cfg is None:
        cfg = FbankConfig()
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    b, n = wave.shape
    ws, shift, nfft = cfg.window_size, cfg.shift, cfg.padded_window
    n_frames = cfg.num_frames(n)
    idx = np.arange(n_frames)[:, None] * shift + np.arange(ws)[None, :]
    frames = jnp.take(wave.astype(jnp.float32), jnp.asarray(idx), axis=-1)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if cfg.preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis * prev
    frames = frames.reshape(b * n_frames, ws)

    n_bins = nfft // 2 + 1
    nb_pad = _round_up(n_bins, 128)
    c, s = melmod.rdft_matrices(nfft)
    cpad = np.pad(c, ((0, 0), (0, nb_pad - n_bins)))[:ws]
    spad = np.pad(s, ((0, 0), (0, nb_pad - n_bins)))[:ws]
    bank = hanning_sym(ws)[:, None] * np.concatenate([cpad, spad], axis=1)
    mfb = kaldi_mel_banks(cfg.num_mel_bins, nfft, cfg.sample_rate, cfg.low_freq, cfg.high_freq)
    mfb = np.pad(mfb, ((0, 0), (0, 1)))  # Nyquist column
    mel_pad = np.pad(
        mfb.T, ((0, nb_pad - n_bins), (0, _round_up(cfg.num_mel_bins, 128) - cfg.num_mel_bins))
    ).astype(np.float32)

    out = _fused_rows(frames, bank.astype(np.float32), mel_pad, nb_pad, "kaldi", frames_per_tile, interpret)
    out = out[: b * n_frames, : cfg.num_mel_bins].reshape(b, n_frames, cfg.num_mel_bins)
    return out[0] if squeeze else out
