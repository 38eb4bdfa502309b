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
    # Mosaic's default f32 dot is a single bf16 pass (~2^-9 relative):
    # measured 1.7e-2 max err vs the librosa oracle on v5e through the log
    # (cancellation on faded DFT bins amplifies; even the positive-sum mel
    # matmul alone costs 5.1e-3). HIGHEST (full f32) restores the XLA-path
    # quality, 1.1e-4; Mosaic has no bf16x3 middle tier ("HIGH" raises).
    hp = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    spec = jnp.dot(frames_ref[:, :], bank_ref[:, :], **hp)
    power = jnp.square(spec[:, :nb_pad]) + jnp.square(spec[:, nb_pad:])
    if log_mode == "librosa":
        # padded bins hit zero mel rows; EPS64 on them contributes nothing
        mel = jnp.dot(power + EPS64, mel_ref[:, :], **hp)
        out_ref[:, :] = jnp.log(mel + EPS32)
    else:  # kaldi: log(max(mel, eps))
        mel = jnp.dot(power, mel_ref[:, :], **hp)
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


def _ct_vpu_constants(cfg: LogMelConfig):
    """Constants for the CT kernel (decimation n = 128*j + m, N2 = n_fft/128).

        X[N2*t + r] = DFT_128( B[., r] * W_n^{. r} )[t],
        B[m, r]     = sum_j x[128 j + m] * W_N2^{j r}

    Only residues r = 0 .. N2/2 are computed; the remaining rfft bins are
    conjugate mirrors with equal power, and the bin -> (r, t) permutation
    plus the mirror dedup are folded into the *rows of the mel matrix*
    (a host-side constant), so the kernel never reorders lanes.

    Returns (window [1, n_fft], W_N2 scalar tables w8c/w8s [N2, R], twiddles
    twc/tws [R, 128], DFT-128 banks C/S [128, 128], mel_perm
    [R*128, n_mels_pad], N2, R) with R = N2//2 + 1.
    """
    n = cfg.n_fft
    n2 = n // 128
    n_bins = n // 2 + 1
    r_max = n2 // 2 + 1

    window = melmod.hann_window(cfg.win).astype(np.float64)
    if cfg.win < n:
        lpad = (n - cfg.win) // 2
        window = np.pad(window, (lpad, n - cfg.win - lpad))

    j = np.arange(n2)[:, None]
    r = np.arange(r_max)[None, :]
    ang8 = 2.0 * np.pi * j * r / n2
    w8c, w8s = np.cos(ang8), -np.sin(ang8)  # [N2, R] scalar tables

    m = np.arange(128)[None, :]
    angt = 2.0 * np.pi * np.arange(r_max)[:, None] * m / n
    twc, tws = np.cos(angt), -np.sin(angt)  # [R, 128]

    t = np.arange(128)
    ang = 2.0 * np.pi * np.outer(m.ravel(), t) / 128.0
    c128, s128 = np.cos(ang), -np.sin(ang)  # [m, t]

    # permuted mel rows: position (r, t) holds X[N2*t + r]; its power equals
    # bin k = N2*t + r (direct) or n - (N2*t + r) (conjugate mirror). Assign
    # each rfft bin to exactly one position; surplus positions get zero rows.
    mfb_t = melmod.mel_filterbank(
        cfg.sample_rate, n, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.htk, cfg.norm
    ).T  # [n_bins, n_mels]
    mels_pad = _round_up(cfg.n_mels, 128)
    mel_perm = np.zeros((r_max * 128, mels_pad))
    seen = np.zeros(n_bins, bool)
    for rr in range(r_max):
        for tt in range(128):
            k = n2 * tt + rr
            k = k if k <= n // 2 else n - k
            if 0 <= k < n_bins and not seen[k]:
                seen[k] = True
                mel_perm[rr * 128 + tt, : cfg.n_mels] = mfb_t[k]
    assert seen.all(), "mel row permutation must cover every rfft bin"

    f32 = lambda a: a.astype(np.float32)
    return f32(window[None]), f32(w8c), f32(w8s), f32(twc), f32(tws), f32(c128), f32(s128), f32(mel_perm), n2, r_max


def _ct_kernel(frames_ref, win_ref, twc_ref, tws_ref, c_ref, s_ref, mel_ref, out_ref, *, n2: int, r_max: int, w8c, w8s):
    ft, n = frames_ref.shape
    # full f32 like the dense kernel (see the precision note in _kernel;
    # Mosaic's default dot is bf16)
    hp = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    xw = frames_ref[:, :] * win_ref[0, :]
    # contiguous chunks x[128 j : 128 (j+1)] — static lane slices, no relayout
    chunks = [xw[:, 128 * j : 128 * (j + 1)] for j in range(n2)]
    powers = []
    for r in range(r_max):
        # radix-N2 DFT over the chunk index (VPU, scalar twiddles)
        b_re = jnp.zeros((ft, 128), jnp.float32)
        b_im = jnp.zeros((ft, 128), jnp.float32)
        for j in range(n2):
            cjr, sjr = float(w8c[j, r]), float(w8s[j, r])
            if cjr != 0.0:
                b_re = b_re + cjr * chunks[j]
            if sjr != 0.0:
                b_im = b_im + sjr * chunks[j]
        # twiddle W_n^{m r} (lane-aligned complex multiply)
        c_r_re = b_re * twc_ref[r, :] - b_im * tws_ref[r, :]
        c_r_im = b_re * tws_ref[r, :] + b_im * twc_ref[r, :]
        # 128-point DFT over m (MXU)
        x_re = jnp.dot(c_r_re, c_ref[:, :], **hp) - jnp.dot(c_r_im, s_ref[:, :], **hp)
        x_im = jnp.dot(c_r_re, s_ref[:, :], **hp) + jnp.dot(c_r_im, c_ref[:, :], **hp)
        powers.append(x_re * x_re + x_im * x_im)
    power = jnp.concatenate(powers, axis=-1)  # [ft, R*128], position (r, t)
    mel = jnp.dot(power + EPS64, mel_ref[:, :], **hp)
    out_ref[:, :] = jnp.log(mel + EPS32)


@partial(jax.jit, static_argnames=("cfg", "frames_per_tile", "interpret"))
def log_mel_fused_ct(
    wave: jax.Array,
    cfg: LogMelConfig = LogMelConfig(),
    frames_per_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Cooley-Tukey variant of ``log_mel_fused``: ~3.4x fewer MXU FLOPs.

    The dense kernel's [n_fft, 2*nb_pad] DFT matmul is replaced by a
    two-stage factorization laid out for the hardware: the radix-N2 stage
    runs on the VPU over static 128-lane chunk slices (scalar twiddles, no
    relayout), and the length-128 DFTs are [ft, 128] @ [128, 128] MXU
    matmuls for residues r <= N2/2 only (conjugate symmetry; the bin
    permutation is folded into the mel matrix rows). The XLA 'ct' path
    (stft.py:_power_spectrum_ct) loses because its small-K matmul stage is
    lane-hostile. Same 1e-3 librosa parity contract.
    """
    if cfg.n_fft % 256 != 0:
        raise ValueError("log_mel_fused_ct needs n_fft % 256 == 0")
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    b, _ = wave.shape
    frames = frame_signal(wave.astype(jnp.float32), cfg.n_fft, cfg.hop, cfg.center)
    n_frames = frames.shape[1]
    rows = b * n_frames
    frames = frames.reshape(rows, cfg.n_fft)

    window, w8c, w8s, twc, tws, c128, s128, mel_perm, n2, r_max = _ct_vpu_constants(cfg)
    mels_pad = mel_perm.shape[1]
    ft = min(frames_per_tile, rows)
    rows_pad = _round_up(rows, ft)
    if rows_pad != rows:
        frames = jnp.pad(frames, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        partial(_ct_kernel, n2=n2, r_max=r_max, w8c=w8c, w8s=w8s),
        out_shape=jax.ShapeDtypeStruct((rows_pad, mels_pad), jnp.float32),
        grid=(rows_pad // ft,),
        in_specs=[
            pl.BlockSpec((ft, cfg.n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max * 128, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ft, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=rows_pad * (r_max * 4 * 2 * 128 * 128 + 2 * r_max * 128 * mels_pad),
            bytes_accessed=4 * (rows_pad * cfg.n_fft + rows_pad * mels_pad),
            transcendentals=rows_pad * mels_pad,
        ),
    )(
        frames,
        jnp.asarray(window),
        jnp.asarray(twc),
        jnp.asarray(tws),
        jnp.asarray(c128),
        jnp.asarray(s128),
        jnp.asarray(mel_perm),
    )
    out = out[:rows, : cfg.n_mels].reshape(b, n_frames, cfg.n_mels)
    out = jnp.swapaxes(out, -1, -2)
    return out[0] if squeeze else out


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
