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


def ct_eligible(cfg: LogMelConfig) -> bool:
    """Whether the Cooley-Tukey kernels' radix/lane layout supports ``cfg``.

    The authoritative form of the constraint both CT kernels raise on:
    the two-stage factorization needs n_fft = 128 * N2 with N2 even.
    """
    return cfg.n_fft % 256 == 0


def ct2_eligible(cfg: LogMelConfig) -> bool:
    """Whether ``log_mel_fused_ct2``'s in-kernel framing supports ``cfg``.

    On top of :func:`ct_eligible`, the lane-rotation framing needs the
    per-frame rotation set to be small: gcd(hop, 128) >= 16 (at most 8
    distinct rotated copies of the wave block). Dispatch sites
    (frontend/__init__.py, serve/export.py, bench.py) must use this
    predicate rather than re-deriving the arithmetic.
    """
    import math

    return ct_eligible(cfg) and (
        cfg.hop % 128 == 0 or 128 // math.gcd(cfg.hop % 128, 128) <= 8
    )


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


def _split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with hi + lo == a to ~2^-17 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """bf16x3 matmul: 3 single-pass bf16 MXU dots with f32 accumulation.

    Equals a full-f32 (HIGHEST, 6-pass) dot to ~2^-17 relative — the
    dropped lo*lo term is O(2^-18) — at half the MXU passes.
    """
    f32 = dict(preferred_element_type=jnp.float32)
    return (
        jnp.dot(a_hi, b_hi, **f32)
        + jnp.dot(a_hi, b_lo, **f32)
        + jnp.dot(a_lo, b_hi, **f32)
    )


def _ct_mel_rows(chunks, twc_ref, tws_ref, c_ref, s_ref, mel_ref, *, n2: int, r_max: int, w8c, w8s, split: bool = False):
    """Shared CT math: windowed chunks [ft, 128] x n2 -> log-mel rows [ft, mels_pad].

    ``split=False``: full-f32 dots (Precision.HIGHEST, 6 MXU passes — see
    the precision note in _kernel; Mosaic's *default* dot is a single bf16
    pass and misses the 1e-3 oracle contract). ``split=True``: bf16x3
    split-precision dots (_dot3, 3 passes) — same oracle quality at half
    the MXU time; the constant banks must then be pre-split hi/lo pairs:
    c_ref/s_ref/mel_ref become [2, ...] stacks with hi at index 0.
    """
    ft = chunks[0].shape[0]
    hp = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
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
        if split:
            re_hi, re_lo = _split_bf16(c_r_re)
            im_hi, im_lo = _split_bf16(c_r_im)
            x_re = _dot3(re_hi, re_lo, c_ref[0], c_ref[1]) - _dot3(im_hi, im_lo, s_ref[0], s_ref[1])
            x_im = _dot3(re_hi, re_lo, s_ref[0], s_ref[1]) + _dot3(im_hi, im_lo, c_ref[0], c_ref[1])
        else:
            x_re = jnp.dot(c_r_re, c_ref[:, :], **hp) - jnp.dot(c_r_im, s_ref[:, :], **hp)
            x_im = jnp.dot(c_r_re, s_ref[:, :], **hp) + jnp.dot(c_r_im, c_ref[:, :], **hp)
        powers.append(x_re * x_re + x_im * x_im)
    power = jnp.concatenate(powers, axis=-1) + EPS64  # [ft, R*128], position (r, t)
    if split:
        p_hi, p_lo = _split_bf16(power)
        mel = _dot3(p_hi, p_lo, mel_ref[0], mel_ref[1])
    else:
        mel = jnp.dot(power, mel_ref[:, :], **hp)
    return jnp.log(mel + EPS32)


def _ct_kernel(frames_ref, win_ref, twc_ref, tws_ref, c_ref, s_ref, mel_ref, out_ref, *, n2: int, r_max: int, w8c, w8s):
    xw = frames_ref[:, :] * win_ref[0, :]
    # contiguous chunks x[128 j : 128 (j+1)] — static lane slices, no relayout
    chunks = [xw[:, 128 * j : 128 * (j + 1)] for j in range(n2)]
    out_ref[:, :] = _ct_mel_rows(
        chunks, twc_ref, tws_ref, c_ref, s_ref, mel_ref, n2=n2, r_max=r_max, w8c=w8c, w8s=w8s
    )


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
    if not ct_eligible(cfg):
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


def _ct2_frame_params(cfg: LogMelConfig, n_frames: int):
    """Static geometry for in-kernel framing (see _ct2_kernel).

    Frame i, chunk j starts at flat sample  hop*i + 128*j.  With i = p*q + ph
    (p = 128/gcd(hop mod 128, 128)) that is  128*(S*q + m0(ph, j)) + sh(ph):

        S = hop*p/128,  m0(ph, j) = (hop*ph)//128 + j,  sh(ph) = (hop*ph) % 128

    so every chunk is an *aligned* 128-lane row of one of p lane-rotated
    copies of the wave laid out as [rows, 128]. Returns (p, S, nq, nblk)
    with nq = frames per phase and nblk*S = wave rows the kernel reads.
    """
    import math

    hop, n2 = cfg.hop, cfg.n_fft // 128
    b = hop % 128
    p = 1 if b == 0 else 128 // math.gcd(b, 128)
    s_stride = hop * p // 128
    nq = -(-n_frames // p)
    m0_max = (hop * (p - 1)) // 128 + (n2 - 1)
    nblk = -(-(s_stride * (nq - 1) + m0_max + 1) // s_stride)
    return p, s_stride, nq, nblk


def _ct2_kernel(
    wr_ref, win_ref, twc_ref, tws_ref, c_ref, s_ref, mel_ref, out_ref,
    *, n2: int, r_max: int, w8c, w8s, hop: int, p: int, s_stride: int,
    nq: int, nblk: int, n_frames: int, nf_pad: int, bt: int, split: bool,
):
    """CT log-mel with in-kernel framing: [bt, nblk*S, 128] wave rows in,
    [bt*nf_pad, mels_pad] log-mel rows out. The frame materialization that
    costs 6.4x the wave in HBM traffic (n_fft/hop overlap) happens in VMEM
    via lane rotations + aligned row slices (_ct2_frame_params)."""
    rows = nblk * s_stride
    rows8 = wr_ref.shape[1]  # rows rounded up to a sublane-aligned multiple of 8
    chunk_blocks: list[list] = [[] for _ in range(n2)]
    for w in range(bt):
        wv = wr_ref[w]  # [rows8, 128]
        views = []
        for ph in range(p):
            sh = (hop * ph) % 128
            if sh == 0:
                r_view = wv[:, :]
            else:
                # flat roll by sh: lanes shift left, carry from the next row
                # (roll + concat at the 8-aligned sublane count — Mosaic
                # rejects concat of offset views at unaligned row counts)
                carry = pltpu.roll(wv[:, :], rows8 - 1, 0)[:, :sh]
                r_view = jnp.concatenate([wv[:, sh:], carry], axis=1)
            views.append(r_view[:rows].reshape(nblk, s_stride, 128))
        for j in range(n2):
            for ph in range(p):
                m0 = (hop * ph) // 128 + j
                blk = views[ph][m0 // s_stride : m0 // s_stride + nq, m0 % s_stride, :]
                chunk_blocks[j].append(blk)  # [nq, 128], rows (w, ph, q)
    chunks = [
        jnp.concatenate(blks, axis=0) * win_ref[0, 128 * j : 128 * (j + 1)]
        for j, blks in enumerate(chunk_blocks)
    ]
    mel = _ct_mel_rows(
        chunks, twc_ref, tws_ref, c_ref, s_ref, mel_ref, n2=n2, r_max=r_max,
        w8c=w8c, w8s=w8s, split=split,
    )
    # de-interleave phases: mel rows are (w, ph, q); frame i = p*q + ph
    for w in range(bt):
        for ph in range(p):
            nq_ph = -(-(n_frames - ph) // p)  # frames with i % p == ph
            blk = mel[(w * p + ph) * nq : (w * p + ph) * nq + nq_ph]
            out_ref[w * nf_pad + ph : w * nf_pad + n_frames : p, :] = blk


def _split_const(a: np.ndarray) -> np.ndarray:
    """f32 [..] -> [2, ..] bf16 stack (hi, lo) for _dot3 constant banks."""
    import ml_dtypes

    hi = a.astype(ml_dtypes.bfloat16)
    lo = (a - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.stack([hi, lo])


@partial(jax.jit, static_argnames=("cfg", "batch_per_tile", "interpret", "split"))
def log_mel_fused_ct2(
    wave: jax.Array,
    cfg: LogMelConfig = LogMelConfig(),
    batch_per_tile: int = 4,
    interpret: bool = False,
    split: bool = True,
) -> jax.Array:
    """``log_mel_fused_ct`` with framing moved inside the kernel.

    XLA-side framing materializes [rows, n_fft] overlapping frames — a
    n_fft/hop = 6.4x data expansion that costs more HBM time than the DFT
    itself (PERF.md). Here the kernel reads the padded wave once as
    [rows, 128] and builds each chunk as an aligned row slice of a
    lane-rotated copy (exact data movement, zero extra HBM traffic). Same
    math and 1e-3 librosa contract as log_mel_fused_ct.
    """
    if not ct_eligible(cfg):
        raise ValueError("log_mel_fused_ct2 needs n_fft % 256 == 0")
    if not ct2_eligible(cfg):
        raise ValueError("log_mel_fused_ct2 needs gcd(hop, 128) >= 16")
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    wave = wave.astype(jnp.float32)
    if cfg.center:
        pad = cfg.n_fft // 2
        wave = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    b, n = wave.shape
    n_frames = 1 + (n - cfg.n_fft) // cfg.hop
    p, s_stride, nq, nblk = _ct2_frame_params(cfg, n_frames)
    rows8 = _round_up(nblk * s_stride, 8)

    window, w8c, w8s, twc, tws, c128, s128, mel_perm, n2, r_max = _ct_vpu_constants(cfg)
    mels_pad = mel_perm.shape[1]
    nf_pad = _round_up(n_frames, 8)
    bt = min(batch_per_tile, b)
    b_pad = _round_up(b, bt)
    wave = jnp.pad(wave, ((0, b_pad - b), (0, rows8 * 128 - n)))
    wrows = wave.reshape(b_pad, rows8, 128)

    if split:
        c_in, s_in, mel_in = _split_const(c128), _split_const(s128), _split_const(mel_perm)
        bank_specs = [
            pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r_max * 128, mels_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ]
    else:
        c_in, s_in, mel_in = c128, s128, mel_perm
        bank_specs = [
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max * 128, mels_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        partial(
            _ct2_kernel, n2=n2, r_max=r_max, w8c=w8c, w8s=w8s, hop=cfg.hop,
            p=p, s_stride=s_stride, nq=nq, nblk=nblk, n_frames=n_frames,
            nf_pad=nf_pad, bt=bt, split=split,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad * nf_pad, mels_pad), jnp.float32),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, rows8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *bank_specs,
        ],
        out_specs=pl.BlockSpec((bt * nf_pad, mels_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b_pad * p * nq * (r_max * 4 * 2 * 128 * 128 + 2 * r_max * 128 * mels_pad),
            bytes_accessed=4 * (b_pad * rows8 * 128 + b_pad * nf_pad * mels_pad),
            transcendentals=b_pad * nf_pad * mels_pad,
        ),
    )(
        wrows,
        jnp.asarray(window),
        jnp.asarray(twc),
        jnp.asarray(tws),
        jnp.asarray(c_in),
        jnp.asarray(s_in),
        jnp.asarray(mel_in),
    )
    out = out.reshape(b_pad, nf_pad, mels_pad)[:b, :n_frames, : cfg.n_mels]
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
