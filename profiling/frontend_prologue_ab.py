"""A/B the XLA prologue of log_mel_fused_ct2 (PERF.md: ~1.3 ms of the
4.17 ms/1024-clip frontend is reflect-pad + lane-retile outside the kernel).

Variant B replaces jnp.pad(mode="reflect") + trailing zero-pad + reshape with
ONE concat expression (reversed head slice | wave | reversed tail slice |
zeros) so XLA can emit a single fused copy instead of stacking pad kernels.

Run on the real chip: python profiling/frontend_prologue_ab.py
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.frontend import pallas_stft as ps

B, CLIP = 1024, 15200
WARMUP, ITERS = 3, 30


def _time(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / ITERS


@partial(jax.jit, static_argnames=("cfg",))
def ct2_concat_prologue(wave: jax.Array, cfg: LogMelConfig = LogMelConfig()):
    """log_mel_fused_ct2 with the one-concat prologue (math identical)."""
    assert cfg.center
    wave = wave.astype(jnp.float32)
    b, n_raw = wave.shape
    pad = cfg.n_fft // 2
    n = n_raw + 2 * pad
    n_frames = 1 + (n - cfg.n_fft) // cfg.hop
    p, s_stride, nq, nblk = ps._ct2_frame_params(cfg, n_frames)
    rows8 = ps._round_up(nblk * s_stride, 8)

    window, w8c, w8s, twc, tws, c128, s128, mel_perm, n2, r_max = ps._ct_vpu_constants(cfg)
    mels_pad = mel_perm.shape[1]
    nf_pad = ps._round_up(n_frames, 8)
    bt = min(4, b)
    b_pad = ps._round_up(b, bt)
    # ONE concat: reflect head | wave | reflect tail | zeros-to-lane-multiple
    head = wave[:, pad:0:-1]
    tail = wave[:, -2 : -(pad + 2) : -1]
    z = jnp.zeros((b, rows8 * 128 - n), jnp.float32)
    padded = jnp.concatenate([head, wave, tail, z], axis=1)
    if b_pad != b:
        padded = jnp.pad(padded, ((0, b_pad - b), (0, 0)))
    wrows = padded.reshape(b_pad, rows8, 128)

    c_in, s_in, mel_in = ps._split_const(c128), ps._split_const(s128), ps._split_const(mel_perm)
    bank_specs = [
        ps.pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0), memory_space=ps.pltpu.VMEM),
        ps.pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0), memory_space=ps.pltpu.VMEM),
        ps.pl.BlockSpec((2, r_max * 128, mels_pad), lambda i: (0, 0, 0), memory_space=ps.pltpu.VMEM),
    ]
    out = ps.pl.pallas_call(
        partial(
            ps._ct2_kernel, n2=n2, r_max=r_max, w8c=w8c, w8s=w8s, hop=cfg.hop,
            p=p, s_stride=s_stride, nq=nq, nblk=nblk, n_frames=n_frames,
            nf_pad=nf_pad, bt=bt, split=True,
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad * nf_pad, mels_pad), jnp.float32),
        grid=(b_pad // bt,),
        in_specs=[
            ps.pl.BlockSpec((bt, rows8, 128), lambda i: (i, 0, 0), memory_space=ps.pltpu.VMEM),
            ps.pl.BlockSpec((1, cfg.n_fft), lambda i: (0, 0), memory_space=ps.pltpu.VMEM),
            ps.pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=ps.pltpu.VMEM),
            ps.pl.BlockSpec((r_max, 128), lambda i: (0, 0), memory_space=ps.pltpu.VMEM),
            *bank_specs,
        ],
        out_specs=ps.pl.BlockSpec((bt * nf_pad, mels_pad), lambda i: (i, 0), memory_space=ps.pltpu.VMEM),
        cost_estimate=ps.pl.CostEstimate(
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
    return jnp.swapaxes(out, -1, -2)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    wave = jnp.asarray(0.3 * rng.standard_normal((B, CLIP)), jnp.float32)
    cfg = LogMelConfig()

    a = ps.log_mel_fused_ct2(wave, cfg)
    bvar = ct2_concat_prologue(wave, cfg)
    err = float(jnp.max(jnp.abs(a - bvar)))
    print(f"A/B max abs diff: {err:.3e}")
    assert err == 0.0, "prologue variants must be bit-identical"

    ta = _time(lambda w: ps.log_mel_fused_ct2(w, cfg), wave)
    tb = _time(lambda w: ct2_concat_prologue(w, cfg), wave)
    print(f"A (pad-reflect + pad + reshape): {ta*1e3:7.2f} ms/{B} clips = {B/ta:,.0f} clips/s")
    print(f"B (one-concat prologue):         {tb*1e3:7.2f} ms/{B} clips = {B/tb:,.0f} clips/s")


if __name__ == "__main__":
    main()
