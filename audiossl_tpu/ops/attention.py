"""Fused pooled attention with decomposed relative-position bias (Pallas).

MViT's attention (`models/mvit.py:MultiScaleAttention`, transcribing
extras/mast_new/mast/mvit/models/attention.py:cal_rel_pos_spatial) is, per
(batch, head):

    scores = (q * scale) @ k^T + bias @ E          # [Lq, Lk]
    out    = softmax(scores) @ v                   # [Lq, D]

where ``bias = [q·rel_pos_h | q·rel_pos_w]`` is the decomposed rel-pos term
([Lq, kh+kw] — tiny) and ``E`` is a static 0/1 expansion matrix
(E[i, kh_i*kw + kw_i] = 1 iff i == kh_i, E[kh+j, ...] = 1 iff j == kw_i)
that broadcasts the height/width biases over the flattened key grid.

The XLA path materializes ``scores`` in HBM four-plus times (einsum out,
two rel-pos adds through a 6-D reshape, softmax in/out) — measured as the
dominant cost of every MViT stage on v5e (PERF.md: rel-pos alone is 21 ms
of a 33 ms stage-0 block forward at B=64). Here one kernel keeps the whole
[TQ, Lk] tile pipeline in VMEM: MViT's pooled keys are short (Lk <= 512
for MAST's 128x1024-fbank geometry), so k/v stay fully resident per
(b, h) program and the softmax is exact single-pass (no streaming state).
The backward kernel recomputes probabilities flash-style (no [Lq, Lk]
residuals are saved — activation memory drops by the score matrix) and
accumulates dk/dv in a revisited VMEM output block across q-tiles.

Precision: the f32 parity path runs every dot at Precision.HIGHEST
(Mosaic's default dot is a single bf16 pass — see frontend/pallas_stft.py);
the bf16 speed path runs single-pass MXU dots with f32 accumulation and
f32 softmax, matching the XLA bf16 path's contract (logits + softmax f32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def rel_expand_matrix(kh: int, kw: int, kb_pad: int | None = None) -> np.ndarray:
    """[kh+kw (padded), kh*kw] 0/1 expansion: bias_flat = bias_cat @ E.

    Row i < kh selects keys whose grid row is i; row kh+j selects keys
    whose grid column is j — so (bias_cat @ E)[q, r*kw + c] =
    rel_h[q, r] + rel_w[q, c], the cal_rel_pos_spatial broadcast.
    """
    e = np.zeros((kb_pad or (kh + kw), kh * kw), np.float32)
    cols = np.arange(kh * kw)
    e[cols // kw, cols] = 1.0
    e[kh + cols % kw, cols] = 1.0
    return e


def _dots(f32: bool):
    """(kwargs for exact-or-fast jnp.dot) given the precision path."""
    if f32:
        return dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return dict(preferred_element_type=jnp.float32)


def _scores(q_ref, k_ref, bias_e, *, f32: bool, lk: int):
    """[TQ, Lkp] masked logits for one q-tile (f32). bias_e = (bias_ref, e_ref) | None."""
    dk = _dots(f32)
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())), **dk)
    if bias_e is not None:
        bias_ref, e_ref = bias_e
        s = s + jnp.dot(bias_ref[0], e_ref[:, :], **dk)
    if s.shape[1] != lk:
        pad = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) >= lk
        s = jnp.where(pad, _MASK, s)
    return s


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fwd_kernel(*refs, f32: bool, lk: int, has_bias: bool):
    q_ref, k_ref, v_ref, *rest = refs
    bias_e, o_ref = (tuple(rest[:2]), rest[2]) if has_bias else (None, rest[0])
    p = _softmax(_scores(q_ref, k_ref, bias_e, f32=f32, lk=lk))
    o_ref[0] = jnp.dot(p.astype(v_ref.dtype), v_ref[0], **_dots(f32)).astype(o_ref.dtype)


def _bwd_kernel(*refs, f32: bool, lk: int, has_bias: bool):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, e_ref, do_ref, dq_ref, dbias_ref, dk_ref, dv_ref = refs
        bias_e = (bias_ref, e_ref)
    else:
        q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
        bias_e = None
    dk_ = _dots(f32)
    dt = v_ref.dtype
    p = _softmax(_scores(q_ref, k_ref, bias_e, f32=f32, lk=lk))
    do = do_ref[0]
    # dp = dO @ v^T ; ds = p * (dp - rowsum(dp * p))
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())), **dk_)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_c = ds.astype(dt)
    dq_ref[0] = jnp.dot(ds_c, k_ref[0], **dk_).astype(dq_ref.dtype)
    if has_bias:
        # d(bias) = ds @ E^T (E is 0/1 — exact at any precision)
        dbias_ref[0] = jax.lax.dot_general(
            ds, e_ref[:, :], (((1,), (1,)), ((), ())), **dk_
        ).astype(dbias_ref.dtype)
    # dk = ds^T @ q ; dv = p^T @ dO — accumulated across q-tiles (the
    # output block is revisited: index_map is constant along the q grid dim)
    dk_t = jax.lax.dot_general(ds_c, q_ref[0], (((0,), (0,)), ((), ())), **dk_)
    dv_t = jax.lax.dot_general(p.astype(dt), do, (((0,), (0,)), ((), ())), **dk_)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = dk_t.astype(dk_ref.dtype)
        dv_ref[0] = dv_t.astype(dv_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        dk_ref[0] += dk_t.astype(dk_ref.dtype)
        dv_ref[0] += dv_t.astype(dv_ref.dtype)


def _pad_last2(x, r, c):
    return jnp.pad(x, ((0, 0), (0, r - x.shape[1]), (0, c - x.shape[2])))


def _geom(lq: int, lk: int, d: int, kb: int):
    dp, kbp, lkp = _round_up(d, 128), _round_up(kb, 128), _round_up(lk, 128)
    # smaller q-tiles when the whole key block is long (VMEM: k/v + the
    # [TQ, Lkp] score tile + backward temps must coexist per program)
    tq = min(512 if lkp <= 512 else 256, _round_up(lq, 8))
    lqp = _round_up(lq, tq)
    return dp, kbp, lkp, tq, lqp


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_rel_attention(q, k, v, bias, expand, scale: float, f32: bool, interpret: bool):
    """softmax((q*scale) @ k^T [+ bias @ expand]) @ v, fused on TPU.

    q: [BH, Lq, D]; k, v: [BH, Lk, D]; bias: [BH, Lq, KB] or None (plain
    attention — AST/ViT); expand: [KBp, Lk] (see rel_expand_matrix; KBp =
    KB rounded up to 128), None iff bias is None. Returns [BH, Lq, D] in
    v.dtype. Lk must be small enough that k/v + a [TQ, Lk] score tile fit
    VMEM per (b*h) program (MViT pooled keys: <= 512; AST: ~1.2k).
    """
    out, _ = _fwd(q, k, v, bias, expand, scale, f32, interpret)
    return out


def _call(kernel, n_out, q, k, v, bias, expand, extra_in, scale, f32, interpret):
    bh, lq, d = q.shape
    has_bias = bias is not None
    lk, kb = k.shape[1], bias.shape[2] if has_bias else 0
    dp, kbp, lkp, tq, lqp = _geom(lq, lk, d, kb)
    grid = (bh, lqp // tq)
    tile_q = pl.BlockSpec((1, tq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    whole_k = pl.BlockSpec((1, lkp, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    tile_b = pl.BlockSpec((1, tq, kbp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    qs = _pad_last2((q * jnp.asarray(scale, q.dtype)).astype(q.dtype), lqp, dp)
    in_specs = [tile_q, whole_k, whole_k]
    args = [qs, _pad_last2(k, lkp, dp), _pad_last2(v, lkp, dp)]
    if has_bias:
        if expand.shape != (kbp, lkp):
            expand = jnp.pad(expand, ((0, kbp - expand.shape[0]), (0, lkp - expand.shape[1])))
        in_specs += [tile_b, pl.BlockSpec((kbp, lkp), lambda i, j: (0, 0), memory_space=pltpu.VMEM)]
        args += [_pad_last2(bias, lqp, kbp), expand]
    for x in extra_in:
        in_specs.append(tile_q)
        args.append(_pad_last2(x, lqp, dp))
    out_specs, out_shape = [], []
    for kind in n_out:
        if kind == "o":  # per-q-tile [BH, Lqp, Dp]
            out_specs.append(tile_q)
            out_shape.append(jax.ShapeDtypeStruct((bh, lqp, dp), v.dtype))
        elif kind == "b":  # per-q-tile bias grad [BH, Lqp, KBp]
            out_specs.append(tile_b)
            out_shape.append(jax.ShapeDtypeStruct((bh, lqp, kbp), bias.dtype))
        else:  # "k": accumulated over q-tiles [BH, Lkp, Dp] — f32 accumulator
            out_specs.append(whole_k)
            out_shape.append(jax.ShapeDtypeStruct((bh, lkp, dp), jnp.float32))
    outs = pl.pallas_call(
        partial(kernel, f32=f32, lk=lk, has_bias=has_bias),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        interpret=interpret,
    )(*args)
    return outs if isinstance(outs, (tuple, list)) else (outs,)


def _fwd(q, k, v, bias, expand, scale, f32, interpret):
    (o,) = _call(_fwd_kernel, "o", q, k, v, bias, expand, (), scale, f32, interpret)
    return o[:, : q.shape[1], : q.shape[2]], (q, k, v, bias, expand)


def _bwd(scale, f32, interpret, res, do):
    q, k, v, bias, expand = res
    kinds = "obkk" if bias is not None else "okk"
    outs = _call(_bwd_kernel, kinds, q, k, v, bias, expand, (do,), scale, f32, interpret)
    dq, dbias, dk, dv = outs if bias is not None else (outs[0], None, outs[1], outs[2])
    bh, lq, d = q.shape
    lk = k.shape[1]
    dq = (dq[:, :lq, :d].astype(jnp.float32) * scale).astype(q.dtype)
    return (
        dq,
        dk[:, :lk, :d].astype(k.dtype),
        dv[:, :lk, :d].astype(v.dtype),
        dbias[:, :lq, : bias.shape[2]] if bias is not None else None,
        # expand is a static 0/1 matrix — its grad is never consumed
        jnp.zeros_like(expand) if expand is not None else None,
    )


fused_rel_attention.defvjp(_fwd, _bwd)
