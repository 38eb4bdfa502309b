"""Fused conv block 1: Conv3x3(C_in=1) -> BatchNorm -> ReLU -> MaxPool2x2.

The reference's AudioNTT block 1 (src/encoder/audiontt.py:45-50) is the
HBM-bandwidth hot spot of the whole encoder: its [B, T, F, 64] conv output
(805 MB at B=1024 bf16) is written once and re-read by BN stats, BN
normalize, ReLU and the pool — PERF.md measures the train step as bound by
exactly this traffic. These Pallas kernels never materialize that tensor:

  * the conv is the banded matmul of models/audiontt.py:BandedConv1
    ([rows, 3F] @ [3F, F*C], contraction 3F=192 — MXU-dense), evaluated on
    two t-parity row streams against a banded matrix whose columns are
    grouped by output-frequency parity. The four (t-parity, f-parity)
    quadrants land at identical (row, column) positions, so the 2x2
    maxpool is an ELEMENTWISE max of four matmul outputs — no reshapes, no
    strided access in-kernel, and the pooled [B, T/2, F/2, C] result is
    the only activation written to HBM. Each stream's two column halves
    run as ONE [rt, 3F] @ [3F, F*C] dot (lane-split afterwards is free);
  * the t-parity streams are built host^H^H XLA-side by strided slices of
    the padded input (cheap: ~3x the raw input bytes) and SHARED by the
    stats kernel, the apply kernel and both backward passes —
    models/audiontt.py prepares them once per block call;
  * BatchNorm batch statistics come from a separate accumulation kernel
    (the conv recompute is ~7 MFLOP/clip — noise next to the saved HBM
    passes); normalization is folded into the matmul epilogue as a
    per-column affine;
  * the backward is flash-style: two recompute passes (a reduction pass
    for d_gamma/d_beta-type sums, then a pass contracting d_conv into the
    banded weight gradient in VMEM), with the standard BatchNorm backward
    accounting for the loss paths through the batch mean/var. Cross-device
    (SyncBN) stats use lax.pmean / lax.psum exactly like the flax
    BatchNorm(axis_name=...) it replaces.

Gradient caveat: d(input) is NOT computed (returned as zeros) — in every
training path of this framework the block-1 input is a non-trainable
spectrogram view, so XLA dead-code-eliminates that cotangent anyway in the
unfused path. Do not place this block downstream of trainable parameters.

Numerics vs the unfused path: the conv accumulates in f32 and feeds BN
without the intermediate bf16 round-trip flax inserts, so on-device bf16
results differ from the unfused path at ~1e-2 (the fused path is the
*more* accurate of the two); with f32 inputs the paths agree to ~1e-5
(tests/test_block1.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5  # matches ConvBlock's nn.BatchNorm(epsilon=1e-5)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def carries_tangent(x) -> bool:
    """True iff ``x`` is being differentiated *through* — i.e. it carries a
    non-zero tangent at some tracer level, meaning trainable parameters sit
    upstream of it. Used to enforce this module's "no trainable upstream"
    invariant at trace time instead of by docstring: the fused block returns
    a zeros input cotangent, so a trainable frontend/adapter feeding it
    would silently stop training (VERDICT r3 Weak #5).

    Inputs that are mere data (constants w.r.t. the differentiated params)
    never appear as JVP/Linearize tracers under jax.grad, so this is
    false-positive-free on the supported training paths. Conservative on
    unrecognized tracer stacks (returns False — same behavior as before the
    guard existed).
    """
    try:
        from jax._src.interpreters import ad as _ad
    except Exception:  # pragma: no cover - JAX internals moved
        return False
    diff_tracers = tuple(
        t for t in (getattr(_ad, "JVPTracer", None), getattr(_ad, "LinearizeTracer", None))
        if t is not None
    )
    zero = getattr(_ad, "Zero", ())
    try:
        t, depth = x, 0
        while isinstance(t, jax.core.Tracer) and depth < 16:
            if isinstance(t, diff_tracers):
                if not isinstance(t.tangent, zero):
                    return True
                t = t.primal
            else:
                # peel one wrapper level (BatchTracer .val, etc.)
                t = getattr(t, "primal", None) if hasattr(t, "primal") else getattr(t, "val", None)
            depth += 1
    except Exception:  # pragma: no cover - JAX tracer internals reshaped
        # This whole walk reads private tracer attributes; if a JAX upgrade
        # renames them, degrade to the documented ack-only behavior rather
        # than raising inside every fused-block1 training trace.
        return False
    return False


def feasible(t: int, f: int, c: int) -> bool:
    """Kernel layout constraints: even t/f grids, lane-aligned pooled row."""
    return t % 2 == 0 and f % 2 == 0 and ((f // 2) * c) % 128 == 0 and (3 * f) % 8 == 0


def banded_matrix(kernel: jax.Array, f: int, dtype) -> jax.Array:
    """[3, 3, 1, C] conv kernel -> [3F, F*C] banded matrix, columns grouped
    (f-even block || f-odd block), each block's column index = p*C + c.

    Rows are (j, f_in) like models/audiontt.py:BandedConv1; the kernel uses
    nn.Conv-on-time-major convention ([time, freq, 1, C], the unfused
    ConvBlock's parameter) — the transpose of BandedConv1's layout.
    """
    c = kernel.shape[-1]
    kernel = jnp.transpose(kernel, (1, 0, 2, 3))  # -> [freq, time, 1, C]
    eye = np.stack([np.eye(f, k=1 - di, dtype=np.float32) for di in range(3)])
    m = jnp.einsum("dio,djc->jioc", jnp.asarray(eye), kernel[:, :, 0, :].astype(jnp.float32))
    m = m.reshape(3 * f, f, c)
    return jnp.concatenate(
        [m[:, 0::2].reshape(3 * f, -1), m[:, 1::2].reshape(3 * f, -1)], axis=1
    ).astype(dtype)


def block1_streams(x: jax.Array, rt: int) -> tuple[jax.Array, jax.Array, int]:
    """x [B, T, F] -> t-even / t-odd banded row streams, each [R_pad, 3F].

    Row r of stream e/o carries the 3 time-shifted copies (zero-padded at
    clip edges) for frame t = 2r' / 2r'+1 of clip r' // (T/2). Built by
    direct strided slices of the padded input (no [B, T, 3F] intermediate);
    rows are zero-padded up to a multiple of the row tile ``rt``.
    """
    b, t, f = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    xe = jnp.concatenate([xp[:, 0:t:2], xp[:, 1 : t + 1 : 2], xp[:, 2 : t + 2 : 2]], axis=-1)
    xo = jnp.concatenate(
        [xp[:, 1:t:2], xp[:, 2 : t + 1 : 2], xp[:, 3 : t + 2 : 2]], axis=-1
    )
    xe = xe.reshape(b * t // 2, 3 * f)
    xo = xo.reshape(b * t // 2, 3 * f)
    n = xe.shape[0]
    pad = _round_up(n, rt) - n
    if pad:
        xe = jnp.pad(xe, ((0, pad), (0, 0)))
        xo = jnp.pad(xo, ((0, pad), (0, 0)))
    return xe, xo, n


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b):  # a^T @ b with contraction over rows
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# vecs row layout (one [8, L] f32 input shared by all kernels):
#   0: bias tiled per column          3: k1 = istd * gamma
#   1: a  = gamma * istd              4: k2 = -istd^2 * S2
#   2: b2 = beta - mean * a           5: k3 = -istd * S1 + istd^2 * S2 * mean
_BIAS, _A, _B2, _K1, _K2, _K3 = range(6)


def _halves(y, l):
    """One stream's conv output [rt, 2L] -> (f-even [rt, L], f-odd [rt, L])."""
    return y[:, :l], y[:, l:]


def _apply_kernel(xe_ref, xo_ref, m_ref, vecs_ref, out_ref, *, l):
    """Pooled output tile: max over the four quadrants of relu(affine(conv))."""
    a = vecs_ref[_A : _A + 1, :]
    # fold the conv bias into the affine shift: (q + bias)*a + b2 = q*a + bapp
    bapp = vecs_ref[_B2 : _B2 + 1, :] + vecs_ref[_BIAS : _BIAS + 1, :] * a
    o = None
    for x_ref in (xe_ref, xo_ref):
        y2 = _dot(x_ref[:], m_ref[:])
        for q in _halves(y2, l):
            y = jnp.maximum(q * a + bapp, 0.0)
            o = y if o is None else jnp.maximum(o, y)
    out_ref[:] = o.astype(out_ref.dtype)


def _recompute_dy(xe_ref, xo_ref, m_ref, vecs_ref, dp, l):
    """Shared backward recompute: (y_raw list, dy list), quadrant order
    (te,fe), (te,fo), (to,fe), (to,fo).

    dy is the gradient at the BN output: the pool grad routed to the
    window's FIRST maximum (XLA select_and_scatter tie-breaking; window
    row-major order (t0,f0),(t0,f1),(t1,f0),(t1,f1) matches this quadrant
    order) masked by the ReLU derivative.
    """
    bias = vecs_ref[_BIAS : _BIAS + 1, :]
    a = vecs_ref[_A : _A + 1, :]
    b2 = vecs_ref[_B2 : _B2 + 1, :]
    yraws = []
    for x_ref in (xe_ref, xo_ref):
        y2 = _dot(x_ref[:], m_ref[:])
        yraws += [q + bias for q in _halves(y2, l)]
    bns = [y * a + b2 for y in yraws]
    outs = [jnp.maximum(b, 0.0) for b in bns]
    mx = jnp.maximum(jnp.maximum(outs[0], outs[1]), jnp.maximum(outs[2], outs[3]))
    taken = jnp.zeros_like(mx, dtype=jnp.bool_)
    dys = []
    for o, bn in zip(outs, bns):
        w = jnp.logical_and(o == mx, jnp.logical_not(taken))
        taken = jnp.logical_or(taken, w)
        dys.append(dp * w.astype(jnp.float32) * (bn > 0.0).astype(jnp.float32))
    return yraws, dys


def _bwd1_kernel(xe_ref, xo_ref, m_ref, vecs_ref, dp_ref, out_ref, *, l):
    """Reduction pass: per-column sums of dy and dy*y_raw.

    out rows: 0/1 = sum(dy) / sum(dy*y_raw) over even-f columns, 2/3 = odd.
    Zero-padded rows carry dp == 0, so no row mask is needed here.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dp = dp_ref[:].astype(jnp.float32)
    yraws, dys = _recompute_dy(xe_ref, xo_ref, m_ref, vecs_ref, dp, l)
    for y, dy, row0 in zip(yraws, dys, (0, 2, 0, 2)):
        out_ref[row0 : row0 + 1, :] += jnp.sum(dy, axis=0, keepdims=True)
        out_ref[row0 + 1 : row0 + 2, :] += jnp.sum(dy * y, axis=0, keepdims=True)


def _bwd2_kernel(xe_ref, xo_ref, m_ref, vecs_ref, dp_ref, dm_ref, db_ref, *, n_valid, rt, l):
    """Weight pass: d_conv = k1*dy + k2*y_raw + k3 contracted into the banded
    weight gradient (dm accumulates in VMEM across the whole grid) and the
    bias-gradient columns. k3 is a constant, so padded rows are masked.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dm_ref[:] = jnp.zeros_like(dm_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    k1 = vecs_ref[_K1 : _K1 + 1, :]
    k2 = vecs_ref[_K2 : _K2 + 1, :]
    k3 = vecs_ref[_K3 : _K3 + 1, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0) + i * rt
    msk = (rows < n_valid).astype(jnp.float32)
    dp = dp_ref[:].astype(jnp.float32)
    yraws, dys = _recompute_dy(xe_ref, xo_ref, m_ref, vecs_ref, dp, l)
    dconvs = [(k1 * dy + k2 * y + k3) * msk for y, dy in zip(yraws, dys)]
    # quadrant order (te,fe), (te,fo), (to,fe), (to,fo): the t-even stream
    # feeds columns [fe || fo] = dconvs[0:2], the t-odd stream dconvs[2:4];
    # accumulate into dm's column halves directly (no [rt, 2L] concat copy)
    xe32, xo32 = xe_ref[:].astype(jnp.float32), xo_ref[:].astype(jnp.float32)
    dm_ref[:, :l] += _dot_t(xe32, dconvs[0]) + _dot_t(xo32, dconvs[2])
    dm_ref[:, l:] += _dot_t(xe32, dconvs[1]) + _dot_t(xo32, dconvs[3])
    db_ref[0:1, :] += jnp.sum(dconvs[0] + dconvs[1] + dconvs[2] + dconvs[3], axis=0, keepdims=True)


def _grid_call(kernel, xe, xo, m, vecs, extra_in, out_shapes, out_tiled, rt, interpret):
    """Shared pallas_call plumbing: row streams tiled by the grid, everything
    else whole-block; accumulator outputs map every grid step to block 0."""
    n_rows, kf = xe.shape
    grid = (n_rows // rt,)
    row_spec = pl.BlockSpec((rt, kf), lambda i: (i, 0), memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec, row_spec, whole(m.shape), whole(vecs.shape)]
    args = [xe, xo, m, vecs]
    for arr in extra_in:
        in_specs.append(pl.BlockSpec((rt, arr.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(arr)
    out_specs = []
    for shape, tiled in zip(out_shapes, out_tiled):
        if tiled:
            out_specs.append(
                pl.BlockSpec((rt, shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
        else:
            out_specs.append(whole(shape[:2]))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(s[:2], s[2]) for s in out_shapes],
        interpret=interpret,
    )(*args)


def _col_to_channel(cols_e: jax.Array, cols_o: jax.Array, c: int) -> jax.Array:
    """[L] per-column (f-even) + [L] (f-odd) -> [C] per-channel sums."""
    return cols_e.reshape(-1, c).sum(0) + cols_o.reshape(-1, c).sum(0)


def _tile_cols(vec_c: jax.Array, f_half: int) -> jax.Array:
    """[C] per-channel -> [L] per-column (column index = p*C + c)."""
    return jnp.tile(vec_c, (f_half,))


def _vecs(bias, gamma, beta, mean, var, s1, s2, f_half):
    istd = jax.lax.rsqrt(var + BN_EPS)
    a = gamma * istd
    rows = [
        bias,
        a,
        beta - mean * a,
        istd * gamma,
        -(istd**2) * s2,
        -istd * s1 + istd**2 * s2 * mean,
    ]
    v = jnp.stack([_tile_cols(r.astype(jnp.float32), f_half) for r in rows])
    return jnp.concatenate([v, jnp.zeros((2, v.shape[1]), jnp.float32)])  # [8, L]


def block1_batch_stats(
    xe: jax.Array,
    xo: jax.Array,
    n_valid: int,
    kernel: jax.Array,
    bias: jax.Array,
    f: int,
    axis_name: str | None = None,
    rt: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batch mean / (biased) variance of conv(x)+bias per channel — exactly
    what flax BatchNorm computes over (B, T, F), with cross-device pmean of
    the mean and mean-of-squares when ``axis_name`` is set (SyncBN).

    Takes the shared ``block1_streams`` output. Gradient-free by
    construction (the stats' loss paths are carried by fused_block1's
    custom vjp) — also keeps JVP tracing out of the pallas custom calls.

    Pure XLA, no kernel: per-column sums collapse to tiny quadratic forms —
    sum(y) = (1ᵀX) m and sum(y²) = Σ_rows m ⊙ ((XᵀX) m) with XᵀX only
    [3F, 3F], so the conv output is never materialized and the only big
    reads are the streams themselves. Zero-padded rows contribute zero to
    both Gram terms, so no masking is needed."""
    return _batch_stats(xe, xo, n_valid, kernel, bias, f, axis_name, rt, interpret)


@partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6, 7, 8))
def _batch_stats(xe, xo, n_valid, kernel, bias, f, axis_name, rt, interpret):
    del rt, interpret
    c = kernel.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    m = banded_matrix(kernel, f, jnp.float32)
    # Gram matrix + column sums over BOTH streams (bf16 single-pass dots,
    # same precision class as the apply kernel's conv)
    gram = _dot_t(xe, xe) + _dot_t(xo, xo)  # [3F, 3F] f32
    ones = jnp.ones((1, xe.shape[0]), xe.dtype)
    colsum = (_dot(ones, xe) + _dot(ones, xo)).astype(jnp.float32)  # [1, 3F]
    s_q = jnp.matmul(colsum, m, precision=hi)[0]  # [2L]: sum of conv per column
    gm = jnp.matmul(gram, m, precision=hi)
    ssq_q = jnp.sum(m * gm, axis=0)  # [2L]: sum of conv² per column
    n2 = 2 * n_valid  # values per column (both t-parity streams)
    bias_cols = jnp.concatenate([_tile_cols(bias, f // 2)] * 2).astype(jnp.float32)
    s_raw = s_q + n2 * bias_cols
    ssq_raw = ssq_q + 2.0 * bias_cols * s_q + n2 * bias_cols**2
    l = m.shape[1] // 2
    n = n2 * f  # per-channel count: rows x F frequency bins
    mean = _col_to_channel(s_raw[:l], s_raw[l:], c) / n
    msq = _col_to_channel(ssq_raw[:l], ssq_raw[l:], c) / n
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        msq = jax.lax.pmean(msq, axis_name)
    return mean, msq - mean**2


def _batch_stats_fwd(xe, xo, n_valid, kernel, bias, f, axis_name, rt, interpret):
    out = _batch_stats(xe, xo, n_valid, kernel, bias, f, axis_name, rt, interpret)
    return out, (xe, xo, kernel, bias)


def _batch_stats_bwd(n_valid, f, axis_name, rt, interpret, res, g):
    return jax.tree.map(jnp.zeros_like, res)


_batch_stats.defvjp(_batch_stats_fwd, _batch_stats_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 9, 10, 11, 12, 13))
def fused_block1(
    xe: jax.Array,
    xo: jax.Array,
    n_valid: int,
    kernel: jax.Array,
    bias: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    f: int,
    batch_stats_grad: bool,
    axis_name: str | None,
    rt: int,
    interpret: bool = False,
) -> jax.Array:
    """(xe, xo) = block1_streams(x) -> pooled rows [n_valid, (F/2)*C] in
    stream dtype; reshape to [B, T//2, F//2, C] at the caller.

    ``batch_stats_grad=True`` means mean/var were computed from this batch
    (the custom backward carries those loss paths analytically — no
    stop_gradient needed thanks to _batch_stats's zero vjp). With
    ``axis_name`` the backward psums the batch-stat terms, matching
    autodiff of SyncBN."""
    return _apply(xe, xo, kernel, bias, gamma, beta, mean, var, f, rt, interpret)[:n_valid]


def _apply(xe, xo, kernel, bias, gamma, beta, mean, var, f, rt, interpret):
    c = kernel.shape[-1]
    m = banded_matrix(kernel, f, xe.dtype)
    zc = jnp.zeros((c,), jnp.float32)
    vecs = _vecs(bias, gamma, beta, mean, var, zc, zc, f // 2)
    l = m.shape[1] // 2
    (pooled,) = _grid_call(
        partial(_apply_kernel, l=l),
        xe, xo, m, vecs, (),
        [(xe.shape[0], l, xe.dtype)], [True], rt, interpret,
    )
    return pooled


def _fwd(xe, xo, n_valid, kernel, bias, gamma, beta, mean, var, f, batch_stats_grad, axis_name, rt, interpret):
    out = _apply(xe, xo, kernel, bias, gamma, beta, mean, var, f, rt, interpret)[:n_valid]
    return out, (xe, xo, kernel, bias, gamma, beta, mean, var)


BWD_RT = 128  # smaller row tile: the backward holds 4 f32 quadrants + dm in VMEM


def _repad(a: jax.Array, n_valid: int, rt: int) -> jax.Array:
    want = _round_up(n_valid, rt)
    if a.shape[0] == want:
        return a
    if a.shape[0] > want:
        return a[:want]
    return jnp.pad(a, ((0, want - a.shape[0]), (0, 0)))


def _bwd(n_valid, f, batch_stats_grad, axis_name, rt, interpret, res, g):
    xe, xo, kernel, bias, gamma, beta, mean, var = res
    c = kernel.shape[-1]
    in_shapes = (xe, xo)  # cotangent shapes must match the fwd-rt padding
    rt = min(rt, BWD_RT)
    xe, xo = _repad(xe, n_valid, rt), _repad(xo, n_valid, rt)
    m = banded_matrix(kernel, f, xe.dtype)
    l = m.shape[1] // 2
    dp = g.reshape(n_valid, l)
    pad = xe.shape[0] - n_valid
    if pad:
        dp = jnp.pad(dp, ((0, pad), (0, 0)))
    zc = jnp.zeros((c,), jnp.float32)
    vecs = _vecs(bias, gamma, beta, mean, var, zc, zc, f // 2)

    (sums,) = _grid_call(
        partial(_bwd1_kernel, l=l),
        xe, xo, m, vecs, (dp,),
        [(8, l, jnp.float32)], [False], rt, interpret,
    )
    istd = jax.lax.rsqrt(var + BN_EPS)
    sdy = _col_to_channel(sums[0], sums[2], c)  # sum(dy) per channel (local)
    sdyy = _col_to_channel(sums[1], sums[3], c)  # sum(dy * y_raw)
    dbeta = sdy
    dgamma = (sdyy - mean * sdy) * istd  # sum(dy * xhat)
    if batch_stats_grad:
        s_dxhat = gamma * sdy
        s_dxhat_xhat = gamma * dgamma
        n_g = 2 * n_valid * f
        if axis_name is not None:
            s_dxhat = jax.lax.psum(s_dxhat, axis_name)
            s_dxhat_xhat = jax.lax.psum(s_dxhat_xhat, axis_name)
            n_g = n_g * jax.lax.psum(1, axis_name)
        s1 = s_dxhat / n_g
        s2 = s_dxhat_xhat / n_g
    else:
        s1 = s2 = zc
    vecs2 = _vecs(bias, gamma, beta, mean, var, s1, s2, f // 2)

    dm, dbc = _grid_call(
        partial(_bwd2_kernel, n_valid=n_valid, rt=rt, l=l),
        xe, xo, m, vecs2, (dp,),
        [(3 * f, 2 * l, jnp.float32), (8, l, jnp.float32)],
        [False, False], rt, interpret,
    )
    dbias = dbc[0].reshape(-1, c).sum(0)
    # interleave the f-parity weight-grad halves back to [3F, F, C], then
    # transpose the banded_matrix eye-einsum to recover the conv kernel grad
    dm3 = jnp.stack(
        [dm[:, :l].reshape(3 * f, f // 2, c), dm[:, l:].reshape(3 * f, f // 2, c)], axis=2
    ).reshape(3 * f, f, c)
    eye = np.stack([np.eye(f, k=1 - di, dtype=np.float32) for di in range(3)])
    dker = jnp.einsum("dio,jioc->djc", jnp.asarray(eye), dm3.reshape(3, f, f, c))
    # [freq, time, C] -> nn.Conv time-major kernel layout [time, freq, 1, C]
    dker = jnp.transpose(dker, (1, 0, 2))[:, :, None, :].astype(kernel.dtype)
    return (
        jnp.zeros_like(in_shapes[0]),  # input grads not computed (see module docstring)
        jnp.zeros_like(in_shapes[1]),
        dker,
        dbias.astype(bias.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        jnp.zeros_like(mean),
        jnp.zeros_like(var),
    )


fused_block1.defvjp(_fwd, _bwd)
