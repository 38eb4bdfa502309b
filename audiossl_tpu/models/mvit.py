"""MViTv2 (Improved Multiscale Vision Transformer), Flax — the MAST backbone.

Built from the vendored reference spec (authoritative per SURVEY.md §2.2):
extras/mast_new/mast/mvit/models/mvit_model.py:101-277 (model/stage wiring,
_prepare_mvit_configs:280-317), attention.py (MultiScaleAttention with
conv-pooled q/kv, decomposed relative position cal_rel_pos_spatial:45-90,
residual pooling), common.py (Mlp, DropPath, round_width), and the variant
YAMLs configs/MVITv2_{T,S,B}.yaml.

TPU-first choices: all shapes static per block (pool strides are config
constants, so each stage's [H, W] is known at trace time); the rel-pos
distance index matrices are precomputed NumPy constants; pooling convs are
depthwise (feature_group_count) NHWC convs; attention is one batched matmul
chain XLA maps onto the MXU. Rectangular token grids are supported (audio:
time x freq), with separate rel_pos_h / rel_pos_w tables sized per axis —
the vendored code asserts square inputs; timm's MViTv2 (which the reference
MAST actually instantiates, src/encoder/mast.py:65-81) supports rectangles,
and we follow that.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audiossl_tpu.ops.attention import fused_rel_attention, rel_expand_matrix


def round_width(width, multiplier, min_width: int = 1, divisor: int = 1) -> int:
    if not multiplier:
        return int(width)
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


@dataclasses.dataclass(frozen=True)
class MViTConfig:
    embed_dim: int = 96
    depth: int = 16
    num_heads: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    droppath_rate: float = 0.1
    patch_kernel: tuple[int, int] = (7, 7)
    patch_stride: tuple[int, int] = (4, 4)
    patch_padding: tuple[int, int] = (3, 3)
    dim_mul: tuple[tuple[int, float], ...] = ()
    head_mul: tuple[tuple[int, float], ...] = ()
    pool_q_stride: tuple[tuple[int, int, int], ...] = ()
    pool_kvq_kernel: tuple[int, int] = (3, 3)
    pool_kv_stride_adaptive: tuple[int, int] | None = (4, 4)
    cls_embed_on: bool = False
    use_abs_pos: bool = False
    rel_pos_spatial: bool = True
    residual_pooling: bool = True
    dim_mul_in_att: bool = True
    dropout_rate: float = 0.0
    # bf16 doubles MXU throughput; LayerNorm stats and attention softmax
    # stay f32. None keeps the exact-f32 parity path (tests/oracles).
    compute_dtype: Any = None
    # fused rel-pos attention kernel (ops/attention.py): "auto" uses it on
    # TPU and the XLA einsum path elsewhere; "on" forces it (interpret mode
    # off-TPU — slow, for tests); "off" keeps the XLA path everywhere.
    fused_attention: str = "auto"
    # AttentionPool implementation: "conv" (XLA grouped conv — fastest
    # measured on v5e) | "unrolled" (shift-multiply-add, REQUIRED under
    # GSPMD tensor parallelism: the SPMD partitioner mis-scales grouped-conv
    # filter gradients by the model-axis size when the conv input descends
    # from a model-sharded matmul; see parallel/tp_mvit.py). Both read the
    # same pool_*/Conv_0/kernel parameter — checkpoints interchange.
    pool_impl: str = "conv"

    @staticmethod
    def _variant(depth: int, droppath: float, stage_blocks: tuple[int, ...], kw) -> "MViTConfig":
        base = dict(
            depth=depth,
            droppath_rate=droppath,
            dim_mul=tuple((i, 2.0) for i in stage_blocks),
            head_mul=tuple((i, 2.0) for i in stage_blocks),
            pool_q_stride=tuple(
                (i, 2, 2) if i in stage_blocks else (i, 1, 1) for i in range(depth)
            ),
        )
        base.update(kw)
        return MViTConfig(**base)

    @staticmethod
    def tiny(**kw) -> "MViTConfig":
        return MViTConfig._variant(10, 0.1, (1, 3, 8), kw)

    @staticmethod
    def small(**kw) -> "MViTConfig":
        return MViTConfig._variant(16, 0.2, (1, 3, 14), kw)

    @staticmethod
    def base(**kw) -> "MViTConfig":
        return MViTConfig._variant(24, 0.3, (2, 5, 21), kw)


def prepare_block_schedule(cfg: MViTConfig):
    """Per-block (kernel/stride q, kernel/stride kv) — _prepare_mvit_configs."""
    depth = cfg.depth
    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for i, m in cfg.dim_mul:
        dim_mul[i] = m
    for i, m in cfg.head_mul:
        head_mul[i] = m

    pool_q = [() for _ in range(depth)]
    stride_q = [() for _ in range(depth)]
    for entry in cfg.pool_q_stride:
        i = entry[0]
        stride_q[i] = tuple(entry[1:])
        pool_q[i] = tuple(cfg.pool_kvq_kernel)

    pool_kv = [() for _ in range(depth)]
    stride_kv = [() for _ in range(depth)]
    if cfg.pool_kv_stride_adaptive is not None:
        _s = list(cfg.pool_kv_stride_adaptive)
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _s = [max(_s[d] // stride_q[i][d], 1) for d in range(len(_s))]
            stride_kv[i] = tuple(_s)
            pool_kv[i] = tuple(cfg.pool_kvq_kernel)
    return dim_mul, head_mul, pool_q, pool_kv, stride_q, stride_kv


def _pool_out(size: int, kernel: int, stride: int, pad: int) -> int:
    return (size + 2 * pad - kernel) // stride + 1


def block_out_hw(
    hw: tuple[int, int], kernel_q: tuple[int, int], stride_q: tuple[int, int]
) -> tuple[int, int]:
    """Static token-grid size after a block's q pooling (same conv geometry
    as AttentionPool: padding = kernel // 2)."""
    # exactly the AttentionPool trigger condition in MultiScaleAttention
    if not (len(kernel_q) and int(np.prod(stride_q)) * int(np.prod(kernel_q)) > 1):
        return hw
    return (
        _pool_out(hw[0], kernel_q[0], stride_q[0], kernel_q[0] // 2),
        _pool_out(hw[1], kernel_q[1], stride_q[1], kernel_q[1] // 2),
    )


def _rel_dist_index(q_size: int, k_size: int) -> np.ndarray:
    """Static distance-index matrix into a rel-pos table (cal_rel_pos_spatial:61-76)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    dist = np.arange(q_size)[:, None] * q_ratio - np.arange(k_size)[None, :] * k_ratio
    dist += (k_size - 1) * k_ratio
    return dist.astype(np.int64)


class _UnrolledDepthwise(nn.Module):
    """Depthwise conv as an explicit shift-multiply-add over kernel taps.

    Same math and the SAME parameter (``kernel`` of shape [kh, kw, 1, C],
    matching nn.Conv's depthwise HWIO layout) as the grouped-conv path, so
    checkpoints interchange. Exists because the XLA SPMD partitioner
    mis-scales grouped-conv FILTER gradients by the model-axis size when
    the conv input descends from a model-sharded matmul (reproduced on
    jax 0.9 CPU; parallel/tp_mvit.py) — plain slices and multiplies have
    no such hazard. Measured slower than the native grouped-conv lowering
    on v5e (PERF.md), so it is opt-in via MViTConfig.pool_impl.
    """

    kernel_hw: tuple[int, int]
    stride: tuple[int, int]
    pad: tuple[int, int]

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        kh, kw = self.kernel_hw
        c = t.shape[-1]
        # param stays f32 (nn.Conv's param_dtype default); compute in t's dtype
        w = self.param("kernel", nn.initializers.lecun_normal(), (kh, kw, 1, c)).astype(t.dtype)
        s0, s1 = self.stride
        p0, p1 = self.pad
        tpad = jnp.pad(t, ((0, 0), (p0, p0), (p1, p1), (0, 0)))
        out_h = (t.shape[1] + 2 * p0 - kh) // s0 + 1
        out_w = (t.shape[2] + 2 * p1 - kw) // s1 + 1
        out = jnp.zeros((t.shape[0], out_h, out_w, c), t.dtype)
        for di in range(kh):
            for dj in range(kw):
                tap = tpad[:, di : di + s0 * out_h : s0, dj : dj + s1 * out_w : s1, :]
                out = out + tap * w[di, dj, 0]
        return out


class AttentionPool(nn.Module):
    """Depthwise conv pool over the token grid (attention_pool + conv mode).

    Default impl is XLA's grouped conv: an unrolled shift-multiply-add
    rewrite was measured *slower* on v5e (s0 block fwd 14.9 -> 19.0 ms) —
    the strided slices defeat the fusion that the native lowering gets.
    ``impl="unrolled"`` switches to it anyway (same param layout) where the
    grouped conv is unusable: under GSPMD tensor parallelism its filter
    gradient is mis-scaled by the SPMD partitioner (_UnrolledDepthwise).
    """

    dim_per_head: int
    kernel: tuple[int, int]
    stride: tuple[int, int]
    dtype: Any = None  # compute dtype; None = follow the input (f32 path)
    impl: str = "conv"  # "conv" | "unrolled" (MViTConfig.pool_impl)

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int]):
        # x: [B, heads, L, C]; pool each head's grid independently
        b, h, l, c = x.shape
        hh, ww = hw
        pad = tuple(k // 2 for k in self.kernel)
        t = x.reshape(b * h, hh, ww, c)
        if self.impl == "unrolled":
            t = _UnrolledDepthwise(
                kernel_hw=self.kernel, stride=self.stride, pad=pad, name="Conv_0"
            )(t.astype(self.dtype) if self.dtype else t)
        else:
            t = nn.Conv(
                c,
                self.kernel,
                strides=self.stride,
                padding=[(pad[0], pad[0]), (pad[1], pad[1])],
                feature_group_count=c,
                use_bias=False,
                dtype=self.dtype or t.dtype,
            )(t)
        new_hw = (t.shape[1], t.shape[2])
        t = t.reshape(b, h, new_hw[0] * new_hw[1], c)
        t = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(t)  # f32 stats
        return (t.astype(self.dtype) if self.dtype else t), new_hw


class MultiScaleAttention(nn.Module):
    dim_out: int
    num_heads: int
    input_hw: tuple[int, int]
    kernel_q: tuple[int, int]
    kernel_kv: tuple[int, int]
    stride_q: tuple[int, int]
    stride_kv: tuple[int, int]
    qkv_bias: bool
    rel_pos_spatial: bool
    residual_pooling: bool
    dtype: Any = None  # compute dtype (bf16 for the MXU); None = input dtype
    fused: str = "off"  # ops/attention.py kernel: "auto" | "on" | "off"
    pool_impl: str = "conv"  # MViTConfig.pool_impl

    @nn.compact
    def __call__(self, x: jax.Array):
        b, n, _ = x.shape
        dt = self.dtype or x.dtype
        # matmul precision: exact f32 on the f32 parity path, native MXU
        # bf16 passes when a compute dtype is set
        prec = None if self.dtype else jax.lax.Precision.HIGHEST
        head_dim = self.dim_out // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(self.dim_out * 3, use_bias=self.qkv_bias, name="qkv", dtype=dt)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        hw = self.input_hw
        q_hw, k_hw = hw, hw
        if len(self.kernel_q) and int(np.prod(self.stride_q)) * int(np.prod(self.kernel_q)) > 1:
            q, q_hw = AttentionPool(head_dim, self.kernel_q, self.stride_q, dtype=self.dtype, impl=self.pool_impl, name="pool_q")(q, hw)
        if len(self.kernel_kv) and int(np.prod(self.stride_kv)) * int(np.prod(self.kernel_kv)) > 1:
            k, k_hw = AttentionPool(head_dim, self.kernel_kv, self.stride_kv, dtype=self.dtype, impl=self.pool_impl, name="pool_k")(k, hw)
            v, _ = AttentionPool(head_dim, self.kernel_kv, self.stride_kv, dtype=self.dtype, impl=self.pool_impl, name="pool_v")(v, hw)

        rel = None
        if self.rel_pos_spatial:
            qh, qw = q_hw
            kh, kw = k_hw
            rel_dim_h = 2 * max(qh, kh) - 1
            rel_dim_w = 2 * max(qw, kw) - 1
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.truncated_normal(0.02), (rel_dim_h, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.truncated_normal(0.02), (rel_dim_w, head_dim)
            )
            rh = rel_pos_h[jnp.asarray(_rel_dist_index(qh, kh))].astype(dt)  # [qh, kh, C]
            rw = rel_pos_w[jnp.asarray(_rel_dist_index(qw, kw))].astype(dt)  # [qw, kw, C]
            r_q = q.reshape(b, self.num_heads, qh, qw, head_dim)
            rel = (
                jnp.einsum("byhwc,hkc->byhwk", r_q, rh, precision=prec),  # [B,H,qh,qw,kh]
                jnp.einsum("byhwc,wkc->byhwk", r_q, rw, precision=prec),  # [B,H,qh,qw,kw]
            )

        # The fused kernel wins when the [Lq, Lk] score matrix is large
        # (its 4+ XLA HBM passes dominate big-grid stages: 2.2x end-to-end
        # on a 32x256 token grid) and loses to XLA when it is small (MAST's
        # 101x12 grid pools keys to Lk=78, where kernel tile padding costs
        # more than the traffic saved) — so "auto" gates on score size.
        engage = self.fused == "on" or (
            self.fused == "auto"
            and jax.default_backend() == "tpu"
            and q.shape[2] * k.shape[2] >= 1 << 18
        )
        if engage and self.rel_pos_spatial:
            # one Pallas program computes scores + bias broadcast + softmax
            # + PV per q-tile with k/v VMEM-resident — the XLA path's [Lq,Lk]
            # score matrix is never materialized. Bias stays decomposed as
            # [Lq, kh+kw].
            lq, lk = q.shape[2], k.shape[2]
            bias = jnp.concatenate(
                [rel[0].reshape(b, self.num_heads, lq, kh), rel[1].reshape(b, self.num_heads, lq, kw)],
                axis=-1,
            )
            expand = jnp.asarray(rel_expand_matrix(kh, kw))
            out = fused_rel_attention(
                q.reshape(b * self.num_heads, lq, head_dim),
                k.reshape(b * self.num_heads, lk, head_dim),
                v.reshape(b * self.num_heads, lk, head_dim),
                bias.reshape(b * self.num_heads, lq, kh + kw),
                expand,
                scale,
                self.dtype is None,  # f32 parity path -> HIGHEST dots
                jax.default_backend() != "tpu",  # interpret off-TPU (tests)
            ).reshape(b, self.num_heads, lq, head_dim)
        else:
            attn = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k, precision=prec)
            attn = attn.astype(jnp.float32)  # logits + softmax stay f32
            if rel is not None:
                rel_h = rel[0].astype(jnp.float32)
                rel_w = rel[1].astype(jnp.float32)
                attn = attn.reshape(b, self.num_heads, qh, qw, kh, kw)
                attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
                attn = attn.reshape(b, self.num_heads, qh * qw, kh * kw)
            attn = jax.nn.softmax(attn, axis=-1).astype(dt)
            out = jnp.einsum("bhqk,bhkc->bhqc", attn, v, precision=prec)
        if self.residual_pooling:
            out = out + q
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.dim_out)
        out = nn.Dense(self.dim_out, name="proj", dtype=dt)(out)
        return out, q_hw


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype or x.dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype or x.dtype)(x)


def drop_path(x: jax.Array, rate: float, deterministic: bool, rng) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jnp.floor(keep + jax.random.uniform(rng, (x.shape[0],) + (1,) * (x.ndim - 1)))
    return x / keep * mask


class MultiScaleBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    input_hw: tuple[int, int]
    mlp_ratio: float
    qkv_bias: bool
    droppath: float
    kernel_q: tuple[int, int]
    kernel_kv: tuple[int, int]
    stride_q: tuple[int, int]
    stride_kv: tuple[int, int]
    rel_pos_spatial: bool
    residual_pooling: bool
    dim_mul_in_att: bool
    dtype: Any = None
    fused: str = "off"
    pool_impl: str = "conv"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        """-> x only. The output grid is a static function of input_hw and
        stride_q (see MViT.block_out_hw) — returning the tuple through an
        nn.remat wrapper would turn it into traced values and break the
        next block's static reshapes."""
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=jnp.float32)(x)
        if self.dtype:
            x_norm = x_norm.astype(self.dtype)  # f32 LN stats, bf16 compute
        x_block, _ = MultiScaleAttention(
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_hw=self.input_hw,
            kernel_q=self.kernel_q,
            kernel_kv=self.kernel_kv,
            stride_q=self.stride_q,
            stride_kv=self.stride_kv,
            qkv_bias=self.qkv_bias,
            rel_pos_spatial=self.rel_pos_spatial,
            residual_pooling=self.residual_pooling,
            dtype=self.dtype,
            fused=self.fused,
            pool_impl=self.pool_impl,
            name="attn",
        )(x_norm)

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, name="proj", dtype=self.dtype or x.dtype)(x_norm)
        # skip-path pooling (max pool, kernel = stride+1)
        if len(self.stride_q) and int(np.prod(self.stride_q)) > 1:
            ks = tuple(s + 1 if s > 1 else s for s in self.stride_q)
            pad = tuple(k // 2 for k in ks)
            b, n, c = x.shape
            h, w = self.input_hw
            t = x.reshape(b, h, w, c)
            t = nn.max_pool(
                t, ks, strides=self.stride_q, padding=[(pad[0], pad[0]), (pad[1], pad[1])]
            )
            x = t.reshape(b, -1, c)

        rng = self.make_rng("dropout") if train and self.droppath > 0 else None
        x = x + drop_path(x_block, self.droppath, not train, rng)
        x_norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=jnp.float32)(x)
        if self.dtype:
            x_norm2 = x_norm2.astype(self.dtype)
        x_mlp = Mlp(int(att_dim * self.mlp_ratio), self.dim_out, dtype=self.dtype, name="mlp")(x_norm2)
        if not self.dim_mul_in_att and self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, name="proj", dtype=self.dtype or x.dtype)(x_norm2)
        rng2 = self.make_rng("dropout") if train and self.droppath > 0 else None
        x = x + drop_path(x_mlp, self.droppath, not train, rng2)
        return x


class MViT(nn.Module):
    """Token trunk: [B, H, W, C_in] image/spectrogram -> [B, N_final, C_final].

    Callers pool (mean over tokens — src/encoder/mast.py:229) or classify.
    """

    cfg: MViTConfig
    input_hw: tuple[int, int]  # spatial size of the input (pre-patchify)
    in_chans: int = 1
    final_norm: bool = True  # MAST's reference forward skips it (mast.py:227)
    remat: bool = False  # activation checkpointing per block (≙ fairscale
    # checkpoint_wrapper, mvit_model.py:133-144): trade FLOPs for HBM

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cfg = self.cfg
        if cfg.cls_embed_on:
            # MAST disables the cls token (mast_config) and the pooled-
            # attention path here is grid-structured; fail loudly instead of
            # silently producing a cls-token-free model (VERDICT r1 Weak #7)
            raise NotImplementedError(
                "cls_embed_on=True is not supported: this MViT is token-grid "
                "only (the MAST family runs cls_embed_on=False; use models.ast "
                "for a cls-token transformer)"
            )
        pk, ps, pp = cfg.patch_kernel, cfg.patch_stride, cfg.patch_padding
        cdt = cfg.compute_dtype
        x = nn.Conv(
            cfg.embed_dim,
            pk,
            strides=ps,
            padding=[(pp[0], pp[0]), (pp[1], pp[1])],
            name="patch_embed",
            dtype=cdt or x.dtype,
        )(x)
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(x.shape[0], h * w, cfg.embed_dim)

        if cfg.use_abs_pos:
            pos = self.param(
                "pos_embed", nn.initializers.truncated_normal(0.02), (1, h * w, cfg.embed_dim)
            )
            x = (x + pos).astype(cdt) if cdt else x + pos
        if cfg.dropout_rate > 0.0:
            # post-pos-embed dropout (mvit_model.py:150-152 pos_drop)
            x = nn.Dropout(cfg.dropout_rate, deterministic=not train)(x)

        dim_mul, head_mul, pool_q, pool_kv, stride_q, stride_kv = prepare_block_schedule(cfg)
        dpr = np.linspace(0, cfg.droppath_rate, cfg.depth)
        if cfg.fused_attention not in ("auto", "on", "off"):
            raise ValueError(f"fused_attention must be auto|on|off, got {cfg.fused_attention!r}")

        embed_dim = cfg.embed_dim
        num_heads = cfg.num_heads
        hw = (h, w)
        for i in range(cfg.depth):
            num_heads = round_width(num_heads, head_mul[i])
            if cfg.dim_mul_in_att:
                dim_out = round_width(embed_dim, dim_mul[i], divisor=round_width(num_heads, head_mul[i]))
            else:
                dim_out = round_width(embed_dim, dim_mul[i + 1], divisor=round_width(num_heads, head_mul[i + 1]))
            block_cls = nn.remat(MultiScaleBlock, static_argnums=(2,)) if self.remat else MultiScaleBlock
            x = block_cls(
                dim=embed_dim,
                dim_out=dim_out,
                num_heads=num_heads,
                input_hw=hw,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                droppath=float(dpr[i]),
                kernel_q=pool_q[i],
                kernel_kv=pool_kv[i],
                stride_q=stride_q[i],
                stride_kv=stride_kv[i],
                rel_pos_spatial=cfg.rel_pos_spatial,
                residual_pooling=cfg.residual_pooling,
                dim_mul_in_att=cfg.dim_mul_in_att,
                dtype=cdt,
                fused=cfg.fused_attention,
                pool_impl=cfg.pool_impl,
                name=f"block{i}",
            )(x, train)
            hw = block_out_hw(hw, pool_q[i], stride_q[i])
            embed_dim = dim_out

        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=jnp.float32)(x)
        return x
