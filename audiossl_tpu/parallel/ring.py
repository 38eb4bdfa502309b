"""Ring attention + a blockwise AST over the time-sharded spectrogram.

Pairs with frontend/sp.py (SURVEY.md §5 long-context extension point): for
minutes-long audio whose spectrogram pipeline exceeds one chip's HBM, the
time axis stays sharded end-to-end — sp_log_mel_local produces each shard's
spectrogram block, these layers patchify and attend over it without ever
gathering the full sequence. Full (non-approximate) attention is recovered
by streaming softmax over the ring: each shard's K/V blocks visit every
shard via `ppermute` while running max/sum corrections keep the result
exactly softmax(QK^T)V (the FlashAttention/RingAttention recurrence), so
an n-shard forward equals the single-device forward to fp tolerance.

House style matches parallel/tp.py: pure functions over explicit parameter
pytrees, shard_map-native (no flax module state inside the mapped region).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis: str) -> jax.Array:
    """Exact full attention over a sequence sharded along ``axis``.

    q, k, v: [B, H, T_local, Dh] per shard -> [B, H, T_local, Dh].
    W ring steps; K/V rotate one hop per step; online-softmax accumulation.
    """
    w = jax.lax.axis_size(axis)
    scale = q.shape[-1] ** -0.5
    perm = [(j, (j + 1) % w) for j in range(w)]

    def body(_, carry):
        acc, m, l, kc, vc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kc) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum("bhqk,bhkd->bhqd", p, vc)
        return acc, m_new, l, jax.lax.ppermute(kc, axis, perm), jax.lax.ppermute(vc, axis, perm)

    acc = jnp.zeros_like(q)
    m = jnp.full(q.shape[:-1] + (1,), -jnp.inf, q.dtype)
    l = jnp.zeros_like(m)
    acc, m, l, _, _ = jax.lax.fori_loop(0, w, body, (acc, m, l, k, v))
    return acc / l


@dataclasses.dataclass(frozen=True)
class LongASTConfig:
    n_mels: int = 64
    time_patch: int = 4  # frames per token (non-overlapping: shard-local)
    embed_dim: int = 192
    depth: int = 4
    num_heads: int = 3
    mlp_ratio: float = 4.0
    tokens_global: int = 64  # total tokens across all shards (pos table size)
    num_classes: int = 0  # 0 = return pooled embedding


def init_long_ast_params(key: jax.Array, cfg: LongASTConfig) -> dict:
    d, h = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    keys = jax.random.split(key, 3 + 4 * cfg.depth)
    trunc = jax.nn.initializers.truncated_normal(0.02)
    params = {
        "patch": {
            "kernel": trunc(keys[0], (cfg.n_mels * cfg.time_patch, d), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "pos": trunc(keys[1], (1, cfg.tokens_global, d), jnp.float32),
        "blocks": [],
    }
    for i in range(cfg.depth):
        k0, k1, k2, k3 = keys[3 + 4 * i : 7 + 4 * i]
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": {"kernel": trunc(k0, (d, 3 * d), jnp.float32), "bias": jnp.zeros((3 * d,))},
            "proj": {"kernel": trunc(k1, (d, d), jnp.float32), "bias": jnp.zeros((d,))},
            "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "fc1": {"kernel": trunc(k2, (d, h), jnp.float32), "bias": jnp.zeros((h,))},
            "fc2": {"kernel": trunc(k3, (h, d), jnp.float32), "bias": jnp.zeros((d,))},
        })
    params["norm"] = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    if cfg.num_classes:
        params["head"] = {
            "kernel": trunc(keys[2], (d, cfg.num_classes), jnp.float32),
            "bias": jnp.zeros((cfg.num_classes,)),
        }
    return params


def _ln(x, p, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def long_ast_forward(
    params: dict, x_local: jax.Array, cfg: LongASTConfig, axis: str = "data"
) -> jax.Array:
    """Inside shard_map: [B, n_mels, T_local] spectrogram block -> logits or
    pooled embedding [B, ...] (replicated — the token mean is psum'd)."""
    b, f, t_loc = x_local.shape
    if t_loc % cfg.time_patch:
        raise ValueError(f"local frame count {t_loc} not divisible by time_patch {cfg.time_patch}")
    n_loc = t_loc // cfg.time_patch
    w = jax.lax.axis_size(axis)
    if w * n_loc != cfg.tokens_global:
        # dynamic_slice clamps out-of-range starts, which would silently hand
        # later shards duplicated tail positions — fail loudly instead
        raise ValueError(
            f"{w} shards x {n_loc} tokens/shard != tokens_global={cfg.tokens_global}"
        )
    # [B, T, F] -> [B, n_loc, F * P] (frame-major inside the patch)
    x = jnp.swapaxes(x_local, 1, 2).reshape(b, n_loc, cfg.time_patch * f)
    x = x @ params["patch"]["kernel"] + params["patch"]["bias"]

    # global positions: this shard owns tokens [idx * n_loc, (idx+1) * n_loc)
    start = jax.lax.axis_index(axis) * n_loc
    pos = jax.lax.dynamic_slice_in_dim(params["pos"], start, n_loc, axis=1)
    x = x + pos[0]

    nh = cfg.num_heads
    dh = cfg.embed_dim // nh
    for blk in params["blocks"]:
        hq = _ln(x, blk["ln1"])
        qkv = hq @ blk["qkv"]["kernel"] + blk["qkv"]["bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda a: jnp.transpose(a.reshape(b, n_loc, nh, dh), (0, 2, 1, 3))
        att = ring_attention(to_heads(q), to_heads(k), to_heads(v), axis)
        att = jnp.transpose(att, (0, 2, 1, 3)).reshape(b, n_loc, cfg.embed_dim)
        x = x + (att @ blk["proj"]["kernel"] + blk["proj"]["bias"])
        hm = _ln(x, blk["ln2"])
        hm = jax.nn.gelu(hm @ blk["fc1"]["kernel"] + blk["fc1"]["bias"], approximate=False)
        x = x + (hm @ blk["fc2"]["kernel"] + blk["fc2"]["bias"])

    x = _ln(x, params["norm"])
    # global token mean: replicated output without gathering the sequence
    n_global = jax.lax.psum(jnp.asarray(n_loc, x.dtype), axis)
    pooled = jax.lax.psum(jnp.sum(x, axis=1), axis) / n_global
    if "head" in params:
        return pooled @ params["head"]["kernel"] + params["head"]["bias"]
    return pooled


def long_audio_forward(
    params: dict, wave_local: jax.Array, mel_cfg, cfg: LongASTConfig, axis: str = "data"
) -> jax.Array:
    """End-to-end long-audio path inside shard_map: time-sharded waveform
    slice [B, L/W] -> sp log-mel block -> blockwise AST -> logits/embedding.
    The full sequence never materializes on one device."""
    from audiossl_tpu.frontend.sp import sp_log_mel_local

    lms = sp_log_mel_local(wave_local, mel_cfg, axis)  # [B, n_mels, T/W]
    return long_ast_forward(params, lms, cfg, axis)
