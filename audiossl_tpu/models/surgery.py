"""Checkpoint surgery for transformer encoders: positional-embedding grid
resize, relative-position table resize, and patch-projection channel folding.

Rebuilds the reference's pretrained-weight transplant
(src/encoder/mast.py:100-173): DeiT/AudioSet checkpoints are adapted to a new
(f_dim, t_dim) patch grid by center-cutting the positional embedding when the
target axis is smaller and bilinearly interpolating when it is larger, with
RGB patch-projection kernels summed down to 1 input channel. The same surgery
transfers our own MAST/AST checkpoints across (input_fdim, input_tdim), and
the rel_pos_h / rel_pos_w variant covers the MViT trunk (whose tables are
length 2*max(q,k)-1 per stage and scale with the input grid).

All resizing uses half-pixel sampling (jax.image.resize 'bilinear'/'linear'),
matching torch F.interpolate(align_corners=False), the reference default.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def token_grid(input_hw: tuple[int, int], patch: int = 16, strides: tuple[int, int] = (10, 10)) -> tuple[int, int]:
    """Patch-grid (h, w) of a VALID (patch x patch) conv over ``input_hw``
    (mast.py get_shape:175-181, computed analytically instead of by tracing)."""
    return (
        (input_hw[0] - patch) // strides[0] + 1,
        (input_hw[1] - patch) // strides[1] + 1,
    )


def _cut_or_resize_axis(grid: jax.Array, new: int, axis: int) -> jax.Array:
    """Center-cut if shrinking, bilinear-interpolate if growing — one axis of
    ``grid [1, D, H, W]`` (mast.py:112-119: t-axis then f-axis, each
    independently cut *or* interpolated)."""
    old = grid.shape[axis]
    if new <= old:
        start = old // 2 - new // 2
        return jax.lax.slice_in_dim(grid, start, start + new, axis=axis)
    shape = list(grid.shape)
    shape[axis] = new
    return jax.image.resize(grid, tuple(shape), method="bilinear")


def resize_grid_pos_embed(
    pos: jax.Array,
    src_grid: tuple[int, int],
    dst_grid: tuple[int, int],
    prefix_tokens: int = 0,
) -> jax.Array:
    """[1, prefix + h0*w0, D] -> [1, prefix + h1*w1, D].

    Reference semantics (mast.py:108-125): strip the prefix (cls/dist) tokens,
    reshape to the 2D grid, adapt the *second* grid axis first then the first
    (the reference handles t_dim before f_dim), re-flatten, re-attach prefix.
    """
    h0, w0 = src_grid
    h1, w1 = dst_grid
    d = pos.shape[-1]
    if pos.shape[1] != prefix_tokens + h0 * w0:
        raise ValueError(
            f"pos_embed has {pos.shape[1]} tokens, expected {prefix_tokens} + {h0}*{w0}"
        )
    prefix, grid = pos[:, :prefix_tokens], pos[:, prefix_tokens:]
    grid = jnp.transpose(grid.reshape(1, h0, w0, d), (0, 3, 1, 2))  # [1, D, h, w]
    grid = _cut_or_resize_axis(grid, w1, axis=3)
    grid = _cut_or_resize_axis(grid, h1, axis=2)
    grid = jnp.transpose(grid, (0, 2, 3, 1)).reshape(1, h1 * w1, d)
    return jnp.concatenate([prefix, grid], axis=1) if prefix_tokens else grid


def resize_rel_pos(table: jax.Array, new_len: int) -> jax.Array:
    """[L0, D] -> [L1, D] by linear interpolation over the distance axis (the
    MViT checkpoint-loading convention for rel_pos_{h,w} when grid sizes
    change; identity when lengths already match)."""
    old = table.shape[0]
    if old == new_len:
        return table
    # explicit half-pixel sampling: jax.image.resize anti-aliases on
    # downsample, torch F.interpolate(mode='linear') does not
    pos = jnp.clip((jnp.arange(new_len) + 0.5) * (old / new_len) - 0.5, 0.0, old - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, old - 1)
    w = (pos - lo)[:, None].astype(table.dtype)
    return table[lo] * (1.0 - w) + table[hi] * w


def fold_patch_proj_channels(kernel: jax.Array) -> jax.Array:
    """Sum a flax HWIO conv kernel's input channels down to 1 — the RGB->mono
    DeiT transplant (mast.py:103-105, torch sums dim=1 of [O, I, kh, kw])."""
    return jnp.sum(kernel, axis=2, keepdims=True)


def _is_rel_pos(name: str) -> bool:
    return name.startswith("rel_pos")


def transplant_variables(
    target: Any,
    source: Any,
    src_grid: tuple[int, int] | None = None,
    dst_grid: tuple[int, int] | None = None,
    prefix_tokens: int = 0,
    stats: dict | None = None,
) -> Any:
    """Adapt ``source`` variables onto ``target``'s structure:

    * matching-shape leaves copy over (merge_variables semantics);
    * ``pos_embed`` leaves get the grid cut/interpolate surgery (needs
      ``src_grid``/``dst_grid``);
    * ``rel_pos_h``/``rel_pos_w`` tables linear-resize to the target length;
    * patch-projection kernels whose only mismatch is the input-channel dim
      fold channels by summation (DeiT RGB -> 1-channel fbank).

    Leaves missing from ``source`` keep their ``target`` (fresh) values, like
    load_state_dict(strict=False) in the reference. If ``stats`` is given it
    is filled with {"copied", "adapted", "kept_fresh"} leaf counts so callers
    can detect a transplant that matched nothing (i.e. a random encoder).
    """
    counts = {"copied": 0, "adapted": 0, "kept_fresh": 0}

    def walk(tgt, src, name: str):
        if isinstance(tgt, dict) and isinstance(src, dict):
            out = dict(tgt)
            for k, v in src.items():
                if k in out:
                    out[k] = walk(out[k], v, k)
            return out
        if not (hasattr(tgt, "shape") and hasattr(src, "shape")):
            return tgt
        if tgt.shape == src.shape:
            counts["copied"] += 1
            return src
        if name == "pos_embed" and src_grid and dst_grid:
            counts["adapted"] += 1
            return resize_grid_pos_embed(
                jnp.asarray(src), src_grid, dst_grid, prefix_tokens
            ).astype(tgt.dtype)
        if _is_rel_pos(name) and src.ndim == 2 and tgt.ndim == 2 and src.shape[1] == tgt.shape[1]:
            counts["adapted"] += 1
            return resize_rel_pos(jnp.asarray(src), tgt.shape[0]).astype(tgt.dtype)
        if (
            src.ndim == 4
            and tgt.ndim == 4
            and tgt.shape[2] == 1
            and src.shape[2] > 1
            and src.shape[:2] + src.shape[3:] == tgt.shape[:2] + tgt.shape[3:]
        ):
            counts["adapted"] += 1
            return fold_patch_proj_channels(jnp.asarray(src)).astype(tgt.dtype)
        counts["kept_fresh"] += 1
        return tgt  # irreconcilable mismatch: keep fresh init

    out = walk(target, source, "")
    if stats is not None:
        stats.update(counts)
    return out


def load_pretrained_encoder(
    ckpt_dir: str,
    target_vars: Any,
    src_input_hw: tuple[int, int] | None = None,
    dst_input_hw: tuple[int, int] | None = None,
    patch: int = 16,
    strides: tuple[int, int] = (10, 10),
    prefix_tokens: int = 0,
    step: int | None = None,
) -> Any:
    """Import an exported encoder checkpoint onto a model built for a
    different (input_tdim, input_fdim), resizing pos/rel-pos tables en route.

    ``src_input_hw``/``dst_input_hw`` are the (H, W) the patchify conv sees —
    for MAST/AST that is (input_tdim, input_fdim) (time is the H axis).
    """
    from audiossl_tpu.train.checkpoint import latest_step, load_raw, wait_until_finished

    wait_until_finished()  # an async save may still be committing its step dir
    if step is None:
        step = latest_step(ckpt_dir, "encoder")
        if step is None:
            raise FileNotFoundError(f"no encoder checkpoints under {ckpt_dir}")
    source = load_raw(ckpt_dir, step, kind="encoder")
    src_grid = token_grid(src_input_hw, patch, strides) if src_input_hw else None
    dst_grid = token_grid(dst_input_hw, patch, strides) if dst_input_hw else None
    stats: dict = {}
    out = transplant_variables(
        target_vars, source, src_grid=src_grid, dst_grid=dst_grid,
        prefix_tokens=prefix_tokens, stats=stats,
    )
    if stats["copied"] + stats["adapted"] == 0:
        raise ValueError(
            f"encoder transplant from {ckpt_dir} transferred nothing "
            f"(0 matching leaves, {stats['kept_fresh']} mismatches) — the "
            "checkpoint does not correspond to this encoder architecture"
        )
    return out
