"""Bicubic crop-resize as two MXU matmuls.

The reference's RandomResizeCrop (src/augmentations/augmentations.py:14-61)
materializes a virtual canvas, slices a random crop, and calls
``F.interpolate(mode='bicubic', align_corners=True)``. Dynamic crop shapes
are hostile to XLA, so here the crop+resize composes into a single pair of
interpolation-weight matrices built from traced scalars — output shape stays
static, the dynamic geometry lives in the *values* of the weight matrices:

    out[F, T] = W_f(i, h) @ canvas[cH, cW] @ W_t(j, w)^T

W rows carry the 4-tap cubic convolution kernel (a = -0.75, matching
torch.nn.functional.interpolate) with border replication inside the crop
window, scattered to canvas columns via one-hot comparisons.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _cubic_kernel(t: jax.Array, a: float = -0.75) -> jax.Array:
    """Cubic convolution kernel (Keys), evaluated at |t|."""
    t = jnp.abs(t)
    near = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
    far = (((t - 5.0) * t + 8.0) * t - 4.0) * a
    return jnp.where(t <= 1.0, near, jnp.where(t < 2.0, far, 0.0))


def crop_resize_matrix(out_size: int, crop_start: jax.Array, crop_size: jax.Array, canvas_size: int) -> jax.Array:
    """[out_size, canvas_size] bicubic (align_corners=True) weight matrix.

    Interpolates the crop ``canvas[crop_start : crop_start + crop_size]`` up
    or down to ``out_size`` samples. ``crop_start``/``crop_size`` may be
    traced scalars (int32).
    """
    crop_size = jnp.asarray(crop_size, jnp.float32)
    u = jnp.arange(out_size, dtype=jnp.float32)
    scale = jnp.where(out_size > 1, (crop_size - 1.0) / max(out_size - 1, 1), 0.0)
    src = u * scale  # [out]
    f = jnp.floor(src)
    t = src - f
    # 4 taps at f-1 .. f+2, weights from the cubic kernel.
    offsets = jnp.arange(-1, 3, dtype=jnp.float32)  # [4]
    tap_pos = f[:, None] + offsets[None, :]  # [out, 4]
    w = _cubic_kernel(t[:, None] - offsets[None, :])  # [out, 4]
    # Border replication *within the crop*, then shift into canvas coords.
    tap_idx = jnp.clip(tap_pos, 0.0, crop_size - 1.0).astype(jnp.int32) + crop_start
    # Scatter taps onto canvas columns: [out, 4, canvas] one-hot reduce.
    cols = jnp.arange(canvas_size, dtype=jnp.int32)
    onehot = (tap_idx[:, :, None] == cols[None, None, :]).astype(jnp.float32)
    return jnp.einsum("ok,okc->oc", w, onehot, precision=jax.lax.Precision.HIGHEST)


def crop_resize_2d(
    canvas: jax.Array,
    box: tuple[jax.Array, jax.Array, jax.Array, jax.Array],
    out_hw: tuple[int, int],
) -> jax.Array:
    """Bicubic-resize crop ``(i, j, h, w)`` of ``canvas[..., cH, cW]`` to ``out_hw``."""
    i, j, h, w = box
    wf = crop_resize_matrix(out_hw[0], i, h, canvas.shape[-2])
    wt = crop_resize_matrix(out_hw[1], j, w, canvas.shape[-1])
    return jnp.einsum("fc,...cd,td->...ft", wf, canvas, wt, precision=jax.lax.Precision.HIGHEST)


def random_resize_crop(
    lms: jax.Array,
    key: jax.Array,
    virtual_crop_scale: tuple[float, float] = (1.0, 1.5),
    freq_scale: tuple[float, float] = (0.6, 1.5),
    time_scale: tuple[float, float] = (0.6, 1.5),
) -> jax.Array:
    """RandomResizeCrop for one spectrogram ``[C, F, T]`` (vmap for batches)."""
    ch, f_in, t_in = lms.shape
    canvas_h = int(f_in * virtual_crop_scale[0])
    canvas_w = int(t_in * virtual_crop_scale[1])
    y, x = (canvas_h - f_in) // 2, (canvas_w - t_in) // 2
    canvas = jnp.zeros((ch, canvas_h, canvas_w), lms.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, lms, (0, y, x))

    kh, kw, ki, kj = jax.random.split(key, 4)
    h = jnp.clip(
        jnp.floor(jax.random.uniform(kh, (), minval=freq_scale[0], maxval=freq_scale[1]) * f_in),
        1,
        canvas_h,
    ).astype(jnp.int32)
    w = jnp.clip(
        jnp.floor(jax.random.uniform(kw, (), minval=time_scale[0], maxval=time_scale[1]) * t_in),
        1,
        canvas_w,
    ).astype(jnp.int32)
    i = jax.random.randint(ki, (), 0, canvas_h - h + 1)
    j = jax.random.randint(kj, (), 0, canvas_w - w + 1)
    return crop_resize_2d(canvas, (i, j, h, w), (f_in, t_in))
