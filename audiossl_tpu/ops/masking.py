"""SpecAugment-style frequency/time masking, jittable.

References: extras/decar-v2/specaugment.py:5-37 (mask with the spectrogram
mean) and torchaudio FrequencyMasking/TimeMasking as used by the MAST
dataloader (extras/mast_new/mast/dataloader.py:186-199; masks with zeros,
mask width ~ U[0, param], start uniform). Implemented with broadcasted-iota
range masks so the dynamic widths stay inside static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_mask(key: jax.Array, size: int, max_width: int) -> jax.Array:
    """Boolean [size] mask of a random contiguous span of width ~ U{0..max_width}."""
    kw, ks = jax.random.split(key)
    width = jax.random.randint(kw, (), 0, max_width + 1)
    start = jax.random.randint(ks, (), 0, jnp.maximum(size - width, 0) + 1)
    idx = jnp.arange(size)
    return (idx >= start) & (idx < start + width)


def spec_mask(
    x: jax.Array,
    key: jax.Array,
    freq_param: int = 0,
    time_param: int = 0,
    n_freq_masks: int = 1,
    n_time_masks: int = 1,
    mask_value: float | None = 0.0,
) -> jax.Array:
    """Mask one spectrogram [..., F, T]. ``mask_value=None`` uses the mean
    (SpecAugment-paper / decar-v2 behavior); 0.0 matches torchaudio defaults."""
    f, t = x.shape[-2], x.shape[-1]
    fill = jnp.mean(x) if mask_value is None else jnp.asarray(mask_value, x.dtype)
    keys = jax.random.split(key, n_freq_masks + n_time_masks)
    out = x
    for i in range(n_freq_masks):
        if freq_param > 0:
            m = _axis_mask(keys[i], f, freq_param)
            out = jnp.where(m[..., :, None], fill, out)
    for j in range(n_time_masks):
        if time_param > 0:
            m = _axis_mask(keys[n_freq_masks + j], t, time_param)
            out = jnp.where(m[..., None, :], fill, out)
    return out


def spec_mask_batch(x: jax.Array, key: jax.Array, **kw) -> jax.Array:
    """Independent masks per sample over [B, ..., F, T]."""
    return jax.vmap(lambda xi, ki: spec_mask(xi, ki, **kw))(x, jax.random.split(key, x.shape[0]))
