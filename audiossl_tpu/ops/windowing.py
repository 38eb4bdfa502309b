"""Fixed-length window extraction (pad-to-center + random crop).

Reference semantics (``extract_window``, src/utils/utils.py:166-182):
if the wave is shorter than ``unit_length`` samples, zero-pad symmetrically
(extra sample on the right); then take a random crop of ``unit_length``.

Two implementations:
  * ``extract_window_np`` — host-side, variable input length (data pipeline).
  * ``extract_window`` — jittable, static input length, PRNG-keyed crop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def extract_window_np(wave: np.ndarray, unit_length: int, rng: np.random.Generator) -> np.ndarray:
    n = len(wave)
    if n < unit_length:
        adj = unit_length - n
        half = adj // 2
        wave = np.pad(wave, (half, adj - half))
        n = unit_length
    start = int(rng.integers(0, n - unit_length + 1)) if n > unit_length else 0
    return wave[start : start + unit_length]


def extract_window(wave: jax.Array, unit_length: int, key: jax.Array) -> jax.Array:
    """[n] -> [unit_length]; static n, random crop position from ``key``."""
    n = wave.shape[-1]
    if n < unit_length:
        adj = unit_length - n
        half = adj // 2
        return jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(half, adj - half)])
    if n == unit_length:
        return wave
    start = jax.random.randint(key, (), 0, n - unit_length + 1)
    return jax.lax.dynamic_slice_in_dim(wave, start, unit_length, axis=-1)


def extract_window_batch(waves: jax.Array, unit_length: int, key: jax.Array) -> jax.Array:
    """[B, n] -> [B, unit_length], independent random crops."""
    keys = jax.random.split(key, waves.shape[0])
    return jax.vmap(lambda w, k: extract_window(w, unit_length, k))(waves, keys)
