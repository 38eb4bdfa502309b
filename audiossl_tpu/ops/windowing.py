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


def signal_to_frame_np(
    signal: np.ndarray, frame_length: int, frame_step: int, pad_end: bool = False, pad_value: float = 0.0
) -> np.ndarray:
    """tf.signal.frame equivalent on host (reference: extras/datasets/
    data_utils.py:12-26). [..., n] -> [..., n_frames, frame_length]."""
    n = signal.shape[-1]
    if pad_end:
        overlap = frame_length - frame_step
        rest = abs(n - overlap) % abs(frame_length - overlap)
        if frame_length - rest != 0:
            pads = [(0, 0)] * (signal.ndim - 1) + [(0, frame_length - rest)]
            signal = np.pad(signal, pads, constant_values=pad_value)
            n = signal.shape[-1]
    n_frames = max(1 + (n - frame_length) // frame_step, 0)
    idx = np.arange(n_frames)[:, None] * frame_step + np.arange(frame_length)[None, :]
    return signal[..., idx]


def collate_pad(waves: list[np.ndarray], labels: list | None = None):
    """Pad a variable-length batch to the longest clip (reference
    collate_fn_padd, src/dataset/upstream_dataset.py:17-33)."""
    longest = max(len(w) for w in waves)
    out = np.zeros((len(waves), longest), np.float32)
    for i, w in enumerate(waves):
        out[i, : len(w)] = w
    if labels is None:
        return out
    return out, np.asarray(labels, np.int64)
