"""AudioNTT2020Task6 encoder (BYOL-A conv net), Flax/NHWC.

Reference spec: src/encoder/audiontt.py:37-104 — three conv blocks
(Conv 3x3 -> BN -> ReLU -> MaxPool 2x2) with per-block time-pooled taps,
then a per-timestep MLP head (Linear(64 * n_mels/8 -> d), ReLU, Dropout 0.3,
Linear(d, d), ReLU). Returns features per time frame [B, T/8, d]; callers
pool over time (mean, or max+mean).

TPU-native choices: NHWC layout ([B, F, T, 1] in, feature-minor), BatchNorm
with an optional ``axis_name`` so batch statistics psum across the data mesh
(replacing torch SyncBatchNorm / MoCo shuffle-BN — SURVEY.md §2.3).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def max_pool_2x2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class ConvBlock(nn.Module):
    features: int = 64
    axis_name: str | None = None
    bn_momentum: float = 0.9  # torch BatchNorm2d default momentum=0.1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        dtype = x.dtype
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=True, dtype=dtype)(x)
        # BN statistics in f32 (cast back so the MXU path stays low-precision)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=jnp.float32,
        )(x).astype(dtype)
        x = nn.relu(x)
        return max_pool_2x2(x)


def _time_tap(x: jax.Array) -> jax.Array:
    """[B, F', T', C] -> [B, F'*C] — flatten (freq, chan) then mean over time.

    Matches the reference tap (audiontt.py:76-93): permute to [B, T, F', C],
    reshape to [B, T, F'*C], mean over T. Reduction in f32.
    """
    b, f, t, c = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, f * c)
    return jnp.mean(x.astype(jnp.float32), axis=1)


class AudioNTT2020Task6(nn.Module):
    """Returns per-frame features [B, T/8, d]; with ``return_all_layers`` also
    the three time-pooled taps (2048 / 1024 / 512-d for n_mels=64)."""

    n_mels: int = 64
    d: int = 2048
    return_all_layers: bool = False
    axis_name: str | None = None
    dropout_rate: float = 0.3
    compute_dtype: jnp.dtype = jnp.bfloat16  # MXU-friendly; taps/outputs return f32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # x: [B, F, T, 1]
        x = x.astype(self.compute_dtype)
        taps = []
        for _ in range(3):
            x = ConvBlock(axis_name=self.axis_name)(x, train)
            taps.append(_time_tap(x))

        b, f, t, c = x.shape  # f = n_mels/8, c = 64
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, f * c)  # [B, T', F'*C]
        x = nn.Dense(self.d, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.d, dtype=x.dtype)(x)
        x = nn.relu(x).astype(jnp.float32)

        if self.return_all_layers:
            return taps[0], taps[1], taps[2], x
        return x


def max_mean_pool(x: jax.Array, axis: int = 1) -> jax.Array:
    """max + mean temporal pooling (upstream_encoder.py:26-28)."""
    return jnp.max(x, axis=axis) + jnp.mean(x, axis=axis)
