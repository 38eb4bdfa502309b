"""AudioNTT2020Task6 encoder (BYOL-A conv net), Flax.

Reference spec: src/encoder/audiontt.py:37-104 — three conv blocks
(Conv 3x3 -> BN -> ReLU -> MaxPool 2x2) with per-block time-pooled taps,
then a per-timestep MLP head (Linear(64 * n_mels/8 -> d), ReLU, Dropout 0.3,
Linear(d, d), ReLU). Returns features per time frame [B, T/8, d]; callers
pool over time (mean, or max+mean).

TPU-native choices:

* Public boundary is NHWC [B, F, T, 1] (freq-major like the reference's
  NCHW [B, 1, F, T]); **internally everything runs time-major [B, T, F, C]**
  so the per-block taps and the final per-timestep MLP are plain reshapes
  instead of [B, F, T, C] transposes of the (large) conv activations.
* Block 1 (C_in=1) is HBM-bandwidth-bound, not MXU-bound: its [B, T, F, 64]
  output (805 MB at B=1024 bf16) dominates, so the plain conv wins on v5e
  (measured 1.60 ms vs 2.25 ms at B=1024). ``BandedConv1`` — the same conv
  recast as one MXU-dense banded matmul (contraction 3*F=192 instead of the
  conv's 9) — is kept as an option for parts where the MXU is the
  constraint; equivalence is pinned by tests/test_ops.py::TestBandedConv1.
* BatchNorm with an optional ``axis_name`` so batch statistics psum across
  the data mesh (replacing torch SyncBatchNorm / MoCo shuffle-BN —
  SURVEY.md §2.3); BN statistics in f32, conv/matmul compute in bf16.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def max_pool_2x2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class BandedConv1(nn.Module):
    """3x3, pad-1, C_in=1 convolution evaluated as a banded matmul.

    Input [B, T, F] (single channel), output [B, T, F, C]. The kernel param
    keeps nn.Conv's [kh(freq), kw(time), 1, C] shape so weight transplants
    stay mechanical. For each time tap j the frequency conv is a banded
    [F, F*C] matrix M_j[f_in, (f_out, c)] = kernel[f_in - f_out + 1, j, 0, c];
    stacking the three time-shifted inputs gives one [B*T, 3F] @ [3F, F*C]
    matmul — contraction 3F instead of the conv's 9, so the MXU runs dense
    instead of >90% padding (PERF.md: this conv was ~70% of encoder time).
    """

    features: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, f = x.shape
        dt = self.dtype or x.dtype
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # shift-eye constants: E[di, f_in, f_out] = 1 iff f_out = f_in + 1 - di
        eye = np.stack([np.eye(f, k=1 - di, dtype=np.float32) for di in range(3)])
        # M[j, f_in, f_out, c] = sum_di E[di, f_in, f_out] * kernel[di, j, 0, c]
        m = jnp.einsum("dio,djc->jioc", jnp.asarray(eye), kernel[:, :, 0, :].astype(jnp.float32))
        m = m.reshape(3 * f, f * self.features).astype(dt)
        # three zero-padded time shifts, concatenated (j, f_in)-major
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0))).astype(dt)
        xcat = jnp.concatenate([xp[:, :t], xp[:, 1 : t + 1], xp[:, 2 : t + 2]], axis=-1)
        y = xcat @ m  # [B, T, F*C]
        return y.reshape(b, t, f, self.features) + bias.astype(dt)


class _ConvParams(nn.Module):
    """Parameter container matching nn.Conv's variable layout (kernel/bias),
    so the fused block-1 path shares checkpoints with the unfused one."""

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _BNState(nn.Module):
    """Parameter/stat container matching nn.BatchNorm's variable layout."""

    features: int
    momentum: float

    @nn.compact
    def __call__(self, batch_mean: jax.Array | None, batch_var: jax.Array | None):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        if batch_mean is not None and not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * batch_mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * batch_var
        return scale, bias, ra_mean.value, ra_var.value


class ConvBlock(nn.Module):
    """Conv 3x3 -> BN -> ReLU -> MaxPool 2x2 on time-major [B, T, F, C].

    ``banded=True`` swaps the conv for ``BandedConv1`` (C_in=1 only) — an
    MXU-dense option for when block 1 is compute-bound; on v5e the plain
    conv wins (HBM-bound, see module docstring), so it stays the default.

    ``fused=True`` (C_in=1 only) replaces the whole block with the Pallas
    fused kernels of ops/block1.py — the [B, T, F, C] conv activation never
    reaches HBM (the dominant traffic of the encoder, PERF.md). Parameter /
    batch-stat names match the unfused path exactly, so checkpoints are
    interchangeable. The block-1 INPUT gradient is not computed on this
    path (zeros) — valid here because the spectrogram views upstream carry
    no trainable parameters.

    The fused path engages only when ``train=True``: the win is the
    backward's dropped activation traffic and the recompute-free batch
    stats; XLA's eval forward (BN folded to an affine, conv+relu+pool
    fused) measures faster than the kernel, and keeping eval on XLA also
    keeps traced serving exports free of TPU-only custom calls.
    """

    features: int = 64
    axis_name: str | None = None
    bn_momentum: float = 0.9  # torch BatchNorm2d default momentum=0.1
    banded: bool = False  # C_in=1 banded-matmul path (expects [B, T, F] input)
    fused: bool = False  # C_in=1 fused Pallas block (ops/block1.py)
    fused_interpret: bool = False  # pallas interpret mode (CPU tests)
    fused_rt: int = 512  # forward kernel row tile (backward clamps to BWD_RT)
    # The fused kernel does NOT compute the input cotangent (ops/block1.py
    # returns zeros). Callers must acknowledge that no trainable parameters
    # sit upstream of this block; otherwise their gradients would silently
    # vanish. AudioNTT sets this (its input is the raw spectrogram view).
    fused_dead_input_grad_ok: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        dtype = x.dtype
        if self.fused and train:
            if not self.fused_dead_input_grad_ok:
                raise ValueError(
                    "ConvBlock(fused=True) drops the input gradient (zeros "
                    "cotangent, ops/block1.py). Set fused_dead_input_grad_ok="
                    "True only if nothing trainable feeds this block."
                )
            from audiossl_tpu.ops.block1 import (
                block1_batch_stats, block1_streams, carries_tangent, fused_block1,
            )

            # Trace-time enforcement of the dead-input-cotangent invariant:
            # fused_dead_input_grad_ok asserts "nothing trainable upstream",
            # but a trainable frontend/adapter would make the input carry a
            # tangent under jax.grad — catch that here instead of silently
            # returning zero gradients to it (ops/block1.py docstring).
            if carries_tangent(x):
                raise ValueError(
                    "ConvBlock(fused=True): the block input is being "
                    "differentiated through (a trainable module feeds this "
                    "block), but the fused Pallas path returns a zeros input "
                    "cotangent — its gradients would silently vanish. Use "
                    "fused_block1=False on AudioNTT2020Task6 (or drop the "
                    "trainable module upstream)."
                )
            x3 = x[..., 0] if x.ndim == 4 else x
            b, t, f = x3.shape
            kernel, cbias = _ConvParams(self.features, name="Conv_0")()
            # one stream prep shared by the quadratic-form batch stats, the
            # apply kernel and (via the vjp residuals) both backward passes
            xe, xo, n_valid = block1_streams(x3, self.fused_rt)
            # flax BatchNorm skips the axis during init (no mesh context yet)
            ax = self.axis_name if not self.is_initializing() else None
            mean, var = block1_batch_stats(
                xe, xo, n_valid, kernel, cbias, f,
                axis_name=ax, rt=self.fused_rt,
                interpret=self.fused_interpret,
            )
            scale, bbias, _, _ = _BNState(
                self.features, self.bn_momentum, name="BatchNorm_0"
            )(jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var))
            pooled = fused_block1(
                xe, xo, n_valid, kernel, cbias, scale, bbias, mean, var, f,
                True, ax, self.fused_rt, self.fused_interpret,
            )
            return pooled.reshape(b, t // 2, f // 2, self.features)
        if self.banded:
            x = BandedConv1(self.features, dtype=dtype)(x)
        else:
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
    """[B, T', F', C] -> [B, F'*C] — flatten (freq, chan) then mean over time.

    Matches the reference tap (audiontt.py:76-93): permute to [B, T, F', C],
    reshape to [B, T, F'*C], mean over T. Reduction in f32. Time-major
    layout makes the permute a no-op.
    """
    b, t, f, c = x.shape
    return jnp.mean(x.reshape(b, t, f * c).astype(jnp.float32), axis=1)


class AudioNTT2020Task6(nn.Module):
    """Returns per-frame features [B, T/8, d]; with ``return_all_layers`` also
    the three time-pooled taps (2048 / 1024 / 512-d for n_mels=64).

    Public input layout [B, F, T, 1]; internal compute is time-major
    (see module docstring).
    """

    n_mels: int = 64
    d: int = 2048
    return_all_layers: bool = False
    axis_name: str | None = None
    dropout_rate: float = 0.3
    compute_dtype: jnp.dtype = jnp.bfloat16  # MXU-friendly; taps/outputs return f32
    # block 1 fused Pallas path (ops/block1.py): "auto" enables it on TPU
    # only (checkpoint-compatible either way); True forces it (interpret
    # mode off-TPU, for tests), False keeps the plain conv block.
    fused_block1: bool | str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        # x: [B, F, T, 1] -> time-major [B, T, F, 1] (small: pre-conv activations)
        x = jnp.transpose(x, (0, 2, 1, 3)).astype(self.compute_dtype)
        on_tpu = jax.default_backend() == "tpu"
        use_fused = self.fused_block1 is True or (self.fused_block1 == "auto" and on_tpu)
        if use_fused:
            from audiossl_tpu.ops import block1 as _b1

            use_fused = _b1.feasible(x.shape[1], x.shape[2], 64)
        taps = []
        for i in range(3):
            x = ConvBlock(
                axis_name=self.axis_name,
                fused=use_fused and i == 0,
                fused_interpret=not on_tpu,
                # block-1 input is the (non-trainable) spectrogram view
                fused_dead_input_grad_ok=True,
            )(x, train)
            taps.append(_time_tap(x))

        b, t, f, c = x.shape  # f = n_mels/8, c = 64
        x = x.reshape(b, t, f * c)  # [B, T', F'*C] — already time-major
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
