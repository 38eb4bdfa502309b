"""EfficientNet-B0 encoder, Flax/NHWC (1-channel spectrogram input).

Reference: src/encoder/efficientnet.py:5-22 wraps
``efficientnet_pytorch.EfficientNet.from_name('efficientnet-b0',
include_top=False, in_channels=1)`` and flattens the pooled 1280-d feature.
Implemented from the published EfficientNet-B0 architecture (MBConv with
squeeze-excitation, swish, stochastic depth 0.2, BN eps 1e-3): stem 32ch,
stages (expand, ch, repeats, kernel, stride) = (1,16,1,3,1) (6,24,2,3,2)
(6,40,2,5,2) (6,80,3,3,2) (6,112,3,5,1) (6,192,4,5,2) (6,320,1,3,1), head
conv 1280, global average pool.

TPU notes: NHWC convs, same-style asymmetric padding as the torch
implementation's 'static' same-padding, depthwise via feature_group_count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

B0_STAGES = (
    # expand_ratio, out_ch, repeats, kernel, stride
    (1, 16, 1, 3, 1),
    (6, 24, 2, 3, 2),
    (6, 40, 2, 5, 2),
    (6, 80, 3, 3, 2),
    (6, 112, 3, 5, 1),
    (6, 192, 4, 5, 2),
    (6, 320, 1, 3, 1),
)


class SqueezeExcite(nn.Module):
    in_ch: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
        hidden = max(1, int(self.in_ch * self.se_ratio))
        s = nn.Conv(hidden, (1, 1), dtype=x.dtype)(squeezed)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=x.dtype)(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    drop_rate: float
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                axis_name=self.axis_name if train else None,
                name=name,
                dtype=jnp.float32,
            )(h)

        inputs = x
        mid = self.in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, name="expand_conv", dtype=x.dtype)(x)
            x = nn.swish(bn(x, "bn0"))
        x = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding="SAME",
            feature_group_count=mid,
            use_bias=False,
            name="depthwise_conv",
            dtype=x.dtype,
        )(x)
        x = nn.swish(bn(x, "bn1"))
        x = SqueezeExcite(self.in_ch, name="se")(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv", dtype=x.dtype)(x)
        x = bn(x, "bn2")
        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                mask = jax.random.bernoulli(
                    self.make_rng("dropout"), keep, (x.shape[0], 1, 1, 1)
                ).astype(x.dtype)
                x = x / keep * mask
            x = x + inputs
        return x


class EfficientNetB0(nn.Module):
    """[B, F, T, 1] -> [B, 1280] pooled features (include_top=False path)."""

    axis_name: str | None = None
    drop_connect_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                axis_name=self.axis_name if train else None,
                name=name,
                dtype=jnp.float32,
            )(h)

        x = nn.Conv(32, (3, 3), strides=2, padding="SAME", use_bias=False, name="stem_conv", dtype=x.dtype)(x)
        x = nn.swish(bn(x, "stem_bn"))

        total_blocks = sum(s[2] for s in B0_STAGES)
        idx = 0
        in_ch = 32
        for stage, (expand, out_ch, repeats, kernel, stride) in enumerate(B0_STAGES):
            for r in range(repeats):
                x = MBConv(
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand_ratio=expand,
                    kernel=kernel,
                    stride=stride if r == 0 else 1,
                    drop_rate=self.drop_connect_rate * idx / total_blocks,
                    axis_name=self.axis_name,
                    name=f"block{stage}_{r}",
                )(x, train)
                in_ch = out_ch
                idx += 1

        x = nn.Conv(1280, (1, 1), use_bias=False, name="head_conv", dtype=x.dtype)(x)
        x = nn.swish(bn(x, "head_bn"))
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 1280]
