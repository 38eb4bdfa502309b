"""Projection / classifier heads shared by the SSL objectives (Flax).

References:
  * Barlow ``Projection`` MLP — src/upstream/delores_s/upstream_expert.py:11-28
    (two Linear(no-bias)+BN+ReLU blocks then a final bias-free Linear)
  * UnFuSeD ``Project`` / ``Classifier`` — src/upstream/unfused/upstream_expert.py:14-35
  * SLICER instance/cluster projectors — src/upstream/slicer/upstream_encoder.py:15-21
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPProjector(nn.Module):
    """[in] -> hidden -> hidden -> out with BN+ReLU between (bias-free Linears).

    Matmuls run in ``compute_dtype`` (bf16 by default — they are the FLOPs of
    the Barlow objectives); BN statistics and the returned projection are f32
    (the cross-correlation loss needs the precision).
    """

    hidden: int = 2048
    out: int = 2048
    axis_name: str | None = None
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = x.astype(self.compute_dtype)
        for width in (self.hidden, self.hidden):
            x = nn.Dense(width, use_bias=False, dtype=x.dtype)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name if train else None,
                dtype=jnp.float32,
            )(x).astype(self.compute_dtype)
            x = nn.relu(x)
        return nn.Dense(self.out, use_bias=False, dtype=x.dtype)(x).astype(jnp.float32)


class LinearClassifier(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.num_classes, dtype=x.dtype)(x)


class ClusterProjector(nn.Module):
    """Linear -> ReLU -> Linear -> Softmax (SLICER cluster head)."""

    hidden: int
    num_clusters: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_clusters, dtype=x.dtype)(x)
        return jax.nn.softmax(x, axis=1)


def batch_standardize(z: jax.Array, eps: float = 1e-5, axis_name: str | None = None) -> jax.Array:
    """BatchNorm1d(affine=False, training) as a pure fn: standardize over batch.

    With ``axis_name`` the moments are psum'd across the mesh (global batch).
    """
    mean = jnp.mean(z, axis=0)
    sq = jnp.mean(jnp.square(z), axis=0)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sq = jax.lax.pmean(sq, axis_name)
    var = sq - jnp.square(mean)
    return (z - mean) * jax.lax.rsqrt(var + eps)


def off_diagonal_sq_sum(c: jax.Array) -> jax.Array:
    """Sum of squared off-diagonal entries (utils.off_diagonal analogue)."""
    return jnp.sum(jnp.square(c)) - jnp.sum(jnp.square(jnp.diagonal(c)))


def barlow_loss(
    z1: jax.Array,
    z2: jax.Array,
    lambd: float | None = 5e-5,
    scale_loss: float = 1.0 / 32.0,
    axis_name: str | None = None,
    variant: str = "src",
) -> jax.Array:
    """Barlow-Twins cross-correlation loss on projected views.

    ``variant='src'``: loss = lambd * scale * (on_diag + off_diag)
    (src/upstream/delores_s/upstream_expert.py:30-46).
    ``variant='extras'``: loss = on_diag + lambd * off_diag
    (extras/delores-s/models_byol.py:108-119). Either way the cross-corr
    matrix is summed across the data mesh (restoring the all_reduce the
    unified src dropped — SURVEY.md §7 item 4).
    """
    b = z1.shape[0]
    # standardize with global-batch moments (extras converts the whole model,
    # incl. the affine-free BN, to SyncBatchNorm — extras/delores-s/main.py:79)
    z1n = batch_standardize(z1, axis_name=axis_name)
    z2n = batch_standardize(z2, axis_name=axis_name)
    c = jnp.matmul(z1n.T, z2n, precision=jax.lax.Precision.HIGHEST) / b
    if axis_name is not None:
        # match extras: divide by *global* batch, then sum across replicas
        c = jax.lax.psum(c / jax.lax.axis_size(axis_name), axis_name)
    on_diag = jnp.sum(jnp.square(jnp.diagonal(c) - 1.0))
    off_diag = off_diagonal_sq_sum(c)
    if variant == "extras":
        return on_diag + (lambd or 0.0) * off_diag
    if lambd:
        return lambd * scale_loss * on_diag + lambd * scale_loss * off_diag
    return scale_loss * (on_diag + off_diag)
