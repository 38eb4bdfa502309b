"""Tensor-parallel building blocks over a ('data', 'model') mesh.

The reference has exactly one parallelism axis (data — SURVEY.md §2.3);
long-audio / wide-projector scaling is an extension point. These are the
Megatron-style primitives for that extension, shard_map-native so they
compose with the existing data-parallel step:

  * column-parallel matmul: weights sharded on the output dim, no forward
    communication, activations end up model-sharded;
  * row-parallel matmul: weights sharded on the input dim, psum over the
    model axis merges partial products;
  * a column→row pair implements an MLP (e.g. the 2048→2048→2048 Barlow
    projector) with one psum per block and weight memory 1/M per chip.

Used standalone under shard_map (see tests/test_tp.py) or as a template for
sharding-annotated pjit layers.

Autodiff subtlety (tests/test_tp.py): after row_parallel the activation is
replicated over the model axis, so a loss computed per shard counts the same
value once per model shard — divide the local loss by
`jax.lax.axis_size('model')` before `jax.grad`, then psum grads over 'data'
(the DDP all-reduce).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

MODEL_AXIS = "model"


def column_parallel(x: jax.Array, w_shard: jax.Array, b_shard: jax.Array | None = None) -> jax.Array:
    """[B, D] x [D, F/M] -> [B, F/M] (output stays model-sharded, no comm)."""
    y = jnp.matmul(x, w_shard, precision=jax.lax.Precision.HIGHEST)
    if b_shard is not None:
        y = y + b_shard
    return y


def row_parallel(
    x_shard: jax.Array, w_shard: jax.Array, b: jax.Array | None = None, axis: str = MODEL_AXIS
) -> jax.Array:
    """[B, D/M] x [D/M, F] -> psum -> [B, F] replicated over the model axis."""
    y = jax.lax.psum(jnp.matmul(x_shard, w_shard, precision=jax.lax.Precision.HIGHEST), axis)
    if b is not None:
        y = y + b
    return y


def tp_mlp(x: jax.Array, w1_shard: jax.Array, w2_shard: jax.Array, axis: str = MODEL_AXIS) -> jax.Array:
    """Column->ReLU->row parallel MLP block: one psum total."""
    h = jax.nn.relu(column_parallel(x, w1_shard))
    return row_parallel(h, w2_shard, axis=axis)


def make_2d_mesh(data: int, model: int) -> Mesh:
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", MODEL_AXIS))


def shard_mlp_weights(mesh: Mesh, w1: jax.Array, w2: jax.Array):
    """Place [D, H] column-sharded and [H, F] row-sharded on the mesh."""
    return (
        jax.device_put(w1, jax.sharding.NamedSharding(mesh, P(None, MODEL_AXIS))),
        jax.device_put(w2, jax.sharding.NamedSharding(mesh, P(MODEL_AXIS, None))),
    )
