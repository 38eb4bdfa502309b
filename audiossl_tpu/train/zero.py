"""ZeRO-style sharded optimizer state over the data mesh axis.

The reference's only parallelism is DDP with fully replicated optimizer
state (SURVEY.md §2.3 — "Not present anywhere: ... ZeRO/FSDP"). On a TPU
pod the replicated AdamW moments for MViT-base cost 2 x 50M x 4 B = 400 MB
of HBM per chip that the activation budget badly wants back. This module
shards the optimizer state across the 'data' axis, ZeRO-1/2 style, inside
the existing shard_map train step:

  * every parameter leaf is flattened, zero-padded to a multiple of the
    shard count and viewed as [n_shards, k] — shard i owns row i;
  * gradients are reduced with `lax.psum_scatter` (reduce-scatter) instead
    of `pmean`, so each shard receives only its slice of the mean gradient
    (same ICI bytes as the all-reduce it replaces);
  * the wrapped optax transformation updates the local slice (moments live
    only for that slice — optimizer HBM is 1/n per chip);
  * the parameter delta is `all_gather`'d back so params stay replicated
    (ZeRO-1/2, not FSDP/ZeRO-3: reduce_scatter + all_gather together move
    exactly the bytes of the one all-reduce they replace).

Per-leaf structure is preserved (each leaf is sliced independently), so
per-leaf hyperparameters (masking, layer-decay scales) survive sharding.
What does NOT survive is any transform that reads a whole tensor at once —
LARS/LARC trust ratios and global-norm clipping see only the local slice —
so `assert_zero_compatible` restricts the wrapper to elementwise
optimizers (SGD / Adam / AdamW). Resuming a checkpoint requires the same
shard count the state was saved with (same property as the reference's
per-rank mb{rank}.pth memory banks, extras/decar-v2/main.py:129-134).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax

from audiossl_tpu.parallel.mesh import DATA_AXIS

# optimizers whose update math is elementwise per parameter entry
ELEMENTWISE_OPTIMIZERS = ("sgd", "adam", "adamw")


def assert_zero_compatible(opt_name: str) -> None:
    if opt_name.lower() not in ELEMENTWISE_OPTIMIZERS:
        raise ValueError(
            f"zero_optimizer supports elementwise optimizers {ELEMENTWISE_OPTIMIZERS}; "
            f"{opt_name!r} needs full-tensor norms (trust ratio) which a sharded "
            "slice cannot see"
        )


def _shard_rows(a: jax.Array, n: int) -> jax.Array:
    """Flatten + zero-pad to [n, ceil(size/n)] — row i is shard i's slice."""
    k = -(-a.size // n)
    flat = jnp.pad(a.reshape(-1), (0, n * k - a.size))
    return flat.reshape(n, k)


def zero_init(tx: optax.GradientTransformation, params, n_shards: int):
    """Optimizer state with every array leaf carrying a leading [n_shards]
    axis (shard i's moments for its parameter slice) — mesh-shard with
    PartitionSpec('data') like the augmentation state."""
    sliced = jax.tree.map(lambda p: _shard_rows(p, n_shards), params)
    return jax.vmap(tx.init)(sliced)


def zero_update(
    tx: optax.GradientTransformation,
    grads,
    opt_state_local,
    params,
    n_shards: int,
    axis: str = DATA_AXIS,
):
    """Inside shard_map: local (un-reduced) grads -> (full update, new local
    opt state). Equivalent to pmean(grads) -> tx.update on every shard, but
    moments exist only for the local slice."""
    idx = lax.axis_index(axis)

    def scatter(g):
        k = -(-g.size // n_shards)
        flat = jnp.pad(g.reshape(-1), (0, n_shards * k - g.size))
        # reduce-scatter of the SUM, then mean: each shard gets its k-slice
        return lax.psum_scatter(flat, axis, scatter_dimension=0, tiled=True) / n_shards

    def slice_param(p):
        k = -(-p.size // n_shards)
        flat = jnp.pad(p.reshape(-1), (0, n_shards * k - p.size))
        return lax.dynamic_slice(flat, (idx * k,), (k,))

    g_local = jax.tree.map(scatter, grads)
    p_local = jax.tree.map(slice_param, params)
    updates_local, new_opt_state = tx.update(g_local, opt_state_local, p_local)

    def gather(u, p):
        full = lax.all_gather(u, axis, tiled=True)
        return full[: p.size].reshape(p.shape)

    updates = jax.tree.map(gather, updates_local, params)
    return updates, new_opt_state
