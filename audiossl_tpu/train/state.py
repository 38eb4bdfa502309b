"""Train state pytree carried through the jitted step."""
from __future__ import annotations

from typing import Any, NamedTuple

import jax


class TrainState(NamedTuple):
    step: jax.Array  # int32, replicated
    params: Any  # trainable params, replicated
    opt_state: Any  # optax state, replicated (or mesh-sharded with leading [n_shards] axis under run.zero_optimizer — train/zero.py)
    batch_stats: Any  # flax BN stats, replicated
    ssl_state: Any  # objective state (queue/ptr/momentum params/...), replicated
    aug_state: Any  # augmentation state, leading [n_shards] axis, mesh-sharded
    rng: jax.Array  # base PRNG key, replicated
