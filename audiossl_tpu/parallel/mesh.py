"""Device mesh + sharding helpers.

The reference's entire distributed story is data parallelism over NCCL
(SURVEY.md §2.3). TPU-native equivalent: one `jax.sharding.Mesh` with a
'data' axis; the train step runs under `shard_map` with params replicated
and the batch sharded, using explicit XLA collectives (psum / all_gather)
where the reference called torch.distributed. The mesh generalizes to
('data', 'model') for tensor-parallel extensions without touching the step.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place host arrays on the mesh, leading dim sharded across ``axis``.

    Single-host: a plain device_put. Multi-host pod (jax.distributed mesh):
    each process passes only its LOCAL slice of the global batch (the
    ManifestLoader ``host_shard`` split) and the global array is assembled
    from per-process shards — the jax equivalent of DistributedSampler +
    per-device batch_size // world_size (train_downstream.py:63-66).
    """
    sharding = batch_sharded(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)), batch
        )
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def host_to_mesh(mesh: Mesh, tree, spec: P = P()):
    """Place host-replicated arrays onto the (possibly multi-host) mesh.

    Single-host: plain device_put. Multi-host pod: device_put rejects
    shardings spanning non-addressable devices, so the global array is
    assembled from per-host callbacks — valid because every process holds
    the same full array (identically seeded init / identically derived
    state). PRNG key arrays are unwrapped to their raw data and re-wrapped
    (make_array_from_callback takes plain dtypes only).
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
    import jax.numpy as jnp

    def put(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            impl = jax.random.key_impl(a)
            data = np.asarray(jax.random.key_data(a))
            raw = jax.make_array_from_callback(data.shape, sharding, lambda idx: data[idx])
            return jax.random.wrap_key_data(raw, impl=impl)
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return host_to_mesh(mesh, tree, P())
