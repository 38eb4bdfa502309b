"""Expert parallelism: a Switch-style MoE FFN sharded over an ``expert`` axis.

Beyond-reference extension completing the parallelism set (dp / ZeRO / sp /
tp / pp / ep): a drop-in replacement for a transformer FFN where tokens are
routed top-1 to E experts whose weights live sharded across the mesh. The
TPU-native dataflow is the Mesh-TensorFlow / GShard formulation: dispatch
and combine are einsums against a one-hot slot tensor (MXU work, no
scatters), and the only communication is a pair of `all_to_all` collectives
over the expert axis — the canonical EP pattern, riding ICI.

Capacity semantics: each (source device, expert) pair owns ``capacity``
slots; tokens routed past a full expert are dropped (their output is the
residual zero), the standard Switch behavior. Gradients flow to the router
through the gate probability that scales each combined token.

House style matches parallel/{tp,ring,pipeline}.py: pure functions over
explicit pytrees, shard_map-native.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

EXPERT_AXIS = "expert"


def init_moe_params(
    key: jax.Array, d: int, hidden: int, n_experts: int
) -> dict:
    """Router (replicated) + per-expert FFN stacks (leading [E] axis — shard
    it P(EXPERT_AXIS) under shard_map)."""
    k0, k1, k2 = jax.random.split(key, 3)
    trunc = jax.nn.initializers.truncated_normal(0.02)
    return {
        "router": trunc(k0, (d, n_experts), jnp.float32),
        "w1": trunc(k1, (n_experts, d, hidden), jnp.float32),
        "b1": jnp.zeros((n_experts, hidden), jnp.float32),
        "w2": trunc(k2, (n_experts, hidden, d), jnp.float32),
        "b2": jnp.zeros((n_experts, d), jnp.float32),
    }


def make_expert_mesh(n_devices: int) -> Mesh:
    from audiossl_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices, EXPERT_AXIS)


def moe_ffn(
    params_local: dict,
    x_local: jax.Array,
    capacity: int,
    axis: str = EXPERT_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """Inside shard_map: tokens [n_local, d] -> ([n_local, d], aux_loss).

    params_local: router [d, E] replicated; w1/b1/w2/b2 carry this device's
        [E / axis_size] expert slice (stacked pytree sharded P(axis)).
    capacity: slots per (source device, expert).
    aux_loss: Switch load-balancing loss E * sum_i f_i * P_i computed over
        the GLOBAL batch (token fractions and router probs psum'd).
    """
    w = jax.lax.axis_size(axis)
    n, d = x_local.shape
    e = params_local["router"].shape[1]
    if e % w:
        raise ValueError(f"{e} experts not divisible by {w} devices")

    logits = x_local @ params_local["router"]  # [n, E]
    probs = jax.nn.softmax(logits, axis=-1)
    gate = jnp.max(probs, axis=-1)  # [n]
    expert = jnp.argmax(probs, axis=-1)  # [n]

    onehot = jax.nn.one_hot(expert, e, dtype=x_local.dtype)  # [n, E]
    pos = jnp.cumsum(onehot, axis=0) - onehot  # slot index within (device, expert)
    keep = jnp.where(pos < capacity, onehot, 0.0)
    slot = jax.nn.one_hot(pos.astype(jnp.int32), capacity, dtype=x_local.dtype)
    slot = slot * keep[..., None]  # [n, E, C] one-hot dispatch

    dispatched = jnp.einsum("nd,nec->ecd", x_local, slot)  # [E, C, d]
    # expert axis scattered, source devices concatenated: [E/w, w*C, d]
    xa = jax.lax.all_to_all(dispatched, axis, split_axis=0, concat_axis=1, tiled=True)
    h = jax.nn.gelu(
        jnp.einsum("esd,edh->esh", xa, params_local["w1"])
        + params_local["b1"][:, None, :],
        approximate=False,
    )
    y = jnp.einsum("esh,ehd->esd", h, params_local["w2"]) + params_local["b2"][:, None, :]
    # route results back to their source devices: [E, C, d]
    yb = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=0, tiled=True)
    out = jnp.einsum("ecd,nec->nd", yb, slot * gate[:, None, None])

    # Switch aux loss over the global batch: E * sum_i f_i * P_i
    n_global = jax.lax.psum(jnp.asarray(n, x_local.dtype), axis)
    frac = jax.lax.psum(jnp.sum(onehot, axis=0), axis) / n_global
    pbar = jax.lax.psum(jnp.sum(probs, axis=0), axis) / n_global
    aux = e * jnp.sum(frac * pbar)
    return out, aux


@lru_cache(maxsize=None)
def _moe_apply_jitted(mesh: Mesh, capacity: int, axis: str):
    # built once per (mesh, capacity, axis): a fresh lambda per call would
    # miss the jit cache and recompile every step
    specs = {
        "router": P(),
        "w1": P(axis), "b1": P(axis), "w2": P(axis), "b2": P(axis),
    }
    return jax.jit(
        jax.shard_map(
            lambda p, xl: moe_ffn(p, xl, capacity, axis),
            mesh=mesh,
            in_specs=(specs, P(axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
        )
    )


def moe_apply(
    mesh: Mesh, params: dict, x: jax.Array, capacity: int, axis: str = EXPERT_AXIS
):
    """Jit-able wrapper: full params (w1/b1/w2/b2 leading [E]) + tokens
    [n, d] data-sharded over the expert devices -> ([n, d], aux_loss)."""
    return _moe_apply_jitted(mesh, capacity, axis)(params, x)
