"""FSDP (ZeRO-3)-style fully sharded training via GSPMD sharding annotations.

Beyond-reference extension (the reference is data-parallel only with fully
replicated weights — SURVEY.md §2.3 "Not present anywhere: ... ZeRO/FSDP").
`train/zero.py` already shards the *optimizer moments* inside the explicit
shard_map step; this module goes the rest of the way — parameters, gradients
AND moments all live 1/n per chip — using the other TPU-idiomatic mechanism:
**sharding annotations + the XLA SPMD partitioner** (the scaling-book
recipe: pick a mesh, annotate, let XLA insert the collectives).

  * every large parameter leaf is sharded on its largest n-divisible axis
    over the ``data`` mesh axis (`fsdp_spec`); small leaves stay replicated
    (sharding a [64] bias buys nothing and costs a collective);
  * the train step is a plain `jax.jit` with in/out_shardings — XLA
    all-gathers each weight at its use sites and reduce-scatters the
    gradients, overlapping both with compute on the ICI;
  * gradients are pinned back to the parameter shardings with
    `with_sharding_constraint` before the optimizer, so the update math and
    the moments run on 1/n-sized shards per chip.

Because tensors stay *logically* whole under GSPMD, anything that reads a
full tensor — LARS/LARC trust ratios, global-norm clipping — works
unchanged (XLA turns the norms into psums). That is exactly what the
shard_map ZeRO-1/2 wrapper cannot offer (train/zero.py
`assert_zero_compatible`), which makes the two complementary: `zero.py`
slots into the existing explicit-collective step; `fsdp.py` is the
whole-step GSPMD variant for models whose weights themselves crowd HBM.

Memory note: between steps, params + grads + moments are physically 1/n
per device (asserted on the addressable shards in tests/test_fsdp.py).
Within a step XLA schedules per-use all-gathers; wrapping blocks in
`jax.checkpoint` (the encoders' ``remat`` flag) additionally keeps the
gathered weights from being held across fwd→bwd.

Loss-function contract: under GSPMD the batch is ONE logical array, so a
`jnp.mean` over the (sharded) batch is already the global mean — do NOT
`pmean`/divide by the shard count as the shard_map step does.
"""
from __future__ import annotations

import math
from typing import Any, Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiossl_tpu.parallel.mesh import DATA_AXIS

# below this many elements a leaf stays replicated: gathering a tiny bias /
# LN scale costs a collective without buying measurable HBM back
DEFAULT_MIN_SIZE = 2**12


def fsdp_spec(
    shape: tuple[int, ...], n: int, axis: str = DATA_AXIS, min_size: int = DEFAULT_MIN_SIZE
) -> P:
    """PartitionSpec sharding the largest n-divisible dim of ``shape``."""
    if math.prod(shape) < min_size:
        return P()
    best = None
    for d, s in enumerate(shape):
        if s % n == 0 and (best is None or s > shape[best]):
            best = d
    if best is None:  # no axis divides the mesh — stays replicated
        return P()
    spec: list[Any] = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def tree_shardings(
    tree: Any, mesh: Mesh, axis: str = DATA_AXIS, min_size: int = DEFAULT_MIN_SIZE
) -> Any:
    """Per-leaf FSDP NamedShardings for a pytree of arrays/ShapeDtypeStructs."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda l: NamedSharding(mesh, fsdp_spec(l.shape, n, axis, min_size)), tree
    )


def fsdp_init(
    params: Any,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    min_size: int = DEFAULT_MIN_SIZE,
):
    """Shard ``params`` over the mesh and build the optimizer state directly
    into its sharded layout (the moments are never materialized whole).

    Returns ``(params, opt_state)`` placed with FSDP shardings.
    """
    p_sh = tree_shardings(params, mesh, axis, min_size)
    params = jax.device_put(params, p_sh)
    o_sh = tree_shardings(jax.eval_shape(tx.init, params), mesh, axis, min_size)
    opt_state = jax.jit(tx.init, out_shardings=o_sh)(params)
    return params, opt_state


def make_fsdp_train_step(
    loss_fn: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    params: Any,
    axis: str = DATA_AXIS,
    min_size: int = DEFAULT_MIN_SIZE,
    donate: bool = True,
):
    """Jitted ``step(params, opt_state, batch, key) -> (params, opt_state,
    loss)`` with params/grads/moments sharded per `fsdp_spec`.

    ``loss_fn(params, batch, key) -> scalar`` must mean-reduce over the
    global batch (see module docstring). ``batch`` is a pytree whose leaves
    shard on their leading dim; ``key`` is replicated. ``params`` here is a
    shape example (arrays or ShapeDtypeStructs) used to fix the shardings.
    """
    p_sh = tree_shardings(params, mesh, axis, min_size)
    o_sh = tree_shardings(jax.eval_shape(tx.init, params), mesh, axis, min_size)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis))

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        # pin grads to the param layout: XLA lowers the (implicit) grad
        # all-reduce to a reduce-scatter and the update runs on 1/n shards
        grads = jax.lax.with_sharding_constraint(grads, p_sh)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(
        step,
        in_shardings=(p_sh, o_sh, batch_sh, repl),
        out_shardings=(p_sh, o_sh, repl),
        donate_argnums=(0, 1) if donate else (),
    )
