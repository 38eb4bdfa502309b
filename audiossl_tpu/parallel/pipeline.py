"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

Beyond-reference extension (the reference is data-parallel only —
SURVEY.md §2.3): shards a stack of identical transformer blocks across
devices as pipeline stages and streams microbatches through the ring.
TPU-idiomatic: the schedule is one `lax.scan` over fill+steady+drain
ticks inside `shard_map`; activations hop stage-to-stage with a single
`ppermute` per tick (ICI neighbor traffic only, no gathers), and the
whole step stays one XLA program. Backprop is plain `jax.grad` through
the scan: the transposed `ppermute` runs the reverse ring, which is
exactly the backward pipeline schedule.

All stages must share one (params, activation) signature — the natural
fit is the depth dimension of a transformer encoder. The stage stack is
a pytree whose leaves carry a leading [n_stages] axis sharded over the
``pipe`` axis; `stack_stage_params` builds it from a per-block list
(e.g. `init_long_ast_params(...)["blocks"]`, parallel/ring.py).

House style matches parallel/{tp,ring}.py: pure functions over explicit
parameter pytrees, shard_map-native.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from audiossl_tpu.parallel.ring import _ln

PIPE_AXIS = "pipe"


def stack_stage_params(blocks: list) -> dict:
    """[per-stage param dicts] -> one pytree with leading [n_stages] axes."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def make_pipe_mesh(n_stages: int) -> Mesh:
    from audiossl_tpu.parallel.mesh import make_mesh

    return make_mesh(n_stages, PIPE_AXIS)


def vit_block(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """Pre-LN ViT block [B, N, D] -> [B, N, D]; params use the same keys as
    `init_long_ast_params` blocks (ring.py:76-85) so the two compose."""
    b, n, d = x.shape
    dh = d // num_heads
    h = _ln(x, p["ln1"])
    qkv = h @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda a: jnp.transpose(a.reshape(b, n, num_heads, dh), (0, 2, 1, 3))
    s = jnp.einsum("bhqd,bhkd->bhqk", heads(q), heads(k)) * dh**-0.5
    att = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), heads(v))
    att = jnp.transpose(att, (0, 2, 1, 3)).reshape(b, n, d)
    x = x + (att @ p["proj"]["kernel"] + p["proj"]["bias"])
    h = _ln(x, p["ln2"])
    h = jax.nn.gelu(h @ p["fc1"]["kernel"] + p["fc1"]["bias"], approximate=False)
    return x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def pipeline_forward(
    stage_fn: Callable[[dict, jax.Array], jax.Array],
    params_local: dict,
    x_mb: jax.Array,
    axis: str = PIPE_AXIS,
) -> jax.Array:
    """Run microbatches through the stage ring. Call inside shard_map.

    stage_fn: (this stage's params, activation [mb, ...]) -> same shape.
    params_local: this device's stage slice — leaves [1, ...] when the
        stacked pytree is sharded P(axis); the leading axis is squeezed.
    x_mb: [n_micro, mb, ...] microbatches, replicated (in_spec P()).
    -> [n_micro, mb, ...] outputs, replicated (last stage's buffer psum'd).

    Schedule: n_micro + n_stages - 1 ticks (GPipe fill + drain). Stage 0
    feeds microbatch t each tick; every device applies its stage; one
    ppermute shifts activations downstream; the last stage records
    microbatch t - (n_stages - 1). The pipeline bubble is the standard
    (S-1)/(M + S-1) — amortize with n_micro >> n_stages. For long stacks
    wrap stage_fn in `jax.checkpoint` to drop the per-tick activations.
    """
    s = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    p_stage = jax.tree.map(lambda a: a[0], params_local)
    m = x_mb.shape[0]
    shift = [(i, i + 1) for i in range(s - 1)]  # stage i -> i+1; 0 gets zeros

    def tick(carry, t):
        act, out = carry
        # stage 0 ingests microbatch t (clamped: post-drain feeds are never
        # recorded — their outputs would land past the last tick)
        x_in = jnp.where(idx == 0, x_mb[jnp.minimum(t, m - 1)], act)
        y = stage_fn(p_stage, x_in)
        oi = jnp.clip(t - (s - 1), 0, m - 1)
        recorded = jax.lax.dynamic_update_index_in_dim(out, y, oi, 0)
        out = jnp.where(jnp.logical_and(idx == s - 1, t >= s - 1), recorded, out)
        return (jax.lax.ppermute(y, axis, shift), out), None

    out0 = jnp.zeros_like(x_mb)
    (_, out), _ = jax.lax.scan(tick, (jnp.zeros_like(x_mb[0]), out0), jnp.arange(m + s - 1))
    return jax.lax.psum(jnp.where(idx == s - 1, out, jnp.zeros_like(out)), axis)


@lru_cache(maxsize=None)
def _pipelined_apply_jitted(mesh: Mesh, stage_fn: Callable, axis: str):
    # built once per (mesh, stage_fn, axis): a fresh lambda per call would
    # miss the jit cache and recompile every step. stage_fn must be a
    # stable callable (module-level function or functools.partial of one)
    # for the cache to hit.
    return jax.jit(
        jax.shard_map(
            lambda p, x: pipeline_forward(stage_fn, p, x, axis),
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def pipelined_apply(
    mesh: Mesh,
    stage_fn: Callable[[dict, jax.Array], jax.Array],
    stacked_params: dict,
    x_mb: jax.Array,
    axis: str = PIPE_AXIS,
):
    """Jit-able wrapper: stacked [S, ...] stage params + [M, mb, ...] input
    -> [M, mb, ...] output. Differentiable wrt stacked_params and x_mb."""
    return _pipelined_apply_jitted(mesh, stage_fn, axis)(stacked_params, x_mb)
