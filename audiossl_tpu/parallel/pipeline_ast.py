"""Pipeline-parallel AST: shard the flagship transformer's depth across chips.

Applies parallel/pipeline.py to the real `ASTEncoder` (models/ast.py): the
encoder's `block{i}` flax params are grouped into per-stage stacks, the
patchify/cls/dist/pos prologue and final-LN/token-mean epilogue run as pure
functions from the same checkpoint params, and microbatches stream through
the stage ring. `pipelined_ast_forward(...)` equals `ASTEncoder.apply`
(eval mode) to fp tolerance — tested in tests/test_pipeline_ast.py — so an
AST checkpoint whose depth exceeds one chip's HBM can serve across a pod
without changing weights.

The pure block math mirrors ViTBlock (models/ast.py:77-114): f32 LayerNorm
(eps 1e-6), flax MultiHeadDotProductAttention layout (separate q/k/v/out
projections, [D, H, Dh] kernels), exact GELU MLP, pre-LN residuals.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from audiossl_tpu.models.ast import ASTConfig
from audiossl_tpu.parallel.pipeline import PIPE_AXIS, pipelined_apply, stack_stage_params


def _ln(x, p, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def ast_block(p: dict, x: jax.Array, num_heads: int) -> jax.Array:
    """Pure twin of ViTBlock.__call__ (eval path) over its flax params."""
    att = p["MultiHeadDotProductAttention_0"]
    h = _ln(x, p["LayerNorm_0"]).astype(x.dtype)
    q = jnp.einsum("bnd,dhk->bnhk", h, att["query"]["kernel"]) + att["query"]["bias"]
    k = jnp.einsum("bnd,dhk->bnhk", h, att["key"]["kernel"]) + att["key"]["bias"]
    v = jnp.einsum("bnd,dhk->bnhk", h, att["value"]["kernel"]) + att["value"]["bias"]
    dh = q.shape[-1]
    s = jnp.einsum("bqhk,bnhk->bhqn", q / jnp.sqrt(dh).astype(q.dtype), k)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqn,bnhk->bqhk", a, v)
    x = x + jnp.einsum("bqhk,hkd->bqd", o, att["out"]["kernel"]) + att["out"]["bias"]
    h = _ln(x, p["LayerNorm_1"]).astype(x.dtype)
    h = jax.nn.gelu(h @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"], approximate=False)
    return x + h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]


def ast_prologue(params: dict, x: jax.Array, cfg: ASTConfig) -> jax.Array:
    """[B, F, T, 1] log-fbank -> [B, N+2, D] tokens (ASTEncoder:138-160)."""
    x = jnp.swapaxes(x, 1, 2)
    x = (
        jax.lax.conv_general_dilated(
            x, params["patch_embed"]["kernel"].astype(x.dtype),
            (cfg.tstride, cfg.fstride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + params["patch_embed"]["bias"]
    )
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate(
        [jnp.tile(params["cls_token"], (b, 1, 1)),
         jnp.tile(params["dist_token"], (b, 1, 1)), x], axis=1,
    )
    return x + params["pos_embed"]


def ast_epilogue(params: dict, x: jax.Array) -> jax.Array:
    x = _ln(x, params["norm"])
    return (x[:, 0] + x[:, 1]) / 2.0


def ast_stage_stack(params: dict, depth: int, n_stages: int) -> dict:
    """block{i} params -> stacked pytree with leading [n_stages, per] axes."""
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    per = depth // n_stages
    stages = [
        stack_stage_params([params[f"block{s * per + j}"] for j in range(per)])
        for s in range(n_stages)
    ]
    return stack_stage_params(stages)


@lru_cache(maxsize=None)
def _pipelined_ast_jitted(mesh: Mesh, cfg: ASTConfig, n_micro: int):
    # one jitted program per (mesh, cfg, n_micro): prologue, stage stacking,
    # the pipeline scan, and the epilogue all fuse into a single XLA
    # executable, and repeated calls hit the jit cache instead of
    # re-dispatching the prologue eagerly + retracing a fresh stage closure
    n_stages = mesh.devices.size
    per = cfg.depth // n_stages

    def stage_fn(p, a):
        for j in range(per):
            a = ast_block(jax.tree.map(lambda t, j=j: t[j], p), a, cfg.num_heads)
        return a

    @jax.jit
    def fwd(variables: dict, x: jax.Array) -> jax.Array:
        params = variables["params"]
        stacked = ast_stage_stack(params, cfg.depth, n_stages)
        tokens = ast_prologue(params, x, cfg)
        b = tokens.shape[0]
        x_mb = tokens.reshape(n_micro, b // n_micro, *tokens.shape[1:])
        out = pipelined_apply(mesh, stage_fn, stacked, x_mb, PIPE_AXIS)
        return ast_epilogue(params, out.reshape(b, *tokens.shape[1:]))

    return fwd


def pipelined_ast_forward(
    mesh: Mesh,
    variables: dict,
    x: jax.Array,
    cfg: ASTConfig,
    n_micro: int,
) -> jax.Array:
    """[B, F, T, 1] -> [B, D] == ASTEncoder.apply(variables, x, False).

    mesh: 1-D over PIPE_AXIS; cfg.depth must divide evenly into its size.
    n_micro must divide B; amortize the fill/drain bubble with
    n_micro >> n_stages.
    """
    n_stages = mesh.devices.size
    if cfg.depth % n_stages:
        raise ValueError(f"depth {cfg.depth} not divisible by {n_stages} stages")
    if x.shape[0] % n_micro:
        raise ValueError(f"batch {x.shape[0]} not divisible by n_micro {n_micro}")
    return _pipelined_ast_jitted(mesh, cfg, n_micro)(variables, x)
