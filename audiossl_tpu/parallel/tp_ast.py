"""Tensor-parallel AST: Megatron-style sharding of the real encoder.

Promotes the column/row primitives of parallel/tp.py from the toy MLP to
`models/ast.py:ASTEncoder` (the flagship plain-ViT transformer whose
attention spec the reference vendors at
extras/mast_new/mast/models/mvit/models/attention.py:93): per ViT block,

  * attention q/k/v projections are **head-sharded** (column-parallel:
    kernels [D, H, Dh] split on H, so each model shard computes its own
    heads end-to-end — scores, softmax, and the value contraction never
    cross shards);
  * the attention output projection is **row-parallel** (kernel [H, Dh, D]
    split on the H contraction dim → one all-reduce rejoins the residual
    stream);
  * the MLP is the column→row pair (Dense_0 kernel [D, 4D] split on the
    hidden dim, Dense_1 [4D, D] on the contraction → one all-reduce);
  * patchify / cls / dist / pos-embed / LayerNorms stay replicated (tiny).

Mechanism is GSPMD, not a model rewrite: `ast_tp_specs` maps the encoder's
*existing* flax param tree — the exact checkpoint format every AST
checkpoint in this repo uses — to PartitionSpecs over a ('data', 'model')
mesh, and a plain `jax.jit` with those in_shardings lets the XLA SPMD
partitioner propagate head-sharded activations and insert the two
all-reduces per block (the scaling-book recipe, like parallel/fsdp.py).
Numerics therefore equal the dense encoder to fp tolerance — forward AND
gradients — which tests/test_tp_ast.py pins on the real ASTEncoder
checkpoint format at dp×tp mesh shapes.

Exposed as a trainer knob: `downstream.tp` in `downstream/probe.py` runs
the AST linear-probe/fine-tune step with the encoder tp-sharded (weights
1/M per chip on the model axis, batch on the data axis).

Note for TPU runs: the fused Pallas attention kernel cannot be partitioned
by GSPMD — build the encoder with `fused_attention="off"` under tp (the
probe knob does this); XLA's own attention fusion applies per shard.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiossl_tpu.parallel.tp import MODEL_AXIS

DATA_AXIS = "data"


def make_dp_tp_mesh(data: int, model: int) -> Mesh:
    """('data', 'model') mesh over the first data*model visible devices."""
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def _block_spec(path: tuple[str, ...], shape: tuple[int, ...], n: int, axis: str) -> P:
    """Megatron spec for one leaf inside a block{i} subtree (module docstring)."""
    # AST's flax attention only: MViT's MultiScaleAttention (fused qkv,
    # pooled q/kv convs, rel-pos tables) has its own spec module —
    # parallel/tp_mvit.py — with a different (weight-sharded) layout.
    if "MultiHeadDotProductAttention_0" in path:
        proj = path[-2]
        if proj in ("query", "key", "value"):
            heads = shape[1] if path[-1] == "kernel" else shape[0]
            if heads % n:
                raise ValueError(
                    f"tensor parallelism needs num_heads divisible by the model "
                    f"axis: {heads} heads vs tp={n} (at {'/'.join(path)})"
                )
            return P(None, axis, None) if path[-1] == "kernel" else P(axis, None)
        if proj == "out":
            return P(axis, None, None) if path[-1] == "kernel" else P()
    if path[-2] == "Dense_0":  # MLP up-projection: column-parallel
        hidden = shape[-1]
        if hidden % n:
            raise ValueError(
                f"tensor parallelism needs the MLP hidden dim divisible by the "
                f"model axis: {hidden} vs tp={n} (at {'/'.join(path)})"
            )
        return P(None, axis) if path[-1] == "kernel" else P(axis)
    if path[-2] == "Dense_1":  # MLP down-projection: row-parallel
        return P(axis, None) if path[-1] == "kernel" else P()
    return P()  # LayerNorms and anything unrecognized stay replicated


def ast_tp_specs(params: Any, n_model: int, model_axis: str = MODEL_AXIS) -> Any:
    """ASTEncoder flax param tree -> matching pytree of PartitionSpecs.

    ``params`` is the encoder's `variables["params"]` subtree (the format
    `train/checkpoint.py:save_encoder_only` writes). Raises when the head
    count or MLP hidden dim does not divide ``n_model``.
    """

    def spec(keypath, leaf) -> P:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in keypath
        )
        if not any(p.startswith("block") for p in path):
            return P()  # patchify / tokens / pos / final norm
        return _block_spec(path, leaf.shape, n_model, model_axis)

    return jax.tree_util.tree_map_with_path(spec, params)


def ast_tp_shardings(params: Any, mesh: Mesh, model_axis: str = MODEL_AXIS) -> Any:
    """NamedShardings for `ast_tp_specs` on ``mesh`` (replicated over every
    other mesh axis, e.g. the data axis of a dp×tp mesh)."""
    n = mesh.shape[model_axis]
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), ast_tp_specs(params, n, model_axis)
    )


def shard_ast_params(params: Any, mesh: Mesh, model_axis: str = MODEL_AXIS) -> Any:
    """Place an (addressable) encoder param tree into its tp layout."""
    return jax.device_put(params, ast_tp_shardings(params, mesh, model_axis))
