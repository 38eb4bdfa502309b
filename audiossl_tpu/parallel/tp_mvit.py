"""Tensor-parallel MViT/MAST: GSPMD weight sharding for the flagship encoder.

Extends tensor parallelism from the plain-ViT AST (parallel/tp_ast.py) to
the MViTv2 family (models/mvit.py — the MAST/SS-MAST backbone, whose
reference attention spec lives at
extras/mast_new/mast/models/mvit/models/attention.py:93). Per MultiScale
block:

  * the fused ``qkv`` projection (kernel [D, 3*dim_out]) is column-sharded
    on its output dim; the attention ``proj`` (kernel [dim_out, dim_out])
    is row-sharded on its contraction dim;
  * the MLP is the Megatron column->row pair (Dense_0 on the hidden dim,
    Dense_1 on the contraction -> one all-reduce);
  * pooling convs (depthwise over head_dim channels, SHARED across heads),
    rel-pos tables (also shared across heads), LayerNorms, and the
    dim-change ``proj`` stay replicated — all tiny.

Design note vs the AST specs — why weight sharding, not head sharding:

  1. MViT packs q/k/v into ONE Dense whose columns are laid out
     (3, heads, head_dim)-major (models/mvit.py:215-217), so a contiguous
     column split mixes q/k/v slices across shards. GSPMD keeps numerics
     exact regardless (it re-gathers at the [B,N,3,H,Dh] head reshape, one
     all-gather per block) — the split is a memory/compute layout, not a
     semantic statement.
  2. MViT stages BEGIN at num_heads=1 (MViTConfig: heads double per stage,
     1->2->4->8), so AST-style per-head activation sharding is structurally
     impossible in the early stages for any tp>1. Weight-matrix sharding
     has no such constraint.
  3. MViT pools keys/values aggressively (pool_kv_stride_adaptive), so the
     attention middle (scores/softmax/PV) is a small fraction of block
     FLOPs; the four dense matmuls (qkv, proj, 2x MLP) dominate and all
     four shard cleanly. The attention middle follows the SPMD
     propagator's placement (typically replicated over the model axis).

What tp buys here: params, grads, and optimizer moments of every large
matrix live 1/tp per chip (asserted on addressable shards in
tests/test_tp_mvit.py), and the dominant matmuls compute 1/tp per chip —
the memory lever for MViT-base-and-up beyond what FSDP's per-use
all-gathers offer. Numerics equal the dense encoder to fp tolerance —
forward AND gradients — pinned in tests/test_tp_mvit.py on the exact flax
param tree every MAST checkpoint in this repo stores.

Exposed as a trainer knob: ``pretrain.tp`` on the SS-MAST pretrain loop
(train/loop.py) runs the MoCo step with query AND key (EMA) towers
tp-sharded. Like the FSDP and downstream.tp steps this is a GSPMD plain
``jax.jit`` — the sanctioned exception to the shard_map invariant
(CLAUDE.md): the batch is one logical array, so per-sample means and queue
enqueues are already global.

TPU note: the fused Pallas attention kernel cannot be partitioned by GSPMD
— under tp the encoder must be built with ``fused_attention="off"`` (the
MViT "auto" gate already falls back to XLA attention for MAST's pooled
grids; the loop forces "off" for safety). Cost measured in PERF.md.
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
    """Spec for one leaf inside a block{i} subtree (module docstring)."""
    if "attn" in path:
        if path[-2] == "qkv":
            out3 = shape[-1] if path[-1] == "kernel" else shape[0]
            if (out3 // 3) % n:
                raise ValueError(
                    f"tensor parallelism needs the attention dim_out divisible "
                    f"by the model axis: {out3 // 3} vs tp={n} (at {'/'.join(path)})"
                )
            return P(None, axis) if path[-1] == "kernel" else P(axis)
        if path[-2] == "proj":  # attention output: row-parallel
            return P(axis, None) if path[-1] == "kernel" else P()
        # pool_q/pool_k/pool_v convs+LN (shared across heads), rel_pos tables
        return P()
    if "mlp" in path:
        if path[-2] == "Dense_0":  # column-parallel up-projection
            hidden = shape[-1] if path[-1] == "kernel" else shape[0]
            if hidden % n:
                raise ValueError(
                    f"tensor parallelism needs the MLP hidden dim divisible by "
                    f"the model axis: {hidden} vs tp={n} (at {'/'.join(path)})"
                )
            return P(None, axis) if path[-1] == "kernel" else P(axis)
        if path[-2] == "Dense_1":  # row-parallel down-projection
            return P(axis, None) if path[-1] == "kernel" else P()
    # norms, the block-level dim-change proj (3 per model), anything else
    return P()


def _path_names(keypath) -> tuple[str, ...]:
    out = []
    for k in keypath:
        if hasattr(k, "key"):  # DictKey
            out.append(str(k.key))
        elif hasattr(k, "name"):  # GetAttrKey (NamedTuple fields)
            out.append(str(k.name))
        else:  # SequenceKey etc.
            out.append(str(getattr(k, "idx", k)))
    return tuple(out)


def mvit_tp_specs(tree: Any, n_model: int, model_axis: str = MODEL_AXIS) -> Any:
    """Param-shaped pytree -> matching pytree of PartitionSpecs.

    Keys purely on path names, so it applies equally to an MViT/MASTWithHead
    ``variables["params"]`` subtree, the EMA key tower inside a MoCo state,
    or Adam moments mirroring the param structure — any leaf under a
    ``block{i}`` component gets the Megatron spec, everything else stays
    replicated. Raises when a sharded dim does not divide ``n_model``.
    """

    def spec(keypath, leaf) -> P:
        path = _path_names(keypath)
        if not any(p.startswith("block") for p in path):
            return P()  # patch_embed / head / norms / queue / scalars
        return _block_spec(path, leaf.shape, n_model, model_axis)

    return jax.tree_util.tree_map_with_path(spec, tree)


def mvit_tp_shardings(tree: Any, mesh: Mesh, model_axis: str = MODEL_AXIS) -> Any:
    """NamedShardings for `mvit_tp_specs` on ``mesh`` (replicated over every
    other mesh axis, e.g. the data axis of a dp x tp mesh)."""
    n = mesh.shape[model_axis]
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), mvit_tp_specs(tree, n, model_axis)
    )


def shard_mvit_params(tree: Any, mesh: Mesh, model_axis: str = MODEL_AXIS) -> Any:
    """Place an (addressable) param tree into its tp layout."""
    return jax.device_put(tree, mvit_tp_shardings(tree, mesh, model_axis))
