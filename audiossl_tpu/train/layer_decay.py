"""Layer-wise LR decay + no-weight-decay param groups for MViT/AdamW.

Rebuilds the reference's transformer optimizer policy
(extras/mast_new/mast/mvit/models/optimizer.py:12-231): per-block learning
-rate decay (lr * decay^(n_layers - layer)), and zero weight decay for
biases, norm scales, and the positional/relative-position/cls parameters
(MViT.no_weight_decay, mvit_model.py:243-250).
"""
from __future__ import annotations

import re
from typing import Any

import jax
import optax

_NO_DECAY_TOKENS = ("pos_embed", "rel_pos_h", "rel_pos_w", "cls_token", "bias", "scale")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _block_index(path_str: str, depth: int) -> int:
    m = re.search(r"block(\d+)", path_str)
    if m:
        return int(m.group(1)) + 1
    if "patch_embed" in path_str or "pos_embed" in path_str:
        return 0
    return depth + 1  # head / norm


def layer_decay_mask(params: Any, depth: int, decay: float) -> Any:
    """Pytree of per-leaf LR multipliers decay^(depth + 1 - block)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: decay ** (depth + 1 - _block_index(_path_str(path), depth)), params
    )


def weight_decay_mask(params: Any) -> Any:
    """True where weight decay applies (2D+ kernels outside no-decay list)."""

    def f(path, leaf):
        s = _path_str(path).lower()
        if any(tok in s for tok in _NO_DECAY_TOKENS):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(f, params)


def adamw_layer_decay(
    lr,
    params: Any,
    depth: int,
    layer_decay: float = 1.0,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    clip_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """AdamW with masked weight decay, per-layer LR scaling, and the
    reference's CLIP_GRAD_L2NORM (configs/MVITv2_B.yaml SOLVER block)."""
    scales = layer_decay_mask(params, depth, layer_decay)

    def scale_by_layer() -> optax.GradientTransformation:
        def init(_):
            return ()

        def update(updates, state, params=None):
            return jax.tree.map(lambda u, s: u * s, updates, scales), state

        return optax.GradientTransformation(init, update)

    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain += [
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask(params)),
        scale_by_layer(),
        optax.scale_by_learning_rate(lr),
    ]
    return optax.chain(*chain)
