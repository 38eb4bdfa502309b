"""Gradient accumulation: trade steps for per-chip activation memory.

The reference trains its heavyweight family at batch 256-1024 on
A100-80GB (extras/delores-m/1024_pretrain.sh:5-24,
extras/mast_new configs); a v5e chip has 16 GB of HBM, so large-batch
MViT/AST training needs the standard TPU lever instead: split the
per-chip batch into A microbatches, run fwd+bwd per microbatch under
`lax.scan` (activations for one microbatch live at a time), average the
gradients, and apply ONE optimizer update.

Where this is *exact* (microbatched grads == full-batch grads up to fp
summation order):

* per-sample-decomposable mean losses — supervised BCE/CE (the MAST
  fine-tuner), MoCo-style InfoNCE whose negatives come from the *queue*
  rather than the batch — through LayerNorm models (MViT/AST).

Where it is NOT exact, and therefore not offered:

* batch-coupled losses — Barlow cross-correlation (DeLoRes-S/M taps,
  c = z1ᵀz2/B couples every sample), SLICER's cluster loss over the
  batch assignment matrix, BatchNorm batch statistics (AudioNTT): a
  microbatch estimate of those statistics changes the objective, which
  is exactly the shuffle-BN class of bug the reference fights. Those
  trainers are lightweight (AudioNTT fits B=1024 easily), so the lever
  is not needed there.

Augmentation draws (mixup partners, SpecMask) happen per microbatch:
same distribution as the reference's per-dataloader-batch draws, but
mixup partners are drawn within the microbatch — disable the augs for
bitwise parity checks.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def microbatched_value_and_grad(
    loss_fn: Callable[..., jax.Array],
    accum: int,
) -> Callable[..., tuple[jax.Array, Any]]:
    """value_and_grad over A sequential microbatches, averaged.

    ``loss_fn(params, batch, key) -> scalar`` must be a mean-reduced,
    per-sample-decomposable loss. ``batch`` is a pytree whose leaves all
    carry the per-chip batch as leading dim (divisible by ``accum``);
    ``key`` is one PRNG key — each microbatch gets ``fold_in(key, i)``.

    Returns ``fn(params, batch, key) -> (loss, grads)`` where loss/grads
    are the microbatch averages. With ``accum == 1`` this is exactly
    ``jax.value_and_grad(loss_fn)`` (no scan in the compiled program).
    Gradients accumulate in f32 regardless of param dtype so A-long sums
    don't lose mantissa.
    """
    if accum < 1:
        raise ValueError(f"grad_accum_steps must be >= 1, got {accum}")
    vg = jax.value_and_grad(loss_fn)
    if accum == 1:
        return vg

    def fn(params, batch, key):
        def split(leaf):
            b = leaf.shape[0]
            if b % accum:
                raise ValueError(
                    f"per-chip batch {b} not divisible by grad_accum_steps {accum}"
                )
            return leaf.reshape(accum, b // accum, *leaf.shape[1:])

        micro = jax.tree.map(split, batch)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(accum))

        def body(acc, xs):
            mb, k = xs
            loss, grads = vg(params, mb, k)
            acc_loss, acc_grads = acc
            acc_grads = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) / accum, acc_grads, grads
            )
            return (acc_loss + loss / accum, acc_grads), None

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (loss, grads), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), zeros), (micro, keys))
        grads = jax.tree.map(lambda g, p: g.astype(p.dtype), grads, params)
        return loss, grads

    return fn
