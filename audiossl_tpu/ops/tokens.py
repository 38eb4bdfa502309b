"""Token-level ops: PatchDrop (corrected) for transformer inputs.

The reference PatchDrop (src/augmentations/augmentations.py:64-79) intends
to keep a random `1 - ratio` fraction of patch tokens but references an
undefined variable (§2.5 defect). This is the build-to-intent version: the
keep-count is static (ratio is a config constant), so shapes stay jit-friendly.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def patch_drop(x: jax.Array, key: jax.Array, ratio: float) -> jax.Array:
    """[B, N, C] -> [B, N_keep, C]: keep floor(N * (1 - ratio)) random tokens
    per sample (independent permutations, order arbitrary like randperm)."""
    b, n, _ = x.shape
    n_keep = int(math.floor(n * (1.0 - ratio)))
    if n_keep >= n:
        return x

    def one(xi, ki):
        perm = jax.random.permutation(ki, n)[:n_keep]
        return xi[perm]

    return jax.vmap(one)(x, jax.random.split(key, b))
