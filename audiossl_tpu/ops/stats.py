"""Normalization blocks as pure functions over carried state.

Reference: RunningNorm / PrecomputedNorm / NormalizeBatch
(src/augmentations/augmentations.py:215-328). RunningNorm keeps an online
mean/variance (scalar stats: the reference averages over axes [1, 2] of a
[1, F, T] input) updated once per *sample* until a cap of
``epoch_samples * max_update_epochs`` samples; afterwards the stats freeze.

State is a small pytree carried through the jitted train step (no host
sync). The per-sample sequential recursion of the reference reduces to a
scan over per-sample scalar moments — numerically equivalent but batched.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1.1920929e-7  # torch.finfo(float32).eps, used as the std clamp floor


class RunningNormState(NamedTuple):
    n: jax.Array  # int32 — number of samples absorbed
    mean: jax.Array  # f32 scalar — running mean of per-sample means
    var: jax.Array  # f32 scalar — running mean of per-sample squared deviations
    max_update: jax.Array  # int32 — sample cap, frozen afterwards


def running_norm_init(epoch_samples: int, max_update_epochs: int = 10) -> RunningNormState:
    return RunningNormState(
        n=jnp.zeros((), jnp.int32),
        mean=jnp.zeros((), jnp.float32),
        var=jnp.ones((), jnp.float32),
        max_update=jnp.asarray(epoch_samples * max_update_epochs, jnp.int32),
    )


def running_norm_apply(state: RunningNormState, x: jax.Array) -> tuple[RunningNormState, jax.Array]:
    """Update stats with batch ``x [B, ...]`` (if below cap) and normalize it.

    Follows the reference recursion (RunningMean.put: mu += (m_k - mu)/n with
    n incremented after), replayed sample-by-sample via lax.scan on scalar
    moments, so single-device results match the sequential CPU version.
    """
    b = x.shape[0]
    red_axes = tuple(range(1, x.ndim))
    m1 = jnp.mean(x, axis=red_axes).astype(jnp.float32)  # per-sample mean [B]
    m2 = jnp.mean(jnp.square(x), axis=red_axes).astype(jnp.float32)  # per-sample E[x^2] [B]

    def body(carry, mom):
        n, mu, var = carry
        sm1, sm2 = mom
        upd = n < state.max_update
        # mean recursion (reference divides by n, not n+1, for n >= 1)
        new_mu = jnp.where(n == 0, sm1, mu + (sm1 - mu) / jnp.maximum(n, 1))
        # variance: running mean of E[(x - mu_now)^2] with the *current* mean
        sq = sm2 - 2.0 * new_mu * sm1 + new_mu * new_mu
        new_var = jnp.where(n == 0, sq, var + (sq - var) / jnp.maximum(n, 1))
        n2 = jnp.where(upd, n + 1, n)
        return (
            n2,
            jnp.where(upd, new_mu, mu),
            jnp.where(upd, new_var, var),
        ), None

    (n, mean, var), _ = jax.lax.scan(body, (state.n, state.mean, state.var), (m1, m2), length=b)
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), EPS)
    return state._replace(n=n, mean=mean, var=var), (x - mean) / std


def precomputed_norm(x: jax.Array, mean: float, std: float) -> jax.Array:
    return (x - mean) / std


def normalize_batch(x: jax.Array, axis=(0, 2, 3)) -> jax.Array:
    """Zero-mean/unit-std over ``axis`` of a batch (NormalizeBatch)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    # torch .std() uses the unbiased (ddof=1) estimator
    cnt = 1
    for a in axis:
        cnt *= x.shape[a]
    var = jnp.sum(jnp.square(x - mean), axis=axis, keepdims=True) / jnp.maximum(cnt - 1, 1)
    std = jnp.maximum(jnp.sqrt(var), EPS)
    return (x - mean) / std


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(p=2) semantics (clamp-denominator)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm
