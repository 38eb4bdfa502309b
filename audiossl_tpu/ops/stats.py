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

    # The reference recursion is a pair of linear recurrences
    #   mu_k = a_k * mu_{k-1} + b_k  (a_k = 1 - 1/max(k,1), b_k = m_k / max(k,1))
    # evaluated sample-by-sample; an associative scan computes it in log depth
    # instead of a B-step sequential lax.scan (latency-bound on TPU).
    k0 = state.n
    ks = k0 + jnp.arange(b, dtype=jnp.int32)  # recursion index per sample
    upd = ks < state.max_update
    denom = jnp.maximum(ks, 1).astype(jnp.float32)
    # coefficients; frozen samples (past the cap) become identity steps
    a_mu = jnp.where(upd, jnp.where(ks == 0, 0.0, 1.0 - 1.0 / denom), 1.0)
    b_mu = jnp.where(upd, jnp.where(ks == 0, m1, m1 / denom), 0.0)

    def compose(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 * a1, a2 * b1 + b2

    A_mu, B_mu = jax.lax.associative_scan(compose, (a_mu, b_mu))
    mus = A_mu * state.mean + B_mu  # mu AFTER absorbing each sample [B]

    # variance recursion uses the *current* mean at each step:
    #   sq_k = m2_k - 2 mu_k m1_k + mu_k^2 ; var_k = a_k var_{k-1} + sq_k-term
    sq = m2 - 2.0 * mus * m1 + mus * mus
    a_v = jnp.where(upd, jnp.where(ks == 0, 0.0, 1.0 - 1.0 / denom), 1.0)
    b_v = jnp.where(upd, jnp.where(ks == 0, sq, sq / denom), 0.0)
    A_v, B_v = jax.lax.associative_scan(compose, (a_v, b_v))
    vars_ = A_v * state.var + B_v

    n = jnp.minimum(k0 + jnp.sum(upd.astype(jnp.int32)), state.max_update)
    n = jnp.maximum(n, k0)  # max_update may be below k0 already
    mean, var = mus[-1], vars_[-1]
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
    """torch F.normalize(p=2) semantics, gradient-safe.

    Uses x * rsqrt(|x|^2 + eps^2) instead of x / max(|x|, eps): values agree
    with torch to O(eps^2/|x|^2), but the VJP stays bounded at |x| -> 0
    (the clamped form emits 1/eps-scale gradients that overflow f32 when a
    projector row collapses to zero — observed in UnFuSeD distillation).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)
