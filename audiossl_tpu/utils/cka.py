"""CKA representation-similarity analysis (reference: extras/CKA.py:1-51).

Linear and RBF-kernel Centered Kernel Alignment between two representation
matrices [N, D1], [N, D2], implemented in JAX (batched on-device; the
reference runs NumPy on host).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _centering(k: jax.Array) -> jax.Array:
    n = k.shape[0]
    unit = jnp.ones((n, n), k.dtype)
    i = jnp.eye(n, dtype=k.dtype)
    h = i - unit / n
    return h @ k @ h


def linear_hsic(x: jax.Array, y: jax.Array) -> jax.Array:
    lx = x @ x.T
    ly = y @ y.T
    return jnp.sum(_centering(lx) * _centering(ly))


def linear_cka(x: jax.Array, y: jax.Array) -> jax.Array:
    hsic = linear_hsic(x, y)
    var1 = jnp.sqrt(linear_hsic(x, x))
    var2 = jnp.sqrt(linear_hsic(y, y))
    return hsic / (var1 * var2)


def _rbf(x: jax.Array, sigma: float | None = None) -> jax.Array:
    gx = x @ x.T
    d = jnp.diag(gx)
    # squared pairwise distances: d_i + d_j - 2 g_ij (reference extras/CKA.py:15-18)
    kx = d[:, None] + d[None, :] - 2.0 * gx
    if sigma is None:
        off = kx[jnp.triu_indices(kx.shape[0], k=1)]
        mdist = jnp.median(off) if off.size else 1.0
        sigma = jnp.sqrt(jnp.maximum(mdist, 1e-12))
    return jnp.exp(-kx / (2.0 * sigma**2))


def kernel_hsic(x: jax.Array, y: jax.Array, sigma: float | None = None) -> jax.Array:
    return jnp.sum(_centering(_rbf(x, sigma)) * _centering(_rbf(y, sigma)))


def kernel_cka(x: jax.Array, y: jax.Array, sigma: float | None = None) -> jax.Array:
    hsic = kernel_hsic(x, y, sigma)
    var1 = jnp.sqrt(kernel_hsic(x, x, sigma))
    var2 = jnp.sqrt(kernel_hsic(y, y, sigma))
    return hsic / (var1 * var2)
