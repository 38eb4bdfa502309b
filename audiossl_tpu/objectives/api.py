"""Objective API: each SSL method is a pure (params, state, views) -> loss fn.

The reference hides this shape inside six Lightning modules
(src/upstream/*/upstream_expert.py); here it is explicit so one jitted
data-parallel train step drives every method (SURVEY.md §7 design stance:
"one engine, many objectives").

An Objective owns:
  * trainable params + BN stats (flax collections) for its encoder/heads,
  * ssl_state — mutable non-gradient state (MoCo queue+ptr, momentum params,
    cluster memory bank/centroids), carried functionally through the step,
  * loss(params, batch_stats, ssl_state, views, key, train, axis_name)
    -> (loss, LossAux).

``axis_name`` is the data-mesh axis for explicit collectives (psum of the
Barlow cross-correlation, all_gather of MoCo keys) — the TPU replacement for
the reference's torch.distributed calls (SURVEY.md §2.3).

A registry replaces the reference's importlib-by-string plugin contract
(train_upstream.py:36-41).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Protocol

import jax


class LossAux(NamedTuple):
    batch_stats: Any  # updated BN stats
    ssl_state: Any  # updated objective state
    metrics: dict[str, jax.Array]


class Objective(Protocol):
    def init(self, key: jax.Array, sample_views: tuple[jax.Array, ...]):
        """-> (params, batch_stats, ssl_state)"""

    def loss(self, params, batch_stats, ssl_state, views, key, train: bool, axis_name: str | None):
        """-> (loss, LossAux)"""

    def encoder_variables(self, params, batch_stats) -> dict:
        """Encoder-only variables for downstream transfer (the reference's
        'take encoder_q.state_dict' handoff, src/utils/utils.py:199-207)."""


_REGISTRY: dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def get_objective(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown upstream objective {name!r}; available: {sorted(_REGISTRY)}")


def available() -> list[str]:
    return sorted(_REGISTRY)
