"""Profiling + failure-detection helpers.

Covers the reference's observability surface (SURVEY.md §5): wall-clock
meters exist in utils.metrics; this adds jax.profiler trace capture
(replacing CUDA-event gpu_timer, extras/mast_new/mast/utils.py:60-75),
FLOP/param counting (fvcore equivalents, mvit/utils/misc.py:48-166), and
the NaN-loss crash guard (check_nan_losses, mvit/utils/misc.py:21-28).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/audiossl_trace"):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(name: str = "block", sync_value=None):
    """Wall-clock a device region; pass an array to sync on at exit."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        out["seconds"] = time.perf_counter() - t0


def check_nan_loss(loss: float, step: int | None = None) -> None:
    """Crash fast on NaN/Inf loss (check_nan_losses equivalent)."""
    if not np.isfinite(loss):
        raise FloatingPointError(f"loss became {loss} at step {step}; stopping training")


def params_count(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def flops_estimate(fn, *args) -> float | None:
    """Static FLOP estimate from the lowered XLA cost analysis."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None
