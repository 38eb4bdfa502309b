"""Graceful preemption: checkpoint-and-exit on SIGTERM, collectively.

Cloud TPU maintenance events and spot reclaims deliver SIGTERM to the
host shortly before the chips are pulled; a production trainer must turn
that into one final (collective!) checkpoint and a clean exit so the run
resumes exactly where it stopped. The reference has no equivalent — its
SLURM scripts (extras/delores-s/*.sh) simply requeue and lose progress
since the last periodic save.

Two pieces, both TPU-pod-aware:

* ``PreemptionGuard`` — installs a SIGTERM handler that only sets a flag
  (async-signal-safe; never checkpoints from inside a handler). The flag
  is process-local: on a pod each host may be signalled at a different
  moment (or only some hosts at all, e.g. a single machine being
  drained), but orbax saves are collective, so the decision to stop must
  be unanimous.
* ``should_stop()`` — cross-host agreement: a tiny all-gather of the
  local flags (``multihost_utils.process_allgather``) ORed together, so
  every process leaves its step loop at the SAME global step and the
  final save has all participants. Single-process: just the flag, no
  collective. Call it at a modest cadence (the train loops use their
  ``log_every`` boundary) — on a pod each call is a host sync, and
  checking every step would serialize the de-synced dispatch loop.

The train loops (train/loop.py, train/decar_loop.py,
train/finetune_mast.py) install a guard around their epoch loops; on a
positive ``should_stop()`` they flush metrics, write the usual
checkpoint at the current step, log, and return normally. Resume is the
ordinary ``--load_checkpoint`` path (exact: queue/bank/aug state live in
the checkpoint — tests/test_e2e.py).
"""
from __future__ import annotations

import logging
import signal
import threading

import numpy as np

log = logging.getLogger("audiossl_tpu.preemption")


class PreemptionGuard:
    """Context manager installing a deferred SIGTERM (by default) handler.

    Usage::

        with PreemptionGuard() as guard:
            for step in ...:
                ...
                if step % check_every == 0 and guard.should_stop():
                    save_checkpoint(...)   # still collective — all hosts agree
                    break

    Previous handlers are restored on exit. Signal handlers can only be
    installed from the main thread; off-main-thread construction (e.g.
    pytest-xdist workers) degrades to a no-op guard that never fires,
    rather than crashing the trainer.
    """

    def __init__(self, signals: tuple[int, ...] = (signal.SIGTERM,)):
        self._flag = False
        self._prev: dict[int, object] = {}
        self._signals = signals
        self._installed = False

    def _handler(self, signum, frame):  # noqa: ARG002 (signal API)
        self._flag = True

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handler)
            self._installed = True
        else:
            log.warning("PreemptionGuard off main thread: signals not hooked")
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._prev.clear()
            self._installed = False

    def requested_locally(self) -> bool:
        """This process's flag only — no collective, safe at any cadence."""
        return self._flag

    def should_stop(self) -> bool:
        """True iff ANY process has been signalled. Collective on pods
        (one small all-gather over the coordination backend); plain flag
        read single-process."""
        import jax

        if jax.process_count() == 1:
            return self._flag
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self._flag], np.int32)
        )
        agreed = bool(np.asarray(flags).any())
        if agreed and not self._flag:
            log.info("preemption signalled on another host; stopping collectively")
        return agreed
