"""Orbax checkpointing: full TrainState + encoder-only export for downstream.

Replaces the reference's three mechanisms (SURVEY.md §5 checkpoint/resume):
Lightning ModelCheckpoint(train_loss, save_top_k=1), manual per-epoch
torch.save, and algorithm-state persistence (the MoCo queue / memory bank —
our ssl_state rides inside TrainState, so resume is exact including queue
pointer and augmentation ring buffer).

Layout: <dir>/state/<step>/ (orbax tree) + <dir>/encoder/<step>/ (encoder
variables only — the `encoder_q.state_dict()` handoff of utils.py:199-207)
+ <dir>/config.yaml.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp
import yaml


def _path(d: str) -> str:
    return os.path.abspath(os.path.expanduser(d))


# async writers: the device->host copy is the only blocking part of a save;
# serialization + fsync happen on a background thread so the train loop keeps
# dispatching (a sync orbax save of an MViT-base state stalls it for seconds).
# One checkpointer per artifact kind so state and encoder writes overlap; a
# save() on the same checkpointer waits for its previous write first, which
# bounds the queue at one outstanding save per kind.
_ASYNC: dict[str, ocp.AsyncCheckpointer] = {}


def _async_ckptr(kind: str) -> ocp.AsyncCheckpointer:
    c = _ASYNC.get(kind)
    if c is None:
        # barrier_sync_key_prefix: on pods the commit barrier key is
        # otherwise 'async_write_complete' + the directory *basename* — the
        # step number, identical for the concurrently-saving state/<step> and
        # encoder/<step> writers. Without the per-kind prefix, host A's state
        # barrier can be satisfied by host B's encoder thread, and the
        # primary finalizes state/<step> before the other hosts' array
        # metadata lands (ArrayMetadata validate_all_array_metadatas race).
        c = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                barrier_sync_key_prefix=kind
            ),
        )
        _ASYNC[kind] = c
    return c


def wait_until_finished() -> None:
    """Block until all in-flight checkpoint writes have been committed.
    Call before restoring, benchmarking, or returning from a trainer."""
    for c in _ASYNC.values():
        c.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str, step: int, state: Any, encoder_vars: Any, config: dict | None = None,
    block: bool = False, keep_last: int | None = None,
) -> None:
    ckpt_dir = _path(ckpt_dir)
    _async_ckptr("state").save(
        os.path.join(ckpt_dir, "state", str(step)), args=ocp.args.StandardSave(state), force=True
    )
    _async_ckptr("encoder").save(
        os.path.join(ckpt_dir, "encoder", str(step)),
        args=ocp.args.StandardSave(encoder_vars), force=True,
    )
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f)
    if block:
        wait_until_finished()
    if keep_last:
        # after wait_until_finished the just-written step is committed, so
        # blocking saves bound history exactly at keep_last; async saves
        # prune the previous window (the in-flight step is still tmp-named)
        # and catch up at the next save — at most keep_last+1 on disk
        prune_checkpoints(ckpt_dir, keep_last)


def prune_checkpoints(ckpt_dir: str, keep_last: int, kinds: tuple[str, ...] = ("state", "encoder")) -> None:
    """Retention: delete all but the newest ``keep_last`` committed step
    dirs per kind. Production runs saving every 500 steps for days would
    otherwise accumulate unbounded disk (full state is O(model+optimizer+
    queue/bank)). Retention is by recency — a best-loss save older than
    the window is pruned like any other, matching the reference's
    save_top_k=1 spirit of not keeping history.

    Safe with async saves: orbax writes into a tmp-suffixed dir and
    atomically renames on commit, so a plain numeric dir is always a
    committed checkpoint, and the newest one is never in the prune set
    (save() on one checkpointer also serializes with its previous write).
    Pod: process 0 prunes (the save itself is collective; the filesystem
    delete is not)."""
    import shutil

    if jax.process_index() != 0:
        return
    for kind in kinds:
        base = os.path.join(_path(ckpt_dir), kind)
        if not os.path.isdir(base):
            continue
        steps = sorted(int(d) for d in os.listdir(base) if d.isdigit())
        for s in steps[: -max(1, int(keep_last))]:
            shutil.rmtree(os.path.join(base, str(s)), ignore_errors=True)


def save_encoder_only(ckpt_dir: str, step: int, encoder_vars: Any, block: bool = True) -> None:
    """Write just an encoder-kind checkpoint (no trainer state) — used by
    torch-checkpoint import (models/torch_import.py) so converted reference
    weights enter the same downstream/probe path as our own exports."""
    _async_ckptr("encoder").save(
        os.path.join(_path(ckpt_dir), "encoder", str(step)),
        args=ocp.args.StandardSave(encoder_vars), force=True,
    )
    if block:
        wait_until_finished()


def latest_step(ckpt_dir: str, kind: str = "state") -> int | None:
    d = os.path.join(_path(ckpt_dir), kind)
    if not os.path.isdir(d):
        return None
    steps = [int(s) for s in os.listdir(d) if s.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: int | None = None, kind: str = "state") -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete pytree)."""
    wait_until_finished()  # a just-written step may still be committing
    ckpt_dir = _path(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir, kind)
        if step is None:
            raise FileNotFoundError(f"no {kind} checkpoints under {ckpt_dir}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(ckpt_dir, kind, str(step)), abstract)


def load_encoder(ckpt_dir: str, target_vars: Any, step: int | None = None) -> Any:
    """Load exported encoder variables (downstream transfer)."""
    return restore_checkpoint(ckpt_dir, target_vars, step, kind="encoder")


def load_raw(ckpt_dir: str, step: int, kind: str = "encoder") -> Any:
    """Restore a checkpoint as saved, without a target structure — for
    cross-shape transplants (models/surgery.py) where the stored pos-embed /
    rel-pos shapes intentionally differ from the target model's."""
    wait_until_finished()
    path = os.path.join(_path(ckpt_dir), kind, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        try:
            return ckptr.restore(path)
        except ValueError as e:
            # Saved on a different device set than this process has (e.g. an
            # 8-device pod checkpoint opened by a 1-chip export/serving job):
            # orbax refuses to reuse the recorded shardings, so rebuild the
            # tree from stored metadata and restore fully local. Only the
            # device/sharding-mismatch ValueError gets this fallback —
            # anything else (corrupt file, dtype mismatch) must propagate
            # rather than be masked by a second confusing failure.
            msg = str(e).lower()
            if not any(k in msg for k in ("device", "sharding", "mesh")):
                raise
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            meta = ckptr.metadata(path)
            tree = getattr(meta, "item_metadata", meta)
            abstract = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
                tree,
                is_leaf=lambda m: hasattr(m, "shape"),
            )
            return ckptr.restore(path, abstract)


def filter_variables(variables: Any, keep_prefixes: tuple[str, ...]) -> Any:
    """Prefix-filtered weight surgery (NetworkCommonMixIn.load_weight,
    src/encoder/audiontt.py:12-30): keep only subtrees whose top-level key
    matches one of ``keep_prefixes`` (e.g. ('features', 'fc'))."""

    def f(tree):
        if isinstance(tree, dict):
            return {k: v for k, v in tree.items() if any(k.startswith(p) for p in keep_prefixes) or isinstance(v, dict)}
        return tree

    out = {}
    for k, v in variables.items():
        if any(k.startswith(p) for p in keep_prefixes):
            out[k] = v
        elif isinstance(v, dict):
            sub = filter_variables(v, keep_prefixes)
            if sub:
                out[k] = sub
    return out


def merge_variables(target: Any, source: Any) -> Any:
    """Non-strict load: overwrite matching leaves of ``target`` with
    ``source`` where paths and shapes agree (load_state_dict(strict=False))."""
    if not isinstance(target, dict) or not isinstance(source, dict):
        if hasattr(target, "shape") and hasattr(source, "shape") and target.shape == source.shape:
            return source
        return target
    out = dict(target)
    for k, v in source.items():
        if k in out:
            out[k] = merge_variables(out[k], v)
    return out
