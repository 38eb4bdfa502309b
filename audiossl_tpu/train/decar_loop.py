"""DECAR-v2 trainer: per-epoch on-mesh k-means + per-step prototype CE.

Mirrors extras/decar-v2/main.py's structure (SURVEY.md §3.3): init the
embedding memory bank with a full forward pass, then each epoch (1) run the
jitted distributed k-means and copy centroids into the prototype weights,
(2) iterate CE steps against the epoch's assignments while refreshing the
memory bank in place. LARC-wrapped SGD with the warmup+cosine schedule
(main.py:93-122). Memory persists inside the checkpointed state (the
mb{rank}.pth equivalent).
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu import config as cfgmod
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.objectives.decar import (
    DecarMemory,
    DecarV2,
    decar_ce,
    init_memory_state,
    kmeans_on_mesh,
    memory_update,
)
from audiossl_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from audiossl_tpu.train import checkpoint as ckptmod
from audiossl_tpu.train.optim import larc, warmup_cosine
from audiossl_tpu.train.step import prepare_views

log = logging.getLogger("audiossl_tpu.decar")


class DecarTrainState(NamedTuple):
    step: jax.Array
    epoch_step: jax.Array  # step within the current epoch (memory slot base)
    params: Any
    opt_state: Any
    batch_stats: Any
    assignments: Any  # tuple of [N] arrays, one per prototype head (replicated)
    memory: DecarMemory  # sharded over 'data'
    aug_state: Any  # sharded over 'data'
    rng: jax.Array


def train_decar(
    config: dict[str, Any],
    input_csv: str,
    load_checkpoint: str | None = None,
    max_steps: int | None = None,
    max_epochs: int | None = None,
    seed: int = 31,
):
    run, pre = config["run"], config["pretrain"]
    mesh = make_mesh(int(run.get("world_size", 0)) or None)
    n_dev = mesh.devices.size
    batch = int(run["batch_size"])
    batch = n_dev * max(1, batch // n_dev)
    b_local = batch // n_dev

    obj = DecarV2(config)
    clip = cfgmod.clip_samples(config)
    mel_cfg = LogMelConfig(
        sample_rate=int(pre["input"]["sampling_rate"]), n_mels=int(pre["input"]["n_mels"])
    )
    loader = ManifestLoader(
        input_csv, batch, clip, mel_cfg.sample_rate,
        num_workers=int(run.get("num_dataloader_workers", 8)), seed=seed,
        on_error=str(run.get("data_on_error", "raise")),
    )
    # attach dataset indices as the "labels" stream
    loader.labels = np.arange(loader.num_samples, dtype=np.int32)
    n_total = loader.num_samples
    steps_per_epoch = max(len(loader), 1)
    per_shard = steps_per_epoch * b_local

    pipeline = AugmentPipeline(AugmentConfig.from_dict(pre), epoch_samples=n_total)
    n_frames = mel_cfg.num_frames(clip)

    epochs = max_epochs if max_epochs is not None else int(run.get("epochs", 1))
    base_lr = float(run.get("learning_rate", 4.8))
    final_lr = float(run.get("final_lr", 0.0))
    sched = warmup_cosine(base_lr, epochs * steps_per_epoch, 10 * steps_per_epoch, end_lr_factor=final_lr / max(base_lr, 1e-9))
    tx = larc(sched, momentum=0.9, weight_decay=1e-6, trust_coefficient=0.001, clip=False)

    # ---- init state
    dummy = jnp.zeros((b_local, mel_cfg.n_mels, n_frames, 1), jnp.float32)
    # jitted init: eager flax init is one tunnel round trip per op
    params, batch_stats, _ = jax.jit(obj.init)(jax.random.key(seed), (dummy, dummy))
    aug_local = pipeline.init_state(mel_cfg.n_mels, n_frames)
    state = DecarTrainState(
        step=jnp.zeros((), jnp.int32),
        epoch_step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        assignments=tuple(
            jnp.full((n_total,), -100, jnp.int32) for _ in obj.nmb_prototypes
        ),
        memory=init_memory_state(n_dev, per_shard, obj.feat_dim),
        aug_state=jax.tree.map(lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), aug_local),
        rng=jax.random.key(seed + 1),
    )
    repl, shrd = NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS))
    state = jax.tree.map(
        lambda a: jax.device_put(a, repl), state._replace(memory=None, aug_state=None)
    )._replace(
        memory=jax.tree.map(lambda a: jax.device_put(a, shrd), DecarMemory(
            emb=jnp.zeros((n_dev, per_shard, obj.feat_dim), jnp.float32),
            index=-jnp.ones((n_dev, per_shard), jnp.int32),
        )),
        aug_state=jax.tree.map(lambda a: jax.device_put(a, shrd),
                               jax.tree.map(lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), aug_local)),
    )
    if load_checkpoint:
        state = ckptmod.restore_checkpoint(load_checkpoint, state)

    axis = DATA_AXIS
    norm = pre.get("normalization", "mean_var")

    # ---- jitted epoch-boundary clustering
    def cluster_fn(params, memory: DecarMemory, key):
        mem_emb, mem_idx = memory.emb[0], memory.index[0]
        cents, assigns = [], []
        for i, k in enumerate(obj.nmb_prototypes):
            c, a = kmeans_on_mesh(
                mem_emb, mem_idx, n_total, k, jax.random.fold_in(key, i), obj.kmeans_iters, axis
            )
            cents.append(c)
            assigns.append(a)
        return obj.set_prototypes(params, cents), tuple(assigns)

    cluster_fn = jax.jit(
        shard_map(
            cluster_fn, mesh=mesh,
            in_specs=(P(), P(axis), P()), out_specs=(P(), P()), check_vma=False,
        )
    )

    # ---- jitted train step
    def step_fn(state: DecarTrainState, waves, idxs):
        key = jax.random.fold_in(state.rng, state.step)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_aug, k_net = jax.random.split(key)
        aug_local_state = jax.tree.map(lambda a: a[0], state.aug_state)
        aug_local_state, v1, v2 = prepare_views(pipeline, mel_cfg, norm, aug_local_state, waves, k_aug)

        def loss_fn(params):
            (emb, scores1), mut = obj.apply_net(params, state.batch_stats, v1, k_net, True)
            (_, scores2), mut = obj.net.apply(
                {"params": params, "batch_stats": mut["batch_stats"]}, v2, True,
                rngs={"dropout": k_net}, mutable=["batch_stats"],
            )
            # scores from view 2, embeddings (for the bank) from view 1
            # (models_delores.py:101-122 forward contract)
            loss = 0.0
            for h in range(len(obj.nmb_prototypes)):
                targets = state.assignments[h][idxs]
                loss = loss + decar_ce(scores2[h], targets, obj.temperature)
            loss = loss / len(obj.nmb_prototypes)
            return loss, (emb, mut["batch_stats"])

        (loss, (emb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, axis)
        grads = obj.freeze_prototype_grads(grads, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        mem_emb, mem_idx = memory_update(
            state.memory.emb[0], state.memory.index[0], emb, idxs, state.epoch_step
        )
        new_state = state._replace(
            step=state.step + 1,
            epoch_step=state.epoch_step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_bs,
            memory=DecarMemory(emb=mem_emb[None], index=mem_idx[None]),
            aug_state=jax.tree.map(lambda a: a[None], aug_local_state),
        )
        return new_state, jax.lax.pmean(loss, axis)

    state_specs = DecarTrainState(
        step=P(), epoch_step=P(), params=P(), opt_state=P(), batch_stats=P(),
        assignments=P(), memory=P(axis), aug_state=P(axis), rng=P(),
    )
    step_fn = jax.jit(
        shard_map(step_fn, mesh=mesh, in_specs=(state_specs, P(axis), P(axis)),
                  out_specs=(state_specs, P()), check_vma=False),
        donate_argnums=(0,),  # in-place state update (incl. the memory bank)
    )

    # ---- init memory bank with a forward pass (utils.py:244-269)
    from audiossl_tpu.frontend.stft import log_mel

    @jax.jit
    def embed_batch(params, batch_stats, waves):
        lms = log_mel(waves, mel_cfg)[:, :, :, None]
        emb, _ = obj.net.apply({"params": params, "batch_stats": batch_stats}, lms, False)
        return emb

    if load_checkpoint is None:
        log.info("initializing memory bank (%d slots/shard x %d shards)", per_shard, n_dev)
        mem_emb = np.zeros((n_dev, per_shard, obj.feat_dim), np.float32)
        mem_idx = -np.ones((n_dev, per_shard), np.int32)
        pos = 0
        for waves, idxs in loader.epoch(0):
            emb = np.asarray(embed_batch(state.params, state.batch_stats, jnp.asarray(waves)))
            for d in range(n_dev):
                mem_emb[d, pos : pos + b_local] = emb[d * b_local : (d + 1) * b_local]
                mem_idx[d, pos : pos + b_local] = idxs[d * b_local : (d + 1) * b_local]
            pos += b_local
        state = state._replace(
            memory=jax.tree.map(
                lambda a: jax.device_put(jnp.asarray(a), shrd), DecarMemory(emb=mem_emb, index=mem_idx)
            )
        )

    # ---- run
    save_path = run.get("save_path", "./runs/decar_v2")
    ckpt_dir = save_path + "_chkp"
    os.makedirs(ckpt_dir, exist_ok=True)
    stats_file = open(os.path.join(ckpt_dir, "stats.jsonl"), "a", buffering=1)
    from audiossl_tpu.train.loop import MetricsBuffer

    buf = MetricsBuffer(int(run.get("log_every", 10)), stats_file)
    global_step = int(state.step)
    done = False
    keep_last = int(run.get("keep_checkpoints", 0)) or None
    from audiossl_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
      for epoch in range(epochs):
        if done:
            break
        key_cluster = jax.random.fold_in(state.rng, 10_000 + epoch)
        params, assignments = cluster_fn(state.params, state.memory, key_cluster)
        state = state._replace(params=params, assignments=assignments, epoch_step=jnp.zeros((), jnp.int32))
        n_assigned = int(np.sum(np.asarray(assignments[0]) != -100))
        log.info("epoch %d: clustering done (%d/%d samples assigned)", epoch, n_assigned, n_total)
        buf.reset_avg()
        t0 = time.time()
        for waves, idxs in loader.epoch(epoch):
            state, loss = step_fn(state, shard_batch(mesh, jnp.asarray(waves)), shard_batch(mesh, jnp.asarray(idxs)))
            global_step += 1
            if buf.push(epoch, global_step, {"train_loss": loss}) and guard.should_stop():
                # epoch-end save below runs on break (memory bank +
                # assignments ride the checkpoint, so resume is exact)
                log.warning("SIGTERM: stopping at step %d for preemption save", global_step)
                done = True
                break
            if max_steps and global_step >= max_steps:
                done = True
                break
        buf.flush()
        log.info("epoch %d done: loss %.4f (%.1fs)", epoch, buf.avg_loss, time.time() - t0)
        ckptmod.save_checkpoint(
            ckpt_dir, global_step, state, obj.encoder_variables(state.params, state.batch_stats), config,
            keep_last=keep_last,
        )
      # commit in-flight saves while SIGTERM is still deferred by the guard:
      # a repeat signal during the final async commit must not kill the write
      ckptmod.wait_until_finished()
    stats_file.close()
    return state, ckpt_dir
