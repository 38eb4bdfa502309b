"""DeepCluster-v1 trainer: per-epoch faiss-style k-means pseudo-labels +
uniform-cluster sampling + classification CE.

Rebuilds the reference's epoch mode (extras/delores-s/main_back.py +
clustering.py:91-115 Kmeans + utils.py:105-148 UnifLabelSampler +
utils.py:69-95 compute_features), which DECAR-v2's memory-bank trainer
superseded but the reference still ships:

  each epoch: (1) eval-mode features for the whole dataset, (2) PCA-whiten
  + L2 + k-means (objectives/clustering.py — the faiss transcription),
  (3) an epoch of indices sampled uniformly over clusters, (4) CE training
  of encoder + a top layer that is RE-INITIALIZED every epoch (the
  reference deletes top_layer from checkpoints on resume,
  main_back.py:68-72), SGD lr 0.05 / momentum 0.9 / wd 1e-5
  (main_back.py:54-59).

TPU shape: features and CE steps run under shard_map over the data mesh;
the k-means itself is the host-side reference transcription (it runs once
per epoch over [N, 128] whitened features — not a hot path).
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
from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.models.audiontt import AudioNTT2020Task6
from audiossl_tpu.objectives.clustering import Kmeans, uniform_label_epoch
from audiossl_tpu.objectives.unfused import cross_entropy
from audiossl_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
from audiossl_tpu.train import checkpoint as ckptmod

log = logging.getLogger("audiossl_tpu.deepcluster")


class DeepClusterResult(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    assignments: Any  # [N] final-epoch cluster ids


def reset_subtree_opt_state(opt_state: Any, subtree: str) -> Any:
    """Zero every optimizer-state leaf under a params subtree key (e.g. the
    momentum trace of a re-initialized head). The trace pytree mirrors params
    and can be nested arbitrarily deep inside optax.chain state, so walk by
    key path rather than poking at state tuples."""

    def f(path, leaf):
        in_sub = any(
            getattr(p, "key", None) == subtree or getattr(p, "name", None) == subtree
            for p in path
        )
        return jnp.zeros_like(leaf) if in_sub else leaf

    return jax.tree_util.tree_map_with_path(f, opt_state)


def train_deepcluster_v1(
    config: dict[str, Any],
    input_csv: str,
    load_checkpoint: str | None = None,
    max_steps: int | None = None,
    seed: int = 31,
):
    run, pre = config["run"], config["pretrain"]
    mesh = make_mesh(int(run.get("world_size", 0)) or None)
    n_dev = mesh.devices.size
    batch = n_dev * max(1, int(run["batch_size"]) // n_dev)
    axis = DATA_AXIS

    clip = cfgmod.clip_samples(config)
    mel_cfg = LogMelConfig(
        sample_rate=int(pre["input"]["sampling_rate"]), n_mels=int(pre["input"]["n_mels"])
    )
    loader = ManifestLoader(
        input_csv, batch, clip, mel_cfg.sample_rate,
        num_workers=int(run.get("num_dataloader_workers", 8)), seed=seed,
        on_error=str(run.get("data_on_error", "raise")),
        shuffle=False,  # order comes from uniform_label_epoch
        drop_last=False,  # the feature pass must embed every sample
    )
    n_total = loader.num_samples
    n_clusters = int(pre.get("num_clusters", 10))
    d = int(pre["base_encoder"].get("output_dim", 2048))
    encoder = AudioNTT2020Task6(n_mels=mel_cfg.n_mels, d=d, return_all_layers=False)

    n_frames = mel_cfg.num_frames(clip)
    dummy = jnp.zeros((2, mel_cfg.n_mels, n_frames, 1), jnp.float32)
    enc_vars = jax.jit(lambda k: encoder.init({"params": k}, dummy, False))(
        jax.random.key(seed)
    )
    params = {"encoder": enc_vars["params"]}
    batch_stats = {"encoder": enc_vars.get("batch_stats", {})}

    def top_layer_init(key):
        # fresh classifier head each epoch (main_back.py:68-72 semantics)
        w = jax.random.normal(key, (d, n_clusters), jnp.float32) * (1.0 / np.sqrt(d))
        return {"kernel": w, "bias": jnp.zeros((n_clusters,), jnp.float32)}

    params["top_layer"] = top_layer_init(jax.random.key(seed + 1))

    lr = float(run.get("learning_rate", 0.05))
    tx = optax.chain(
        optax.add_decayed_weights(1e-5),
        optax.sgd(lr, momentum=0.9),
    )
    opt_state = tx.init(params)

    def forward(params, batch_stats, waves, train: bool, key=None):
        lms = log_mel(waves, mel_cfg)[:, :, :, None]
        variables = {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
        if train:
            emb, mut = encoder.apply(
                variables, lms, True, mutable=["batch_stats"], rngs={"dropout": key}
            )
            new_bs = {"encoder": mut["batch_stats"]}
        else:
            emb, new_bs = encoder.apply(variables, lms, False), batch_stats
        emb = jnp.mean(emb, axis=1) if emb.ndim == 3 else emb  # frame-mean
        logits = emb @ params["top_layer"]["kernel"] + params["top_layer"]["bias"]
        return emb, logits, new_bs

    def embed_fn(params, batch_stats, waves):
        if waves.dtype == jnp.int16:
            waves = waves.astype(jnp.float32) / 32768.0
        emb, _, _ = forward(params, batch_stats, waves, False)
        return emb

    embed_step = jax.jit(
        shard_map(embed_fn, mesh=mesh, in_specs=(P(), P(), P(axis)),
                  out_specs=P(axis), check_vma=False)
    )

    def train_step(params, batch_stats, opt_state, waves, labels, key):
        if waves.dtype == jnp.int16:
            waves = waves.astype(jnp.float32) / 32768.0
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def loss_fn(p):
            _, logits, new_bs = forward(p, batch_stats, waves, True, key)
            return cross_entropy(logits, labels), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), new_bs, opt_state,
            jax.lax.pmean(loss, axis),
        )

    train_step = jax.jit(
        shard_map(train_step, mesh=mesh,
                  in_specs=(P(), P(), P(), P(axis), P(axis), P()),
                  out_specs=(P(), P(), P(), P()), check_vma=False),
        donate_argnums=(0, 1, 2),  # params/batch_stats/opt_state update in place
    )

    repl = NamedSharding(mesh, P())
    params, batch_stats, opt_state = jax.tree.map(
        lambda a: jax.device_put(a, repl), (params, batch_stats, opt_state)
    )

    save_path = run.get("save_path", "./runs/decar_v1")
    ckpt_dir = save_path + "_chkp"
    os.makedirs(ckpt_dir, exist_ok=True)
    stats_file = open(os.path.join(ckpt_dir, "stats.jsonl"), "a", buffering=1)
    from audiossl_tpu.train.loop import MetricsBuffer

    buf = MetricsBuffer(int(run.get("log_every", 10)), stats_file)

    start_epoch = 0
    global_step = 0
    if load_checkpoint:
        target = {
            "epoch": 0, "step": 0, "params": params,
            "batch_stats": batch_stats, "opt_state": opt_state,
        }
        restored = ckptmod.restore_checkpoint(load_checkpoint, target)
        # top_layer is intentionally NOT restored fresh-init-equivalent: the
        # reference deletes it from the checkpoint (main_back.py:68-72)
        params = dict(restored["params"]) | {"top_layer": params["top_layer"]}
        batch_stats, opt_state = restored["batch_stats"], restored["opt_state"]
        start_epoch = int(restored["epoch"])
        # global step continues: post-resume checkpoints must not land at
        # lower step numbers than the pre-resume ones (latest_step order)
        global_step = int(restored["step"])
        log.info("resumed from %s at epoch %d step %d", load_checkpoint, start_epoch, global_step)

    epochs = int(run.get("epochs", 1))
    rng = np.random.default_rng(seed)
    done = False
    preempted = False
    keep_last = int(run.get("keep_checkpoints", 0)) or None
    last_assignments = None
    from audiossl_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
      for epoch in range(start_epoch, epochs):
        if done:
            break
        # 1. features for the whole dataset (compute_features, utils.py:69-95)
        feats = np.zeros((n_total, d), np.float32)
        pos = 0
        for waves, _ in loader.epoch(epoch, order=np.arange(n_total)):
            n = len(waves)
            if n < batch:  # pad tail to the compiled shape
                waves = np.pad(waves, ((0, batch - n), (0, 0)))
            emb = np.asarray(embed_step(params, batch_stats, shard_batch(mesh, jnp.asarray(waves))))
            feats[pos : pos + n] = emb[:n]
            pos += n

        # 2. PCA-whiten + L2 + k-means (clustering.py:91-115)
        km = Kmeans(n_clusters, pca_dim=min(128, d), seed=seed + epoch)
        km_loss = km.cluster(feats)
        labels_np = np.full((n_total,), -1, np.int64)
        for c, members in enumerate(km.images_lists):
            labels_np[np.asarray(members, np.int64)] = c
        last_assignments = labels_np

        # 3. uniform-over-clusters epoch order (UnifLabelSampler)
        order = uniform_label_epoch(km.images_lists, n_total, rng)

        # 4. fresh top layer + CE over pseudo-labels; the head's momentum
        # resets with it (the reference builds a new top-layer optimizer
        # each epoch, classic DeepCluster)
        params = dict(params) | {"top_layer": jax.device_put(
            top_layer_init(jax.random.key(seed + 100 + epoch)), repl
        )}
        opt_state = reset_subtree_opt_state(opt_state, "top_layer")
        buf.reset_avg()
        t0 = time.time()
        for b, (waves, _) in enumerate(loader.epoch(epoch, order=order)):
            if len(waves) < batch:
                continue  # drop tail: CE shapes stay static
            batch_idx = order[b * batch : (b + 1) * batch]
            y = jnp.asarray(labels_np[batch_idx], jnp.int32)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state,
                shard_batch(mesh, jnp.asarray(waves)), shard_batch(mesh, y),
                jax.random.key(seed * 1_000_003 + global_step),
            )
            global_step += 1
            if (
                buf.push(epoch, global_step, {"train_loss": loss, "kmeans_loss": jnp.asarray(km_loss)})
                and guard.should_stop()
            ):
                # epoch-end save below runs on break; assignments/top layer
                # rebuild from the checkpointed encoder on resume
                log.warning("SIGTERM: stopping at step %d for preemption save", global_step)
                done = True
                preempted = True
                break
            if max_steps and global_step >= max_steps:
                done = True
                break
        buf.flush()
        log.info("epoch %d: kmeans_loss %.4f CE %.4f (%.1fs)", epoch, km_loss, buf.avg_loss, time.time() - t0)
        ckptmod.save_checkpoint(
            ckpt_dir, global_step,
            # a preempted epoch records `epoch`, not epoch + 1: DeepCluster
            # is epoch-granular (features -> k-means -> CE), so resume
            # re-runs the interrupted epoch instead of silently skipping its
            # remaining pseudo-label steps
            {"epoch": epoch if preempted else epoch + 1, "step": global_step,
             "params": params,
             "batch_stats": batch_stats, "opt_state": opt_state},
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            config,
            keep_last=keep_last,
        )
      # commit in-flight saves while SIGTERM is still deferred by the guard:
      # a repeat signal during the final async commit must not kill the write
      ckptmod.wait_until_finished()
    stats_file.close()
    result = DeepClusterResult(
        step=jnp.asarray(global_step), params=params,
        batch_stats=batch_stats, assignments=last_assignments,
    )
    return result, ckpt_dir
