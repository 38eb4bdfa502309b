"""Full train-step throughput for the remaining trainer families (scratch).

bench.py carries delores_s/m as the number of record and PERF.md carries
SS-MAST/AST; this measures the other three — SLICER, UnFuSeD (labeled),
and DECAR-v2 (its own loop shape: prototype CE + memory-bank write, plus
the per-epoch on-mesh k-means) — so every objective family has a measured
number. Usage: python profiling/trainers.py [slicer unfused decar]
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.config import load_config
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train.optim import sgd_torch
from audiossl_tpu.train.step import init_train_state, make_train_step

B, CLIP, ITERS = 256, 15200, 20


def bench_objective(name: str):
    mesh = make_mesh()
    config = load_config(None, name)
    config["run"]["batch_size"] = B
    obj = get_objective(name)(config)
    pipe = AugmentPipeline(AugmentConfig.from_dict(config["pretrain"]), epoch_samples=10**6)
    mel_cfg = LogMelConfig()
    tx = sgd_torch(0.03)
    labeled = getattr(obj, "labeled", False)
    n_dev = mesh.devices.size
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), B // n_dev, CLIP, labeled=labeled
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, labeled=labeled)
    rng = np.random.default_rng(1)
    waves = shard_batch(mesh, jnp.asarray(0.3 * rng.standard_normal((B, CLIP)), jnp.float32))
    labels = (
        shard_batch(mesh, jnp.asarray(rng.integers(0, 99, B), jnp.int32)) if labeled else None
    )
    args = (waves, labels) if labeled else (waves,)
    for _ in range(3):
        state, metrics = step(state, *args)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, *args)
    float(metrics["train_loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name} B={B}: {dt*1e3:.1f} ms/step  ({B/dt:.0f} clips/s)", flush=True)


def bench_decar(n_total=102_400, kmeans_iters=10):
    """DECAR-v2: the per-step cost (prototype CE on 2 views + bank write)
    and the per-epoch on-mesh spherical k-means over a full-size memory
    bank (mirrors train/decar_loop.py step_fn/cluster_fn at world size 1)."""
    import optax
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiossl_tpu.objectives.decar import (
        DecarMemory, DecarV2, decar_ce, kmeans_on_mesh, memory_update,
    )
    from audiossl_tpu.parallel.mesh import DATA_AXIS
    from audiossl_tpu.train.optim import larc
    from audiossl_tpu.train.step import prepare_views

    mesh = make_mesh()
    axis = DATA_AXIS
    config = load_config(None, "decar_v2")
    config["run"]["batch_size"] = B
    # single-device step timing: no collectives (the k-means op below keeps
    # its shard_map axis)
    obj = DecarV2(config, axis_name=None)
    mel_cfg = LogMelConfig()
    pipe = AugmentPipeline(AugmentConfig.from_dict(config["pretrain"]), epoch_samples=n_total)
    n_frames = mel_cfg.num_frames(CLIP)
    tx = larc(4.8, momentum=0.9, weight_decay=1e-6, trust_coefficient=0.001, clip=False)

    dummy = jnp.zeros((B, mel_cfg.n_mels, n_frames, 1), jnp.float32)
    params, batch_stats, _ = jax.jit(obj.init)(jax.random.key(0), (dummy, dummy))
    opt_state = tx.init(params)
    aug_local = pipe.init_state(mel_cfg.n_mels, n_frames)
    assignments = tuple(jnp.zeros((n_total,), jnp.int32) for _ in obj.nmb_prototypes)
    memory = DecarMemory(
        emb=jnp.zeros((1, n_total, obj.feat_dim), jnp.float32),
        index=-jnp.ones((1, n_total), jnp.int32),
    )
    norm = config["pretrain"].get("normalization", "mean_var")

    def step_fn(params, opt_state, batch_stats, assignments, memory, aug_state, waves, idxs, key):
        k_aug, k_net = jax.random.split(key)
        aug_state, v1, v2 = prepare_views(pipe, mel_cfg, norm, aug_state, waves, k_aug)

        def loss_fn(p):
            (emb, _), mut = obj.apply_net(p, batch_stats, v1, k_net, True)
            (_, scores2), mut = obj.net.apply(
                {"params": p, "batch_stats": mut["batch_stats"]}, v2, True,
                rngs={"dropout": k_net}, mutable=["batch_stats"],
            )
            loss = 0.0
            for h in range(len(obj.nmb_prototypes)):
                loss = loss + decar_ce(scores2[h], assignments[h][idxs], obj.temperature)
            return loss / len(obj.nmb_prototypes), (emb, mut["batch_stats"])

        (loss, (emb, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = obj.freeze_prototype_grads(grads, jnp.asarray(10_000, jnp.int32))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mem_emb, mem_idx = memory_update(
            memory.emb[0], memory.index[0], emb, idxs, jnp.asarray(0, jnp.int32)
        )
        return params, opt_state, new_bs, DecarMemory(mem_emb[None], mem_idx[None]), aug_state, loss

    step = jax.jit(step_fn)
    rng = np.random.default_rng(2)
    waves = jnp.asarray(0.3 * rng.standard_normal((B, CLIP)), jnp.float32)
    idxs = jnp.arange(B, dtype=jnp.int32)

    carry = (params, opt_state, batch_stats, memory, aug_local)
    for i in range(3):
        p, o, bs, mem, aug, loss = step(
            carry[0], carry[1], carry[2], assignments, carry[3], carry[4],
            waves, idxs, jax.random.fold_in(jax.random.key(3), i),
        )
        carry = (p, o, bs, mem, aug)
    float(loss)
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, o, bs, mem, aug, loss = step(
            carry[0], carry[1], carry[2], assignments, carry[3], carry[4],
            waves, idxs, jax.random.fold_in(jax.random.key(4), i),
        )
        carry = (p, o, bs, mem, aug)
    float(loss)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"decar_v2 B={B}: {dt*1e3:.1f} ms/step  ({B/dt:.0f} clips/s)", flush=True)

    # epoch-boundary k-means over the full bank (shard_map world size 1)
    mem_emb = jnp.asarray(rng.standard_normal((1, n_total, obj.feat_dim)), jnp.float32)
    mem_idx = jnp.arange(n_total, dtype=jnp.int32)[None]

    def cluster_fn(emb, idx, key):
        cents, assigns = [], []
        for i, k in enumerate(obj.nmb_prototypes):
            c, a = kmeans_on_mesh(
                emb[0], idx[0], n_total, k, jax.random.fold_in(key, i), kmeans_iters, axis
            )
            cents.append(c)
            assigns.append(a)
        return tuple(cents), tuple(assigns)

    cluster = jax.jit(
        shard_map(
            cluster_fn, mesh=mesh, in_specs=(P(axis), P(axis), P()),
            out_specs=(P(), P()), check_vma=False,
        )
    )
    cents, assigns = cluster(mem_emb, mem_idx, jax.random.key(5))
    jax.block_until_ready(cents)
    t0 = time.perf_counter()
    for i in range(5):
        cents, assigns = cluster(mem_emb, mem_idx, jax.random.fold_in(jax.random.key(6), i))
    float(jnp.sum(cents[0]))
    dt = (time.perf_counter() - t0) / 5
    heads = "x".join(str(k) for k in obj.nmb_prototypes)
    print(
        f"decar_v2 k-means epoch op (bank {n_total} x {obj.feat_dim}, heads {heads}, "
        f"{kmeans_iters} iters): {dt*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    names = sys.argv[1:] or ["slicer", "unfused", "decar"]
    for n in names:
        if n == "decar":
            bench_decar()
        else:
            bench_objective(n)
