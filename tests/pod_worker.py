"""One process of a simulated 2-host TPU pod (driven by test_multiprocess_pod.py).

Runs the REAL multi-host code path with jax.process_count() == 2 — the TPU
equivalent of the reference's multi-node SLURM launch actually executing
(extras/mast_new/mast/mvit/utils/multiprocessing.py:9-62): rendezvous via
`parallel.launch.maybe_init_distributed` (AUDIOSSL_* env), per-host
`ManifestLoader(host_shard=(rank, 2))` slices, global batches assembled
through `shard_batch`'s `make_array_from_process_local_data` branch, ZeRO
train steps with cross-process collectives (gloo), and a cooperative orbax
checkpoint write + restore.

Usage: pod_worker.py <wav_csv> <ckpt_dir>   (env selects rank/rendezvous)
"""
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax  # noqa: E402

# CPU with 4 virtual devices per process; must precede any backend init
# (the session sitecustomize pins the axon TPU tunnel via env, so redirect
# post-import like tests/conftest.py does)
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from audiossl_tpu.parallel.launch import maybe_init_distributed, process_info  # noqa: E402


def main() -> None:
    wav_csv, ckpt_dir = sys.argv[1], sys.argv[2]
    assert maybe_init_distributed(), "AUDIOSSL_* rendezvous env missing"
    rank, count = process_info()
    assert count == 2, count
    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp  # noqa: F401

    from audiossl_tpu.config import load_config
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.data.pipeline import ManifestLoader
    from audiossl_tpu.frontend.stft import LogMelConfig
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train import checkpoint as ckpt
    from audiossl_tpu.train.optim import sgd_torch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    global_batch, clip = 16, 4000
    mesh = make_mesh()  # all 8 devices across both processes
    config = load_config(None, "delores_s")
    config["run"]["batch_size"] = global_batch
    config["pretrain"]["projection_dim"] = 64
    config["pretrain"]["base_encoder"]["output_dim"] = 64
    obj = get_objective("delores_s")(config)
    pipe = AugmentPipeline(AugmentConfig.from_dict(config["pretrain"]), epoch_samples=1000)
    mel_cfg = LogMelConfig()
    tx = sgd_torch(0.01)
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0),
        global_batch // mesh.devices.size, clip, zero=True,
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, zero=True)

    # per-host loader: batch_size is the LOCAL (per-host) batch; host_shard
    # takes rank-strided slices of the identically-seeded global permutation
    loader = ManifestLoader(
        wav_csv, batch_size=global_batch // count, clip_samples=clip,
        num_workers=2, seed=3, host_shard=(rank, count),
    )
    losses = []
    for i, (waves, _) in enumerate(loader.epoch(0)):
        assert waves.shape == (global_batch // count, clip), waves.shape
        global_waves = shard_batch(mesh, waves)
        assert global_waves.shape == (global_batch, clip), global_waves.shape
        state, metrics = step(state, global_waves)
        losses.append(float(metrics["train_loss"]))
        if i == 1:
            break
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses), losses

    # cooperative multi-host checkpoint (every process participates; orbax
    # gathers each host's addressable shards — aug/opt state are mesh-sharded)
    ckpt.save_checkpoint(
        ckpt_dir, 2, state, obj.encoder_variables(state.params, state.batch_stats),
        config, block=True,
    )
    restored = ckpt.restore_checkpoint(ckpt_dir, state)
    assert int(restored.step) == int(state.step) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # the driver restores this checkpoint into a 1-process x 8-device mesh
    # (reshard-on-restore); give it a params fingerprint to compare against
    psum = sum(float(jnp.sum(l)) for l in jax.tree.leaves(state.params))

    # (a) DeLoRes-M across the PROCESS boundary: the queue all_gather and
    # pointer advance — the reference's concat_all_gather dequeue-and-enqueue
    # over NCCL ranks (src/upstream/delores_m/upstream_expert.py:156-219) —
    # must collect keys from BOTH hosts' devices and agree on the pointer.
    config_m = load_config(None, "delores_m")
    config_m["run"]["batch_size"] = global_batch
    config_m["pretrain"]["base_encoder"]["output_dim"] = 64
    config_m["pretrain"]["projection_dim"] = 32
    config_m["pretrain"]["contrastive_dim"] = 16
    config_m["pretrain"]["num_negatives"] = 2 * global_batch
    obj_m = get_objective("delores_m")(config_m)
    pipe_m = AugmentPipeline(AugmentConfig.from_dict(config_m["pretrain"]), epoch_samples=1000)
    state_m = init_train_state(
        obj_m, pipe_m, mel_cfg, tx, mesh, jax.random.key(1),
        global_batch // mesh.devices.size, clip,
    )
    step_m = make_train_step(obj_m, pipe_m, mel_cfg, tx, mesh)
    waves_m, _ = next(iter(loader.epoch(1)))
    state_m, metrics_m = step_m(state_m, shard_batch(mesh, waves_m))
    moco_loss = float(metrics_m["train_loss"])
    assert np.isfinite(moco_loss)
    ptr = int(state_m.ssl_state.queue_ptr)  # replicated across the pod
    assert ptr == global_batch, f"queue ptr {ptr} != global batch {global_batch}"
    # fingerprint of the enqueued (all-gathered) keys: identical on both
    # hosts iff the gather crossed the process boundary consistently
    qsum = float(jnp.sum(state_m.ssl_state.queue[:, :global_batch].astype(jnp.float32)))

    # (b) FSDP/GSPMD with process_count == 2: params/grads/moments sharded
    # 1/8 per device ACROSS hosts via sharding annotations (parallel/fsdp.py)
    import optax  # noqa: E402

    from audiossl_tpu.parallel.fsdp import make_fsdp_train_step, tree_shardings
    from audiossl_tpu.parallel.mesh import host_to_mesh

    rngf = np.random.default_rng(7)  # identical draw on both hosts
    pf_host = {
        "w1": rngf.standard_normal((64, 128)).astype(np.float32),
        "w2": rngf.standard_normal((128, 8)).astype(np.float32),
    }
    pf_sh = tree_shardings(pf_host, mesh)
    # host-replicated values -> globally sharded arrays (device_put can't
    # target non-addressable devices; assemble from per-host callbacks)
    pf = jax.tree.map(
        lambda a, s: jax.make_array_from_callback(a.shape, s, lambda idx: a[idx]),
        pf_host, pf_sh,
    )
    assert pf["w1"].addressable_shards[0].data.shape == (64, 16)  # 128/8 cols
    txf = optax.adam(1e-2)
    opt_f = jax.jit(
        txf.init, out_shardings=tree_shardings(jax.eval_shape(txf.init, pf), mesh)
    )(pf)

    def loss_f(p, batch, key):
        del key
        x, y = batch
        h = jnp.tanh(jnp.matmul(x, p["w1"], precision=jax.lax.Precision.HIGHEST))
        return jnp.mean((jnp.matmul(h, p["w2"], precision=jax.lax.Precision.HIGHEST) - y) ** 2)

    step_f = make_fsdp_train_step(loss_f, txf, mesh, pf)
    rngb = np.random.default_rng(11 + rank)  # per-host local slice
    xb = rngb.standard_normal((global_batch // count, 64)).astype(np.float32)
    yb = rngb.standard_normal((global_batch // count, 8)).astype(np.float32)
    key_f = host_to_mesh(mesh, jax.random.key(5))
    pf, opt_f, loss_fsdp = step_f(pf, opt_f, shard_batch(mesh, (xb, yb)), key_f)
    loss_fsdp = float(loss_fsdp)
    assert np.isfinite(loss_fsdp)
    assert pf["w1"].addressable_shards[0].data.shape == (64, 16)  # stays sharded

    # (c) MViT tensor parallelism ACROSS the process boundary (r5): the
    # weight-sharded layout (parallel/tp_mvit.py) over a dp4 x tp2 mesh
    # whose model-axis pairs SPAN the two hosts — forward must equal the
    # dense single-host apply (pool_impl='unrolled' + fused off: the tp
    # requirements)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from audiossl_tpu.models.mast import MASTEncoder
    from audiossl_tpu.parallel.tp_mvit import make_dp_tp_mesh, mvit_tp_shardings

    mast = MASTEncoder(
        input_fdim=32, input_tdim=48, model_size="tiny",
        compute_dtype=None, fused_attention="off", pool_impl="unrolled",
    )
    xm_host = np.random.default_rng(9).standard_normal((8, 32, 48, 1)).astype(np.float32)
    vars_m = jax.jit(mast.init, static_argnums=2)(
        {"params": jax.random.key(3)}, jnp.asarray(xm_host[:2]), False
    )
    # identical init on both hosts (same seed); dense reference locally
    dense_m = np.asarray(
        jax.jit(mast.apply, static_argnums=2)(vars_m, jnp.asarray(xm_host), False)
    )
    pm_host = jax.tree.map(np.asarray, vars_m["params"])
    mesh2 = make_dp_tp_mesh(4, 2)  # rows 0-1 on host 0, rows 2-3 on host 1
    pm_sh = mvit_tp_shardings(pm_host, mesh2)
    pm = jax.tree.map(
        lambda a, s: jax.make_array_from_callback(a.shape, s, lambda idx: a[idx]),
        pm_host, pm_sh,
    )
    xm_global = shard_batch(mesh2, xm_host[rank * 4 : rank * 4 + 4])
    f_mtp = jax.jit(
        lambda p, xb: mast.apply({"params": p}, xb, False),
        in_shardings=(pm_sh, NamedSharding(mesh2, P("data"))),
        out_shardings=NamedSharding(mesh2, P()),  # replicated -> local fetch
    )
    out_mtp = np.asarray(f_mtp(pm, xm_global))
    np.testing.assert_allclose(out_mtp, dense_m, rtol=2e-5, atol=2e-5)
    mtp_sum = float(np.sum(out_mtp.astype(np.float64)))

    # preemption agreement: only rank 1 is "signalled" (self-delivered
    # SIGTERM through the real handler); should_stop() all-gathers the
    # flags so BOTH ranks agree to stop — the collective prerequisite for
    # the final orbax save (train/preemption.py)
    import signal

    from audiossl_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        assert guard.should_stop() is False  # unanimous not-stopped
        if rank == 1:
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested_locally()
        agreed = guard.should_stop()
        assert agreed is True, f"rank {rank} did not agree to stop"

    # every replicated quantity must agree across hosts — the test compares
    # the full payload between ranks (and psum against the resharded restore)
    print(
        f"POD_OK rank={rank} payload="
        f"losses={losses[0]:.6f},{losses[1]:.6f};psum={psum:.6f};"
        f"moco={moco_loss:.6f};ptr={ptr};qsum={qsum:.6f};fsdp={loss_fsdp:.6f};"
        f"mtp={mtp_sum:.6f}"
    )


if __name__ == "__main__":
    main()
