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

    # replicated pmean'd loss must agree across hosts — the test compares
    print(f"POD_OK rank={rank} losses={losses[0]:.6f},{losses[1]:.6f}")


if __name__ == "__main__":
    main()
