"""Real 2-process pod execution (VERDICT r2 item 3).

Launches two `jax.distributed` CPU processes (4 virtual devices each, local
TCP rendezvous through `parallel.launch.maybe_init_distributed`) running
tests/pod_worker.py: per-host `ManifestLoader(host_shard=...)` slices,
`shard_batch`'s `make_array_from_process_local_data` assembly, two ZeRO
train steps with cross-process gloo collectives, and a cooperative orbax
checkpoint + restore. This is the first execution of the pod data path with
`jax.process_count() > 1` — the TPU equivalent of the reference's
multi-node launcher running (multiprocessing.py:9-62, misc.py:183-211).
"""
import os
import socket
import subprocess
import sys

import pandas as pd
import pytest

from audiossl_tpu.data.make_test_wavs import make


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_pod_train_and_checkpoint(tmp_path):
    wav_dir = make(str(tmp_path / "wavs"), n=32)
    files = sorted(
        os.path.join(wav_dir, f) for f in os.listdir(wav_dir) if f.endswith(".wav")
    )
    assert len(files) == 32
    csv = str(tmp_path / "manifest.csv")
    pd.DataFrame({"files": files}).to_csv(csv, index=False)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "pod_worker.py")
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            AUDIOSSL_COORDINATOR=f"localhost:{port}",
            AUDIOSSL_NUM_PROCESSES="2",
            AUDIOSSL_PROCESS_ID=str(rank),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, csv, str(tmp_path / "ckpt")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            # generous: on the 1-core CI box a concurrent compile elsewhere
            # can stretch the ~60s happy path by several ×
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("pod workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank exited {p.returncode}:\n{out}"

    marks = sorted(
        line for out in outs for line in out.splitlines() if line.startswith("POD_OK")
    )
    assert len(marks) == 2, outs
    # every replicated quantity (pmean'd losses, params fingerprint, MoCo
    # queue pointer + gathered-keys checksum, FSDP loss) must be identical
    # on both hosts
    payload0 = marks[0].split("payload=")[1]
    payload1 = marks[1].split("payload=")[1]
    assert payload0 == payload1, (payload0, payload1)
    # the cooperative orbax save produced a restorable state checkpoint
    assert os.path.isdir(tmp_path / "ckpt" / "state" / "2")

    # reshard-on-restore: open the 2-process x 4-device pod checkpoint in
    # THIS process's 1 x 8-device mesh (the classic real-pod failure mode:
    # orbax must reshard the saved arrays into the new topology), then keep
    # training from it
    import jax
    import numpy as np
    import jax.numpy as jnp

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
    mesh = make_mesh()  # 8 devices, one process
    config = load_config(None, "delores_s")
    config["run"]["batch_size"] = global_batch
    config["pretrain"]["projection_dim"] = 64
    config["pretrain"]["base_encoder"]["output_dim"] = 64
    obj = get_objective("delores_s")(config)
    pipe = AugmentPipeline(AugmentConfig.from_dict(config["pretrain"]), epoch_samples=1000)
    tx = sgd_torch(0.01)
    state = init_train_state(
        obj, pipe, LogMelConfig(), tx, mesh, jax.random.key(0),
        global_batch // mesh.devices.size, clip, zero=True,
    )
    restored = ckpt.restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert int(restored.step) == 2
    # the restored params match the pod's fingerprint exactly
    psum = sum(float(jnp.sum(l)) for l in jax.tree.leaves(restored.params))
    pod_psum = float(payload0.split("psum=")[1].split(";")[0])
    np.testing.assert_allclose(psum, pod_psum, rtol=1e-6)
    # and the run continues on the new topology
    step = make_train_step(obj, pipe, LogMelConfig(), tx, mesh, zero=True)
    loader = ManifestLoader(csv, batch_size=global_batch, clip_samples=clip,
                            num_workers=2, seed=3)
    waves, _ = next(iter(loader.epoch(2)))
    restored, metrics = step(restored, shard_batch(mesh, waves))
    assert np.isfinite(float(metrics["train_loss"]))
