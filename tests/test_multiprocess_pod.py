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
    # pmean'd losses are replicated: both hosts must report identical values
    loss0 = marks[0].split("losses=")[1]
    loss1 = marks[1].split("losses=")[1]
    assert loss0 == loss1, (loss0, loss1)
    # the cooperative orbax save produced a restorable state checkpoint
    assert os.path.isdir(tmp_path / "ckpt" / "state" / "2")
