"""The hot loop must not sync with the host every step (VERDICT r1 Weak #2).

Counts host fetches through the loop's single sync seam (loop._fetch): a
7-step run with the default log_every=10 must fetch exactly once (the
end-of-epoch flush), while still writing all 7 stats records and keeping
check_nan_loss semantics.
"""
import json
import os

import numpy as np
import pytest

from audiossl_tpu.config import load_config
from audiossl_tpu.data.make_test_wavs import make
import audiossl_tpu.train.loop as loop_mod


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("wavs")), n=64)  # 8 steps/epoch at B=8


def test_no_per_step_host_sync(wav_dir, tmp_path, monkeypatch):
    cfg = load_config(None, "delores_s")
    cfg["run"].update(
        batch_size=8, epochs=1, num_dataloader_workers=2,
        save_path=os.path.join(str(tmp_path), "run"),
    )
    cfg["pretrain"]["base_encoder"]["output_dim"] = 64
    cfg["pretrain"]["projection_dim"] = 32

    fetches = []
    orig = loop_mod._fetch
    monkeypatch.setattr(loop_mod, "_fetch", lambda x: (fetches.append(len(x)), orig(x))[1])

    state, ckpt_dir = loop_mod.train_upstream(
        cfg, os.path.join(wav_dir, "pretrain.csv"), "delores_s", max_steps=7, save_every=0
    )
    assert int(state.step) == 7
    # one flush (end of run), carrying all 7 buffered step metrics
    assert fetches == [7], fetches
    lines = [json.loads(l) for l in open(os.path.join(ckpt_dir, "stats.jsonl"))]
    assert [l["step"] for l in lines] == list(range(1, 8))
    assert all(np.isfinite(l["train_loss"]) for l in lines)


def test_flush_cadence_follows_log_every(wav_dir, tmp_path, monkeypatch):
    cfg = load_config(None, "delores_s")
    cfg["run"].update(
        batch_size=8, epochs=1, num_dataloader_workers=2, log_every=3,
        save_path=os.path.join(str(tmp_path), "run2"),
    )
    cfg["pretrain"]["base_encoder"]["output_dim"] = 64
    cfg["pretrain"]["projection_dim"] = 32

    fetches = []
    orig = loop_mod._fetch
    monkeypatch.setattr(loop_mod, "_fetch", lambda x: (fetches.append(len(x)), orig(x))[1])

    state, _ = loop_mod.train_upstream(
        cfg, os.path.join(wav_dir, "pretrain.csv"), "delores_s", max_steps=7, save_every=0
    )
    assert fetches == [3, 3, 1], fetches


def test_nan_raises_at_flush():
    import jax.numpy as jnp

    from audiossl_tpu.utils.metrics import AverageMeter

    buf = loop_mod.MetricsBuffer(2, open(os.devnull, "w"), AverageMeter(), AverageMeter())
    buf.push(0, 1, {"train_loss": jnp.asarray(1.0)})
    with pytest.raises(Exception, match="[Nn]a[Nn]|finite"):
        buf.push(0, 2, {"train_loss": jnp.asarray(float("nan"))})
