"""End-to-end smoke: pretrain -> checkpoint -> resume -> downstream probe."""
import json
import os

import numpy as np
import pytest

from audiossl_tpu.config import load_config
from audiossl_tpu.data.make_test_wavs import make


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("wavs")), n=16)


def _small_upstream_config(name, tmp):
    cfg = load_config(None, name)
    cfg["run"].update(batch_size=8, epochs=1, num_dataloader_workers=2, save_path=os.path.join(tmp, name))
    cfg["pretrain"]["base_encoder"]["output_dim"] = 64
    cfg["pretrain"]["projection_dim"] = 32
    if name == "delores_m":
        cfg["pretrain"]["contrastive_dim"] = 16
        cfg["pretrain"]["num_negatives"] = 32
    if name == "unfused":
        cfg["pretrain"]["task_label"] = 4
    return cfg


class TestEndToEnd:
    def test_upstream_pretrain_checkpoint_resume_downstream(self, wav_dir, tmp_path):
        from audiossl_tpu.train.loop import train_upstream
        from audiossl_tpu.train import checkpoint as ckpt

        cfg = _small_upstream_config("delores_s", str(tmp_path))
        csv = os.path.join(wav_dir, "pretrain.csv")
        state, ckpt_dir = train_upstream(cfg, csv, "delores_s", max_steps=2, save_every=0)
        assert int(state.step) == 2
        assert ckpt.latest_step(ckpt_dir) == 2
        assert os.path.exists(os.path.join(ckpt_dir, "stats.jsonl"))
        lines = [json.loads(l) for l in open(os.path.join(ckpt_dir, "stats.jsonl"))]
        assert all(np.isfinite(l["train_loss"]) for l in lines)

        # resume: restored state continues from step 2
        state2, _ = train_upstream(cfg, csv, "delores_s", load_checkpoint=ckpt_dir, max_steps=3, save_every=0)
        assert int(state2.step) == 3

        # downstream linear probe from the exported encoder
        from audiossl_tpu.downstream.probe import run_downstream

        dcfg = load_config(None, "downstream")
        dcfg["run"].update(batch_size=8, epochs=2, lr=0.01, num_dataloader_workers=2)
        dcfg["downstream"]["base_encoder"]["output_dim"] = 64
        result = run_downstream(
            dcfg,
            {
                "task": "smoke",
                "train_csv": os.path.join(wav_dir, "downstream_train.csv"),
                "test_csv": os.path.join(wav_dir, "downstream_test.csv"),
                "checkpoint": ckpt_dir,
                "freeze": True,
                "exp_dir": str(tmp_path / "exp"),
            },
        )
        assert 0.0 <= result["best_test_acc"] <= 1.0
        assert os.path.exists(tmp_path / "exp" / "smoke" / "downstream_stats.txt")

    def test_unfused_labeled_pipeline(self, wav_dir, tmp_path):
        from audiossl_tpu.train.loop import train_upstream

        cfg = _small_upstream_config("unfused", str(tmp_path))
        csv = os.path.join(wav_dir, "pretrain.csv")
        state, _ = train_upstream(cfg, csv, "unfused", max_steps=2, save_every=0)
        assert int(state.step) == 2
