"""Utils: metrics + CKA + EfficientNet + task registry + feature extraction."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from audiossl_tpu.utils.cka import linear_cka, kernel_cka
from audiossl_tpu.utils.metrics import (
    Accuracy,
    AverageMeter,
    accuracy_topk,
    auc_roc,
    d_prime,
    mean_average_precision,
)

RNG = np.random.default_rng(6)


class TestCKA:
    def test_self_similarity_is_one(self):
        x = jnp.asarray(RNG.standard_normal((16, 8)).astype(np.float32))
        np.testing.assert_allclose(float(linear_cka(x, x)), 1.0, atol=1e-5)

    def test_invariant_to_orthogonal_transform(self):
        x = RNG.standard_normal((16, 8)).astype(np.float32)
        q, _ = np.linalg.qr(RNG.standard_normal((8, 8)))
        a = float(linear_cka(jnp.asarray(x), jnp.asarray(x @ q.astype(np.float32))))
        np.testing.assert_allclose(a, 1.0, atol=1e-4)

    def test_unrelated_lower(self):
        x = jnp.asarray(RNG.standard_normal((32, 8)).astype(np.float32))
        y = jnp.asarray(RNG.standard_normal((32, 8)).astype(np.float32))
        assert float(linear_cka(x, y)) < 0.8


class TestMetrics:
    def test_accuracy_meter(self):
        acc = Accuracy()
        acc.update(np.array([True, True, False]))
        acc.update(np.array([True]))
        assert acc.avg == 0.75

    def test_topk(self):
        logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        labels = np.array([1, 2])
        top1, top2 = accuracy_topk(logits, labels, ks=(1, 2))
        assert top1 == 0.5 and top2 == 0.5

    def test_map_and_auc_perfect(self):
        scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.1, 0.9], [0.2, 0.8]])
        targets = np.array([[1, 0], [1, 0], [0, 1], [0, 1]])
        assert mean_average_precision(scores, targets) == 1.0
        assert auc_roc(scores, targets) == 1.0
        assert d_prime(0.999) > 3

    def test_meter(self):
        m = AverageMeter()
        m.update(1.0, 2)
        m.update(2.0, 2)
        assert m.avg == 1.5


def test_efficientnet_b0_shapes():
    from audiossl_tpu.models.efficientnet import EfficientNetB0

    model = EfficientNetB0()
    x = jnp.asarray(RNG.standard_normal((2, 64, 96, 1)).astype(np.float32))
    vars_ = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False)
    out = model.apply(vars_, x, False)
    assert out.shape == (2, 1280)
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vars_["params"]))
    # EfficientNet-B0 has ~4.0M backbone params (5.3M incl. classifier head)
    assert 3.5e6 < n_params < 4.5e6, n_params


def test_task_registry():
    from audiossl_tpu.downstream.tasks import TASKS, get_task

    assert len(TASKS) == 10  # the LAPE suite (SURVEY.md §2.2 extras/datasets)
    sc = get_task("speech_commands_v2")
    assert sc.labels["yes"] == 9 and len(sc.labels) == 12
    tr, te, va = sc.resolve("/data")
    assert tr.startswith("/data/") and va is None
    assert get_task("nope") is None


def test_extract_features_cli(tmp_path):
    import subprocess
    import sys

    from audiossl_tpu.data.make_test_wavs import make

    wav_dir = make(str(tmp_path / "wavs"), n=6)
    out = str(tmp_path / "feats")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    r = subprocess.run(
        [sys.executable, "-m", "audiossl_tpu.downstream.extract_features",
         "--csv", os.path.join(wav_dir, "pretrain.csv"), "--out", out,
         "--file_col", "files", "--batch_size", "3", "--l2_norm"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    feats = [f for f in os.listdir(out) if f.endswith(".npy")]
    assert len(feats) == 6
    arr = np.load(os.path.join(out, feats[0]))
    assert arr.shape == (64, 101)  # 1 s window -> 101 frames


class TestCheckpointRetention:
    """run.keep_checkpoints bounds on-disk history (train/checkpoint.py
    prune_checkpoints): days-long runs saving every 500 steps must not
    accumulate unbounded full-state checkpoints."""

    def test_prune_keeps_newest_k(self, tmp_path):
        import os

        import jax.numpy as jnp

        from audiossl_tpu.train import checkpoint as ckpt

        state = {"w": jnp.arange(4.0)}
        enc = {"params": {"k": jnp.ones((2,))}}
        d = str(tmp_path / "run_chkp")
        for step in (1, 2, 3, 4):
            ckpt.save_checkpoint(d, step, state, enc, block=True, keep_last=2)
        for kind in ("state", "encoder"):
            kept = sorted(int(s) for s in os.listdir(os.path.join(d, kind)) if s.isdigit())
            # blocking saves prune after commit, so the bound is exact;
            # async saves may lag one step behind (keep_last+1 on disk)
            assert kept == [3, 4], (kind, kept)
        # the newest checkpoint still restores after pruning
        assert ckpt.latest_step(d) == 4
        restored = ckpt.restore_checkpoint(d, {"w": jnp.zeros(4)})
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))

    def test_keep_all_by_default(self, tmp_path):
        import os

        import jax.numpy as jnp

        from audiossl_tpu.train import checkpoint as ckpt

        state = {"w": jnp.arange(2.0)}
        enc = {"params": {"k": jnp.ones((2,))}}
        d = str(tmp_path / "run2_chkp")
        for step in (1, 2, 3):
            ckpt.save_checkpoint(d, step, state, enc, block=True)
        kept = sorted(int(s) for s in os.listdir(os.path.join(d, "state")) if s.isdigit())
        assert kept == [1, 2, 3]


class TestConfigValidation:
    """run.* is a closed key vocabulary (config.py RUN_KEYS): a typo like
    'keep_checkpoint' silently becoming a no-op default is a footgun, so
    load_config warns on unknown run keys."""

    def test_shipped_configs_are_clean(self, caplog):
        from audiossl_tpu.config import load_config

        with caplog.at_level("WARNING", logger="audiossl_tpu.config"):
            for name in (
                "delores_s", "delores_m", "slicer", "unfused",
                "decar_v1", "decar_v2", "ssmast", "mast_ft", "downstream",
            ):
                load_config(None, name)
        assert not [r for r in caplog.records if "unknown run" in r.message]

    def test_typo_key_warns(self, tmp_path, caplog):
        import yaml

        from audiossl_tpu.config import load_config

        p = tmp_path / "c.yaml"
        yaml.safe_dump({"run": {"batch_size": 8, "keep_checkpoint": 2}}, open(p, "w"))
        with caplog.at_level("WARNING", logger="audiossl_tpu.config"):
            load_config(str(p))
        assert any("keep_checkpoint" in r.getMessage() for r in caplog.records)
