"""Supervised MAST fine-tuning (multi-label BCE + mAP, extras/mast_new)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.train.finetune_mast import bce_logits, mixup_waves_and_labels

RNG = np.random.default_rng(29)


def test_bce_matches_torch():
    import torch

    logits = (2.0 * RNG.standard_normal((4, 7))).astype(np.float32)
    targets = (RNG.uniform(size=(4, 7)) < 0.3).astype(np.float32)
    ours = float(bce_logits(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(targets))
    )
    assert abs(ours - ref) < 1e-6, (ours, ref)


def test_mixup_labels_are_convex_combinations():
    waves = jnp.asarray((RNG.standard_normal((6, 400)) + 0.5).astype(np.float32))
    targets = jnp.asarray((RNG.uniform(size=(6, 5)) < 0.4).astype(np.float32))
    w0, t0 = mixup_waves_and_labels(waves, targets, jax.random.key(0), rate=0.0)
    # rate 0: centered waves, untouched labels
    np.testing.assert_allclose(np.asarray(jnp.mean(w0, -1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t0), np.asarray(targets))
    w1, t1 = mixup_waves_and_labels(waves, targets, jax.random.key(1), rate=1.0)
    # λ-weighted label sums stay between the two parents' sums
    sums = np.asarray(jnp.sum(t1, axis=1))
    lo, hi = float(np.min(np.sum(np.asarray(targets), 1))), float(np.max(np.sum(np.asarray(targets), 1)))
    assert np.all(sums >= lo - 1e-5) and np.all(sums <= hi + 1e-5)
    np.testing.assert_allclose(np.asarray(jnp.mean(w1, -1)), 0.0, atol=1e-5)


@pytest.fixture(scope="module")
def audioset_style_data(tmp_path_factory):
    from audiossl_tpu.data.wav import write_wav

    root = tmp_path_factory.mktemp("asdata")
    mids = [f"/m/{i:02d}" for i in range(4)]
    with open(root / "labels.csv", "w") as f:
        f.write("index,mid,display_name\n")
        for i, m in enumerate(mids):
            f.write(f"{i},{m},class{i}\n")
    rows = []
    for i in range(16):
        wav = root / f"c{i:02d}.wav"
        w = 0.3 * np.sin(2 * np.pi * (200 + 150 * (i % 4)) * np.arange(8000) / 16000)
        write_wav(str(wav), w.astype(np.float32), 16000)
        labels = mids[i % 4] if i % 3 else f"{mids[i % 4]},{mids[(i + 1) % 4]}"
        rows.append({"wav": str(wav), "labels": labels})
    for name, sl in (("train.json", slice(0, 12)), ("eval.json", slice(12, 16))):
        with open(root / name, "w") as f:
            json.dump({"data": rows[sl]}, f)
    return root


def test_multilabel_loader(audioset_style_data):
    from audiossl_tpu.data.multilabel import multilabel_loader

    loader, n_classes = multilabel_loader(
        str(audioset_style_data / "train.json"), str(audioset_style_data / "labels.csv"),
        batch_size=4, clip_samples=8000, num_workers=1,
    )
    assert n_classes == 4
    waves, targets = next(iter(loader.epoch(0)))
    assert waves.shape == (4, 8000)
    assert targets.shape == (4, 4) and targets.dtype == np.float32
    assert np.all(targets.sum(axis=1) >= 1)


def test_finetune_smoke_with_eval(audioset_style_data, tmp_path):
    from audiossl_tpu.train.finetune_mast import train_finetune_mast

    config = {
        "run": {
            "batch_size": 8, "epochs": 1, "num_dataloader_workers": 1,
            "learning_rate": 1e-3, "layer_decay": 0.75, "weight_decay": 0.05,
            "clip_grad_norm": 1.0, "save_path": os.path.join(str(tmp_path), "ft"),
        },
        "finetune": {
            "model_size": "tiny",
            "freqm": 8, "timem": 16,
            "norm_stats": {"mean": -13.9, "std": 5.3},
            "input": {
                "type": "fbank", "sampling_rate": 16000, "length_wave": 0.5,
                "n_mels": 64, "target_length": 48, "mixup": 0.5, "noise": True,
            },
        },
    }
    params, stats, ckpt_dir = train_finetune_mast(
        config,
        str(audioset_style_data / "train.json"),
        str(audioset_style_data / "labels.csv"),
        eval_json=str(audioset_style_data / "eval.json"),
    )
    assert np.isfinite(stats["train_loss"])
    assert 0.0 <= stats["mAP"] <= 1.0 and 0.0 <= stats["AUC"] <= 1.0
    from audiossl_tpu.train import checkpoint as ckpt

    assert ckpt.latest_step(ckpt_dir) is not None


def test_finetune_fsdp_matches_shard_map(audioset_style_data, tmp_path):
    """run.fsdp (GSPMD fully sharded) reproduces the shard_map path's loss
    trajectory exactly when the stochastic augs are off (same batches via
    the same loader seed; droppath/mixup/masking/noise disabled), and the
    returned params are physically sharded over the mesh."""
    from audiossl_tpu.train.finetune_mast import train_finetune_mast

    def cfg(save, fsdp):
        return {
            "run": {
                "batch_size": 8, "epochs": 1, "num_dataloader_workers": 1,
                "learning_rate": 1e-3, "layer_decay": 0.75, "weight_decay": 0.05,
                "clip_grad_norm": 1.0, "save_path": os.path.join(str(tmp_path), save),
                "fsdp": fsdp,
            },
            "finetune": {
                "model_size": "tiny", "droppath_rate": 0.0,
                "compute_dtype": "f32",  # exact trunk: bf16 would add ~1e-3
                # cross-compile reassociation noise between the two paths
                "freqm": 0, "timem": 0,
                "norm_stats": {"mean": -13.9, "std": 5.3},
                "input": {
                    "type": "fbank", "sampling_rate": 16000, "length_wave": 0.5,
                    "n_mels": 64, "target_length": 48, "mixup": 0.0, "noise": False,
                },
            },
        }

    args = (
        str(audioset_style_data / "train.json"),
        str(audioset_style_data / "labels.csv"),
    )
    _, stats_ref, _ = train_finetune_mast(cfg("ref", False), *args, max_steps=2)
    params_f, stats_f, _ = train_finetune_mast(cfg("fsdp", True), *args, max_steps=2)

    np.testing.assert_allclose(stats_f["train_loss"], stats_ref["train_loss"], rtol=1e-5)
    specs = [l.sharding.spec for l in jax.tree.leaves(params_f)]
    assert any("data" in s for s in specs), "no param leaf is mesh-sharded"


def test_finetune_resume_continues_step_counter(audioset_style_data, tmp_path):
    """A resumed fine-tune continues from the stored step (remaining epochs
    only), instead of replaying all configured epochs from scratch — the
    preemption-resume contract (train/preemption.py)."""
    from audiossl_tpu.train import checkpoint as ckpt
    from audiossl_tpu.train.finetune_mast import train_finetune_mast

    def cfg(tag, epochs):
        return {
            "run": {
                "batch_size": 8, "epochs": epochs, "num_dataloader_workers": 1,
                "learning_rate": 1e-3, "layer_decay": 0.75, "weight_decay": 0.05,
                "clip_grad_norm": 1.0, "save_path": os.path.join(str(tmp_path), tag),
            },
            "finetune": {
                "model_size": "tiny",
                "norm_stats": {"mean": -13.9, "std": 5.3},
                "input": {
                    "type": "fbank", "sampling_rate": 16000, "length_wave": 0.5,
                    "n_mels": 64, "target_length": 48,
                },
            },
        }

    args = (str(audioset_style_data / "train.json"), str(audioset_style_data / "labels.csv"))
    # epoch 0 = 1 step at batch 8 over 12 clips (drop_last)
    _, _, ckpt_dir = train_finetune_mast(cfg("a", 1), *args)
    first = ckpt.latest_step(ckpt_dir)
    assert first == 1
    # resume with 2 configured epochs: epoch 0 is already done (step 1), so
    # exactly one more epoch runs -> final step 2, not 3
    _, _, ckpt_dir2 = train_finetune_mast(
        cfg("a", 2), *args, load_checkpoint=ckpt_dir
    )
    assert ckpt.latest_step(ckpt_dir2) == 2
