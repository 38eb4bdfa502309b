"""Kmix end-to-end: memory bank -> centroid export -> pretrain with Kmix.

The reference ships Kmix as a worked example (extras/mast_new/mast/example.py
+ src/augmentations/augmentations.py:119-189): a first pretrain pass yields
cluster centroids, and a second pass mixes each sample against a memory-bank
partner drawn from the farthest centroid's neighborhood. This test drives the
whole recipe through the public surfaces: train_upstream -> checkpoint ->
make_pseudo_labels --save_centroids -> train_upstream with
configs/delores_s_kmix.yaml (VERDICT r3 Next #7).
"""
import os
import sys

import numpy as np
import pytest

from audiossl_tpu.config import load_config
from audiossl_tpu.data.make_test_wavs import make

pytestmark = pytest.mark.slow  # two pretrain compiles + a clustering pass


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("kmix_wavs")), n=16)


def _small_cfg(name, tmp, tag):
    cfg = load_config(None, name)
    cfg["run"].update(
        batch_size=8, epochs=1, num_dataloader_workers=2,
        save_path=os.path.join(tmp, tag),
    )
    cfg["pretrain"]["base_encoder"]["output_dim"] = 64
    cfg["pretrain"]["projection_dim"] = 32
    return cfg


def test_bank_to_centroids_to_kmix_pretrain(wav_dir, tmp_path, monkeypatch):
    from audiossl_tpu.train.loop import train_upstream

    csv = os.path.join(wav_dir, "pretrain.csv")

    # stage 0: a short pretrain pass to give the centroid export a checkpoint
    cfg0 = _small_cfg("delores_s", str(tmp_path), "stage0")
    _, ckpt_dir = train_upstream(cfg0, csv, "delores_s", max_steps=2, save_every=0)

    # stage 1: memory-bank features -> k-means -> Kmix centroids (the CLI)
    from audiossl_tpu.objectives import make_pseudo_labels

    cents_path = str(tmp_path / "kmix_centroids.npy")
    monkeypatch.setattr(
        sys, "argv",
        [
            "make_pseudo_labels", "--csv", csv, "--checkpoint", ckpt_dir,
            "--out", str(tmp_path / "labeled.csv"), "--clusters", "4",
            "--batch_size", "8", "--output_dim", "64",
            "--save_centroids", cents_path,
        ],
    )
    make_pseudo_labels.main()
    cents = np.load(cents_path)
    assert cents.ndim == 2 and cents.shape[1] == 64  # [K, n_mels] mel space
    assert np.all(np.isfinite(cents))

    # stage 2: pretrain through the shipped Kmix config. top_k=4 so the
    # bank (2 pushes/step of the per-shard batch) crosses the threshold
    # within the run and the centroid-neighborhood partner selection — not
    # just the uniform fallback — drives the later steps.
    cfg = _small_cfg("delores_s_kmix", str(tmp_path), "stage2")
    cfg["run"]["epochs"] = 3  # 2 steps/epoch at batch 8 over 16 wavs
    kmix_cfg = cfg["pretrain"]["augmentations"]["Kmix"]
    assert "centroid_path" in kmix_cfg  # shipped config documents the knob
    kmix_cfg["centroid_path"] = cents_path
    kmix_cfg["top_k"] = 4
    state, _ = train_upstream(cfg, csv, "delores_s", max_steps=6, save_every=0)
    assert int(state.step) == 6
    # every mesh shard's ring bank passed top_k: the jnp.where in
    # data/augment.py:kmix selected the on-device partner indices
    fills = np.asarray(state.aug_state.mixup.fill)
    assert np.all(fills >= 4), fills

    # the Kmix op must actually be in the compiled step: same seed without
    # Kmix (uniform MixupBYOLA partner only) yields a different trajectory
    cfg_plain = _small_cfg("delores_s", str(tmp_path), "stage2_plain")
    cfg_plain["run"]["epochs"] = 3
    state_plain, _ = train_upstream(cfg_plain, csv, "delores_s", max_steps=6, save_every=0)
    import jax

    max_dev = max(
        float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
        for x, y in zip(jax.tree.leaves(state.params), jax.tree.leaves(state_plain.params))
    )
    assert max_dev > 1e-7, max_dev
