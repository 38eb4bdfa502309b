"""Offline DECAR-v1 pseudo-labeling: features -> k-means -> labeled CSV.

Rebuilds extras/decar-v2/store_clusters.py (SURVEY.md §3.5): run the frozen
encoder over the whole manifest, PCA-whiten + k-means (585 clusters by
default, matching the UnFuSeD task_label count lineage), and write a
(files, label) CSV consumed by `train_upstream.py --upstream unfused`.

Usage:
  python -m audiossl_tpu.objectives.make_pseudo_labels \
      --csv pre_train.csv --checkpoint runs/decar_chkp --out labeled.csv \
      [--clusters 585] [--save_centroids centroids.npy]

`--save_centroids` also exports the (pre-whitening-space) cluster means the
Kmix augmentation needs (centroid_path, augmentations.py:130-136).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.models.audiontt import AudioNTT2020Task6, max_mean_pool
from audiossl_tpu.objectives.clustering import Kmeans
from audiossl_tpu.train import checkpoint as ckpt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--clusters", type=int, default=585)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--length_wave", type=float, default=0.95)
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--output_dim", type=int, default=2048)
    p.add_argument("--file_col", default="files")
    p.add_argument("--save_centroids", default=None)
    args = p.parse_args()

    mel_cfg = LogMelConfig(n_mels=args.n_mels)
    clip = int(args.length_wave * mel_cfg.sample_rate)
    model = AudioNTT2020Task6(n_mels=args.n_mels, d=args.output_dim)
    dummy = jnp.zeros((1, args.n_mels, mel_cfg.num_frames(clip), 1))
    target = model.init({"params": jax.random.key(0)}, dummy, False)
    enc = ckpt.load_encoder(
        args.checkpoint, {"params": target["params"], "batch_stats": target.get("batch_stats", {})}
    )

    @jax.jit
    def embed(waves):
        lms = log_mel(waves, mel_cfg)
        feats = model.apply(
            {"params": enc["params"], "batch_stats": enc["batch_stats"]}, lms[:, :, :, None], False
        )
        # also return the time-averaged mel vector — the space Kmix measures
        # centroid distances in (augmentations.py:146-151)
        return max_mean_pool(feats), jnp.mean(lms, axis=-1)

    loader = ManifestLoader(
        args.csv, args.batch_size, clip, mel_cfg.sample_rate,
        shuffle=False, drop_last=False, file_col=args.file_col,
    )
    feats, mel_avgs = [], []
    for waves, _ in loader.epoch(0):
        f, m = embed(jnp.asarray(waves))
        feats.append(np.asarray(f))
        mel_avgs.append(np.asarray(m))
    features = np.concatenate(feats)[: loader.num_samples]
    mel_avg = np.concatenate(mel_avgs)[: loader.num_samples]

    km = Kmeans(args.clusters)
    loss = km.cluster(features, verbose=True)
    labels = np.empty(len(features), np.int64)
    for c, members in enumerate(km.images_lists):
        labels[members] = c
    pd.DataFrame({"files": loader.files, "label": labels}).to_csv(args.out, index=False)
    print(f"wrote {len(labels)} pseudo-labels ({args.clusters} clusters, kmeans loss {loss:.2f}) to {args.out}")

    if args.save_centroids:
        # Kmix centroids live in time-averaged mel space, [K, n_mels]
        # (augmentations.py:146-151 compares them to mel-avg vectors)
        cents = np.stack([mel_avg[m].mean(axis=0) for m in km.images_lists if m])
        np.save(args.save_centroids, cents)
        print(f"wrote Kmix centroids {cents.shape} to {args.save_centroids}")


if __name__ == "__main__":
    main()
