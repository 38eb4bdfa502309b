"""Offline feature extraction: WAV manifests -> .npy log-mel (or embeddings).

Rebuilds extras/datasets/extract_features.py (parallel offline log-mel) and
extras/decar-v2/store_clusters.py's compute_features stage, TPU-style: host
threads decode, the device computes log-mel (and optionally encoder
embeddings) in large batches instead of per-file CPU STFT.

Usage:
  python -m audiossl_tpu.downstream.extract_features --csv manifest.csv \
      --out feats_dir [--file_col wav] [--duration 1.0] [--l2_norm] \
      [--checkpoint <upstream ckpt dir>]   # embeddings instead of log-mel
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.ops.stats import l2_normalize


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--file_col", default="AudioPath")
    p.add_argument("--duration", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--l2_norm", action="store_true", help="L2-normalize waveforms (extract_features.py:68)")
    p.add_argument("--checkpoint", default=None, help="emit encoder embeddings instead of log-mels")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    clip = int(args.duration * args.sample_rate)
    mel_cfg = LogMelConfig(sample_rate=args.sample_rate, n_mels=args.n_mels)
    loader = ManifestLoader(
        args.csv, args.batch_size, clip, args.sample_rate,
        shuffle=False, drop_last=False, file_col=args.file_col,
    )

    encoder_apply = None
    if args.checkpoint:
        from audiossl_tpu.models.audiontt import AudioNTT2020Task6
        from audiossl_tpu.train import checkpoint as ckpt

        model = AudioNTT2020Task6(n_mels=args.n_mels, d=2048)
        dummy = jnp.zeros((1, args.n_mels, mel_cfg.num_frames(clip), 1))
        target = model.init({"params": jax.random.key(0)}, dummy, False)
        enc_vars = ckpt.load_encoder(
            args.checkpoint, {"params": target["params"], "batch_stats": target.get("batch_stats", {})}
        )

        @jax.jit
        def encoder_apply(waves):
            lms = log_mel(waves, mel_cfg)[:, :, :, None]
            feats = model.apply(
                {"params": enc_vars["params"], "batch_stats": enc_vars["batch_stats"]}, lms, False
            )
            return jnp.mean(feats, axis=1)

    @jax.jit
    def frontend(waves):
        if args.l2_norm:
            waves = l2_normalize(waves, axis=-1)
        return log_mel(waves, mel_cfg)

    # mirror the manifest's directory structure so identical basenames in
    # different class dirs (speech-commands layout) don't collide
    common = os.path.commonpath([os.path.abspath(f) for f in loader.files]) if len(loader.files) > 1 else os.path.dirname(os.path.abspath(loader.files[0]))
    pos = 0
    for waves, _ in loader.epoch(0):
        w = jnp.asarray(waves)
        out = np.asarray(encoder_apply(w) if encoder_apply else frontend(w))
        for i in range(len(out)):
            rel = os.path.relpath(os.path.abspath(loader.files[pos + i]), common)
            dst = os.path.join(args.out, rel + ".npy")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            np.save(dst, out[i])
        pos += len(out)
    print(f"wrote {pos} feature files to {args.out}")


if __name__ == "__main__":
    main()
