"""Dataset normalization statistics (mean/std of log-mel or fbank features).

Rebuilds extras/mast_new/mast/get_norm_stats.py:16-30: iterate the manifest,
accumulate feature mean/std for PrecomputedNorm / the MAST input norm.

Usage:
  python -m audiossl_tpu.data.norm_stats --csv manifest.csv [--fbank]
      [--file_col files] [--duration 0.95]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.frontend import FrontendSpec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--file_col", default="files")
    p.add_argument("--duration", type=float, default=0.95)
    p.add_argument("--sample_rate", type=int, default=16000)
    p.add_argument("--n_mels", type=int, default=64)
    p.add_argument("--fbank", action="store_true")
    p.add_argument("--target_length", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=256)
    args = p.parse_args()

    spec = FrontendSpec(
        kind="fbank" if args.fbank else "logmel",
        n_mels=args.n_mels,
        sample_rate=args.sample_rate,
        target_length=args.target_length,
    )
    clip = int(args.duration * args.sample_rate)
    loader = ManifestLoader(
        args.csv, args.batch_size, clip, args.sample_rate,
        shuffle=False, drop_last=False, file_col=args.file_col,
    )

    @jax.jit
    def moments(waves):
        f = spec(waves)
        return jnp.sum(f), jnp.sum(jnp.square(f)), f.size

    tot = sq = cnt = 0.0
    for waves, _ in loader.epoch(0):
        s, s2, n = moments(jnp.asarray(waves))
        tot += float(s)
        sq += float(s2)
        cnt += float(n)
    mean = tot / cnt
    std = float(np.sqrt(max(sq / cnt - mean * mean, 0.0)))
    print(json.dumps({"mean": mean, "std": std, "n_elements": int(cnt)}))


if __name__ == "__main__":
    main()
