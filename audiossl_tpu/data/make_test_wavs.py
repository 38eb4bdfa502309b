"""Generate tiny synthetic WAVs + manifest CSVs for smoke tests / verification.

Usage: python -m audiossl_tpu.data.make_test_wavs <out_dir> [n] [--unlabeled]
Writes <out_dir>/wav_XXX.wav, <out_dir>/pretrain.csv (column `files`
[+ `label`]), and <out_dir>/downstream_{train,test}.csv (columns `wav`,`label`).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from audiossl_tpu.data.wav import write_wav


def make(out_dir: str, n: int = 32, sr: int = 16000, labeled: bool = True, seed: int = 0):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    bands = (220.0, 650.0, 1900.0, 5200.0)  # disjoint per-class bands
    for i in range(n):
        dur = rng.uniform(0.7, 1.4)
        t = np.arange(int(dur * sr)) / sr
        klass = i % 4
        f0 = bands[klass] * rng.uniform(1.0, 1.25)
        wave = 0.4 * np.sin(2 * np.pi * f0 * t)
        wave += 0.1 * rng.standard_normal(len(t))
        path = os.path.join(out_dir, f"wav_{i:03d}.wav")
        write_wav(path, wave.astype(np.float32), sr)
        rows.append({"files": path, "wav": path, "label": klass})
    df = pd.DataFrame(rows)
    cols = ["files", "label"] if labeled else ["files"]
    df[cols].to_csv(os.path.join(out_dir, "pretrain.csv"), index=False)
    half = n // 2
    df[["wav", "label"]][:half].to_csv(os.path.join(out_dir, "downstream_train.csv"), index=False)
    df[["wav", "label"]][half:].to_csv(os.path.join(out_dir, "downstream_test.csv"), index=False)
    return out_dir


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("out_dir", nargs="?", default="/tmp/audiossl_test_wavs")
    p.add_argument("n", nargs="?", type=int, default=32)
    p.add_argument("--unlabeled", action="store_true", help="omit the label column from pretrain.csv")
    a = p.parse_args()
    make(a.out_dir, a.n, labeled=not a.unlabeled)
    print(a.out_dir)
