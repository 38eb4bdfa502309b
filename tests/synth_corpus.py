"""Synthetic labeled audio corpora for the full-pipeline parity tests.

Built to land linear probes OFF the accuracy ceiling (VERDICT r4 Weak #1 /
Next #1): 8 pitch classes on a geometric f0 ladder, each clip buried in
white noise at a per-clip SNR drawn from ``snr_db`` = (-22, -15) dB —
measured to put a random-init AudioNTT ridge probe at ~0.75 and a
24-step-pretrained one at ~0.72 on 72 held-out items (chance 0.125), i.e.
mid-range with real headroom in both directions. Additional per-clip
nuisance: f0 jitter, random harmonic phase, 2-8 Hz amplitude modulation of
random depth, level jitter.

Tuning notes (round 5, recorded so nobody re-derives them): harmonic-
envelope classes with shared fundamentals measured rand-init ~0.36-0.43 —
too close to the floor; pitch classes above -14 dB SNR measured 1.00 —
ceiling; the -22..-15 dB band is the knee. Short-schedule Barlow
pretraining (24/96/192 steps, 128 clips) lands AT OR BELOW the random-init
probe on every corpus variant measured (e.g. 192 steps: 0.625 vs 0.750) —
a property of the objective at toy scale, not of either pipeline — which
is why the parity tests compare the pretraining EFFECT across frameworks
instead of asserting pretrained > random.
"""
from __future__ import annotations

import os

import numpy as np

SR = 16000
WAV_LEN = 17600  # 1.1 s: longer than the 0.95 s window -> random crops differ
N_CLASSES = 8
F0S = tuple(200.0 * (2000.0 / 200.0) ** (np.arange(N_CLASSES) / (N_CLASSES - 1)))
SNR_DB = (-22.0, -15.0)  # the measured off-ceiling knee (module docstring)


def synth_clip(c: int, rng, snr_db=SNR_DB, wav_len: int = WAV_LEN):
    f0 = F0S[c] * (1.0 + 0.03 * rng.standard_normal())
    t = np.arange(wav_len) / SR
    w = np.sin(2 * np.pi * f0 * t + rng.random() * 2 * np.pi)
    w += 0.5 * np.sin(2 * np.pi * 2 * f0 * t + rng.random() * 2 * np.pi)
    am_rate = 2.0 + 6.0 * rng.random()
    am_depth = 0.3 + 0.5 * rng.random()
    w *= 1.0 - am_depth * 0.5 * (1 + np.sin(2 * np.pi * am_rate * t + rng.random() * 2 * np.pi))
    amp = 0.25 + 0.2 * rng.random()
    w *= amp / (np.abs(w).max() + 1e-9)
    lo, hi = snr_db
    snr = lo + (hi - lo) * rng.random()
    noise = rng.standard_normal(wav_len)
    noise *= np.sqrt(np.mean(w**2)) / np.sqrt(np.mean(noise**2)) * 10 ** (-snr / 20)
    return np.clip(w + noise, -1, 1)


def write_corpus(
    d: str,
    n_classes: int,
    n_per_class: int,
    seed: int,
    wav_len: int = WAV_LEN,
    snr_db=SNR_DB,
):
    """Write 16-bit WAVs; returns (files, labels)."""
    import scipy.io.wavfile as wavfile

    assert n_classes <= N_CLASSES
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    files, labels = [], []
    for c in range(n_classes):
        for i in range(n_per_class):
            w = synth_clip(c, rng, snr_db=snr_db, wav_len=wav_len)
            path = os.path.join(d, f"c{c}_{i:03d}.wav")
            wavfile.write(path, SR, (w * 32767).astype(np.int16))
            files.append(path)
            labels.append(c)
    return files, np.asarray(labels)


def dual_ridge_probe(train_x, train_y, test_x, test_y, lam=1e-2):
    """Deterministic closed-form linear probe, identical for every caller.
    Embeddings are standardized per feature first so differently scaled
    embedding spaces get the same treatment."""
    mu, sd = train_x.mean(0), train_x.std(0) + 1e-6
    train_x, test_x = (train_x - mu) / sd, (test_x - mu) / sd
    y = np.eye(int(train_y.max()) + 1)[train_y]
    k = train_x @ train_x.T
    alpha = np.linalg.solve(k + lam * np.eye(len(train_x)), y)
    pred = (test_x @ train_x.T) @ alpha
    return float((pred.argmax(1) == test_y).mean())
