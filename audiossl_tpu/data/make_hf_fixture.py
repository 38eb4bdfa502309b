"""Build a tiny speech_commands-shaped HF dataset fixture, offline.

The reference's HF downstream path loads speech_commands from the hub
(src/dataset/downstream_dataset.py:13-63, src/utils/utils.py:31-41). This
sandbox has no egress, so tests (and offline clusters) instead point
``HFLoader`` at a ``datasets.save_to_disk`` directory via
``AUDIOSSL_HF_DATA_DIR`` / ``data_dir``. This module generates that fixture:
a DatasetDict with train/validation/test splits whose rows have the same
shape as decoded speech_commands rows — ``{"audio": {"array": float32[...],
"sampling_rate": 16000}, "label": ClassLabel}``.

The installed datasets==5.0.0 needs torchcodec to encode real ``Audio``
features, which is also absent; a plain struct column stores the decoded
arrays directly, which is exactly what ``HFLoader`` consumes.

Clips are deterministic synthetic tones (class-dependent frequency + noise)
so linear probes on the fixture can actually separate the classes.

Usage: python -m audiossl_tpu.data.make_hf_fixture <out_dir> [n_train]
"""
from __future__ import annotations

import sys

import numpy as np

# 12-class speech_commands-v2 style vocabulary (extras/datasets/
# speech_commands_v2_avg.py:21 fixed dict)
LABEL_NAMES = [
    "yes", "no", "up", "down", "left", "right",
    "on", "off", "stop", "go", "_silence_", "_unknown_",
]
SAMPLE_RATE = 16000
CLIP_SAMPLES = 3200  # 0.2 s — keeps the checked-in fixture < 2 MB


def _make_split(n: int, seed: int, features):
    from datasets import Dataset

    rng = np.random.default_rng(seed)
    labels = [i % len(LABEL_NAMES) for i in range(n)]
    t = np.arange(CLIP_SAMPLES, dtype=np.float32) / SAMPLE_RATE
    rows = []
    for i, lab in enumerate(labels):
        freq = 300.0 + 120.0 * lab
        phase = rng.uniform(0, 2 * np.pi)
        wave = 0.5 * np.sin(2 * np.pi * freq * t + phase) + 0.05 * rng.standard_normal(
            CLIP_SAMPLES
        )
        if LABEL_NAMES[lab] == "_silence_":
            wave = 0.01 * rng.standard_normal(CLIP_SAMPLES)
        rows.append({"array": wave.astype(np.float32), "sampling_rate": SAMPLE_RATE})
    return Dataset.from_dict({"audio": rows, "label": labels}, features=features)


def build_fixture(out_dir: str, n_train: int = 72, n_valid: int = 24, n_test: int = 24) -> None:
    from datasets import ClassLabel, DatasetDict, Features, Sequence, Value

    features = Features(
        {
            "audio": {"array": Sequence(Value("float32")), "sampling_rate": Value("int32")},
            "label": ClassLabel(names=LABEL_NAMES),
        }
    )
    dd = DatasetDict(
        {
            "train": _make_split(n_train, 0, features),
            "validation": _make_split(n_valid, 1, features),
            "test": _make_split(n_test, 2, features),
        }
    )
    dd.save_to_disk(out_dir)


if __name__ == "__main__":
    build_fixture(sys.argv[1], *(int(a) for a in sys.argv[2:]))
