"""HuggingFace-datasets path for downstream tasks (speech_commands v1/v2).

Rebuilds DownstreamDatasetHF (src/dataset/downstream_dataset.py:13-63) +
the availability map (src/utils/utils.py:31-41): speech_commands variants
load via `datasets.load_dataset('speech_commands', 'v0.01'|'v0.02')`; the
v2-35 variant re-labels to the 35-word vocabulary. Offline environments
(no egress) point ``data_dir`` / ``AUDIOSSL_HF_DATA_DIR`` at a
``datasets.save_to_disk`` directory instead (see data/make_hf_fixture.py).
"""
from __future__ import annotations

import os

import numpy as np

from audiossl_tpu.ops.windowing import extract_window_np

HF_TASKS = {"speech_commands_v1": "v0.01", "speech_commands_v2": "v0.02", "speech_commands_v235": "v0.02"}


def hf_available(task: str) -> bool:
    return task in HF_TASKS


class HFLoader:
    """Same batch interface as ManifestLoader: epoch() -> (waves, labels)."""

    def __init__(
        self,
        task: str,
        split: str,
        batch_size: int,
        clip_samples: int,
        sample_rate: int = 16000,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        data_dir: str | None = None,
        balanced: bool = False,
        host_shard: tuple[int, int] | None = None,  # (process_index, process_count)
    ):
        version = HF_TASKS[task]
        data_dir = data_dir or os.environ.get("AUDIOSSL_HF_DATA_DIR")
        if data_dir:  # offline save_to_disk directory (make_hf_fixture.py)
            from datasets import load_from_disk

            splits = load_from_disk(data_dir)
            if split not in splits:
                raise ValueError(f"split {split!r} not in offline dataset {data_dir}")
            self.dataset = splits[split]
        else:
            from datasets import load_dataset  # local HF cache or network

            self.dataset = load_dataset("speech_commands", version, split=split)
        names = self.dataset.features["label"].names
        self.label_to_id = {n: i for i, n in enumerate(names)}
        self.no_of_classes = len(names)
        self.batch_size = batch_size
        self.clip_samples = clip_samples
        self.sample_rate = sample_rate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        # class-balanced epochs: inverse-class-frequency draw WITH
        # replacement, seeded per epoch — ManifestLoader(balanced=True)
        # semantics (the reference's commented-out WeightedRandomSampler
        # intent, extras/mast_new/mast/moco_dataset.py:154-166) on the
        # HF-hosted tasks, whose speech_commands splits are long-tailed
        # (_silence_ is ~10x rarer than the word classes).
        self.balanced = balanced
        # Multi-host pods: every host draws the SAME global order (identical
        # seed — balanced draw included), then takes a rank-strided slice, so
        # batches never duplicate across hosts (ManifestLoader's shared-draw
        # + host-slice contract, data/pipeline.py:_host_slice).
        self.host_shard = host_shard
        if balanced:
            labels = np.asarray(self.dataset["label"], np.int64)
            counts = np.bincount(labels, minlength=self.no_of_classes)
            w = 1.0 / counts[labels]
            self._balanced_p = w / w.sum()

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.host_shard is not None:
            n = -(-n // self.host_shard[1])  # padded per-host sample count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _host_slice(self, order: np.ndarray) -> np.ndarray:
        """Rank-strided slice of the (identically seeded) global order,
        wrapped to equal length per host like DistributedSampler's padding."""
        index, count = self.host_shard
        total = -(-len(order) // count) * count
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        return order[index::count]

    def epoch(self, epoch: int = 0):
        if self.balanced:
            # weighted draw is already a random order; `shuffle` is moot
            order = np.random.default_rng(self.seed + epoch).choice(
                len(self.dataset), size=len(self.dataset), replace=True,
                p=self._balanced_p,
            )
        else:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(order)
        if self.host_shard is not None:
            order = self._host_slice(order)
        # rank mixed into window-crop seeds only when host-sharded, so
        # single-host streams stay bit-identical to pre-pod checkpoints
        # (same discipline as ManifestLoader.epoch)
        host_key = [self.host_shard[0]] if self.host_shard else []
        rng = np.random.default_rng((self.seed, epoch, *host_key))
        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            waves, labels = [], []
            for i in idxs:
                row = self.dataset[int(i)]
                wave = np.asarray(row["audio"]["array"], np.float32)
                waves.append(extract_window_np(wave, self.clip_samples, rng))
                labels.append(row["label"])
            yield np.stack(waves), np.asarray(labels, np.int32)
