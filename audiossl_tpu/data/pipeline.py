"""CSV-manifest input pipeline: decode on host threads, window, batch.

The reference's hot path (SURVEY.md §3.1) spends its CPU budget on
per-worker librosa STFT; here the host only decodes WAV bytes and crops a
fixed window — the frontend runs jitted on-device inside the train step, so
the pipeline emits raw waveform batches ``[B, clip_samples] float32``.

Threaded prefetch replaces torch DataLoader workers (decode is
release-the-GIL NumPy work). Epoch shuffling is seeded like
DistributedSampler(shuffle=True, seed=...) (train_downstream.py:63).
"""
from __future__ import annotations

import concurrent.futures as cf
import logging
import threading
from queue import Queue
from typing import Iterator

import numpy as np
import pandas as pd

from audiossl_tpu.data.wav import load_wave
from audiossl_tpu.ops.windowing import extract_window_np

log = logging.getLogger("audiossl_tpu.data")


class ManifestLoader:
    """Iterates (waves [B, L] f32, labels [B] i32 | None) batches from a CSV.

    CSV schema matches the reference upstream dataset: column ``files``
    (+ optional ``label`` for UnFuSeD pseudo-labels)
    (src/dataset/upstream_dataset.py:50-88).
    """

    def __init__(
        self,
        csv_path: str,
        batch_size: int,
        clip_samples: int,
        sample_rate: int = 16000,
        labeled: bool = False,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        file_col: str = "files",
        label_col: str = "label",
        labels_map: dict | None = None,
        path_prefix: str | None = None,
        wire_dtype: str = "float32",  # 'int16' halves host->device bytes
        host_shard: tuple[int, int] | None = None,  # (process_index, process_count)
        on_error: str = "raise",  # 'zeros': warn + silence clip for bad files
        balanced: bool = False,  # inverse-class-frequency sampling w/ replacement
    ):
        # 'raise' (default) keeps strict semantics; 'zeros' is the
        # production policy for web-scale corpora where a handful of
        # corrupt/missing files must not kill a pod-day of training — the
        # bad clip becomes silence (the C++ loader already zero-fills
        # failures before reporting them) and a warning names the file.
        if on_error not in ("raise", "zeros"):
            raise ValueError(f"on_error must be 'raise' or 'zeros', got {on_error!r}")
        self.on_error = on_error
        self.wire_dtype = wire_dtype
        # multi-host pod training: every host seeds the same global
        # permutation and takes its rank-strided slice — torch
        # DistributedSampler semantics (train_downstream.py:63), padded by
        # wrapping so all hosts see the same batch count
        self.host_shard = host_shard
        # a pre-built DataFrame is accepted for in-memory splits (the LAPE
        # single-CSV tasks' 80/20 stratified train/test split)
        if isinstance(csv_path, pd.DataFrame):
            self.df = csv_path.reset_index(drop=True)
        else:
            self.df = pd.read_csv(csv_path)
        self.files = self.df[file_col].tolist()
        if path_prefix:
            import os

            self.files = [os.path.join(path_prefix, f) for f in self.files]
        # tar-shard corpora (data/tar.py): `shard.tar::member` rows are
        # per-clip byte ranges; a bare `shard.tar` row expands to all its
        # .wav members (unlabeled only — expansion changes the row count,
        # so labeled manifests must address members explicitly)
        from audiossl_tpu.data import tar as tarmod

        if any(f.endswith(".tar") and not tarmod.is_tar_entry(f) for f in self.files):
            if labeled:
                raise ValueError(
                    "bare .tar manifest rows cannot carry labels; list "
                    "`shard.tar::member.wav` rows with a label column instead"
                )
            self.files = tarmod.expand_manifest(self.files)
        self._any_tar = any(tarmod.is_tar_entry(f) for f in self.files)
        self.labels = None
        if labeled:
            # reuse the train split's mapping for valid/test (train_downstream.py:59)
            self.label_to_id = labels_map or {
                l: i for i, l in enumerate(sorted(set(self.df[label_col])))
            }
            self.labels = np.asarray([self.label_to_id[l] for l in self.df[label_col]], np.int32)
        # class-balanced epoch: draw num_samples indices WITH replacement,
        # each sample weighted 1/count(its class) — the reference's
        # (commented-out) WeightedRandomSampler intent for long-tailed
        # corpora (extras/mast_new/mast/moco_dataset.py:154-166). Seeded per
        # epoch like the shuffle, so pod hosts draw the same global order
        # and rank-slice it.
        self.balanced = balanced
        if balanced:
            if self.labels is None:
                raise ValueError("balanced=True requires a labeled manifest")
            counts = np.bincount(self.labels)
            w = 1.0 / counts[self.labels]
            self._balanced_p = w / w.sum()
        self.batch_size = batch_size
        self.clip_samples = clip_samples
        self.sample_rate = sample_rate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = num_workers

    def __len__(self) -> int:
        n = len(self.files)
        if self.host_shard is not None:
            n = -(-n // self.host_shard[1])  # padded per-host sample count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def num_samples(self) -> int:
        return len(self.files)

    def _load_one(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        try:
            f = self.files[idx]
            if self._any_tar:
                from audiossl_tpu.data import tar as tarmod

                if tarmod.is_tar_entry(f):
                    from audiossl_tpu.data.wav import load_wave_bytes

                    wave = load_wave_bytes(tarmod.read_entry_bytes(f), self.sample_rate)
                else:
                    wave = load_wave(f, self.sample_rate)
            else:
                wave = load_wave(f, self.sample_rate)
        except Exception:
            if self.on_error != "zeros":
                raise
            log.warning("bad audio file, substituting silence: %s", self.files[idx])
            return np.zeros(self.clip_samples, np.float32)
        return extract_window_np(wave, self.clip_samples, rng)

    def _host_slice(self, order: np.ndarray) -> np.ndarray:
        """Rank-strided slice of the (identically seeded) global permutation,
        wrapped to equal length per host like DistributedSampler's padding."""
        index, count = self.host_shard
        total = -(-len(order) // count) * count
        if total > len(order):
            order = np.concatenate([order, order[: total - len(order)]])
        return order[index::count]

    def epoch(self, epoch: int = 0, order: np.ndarray | None = None) -> Iterator:
        """``order`` overrides the shuffle with an explicit index sequence
        (the DeepCluster-v1 UnifLabelSampler epoch — utils.py:105-148)."""
        if order is None:
            if self.balanced:
                # weighted draw is already a random order; `shuffle` is moot
                order = np.random.default_rng(self.seed + epoch).choice(
                    len(self.files), size=len(self.files), replace=True,
                    p=self._balanced_p,
                )
            else:
                order = np.arange(len(self.files))
                if self.shuffle:
                    np.random.default_rng(self.seed + epoch).shuffle(order)
        else:
            order = np.asarray(order)
        if self.host_shard is not None:
            order = self._host_slice(order)
        n_batches = (
            len(order) // self.batch_size
            if self.drop_last
            else -(-len(order) // self.batch_size)
        )
        # Mix the host rank into the stream seeds ONLY when host-sharded:
        # single-host runs keep the original (seed, epoch[, b]) derivation,
        # so pre-pod checkpoints resume onto bit-identical batch/window
        # streams (ADVICE r2: determinism break across the pod-path commit).
        host_key = [self.host_shard[0]] if self.host_shard else []
        rng = np.random.default_rng((self.seed, epoch, *host_key))

        from audiossl_tpu.data import native

        use_native = native.available()

        def make_batch(b: int):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            if use_native:
                # C++ decode+window pool (data/_native/wavloader.cpp);
                # SeedSequence mixes (seed, epoch, batch) collision-free
                batch_seed = int(
                    np.random.SeedSequence(
                        [self.seed, epoch, b, *host_key]
                    ).generate_state(1)[0]
                )
                batch_files = [self.files[i] for i in idxs]
                offsets = lengths = None
                if self._any_tar:
                    from audiossl_tpu.data import tar as tarmod

                    batch_files, offsets, lengths = tarmod.resolve_ranges(batch_files)
                waves = native.load_batch(
                    batch_files,
                    self.clip_samples,
                    self.sample_rate,
                    seed=batch_seed,
                    n_threads=max(self.num_workers, 1),
                    on_error=self.on_error,
                    offsets=offsets,
                    lengths=lengths,
                )
            else:
                waves = np.stack([self._load_one(i, rng) for i in idxs]).astype(np.float32)
            if self.wire_dtype == "int16":
                # PCM16 wire format: -90 dB quantization floor, halves the
                # host->device transfer (the jitted step rescales)
                waves = np.clip(waves * 32768.0, -32768, 32767).astype(np.int16)
            if self.labels is not None:
                return waves, self.labels[idxs]
            return waves, None

        if self.num_workers <= 1:
            for b in range(n_batches):
                yield make_batch(b)
            return

        # native path: avl_load_batch parallelizes internally on a C++ thread
        # pool — nesting it inside the Python pool oversubscribes (workers x
        # n_threads std::threads per batch); one producer thread suffices
        yield from self._prefetched(make_batch, n_batches, pool_workers=1 if use_native else self.num_workers)

    def _prefetched(self, make_batch, n_batches: int, pool_workers: int | None = None):
        pool_workers = pool_workers or self.num_workers

        # bounded prefetch: overlap host decode with device compute
        q: Queue = Queue(maxsize=4)
        stop = threading.Event()

        def producer():
            try:
                with cf.ThreadPoolExecutor(pool_workers) as pool:
                    futs = [pool.submit(make_batch, b) for b in range(min(4, n_batches))]
                    nxt = len(futs)
                    for i in range(n_batches):
                        if stop.is_set():
                            for f in futs:
                                f.cancel()
                            return
                        q.put(futs.pop(0).result())
                        if nxt < n_batches:
                            futs.append(pool.submit(make_batch, nxt))
                            nxt += 1
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)
                return
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class NpyFeatureLoader:
    """Batches of precomputed features (the LAPE `_avg` offline workflow:
    extras/datasets load .npy log-mels written by extract_features.py).

    CSV columns: a feature-path column (+ label). Yields
    ([B, ...feature shape], labels) like ManifestLoader, skipping decode and
    the on-device frontend.
    """

    def __init__(
        self,
        csv_path: str,
        batch_size: int,
        labeled: bool = True,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        file_col: str = "AudioPath",
        label_col: str = "Label",
        labels_map: dict | None = None,
        path_prefix: str | None = None,
        suffix: str = ".npy",
    ):
        import os

        self.df = pd.read_csv(csv_path)
        self.files = [
            os.path.join(path_prefix, f) if path_prefix else f for f in self.df[file_col]
        ]
        self.files = [f if f.endswith(suffix) else f + suffix for f in self.files]
        self.labels = None
        self.label_to_id = labels_map
        if labeled:
            self.label_to_id = labels_map or {
                l: i for i, l in enumerate(sorted(set(self.df[label_col])))
            }
            self.labels = np.asarray([self.label_to_id[l] for l in self.df[label_col]], np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed

    @property
    def num_samples(self) -> int:
        return len(self.files)

    def __len__(self) -> int:
        n = len(self.files)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0):
        order = np.arange(len(self.files))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        for b in range(len(self)):
            idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
            feats = np.stack([np.load(self.files[i]) for i in idxs]).astype(np.float32)
            yield feats, (self.labels[idxs] if self.labels is not None else None)
