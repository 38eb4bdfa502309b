"""Multi-host data sharding (ManifestLoader.host_shard): DistributedSampler
semantics — identically seeded global permutation, rank-strided slices,
wrap-padding to equal per-host length (train_downstream.py:63-66)."""
import os

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.data.make_test_wavs import make
from audiossl_tpu.data.pipeline import ManifestLoader


@pytest.fixture(scope="module")
def wav_csv(tmp_path_factory):
    d = make(str(tmp_path_factory.mktemp("hs")), n=10)
    files = [os.path.join(d, f"wav_{i:03d}.wav") for i in range(10)]
    csv = os.path.join(d, "manifest.csv")
    pd.DataFrame({"files": files}).to_csv(csv, index=False)
    return csv


def _loader(csv, index, count, **kw):
    return ManifestLoader(
        csv, batch_size=2, clip_samples=1600, seed=3, num_workers=1,
        host_shard=(index, count), **kw,
    )


def test_host_slices_cover_and_are_disjoint(wav_csv):
    loaders = [_loader(wav_csv, i, 4) for i in range(4)]
    # same epoch seed -> same global permutation on every "host"
    perm = np.arange(10)
    np.random.default_rng(3 + 1).shuffle(perm)
    slices = [ld._host_slice(perm.copy()) for ld in loaders]
    assert all(len(s) == 3 for s in slices)  # ceil(10/4) each, wrap-padded
    union = np.concatenate(slices)
    assert set(union.tolist()) == set(range(10))  # full coverage
    # only the wrap-pad (12 - 10 = 2 slots) repeats
    _, counts = np.unique(union, return_counts=True)
    assert counts.sum() == 12 and (counts >= 1).all() and (counts <= 2).sum() == len(counts)


def test_equal_batch_count_across_hosts(wav_csv):
    loaders = [_loader(wav_csv, i, 2) for i in range(2)]
    assert len(set(len(ld) for ld in loaders)) == 1
    for ld in loaders:
        batches = list(ld.epoch(0))
        assert len(batches) == len(ld)
        for waves, labels in batches:
            assert waves.shape == (2, 1600)
            assert labels is None


def test_single_host_path_unchanged(wav_csv):
    a = ManifestLoader(wav_csv, batch_size=2, clip_samples=1600, seed=3, num_workers=1)
    b = _loader(wav_csv, 0, 1)
    assert len(a) == len(b)
    wa, _ = next(iter(a.epoch(0)))
    wb, _ = next(iter(b.epoch(0)))
    # host 0 of 1 sees the identical stream (same permutation, same windows)
    np.testing.assert_array_equal(wa, wb)
