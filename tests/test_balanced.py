"""Class-balanced sampling (ManifestLoader(balanced=True)): the reference's
commented-out WeightedRandomSampler intent — each sample weighted by the
inverse of its class count, drawn with replacement, num_samples per epoch
(extras/mast_new/mast/moco_dataset.py:154-166)."""
import os

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.data.make_test_wavs import make
from audiossl_tpu.data.pipeline import ManifestLoader


@pytest.fixture(scope="module")
def skewed_csv(tmp_path_factory):
    # 12 files: class "a" owns 10 of them, class "b" owns 2 — a 5:1 skew
    d = make(str(tmp_path_factory.mktemp("bal")), n=12)
    files = [os.path.join(d, f"wav_{i:03d}.wav") for i in range(12)]
    labels = ["a"] * 10 + ["b"] * 2
    csv = os.path.join(d, "manifest.csv")
    pd.DataFrame({"files": files, "label": labels}).to_csv(csv, index=False)
    return csv


def _loader(csv, **kw):
    return ManifestLoader(
        csv, batch_size=4, clip_samples=1600, labeled=True, seed=7,
        num_workers=1, balanced=True, **kw,
    )


def test_balanced_epoch_rebalances_classes(skewed_csv):
    ld = _loader(skewed_csv)
    # aggregate label counts over many epochs: the 5:1 skew must flatten
    # to ~1:1 (each class gets total weight 1.0 regardless of its size)
    counts = np.zeros(2)
    for ep in range(40):
        for _, labels in ld.epoch(ep):
            counts += np.bincount(labels, minlength=2)
    frac_b = counts[1] / counts.sum()
    assert 0.42 < frac_b < 0.58  # unbalanced would put it at ~1/6


def test_balanced_epoch_deterministic(skewed_csv):
    ld = _loader(skewed_csv)
    a = [l.tolist() for _, l in ld.epoch(3)]
    b = [l.tolist() for _, l in ld.epoch(3)]
    assert a == b
    c = [l.tolist() for _, l in ld.epoch(4)]
    assert a != c  # fresh draw per epoch


def test_balanced_host_shards_partition_one_draw(skewed_csv):
    # pod semantics: every host draws the same weighted order, then takes
    # its rank-strided slice — union of slices == the single-host draw.
    # Exercised through epoch() itself (not its internals) so any change to
    # the balanced seed derivation that breaks pod-host consistency fails
    # here (ADVICE r3): interleaving the hosts' label streams must
    # reconstruct the single-host label stream, epoch after epoch.
    single = _loader(skewed_csv, drop_last=False)
    hosts = [_loader(skewed_csv, host_shard=(i, 2), drop_last=False) for i in range(2)]
    for ep in range(3):
        full = np.concatenate([l for _, l in single.epoch(ep)])
        got = [np.concatenate([l for _, l in ld.epoch(ep)]) for ld in hosts]
        interleaved = np.empty(12, dtype=full.dtype)
        interleaved[0::2], interleaved[1::2] = got[0], got[1]
        assert np.array_equal(interleaved, full), f"epoch {ep}"


def test_balanced_requires_labels(skewed_csv):
    with pytest.raises(ValueError, match="labeled"):
        ManifestLoader(
            skewed_csv, batch_size=4, clip_samples=1600, labeled=False,
            num_workers=1, balanced=True,
        )
