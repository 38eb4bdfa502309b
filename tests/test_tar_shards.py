"""Tar-shard corpora (data/tar.py): byte-range loading == per-file loading.

Production manifests address clips inside large tar archives
(`shard.tar::member.wav`) instead of one file per clip; the loader must
produce bit-identical batches either way (same decode, same window seeds)
on both the NumPy and native C++ paths.
"""
import os
import tarfile

import numpy as np
import pandas as pd
import pytest

from audiossl_tpu.data import native
from audiossl_tpu.data import tar as tarmod
from audiossl_tpu.data.pipeline import ManifestLoader
from audiossl_tpu.data.wav import write_wav

SR = 16000
CLIP = 4096


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """12 tiny WAVs (varied lengths: some padded, some cropped), packed
    into 5-clip tar shards, plus plain + sharded manifests."""
    root = tmp_path_factory.mktemp("tar_corpus")
    rng = np.random.default_rng(7)
    files = []
    for i in range(12):
        n = int(rng.integers(CLIP // 2, 2 * CLIP))
        w = rng.standard_normal(n).astype(np.float32) * 0.3
        p = str(root / f"clip_{i:02d}.wav")
        write_wav(p, w, SR)
        files.append(p)
    shard_dir = str(root / "shards")
    entries = tarmod.write_shards(files, shard_dir, shard_clips=5)
    plain_csv = str(root / "plain.csv")
    shard_csv = str(root / "sharded.csv")
    pd.DataFrame({"files": files}).to_csv(plain_csv, index=False)
    pd.DataFrame({"files": entries}).to_csv(shard_csv, index=False)
    return {"files": files, "entries": entries, "plain_csv": plain_csv,
            "shard_csv": shard_csv, "shard_dir": shard_dir}


def _batches(csv, **kw):
    loader = ManifestLoader(
        csv, batch_size=4, clip_samples=CLIP, sample_rate=SR,
        shuffle=True, seed=3, num_workers=1, wire_dtype="float32", **kw,
    )
    return [w for w, _ in loader.epoch(0)]


def test_write_shards_layout(corpus):
    shards = sorted(f for f in os.listdir(corpus["shard_dir"]) if f.endswith(".tar"))
    assert len(shards) == 3  # 12 clips / 5 per shard
    assert len(corpus["entries"]) == 12
    with tarfile.open(os.path.join(corpus["shard_dir"], shards[0])) as tf:
        assert len(tf.getmembers()) == 5


def test_numpy_path_parity(corpus, monkeypatch):
    monkeypatch.setattr(native, "available", lambda: False)
    plain = _batches(corpus["plain_csv"])
    shard = _batches(corpus["shard_csv"])
    assert len(plain) == len(shard) == 3
    for a, b in zip(plain, shard):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_path_parity(corpus):
    plain = _batches(corpus["plain_csv"])
    shard = _batches(corpus["shard_csv"])
    for a, b in zip(plain, shard):
        np.testing.assert_array_equal(a, b)


def test_bare_tar_expansion(corpus):
    shards = sorted(
        os.path.join(corpus["shard_dir"], f)
        for f in os.listdir(corpus["shard_dir"])
        if f.endswith(".tar")
    )
    df = pd.DataFrame({"files": shards})
    loader = ManifestLoader(
        df, batch_size=4, clip_samples=CLIP, sample_rate=SR,
        shuffle=False, num_workers=1, wire_dtype="float32",
    )
    assert loader.num_samples == 12
    assert all(tarmod.is_tar_entry(f) for f in loader.files)
    # expansion preserves archive order within each shard
    first = tarmod.split_entry(loader.files[0])
    with tarfile.open(shards[0]) as tf:
        assert first[1] == tf.getmembers()[0].name


def test_bare_tar_labeled_rejected(corpus):
    shards = [f for f in os.listdir(corpus["shard_dir"]) if f.endswith(".tar")]
    df = pd.DataFrame({
        "files": [os.path.join(corpus["shard_dir"], shards[0])],
        "label": ["x"],
    })
    with pytest.raises(ValueError, match="bare .tar"):
        ManifestLoader(df, batch_size=1, clip_samples=CLIP, labeled=True)


def test_labeled_member_rows(corpus):
    df = pd.DataFrame({
        "files": corpus["entries"],
        "label": [f"c{i % 3}" for i in range(12)],
    })
    loader = ManifestLoader(
        df, batch_size=4, clip_samples=CLIP, sample_rate=SR,
        shuffle=False, num_workers=1, wire_dtype="float32", labeled=True,
    )
    waves, labels = next(loader.epoch(0))
    assert waves.shape == (4, CLIP) and labels.shape == (4,)
    assert labels.tolist() == [0, 1, 2, 0]


@pytest.mark.parametrize("force_numpy", [True, False])
def test_missing_member_on_error(corpus, monkeypatch, force_numpy):
    if force_numpy:
        monkeypatch.setattr(native, "available", lambda: False)
    elif not native.available():
        pytest.skip("no native toolchain")
    bad = corpus["entries"][:3] + [corpus["entries"][0].split("::")[0] + "::nope.wav"]
    df = pd.DataFrame({"files": bad})
    kw = dict(batch_size=4, clip_samples=CLIP, sample_rate=SR,
              shuffle=False, num_workers=1, wire_dtype="float32")
    with pytest.raises(Exception):
        next(ManifestLoader(df, on_error="raise", **kw).epoch(0))
    waves, _ = next(ManifestLoader(df, on_error="zeros", **kw).epoch(0))
    assert np.all(waves[3] == 0) and np.any(waves[0] != 0)


def test_cli_main(corpus, tmp_path, monkeypatch, capsys):
    out_dir = str(tmp_path / "cli_shards")
    monkeypatch.setattr(
        "sys.argv",
        ["tar", corpus["plain_csv"], out_dir, "--shard-clips", "6"],
    )
    tarmod.main()
    out_csv = capsys.readouterr().out.strip()
    df = pd.read_csv(out_csv)
    assert len(df) == 12
    assert all(tarmod.is_tar_entry(f) for f in df["files"])
    loader = ManifestLoader(
        out_csv, batch_size=4, clip_samples=CLIP, sample_rate=SR,
        shuffle=False, num_workers=1, wire_dtype="float32",
    )
    waves, _ = next(loader.epoch(0))
    assert waves.shape == (4, CLIP)
