"""Native C++ WAV loader: parity with the NumPy decode path."""
import os

import numpy as np
import pytest

from audiossl_tpu.data import native
from audiossl_tpu.data.make_test_wavs import make
from audiossl_tpu.data.wav import load_wave


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("nw")), n=8)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeLoader:
    def test_decode_matches_numpy(self, wav_dir):
        path = os.path.join(wav_dir, "wav_000.wav")
        a = native.decode(path)
        b = load_wave(path)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_batch_shapes_and_determinism(self, wav_dir):
        paths = [os.path.join(wav_dir, f"wav_{i:03d}.wav") for i in range(4)]
        b1 = native.load_batch(paths, clip_samples=15200, seed=7)
        b2 = native.load_batch(paths, clip_samples=15200, seed=7)
        b3 = native.load_batch(paths, clip_samples=15200, seed=8)
        assert b1.shape == (4, 15200)
        np.testing.assert_array_equal(b1, b2)
        assert np.abs(b1 - b3).max() > 0  # different crop seeds

    def test_window_pad_semantics(self, wav_dir):
        # a clip shorter than the window must be symmetrically zero-padded
        paths = [os.path.join(wav_dir, "wav_000.wav")]
        full = native.decode(paths[0])
        big = len(full) + 1000
        out = native.load_batch(paths, clip_samples=big)
        adj = big - len(full)
        half = adj // 2
        np.testing.assert_array_equal(out[0][:half], 0)
        np.testing.assert_array_equal(out[0][half + len(full):], 0)
        np.testing.assert_allclose(out[0][half : half + len(full)], full, atol=1e-6)

    def test_missing_file_raises(self, wav_dir):
        with pytest.raises(IOError):
            native.load_batch([os.path.join(wav_dir, "nope.wav")], clip_samples=100)

    def test_resample_gain_and_parity(self, tmp_path):
        # 44.1k sine -> 16k: unity gain (incl. edges) and close to scipy
        from audiossl_tpu.data.wav import write_wav

        sr_in = 44100
        t = np.arange(sr_in) / sr_in
        wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "hi.wav")
        write_wav(path, wave, sr_in)
        a = native.decode(path, 16000)
        b = load_wave(path, 16000)
        n = min(len(a), len(b))
        # amplitude preserved (the un-normalized version attenuated edges)
        assert 0.48 < np.abs(a[: n]).max() < 0.52
        interior = slice(100, n - 100)
        err = np.abs(a[interior] - b[interior]).max()
        assert err < 0.02, err  # different FIR designs, same signal

    def test_crop_is_contiguous_slice(self, wav_dir):
        paths = [os.path.join(wav_dir, "wav_001.wav")]
        full = native.decode(paths[0])
        clip = len(full) - 500
        out = native.load_batch(paths, clip_samples=clip, seed=3)[0]
        # find the crop offset and check exact match
        starts = np.where(np.isclose(full[: 500 + 1], out[0], atol=1e-7))[0]
        found = False
        for s in starts:
            if np.allclose(full[s : s + clip], out, atol=1e-7):
                found = True
                break
        assert found


class TestOnErrorPolicy:
    """Corrupt/missing files: 'raise' (default) keeps strict semantics;
    'zeros' substitutes silence + a warning (production policy — one bad
    file in a web-scale corpus must not kill a pod-day of training)."""

    def _manifest_with_bad_file(self, wav_dir, tmp_path):
        import pandas as pd

        good = [os.path.join(wav_dir, f"wav_{i:03d}.wav") for i in range(3)]
        bad = os.path.join(str(tmp_path), "corrupt.wav")
        with open(bad, "wb") as f:
            f.write(b"RIFFgarbage-not-a-wav")
        csv = os.path.join(str(tmp_path), "m.csv")
        pd.DataFrame({"files": good + [bad]}).to_csv(csv, index=False)
        return csv, bad

    @pytest.mark.parametrize("force_numpy", [False, True])
    def test_zeros_policy_substitutes_silence(self, wav_dir, tmp_path, monkeypatch, force_numpy):
        from audiossl_tpu.data.pipeline import ManifestLoader

        if force_numpy:
            monkeypatch.setattr(native, "available", lambda: False)
        elif not native.available():
            pytest.skip("no C++ toolchain")
        csv, bad = self._manifest_with_bad_file(wav_dir, tmp_path)
        loader = ManifestLoader(
            csv, batch_size=4, clip_samples=800, shuffle=False,
            num_workers=1, on_error="zeros",
        )
        (waves, _), = list(loader.epoch(0))
        assert waves.shape == (4, 800)
        assert not np.any(waves[3])  # the corrupt clip became silence
        assert np.any(waves[:3])  # real clips decoded

    @pytest.mark.parametrize("force_numpy", [False, True])
    def test_raise_policy_raises(self, wav_dir, tmp_path, monkeypatch, force_numpy):
        from audiossl_tpu.data.pipeline import ManifestLoader

        if force_numpy:
            monkeypatch.setattr(native, "available", lambda: False)
        elif not native.available():
            pytest.skip("no C++ toolchain")
        csv, _ = self._manifest_with_bad_file(wav_dir, tmp_path)
        loader = ManifestLoader(csv, batch_size=4, clip_samples=800, shuffle=False, num_workers=1)
        with pytest.raises(Exception):
            list(loader.epoch(0))

    def test_invalid_policy_rejected(self, wav_dir, tmp_path):
        from audiossl_tpu.data.pipeline import ManifestLoader

        csv, _ = self._manifest_with_bad_file(wav_dir, tmp_path)
        with pytest.raises(ValueError):
            ManifestLoader(csv, batch_size=4, clip_samples=800, on_error="skip")
