"""Golden-value tests: on-device log-mel frontend vs the NumPy librosa oracle."""
import numpy as np
import pytest

from audiossl_tpu.frontend import mel as melmod
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from tests.oracles import librosa_oracle as oracle

RNG = np.random.default_rng(0)


def _rand_wave(n=15200, scale=0.5):
    return (scale * RNG.standard_normal(n)).astype(np.float32)


class TestMelFilterbank:
    def test_matches_oracle(self):
        ours = melmod.mel_filterbank(16000, 1024, 64, 60.0, 7800.0)
        ref = oracle.mel_fb_oracle()
        np.testing.assert_allclose(ours, ref, atol=2e-7)

    def test_filters_are_normalized_triangles(self):
        fb = melmod.mel_filterbank(16000, 1024, 64, 60.0, 7800.0)
        assert fb.shape == (64, 513)
        assert (fb >= 0).all()
        # every filter has support
        assert (fb.sum(axis=1) > 0).all()

    def test_hann_window_periodic(self):
        import scipy.signal

        np.testing.assert_allclose(
            melmod.hann_window(1024), scipy.signal.get_window("hann", 1024, fftbins=True), atol=1e-7
        )


class TestLogMel:
    def test_shape(self):
        out = log_mel(_rand_wave())
        # 0.95 s @16k = 15200 samples -> 96 frames of 64 mels (SURVEY.md L1)
        assert out.shape == (64, 96)

    def test_matches_oracle_random(self):
        wave = _rand_wave()
        ours = np.asarray(log_mel(wave))
        ref = oracle.log_mel_oracle(wave)
        assert np.max(np.abs(ours - ref)) <= 1e-3, np.max(np.abs(ours - ref))

    def test_matches_oracle_tonal(self):
        t = np.arange(15200) / 16000.0
        wave = (0.7 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t)).astype(
            np.float32
        )
        ours = np.asarray(log_mel(wave))
        ref = oracle.log_mel_oracle(wave)
        # pure tones have a -16 log-power silence floor between harmonics where
        # f32 cancellation dominates; on the real TPU (HIGHEST matmuls) this
        # case measures ~1e-4, on the CPU test backend ~1.4e-3.
        assert np.max(np.abs(ours - ref)) <= 2e-3

    def test_silence(self):
        # all-zero input: log(eps-dominated) must be finite, not -inf/nan
        out = np.asarray(log_mel(np.zeros(15200, np.float32)))
        assert np.isfinite(out).all()

    def test_batched(self):
        waves = np.stack([_rand_wave() for _ in range(4)])
        outs = np.asarray(log_mel(waves))
        assert outs.shape == (4, 64, 96)
        for i in range(4):
            ref = oracle.log_mel_oracle(waves[i])
            assert np.max(np.abs(outs[i] - ref)) <= 1e-3

    def test_one_second_clip(self):
        wave = _rand_wave(16000)
        out = np.asarray(log_mel(wave))
        ref = oracle.log_mel_oracle(wave)
        assert out.shape == (64, 1 + 16000 // 160)
        assert np.max(np.abs(out - ref)) <= 1e-3

    @pytest.mark.parametrize("cfg", [LogMelConfig(n_mels=128), LogMelConfig(hop=320)])
    def test_other_configs(self, cfg):
        wave = _rand_wave()
        ours = np.asarray(log_mel(wave, cfg))
        ref = oracle.log_mel_oracle(wave, n_mels=cfg.n_mels, hop=cfg.hop)
        assert np.max(np.abs(ours - ref)) <= 1e-3

    def test_ct_algo_matches_oracle(self):
        wave = _rand_wave()
        ours = np.asarray(log_mel(wave, LogMelConfig(algo="ct")))
        ref = oracle.log_mel_oracle(wave)
        assert np.max(np.abs(ours - ref)) <= 1e-3

    def test_pallas_kernel_matches_xla(self):
        from audiossl_tpu.frontend.pallas_stft import log_mel_fused

        waves = np.stack([_rand_wave() for _ in range(4)])
        a = np.asarray(log_mel(waves))
        b = np.asarray(log_mel_fused(waves, interpret=True))
        assert np.max(np.abs(a - b)) <= 1e-5

    def test_pallas_kernel_row_padding(self):
        from audiossl_tpu.frontend.pallas_stft import log_mel_fused

        # 3 clips x 96 frames = 288 rows, not a multiple of the tile
        waves = np.stack([_rand_wave() for _ in range(3)])
        a = np.asarray(log_mel(waves))
        b = np.asarray(log_mel_fused(waves, frames_per_tile=256, interpret=True))
        assert np.max(np.abs(a - b)) <= 1e-5

    def test_pallas_ct_kernel_matches_oracle(self):
        """Cooley-Tukey fused kernel: radix stage + mel-row permutation must
        hit the same 1e-3 librosa contract (and ~1e-5 vs the XLA path)."""
        from audiossl_tpu.frontend.pallas_stft import log_mel_fused_ct

        waves = np.stack([_rand_wave() for _ in range(3)])
        a = np.asarray(log_mel(waves))
        b = np.asarray(log_mel_fused_ct(waves, frames_per_tile=256, interpret=True))
        assert np.max(np.abs(a - b)) <= 1e-5
        ref = np.stack([oracle.log_mel_oracle(w) for w in waves])
        assert np.max(np.abs(b - ref)) <= 1e-3

    def test_pallas_ct2_in_kernel_framing_matches_oracle(self):
        """ct2 (in-kernel framing): the lane-rotation + aligned-row-slice
        frame construction must be exact, at both dot precisions, including
        batches that don't divide batch_per_tile."""
        from audiossl_tpu.frontend.pallas_stft import log_mel_fused_ct2

        waves = np.stack([_rand_wave() for _ in range(5)])  # 5 % bt(4) != 0
        a = np.asarray(log_mel(waves))
        ref = np.stack([oracle.log_mel_oracle(w) for w in waves])
        for split in (False, True):
            b = np.asarray(log_mel_fused_ct2(waves, interpret=True, split=split))
            # split=False is pure data movement vs the XLA path; bf16x3 adds
            # ~2^-17-relative dot error, still far inside the oracle contract
            assert np.max(np.abs(a - b)) <= (1e-4 if split else 1e-5)
            assert np.max(np.abs(b - ref)) <= 1e-3

    def test_pallas_ct2_single_wave_and_odd_length(self):
        from audiossl_tpu.frontend.pallas_stft import log_mel_fused_ct2

        wave = _rand_wave(n=12345)
        a = np.asarray(log_mel(wave))
        b = np.asarray(log_mel_fused_ct2(wave, interpret=True))
        assert b.shape == a.shape
        assert np.max(np.abs(a - b)) <= 1e-4
