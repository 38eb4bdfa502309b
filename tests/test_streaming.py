"""Streaming frontend (frontend/streaming.py): chunked == batch log-mel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.frontend.streaming import StreamingLogMel

RNG = np.random.default_rng(17)


def _stream_all(sl, wave, first, chunk):
    state, out0 = sl.start(wave[..., :first])
    outs = [out0]
    for s in range(first, wave.shape[-1], chunk):
        state, o = sl.step(state, wave[..., s : s + chunk])
        outs.append(o)
    outs.append(sl.finish(state))
    return np.concatenate([np.asarray(o) for o in outs if o.shape[-1]], axis=-1)


class TestStreamingEqualsBatch:
    @pytest.mark.parametrize("center", [True, False])
    def test_matches_batch_logmel(self, center):
        cfg = LogMelConfig(center=center)
        n = 160 * 60  # 0.6 s
        wave = (0.3 * RNG.standard_normal((2, n))).astype(np.float32)
        want = np.asarray(log_mel(jnp.asarray(wave), cfg))
        got = _stream_all(StreamingLogMel(cfg), jnp.asarray(wave), first=1600, chunk=800)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_uneven_chunk_sizes(self):
        cfg = LogMelConfig()
        n = 160 * 47
        wave = jnp.asarray((0.3 * RNG.standard_normal((n,))).astype(np.float32))
        want = np.asarray(log_mel(wave, cfg))
        sl = StreamingLogMel(cfg)
        state, o0 = sl.start(wave[: 160 * 11])
        state, o1 = sl.step(state, wave[160 * 11 : 160 * 13])
        state, o2 = sl.step(state, wave[160 * 13 : 160 * 40])
        state, o3 = sl.step(state, wave[160 * 40 :])
        tail = sl.finish(state)
        got = np.concatenate([np.asarray(o) for o in (o0, o1, o2, o3, tail)], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_scan_over_chunks(self):
        """The serving-loop pattern: one lax.scan over stacked chunks."""
        cfg = LogMelConfig()
        chunk, n_chunks, first = 800, 8, 1600
        n = first + chunk * n_chunks
        wave = jnp.asarray((0.3 * RNG.standard_normal((3, n))).astype(np.float32))
        sl = StreamingLogMel(cfg)
        state, o0 = sl.start(wave[..., :first])
        chunks = jnp.stack(
            [wave[..., first + i * chunk : first + (i + 1) * chunk] for i in range(n_chunks)]
        )
        state, os_ = jax.lax.scan(lambda s, c: sl.step(s, c), state, chunks)
        tail = sl.finish(state)
        got = np.concatenate(
            [np.asarray(o0)]
            + [np.asarray(os_[i]) for i in range(n_chunks)]
            + [np.asarray(tail)],
            axis=-1,
        )
        want = np.asarray(log_mel(wave, cfg))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_fbank_streaming_matches_batch(self):
        from audiossl_tpu.frontend.fbank import FbankConfig, kaldi_fbank
        from audiossl_tpu.frontend.streaming import StreamingFbank

        cfg = FbankConfig()
        n = 160 * 50
        wave = jnp.asarray((0.3 * RNG.standard_normal((2, n))).astype(np.float32))
        want = np.asarray(kaldi_fbank(wave, cfg))
        sf = StreamingFbank(cfg)
        state, o0 = sf.start(wave[..., : 160 * 12])
        outs = [o0]
        for s in range(160 * 12, n, 160 * 10):
            state, o = sf.step(state, wave[..., s : s + 160 * 10])
            outs.append(o)
        got = np.concatenate([np.asarray(o) for o in outs], axis=-2)
        assert got.shape == want.shape
        # different frame-batch shapes reassociate the DFT matmul; the log
        # amplifies quiet bins to ~1.5e-4 — hold the streaming path to the
        # same 1e-3 contract the batch frontend carries vs its oracle
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_rejects_bad_chunks(self):
        sl = StreamingLogMel(LogMelConfig())
        with pytest.raises(ValueError):
            sl.start(jnp.zeros((100,), jnp.float32))  # not hop-aligned
        state, _ = sl.start(jnp.zeros((1600,), jnp.float32))
        with pytest.raises(ValueError):
            sl.step(state, jnp.zeros((150,), jnp.float32))
