"""Streaming log-mel: chunked, stateful frontend for continuous audio.

The batch frontend (frontend/stft.py) assumes the whole clip is resident.
A serving process consuming a live stream (or arbitrarily long files)
instead pushes hop-aligned chunks through :class:`StreamingLogMel`, which
carries exactly the overlap samples the next frame needs and emits the
*identical* frames the batch `log_mel` would produce on the concatenated
signal — including librosa's center=True reflect padding, reproduced at
the stream edges by `start` / `finish`:

    sl = StreamingLogMel(cfg)
    state, lm0 = sl.start(first_chunk)       # left reflect pad + first frames
    state, lm  = sl.step(state, chunk)       # C/hop frames per chunk
    tail       = sl.finish(state)            # right reflect pad + last frames

All three are pure and jittable; `step` has a fixed state shape, so a whole
file can run as one `lax.scan` over stacked chunks (tested equal to the
batch path). Pairs with serve/export.py for deployment.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audiossl_tpu.frontend.stft import (
    EPS32,
    EPS64,
    LogMelConfig,
    _constants,
    _power_spectrum_dense,
    frame_signal,
)


def _logmel_frames(x: jax.Array, cfg: LogMelConfig) -> jax.Array:
    """[..., n] (already edge-padded) -> [..., n_mels, frames], center=False
    framing — the shared tail of the batch pipeline."""
    _, mfb_t = _constants(cfg)
    frames = frame_signal(x.astype(jnp.float32), cfg.n_fft, cfg.hop, center=False)
    power = _power_spectrum_dense(frames, cfg)
    if cfg.power != 2.0:
        power = jnp.power(jnp.sqrt(power), cfg.power)
    mel = jnp.matmul(power + EPS64, jnp.asarray(mfb_t), precision=jax.lax.Precision.HIGHEST)
    return jnp.swapaxes(jnp.log(mel + EPS32), -1, -2)


class StreamingLogMel:
    """Stateful chunked frontend. Chunk lengths must be multiples of ``hop``
    (the first additionally large enough to cover the reflect pad); the
    carried state is the fixed-length sample window ahead of the next frame
    start, so every `step` emits exactly ``chunk // hop`` frames."""

    def __init__(self, cfg: LogMelConfig = LogMelConfig()):
        self.cfg = cfg
        self.pad = cfg.n_fft // 2 if cfg.center else 0

    def buf_len(self, first_chunk_len: int) -> int:
        """Carried-state length established by `start` (static)."""
        avail = self.pad + first_chunk_len
        e0 = (avail - self.cfg.n_fft) // self.cfg.hop + 1
        if first_chunk_len % self.cfg.hop:
            raise ValueError(f"chunk length must be a multiple of hop={self.cfg.hop}")
        if e0 < 0 or (self.cfg.center and first_chunk_len < self.pad + 1):
            raise ValueError(
                f"first chunk too short: need >= {max(self.cfg.n_fft - self.pad, self.pad + 1)} samples"
            )
        return avail - self.cfg.hop * e0

    @partial(jax.jit, static_argnums=0)
    def start(self, first_chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        """-> (state, log-mel of the first frames). Applies the left reflect
        pad (librosa center=True) from the chunk itself."""
        cfg = self.cfg
        self.buf_len(first_chunk.shape[-1])  # validates length constraints
        if self.pad:
            x = jnp.pad(first_chunk, [(0, 0)] * (first_chunk.ndim - 1) + [(self.pad, 0)], mode="reflect")
        else:
            x = first_chunk
        e0 = (x.shape[-1] - cfg.n_fft) // cfg.hop + 1
        out = _logmel_frames(x[..., : cfg.n_fft + cfg.hop * max(e0 - 1, 0)], cfg) if e0 > 0 else (
            jnp.zeros((*first_chunk.shape[:-1], cfg.n_mels, 0), jnp.float32)
        )
        state = x[..., cfg.hop * max(e0, 0) :]
        return state, out

    @partial(jax.jit, static_argnums=0)
    def step(self, state: jax.Array, chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        """-> (state, log-mel [..., n_mels, chunk // hop])."""
        cfg = self.cfg
        if chunk.shape[-1] % cfg.hop:
            raise ValueError(f"chunk length must be a multiple of hop={cfg.hop}")
        x = jnp.concatenate([state, chunk], axis=-1)
        e = chunk.shape[-1] // cfg.hop
        out = _logmel_frames(x[..., : cfg.n_fft + cfg.hop * (e - 1)], cfg)
        return x[..., cfg.hop * e :], out

    @partial(jax.jit, static_argnums=0)
    def finish(self, state: jax.Array) -> jax.Array:
        """Right-edge frames under the trailing reflect pad (empty for
        center=False, whose batch framing drops the partial tail)."""
        cfg = self.cfg
        if not self.pad:
            return jnp.zeros((*state.shape[:-1], cfg.n_mels, 0), jnp.float32)
        x = jnp.pad(state, [(0, 0)] * (state.ndim - 1) + [(0, self.pad)], mode="reflect")
        return _logmel_frames(x, cfg)


class StreamingFbank:
    """Chunked Kaldi fbank (the MAST/AST-family frontend, frontend/fbank.py).

    Kaldi's snip-edges framing has no edge padding and every frame is
    processed independently, so the carried state is just the
    ``window_size - shift`` overlap samples. Emits [..., chunk//shift,
    num_mel_bins] per step — identical frames to the batch `kaldi_fbank` on
    the concatenated stream (no finish step: snip-edges drops the tail)."""

    def __init__(self, cfg=None):
        from audiossl_tpu.frontend.fbank import FbankConfig

        self.cfg = cfg if cfg is not None else FbankConfig()

    def buf_len(self, first_chunk_len: int) -> int:
        cfg = self.cfg
        if first_chunk_len % cfg.shift:
            raise ValueError(f"chunk length must be a multiple of shift={cfg.shift}")
        if first_chunk_len < cfg.window_size:
            raise ValueError(f"first chunk too short: need >= {cfg.window_size} samples")
        return first_chunk_len - cfg.shift * cfg.num_frames(first_chunk_len)

    @partial(jax.jit, static_argnums=0)
    def start(self, first_chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        self.buf_len(first_chunk.shape[-1])
        return self._emit(first_chunk, self.cfg.num_frames(first_chunk.shape[-1]))

    @partial(jax.jit, static_argnums=0)
    def step(self, state: jax.Array, chunk: jax.Array) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        if chunk.shape[-1] % cfg.shift:
            raise ValueError(f"chunk length must be a multiple of shift={cfg.shift}")
        x = jnp.concatenate([state, chunk], axis=-1)
        return self._emit(x, chunk.shape[-1] // cfg.shift)

    def _emit(self, x: jax.Array, n_frames: int) -> tuple[jax.Array, jax.Array]:
        import numpy as _np

        from audiossl_tpu.frontend.fbank import fbank_from_frames

        cfg = self.cfg
        idx = _np.arange(n_frames)[:, None] * cfg.shift + _np.arange(cfg.window_size)[None, :]
        frames = jnp.take(x.astype(jnp.float32), jnp.asarray(idx), axis=-1)
        return x[..., cfg.shift * n_frames :], fbank_from_frames(frames, cfg)
