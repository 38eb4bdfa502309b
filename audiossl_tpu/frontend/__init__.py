"""Frontend registry: waveform -> [B, F, T] feature maps, on-device.

Two families, matching the reference's frontends (SURVEY.md L1):
  * ``logmel`` — librosa-style STFT power mel (src/utils/utils.py:20-29)
  * ``fbank`` — Kaldi-compatible fbank for MAST (dataloader.py:131-132),
    padded/cut to ``target_length`` frames.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from audiossl_tpu.frontend.fbank import FbankConfig, kaldi_fbank, pad_or_trim_frames
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel


@dataclasses.dataclass(frozen=True)
class FrontendSpec:
    kind: str  # 'logmel' | 'fbank'
    n_mels: int
    sample_rate: int
    target_length: int | None = None  # fbank: fixed frame count

    def num_frames(self, n_samples: int) -> int:
        if self.kind == "fbank":
            cfg = FbankConfig(sample_rate=self.sample_rate, num_mel_bins=self.n_mels)
            return self.target_length if self.target_length else cfg.num_frames(n_samples)
        return LogMelConfig(sample_rate=self.sample_rate, n_mels=self.n_mels).num_frames(n_samples)

    def __call__(self, waves: jax.Array) -> jax.Array:
        """[B, L] -> [B, F, T]."""
        if self.kind == "fbank":
            # XLA path measures faster than the fused kernel here (the 400-tap
            # window pads to 512 lanes — PERF.md); pallas_stft.kaldi_fbank_fused
            # remains available and is the more oracle-accurate variant.
            cfg = FbankConfig(sample_rate=self.sample_rate, num_mel_bins=self.n_mels)
            fb = kaldi_fbank(waves, cfg)  # [B, T, M]
            if self.target_length:
                fb = pad_or_trim_frames(fb, self.target_length)
            return jnp.swapaxes(fb, -1, -2)  # [B, M, T]
        cfg = LogMelConfig(sample_rate=self.sample_rate, n_mels=self.n_mels)
        if jax.default_backend() == "tpu":
            from audiossl_tpu.frontend import pallas_stft

            if pallas_stft.ct2_eligible(cfg):
                # fused Cooley-Tukey Pallas kernel with in-kernel framing +
                # bf16x3 split-precision dots: 4.2 ms/1024 clips vs 8.1 for
                # the frame-materializing variant and 11.9 XLA (PERF.md);
                # same 1e-3 librosa contract (1.1e-4 measured on device)
                return pallas_stft.log_mel_fused_ct2(waves, cfg)
            if pallas_stft.ct_eligible(cfg):
                return pallas_stft.log_mel_fused_ct(waves, cfg)
        return log_mel(waves, cfg)


def build_frontend(input_cfg: dict[str, Any]) -> FrontendSpec:
    """From the YAML `pretrain.input` / `downstream.input` section."""
    kind = "fbank" if str(input_cfg.get("type", "raw_wav")) == "fbank" else "logmel"
    return FrontendSpec(
        kind=kind,
        n_mels=int(input_cfg.get("n_mels", 64)),
        sample_rate=int(input_cfg.get("sampling_rate", 16000)),
        target_length=int(input_cfg["target_length"]) if input_cfg.get("target_length") else None,
    )
