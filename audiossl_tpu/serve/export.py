"""AOT export + serving of trained encoders (jax.export / StableHLO).

The reference has no deployment story: every downstream consumer re-loads a
torch checkpoint into a Python process and runs eager PyTorch
(src/utils/utils.py:199-207). The TPU-native equivalent is ahead-of-time
export: the full inference pipeline (waveform -> on-device log-mel frontend
-> encoder -> pooled embedding) is traced once, lowered to StableHLO with a
**symbolic batch dimension**, weights baked in as constants, and serialized
to one portable artifact. Any process can then deserialize and execute it —
on TPU or CPU, without the model code, the config, or the checkpoint —
which is the contract a production serving fleet wants.

CLI:
    python -m audiossl_tpu.serve.export --checkpoint <ckpt_dir> --out enc.jexp
    python -m audiossl_tpu.serve.export --artifact enc.jexp --selftest

Library:
    exp = export_embedder(variables, model, frontend, clip_samples)
    save_artifact(exp, "enc.jexp")
    enc = ServingEncoder.load("enc.jexp")
    emb = enc(waves)            # any batch size; bucketed padding optional
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import Any, Sequence

import jax
import jax.export as jex
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _portable_features(frontend, waves: jax.Array) -> jax.Array:
    """[b, L] -> [b, F, T] via pure-XLA ops only: an exported module must run
    on every lowering target, so the TPU-only Pallas kernels the training
    FrontendSpec dispatches to are deliberately bypassed here."""
    from audiossl_tpu.frontend import FrontendSpec
    from audiossl_tpu.frontend.fbank import FbankConfig, kaldi_fbank, pad_or_trim_frames
    from audiossl_tpu.frontend.stft import LogMelConfig, log_mel

    if isinstance(frontend, LogMelConfig):
        return log_mel(waves, frontend)
    assert isinstance(frontend, FrontendSpec), frontend
    if frontend.kind == "fbank":
        cfg = FbankConfig(sample_rate=frontend.sample_rate, num_mel_bins=frontend.n_mels)
        fb = kaldi_fbank(waves, cfg)
        if frontend.target_length:
            fb = pad_or_trim_frames(fb, frontend.target_length)
        return jnp.swapaxes(fb, -1, -2)
    return log_mel(
        waves, LogMelConfig(sample_rate=frontend.sample_rate, n_mels=frontend.n_mels)
    )


def _native_logmel_cfg(frontend):
    """The LogMelConfig a native export would run, or None when 'native'
    degenerates to the portable XLA computation (fbank frontends — XLA is
    the measured-faster fbank path even on TPU, PERF.md — and log-mel
    geometries the Cooley-Tukey kernels don't support)."""
    from audiossl_tpu.frontend import FrontendSpec, pallas_stft
    from audiossl_tpu.frontend.stft import LogMelConfig

    if isinstance(frontend, FrontendSpec) and frontend.kind == "fbank":
        return None
    cfg = (
        frontend
        if isinstance(frontend, LogMelConfig)
        else LogMelConfig(sample_rate=frontend.sample_rate, n_mels=frontend.n_mels)
    )
    return cfg if pallas_stft.ct_eligible(cfg) else None


def _native_features(frontend, waves: jax.Array) -> jax.Array:
    """[b, L] -> [b, F, T] with the TPU Pallas frontend kernels — the same
    dispatch training uses (frontend/__init__.py). The resulting artifact
    carries `tpu_custom_call`s, so it is TPU-only; serve with
    ``--frontend native`` when the fleet is all-TPU and serving is
    frontend-bound (PERF.md: the ct2 kernel is ~2.9x the XLA log-mel)."""
    from audiossl_tpu.frontend import pallas_stft

    cfg = _native_logmel_cfg(frontend)
    if cfg is None:
        return _portable_features(frontend, waves)
    if pallas_stft.ct2_eligible(cfg):
        return pallas_stft.log_mel_fused_ct2(waves, cfg)
    return pallas_stft.log_mel_fused_ct(waves, cfg)


def export_embedder(
    variables: Any,
    model,
    frontend,
    clip_samples: int,
    platforms: Sequence[str] = ("tpu", "cpu"),
    frontend_impl: str = "portable",
    batch: int = 256,
) -> jex.Exported:
    """Lower ``waves [b, clip_samples] f32 -> embedding [b, D]`` to StableHLO.

    ``b`` is exported symbolically, so one artifact serves every batch size;
    weights are closed over and baked into the module as constants.
    ``model`` is a flax module whose ``apply({'params','batch_stats'},
    feats, False)`` consumes NHWC feature views (DownstreamModel with
    ``num_classes=0``); ``frontend`` is a LogMelConfig or FrontendSpec (the
    fbank kind serves the MAST/AST family), and it runs inside the exported
    program, so the artifact's input really is raw audio.

    ``frontend_impl='native'`` embeds the Pallas ct2 frontend kernel instead
    of the portable XLA log-mel — a TPU-only artifact (platforms forced to
    ('tpu',)) for frontend-bound serving; must be exported from a
    TPU-attached process (Mosaic lowers at export). Pallas grids need
    concrete shapes, so the native artifact is exported at the fixed
    ``batch`` size (ServingEncoder pads/chunks requests to it) instead of a
    symbolic one.
    """
    # 'native' only restricts the artifact (TPU-only platform, fixed batch,
    # relaxed custom-call check) when a Pallas kernel is actually embedded;
    # for fbank frontends and CT-ineligible log-mel geometries the native
    # computation equals the portable one, so keep the portable artifact's
    # CPU lowering + symbolic batch.
    embeds_pallas = frontend_impl == "native" and _native_logmel_cfg(frontend) is not None
    if embeds_pallas:
        platforms = ("tpu",)

    def infer(waves: jax.Array) -> jax.Array:
        feat_fn = _native_features if frontend_impl == "native" else _portable_features
        feats = feat_fn(frontend, waves)[:, :, :, None]
        return model.apply(variables, feats, False)

    if embeds_pallas:
        b: Any = batch
        checks = [jex.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    else:
        (b,) = jex.symbolic_shape("b")
        checks = []
    spec = jax.ShapeDtypeStruct((b, clip_samples), jnp.float32)
    return jex.export(jax.jit(infer), platforms=list(platforms), disabled_checks=checks)(spec)


def save_artifact(exported: jex.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_artifact(path: str) -> jex.Exported:
    with open(path, "rb") as f:
        return jex.deserialize(bytearray(f.read()))


class ServingEncoder:
    """Callable wrapper around a deserialized artifact.

    Each distinct concrete batch size triggers one XLA compile of the
    shape-polymorphic module; ``bucket`` rounds the batch up to the next
    multiple (padding with zeros, slicing the result back) so a serving
    process compiles O(log) shapes instead of one per request size.
    """

    def __init__(self, exported: jex.Exported, bucket: int | None = None):
        self.exported = exported
        self.bucket = bucket
        self.clip_samples = int(exported.in_avals[0].shape[1])
        # native (Pallas-frontend) artifacts are exported at a fixed batch;
        # requests get padded up / chunked to that size
        b = exported.in_avals[0].shape[0]
        self.fixed_batch = int(b) if isinstance(b, int) else None
        self._call = jax.jit(exported.call)

    @classmethod
    def load(cls, path: str, bucket: int | None = None) -> "ServingEncoder":
        return cls(load_artifact(path), bucket=bucket)

    def __call__(self, waves: np.ndarray) -> np.ndarray:
        waves = np.asarray(waves, np.float32)
        n = waves.shape[0]
        if self.fixed_batch:
            fb = self.fixed_batch
            if n % fb:
                waves = np.pad(waves, ((0, fb - n % fb), (0, 0)))
            chunks = [
                np.asarray(self._call(jnp.asarray(waves[i : i + fb])))
                for i in range(0, waves.shape[0], fb)
            ]
            return np.concatenate(chunks)[:n]
        if self.bucket and n % self.bucket:
            waves = np.pad(waves, ((0, self.bucket - n % self.bucket), (0, 0)))
        out = self._call(jnp.asarray(waves))
        return np.asarray(out)[:n]


def _build_model_and_vars(checkpoint: str, clip_samples: int | None, dtype: str = "default"):
    """Reconstruct the encoder recorded in <checkpoint>/config.yaml and load
    its exported variables — the same handoff the downstream probe uses."""
    import yaml

    from audiossl_tpu.downstream.model import DownstreamModel
    from audiossl_tpu.frontend import build_frontend
    from audiossl_tpu.train import checkpoint as ckpt

    cfg_path = os.path.join(checkpoint, "config.yaml")
    with open(cfg_path) as f:
        pre = yaml.safe_load(f)["pretrain"]
    inp = pre.get("input", {})
    frontend = build_frontend(inp)  # logmel, or Kaldi fbank for MAST/AST configs
    if clip_samples is None:
        clip_samples = int(float(inp.get("length_wave", 0.95)) * frontend.sample_rate)
    n_frames = frontend.num_frames(clip_samples)
    enc = pre["base_encoder"]
    model = DownstreamModel(
        n_mels=frontend.n_mels,
        d=int(enc.get("output_dim", 2048)),
        num_classes=0,  # embedding output
        axis_name=None,  # single-program inference: no mesh collectives
        encoder_type=str(enc.get("type", "AudioNTT2020Task6")),
        input_tdim=n_frames,
        model_size=str(enc.get("model_size", "base")),
        # f32 gives bit-stable embeddings across recompiles; the default
        # keeps each encoder's bf16 compute path (faster on the MXU)
        compute_dtype={"default": None, "f32": jnp.float32, "bf16": jnp.bfloat16}[dtype],
    )
    dummy = jnp.zeros((2, frontend.n_mels, n_frames, 1), jnp.float32)
    variables = jax.jit(
        lambda k0, k1: model.init({"params": k0, "dropout": k1}, dummy, False)
    )(jax.random.key(0), jax.random.key(1))
    target = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables.get("batch_stats", {}).get("encoder", {}),
    }
    enc_vars = ckpt.load_encoder(checkpoint, target)
    merged = {"params": {"encoder": enc_vars["params"]}}
    if enc_vars.get("batch_stats"):
        merged["batch_stats"] = {"encoder": enc_vars["batch_stats"]}
    return model, merged, frontend, clip_samples


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", help="upstream checkpoint dir (with encoder/ + config.yaml)")
    p.add_argument("--out", help="artifact path to write (.jexp)")
    p.add_argument("--clip_samples", type=int, default=None, help="input length (defaults to the config's length_wave)")
    p.add_argument("--platforms", default="tpu,cpu", help="comma-separated lowering targets")
    p.add_argument("--frontend", choices=("portable", "native"), default="portable",
                   help="'native' bakes the Pallas ct2 frontend kernel in (TPU-only artifact)")
    p.add_argument("--dtype", choices=("default", "f32", "bf16"), default="default",
                   help="encoder compute dtype (default = encoder's own, usually bf16)")
    p.add_argument("--artifact", help="existing artifact for --selftest")
    p.add_argument("--selftest", action="store_true", help="run a random batch through the artifact and print the shape")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    if args.artifact and args.selftest:
        enc = ServingEncoder.load(args.artifact)
        out = enc(np.zeros((3, enc.clip_samples), np.float32))
        print(f"selftest OK: [3, {enc.clip_samples}] waves -> {out.shape} embeddings")
        return

    if not args.checkpoint or not args.out:
        p.error("--checkpoint and --out are required for export")
    model, variables, frontend, clip = _build_model_and_vars(
        args.checkpoint, args.clip_samples, args.dtype
    )
    exp = export_embedder(
        variables, model, frontend, clip,
        platforms=tuple(args.platforms.split(",")), frontend_impl=args.frontend,
    )
    save_artifact(exp, args.out)
    log.info(
        "exported %s (%s, %d-sample clips, platforms %s) to %s (%.1f MB)",
        model.encoder_type, exp.in_avals[0].shape, clip, exp.platforms,
        args.out, os.path.getsize(args.out) / 1e6,
    )
    if args.selftest:
        enc = ServingEncoder.load(args.out)
        out = enc(np.zeros((3, clip), np.float32))
        print(f"selftest OK: [3, {clip}] waves -> {out.shape} embeddings")


if __name__ == "__main__":
    main()
