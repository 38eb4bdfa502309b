"""AOT export/serving: shape-polymorphic StableHLO artifacts (serve/export.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.downstream.model import DownstreamModel
from audiossl_tpu.frontend.stft import LogMelConfig, log_mel
from audiossl_tpu.serve.export import (
    ServingEncoder,
    export_embedder,
    load_artifact,
    save_artifact,
)

RNG = np.random.default_rng(11)
CLIP = 6400  # 0.4 s @ 16 kHz keeps the CPU test cheap


def _tiny_model_and_vars():
    mel_cfg = LogMelConfig()
    n_frames = mel_cfg.num_frames(CLIP)
    # f32 compute: bf16 is nondeterministic across recompiles (ReLU-boundary
    # flips), and these tests compare the artifact against a direct apply
    model = DownstreamModel(
        n_mels=64, d=64, num_classes=0, axis_name=None,
        encoder_type="AudioNTT2020Task6", input_tdim=n_frames,
        compute_dtype=jnp.float32,
    )
    dummy = jnp.zeros((2, 64, n_frames, 1), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, dummy, False)
    return model, variables, mel_cfg


class TestExportRoundtrip:
    def test_symbolic_batch_matches_direct_apply(self, tmp_path):
        model, variables, mel_cfg = _tiny_model_and_vars()
        exp = export_embedder(variables, model, mel_cfg, CLIP, platforms=("cpu",))
        path = os.path.join(tmp_path, "enc.jexp")
        save_artifact(exp, path)
        enc = ServingEncoder.load(path)
        assert enc.clip_samples == CLIP

        # one artifact, several batch sizes (the symbolic dimension)
        for b in (3, 8):
            waves = (0.3 * RNG.standard_normal((b, CLIP))).astype(np.float32)
            got = enc(waves)
            lms = log_mel(jnp.asarray(waves), mel_cfg)[:, :, :, None]
            want = np.asarray(model.apply(variables, lms, False))
            assert got.shape == (b, 64)
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_bucketed_padding_slices_back(self, tmp_path):
        model, variables, mel_cfg = _tiny_model_and_vars()
        exp = export_embedder(variables, model, mel_cfg, CLIP, platforms=("cpu",))
        enc = ServingEncoder(exp, bucket=4)
        waves = (0.3 * RNG.standard_normal((5, CLIP))).astype(np.float32)
        got = enc(waves)  # padded to 8 internally, sliced back to 5
        assert got.shape == (5, 64)
        unbucketed = ServingEncoder(exp)(waves)
        np.testing.assert_allclose(got, unbucketed, rtol=2e-5, atol=2e-5)

    def test_artifact_is_self_contained(self, tmp_path):
        """The deserialized artifact must run without the model object."""
        model, variables, mel_cfg = _tiny_model_and_vars()
        path = os.path.join(tmp_path, "enc.jexp")
        save_artifact(export_embedder(variables, model, mel_cfg, CLIP, platforms=("cpu",)), path)
        exp = load_artifact(path)
        out = jax.jit(exp.call)(jnp.zeros((2, CLIP), jnp.float32))
        assert out.shape == (2, 64) and np.isfinite(np.asarray(out)).all()


class TestFbankFamilyExport:
    def test_ast_fbank_artifact(self, tmp_path):
        """MAST/AST-family serving: the exporter must follow the checkpoint
        config's frontend (Kaldi fbank), not assume log-mel."""
        import yaml

        from audiossl_tpu.frontend import FrontendSpec
        from audiossl_tpu.serve.export import _portable_features, main
        from audiossl_tpu.train import checkpoint as ckpt

        clip = 4800  # 0.3 s -> 28 fbank frames -> AST grid (12, 2)
        frontend = FrontendSpec(kind="fbank", n_mels=128, sample_rate=16000)
        n_frames = frontend.num_frames(clip)
        model = DownstreamModel(
            n_mels=128, d=192, num_classes=0, axis_name=None,
            encoder_type="AST", input_tdim=n_frames, model_size="tiny",
        )
        dummy = jnp.zeros((2, 128, n_frames, 1), jnp.float32)
        variables = model.init({"params": jax.random.key(2), "dropout": jax.random.key(3)}, dummy, False)
        enc_vars = {"params": variables["params"]["encoder"], "batch_stats": {}}
        ckpt_dir = os.path.join(tmp_path, "ssmast_chkp")
        ckpt.save_encoder_only(ckpt_dir, 1, enc_vars)
        with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(
                {
                    "pretrain": {
                        "base_encoder": {"type": "AST", "output_dim": 192, "model_size": "tiny"},
                        "input": {
                            "type": "fbank", "sampling_rate": 16000, "n_mels": 128,
                            "length_wave": 0.3,
                        },
                    }
                },
                f,
            )
        out_path = os.path.join(tmp_path, "ast.jexp")
        main(["--checkpoint", ckpt_dir, "--out", out_path, "--platforms", "cpu"])
        enc = ServingEncoder.load(out_path)
        assert enc.clip_samples == clip
        waves = (0.3 * RNG.standard_normal((2, clip))).astype(np.float32)
        got = enc(waves)
        feats = _portable_features(frontend, jnp.asarray(waves))[:, :, :, None]
        want = np.asarray(model.apply(variables, feats, False))
        assert got.shape == (2, 192)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestExportCLI:
    def test_checkpoint_to_artifact(self, tmp_path):
        """End-to-end: orbax encoder checkpoint + config.yaml -> artifact -> serve."""
        import yaml

        from audiossl_tpu.serve.export import main
        from audiossl_tpu.train import checkpoint as ckpt

        model, variables, mel_cfg = _tiny_model_and_vars()
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        ckpt_dir = os.path.join(tmp_path, "run_chkp")
        ckpt.save_encoder_only(ckpt_dir, 7, enc_vars)
        with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(
                {
                    "pretrain": {
                        "base_encoder": {"type": "AudioNTT2020Task6", "output_dim": 64},
                        "input": {"sampling_rate": 16000, "n_mels": 64, "length_wave": 0.4},
                    }
                },
                f,
            )
        out_path = os.path.join(tmp_path, "enc.jexp")
        main([
            "--checkpoint", ckpt_dir, "--out", out_path,
            "--clip_samples", str(CLIP), "--platforms", "cpu", "--dtype", "f32",
        ])
        enc = ServingEncoder.load(out_path)
        waves = (0.3 * RNG.standard_normal((3, CLIP))).astype(np.float32)
        got = enc(waves)
        lms = log_mel(jnp.asarray(waves), mel_cfg)[:, :, :, None]
        want = np.asarray(model.apply(variables, lms, False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestNativeImplFallback:
    """``frontend_impl='native'`` must degrade to the portable artifact —
    not crash, not restrict the platform/batch — whenever no Pallas kernel
    can actually be embedded (fbank frontends; CT-ineligible log-mel
    geometries such as the standard 25 ms/10 ms speech window)."""

    def test_ct_ineligible_logmel_falls_back(self):
        # n_fft=512 trips neither kernel guard on its own, but hop=160 with
        # n_fft=400 (librosa speech default) is the reported crash: the old
        # dispatch routed it to log_mel_fused_ct which requires n_fft%256==0
        from audiossl_tpu.serve.export import _native_logmel_cfg

        assert _native_logmel_cfg(LogMelConfig(n_fft=400, hop=160)) is None
        assert _native_logmel_cfg(LogMelConfig()) is not None

    def test_native_export_of_fbank_stays_portable(self, tmp_path):
        """fbank 'native' == portable (PERF.md): the artifact must keep CPU
        lowering and the symbolic batch dimension."""
        from audiossl_tpu.frontend import FrontendSpec

        clip = 4800
        frontend = FrontendSpec(kind="fbank", n_mels=128, sample_rate=16000)
        n_frames = frontend.num_frames(clip)
        model = DownstreamModel(
            n_mels=128, d=192, num_classes=0, axis_name=None,
            encoder_type="AST", input_tdim=n_frames, model_size="tiny",
        )
        dummy = jnp.zeros((2, 128, n_frames, 1), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(2), "dropout": jax.random.key(3)}, dummy, False
        )
        exp = export_embedder(
            variables, model, frontend, clip,
            platforms=("cpu",), frontend_impl="native",
        )
        assert exp.platforms == ("cpu",)
        enc = ServingEncoder(exp)
        assert enc.fixed_batch is None  # symbolic batch survived
        waves = (0.3 * RNG.standard_normal((3, clip))).astype(np.float32)
        assert enc(waves).shape == (3, 192)

    def test_native_export_of_ct_ineligible_logmel_falls_back(self):
        """The reported crash case: LogMelConfig(n_fft=400, hop=160) with
        --frontend native must export the portable XLA log-mel."""
        mel_cfg = LogMelConfig(n_fft=400, hop=160)
        n_frames = mel_cfg.num_frames(CLIP)
        model = DownstreamModel(
            n_mels=64, d=64, num_classes=0, axis_name=None,
            encoder_type="AudioNTT2020Task6", input_tdim=n_frames,
            compute_dtype=jnp.float32,
        )
        dummy = jnp.zeros((2, 64, n_frames, 1), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, dummy, False)
        exp = export_embedder(
            variables, model, mel_cfg, CLIP,
            platforms=("cpu",), frontend_impl="native",
        )
        assert exp.platforms == ("cpu",)
        waves = (0.3 * RNG.standard_normal((2, CLIP))).astype(np.float32)
        got = np.asarray(jax.jit(exp.call)(jnp.asarray(waves)))
        lms = log_mel(jnp.asarray(waves), mel_cfg)[:, :, :, None]
        want = np.asarray(model.apply(variables, lms, False))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(
    not os.environ.get("AUDIOSSL_TEST_TPU"), reason="native artifact needs the TPU (Mosaic lowers at export)"
)
class TestNativeFrontendArtifact:
    """`--frontend native` bakes the Pallas ct2 log-mel kernel into a
    TPU-only artifact at a fixed batch (VERDICT r2 item 10). Measured on
    v5e: 60.1k -> 99.4k clips/s at B=256 vs the portable artifact when
    serving the AudioNTT embedder (PERF.md)."""

    def test_cold_deserialize_parity_vs_portable(self, tmp_path):
        model, variables, mel_cfg = _tiny_model_and_vars()
        p_path = os.path.join(tmp_path, "p.jexp")
        n_path = os.path.join(tmp_path, "n.jexp")
        save_artifact(export_embedder(variables, model, mel_cfg, CLIP), p_path)
        exp_n = export_embedder(
            variables, model, mel_cfg, CLIP, frontend_impl="native", batch=8
        )
        assert exp_n.platforms == ("tpu",)
        save_artifact(exp_n, n_path)
        # cold deserialize both; a 13-clip request exercises the fixed-batch
        # pad + chunk path (8 + 5)
        enc_p = ServingEncoder.load(p_path)
        enc_n = ServingEncoder.load(n_path)
        assert enc_n.fixed_batch == 8 and enc_p.fixed_batch is None
        waves = (0.3 * RNG.standard_normal((13, CLIP))).astype(np.float32)
        a, b = enc_p(waves), enc_n(waves)
        assert a.shape == b.shape == (13, 64)
        scale = np.abs(a).max()
        # the ct2 kernel holds the same 1e-3 librosa contract as the XLA
        # log-mel; embeddings through a 64-d encoder stay within ~1e-3
        assert np.abs(a - b).max() / scale < 2e-3
