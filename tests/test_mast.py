"""MAST stack: Kaldi fbank parity, MViT shapes/grads, SS-MAST train step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.frontend.fbank import FbankConfig, kaldi_fbank, pad_or_trim_frames, waveform_mixup
from audiossl_tpu.models.mast import MASTEncoder, MASTWithHead
from audiossl_tpu.models.mvit import MViT, MViTConfig
from audiossl_tpu.ops.masking import spec_mask
from audiossl_tpu.ops.tokens import patch_drop
from tests.oracles.kaldi_oracle import kaldi_fbank_oracle

RNG = np.random.default_rng(5)


class TestKaldiFbank:
    def test_matches_oracle(self):
        wave = (0.5 * RNG.standard_normal(16000)).astype(np.float32)
        ours = np.asarray(kaldi_fbank(wave, FbankConfig(num_mel_bins=64)))
        ref = kaldi_fbank_oracle(wave, num_mel_bins=64)
        assert ours.shape == ref.shape == (1 + (16000 - 400) // 160, 64)
        assert np.max(np.abs(ours - ref)) <= 1e-3, np.max(np.abs(ours - ref))

    def test_matches_oracle_128_bins(self):
        t = np.arange(8000) / 16000
        wave = (0.6 * np.sin(2 * np.pi * 800 * t) + 0.05 * RNG.standard_normal(8000)).astype(
            np.float32
        )
        ours = np.asarray(kaldi_fbank(wave))
        ref = kaldi_fbank_oracle(wave)
        assert np.max(np.abs(ours - ref)) <= 1e-3

    def test_fused_matches_oracle(self):
        from audiossl_tpu.frontend.pallas_stft import kaldi_fbank_fused

        wave = (0.3 * RNG.standard_normal(16000)).astype(np.float32)
        ours = np.asarray(kaldi_fbank_fused(wave[None], interpret=True))[0]
        ref = kaldi_fbank_oracle(wave)
        assert np.max(np.abs(ours - ref)) <= 1e-3

    def test_pad_trim(self):
        fb = jnp.zeros((10, 64))
        assert pad_or_trim_frames(fb, 16).shape == (16, 64)
        assert pad_or_trim_frames(fb, 4).shape == (4, 64)

    def test_waveform_mixup(self):
        w1 = jnp.ones((2, 100))
        w2 = -jnp.ones((2, 100))
        mixed, lam = waveform_mixup(w1, w2, jax.random.key(0))
        assert mixed.shape == (2, 100)
        np.testing.assert_allclose(np.asarray(jnp.mean(mixed, -1)), 0, atol=1e-6)


class TestMViT:
    def test_tiny_shapes_and_stage_downsampling(self):
        cfg = MViTConfig.tiny(patch_kernel=(7, 7), patch_stride=(4, 4), patch_padding=(3, 3))
        model = MViT(cfg, input_hw=(64, 64), in_chans=3)
        x = jnp.asarray(RNG.standard_normal((2, 64, 64, 3)).astype(np.float32))
        vars_ = model.init({"params": jax.random.key(0)}, x, False)
        out = model.apply(vars_, x, False)
        # patch grid 16x16 -> 3 stage poolings (x2) -> 2x2 = 4 tokens
        assert out.shape == (2, 4, 96 * 8)

    def test_grads_flow(self):
        cfg = MViTConfig.tiny(patch_kernel=(7, 7), patch_stride=(4, 4), patch_padding=(3, 3))
        model = MViT(cfg, input_hw=(32, 32), in_chans=1)
        x = jnp.asarray(RNG.standard_normal((2, 32, 32, 1)).astype(np.float32))
        vars_ = model.init({"params": jax.random.key(0)}, x, False)

        def loss(p):
            return jnp.sum(model.apply({"params": p}, x, False) ** 2)

        g = jax.grad(loss)(vars_["params"])
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0
        # rel-pos tables get gradients too
        assert any("rel_pos_h" in jax.tree_util.keystr(kp) for kp, _ in jax.tree_util.tree_leaves_with_path(g))

    def test_droppath_train_stochastic(self):
        cfg = MViTConfig.tiny(patch_kernel=(7, 7), patch_stride=(4, 4), patch_padding=(3, 3), droppath_rate=0.5)
        model = MViT(cfg, input_hw=(32, 32), in_chans=1)
        x = jnp.asarray(RNG.standard_normal((4, 32, 32, 1)).astype(np.float32))
        vars_ = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True)
        o1 = model.apply(vars_, x, True, rngs={"dropout": jax.random.key(2)})
        o2 = model.apply(vars_, x, True, rngs={"dropout": jax.random.key(3)})
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-4


class TestMAST:
    def test_encoder_output(self):
        enc = MASTEncoder(input_fdim=64, input_tdim=96, model_size="tiny")
        x = jnp.asarray(RNG.standard_normal((2, 64, 96, 1)).astype(np.float32))
        vars_ = enc.init({"params": jax.random.key(0)}, x, False)
        out = enc.apply(vars_, x, False)
        assert out.shape == (2, 96 * 8)  # tiny: 96 -> 768 after 3 dim doublings

    def test_with_head(self):
        enc = MASTWithHead(output_dim=32, input_fdim=64, input_tdim=96, model_size="tiny")
        x = jnp.asarray(RNG.standard_normal((2, 64, 96, 1)).astype(np.float32))
        vars_ = enc.init({"params": jax.random.key(0)}, x, False)
        assert enc.apply(vars_, x, False).shape == (2, 32)


class TestTokenOps:
    def test_patch_drop_count(self):
        x = jnp.asarray(RNG.standard_normal((2, 10, 4)).astype(np.float32))
        out = patch_drop(x, jax.random.key(0), 0.3)
        assert out.shape == (2, 7, 4)

    def test_spec_mask_spans(self):
        x = jnp.ones((8, 16))
        out = np.asarray(spec_mask(x, jax.random.key(3), freq_param=3, time_param=5))
        assert out.shape == (8, 16)
        assert (out == 0).any()  # something got masked
        # masked rows form one contiguous band
        masked_rows = np.where((out == 0).all(axis=1))[0]
        if len(masked_rows) > 1:
            assert np.all(np.diff(masked_rows) == 1)


def test_ssmast_train_step():
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend import build_frontend
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train.optim import adamw_torch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    cfg = {
        "run": {"batch_size": 8},
        "pretrain": {
            "base_encoder": {"type": "MAST", "output_dim": 768, "return_all_layers": False},
            "model_size": "tiny",
            "contrastive_dim": 16,
            "num_negatives": 32,
            "softmax_temperature": 0.07,
            "steps_per_epoch": 2,
            "normalization": "none",
            "input": {"type": "fbank", "sampling_rate": 16000, "length_wave": 0.95, "n_mels": 64, "target_length": 96},
            "augmentations": {"SpecMask": {"freq_param": 8, "time_param": 16}},
        },
    }
    mesh = make_mesh()
    obj = get_objective("ssmast")(cfg)
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=16)
    frontend = build_frontend(cfg["pretrain"]["input"])
    tx = adamw_torch(3e-4, weight_decay=0.0)
    B, L = 8, 15200
    state = init_train_state(obj, pipe, frontend, tx, mesh, jax.random.key(0), B // mesh.devices.size, L, normalization="none")
    step = make_train_step(obj, pipe, frontend, tx, mesh, normalization="none")
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))
    # symmetric InfoNCE enqueues twice per step
    assert int(state.ssl_state.queue_ptr) == (2 * B) % 32
    assert int(state.ssl_state.step) == 1
