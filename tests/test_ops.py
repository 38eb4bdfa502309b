"""Ops: crop-resize vs torch bicubic, windowing, running-norm recursion."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from audiossl_tpu.ops.resize import crop_resize_2d, random_resize_crop
from audiossl_tpu.ops.stats import running_norm_apply, running_norm_init, normalize_batch
from audiossl_tpu.ops.windowing import extract_window, extract_window_np

RNG = np.random.default_rng(1)


class TestCropResize:
    @pytest.mark.parametrize("box", [(0, 0, 96, 144), (3, 10, 50, 80), (0, 0, 64, 96), (5, 7, 80, 120), (2, 2, 1, 1)])
    def test_matches_torch_bicubic(self, box):
        canvas = RNG.standard_normal((1, 96, 144)).astype(np.float32)
        i, j, h, w = box
        ours = np.asarray(
            crop_resize_2d(jnp.asarray(canvas), tuple(jnp.asarray(v) for v in box), (64, 96))
        )
        crop = torch.tensor(canvas[:, i : i + h, j : j + w])
        ref = F.interpolate(crop.unsqueeze(0), size=(64, 96), mode="bicubic", align_corners=True)
        np.testing.assert_allclose(ours, ref.squeeze(0).numpy(), atol=2e-4)

    def test_upscale_matches_torch(self):
        canvas = RNG.standard_normal((1, 40, 60)).astype(np.float32)
        box = (0, 0, 40, 60)
        ours = np.asarray(
            crop_resize_2d(jnp.asarray(canvas), tuple(jnp.asarray(v) for v in box), (64, 96))
        )
        ref = F.interpolate(
            torch.tensor(canvas).unsqueeze(0), size=(64, 96), mode="bicubic", align_corners=True
        )
        np.testing.assert_allclose(ours, ref.squeeze(0).numpy(), atol=2e-4)

    def test_random_resize_crop_shape_and_determinism(self):
        lms = jnp.asarray(RNG.standard_normal((1, 64, 96)).astype(np.float32))
        key = jax.random.key(3)
        out1 = random_resize_crop(lms, key)
        out2 = random_resize_crop(lms, key)
        assert out1.shape == (1, 64, 96)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        out3 = random_resize_crop(lms, jax.random.key(4))
        assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3


class TestWindowing:
    def test_pad_short(self):
        wave = np.ones(10, np.float32)
        out = extract_window_np(wave, 16, RNG)
        assert out.shape == (16,)
        # length_adj=6 -> 3 left, 3 right (reference: half_adj = adj // 2)
        np.testing.assert_array_equal(out[:3], 0)
        np.testing.assert_array_equal(out[13:], 0)
        np.testing.assert_array_equal(out[3:13], 1)

    def test_pad_short_odd(self):
        out = extract_window_np(np.ones(9, np.float32), 16, RNG)
        np.testing.assert_array_equal(out[:3], 0)  # half_adj = 7//2 = 3
        np.testing.assert_array_equal(out[12:], 0)

    def test_crop_long(self):
        wave = np.arange(100, dtype=np.float32)
        out = extract_window_np(wave, 16, RNG)
        assert out.shape == (16,)
        assert np.all(np.diff(out) == 1)

    def test_jax_matches_semantics(self):
        wave = jnp.arange(100, dtype=jnp.float32)
        out = extract_window(wave, 16, jax.random.key(0))
        out = np.asarray(out)
        assert out.shape == (16,) and np.all(np.diff(out) == 1)
        padded = np.asarray(extract_window(jnp.ones(10), 16, jax.random.key(0)))
        np.testing.assert_array_equal(padded[:3], 0)


class TestRunningNorm:
    def _oracle(self, samples):
        """Reference recursion (augmentations.py:215-286), scalar stats."""
        n = 0
        mu = var = None
        for x in samples:
            m = x.mean()
            mu = m if n == 0 else mu + (m - mu) / max(n, 1)
            sq = ((x - mu) ** 2).mean()
            var = sq if n == 0 else var + (sq - var) / max(n, 1)
            n += 1
        return mu, var

    def test_matches_reference_recursion(self):
        xs = RNG.standard_normal((7, 1, 8, 12)).astype(np.float32) * 3 + 1
        state = running_norm_init(epoch_samples=100)
        state, out = running_norm_apply(state, jnp.asarray(xs))
        mu, var = self._oracle(list(xs))
        assert int(state.n) == 7
        np.testing.assert_allclose(float(state.mean), mu, rtol=1e-5)
        np.testing.assert_allclose(float(state.var), var, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out), (xs - mu) / max(np.sqrt(var), 1.2e-7), rtol=2e-4, atol=1e-5
        )

    def test_freezes_after_cap(self):
        state = running_norm_init(epoch_samples=1, max_update_epochs=2)  # cap = 2 samples
        xs = jnp.asarray(RNG.standard_normal((5, 1, 4, 4)).astype(np.float32))
        state, _ = running_norm_apply(state, xs)
        assert int(state.n) == 2
        frozen_mean = float(state.mean)
        state2, _ = running_norm_apply(state, xs * 100)
        assert int(state2.n) == 2 and float(state2.mean) == frozen_mean

    def test_normalize_batch_matches_torch(self):
        x = RNG.standard_normal((4, 1, 8, 12)).astype(np.float32)
        ours = np.asarray(normalize_batch(jnp.asarray(x)))
        xt = torch.tensor(x)
        mean = xt.mean(dim=[0, 2, 3], keepdims=True)
        std = torch.clamp(xt.std(dim=[0, 2, 3], keepdims=True), 1.1920929e-7)
        np.testing.assert_allclose(ours, ((xt - mean) / std).numpy(), atol=1e-5)


class TestBandedConv1:
    """The AudioNTT block-1 banded-matmul conv (models/audiontt.py) must be
    numerically a plain 3x3 pad-1 C_in=1 convolution, and the time-major
    encoder restructure must be a pure relayout of the freq-major original
    (reference layout, src/encoder/audiontt.py:37-104)."""

    def test_banded_conv1_matches_conv(self):
        from flax import linen as nn
        from audiossl_tpu.models.audiontt import BandedConv1

        x = jnp.asarray(RNG.standard_normal((3, 17, 24)).astype(np.float32))  # [B, T, F]
        banded = BandedConv1(features=8)
        variables = banded.init(jax.random.key(0), x)
        ours = banded.apply(variables, x)

        conv = nn.Conv(8, (3, 3), padding=1, use_bias=True)
        # same kernel: BandedConv1 keeps nn.Conv's [freq, time, 1, C] layout,
        # but the conv here runs on time-major input -> transpose (kh, kw)
        k = variables["params"]["kernel"]
        conv_vars = {"params": {"kernel": jnp.transpose(k, (1, 0, 2, 3)),
                                "bias": variables["params"]["bias"]}}
        ref = conv.apply(conv_vars, x[..., None])
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

    def test_time_major_encoder_matches_freq_major(self):
        """Full AudioNTT vs an nn.Conv freq-major transcription of the
        reference with the same (transposed) weights."""
        from flax import linen as nn
        from audiossl_tpu.models.audiontt import AudioNTT2020Task6

        class FreqMajorNTT(nn.Module):
            """The pre-restructure implementation: [B, F, T, C] throughout."""
            n_mels: int = 64
            d: int = 128

            @nn.compact
            def __call__(self, x):
                taps = []
                for _ in range(3):
                    x = nn.Conv(64, (3, 3), padding=1, use_bias=True)(x)
                    x = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
                    x = nn.relu(x)
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                    b, f, t, c = x.shape
                    taps.append(jnp.mean(jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, f * c), axis=1))
                b, f, t, c = x.shape
                x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, f * c)
                x = nn.relu(nn.Dense(self.d)(x))
                x = nn.relu(nn.Dense(self.d)(x))
                return taps[0], taps[1], taps[2], x

        model = AudioNTT2020Task6(n_mels=32, d=128, return_all_layers=True,
                                  compute_dtype=jnp.float32)
        x = jnp.asarray(RNG.standard_normal((2, 32, 48, 1)).astype(np.float32))
        variables = model.init({"params": jax.random.key(1)}, x, False)

        ref_model = FreqMajorNTT(n_mels=32, d=128)
        p = variables["params"]

        def conv_params(i):
            blk = p[f"ConvBlock_{i}"]["Conv_0"]
            # time-major conv kernels are (time, freq); freq-major wants (freq, time)
            return {"kernel": jnp.transpose(blk["kernel"], (1, 0, 2, 3)), "bias": blk["bias"]}

        ref_vars = {
            "params": {
                **{f"Conv_{i}": conv_params(i) for i in range(3)},
                **{f"BatchNorm_{i}": p[f"ConvBlock_{i}"]["BatchNorm_0"] for i in range(3)},
                "Dense_0": p["Dense_0"],
                "Dense_1": p["Dense_1"],
            },
            "batch_stats": {
                f"BatchNorm_{i}": variables["batch_stats"][f"ConvBlock_{i}"]["BatchNorm_0"]
                for i in range(3)
            },
        }
        ours = model.apply(variables, x, False)
        ref = ref_model.apply(ref_vars, x)
        for a, b in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestPatchDropWiring:
    """pretrain/downstream `patch_drop` opt-in on the AST token stream
    (reference augmentations.py:64-79; intended call site mast.py:208-217)."""

    def _model(self, ratio):
        from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

        cfg = ASTConfig.tiny()
        return ASTEncoder(input_fdim=48, input_tdim=64, cfg=cfg, patch_drop=ratio)

    def test_shape_and_grad_flow(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 48, 64, 1)), jnp.float32)
        m = self._model(0.5)
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True)

        def loss(p, key):
            out = m.apply({"params": p}, x, True, rngs={"dropout": key})
            return jnp.sum(out**2)

        g = jax.grad(loss)(v["params"], jax.random.key(2))
        # gradients flow through the kept tokens into every parameter group
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        norms = [float(jnp.linalg.norm(l)) for l in leaves]
        assert sum(n > 0 for n in norms) >= len(norms) - 2  # pos_embed rows dropped may zero a couple

        # eval mode never drops (train-only) and matches the ratio=0 model
        out_eval = m.apply({"params": v["params"]}, x, False)
        m0 = self._model(0.0)
        out0 = m0.apply({"params": v["params"]}, x, False)
        np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out0), rtol=1e-6)

    def test_token_count_is_static_floor(self):
        from audiossl_tpu.ops.tokens import patch_drop

        x = jnp.ones((3, 10, 4))
        y = patch_drop(x, jax.random.key(0), 0.25)
        assert y.shape == (3, 7, 4)  # floor(10 * 0.75)

    def test_non_ast_encoder_rejects(self):
        from audiossl_tpu.downstream.model import DownstreamModel

        m = DownstreamModel(n_mels=48, d=64, num_classes=3, encoder_type="MAST",
                            input_tdim=64, model_size="tiny", patch_drop=0.5)
        x = jnp.zeros((1, 48, 64, 1), jnp.float32)
        with pytest.raises(ValueError, match="AST-only"):
            m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, True)
