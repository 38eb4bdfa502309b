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


def test_ssmast_batched_views_matches_sequential():
    """The batched-views fast path (one concat query pass + one concat key
    pass, objectives/ssmast.py) must reproduce the reference's sequential
    four-pass loop exactly — MAST is LayerNorm-only, so per-sample math is
    independent of batch composition. train=False keeps droppath out of
    play (it draws different RNG streams in the two pass structures).
    Asserted tight at f32 (batch composition only changes summation
    association, which f32 rows don't see at 1e-5); the default bf16
    trunk is pinned loosely — its lowering IS batch-shape-dependent."""
    from audiossl_tpu.objectives import get_objective

    cfg = {
        "run": {"batch_size": 4},
        "pretrain": {
            "model_size": "tiny",
            "contrastive_dim": 16,
            "num_negatives": 32,
            "softmax_temperature": 0.07,
            "steps_per_epoch": 2,
            "input": {"n_mels": 64, "target_length": 96},
        },
    }
    v1 = jnp.asarray(RNG.standard_normal((4, 64, 96, 1)), jnp.float32)
    v2 = jnp.asarray(RNG.standard_normal((4, 64, 96, 1)), jnp.float32)
    for dtype, atol_loss, atol_queue in (("f32", 1e-5, 1e-5), ("bf16", 0.2, 0.1)):
        results = {}
        for batched in (True, False):
            cfg["pretrain"]["batched_views"] = batched
            cfg["pretrain"]["compute_dtype"] = dtype
            obj = get_objective("ssmast")(cfg, axis_name=None)
            params, bs, ssl = obj.init(jax.random.key(0), (v1, v2))
            total, aux = obj.loss(params, bs, ssl, (v1, v2), jax.random.key(1), train=False, axis_name=None)
            results[batched] = (
                float(total),
                np.asarray(aux.ssl_state.queue),
                int(aux.ssl_state.queue_ptr),
            )
        (l_fast, q_fast, p_fast), (l_seq, q_seq, p_seq) = results[True], results[False]
        np.testing.assert_allclose(l_fast, l_seq, rtol=0, atol=atol_loss, err_msg=dtype)
        assert p_fast == p_seq
        np.testing.assert_allclose(q_fast, q_seq, rtol=0, atol=atol_queue, err_msg=dtype)


class TestMASTInputPipeline:
    """Parity for the MAST input-normalization + waveform-mixup wiring
    (VERDICT r1 Missing #2/#3): torch transcriptions of
    extras/mast_new/mast/dataloader.py:117-127 (mixup) and :201-202 (norm)."""

    def test_wave_mixup_matches_torch_transcription(self):
        import torch

        w1 = (0.4 * RNG.standard_normal(8000)).astype(np.float32)
        w2 = (0.2 * RNG.standard_normal(8000)).astype(np.float32)
        mixed, lam = waveform_mixup(jnp.asarray(w1), jnp.asarray(w2), jax.random.key(3))
        lam = float(lam)
        # dataloader.py:117-127: center each wave, mix with lambda, re-center
        t1, t2 = torch.tensor(w1), torch.tensor(w2)
        t1, t2 = t1 - t1.mean(), t2 - t2.mean()
        tm = lam * t1 + (1.0 - lam) * t2
        tm = tm - tm.mean()
        np.testing.assert_allclose(np.asarray(mixed), tm.numpy(), atol=1e-6)
        assert 0.0 < lam < 1.0  # Beta(10,10) draw

    def test_precomputed_norm_matches_torch_transcription(self):
        import torch

        from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline

        mean, std = -4.2677393, 4.5689974
        cfg = AugmentConfig.from_dict(
            {
                "normalization": "precomputed",
                "norm_stats": {"mean": mean, "std": std},
                "augmentations": {},  # no mixup/RRC/masking: isolate the norm
            }
        )
        assert cfg.mixup_ratio is None and not cfg.rrc
        assert (cfg.norm_mean, cfg.norm_std, cfg.norm_std_mult) == (mean, std, 2.0)
        pipe = AugmentPipeline(cfg, epoch_samples=4)
        fb = (RNG.standard_normal((2, 1, 64, 96)) * 3 - 5).astype(np.float32)
        state = pipe.init_state(64, 96)
        _, v1, v2 = pipe(state, jnp.asarray(fb), jax.random.key(0))
        ref = ((torch.tensor(fb) - mean) / (std * 2)).numpy()  # dataloader.py:201-202
        np.testing.assert_allclose(np.asarray(v1), ref, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(v2), ref, rtol=1e-6)

    def test_from_dict_requires_stats(self):
        from audiossl_tpu.data.augment import AugmentConfig

        with pytest.raises(ValueError, match="norm_stats"):
            AugmentConfig.from_dict({"normalization": "precomputed"})

    def test_batch_waveform_mixup_gate(self):
        from audiossl_tpu.frontend.fbank import batch_waveform_mixup

        waves = jnp.asarray((RNG.standard_normal((4, 400)) + 1.0).astype(np.float32))
        centered = waves - jnp.mean(waves, -1, keepdims=True)
        out0 = batch_waveform_mixup(waves, jax.random.key(1), rate=0.0)
        # rate 0: no mixing, but every wave is still mean-centered
        np.testing.assert_allclose(np.asarray(out0), np.asarray(centered), atol=1e-6)
        out1 = batch_waveform_mixup(waves, jax.random.key(1), rate=1.0)
        np.testing.assert_allclose(np.asarray(jnp.mean(out1, -1)), 0.0, atol=1e-5)
        assert np.abs(np.asarray(out1) - np.asarray(centered)).max() > 1e-4

    def test_mast_noise_shape_and_roll(self):
        from audiossl_tpu.data.augment import mast_noise

        x = jnp.zeros((2, 1, 8, 32))
        out = mast_noise(x, jax.random.key(0))
        assert out.shape == x.shape
        # additive noise is bounded by U(0,1) * U(0,1)/10
        assert 0.0 <= float(jnp.min(out)) and float(jnp.max(out)) < 0.1


def test_ssmast_train_step_precomputed_norm_and_mixup():
    """One SS-MAST step on the mesh with the full MAST input pipeline enabled:
    waveform mixup -> fbank -> SpecMask -> (x - mean)/(2 std) (VERDICT r1 #2)."""
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
            "normalization": "precomputed",
            "norm_stats": {"mean": -4.27, "std": 4.57},
            "input": {
                "type": "fbank", "sampling_rate": 16000, "length_wave": 0.95,
                "n_mels": 64, "target_length": 96, "mixup": 0.5,
            },
            "augmentations": {"SpecMask": {"freq_param": 8, "time_param": 16}},
        },
    }
    mesh = make_mesh()
    obj = get_objective("ssmast")(cfg)
    aug_cfg = AugmentConfig.from_dict(cfg["pretrain"])
    assert aug_cfg.wave_mixup_rate == 0.5 and aug_cfg.norm_mean == -4.27
    pipe = AugmentPipeline(aug_cfg, epoch_samples=16)
    frontend = build_frontend(cfg["pretrain"]["input"])
    tx = adamw_torch(3e-4, weight_decay=0.0)
    B, L = 8, 15200
    state = init_train_state(
        obj, pipe, frontend, tx, mesh, jax.random.key(0), B // mesh.devices.size, L,
        normalization="precomputed",
    )
    step = make_train_step(obj, pipe, frontend, tx, mesh, normalization="precomputed")
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))


class TestMViTConfigGuards:
    def test_cls_embed_on_raises(self):
        import dataclasses

        cfg = dataclasses.replace(MViTConfig.tiny(), cls_embed_on=True)
        model = MViT(cfg, input_hw=(32, 32), in_chans=1)
        x = jnp.zeros((1, 32, 32, 1))
        with pytest.raises(NotImplementedError, match="cls_embed_on"):
            model.init({"params": jax.random.key(0)}, x, False)

    def test_dropout_rate_active_in_train(self):
        import dataclasses

        cfg = dataclasses.replace(MViTConfig.tiny(), dropout_rate=0.5, droppath_rate=0.0)
        model = MViT(cfg, input_hw=(32, 32), in_chans=1)
        x = jnp.asarray(RNG.standard_normal((1, 32, 32, 1)).astype(np.float32))
        vars_ = model.init({"params": jax.random.key(0)}, x, False)
        eval_out = model.apply(vars_, x, False)
        t1 = model.apply(vars_, x, True, rngs={"dropout": jax.random.key(1)})
        t2 = model.apply(vars_, x, True, rngs={"dropout": jax.random.key(2)})
        # dropout is stochastic in train mode, identity in eval
        assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6
        assert np.all(np.isfinite(np.asarray(eval_out)))


def test_mast_bf16_close_to_f32():
    """The default bf16 compute path tracks the exact-f32 path (f32 LN
    stats + f32 softmax keep the error at bf16 rounding scale)."""
    enc16 = MASTEncoder(input_fdim=48, input_tdim=64, model_size="tiny")
    enc32 = MASTEncoder(input_fdim=48, input_tdim=64, model_size="tiny", compute_dtype=None)
    x = jnp.asarray(RNG.standard_normal((2, 48, 64, 1)).astype(np.float32))
    vars_ = enc32.init({"params": jax.random.key(0)}, x, False)
    o32 = np.asarray(enc32.apply(vars_, x, False))
    o16 = np.asarray(enc16.apply(vars_, x, False))
    assert o16.dtype == np.float32  # output is upcast
    cos = np.sum(o16 * o32) / (np.linalg.norm(o16) * np.linalg.norm(o32))
    assert cos > 0.999, cos
    rel = np.abs(o16 - o32).max() / (np.abs(o32).max() + 1e-9)
    assert rel < 0.05, rel


def test_ssmast_remat_step():
    """pretrain.remat: one SS-MAST step with per-block activation
    checkpointing compiles and runs (MODEL.ACT_CHECKPOINT equivalent)."""
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
            "remat": True,
            "contrastive_dim": 16,
            "num_negatives": 32,
            "softmax_temperature": 0.07,
            "steps_per_epoch": 2,
            "normalization": "none",
            "input": {"type": "fbank", "sampling_rate": 16000, "length_wave": 0.95, "n_mels": 64, "target_length": 96},
            "augmentations": {},
        },
    }
    mesh = make_mesh()
    obj = get_objective("ssmast")(cfg)
    assert obj.encoder.remat
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=16)
    frontend = build_frontend(cfg["pretrain"]["input"])
    tx = adamw_torch(3e-4, weight_decay=0.0)
    B, L = 8, 15200
    state = init_train_state(obj, pipe, frontend, tx, mesh, jax.random.key(0), B // mesh.devices.size, L, normalization="none")
    step = make_train_step(obj, pipe, frontend, tx, mesh, normalization="none")
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))


def test_torch_import_to_downstream_probe(tmp_path):
    """Switching-user journey, end to end: a reference-style torch MAST
    checkpoint (Lightning nesting, freq-major grid, trained at tdim=76) ->
    torch_import CLI -> downstream linear probe at 1 s clips
    (encoder_type MAST, model_size tiny) — the strict load fails on the
    rel-pos shapes and the probe's cross-shape transplant path
    (probe.py fallback; src/encoder/mast.py:100-173 semantics) must kick in
    and actually transfer the weights."""
    import os

    import torch

    from audiossl_tpu.config import load_config
    from audiossl_tpu.data.make_test_wavs import make
    from audiossl_tpu.downstream.probe import run_downstream
    from audiossl_tpu.models.mast import mast_config
    from audiossl_tpu.models import torch_import
    from audiossl_tpu.models.torch_import import _conv_hwio_time_major
    from tests.test_torch_import import _torch_mvit

    wav_dir = make(str(tmp_path / "wavs"), n=16)

    # reference checkpoint geometry: fbank (F=64, T=76) -> freq-major patch
    # grid (5, 7); the probe below runs ~1 s clips (a different time grid),
    # so rel_pos tables need the resize surgery on import.
    src_f, src_t = 64, 76
    cfg = mast_config("tiny", compute_dtype=None)
    tm = _torch_mvit(cfg, grid_ft=((src_f - 16) // 10 + 1, (src_t - 16) // 10 + 1))
    sd = {"encoder_q.ast_model.v." + k: v for k, v in tm.state_dict().items()}
    pth = str(tmp_path / "ref_mast.ckpt")
    torch.save({"state_dict": sd}, pth)

    imported = str(tmp_path / "imported")
    torch_import.main(["--checkpoint", pth, "--arch", "mast", "--out", imported])

    dcfg = load_config(None, "downstream")
    dcfg["run"].update(batch_size=8, epochs=1, lr=0.01, num_dataloader_workers=2)
    dcfg["downstream"]["base_encoder"].update(type="MAST", model_size="tiny")
    result = run_downstream(
        dcfg,
        {
            "task": "probe_mast",
            "train_csv": os.path.join(wav_dir, "downstream_train.csv"),
            "test_csv": os.path.join(wav_dir, "downstream_test.csv"),
            "checkpoint": imported,
            "freeze": True,
            "exp_dir": str(tmp_path / "exp"),
        },
    )
    assert 0.0 <= result["best_test_acc"] <= 1.0
    # the frozen encoder must carry the imported torch weights, not a random
    # init — guards a silently-failed transplant
    got = np.asarray(result["params"]["encoder"]["mvit"]["patch_embed"]["kernel"])
    want = _conv_hwio_time_major(tm.state_dict()["patch_embed.proj.weight"].numpy())
    np.testing.assert_allclose(got, want, atol=0)
