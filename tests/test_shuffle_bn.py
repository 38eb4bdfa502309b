"""Shuffle-BN collective permutation + AST encoder shapes."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from audiossl_tpu.objectives.delores_m import batch_shuffle, batch_unshuffle
from audiossl_tpu.parallel.mesh import make_mesh

RNG = np.random.default_rng(9)


class TestShuffleBN:
    def test_roundtrip_over_mesh(self):
        mesh = make_mesh()
        w = mesh.devices.size
        b_local = 2
        x = jnp.asarray(RNG.standard_normal((w * b_local, 4)).astype(np.float32))
        key = jax.random.key(5)

        def f(x_local):
            shuffled, inv = batch_shuffle(x_local, key, "data")
            restored = batch_unshuffle(shuffled, inv, "data")
            return shuffled, restored

        shuffled, restored = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=(P("data"), P("data")), check_vma=False)
        )(x)
        # unshuffle inverts the shuffle exactly
        np.testing.assert_array_equal(np.asarray(restored), np.asarray(x))
        # and the shuffle is a real permutation of the global batch
        a = np.asarray(shuffled)
        assert not np.array_equal(a, np.asarray(x))
        assert sorted(map(tuple, a.tolist())) == sorted(map(tuple, np.asarray(x).tolist()))

    def test_delores_m_step_with_shuffle_bn(self):
        from tests.test_objectives import small_config
        from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
        from audiossl_tpu.frontend.stft import LogMelConfig
        from audiossl_tpu.objectives import get_objective
        from audiossl_tpu.parallel.mesh import shard_batch
        from audiossl_tpu.train.optim import sgd_torch
        from audiossl_tpu.train.step import init_train_state, make_train_step

        cfg = small_config("delores_m")
        cfg["pretrain"]["shuffle_bn"] = True
        mesh = make_mesh()
        obj = get_objective("delores_m")(cfg)
        pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=32)
        tx = sgd_torch(0.03)
        B, L = 16, 15200
        state = init_train_state(obj, pipe, LogMelConfig(), tx, mesh, jax.random.key(0), B // mesh.devices.size, L)
        step = make_train_step(obj, pipe, LogMelConfig(), tx, mesh)
        waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
        state, metrics = step(state, waves)
        assert np.isfinite(float(metrics["train_loss"]))


def test_slicer_step_with_shuffle_bn():
    from tests.test_objectives import small_config
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend.stft import LogMelConfig
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train.optim import sgd_torch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    cfg = small_config("slicer")
    cfg["pretrain"]["shuffle_bn"] = True
    mesh = make_mesh()
    obj = get_objective("slicer")(cfg)
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=32)
    tx = sgd_torch(0.03)
    B, L = 16, 15200
    state = init_train_state(obj, pipe, LogMelConfig(), tx, mesh, jax.random.key(0), B // mesh.devices.size, L)
    step = make_train_step(obj, pipe, LogMelConfig(), tx, mesh)
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))


def test_int16_wire_format():
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend.stft import LogMelConfig
    from audiossl_tpu.train.step import prepare_views

    pipe = AugmentPipeline(AugmentConfig(mixup_ratio=None, rrc=False, normalization="none"), epoch_samples=8)
    st = pipe.init_state(64, 96)
    # decoded audio is already within [-1, 1] (PCM sources); stay in range so
    # the comparison isolates quantization, not clipping
    waves_f = np.clip(0.3 * RNG.standard_normal((2, 15200)), -0.999, 0.999).astype(np.float32)
    waves_i = np.clip(waves_f * 32768.0, -32768, 32767).astype(np.int16)
    _, v_f, _ = prepare_views(pipe, LogMelConfig(), "none", st, jnp.asarray(waves_f), jax.random.key(0))
    _, v_i, _ = prepare_views(pipe, LogMelConfig(), "none", st, jnp.asarray(waves_i), jax.random.key(0))
    # PCM16 wire quantization: identical to within the -90 dB floor
    assert np.abs(np.asarray(v_f) - np.asarray(v_i)).max() < 0.02


def test_ast_encoder():
    from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

    enc = ASTEncoder(input_fdim=64, input_tdim=96, cfg=ASTConfig.tiny())
    x = jnp.asarray(RNG.standard_normal((2, 64, 96, 1)).astype(np.float32))
    vars_ = enc.init({"params": jax.random.key(0)}, x, False)
    out = enc.apply(vars_, x, False)
    assert out.shape == (2, 192)
    n_tokens = ((96 - 16) // 10 + 1) * ((64 - 16) // 10 + 1) + 2
    assert vars_["params"]["pos_embed"].shape == (1, n_tokens, 192)
