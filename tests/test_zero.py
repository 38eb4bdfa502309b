"""ZeRO-sharded optimizer state (train/zero.py) on the 8-device CPU mesh.

The sharded path must be numerically equivalent to the replicated one —
reduce-scatter of the gradient + local moment update + all_gather of the
delta is the same math as pmean + full update — while holding only 1/n of
the optimizer state per shard.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.config import load_config
from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
from audiossl_tpu.frontend.stft import LogMelConfig
from audiossl_tpu.objectives import get_objective
from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
from audiossl_tpu.train.optim import adamw_torch, build_optimizer, sgd_torch
from audiossl_tpu.train.step import init_train_state, make_train_step
from audiossl_tpu.train.zero import assert_zero_compatible, zero_init

CLIP = 15200


def _tiny_setup(tx, zero: bool):
    mesh = make_mesh()
    config = load_config(None, "delores_s")
    config["pretrain"]["base_encoder"]["output_dim"] = 64
    config["pretrain"]["projection_dim"] = 32
    obj = get_objective("delores_s")(config)
    pipe = AugmentPipeline(AugmentConfig.from_dict(config["pretrain"]), epoch_samples=64)
    mel_cfg = LogMelConfig()
    n_dev = mesh.devices.size
    batch = 2 * n_dev
    state = init_train_state(
        obj, pipe, mel_cfg, tx, mesh, jax.random.key(0), batch // n_dev, CLIP, zero=zero
    )
    step = make_train_step(obj, pipe, mel_cfg, tx, mesh, zero=zero)
    waves = shard_batch(
        mesh, jnp.asarray(0.2 * np.random.default_rng(0).standard_normal((batch, CLIP)), np.float32)
    )
    return state, step, waves, mesh


@pytest.mark.parametrize("make_tx", [lambda: sgd_torch(0.05), lambda: adamw_torch(1e-3)])
def test_zero_matches_replicated(make_tx):
    state_z, step_z, waves, _ = _tiny_setup(make_tx(), zero=True)
    state_r, step_r, _, _ = _tiny_setup(make_tx(), zero=False)
    for _ in range(3):
        state_z, m_z = step_z(state_z, waves)
        state_r, m_r = step_r(state_r, waves)
    np.testing.assert_allclose(
        float(m_z["train_loss"]), float(m_r["train_loss"]), rtol=1e-5
    )
    flat_z = jax.tree.leaves(state_z.params)
    flat_r = jax.tree.leaves(state_r.params)
    for a, b in zip(flat_z, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5)


def test_zero_state_is_sharded():
    state, step, waves, mesh = _tiny_setup(adamw_torch(1e-3), zero=True)
    n = mesh.devices.size
    params_elems = sum(p.size for p in jax.tree.leaves(state.params))
    for leaf in jax.tree.leaves(state.opt_state):
        assert leaf.shape[0] == n  # leading shard axis
        # each shard's slice of a moment leaf is ceil(size/n), not the full leaf
        if leaf.ndim == 2:
            assert leaf.shape[1] <= -(-params_elems // n)
    state, _ = step(state, waves)  # sharded state round-trips through the step
    assert int(state.step) == 1


def test_zero_init_shapes():
    params = {"w": jnp.ones((13, 7)), "b": jnp.ones((3,))}
    opt = zero_init(sgd_torch(0.1), params, 8)
    mu = jax.tree.leaves(opt)
    # trace buffers: w -> [8, ceil(91/8)=12], b -> [8, 1]
    shapes = sorted(tuple(m.shape) for m in mu if m.ndim == 2)
    assert shapes == [(8, 1), (8, 12)]


def test_zero_rejects_norm_based_optimizers():
    assert_zero_compatible("adamw")
    with pytest.raises(ValueError, match="trust ratio"):
        assert_zero_compatible("lars")
    with pytest.raises(ValueError):
        assert_zero_compatible("larc")
    build_optimizer("lars", 0.1)  # still constructible outside zero mode
