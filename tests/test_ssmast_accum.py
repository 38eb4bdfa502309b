"""SS-MAST gradient accumulation (objectives/ssmast.py value_and_grad).

The memory lever for the reference's batch 256-1024
(extras/mast_new/mast/1024_pretrain.sh) on a 16 GB chip. Claims under
test: BOTH paths reproduce their monolithic counterpart's loss, grads,
and carried MoCo state exactly (batched_views: false == the reference's
four-pass semantics; batched_views: true == the concat fast path, via
grad-free key scan + fixed queue snapshots), and the step-level hook
drives the whole thing through make_train_step on the mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick

RNG = np.random.default_rng(11)


def _cfg(batched_views: bool, accum: int, **extra):
    pre = {
        "model_size": "tiny",
        "contrastive_dim": 16,
        "num_negatives": 32,
        "softmax_temperature": 0.07,
        "steps_per_epoch": 2,
        "compute_dtype": "f32",  # exactness is the claim; bf16 retiles per shape
        "batched_views": batched_views,
        "grad_accum_steps": accum,
        "input": {"n_mels": 64, "target_length": 96},
    }
    pre.update(extra)
    return {"run": {"batch_size": 8}, "pretrain": pre}


def _flat(tree):
    return np.concatenate([np.ravel(np.asarray(x, np.float32)) for x in jax.tree.leaves(tree)])


def _run(batched_views: bool, accum: int, views, key):
    from audiossl_tpu.objectives import get_objective

    obj = get_objective("ssmast")(_cfg(batched_views, accum), axis_name=None)
    params, bs, ssl = obj.init(jax.random.key(0), views)
    (loss, aux), grads = jax.jit(
        lambda p, s: obj.value_and_grad(p, bs, s, views, key, False, None)
    )(params, ssl)
    return float(loss), grads, aux.ssl_state


@pytest.fixture(scope="module")
def views():
    v1 = jnp.asarray(RNG.standard_normal((8, 64, 96, 1)), jnp.float32)
    v2 = jnp.asarray(RNG.standard_normal((8, 64, 96, 1)), jnp.float32)
    return v1, v2


class TestExactPath:
    """batched_views: false — accumulation is reference-exact."""

    def test_matches_monolithic(self, views):
        key = jax.random.key(3)
        l1, g1, s1 = _run(False, 1, views, key)
        f1 = _flat(g1)
        scale = max(float(np.linalg.norm(f1)), 1e-8)
        for accum in (2, 4):
            la, ga, sa = _run(False, accum, views, key)
            assert abs(la - l1) < 1e-5, accum
            np.testing.assert_allclose(_flat(ga) / scale, f1 / scale, rtol=0, atol=1e-5,
                                       err_msg=f"accum={accum}")
            # carried MoCo state: queue contents slot-for-slot, pointer,
            # EMA key tower, step counter
            np.testing.assert_allclose(np.asarray(sa.queue), np.asarray(s1.queue),
                                       rtol=0, atol=1e-5, err_msg=f"accum={accum}")
            assert int(sa.queue_ptr) == int(s1.queue_ptr)
            assert int(sa.step) == int(s1.step)
            np.testing.assert_allclose(_flat(sa.params_k), _flat(s1.params_k),
                                       rtol=0, atol=1e-6, err_msg=f"accum={accum}")


class TestBatchedViewsPath:
    """batched_views: true — accumulation is exact vs the monolithic fast
    path: keys are encoded in a grad-free first scan, the two queue
    snapshots are built in bulk exactly as the monolithic path builds them,
    and the query scan runs against those fixed snapshots."""

    def test_matches_monolithic(self, views):
        key = jax.random.key(4)
        l1, g1, s1 = _run(True, 1, views, key)
        f1 = _flat(g1)
        scale = max(float(np.linalg.norm(f1)), 1e-8)
        for accum in (2, 4):
            la, ga, sa = _run(True, accum, views, key)
            assert abs(la - l1) < 1e-5, (accum, la, l1)
            np.testing.assert_allclose(_flat(ga) / scale, f1 / scale, rtol=0, atol=1e-5,
                                       err_msg=f"accum={accum}")
            # carried MoCo state slot-for-slot: queue, pointer, EMA tower
            np.testing.assert_allclose(np.asarray(sa.queue), np.asarray(s1.queue),
                                       rtol=0, atol=1e-5, err_msg=f"accum={accum}")
            assert int(sa.queue_ptr) == int(s1.queue_ptr)
            assert int(sa.step) == int(s1.step)
            np.testing.assert_allclose(_flat(sa.params_k), _flat(s1.params_k),
                                       rtol=0, atol=1e-6, err_msg=f"accum={accum}")


class TestGuards:
    def test_indivisible_batch_raises(self, views):
        from audiossl_tpu.objectives import get_objective

        obj = get_objective("ssmast")(_cfg(True, 3), axis_name=None)
        params, bs, ssl = obj.init(jax.random.key(0), views)
        with pytest.raises(ValueError, match="not divisible"):
            obj.value_and_grad(params, bs, ssl, views, jax.random.key(0), False, None)

    def test_shuffle_bn_combination_refused(self):
        from audiossl_tpu.objectives import get_objective

        with pytest.raises(ValueError, match="shuffle_bn"):
            get_objective("ssmast")(_cfg(True, 2, shuffle_bn=True), axis_name=None)


def test_full_train_step_with_accum():
    """The step-level hook: make_train_step prefers objective.value_and_grad,
    so grad_accum_steps drives the real sharded train step (queue enqueues
    gather across the mesh, pointer advances by the global batch)."""
    from audiossl_tpu.data.augment import AugmentConfig, AugmentPipeline
    from audiossl_tpu.frontend import build_frontend
    from audiossl_tpu.objectives import get_objective
    from audiossl_tpu.parallel.mesh import make_mesh, shard_batch
    from audiossl_tpu.train.optim import adamw_torch
    from audiossl_tpu.train.step import init_train_state, make_train_step

    cfg = {
        "run": {"batch_size": 16},
        "pretrain": {
            "base_encoder": {"type": "MAST", "output_dim": 768, "return_all_layers": False},
            "model_size": "tiny",
            "contrastive_dim": 16,
            "num_negatives": 32,
            "softmax_temperature": 0.07,
            "steps_per_epoch": 2,
            "grad_accum_steps": 2,
            "normalization": "none",
            "input": {"type": "fbank", "sampling_rate": 16000, "length_wave": 0.95,
                      "n_mels": 64, "target_length": 96},
            "augmentations": {"SpecMask": {"freq_param": 8, "time_param": 16}},
        },
    }
    mesh = make_mesh()
    obj = get_objective("ssmast")(cfg)
    pipe = AugmentPipeline(AugmentConfig.from_dict(cfg["pretrain"]), epoch_samples=16)
    frontend = build_frontend(cfg["pretrain"]["input"])
    tx = adamw_torch(3e-4, weight_decay=0.0)
    B, L = 16, 15200
    state = init_train_state(obj, pipe, frontend, tx, mesh, jax.random.key(0),
                             B // mesh.devices.size, L, normalization="none")
    step = make_train_step(obj, pipe, frontend, tx, mesh, normalization="none")
    waves = shard_batch(mesh, jnp.asarray(0.3 * RNG.standard_normal((B, L)).astype(np.float32)))
    state, metrics = step(state, waves)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(state.ssl_state.queue_ptr) == (2 * B) % 32
    assert int(state.ssl_state.step) == 1
