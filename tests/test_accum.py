"""Gradient accumulation (train/accum.py): microbatched == full-batch.

Exactness holds for per-sample-decomposable mean losses (the class the
helper is offered for — supervised BCE/CE, queue-negative InfoNCE); the
Barlow family is batch-coupled and deliberately unsupported (see the
module docstring).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.train.accum import microbatched_value_and_grad

pytestmark = pytest.mark.quick

RNG = np.random.default_rng(7)


def _toy_params():
    return {
        "w1": jnp.asarray(RNG.standard_normal((12, 16)), jnp.float32),
        "b1": jnp.asarray(RNG.standard_normal((16,)), jnp.float32),
        "w2": jnp.asarray(RNG.standard_normal((16, 5)), jnp.float32),
    }


def _toy_loss(p, batch, key):
    del key  # deterministic loss: exactness is the claim under test
    x, y = batch
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    logits = h @ p["w2"]
    # mean-reduced BCE-with-logits — the per-sample-decomposable class
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


class TestHelper:
    def test_accum_matches_full_batch(self):
        p = _toy_params()
        x = jnp.asarray(RNG.standard_normal((16, 12)), jnp.float32)
        y = jnp.asarray((RNG.uniform(size=(16, 5)) < 0.3), jnp.float32)
        key = jax.random.key(0)
        loss1, g1 = jax.jit(microbatched_value_and_grad(_toy_loss, 1))(p, (x, y), key)
        for accum in (2, 4, 8, 16):
            loss_a, g_a = jax.jit(microbatched_value_and_grad(_toy_loss, accum))(
                p, (x, y), key
            )
            assert abs(float(loss_a) - float(loss1)) < 1e-6, accum
            for k in p:
                np.testing.assert_allclose(
                    np.asarray(g_a[k]), np.asarray(g1[k]), rtol=0, atol=1e-6,
                    err_msg=f"accum={accum} grad {k}",
                )

    def test_accum_one_is_plain_value_and_grad(self):
        p = _toy_params()
        x = jnp.asarray(RNG.standard_normal((4, 12)), jnp.float32)
        y = jnp.zeros((4, 5), jnp.float32)
        key = jax.random.key(1)
        l_ref, g_ref = jax.value_and_grad(_toy_loss)(p, (x, y), key)
        l1, g1 = microbatched_value_and_grad(_toy_loss, 1)(p, (x, y), key)
        assert float(l1) == float(l_ref)
        for k in p:
            np.testing.assert_array_equal(np.asarray(g1[k]), np.asarray(g_ref[k]))

    def test_indivisible_batch_raises(self):
        p = _toy_params()
        x = jnp.zeros((6, 12), jnp.float32)
        y = jnp.zeros((6, 5), jnp.float32)
        with pytest.raises(ValueError, match="not divisible"):
            microbatched_value_and_grad(_toy_loss, 4)(p, (x, y), jax.random.key(0))

    def test_bad_accum_raises(self):
        with pytest.raises(ValueError, match=">= 1"):
            microbatched_value_and_grad(_toy_loss, 0)

    def test_bf16_params_accumulate_in_f32(self):
        # A bf16 tree must come back bf16, accumulated via f32 partials
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), _toy_params())
        x = jnp.asarray(RNG.standard_normal((8, 12)), jnp.bfloat16)
        y = jnp.asarray((RNG.uniform(size=(8, 5)) < 0.3), jnp.bfloat16)
        _, g = microbatched_value_and_grad(_toy_loss, 4)(p, (x, y), jax.random.key(2))
        assert all(leaf.dtype == jnp.bfloat16 for leaf in jax.tree.leaves(g))


class TestFinetuneTrainer:
    """accum=2 vs accum=1 through the real MAST fine-tune step: identical
    updated params when the per-microbatch RNG draws are neutralized
    (mixup/masking/noise off, droppath 0 — MViT-tiny is LayerNorm-only,
    so train-mode forward is then deterministic)."""

    def test_mast_step_accum_parity(self):
        from audiossl_tpu.train.finetune_mast import MASTClassifier, bce_logits
        from audiossl_tpu.train.layer_decay import adamw_layer_decay
        from audiossl_tpu.train.finetune_mast import _prepare_input

        ft = {
            "freqm": 0, "timem": 0,
            "norm_stats": {"mean": -13.9, "std": 5.3},
            "input": {
                "sampling_rate": 16000, "n_mels": 64,
                "target_length": 48, "mixup": 0.0, "noise": False,
            },
        }
        model = MASTClassifier(
            num_classes=3, input_fdim=64, input_tdim=48,
            model_size="tiny", droppath_rate=0.0,
        )
        waves = jnp.asarray(RNG.standard_normal((8, 8000)), jnp.float32)
        targets = jnp.asarray((RNG.uniform(size=(8, 3)) < 0.4), jnp.float32)
        dummy = jnp.zeros((2, 64, 48, 1), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, dummy, False)["params"]
        tx = adamw_layer_decay(1e-3, params, depth=10, layer_decay=0.75,
                               weight_decay=0.05, clip_grad_norm=1.0)

        def micro_loss(p, mb, key):
            w, t = mb
            x = _prepare_input(ft, w, key, True)
            logits = model.apply({"params": p}, x, True, rngs={"dropout": key})
            return bce_logits(logits, t)

        def flat(tree):
            return np.concatenate(
                [np.ravel(np.asarray(x, np.float32)) for x in jax.tree.leaves(tree)]
            )

        def cosine(a, b):
            return float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

        key = jax.random.key(3)
        l_full, g_full = jax.jit(microbatched_value_and_grad(micro_loss, 1))(
            params, (waves, targets), key
        )
        f_full = flat(g_full)
        scale = max(float(np.linalg.norm(f_full)), 1e-8)
        vg = jax.jit(jax.value_and_grad(micro_loss))
        for accum in (2, 4):
            loss_s, g_s = jax.jit(microbatched_value_and_grad(micro_loss, accum))(
                params, (waves, targets), key
            )
            # (a) the helper implements the microbatch sum *correctly*:
            # tight match against a manual no-scan sum of value_and_grad
            # over the same slices with the same fold_in keys.
            mb = waves.shape[0] // accum
            loss_m, f_m = 0.0, np.zeros_like(f_full)
            for i in range(accum):
                k = jax.random.fold_in(key, i)
                li, gi = vg(params, (waves[i * mb:(i + 1) * mb], targets[i * mb:(i + 1) * mb]), k)
                loss_m += float(li) / accum
                f_m += flat(gi) / accum
            f_s = flat(g_s)
            assert abs(float(loss_s) - loss_m) < 1e-6, accum
            np.testing.assert_allclose(f_s / scale, f_m / scale, rtol=0, atol=3e-4,
                                       err_msg=f"accum={accum} scan vs manual")
            # (scan body and the standalone vg compile separately, so
            # bf16 fusion choices differ — ~1e-5 in cosine, not zero)
            assert cosine(f_s, f_m) > 1 - 1e-4, accum
            # (b) vs the full batch the match is loose by design: the
            # encoder computes in bf16 and XLA retiles the matmuls for
            # B=8 vs B=4/2 shapes, shifting per-sample values ~1e-4-1e-3
            # through 10 MViT blocks (the manual no-scan sum shows the
            # same drift; the f32 toy above pins 1e-6 at fixed depth).
            assert abs(float(loss_s) - float(l_full)) < 2e-3, accum
            assert cosine(f_s, f_full) > 1 - 1e-3, f"accum={accum} cosine {cosine(f_s, f_full)}"
        # and the whole thing still feeds the optimizer
        import optax

        updates, _ = tx.update(g_full, tx.init(params), params)
        assert all(np.all(np.isfinite(u)) for u in jax.tree.leaves(
            jax.tree.map(np.asarray, optax.apply_updates(params, updates))))
