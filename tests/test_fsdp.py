"""FSDP (GSPMD fully sharded) training == the replicated step, and the
state really is sharded 1/n per device.

Complements tests/test_zero.py: zero.py shards moments inside the explicit
shard_map step (elementwise optimizers only); fsdp.py shards params + grads
+ moments via sharding annotations, and — because tensors stay logically
whole under GSPMD — must also reproduce trust-ratio (LARS) training
exactly, which the shard_map ZeRO wrapper structurally cannot.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.models.ast import ASTConfig, ASTEncoder
from audiossl_tpu.parallel.fsdp import (
    fsdp_init,
    fsdp_spec,
    make_fsdp_train_step,
    tree_shardings,
)
from audiossl_tpu.parallel.mesh import make_mesh
from audiossl_tpu.train.optim import lars

RNG = np.random.default_rng(23)
N_DEV = 8


def mlp_params(d_in=64, d_hid=512, d_out=64):
    return {
        "fc1": {
            "kernel": jnp.asarray(RNG.standard_normal((d_in, d_hid)) * 0.05, jnp.float32),
            "bias": jnp.zeros((d_hid,), jnp.float32),
        },
        "fc2": {
            "kernel": jnp.asarray(RNG.standard_normal((d_hid, d_out)) * 0.05, jnp.float32),
            "bias": jnp.zeros((d_out,), jnp.float32),
        },
    }


def mlp_loss(params, batch, key):
    x, y = batch
    h = jax.nn.relu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    pred = h @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    # global mean over the (sharded) batch — the GSPMD loss contract
    return jnp.mean((pred - y) ** 2)


def make_batch(b=32, d=64):
    return (
        jnp.asarray(RNG.standard_normal((b, d)), jnp.float32),
        jnp.asarray(RNG.standard_normal((b, d)), jnp.float32),
    )


def run_replicated(loss_fn, tx, params, batches, key):
    """Baseline: same math, everything replicated, no sharding annotations."""
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i, batch in enumerate(batches):
        params, opt_state, loss = step(params, opt_state, batch, jax.random.fold_in(key, i))
        losses.append(float(loss))
    return params, losses


def run_fsdp(loss_fn, tx, params, batches, key, mesh, min_size=1024):
    sp, so = fsdp_init(params, tx, mesh, min_size=min_size)
    step = make_fsdp_train_step(loss_fn, tx, mesh, params, min_size=min_size)
    losses = []
    for i, batch in enumerate(batches):
        batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
        sp, so, loss = step(sp, so, batch, jax.random.fold_in(key, i))
        losses.append(float(loss))
    return sp, so, losses


class TestSpec:
    def test_largest_divisible_dim(self):
        assert fsdp_spec((64, 512), 8, min_size=1) == P(None, "data")
        assert fsdp_spec((512, 63), 8, min_size=1) == P("data", None)
        # no dim divides the mesh -> replicated
        assert fsdp_spec((63, 65), 8, min_size=1) == P()
        # small leaves stay replicated
        assert fsdp_spec((64,), 8, min_size=4096) == P()


class TestMLPEquivalence:
    @pytest.mark.parametrize("opt", ["adamw", "lars"])
    def test_matches_replicated(self, opt):
        # lars: trust ratio = full-tensor norms — works under GSPMD because
        # tensors are logically whole (the shard_map ZeRO forbids it)
        tx = optax.adamw(1e-2) if opt == "adamw" else lars(0.5)
        params = mlp_params()
        batches = [make_batch() for _ in range(5)]
        key = jax.random.key(3)
        mesh = make_mesh(N_DEV)

        ref_params, ref_losses = run_replicated(mlp_loss, tx, params, batches, key)
        sp, so, losses = run_fsdp(mlp_loss, tx, params, batches, key, mesh)

        np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)
        # adam divides by sqrt(v)+eps with tiny early v, amplifying the
        # sharded-vs-replicated reduction-order noise (~1e-7 on grads) to
        # ~1e-5 absolute on params after 5 steps; updates are ~1e-2/step
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5
            ),
            sp,
            ref_params,
        )

    def test_state_is_physically_sharded(self):
        tx = optax.adamw(1e-2)
        mesh = make_mesh(N_DEV)
        params = mlp_params()
        sp, so = fsdp_init(params, tx, mesh, min_size=1024)

        k = sp["fc1"]["kernel"]  # [64, 512] -> sharded on dim 1
        assert k.sharding.spec == P(None, "data")
        assert k.addressable_shards[0].data.shape == (64, 512 // N_DEV)
        # biases below min_size stay replicated
        assert sp["fc1"]["bias"].sharding.spec == P()
        # the adam moments inherit the param sharding (1/n per chip)
        mu = so[0].mu["fc1"]["kernel"]
        assert mu.sharding.spec == P(None, "data")
        assert mu.addressable_shards[0].data.shape == (64, 512 // N_DEV)

    def test_shardings_for_shape_structs(self):
        mesh = make_mesh(N_DEV)
        structs = {"w": jax.ShapeDtypeStruct((128, 256), jnp.float32)}
        sh = tree_shardings(structs, mesh, min_size=1024)
        assert sh["w"].spec == P(None, "data")


class TestRealEncoder:
    """FSDP over the actual flagship transformer checkpoint format."""

    CFG = ASTConfig(
        embed_dim=64, depth=4, num_heads=2, mlp_ratio=4.0,
        fstride=8, tstride=8, patch=8, fused_attention="off",
    )
    F_IN, T_IN, B = 32, 64, 16

    def test_ast_fsdp_matches_replicated(self):
        enc = ASTEncoder(input_fdim=self.F_IN, input_tdim=self.T_IN, cfg=self.CFG)
        x0 = jnp.zeros((2, self.F_IN, self.T_IN, 1), jnp.float32)
        variables = jax.jit(enc.init, static_argnums=2)({"params": jax.random.key(0)}, x0, False)
        head = jnp.asarray(RNG.standard_normal((self.CFG.embed_dim, 10)) * 0.05, jnp.float32)
        params = {"enc": variables["params"], "head": head}

        def loss_fn(p, batch, key):
            x, y = batch
            emb = enc.apply({"params": p["enc"]}, x, False)
            logits = emb @ p["head"]
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        tx = optax.adamw(1e-3)
        batches = [
            (
                jnp.asarray(RNG.standard_normal((self.B, self.F_IN, self.T_IN, 1)), jnp.float32),
                jnp.asarray(RNG.integers(0, 10, self.B), jnp.int32),
            )
            for _ in range(2)
        ]
        key = jax.random.key(7)
        mesh = make_mesh(N_DEV)

        ref_params, ref_losses = run_replicated(loss_fn, tx, params, batches, key)
        sp, so, losses = run_fsdp(loss_fn, tx, params, batches, key, mesh, min_size=1024)

        np.testing.assert_allclose(losses, ref_losses, rtol=2e-5)
        # same adam fp-noise amplification as the MLP test, deeper model
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
            ),
            sp,
            ref_params,
        )
        # the block weights really live sharded on device (the [64, 256]
        # MLP kernels pass min_size and have an 8-divisible axis)
        block_specs = [l.sharding.spec for l in jax.tree.leaves(sp["enc"]["block0"])]
        assert any("data" in spec for spec in block_specs)


class TestAccumComposition:
    def test_microbatched_grads_under_fsdp(self):
        """grad accumulation (train/accum.py) composes with the GSPMD FSDP
        step: scanned microbatch slices of the globally-sharded batch give
        the same update as the full-batch FSDP step."""
        from audiossl_tpu.train.accum import microbatched_value_and_grad

        tx = optax.adamw(1e-2)
        params = mlp_params()
        batch = make_batch(b=32)
        key = jax.random.key(11)
        mesh = make_mesh(N_DEV)

        def run(accum):
            # fresh copies: the donated fsdp step consumes the device_put
            # aliases of the originals
            sp, so = fsdp_init(jax.tree.map(jnp.copy, params), tx, mesh, min_size=1024)
            if accum == 1:
                step = make_fsdp_train_step(mlp_loss, tx, mesh, params, min_size=1024)
            else:
                p_sh = tree_shardings(params, mesh, min_size=1024)
                o_sh = tree_shardings(jax.eval_shape(tx.init, params), mesh, min_size=1024)
                grad_fn = microbatched_value_and_grad(mlp_loss, accum)

                def s(p, o, b, k):
                    loss, grads = grad_fn(p, b, k)
                    grads = jax.lax.with_sharding_constraint(grads, p_sh)
                    updates, o = tx.update(grads, o, p)
                    return optax.apply_updates(p, updates), o, loss

                step = jax.jit(
                    s,
                    in_shardings=(p_sh, o_sh, NamedSharding(mesh, P("data")),
                                  NamedSharding(mesh, P())),
                    out_shardings=(p_sh, o_sh, NamedSharding(mesh, P())),
                )
            b = jax.device_put(batch, NamedSharding(mesh, P("data")))
            return step(sp, so, b, key)

        p1, _, l1 = run(1)
        p2, _, l2 = run(4)
        # microbatch RNG keys differ from the monolithic path's single key,
        # but mlp_loss ignores the key — the math must match
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            p1,
            p2,
        )
