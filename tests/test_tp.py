"""Tensor-parallel MLP over a ('data','model') 2D mesh matches dense math."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from audiossl_tpu.parallel.tp import make_2d_mesh, shard_mlp_weights, tp_mlp

RNG = np.random.default_rng(12)


def test_tp_mlp_matches_dense():
    mesh = make_2d_mesh(data=4, model=2)
    b, d, h, f = 8, 16, 32, 16
    x = jnp.asarray(RNG.standard_normal((b, d)).astype(np.float32))
    w1 = jnp.asarray(RNG.standard_normal((d, h)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(RNG.standard_normal((h, f)).astype(np.float32) * 0.1)

    dense = jax.nn.relu(x @ w1) @ w2

    w1s, w2s = shard_mlp_weights(mesh, w1, w2)

    f_tp = jax.jit(
        shard_map(
            lambda xl, w1l, w2l: tp_mlp(xl, w1l, w2l),
            mesh=mesh,
            in_specs=(P("data", None), P(None, "model"), P("model", None)),
            out_specs=P("data", None),
            check_vma=False,
        )
    )
    out = f_tp(x, w1s, w2s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


def test_tp_gradients_match_dense():
    mesh = make_2d_mesh(data=2, model=2)
    b, d, h, f = 4, 8, 16, 8
    x = jnp.asarray(RNG.standard_normal((b, d)).astype(np.float32))
    w1 = jnp.asarray(RNG.standard_normal((d, h)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(RNG.standard_normal((h, f)).astype(np.float32) * 0.1)

    def loss_dense(w1, w2):
        return jnp.sum(jnp.square(jax.nn.relu(x @ w1) @ w2))

    g_dense = jax.grad(loss_dense, argnums=(0, 1))(w1, w2)

    def grads_tp(w1l, w2l, xl):
        def local_loss(w1l, w2l):
            y = tp_mlp(xl, w1l, w2l)
            # y is replicated over the model axis, so every model shard counts
            # the same loss — normalize by the group size before autodiff
            return jnp.sum(jnp.square(y)) / jax.lax.axis_size("model")

        g1, g2 = jax.grad(local_loss, argnums=(0, 1))(w1l, w2l)
        # weights replicated along 'data': explicit DDP grad all-reduce
        return jax.lax.psum(g1, "data"), jax.lax.psum(g2, "data")

    w1s, w2s = shard_mlp_weights(mesh, w1, w2)
    g1, g2 = jax.jit(
        shard_map(
            grads_tp,
            mesh=mesh,
            in_specs=(P(None, "model"), P("model", None), P("data", None)),
            out_specs=(P(None, "model"), P("model", None)),
            check_vma=False,
        )
    )(w1s, w2s, x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g_dense[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_dense[1]), atol=1e-4)
