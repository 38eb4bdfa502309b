"""Expert parallelism: all_to_all MoE FFN == dense per-token expert math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.parallel.moe import (
    EXPERT_AXIS,
    init_moe_params,
    make_expert_mesh,
    moe_apply,
    moe_ffn,
)

RNG = np.random.default_rng(13)
D, H = 16, 32


def _dense_reference(params, x, dropped=None):
    """Per-token top-1 expert FFN, gate-scaled; `dropped` is a bool mask."""
    logits = np.asarray(x) @ np.asarray(params["router"])
    probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    expert = np.argmax(np.asarray(probs), axis=-1)
    gate = np.max(np.asarray(probs), axis=-1)
    out = np.zeros_like(np.asarray(x))
    for i, (e, g) in enumerate(zip(expert, gate)):
        if dropped is not None and dropped[i]:
            continue
        h = jax.nn.gelu(
            jnp.asarray(x[i]) @ params["w1"][e] + params["b1"][e], approximate=False
        )
        out[i] = g * np.asarray(h @ params["w2"][e] + params["b2"][e])
    return out, expert


class TestMoE:
    @pytest.mark.parametrize("n_exp,n_dev", [(8, 8), (8, 4)])
    def test_matches_dense_with_ample_capacity(self, n_exp, n_dev):
        params = init_moe_params(jax.random.key(0), D, H, n_exp)
        n = 8 * n_dev
        x = jnp.asarray(0.7 * RNG.standard_normal((n, D)), jnp.float32)
        mesh = make_expert_mesh(n_dev)
        out, aux = moe_apply(mesh, params, x, capacity=n // n_dev)
        ref, expert = _dense_reference(params, x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
        # aux = E * sum_i f_i * P_i over the global batch
        onehot = np.eye(n_exp)[expert]
        probs = np.asarray(jax.nn.softmax(x @ params["router"], axis=-1))
        expected_aux = n_exp * float(np.sum(onehot.mean(0) * probs.mean(0)))
        np.testing.assert_allclose(float(aux), expected_aux, rtol=1e-5)

    def test_capacity_drops_overflow_tokens(self):
        n_exp, n_dev = 4, 4
        params = init_moe_params(jax.random.key(1), D, H, n_exp)
        n = 4 * n_dev
        x = jnp.asarray(0.7 * RNG.standard_normal((n, D)), jnp.float32)
        mesh = make_expert_mesh(n_dev)
        cap = 1
        out, _ = moe_apply(mesh, params, x, capacity=cap)
        # reconstruct which tokens overflow slot 0 of their (device, expert)
        _, expert = _dense_reference(params, x)
        dropped = np.zeros(n, bool)
        per_dev = n // n_dev
        for dev in range(n_dev):
            seen = {}
            for i in range(dev * per_dev, (dev + 1) * per_dev):
                c = seen.get(expert[i], 0)
                dropped[i] = c >= cap
                seen[expert[i]] = c + 1
        assert dropped.any(), "fixture should overflow at capacity 1"
        ref, _ = _dense_reference(params, x, dropped=dropped)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)

    def test_2d_dp_ep_mesh(self):
        """EP composed with data parallelism: Mesh(('data', 2), ('expert', 4)).
        Tokens shard over BOTH axes (each (d, e) device owns a distinct token
        block); experts shard over 'expert' and replicate over 'data'."""
        from jax.sharding import Mesh, PartitionSpec as P

        n_exp, n_data, n_ep = 8, 2, 4
        params = init_moe_params(jax.random.key(3), D, H, n_exp)
        n = 8 * n_data * n_ep
        x = jnp.asarray(0.7 * RNG.standard_normal((n, D)), jnp.float32)
        devs = np.asarray(jax.devices()[:8]).reshape(n_data, n_ep)
        mesh = Mesh(devs, ("data", EXPERT_AXIS))
        specs = {
            "router": P(),
            "w1": P(EXPERT_AXIS), "b1": P(EXPERT_AXIS),
            "w2": P(EXPERT_AXIS), "b2": P(EXPERT_AXIS),
        }
        def f(p, xl):
            out, aux = moe_ffn(p, xl, capacity=n // n_ep, axis=EXPERT_AXIS)
            # per-data-row Switch loss -> global-batch mean
            return out, jax.lax.pmean(aux, "data")

        out, aux = jax.jit(
            jax.shard_map(
                f, mesh=mesh,
                in_specs=(specs, P(("data", EXPERT_AXIS))),
                out_specs=(P(("data", EXPERT_AXIS)), P()),
                check_vma=False,
            )
        )(params, x)
        ref, _ = _dense_reference(params, x)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
        assert np.isfinite(float(aux))

    def test_router_receives_gradient(self):
        n_exp, n_dev = 4, 4
        params = init_moe_params(jax.random.key(2), D, H, n_exp)
        n = 4 * n_dev
        x = jnp.asarray(0.7 * RNG.standard_normal((n, D)), jnp.float32)
        mesh = make_expert_mesh(n_dev)

        def loss(p):
            out, aux = moe_apply(mesh, p, x, capacity=n // n_dev)
            return jnp.mean(out**2) + 0.01 * aux

        grads = jax.grad(loss)(params)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
        assert float(jnp.abs(grads["router"]).max()) > 0
        assert float(jnp.abs(grads["w1"]).max()) > 0
