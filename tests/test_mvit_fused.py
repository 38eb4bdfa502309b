"""Fused-attention MViT == XLA-path MViT (forward + gradients, f32)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from audiossl_tpu.models.mvit import MViT, MViTConfig


def _models():
    kw = dict(droppath_rate=0.0, compute_dtype=None)
    cfg_x = MViTConfig.tiny(fused_attention="off", **kw)
    cfg_f = MViTConfig.tiny(fused_attention="on", **kw)
    mk = lambda c: MViT(c, input_hw=(32, 64), in_chans=1, final_norm=True)
    return mk(cfg_x), mk(cfg_f)


class TestFusedMViT:
    def test_forward_and_grads_match_xla_path(self):
        mx, mf = _models()
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 32, 64, 1)), jnp.float32
        )
        variables = mx.init(jax.random.key(0), x, False)

        ref = mx.apply(variables, x, False)
        got = mf.apply(variables, x, False)
        assert got.shape == ref.shape
        err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
        assert err < 1e-4, err

        def loss(m):
            def f(p, x):
                return jnp.sum(m.apply(p, x, False) ** 2)

            return f

        from jax.flatten_util import ravel_pytree

        g_ref = jax.grad(loss(mx))(variables, x)
        g_got = jax.grad(loss(mf))(variables, x)
        flat_r, _ = ravel_pytree(g_ref)
        flat_g, _ = ravel_pytree(g_got)
        scale = float(jnp.max(jnp.abs(flat_r))) + 1e-8
        rel = float(jnp.max(jnp.abs(flat_r - flat_g))) / scale
        assert rel < 1e-4, rel

    def test_bad_flag_raises(self):
        cfg = MViTConfig.tiny(fused_attention="maybe")
        m = MViT(cfg, input_hw=(32, 64), in_chans=1)
        x = jnp.zeros((1, 32, 64, 1), jnp.float32)
        try:
            m.init(jax.random.key(0), x, False)
            assert False, "expected ValueError"
        except ValueError:
            pass
