"""Fused rel-pos attention kernel vs a pure-JAX reference (fwd + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.ops.attention import fused_rel_attention, rel_expand_matrix


def ref_attention(q, k, v, bias, expand, scale):
    s = jnp.einsum("bqc,bkc->bqk", q * scale, k, precision=jax.lax.Precision.HIGHEST)
    s = s + jnp.einsum(
        "bqe,ek->bqk", bias, expand[: bias.shape[-1]], precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "bqk,bkc->bqc", jax.nn.softmax(s, axis=-1), v, precision=jax.lax.Precision.HIGHEST
    )


def make_case(bh=3, lq=72, lk=40, d=24, kb=13, seed=0):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.standard_normal((bh, lq, d)), jnp.float32)
    k = jnp.asarray(r.standard_normal((bh, lk, d)), jnp.float32)
    v = jnp.asarray(r.standard_normal((bh, lk, d)), jnp.float32)
    bias = jnp.asarray(0.5 * r.standard_normal((bh, lq, kb)), jnp.float32)
    expand = jnp.asarray((r.random((kb, lk)) < 0.3).astype(np.float32))
    return q, k, v, bias, expand


class TestFusedRelAttention:
    @pytest.mark.parametrize("lq,lk,d,kb", [(72, 40, 24, 13), (256, 128, 128, 72), (1100, 130, 96, 72)])
    def test_forward_matches_reference(self, lq, lk, d, kb):
        q, k, v, bias, expand = make_case(lq=lq, lk=lk, d=d, kb=kb)
        scale = d**-0.5
        ref = ref_attention(q, k, v, bias, expand, scale)
        got = fused_rel_attention(q, k, v, bias, expand, scale, True, True)
        assert got.shape == ref.shape
        assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 1e-5

    def test_gradients_match_reference(self):
        # Lq=1100 -> 3 q-tiles: exercises the dk/dv accumulation revisits
        q, k, v, bias, expand = make_case(lq=1100, lk=130, d=96, kb=72)
        scale = 96**-0.5
        cot = jnp.asarray(np.random.default_rng(9).standard_normal(q.shape[:2] + (96,)), jnp.float32)

        def loss_ref(q, k, v, bias):
            return jnp.sum(ref_attention(q, k, v, bias, expand, scale) * cot)

        def loss_ker(q, k, v, bias):
            return jnp.sum(fused_rel_attention(q, k, v, bias, expand, scale, True, True) * cot)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_ker = jax.grad(loss_ker, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b, name in zip(g_ref, g_ker, "qkvb"):
            err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
            assert err < 2e-4, f"d{name}: {err}"

    def test_bf16_path_close_to_f32(self):
        q, k, v, bias, expand = make_case(lq=128, lk=64, d=32, kb=16)
        scale = 32**-0.5
        ref = ref_attention(q, k, v, bias, expand, scale)
        got = fused_rel_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            bias.astype(jnp.bfloat16), expand, scale, False, True,
        )
        assert got.dtype == jnp.bfloat16
        assert np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref))) < 5e-2

    def test_no_bias_mode_forward_and_grads(self):
        """bias=None (plain ViT attention, the AST path), multi-tile."""
        q, k, v, _, _ = make_case(lq=600, lk=130, d=64)
        scale = 64**-0.5

        def ref_plain(q, k, v):
            s = jnp.einsum("bqc,bkc->bqk", q * scale, k, precision=jax.lax.Precision.HIGHEST)
            return jnp.einsum(
                "bqk,bkc->bqc", jax.nn.softmax(s, -1), v, precision=jax.lax.Precision.HIGHEST
            )

        ref = ref_plain(q, k, v)
        got = fused_rel_attention(q, k, v, None, None, scale, True, True)
        assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 1e-5

        cot = jnp.asarray(np.random.default_rng(4).standard_normal(ref.shape), jnp.float32)
        g_ref = jax.grad(lambda *a: jnp.sum(ref_plain(*a) * cot), argnums=(0, 1, 2))(q, k, v)
        g_ker = jax.grad(
            lambda *a: jnp.sum(fused_rel_attention(*a, None, None, scale, True, True) * cot),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b, name in zip(g_ref, g_ker, "qkv"):
            err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
            assert err < 2e-4, f"d{name}: {err}"

    def test_ast_fused_matches_default(self):
        """ASTEncoder with the fused attention_fn == flax default (f32)."""
        import dataclasses

        from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

        cfg = ASTConfig.tiny()
        mk = lambda mode: ASTEncoder(
            input_fdim=48, input_tdim=68, cfg=dataclasses.replace(cfg, fused_attention=mode)
        )
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 48, 68, 1)), jnp.float32)
        variables = mk("off").init(jax.random.key(0), x, False)
        ref = mk("off").apply(variables, x, False)
        got = mk("on").apply(variables, x, False)
        assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 1e-4

        g_ref = jax.grad(lambda p: jnp.sum(mk("off").apply(p, x, False) ** 2))(variables)
        g_got = jax.grad(lambda p: jnp.sum(mk("on").apply(p, x, False) ** 2))(variables)
        from jax.flatten_util import ravel_pytree

        fr, _ = ravel_pytree(g_ref)
        fg, _ = ravel_pytree(g_got)
        rel = float(jnp.max(jnp.abs(fr - fg))) / (float(jnp.max(jnp.abs(fr))) + 1e-8)
        assert rel < 1e-4, rel

    def test_expand_matrix_semantics(self):
        kh, kw = 3, 5
        e = rel_expand_matrix(kh, kw)
        rh = np.random.default_rng(0).standard_normal((4, kh)).astype(np.float32)
        rw = np.random.default_rng(1).standard_normal((4, kw)).astype(np.float32)
        flat = np.concatenate([rh, rw], -1) @ e
        full = rh[:, :, None] + rw[:, None, :]  # the cal_rel_pos_spatial broadcast
        assert np.allclose(flat.reshape(4, kh, kw), full)
