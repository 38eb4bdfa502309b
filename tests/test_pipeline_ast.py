"""Pipeline-parallel AST inference == the flax ASTEncoder, same checkpoint."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiossl_tpu.models.ast import ASTConfig, ASTEncoder
from audiossl_tpu.parallel.pipeline import make_pipe_mesh
from audiossl_tpu.parallel.pipeline_ast import (
    ast_block,
    ast_stage_stack,
    pipelined_ast_forward,
)

RNG = np.random.default_rng(17)

CFG = ASTConfig(
    embed_dim=32, depth=8, num_heads=2, mlp_ratio=2.0,
    fstride=8, tstride=8, patch=8, fused_attention="off",
)
F_IN, T_IN, BATCH = 32, 64, 8


@pytest.fixture(scope="module")
def encoder_and_vars():
    enc = ASTEncoder(input_fdim=F_IN, input_tdim=T_IN, cfg=CFG)
    x = jnp.asarray(RNG.standard_normal((BATCH, F_IN, T_IN, 1)), jnp.float32)
    variables = jax.jit(enc.init, static_argnums=2)({"params": jax.random.key(0)}, x, False)
    return enc, variables, x


class TestPureBlockTwin:
    def test_block_matches_flax(self, encoder_and_vars):
        enc, variables, x = encoder_and_vars
        ref = jax.jit(enc.apply, static_argnums=2)(variables, x, False)
        # pure prologue+blocks+epilogue on ONE device (1 stage holding all
        # blocks) already exercises ast_block/prologue/epilogue jointly
        mesh = make_pipe_mesh(1)
        out = pipelined_ast_forward(mesh, variables, x, CFG, n_micro=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_single_block_twin(self, encoder_and_vars):
        _, variables, _ = encoder_and_vars
        p0 = variables["params"]["block0"]
        tok = jnp.asarray(RNG.standard_normal((3, 10, CFG.embed_dim)), jnp.float32)
        from audiossl_tpu.models.ast import ViTBlock

        blk = ViTBlock(CFG.embed_dim, CFG.num_heads, CFG.mlp_ratio, 0.0, fused="off")
        ref = blk.apply({"params": p0}, tok, False)
        out = ast_block(p0, tok, CFG.num_heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestPipelinedAST:
    @pytest.mark.parametrize("stages,n_micro", [(8, 4), (4, 8), (2, 2)])
    def test_matches_encoder(self, encoder_and_vars, stages, n_micro):
        enc, variables, x = encoder_and_vars
        ref = jax.jit(enc.apply, static_argnums=2)(variables, x, False)
        mesh = make_pipe_mesh(stages)
        out = pipelined_ast_forward(mesh, variables, x, CFG, n_micro=n_micro)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_depth_not_divisible_raises(self, encoder_and_vars):
        _, variables, _ = encoder_and_vars
        with pytest.raises(ValueError, match="not divisible"):
            ast_stage_stack(variables["params"], CFG.depth, 3)
