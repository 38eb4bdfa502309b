"""Pipeline parallelism: pipelined stack == sequential stack, fwd + grad."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from audiossl_tpu.parallel.pipeline import (
    PIPE_AXIS,
    make_pipe_mesh,
    pipeline_forward,
    pipelined_apply,
    stack_stage_params,
    vit_block,
)
from audiossl_tpu.parallel.ring import LongASTConfig, init_long_ast_params

RNG = np.random.default_rng(11)
HEADS = 2


def _blocks_and_input(depth, d=16, n_tokens=6, n_micro=8, mb=2):
    cfg = LongASTConfig(embed_dim=d, depth=depth, num_heads=HEADS, tokens_global=n_tokens)
    blocks = init_long_ast_params(jax.random.key(0), cfg)["blocks"]
    x = jnp.asarray(0.5 * RNG.standard_normal((n_micro, mb, n_tokens, d)), jnp.float32)
    return blocks, x


def _sequential(blocks, x_mb):
    y = x_mb.reshape(-1, *x_mb.shape[2:])
    for blk in blocks:
        y = vit_block(blk, y, HEADS)
    return y.reshape(x_mb.shape)


class TestPipelineForward:
    @pytest.mark.parametrize("stages", [4, 8])
    def test_matches_sequential(self, stages):
        blocks, x = _blocks_and_input(depth=stages)
        stacked = stack_stage_params(blocks)
        mesh = make_pipe_mesh(stages)
        out = pipelined_apply(mesh, lambda p, a: vit_block(p, a, HEADS), stacked, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(blocks, x)), rtol=2e-5, atol=2e-5
        )

    def test_single_microbatch_and_uneven_m(self):
        # n_micro smaller / not a multiple of stages: bubble-only schedule
        blocks, x = _blocks_and_input(depth=4, n_micro=3)
        stacked = stack_stage_params(blocks)
        mesh = make_pipe_mesh(4)
        out = pipelined_apply(mesh, lambda p, a: vit_block(p, a, HEADS), stacked, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(_sequential(blocks, x)), rtol=2e-5, atol=2e-5
        )


class TestPipelineGrad:
    def test_grads_match_sequential(self):
        stages = 4
        blocks, x = _blocks_and_input(depth=stages, n_micro=4)
        stacked = stack_stage_params(blocks)
        mesh = make_pipe_mesh(stages)
        tgt = jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)

        def loss_pipe(p, xin):
            fn = jax.shard_map(
                lambda pl_, xl: pipeline_forward(
                    lambda q, a: vit_block(q, a, HEADS), pl_, xl
                ),
                mesh=mesh, in_specs=(P(PIPE_AXIS), P()), out_specs=P(),
                check_vma=False,
            )
            return jnp.mean((fn(p, xin) - tgt) ** 2)

        def loss_seq(p, xin):
            blks = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(stages)]
            return jnp.mean((_sequential(blks, xin) - tgt) ** 2)

        lp, gp = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(stacked, x)
        ls, gs = jax.jit(jax.value_and_grad(loss_seq, argnums=(0, 1)))(stacked, x)
        np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


class TestPipelineRemat:
    def test_checkpointed_stage_matches(self):
        """The documented remat hook: jax.checkpoint(stage_fn) must leave
        fwd and grads unchanged while dropping per-tick activations."""
        stages = 4
        blocks, x = _blocks_and_input(depth=stages, n_micro=4)
        stacked = stack_stage_params(blocks)
        mesh = make_pipe_mesh(stages)
        tgt = jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)

        def make_loss(stage_fn):
            def loss(p, xin):
                fn = jax.shard_map(
                    lambda pl_, xl: pipeline_forward(stage_fn, pl_, xl),
                    mesh=mesh, in_specs=(P(PIPE_AXIS), P()), out_specs=P(),
                    check_vma=False,
                )
                return jnp.mean((fn(p, xin) - tgt) ** 2)
            return loss

        plain = lambda q, a: vit_block(q, a, HEADS)
        l0, g0 = jax.jit(jax.value_and_grad(make_loss(plain)))(stacked, x)
        l1, g1 = jax.jit(jax.value_and_grad(make_loss(jax.checkpoint(plain))))(stacked, x)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


class TestPipelineWithDataParallel:
    def test_2d_dp_pp_mesh(self):
        # (data=2, pipe=4): batch halves ride the data axis, stages the pipe
        # axis; grads psum over data — one step of the combined layout.
        stages, n_micro, mb = 4, 4, 4
        blocks, x = _blocks_and_input(depth=stages, n_micro=n_micro, mb=mb)
        stacked = stack_stage_params(blocks)
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, ("data", PIPE_AXIS))
        tgt = jnp.asarray(RNG.standard_normal(x.shape), jnp.float32)

        def local_loss(p, xl, tl):
            out = pipeline_forward(lambda q, a: vit_block(q, a, HEADS), p, xl)
            # mean over the full global batch = psum of per-shard sums
            return jax.lax.psum(jnp.sum((out - tl) ** 2), "data") / (tgt.size)

        def loss(p, xin):
            fn = jax.shard_map(
                local_loss, mesh=mesh,
                in_specs=(P(PIPE_AXIS), P(None, "data"), P(None, "data")),
                out_specs=P(), check_vma=False,
            )
            return fn(p, xin, tgt)

        def loss_seq(p, xin):
            blks = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(stages)]
            return jnp.mean((_sequential(blks, xin) - tgt) ** 2)

        lp, gp = jax.jit(jax.value_and_grad(loss))(stacked, x)
        ls, gs = jax.jit(jax.value_and_grad(loss_seq))(stacked, x)
        np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
