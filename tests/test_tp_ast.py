"""Tensor-parallel AST == the dense flax ASTEncoder, same checkpoint format.

Promotion of parallel/tp.py's toy-MLP primitives to the real transformer
(VERDICT r3 Next #2): head-sharded attention + column/row MLP via GSPMD
specs (parallel/tp_ast.py) over a ('data', 'model') mesh must reproduce the
dense encoder's forward and gradients from the very param tree the repo's
AST checkpoints store.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.models.ast import ASTConfig, ASTEncoder
from audiossl_tpu.parallel.tp_ast import (
    ast_tp_shardings,
    ast_tp_specs,
    make_dp_tp_mesh,
    shard_ast_params,
)

RNG = np.random.default_rng(23)

CFG = ASTConfig(
    embed_dim=32, depth=4, num_heads=4, mlp_ratio=2.0,
    fstride=8, tstride=8, patch=8, fused_attention="off",
)
F_IN, T_IN, BATCH = 32, 64, 8


@pytest.fixture(scope="module")
def encoder_and_vars():
    enc = ASTEncoder(input_fdim=F_IN, input_tdim=T_IN, cfg=CFG)
    x = jnp.asarray(RNG.standard_normal((BATCH, F_IN, T_IN, 1)), jnp.float32)
    variables = jax.jit(enc.init, static_argnums=2)({"params": jax.random.key(0)}, x, False)
    ref = jax.jit(enc.apply, static_argnums=2)(variables, x, False)
    return enc, variables, x, ref


class TestSpecs:
    def test_megatron_layout(self, encoder_and_vars):
        _, variables, _, _ = encoder_and_vars
        specs = ast_tp_specs(variables["params"], 2)
        blk = specs["block0"]
        att = blk["MultiHeadDotProductAttention_0"]
        assert att["query"]["kernel"] == P(None, "model", None)  # head-sharded
        assert att["query"]["bias"] == P("model", None)
        assert att["out"]["kernel"] == P("model", None, None)  # row-parallel
        assert att["out"]["bias"] == P()
        assert blk["Dense_0"]["kernel"] == P(None, "model")  # column
        assert blk["Dense_0"]["bias"] == P("model")
        assert blk["Dense_1"]["kernel"] == P("model", None)  # row
        assert blk["Dense_1"]["bias"] == P()
        assert blk["LayerNorm_0"]["scale"] == P()
        assert specs["patch_embed"]["kernel"] == P()
        assert specs["pos_embed"] == P()

    def test_indivisible_heads_raise(self, encoder_and_vars):
        _, variables, _, _ = encoder_and_vars
        with pytest.raises(ValueError, match="num_heads divisible"):
            ast_tp_specs(variables["params"], 8)  # 4 heads, tp=8


class TestTPMatchesDense:
    @pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
    def test_forward(self, encoder_and_vars, dp, tp):
        enc, variables, x, ref = encoder_and_vars
        mesh = make_dp_tp_mesh(dp, tp)
        p_tp = shard_ast_params(variables["params"], mesh)
        # the weights are physically distributed: each chip holds 1/tp of
        # the heads and of the MLP hidden dim
        qk = p_tp["block0"]["MultiHeadDotProductAttention_0"]["query"]["kernel"]
        assert qk.addressable_shards[0].data.shape[1] == CFG.num_heads // tp
        d0 = p_tp["block0"]["Dense_0"]["kernel"]
        assert d0.addressable_shards[0].data.shape[1] == int(CFG.embed_dim * CFG.mlp_ratio) // tp

        fwd = jax.jit(
            lambda p, xb: enc.apply({"params": p}, xb, False),
            in_shardings=(ast_tp_shardings(variables["params"], mesh),
                          NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        out = fwd(p_tp, jax.device_put(x, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients(self, encoder_and_vars):
        enc, variables, x, _ = encoder_and_vars
        mesh = make_dp_tp_mesh(2, 4)
        p_sh = ast_tp_shardings(variables["params"], mesh)

        def loss(p, xb):
            return jnp.mean(jnp.square(enc.apply({"params": p}, xb, False)))

        g_dense = jax.jit(jax.grad(loss))(variables["params"], x)
        g_tp = jax.jit(
            jax.grad(loss),
            in_shardings=(p_sh, NamedSharding(mesh, P("data"))),
            out_shardings=p_sh,  # grads land in the param layout (tp update)
        )(shard_ast_params(variables["params"], mesh),
          jax.device_put(x, NamedSharding(mesh, P("data"))))
        flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dense)
        for (path, a), b in zip(flat_d, jax.tree.leaves(g_tp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_checkpoint_format_roundtrip(self, encoder_and_vars, tmp_path):
        """A saved AST encoder checkpoint loads straight into the tp layout."""
        from audiossl_tpu.train import checkpoint as ckpt

        enc, variables, x, ref = encoder_and_vars
        ckpt.save_encoder_only(str(tmp_path), 1, {"params": variables["params"], "batch_stats": {}})
        target = {"params": jax.tree.map(np.zeros_like, variables["params"]), "batch_stats": {}}
        restored = ckpt.load_encoder(str(tmp_path), target)

        mesh = make_dp_tp_mesh(4, 2)
        p_tp = shard_ast_params(restored["params"], mesh)
        fwd = jax.jit(
            lambda p, xb: enc.apply({"params": p}, xb, False),
            in_shardings=(ast_tp_shardings(restored["params"], mesh),
                          NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        out = fwd(p_tp, jax.device_put(x, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


class TestProbeKnob:
    def test_downstream_tp_probe_e2e(self, tmp_path):
        """downstream.tp=2 drives the AST linear probe with the encoder
        tensor-parallel over a (4, 2) dp x tp mesh (the trainer knob of
        VERDICT r3 Next #2)."""
        import os

        from audiossl_tpu.config import load_config
        from audiossl_tpu.data.make_test_wavs import make
        from audiossl_tpu.downstream.probe import run_downstream

        wav_dir = make(str(tmp_path / "wavs"), n=16)
        dcfg = load_config(None, "downstream")
        dcfg["run"].update(batch_size=8, epochs=1, lr=0.01, num_dataloader_workers=2)
        # AST small: 6 heads / hidden 1536, both divisible by tp=2
        dcfg["downstream"]["base_encoder"].update(type="AST", output_dim=384, model_size="small")
        dcfg["downstream"]["tp"] = 2
        result = run_downstream(
            dcfg,
            {
                "task": "tp_probe",
                "train_csv": os.path.join(wav_dir, "downstream_train.csv"),
                "test_csv": os.path.join(wav_dir, "downstream_test.csv"),
                "freeze": True,
                "exp_dir": str(tmp_path / "exp"),
            },
        )
        assert 0.0 <= result["best_test_acc"] <= 1.0
        # the returned encoder params really are model-axis sharded
        qk = result["params"]["encoder"]["block0"]["MultiHeadDotProductAttention_0"]["query"]["kernel"]
        assert qk.addressable_shards[0].data.shape[1] == 3  # 6 heads / tp=2

    def test_tp_requires_ast(self):
        from audiossl_tpu.config import load_config
        from audiossl_tpu.downstream.probe import run_downstream

        dcfg = load_config(None, "downstream")
        dcfg["downstream"]["tp"] = 2  # default encoder is AudioNTT
        with pytest.raises(ValueError, match="requires base_encoder.type: AST"):
            run_downstream(dcfg, {"task": "x"})
