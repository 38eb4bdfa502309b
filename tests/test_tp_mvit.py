"""Tensor-parallel MViT/MAST == the dense encoder, same checkpoint format.

Extends tp from AST to the flagship pretrain encoder (VERDICT r4 Next #4):
weight-sharded GSPMD specs for the MViTv2 block layout — fused qkv
column-sharded, attention proj row-sharded, Megatron MLP pair; pooling
convs / rel-pos tables / norms replicated (parallel/tp_mvit.py, vs the
reference's vendored attention at
extras/mast_new/mast/models/mvit/models/attention.py:93) — must reproduce
the dense encoder's forward and gradients from the exact flax param tree
every MAST checkpoint in this repo stores, and drive the real SS-MAST
pretrain loop via the ``pretrain.tp`` knob.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audiossl_tpu.models.mast import MASTEncoder
from audiossl_tpu.parallel.tp_mvit import (
    make_dp_tp_mesh,
    mvit_tp_shardings,
    mvit_tp_specs,
    shard_mvit_params,
)

RNG = np.random.default_rng(29)

F_IN, T_IN, BATCH = 48, 64, 8


@pytest.fixture(scope="module")
def encoder_and_vars():
    # f32 exact path (compute_dtype=None), XLA attention + unrolled pooling
    # (both tp requirements — parallel/tp_mvit.py docstring)
    enc = MASTEncoder(
        input_fdim=F_IN, input_tdim=T_IN, model_size="tiny",
        compute_dtype=None, fused_attention="off", pool_impl="unrolled",
    )
    x = jnp.asarray(RNG.standard_normal((BATCH, F_IN, T_IN, 1)), jnp.float32)
    variables = jax.jit(enc.init, static_argnums=2)({"params": jax.random.key(0)}, x, False)
    ref = jax.jit(enc.apply, static_argnums=2)(variables, x, False)
    return enc, variables, x, ref


class TestPoolImpl:
    def test_unrolled_matches_conv(self, encoder_and_vars):
        """pool_impl='unrolled' (the tp-safe shift-multiply-add) is the same
        math AND the same param tree as the grouped-conv default, so
        checkpoints interchange between the two."""
        _, variables, x, ref = encoder_and_vars
        enc_conv = MASTEncoder(
            input_fdim=F_IN, input_tdim=T_IN, model_size="tiny",
            compute_dtype=None, fused_attention="off", pool_impl="conv",
        )
        out = jax.jit(enc_conv.apply, static_argnums=2)(variables, x, False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_grouped_conv_spmd_grad_hazard(self):
        """Pin the reason pool_impl='unrolled' exists: the SPMD partitioner
        scales a depthwise conv's FILTER gradient by the model-axis size
        when the conv input descends from a model-sharded matmul (observed
        on jax 0.9 CPU). If this starts passing with 'conv', the workaround
        can be retired."""
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
        rng = np.random.default_rng(0)
        B, H, C = 2, 8, 32
        x = jnp.asarray(rng.standard_normal((B, H, 24, C)), jnp.float32)
        w_qkv = jnp.asarray(rng.standard_normal((C, 3 * H * C)) * 0.05, jnp.float32)
        w_conv = jnp.asarray(rng.standard_normal((3, 3, 1, C)) * 0.2, jnp.float32)

        def loss(params, xb):
            w_qkv, w_conv = params
            b, h, l, c = xb.shape
            t = (xb.reshape(b, h * l, c) @ w_qkv).reshape(b, h * l, 3, H, C)[:, :, 0]
            t = t.transpose(0, 2, 1, 3).reshape(b * H, (h * l) // 4, 4, C)
            out = jax.lax.conv_general_dilated(
                t, w_conv, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
            return jnp.mean(jnp.square(out))

        params = (w_qkv, w_conv)
        g_dense = jax.jit(jax.grad(loss))(params, x)
        p_sh = (NamedSharding(mesh, P(None, "model")), NamedSharding(mesh, P()))
        g_tp = jax.jit(
            jax.grad(loss), in_shardings=(p_sh, NamedSharding(mesh, P("data"))),
            out_shardings=p_sh,
        )(jax.device_put(params, p_sh), jax.device_put(x, NamedSharding(mesh, P("data"))))
        ratio = np.median(np.asarray(g_tp[1]) / np.asarray(g_dense[1]))
        assert not np.isclose(ratio, 1.0, atol=1e-3), (
            "grouped-conv SPMD filter grads now match the dense ones — the "
            "pool_impl='unrolled' workaround (models/mvit.py) can be retired"
        )


class TestSpecs:
    def test_megatron_layout(self, encoder_and_vars):
        _, variables, _, _ = encoder_and_vars
        specs = mvit_tp_specs(variables["params"], 2)
        blk = specs["mvit"]["block0"]
        assert blk["attn"]["qkv"]["kernel"] == P(None, "model")  # column
        assert blk["attn"]["qkv"]["bias"] == P("model")
        assert blk["attn"]["proj"]["kernel"] == P("model", None)  # row
        assert blk["attn"]["proj"]["bias"] == P()
        assert blk["mlp"]["Dense_0"]["kernel"] == P(None, "model")
        assert blk["mlp"]["Dense_0"]["bias"] == P("model")
        assert blk["mlp"]["Dense_1"]["kernel"] == P("model", None)
        assert blk["mlp"]["Dense_1"]["bias"] == P()
        assert blk["norm1"]["scale"] == P()
        assert specs["mvit"]["patch_embed"]["kernel"] == P()
        # pooled-attention machinery is shared across heads -> replicated
        blk1 = specs["mvit"]["block1"]  # first stage-transition block pools q
        assert blk1["attn"]["pool_q"]["Conv_0"]["kernel"] == P()
        assert blk1["attn"]["rel_pos_h"] == P()
        # block-level dim-change proj stays replicated (3 per model)
        assert blk1["proj"]["kernel"] == P()

    def test_applies_to_moco_state_and_moments(self, encoder_and_vars):
        """One path-keyed walk covers the EMA tower and Adam moments too."""
        import optax

        _, variables, _, _ = encoder_and_vars
        params = {"encoder": {"mast": variables["params"]}}
        opt_state = jax.eval_shape(optax.adamw(1e-3).init, params)
        specs = mvit_tp_specs(opt_state, 2)
        mu = specs[0].mu["encoder"]["mast"]["mvit"]["block0"]
        assert mu["attn"]["qkv"]["kernel"] == P(None, "model")
        assert mu["mlp"]["Dense_1"]["kernel"] == P("model", None)

    def test_indivisible_dims_raise(self, encoder_and_vars):
        _, variables, _, _ = encoder_and_vars
        with pytest.raises(ValueError, match="dim_out divisible"):
            mvit_tp_specs(variables["params"], 5)  # 96 % 5 != 0


@pytest.mark.slow
class TestTPMatchesDense:
    @pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
    def test_forward(self, encoder_and_vars, dp, tp):
        enc, variables, x, ref = encoder_and_vars
        mesh = make_dp_tp_mesh(dp, tp)
        p_tp = shard_mvit_params(variables["params"], mesh)
        # weights are physically distributed: each chip holds 1/tp of the
        # qkv columns and of the MLP hidden dim
        qk = p_tp["mvit"]["block0"]["attn"]["qkv"]["kernel"]
        assert qk.addressable_shards[0].data.shape[1] == qk.shape[1] // tp
        d0 = p_tp["mvit"]["block0"]["mlp"]["Dense_0"]["kernel"]
        assert d0.addressable_shards[0].data.shape[1] == d0.shape[1] // tp

        fwd = jax.jit(
            lambda p, xb: enc.apply({"params": p}, xb, False),
            in_shardings=(mvit_tp_shardings(variables["params"], mesh),
                          NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        out = fwd(p_tp, jax.device_put(x, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients(self, encoder_and_vars):
        enc, variables, x, _ = encoder_and_vars
        mesh = make_dp_tp_mesh(2, 4)
        p_sh = mvit_tp_shardings(variables["params"], mesh)

        def loss(p, xb):
            return jnp.mean(jnp.square(enc.apply({"params": p}, xb, False)))

        g_dense = jax.jit(jax.grad(loss))(variables["params"], x)
        g_tp = jax.jit(
            jax.grad(loss),
            in_shardings=(p_sh, NamedSharding(mesh, P("data"))),
            out_shardings=p_sh,  # grads land in the param layout (tp update)
        )(shard_mvit_params(variables["params"], mesh),
          jax.device_put(x, NamedSharding(mesh, P("data"))))
        flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dense)
        for (path, a), b in zip(flat_d, jax.tree.leaves(g_tp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )


def _tp_pretrain_cfg(tmp_path, tp=2, **pre_extra):
    pre = {
        "base_encoder": {"type": "MAST", "output_dim": 768},
        "tp": tp,
        "model_size": "tiny",
        "compute_dtype": "f32",
        "contrastive_dim": 16,
        "num_negatives": 32,
        "softmax_temperature": 0.07,
        "encoder_momentum": 0.99,
        "steps_per_epoch": 2,
        "normalization": "precomputed",
        "norm_stats": {"mean": -4.27, "std": 4.57},
        "input": {
            "type": "fbank", "sampling_rate": 16000, "length_wave": 0.64,
            "n_mels": 48, "target_length": 64, "mixup": 0.5,
        },
        "augmentations": {"SpecMask": {"freq_param": 8, "time_param": 8}},
    }
    pre.update(pre_extra)
    return {
        "run": {
            "batch_size": 8, "epochs": 1, "learning_rate": 3e-4,
            "optimizer": "adamw", "num_dataloader_workers": 2,
            "save_path": str(tmp_path / "run"),
        },
        "pretrain": pre,
    }


@pytest.mark.slow
class TestPretrainKnob:
    def test_pretrain_tp_e2e(self, tmp_path):
        """pretrain.tp=2 drives the real SS-MAST loop over a (4, 2) dp x tp
        mesh: finite descending-capable loss, tp-sharded towers AND moments,
        and a checkpoint that resumes (VERDICT r4 Next #4)."""
        from audiossl_tpu.data.make_test_wavs import make
        from audiossl_tpu.train.loop import train_upstream

        wav_dir = make(str(tmp_path / "wavs"), n=16)
        cfg = _tp_pretrain_cfg(tmp_path)
        state, ckpt_dir = train_upstream(
            cfg, f"{wav_dir}/pretrain.csv", "ssmast", max_steps=2, save_every=0
        )
        assert int(state.step) == 2
        qk = state.params["encoder"]["mast"]["mvit"]["block0"]["attn"]["qkv"]["kernel"]
        assert qk.addressable_shards[0].data.shape[1] == qk.shape[1] // 2
        # the EMA key tower is sharded identically (it is the HBM doubler)
        kk = state.ssl_state.params_k["mast"]["mvit"]["block0"]["attn"]["qkv"]["kernel"]
        assert kk.addressable_shards[0].data.shape[1] == kk.shape[1] // 2
        # resume from the tp checkpoint continues the step count
        state2, _ = train_upstream(
            cfg, f"{wav_dir}/pretrain.csv", "ssmast",
            load_checkpoint=ckpt_dir, max_steps=3, save_every=0,
        )
        assert int(state2.step) == 3
        # downstream handoff: the encoder-only checkpoint written FROM the
        # tp-sharded state restores densely (orbax saves global arrays) and
        # matches the sharded tower leaf-for-leaf — the upstream->downstream
        # handoff (utils.py:199-207 equivalent) is tp-layout-agnostic.
        # (latest checkpoint in ckpt_dir is the resumed run's step-3 save)
        from audiossl_tpu.train import checkpoint as ckptmod

        trunk = state2.params["encoder"]["mast"]
        target = {"params": jax.tree.map(np.zeros_like, trunk), "batch_stats": {}}
        restored = ckptmod.load_encoder(ckpt_dir, target)
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(trunk)[0],
            jax.tree.leaves(restored["params"]),
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path)
            )

    def test_pretrain_tp_with_grad_accum(self, tmp_path):
        """pretrain.tp composes with the exact grad-accumulation path
        (objectives/ssmast.py value_and_grad scans microbatches while the
        params stay model-sharded): one step at tp=2, accum=2."""
        from audiossl_tpu.data.make_test_wavs import make
        from audiossl_tpu.train.loop import train_upstream

        wav_dir = make(str(tmp_path / "wavs"), n=8)
        cfg = _tp_pretrain_cfg(tmp_path, grad_accum_steps=2)
        state, _ = train_upstream(
            cfg, f"{wav_dir}/pretrain.csv", "ssmast", max_steps=1, save_every=0
        )
        assert int(state.step) == 1
        qk = state.params["encoder"]["mast"]["mvit"]["block0"]["attn"]["qkv"]["kernel"]
        assert qk.addressable_shards[0].data.shape[1] == qk.shape[1] // 2

    def test_pretrain_fsdp_e2e(self, tmp_path):
        """run.fsdp on the PRETRAIN loop (VERDICT r4 Next #5 'works but
        unwired' cell): the SS-MAST step runs as the whole-loop GSPMD
        variant with params, Adam moments, the EMA key tower AND the MoCo
        queue physically sharded over the data mesh."""
        from audiossl_tpu.data.make_test_wavs import make
        from audiossl_tpu.train.loop import train_upstream

        wav_dir = make(str(tmp_path / "wavs"), n=16)
        cfg = _tp_pretrain_cfg(tmp_path, tp=0, num_negatives=1024)
        cfg["run"]["fsdp"] = True
        state, _ = train_upstream(
            cfg, f"{wav_dir}/pretrain.csv", "ssmast", max_steps=2, save_every=0
        )
        assert int(state.step) == 2
        qk = state.params["encoder"]["mast"]["mvit"]["block0"]["attn"]["qkv"]["kernel"]
        assert qk.addressable_shards[0].data.shape != qk.shape  # 1/n per chip
        q = state.ssl_state.queue  # [16, 1024] shards on its largest dim
        assert q.addressable_shards[0].data.shape[1] == q.shape[1] // 8

    def test_fsdp_rejects_tp_combination(self, tmp_path):
        from audiossl_tpu.train.loop import train_upstream

        cfg = _tp_pretrain_cfg(tmp_path, tp=2)
        cfg["run"]["fsdp"] = True
        with pytest.raises(ValueError, match="mutually exclusive"):
            train_upstream(cfg, "unused.csv", "ssmast")

    def test_tp_requires_mast(self, tmp_path):
        from audiossl_tpu.config import load_config
        from audiossl_tpu.train.loop import train_upstream

        cfg = load_config(None, "delores_s")
        cfg["pretrain"]["tp"] = 2
        with pytest.raises(ValueError, match="requires base_encoder.type: MAST"):
            train_upstream(cfg, "unused.csv", "delores_s")

    def test_tp_rejects_stateful_aug(self, tmp_path):
        from audiossl_tpu.data.make_test_wavs import make
        from audiossl_tpu.train.loop import train_upstream

        wav_dir = make(str(tmp_path / "wavs"), n=8)
        cfg = _tp_pretrain_cfg(tmp_path, normalization="mean_var")
        with pytest.raises(ValueError, match="stateless augmentation"):
            train_upstream(cfg, f"{wav_dir}/pretrain.csv", "ssmast", max_steps=1)

    def test_tp_rejects_zero(self, tmp_path):
        from audiossl_tpu.train.loop import train_upstream

        cfg = _tp_pretrain_cfg(tmp_path)
        cfg["run"]["zero_optimizer"] = True
        with pytest.raises(ValueError, match="zero_optimizer"):
            train_upstream(cfg, "unused.csv", "ssmast")
