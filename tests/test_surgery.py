"""Checkpoint surgery parity (VERDICT r1 Missing #1 / item 3).

The grid cut/interpolate math is checked against a literal torch
transcription of the reference transplant (src/encoder/mast.py:108-125);
cross-grid transfer is exercised end-to-end on MAST (rel-pos tables) and
AST (abs pos embed with cls+dist prefix).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiossl_tpu.models.surgery import (
    fold_patch_proj_channels,
    resize_grid_pos_embed,
    resize_rel_pos,
    token_grid,
    transplant_variables,
)

RNG = np.random.default_rng(11)


def torch_resize_pos(pos, src_grid, dst_grid, prefix):
    """Transcription of mast.py:108-125 (t axis first: cut if <=, else
    bilinear; then f axis), generalized to a rectangular source grid."""
    import torch
    import torch.nn.functional as F

    h0, w0 = src_grid
    f_dim, t_dim = dst_grid
    p = torch.tensor(np.asarray(pos))
    d = p.shape[-1]
    grid = p[:, prefix:, :].reshape(1, h0 * w0, d).transpose(1, 2).reshape(1, d, h0, w0)
    if t_dim <= w0:
        grid = grid[:, :, :, w0 // 2 - t_dim // 2 : w0 // 2 - t_dim // 2 + t_dim]
    else:
        grid = F.interpolate(grid, size=(h0, t_dim), mode="bilinear")
    if f_dim <= h0:
        grid = grid[:, :, h0 // 2 - f_dim // 2 : h0 // 2 - f_dim // 2 + f_dim, :]
    else:
        grid = F.interpolate(grid, size=(f_dim, t_dim), mode="bilinear")
    grid = grid.reshape(1, d, f_dim * t_dim).transpose(1, 2)
    return torch.cat([p[:, :prefix], grid], dim=1).numpy()


class TestPosEmbedResize:
    @pytest.mark.parametrize(
        "src,dst",
        [
            ((12, 101), (8, 48)),   # cut both (AudioSet -> shorter audio)
            ((12, 12), (24, 50)),   # interpolate both (DeiT 224 -> fbank)
            ((12, 101), (24, 64)),  # grow f, cut t
            ((12, 101), (12, 101)), # identity
        ],
    )
    def test_matches_torch_transcription(self, src, dst):
        prefix = 2
        pos = (0.02 * RNG.standard_normal((1, prefix + src[0] * src[1], 32))).astype(np.float32)
        ours = np.asarray(resize_grid_pos_embed(jnp.asarray(pos), src, dst, prefix))
        ref = torch_resize_pos(pos, src, dst, prefix)
        assert ours.shape == ref.shape == (1, prefix + dst[0] * dst[1], 32)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_no_prefix(self):
        pos = (0.02 * RNG.standard_normal((1, 30, 16))).astype(np.float32)
        out = resize_grid_pos_embed(jnp.asarray(pos), (5, 6), (3, 4), 0)
        np.testing.assert_allclose(np.asarray(out), torch_resize_pos(pos, (5, 6), (3, 4), 0), atol=1e-5)

    def test_token_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="tokens"):
            resize_grid_pos_embed(jnp.zeros((1, 31, 16)), (5, 6), (3, 4), 0)


class TestRelPosResize:
    def test_matches_torch_linear_interpolate(self):
        import torch
        import torch.nn.functional as F

        table = (0.02 * RNG.standard_normal((23, 16))).astype(np.float32)
        for new_len in (11, 23, 37):
            ours = np.asarray(resize_rel_pos(jnp.asarray(table), new_len))
            ref = (
                F.interpolate(torch.tensor(table.T)[None], size=new_len, mode="linear")[0]
                .T.numpy()
            )
            assert ours.shape == (new_len, 16)
            np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fold_patch_proj_channels():
    k = RNG.standard_normal((16, 16, 3, 8)).astype(np.float32)
    out = np.asarray(fold_patch_proj_channels(jnp.asarray(k)))
    np.testing.assert_allclose(out, k.sum(axis=2, keepdims=True), atol=1e-6)


def test_token_grid():
    # mast.py get_shape: VALID 16x16 conv, strides (10, 10): 1024x128 -> 101x12
    assert token_grid((1024, 128), 16, (10, 10)) == (101, 12)


class TestCrossGridTransfer:
    def test_mast_rel_pos_transfer(self):
        """MViT-MAST checkpoints transfer across input_tdim: rel_pos tables
        linear-resize, all other weights copy; outputs stay finite, and the
        same-grid transplant is exact."""
        from audiossl_tpu.models.mast import MASTEncoder

        src_model = MASTEncoder(input_fdim=48, input_tdim=64, model_size="tiny")
        dst_model = MASTEncoder(input_fdim=48, input_tdim=96, model_size="tiny")
        x_src = jnp.asarray(RNG.standard_normal((2, 48, 64, 1)).astype(np.float32))
        x_dst = jnp.asarray(RNG.standard_normal((2, 48, 96, 1)).astype(np.float32))
        src_vars = src_model.init({"params": jax.random.key(0)}, x_src, False)
        dst_vars = dst_model.init({"params": jax.random.key(1)}, x_dst, False)

        merged = transplant_variables(dst_vars, src_vars)
        out = dst_model.apply(merged, x_dst, False)
        assert np.all(np.isfinite(np.asarray(out)))
        # the transplant must actually have changed the fresh init
        fresh = dst_model.apply(dst_vars, x_dst, False)
        assert np.abs(np.asarray(out) - np.asarray(fresh)).max() > 1e-6

        # same-grid transplant == source model exactly
        same = transplant_variables(
            src_model.init({"params": jax.random.key(2)}, x_src, False), src_vars
        )
        np.testing.assert_allclose(
            np.asarray(src_model.apply(same, x_src, False)),
            np.asarray(src_model.apply(src_vars, x_src, False)),
            atol=1e-6,
        )

    def test_ast_pos_embed_transfer(self):
        from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

        cfg = ASTConfig.tiny()
        src_model = ASTEncoder(input_fdim=48, input_tdim=96, cfg=cfg)
        dst_model = ASTEncoder(input_fdim=48, input_tdim=64, cfg=cfg)
        x_src = jnp.asarray(RNG.standard_normal((2, 48, 96, 1)).astype(np.float32))
        x_dst = jnp.asarray(RNG.standard_normal((2, 48, 64, 1)).astype(np.float32))
        src_vars = src_model.init({"params": jax.random.key(0)}, x_src, False)
        dst_vars = dst_model.init({"params": jax.random.key(1)}, x_dst, False)

        # AST patchify sees (tdim, fdim): time is the H axis
        src_grid = token_grid((96, 48), cfg.patch, (cfg.tstride, cfg.fstride))
        dst_grid = token_grid((64, 48), cfg.patch, (cfg.tstride, cfg.fstride))
        merged = transplant_variables(
            dst_vars, src_vars, src_grid=src_grid, dst_grid=dst_grid, prefix_tokens=2
        )
        out = dst_model.apply(merged, x_dst, False)
        assert np.all(np.isfinite(np.asarray(out)))
        # the resized pos_embed retains the source's center-cut values
        pe_src = np.asarray(src_vars["params"]["pos_embed"])
        pe_dst = np.asarray(merged["params"]["pos_embed"])
        ref = torch_resize_pos(pe_src, src_grid, dst_grid, 2)
        np.testing.assert_allclose(pe_dst, ref, atol=1e-5)

    def test_checkpoint_roundtrip(self, tmp_path):
        """load_pretrained_encoder: export at one grid, import at another."""
        from audiossl_tpu.models.ast import ASTConfig, ASTEncoder
        from audiossl_tpu.models.surgery import load_pretrained_encoder
        from audiossl_tpu.train import checkpoint as ckpt

        cfg = ASTConfig.tiny()
        src_model = ASTEncoder(input_fdim=48, input_tdim=96, cfg=cfg)
        x_src = jnp.asarray(RNG.standard_normal((1, 48, 96, 1)).astype(np.float32))
        src_vars = src_model.init({"params": jax.random.key(0)}, x_src, False)
        ckpt.save_checkpoint(str(tmp_path), 7, {"step": 7}, src_vars)

        dst_model = ASTEncoder(input_fdim=48, input_tdim=64, cfg=cfg)
        x_dst = jnp.asarray(RNG.standard_normal((1, 48, 64, 1)).astype(np.float32))
        dst_vars = dst_model.init({"params": jax.random.key(1)}, x_dst, False)
        merged = load_pretrained_encoder(
            str(tmp_path), dst_vars,
            src_input_hw=(96, 48), dst_input_hw=(64, 48),
            patch=cfg.patch, strides=(cfg.tstride, cfg.fstride), prefix_tokens=2,
        )
        out = dst_model.apply(merged, x_dst, False)
        assert np.all(np.isfinite(np.asarray(out)))
        # non-positional weights must have transferred exactly
        np.testing.assert_allclose(
            np.asarray(merged["params"]["block0"]["Dense_0"]["kernel"]),
            np.asarray(src_vars["params"]["block0"]["Dense_0"]["kernel"]),
        )
