"""Torch-checkpoint import parity: reference-named torch modules with random
weights must produce the same outputs as our flax encoders after conversion
through models/torch_import.py (the "switch from the reference" bridge —
src/utils/utils.py:199-207, ast_models_pre_train.py:100-125)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from audiossl_tpu.models.torch_import import (
    ast_from_torch,
    audiontt_from_torch,
    strip_prefix,
)

RNG = np.random.default_rng(7)


def _torch_audiontt(n_mels=64, d=128):
    """Reference AudioNTT2020Task6, exact naming (src/encoder/audiontt.py:46-68)."""
    import torch.nn as nn

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            def block(cin):
                return nn.Sequential(
                    nn.Conv2d(cin, 64, 3, stride=1, padding=1),
                    nn.BatchNorm2d(64),
                    nn.ReLU(),
                    nn.MaxPool2d(2, stride=2),
                )
            self.features_1 = block(1)
            self.features_2 = block(64)
            self.features_3 = block(64)
            self.fc = nn.Sequential(
                nn.Linear(64 * (n_mels // 8), d), nn.ReLU(), nn.Dropout(0.3),
                nn.Linear(d, d), nn.ReLU(),
            )

        def forward(self, x):  # [B, 1, F, T]
            taps = []
            for f in (self.features_1, self.features_2, self.features_3):
                x = f(x)
                t = x.permute(0, 3, 2, 1)  # [B, T, F, C]
                b, T, D, C = t.shape
                taps.append(t.reshape(b, T, D * C).mean(dim=1))
            x = x.permute(0, 3, 2, 1)
            b, T, D, C = x.shape
            return taps, self.fc(x.reshape(b, T, D * C))

    m = Ref().eval()
    # non-trivial running stats so eval-mode BN is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.copy_(torch.tensor(RNG.standard_normal(64), dtype=torch.float32))
                mod.running_var.copy_(torch.tensor(0.5 + RNG.random(64), dtype=torch.float32))
    return m


def test_audiontt_import_matches_torch():
    from audiossl_tpu.models.audiontt import AudioNTT2020Task6

    n_mels, d = 64, 128
    tm = _torch_audiontt(n_mels, d)
    x = RNG.standard_normal((2, 1, n_mels, 96)).astype(np.float32)
    with torch.no_grad():
        taps_t, out_t = tm(torch.tensor(x))

    variables = audiontt_from_torch(tm.state_dict())
    ours = AudioNTT2020Task6(
        n_mels=n_mels, d=d, return_all_layers=True, compute_dtype=jnp.float32
    )
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # [B, F, T, 1]
    t1, t2, t3, out = ours.apply(jax.tree.map(jnp.asarray, variables), xj, False)
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(), atol=2e-4)
    for a, b in zip((t1, t2, t3), taps_t):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_audiontt_import_from_lightning_nesting():
    """MoCo Lightning checkpoints carry encoder_q.encoder.* AND
    encoder_k.encoder.*; the importer must pick the query encoder
    (reference: backbone.encoder_q.state_dict())."""
    tm = _torch_audiontt(64, 32)
    sd = {}
    for pref in ("encoder_q.encoder.", "encoder_k.encoder."):
        for k, v in tm.state_dict().items():
            sd[pref + k] = v if pref.startswith("encoder_q") else torch.zeros_like(v)
    from jax.flatten_util import ravel_pytree

    variables = audiontt_from_torch(sd)
    direct = audiontt_from_torch(tm.state_dict())
    a, _ = ravel_pytree(jax.tree.map(jnp.asarray, variables))
    b, _ = ravel_pytree(jax.tree.map(jnp.asarray, direct))
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def _torch_ast(d=32, heads=4, depth=2, in_chans=1):
    """timm-DeiT-named AST transcription (ast_models_pre_train.py naming),
    freq-major token order, output (cls + dist)/2 after final norm."""
    import torch.nn as nn

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(in_chans, d, kernel_size=(16, 16), stride=(10, 10))

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(d, 3 * d, bias=True)
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            B, N, _ = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, heads, d // heads).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * (d // heads) ** -0.5
            att = att.softmax(dim=-1)
            return self.proj((att @ v).transpose(1, 2).reshape(B, N, d))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(d, eps=1e-6)
            self.attn = Attn()
            self.norm2 = nn.LayerNorm(d, eps=1e-6)
            self.mlp = nn.Sequential()
            self.mlp.fc1 = nn.Linear(d, 4 * d)
            self.mlp.fc2 = nn.Linear(4 * d, d)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
            return x + h

    class Ref(nn.Module):
        def __init__(self, n_tokens):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
            self.dist_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
            self.pos_embed = nn.Parameter(torch.randn(1, n_tokens + 2, d) * 0.02)
            self.blocks = nn.ModuleList([Block() for _ in range(depth)])
            self.norm = nn.LayerNorm(d, eps=1e-6)

        def forward(self, x):  # [B, 1, F, T]
            x = self.patch_embed.proj(x)  # [B, D, f, t]
            x = x.flatten(2).transpose(1, 2)  # freq-major tokens
            B = x.shape[0]
            x = torch.cat(
                [self.cls_token.expand(B, -1, -1), self.dist_token.expand(B, -1, -1), x], dim=1
            )
            x = x + self.pos_embed
            for b in self.blocks:
                x = b(x)
            x = self.norm(x)
            return (x[:, 0] + x[:, 1]) / 2

    return Ref


def test_ast_import_matches_torch():
    import dataclasses

    from audiossl_tpu.models.ast import ASTConfig, ASTEncoder

    fdim, tdim = 48, 68  # grid f=4, t=6 -> 24 tokens (+2 prefix)
    f, t = (fdim - 16) // 10 + 1, (tdim - 16) // 10 + 1
    tm = _torch_ast()( n_tokens=f * t).eval()
    x = RNG.standard_normal((2, 1, fdim, tdim)).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.tensor(x))

    variables = {"params": ast_from_torch(tm.state_dict(), num_heads=4, src_grid_ft=(f, t))["params"]}
    cfg = dataclasses.replace(
        ASTConfig.tiny(), embed_dim=32, num_heads=4, depth=2, fused_attention="off"
    )
    ours = ASTEncoder(input_fdim=fdim, input_tdim=tdim, cfg=cfg)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))  # [B, F, T, 1]
    out = ours.apply(jax.tree.map(jnp.asarray, variables), xj, False)
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(), atol=2e-4)


def test_ast_import_rgb_fold_and_square_grid():
    """Raw DeiT: 3-channel patch kernels sum to 1; square grid inferred."""
    f = t = 3
    tm = _torch_ast(in_chans=3)(n_tokens=f * t).eval()
    variables = ast_from_torch(tm.state_dict(), num_heads=4)  # no grid passed
    k = variables["params"]["patch_embed"]["kernel"]
    assert k.shape == (16, 16, 1, 32)
    w = tm.patch_embed.proj.weight.detach().numpy()
    np.testing.assert_allclose(
        k, np.transpose(w.sum(axis=1, keepdims=True), (3, 2, 1, 0)), atol=1e-6
    )


def _torch_mvit(cfg, grid_ft):
    """Full-model torch MViT transcription with the vendored/timm parameter
    naming (mvit/models/attention.py:325-396), freq-major grid — drives
    mast_from_torch. Schedule arrays are shared with our implementation
    (they are config-derived, not weights)."""
    import torch.nn as nn
    import torch.nn.functional as F

    from audiossl_tpu.models.mvit import (
        _rel_dist_index,
        block_out_hw,
        prepare_block_schedule,
        round_width,
    )

    dim_mul, head_mul, pool_q, pool_kv, stride_q, stride_kv = prepare_block_schedule(cfg)

    def pool_out_hw(hw, kernel, stride):
        return block_out_hw(hw, kernel, stride)

    class TAttn(nn.Module):
        def __init__(self, dim, att_dim, heads, hw, kq, sq, kkv, skv):
            super().__init__()
            self.heads, self.att_dim, self.hw = heads, att_dim, hw
            hd = att_dim // heads
            self.qkv = nn.Linear(dim, 3 * att_dim, bias=True)
            self.proj = nn.Linear(att_dim, att_dim)
            self.kq, self.sq, self.kkv, self.skv = kq, sq, kkv, skv
            self.q_hw = pool_out_hw(hw, kq, sq)
            self.k_hw = pool_out_hw(hw, kkv, skv)
            for name, k, s in (("q", kq, sq), ("k", kkv, skv), ("v", kkv, skv)):
                if len(k) and int(np.prod(s)) * int(np.prod(k)) > 1:
                    setattr(self, f"pool_{name}", nn.Conv2d(
                        hd, hd, k, stride=s, padding=tuple(x // 2 for x in k),
                        groups=hd, bias=False))
                    setattr(self, f"norm_{name}", nn.LayerNorm(hd, eps=1e-6))
            rel_h = 2 * max(self.q_hw[0], self.k_hw[0]) - 1
            rel_w = 2 * max(self.q_hw[1], self.k_hw[1]) - 1
            self.rel_pos_h = nn.Parameter(torch.randn(rel_h, hd) * 0.02)
            self.rel_pos_w = nn.Parameter(torch.randn(rel_w, hd) * 0.02)

        def _pool(self, t, name, hw):
            if not hasattr(self, f"pool_{name}"):
                return t, hw
            b, n, l, c = t.shape
            h, w = hw
            u = t.reshape(b * n, h, w, c).permute(0, 3, 1, 2).contiguous()
            u = getattr(self, f"pool_{name}")(u)
            new_hw = (u.shape[2], u.shape[3])
            u = u.reshape(b, n, c, -1).transpose(2, 3)
            return getattr(self, f"norm_{name}")(u), new_hw

        def forward(self, x, hw):
            b, n, _ = x.shape
            hd = self.att_dim // self.heads
            qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            q, q_hw = self._pool(q, "q", hw)
            k, k_hw = self._pool(k, "k", hw)
            v, _ = self._pool(v, "v", hw)
            attn = (q * hd**-0.5) @ k.transpose(-2, -1)
            qh, qw = q_hw
            kh, kw = k_hw
            Rh = self.rel_pos_h[torch.tensor(_rel_dist_index(qh, kh))]
            Rw = self.rel_pos_w[torch.tensor(_rel_dist_index(qw, kw))]
            r_q = q.reshape(b, self.heads, qh, qw, hd)
            attn = (
                attn.view(b, -1, qh, qw, kh, kw)
                + torch.einsum("byhwc,hkc->byhwk", r_q, Rh)[..., :, :, None]
                + torch.einsum("byhwc,wkc->byhwk", r_q, Rw)[..., None, :]
            ).view(b, -1, qh * qw, kh * kw)
            attn = attn.softmax(dim=-1)
            out = attn @ v + q  # residual pooling
            out = out.transpose(1, 2).reshape(b, -1, self.att_dim)
            return self.proj(out), q_hw

    class TBlock(nn.Module):
        def __init__(self, dim, dim_out, heads, hw, i):
            super().__init__()
            att_dim = dim_out  # dim_mul_in_att=True
            self.dim, self.dim_out, self.hw = dim, dim_out, hw
            self.norm1 = nn.LayerNorm(dim, eps=1e-6)
            self.attn = TAttn(dim, att_dim, heads, hw, pool_q[i], stride_q[i], pool_kv[i], stride_kv[i])
            self.norm2 = nn.LayerNorm(att_dim, eps=1e-6)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(att_dim, int(att_dim * cfg.mlp_ratio))
            self.mlp.fc2 = nn.Linear(int(att_dim * cfg.mlp_ratio), dim_out)
            if dim != dim_out:
                self.proj = nn.Linear(dim, dim_out)
            self.sq = stride_q[i]

        def forward(self, x, hw):
            x_norm = self.norm1(x)
            x_block, hw_new = self.attn(x_norm, hw)
            if self.dim != self.dim_out:
                x = self.proj(x_norm)
            if len(self.sq) and int(np.prod(self.sq)) > 1:
                ks = tuple(s + 1 if s > 1 else s for s in self.sq)
                b, n, c = x.shape
                t = x.reshape(b, hw[0], hw[1], c).permute(0, 3, 1, 2)
                t = torch.nn.functional.max_pool2d(t, ks, self.sq, tuple(k // 2 for k in ks))
                x = t.permute(0, 2, 3, 1).reshape(b, -1, c)
            x = x + x_block
            h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
            return x + h, hw_new

    class TPatch(nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = nn.Conv2d(1, cfg.embed_dim, cfg.patch_kernel, cfg.patch_stride, cfg.patch_padding)

    class TMViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = TPatch()
            blocks = []
            dim, heads, hw = cfg.embed_dim, cfg.num_heads, grid_ft
            for i in range(cfg.depth):
                heads = round_width(heads, head_mul[i])
                dim_out = round_width(dim, dim_mul[i], divisor=round_width(heads, head_mul[i]))
                blocks.append(TBlock(dim, dim_out, heads, hw, i))
                hw = pool_out_hw(hw, pool_q[i], stride_q[i])
                dim = dim_out
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x):  # [B, 1, F, T]
            x = self.patch_embed.proj(x)
            hw = (x.shape[2], x.shape[3])
            x = x.flatten(2).transpose(1, 2)  # freq-major tokens
            for blk in self.blocks:
                x, hw = blk(x, hw)
            return x.mean(1)

    return TMViT()


def _tiny_mast_cfg():
    import dataclasses

    from audiossl_tpu.models.mvit import MViTConfig

    return dataclasses.replace(
        MViTConfig.tiny(),
        embed_dim=16,
        num_heads=2,
        depth=3,
        mlp_ratio=2.0,
        droppath_rate=0.0,
        dim_mul=((1, 2.0),),
        head_mul=((1, 2.0),),
        pool_q_stride=((0, 1, 1), (1, 2, 2), (2, 1, 1)),
        pool_kv_stride_adaptive=(2, 2),
        patch_kernel=(16, 16),
        patch_stride=(10, 10),
        patch_padding=(0, 0),
        use_abs_pos=False,
        cls_embed_on=False,
        compute_dtype=None,
        fused_attention="off",
    )


def test_mast_import_matches_torch():
    """Full tiny-MViT torch model (vendored naming, freq-major grid) ->
    mast_from_torch -> our time-major MViT: token-mean outputs must match
    (conv axes transposed, rel_pos_h/w swapped — the grid transpose is
    internal for MViT's symmetric kernels)."""
    from audiossl_tpu.models.mvit import MViT
    from audiossl_tpu.models.torch_import import mast_from_torch

    fdim, tdim = 48, 68  # torch grid (4, 6); ours (6, 4)
    cfg = _tiny_mast_cfg()
    tm = _torch_mvit(cfg, grid_ft=(4, 6)).eval()
    x = RNG.standard_normal((2, 1, fdim, tdim)).astype(np.float32)  # [B,1,F,T]
    with torch.no_grad():
        out_t = tm(torch.tensor(x))

    variables = mast_from_torch({"encoder_q.ast_model.v." + k: v for k, v in tm.state_dict().items()})
    model = MViT(cfg, input_hw=(tdim, fdim), in_chans=1, final_norm=False)
    x_ours = jnp.asarray(np.transpose(x[:, 0], (0, 2, 1))[..., None])  # [B,T,F,1]
    tokens = model.apply({"params": jax.tree.map(jnp.asarray, variables["params"]["mvit"])}, x_ours, False)
    out = jnp.mean(tokens, axis=1)
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(), atol=2e-4)


def test_mast_import_flattens_timm_stage_nesting():
    """stages.{s}.blocks.{b} (timm) and flat blocks.{i} must convert to the
    same tree."""
    from jax.flatten_util import ravel_pytree

    from audiossl_tpu.models.torch_import import mast_from_torch

    cfg = _tiny_mast_cfg()
    tm = _torch_mvit(cfg, grid_ft=(4, 6))
    flat_sd = tm.state_dict()
    staged = {}
    split = {0: (0, 0), 1: (1, 0), 2: (1, 1)}  # stage boundaries at block 1
    for k, v in flat_sd.items():
        if k.startswith("blocks."):
            i = int(k.split(".")[1])
            s, b = split[i]
            staged[f"stages.{s}.blocks.{b}." + k.split(".", 2)[2]] = v
        else:
            staged[k] = v
    a, _ = ravel_pytree(jax.tree.map(jnp.asarray, mast_from_torch(flat_sd)))
    b, _ = ravel_pytree(jax.tree.map(jnp.asarray, mast_from_torch(staged)))
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_strip_prefix_requires_anchor():
    with pytest.raises(KeyError):
        strip_prefix({"a.b": 1}, "features_1.0.weight")


def test_cli_roundtrip_to_orbax(tmp_path):
    """Lightning-style .ckpt -> converter CLI -> orbax encoder checkpoint
    that load_raw/the probe can consume."""
    from audiossl_tpu.models.torch_import import main
    from audiossl_tpu.train.checkpoint import load_raw

    tm = _torch_audiontt(64, 32)
    ckpt = tmp_path / "ref.ckpt"
    torch.save({"state_dict": {"encoder_q.encoder." + k: v for k, v in tm.state_dict().items()}}, ckpt)
    out = tmp_path / "imported"
    main(["--checkpoint", str(ckpt), "--arch", "audiontt", "--out", str(out)])
    restored = load_raw(str(out), 0, kind="encoder")
    direct = audiontt_from_torch(tm.state_dict())
    got = np.asarray(restored["params"]["ConvBlock_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(got, direct["params"]["ConvBlock_0"]["Conv_0"]["kernel"])
    assert "mean" in restored["batch_stats"]["ConvBlock_2"]["BatchNorm_0"]
