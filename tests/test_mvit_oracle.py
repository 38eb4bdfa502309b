"""MViT MultiScaleAttention numeric parity vs a torch transcription.

The torch model below is transcribed from the vendored reference spec
(extras/mast_new/mast/mvit/models/attention.py) for a small config; flax
weights are copied in and outputs compared. This pins the pooled-attention
and decomposed rel-pos math, the largest untested numeric surface.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from audiossl_tpu.models.mvit import MultiScaleAttention, _rel_dist_index

RNG = np.random.default_rng(11)


def torch_attention_pool(tensor, conv, norm, hw):
    # attention_pool (attention.py:12-42), 4-D [B, heads, L, C] path, no cls
    b, n, l, c = tensor.shape
    h, w = hw
    t = tensor.reshape(b * n, h, w, c).permute(0, 3, 1, 2).contiguous()
    t = conv(t)
    new_hw = [t.shape[2], t.shape[3]]
    t = t.reshape(b, n, c, -1).transpose(2, 3)
    t = norm(t)
    return t, new_hw


def torch_msa(x, hw, params, num_heads, dim_out, stride_q, stride_kv, rel=True):
    """MultiScaleAttention.forward (attention.py:226-302), conv mode, no cls."""
    b, n, _ = x.shape
    head_dim = dim_out // num_heads
    scale = head_dim**-0.5
    qkv = F.linear(x, params["qkv_w"], params["qkv_b"])
    qkv = qkv.reshape(b, n, 3, num_heads, head_dim).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    q, q_hw = torch_attention_pool(q, params["pool_q"], params["norm_q"], hw)
    k, k_hw = torch_attention_pool(k, params["pool_k"], params["norm_k"], hw)
    v, _ = torch_attention_pool(v, params["pool_v"], params["norm_v"], hw)

    attn = (q * scale) @ k.transpose(-2, -1)
    if rel:
        q_h, q_w = q_hw
        k_h, k_w = k_hw
        dist_h = torch.tensor(_rel_dist_index(q_h, k_h))
        dist_w = torch.tensor(_rel_dist_index(q_w, k_w))
        Rh = params["rel_pos_h"][dist_h]
        Rw = params["rel_pos_w"][dist_w]
        r_q = q.reshape(b, num_heads, q_h, q_w, head_dim)
        rel_h = torch.einsum("byhwc,hkc->byhwk", r_q, Rh)
        rel_w = torch.einsum("byhwc,wkc->byhwk", r_q, Rw)
        attn = (
            attn.view(b, -1, q_h, q_w, k_h, k_w)
            + rel_h[:, :, :, :, :, None]
            + rel_w[:, :, :, :, None, :]
        ).view(b, -1, q_h * q_w, k_h * k_w)
    attn = attn.softmax(dim=-1)
    out = attn @ v
    out = out + q  # residual pooling
    out = out.transpose(1, 2).reshape(b, -1, dim_out)
    return F.linear(out, params["proj_w"], params["proj_b"]), q_hw


def test_multiscale_attention_matches_torch():
    hw = (8, 6)
    dim, dim_out, heads = 16, 16, 2
    head_dim = dim_out // heads
    stride_q, stride_kv = (2, 2), (2, 2)
    n = hw[0] * hw[1]
    x = RNG.standard_normal((2, n, dim)).astype(np.float32)

    msa = MultiScaleAttention(
        dim_out=dim_out,
        num_heads=heads,
        input_hw=hw,
        kernel_q=(3, 3),
        kernel_kv=(3, 3),
        stride_q=stride_q,
        stride_kv=stride_kv,
        qkv_bias=True,
        rel_pos_spatial=True,
        residual_pooling=True,
    )
    variables = msa.init({"params": jax.random.key(0)}, jnp.asarray(x))
    p = variables["params"]
    out_jax, q_hw = msa.apply(variables, jnp.asarray(x))

    # transplant flax params into torch
    def t(a):
        return torch.tensor(np.asarray(a))

    def make_pool(name):
        conv = nn.Conv2d(head_dim, head_dim, 3, stride=2, padding=1, groups=head_dim, bias=False)
        # flax conv kernel [kh, kw, in/groups=1, out] -> torch [out, 1, kh, kw]
        conv.weight.data = t(p[name]["Conv_0"]["kernel"]).permute(3, 2, 0, 1)
        norm = nn.LayerNorm(head_dim, eps=1e-6)
        norm.weight.data = t(p[name]["LayerNorm_0"]["scale"])
        norm.bias.data = t(p[name]["LayerNorm_0"]["bias"])
        return conv, norm

    pq, nq = make_pool("pool_q")
    pk, nk = make_pool("pool_k")
    pv, nv = make_pool("pool_v")
    params = {
        "qkv_w": t(p["qkv"]["kernel"]).T,
        "qkv_b": t(p["qkv"]["bias"]),
        "proj_w": t(p["proj"]["kernel"]).T,
        "proj_b": t(p["proj"]["bias"]),
        "pool_q": pq, "norm_q": nq, "pool_k": pk, "norm_k": nk, "pool_v": pv, "norm_v": nv,
        "rel_pos_h": t(p["rel_pos_h"]),
        "rel_pos_w": t(p["rel_pos_w"]),
    }
    with torch.no_grad():
        out_t, q_hw_t = torch_msa(
            torch.tensor(x), list(hw), params, heads, dim_out, stride_q, stride_kv
        )
    assert tuple(q_hw) == tuple(q_hw_t)
    np.testing.assert_allclose(np.asarray(out_jax), out_t.numpy(), atol=2e-5)
