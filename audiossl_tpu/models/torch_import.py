"""Import the reference's torch checkpoints into audiossl_tpu flax trees.

The reference ships/pretrains torch weights three ways a switching user may
hold: Lightning upstream checkpoints whose `encoder_q` wraps
AudioNTT2020Task6 (src/utils/utils.py:199-207 `load_pretrained_encoder`
takes `encoder_q.state_dict()`), raw AudioNTT state_dicts
(src/encoder/audiontt.py:37-104), and DeiT/AST transformer checkpoints
(extras/mast_new/mast/models/ast_models_pre_train.py:100-125: RGB patch
kernels summed to 1 channel, pos-embed grid cut/interpolated). This module
converts those torch state_dicts into this package's flax variables so the
downstream/probe/training flows run them unchanged. Conventions bridged:

* torch conv weights are OIHW with spatial (freq, time) — the reference
  feeds [B, 1, mels, time]; our encoders run time-major NHWC, so spatial
  transposes to (time, freq) and the kernel becomes HWIO.
* torch Linear weights are [out, in] -> flax kernel [in, out].
* the reference AST flattens patch tokens freq-major
  (ast_models_pre_train.py:160: grid reshape (1, D, f, t)); ours are
  time-major -> the pos-embed grid transposes on import.
* fused qkv Linears split into flax MultiHeadDotProductAttention's
  query/key/value DenseGeneral kernels [D, H, Dh] (torch packs head-major).

torch is only needed when actually reading a .pth file — state_dicts of
numpy arrays convert without it (tests exercise both).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t.astype(np.float32)
    return t.detach().cpu().numpy().astype(np.float32)  # torch tensor


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """torch.load a .pth/.ckpt; unwrap Lightning's {"state_dict": ...}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return dict(ckpt)


def strip_prefix(sd: Mapping[str, Any], anchor: str) -> dict[str, Any]:
    """Select the sub-dict below the (unique) prefix of the key ending in
    ``anchor`` — e.g. anchor "features_1.0.weight" finds the AudioNTT inside
    "encoder_q.encoder.features_1.0.weight" (the Lightning nesting the
    reference strips via `backbone.encoder_q.state_dict()`)."""
    hits = {k[: -len(anchor)] for k in sd if k.endswith(anchor)}
    if not hits:
        raise KeyError(f"no key ending with {anchor!r} in state_dict")
    if len(hits) > 1:
        # encoder_q and encoder_k both carry the pattern in MoCo checkpoints;
        # prefer the query encoder like the reference loader does
        q = [p for p in sorted(hits) if "encoder_k" not in p]
        hits = {q[0]} if q else {sorted(hits)[0]}
    prefix = hits.pop()
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _conv_hwio_time_major(w: np.ndarray) -> np.ndarray:
    """torch OIHW, spatial (freq, time) -> flax HWIO, spatial (time, freq)."""
    return np.transpose(w, (3, 2, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def audiontt_from_torch(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Reference AudioNTT2020Task6 weights -> variables for
    ``models.audiontt.AudioNTT2020Task6`` (any prefix depth; BN running
    stats included). Layer map: features_{1,2,3} = Conv/BN blocks,
    fc.{0,3} = the two Dense layers (src/encoder/audiontt.py:46-68)."""
    sd = {k: _np(v) for k, v in strip_prefix(state_dict, "features_1.0.weight").items()
          if not k.endswith("num_batches_tracked")}
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}
    for i in range(3):
        t = f"features_{i + 1}"
        params[f"ConvBlock_{i}"] = {
            "Conv_0": {
                "kernel": _conv_hwio_time_major(sd[f"{t}.0.weight"]),
                "bias": sd[f"{t}.0.bias"],
            },
            "BatchNorm_0": {"scale": sd[f"{t}.1.weight"], "bias": sd[f"{t}.1.bias"]},
        }
        batch_stats[f"ConvBlock_{i}"] = {
            "BatchNorm_0": {
                "mean": sd[f"{t}.1.running_mean"],
                "var": sd[f"{t}.1.running_var"],
            }
        }
    for j, t in ((0, "fc.0"), (1, "fc.3")):
        params[f"Dense_{j}"] = {"kernel": _linear(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}
    return {"params": params, "batch_stats": batch_stats}


def _split_heads_in(w: np.ndarray, heads: int) -> np.ndarray:
    """torch [D_out, D_in] (head-major out) -> flax q/k/v kernel [D_in, H, Dh]."""
    d_out, d_in = w.shape
    return _linear(w).reshape(d_in, heads, d_out // heads)


def ast_from_torch(
    state_dict: Mapping[str, Any],
    num_heads: int,
    src_grid_ft: tuple[int, int] | None = None,
) -> dict[str, Any]:
    """timm DeiT / reference-AST weights -> variables for
    ``models.ast.ASTEncoder``.

    ``src_grid_ft`` is the checkpoint's (freq, time) patch grid; defaults to
    a square grid (raw DeiT). RGB patch kernels fold to 1 channel by
    summation and the pos-embed grid transposes from the reference's
    freq-major token order to ours (time-major); cross-shape transfer on top
    of this (different target grid) goes through models.surgery as usual.
    Key map per block: norm1/attn.qkv/attn.proj/norm2/mlp.fc{1,2}
    (ast_models_pre_train.py + timm vision_transformer naming).
    """
    sd = {k: _np(v) for k, v in strip_prefix(state_dict, "patch_embed.proj.weight").items()}
    proj = sd["patch_embed.proj.weight"]  # [D, I, kh(freq), kw(time)]
    if proj.shape[1] > 1:
        proj = proj.sum(axis=1, keepdims=True)  # DeiT RGB fold (mast.py:103-105)
    d = proj.shape[0]
    params: dict[str, Any] = {
        "patch_embed": {"kernel": _conv_hwio_time_major(proj), "bias": sd["patch_embed.proj.bias"]},
        "cls_token": sd["cls_token"],
        "dist_token": sd["dist_token"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    pos = sd["pos_embed"]  # [1, 2 + f*t, D], freq-major grid
    n = pos.shape[1] - 2
    if src_grid_ft is None:
        side = int(round(n**0.5))
        if side * side != n:
            raise ValueError(f"pos_embed grid of {n} tokens is not square; pass src_grid_ft")
        src_grid_ft = (side, side)
    f, t = src_grid_ft
    if f * t != n:
        raise ValueError(f"src_grid_ft {src_grid_ft} != {n} grid tokens")
    grid = pos[:, 2:].reshape(1, f, t, d).transpose(0, 2, 1, 3).reshape(1, n, d)
    params["pos_embed"] = np.concatenate([pos[:, :2], grid], axis=1)

    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}"
        qkv_w = sd[f"{b}.attn.qkv.weight"]  # [3D, D]
        qkv_b = sd[f"{b}.attn.qkv.bias"]
        wq, wk, wv = np.split(qkv_w, 3, axis=0)
        bq, bk, bv = np.split(qkv_b, 3, axis=0)
        dh = d // num_heads
        params[f"block{i}"] = {
            "LayerNorm_0": {"scale": sd[f"{b}.norm1.weight"], "bias": sd[f"{b}.norm1.bias"]},
            "MultiHeadDotProductAttention_0": {
                "query": {"kernel": _split_heads_in(wq, num_heads), "bias": bq.reshape(num_heads, dh)},
                "key": {"kernel": _split_heads_in(wk, num_heads), "bias": bk.reshape(num_heads, dh)},
                "value": {"kernel": _split_heads_in(wv, num_heads), "bias": bv.reshape(num_heads, dh)},
                "out": {
                    "kernel": _linear(sd[f"{b}.attn.proj.weight"]).reshape(num_heads, dh, d),
                    "bias": sd[f"{b}.attn.proj.bias"],
                },
            },
            "LayerNorm_1": {"scale": sd[f"{b}.norm2.weight"], "bias": sd[f"{b}.norm2.bias"]},
            "Dense_0": {"kernel": _linear(sd[f"{b}.mlp.fc1.weight"]), "bias": sd[f"{b}.mlp.fc1.bias"]},
            "Dense_1": {"kernel": _linear(sd[f"{b}.mlp.fc2.weight"]), "bias": sd[f"{b}.mlp.fc2.bias"]},
        }
        i += 1
    if i == 0:
        raise KeyError("no transformer blocks found (expected blocks.0.norm1.weight)")
    return {"params": params}


def _flatten_stage_blocks(sd: dict[str, Any]) -> dict[str, Any]:
    """timm's MultiScaleVit nests blocks as stages.{s}.blocks.{b}.* (the
    reference iterates `self.v.stages`, ast_work.py:224-227); the vendored
    spec keeps a flat blocks.{i}.*. Normalize to the flat form, numbering
    across stages in order."""
    import re

    pat = re.compile(r"^stages\.(\d+)\.blocks\.(\d+)\.(.+)$")
    hits = sorted({(int(m.group(1)), int(m.group(2))) for k in sd if (m := pat.match(k))})
    if not hits:
        return sd
    index = {sb: i for i, sb in enumerate(hits)}
    out = {}
    for k, v in sd.items():
        m = pat.match(k)
        out[f"blocks.{index[(int(m.group(1)), int(m.group(2)))]}.{m.group(3)}" if m else k] = v
    return out


def _ln(sd: dict[str, Any], key: str) -> dict[str, Any]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _dense(sd: dict[str, Any], key: str) -> dict[str, Any]:
    out = {"kernel": _linear(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def mast_from_torch(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Reference SS-MAST / MViTv2 torch weights -> variables for
    ``models.mast.MASTEncoder`` (the trunk the probe consumes).

    The torch model patchifies [B, 1, freq, time] (ast_work.py:191), so its
    grid H axis is frequency; ours is time. For MViT's symmetric kernels and
    strides the transposed-grid model is exactly equivalent once spatial
    conv axes transpose and ``rel_pos_h``/``rel_pos_w`` swap — token order
    (freq-major vs time-major) is internal and the output is a token mean.
    Handles both timm stage nesting (stages.{s}.blocks.{b}, what
    `timm.create_model('mvitv2_base')` checkpoints carry) and the vendored
    flat blocks.{i} naming (mvit/models/attention.py:325-396); the
    dim-change projection accepts timm's shortcut_proj_* aliases. The final
    `norm` is skipped like the reference MAST forward (ast_work.py:229).
    """
    sd = _flatten_stage_blocks(
        {k: _np(v) for k, v in strip_prefix(state_dict, "patch_embed.proj.weight").items()}
    )
    mvit: dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv_hwio_time_major(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        }
    }
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}"
        attn: dict[str, Any] = {
            "qkv": _dense(sd, f"{b}.attn.qkv"),
            "proj": _dense(sd, f"{b}.attn.proj"),
        }
        for pool in ("q", "k", "v"):
            w = sd.get(f"{b}.attn.pool_{pool}.weight")
            if w is not None:  # depthwise [C, 1, kh, kw] -> [kh, kw, 1, C], axes swapped
                attn[f"pool_{pool}"] = {
                    "Conv_0": {"kernel": _conv_hwio_time_major(w)},
                    "LayerNorm_0": _ln(sd, f"{b}.attn.norm_{pool}"),
                }
        # torch grid H = freq, ours = time -> the per-axis tables swap names
        if f"{b}.attn.rel_pos_h" in sd:
            attn["rel_pos_h"] = sd[f"{b}.attn.rel_pos_w"]
            attn["rel_pos_w"] = sd[f"{b}.attn.rel_pos_h"]
        blk: dict[str, Any] = {
            "norm1": _ln(sd, f"{b}.norm1"),
            "attn": attn,
            "norm2": _ln(sd, f"{b}.norm2"),
            "mlp": {"Dense_0": _dense(sd, f"{b}.mlp.fc1"), "Dense_1": _dense(sd, f"{b}.mlp.fc2")},
        }
        for alias in ("proj", "shortcut_proj_attn", "shortcut_proj_mlp"):
            if f"{b}.{alias}.weight" in sd:
                blk["proj"] = _dense(sd, f"{b}.{alias}")
                break
        mvit[f"block{i}"] = blk
        i += 1
    if i == 0:
        raise KeyError("no MViT blocks found (expected blocks.0.norm1.weight or stages.*)")
    return {"params": {"mvit": mvit}}


ARCHS = {"audiontt": "audiontt_from_torch", "ast": "ast_from_torch", "mast": "mast_from_torch"}


def main(argv: list[str] | None = None) -> None:
    """Convert a torch checkpoint to an orbax encoder checkpoint usable by
    train_downstream.py / the probe:  python -m audiossl_tpu.models.torch_import
    --checkpoint ckpt.pth --arch audiontt --out runs/imported [--num_heads 12]
    [--src_fdim 12 --src_tdim 101]"""
    import argparse

    from audiossl_tpu.train.checkpoint import save_encoder_only

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--arch", choices=sorted(ARCHS), required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_heads", type=int, default=12, help="AST heads (tiny 3 / small 6 / base 12)")
    p.add_argument("--src_fdim", type=int, default=None, help="AST source grid: freq patches")
    p.add_argument("--src_tdim", type=int, default=None, help="AST source grid: time patches")
    args = p.parse_args(argv)

    sd = load_torch_checkpoint(args.checkpoint)
    if args.arch == "audiontt":
        variables = audiontt_from_torch(sd)
    elif args.arch == "mast":
        variables = mast_from_torch(sd)
    else:
        grid = (args.src_fdim, args.src_tdim) if args.src_fdim and args.src_tdim else None
        variables = ast_from_torch(sd, num_heads=args.num_heads, src_grid_ft=grid)
    n = sum(int(np.asarray(x).size) for x in _leaves(variables))
    save_encoder_only(args.out, 0, variables)
    print(f"imported {args.arch} torch checkpoint -> {args.out} ({n:,} params)")


def _leaves(tree: Any):
    if isinstance(tree, Mapping):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
