"""Export audiossl_tpu flax encoders back to reference torch state_dicts.

The inverse of :mod:`audiossl_tpu.models.torch_import`: a user who
pretrained on TPU can hand the weights back to the reference's PyTorch
downstream stack (src/utils/utils.py:199-207 loads a plain
`encoder.state_dict()`; extras' MViT/AST stacks load flat `blocks.{i}.*`
state_dicts). Conventions are bridged in the opposite direction:

* flax HWIO conv kernels, spatial (time, freq) -> torch OIHW, (freq, time)
* flax Dense [in, out] -> torch Linear [out, in]
* flax attention q/k/v DenseGeneral [D, H, Dh] -> one fused qkv [3D, D]
* our time-major AST pos-embed grid -> the reference's freq-major order
* our rel_pos_h (time) / rel_pos_w (freq) -> swapped back

Every exporter is an exact inverse of the matching importer; the
roundtrip (export -> import) is identity and tested
(tests/test_torch_export.py). Output is a {key: numpy array} state_dict;
the CLI saves it with torch.save so the reference loads it directly.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    return np.asarray(t, np.float32)


def _conv_oihw_freq_major(w: np.ndarray) -> np.ndarray:
    """flax HWIO, spatial (time, freq) -> torch OIHW, spatial (freq, time)."""
    return np.transpose(_np(w), (3, 2, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(_np(w), (1, 0))


def audiontt_to_torch(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """``models.audiontt.AudioNTT2020Task6`` variables -> the reference's
    AudioNTT2020Task6 state_dict (src/encoder/audiontt.py:46-68 layout:
    features_{1,2,3}.{0:Conv,1:BN}, fc.{0,3})."""
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    sd: dict[str, np.ndarray] = {}
    for i in range(3):
        blk, bs = params[f"ConvBlock_{i}"], batch_stats[f"ConvBlock_{i}"]
        t = f"features_{i + 1}"
        sd[f"{t}.0.weight"] = _conv_oihw_freq_major(blk["Conv_0"]["kernel"])
        sd[f"{t}.0.bias"] = _np(blk["Conv_0"]["bias"])
        sd[f"{t}.1.weight"] = _np(blk["BatchNorm_0"]["scale"])
        sd[f"{t}.1.bias"] = _np(blk["BatchNorm_0"]["bias"])
        sd[f"{t}.1.running_mean"] = _np(bs["BatchNorm_0"]["mean"])
        sd[f"{t}.1.running_var"] = _np(bs["BatchNorm_0"]["var"])
        sd[f"{t}.1.num_batches_tracked"] = np.zeros((), np.int64)
    for j, t in ((0, "fc.0"), (1, "fc.3")):
        d = params[f"Dense_{j}"]
        sd[f"{t}.weight"] = _linear(d["kernel"])
        sd[f"{t}.bias"] = _np(d["bias"])
    return sd


def projection_to_torch(
    params: Mapping[str, Any], batch_stats: Mapping[str, Any]
) -> dict[str, np.ndarray]:
    """``models.heads.MLPProjector`` variables -> the reference Barlow
    ``Projection`` state_dict (src/upstream/delores_s/upstream_expert.py:11-28:
    projector.{0,3,6} bias-free Linears, projector.{1,4} BatchNorm1d, plus
    the affine-free normalization ``bn``). With the encoder export this makes
    the full DeLoRes-S trainer state reference-loadable
    (tests/test_reference_equiv.py runs both trainers from these weights)."""
    sd: dict[str, np.ndarray] = {}
    for dense_idx, torch_idx in ((0, 0), (1, 3), (2, 6)):
        sd[f"projector.{torch_idx}.weight"] = _linear(params[f"Dense_{dense_idx}"]["kernel"])
    for bn_idx, torch_idx in ((0, 1), (1, 4)):
        p, s = params[f"BatchNorm_{bn_idx}"], batch_stats[f"BatchNorm_{bn_idx}"]
        sd[f"projector.{torch_idx}.weight"] = _np(p["scale"])
        sd[f"projector.{torch_idx}.bias"] = _np(p["bias"])
        sd[f"projector.{torch_idx}.running_mean"] = _np(s["mean"])
        sd[f"projector.{torch_idx}.running_var"] = _np(s["var"])
        sd[f"projector.{torch_idx}.num_batches_tracked"] = np.zeros((), np.int64)
    out_dim = params["Dense_2"]["kernel"].shape[1]
    sd["bn.running_mean"] = np.zeros((out_dim,), np.float32)
    sd["bn.running_var"] = np.ones((out_dim,), np.float32)
    sd["bn.num_batches_tracked"] = np.zeros((), np.int64)
    return sd


def _merge_heads_out(k: np.ndarray) -> np.ndarray:
    """flax q/k/v kernel [D_in, H, Dh] -> torch [D_out, D_in] (head-major)."""
    d_in, h, dh = k.shape
    return _np(k).reshape(d_in, h * dh).T


def ast_to_torch(
    variables: Mapping[str, Any], dst_grid_ft: tuple[int, int] | None = None
) -> dict[str, np.ndarray]:
    """``models.ast.ASTEncoder`` variables -> reference-AST state_dict
    (timm vision_transformer naming: patch_embed.proj, cls/dist tokens,
    blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm).

    ``dst_grid_ft`` is the (freq, time) patch grid the pos-embed encodes —
    needed to restore the reference's freq-major token order; defaults to a
    square grid.
    """
    params = variables["params"]
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": _conv_oihw_freq_major(params["patch_embed"]["kernel"]),
        "patch_embed.proj.bias": _np(params["patch_embed"]["bias"]),
        "cls_token": _np(params["cls_token"]),
        "dist_token": _np(params["dist_token"]),
        "norm.weight": _np(params["norm"]["scale"]),
        "norm.bias": _np(params["norm"]["bias"]),
    }
    pos = _np(params["pos_embed"])  # [1, 2 + t*f, D], time-major grid
    n, d = pos.shape[1] - 2, pos.shape[2]
    if dst_grid_ft is None:
        side = int(round(n**0.5))
        if side * side != n:
            raise ValueError(f"pos_embed grid of {n} tokens is not square; pass dst_grid_ft")
        dst_grid_ft = (side, side)
    f, t = dst_grid_ft
    if f * t != n:
        raise ValueError(f"dst_grid_ft {dst_grid_ft} != {n} grid tokens")
    grid = pos[:, 2:].reshape(1, t, f, d).transpose(0, 2, 1, 3).reshape(1, n, d)
    sd["pos_embed"] = np.concatenate([pos[:, :2], grid], axis=1)

    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        b = f"blocks.{i}"
        attn = blk["MultiHeadDotProductAttention_0"]
        sd[f"{b}.attn.qkv.weight"] = np.concatenate(
            [_merge_heads_out(attn[k]["kernel"]) for k in ("query", "key", "value")], axis=0
        )
        sd[f"{b}.attn.qkv.bias"] = np.concatenate(
            [_np(attn[k]["bias"]).reshape(-1) for k in ("query", "key", "value")]
        )
        h, dh, d_out = attn["out"]["kernel"].shape
        sd[f"{b}.attn.proj.weight"] = _np(attn["out"]["kernel"]).reshape(h * dh, d_out).T
        sd[f"{b}.attn.proj.bias"] = _np(attn["out"]["bias"])
        sd[f"{b}.norm1.weight"] = _np(blk["LayerNorm_0"]["scale"])
        sd[f"{b}.norm1.bias"] = _np(blk["LayerNorm_0"]["bias"])
        sd[f"{b}.norm2.weight"] = _np(blk["LayerNorm_1"]["scale"])
        sd[f"{b}.norm2.bias"] = _np(blk["LayerNorm_1"]["bias"])
        sd[f"{b}.mlp.fc1.weight"] = _linear(blk["Dense_0"]["kernel"])
        sd[f"{b}.mlp.fc1.bias"] = _np(blk["Dense_0"]["bias"])
        sd[f"{b}.mlp.fc2.weight"] = _linear(blk["Dense_1"]["kernel"])
        sd[f"{b}.mlp.fc2.bias"] = _np(blk["Dense_1"]["bias"])
        i += 1
    if i == 0:
        raise KeyError("no transformer blocks found (expected params['block0'])")
    return sd


def mast_to_torch(variables: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """``models.mast.MASTEncoder`` variables -> flat-``blocks.{i}`` MViTv2
    state_dict (the vendored spec's naming, mvit/models/attention.py:325-396;
    timm stage-nested checkpoints flatten to this on import)."""
    mvit = variables["params"]["mvit"]
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": _conv_oihw_freq_major(mvit["patch_embed"]["kernel"]),
        "patch_embed.proj.bias": _np(mvit["patch_embed"]["bias"]),
    }

    def put_ln(key: str, tree: Mapping[str, Any]) -> None:
        sd[f"{key}.weight"] = _np(tree["scale"])
        sd[f"{key}.bias"] = _np(tree["bias"])

    def put_dense(key: str, tree: Mapping[str, Any]) -> None:
        sd[f"{key}.weight"] = _linear(tree["kernel"])
        if "bias" in tree:
            sd[f"{key}.bias"] = _np(tree["bias"])

    i = 0
    while f"block{i}" in mvit:
        blk = mvit[f"block{i}"]
        b = f"blocks.{i}"
        put_ln(f"{b}.norm1", blk["norm1"])
        put_ln(f"{b}.norm2", blk["norm2"])
        attn = blk["attn"]
        put_dense(f"{b}.attn.qkv", attn["qkv"])
        put_dense(f"{b}.attn.proj", attn["proj"])
        for pool in ("q", "k", "v"):
            if f"pool_{pool}" in attn:
                sd[f"{b}.attn.pool_{pool}.weight"] = _conv_oihw_freq_major(
                    attn[f"pool_{pool}"]["Conv_0"]["kernel"]
                )
                put_ln(f"{b}.attn.norm_{pool}", attn[f"pool_{pool}"]["LayerNorm_0"])
        if "rel_pos_h" in attn:  # our time-major tables swap back to freq-major H
            sd[f"{b}.attn.rel_pos_h"] = _np(attn["rel_pos_w"])
            sd[f"{b}.attn.rel_pos_w"] = _np(attn["rel_pos_h"])
        if "proj" in blk:
            put_dense(f"{b}.proj", blk["proj"])
        put_dense(f"{b}.mlp.fc1", blk["mlp"]["Dense_0"])
        put_dense(f"{b}.mlp.fc2", blk["mlp"]["Dense_1"])
        i += 1
    if i == 0:
        raise KeyError("no MViT blocks found (expected params['mvit']['block0'])")
    return sd


ARCHS = ("audiontt", "ast", "mast")


def main(argv: list[str] | None = None) -> None:
    """Export an orbax encoder checkpoint to a torch state_dict the
    reference loads directly:  python -m audiossl_tpu.models.torch_export
    --checkpoint runs/x_chkp --arch audiontt --out encoder.pth
    [--dst_fdim 12 --dst_tdim 101] [--step N]"""
    import argparse

    from audiossl_tpu.train.checkpoint import latest_step, load_raw

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--checkpoint", required=True, help="checkpoint dir with encoder/<step>/")
    p.add_argument("--arch", choices=ARCHS, required=True)
    p.add_argument("--out", required=True, help=".pth path to write")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--dst_fdim", type=int, default=None, help="AST pos-embed grid: freq patches")
    p.add_argument("--dst_tdim", type=int, default=None, help="AST pos-embed grid: time patches")
    args = p.parse_args(argv)

    step = args.step if args.step is not None else latest_step(args.checkpoint, "encoder")
    if step is None:
        raise FileNotFoundError(f"no encoder checkpoints under {args.checkpoint}")
    variables = load_raw(args.checkpoint, step, kind="encoder")
    if args.arch == "audiontt":
        sd = audiontt_to_torch(variables)
    elif args.arch == "mast":
        sd = mast_to_torch(variables)
    else:
        grid = (args.dst_fdim, args.dst_tdim) if args.dst_fdim and args.dst_tdim else None
        sd = ast_to_torch(variables, dst_grid_ft=grid)

    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, args.out)
    n = sum(int(v.size) for v in sd.values())
    print(f"exported {args.arch} encoder (step {step}) -> {args.out} ({n:,} params)")


if __name__ == "__main__":
    main()
