"""Torch transcription of efficientnet_pytorch's EfficientNet-B0 forward
(include_top=False, in_channels=1), used as the numeric oracle for
audiossl_tpu.models.efficientnet (reference: extras/delores-s/models.py:14
wraps EfficientNet.from_name('efficientnet-b0')).

Runs eval-mode inference directly from the *flax* variables dict, so a
weight-transplant parity test needs no separate conversion step. Padding is
the TF/torch 'same' formula (extra pixel on the right/bottom) computed
dynamically per input, identical math to Conv2dDynamicSamePadding.
"""
import math

import numpy as np
import torch
import torch.nn.functional as F

B0_STAGES = (
    (1, 16, 1, 3, 1),
    (6, 24, 2, 3, 2),
    (6, 40, 2, 5, 2),
    (6, 80, 3, 3, 2),
    (6, 112, 3, 5, 1),
    (6, 192, 4, 5, 2),
    (6, 320, 1, 3, 1),
)


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _conv_same(x, kernel_flax, stride, groups=1, bias=None):
    """Flax HWIO kernel -> torch conv with TF-same padding."""
    w = _t(kernel_flax).permute(3, 2, 0, 1)  # [O, I/g, kh, kw]
    k = w.shape[-1]
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / stride) - 1) * stride + k - ih, 0)
    pad_w = max((math.ceil(iw / stride) - 1) * stride + k - iw, 0)
    x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])
    return F.conv2d(x, w, bias=bias, stride=stride, groups=groups)


def _bn(x, params, stats):
    return F.batch_norm(
        x, _t(stats["mean"]), _t(stats["var"]), _t(params["scale"]), _t(params["bias"]),
        training=False, eps=1e-3,
    )


def _swish(x):
    return x * torch.sigmoid(x)


def _se(x, p):
    s = F.adaptive_avg_pool2d(x, 1)
    s = _conv_same(s, p["Conv_0"]["kernel"], 1, bias=_t(p["Conv_0"]["bias"]))
    s = _swish(s)
    s = _conv_same(s, p["Conv_1"]["kernel"], 1, bias=_t(p["Conv_1"]["bias"]))
    return x * torch.sigmoid(s)


def effnet_b0_oracle(x_nhwc: np.ndarray, variables) -> np.ndarray:
    """[B, H, W, 1] -> [B, 1280] eval-mode features from flax variables."""
    p, bs = variables["params"], variables["batch_stats"]
    x = _t(x_nhwc).permute(0, 3, 1, 2)

    with torch.no_grad():
        x = _conv_same(x, p["stem_conv"]["kernel"], 2)
        x = _swish(_bn(x, p["stem_bn"], bs["stem_bn"]))

        in_ch = 32
        for stage, (expand, out_ch, repeats, kernel, stride) in enumerate(B0_STAGES):
            for r in range(repeats):
                name = f"block{stage}_{r}"
                bp, bb = p[name], bs[name]
                s = stride if r == 0 else 1
                inputs = x
                mid = in_ch * expand
                if expand != 1:
                    x = _conv_same(x, bp["expand_conv"]["kernel"], 1)
                    x = _swish(_bn(x, bp["bn0"], bb["bn0"]))
                x = _conv_same(x, bp["depthwise_conv"]["kernel"], s, groups=mid)
                x = _swish(_bn(x, bp["bn1"], bb["bn1"]))
                x = _se(x, bp["se"])
                x = _conv_same(x, bp["project_conv"]["kernel"], 1)
                x = _bn(x, bp["bn2"], bb["bn2"])
                if s == 1 and in_ch == out_ch:
                    x = x + inputs  # drop-connect is identity in eval
                in_ch = out_ch

        x = _conv_same(x, p["head_conv"]["kernel"], 1)
        x = _swish(_bn(x, p["head_bn"], bs["head_bn"]))
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
    return x.numpy()
