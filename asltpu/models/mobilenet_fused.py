"""Fused-inference MobileNetV2 backbone: same parameters as
:class:`asltpu.models.mobilenetv2.MobileNetV2`, but the 12 stride-1
expanded inverted-residual blocks run through the fused Pallas MBConv
kernel (asltpu.ops.mbconv_pallas) — the expanded activations never touch
HBM. Stem, stride-2 blocks, the t=1 block and the head use plain XLA convs
(their HBM traffic is already minimal or their shapes change).

BN folding happens inside the jit from the live variables (cheap weight-
space elementwise; inference semantics).

Validated against ``MobileNetV2.apply`` in tests/unit/test_mbconv_pallas.py.

**Measured result (TPU v5e, 512×224² frames, 2026-08-16): the fused path
is ~2× SLOWER than XLA (28.1 ms vs 13.4 ms), outputs matching at 2.4e-4.**
The bandwidth saved by keeping the 6×-expanded tensor in VMEM is outweighed
by (a) expand/project as explicit small-K matmuls (K = 24–160 against the
MXU's 128 lanes → ≤19% systolic utilization where XLA's conv codegen tiles
better), and (b) the nine-tap depthwise running as fp32 VPU shifts versus
XLA's bf16 fused conv. Kept as an opt-in experiment and a recorded
speed-of-light analysis: **XLA's native convolutions win this trade on
MobileNet-shaped channel counts**; the production predict path stays on
the XLA backbone.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from asltpu.models.mobilenetv2 import _INVERTED_RESIDUAL_SCHEDULE
from asltpu.ops.mbconv_pallas import fold_bn, fused_mbconv_s1


def _conv_bn(x, p, s, stride=1, groups=1, relu6=True, eps=1e-5):
    """Plain XLA conv + folded BN (+ ReLU6), NHWC, torch-style k//2 pad."""
    kernel, bias = fold_bn(
        p["conv"]["kernel"], p["bn"]["scale"], p["bn"]["bias"],
        s["bn"]["mean"], s["bn"]["var"], eps,
    )
    kh, kw = kernel.shape[:2]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        kernel.astype(jnp.bfloat16),
        window_strides=(stride, stride),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + bias.astype(jnp.bfloat16)
    if relu6:
        y = jnp.clip(y, 0.0, 6.0)
    return y


def _plain_block(x, p, s, stride, expand_ratio):
    """Unfused inverted residual (used for stride-2 and t=1 blocks)."""
    y = x
    if expand_ratio != 1:
        y = _conv_bn(y, p["expand"], s["expand"])
    hidden = y.shape[-1]
    y = _conv_bn(y, p["depthwise"], s["depthwise"], stride=stride, groups=hidden)
    y = _conv_bn(y, p["project"], s["project"], relu6=False)
    if stride == 1 and x.shape[-1] == y.shape[-1]:
        y = x + y
    return y


def _fused_block(x, p, s, row_tile, interpret=False):
    w1, b1 = fold_bn(
        p["expand"]["conv"]["kernel"][0, 0],
        p["expand"]["bn"]["scale"], p["expand"]["bn"]["bias"],
        s["expand"]["bn"]["mean"], s["expand"]["bn"]["var"],
    )
    dw, b2 = fold_bn(
        p["depthwise"]["conv"]["kernel"][:, :, 0, :],
        p["depthwise"]["bn"]["scale"], p["depthwise"]["bn"]["bias"],
        s["depthwise"]["bn"]["mean"], s["depthwise"]["bn"]["var"],
    )
    w2, b3 = fold_bn(
        p["project"]["conv"]["kernel"][0, 0],
        p["project"]["bn"]["scale"], p["project"]["bn"]["bias"],
        s["project"]["bn"]["mean"], s["project"]["bn"]["var"],
    )
    return fused_mbconv_s1(
        x, w1, b1, dw, b2, w2, b3,
        use_res=x.shape[-1] == w2.shape[1],
        row_tile=row_tile,
        interpret=interpret,
    )


def _row_tile_for(h: int) -> int:
    # Whole image when the expanded tile fits VMEM comfortably; else split.
    if h <= 56:
        return h
    for tr in (16, 14, 8, 7, 4, 2, 1):
        if h % tr == 0:
            return tr
    return 1


@functools.partial(jax.jit, static_argnames=("width_mult", "interpret"))
def fused_backbone_apply(
    variables: Dict[str, Any], frames: jax.Array, width_mult: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """[N, H, W, 3] → pooled features [N, 1280·w] — fused-inference twin of
    ``MobileNetV2.apply(variables, frames, train=False)``."""
    p, s = variables["params"], variables["batch_stats"]
    x = _conv_bn(frames.astype(jnp.bfloat16), p["stem"], s["stem"], stride=2)
    idx = 0
    for t, c, n, st in _INVERTED_RESIDUAL_SCHEDULE:
        del c
        for i in range(n):
            stride = st if i == 0 else 1
            bp, bs = p[f"block{idx}"], s[f"block{idx}"]
            if stride == 1 and t != 1:
                x = _fused_block(x, bp, bs, _row_tile_for(x.shape[1]),
                                 interpret)
            else:
                x = _plain_block(x, bp, bs, stride, t)
            idx += 1
    x = _conv_bn(x, p["head"], s["head"])
    return jnp.mean(x, axis=(1, 2))
