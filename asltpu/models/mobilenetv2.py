"""MobileNetV2 backbone (C6, ``BASELINE.json:7``) — per-frame feature
extractor, flax/NHWC, torch-weight importable (torchvision
``mobilenet_v2`` state-dict layout; see asltpu.ckpt name mapping).

Architecture: Sandler et al., "MobileNetV2: Inverted Residuals and Linear
Bottlenecks" (CVPR 2018) — stem conv, 17 inverted-residual blocks with the
standard (t, c, n, s) schedule, 1×1 head conv to 1280, global average pool.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from asltpu.models.common import ConvBN, relu6

# (expand_ratio, out_channels, num_blocks, first_stride)
_INVERTED_RESIDUAL_SCHEDULE: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _make_divisible(v: float, divisor: int = 8) -> int:
    """Channel rounding rule from the reference implementation of the paper."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.features
        y = x
        if self.expand_ratio != 1:
            y = ConvBN(hidden, kernel=1, act=relu6, dtype=self.dtype, name="expand")(
                y, train
            )
        y = ConvBN(
            hidden,
            kernel=3,
            strides=self.stride,
            groups=hidden,
            act=relu6,
            dtype=self.dtype,
            name="depthwise",
        )(y, train)
        y = ConvBN(self.features, kernel=1, act=None, dtype=self.dtype, name="project")(
            y, train
        )
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    """Returns pooled per-image features [B, 1280·width] (no classifier —
    the temporal head owns classification)."""

    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        stem_ch = _make_divisible(32 * self.width_mult)
        x = ConvBN(stem_ch, kernel=3, strides=2, act=relu6, dtype=self.dtype, name="stem")(
            x, train
        )
        idx = 0
        for t, c, n, s in _INVERTED_RESIDUAL_SCHEDULE:
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(
                    out_ch,
                    stride=s if i == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"block{idx}",
                )(x, train)
                idx += 1
        head_ch = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBN(head_ch, kernel=1, act=relu6, dtype=self.dtype, name="head")(x, train)
        return jnp.mean(x, axis=(1, 2))  # global average pool → [B, head_ch]
