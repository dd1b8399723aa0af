"""ResNet-18 backbone (C8, ``BASELINE.json:8``) — per-frame feature
extractor for 32-frame clips, flax/NHWC, torchvision-state-dict importable.

Architecture: He et al., "Deep Residual Learning" (CVPR 2016) — 7×7 stem,
max-pool, four stages of two BasicBlocks (64/128/256/512), global pool → 512.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from asltpu.models.common import ConvBN


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(self.features, kernel=3, strides=self.stride, act=nn.relu,
                   dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.features, kernel=3, strides=1, act=None,
                   dtype=self.dtype, name="conv2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(self.features, kernel=1, strides=self.stride,
                              act=None, dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(y + identity)


class ResNet18(nn.Module):
    """Returns pooled per-image features [B, 512]."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # torchvision pads 7×7 s2 with 3 and 3×3 maxpool s2 with 1.
        x = ConvBN(64, kernel=7, strides=2, padding=3, act=nn.relu,
                   dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (ch, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]
        ):
            for blk in range(2):
                x = BasicBlock(
                    ch, stride=stride if blk == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x, train)
        return jnp.mean(x, axis=(1, 2))  # [B, 512]
