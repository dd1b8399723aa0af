"""End-to-end video classifiers: per-frame 2D backbone + temporal head.

Configs #2 and #3 (``BASELINE.json:7-8``). The (B, T) axes fold into one
batch for the backbone so every conv sees a B·T-sized batch — the MXU-
friendly decomposition (SURVEY.md §3.1 "vmapped over T" realized as a
reshape, which XLA prefers to an actual vmap here).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from asltpu.models.common import merge_time_into_batch, split_time_from_batch
from asltpu.models.mobilenetv2 import MobileNetV2
from asltpu.models.resnet import ResNet18
from asltpu.models.temporal import GRUHead, TransformerHead


class MobileNetV2GRU(nn.Module):
    """Config #2: MobileNetV2 per-frame features + GRU head (north-star)."""

    num_classes: int = 100
    width_mult: float = 1.0
    gru_hidden: int = 512
    gru_layers: int = 1
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, clip, train: bool = False):
        # clip: [B, T, H, W, 3] preprocessed NHWC
        frames, bt = merge_time_into_batch(clip)
        feats = MobileNetV2(self.width_mult, dtype=self.dtype, name="backbone")(
            frames, train
        )  # [B·T, 1280]
        feats = split_time_from_batch(feats, bt)  # [B, T, 1280]
        return GRUHead(
            self.num_classes, self.gru_hidden, self.gru_layers, self.dropout,
            name="head",
        )(feats, train)


class ResNet18Transformer(nn.Module):
    """Config #3: ResNet-18 + 4-layer transformer encoder, WLASL-300."""

    num_classes: int = 300
    d_model: int = 512
    num_heads: int = 8
    num_tx_layers: int = 4
    mlp_ratio: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, clip, train: bool = False):
        frames, bt = merge_time_into_batch(clip)
        feats = ResNet18(dtype=self.dtype, name="backbone")(frames, train)  # [B·T, 512]
        feats = split_time_from_batch(feats, bt)
        return TransformerHead(
            self.num_classes,
            d_model=self.d_model,
            num_heads=self.num_heads,
            num_layers=self.num_tx_layers,
            mlp_ratio=self.mlp_ratio,
            dropout=self.dropout,
            dtype=self.dtype,
            name="head",
        )(feats, train)
