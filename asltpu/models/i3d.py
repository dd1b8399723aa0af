"""I3D — Inflated 3D Inception backbone (C10, ``BASELINE.json:9``):
fine-tunable on WLASL-2000, 64-frame clips, train + eval.

Architecture: Carreira & Zisserman, "Quo Vadis, Action Recognition?"
(CVPR 2017) — Inception-v1 inflated to 3D (NDHWC here). The DeepMind
reference checkpoint layout (``Conv3d_1a_7x7`` … ``Mixed_5c``) is preserved
in module names so kinetics-pretrained torch weights import cleanly.

TPU notes: 3D convs lower to MXU matmuls via XLA; compute is bf16 with fp32
BN stats; each Inception block is optionally ``nn.remat``-ed to fit 64-frame
activations in HBM during training (SURVEY.md §7.3.4).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from asltpu.models.common import ConvBN


class _Conv7S2D(nn.Module):
    """The 7×7×7 stride-2 stem conv via the EXACT space-to-depth rewrite
    (asltpu.ops.stem_s2d — the 3-input-channel stem is otherwise the
    single most expensive op in the network at ~6% MXU; measured
    2026-08-19 on v5e: stem 17.5→12.6 ms fwd, whole-model inference
    126→156 clips/s, train step 112→68 ms — the backward of a 3-channel
    conv is even further below roofline, so training gains most). Param
    layout
    is IDENTICAL to ``nn.Conv`` ("kernel", [7,7,7,Cin,Cout], fp32), so
    checkpoints and the torch importer are unaffected. Falls back to the
    plain conv for shapes the packing doesn't cover (odd/short axes)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 7, x.shape[-1], self.features),
            jnp.float32,
        )
        x = x.astype(self.dtype)
        if all(d % 2 == 0 and d >= 2 for d in x.shape[1:4]):
            from asltpu.ops.stem_s2d import stem_conv3d_s2d

            return stem_conv3d_s2d(x, kernel)
        from jax import lax

        dn = lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        return lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (2, 2, 2), "SAME",
            dimension_numbers=dn,
        )


class _StemUnit(nn.Module):
    """Unit3D specialized for the stem: _Conv7S2D + BN + ReLU with the SAME
    variable tree as the ConvBN path ("conv"/"kernel", "bn"/…)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Conv7S2D(self.features, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-3,  # DeepMind I3D uses eps=1e-3
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return nn.relu(x)


class Unit3D(nn.Module):
    """Conv3D + BN + ReLU (the I3D building block). NDHWC."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel == (7, 7, 7) and self.strides == (2, 2, 2):
            return _StemUnit(self.features, dtype=self.dtype, name="unit")(
                x, train
            )
        return ConvBN(
            self.features,
            kernel=self.kernel,
            strides=self.strides,
            act=nn.relu,
            padding="SAME",  # I3D is TF-origin: SAME, not torch k//2
            dtype=self.dtype,
            bn_eps=1e-3,  # DeepMind I3D uses eps=1e-3
            name="unit",
        )(x, train)


class InceptionBlock(nn.Module):
    """The 4-branch Inception module: 1×1 / 1×1→3×3 / 1×1→3×3 / pool→1×1
    (all kernels inflated to 3D)."""

    ch: Tuple[int, int, int, int, int, int]  # b0, b1a, b1b, b2a, b2b, b3b
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0, b1a, b1b, b2a, b2b, b3b = self.ch
        y0 = Unit3D(b0, (1, 1, 1), dtype=self.dtype, name="b0")(x, train)
        y1 = Unit3D(b1a, (1, 1, 1), dtype=self.dtype, name="b1a")(x, train)
        y1 = Unit3D(b1b, (3, 3, 3), dtype=self.dtype, name="b1b")(y1, train)
        y2 = Unit3D(b2a, (1, 1, 1), dtype=self.dtype, name="b2a")(x, train)
        y2 = Unit3D(b2b, (3, 3, 3), dtype=self.dtype, name="b2b")(y2, train)
        y3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        y3 = Unit3D(b3b, (1, 1, 1), dtype=self.dtype, name="b3b")(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


# (name, channels) in checkpoint order.
_MIXED = (
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)


class I3D(nn.Module):
    """[B, T, H, W, 3] clip → [B, num_classes] logits.

    Internally NDHWC (T is the depth axis)."""

    num_classes: int = 2000
    dropout: float = 0.5
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, clip, train: bool = False):
        x = clip.astype(self.dtype)  # [B, T, H, W, 3] == NDHWC
        x = Unit3D(64, (7, 7, 7), strides=(2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, (1, 1, 1), dtype=self.dtype, name="Conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")

        block_cls = InceptionBlock
        if self.remat and train:
            # Rematerialize each Inception block: 64-frame activations don't
            # fit HBM otherwise on one chip (SURVEY.md §7.3.4).
            block_cls = nn.remat(InceptionBlock, static_argnums=(2,))

        for name, ch in _MIXED:
            x = block_cls(ch, dtype=self.dtype, name=name)(x, train)
            if name == "Mixed_3c":
                x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
            elif name == "Mixed_4f":
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="VALID")

        x = jnp.mean(x, axis=(2, 3))  # spatial pool → [B, T', 1024]
        # Temporal half of pytorch-i3d's AvgPool3d((2, 7, 7), stride 1):
        # consecutive time-step pairs are averaged before the logits conv, so
        # endpoint steps weigh half in the final mean. Matching it here keeps
        # imported Kinetics checkpoints logit-aligned with the layout the
        # ckpt importer targets (the spatial 7×7 kernel is the full spatial
        # extent at 224² input — the mean above generalizes it).
        if x.shape[1] > 1:
            x = 0.5 * (x[:, :-1] + x[:, 1:])
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # 1×1×1 conv logits per pooled time step, then temporal mean — the
        # original I3D head (averaging logits over time).
        logits_t = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                            dtype=jnp.float32, name="logits")(
            x.astype(jnp.float32)
        )
        return jnp.mean(logits_t, axis=1)
