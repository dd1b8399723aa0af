"""Two-stream RGB + keypoint fusion with cross-attention (C11,
``BASELINE.json:10``) — config #5, built for batched streaming inference.

Design: the RGB stream reuses the MobileNetV2 per-frame backbone (tokens =
per-frame features), the keypoint stream embeds normalized 543-landmark
frames; N fusion layers run bidirectional cross-attention (RGB queries attend
keypoint tokens and vice versa) followed by per-stream MLPs; both streams are
mean-pooled, concatenated, and classified.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from asltpu.models.bilstm import normalize_landmarks
from asltpu.models.common import merge_time_into_batch, split_time_from_batch
from asltpu.models.mobilenetv2 import MobileNetV2


class CrossAttentionBlock(nn.Module):
    """Pre-LN bidirectional cross-attention between two token streams."""

    d_model: int
    num_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        def xattn(q_in, kv_in, name):
            q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_lnq")(q_in)
            kv = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                              name=f"{name}_lnkv")(kv_in)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                param_dtype=jnp.float32, dropout_rate=self.dropout,
                deterministic=not train, name=f"{name}_attn",
            )(q, kv)
            return q_in + nn.Dropout(self.dropout, deterministic=not train)(y)

        def mlp(x, name):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"{name}_ln")(x)
            y = nn.Dense(4 * self.d_model, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"{name}_fc1")(y)
            y = nn.gelu(y, approximate=False)  # exact erf (torch parity)
            y = nn.Dense(self.d_model, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"{name}_fc2")(y)
            return x + nn.Dropout(self.dropout, deterministic=not train)(y)

        a2 = xattn(a, b, "a_from_b")  # RGB attends keypoints
        b2 = xattn(b, a, "b_from_a")  # keypoints attend RGB
        return mlp(a2, "a_mlp"), mlp(b2, "b_mlp")


class TwoStreamFusion(nn.Module):
    """(clip [B,T,H,W,3], landmarks [B,T,543,3]) → [B, num_classes]."""

    num_classes: int = 100
    d_model: int = 256
    num_heads: int = 8
    num_fusion_layers: int = 2
    dropout: float = 0.1
    width_mult: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, clip, landmarks, train: bool = False):
        b, t = clip.shape[:2]
        if tuple(landmarks.shape[:2]) != (b, t):
            # Catch temporal misalignment at the boundary: reshape(b, t, -1)
            # below silently succeeds whenever T_lm*1629 divides by t,
            # surfacing only as a confusing kp_proj kernel-shape mismatch.
            raise ValueError(
                f"landmarks [B,T]={tuple(landmarks.shape[:2])} must match "
                f"clip [B,T]=({b}, {t}) — resample landmarks to the clip's "
                "frame sampling (e.g. LandmarkStore.get / aligned decode)"
            )
        # RGB stream → per-frame tokens
        frames, bt = merge_time_into_batch(clip)
        rgb = MobileNetV2(self.width_mult, dtype=self.dtype, name="rgb_backbone")(
            frames, train
        )
        rgb = split_time_from_batch(rgb, bt)  # [B, T, 1280]
        rgb = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                       name="rgb_proj")(rgb.astype(self.dtype))

        # Keypoint stream → per-frame tokens
        kp = normalize_landmarks(landmarks).reshape(b, t, -1)  # [B, T, 1629]
        kp = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                      name="kp_proj")(kp.astype(self.dtype))

        pos = self.param("pos", nn.initializers.truncated_normal(0.02),
                         (1, t, self.d_model), jnp.float32).astype(self.dtype)
        rgb = rgb + pos
        kp = kp + pos

        for i in range(self.num_fusion_layers):
            rgb, kp = CrossAttentionBlock(
                self.d_model, self.num_heads, self.dropout, self.dtype,
                name=f"fusion{i}",
            )(rgb, kp, train)

        pooled = jnp.concatenate(
            [jnp.mean(rgb, axis=1), jnp.mean(kp, axis=1)], axis=-1
        ).astype(jnp.float32)
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="fc")(pooled)
