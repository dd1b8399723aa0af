"""PoseBiLSTM (C5, ``BASELINE.json:6``) — config #1: 543-landmark pose
features → 2-layer bidirectional LSTM → WLASL-100 gloss logits.

The reference family ran this CPU batch=1 in eager torch; here the landmark
normalization and the whole classifier are one jitted XLA program and clips
are batched so the per-step [B,H]×[H,4H] matmuls keep the MXU fed
(SURVEY.md §7.3.5).

Landmark front-end (C4): MediaPipe Holistic layout, 543 × (x, y, z). Missing
landmarks are encoded as all-zero rows (MediaPipe's convention when a hand /
face is not detected); normalization recenters on the mid-shoulder point and
scales by shoulder width, leaving missing rows at zero via masking.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from asltpu.ops.recurrent import bilstm

# MediaPipe Holistic pose indices for the shoulders (within the 33 pose
# landmarks that lead the 543-landmark layout).
_LEFT_SHOULDER = 11
_RIGHT_SHOULDER = 12


def normalize_landmarks(lm: jax.Array) -> jax.Array:
    """[..., T, 543, 3] raw landmarks → recentered/scale-normalized features.

    Recenter on the mid-shoulder point, scale by shoulder width; rows that
    are exactly zero (missing detections) stay zero.
    """
    lm = lm.astype(jnp.float32)
    left = lm[..., _LEFT_SHOULDER, :]
    right = lm[..., _RIGHT_SHOULDER, :]
    center = 0.5 * (left + right)  # [..., T, 3]
    scale = jnp.linalg.norm(left - right, axis=-1, keepdims=True)  # [..., T, 1]
    # A frame with no usable pose (shoulders zero/co-located — MediaPipe's
    # missing-pose convention) has no normalization reference: dividing by
    # the clamped epsilon would scale any PRESENT face/hand rows by ~1e4
    # and saturate every downstream gate — zero the whole frame instead.
    pose_ok = scale > 1e-3  # real shoulder width in normalized units ≈ 0.2
    normed = (lm - center[..., None, :]) / jnp.maximum(
        scale, 1e-4)[..., None, :]
    missing = jnp.all(lm == 0.0, axis=-1, keepdims=True)
    normed = jnp.where(missing, 0.0, normed)
    return jnp.where(pose_ok[..., None, :], normed, 0.0)


class PoseBiLSTM(nn.Module):
    """2-layer BiLSTM gloss classifier over [B, T, 543, 3] landmarks."""

    num_classes: int = 100
    hidden: int = 256
    num_layers: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(self, landmarks, train: bool = False):
        b, t = landmarks.shape[:2]
        x = normalize_landmarks(landmarks).reshape(b, t, -1)  # [B, T, 1629]
        for layer in range(self.num_layers):
            fan_in = x.shape[-1]
            k = float(1.0 / self.hidden**0.5)

            def init(key, shape, dtype=jnp.float32):
                # torch nn.LSTM default: U(-1/sqrt(H), 1/sqrt(H))
                return jax.random.uniform(key, shape, dtype, -k, k)

            def make(direction):
                return {
                    "wi": self.param(f"l{layer}_{direction}_wi", init,
                                     (fan_in, 4 * self.hidden)),
                    "wh": self.param(f"l{layer}_{direction}_wh", init,
                                     (self.hidden, 4 * self.hidden)),
                    "b": self.param(f"l{layer}_{direction}_b", init,
                                    (4 * self.hidden,)),
                }

            x = bilstm(x, make("fwd"), make("bwd"))  # [B, T, 2H]
            if layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # Concat of final forward state (last step) and final backward state
        # (first step) — torch's (h_n forward, h_n backward) convention.
        h = self.hidden
        pooled = jnp.concatenate([x[:, -1, :h], x[:, 0, h:]], axis=-1)
        pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes, param_dtype=jnp.float32, name="fc")(pooled)
