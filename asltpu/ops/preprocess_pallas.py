"""Fused Pallas preprocessing kernel (C2, ``BASELINE.json:4`` north-star
requirement): uint8 staged frames → resized, center-cropped, mean/std
normalized NHWC clip tensor, written directly to HBM in the backbone's
compute dtype.

Placeholder in the v0 slice — :func:`asltpu.ops.preprocess.preprocess_clip`
falls back to the jnp path until this lands.
"""

from __future__ import annotations

import jax

from asltpu.config import PreprocessConfig


def preprocess_clip_pallas(frames_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    raise NotImplementedError("Pallas preprocess kernel lands after the v0 slice")
