"""Bilinear resize + center-crop as MXU matmuls.

The TPU-native formulation of the preprocess resize (C2): instead of
gather-based interpolation (vector-unit bound, poor lane utilization at
C=3), express bilinear sampling as two small dense contractions

    out[oh, ow, c] = Σ_ih Σ_iw  Rh[oh, ih] · X[ih, iw, c] · Rw[ow, iw]

with ``Rh [Hout, Hin]`` / ``Rw [Wout, Win]`` having ≤2 non-zeros per row
(the two bilinear taps). Dense matmuls of this size ride the systolic array
at full tilt, XLA fuses the uint8→float cast and the mean/std epilogue, and
the center-crop folds into the sampling positions for free (the matrices
are built for the crop window only — cropped pixels are never computed).

Because rows of R sum to 1, normalization commutes with the resize:
``resize((x-m)/s) == (resize(x)-m)/s`` — applied as the epilogue.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _sampling_matrix(
    n_in: int, n_resized: int, crop: int, crop_offset: int
) -> np.ndarray:
    """[crop, n_in] bilinear sampling matrix for: resize n_in → n_resized
    (half-pixel centers, cv2.INTER_LINEAR convention), then take
    ``crop`` pixels starting at ``crop_offset``."""
    scale = n_in / n_resized
    out_idx = np.arange(crop_offset, crop_offset + crop, dtype=np.float64)
    src = (out_idx + 0.5) * scale - 0.5
    # cv2 clamps the sample window to the valid range.
    src = np.clip(src, 0.0, n_in - 1.0)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w_hi = src - lo
    mat = np.zeros((crop, n_in), dtype=np.float32)
    rows = np.arange(crop)
    mat[rows, lo] += (1.0 - w_hi).astype(np.float32)
    mat[rows, hi] += w_hi.astype(np.float32)
    return mat


def resize_crop_matrices(
    in_hw: Tuple[int, int], resize_short: int, crop: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(Rh [crop, Hin], Rw [crop, Win]) for short-side resize + center crop."""
    from asltpu.ops.preprocess import resize_plan

    h, w = in_hw
    rh, rw = resize_plan((h, w), resize_short)
    if rh < crop or rw < crop:
        raise ValueError(
            f"crop {crop} exceeds resized dims {(rh, rw)} (staging "
            f"{in_hw}, resize_short {resize_short})"
        )
    y0, x0 = (rh - crop) // 2, (rw - crop) // 2
    return (
        _sampling_matrix(h, rh, crop, y0),
        _sampling_matrix(w, rw, crop, x0),
    )


def resize_crop_normalize(
    frames: jax.Array,  # [N, Hin, Win, C] any numeric dtype (u8 typical)
    rh: jax.Array,  # [crop, Hin]
    rw: jax.Array,  # [crop, Win]
    mean: jax.Array,  # [C] in 0-1 units
    std: jax.Array,  # [C]
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """The fused device computation: cast → H-contraction → W-contraction →
    normalize. All contractions in fp32 on the MXU."""
    x = frames.astype(jnp.float32)
    # [N, Hin, Win, C] × [crop, Hin] → [N, crop, Win, C]
    y = jnp.einsum("nhwc,oh->nowc", x, rh, precision=jax.lax.Precision.HIGHEST)
    # [N, crop, Win, C] × [crop, Win] → [N, crop, crop, C]
    y = jnp.einsum("nowc,pw->nopc", y, rw, precision=jax.lax.Precision.HIGHEST)
    scale = (1.0 / 255.0) / std
    shift = -mean / std
    return (y * scale + shift).astype(out_dtype)
