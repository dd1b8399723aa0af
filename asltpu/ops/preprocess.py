"""Clip preprocessing: uniform temporal sampling + resize + center-crop +
mean/std normalize, emitting NHWC clip tensors for the backbones.

This replaces the reference project family's OpenCV host loop
(``BASELINE.json:4``: "decode, uniform temporal sampling, resize, center-crop,
mean-std normalize"). Decode stays on the host (C1); *everything after decode*
runs on-device inside the jitted program, so host→device traffic is uint8
staged frames and the normalize/reformat rides HBM bandwidth once.

Two implementations:
  - :func:`preprocess_clip_jnp` — pure jax.numpy, the correctness oracle
    (validated against cv2 in tests/unit/test_preprocess.py).
  - the fused Pallas kernel in :mod:`asltpu.ops.preprocess_pallas` — the
    production path (``PreprocessConfig.use_pallas``).

:func:`preprocess_clip` dispatches between them.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asltpu.config import PreprocessConfig


def uniform_sample_indices(num_raw_frames: int, num_out: int) -> np.ndarray:
    """Uniform temporal sampling: pick `num_out` frame indices evenly spanning
    ``[0, num_raw_frames)`` (center-of-segment convention, the standard WLASL
    pipeline behavior). Host-side helper — runs before decode so the decoder
    only decodes sampled frames.
    """
    if num_raw_frames <= 0:
        raise ValueError("num_raw_frames must be positive")
    # Center of each of `num_out` equal segments; clips shorter than num_out
    # repeat frames (same convention torch video pipelines use).
    idx = (np.arange(num_out, dtype=np.float64) + 0.5) * num_raw_frames / num_out
    return np.minimum(idx.astype(np.int64), num_raw_frames - 1)


def resize_plan(in_hw: Tuple[int, int], resize_short: int) -> Tuple[int, int]:
    """Target (H, W) after aspect-preserving short-side resize (cv2 semantics:
    round to nearest integer). The ONE shared implementation — decode staging
    and the sampling-matrix builders all derive from it so rounding
    conventions can never diverge between host and device."""
    h, w = in_hw
    if h <= w:
        return resize_short, int(round(w * resize_short / h))
    return int(round(h * resize_short / w)), resize_short


_resize_plan = resize_plan  # backwards-compat alias


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_clip_jnp(frames_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """Reference implementation: [B, T, Hs, Ws, 3] uint8 → [B, T, crop, crop, 3]
    normalized, `cfg.out_dtype`, NHWC (flattened over B·T for the resize).

    Matches cv2.INTER_LINEAR half-pixel-center bilinear within tolerance
    (jax.image 'linear' uses the same convention).
    """
    b, t, hs, ws, c = frames_u8.shape
    rh, rw = _resize_plan((hs, ws), cfg.resize_short)
    x = frames_u8.astype(jnp.float32) / 255.0
    x = x.reshape(b * t, hs, ws, c)
    if (rh, rw) != (hs, ws):
        # antialias=False matches cv2.INTER_LINEAR (plain bilinear taps, no
        # kernel widening on downscale — the reference-family behavior).
        x = jax.image.resize(
            x, (b * t, rh, rw, c), method="linear", antialias=False
        )
    # Center crop.
    y0 = (rh - cfg.crop) // 2
    x0 = (rw - cfg.crop) // 2
    x = jax.lax.dynamic_slice_in_dim(x, y0, cfg.crop, axis=1)
    x = jax.lax.dynamic_slice_in_dim(x, x0, cfg.crop, axis=2)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    x = (x - mean) / std
    return x.reshape(b, t, cfg.crop, cfg.crop, c).astype(cfg.out_jnp_dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_clip_mm(frames_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """MXU-matmul formulation (asltpu.ops.resize_mm): resize+crop as two
    dense contractions with the normalize epilogue — the XLA-fused
    production path when the Pallas kernel is disabled."""
    from asltpu.ops import resize_mm

    b, t, hs, ws, c = frames_u8.shape
    rh, rw = resize_mm.resize_crop_matrices((hs, ws), cfg.resize_short, cfg.crop)
    out = resize_mm.resize_crop_normalize(
        frames_u8.reshape(b * t, hs, ws, c),
        jnp.asarray(rh),
        jnp.asarray(rw),
        jnp.asarray(cfg.mean, jnp.float32),
        jnp.asarray(cfg.std, jnp.float32),
        out_dtype=cfg.out_jnp_dtype,
    )
    return out.reshape(b, t, cfg.crop, cfg.crop, c)


def preprocess_clip(frames_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """Production entry point — dispatches to the fused Pallas kernel on TPU
    or the MXU-matmul jnp path (CPU tests / ``use_pallas=False``)."""
    if (
        cfg.use_pallas
        and frames_u8.ndim == 5
        and jax.devices()[0].platform == "tpu"
    ):
        from asltpu.ops.preprocess_pallas import preprocess_clip_pallas

        return preprocess_clip_pallas(frames_u8, cfg)
    return preprocess_clip_mm(frames_u8, cfg)
