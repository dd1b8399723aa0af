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


# ITU-R BT.601 studio-swing coefficients — the exact constants OpenCV's
# I420↔BGR conversions use (cv2/modules/imgproc color_yuv, ITUR_BT_601
# fixed-point values / 2^20), verified empirically in
# tests/unit/test_preprocess.py::test_yuv420_matches_cv2.
_BT601_CY = 1220542 / (1 << 20)   # 1.163898…  luma expand (Y-16)
_BT601_CVR = 1673527 / (1 << 20)  # 1.596027…  V → R
_BT601_CVG = 852492 / (1 << 20)   # 0.812968…  V → G (subtractive)
_BT601_CUG = 409993 / (1 << 20)   # 0.391001…  U → G (subtractive)
_BT601_CUB = 2116026 / (1 << 20)  # 2.017990…  U → B


def yuv420_planes_to_rgb(planes_u8: jax.Array, hs: int, ws: int) -> jax.Array:
    """Packed I420 planes [..., Hs·3/2, Ws] uint8 → RGB float32 [..., Hs, Ws, 3]
    in [0, 255], matching ``cv2.COLOR_YUV2BGR_I420``: BT.601 studio swing,
    chroma upsampled by 2×2 replication (cv2's convention)."""
    lead = planes_u8.shape[:-2]
    y = planes_u8[..., :hs, :].astype(jnp.float32)
    # In the packed 2D view each row holds TWO rows of a half-width chroma
    # plane: U occupies packed rows [Hs, Hs + Hs/4), V the remainder.
    qh = hs // 4
    u = planes_u8[..., hs : hs + qh, :].reshape(*lead, hs // 2, ws // 2)
    v = planes_u8[..., hs + qh :, :].reshape(*lead, hs // 2, ws // 2)
    u = jnp.repeat(jnp.repeat(u, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    v = jnp.repeat(jnp.repeat(v, 2, axis=-2), 2, axis=-1).astype(jnp.float32) - 128.0
    # cv2 clamps the luma excursion at zero BEFORE scaling (ITUR_BT_601's
    # ``max(0, Y-16)``) — without this, sub-black Y values diverge by up to
    # ~19/255 from the oracle.
    yf = _BT601_CY * jnp.maximum(y - 16.0, 0.0)
    r = yf + _BT601_CVR * v
    g = yf - _BT601_CVG * v - _BT601_CUG * u
    b = yf + _BT601_CUB * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_clip_yuv420(planes_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """[B, T, Hs·3/2, Ws] packed I420 uint8 → [B, T, crop, crop, 3] normalized.

    YUV→RGB conversion + (optional) resize/crop + normalize, one XLA region —
    all elementwise/repeat work that XLA fuses at HBM bandwidth; the wire
    carried half the bytes of the RGB path."""
    b, t, hp, ws = planes_u8.shape
    hs = hp * 2 // 3
    x = yuv420_planes_to_rgb(planes_u8, hs, ws) / 255.0  # [B,T,Hs,Ws,3] 0..1
    rh, rw = _resize_plan((hs, ws), cfg.resize_short)
    x = x.reshape(b * t, hs, ws, 3)
    if (rh, rw) != (hs, ws):
        x = jax.image.resize(x, (b * t, rh, rw, 3), method="linear",
                             antialias=False)
    if (rh, rw) != (cfg.crop, cfg.crop):
        y0 = (rh - cfg.crop) // 2
        x0 = (rw - cfg.crop) // 2
        x = jax.lax.dynamic_slice_in_dim(x, y0, cfg.crop, axis=1)
        x = jax.lax.dynamic_slice_in_dim(x, x0, cfg.crop, axis=2)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    x = (x - mean) / std
    return x.reshape(b, t, cfg.crop, cfg.crop, 3).astype(cfg.out_jnp_dtype)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_clip_normalize_only(
    frames_u8: jax.Array, cfg: PreprocessConfig
) -> jax.Array:
    """Transfer-thin fast path: staging == crop and the resize is identity
    (host already resized+cropped), so the device work is ONLY
    u8→f32 → normalize → cast — pure elementwise at HBM bandwidth. Running
    the sampling-matrix contractions here (two ~identity [crop,crop]@
    [crop,crop·3] matmuls per frame) would be wasted MXU work."""
    x = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return ((x - mean) / std).astype(cfg.out_jnp_dtype)


def _thin_mode_identity(cfg: PreprocessConfig) -> bool:
    """True when staging == crop² and the device resize plan is identity —
    i.e. the host staged final-resolution frames (transfer-thin mode)."""
    if cfg.staging_size != (cfg.crop, cfg.crop):
        return False
    return _resize_plan(cfg.staging_size, cfg.resize_short) == cfg.staging_size


def preprocess_clip(frames_u8: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    """Production entry point — dispatches on staging format, then to the
    fused Pallas kernel on TPU or the MXU-matmul jnp path (CPU tests /
    ``use_pallas=False``)."""
    if cfg.staging_format == "yuv420":
        if (
            cfg.use_pallas
            and frames_u8.ndim == 4
            and _thin_mode_identity(cfg)
            and jax.devices()[0].platform == "tpu"
        ):
            # Fused Pallas lane for the production wire format: the XLA
            # path's chroma upsample + channel interleave cost ~6× the
            # cast-only speed of light (measured round 3,
            # tools/probe_device.py yuv); the kernel does conversion +
            # normalize + interleave in one HBM pass.
            from asltpu.ops.preprocess_pallas import (
                preprocess_clip_yuv420_pallas,
            )

            return preprocess_clip_yuv420_pallas(frames_u8, cfg)
        return preprocess_clip_yuv420(frames_u8, cfg)
    if frames_u8.ndim == 5 and _thin_mode_identity(cfg):
        return preprocess_clip_normalize_only(frames_u8, cfg)
    if (
        cfg.use_pallas
        and frames_u8.ndim == 5
        and jax.devices()[0].platform == "tpu"
    ):
        from asltpu.ops.preprocess_pallas import preprocess_clip_pallas

        return preprocess_clip_pallas(frames_u8, cfg)
    return preprocess_clip_mm(frames_u8, cfg)
