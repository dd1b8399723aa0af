"""Train-time clip augmentation (the "aug variant" of the preprocess path —
SURVEY.md §3.3), designed for XLA: every random transform keeps static
shapes and rides the MXU.

Random resized crop + horizontal flip are expressed as per-clip bilinear
sampling matrices built ON DEVICE from traced scalars (crop offset, scale,
flip sign) — the same matmul formulation as asltpu.ops.resize_mm, but with
the matrices batched over clips: ``einsum('bhx,bthwc->btxwc')``. One
transform per clip, consistent across its frames (the standard video-aug
convention). Color jitter (brightness/contrast) is an elementwise epilogue.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp

from asltpu.config import PreprocessConfig


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    enabled: bool = True
    # Random-resized-crop: sampled window area fraction and aspect jitter.
    min_area: float = 0.5
    max_area: float = 1.0
    min_aspect: float = 0.8
    max_aspect: float = 1.25
    hflip_prob: float = 0.5
    brightness: float = 0.15  # ± fraction
    contrast: float = 0.15  # ± fraction


def _device_sampling_matrix(
    n_in: int, n_out: int, start: jax.Array, size: jax.Array, flip: jax.Array
) -> jax.Array:
    """[n_out, n_in] bilinear matrix sampling ``n_out`` points across the
    window [start, start+size) of an ``n_in``-pixel axis; ``flip`` ∈ {0,1}
    reverses direction. All args traced scalars → built with iota compares
    (no gathers)."""
    out_idx = jnp.arange(n_out, dtype=jnp.float32)
    out_idx = jnp.where(flip > 0, n_out - 1.0 - out_idx, out_idx)
    scale = size / n_out
    src = (out_idx + 0.5) * scale + start - 0.5
    src = jnp.clip(src, 0.0, n_in - 1.0)
    lo = jnp.floor(src)
    w = src - lo  # [n_out]
    cols = jnp.arange(n_in, dtype=jnp.float32)[None, :]  # [1, n_in]
    lo_match = (cols == lo[:, None]).astype(jnp.float32)
    hi = jnp.minimum(lo + 1.0, n_in - 1.0)
    hi_match = (cols == hi[:, None]).astype(jnp.float32)
    return lo_match * (1.0 - w[:, None]) + hi_match * w[:, None]


@functools.partial(jax.jit, static_argnames=("pp", "aug"))
def augment_preprocess_clip(
    rng: jax.Array,
    frames_u8: jax.Array,  # [B, T, Hs, Ws, 3] uint8 staged frames
    pp: PreprocessConfig,
    aug: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Random resized crop + flip + color jitter + normalize →
    [B, T, crop, crop, 3] ``pp.out_dtype``. The eval-time path
    (asltpu.ops.preprocess) is the deterministic special case."""
    b, t, hs, ws, c = frames_u8.shape
    crop = pp.crop
    k_area, k_aspect, k_y, k_x, k_flip, k_bri, k_con = jax.random.split(rng, 7)

    area = jax.random.uniform(
        k_area, (b,), minval=aug.min_area, maxval=aug.max_area
    )
    log_aspect = jax.random.uniform(
        k_aspect, (b,),
        minval=jnp.log(aug.min_aspect), maxval=jnp.log(aug.max_aspect),
    )
    aspect = jnp.exp(log_aspect)
    # Window size in source pixels (clamped to the frame).
    win_h = jnp.minimum(jnp.sqrt(area * hs * ws / aspect), hs)
    win_w = jnp.minimum(win_h * aspect, ws)
    y0 = jax.random.uniform(k_y, (b,)) * (hs - win_h)
    x0 = jax.random.uniform(k_x, (b,)) * (ws - win_w)
    flip = (jax.random.uniform(k_flip, (b,)) < aug.hflip_prob).astype(
        jnp.float32
    )

    mh = jax.vmap(
        lambda s, z: _device_sampling_matrix(hs, crop, s, z, jnp.float32(0))
    )(y0, win_h)  # [B, crop, Hs]
    mw = jax.vmap(
        lambda s, z, f: _device_sampling_matrix(ws, crop, s, z, f)
    )(x0, win_w, flip)  # [B, crop, Ws]

    x = frames_u8.astype(jnp.float32)
    y = jnp.einsum("boh,bthwc->btowc", mh, x,
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("bpw,btowc->btopc", mw, y,
                   precision=jax.lax.Precision.HIGHEST)

    y = y / 255.0
    if aug.brightness > 0:
        bri = jax.random.uniform(
            k_bri, (b, 1, 1, 1, 1),
            minval=-aug.brightness, maxval=aug.brightness,
        )
        y = y + bri
    if aug.contrast > 0:
        con = jax.random.uniform(
            k_con, (b, 1, 1, 1, 1),
            minval=1.0 - aug.contrast, maxval=1.0 + aug.contrast,
        )
        mean_lum = jnp.mean(y, axis=(2, 3, 4), keepdims=True)
        y = (y - mean_lum) * con + mean_lum
    y = jnp.clip(y, 0.0, 1.0)

    mean = jnp.asarray(pp.mean, jnp.float32)
    std = jnp.asarray(pp.std, jnp.float32)
    return ((y - mean) / std).astype(pp.out_jnp_dtype)
