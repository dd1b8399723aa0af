"""Fused Pallas preprocessing kernel (C2 — the ``BASELINE.json:4``
north-star requirement): staged uint8 frames → resized, center-cropped,
mean/std-normalized NHWC clip tensor written directly to HBM in the
backbone's compute dtype. ONE kernel per frame; no intermediate HBM traffic.

Math (same as asltpu.ops.resize_mm): bilinear resize+crop as two dense
sampling-matrix contractions that ride the MXU —

    out = (Rh @ cast_f32(X) @ K) * scale + shift,  K = kron(Rw^T, I_3)

with X the frame viewed as [Hs, Ws·3] (channels interleaved; the Kronecker
factor keeps channel interleaving intact so no lane-hostile C=3 transposes
happen anywhere), and scale/shift laid out as channel-tiled [1, crop·3]
vectors so normalization is a plain VPU multiply-add epilogue.

Per-frame cost at 256²→224²: ~0.3 GFLOP, VMEM footprint ~4.2 MB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.ops.resize_mm import resize_crop_matrices


@functools.lru_cache(maxsize=16)
def _kernel_constants(
    in_hw: Tuple[int, int],
    resize_short: int,
    crop: int,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
):
    """Host-side constants: Rh [crop, Hin], K [Win·3, crop·3],
    scale/shift [1, crop·3]."""
    rh, rw = resize_crop_matrices(in_hw, resize_short, crop)
    c = len(mean)
    win = rw.shape[1]
    # K[iw*3+ch, ow*3+ch] = rw[ow, iw]  (kron(Rw^T, I_c))
    k = np.zeros((win * c, crop * c), np.float32)
    for ch in range(c):
        k[ch::c, ch::c] = rw.T
    scale = np.tile((1.0 / 255.0) / np.asarray(std, np.float32), crop)[None, :]
    shift = np.tile(
        -np.asarray(mean, np.float32) / np.asarray(std, np.float32), crop
    )[None, :]
    return rh, k, scale, shift


def _frame_kernel(x_ref, rh_ref, k_ref, scale_ref, shift_ref, out_ref):
    """One frame: [1, Hs, Ws·3] u8 → [1, crop, crop·3] out_dtype."""
    # Mosaic has no direct u8→f32 cast; hop through int32.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # [Hs, Ws·3]
    y = jnp.dot(rh_ref[:], x, preferred_element_type=jnp.float32)
    y = jnp.dot(y, k_ref[:], preferred_element_type=jnp.float32)
    y = y * scale_ref[:] + shift_ref[:]
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def preprocess_clip_pallas(
    frames_u8: jax.Array, cfg: PreprocessConfig, interpret: bool = False
) -> jax.Array:
    """[B, T, Hs, Ws, 3] uint8 → [B, T, crop, crop, 3] ``cfg.out_dtype``."""
    from jax.experimental import pallas as pl

    b, t, hs, ws, c = frames_u8.shape
    n = b * t
    crop = cfg.crop
    rh, k, scale, shift = _kernel_constants(
        (hs, ws), cfg.resize_short, crop, cfg.mean, cfg.std
    )
    x = frames_u8.reshape(n, hs, ws * c)

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        space = dict(memory_space=vmem)
    except ImportError:  # pragma: no cover - CPU interpret path
        space = {}

    out = pl.pallas_call(
        _frame_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hs, ws * c), lambda i: (i, 0, 0), **space),
            pl.BlockSpec((crop, hs), lambda i: (0, 0), **space),
            pl.BlockSpec((ws * c, crop * c), lambda i: (0, 0), **space),
            pl.BlockSpec((1, crop * c), lambda i: (0, 0), **space),
            pl.BlockSpec((1, crop * c), lambda i: (0, 0), **space),
        ],
        out_specs=pl.BlockSpec((1, crop, crop * c), lambda i: (i, 0, 0), **space),
        out_shape=jax.ShapeDtypeStruct((n, crop, crop * c), cfg.out_jnp_dtype),
        interpret=interpret,
    )(x, jnp.asarray(rh), jnp.asarray(k), jnp.asarray(scale), jnp.asarray(shift))
    return out.reshape(b, t, crop, crop, c)


# ---------------------------------------------------------------------------
# Fused yuv420 kernel: packed I420 planes → converted, normalized, channel-
# interleaved frames in ONE kernel (the production wire format's lane —
# VERDICT r2 next-round #9). Measured round 3 (tools/probe_device.py yuv):
# the XLA yuv420 path runs at 85 GB/s effective, ~6× off the cast-only
# speed of light (283 GB/s) — the repeat-upsample + stack interleave break
# XLA's fusion into several HBM round-trips. This kernel does one.
#
# Mosaic constraint driving the design (measured on this TPU): sublane
# (axis=-2) jnp.repeat compiles; lane-dim reshapes / repeats / stack-
# interleave do NOT. So everything lane-wise rides the MXU instead:
#
#   Y path:  m = max(Y-16, 0)                      [Hs, Ws]   (VPU)
#            m @ Sy                                 → [Hs, Ws·3]
#     where Sy[w, 3w+c] = CY·s_c  (interleave-with-scale: each output
#     lane is exactly one scaled input lane — a lane-repeat the MXU can do)
#   U path:  unpack packed rows (two half-width chroma rows per packed
#            row) with one-hot row-interleave matmuls Re/Ro, subtract 128,
#            2× vertical upsample via sublane repeat, then one contraction
#            CSu that BOTH 2×-upsamples lanes AND interleaves channels:
#            CSu[p, 3w+c] = ucoef_c·s_c for w ∈ {2p, 2p+1}
#   V path:  same with CSv.
#
#   out = clamp(m@Sy + Ur@CSu + Vr@CSv + bias, lo, hi)  .astype(out_dtype)
#
# The clamp replaces the oracle's clip(rgb, 0, 255)-then-normalize: since
# per-channel normalize is a monotone affine map, clipping afterwards with
# per-lane bounds lo_c = (0−mean)/std, hi_c = (1−mean)/std is exact.
# BT.601 constants match asltpu.ops.preprocess (cv2's ITUR_BT_601 values).
#
# Scope: the identity-resize configuration (staging == crop², the
# production default — host stages final-size frames). Non-identity
# resize falls back to the XLA path in the dispatcher.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _yuv_kernel_constants(
    hs: int,
    ws: int,
    mean: Tuple[float, ...],
    std: Tuple[float, ...],
):
    from asltpu.ops.preprocess import (  # shared BT.601 constants
        _BT601_CUB,
        _BT601_CUG,
        _BT601_CVG,
        _BT601_CVR,
        _BT601_CY,
    )

    hc, wc = hs // 2, ws // 2
    s = 1.0 / (255.0 * np.asarray(std, np.float64))
    bias = -np.asarray(mean, np.float64) / np.asarray(std, np.float64)
    ucoef = np.array([0.0, -_BT601_CUG, _BT601_CUB])
    vcoef = np.array([_BT601_CVR, -_BT601_CVG, 0.0])

    re = np.zeros((hc, hc // 2), np.float32)
    ro = np.zeros((hc, hc // 2), np.float32)
    for r in range(hc):
        (ro if r % 2 else re)[r, r // 2] = 1.0

    sy = np.zeros((ws, ws * 3), np.float32)
    csu = np.zeros((wc, ws * 3), np.float32)
    csv = np.zeros((wc, ws * 3), np.float32)
    for w in range(ws):
        for c in range(3):
            sy[w, 3 * w + c] = _BT601_CY * s[c]
            csu[w // 2, 3 * w + c] = ucoef[c] * s[c]
            csv[w // 2, 3 * w + c] = vcoef[c] * s[c]
    lane = np.arange(ws * 3) % 3
    biasv = bias[lane][None, :].astype(np.float32)
    # The clamp's lower bound (0−mean)/std IS the bias vector — the kernel
    # reuses b_ref for it rather than carrying a duplicate VMEM operand.
    hi = (1.0 / np.asarray(std, np.float64))[lane][None, :].astype(
        np.float32) + biasv
    return re, ro, sy, csu, csv, biasv, hi


def _yuv_frame_kernel(
    x_ref, re_ref, ro_ref, sy_ref, csu_ref, csv_ref, b_ref, hi_ref, out_ref,
):
    """One frame: [1, Hs·3/2, Ws] packed I420 u8 → [1, Hs, Ws·3] out_dtype."""
    hp, ws = x_ref.shape[1], x_ref.shape[2]
    hs = hp * 2 // 3
    qh = hs // 4
    wc = ws // 2
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)  # no direct u8→f32
    m = jnp.maximum(x[:hs, :] - 16.0, 0.0)
    up, vp = x[hs : hs + qh, :], x[hs + qh :, :]
    cu = (
        jnp.dot(re_ref[:], up[:, :wc], preferred_element_type=jnp.float32)
        + jnp.dot(ro_ref[:], up[:, wc:], preferred_element_type=jnp.float32)
        - 128.0
    )
    cv = (
        jnp.dot(re_ref[:], vp[:, :wc], preferred_element_type=jnp.float32)
        + jnp.dot(ro_ref[:], vp[:, wc:], preferred_element_type=jnp.float32)
        - 128.0
    )
    ur = jnp.repeat(cu, 2, axis=0)  # [hs, wc] — sublane repeat (supported)
    vr = jnp.repeat(cv, 2, axis=0)
    acc = jnp.dot(m, sy_ref[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(ur, csu_ref[:], preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(vr, csv_ref[:], preferred_element_type=jnp.float32)
    acc = jnp.clip(acc + b_ref[:], b_ref[:], hi_ref[:])
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def preprocess_clip_yuv420_pallas(
    planes_u8: jax.Array, cfg: PreprocessConfig, interpret: bool = False
) -> jax.Array:
    """[B, T, Hs·3/2, Ws] packed I420 uint8 → [B, T, Hs, Hs(=crop), 3]
    normalized ``cfg.out_dtype``. Identity-resize configurations only
    (the dispatcher guarantees this)."""
    from jax.experimental import pallas as pl

    b, t, hp, ws = planes_u8.shape
    hs = hp * 2 // 3
    n = b * t
    re, ro, sy, csu, csv, biasv, hi = _yuv_kernel_constants(
        hs, ws, cfg.mean, cfg.std
    )
    x = planes_u8.reshape(n, hp, ws)

    try:
        from jax.experimental.pallas import tpu as pltpu

        space = dict(memory_space=pltpu.VMEM)
    except ImportError:  # pragma: no cover - CPU interpret path
        space = {}

    hc = hs // 2
    wc = ws // 2
    out = pl.pallas_call(
        _yuv_frame_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hp, ws), lambda i: (i, 0, 0), **space),
            pl.BlockSpec((hc, hc // 2), lambda i: (0, 0), **space),
            pl.BlockSpec((hc, hc // 2), lambda i: (0, 0), **space),
            pl.BlockSpec((ws, ws * 3), lambda i: (0, 0), **space),
            pl.BlockSpec((wc, ws * 3), lambda i: (0, 0), **space),
            pl.BlockSpec((wc, ws * 3), lambda i: (0, 0), **space),
            pl.BlockSpec((1, ws * 3), lambda i: (0, 0), **space),
            pl.BlockSpec((1, ws * 3), lambda i: (0, 0), **space),
        ],
        out_specs=pl.BlockSpec((1, hs, ws * 3), lambda i: (i, 0, 0), **space),
        out_shape=jax.ShapeDtypeStruct((n, hs, ws * 3), cfg.out_jnp_dtype),
        interpret=interpret,
    )(
        x, jnp.asarray(re), jnp.asarray(ro), jnp.asarray(sy),
        jnp.asarray(csu), jnp.asarray(csv), jnp.asarray(biasv),
        jnp.asarray(hi),
    )
    return out.reshape(b, t, hs, ws, 3)
