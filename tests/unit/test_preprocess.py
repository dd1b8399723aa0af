"""Preprocess kernel vs cv2/numpy oracle (SURVEY.md §4.2 unit strategy)."""

import numpy as np
import pytest

from asltpu.config import PreprocessConfig
from asltpu.ops.preprocess import (
    preprocess_clip_jnp,
    preprocess_clip_mm,
    uniform_sample_indices,
)


def test_uniform_sample_basic():
    idx = uniform_sample_indices(100, 16)
    assert len(idx) == 16
    assert idx[0] == 3 and idx[-1] == 96  # centers of 16 segments of 6.25
    assert (np.diff(idx) > 0).all()


def test_uniform_sample_short_clip_repeats():
    idx = uniform_sample_indices(4, 16)
    assert len(idx) == 16
    assert idx.max() <= 3
    assert set(idx) == {0, 1, 2, 3}


def test_uniform_sample_single_frame():
    assert (uniform_sample_indices(1, 8) == 0).all()


def _cv2_oracle(frames_u8, cfg):
    """The reference-family OpenCV loop: resize short side, center crop,
    normalize."""
    import cv2

    out = []
    for f in frames_u8:
        h, w = f.shape[:2]
        if h <= w:
            rh, rw = cfg.resize_short, int(round(w * cfg.resize_short / h))
        else:
            rh, rw = int(round(h * cfg.resize_short / w)), cfg.resize_short
        r = cv2.resize(f, (rw, rh), interpolation=cv2.INTER_LINEAR)
        y0, x0 = (rh - cfg.crop) // 2, (rw - cfg.crop) // 2
        r = r[y0 : y0 + cfg.crop, x0 : x0 + cfg.crop].astype(np.float32) / 255.0
        r = (r - np.array(cfg.mean, np.float32)) / np.array(cfg.std, np.float32)
        out.append(r)
    return np.stack(out)


@pytest.mark.parametrize("staging", [(64, 64), (64, 80)])
def test_preprocess_matches_cv2(rng, staging):
    cfg = PreprocessConfig(
        num_frames=3,
        staging_size=staging,
        resize_short=56,
        crop=48,
        out_dtype="float32",
        use_pallas=False,
    )
    frames = rng.integers(0, 256, size=(2, 3, *staging, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_jnp(frames, cfg))
    want = np.stack([_cv2_oracle(clip, cfg) for clip in frames])
    assert got.shape == want.shape == (2, 3, 48, 48, 3)
    # Bilinear implementations differ in rounding; 1e-2 in normalized units
    # is well inside the fp32-tolerance parity contract.
    np.testing.assert_allclose(got, want, atol=2e-2)


@pytest.mark.parametrize("staging", [(64, 64), (64, 80), (48, 48)])
def test_preprocess_mm_matches_cv2(rng, staging):
    """The MXU-matmul formulation must match the cv2 oracle too (it is the
    production device path)."""
    cfg = PreprocessConfig(
        num_frames=2, staging_size=staging, resize_short=56, crop=48,
        out_dtype="float32", use_pallas=False,
    )
    frames = rng.integers(0, 256, size=(2, 2, *staging, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_mm(frames, cfg))
    want = np.stack([_cv2_oracle(clip, cfg) for clip in frames])
    np.testing.assert_allclose(got, want, atol=2e-2)
    # And against the gather-based jnp reference, tighter.
    ref = np.asarray(preprocess_clip_jnp(frames, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_preprocess_mm_identity_resize_exact(rng):
    """staging == resize_short → R matrices are pure selection; result must
    be exactly crop+normalize."""
    cfg = PreprocessConfig(
        num_frames=2, staging_size=(56, 56), resize_short=56, crop=48,
        out_dtype="float32", use_pallas=False,
    )
    frames = rng.integers(0, 256, size=(1, 2, 56, 56, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_mm(frames, cfg))
    want = np.stack([_cv2_oracle(clip, cfg) for clip in frames])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_preprocess_noop_resize(rng):
    """When staging == resize target, only crop+normalize applies: exact."""
    cfg = PreprocessConfig(
        num_frames=2, staging_size=(56, 56), resize_short=56, crop=48,
        out_dtype="float32", use_pallas=False,
    )
    frames = rng.integers(0, 256, size=(1, 2, 56, 56, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_jnp(frames, cfg))
    want = np.stack([_cv2_oracle(clip, cfg) for clip in frames])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_transfer_thin_mode_matches_device_path(rng, tmp_path):
    """host_resize_short staging (host resize+crop, device normalize-only)
    must produce the same preprocessed tensor as the full device path —
    the bench relies on this equivalence."""
    import dataclasses

    from asltpu.data.decode import decode_clip
    from asltpu.data.synthetic import write_video

    path = str(tmp_path / "c.mp4")
    write_video(path, num_frames=12, size=(100, 80), seed=0)

    device_cfg = PreprocessConfig(
        num_frames=4, staging_size=(64, 64), resize_short=56, crop=48,
        out_dtype="float32", use_pallas=False,
    )
    thin_cfg = dataclasses.replace(
        device_cfg, host_resize_short=56, staging_size=(48, 48),
        resize_short=48,
    )
    # Device path: stage 64², resize+crop+normalize on device.
    dev_frames = decode_clip(path, device_cfg)
    dev_out = np.asarray(preprocess_clip_mm(dev_frames[None], device_cfg))[0]
    # Thin path: host resizes the ORIGINAL frame to short-56 + crops 48².
    thin_frames = decode_clip(path, thin_cfg)
    thin_out = np.asarray(preprocess_clip_mm(thin_frames[None], thin_cfg))[0]
    assert dev_out.shape == thin_out.shape == (4, 48, 48, 3)
    # Device path resized source→64→56 (two bilinear hops) vs thin's
    # source→56 (one hop): small resample differences are expected.
    assert np.abs(dev_out - thin_out).mean() < 0.08
    np.testing.assert_allclose(dev_out.mean(), thin_out.mean(), atol=0.02)


# --------------------------------------------------------------------------
# yuv420 staging (half wire bytes; device-side BT.601 conversion)
# --------------------------------------------------------------------------


def test_yuv420_matches_cv2(rng):
    """Device YUV→RGB (ops.preprocess.yuv420_planes_to_rgb) must reproduce
    cv2.COLOR_YUV2BGR_I420 (BT.601 studio swing, 2×2 chroma replication)."""
    import cv2

    from asltpu.ops.preprocess import yuv420_planes_to_rgb

    hs, ws = 48, 64
    planes = rng.integers(0, 256, size=(3, hs * 3 // 2, ws), dtype=np.uint8)
    got = np.asarray(yuv420_planes_to_rgb(planes, hs, ws))
    want = np.stack([
        cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420)[:, :, ::-1] for p in planes
    ]).astype(np.float32)
    assert got.shape == want.shape == (3, hs, ws, 3)
    # cv2 rounds to uint8 after fixed-point math; ±1 LSB slack.
    np.testing.assert_allclose(got, want, atol=1.01)


def test_preprocess_yuv420_thin_mode(rng):
    """Full yuv420 thin-mode pipeline: host-staged I420 planes → device
    convert+normalize must match the RGB thin path within chroma-roundtrip
    tolerance (the source was 4:2:0 anyway)."""
    import cv2
    import dataclasses

    from asltpu.ops.preprocess import preprocess_clip_mm, preprocess_clip_yuv420

    crop = 48
    rgb_cfg = PreprocessConfig(
        num_frames=2, staging_size=(crop, crop), resize_short=crop,
        crop=crop, host_resize_short=56, out_dtype="float32",
        use_pallas=False,
    )
    yuv_cfg = dataclasses.replace(rgb_cfg, staging_format="yuv420")
    # Same staged BGR content through both wire formats. Smooth gradients —
    # per-pixel random chroma would make the 4:2:0 2×2 chroma averaging
    # itself the dominant error, which no conversion can undo.
    yy, xx = np.mgrid[0:crop, 0:crop].astype(np.float32)
    base = np.stack([
        255 * yy / crop,
        255 * xx / crop,
        255 * (yy + xx) / (2 * crop),
    ], axis=-1)
    frames_bgr = np.stack([
        np.stack([np.clip(base + 10 * t + 25 * c, 0, 255) for t in range(2)])
        for c in range(2)
    ]).astype(np.uint8)
    rgb_staged = frames_bgr[..., ::-1]
    yuv_staged = np.stack([
        np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in clip])
        for clip in frames_bgr
    ])
    assert yuv_staged.shape == (2, 2, crop * 3 // 2, crop)
    assert yuv_staged.nbytes * 2 == rgb_staged.nbytes  # half the wire bytes
    got = np.asarray(preprocess_clip_yuv420(yuv_staged, yuv_cfg))
    want = np.asarray(preprocess_clip_mm(np.ascontiguousarray(rgb_staged), rgb_cfg))
    assert got.shape == want.shape == (2, 2, crop, crop, 3)
    # 4:2:0 chroma averaging over 2×2 blocks is mildly lossy even on smooth
    # content (real video chroma is already 4:2:0 at the source).
    assert np.abs(got - want).mean() < 0.08
    # Luma (channel mean) must track closely.
    np.testing.assert_allclose(got.mean(), want.mean(), atol=0.03)


def test_decode_clip_yuv420_roundtrip(rng, tmp_path):
    """decode_clip with yuv420 staging → device path ≈ rgb staging path on a
    real (synthetic) video, and top-level shapes are the packed I420 layout."""
    import dataclasses

    from asltpu.data.decode import decode_clip
    from asltpu.data.synthetic import write_video
    from asltpu.ops.preprocess import preprocess_clip_mm, preprocess_clip_yuv420

    path = str(tmp_path / "c.mp4")
    write_video(path, num_frames=10, size=(80, 64), seed=1)
    rgb_cfg = PreprocessConfig(
        num_frames=4, staging_size=(48, 48), resize_short=48, crop=48,
        host_resize_short=56, out_dtype="float32", use_pallas=False,
    )
    yuv_cfg = dataclasses.replace(rgb_cfg, staging_format="yuv420")
    rgb = decode_clip(path, rgb_cfg)
    yuv = decode_clip(path, yuv_cfg)
    assert rgb.shape == (4, 48, 48, 3)
    assert yuv.shape == (4, 72, 48)
    out_rgb = np.asarray(preprocess_clip_mm(rgb[None], rgb_cfg))[0]
    out_yuv = np.asarray(preprocess_clip_yuv420(yuv[None], yuv_cfg))[0]
    # Encoded video chroma is already 4:2:0 → the two paths nearly agree
    # (≈0.06 normalized ≈ 3.6/255 mean on the noisy synthetic fixture; real
    # footage with smooth chroma sits far lower).
    assert np.abs(out_rgb - out_yuv).mean() < 0.10


def test_normalize_only_fast_path_bit_exact(rng):
    """Thin-mode identity dispatch must equal the mm path bit-for-bit (the
    resize matrices are pure selection there)."""
    from asltpu.ops.preprocess import (
        _thin_mode_identity,
        preprocess_clip,
        preprocess_clip_mm,
        preprocess_clip_normalize_only,
    )

    cfg = PreprocessConfig(
        num_frames=2, staging_size=(48, 48), resize_short=48, crop=48,
        host_resize_short=56, out_dtype="float32", use_pallas=False,
    )
    assert _thin_mode_identity(cfg)
    frames = rng.integers(0, 256, size=(2, 2, 48, 48, 3), dtype=np.uint8)
    fast = np.asarray(preprocess_clip_normalize_only(frames, cfg))
    mm = np.asarray(preprocess_clip_mm(frames, cfg))
    np.testing.assert_allclose(fast, mm, atol=1e-6)
    # and the dispatcher picks the fast path's result
    np.testing.assert_array_equal(np.asarray(preprocess_clip(frames, cfg)), fast)
    # non-thin config must NOT dispatch to it
    assert not _thin_mode_identity(PreprocessConfig())
