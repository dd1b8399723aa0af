"""Fused Pallas preprocess kernel vs the jnp/cv2 oracle (interpret mode on
the CPU mesh; the compiled path is exercised on TPU by bench.py)."""

import numpy as np
import pytest

from asltpu.config import PreprocessConfig
from asltpu.ops.preprocess import preprocess_clip_jnp
from asltpu.ops.preprocess_pallas import preprocess_clip_pallas


@pytest.mark.parametrize(
    "staging,resize_short,crop",
    [((64, 64), 56, 48), ((64, 80), 56, 48), ((56, 56), 56, 48)],
)
def test_pallas_kernel_matches_oracle(rng, staging, resize_short, crop):
    cfg = PreprocessConfig(
        num_frames=2, staging_size=staging, resize_short=resize_short,
        crop=crop, out_dtype="float32", use_pallas=True,
    )
    frames = rng.integers(0, 256, size=(2, 2, *staging, 3), dtype=np.uint8)
    got = np.asarray(preprocess_clip_pallas(frames, cfg, interpret=True))
    want = np.asarray(preprocess_clip_jnp(frames, cfg))
    assert got.shape == want.shape == (2, 2, crop, crop, 3)
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_pallas_kernel_bf16_output(rng):
    cfg = PreprocessConfig(
        num_frames=1, staging_size=(56, 56), resize_short=56, crop=48,
        out_dtype="bfloat16",
    )
    frames = rng.integers(0, 256, size=(1, 1, 56, 56, 3), dtype=np.uint8)
    got = preprocess_clip_pallas(frames, cfg, interpret=True)
    assert str(got.dtype) == "bfloat16"
    want = np.asarray(preprocess_clip_jnp(frames, cfg)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), want, atol=2e-2
    )


# ---------------------------------------------------------------------------
# Fused yuv420 kernel (the production wire format's Pallas lane; VERDICT r2
# next-round #9). Identity-resize configurations only — the dispatcher falls
# back to the XLA path otherwise.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("size", [48, 64])
def test_pallas_yuv420_matches_xla_path(rng, size):
    from asltpu.ops.preprocess import preprocess_clip_yuv420
    from asltpu.ops.preprocess_pallas import preprocess_clip_yuv420_pallas

    cfg = PreprocessConfig(
        num_frames=2, staging_size=(size, size), resize_short=size, crop=size,
        out_dtype="float32", staging_format="yuv420",
    )
    planes = rng.integers(
        0, 256, size=(2, 2, size * 3 // 2, size), dtype=np.uint8
    )
    got = np.asarray(preprocess_clip_yuv420_pallas(planes, cfg, interpret=True))
    want = np.asarray(preprocess_clip_yuv420(planes, cfg))
    assert got.shape == want.shape == (2, 2, size, size, 3)
    # f32 end to end: only summation-order differences remain.
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_yuv420_bf16_output(rng):
    from asltpu.ops.preprocess import preprocess_clip_yuv420
    from asltpu.ops.preprocess_pallas import preprocess_clip_yuv420_pallas

    cfg = PreprocessConfig(
        num_frames=1, staging_size=(48, 48), resize_short=48, crop=48,
        out_dtype="bfloat16", staging_format="yuv420",
    )
    planes = rng.integers(0, 256, size=(1, 1, 72, 48), dtype=np.uint8)
    got = preprocess_clip_yuv420_pallas(planes, cfg, interpret=True)
    assert str(got.dtype) == "bfloat16"
    want = np.asarray(preprocess_clip_yuv420(planes, cfg)).astype(np.float32)
    # bf16 cast at the end: 1 ulp at |x|≈4 is 0.03.
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), want, atol=4e-2
    )
