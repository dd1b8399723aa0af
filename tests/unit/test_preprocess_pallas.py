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
