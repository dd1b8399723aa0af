"""Performance-regression gate (SURVEY.md §4.2): device-path throughput
must not regress vs the recorded floor. TPU-only — run with

    ASLTPU_TEST_TPU=1 python -m pytest tests/bench -q

Default (CPU-mesh) test runs skip these.
"""

import time

import numpy as np
import pytest

import jax

TPU = jax.devices()[0].platform == "tpu"

# Recorded floors on 1× TPU v5 lite (batch 32, 16×224² staged 256²).
# Measured 2026-08-16 (round 1): preprocess+MobileNetV2+GRU ≈ 2000 clips/s;
# the gate allows 30% headroom for bench noise.
DEVICE_CLIPS_PER_SEC_FLOOR = 1400.0
PREPROCESS_MS_CEIL = 8.0


@pytest.mark.skipif(not TPU, reason="perf gate runs on TPU only")
@pytest.mark.slow
def test_device_throughput_floor():
    from asltpu.api import load_model

    model = load_model("mobilenet_gru")
    fn = model.predict_fn()
    frames = np.random.randint(0, 256, (32, 16, 256, 256, 3), np.uint8)
    dev = jax.device_put(frames)
    jax.block_until_ready(fn(model.variables, dev))
    t0 = time.perf_counter()
    iters = 15
    for _ in range(iters):
        r = fn(model.variables, dev)
    jax.block_until_ready(r)
    cps = iters * 32 / (time.perf_counter() - t0)
    assert cps > DEVICE_CLIPS_PER_SEC_FLOOR, f"device path regressed: {cps:.0f}"


@pytest.mark.skipif(not TPU, reason="perf gate runs on TPU only")
@pytest.mark.slow
def test_pallas_preprocess_latency():
    from asltpu.config import PreprocessConfig
    from asltpu.ops.preprocess_pallas import preprocess_clip_pallas

    pp = PreprocessConfig(out_dtype="bfloat16")
    frames = np.random.randint(0, 256, (32, 16, 256, 256, 3), np.uint8)
    dev = jax.device_put(frames)
    jax.block_until_ready(preprocess_clip_pallas(dev, pp))
    t0 = time.perf_counter()
    for _ in range(20):
        r = preprocess_clip_pallas(dev, pp)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    assert ms < PREPROCESS_MS_CEIL, f"pallas preprocess regressed: {ms:.2f} ms"
