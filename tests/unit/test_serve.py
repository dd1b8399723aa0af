"""Dynamic-batching predict server: correctness vs one-shot predict,
concurrency, padding, pose models, shutdown/error behavior."""

import threading

import numpy as np
import pytest

from asltpu import api
from asltpu.data.synthetic import synthetic_landmarks
from asltpu.serve import PredictServer


@pytest.fixture(scope="module")
def rgb_model():
    return api.load_model(
        "mobilenet_gru", num_classes=6, gru_hidden=32,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )


def _frames(seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)


def test_serve_matches_predict(rgb_model):
    server = PredictServer(rgb_model, max_batch=4, max_delay_ms=5)
    try:
        frames = [_frames(i) for i in range(6)]
        futs = [server.submit(f) for f in frames]
        results = [f.result(timeout=120) for f in futs]
        for f_in, (gloss, logits) in zip(frames, results):
            _, want = api.predict(rgb_model, f_in)
            np.testing.assert_allclose(logits, want, atol=2e-2)
        assert server.stats.requests == 6
        assert server.stats.batches >= 2  # max_batch=4 forces ≥2 batches
    finally:
        server.shutdown()


def test_serve_concurrent_submitters(rgb_model):
    server = PredictServer(rgb_model, max_batch=8, max_delay_ms=10)
    results = {}

    def client(i):
        results[i] = server.submit(_frames(100 + i)).result(timeout=120)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 10
        assert all(np.isfinite(lg).all() for _, lg in results.values())
        assert server.stats.avg_batch_size > 1.0  # batching actually happened
    finally:
        server.shutdown()


def test_serve_pose_model():
    model = api.load_model("pose_bilstm", num_classes=6, hidden_size=16,
                           num_frames=8)
    server = PredictServer(model, max_batch=4, max_delay_ms=5)
    try:
        lm = synthetic_landmarks(1, 8, seed=0)[0]
        gloss, logits = server.submit(landmarks=lm).result(timeout=120)
        _, want = api.predict(model, lm)
        np.testing.assert_allclose(logits, want, atol=1e-4)
    finally:
        server.shutdown()


def test_serve_fusion_overridden_num_frames():
    """Regression (round-4 ADVICE #1): for a fusion model built with only a
    preprocess num_frames override, the clip T (preprocess.num_frames) is
    the landmark T the forward validates — submit() must accept exactly
    those requests, and the config mirror field must stay in sync."""
    from asltpu.config import get_config

    model = api.load_model(
        "two_stream", num_classes=6, d_model=32, num_heads=2,
        num_fusion_layers=1,
        preprocess={"num_frames": 8, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    assert model.cfg.num_frames == 8  # mirror synced by get_config
    server = PredictServer(model, max_batch=2, max_delay_ms=5)
    try:
        frames = np.random.default_rng(0).integers(
            0, 256, size=(8, 64, 64, 3), dtype=np.uint8
        )
        lm = synthetic_landmarks(1, 8, seed=0)[0]
        gloss, logits = server.submit(frames, lm).result(timeout=120)
        assert logits.shape == (6,) and np.isfinite(logits).all()
        # T=16 landmarks (the old, wrongly-derived expectation) now reject.
        with pytest.raises(ValueError, match="landmarks shape"):
            server.submit(frames, synthetic_landmarks(1, 16, seed=0)[0])
    finally:
        server.shutdown()
    # An explicit num_frames contradicting preprocess fails at CONFIG time.
    with pytest.raises(ValueError, match="contradicts"):
        get_config("two_stream", num_frames=4,
                   preprocess={"num_frames": 8})
    # But a ONE-SIDED top-level override is unambiguous: it syncs the clip
    # pipeline instead of rejecting (the one-value rule, other direction).
    cfg = get_config("two_stream", num_frames=8)
    assert cfg.num_frames == 8 and cfg.preprocess.num_frames == 8


def test_serve_validates_inputs(rgb_model):
    server = PredictServer(rgb_model, max_batch=2)
    try:
        with pytest.raises(ValueError, match="requires RGB"):
            server.submit(landmarks=synthetic_landmarks(1, 4)[0])
        # Per-request SHAPE validation: a malformed request must be
        # rejected at submit(), not fail np.stack inside the batcher where
        # its exception lands on every co-batched caller's future.
        with pytest.raises(ValueError, match="frames shape"):
            server.submit(_frames(0)[:, :32])
        with pytest.raises(ValueError, match="frames shape"):
            server.submit(_frames(0)[None])  # stray batch dim
        # A valid request co-submitted with the rejects still succeeds.
        gloss, logits = server.submit(_frames(1)).result(timeout=60)
        assert logits.shape == (6,)
    finally:
        server.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        server.submit(_frames(0))


def test_serve_batch_buckets(rgb_model):
    """Bucketed padding (latency policy, VERDICT r4 item #7): a lone request
    pads to the smallest bucket, not max_batch; results still match the
    one-shot predict; bucket list is normalized (sorted, max appended)."""
    server = PredictServer(rgb_model, max_batch=8, max_delay_ms=5,
                           batch_buckets=(4, 1))
    try:
        assert server.batch_buckets == (1, 4, 8)
        assert server._bucket_for(1) == 1
        assert server._bucket_for(2) == 4
        assert server._bucket_for(5) == 8
        assert server._bucket_for(99) == 8  # overfull collect clamps to max
        server.warm()  # compiles every bucket shape
        f = _frames(7)
        gloss, logits = server.submit(f).result(timeout=120)
        _, want = api.predict(rgb_model, f)
        np.testing.assert_allclose(logits, want, atol=2e-2)
        # One request through a bucketed server pads to bucket 1 → zero
        # padded slots, not max_batch-1.
        assert server.stats.padded_slots == 0
    finally:
        server.shutdown()


def test_serve_bucket_validation(rgb_model):
    with pytest.raises(ValueError):
        PredictServer(rgb_model, max_batch=4, batch_buckets=(0, 4))
