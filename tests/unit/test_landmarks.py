"""Landmark front-end (C4): store roundtrip/resampling, precompute pass,
pose-model streaming through the store, and the live MediaPipe lane driven
against an API-shaped fake (the package itself is absent in this image, so
the fake pins everything on OUR side of the boundary: per-frame process()
calls, block slicing, missing-detection zeros, dtype/shape contract)."""

import sys
import types

import numpy as np
import pytest

from asltpu.data.landmarks import (
    LandmarkStore,
    MediaPipeExtractor,
    SyntheticExtractor,
    precompute_landmarks,
)
from asltpu.data.synthetic import synthetic_landmarks
from asltpu.data.wlasl import WLASLIndex


def test_store_roundtrip_and_resample(tmp_path):
    store = LandmarkStore(str(tmp_path))
    lm = synthetic_landmarks(1, 40, seed=0)[0]  # [40, 543, 3]
    store.put("00042", lm)
    assert store.has("00042")
    got = store.get("00042")
    np.testing.assert_allclose(got, lm)
    sub = store.get("00042", num_frames=8)
    assert sub.shape == (8, 543, 3)
    np.testing.assert_allclose(sub[0], lm[2])  # center of first of 8 segments


def test_store_rejects_bad_shape(tmp_path):
    store = LandmarkStore(str(tmp_path))
    np.save(store.path_for("bad"), np.zeros((4, 10, 3)))
    with pytest.raises(ValueError, match="expected"):
        store.get("bad")


def test_precompute_landmarks(tmp_path, tiny_wlasl):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=6)
    store = LandmarkStore(str(tmp_path / "lm"))
    n = precompute_landmarks(
        ds.split("train"), store, SyntheticExtractor(num_frames=20),
        staging_size=(64, 64),
    )
    assert n == len(ds.split("train"))
    rec = ds.split("train")[0]
    assert store.get(rec.video_id, 8).shape == (8, 543, 3)
    # Idempotent without overwrite.
    assert precompute_landmarks(
        ds.split("train"), store, SyntheticExtractor(num_frames=20),
        staging_size=(64, 64),
    ) == 0


class _FakePoint:
    def __init__(self, x, y, z):
        self.x, self.y, self.z = x, y, z


class _FakeBlock:
    def __init__(self, n, base):
        self.landmark = [
            _FakePoint(base + k, base - k, 0.5) for k in range(n)
        ]


def _install_fake_mediapipe(monkeypatch, drop_hands_on_frame=1):
    """A `mediapipe` module shaped exactly like the Holistic API surface
    MediaPipeExtractor consumes: mp.solutions.holistic.Holistic(**kw)
    .process(frame) → result with {pose,face,left_hand,right_hand}_landmarks,
    each None or .landmark = [pt(.x,.y,.z), ...]. Deterministic per frame so
    the block mapping is assertable; records every call for verification."""
    calls = {"kwargs": None, "frames": []}

    class _FakeHolistic:
        def __init__(self, **kwargs):
            calls["kwargs"] = kwargs

        def process(self, frame):
            calls["frames"].append(np.asarray(frame).copy())
            i = len(calls["frames"]) - 1
            res = types.SimpleNamespace(
                pose_landmarks=_FakeBlock(33, float(i)),
                face_landmarks=_FakeBlock(468, float(i) + 0.25),
                left_hand_landmarks=_FakeBlock(21, float(i) + 0.5),
                right_hand_landmarks=_FakeBlock(21, float(i) + 0.75),
            )
            if i == drop_hands_on_frame:  # a frame with no hands detected
                res.left_hand_landmarks = None
                res.right_hand_landmarks = None
            return res

    mp = types.ModuleType("mediapipe")
    mp.solutions = types.SimpleNamespace(
        holistic=types.SimpleNamespace(Holistic=_FakeHolistic)
    )
    monkeypatch.setitem(sys.modules, "mediapipe", mp)
    return calls


def test_mediapipe_extractor_contract(monkeypatch):
    """Holistic-API conformance of the live lane: one process() per frame in
    order, kwargs forwarded, each result block written to its layout slice,
    missing detections left all-zero."""
    from asltpu.data.landmarks import (
        FACE_SLICE,
        LEFT_HAND_SLICE,
        POSE_SLICE,
        RIGHT_HAND_SLICE,
    )

    calls = _install_fake_mediapipe(monkeypatch, drop_hands_on_frame=1)
    ex = MediaPipeExtractor(model_complexity=1, refine_face_landmarks=False)
    assert calls["kwargs"] == {
        "model_complexity": 1, "refine_face_landmarks": False,
    }
    frames = np.arange(3 * 4 * 4 * 3, dtype=np.uint8).reshape(3, 4, 4, 3)
    lm = ex.extract(frames)
    assert lm.shape == (3, 543, 3) and lm.dtype == np.float32
    # process() saw exactly the RGB frames, in order.
    assert len(calls["frames"]) == 3
    np.testing.assert_array_equal(calls["frames"][2], frames[2])
    # Block mapping: frame 0 pose point k = (k, -k, 0.5) at POSE_SLICE.
    np.testing.assert_allclose(lm[0, POSE_SLICE][5], [5.0, -5.0, 0.5])
    np.testing.assert_allclose(
        lm[2, FACE_SLICE][7], [2.25 + 7, 2.25 - 7, 0.5]
    )
    np.testing.assert_allclose(
        lm[0, RIGHT_HAND_SLICE][0], [0.75, 0.75, 0.5]
    )
    # Frame 1 had no hand detections → those blocks stay zero, others don't.
    assert np.all(lm[1, LEFT_HAND_SLICE] == 0)
    assert np.all(lm[1, RIGHT_HAND_SLICE] == 0)
    assert np.any(lm[1, POSE_SLICE] != 0)


def test_mediapipe_precompute_into_store(monkeypatch, tmp_path, tiny_wlasl):
    """The dataset-prep pass runs end-to-end through the live lane (faked
    mediapipe) into the store, and the stored landmarks resample cleanly."""
    calls = _install_fake_mediapipe(monkeypatch, drop_hands_on_frame=-1)
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=6)
    store = LandmarkStore(str(tmp_path / "lm"))
    n = precompute_landmarks(
        ds.split("train"), store, MediaPipeExtractor(),
        staging_size=(64, 64),
    )
    assert n == len(ds.split("train")) and len(calls["frames"]) == 64 * n
    rec = ds.split("train")[0]
    assert store.get(rec.video_id, 8).shape == (8, 543, 3)


def test_mediapipe_clean_error_when_absent(monkeypatch):
    """Without the package, construction fails with the actionable message
    (not an ImportError surfacing from inside extract())."""
    monkeypatch.setitem(sys.modules, "mediapipe", None)
    with pytest.raises(RuntimeError, match="LandmarkStore"):
        MediaPipeExtractor()


def test_pose_stream_predict_via_store(tmp_path, tiny_wlasl):
    from asltpu import api

    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=6)
    store = LandmarkStore(str(tmp_path / "lm"))
    precompute_landmarks(
        ds.split("train"), store, SyntheticExtractor(num_frames=20),
        staging_size=(64, 64),
    )
    model = api.load_model("pose_bilstm", num_classes=6, hidden_size=16,
                           num_frames=8)
    paths = [r.path for r in ds.split("train")][:3]
    results = list(api.stream_predict(
        model, paths, batch_size=2,
        landmarks_for=store.for_path(8),
    ))
    assert len(results) == 3
    for _, _, lg in results:
        assert lg.shape == (6,) and np.isfinite(lg).all()


def test_normalize_landmarks_zeroes_frames_without_pose():
    """A frame whose pose block is missing (zeros) has no shoulder
    reference: the whole frame must zero out, not divide present face/hand
    rows by the epsilon-clamped scale (which scaled them ~1e4 and
    saturated every downstream gate)."""
    import jax.numpy as jnp
    import numpy as np

    from asltpu.models.bilstm import normalize_landmarks

    lm = np.random.default_rng(0).uniform(
        0.2, 0.8, size=(1, 3, 543, 3)
    ).astype(np.float32)
    lm[0, 1, :33] = 0.0  # frame 1: pose block missing, face/hands present
    out = np.asarray(normalize_landmarks(jnp.asarray(lm)))
    assert np.all(out[0, 1] == 0.0)
    # Frames with a valid pose keep bounded, recentered features.
    assert np.abs(out[0, 0]).max() < 50.0
    assert np.abs(out[0, 2]).max() < 50.0
