"""Landmark front-end (C4): store roundtrip/resampling, precompute pass,
pose-model streaming through the store."""

import numpy as np
import pytest

from asltpu.data.landmarks import (
    LandmarkStore,
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
