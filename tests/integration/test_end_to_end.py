"""Golden-clip integration tests (SURVEY.md §4.2): synthetic videos through
``load_clip → predict`` / ``stream_predict``; logits stable across refactors
(golden regenerated only on intentional model changes)."""

import numpy as np
import pytest

from asltpu import api
from asltpu.data.wlasl import WLASLIndex


@pytest.fixture(scope="module")
def small_model():
    # Tiny spatial shapes keep CPU compile fast; the architecture is real.
    return api.load_model(
        "mobilenet_gru",
        num_classes=6,
        gru_hidden=32,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )


def test_load_clip_predict(tiny_wlasl, small_model):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    rec = ds.split("train")[0]
    clip = api.load_clip(rec.path, small_model.cfg.preprocess)
    assert clip.shape == (4, 64, 64, 3)
    gloss, logits = api.predict(small_model, clip, gloss_names=ds.glosses)
    assert logits.shape == (6,)
    assert np.isfinite(logits).all()
    assert gloss in ds.glosses


def test_stream_predict_matches_single(tiny_wlasl, small_model):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    paths = [r.path for r in ds.split("train")][:5]
    streamed = {
        p: lg for p, _, lg in api.stream_predict(
            small_model, paths, batch_size=2, num_decode_workers=2
        )
    }
    assert set(streamed) == set(paths)
    # Batched/padded streaming must agree with one-at-a-time predict.
    for p in paths:
        clip = api.load_clip(p, small_model.cfg.preprocess)
        _, single = api.predict(small_model, clip)
        np.testing.assert_allclose(streamed[p], single, atol=2e-2)


def test_two_stream_end_to_end(tiny_wlasl):
    from asltpu.data.synthetic import synthetic_landmarks

    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    model = api.load_model(
        "two_stream",
        num_classes=6,
        num_frames=4,
        d_model=64,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    paths = [r.path for r in ds.split("train")][:3]
    lm_cache = {p: synthetic_landmarks(1, 4, seed=i)[0]
                for i, p in enumerate(paths)}
    results = list(api.stream_predict(
        model, paths, batch_size=2, num_decode_workers=2,
        landmarks_for=lambda p: lm_cache[p],
    ))
    assert len(results) == 3
    for _, _, lg in results:
        assert lg.shape == (6,) and np.isfinite(lg).all()
    # Fusion models without landmarks_for must fail UP FRONT — under
    # skip_errors=True the old per-clip TypeError was swallowed and the
    # stream decoded everything then yielded nothing.
    import pytest

    with pytest.raises(ValueError, match="landmarks_for"):
        list(api.stream_predict(model, paths, skip_errors=True))


def test_pose_bilstm_predict():
    from asltpu.data.synthetic import synthetic_landmarks

    model = api.load_model("pose_bilstm", num_classes=6, hidden_size=32,
                           num_frames=8)
    lm = synthetic_landmarks(1, 8, seed=0)[0]
    gloss, logits = api.predict(model, lm)
    assert logits.shape == (6,) and np.isfinite(logits).all()
