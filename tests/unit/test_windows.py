"""Continuous-video recognition (asltpu.windows): window planning, the
segment-merge post-processor, the probe, and the full lane — API and CLI —
over a long synthetic video with a tiny real model."""

import json
import types

import numpy as np
import pytest

from asltpu.windows import (
    GlossSegment,
    WindowPrediction,
    enumerate_windows,
    merge_windows,
    predict_windows,
    segments_json,
)


# ---------------------------------------------------------------- planning

def test_enumerate_windows_exact_tiling():
    # 40 frames, window 16, stride 8: starts 1,9,17,25 — last ends at 40.
    assert enumerate_windows(40, 16, 8) == [
        (1, 16), (9, 24), (17, 32), (25, 40)]


def test_enumerate_windows_tail_clamped_not_truncated():
    # 42 frames: the tail window is clamped to END at 42 with FULL length
    # (27..42), never truncated short.
    spans = enumerate_windows(42, 16, 8)
    assert spans[-1] == (27, 42)
    assert all(e - s + 1 == 16 for s, e in spans)
    assert spans[-1][1] == 42


def test_enumerate_windows_short_video_single_window():
    assert enumerate_windows(10, 16, 8) == [(1, 10)]
    assert enumerate_windows(1, 16, 8) == [(1, 1)]
    assert enumerate_windows(0, 16, 8) == []


def test_enumerate_windows_stride_larger_than_window():
    # Gappy sampling is legal (downsampled timeline); tail still covered.
    spans = enumerate_windows(50, 10, 20)
    assert spans == [(1, 10), (21, 30), (41, 50)]


def test_enumerate_windows_invalid():
    with pytest.raises(ValueError):
        enumerate_windows(10, 0, 5)
    with pytest.raises(ValueError):
        enumerate_windows(10, 5, 0)


# ------------------------------------------------------------------ merge

def _win(i, gid, prob, *, fps=25.0, w=16, stride=8):
    s = 1 + i * stride
    e = s + w - 1
    return WindowPrediction(
        index=i, start_frame=s, end_frame=e,
        start_s=(s - 1) / fps, end_s=e / fps,
        gloss_id=gid, gloss=f"g{gid}", prob=prob,
    )


def test_merge_windows_runs_and_spans():
    wins = [_win(0, 2, 0.9), _win(1, 2, 0.8), _win(2, 5, 0.7)]
    segs = merge_windows(wins)
    assert [s.gloss_id for s in segs] == [2, 5]
    a, b = segs
    # Span union of the run's (overlapping) windows; times follow frames.
    assert (a.start_frame, a.end_frame) == (1, 24)
    assert (b.start_frame, b.end_frame) == (17, 32)
    assert a.num_windows == 2 and b.num_windows == 1
    assert a.mean_prob == pytest.approx(0.85)
    assert a.start_s == 0.0 and a.end_s == pytest.approx(24 / 25)
    # Segments tile the predicted timeline end to end.
    assert a.start_frame == wins[0].start_frame
    assert b.end_frame == wins[-1].end_frame


def test_merge_windows_min_prob_pools_uncertain():
    wins = [_win(0, 1, 0.9), _win(1, 1, 0.2), _win(2, 3, 0.1),
            _win(3, 3, 0.95)]
    segs = merge_windows(wins, min_prob=0.5)
    # Low-prob windows of DIFFERENT argmaxes pool into one uncertain run.
    assert [(s.gloss_id, s.gloss) for s in segs] == [
        (1, "g1"), (-1, None), (3, "g3")]
    assert segs[1].num_windows == 2
    # Nothing dropped: window counts are conserved.
    assert sum(s.num_windows for s in segs) == len(wins)


def test_merge_windows_empty():
    assert merge_windows([]) == []


def test_segments_json_shape():
    segs = merge_windows([_win(0, 1, 0.9)])
    (row,) = segments_json(segs)
    assert row == {
        "gloss": "g1", "gloss_id": 1, "start_s": 0.0,
        "end_s": round(16 / 25, 3), "start_frame": 1, "end_frame": 16,
        "num_windows": 1, "mean_prob": 0.9,
    }
    assert json.dumps(row)  # wire-serializable


# ------------------------------------------------------------------ probe

def test_probe_video(tmp_path):
    from asltpu.data.decode import probe_video
    from asltpu.data.synthetic import write_video

    p = str(tmp_path / "long.mp4")
    write_video(p, num_frames=40, size=(48, 48), fps=25)
    total, fps = probe_video(p)
    assert total == 40
    assert fps == pytest.approx(25.0)


def test_probe_video_missing(tmp_path):
    from asltpu.data.decode import probe_video

    with pytest.raises(IOError):
        probe_video(str(tmp_path / "nope.mp4"))


# ------------------------------------------------------------- full lane

@pytest.fixture(scope="module")
def long_video(tmp_path_factory):
    from asltpu.data.synthetic import write_video

    p = str(tmp_path_factory.mktemp("cont") / "session.mp4")
    write_video(p, num_frames=40, size=(64, 64), fps=25)
    return p


@pytest.fixture(scope="module")
def small_rgb_model():
    from asltpu import api

    return api.load_model(
        "mobilenet_gru", num_classes=6, gru_hidden=16,
        preprocess={"num_frames": 4, "staging_size": (48, 48),
                    "resize_short": 40, "crop": 32},
    )


def test_predict_windows_end_to_end(long_video, small_rgb_model):
    wins = predict_windows(
        small_rgb_model, long_video, window_frames=16, stride_frames=8,
        batch_size=2,
    )
    assert [w.index for w in wins] == [0, 1, 2, 3]
    assert [(w.start_frame, w.end_frame) for w in wins] == [
        (1, 16), (9, 24), (17, 32), (25, 40)]
    for w in wins:
        assert 0.0 < w.prob <= 1.0
        assert 0 <= w.gloss_id < 6
        # No gloss_names given → the display gloss is the raw class id
        # (the gloss_label contract shared with predict/stream_predict).
        assert w.gloss == w.gloss_id
        assert w.end_s > w.start_s >= 0.0
    segs = merge_windows(wins)
    assert sum(s.num_windows for s in segs) == 4
    assert segs[0].start_frame == 1 and segs[-1].end_frame == 40


def test_predict_windows_seconds_units(long_video, small_rgb_model):
    # 0.64 s at 25 fps = 16 frames; default stride = half the window.
    wins = predict_windows(
        small_rgb_model, long_video, window_seconds=0.64, batch_size=2,
    )
    assert [(w.start_frame, w.end_frame) for w in wins] == [
        (1, 16), (9, 24), (17, 32), (25, 40)]
    # Deterministic vs the frames-unit call on the same decode path.
    again = predict_windows(
        small_rgb_model, long_video, window_frames=16, stride_frames=8,
        batch_size=2,
    )
    assert [w.gloss_id for w in wins] == [w.gloss_id for w in again]
    np.testing.assert_allclose(
        [w.prob for w in wins], [w.prob for w in again], rtol=1e-5)


@pytest.fixture(scope="module")
def small_pose_model():
    from asltpu import api

    return api.load_model("pose_bilstm", num_classes=6, hidden_size=16,
                          num_frames=4)


def test_predict_windows_landmarks_end_to_end(small_pose_model):
    from asltpu.data.synthetic import synthetic_landmarks
    from asltpu.windows import predict_windows_landmarks

    stream = synthetic_landmarks(1, 40, seed=2)[0]  # [40, 543, 3] session
    wins = predict_windows_landmarks(
        small_pose_model, stream, 25.0, window_frames=16, stride_frames=8,
        batch_size=3,  # 4 windows → a full batch + a padded remainder
    )
    assert [(w.start_frame, w.end_frame) for w in wins] == [
        (1, 16), (9, 24), (17, 32), (25, 40)]
    for w in wins:
        assert 0.0 < w.prob <= 1.0 and w.gloss == w.gloss_id
        assert w.end_s == pytest.approx(w.start_s + 16 / 25)
    # The padded remainder row must not leak: same result at batch 4.
    again = predict_windows_landmarks(
        small_pose_model, stream, 25.0, window_frames=16, stride_frames=8,
        batch_size=4)
    np.testing.assert_allclose([w.prob for w in wins],
                               [w.prob for w in again], rtol=1e-5)
    assert [w.gloss_id for w in wins] == [w.gloss_id for w in again]
    segs = merge_windows(wins)
    assert sum(s.num_windows for s in segs) == 4


def test_predict_windows_landmarks_validation(small_pose_model,
                                              small_rgb_model):
    from asltpu.windows import predict_windows_landmarks

    stream = np.zeros((20, 543, 3), np.float32)
    with pytest.raises(ValueError, match="pose-only"):
        predict_windows_landmarks(small_rgb_model, stream, 25.0,
                                  window_frames=8)
    with pytest.raises(ValueError, match="543"):
        predict_windows_landmarks(small_pose_model,
                                  np.zeros((20, 10, 3), np.float32),
                                  25.0, window_frames=8)
    with pytest.raises(ValueError, match="fps"):
        predict_windows_landmarks(small_pose_model, stream, 0.0,
                                  window_frames=8)


@pytest.fixture(scope="module")
def small_fusion_model():
    from asltpu import api

    return api.load_model(
        "two_stream", num_classes=6, num_frames=4, d_model=32,
        preprocess={"num_frames": 4, "staging_size": (48, 48),
                    "resize_short": 40, "crop": 32},
    )


def test_predict_windows_fusion_with_landmark_stream(long_video,
                                                     small_fusion_model):
    """Fusion windows: the RGB windows decode from the video while each
    window slices its span of the aligned landmark stream — both resampled
    with the same uniform sampling, so the two streams stay temporally
    aligned per window."""
    from asltpu.data.synthetic import synthetic_landmarks

    stream = synthetic_landmarks(1, 40, seed=4)[0]  # 1:1 with the video
    wins = predict_windows(
        small_fusion_model, long_video, window_frames=16, stride_frames=8,
        batch_size=2, landmark_stream=stream,
    )
    assert [(w.start_frame, w.end_frame) for w in wins] == [
        (1, 16), (9, 24), (17, 32), (25, 40)]
    for w in wins:
        assert 0.0 < w.prob <= 1.0
    # The landmark slices MATTER: a different stream changes the logits.
    other = predict_windows(
        small_fusion_model, long_video, window_frames=16, stride_frames=8,
        batch_size=2, landmark_stream=synthetic_landmarks(1, 40, seed=9)[0],
    )
    assert any(abs(a.prob - b.prob) > 1e-6 for a, b in zip(wins, other))


def test_predict_windows_fusion_validation(long_video, small_fusion_model):
    with pytest.raises(ValueError, match="landmark_stream"):
        predict_windows(small_fusion_model, long_video, window_frames=16)
    with pytest.raises(ValueError, match="543"):
        predict_windows(small_fusion_model, long_video, window_frames=16,
                        landmark_stream=np.zeros((40, 5, 3), np.float32))
    # A stream SHORTER than the video must fail fast (a silent slice would
    # misalign every window past the stream's end), and it must fail
    # BEFORE any window decodes/predicts.
    with pytest.raises(ValueError, match="must cover every video frame"):
        predict_windows(small_fusion_model, long_video, window_frames=16,
                        landmark_stream=np.zeros((39, 543, 3), np.float32))


def test_predict_windows_rejects_pose_only_models():
    stub = types.SimpleNamespace(takes_landmarks=True, takes_rgb=False,
                                 cfg=object())
    with pytest.raises(ValueError, match="predict_windows_landmarks"):
        predict_windows(stub, "x.mp4", window_seconds=2.0)


def test_predict_windows_arg_validation(small_rgb_model, long_video):
    with pytest.raises(ValueError, match="exactly one"):
        predict_windows(small_rgb_model, long_video)
    with pytest.raises(ValueError, match="exactly one"):
        predict_windows(small_rgb_model, long_video,
                        window_seconds=1.0, window_frames=8)
    with pytest.raises(ValueError, match="at most one"):
        predict_windows(small_rgb_model, long_video, window_frames=8,
                        stride_seconds=0.5, stride_frames=4)


# --------------------------------------------------------------------- CLI

def test_cli_predict_windows(capsys, long_video):
    from asltpu.cli.main import main

    rc = main([
        "predict", long_video, "--windows", "0.64", "--min-prob", "0.3",
        "--model", "mobilenet_gru", "--num-classes", "6", "--batch", "2",
        "--set", "gru_hidden=16", "--set", "preprocess.num_frames=4",
        "--set", "preprocess.staging_size=(48,48)",
        "--set", "preprocess.resize_short=40",
        "--set", "preprocess.crop=32",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    (row,) = [json.loads(l) for l in out.splitlines() if l.strip()]
    assert row["clip"] == long_video
    assert len(row["windows"]) == 4
    assert sum(s["num_windows"] for s in row["segments"]) == 4
    for seg in row["segments"]:
        # min_prob windows become explicit uncertain segments, never drops.
        assert (seg["gloss"] is None) == (seg["gloss_id"] == -1)


def test_cli_windows_fusion(capsys, long_video, tmp_path):
    from asltpu.cli.main import main
    from asltpu.data.synthetic import synthetic_landmarks

    stream_npy = str(tmp_path / "stream.npy")
    np.save(stream_npy, synthetic_landmarks(1, 40, seed=4)[0])
    rc = main([
        "predict", long_video, "--windows", "0.64",
        "--landmarks-stream", stream_npy,
        "--model", "two_stream", "--num-classes", "6", "--batch", "2",
        "--set", "num_frames=4", "--set", "d_model=32",
        "--set", "preprocess.num_frames=4",
        "--set", "preprocess.staging_size=(48,48)",
        "--set", "preprocess.resize_short=40",
        "--set", "preprocess.crop=32",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    (row,) = [json.loads(l) for l in out.splitlines() if l.strip()]
    assert len(row["windows"]) == 4


def test_cli_windows_validation(long_video, tmp_path):
    from asltpu.cli.main import main

    # Landmark families fail BEFORE any model build.
    with pytest.raises(SystemExit, match="landmark stream"):
        main(["predict", long_video, "--windows", "2.0",
              "--model", "pose_bilstm"])
    with pytest.raises(SystemExit, match="landmarks-stream"):
        main(["predict", long_video, "--windows", "2.0",
              "--model", "two_stream"])
    with pytest.raises(SystemExit, match="positive"):
        main(["predict", long_video, "--windows", "-1",
              "--model", "mobilenet_gru"])
    # --exported is the single-clip artifact lane; --windows contradicts it.
    with pytest.raises(SystemExit, match="windows"):
        main(["predict", long_video, "--windows", "2.0",
              "--exported", str(tmp_path)])
