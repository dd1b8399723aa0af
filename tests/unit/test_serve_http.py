"""HTTP serving front-end: real requests over a socket."""

import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from asltpu import api
from asltpu.data.synthetic import synthetic_landmarks, write_video
from asltpu.serve_http import serve


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    model = api.load_model(
        "mobilenet_gru", num_classes=6, gru_hidden=32,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    httpd, predictor = serve(
        model, host="127.0.0.1", port=0, max_batch=4, max_delay_ms=5,
        gloss_names=[f"g{i}" for i in range(6)], block=False,
    )
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, model
    httpd.shutdown()
    predictor.shutdown()


def test_healthz_and_stats(http_server):
    base, _ = http_server
    code, body = _get(base + "/healthz")
    assert code == 200 and body["status"] == "ok"
    code, body = _get(base + "/stats")
    assert code == 200 and "requests" in body


def test_predict_video_roundtrip(http_server, tmp_path):
    base, model = http_server
    path = str(tmp_path / "clip.mp4")
    write_video(path, num_frames=12, size=(96, 96), seed=3)
    code, body = _post(base + "/predict", open(path, "rb").read())
    assert code == 200
    assert body["gloss"].startswith("g")
    assert len(body["top5"]) == 5
    # Must match the library path.
    clip = api.load_clip(path, model.cfg.preprocess)
    gloss, _ = api.predict(model, clip,
                           gloss_names=[f"g{i}" for i in range(6)])
    assert body["gloss"] == gloss


def test_predict_bad_inputs(http_server):
    base, _ = http_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"not a video at all")
    assert e.value.code == 500  # decode failure surfaces as server error
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict", b"")
    assert e.value.code == 400  # empty body rejected early
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict_landmarks", b"junk")
    assert e.value.code in (400, 500)  # wrong model for landmarks


def test_predict_windows_endpoint(http_server, tmp_path):
    base, model = http_server
    path = str(tmp_path / "session.mp4")
    write_video(path, num_frames=40, size=(96, 96), fps=25, seed=7)
    code, body = _post(
        base + "/predict_windows?window_s=0.64&min_prob=0.3",
        open(path, "rb").read(),
    )
    assert code == 200
    # 40 frames at 25 fps, 0.64 s window (16f), default half stride (8f)
    # → 4 windows; segments tile them (uncertain pooled, nothing dropped).
    assert body["num_windows"] == 4
    assert len(body["windows"]) == 4
    assert sum(s["num_windows"] for s in body["segments"]) == 4
    for seg in body["segments"]:
        assert (seg["gloss"] is None) == (seg["gloss_id"] == -1)
    # The served lane must agree with the library lane per window.
    from asltpu.windows import predict_windows

    wins = predict_windows(model, path, window_frames=16, stride_frames=8,
                           batch_size=4)
    assert [w["gloss"] for w in body["windows"]] == [
        f"g{w.gloss_id}" for w in wins]
    np.testing.assert_allclose(
        [w["prob"] for w in body["windows"]],
        [w.prob for w in wins], atol=2e-3)


def test_predict_windows_validation(http_server, tmp_path):
    base, _ = http_server
    path = str(tmp_path / "c.mp4")
    write_video(path, num_frames=12, size=(96, 96), seed=1)
    data = open(path, "rb").read()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict_windows", data)  # window_s missing
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict_windows?window_s=nope", data)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict_windows?window_s=1.0&stride_s=0", data)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/predict_windows?window_s=1.0", b"not a video")
    assert e.value.code == 500  # decode failure surfaces as server error


def test_landmarks_endpoint(tmp_path):
    model = api.load_model("pose_bilstm", num_classes=6, hidden_size=16,
                           num_frames=8)
    httpd, predictor = serve(
        model, host="127.0.0.1", port=0, max_batch=2, max_delay_ms=5,
        block=False,
    )
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        lm = synthetic_landmarks(1, 20, seed=1)[0]  # resampled to 8 in-server
        buf = io.BytesIO()
        np.save(buf, lm)
        code, body = _post(base + "/predict_landmarks", buf.getvalue())
        assert code == 200 and isinstance(body["gloss"], int)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/predict", b"whatever")
        assert e.value.code == 400  # RGB endpoint on a pose model

        # Continuous pose stream: 40-frame session, 16f windows, stride 8
        # → 4 windows, agreeing with the library lane.
        stream = synthetic_landmarks(1, 40, seed=5)[0]
        buf = io.BytesIO()
        np.save(buf, stream)
        code, body = _post(
            base + "/predict_windows_landmarks?window_s=0.64&fps=25",
            buf.getvalue(),
        )
        assert code == 200 and body["num_windows"] == 4
        assert sum(s["num_windows"] for s in body["segments"]) == 4
        from asltpu.windows import predict_windows_landmarks

        wins = predict_windows_landmarks(
            model, stream, 25.0, window_frames=16, stride_frames=8,
            batch_size=2)
        assert [w["gloss"] for w in body["windows"]] == [
            w.gloss_id for w in wins]
        np.testing.assert_allclose(
            [w["prob"] for w in body["windows"]],
            [w.prob for w in wins], atol=2e-3)
        # Video-windows endpoint on a pose model → 400 with a pointer.
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/predict_windows?window_s=1.0", b"x")
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        predictor.shutdown()


def test_http_concurrent_clients_batch(http_server, tmp_path):
    """Concurrent HTTP clients must be dynamically batched on the device."""
    import threading

    base, _ = http_server
    path = str(tmp_path / "cc.mp4")
    write_video(path, num_frames=10, size=(80, 80), seed=9)
    data = open(path, "rb").read()
    results = {}

    def client(i):
        results[i] = _post(base + "/predict", data)

    # Warm the compile first so all 6 land in the same batching window.
    _post(base + "/predict", data)
    code, before = _get(base + "/stats")
    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(code == 200 for code, _ in results.values())
    code, after = _get(base + "/stats")
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == 6
    assert new_batches < 6  # at least one multi-request batch formed


def test_fusion_endpoint(tmp_path):
    """Config #5 over HTTP: two-part body (8-byte BE video length + video
    bytes + .npy landmarks) → fusion prediction."""
    model = api.load_model(
        "two_stream", num_classes=6, d_model=32, num_frames=4,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    httpd, predictor = serve(
        model, host="127.0.0.1", port=0, max_batch=2, max_delay_ms=5,
        gloss_names=[f"g{i}" for i in range(6)], block=False,
    )
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        path = str(tmp_path / "f.mp4")
        write_video(path, num_frames=10, size=(96, 96), seed=5)
        video = open(path, "rb").read()
        lm = synthetic_landmarks(1, 12, seed=2)[0]
        buf = io.BytesIO()
        np.save(buf, lm)
        body = len(video).to_bytes(8, "big") + video + buf.getvalue()
        code, resp = _post(base + "/predict_fusion", body)
        assert code == 200
        assert resp["gloss"].startswith("g")
        assert len(resp["top5"]) == 5
        # Must match the library path (same video + landmarks).
        clip = api.load_clip(path, model.cfg.preprocess)
        from asltpu.ops.preprocess import uniform_sample_indices

        lm4 = lm[uniform_sample_indices(lm.shape[0], 4)].astype(np.float32)
        gloss, _ = api.predict(model, clip, landmarks=lm4,
                               gloss_names=[f"g{i}" for i in range(6)])
        assert resp["gloss"] == gloss
        # Plain /predict on a fusion model → 400 pointing at /predict_fusion
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/predict", video)
        assert e.value.code == 400
        # Bad length prefix → 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/predict_fusion",
                  (10 ** 12).to_bytes(8, "big") + b"xx")
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        predictor.shutdown()


def test_fusion_endpoint_stale_mirror_num_frames(tmp_path):
    """A DIRECTLY-constructed fusion config (bypassing get_config's sync)
    can carry a stale top-level num_frames mirror. The HTTP landmark
    resample must follow the same T source PredictServer validates against
    (preprocess.num_frames) — with the old cfg.num_frames derivation every
    fusion request on such a config was resampled to the wrong T and
    rejected with 400."""
    from asltpu.api import Model, build_module, init_variables
    from asltpu.config import PreprocessConfig, TwoStreamFusionConfig

    cfg = TwoStreamFusionConfig(
        num_classes=4, d_model=32, num_heads=2, num_fusion_layers=1,
        preprocess=PreprocessConfig(num_frames=8, staging_size=(64, 64),
                                    resize_short=56, crop=48),
    )  # mirror num_frames stays at the dataclass default (16) — stale
    assert cfg.num_frames != cfg.preprocess.num_frames
    module = build_module(cfg)
    model = Model(cfg=cfg, module=module,
                  variables=init_variables(module, cfg))
    httpd, predictor = serve(
        model, host="127.0.0.1", port=0, max_batch=2, max_delay_ms=5,
        block=False,
    )
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        path = str(tmp_path / "s.mp4")
        write_video(path, num_frames=12, size=(96, 96), seed=11)
        video = open(path, "rb").read()
        lm = synthetic_landmarks(1, 20, seed=3)[0]  # T=20 → resample to 8
        buf = io.BytesIO()
        np.save(buf, lm)
        body = len(video).to_bytes(8, "big") + video + buf.getvalue()
        code, resp = _post(base + "/predict_fusion", body)
        assert code == 200
        assert isinstance(resp["gloss"], int)
    finally:
        httpd.shutdown()
        predictor.shutdown()
