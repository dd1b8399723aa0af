"""Data layer: synthetic fixtures, decode, WLASL index, prefetcher."""

import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.data.decode import DecodePool, decode_clip
from asltpu.data.prefetch import Prefetcher
from asltpu.data.synthetic import write_video
from asltpu.data.wlasl import WLASLIndex, batches_from_records


def test_decode_sampled_frames(tmp_path):
    path = str(tmp_path / "clip.mp4")
    raw = write_video(path, num_frames=24, size=(96, 112), seed=0)
    cfg = PreprocessConfig(num_frames=8, staging_size=(64, 64))
    frames = decode_clip(path, cfg)
    assert frames.shape == (8, 64, 64, 3)
    assert frames.dtype == np.uint8
    # Decoded content must resemble the encoded source (codec is lossy but
    # the synthetic gradients are codec-friendly): compare frame 0 means.
    import cv2

    want = cv2.resize(raw[1], (64, 64))  # sample idx 0 of 24→8 is frame 1
    got = frames[0].astype(np.float32)
    assert abs(got.mean() - want.astype(np.float32).mean()) < 6.0


def test_decode_more_frames_than_video(tmp_path):
    path = str(tmp_path / "short.mp4")
    write_video(path, num_frames=5, size=(64, 64), seed=1)
    cfg = PreprocessConfig(num_frames=16, staging_size=(64, 64))
    frames = decode_clip(path, cfg)
    assert frames.shape == (16, 64, 64, 3)


def test_wlasl_index_and_splits(tiny_wlasl):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    # Synthetic index has 6 glosses; subset=100 keeps them all.
    assert ds.num_classes == 100
    assert len(ds.glosses) == 6
    train = ds.split("train")
    test = ds.split("test")
    assert len(train) == 6 and len(test) == 6
    assert all(r.path for r in train)
    assert ds.label_name(train[0].label) == train[0].gloss


def test_batches_from_records(tiny_wlasl):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    recs = ds.split("train")
    batches = batches_from_records(recs, 4, seed=0, epochs=2)
    got = list(batches)
    assert len(got) == 2  # 6 records → one batch of 4 per epoch (drop rem.)
    assert all(len(b) == 4 for b in got)


def test_decode_pool_batches(tiny_wlasl):
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=100)
    paths = [r.path for r in ds.split("train")]
    cfg = PreprocessConfig(num_frames=4, staging_size=(64, 64))
    pool = DecodePool(cfg, num_workers=2)
    out = list(pool.map_batches(paths, batch_size=4))
    pool.shutdown()
    assert len(out) == 2
    (b1, k1), (b2, k2) = out
    assert b1.shape == (4, 4, 64, 64, 3) and k1 == [0, 1, 2, 3]
    assert b2.shape == (4, 4, 64, 64, 3) and k2 == [4, 5]  # padded


def test_prefetcher_order_and_error():
    items = [np.full((2, 2), i, np.float32) for i in range(5)]
    got = [np.asarray(x)[0, 0] for x in Prefetcher(iter(items), depth=2)]
    assert got == [0, 1, 2, 3, 4]

    def bad():
        yield items[0]
        raise RuntimeError("decode failed")

    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        list(Prefetcher(bad(), depth=2))


def test_prefetcher_deterministic_mode():
    items = [np.ones((2,)) * i for i in range(3)]
    got = [float(np.asarray(x)[0]) for x in Prefetcher(iter(items), deterministic=True)]
    assert got == [0.0, 1.0, 2.0]


def test_decode_frame_segment(tmp_path):
    """frame_start/frame_end restrict sampling to the WLASL segment."""
    import cv2

    path = str(tmp_path / "seg.mp4")
    # 30 frames; frame t is a flat image of value ~ t*8 (codec-friendly).
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    for t in range(30):
        w.write(np.full((64, 64, 3), min(t * 8, 255), np.uint8))
    w.release()
    from asltpu.data.decode import decode_sampled_frames

    frames = decode_sampled_frames(
        path, 4, (64, 64), frame_start=11, frame_end=20
    )
    # Segment frames 10..19 (0-based) → values ≈ 80..152.
    means = frames.mean(axis=(1, 2, 3))
    assert means.min() > 80 - 15 and means.max() < 152 + 15, means
    full = decode_sampled_frames(path, 4, (64, 64))
    assert full.mean(axis=(1, 2, 3)).max() > 180  # full video reaches ~232


def test_decode_bbox_crop(tmp_path):
    """bbox selects the signer region before staging."""
    import cv2

    path = str(tmp_path / "bbox.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (128, 128))
    for _ in range(8):
        img = np.zeros((128, 128, 3), np.uint8)
        img[:64, :64] = 220  # bright top-left quadrant
        w.write(img)
    w.release()
    from asltpu.data.decode import decode_sampled_frames

    bright = decode_sampled_frames(path, 2, (64, 64), bbox=(0, 0, 64, 64))
    dark = decode_sampled_frames(path, 2, (64, 64), bbox=(64, 64, 128, 128))
    assert bright.mean() > 180 and dark.mean() < 40


def test_wlasl_record_segment_fields(tmp_path):
    import json

    from asltpu.data.synthetic import write_video

    video_dir = tmp_path / "v"
    video_dir.mkdir()
    write_video(str(video_dir / "00001.mp4"), num_frames=10, size=(64, 64))
    index = [{"gloss": "hello", "instances": [
        {"video_id": "00001", "split": "train", "frame_start": 3,
         "frame_end": 8, "bbox": [1, 2, 50, 60]}]}]
    ip = tmp_path / "idx.json"
    ip.write_text(json.dumps(index))
    ds = WLASLIndex(str(ip), str(video_dir), subset=1)
    rec = ds.split("train")[0]
    assert (rec.frame_start, rec.frame_end) == (3, 8)
    assert rec.bbox == (1, 2, 50, 60)
    from asltpu.data.decode import decode_record
    from asltpu.config import PreprocessConfig

    frames = decode_record(rec, PreprocessConfig(num_frames=4,
                                                 staging_size=(64, 64)))
    assert frames.shape == (4, 64, 64, 3)


def test_decode_seek_matches_sequential(tmp_path):
    """Seek-based segment decode must return the same frames as sequential
    decode (content check on a brightness ramp deep in the video)."""
    import cv2

    path = str(tmp_path / "long.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    for t in range(120):
        w.write(np.full((64, 64, 3), min(t * 2, 255), np.uint8))
    w.release()
    from asltpu.data.decode import decode_sampled_frames

    # Segment frames 80..100 (0-based 79..99): values ≈ 158..198.
    frames = decode_sampled_frames(
        path, 4, (64, 64), frame_start=80, frame_end=100
    )
    means = frames.mean(axis=(1, 2, 3))
    assert means.min() > 140 and means.max() < 215, means
    assert (np.diff(means) >= -3).all()  # monotone ramp preserved


def test_decode_pool_skip_errors(tmp_path, tiny_wlasl):
    """on_error='skip' drops undecodable clips; stream_predict(skip_errors)
    yields results for the good ones only."""
    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=6)
    good = [r.path for r in ds.split("train")][:3]
    bad = str(tmp_path / "corrupt.mp4")
    open(bad, "wb").write(b"not a video")
    paths = [good[0], bad, good[1], good[2]]
    cfg = PreprocessConfig(num_frames=4, staging_size=(64, 64))
    pool = DecodePool(cfg, num_workers=2)

    import pytest

    with pytest.raises(Exception):
        list(pool.map_batches(paths, batch_size=2))  # default raises
    out = list(pool.map_batches(paths, batch_size=2, on_error="skip"))
    pool.shutdown()
    kept = [k for _, ks in out for k in ks]
    assert kept == [0, 2, 3]  # index 1 (corrupt) skipped


def test_stream_predict_skip_errors(tmp_path, tiny_wlasl):
    from asltpu import api

    index, videos = tiny_wlasl
    ds = WLASLIndex(index, videos, subset=6)
    good = [r.path for r in ds.split("train")][:2]
    bad = str(tmp_path / "corrupt2.mp4")
    open(bad, "wb").write(b"junk")
    model = api.load_model(
        "mobilenet_gru", num_classes=6, gru_hidden=32,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    results = list(api.stream_predict(
        model, [good[0], bad, good[1]], batch_size=2, skip_errors=True,
    ))
    assert [p for p, _, _ in results] == [good[0], good[1]]


def test_prefetcher_sentinel_reaches_slow_consumer():
    """The end-sentinel must arrive even when the queue was full while the
    worker finished (regression: a dropped sentinel hangs the consumer)."""
    import time

    from asltpu.data.prefetch import Prefetcher

    def gen():
        for i in range(4):
            yield np.full((2, 2), i, np.float32)

    pf = Prefetcher(gen(), depth=2)
    time.sleep(0.3)  # let the worker fill the queue and try to finish
    got = list(pf)
    assert len(got) == 4


def test_prefetcher_close_unblocks_worker():
    """close() must stop a worker blocked in q.put and join the thread."""
    from asltpu.data.prefetch import Prefetcher

    def gen():
        i = 0
        while True:  # endless producer
            yield np.full((2, 2), i, np.float32)
            i += 1

    pf = Prefetcher(gen(), depth=2)
    it = iter(pf)
    next(it)  # consume one, then abandon
    pf.close()
    assert not pf._thread.is_alive()
    pf.close()  # idempotent


def test_packed_device_put_roundtrip():
    """packed_device_put must reproduce the tree exactly (values, shapes,
    dtypes, including scalars and mixed dtypes)."""
    import jax

    from asltpu.api import packed_device_put

    rng = np.random.default_rng(0)
    tree = {
        "a": rng.normal(size=(3, 4)).astype(np.float32),
        "b": {"c": rng.normal(size=(2, 2, 2)).astype(np.float32),
              "d": np.int32(7),
              "e": rng.integers(0, 9, (5,)).astype(np.int32)},
        "f": [rng.normal(size=(1,)).astype(np.float32),
              np.float32(3.5), rng.normal(size=(8,)).astype(np.float32)],
        # Zero-size leaves: nothing to slice from the packed buffer — they
        # must materialize directly instead of failing the unpack reshape.
        "g": np.zeros((0, 4), np.float32),
    }
    out = packed_device_put(tree)
    flat_in, td_in = jax.tree.flatten(tree)
    flat_out, td_out = jax.tree.flatten(out)
    assert td_in == td_out
    for a, b in zip(flat_in, flat_out):
        a = np.asarray(a)
        b = np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a, b)


def test_decode_pool_processes_match_threads(tiny_wlasl):
    """Process decode workers must produce byte-identical staged frames to
    thread workers (same decode path, different executor)."""
    from asltpu.config import PreprocessConfig
    from asltpu.data.decode import DecodePool
    from asltpu.data.wlasl import WLASLIndex

    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:4]
    pp = PreprocessConfig(num_frames=4, staging_size=(64, 64))
    tp = DecodePool(pp, num_workers=2)
    pq = DecodePool(pp, num_workers=2, use_processes=True)
    try:
        (a, kept_a), = list(tp.map_batches(records, 4))
        (b, kept_b), = list(pq.map_batches(records, 4))
        assert kept_a == kept_b
        np.testing.assert_array_equal(a, b)
    finally:
        tp.shutdown()
        pq.shutdown()


def test_preprocess_config_rejects_nonpositive_num_frames():
    """Central guard: the native decoders' C ABI builds a sampling plan
    from num_frames, and num_frames <= 0 used to reach undefined behavior
    there (empty want-list back()). The config now fails at construction."""
    import pytest

    with pytest.raises(ValueError, match="num_frames"):
        PreprocessConfig(num_frames=0)
    with pytest.raises(ValueError, match="num_frames"):
        PreprocessConfig(num_frames=-3)


def test_make_decode_pool_rejects_unknown_backend_and_stray_fast_flags():
    """A typo'd backend must not silently run the slow thread pool, and
    fast_flags (av-only codec modes) must not be silently ignored."""
    import pytest

    from asltpu.data.decode import make_decode_pool

    cfg = PreprocessConfig(num_frames=4, staging_size=(64, 64))
    with pytest.raises(ValueError, match="unknown decode backend"):
        make_decode_pool(cfg, backend="AV")
    with pytest.raises(ValueError, match="fast_flags"):
        make_decode_pool(cfg, backend="thread", fast_flags=1)


def test_pad_to_batch():
    """The ONE shared pad implementation (asltpu/data/pad.py) — every
    compiled-batch lane pads through it (round-4 consolidation of ~6
    divergent copies; round 3 found a real bug in this idiom family)."""
    import pytest

    from asltpu.data.pad import pad_to_batch

    frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    out = pad_to_batch(frames, 5)
    assert out.shape == (5, 3, 4) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[2], frames[-1])  # repeated last row
    np.testing.assert_array_equal(out[4], frames[-1])
    np.testing.assert_array_equal(out[:2], frames)

    # Full batch: unchanged, and no copy made.
    assert pad_to_batch(frames, 2) is frames

    # Scalar fill (labels padded with -1 so eval masks the pad rows).
    labels = np.asarray([3, 1], np.int32)
    out = pad_to_batch(labels, 4, fill=-1)
    np.testing.assert_array_equal(out, [3, 1, -1, -1])
    assert out.dtype == np.int32

    # Landmark-shaped float rows pad identically to frames (the fusion
    # lanes pad both from one implementation).
    lms = np.random.default_rng(0).normal(size=(3, 5, 3)).astype(np.float32)
    out = pad_to_batch(lms, 4)
    np.testing.assert_array_equal(out[3], lms[-1])

    with pytest.raises(ValueError, match="empty"):
        pad_to_batch(np.zeros((0, 3)), 4)
    with pytest.raises(ValueError, match="more than"):
        pad_to_batch(np.zeros((5, 3)), 4)
    with pytest.raises(ValueError, match="fill"):
        pad_to_batch(frames, 4, fill="zeros")
    # Empty + scalar fill IS allowed (no row needed to repeat).
    out = pad_to_batch(np.zeros((0,), np.int32), 2, fill=-1)
    np.testing.assert_array_equal(out, [-1, -1])


def test_separable_grid_signal_survives_encode(tmp_path):
    """The ≥50-class anchor task's generator (VERDICT r4 item #10): both
    class factors — base hue θ₀ and temporal hue-rotation rate ω — must be
    recoverable from the DECODED mp4 under the ``hard`` nuisance tier
    (white-balance gain, brightness offset, occluder, strong texture). A
    circular projection of per-frame mean color onto the three-phase hue
    basis estimates θ(t); its intercept/slope must match θ₀/ω to well
    under half a class bin (hue bins 2π/13 ≈ 0.483 rad apart, adjacent
    rates 0.17 rad/frame apart)."""
    import cv2

    from asltpu.data.synthetic import rate_wheel, write_separable_video

    rates = rate_wheel(4)
    np.testing.assert_allclose(rates, [-0.255, -0.085, 0.085, 0.255],
                               atol=1e-6)
    basis = np.exp(1j * np.array([0.0, -2 * np.pi / 3, 2 * np.pi / 3]))
    for hue_k, rate_k in [(0, 3), (6, 1), (12, 0)]:
        path = str(tmp_path / f"{hue_k}_{rate_k}.mp4")
        write_separable_video(
            path, gloss_id=hue_k, num_glosses=13, num_frames=24,
            size=(96, 96), seed=7 * hue_k + rate_k,
            hue_rate=float(rates[rate_k]), hard=True,
        )
        cap = cv2.VideoCapture(path)
        thetas = []
        while True:
            ok, fr = cap.read()
            if not ok:
                break
            m = fr[..., ::-1].reshape(-1, 3).astype(np.float64).mean(0)
            # conj: the basis projection runs clockwise in channel order.
            thetas.append(np.angle(np.conj((m * basis).sum())))
        cap.release()
        assert len(thetas) == 24
        th = np.unwrap(np.array(thetas))
        slope, intercept = np.polyfit(np.arange(24.0), th, 1)
        want0 = 2 * np.pi * hue_k / 13
        derr = np.angle(np.exp(1j * (intercept - want0)))
        assert abs(derr) < 0.12, (hue_k, rate_k, intercept, want0)
        assert abs(slope - rates[rate_k]) < 0.02, (slope, rates[rate_k])
