"""libav (ffmpeg-direct) decoder vs the cv2 oracle: tolerance parity and
contract conformance (C1 throughput backend, decode_av.cpp).

Unlike the OpenCV-backed native decoder (byte-identical, test_native_decode
.py), the av backend resamples the decoder's native YUV planes with
swscale — a different (equally valid) bilinear implementation — so parity
is TOLERANCE-based: staged frames must be visually identical (small mean
absolute difference, no structural offset) to the cv2 path, not
bit-identical.
"""

import dataclasses

import numpy as np
import pytest

from asltpu import native
from asltpu.config import PreprocessConfig
from asltpu.data.decode import NativeDecodePool, decode_sampled_frames, make_decode_pool
from asltpu.data.wlasl import WLASLIndex

pytestmark = pytest.mark.skipif(
    not native.av_available(),
    reason=f"native av decode: {native.av_unavailable_reason()}",
)

PP_RGB = PreprocessConfig(num_frames=4, staging_size=(64, 64))
PP_YUV = PreprocessConfig(num_frames=4, staging_size=(64, 64),
                          host_resize_short=72, staging_format="yuv420")
# host_resize_short == the fixture videos' short side (96): the resize plan
# is the identity, so staging takes decode_av.cpp's no-op fast path (direct
# plane crop, no swscale) — the headline-bench configuration in miniature.
PP_YUV_NOOP = PreprocessConfig(num_frames=4, staging_size=(64, 64),
                               host_resize_short=96, staging_format="yuv420")


def _mad(a, b):
    return float(np.mean(np.abs(a.astype(np.int32) - b.astype(np.int32))))


@pytest.mark.parametrize("pp", [PP_RGB, PP_YUV, PP_YUV_NOOP],
                         ids=["rgb", "yuv420", "yuv420_noop"])
def test_av_close_to_python_oracle(tiny_wlasl, pp):
    """Same frames sampled, staged output within tolerance of the cv2 path.

    Tolerance: mean abs diff ≤ 3/255 across the clip (resampler and
    YUV-round-trip differences are sub-quantization-noise; a wrong frame,
    crop offset, or plane-layout bug produces MAD in the tens)."""
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:4]
    for r in records:
        py = decode_sampled_frames(
            r.path, pp.num_frames, pp.staging_size, pp.host_resize_short,
            frame_start=r.frame_start, frame_end=r.frame_end, bbox=r.bbox,
            staging_format=pp.staging_format,
        )
        av = native.decode_clip_av(
            r.path, pp.num_frames, pp.staging_size, pp.host_resize_short,
            frame_start=r.frame_start, frame_end=r.frame_end, bbox=r.bbox,
            yuv420=pp.staging_format == "yuv420",
        )
        assert av.shape == py.shape and av.dtype == np.uint8
        assert _mad(py, av) <= 3.0, (
            f"av decode diverges from cv2 oracle for {r.path}: "
            f"MAD={_mad(py, av):.2f}"
        )


def test_av_segment_and_bbox(tiny_wlasl):
    """Frame segments and signer bbox crops honored (tolerance parity)."""
    index, videos = tiny_wlasl
    base = WLASLIndex(index, videos, subset=6).split("train")[0]
    rec = dataclasses.replace(base, frame_start=3, frame_end=10,
                              bbox=(5, 5, 60, 60))
    py = decode_sampled_frames(
        rec.path, PP_RGB.num_frames, PP_RGB.staging_size,
        PP_RGB.host_resize_short, frame_start=3, frame_end=10,
        bbox=(5, 5, 60, 60), staging_format="rgb",
    )
    av, ok = native.decode_batch_av(
        [rec], PP_RGB.num_frames, PP_RGB.staging_size,
        PP_RGB.host_resize_short, yuv420=False)
    assert ok[0] == 0
    # bbox rescaling + chroma alignment may shift the crop by ≤1 source
    # pixel relative to cv2's exact pixel crop — tolerance slightly wider.
    assert _mad(py, av[0]) <= 6.0


def test_av_pool_contract(tiny_wlasl, tmp_path):
    """NativeDecodePool(lib='av') honors the map_batches contract
    (padding, kept indices, skip semantics)."""
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:3]
    paths = [r.path for r in records] + [str(tmp_path / "missing.mp4")]
    pool = NativeDecodePool(PP_RGB, num_workers=2, lib="av")
    try:
        with pytest.raises(IOError):
            list(pool.map_batches(paths, 4))
        (frames, kept), = list(pool.map_batches(paths, 4, on_error="skip"))
        assert kept == [0, 1, 2]
        assert frames.shape[0] == 4
        np.testing.assert_array_equal(frames[3], frames[2])
    finally:
        pool.shutdown()


def test_av_fast_flags_still_valid_frames(tiny_wlasl):
    """Fast mode (lowres + filter/nonref skip) is approximate by design but
    must still produce the right frames: same shapes, finite tolerance vs
    the exact path (these tiny 64² mp4v sources have no room for lowres, so
    fast-mode output should stay close; the flag path itself must not
    corrupt sampling)."""
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:2]
    flags = (native.FAST_LOWRES | native.FAST_SKIP_LOOP_FILTER
             | native.FAST_SKIP_NONREF)
    for r in records:
        exact = native.decode_clip_av(
            r.path, PP_RGB.num_frames, PP_RGB.staging_size,
            PP_RGB.host_resize_short,
        )
        fast = native.decode_clip_av(
            r.path, PP_RGB.num_frames, PP_RGB.staging_size,
            PP_RGB.host_resize_short, fast_flags=flags,
        )
        assert fast.shape == exact.shape
        assert _mad(exact, fast) <= 8.0


def test_encode_synthetic_bframes(tmp_path):
    """The fixture encoder emits real B-frames when asked (reordered
    packets > 0) and none otherwise — the precondition for every B-frame
    decode test below (cv2's writer cannot produce such streams here)."""
    p0 = str(tmp_path / "b0.mp4")
    p2 = str(tmp_path / "b2.mp4")
    assert native.encode_synthetic_av(p0, 40, (64, 64), max_b_frames=0) == 0
    assert native.encode_synthetic_av(p2, 40, (64, 64), max_b_frames=2) > 0


def test_av_bframe_stream_exact_parity(tmp_path):
    """Exact decode of a B-frame (reordered) stream matches the cv2 oracle:
    display-order reassembly, sampling, and staging are reorder-proof."""
    p = str(tmp_path / "b3.mp4")
    assert native.encode_synthetic_av(p, 40, (64, 64), max_b_frames=3,
                                      seed=5) > 0
    py = decode_sampled_frames(p, 8, (48, 48))
    av = native.decode_clip_av(p, 8, (48, 48))
    assert _mad(py, av) <= 3.0


def test_av_bframe_segment_seek_parity(tmp_path):
    """Seek-based segment decode on a B-frame stream (frame_start deep
    enough to take the av_seek_frame path) still lands the right frames."""
    p = str(tmp_path / "bseek.mp4")
    assert native.encode_synthetic_av(p, 60, (64, 64), max_b_frames=2,
                                      seed=9) > 0
    py = decode_sampled_frames(p, 6, (48, 48), frame_start=25, frame_end=55)
    av = native.decode_clip_av(p, 6, (48, 48), frame_start=25, frame_end=55)
    assert _mad(py, av) <= 3.0


def test_av_skip_nonref_never_leaves_slots_unwritten(tmp_path):
    """Regression (round-3 review): with FAST_SKIP_NONREF on a stream whose
    B-frame runs are LONGER than the skip guard gap (max_b_frames=3 vs the
    gap>2 enable), a drop window can overshoot a wanted frame. Every output
    slot must still be staged with the nearest decodable frame — the old
    loop skipped the overshot want entry, returning the np.empty() buffer
    contents (here: a 255 prefill, MAD ~100+ vs any real frame) as
    success."""
    p = str(tmp_path / "bskip.mp4")
    assert native.encode_synthetic_av(p, 40, (64, 64), max_b_frames=3,
                                      seed=1) > 0
    exact = native.decode_clip_av(p, 8, (48, 48))
    out = np.full((1, 8, 48, 48, 3), 255, np.uint8)
    frames, ok = native.decode_batch_av(
        [p], 8, (48, 48), fast_flags=native.FAST_SKIP_NONREF, out=out)
    assert ok[0] == 0
    for t in range(8):
        mad = _mad(frames[0, t], exact[t])
        assert mad <= 30.0, (
            f"frame {t} not staged (MAD {mad:.1f} vs exact — "
            "unwritten slot?)"
        )


def test_make_decode_pool_av_backend():
    pool = make_decode_pool(PP_RGB, backend="av")
    assert isinstance(pool, NativeDecodePool) and pool.lib == "av"
    pool.shutdown()


def test_auto_never_selects_av():
    """Auto must keep the byte-identical OpenCV backend (av is opt-in)."""
    pool = make_decode_pool(PP_RGB, backend="auto")
    assert getattr(pool, "lib", "opencv") == "opencv"
    pool.shutdown()


def test_stream_predict_decode_fast(tiny_wlasl):
    """decode_fast plumbs the codec-level fast modes through the PUBLIC
    streaming API (stream_predict / `asl predict --decode-fast`): logits
    stay tolerance-close to the exact av path, and the flag fail-fasts on
    backends that have no codec-level modes."""
    from asltpu import api

    index, videos = tiny_wlasl
    paths = [r.path for r in
             WLASLIndex(index, videos, subset=6).split("train")[:3]]
    model = api.load_model(
        "mobilenet_gru", num_classes=6, gru_hidden=32,
        preprocess={"num_frames": 4, "staging_size": (64, 64),
                    "resize_short": 56, "crop": 48},
    )
    exact = {p: lg for p, _, lg in api.stream_predict(
        model, paths, batch_size=2, decode_backend="av")}
    fast = {p: lg for p, _, lg in api.stream_predict(
        model, paths, batch_size=2, decode_backend="av", decode_fast=True)}
    assert set(fast) == set(exact) == set(paths)
    for p in paths:
        np.testing.assert_allclose(fast[p], exact[p], atol=0.1)

    with pytest.raises(ValueError, match="decode_fast"):
        next(iter(api.stream_predict(
            model, paths, batch_size=2, decode_fast=True)))


def test_av_gop_seek_sparse_long_clip(tmp_path):
    """Mid-stream GOP skipping (sparse sampling of a LONG clip — the case
    where gaps between sampled frames exceed a GOP): staged frames must
    stay tolerance-identical to the cv2 oracle, i.e. the keyframe seeks
    land on the RIGHT frames (a mis-recovered post-seek index shifts whole
    frames — MAD in the tens)."""
    from asltpu.data.synthetic import write_video

    p = str(tmp_path / "long.mp4")
    write_video(p, num_frames=300, size=(96, 96), seed=5)
    pp = PreprocessConfig(num_frames=6, staging_size=(64, 64))
    py = decode_sampled_frames(p, pp.num_frames, pp.staging_size, 0)
    av = native.decode_clip_av(p, pp.num_frames, pp.staging_size, 0)
    assert av.shape == py.shape
    assert _mad(av, py) <= 3.0, "GOP-seek landed on wrong frames"


def test_av_gop_seek_segment_tail(tmp_path):
    """GOP seeks inside a SEGMENT (frame_start/frame_end window of a long
    video) must respect the window: sampled indices stay inside it and
    match the oracle."""
    from asltpu.data.synthetic import write_video

    p = str(tmp_path / "seg.mp4")
    write_video(p, num_frames=280, size=(96, 96), seed=6)
    pp = PreprocessConfig(num_frames=4, staging_size=(64, 64))
    py = decode_sampled_frames(
        p, pp.num_frames, pp.staging_size, 0, frame_start=40, frame_end=260)
    av = native.decode_clip_av(
        p, pp.num_frames, pp.staging_size, 0, frame_start=40, frame_end=260)
    assert _mad(av, py) <= 3.0
