"""Native (C++) decode vs the Python path: byte-identical staging, same
map_batches contract (SURVEY.md C1 native component)."""

import numpy as np
import pytest

from asltpu.config import PreprocessConfig
from asltpu.data.decode import DecodePool, NativeDecodePool, make_decode_pool
from asltpu.data.wlasl import WLASLIndex

from asltpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native decode: {native.unavailable_reason()}"
)

PP_RGB = PreprocessConfig(num_frames=4, staging_size=(64, 64))
PP_YUV = PreprocessConfig(num_frames=4, staging_size=(64, 64),
                          host_resize_short=72, staging_format="yuv420")


@pytest.mark.parametrize("pp", [PP_RGB, PP_YUV], ids=["rgb", "yuv420"])
def test_native_matches_python_records(tiny_wlasl, pp):
    """Per-record decode (segments + formats) must be byte-identical to the
    PURE-PYTHON decoder (decode_sampled_frames — decode_record itself now
    auto-dispatches to native, so the reference must bypass it)."""
    from asltpu.data.decode import decode_sampled_frames

    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:4]
    py = np.stack([
        decode_sampled_frames(
            r.path, pp.num_frames, pp.staging_size, pp.host_resize_short,
            frame_start=r.frame_start, frame_end=r.frame_end, bbox=r.bbox,
            staging_format=pp.staging_format,
        )
        for r in records
    ])
    nat_pool = NativeDecodePool(pp, num_workers=2)
    try:
        (b, kept_b), = list(nat_pool.map_batches(records, 4))
        assert kept_b == [0, 1, 2, 3]
        np.testing.assert_array_equal(py, b)
    finally:
        nat_pool.shutdown()


def test_native_segment_and_bbox(tiny_wlasl, tmp_path):
    """Frame segments and signer bbox crops must match the Python decoder."""
    import dataclasses

    from asltpu.data.decode import decode_record
    from asltpu.data.wlasl import ClipRecord

    index, videos = tiny_wlasl
    base = WLASLIndex(index, videos, subset=6).split("train")[0]
    from asltpu.data.decode import decode_sampled_frames

    rec = dataclasses.replace(base, frame_start=3, frame_end=10,
                              bbox=(5, 5, 60, 60))
    py = decode_sampled_frames(
        rec.path, PP_RGB.num_frames, PP_RGB.staging_size,
        PP_RGB.host_resize_short, frame_start=3, frame_end=10,
        bbox=(5, 5, 60, 60), staging_format="rgb",
    )
    nat, ok = native.decode_batch_native(
        [rec], PP_RGB.num_frames, PP_RGB.staging_size,
        PP_RGB.host_resize_short, yuv420=False)
    assert ok[0] == 0
    np.testing.assert_array_equal(py, nat[0])


def test_native_skip_errors(tiny_wlasl, tmp_path):
    """A missing clip raises by default; on_error='skip' drops it and pads
    the batch (same contract as DecodePool)."""
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")[:3]
    paths = [r.path for r in records] + [str(tmp_path / "missing.mp4")]
    pool = NativeDecodePool(PP_RGB, num_workers=2)
    try:
        with pytest.raises(IOError):
            list(pool.map_batches(paths, 4))
        (frames, kept), = list(pool.map_batches(paths, 4, on_error="skip"))
        assert kept == [0, 1, 2]
        assert frames.shape[0] == 4  # padded back to batch size
        np.testing.assert_array_equal(frames[3], frames[2])
    finally:
        pool.shutdown()


def test_native_pipelined_chunks_match_serial(tiny_wlasl, tmp_path):
    """map_batches with decode_ahead=2 (the default, two chunks in flight)
    must yield byte-identical batches, order, and kept indices to serial
    depth 1 across many chunks — including an undecodable clip mid-corpus
    under on_error='skip' (the failure lands while the NEXT chunk is
    already decoding)."""
    index, videos = tiny_wlasl
    records = WLASLIndex(index, videos, subset=6).split("train")
    paths = [r.path for r in records]
    paths.insert(3, str(tmp_path / "missing.mp4"))  # fails inside chunk 1

    def run(depth):
        pool = NativeDecodePool(PP_RGB, num_workers=2)
        pool.decode_ahead = depth
        try:
            return list(pool.map_batches(paths, 2, on_error="skip"))
        finally:
            pool.shutdown()

    serial, piped = run(1), run(2)
    assert len(serial) == len(piped) >= 3  # genuinely multi-chunk
    for (fs, ks), (fp, kp) in zip(serial, piped):
        assert ks == kp
        np.testing.assert_array_equal(fs, fp)
    kept_all = [i for _, k in piped for i in k]
    assert kept_all == [i for i in range(len(paths)) if i != 3]


def test_make_decode_pool_auto_prefers_native():
    pool = make_decode_pool(PP_RGB)
    assert isinstance(pool, NativeDecodePool)
    pool.shutdown()


def test_native_c_abi_rejects_zero_num_frames(tiny_wlasl):
    """Defense in depth below the config guard: num_frames=0 straight into
    the C ABI must return an error (used to be UB — want.back() on an
    empty vector), never write, never crash."""
    index, videos = tiny_wlasl
    rec = WLASLIndex(index, videos, subset=6).split("train")[0]
    with pytest.raises(IOError):
        native.decode_clip_native(rec.path, 0, (64, 64))
    if native.av_available():
        with pytest.raises(IOError):
            native.decode_clip_av(rec.path, 0, (64, 64))
