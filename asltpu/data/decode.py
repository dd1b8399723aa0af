"""Host video decode (C1) — the only stage that stays on the host CPU.

The reference family looped ``cv2.VideoCapture.read()`` over every frame and
preprocessed each in Python/OpenCV. Here the host does the minimum work the
TPU cannot: container decode. Two throughput tricks (SURVEY.md §7.3.1):

  - **Sampled-only decode**: uniform temporal sampling indices are computed
    *first*, and only those frames are converted/staged; the decoder still
    sequentially decodes (codecs require it) but skips colorspace conversion
    and resize for unsampled frames via ``grab()``.
  - **Staging resize on host**: frames are resized to the fixed staging
    resolution (``PreprocessConfig.staging_size``) so the device sees a
    static shape — XLA compiles once. The aspect-preserving resize + crop +
    normalize all run on-device in the fused kernel.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence, Tuple

import numpy as np

from asltpu.config import PreprocessConfig
from asltpu.data.pad import pad_to_batch
from asltpu.ops.preprocess import uniform_sample_indices

try:  # cv2 is present in the target environment; keep import lazy-safe.
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def probe_video(path: str) -> Tuple[int, float]:
    """(frame_count, fps) of a video container — the one metadata read the
    continuous-recognition window planner (asltpu.windows) needs. Containers
    that report no frame count are counted by grab() (no decode); a missing
    or non-positive fps falls back to 25 (the PAL default cv2 itself
    assumes), so callers always get a usable timebase."""
    if cv2 is None:
        raise RuntimeError("OpenCV not available for video probe")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if total <= 0:
            total = 0
            while cap.grab():
                total += 1
        fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
        if not (fps > 0):
            fps = 25.0
        return total, fps
    finally:
        cap.release()


def decode_sampled_frames(
    path: str,
    num_frames: int,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    frame_start: int = 1,
    frame_end: int = -1,
    bbox: Optional[Tuple[int, int, int, int]] = None,
    staging_format: str = "rgb",
) -> np.ndarray:
    """Decode exactly the uniformly-sampled frames of a video segment.

    ``frame_start``/``frame_end`` are the WLASL 1-based inclusive segment
    bounds (-1 → EOF); ``bbox`` is an optional [x0, y0, x1, y1] signer crop
    applied before staging. Returns uint8 RGB [T, Hs, Ws, 3], or packed I420
    planes [T, Hs·3/2, Ws] with ``staging_format="yuv420"`` (half the wire
    bytes; the device kernel converts — asltpu.ops.preprocess).
    Frames beyond EOF (corrupt containers with bad frame counts) repeat the
    last good frame.
    """
    if cv2 is None:
        raise RuntimeError("OpenCV not available for video decode")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if total <= 0:
            # Some containers don't report counts; fall back to full decode.
            return _decode_all_then_sample(
                cap, num_frames, staging_size, host_resize_short,
                frame_start, frame_end, bbox, staging_format,
            )
        first = max(frame_start - 1, 0)
        last = total if frame_end < 0 else min(frame_end, total)
        if first >= last:
            # Stale segment metadata (start past EOF): fall back to the
            # full video rather than failing on a decodable file.
            first, last = 0, total
        seg = max(last - first, 1)
        want = first + uniform_sample_indices(seg, num_frames)
        pos = 0
        if first > 8:
            # Seek-based decode (SURVEY.md §7.3.1): jump near the segment
            # instead of grab()-ing from frame 0 — WLASL segments often sit
            # deep inside long source videos. cv2 seeks via the container
            # index and decodes forward from the nearest keyframe.
            if cap.set(cv2.CAP_PROP_POS_FRAMES, first):
                got = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
                if 0 <= got <= first:
                    pos = got
                else:  # unreliable seek — fall back to sequential
                    cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
        hs, ws = staging_size
        frame_shape = (
            (hs * 3 // 2, ws) if staging_format == "yuv420" else (hs, ws, 3)
        )
        out = np.empty((num_frames, *frame_shape), dtype=np.uint8)
        want_set = {}
        for out_i, frame_i in enumerate(want):
            want_set.setdefault(int(frame_i), []).append(out_i)
        last = None
        max_needed = max(want_set)
        while pos <= max_needed:
            if pos in want_set:
                ok, frame = cap.read()  # decode + convert
                if not ok:
                    break
                frame = _stage(frame, staging_size, host_resize_short, bbox,
                               staging_format)
                for out_i in want_set[pos]:
                    out[out_i] = frame
                last = frame
            else:
                if not cap.grab():  # decode-only, skip conversion
                    break
            pos += 1
        if last is None:
            raise IOError(f"no decodable frames in {path}")
        # Fill any frames past a premature EOF with the last good frame.
        for frame_i, out_is in want_set.items():
            if frame_i >= pos:
                for out_i in out_is:
                    out[out_i] = last
        return out
    finally:
        cap.release()


def _decode_all_then_sample(
    cap, num_frames, staging_size, host_resize_short: int = 0,
    frame_start: int = 1, frame_end: int = -1, bbox=None,
    staging_format: str = "rgb",
) -> np.ndarray:
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    if not frames:
        raise IOError("no decodable frames")
    first = max(frame_start - 1, 0)
    last = len(frames) if frame_end < 0 else min(frame_end, len(frames))
    frames = frames[first:last] or frames
    idx = uniform_sample_indices(len(frames), num_frames)
    return np.stack([
        _stage(frames[i], staging_size, host_resize_short, bbox,
               staging_format)
        for i in idx
    ])


def _stage(
    frame_bgr: np.ndarray,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    bbox=None,
    staging_format: str = "rgb",
) -> np.ndarray:
    """BGR→RGB + ASPECT-PRESERVING resize + center crop to the fixed staging
    resolution (device sees static shapes without geometric distortion).

    The short-side target is ``host_resize_short`` when set (transfer-thin
    mode: staging == final crop, device only normalizes) and
    ``min(staging_size)`` otherwise — in the default configuration
    (staging == resize_short square) the staged frame composes with the
    device crop to EXACTLY the reference pipeline: resize-short → center
    crop (center crops nest)."""
    if bbox is not None:
        x0, y0, x1, y1 = (int(v) for v in bbox)
        h, w = frame_bgr.shape[:2]
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x1 > x0 and y1 > y0:
            frame_bgr = frame_bgr[y0:y1, x0:x1]
    from asltpu.ops.preprocess import resize_plan

    hs, ws = staging_size
    short = host_resize_short or min(hs, ws)
    h, w = frame_bgr.shape[:2]
    rh, rw = resize_plan((h, w), short)
    # Clamp up so the staging crop always fits (extreme aspect ratios).
    rh, rw = max(rh, hs), max(rw, ws)
    if (rh, rw) != (h, w):
        frame_bgr = cv2.resize(
            frame_bgr, (rw, rh), interpolation=cv2.INTER_LINEAR
        )
    y0, x0 = (rh - hs) // 2, (rw - ws) // 2
    staged = frame_bgr[y0 : y0 + hs, x0 : x0 + ws]
    if staging_format == "yuv420":
        # Pack to I420 planes (SIMD-fast in cv2): 1.5 bytes/px on the wire;
        # the device performs the inverse conversion (ops/preprocess.py).
        return cv2.cvtColor(np.ascontiguousarray(staged),
                            cv2.COLOR_BGR2YUV_I420)
    return staged[:, :, ::-1]  # BGR → RGB


def _native_mod():
    """The native decode binding, or None (cached; byte-identical output —
    tests/unit/test_native_decode.py)."""
    global _NATIVE
    if _NATIVE is _UNSET:
        try:
            from asltpu import native as _n

            _NATIVE = _n if _n.available() else None
        except Exception:
            _NATIVE = None
    return _NATIVE


_UNSET = object()
_NATIVE: object = _UNSET


def decode_clip(
    path: str, cfg: PreprocessConfig, num_frames: Optional[int] = None
) -> np.ndarray:
    """Public C1 entry: video path → staged uint8 frames
    [T, Hs, Ws, 3] (or packed I420 [T, Hs·3/2, Ws]) ready for the device
    preprocess kernel. Uses the native decoder when built (byte-identical,
    no GIL hold); falls back to the Python path."""
    nat = _native_mod()
    if nat is not None:
        return nat.decode_clip_native(
            path, num_frames or cfg.num_frames, cfg.staging_size,
            cfg.host_resize_short, yuv420=cfg.staging_format == "yuv420",
        )
    return decode_sampled_frames(
        path, num_frames or cfg.num_frames, cfg.staging_size,
        cfg.host_resize_short, staging_format=cfg.staging_format,
    )


def decode_record(rec, cfg: PreprocessConfig) -> np.ndarray:
    """Decode a WLASL :class:`~asltpu.data.wlasl.ClipRecord`, honoring its
    frame segment and signer bbox (the reference-family pipeline behavior).
    Native-backed when built, Python fallback otherwise."""
    nat = _native_mod()
    if nat is not None:
        return nat.decode_clip_native(
            rec.path, cfg.num_frames, cfg.staging_size,
            cfg.host_resize_short, frame_start=rec.frame_start,
            frame_end=rec.frame_end, bbox=rec.bbox,
            yuv420=cfg.staging_format == "yuv420",
        )
    return decode_sampled_frames(
        rec.path, cfg.num_frames, cfg.staging_size, cfg.host_resize_short,
        frame_start=rec.frame_start, frame_end=rec.frame_end, bbox=rec.bbox,
        staging_format=cfg.staging_format,
    )


def _limit_cv2_threads():
    if cv2 is not None:
        cv2.setNumThreads(0)


class NativeDecodePool:
    """Batch decoder backed by a C++ library (asltpu/native): the whole
    batch decodes on NATIVE threads with the GIL released for the call, and
    the next batch decodes in the background while the consumer handles the
    current one — the highest-throughput decode path on GIL-contended
    hosts.

    Two native libraries: ``lib="opencv"`` (decode.cpp — byte-identical to
    the Python path, tested) and ``lib="av"`` (decode_av.cpp — direct
    libavcodec: staging resamples the decoder's native YUV planes instead
    of round-tripping through BGR, plus opt-in codec-level work reduction
    via ``fast_flags``; tolerance-parity, measured faster on ≥480p
    sources)."""

    def __init__(self, cfg: PreprocessConfig, num_workers: int = 4,
                 lib: str = "opencv", fast_flags: int = 0):
        from asltpu import native

        if lib not in ("opencv", "av"):
            raise ValueError(f"lib must be opencv|av, got {lib}")
        if lib == "av":
            if not native.av_available():
                raise RuntimeError(
                    "native av decode unavailable: "
                    f"{native.av_unavailable_reason()}"
                )
        elif not native.available():
            raise RuntimeError(
                f"native decode unavailable: {native.unavailable_reason()}"
            )
        self.cfg = cfg
        self.lib = lib
        self.fast_flags = fast_flags
        self._n = num_workers
        self._native = native
        # Chunks of native decode kept in flight ahead of the consumer in
        # map_batches (see the pipelining comment there; +18% at 2 vs 1,
        # one extra decoded batch resident per extra level).
        self.decode_ahead = 2
        self._pipeline = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="asltpu-native-decode"
        )

    def _decode(self, items):
        cfg = self.cfg
        if self.lib == "av":
            return self._native.decode_batch_av(
                items, cfg.num_frames, cfg.staging_size,
                cfg.host_resize_short,
                yuv420=cfg.staging_format == "yuv420",
                fast_flags=self.fast_flags, n_threads=self._n,
            )
        return self._native.decode_batch_native(
            items, cfg.num_frames, cfg.staging_size, cfg.host_resize_short,
            yuv420=cfg.staging_format == "yuv420", n_threads=self._n,
        )

    def map_batches(self, paths: Sequence, batch_size: int,
                    on_error: str = "raise"):
        """Same contract as DecodePool.map_batches: yields
        (frames [B, ...] u8, kept_indices); short/failed batches are padded
        by repeating the last good clip."""
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip, got {on_error}")
        chunks = [
            (i, paths[i : i + batch_size])
            for i in range(0, len(paths), batch_size)
        ]
        # ``decode_ahead`` chunks of native decode in flight ahead of the
        # consumer. Depth 2 (default) takes the NEXT chunk's Python-side
        # prologue (ctypes marshalling, output allocation) off the critical
        # path: with depth 1 it runs only after the consumer fetches the
        # previous result, so it lands between chunks while the native
        # threads idle — the round-3 steady-e2e vs decode-only gap (144.9
        # vs 153.7 clips/s). Measured 2026-08-19 on the TPU host with an
        # interleaved (1,2,2,1) A/B on fresh corpora
        # (tools/probe_stream_gap.py --ab): depth 1 → 94.8/97.2 clips/s,
        # depth 2 → 113.8/112.9 — +18%. Cost: one extra ~35 MB decoded
        # batch resident. The single pipeline worker still decodes chunks
        # strictly in order.
        ahead = max(1, int(self.decode_ahead))
        futs = [
            self._pipeline.submit(self._decode, chunks[k][1])
            for k in range(min(ahead, len(chunks)))
        ]
        for ci, (base, items) in enumerate(chunks):
            frames, ok = futs[ci].result()
            futs[ci] = None  # a Future pins its 30-40 MB result array
            nxt = ci + ahead
            if nxt < len(chunks):
                futs.append(self._pipeline.submit(self._decode, chunks[nxt][1]))
            kept = [base + j for j in range(len(items)) if ok[j] == 0]
            if len(kept) < len(items):
                bad = [p for j, p in enumerate(items) if ok[j] != 0]
                if on_error == "raise":
                    raise IOError(f"cannot decode clip(s): {bad}")
                from asltpu.utils.logging import get_logger

                get_logger("asltpu.decode").warning(
                    "skipping undecodable clip(s): %s", bad
                )
                if not kept:
                    continue
                good_rows = [j for j in range(len(items)) if ok[j] == 0]
                frames = frames[good_rows]
            frames = pad_to_batch(frames, batch_size)
            yield frames, kept

    def shutdown(self):
        self._pipeline.shutdown(wait=False, cancel_futures=True)


class DecodePool:
    """Worker pool decoding clips concurrently. Feeds the Prefetcher for
    batched/streaming inference.

    ``use_processes=True`` decodes in WORKER PROCESSES instead of threads:
    threads lose throughput whenever the consumer thread holds the GIL
    (batch assembly, relay RPC bookkeeping) — measured round 2, in-pipeline
    thread decode ran at ~0.4× its standalone rate. Processes keep decoding
    through those phases; the ~1-2 MB staged array per clip crosses back
    via pickle, a small cost against a 30-50 ms decode."""

    def __init__(
        self,
        cfg: PreprocessConfig,
        num_workers: int = 4,
        limit_cv2_threads: bool = True,
        use_processes: bool = False,
    ):
        self.cfg = cfg
        if limit_cv2_threads and cv2 is not None:
            # One decode worker per pool slot; OpenCV's own intra-op
            # threading just adds oversubscription on small hosts.
            cv2.setNumThreads(0)
        if use_processes:
            from concurrent.futures import ProcessPoolExecutor

            self._pool = ProcessPoolExecutor(
                max_workers=num_workers, initializer=_limit_cv2_threads
            )
        else:
            self._pool = ThreadPoolExecutor(
                max_workers=num_workers, thread_name_prefix="asltpu-decode"
            )
        self._lock = threading.Lock()

    def submit(self, item):
        """``item``: a video path or a ClipRecord (segment/bbox honored)."""
        if hasattr(item, "path") and hasattr(item, "frame_start"):
            return self._pool.submit(decode_record, item, self.cfg)
        return self._pool.submit(decode_clip, item, self.cfg)

    def map_batches(
        self,
        paths: Sequence,
        batch_size: int,
        on_error: str = "raise",
    ):
        """Yield ``(frames [B,T,Hs,Ws,3] u8, kept_indices)`` in submission
        order; the final short batch is padded by repeating the last clip
        (``kept_indices`` carries the true members).

        ``on_error="skip"`` drops undecodable clips with a warning instead
        of failing the stream (production-serving mode); a batch whose
        clips ALL fail is skipped entirely.
        """
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip, got {on_error}")
        # Sliding-window submission: keep at most a few batches of decodes
        # in flight so a fast decoder can't pile an entire corpus of
        # decoded frames into host memory ahead of a slow consumer.
        window = max(batch_size * 4, 8)
        futures: list = []
        next_submit = 0

        def top_up(upto):
            nonlocal next_submit
            while next_submit < min(upto, len(paths)):
                futures.append(self.submit(paths[next_submit]))
                next_submit += 1

        top_up(window)
        for i in range(0, len(paths), batch_size):
            top_up(i + batch_size + window)
            chunk = futures[i : i + batch_size]
            # Release consumed futures — a Future retains its result array,
            # so keeping them referenced would defeat the memory bound.
            futures[i : i + batch_size] = [None] * len(chunk)
            clips, kept = [], []
            for j, f in enumerate(chunk):
                try:
                    clips.append(f.result())
                    kept.append(i + j)
                except Exception:
                    if on_error == "raise":
                        raise
                    from asltpu.utils.logging import get_logger

                    get_logger("asltpu.decode").warning(
                        "skipping undecodable clip %s", paths[i + j],
                        exc_info=True,
                    )
            if not clips:
                continue
            yield pad_to_batch(np.stack(clips), batch_size), kept

    def shutdown(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


def make_decode_pool(
    cfg: PreprocessConfig, num_workers: int = 4, backend: str = "auto",
    fast_flags: int = 0,
):
    """Decode-pool factory. ``backend``:

    - "native": OpenCV C++ batch decoder (byte-identical to Python, GIL
      released);
    - "av": libavcodec C++ batch decoder (direct-YUV staging + codec-level
      ``fast_flags``; tolerance-parity, fastest on ≥480p sources);
    - "process" / "thread": Python pools;
    - "auto": native → process → thread, first available. (The av backend
      is never auto-selected: its output is not byte-identical, so callers
      choose it explicitly — bench/serving throughput paths do.)

    ``fast_flags`` (av only): OR of ``asltpu.native.FAST_*`` bits.
    """
    if backend not in ("auto", "native", "av", "process", "thread"):
        # A typo'd backend must not silently run the ~3× slower thread pool.
        raise ValueError(
            f"unknown decode backend {backend!r}; expected one of "
            "auto/native/av/process/thread"
        )
    if fast_flags and backend != "av":
        raise ValueError(
            "fast_flags are codec-level modes of the 'av' backend; "
            f"backend={backend!r} would silently ignore them"
        )
    if backend == "av":
        return NativeDecodePool(cfg, num_workers=num_workers, lib="av",
                                fast_flags=fast_flags)
    if backend in ("auto", "native"):
        try:
            return NativeDecodePool(cfg, num_workers=num_workers)
        except Exception:
            if backend == "native":
                raise
    if backend in ("auto", "process"):
        try:
            return DecodePool(cfg, num_workers=num_workers, use_processes=True)
        except Exception:
            if backend == "process":
                raise
    return DecodePool(cfg, num_workers=num_workers)
