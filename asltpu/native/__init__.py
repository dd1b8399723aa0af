"""ctypes binding for the native decode library (C1's native component).

The C++ side (decode.cpp) mirrors asltpu/data/decode.py byte-for-byte and
decodes whole batches on native threads with the GIL released for the full
call — Python-side decode loses ~3× throughput to GIL contention with batch
assembly and device-RPC bookkeeping (measured round 2).

``pybind11`` is not available in this environment; the library exposes a
plain C ABI and is loaded with ctypes (task-brief-sanctioned binding path).
The .so is built on demand by build.sh (g++ + the system OpenCV 4 SDK);
``available()`` reports whether the native path can be used so callers can
fall back to the Python pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libasltpu_decode.so")
_SO_AV = os.path.join(_DIR, "libasltpu_decode_av.so")
_INT_MIN = -(2 ** 31)

# Fast-mode bit flags for the libav backend (decode_av.cpp enum).
FAST_LOWRES = 1        # DCT-domain reduced-resolution decode (mpeg4 family)
FAST_SKIP_LOOP_FILTER = 2  # h264/hevc deblocking off (~20-30% less work)
FAST_SKIP_NONREF = 4   # drop non-reference (B) frames when unsampled
# The "decode_fast" mode every caller means (bench --decode-fast,
# api.stream_predict(decode_fast=True)): one definition so a new flag
# can't silently diverge between the bench lanes and the API path.
FAST_ALL = FAST_LOWRES | FAST_SKIP_LOOP_FILTER | FAST_SKIP_NONREF

_lib = None
_lib_err: Optional[str] = None
_lib_av = None
_lib_av_err: Optional[str] = None
_lock = threading.Lock()


def _load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        # Run build.sh whenever builds aren't disabled — NOT only when the
        # .so is missing: build.sh itself no-ops in milliseconds when the
        # library is newer than its sources, and this is what makes its
        # stale-rebuild logic reachable (a loader that skips it whenever
        # the file exists would dlopen outdated native code forever).
        # The disable flag gates only the BUILD attempt: it is set by a
        # parent process whose build already failed (or by a user forcing
        # the Python path), so worker processes don't each re-attempt the
        # same doomed (up to 300 s) g++ build — but a library that
        # already exists on disk is always loadable.
        if not os.environ.get("ASLTPU_NATIVE_DISABLE"):
            try:
                subprocess.run(
                    ["sh", os.path.join(_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=300,
                )
            except Exception as e:  # compiler/SDK missing → Python fallback
                # Inherited by decode worker processes so they skip the
                # doomed (up to 300 s) build retry on their first decode
                # call. The flag gates BUILDS only — when a previously
                # built .so exists below, children still CDLL it directly.
                os.environ["ASLTPU_NATIVE_DISABLE"] = "1"
                if not os.path.exists(_SO):
                    _lib_err = f"native build failed: {e}"
                    return None
                # A rebuild attempt failed but a previously-built library
                # exists: load it (possibly stale) rather than losing the
                # native path outright.
        elif not os.path.exists(_SO):
            _lib_err = "native decode disabled (ASLTPU_NATIVE_DISABLE)"
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.asltpu_decode_clip.restype = ctypes.c_int
            lib.asltpu_decode_batch.restype = ctypes.c_int
            lib.asltpu_native_abi_version.restype = ctypes.c_int
        except OSError as e:
            _lib_err = f"native load failed: {e}"
            return None
        except AttributeError as e:
            # A stale .so missing a symbol added since it was built — the
            # version stamp can't catch this (binding runs first), so it
            # must report unavailability, not crash availability probes.
            _lib_err = f"native library stale (missing symbol): {e}"
            return None
        if lib.asltpu_native_abi_version() != 1:
            _lib_err = "native ABI version mismatch"
            return None
        _lib = lib
        return _lib


def _load_av():
    """The libav (ffmpeg-direct) decode library — the THROUGHPUT backend
    (codec-level frame skipping, lowres, direct-YUV staging; decode_av.cpp).
    Not byte-identical to the cv2 oracle; tolerance-tested."""
    global _lib_av, _lib_av_err
    with _lock:
        if _lib_av is not None or _lib_av_err is not None:
            return _lib_av
        # Same contract as _load (including the run-even-when-present
        # staleness rebuild): the flags suppress BUILD retries only; a
        # prebuilt library on disk stays loadable even when a sibling
        # library's build failed. The av lane has its own flag because
        # build.sh treats it as best-effort — the OpenCV library can build
        # fine while this one is doomed, and each new worker process must
        # not re-pay the g++ attempt.
        disabled = os.environ.get("ASLTPU_NATIVE_DISABLE") or os.environ.get(
            "ASLTPU_NATIVE_AV_DISABLE"
        )
        if not disabled:
            try:
                subprocess.run(
                    ["sh", os.path.join(_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=300,
                )
            except Exception as e:
                # As in _load: flag builds off for child processes; a
                # prebuilt library on disk stays loadable below.
                os.environ["ASLTPU_NATIVE_AV_DISABLE"] = "1"
                if not os.path.exists(_SO_AV):
                    _lib_av_err = f"native av build failed: {e}"
                    return None
            if not os.path.exists(_SO_AV):
                # build.sh ran but produced no av library: the ffmpeg dev
                # SDK is absent or the av compile failed (best-effort —
                # see build.sh). Mark it off for child processes too.
                _lib_av_err = (
                    "libav backend not built (ffmpeg dev SDK absent or "
                    "av compile failed — see build.sh)"
                )
                os.environ["ASLTPU_NATIVE_AV_DISABLE"] = "1"
                return None
        elif not os.path.exists(_SO_AV):
            _lib_av_err = "native av decode disabled (env flag)"
            return None
        try:
            lib = ctypes.CDLL(_SO_AV)
            lib.asltpu_av_decode_clip.restype = ctypes.c_int
            lib.asltpu_av_decode_batch.restype = ctypes.c_int
            lib.asltpu_av_encode_synthetic.restype = ctypes.c_int
            lib.asltpu_av_abi_version.restype = ctypes.c_int
        except OSError as e:
            _lib_av_err = f"native av load failed: {e}"
            return None
        except AttributeError as e:
            # Stale .so predating a symbol added since (see _load).
            _lib_av_err = f"native av library stale (missing symbol): {e}"
            return None
        if lib.asltpu_av_abi_version() != 1:
            _lib_av_err = "native av ABI version mismatch"
            return None
        _lib_av = lib
        return _lib_av


def available() -> bool:
    return _load() is not None


def unavailable_reason() -> Optional[str]:
    _load()
    return _lib_err


def av_available() -> bool:
    return _load_av() is not None


def av_unavailable_reason() -> Optional[str]:
    _load_av()
    return _lib_av_err


def _frame_shape(hs: int, ws: int, yuv420: bool) -> Tuple[int, ...]:
    return (hs * 3 // 2, ws) if yuv420 else (hs, ws, 3)


def decode_clip_native(
    path: str,
    num_frames: int,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    frame_start: int = 1,
    frame_end: int = -1,
    bbox=None,
    yuv420: bool = False,
) -> np.ndarray:
    """Native single-clip decode; raises IOError like the Python path."""
    lib = _load()
    if lib is None:
        raise RuntimeError(_lib_err or "native decode unavailable")
    hs, ws = staging_size
    out = np.empty((num_frames, *_frame_shape(hs, ws, yuv420)), np.uint8)
    bb = (ctypes.c_int * 4)(*[int(v) for v in bbox]) if bbox else None
    rc = lib.asltpu_decode_clip(
        path.encode(), num_frames, hs, ws, host_resize_short,
        int(frame_start), int(frame_end), bb, int(yuv420),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc == -1:
        raise IOError(f"cannot open video: {path}")
    if rc != 0:
        raise IOError(f"no decodable frames in {path}")
    return out


def decode_batch_native(
    items: Sequence,
    num_frames: int,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    yuv420: bool = False,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch on native threads (GIL released for the whole call).

    ``items``: paths or ClipRecords (segment/bbox honored). Returns
    (frames [N, ...], ok [N] int32 — 0 means decoded).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(_lib_err or "native decode unavailable")
    n = len(items)
    hs, ws = staging_size
    if out is None:
        out = np.empty((n, num_frames, *_frame_shape(hs, ws, yuv420)),
                       np.uint8)
    paths, fs, fe, bbs = [], [], [], []
    for it in items:
        if hasattr(it, "path") and hasattr(it, "frame_start"):
            paths.append(it.path)
            fs.append(it.frame_start)
            fe.append(it.frame_end)
            bbs.append(list(it.bbox) if it.bbox else [_INT_MIN, 0, 0, 0])
        else:
            paths.append(it)
            fs.append(1)
            fe.append(-1)
            bbs.append([_INT_MIN, 0, 0, 0])
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_fs = np.asarray(fs, np.int32)
    c_fe = np.asarray(fe, np.int32)
    c_bb = np.asarray(bbs, np.int32)
    ok = np.empty((n,), np.int32)
    lib.asltpu_decode_batch(
        c_paths, n, num_frames, hs, ws, host_resize_short,
        c_fs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        c_fe.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        c_bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(yuv420), int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok


def decode_clip_av(
    path: str,
    num_frames: int,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    frame_start: int = 1,
    frame_end: int = -1,
    bbox=None,
    yuv420: bool = False,
    fast_flags: int = 0,
) -> np.ndarray:
    """libav single-clip decode (throughput backend; tolerance-parity).

    ``fast_flags``: OR of FAST_LOWRES / FAST_SKIP_LOOP_FILTER /
    FAST_SKIP_NONREF — each trades exactness for decode work (opt-in)."""
    lib = _load_av()
    if lib is None:
        raise RuntimeError(_lib_av_err or "native av decode unavailable")
    hs, ws = staging_size
    out = np.empty((num_frames, *_frame_shape(hs, ws, yuv420)), np.uint8)
    bb = (ctypes.c_int * 4)(*[int(v) for v in bbox]) if bbox else None
    rc = lib.asltpu_av_decode_clip(
        path.encode(), num_frames, hs, ws, host_resize_short,
        int(frame_start), int(frame_end), bb, int(yuv420), int(fast_flags),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc == -1:
        raise IOError(f"cannot open video: {path}")
    if rc != 0:
        raise IOError(f"no decodable frames in {path}")
    return out


def encode_synthetic_av(
    path: str,
    num_frames: int,
    size: Tuple[int, int],
    max_b_frames: int = 0,
    gop_size: int = 12,
    seed: int = 0,
) -> int:
    """Write a deterministic smooth-gradient mpeg4 clip with a controllable
    B-frame structure (test-fixture encoder; cv2's writer in this image
    cannot emit B-frames, leaving the FAST_SKIP_NONREF / frame-reorder
    decode paths fixture-less without this). Returns the number of
    reordered packets — nonzero iff B-frames were actually encoded."""
    lib = _load_av()
    if lib is None:
        raise RuntimeError(_lib_av_err or "native av decode unavailable")
    h, w = size
    rc = lib.asltpu_av_encode_synthetic(
        path.encode(), int(num_frames), int(h), int(w), int(max_b_frames),
        int(gop_size), int(seed),
    )
    if rc < 0:
        raise IOError(f"cannot encode synthetic clip: {path}")
    return rc


def decode_batch_av(
    items: Sequence,
    num_frames: int,
    staging_size: Tuple[int, int],
    host_resize_short: int = 0,
    yuv420: bool = False,
    fast_flags: int = 0,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """libav batch decode on native threads (GIL released). Same contract
    as decode_batch_native plus ``fast_flags``."""
    lib = _load_av()
    if lib is None:
        raise RuntimeError(_lib_av_err or "native av decode unavailable")
    n = len(items)
    hs, ws = staging_size
    if out is None:
        out = np.empty((n, num_frames, *_frame_shape(hs, ws, yuv420)),
                       np.uint8)
    paths, fs, fe, bbs = [], [], [], []
    for it in items:
        if hasattr(it, "path") and hasattr(it, "frame_start"):
            paths.append(it.path)
            fs.append(it.frame_start)
            fe.append(it.frame_end)
            bbs.append(list(it.bbox) if it.bbox else [_INT_MIN, 0, 0, 0])
        else:
            paths.append(it)
            fs.append(1)
            fe.append(-1)
            bbs.append([_INT_MIN, 0, 0, 0])
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_fs = np.asarray(fs, np.int32)
    c_fe = np.asarray(fe, np.int32)
    c_bb = np.asarray(bbs, np.int32)
    ok = np.empty((n,), np.int32)
    lib.asltpu_av_decode_batch(
        c_paths, n, num_frames, hs, ws, host_resize_short,
        c_fs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        c_fe.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        c_bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(yuv420), int(fast_flags), int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok
