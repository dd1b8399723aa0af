"""North-star benchmark (C18): end-to-end clips/sec/chip, decode→logits,
16-frame 224² WLASL-100-shaped inference on the MobileNetV2+GRU config
(``BASELINE.json:2,4``; target ≥500 clips/sec/chip on TPU v5e).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

Pipeline measured: cv2 host decode (thread pool) → double-buffered
host→device prefetch → ONE XLA program (fused preprocess → MobileNetV2 →
GRU → logits). The decode corpus is synthetic 2-second 256² mp4s (the real
WLASL videos are takedown-prone; codec work is identical).

Extra diagnostic fields ride in the same JSON object (device-only
throughput, decode-only throughput, batch size) — the required keys stay.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--clips", type=int, default=256, help="e2e corpus size")
    ap.add_argument("--device-iters", type=int, default=20)
    ap.add_argument("--decode-workers", type=int, default=2)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument(
        "--all-configs", action="store_true",
        help="also measure device-path throughput of every model config",
    )
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler TPU trace of the device loop into DIR "
        "(view in TensorBoard/Perfetto)",
    )
    args = ap.parse_args()

    import jax

    from asltpu.api import load_model
    from asltpu.data.decode import DecodePool
    from asltpu.data.prefetch import Prefetcher
    from asltpu.data.synthetic import write_video

    # Transfer-thin staging: this v5e host's relay link degrades to
    # ~37 MB/s once any large model is compiled (infrastructure quirk —
    # see asltpu/data/prefetch.py), so the host performs resize+crop and
    # only crop²·T uint8 bytes cross the link. Same math, fewer bytes.
    model = load_model(
        "mobilenet_gru",
        preprocess={
            "use_pallas": not args.no_pallas,
            "host_resize_short": 256,
            "staging_size": (224, 224),
            "resize_short": 224,
        },
    )
    pp = model.cfg.preprocess
    fn = model.predict_fn()

    # ---- compile warmup -------------------------------------------------
    frames = np.random.randint(
        0, 256, size=(args.batch, pp.num_frames, *pp.staging_size, 3),
        dtype=np.uint8,
    )
    frames_dev = jax.device_put(frames)
    logits = fn(model.variables, frames_dev)
    jax.block_until_ready(logits)

    # ---- device-only throughput (staged frames already on device) -------
    import contextlib

    from asltpu.utils.profiling import trace as profiler_trace

    trace_cm = (
        profiler_trace(args.trace) if args.trace else contextlib.nullcontext()
    )
    with trace_cm:
        t0 = time.perf_counter()
        for _ in range(args.device_iters):
            logits = fn(model.variables, frames_dev)
        jax.block_until_ready(logits)
        dt = time.perf_counter() - t0
    device_cps = args.device_iters * args.batch / dt

    # ---- host→device transfer rate (serial blocking copies) -------------
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.device_put(frames))
    xfer_dt = (time.perf_counter() - t0) / 5
    xfer_cps = args.batch / xfer_dt

    # ---- decode corpus --------------------------------------------------
    tmp = tempfile.mkdtemp(prefix="asltpu_bench_")
    paths = []
    for i in range(min(args.clips, 64)):  # reuse videos if clips > 64
        p = os.path.join(tmp, f"clip{i:03d}.mp4")
        write_video(p, num_frames=50, size=(256, 256), seed=i)
        paths.append(p)
    corpus = [paths[i % len(paths)] for i in range(args.clips)]

    # ---- decode-only throughput ----------------------------------------
    pool = DecodePool(pp, num_workers=args.decode_workers)
    t0 = time.perf_counter()
    n_dec = 0
    for batch, kept in pool.map_batches(corpus[: args.clips // 2], args.batch):
        n_dec += len(kept)
    decode_cps = n_dec / (time.perf_counter() - t0)

    # ---- end-to-end: decode pool → prefetch transfer thread → device ----
    # Decode is CPU-bound, the relay transfer is pure iowait: the decode
    # thread(s) and the Prefetcher's serial-blocking transfer thread overlap
    # cleanly even on this 1-core host; device compute overlaps via JAX
    # async dispatch.
    def host_batches():
        for batch, kept in pool.map_batches(corpus, args.batch):
            yield batch, np.int32(len(kept))

    t0 = time.perf_counter()
    n_done = 0
    last = None
    for dev_batch, n_kept in Prefetcher(host_batches(), depth=2):
        last = fn(model.variables, dev_batch)
        n_done += int(n_kept)
    jax.block_until_ready(last)
    e2e_cps = n_done / (time.perf_counter() - t0)
    pool.shutdown()

    per_config = {}
    if args.all_configs:
        per_config = _bench_all_configs()

    result = {
        "metric": "e2e clips/sec/chip decode->logits (WLASL-100 16f 224^2, "
        "mobilenet_gru)",
        "value": round(e2e_cps, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(e2e_cps / 500.0, 3),
        "device_only_clips_per_sec": round(device_cps, 2),
        "transfer_clips_per_sec": round(xfer_cps, 2),
        "decode_only_clips_per_sec": round(decode_cps, 2),
        "batch": args.batch,
        "platform": jax.devices()[0].platform,
    }
    if per_config:
        result["device_clips_per_sec_by_config"] = per_config
    print(json.dumps(result))
    return 0


def _bench_all_configs():
    """Device-path (staged input → logits) throughput of every config at its
    contract shapes."""
    import jax
    import numpy as np

    from asltpu.api import load_model
    from asltpu.data.synthetic import synthetic_landmarks

    plans = [
        ("pose_bilstm", 64, {}),
        ("resnet_transformer", 16, {}),
        ("i3d", 4, {}),
        ("two_stream", 16, {}),
    ]
    out = {}
    for name, bsz, overrides in plans:
        model = load_model(name, **overrides)
        fn = model.predict_fn()
        nf = getattr(model.cfg, "num_frames", 16)
        inputs = []
        if model.takes_rgb:
            pp = model.cfg.preprocess
            inputs.append(jax.device_put(np.random.randint(
                0, 256, (bsz, pp.num_frames, *pp.staging_size, 3), np.uint8
            )))
        if model.takes_landmarks:
            inputs.append(jax.device_put(
                synthetic_landmarks(bsz, nf, seed=0)
            ))
        jax.block_until_ready(fn(model.variables, *inputs))
        import time as _t

        iters = 10
        t0 = _t.perf_counter()
        for _ in range(iters):
            r = fn(model.variables, *inputs)
        jax.block_until_ready(r)
        out[name] = round(iters * bsz / (_t.perf_counter() - t0), 1)
    return out


if __name__ == "__main__":
    sys.exit(main())
