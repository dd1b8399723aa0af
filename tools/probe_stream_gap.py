"""Attribute the steady-e2e vs decode-bound gap (round-4 VERDICT item #4).

Round 3 ended with the headline stream's steady window at 0.94× the
measured decode bound (144.9 vs 153.7 clips/s) and no attribution. This
probe runs the SAME one-batch-ahead pipeline as the bench's timed stream
(NativeDecodePool.map_batches → device_put → exec) but times each phase of
every iteration separately:

  wait_s   — blocked in fut.result() for the decode of this chunk
             (decode-bound time; the pipeline is healthy when this
             dominates)
  put_s    — blocking host→device transfer
  exec_s   — blocking jitted execute
  host_s   — everything else in the consumer iteration (padding, kept-index
             bookkeeping, generator overhead)

and compares against a back-to-back decode-only pass over an identical
fresh corpus. If (put+exec+host) per batch is fully hidden, the stream
time ≈ decode time; whatever fraction is NOT hidden is the bubble, and the
phase split says which phase it lives in. Run on the real TPU:

    python tools/probe_stream_gap.py --clips 96 --batch 32
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--backend", default="av")
    ap.add_argument("--link-settle", type=float, default=240.0)
    ap.add_argument("--ab", action="store_true",
                    help="A/B the decode_ahead pipeline depth (1 vs 2): "
                         "four interleaved streams (1,2,2,1) on fresh "
                         "corpora so host drift cancels to first order")
    args = ap.parse_args()

    import jax

    from asltpu.api import load_model
    from asltpu.benchmark import _make_corpus, _wait_link_healthy
    from asltpu.data.decode import make_decode_pool

    model = load_model(
        "mobilenet_gru", prefer_split=True,
        preprocess={"host_resize_short": 256, "staging_size": (224, 224),
                    "resize_short": 224, "staging_format": "yuv420"},
    )
    pp = model.cfg.preprocess
    fn = model.predict_fn()

    tmp = tempfile.mkdtemp(prefix="asltpu_gap_")
    corpus = _make_corpus(tmp, "s", args.clips, (256, 256), 0)
    corpus_dec = _make_corpus(tmp, "d", args.clips, (256, 256), 5000)
    warm = _make_corpus(tmp, "w", 8, (256, 256), 9000)

    pool = make_decode_pool(pp, num_workers=args.workers,
                            backend=args.backend)

    # Warm compile + transfer path, then settle link AND CPU quota.
    for frames, _ in pool.map_batches(warm, args.batch):
        jax.block_until_ready(fn(model.variables, jax.device_put(frames)))
    if args.link_settle:
        print("settle:", _wait_link_healthy(args.link_settle,
                                            min_idle_s=45.0), flush=True)

    if args.ab:
        import json

        results = {1: [], 2: []}
        for trial, depth in enumerate((1, 2, 2, 1)):
            c = _make_corpus(tmp, f"ab{trial}_", args.clips, (256, 256),
                             20000 + trial * args.clips)
            pool.decode_ahead = depth
            t0 = time.perf_counter()
            n = 0
            for frames, kept in pool.map_batches(c, args.batch):
                dev = jax.device_put(frames)
                jax.block_until_ready(dev)
                jax.block_until_ready(fn(model.variables, dev))
                n += len(kept)
            rate = n / (time.perf_counter() - t0)
            results[depth].append(round(rate, 2))
            print(f"trial {trial}: depth={depth} {rate:.2f} clips/s",
                  flush=True)
        pool.shutdown()
        print(json.dumps({
            "depth1_clips_per_sec": results[1],
            "depth2_clips_per_sec": results[2],
            "depth2_vs_depth1": round(
                (sum(results[2]) / 2) / (sum(results[1]) / 2), 4),
        }))
        return 0

    # ---- instrumented stream: wrap map_batches to time the result-wait.
    # The generator yields after fut.result(); timing from "consumer asks
    # for the next batch" to "batch arrives" captures decode-wait + submit
    # + padding overhead as seen by the consumer.
    it = pool.map_batches(corpus, args.batch)
    waits, puts, execs, hosts = [], [], [], []
    t_start = time.perf_counter()
    t_mark = t_start
    while True:
        t0 = time.perf_counter()
        try:
            frames, kept = next(it)
        except StopIteration:
            break
        t1 = time.perf_counter()
        dev = jax.device_put(frames)
        jax.block_until_ready(dev)
        t2 = time.perf_counter()
        jax.block_until_ready(fn(model.variables, dev))
        t3 = time.perf_counter()
        waits.append(t1 - t0)
        puts.append(t2 - t1)
        execs.append(t3 - t2)
        hosts.append(t0 - t_mark)
        t_mark = t3
    stream_s = time.perf_counter() - t_start

    # ---- decode-only pass on an identical fresh corpus -------------------
    t0 = time.perf_counter()
    n = 0
    for _, kept in pool.map_batches(corpus_dec, args.batch):
        n += len(kept)
    dec_s = time.perf_counter() - t0
    pool.shutdown()

    nb = len(waits)
    fill = waits[0]
    steady_stream = stream_s - fill
    out = {
        "batches": nb,
        "stream_s": round(stream_s, 3),
        "stream_clips_per_sec": round(args.clips / stream_s, 2),
        "decode_only_s": round(dec_s, 3),
        "decode_only_clips_per_sec": round(args.clips / dec_s, 2),
        "ratio_stream_vs_decode": round(dec_s / stream_s, 3),
        "fill_s (first wait)": round(fill, 3),
        "steady_wait_s": [round(w, 3) for w in waits[1:]],
        "put_s": [round(p, 3) for p in puts],
        "exec_s": [round(e, 3) for e in execs],
        "host_s (pad/bookkeeping)": [round(h, 4) for h in hosts],
        "sum_wait": round(sum(waits[1:]), 3),
        "sum_put": round(sum(puts), 3),
        "sum_exec": round(sum(execs), 3),
        "sum_host": round(sum(hosts), 4),
        "steady_stream_s": round(steady_stream, 3),
    }
    # The bubble = steady stream time minus the decode-wait actually hidden:
    # in a perfectly pipelined stream, put+exec+host all overlap decode and
    # steady_stream ≈ per-chunk decode time × (nb-1) ≈ sum_wait + hidden
    # consumer work. Unhidden time = steady_stream - sum_wait - fill-batch
    # consumer work.
    out["unhidden_consumer_s"] = round(
        steady_stream - sum(waits[1:]) - sum(hosts), 3
    )
    import json

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
