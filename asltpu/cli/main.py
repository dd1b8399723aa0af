"""CLI (C13): ``asl predict | train | eval | bench`` — the user-facing entry
points of the framework (SURVEY.md §1.3 CLI layer).

Usage:
  python -m asltpu.cli predict CLIP.mp4 [--model mobilenet_gru] [--ckpt DIR]
  python -m asltpu.cli train --model i3d --index WLASL.json --videos DIR ...
  python -m asltpu.cli eval  --model ... --index ... --videos DIR --split test
  python -m asltpu.cli export --model ... --out DIR [--verify-clip CLIP.mp4]
  python -m asltpu.cli bench [bench.py args...]
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

from asltpu.utils.logging import MetricsWriter, get_logger

log = get_logger("asltpu.cli")


def _add_model_args(p: argparse.ArgumentParser):
    p.add_argument("--model", default="mobilenet_gru",
                   help="config name (pose_bilstm | mobilenet_gru | "
                        "resnet_transformer | i3d | two_stream)")
    p.add_argument("--ckpt", default=None,
                   help="orbax dir or torch .pt/.pth checkpoint")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   dest="overrides",
                   help="config field override, repeatable — e.g. "
                        "--set gru_hidden=256 --set preprocess.num_frames=8 "
                        "(values parsed as Python literals, else strings)")


def _parse_overrides(pairs):
    """['gru_hidden=256', 'preprocess.crop=96'] → config override kwargs
    (nested ``preprocess.`` keys become the preprocess dict)."""
    import ast

    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"error: --set expects KEY=VALUE, got '{pair}'")
        key, raw = pair.split("=", 1)
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        if key.startswith("preprocess."):
            out.setdefault("preprocess", {})[key[len("preprocess."):]] = val
        else:
            out[key] = val
    return out


def _model_overrides(args):
    overrides = _parse_overrides(args.overrides)
    if args.num_classes:
        overrides["num_classes"] = args.num_classes
    return overrides


def _load(args):
    from asltpu.api import load_model
    from asltpu.config import CONFIG_REGISTRY

    if args.model not in CONFIG_REGISTRY:
        raise SystemExit(
            f"error: unknown model '{args.model}'; choose from "
            f"{', '.join(sorted(CONFIG_REGISTRY))}"
        )
    return load_model(args.model, checkpoint=args.ckpt,
                      **_model_overrides(args))


def cmd_predict(args) -> int:
    import os

    from asltpu import api
    from asltpu.data.wlasl import WLASLIndex

    # Validate inputs BEFORE the (minutes-long) model compile.
    missing = [c for c in args.clips if not os.path.exists(c)]
    if missing:
        raise SystemExit(f"error: clip(s) not found: {', '.join(missing)}")
    if args.exported:
        if args.windows is not None:
            raise SystemExit(
                "error: --windows runs the batched streaming lane; export "
                "artifacts are the single-clip deployment lane (build the "
                "model with --model/--ckpt for continuous recognition)"
            )
        return _predict_exported(args)
    # Same flag contract as bench: the codec-level fast modes live in the
    # libav backend only, so --decode-fast implies av and contradicts any
    # other explicit backend — fail/upgrade here, not minutes later inside
    # stream_predict after the model compile.
    if args.decode_fast:
        if args.decode_backend == "auto":
            args.decode_backend = "av"
        elif args.decode_backend != "av":
            raise SystemExit(
                "error: --decode-fast requires --decode-backend av")
    if args.decode_backend == "av":
        # Availability too: without a working ffmpeg SDK this must fail
        # now, not inside stream_predict after the model compile.
        from asltpu import native

        if not native.av_available():
            raise SystemExit(
                "error: --decode-backend av unavailable: "
                f"{native.av_unavailable_reason()}"
            )
    if args.windows is not None and args.windows <= 0:
        raise SystemExit("error: --windows expects a positive duration")
    if args.windows is not None and args.model == "pose_bilstm":
        raise SystemExit(
            "error: --windows takes video; pose_bilstm windows a landmark "
            "stream instead — use asltpu.windows.predict_windows_landmarks "
            "or POST /predict_windows_landmarks on asl serve"
        )
    if args.windows is not None and args.model == "two_stream":
        # Fusion windows need the session's per-frame landmarks alongside
        # the video — fail BEFORE the minutes-long model compile.
        if not args.landmarks_stream:
            raise SystemExit(
                "error: --windows with the fusion model needs "
                "--landmarks-stream FILE.npy ([T, 543, 3] aligned to the "
                "video's frames)"
            )
        if len(args.clips) != 1:
            raise SystemExit(
                "error: --landmarks-stream aligns to ONE video; pass "
                "exactly one clip"
            )
    model = _load(args)
    if args.windows is not None:
        return _predict_windows(args, model)
    landmarks_for = None
    if model.takes_landmarks:
        if not args.landmarks_dir:
            raise SystemExit(
                f"error: model '{args.model}' consumes landmarks; pass "
                "--landmarks-dir with precomputed <video_id>.npy files"
            )
        from asltpu.data.landmarks import LandmarkStore

        nf = getattr(model.cfg, "num_frames", 16)
        landmarks_for = LandmarkStore(args.landmarks_dir).for_path(nf)
    gloss_names = None
    if args.index:
        ds = WLASLIndex(args.index, args.videos or "", subset=model.cfg.num_classes)
        gloss_names = ds.glosses
    for path, gloss, logits in api.stream_predict(
        model, args.clips, batch_size=args.batch, gloss_names=gloss_names,
        landmarks_for=landmarks_for, skip_errors=args.skip_errors,
        decode_backend=args.decode_backend,
        decode_fast=args.decode_fast,
    ):
        print(json.dumps({
            "clip": path, "gloss": gloss, "top5": _top5(logits, gloss_names),
        }))
    return 0


def _predict_windows(args, model) -> int:
    """``asl predict --windows S clip...`` — continuous recognition: one
    JSON line per video with the merged gloss segments and the per-window
    trace (asltpu.windows)."""
    from asltpu.data.wlasl import WLASLIndex
    from asltpu.windows import merge_windows, predict_windows, segments_json

    gloss_names = None
    if args.index:
        gloss_names = WLASLIndex(
            args.index, args.videos or "", subset=model.cfg.num_classes
        ).glosses
    landmark_stream = None
    if args.landmarks_stream:
        import numpy as np

        landmark_stream = np.load(args.landmarks_stream, allow_pickle=False)
    for path in args.clips:
        wins = predict_windows(
            model, path,
            window_seconds=args.windows,
            stride_seconds=args.window_stride,
            batch_size=args.batch,
            gloss_names=gloss_names,
            decode_backend=args.decode_backend,
            decode_fast=args.decode_fast,
            landmark_stream=landmark_stream,
        )
        segs = merge_windows(wins, min_prob=args.min_prob)
        print(json.dumps({
            "clip": path,
            "segments": segments_json(segs),
            "windows": [
                {"start_s": round(w.start_s, 3), "end_s": round(w.end_s, 3),
                 "gloss": w.gloss, "prob": round(w.prob, 4)}
                for w in wins
            ],
        }))
    return 0


def _top5(logits, gloss_names):
    from asltpu.eval.metrics import topk_entries

    return topk_entries(logits, gloss_names)


def _predict_exported(args) -> int:
    """``asl predict --exported DIR clip...`` — run a deployment artifact
    (asltpu.export): serialized StableHLO program + weights, no model
    build/compile. One clip at a time through ExportedModel.predict (the
    batched service path over artifacts is PredictServer over load_model;
    this is the deployment-artifact demo/debug lane)."""
    from asltpu import api
    from asltpu.export import load_exported

    em = load_exported(args.exported)
    gloss_names = None
    if args.index:
        from asltpu.data.wlasl import WLASLIndex

        gloss_names = WLASLIndex(
            args.index, args.videos or "", subset=em.cfg.num_classes
        ).glosses
    lm_lookup = None
    if em.takes_landmarks:
        if not args.landmarks_dir:
            raise SystemExit(
                "error: exported model consumes landmarks; pass "
                "--landmarks-dir with precomputed <video_id>.npy files"
            )
        from asltpu.data.landmarks import LandmarkStore

        t = em.preprocess.num_frames if em.preprocess else em.cfg.num_frames
        lm_lookup = LandmarkStore(args.landmarks_dir).for_path(t)
    for path in args.clips:
        kw = {}
        if em.takes_rgb:
            kw["frames"] = api.load_clip(path, em.preprocess)
        if em.takes_landmarks:
            kw["landmarks"] = lm_lookup(path)
        gloss, logits = em.predict(gloss_names=gloss_names, **kw)
        print(json.dumps({
            "clip": path, "gloss": gloss, "top5": _top5(logits, gloss_names),
        }))
    return 0


def cmd_export(args) -> int:
    from asltpu.export import export_model, load_exported

    model = _load(args)
    meta = export_model(model, args.out, batch_size=args.batch)
    print(json.dumps({
        "out": args.out,
        "family": meta["family"],
        "batch_size": meta["batch_size"],
        "platforms": meta["platforms"],
        "inputs": meta["inputs"],
    }))
    if args.verify_clip:
        # Round-trip proof in one command: reload the artifact and run a
        # real clip through the serialized program.
        from asltpu import api

        em = load_exported(args.out)
        if em.takes_landmarks:
            raise SystemExit(
                "error: --verify-clip supports RGB-only models (landmark "
                "inputs need --landmarks-dir; use asl predict --exported)"
            )
        clip = api.load_clip(args.verify_clip, em.preprocess)
        gloss, logits = em.predict(frames=clip)
        print(json.dumps({
            "verify_clip": args.verify_clip, "gloss": gloss,
            "top5": _top5(logits, None),
        }))
    return 0


def cmd_train(args) -> int:
    import numpy as np

    from asltpu.api import build_module, _dummy_inputs
    from asltpu.config import TrainConfig, get_config
    from asltpu.data.decode import decode_record
    from asltpu.data.pad import pad_to_batch
    from asltpu.data.wlasl import WLASLIndex, batches_from_records
    from asltpu.train.loop import train

    from asltpu.config import CONFIG_REGISTRY as _REG

    if args.model not in _REG:
        raise SystemExit(
            f"error: unknown model '{args.model}' "
            f"(choices: {', '.join(sorted(_REG))})"
        )
    overrides = _model_overrides(args)
    pp_overrides = dict(overrides.get("preprocess", {}))
    if args.frames:
        pp_overrides["num_frames"] = args.frames
    if args.crop:
        # Keep the aspect chain consistent: staging/resize scale with crop
        # by the standard 256/224 ratio.
        pp_overrides.update(
            crop=args.crop,
            resize_short=round(args.crop * 256 / 224),
            staging_size=(round(args.crop * 256 / 224),) * 2,
        )
    if pp_overrides:
        overrides["preprocess"] = pp_overrides
    cfg = get_config(args.model, **overrides)
    # RGB-only lane: a landmark-consuming model (no preprocess, OR
    # video+landmark fusion) would otherwise pass init and fail minutes
    # later deep inside the jitted step when `train=True` binds to the
    # missing landmarks argument.
    if not hasattr(cfg, "preprocess") or hasattr(cfg, "num_landmarks"):
        raise SystemExit(
            "error: CLI training decodes RGB clips only; landmark-consuming "
            "models (pose_bilstm, two_stream) train via the library API "
            "with precomputed landmarks (see asltpu.train.loop.train)"
        )
    mesh = None
    if getattr(args, "model_parallel", 1) > 1:
        # Tensor parallelism (asltpu.dist.tp): train() places the state
        # under the Megatron per-leaf shardings when the model axis is >1.
        # Validate shape divisibility NOW — before dataset setup and model
        # init — instead of letting the first device_put of a
        # non-divisible q/k/v kernel fail with an opaque sharding error.
        from asltpu.dist.mesh import make_mesh
        from asltpu.dist.tp import validate_tp_divisibility

        try:
            if hasattr(cfg, "num_heads"):
                validate_tp_divisibility(
                    cfg.num_heads, cfg.d_model, cfg.mlp_ratio,
                    args.model_parallel,
                )
            mesh = make_mesh(model_parallel=args.model_parallel)
        except ValueError as e:
            raise SystemExit(f"error: --model-parallel: {e}")
    module = build_module(cfg)
    tcfg = TrainConfig(
        batch_size=args.batch,
        num_steps=args.steps,
        learning_rate=args.lr,
        **({"warmup_steps": args.warmup} if args.warmup is not None else {}),
        ckpt_dir=args.ckpt_dir,
        log_every=args.log_every,
        ckpt_every=args.ckpt_every,
        eval_every=args.eval_every,
        fault_inject_step=args.fault_inject_step,
    )
    ds = WLASLIndex(args.index, args.videos, subset=cfg.num_classes)
    records = ds.split("train")
    if not records:
        log.error("no train clips with videos on disk")
        return 2
    if len(records) < tcfg.batch_size:
        # With drop_remainder batching, fewer records than one batch would
        # make the records loader spin forever yielding nothing.
        raise SystemExit(
            f"error: {len(records)} train clips < batch size "
            f"{tcfg.batch_size}; lower --batch or add data"
        )
    pp = getattr(cfg, "preprocess", None)

    resumable_iter = None
    if args.loader == "grain":
        # Deterministic, RESUMABLE input pipeline: the grain iterator state
        # is checkpointed with the train state, so a resumed run continues
        # the data stream (no repeats/skips). worker_count=0 keeps decode
        # in-process on small hosts; raise it on multi-core machines.
        from asltpu import ckpt as _ckpt
        from asltpu.data.loader import ResumableIterator, make_train_loader

        loader = make_train_loader(
            records, pp, tcfg.batch_size, seed=tcfg.seed,
            num_epochs=None, worker_count=args.loader_workers,
        )
        raw_iter = iter(loader)
        saved = _ckpt.load_data_state(args.ckpt_dir)
        if saved is not None:
            raw_iter.set_state(saved)
            log.info("restored grain iterator state from %s", args.ckpt_dir)
        resumable_iter = ResumableIterator(raw_iter)

        def batches():
            for frames, labels in resumable_iter:
                yield frames, np.asarray(labels, np.int32)

    else:

        def batches():
            # Decode each shuffled record batch through the pooled decoder
            # (native C++ batch decode when built — parallel, GIL-free)
            # instead of a serial per-record loop.
            from asltpu.data.decode import make_decode_pool

            pool = make_decode_pool(pp, num_workers=4)
            try:
                for recs in batches_from_records(records, tcfg.batch_size,
                                                 seed=tcfg.seed):
                    # on_error="skip": one corrupt clip in a scraped WLASL
                    # download must not kill an hours-long run (the pool
                    # logs each skip; the padding below re-fills the batch).
                    for frames, kept in pool.map_batches(
                        recs, tcfg.batch_size, "skip"
                    ):
                        # padded rows repeat the last clip; mirror that
                        # in the labels so shapes stay static
                        labels = pad_to_batch(
                            np.asarray([recs[k].label for k in kept],
                                       np.int32),
                            tcfg.batch_size,
                        )
                        yield frames, labels
            finally:
                pool.shutdown()

    if args.debug_nans:
        from asltpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)
    from asltpu.data.prefetch import Prefetcher
    from asltpu.ops.augment import AugmentConfig

    eval_batches = None
    eval_records = ds.split(args.eval_split) if args.eval_split else []
    if eval_records:
        eval_cache: list = []

        def eval_batches():
            # Eval splits are small and fixed: decode once, reuse every
            # eval cycle (re-decoding serially stalls the TPU for minutes).
            # The final PARTIAL batch is kept (frames padded by repeating
            # the last clip, labels padded with -1 so run_eval excludes the
            # pad rows) — dropping it silently excluded up to batch_size-1
            # clips from every reported metric, and reported 0.0 forever
            # when the whole split was smaller than one batch.
            if not eval_cache:
                for i in range(0, len(eval_records), tcfg.batch_size):
                    recs = eval_records[i : i + tcfg.batch_size]
                    frames = pad_to_batch(
                        np.stack([decode_record(r, pp) for r in recs]),
                        tcfg.batch_size,
                    )
                    labels = pad_to_batch(
                        np.asarray([r.label for r in recs], np.int32),
                        tcfg.batch_size, fill=-1,
                    )
                    eval_cache.append((frames, labels))
            yield from eval_cache

    state = train(
        module, tcfg, Prefetcher(batches(), depth=2), _dummy_inputs(cfg),
        pp_cfg=pp, mesh=mesh, metric_writer=MetricsWriter(args.log_dir),
        augment=None if args.no_augment else AugmentConfig(),
        eval_batches=eval_batches,
        resumable_iter=resumable_iter,
        # Route param init through the CPU-subprocess cache + packed upload
        # (on the relay host, an on-TPU full-model init program costs a
        # minutes-long remote compile AND degrades the link ~50×).
        model_cfg=cfg,
    )
    log.info("training done at step %d", int(state.step))
    return 0


def cmd_eval(args) -> int:
    from asltpu.config import CONFIG_REGISTRY
    from asltpu.data.wlasl import WLASLIndex
    from asltpu.eval.metrics import evaluate_split

    if args.model not in CONFIG_REGISTRY:
        raise SystemExit(
            f"error: unknown model '{args.model}'; choose from "
            f"{', '.join(sorted(CONFIG_REGISTRY))}"
        )
    # Default the gloss subset from the MODEL's contract (i3d → WLASL-2000),
    # not a fixed 100 — otherwise `asl eval --model i3d` silently scores a
    # different benchmark than the model was built for. Honor BOTH override
    # spellings (`--num-classes` and `--set num_classes=`): the model is
    # built from _model_overrides(args), so deriving the subset from
    # args.num_classes alone would evaluate a --set-overridden model against
    # the registry-default gloss subset.
    subset = _model_overrides(args).get(
        "num_classes", CONFIG_REGISTRY[args.model]().num_classes
    )
    # Parse the index before the (minutes-long) model compile so bad paths
    # and empty splits fail fast.
    ds = WLASLIndex(args.index, args.videos, subset=subset)
    if not ds.split(args.split):
        raise SystemExit(
            f"error: no clips with videos on disk for split '{args.split}'"
        )
    model = _load(args)
    landmarks_for = None
    if model.takes_landmarks:
        if not args.landmarks_dir:
            raise SystemExit(
                f"error: model '{args.model}' consumes landmarks; pass "
                "--landmarks-dir with precomputed <video_id>.npy files"
            )
        from asltpu.data.landmarks import LandmarkStore

        nf = getattr(model.cfg, "num_frames", 16)
        landmarks_for = LandmarkStore(args.landmarks_dir).for_path(nf)
    metrics = evaluate_split(
        model, ds.split(args.split), batch_size=args.batch,
        max_clips=args.max_clips, landmarks_for=landmarks_for,
        skip_errors=args.skip_errors, per_class=args.per_class,
        gloss_names=ds.glosses,
    )
    print(json.dumps(metrics))
    return 0


def cmd_landmarks(args) -> int:
    """Dataset-prep: extract + store landmarks for a WLASL split (C4)."""
    from asltpu.data.landmarks import (
        LandmarkStore,
        MediaPipeExtractor,
        SyntheticExtractor,
        precompute_landmarks,
    )
    from asltpu.data.wlasl import WLASLIndex

    ds = WLASLIndex(args.index, args.videos, subset=args.num_classes)
    records = [r for s in args.splits.split(",") for r in ds.split(s)]
    if not records:
        raise SystemExit("error: no clips with videos on disk")
    if args.extractor == "mediapipe":
        extractor = MediaPipeExtractor()
    else:
        extractor = SyntheticExtractor(num_frames=64)
    store = LandmarkStore(args.out)
    n = precompute_landmarks(records, store, extractor,
                             overwrite=args.overwrite)
    print(json.dumps({"written": n, "store": args.out}))
    return 0


def cmd_serve(args) -> int:
    """Run the HTTP inference server (dynamic batching on one chip)."""
    from asltpu.data.wlasl import WLASLIndex
    from asltpu.serve_http import serve

    model = _load(args)
    gloss_names = None
    if args.index:
        gloss_names = WLASLIndex(
            args.index, "", subset=model.cfg.num_classes
        ).glosses
    buckets = (
        tuple(int(b) for b in args.batch_buckets.split(","))
        if args.batch_buckets else None
    )
    log.info("serving %s on %s:%d", args.model, args.host, args.port)
    serve(model, host=args.host, port=args.port, max_batch=args.max_batch,
          max_delay_ms=args.max_delay_ms, gloss_names=gloss_names,
          batch_buckets=buckets, warm=buckets is not None)
    return 0


def cmd_bench(args) -> int:
    import sys as _sys

    from asltpu.benchmark import main as bench_main

    _sys.argv = ["asl-bench"] + args.rest
    return bench_main()


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(prog="asl", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("predict", help="predict gloss for clip(s)")
    p.add_argument("--decode-backend", default="auto",
                   choices=["auto", "native", "av", "process", "thread"],
                   help="decode pool backend; 'av' = direct libavcodec "
                        "(fastest on >=480p sources, tolerance-parity)")
    p.add_argument("--decode-fast", action="store_true",
                   help="codec-level work reduction (av backend only): "
                        "DCT-domain reduced-res decode + loop-filter/"
                        "nonref skip; approximate decode")
    _add_model_args(p)
    p.add_argument("clips", nargs="+")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--index", default=None, help="WLASL index json for gloss names")
    p.add_argument("--videos", default=None)
    p.add_argument("--landmarks-dir", default=None,
                   help="precomputed <video_id>.npy landmarks (pose/fusion)")
    p.add_argument("--skip-errors", action="store_true",
                   help="skip undecodable clips instead of failing")
    p.add_argument("--exported", default=None, metavar="DIR",
                   help="run a deployment artifact (asl export) instead of "
                        "building a model — no model code or compile")
    p.add_argument("--windows", type=float, default=None, metavar="SECONDS",
                   help="continuous recognition: classify sliding windows "
                        "of this duration over each video and print merged "
                        "gloss segments (RGB models; asltpu.windows)")
    p.add_argument("--window-stride", type=float, default=None,
                   metavar="SECONDS",
                   help="window hop (default: half the window — 50%% "
                        "overlap)")
    p.add_argument("--min-prob", type=float, default=0.0,
                   help="windows whose top softmax probability falls below "
                        "this merge into 'uncertain' segments (gloss null) "
                        "instead of asserting a gloss")
    p.add_argument("--landmarks-stream", default=None, metavar="NPY",
                   help="with --windows on the fusion model: the session's "
                        "per-frame [T, 543, 3] landmarks aligned to the "
                        "(single) video's frames")
    p.set_defaults(fn=cmd_predict)

    p = sub.add_parser(
        "export",
        help="serialize the inference program + weights for deployment",
    )
    _add_model_args(p)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--batch", type=int, default=8,
                   help="fixed program batch size (static shapes; callers "
                        "pad — same discipline as serving)")
    p.add_argument("--verify-clip", default=None, metavar="CLIP",
                   help="after export, reload the artifact and predict this "
                        "clip through the serialized program (RGB models)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("train", help="train/fine-tune a model")
    _add_model_args(p)
    p.add_argument("--index", required=True)
    p.add_argument("--videos", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup", type=int, default=None,
                   help="LR warmup steps (default: TrainConfig's 500; a "
                        "short run wants this well below --steps or the "
                        "schedule never leaves the ramp)")
    p.add_argument("--ckpt-dir", default="/tmp/asltpu_ckpt")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--fault-inject-step", type=int, default=-1,
                   help="raise at step N to test resume (SURVEY.md §5.3)")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (SURVEY.md §5.2 debug mode)")
    p.add_argument("--eval-split", default=None,
                   help="run top-1/top-5 on this split every --eval-every")
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--frames", type=int, default=None,
                   help="override clip frame count")
    p.add_argument("--crop", type=int, default=None,
                   help="override crop size (staging/resize scale with it)")
    p.add_argument("--no-augment", action="store_true",
                   help="disable train-time augmentation")
    p.add_argument("--loader", choices=["records", "grain"], default="records",
                   help="input pipeline: 'grain' = deterministic + resumable "
                        "(iterator state checkpointed); 'records' = simple "
                        "in-process shuffle")
    p.add_argument("--loader-workers", type=int, default=0,
                   help="grain decode worker processes (0 = in-process; "
                        "raise on multi-core hosts)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the mesh's model axis (tensor parallelism, "
                        "asltpu.dist.tp): Megatron-shards the transformer "
                        "head's attention/MLP params + adamw moments; "
                        "device count must divide evenly. Models without "
                        "an attention head run plain DP under it")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="top-1/top-5 on a WLASL split")
    _add_model_args(p)
    p.add_argument("--index", required=True)
    p.add_argument("--videos", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--max-clips", type=int, default=None)
    p.add_argument("--landmarks-dir", default=None,
                   help="precomputed <video_id>.npy landmarks (pose/fusion)")
    p.add_argument("--skip-errors", action="store_true",
                   help="skip undecodable clips instead of failing")
    p.add_argument("--per-class", action="store_true",
                   help="also report macro_top1 (mean per-class accuracy — "
                        "the WLASL literature's class-imbalance-robust "
                        "aggregate) and the per-gloss breakdown, worst first")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("serve", help="HTTP inference server")
    _add_model_args(p)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; the endpoint is unauthenticated, so "
                        "binding non-loopback (e.g. 0.0.0.0) is an explicit "
                        "opt-in")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--max-delay-ms", type=float, default=10.0)
    p.add_argument("--batch-buckets", default=None, metavar="B1,B2,...",
                   help="low-latency policy: pad partial batches to the "
                        "smallest listed program size instead of max-batch "
                        "(e.g. 1,4,8); all buckets compile before the "
                        "socket opens")
    p.add_argument("--index", default=None, help="WLASL index for gloss names")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("landmarks", help="precompute pose landmarks (C4)")
    p.add_argument("--index", required=True)
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True, help="output .npy store dir")
    p.add_argument("--num-classes", type=int, default=100)
    p.add_argument("--splits", default="train,val,test")
    p.add_argument("--extractor", choices=["mediapipe", "synthetic"],
                   default="mediapipe")
    p.add_argument("--overwrite", action="store_true")
    p.set_defaults(fn=cmd_landmarks)

    p = sub.add_parser("bench", help="run the north-star benchmark")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)
