"""CLI entry points (C13) driven end-to-end on the virtual CPU mesh:
landmarks prep → predict → eval → train, through ``asltpu.cli.main`` with
real argv, synthetic WLASL fixtures, and captured stdout."""

import json

import numpy as np
import pytest

from asltpu.cli.main import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, [json.loads(line) for line in out.splitlines() if line.strip()]


@pytest.fixture(scope="module")
def landmark_store(tmp_path_factory, tiny_wlasl_module):
    index, videos = tiny_wlasl_module
    out = str(tmp_path_factory.mktemp("lm"))
    rc = main([
        "landmarks", "--index", index, "--videos", videos, "--out", out,
        "--num-classes", "6", "--extractor", "synthetic",
    ])
    assert rc == 0
    return out


@pytest.fixture(scope="module")
def tiny_wlasl_module(tmp_path_factory):
    from asltpu.data.synthetic import make_synthetic_wlasl

    root = str(tmp_path_factory.mktemp("wlasl"))
    # 3 clips/gloss → 12 train records (≥ the batch-8 train test below;
    # fewer than one batch makes cmd_train fail fast by design).
    index, videos = make_synthetic_wlasl(
        root, num_glosses=6, clips_per_gloss=3, num_frames=12, size=(64, 64),
        splits=["train", "test"],
    )
    return index, videos


def test_cli_landmarks_then_predict_pose(capsys, landmark_store,
                                         tiny_wlasl_module):
    index, videos = tiny_wlasl_module
    from asltpu.data.wlasl import WLASLIndex

    recs = WLASLIndex(index, videos, subset=6).split("train")[:2]
    rc, rows = _run(capsys, [
        "predict", recs[0].path, recs[1].path,
        "--model", "pose_bilstm", "--num-classes", "6", "--batch", "2",
        "--index", index, "--landmarks-dir", landmark_store,
    ])
    assert rc == 0
    assert len(rows) == 2
    for row in rows:
        assert isinstance(row["gloss"], str)
        assert len(row["top5"]) == 5


def test_cli_eval_pose(capsys, landmark_store, tiny_wlasl_module):
    index, videos = tiny_wlasl_module
    rc, rows = _run(capsys, [
        "eval", "--model", "pose_bilstm", "--num-classes", "6",
        "--index", index,
        "--videos", videos, "--split", "test", "--batch", "2",
        "--landmarks-dir", landmark_store,
        "--per-class",
    ])
    assert rc == 0
    (metrics,) = rows
    assert {"top1", "top5", "num_clips", "macro_top1", "per_class"} <= set(
        metrics
    )
    assert metrics["num_clips"] > 0
    # Per-gloss rows carry REAL gloss names from the index and the supports
    # sum to the evaluated clip count.
    assert all(isinstance(r["gloss"], str) for r in metrics["per_class"])
    assert sum(r["n"] for r in metrics["per_class"]) == metrics["num_clips"]


def test_cli_predict_validates_inputs(tiny_wlasl_module):
    index, _ = tiny_wlasl_module
    with pytest.raises(SystemExit):
        main(["predict", "/nope/missing.mp4"])
    with pytest.raises(SystemExit):
        main(["predict", index, "--model", "not_a_model"])


def test_cli_train_records_loader(tmp_path, tiny_wlasl_module):
    """Two train steps through the full CLI stack (decode pool → augment →
    train step → checkpoint) at tiny shapes."""
    index, videos = tiny_wlasl_module
    rc = main([
        "train", "--model", "mobilenet_gru", "--num-classes", "6",
        "--set", "gru_hidden=16",  # small head: the CPU-mesh compile cost
        "--index", index, "--videos", videos,
        "--batch", "8", "--steps", "2", "--log-every", "1",
        "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "2",
        "--frames", "2", "--crop", "32", "--no-augment",
    ])
    assert rc == 0
    import os

    assert os.path.isdir(str(tmp_path / "ck" / "2"))


def test_cli_train_model_parallel(tmp_path, tiny_wlasl_module):
    """`asl train --model-parallel 2` runs the TP train path (Megatron
    placements over the 8-device mesh's model axis) through the full CLI
    stack; resnet_transformer is the family whose head actually shards."""
    index, videos = tiny_wlasl_module
    rc = main([
        "train", "--model", "resnet_transformer", "--num-classes", "6",
        "--set", "d_model=32", "--set", "num_tx_layers=1",
        "--set", "num_heads=2",
        "--index", index, "--videos", videos,
        "--batch", "8", "--steps", "2", "--log-every", "1",
        "--ckpt-dir", str(tmp_path / "ck"), "--ckpt-every", "2",
        "--frames", "2", "--crop", "32", "--no-augment",
        "--model-parallel", "2",
    ])
    assert rc == 0
    import os

    assert os.path.isdir(str(tmp_path / "ck" / "2"))


def test_cli_train_model_parallel_fails_fast_on_shapes(tmp_path,
                                                       tiny_wlasl_module):
    """Non-divisible head shapes under --model-parallel must die with a
    clear SystemExit BEFORE dataset setup, not an opaque sharding error
    from the first device_put."""
    index, videos = tiny_wlasl_module
    with pytest.raises(SystemExit, match="model-parallel"):
        main([
            "train", "--model", "resnet_transformer", "--num-classes", "6",
            "--set", "d_model=32", "--set", "num_heads=3",
            "--index", index, "--videos", videos,
            "--batch", "8", "--steps", "1",
            "--ckpt-dir", str(tmp_path / "ck"),
            "--frames", "2", "--crop", "32", "--no-augment",
            "--model-parallel", "2",
        ])


def test_cli_train_fails_fast_when_underfull(tmp_path, tiny_wlasl_module):
    """Fewer train records than one batch must error, not spin forever."""
    index, videos = tiny_wlasl_module
    with pytest.raises(SystemExit):
        main([
            "train", "--model", "mobilenet_gru", "--num-classes", "6",
            "--index", index, "--videos", videos,
            "--batch", "64", "--steps", "1",
            "--ckpt-dir", str(tmp_path / "ck"),
            "--frames", "2", "--crop", "32", "--no-augment",
        ])


def test_cli_predict_decode_fast(capsys, tiny_wlasl_module):
    """`asl predict --decode-backend av --decode-fast` drives the
    codec-level fast-decode lane through the CLI. Flag contract matches
    bench: --decode-fast with the default (auto) backend implies av;
    with any OTHER explicit backend it fails fast BEFORE the model
    compile (the flag has no meaning elsewhere)."""
    from asltpu import native

    if not native.av_available():
        pytest.skip(f"native av decode: {native.av_unavailable_reason()}")
    index, videos = tiny_wlasl_module
    from asltpu.data.wlasl import WLASLIndex

    recs = WLASLIndex(index, videos, subset=6).split("train")[:2]
    small = ["--set", "gru_hidden=16", "--set", "preprocess.num_frames=2",
             "--set", "preprocess.staging_size=(48,48)",
             "--set", "preprocess.resize_short=40",
             "--set", "preprocess.crop=32"]
    rc, rows = _run(capsys, [
        "predict", recs[0].path, recs[1].path,
        "--model", "mobilenet_gru", "--num-classes", "6", "--batch", "2",
        "--decode-backend", "av", "--decode-fast", *small,
    ])
    assert rc == 0 and len(rows) == 2
    # auto + --decode-fast upgrades to the av backend (bench semantics).
    rc, rows = _run(capsys, [
        "predict", recs[0].path,
        "--model", "mobilenet_gru", "--num-classes", "6",
        "--decode-fast", *small,
    ])
    assert rc == 0 and len(rows) == 1
    # An explicit non-av backend contradicts --decode-fast: SystemExit
    # during argument validation, before any model build.
    with pytest.raises(SystemExit, match="decode-fast"):
        main([
            "predict", recs[0].path,
            "--model", "mobilenet_gru", "--num-classes", "6",
            "--decode-backend", "native", "--decode-fast", *small,
        ])


def test_cli_av_backend_unavailable_fails_before_compile(
    monkeypatch, tiny_wlasl_module
):
    """An av backend that can't load must fail during argument validation —
    not minutes later inside stream_predict after the model compile. The
    probe is monkeypatched so the test is meaningful on hosts where the
    real library builds fine."""
    from asltpu import native

    monkeypatch.setattr(native, "av_available", lambda: False)
    monkeypatch.setattr(
        native, "av_unavailable_reason", lambda: "forced-off for test"
    )
    index, videos = tiny_wlasl_module
    from asltpu.data.wlasl import WLASLIndex

    rec = WLASLIndex(index, videos, subset=6).split("train")[0]
    # _load would compile a model; make reaching it the failure mode.
    # (asltpu.cli re-exports a `main` FUNCTION, which `import a.b as c`
    # resolves in preference to the submodule — go through importlib.)
    import importlib

    cli_main = importlib.import_module("asltpu.cli.main")

    def _boom(args):  # pragma: no cover - only on regression
        raise AssertionError("model compile reached despite av unavailable")

    monkeypatch.setattr(cli_main, "_load", _boom)
    for extra in (["--decode-fast"], ["--decode-backend", "av"]):
        with pytest.raises(SystemExit, match="unavailable"):
            main([
                "predict", rec.path,
                "--model", "mobilenet_gru", "--num-classes", "6", *extra,
            ])
    # Same contract in the bench entry point (argparse exits with code 2
    # from ap.error, before load_model/corpus/settle).
    import sys as _sys

    import asltpu.benchmark as benchmark

    monkeypatch.setattr(_sys, "argv", ["bench", "--decode-fast"])
    with pytest.raises(SystemExit):
        benchmark.main()
