"""Direct tests for the metrics/logging and profiling utilities
(SURVEY.md §5.1/§5.5) — previously exercised only indirectly through the
train loop and ``bench --trace``."""

import csv
import os

from asltpu.utils.logging import MetricsWriter
from asltpu.utils.profiling import enable_nan_debugging, named_scope, trace


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.DictReader(f))


def test_metrics_writer_schema_keyed_csvs(tmp_path):
    """Interleaved train/eval writes land in SEPARATE well-formed CSVs, and
    a third schema gets its own content-hashed file."""
    w = MetricsWriter(str(tmp_path), name="train")
    w(1, {"loss": 1.5, "top1": 0.0})
    w(2, {"eval_top1": 0.25, "eval_top5": 1.0})
    w(2, {"loss": 1.2, "top1": 0.5})
    w(3, {"grad_ratio": 0.9})

    train_rows = _read_csv(tmp_path / "train_metrics.csv")
    assert [r["step"] for r in train_rows] == ["1", "2"]
    assert float(train_rows[1]["loss"]) == 1.2
    eval_rows = _read_csv(tmp_path / "train_metrics_eval.csv")
    assert [r["step"] for r in eval_rows] == ["2"]
    hashed = [p for p in os.listdir(tmp_path)
              if p.startswith("train_metrics_") and "eval" not in p]
    assert len(hashed) == 1
    assert _read_csv(tmp_path / hashed[0])[0]["grad_ratio"] == "0.9"


def test_metrics_writer_resumed_run_appends_without_duplicate_header(
    tmp_path,
):
    """A resumed run (fresh writer, same log_dir) must append to the SAME
    schema-content-keyed file and not write a second header row."""
    MetricsWriter(str(tmp_path))(1, {"loss": 2.0, "top1": 0.0})
    MetricsWriter(str(tmp_path))(2, {"loss": 1.0, "top1": 0.5})
    path = tmp_path / "train_metrics.csv"
    rows = _read_csv(path)
    assert [r["step"] for r in rows] == ["1", "2"]
    with open(path) as f:
        assert sum(1 for line in f if line.startswith("step,")) == 1


def test_metrics_writer_without_log_dir_logs_only(capsys, tmp_path):
    """log_dir=None: log lines only, no files (the CLI's default)."""
    w = MetricsWriter(None)
    w(7, {"loss": 0.5})
    assert not any(p.endswith(".csv") for p in os.listdir(tmp_path))


def test_profiling_helpers(tmp_path):
    """trace() produces profiler artifacts; named_scope/nan-debug toggle
    compose with jitted code."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        with named_scope("double"):
            return x * 2

    with trace(str(tmp_path)):
        jax.block_until_ready(f(jnp.ones((4,))))
    found = [
        os.path.join(dp, fn)
        for dp, _, fns in os.walk(tmp_path)
        for fn in fns
    ]
    assert found, "trace() wrote no profiler artifacts"

    enable_nan_debugging(True)
    try:
        assert jax.config.jax_debug_nans
    finally:
        enable_nan_debugging(False)
    assert not jax.config.jax_debug_nans
