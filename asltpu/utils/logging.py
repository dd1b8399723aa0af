"""Structured logging + per-step metrics (SURVEY.md §5.5).

The metrics writer emits both human-readable log lines and a CSV (and, when
available, TensorBoard event files via flax's metric_writers-free fallback)
— intentionally dependency-light.
"""

from __future__ import annotations

import csv
import logging
import os
import sys
import time
from typing import Dict, Optional

_FORMAT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "asltpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, "%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class MetricsWriter:
    """Per-step scalar metrics → log line + CSV row.

    Usable as the ``metric_writer`` callback of :func:`asltpu.train.train`.
    """

    def __init__(self, log_dir: Optional[str] = None, name: str = "train"):
        self._log = get_logger(f"asltpu.{name}")
        self._csv_path = None
        self._csv_keys = None
        self._t0 = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._csv_path = os.path.join(log_dir, f"{name}_metrics.csv")

    def __call__(self, step: int, metrics: Dict[str, float]):
        self.write(step, metrics)

    def write(self, step: int, metrics: Dict[str, float]):
        parts = " ".join(f"{k}={v:.4g}" for k, v in sorted(metrics.items()))
        self._log.info("step %d: %s", step, parts)
        if self._csv_path:
            keys = ["step", "wall_time"] + sorted(metrics)
            row = {"step": step, "wall_time": round(time.time() - self._t0, 3),
                   **{k: metrics[k] for k in sorted(metrics)}}
            fresh = self._csv_keys != keys
            if fresh:
                self._csv_keys = keys
            with open(self._csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=keys)
                if fresh:
                    w.writeheader()
                w.writerow(row)
