"""Profiling helpers (SURVEY.md §5.1): ``jax.profiler`` TPU traces +
named scopes + a NaN-debug mode flag."""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TPU trace viewable in TensorBoard/Perfetto:

        with trace("/tmp/asltpu_trace"):
            fn(...)  # traced
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Alias for ``jax.named_scope`` — annotates HLO for trace readability."""
    return jax.named_scope(name)


def enable_nan_debugging(enable: bool = True):
    """Turn on jax_debug_nans (SURVEY.md §5.2 debug mode)."""
    jax.config.update("jax_debug_nans", enable)
