"""asltpu.eval — accuracy evaluation + parity harness."""

from asltpu.eval.metrics import evaluate_split, topk_accuracy  # noqa: F401
