"""asltpu.eval — accuracy evaluation + parity harness."""

from asltpu.eval.metrics import (  # noqa: F401
    confusion_matrix,
    evaluate_split,
    per_class_metrics,
    topk_accuracy,
)
