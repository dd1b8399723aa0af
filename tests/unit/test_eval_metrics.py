"""Eval metrics (C: eval layer, SURVEY.md §1.3): per-class accuracy,
macro_top1 (the WLASL literature's class-imbalance-robust aggregate), and
the confusion matrix."""

import numpy as np

from asltpu.eval.metrics import (
    confusion_matrix,
    per_class_metrics,
    topk_accuracy,
)


def _onehotish(preds, num_classes):
    """Logits whose argmax is exactly ``preds``."""
    logits = np.zeros((len(preds), num_classes), dtype=np.float32)
    logits[np.arange(len(preds)), preds] = 1.0
    return logits


def test_confusion_matrix_counts():
    labels = np.array([0, 0, 1, 2, 2, 2])
    preds = np.array([0, 1, 1, 2, 2, 0])
    cm = confusion_matrix(_onehotish(preds, 3), labels)
    assert cm.shape == (3, 3)
    expected = np.array([[1, 1, 0], [0, 1, 0], [1, 0, 2]])
    np.testing.assert_array_equal(cm, expected)
    # Row sums = class supports; total = N.
    np.testing.assert_array_equal(cm.sum(axis=1), [2, 1, 3])
    assert cm.sum() == len(labels)


def test_confusion_matrix_from_predictions_vector():
    labels = np.array([0, 1, 1])
    preds = np.array([1, 1, 0])
    cm = confusion_matrix(preds, labels, num_classes=2)
    np.testing.assert_array_equal(cm, [[0, 1], [1, 1]])


def test_macro_differs_from_instance_on_imbalance():
    # 9 clips of class 0 all correct, 1 clip of class 1 wrong:
    # instance top1 = 0.9, macro = mean(1.0, 0.0) = 0.5.
    labels = np.array([0] * 9 + [1])
    preds = np.array([0] * 9 + [0])
    logits = _onehotish(preds, 2)
    assert topk_accuracy(logits, labels, ks=(1,))["top1"] == 0.9
    m = per_class_metrics(logits, labels)
    assert m["macro_top1"] == 0.5
    # Worst gloss first.
    assert [r["gloss"] for r in m["per_class"]] == [1, 0]
    assert m["per_class"][0] == {"gloss": 1, "top1": 0.0, "n": 1}
    assert m["per_class"][1] == {"gloss": 0, "top1": 1.0, "n": 9}


def test_absent_classes_excluded_from_macro():
    # 4-class model, only classes 0 and 2 present in the split: the two
    # absent classes must not drag the macro mean down as zeros.
    labels = np.array([0, 0, 2, 2])
    preds = np.array([0, 0, 2, 3])
    m = per_class_metrics(_onehotish(preds, 4), labels)
    assert m["macro_top1"] == 0.75  # mean(1.0, 0.5)
    assert len(m["per_class"]) == 2
    assert {r["gloss"] for r in m["per_class"]} == {0, 2}


def test_gloss_names_resolved():
    labels = np.array([0, 1])
    preds = np.array([0, 1])
    m = per_class_metrics(_onehotish(preds, 2), labels,
                          gloss_names=["book", "drink"])
    assert {r["gloss"] for r in m["per_class"]} == {"book", "drink"}
    # Names beyond the list fall back to the integer id (same contract as
    # topk_entries).
    m = per_class_metrics(_onehotish(preds, 2), labels, gloss_names=["book"])
    assert {r["gloss"] for r in m["per_class"]} == {"book", 1}


def test_empty_labels():
    m = per_class_metrics(np.zeros((0, 3), np.float32),
                          np.zeros((0,), np.int64))
    assert m == {"macro_top1": 0.0, "per_class": []}
