"""Evaluation (top-1 / top-5 on WLASL splits — SURVEY.md §1.3 eval layer)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from asltpu.api import Model, stream_predict
from asltpu.data.wlasl import ClipRecord


def topk_entries(logits, gloss_names=None, k: int = 5):
    """[C] logits → top-k [{gloss, logit}] with safe name lookup (ids beyond
    a short name list fall back to the integer id)."""
    idx = np.argsort(-logits)[:k]
    return [
        {
            "gloss": (
                gloss_names[i]
                if gloss_names is not None and i < len(gloss_names)
                else int(i)
            ),
            "logit": round(float(logits[i]), 4),
        }
        for i in idx
    ]


def topk_accuracy(
    logits: np.ndarray, labels: np.ndarray, ks: Sequence[int] = (1, 5)
) -> Dict[str, float]:
    """logits [N, C], labels [N] → {"top1": ..., "top5": ...}."""
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out[f"top{k}"] = float(hit.mean()) if len(labels) else 0.0
    return out


def evaluate_split(
    model: Model,
    records: Sequence[ClipRecord],
    batch_size: int = 16,
    num_decode_workers: int = 4,
    landmarks_for=None,
    max_clips: Optional[int] = None,
    skip_errors: bool = False,
) -> Dict[str, float]:
    """Run streaming inference over a WLASL split and report top-1/top-5.

    ``skip_errors`` drops undecodable clips (with a logged warning); the
    accuracy denominator counts only evaluated clips and the skipped count
    is reported."""
    records = [r for r in records if r.path][:max_clips]
    results = list(stream_predict(
        model, records, batch_size=batch_size,
        num_decode_workers=num_decode_workers,
        landmarks_for=landmarks_for, skip_errors=skip_errors,
        # Key results by record identity, not display path: two records may
        # share a source video (distinct frame segments of one file) and
        # must stay distinct label entries.
        yield_items=True,
    ))
    if not results:
        return {"top1": 0.0, "top5": 0.0, "num_clips": 0.0,
                "num_skipped": float(len(records))}
    logits = np.stack([lg for _, _, lg in results])
    labels = np.asarray([rec.label for rec, _, _ in results])
    metrics = topk_accuracy(logits, labels)
    metrics["num_clips"] = float(len(results))
    metrics["num_skipped"] = float(len(records) - len(results))
    return metrics
