"""Evaluation metrics (reference op G9, bilstm_crf_ner.py:538-576).

The reference computes weighted precision/recall/F1 over non-O tags with
sklearn; re-implemented here dependency-free, plus the triple-set P/R the
harness scores (BASELINE.md).  Driver-side metrics over collected
predictions — never on the big path.
"""

from __future__ import annotations

from collections import Counter


def tag_prf(y_true: list[str], y_pred: list[str]) -> dict:
    """Weighted P/R/F1 over non-O tags (label-weighted average, matching the
    reference's sklearn 'weighted' mode with labels≠O)."""
    assert len(y_true) == len(y_pred)
    labels = sorted({t for t in y_true if t != "O"})
    support = Counter(t for t in y_true if t != "O")
    total = sum(support.values()) or 1

    p_sum = r_sum = f_sum = 0.0
    for lab in labels:
        tp = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p == lab)
        fp = sum(1 for t, p in zip(y_true, y_pred) if t != lab and p == lab)
        fn = sum(1 for t, p in zip(y_true, y_pred) if t == lab and p != lab)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        w = support[lab] / total
        p_sum += w * prec
        r_sum += w * rec
        f_sum += w * f1
    return {"precision": p_sum, "recall": r_sum, "f1": f_sum}


def triple_prf(predicted: set, golden: set) -> dict:
    """Exact (subj, pred, obj) set precision/recall/F1 — the north-rule
    scoring shape."""
    tp = len(predicted & golden)
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(golden) if golden else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp}
