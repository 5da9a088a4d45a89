"""Token-budget utilities (ops M17/T6).

  * ``estimate_tokens`` — the reference's ``len(text)//2`` heuristic
    (read_v2.py:39-40).
  * ``truncate_to_budget`` — greedy removal of the largest items until the
    batch fits the token budget (read_v2.py:42-53), returning survivors in
    original order plus the dropped items (quarantined, not lost).
"""

from __future__ import annotations


def estimate_tokens(text: str) -> int:
    return len(text) // 2


def truncate_to_budget(items: list[str], budget: int = 4096):
    """→ (kept_in_original_order, dropped_largest_first)."""
    kept = list(enumerate(items))
    dropped: list[str] = []
    total = sum(estimate_tokens(t) for _, t in kept)
    while kept and total > budget:
        idx = max(range(len(kept)), key=lambda i: estimate_tokens(kept[i][1]))
        _, item = kept.pop(idx)
        dropped.append(item)
        total -= estimate_tokens(item)
    return [t for _, t in kept], dropped
