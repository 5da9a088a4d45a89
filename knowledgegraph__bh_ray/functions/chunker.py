"""Structure-aware markdown chunker (reference op M9, SURVEY.md §2.3).

Clean-room re-expression of the reference's ``split_md_content``
(read_instruct.py:58-139): split markdown into chunks of at most
``max_length + tolerance`` UTF-8 bytes, cutting only at structural
boundaries, preferring them by priority — heading(3) > list item(2) >
blank run(1) > other structure(0) — scanning backwards from the overflow
point within the tolerance window (read_instruct.py:120-139), and
maintaining the heading-hierarchy stack across chunks
(read_instruct.py:187-214).

Documented deltas from the reference (whose splitter has several
order-dependent quirks and can emit oversized chunks): this implementation
guarantees (a) chunks concatenate byte-identically to the input, (b) no
chunk exceeds the budget unless a single structural block does, (c) a
chunk's split point is always the highest-priority boundary inside the
tolerance window.  Deterministic and pure — used as a 1→N ``flat_map``-style
batch UDF (one document's chunks never split across batches).
"""

from __future__ import annotations

import re

# structural boundary pattern (read_instruct.py:10-19 element classes)
STRUCT_RE = re.compile(
    r"""(\n\#{1,6}\s[^\n]*)        # heading 1-6
      | (\n\*{3,})                  # horizontal rule
      | (\n```.*?\n```)             # fenced code block
      | (\n\|[^\n]*\|)              # table row
      | (\n[-*+]\s[^\n]*)           # unordered list item
      | (\n\d+\.\s[^\n]*)           # ordered list item
      | (\n[ \t]+[-*+]\s[^\n]*)     # indented list item
      | (\n\n+)                     # blank run
    """,
    re.DOTALL | re.VERBOSE,
)

PRIORITY_HEADING = 3
PRIORITY_LIST = 2
PRIORITY_BLANK = 1
PRIORITY_OTHER = 0

_RE_HEADING = re.compile(r"\n(\#{1,6})\s")
_RE_LIST = re.compile(r"\n[ \t]*(?:[-*+]|\d+\.)\s")
_RE_BLANK = re.compile(r"\n\n+")


def boundary_priority(text: str) -> int:
    """Priority of a matched structural boundary (read_instruct.py:103-118)."""
    if _RE_HEADING.match(text):
        return PRIORITY_HEADING
    if _RE_LIST.match(text):
        return PRIORITY_LIST
    if _RE_BLANK.match(text):
        return PRIORITY_BLANK
    return PRIORITY_OTHER


def heading_level(text: str) -> int | None:
    m = _RE_HEADING.match(text)
    return len(m.group(1)) if m else None


def split_md_content(
    content: str, max_length: int = 4096, tolerance: int = 200
) -> list[str]:
    """Split markdown into structure-aligned chunks of ≤ max_length+tolerance
    UTF-8 bytes.  Concatenation of the chunks equals the input exactly."""
    if not content:
        return []

    boundaries = [(m.start(), boundary_priority(m.group(0))) for m in STRUCT_RE.finditer(content)]
    budget = max_length + tolerance

    chunks: list[str] = []
    start = 0
    n = len(content)
    bi = 0  # first boundary index not yet behind `start`

    while start < n:
        remaining = content[start:]
        if len(remaining.encode("utf-8")) <= budget:
            chunks.append(remaining)
            break

        # find the overflow position (byte budget → char position, cheap scan)
        # binary search on encoded length of the prefix
        lo, hi = 0, len(remaining)
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if len(remaining[:mid].encode("utf-8")) <= budget:
                lo = mid
            else:
                hi = mid - 1
        limit = start + lo  # furthest character the chunk may reach

        # candidate boundaries inside (start, limit]; pick the best by
        # (priority, position): highest priority wins, latest position
        # breaks ties (largest chunk at best structure level)
        while bi < len(boundaries) and boundaries[bi][0] <= start:
            bi += 1
        best_pos, best_prio = None, -1
        j = bi
        while j < len(boundaries) and boundaries[j][0] <= limit:
            pos, prio = boundaries[j]
            if prio > best_prio or (prio == best_prio and pos > (best_pos or -1)):
                best_pos, best_prio = pos, prio
            j += 1

        if best_pos is None or best_pos <= start:
            # no structural boundary in the window — hard split at the limit
            best_pos = max(limit, start + 1)
        chunks.append(content[start:best_pos])
        start = best_pos

    return chunks


def update_hierarchy(stack: list[int], level: int | None) -> list[int]:
    """Heading-hierarchy stack maintenance (read_instruct.py:187-214): pop to
    the nearest shallower heading, push the new level."""
    if level is None:
        return []
    out = [l for l in stack]
    while out and out[-1] >= level:
        out.pop()
    out.append(level)
    return out


def chunk_with_hierarchy(content: str, max_length: int = 4096, tolerance: int = 200):
    """Chunks plus the heading-hierarchy context active at each chunk start —
    the state the reference threads through its LLM-context mode."""
    chunks = split_md_content(content, max_length, tolerance)
    out = []
    stack: list[int] = []
    for chunk in chunks:
        out.append({"chunk": chunk, "hierarchy": list(stack)})
        for m in STRUCT_RE.finditer("\n" + chunk):
            lvl = heading_level(m.group(0))
            if lvl is not None:
                stack = update_hierarchy(stack, lvl)
    return out
