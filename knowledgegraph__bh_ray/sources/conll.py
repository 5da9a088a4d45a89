"""NER corpus loaders (reference op S9) — CoNLL and JSON formats.

The reference reads char-per-line CoNLL (``char<space>label``, blank line =
sentence boundary) and JSON ``{"text": ..., "labels": [...]}`` lines
(bilstm_crf_ner.py:214-254, format doc NER-model/data/README.md).  These
loaders produce a Dataset of ``{text: string, labels: list<string>}`` rows
for the training path; parsing happens per shard in ``flat_map`` batches.
"""

from __future__ import annotations

import json


def parse_conll_text(content: str) -> list[dict]:
    """CoNLL text → [{text, labels}] (blank-line sentence delimiter)."""
    sentences = []
    chars: list[str] = []
    labels: list[str] = []
    for line in content.split("\n"):
        line = line.strip()
        if not line:
            if chars:
                sentences.append({"text": "".join(chars), "labels": labels})
                chars, labels = [], []
            continue
        parts = line.split()
        if len(parts) >= 2:
            chars.append(parts[0])
            labels.append(parts[1])
        elif len(parts) == 1:  # bare char, implicit O
            chars.append(parts[0])
            labels.append("O")
    if chars:
        sentences.append({"text": "".join(chars), "labels": labels})
    return sentences


def parse_ner_json_lines(content: str) -> list[dict]:
    """JSON-lines (or a JSON array) of {text, labels} records."""
    content = content.strip()
    if not content:
        return []
    if content.startswith("["):
        rows = json.loads(content)
    else:
        rows = [json.loads(line) for line in content.split("\n") if line.strip()]
    return [{"text": r["text"], "labels": list(r["labels"])} for r in rows]


def read_conll(path: str):
    """CoNLL file(s) → Dataset[{text, labels}]."""
    import ray.data as rd

    with open(path, encoding="utf-8") as f:
        return rd.from_items(parse_conll_text(f.read()))


def read_ner_json(path: str):
    import ray.data as rd

    with open(path, encoding="utf-8") as f:
        return rd.from_items(parse_ner_json_lines(f.read()))
