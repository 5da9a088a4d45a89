"""Deterministic hashing primitives shared across the engine.

The canonical-id rule reproduces the reference's id generator
(``md2csv.py:20-22``, duplicated at ``csv2rdf-jsonld.py:12-14``):
``md5(name.encode())[:8]`` — an 8-hex-char prefix of the MD5 of the UTF-8
name.  Because the id is *self-computable from the name*, entity resolution
never needs a broadcast id map (SURVEY.md §7.3): any stage holding a name can
recompute the canonical id locally.

DuckDB's ``substr(md5(name), 1, 8)`` produces the identical string, which is
what makes the id rule oracle-checkable in plain SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np

MD5_ID_LEN = 8


def md5_id(name: str) -> str:
    """8-hex-char canonical id of an entity name (md2csv.py:20-22)."""
    return hashlib.md5(name.encode("utf-8")).hexdigest()[:MD5_ID_LEN]


def md5_id_array(names) -> np.ndarray:
    """Vectorized md5_id over an iterable of strings → object ndarray."""
    return np.array([md5_id(n) for n in names], dtype=object)


def stable_u64(s: str) -> int:
    """Stable 64-bit hash of a string (first 8 bytes of md5, big-endian).

    Used for salting / bucketing keys: ``stable_u64(url) % n_buckets`` is
    deterministic across processes and Python versions (unlike ``hash()``).
    """
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def bucket_of(s: str, n_buckets: int) -> int:
    return stable_u64(s) % n_buckets


# ---------------------------------------------------------------------------
# Rolling polynomial hash — document fingerprinting (training-data ops)
# ---------------------------------------------------------------------------

_FP_BASE = np.uint64(1099511628211)  # FNV prime, used as polynomial base
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprints(tokens: list[str], window: int = 4) -> np.ndarray:
    """Rolling polynomial hash over token ``window``-grams → uint64 array.

    One fingerprint per window position; the document fingerprint sketch is
    the ``k`` smallest values (winnowing-style min-k), computed by callers.
    """
    if len(tokens) < window:
        tokens = tokens + [""] * (window - len(tokens))
    tok_h = np.array([stable_u64(t) for t in tokens], dtype=np.uint64)
    n = len(tok_h) - window + 1
    out = np.zeros(n, dtype=np.uint64)
    for j in range(window):
        out = (out * _FP_BASE + tok_h[j : j + n]) & _FP_MOD_MASK
    return out


def min_k_sketch(values: np.ndarray, k: int = 8) -> list[int]:
    """k smallest distinct values of a fingerprint array (document sketch)."""
    u = np.unique(values)
    return [int(v) for v in u[:k]]
