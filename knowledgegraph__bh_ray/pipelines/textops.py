"""Text-analysis + deduplication operators over the documents/pages tables.

The large-scale training-data operations the engine provides as first-class
pipelines (task brief "Beyond the reference's own operators"):

  * exact dedup          — content-hash groupby (hash-partition + per-group
                           min/count; mirrors the reference's G6 keep-first)
  * language id          — CJK-ratio n-gram heuristic, vectorized
  * quality scoring      — token/punctuation/stopword counts
  * token counting       — whitespace-regex tokenizer + per-lang aggregate
  * document fingerprint — rolling-hash min-k sketch (winnowing-style)

Every per-doc stage is a vectorized ``map_batches``; aggregates use per-batch
partials before the shuffle.  SQL mirrors live in __ray_entry__.oracle_sql —
keep the token/stopword/CJK definitions in sync with them.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..functions.hashing import min_k_sketch, rolling_fingerprints
from ..sources import read_table

# keep in sync with the SQL mirrors (oracle_sql in __ray_entry__)
RE_WS = re.compile(r"\s+")
RE_CJK = re.compile(r"[一-鿿]")
RE_PUNCT = re.compile(r"[.,!?;:]")
STOPWORDS = ("the", "a", "of", "and", "to")


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return RE_WS.split(t) if t else []


def dedup_exact_ds(sf_dir: str):
    """documents → (content_hash, keep_doc_id, n_dups): exact dedup by md5 of
    text, keep the smallest doc_id (hash-partition + per-group first, G6)."""
    from ..stages.grouped import hash_partitioned_agg

    def _to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "content_hash": batch["text"].map(
                    lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
                ),
                "keep_doc_id": batch["doc_id"],
                "n_dups": np.int64(1),
            }
        )

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("content_hash", sort=False)
        return pd.DataFrame(
            {
                "content_hash": g["keep_doc_id"].min().index,
                "keep_doc_id": g["keep_doc_id"].min().values,
                "n_dups": g["n_dups"].sum().values,
            }
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = docs.map_batches(_to_rows, batch_format="pandas")
    return hash_partitioned_agg(rows, ["content_hash"], _agg)


def lang_id_batch(batch: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """CJK-ratio language-id heuristic: >30% Han chars → zh, else en."""
    texts = batch[text_col]
    n_chars = texts.str.len().astype("int64")
    n_cjk = texts.map(lambda t: len(RE_CJK.findall(t))).astype("int64")
    ratio = np.where(n_chars > 0, n_cjk / np.maximum(n_chars, 1), 0.0)
    return pd.DataFrame(
        {
            id_col: batch[id_col],
            "n_chars": n_chars,
            "n_cjk": n_cjk,
            "lang_pred": np.where(ratio > 0.3, "zh", "en"),
        }
    )


def text_quality_ds(sf_dir: str):
    """documents → per-doc quality counters (n_chars, n_tokens, n_punct,
    n_stopwords) — all integers so the SQL mirror hashes exactly."""

    def _batch(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].map(_tokens)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars": batch["text"].str.len().astype("int64"),
                "est_tokens": (batch["text"].str.len() // 2).astype("int64"),  # M17 len//2 heuristic (read_v2.py:39-40)
                "n_tokens": toks.map(len).astype("int64"),
                "n_punct": batch["text"].map(lambda t: len(RE_PUNCT.findall(t))).astype("int64"),
                "n_stopwords": toks.map(
                    lambda ts: sum(1 for t in ts if t.lower() in STOPWORDS)
                ).astype("int64"),
            }
        )

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_batch, batch_format="pandas")


def token_count_by_lang_ds(sf_dir: str):
    """Per-lang total token count: per-batch partial sums → tiny groupby."""
    from ..stages.grouped import hash_partitioned_agg

    def _to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": batch["lang"],
                "total_tokens": batch["text"].map(lambda t: len(_tokens(t))).astype("int64"),
                "n_docs": np.int64(1),
            }
        )

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False)
        return pd.DataFrame(
            {
                "lang": g["total_tokens"].sum().index,
                "total_tokens": g["total_tokens"].sum().values,
                "n_docs": g["n_docs"].sum().values,
            }
        )

    docs = read_table(sf_dir, "documents", columns=["lang", "text"])
    rows = docs.map_batches(_to_rows, batch_format="pandas")
    return hash_partitioned_agg(rows, ["lang"], _agg, num_parts=4)


def fingerprint_ds(sf_dir: str, window: int = 4, k: int = 8):
    """documents → (doc_id, fingerprints: list<uint64 as int64-str>) — rolling
    polynomial hash over token windows, min-k sketch.  Sketches are mergeable
    (min of mins), making cross-shard near-dup candidate generation a small
    groupby over (doc, fingerprint) pairs rather than an all-pairs scan."""

    def _batch(batch: pd.DataFrame) -> pd.DataFrame:
        sketches = [
            ",".join(str(v) for v in min_k_sketch(rolling_fingerprints(_tokens(t), window), k))
            for t in batch["text"]
        ]
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": sketches})

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(_batch, batch_format="pandas")
