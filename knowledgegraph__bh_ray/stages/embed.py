"""Embedding generation + RAG top-k (reference ops A3 / W10 / T1, rag_query).

The reference loads a SentenceTransformer once and batch-encodes concept
names and relation phrases (embedding_generator.py:23-67), then serves
brute-force cosine top-k (rag_query.py:92-122).  The engine keeps the exact
actor-pool shape; the model slot is a deterministic hash-projection encoder
(no torch here — any encoder class with the same signature drops in).
Relation phrase = "{subj_name} {pred} {obj_name}" (embedding_generator.py:55).

Output embeddings are native Arrow ``list<float32>`` columns — the
reference's stringified-vector CSV round-trip (rag_query.py:74) disappears.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

EMBED_DIM = 64


def fake_encode(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic stand-in encoder, SQL-RECOMPUTABLE: component ``i`` of
    text ``t`` is ``byte(md5(f"{t}:{i // 16}"))[i % 16] - 128`` — integers
    in [-128, 127], exactly representable in float32, so the DuckDB mirror
    (queries.build_oracle_sql: embed_concepts/embed_relations/rag_topk)
    recomputes them bit-identically from md5 hex.  Equal texts → equal
    vectors.  NOT normalized — consumers compute cosine with explicit
    norms (integer dot products are exact in float64 at this dim)."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    n_blk = (dim + 15) // 16
    for i, t in enumerate(texts):
        bs = b"".join(
            hashlib.md5(f"{t}:{b}".encode("utf-8")).digest() for b in range(n_blk)
        )
        out[i] = np.frombuffer(bs, dtype=np.uint8)[:dim].astype(np.float32) - 128.0
    return out


def _real_encoder(model_name: str):
    """Real encoder via sentence-transformers (embedding_generator.py:23-67
    flow) — only reachable when the library is installed.  Returns a
    (texts, dim) → (n, dim) float32 callable; model loads ONCE here (per
    actor), never per batch."""
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(model_name)

    def encode(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
        v = np.asarray(model.encode(list(texts), normalize_embeddings=True),
                       dtype=np.float32)
        return v[:, :dim] if v.shape[1] >= dim else np.pad(v, ((0, 0), (0, dim - v.shape[1])))

    return encode


class Embedder:
    """Actor-pool encoder: 'model load' once per actor, batched encode.

    Backend ladder (same pattern as stages/pdf.PdfTextExtractor): injected
    ``encode_fn`` > sentence-transformers if importable > the documented
    deterministic stand-in.  Any callable (texts, dim) → (n, dim) drops in."""

    MODEL_NAME = "all-MiniLM-L6-v2"

    def __init__(self, text_col: str, dim: int = EMBED_DIM, encode_fn=None):
        self.text_col = text_col
        self.dim = dim
        if encode_fn is not None:
            self.encode = encode_fn
            self.backend = "injected"
        else:
            try:
                import sentence_transformers  # noqa: F401

                self.encode = _real_encoder(self.MODEL_NAME)
                self.backend = "sentence_transformers"
            except ImportError:
                self.encode = fake_encode
                self.backend = "fake"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = self.encode(batch[self.text_col].tolist(), self.dim)
        out = batch.copy()
        out["embedding"] = list(np.asarray(vecs, dtype=np.float32))
        return out


def embed_ds(ds, text_col: str, concurrency=(1, 4), batch_size: int = 512,
             encode_fn=None):
    return ds.map_batches(
        Embedder,
        fn_constructor_args=(text_col,),
        fn_constructor_kwargs={"encode_fn": encode_fn},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def relation_phrase_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """edges → relation phrases "{subj_name} {pred} {obj_name}"."""
    return pd.DataFrame(
        {
            "phrase": batch["subj_name"] + " " + batch["pred"] + " " + batch["obj_name"],
            "subj": batch["subj"],
            "obj": batch["obj"],
        }
    )


def rag_topk(ds_embedded, query_text: str, text_col: str, k: int = 5) -> pd.DataFrame:
    """Brute-force cosine top-k of a query against an embedded Dataset —
    per-batch partial top-k then a tiny driver-side merge (rag_query.py
    semantics, distributed)."""
    import ray

    q = fake_encode([query_text])[0].astype(np.float64)
    q /= np.linalg.norm(q)
    q_ref = ray.put(q)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        M = np.vstack(batch["embedding"].to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ qv
        kk = min(k, len(sims))
        top = np.argpartition(-sims, kk - 1)[:kk]
        return pd.DataFrame({text_col: batch[text_col].to_numpy()[top], "similarity": sims[top]})

    partials = ds_embedded.map_batches(_partial, batch_format="pandas").to_pandas()
    return (
        partials.sort_values(["similarity", text_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def format_rag_context(concepts: pd.DataFrame, relations: pd.DataFrame) -> str:
    """Retrieved-context formatting (rag_query.py:137-158 layout): ranked
    concept then relation sections with similarity scores."""
    parts = []
    if len(concepts):
        parts.append("相关概念：")
        for _, r in concepts.iterrows():
            parts.append(f"- {r[concepts.columns[0]]} (相似度: {r['similarity']:.4f})")
    if len(relations):
        parts.append("\n相关关系：")
        for _, r in relations.iterrows():
            parts.append(f"- {r[relations.columns[0]]} (相似度: {r['similarity']:.4f})")
    return "\n".join(parts)
