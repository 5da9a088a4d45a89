"""Similarity search over an embedding column (task brief, first-class op).

  * brute-force top-k — numpy matmul per batch against a broadcast query
    matrix, per-batch partial top-k, tiny final merge (the exact baseline);
  * LSH-bucketed ANN  — random-hyperplane sign buckets (seeded, deterministic)
    as the scale path: candidate set = query's bucket ∪ Hamming-1 probes,
    so the per-query work is |bucket| · dim instead of |corpus| · dim.

The query matrix is ``ray.put`` once and fetched in each task — never
re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_PLANES = 6  # 2^6 = 64 LSH buckets
_rng = np.random.default_rng(7)


def _planes(dim: int) -> np.ndarray:
    return np.random.default_rng(7).standard_normal((N_PLANES, dim))


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def brute_topk_ds(ds, queries: dict[int, np.ndarray], id_col: str, vec_col: str, k: int = 10):
    """Dataset(id, vec) × query dict → (query_id, id, rank) exact top-k.

    Per-batch partial top-k (k rows per query per batch) → global merge via
    a tiny groupby over ≤ k·n_batches·n_queries rows."""
    import ray

    qids = sorted(queries.keys())
    Q = _normalize(np.vstack([queries[q] for q in qids]).astype(np.float64))
    q_ref = ray.put((qids, Q))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids, Q = ray.get(q_ref)
        M = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
        sims = Q @ M.T  # (n_q, n_rows)
        ids = batch[id_col].to_numpy()
        out = {"query_id": [], id_col: [], "sim": []}
        kk = min(k, sims.shape[1])
        for qi, qid in enumerate(qids):
            top = np.argpartition(-sims[qi], kk - 1)[:kk]
            out["query_id"].extend([qid] * kk)
            out[id_col].extend(ids[top])
            out["sim"].extend(sims[qi][top])
        return pd.DataFrame(out)

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                id_col: g[id_col].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    from .grouped import coalesced_groupby

    partials = ds.map_batches(_partial, batch_format="pandas")
    ranked = coalesced_groupby(partials, "query_id", 4).map_groups(
        _final, batch_format="pandas"
    )
    return ranked.map_batches(lambda d: _pin_rank_schema(d, id_col), batch_format="pandas")


def _pin_rank_schema(d: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Give the empty passthrough blocks that fall out of map_groups (more
    groupby partitions than query groups) the real output schema — silences
    the executor's schema-mismatch warnings and keeps consumers typed."""
    if len(d.columns) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("query_id", id_col, "rank")}
        )
    return d


def lsh_buckets_batch(batch: pd.DataFrame, vec_col: str) -> pd.DataFrame:
    """Append the random-hyperplane sign bucket of each vector."""
    M = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
    P = _planes(M.shape[1])
    bits = (M @ P.T) > 0
    bucket = (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype("int64")
    out = batch.copy()
    out["bucket"] = bucket
    return out


def lsh_topk_ds(ds, queries: dict[int, np.ndarray], id_col: str, vec_col: str, k: int = 10):
    """Approximate top-k: only vectors in the query's LSH bucket or a
    Hamming-1 neighbor bucket are scored.  Recall vs brute force is
    property-tested (tests/test_simsearch.py)."""
    import ray

    qids = sorted(queries.keys())
    Q = np.vstack([queries[q] for q in qids]).astype(np.float64)
    P = _planes(Q.shape[1])
    qbits = (Q @ P.T) > 0
    qbuckets = (qbits * (1 << np.arange(N_PLANES))).sum(axis=1).astype("int64")
    probe_sets = []
    for b in qbuckets:
        # multi-probe: the query's bucket plus all Hamming-1 and Hamming-2
        # neighbors — recall/cost knob (1 + P + P(P-1)/2 buckets of 2^P)
        probes = {int(b)} | {int(b) ^ (1 << i) for i in range(N_PLANES)}
        probes |= {
            int(b) ^ (1 << i) ^ (1 << j)
            for i in range(N_PLANES)
            for j in range(i + 1, N_PLANES)
        }
        probe_sets.append(probes)
    Qn = _normalize(Q)
    q_ref = ray.put((qids, Qn, probe_sets))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qids, Qn, probe_sets = ray.get(q_ref)
        M = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        buckets = batch["bucket"].to_numpy()
        out = {"query_id": [], id_col: [], "sim": []}
        for qi, qid in enumerate(qids):
            mask = np.isin(buckets, list(probe_sets[qi]))
            if not mask.any():
                continue
            sims = Qn[qi] @ M[mask].T
            sub_ids = ids[mask]
            kk = min(k, len(sub_ids))
            top = np.argpartition(-sims, kk - 1)[:kk] if len(sims) > kk else np.arange(len(sims))
            out["query_id"].extend([qid] * len(top))
            out[id_col].extend(sub_ids[top])
            out["sim"].extend(sims[top])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out["query_id"], dtype="int64"),
                id_col: pd.Series(out[id_col], dtype="int64"),
                "sim": pd.Series(out["sim"], dtype="float64"),
            }
        )

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                id_col: g[id_col].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype="int64"),
            }
        )

    from .grouped import coalesced_groupby

    bucketed = ds.map_batches(lambda b: lsh_buckets_batch(b, vec_col), batch_format="pandas")
    partials = bucketed.map_batches(_partial, batch_format="pandas")
    ranked = coalesced_groupby(partials, "query_id", 4).map_groups(
        _final, batch_format="pandas"
    )
    return ranked.map_batches(lambda d: _pin_rank_schema(d, id_col), batch_format="pandas")
