"""Near-duplicate detection suite (training-data ops, task brief).

  * MinHash + LSH   — shingle → minhash signature → banded LSH groupby →
                      candidate pairs → signature-estimated Jaccard verify
  * SimHash         — 64-bit token-feature simhash, banded candidate
                      generation, Hamming-distance verify
  * n-gram Jaccard  — exact word-set Jaccard pairs within a blocking group
  * embedding cosine— exact pairwise cosine within a blocking group

All candidate generation is shuffle-based (``groupby`` on band/bucket keys —
never an all-pairs scan across blocks); exact variants restrict the
quadratic work to within explicitly-blocked groups and exist to oracle-check
the approximate paths.  Signatures are computed per batch with numpy; the
hash family is seeded (seed=42) and deterministic across processes.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.hashing import stable_u64

RE_WS = re.compile(r"\s+")

_MERSENNE = (1 << 61) - 1
N_PERM = 32
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS

_rng = np.random.default_rng(42)
_A = _rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


_SHINGLE_BASE = np.uint64(1099511628211)


def _word_shingles(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-gram shingle set — tokens hashed once (md5), n-gram
    hashes composed arithmetically with a vectorized rolling polynomial
    (no per-shingle string building/hashing)."""
    toks = RE_WS.split(text.strip()) if text.strip() else []
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    # vectorized token hashing (pandas siphash, fixed key → deterministic
    # across processes; C speed vs per-token md5)
    tok_h = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
    if len(tok_h) < n:
        acc = np.uint64(0)
        for h in tok_h:
            acc = acc * _SHINGLE_BASE + h
        return np.array([acc % _MERSENNE], dtype=np.uint64)
    m = len(tok_h) - n + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        acc = acc * _SHINGLE_BASE + tok_h[j : j + m]
    return np.unique(acc % _MERSENNE)


def minhash_signature(text: str) -> np.ndarray:
    """N_PERM-wide minhash signature of word-3-gram shingles (uint64)."""
    sh = _word_shingles(text)
    if len(sh) == 0:
        return np.zeros(N_PERM, dtype=np.uint64)
    # h_i(x) = (a_i * x + b_i) mod p, vectorized over (perm, shingle)
    vals = (_A[:, None] * sh[None, :] + _B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands_batch(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    """doc → N_BANDS rows (band_id, band_hash, id, sig_csv): LSH banding."""
    out = {"band_id": [], "band_hash": [], id_col: [], "sig": []}
    for doc_id, text in zip(batch[id_col], batch[text_col]):
        sig = minhash_signature(text)
        sig_csv = ",".join(map(str, sig))
        for b in range(N_BANDS):
            band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            out["band_id"].append(b)
            out["band_hash"].append(str(stable_u64(",".join(map(str, band)))))
            out[id_col].append(doc_id)
            out["sig"].append(sig_csv)
    return pd.DataFrame(out)


def candidate_pairs_from_band(group: pd.DataFrame, id_col: str, threshold: float) -> pd.DataFrame:
    """One LSH bucket → verified candidate pairs (estimated Jaccard =
    matching minhash positions / N_PERM ≥ threshold)."""
    g = group.drop_duplicates(subset=[id_col]).sort_values(id_col, kind="mergesort")
    ids = g[id_col].tolist()
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                             "id_b": pd.Series([], dtype=g[id_col].dtype),
                             "est_jaccard": pd.Series([], dtype="float64")})
    sigs = np.array([[int(x) for x in s.split(",")] for s in g["sig"]], dtype=np.uint64)
    rows_a, rows_b, est = [], [], []
    for i in range(len(ids)):
        match = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for off, m in enumerate(match):
            if m >= threshold:
                rows_a.append(ids[i])
                rows_b.append(ids[i + 1 + off])
                est.append(float(m))
    return pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "est_jaccard": est})


def minhash_pairs_ds(ds, id_col: str, text_col: str, threshold: float = 0.8):
    """Dataset(id, text) → near-dup pairs (id_a, id_b, est_jaccard), distinct.

    band explode (map_batches) → hash-partition on (band_id, band_hash) →
    per-partition: drop singleton buckets *vectorized* (the overwhelming
    majority), pairwise-verify only real collision buckets → distinct pairs.
    """
    from .grouped import PART_COL, _key_hash, distinct_block, hash_partitioned_agg

    num_parts = 16

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = minhash_bands_batch(batch, id_col, text_col)
        out[PART_COL] = (_key_hash(out, ["band_id", "band_hash"]) % num_parts).astype("int64")
        return out

    def _verify_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["band_id", "band_hash", id_col])
        # vectorized singleton-bucket elimination
        g = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        frames = []
        for _, bucket in g.groupby(["band_id", "band_hash"], sort=False):
            frames.append(candidate_pairs_from_band(bucket, id_col, threshold))
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=object), "id_b": pd.Series([], dtype=object),
                 "est_jaccard": pd.Series([], dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    bands = ds.map_batches(_bands, batch_format="pandas")
    pairs = (
        bands.repartition(num_parts)
        .groupby(PART_COL)
        .map_groups(_verify_part, batch_format="pandas")
    )
    return hash_partitioned_agg(pairs, ["id_a", "id_b"], distinct_block(["id_a", "id_b"]),
                                num_parts=8)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_BANDS = 4
_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def simhash64(text: str) -> int:
    toks = RE_WS.split(text.strip()) if text.strip() else []
    if not toks:
        return 0
    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    tok_h = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
    bits = ((tok_h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(SIMHASH_BITS):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_bands_batch(batch: pd.DataFrame, id_col: str, text_col: str) -> pd.DataFrame:
    out = {"band_id": [], "band_val": [], id_col: [], "simhash": []}
    for doc_id, text in zip(batch[id_col], batch[text_col]):
        h = simhash64(text)
        for b in range(SIMHASH_BANDS):
            out["band_id"].append(b)
            out["band_val"].append(str((h >> (b * _BAND_BITS)) & ((1 << _BAND_BITS) - 1)))
            out[id_col].append(doc_id)
            out["simhash"].append(str(h))
    return pd.DataFrame(out)


def simhash_pairs_ds(ds, id_col: str, text_col: str, max_hamming: int = 3):
    """Near-dup pairs by simhash: equal band → candidate, Hamming ≤ k verify.
    Same partitioned-bucket layout as minhash_pairs_ds."""
    from .grouped import PART_COL, _key_hash, distinct_block, hash_partitioned_agg

    num_parts = 16

    def _verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].tolist()
        hs = [int(x) for x in g["simhash"]]
        rows = {"id_a": [], "id_b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    rows["id_a"].append(ids[i])
                    rows["id_b"].append(ids[j])
                    rows["hamming"].append(d)
        return pd.DataFrame(rows)

    def _bands(batch: pd.DataFrame) -> pd.DataFrame:
        out = simhash_bands_batch(batch, id_col, text_col)
        out[PART_COL] = (_key_hash(out, ["band_id", "band_val"]) % num_parts).astype("int64")
        return out

    def _verify_part(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["band_id", "band_val", id_col])
        g = g.sort_values(id_col, kind="mergesort")
        g = g[g.duplicated(subset=["band_id", "band_val"], keep=False)]
        frames = [
            _verify_bucket(bucket) for _, bucket in g.groupby(["band_id", "band_val"], sort=False)
        ]
        frames = [f for f in frames if not f.empty]
        if not frames:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=object), "id_b": pd.Series([], dtype=object),
                 "hamming": pd.Series([], dtype="int64")}
            )
        out = pd.concat(frames, ignore_index=True)
        out["hamming"] = out["hamming"].astype("int64")
        return out

    bands = ds.map_batches(_bands, batch_format="pandas")
    pairs = (
        bands.repartition(num_parts)
        .groupby(PART_COL)
        .map_groups(_verify_part, batch_format="pandas")
    )
    return hash_partitioned_agg(pairs, ["id_a", "id_b"], distinct_block(["id_a", "id_b"]),
                                num_parts=8)


# ---------------------------------------------------------------------------
# Exact blocked variants (oracle-checkable)
# ---------------------------------------------------------------------------


def jaccard_pairs_ds(ds, block_col: str, id_col: str, text_col: str, threshold: float):
    """Exact word-set Jaccard pairs within blocking groups (SQL-mirrorable:
    list_intersect/list_distinct in DuckDB).  Quadratic only within a block."""

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        ids = g[id_col].tolist()
        sets = [frozenset(RE_WS.split(t.strip().lower())) if t.strip() else frozenset()
                for t in g[text_col]]
        rows = {"id_a": [], "id_b": [], "jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                u = len(sets[i] | sets[j])
                jac = (len(sets[i] & sets[j]) / u) if u else 0.0
                if jac >= threshold:
                    rows["id_a"].append(ids[i])
                    rows["id_b"].append(ids[j])
                    rows["jaccard"].append(jac)
        out = pd.DataFrame(rows)
        if out.empty:
            out = pd.DataFrame({"id_a": pd.Series([], dtype=g[id_col].dtype),
                                "id_b": pd.Series([], dtype=g[id_col].dtype),
                                "jaccard": pd.Series([], dtype="float64")})
        return out

    from .grouped import coalesced_groupby

    return coalesced_groupby(ds, block_col).map_groups(_pairs, batch_format="pandas")


def embedding_pairs_ds(ds, block_col: str, id_col: str, vec_col: str, threshold: float):
    """Exact pairwise-cosine near-dup pairs within blocking groups —
    vectorized matmul per group; the scale path replaces the blocking column
    with LSH bucket ids (see simsearch.lsh_buckets_batch)."""

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        ids = np.array(g[id_col].tolist())
        M = np.vstack(g[vec_col].to_numpy()).astype(np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = Mn @ Mn.T
        iu, ju = np.triu_indices(len(ids), 1)
        m = S[iu, ju] >= threshold
        return pd.DataFrame(
            {"id_a": ids[iu[m]], "id_b": ids[ju[m]]}
        ).astype({"id_a": "int64", "id_b": "int64"})

    from .grouped import coalesced_groupby

    return coalesced_groupby(ds, block_col).map_groups(_pairs, batch_format="pandas")


LSH_TABLES = 8
LSH_PLANES = 6


def _lsh_table_buckets(batch: pd.DataFrame, vec_col: str) -> pd.DataFrame:
    """Explode each vector into LSH_TABLES rows (table_id, bucket) — one
    sign-bucket per independent hyperplane set (seeded per table)."""
    M = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
    frames = []
    for t in range(LSH_TABLES):
        P = np.random.default_rng(100 + t).standard_normal((LSH_PLANES, M.shape[1]))
        bits = (M @ P.T) > 0
        bucket = (bits * (1 << np.arange(LSH_PLANES))).sum(axis=1).astype("int64")
        f = batch.copy()
        f["table_id"] = np.int64(t)
        f["bucket"] = bucket
        frames.append(f)
    return pd.concat(frames, ignore_index=True)


def embedding_pairs_lsh_ds(ds, id_col: str, vec_col: str, threshold: float):
    """Scale path for embedding near-dup: multi-table random-hyperplane LSH
    blocking (a pair is a candidate if it collides in ANY of LSH_TABLES
    independent tables — recall 1-(1-p^k)^T), exact cosine verification
    within buckets, distinct pairs.  Recall vs the exact variant is
    property-tested."""
    from .grouped import distinct_block, hash_partitioned_agg

    bucketed = ds.map_batches(lambda b: _lsh_table_buckets(b, vec_col), batch_format="pandas")
    pairs = embedding_pairs_ds(bucketed, ["table_id", "bucket"], id_col, vec_col, threshold)
    return hash_partitioned_agg(pairs, ["id_a", "id_b"], distinct_block(["id_a", "id_b"]),
                                num_parts=8)
