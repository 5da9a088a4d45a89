"""HyperLogLog — mergeable approximate-distinct for corpus-scale counting.

Exact grouped COUNT(DISTINCT) shuffles one row per distinct value
(textops.distinct_users_by_type_ds); at 100 TB the distinct set itself can
be corpus-scale.  HLL replaces it with m registers per group: per-batch
partials are (group, register_idx, max_rho) ROWS — so the sketch flows
through the engine's ordinary hash-partitioned max-combine machinery, no
list columns, no custom shuffle — and the final estimate reads ≤ m rows
per group.  Deterministic (fixed siphash key), merge-invariant (max is
associative; property-tested).

Standard estimator (Flajolet et al.): E = α_m · m² / Σ 2^{-M_j} with the
small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

HLL_P = 10  # 2^10 = 1024 registers → ~3.25% standard error
HLL_M = 1 << HLL_P
_HK = "kgbh.hll.hashkey"  # 16-byte pandas hash key


def hll_rows(values, m: int = HLL_M) -> pd.DataFrame:
    """Value array → (idx, rho) register rows (pre-collapsed: max rho per
    idx within this batch) — fully vectorized."""
    arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return pd.DataFrame({"idx": pd.Series([], dtype="int64"),
                             "rho": pd.Series([], dtype="int64")})
    p = int(m).bit_length() - 1
    h = pd.util.hash_array(arr, hash_key=_HK).astype(np.uint64)
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    bits = 64 - p
    # rho = position of the leftmost 1-bit of w within `bits` bits (1-based);
    # w == 0 → bits + 1.  floor(log2) is exact for w < 2^53; the top bits of
    # a 54+-bit w make log2 safe too (error < 1 ulp cannot cross an integer
    # boundary for values this large in float64? — avoid the subtlety by
    # using bit_length via uint64 math: log2 floor = 63 - clz).
    wf = w.astype(np.float64)
    log2w = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    log2w[nz] = np.floor(np.log2(wf[nz])).astype(np.int64)
    # correct potential float rounding at powers of two
    too_high = nz & (np.uint64(1) << np.minimum(log2w, 63).astype(np.uint64) > w)
    log2w[too_high] -= 1
    rho = np.where(nz, bits - log2w, bits + 1).astype(np.int64)
    out = pd.DataFrame({"idx": idx, "rho": rho})
    return out.groupby("idx", sort=False, as_index=False)["rho"].max()


def hll_estimate(idx: np.ndarray, rho: np.ndarray, m: int = HLL_M) -> int:
    """Register rows (missing registers ⇒ 0) → cardinality estimate."""
    M = np.zeros(m, dtype=np.int64)
    M[np.asarray(idx, dtype=np.int64)] = np.asarray(rho, dtype=np.int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    E = alpha * m * m / np.sum(np.power(2.0, -M.astype(np.float64)))
    zeros = int((M == 0).sum())
    if E <= 2.5 * m and zeros > 0:
        E = m * np.log(m / zeros)
    return int(round(E))
