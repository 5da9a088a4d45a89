"""Skew-aware grouped aggregation machinery (SURVEY.md §4 "Skew / stragglers").

Web-text entity keys are Zipfian — a bare ``groupby(key)`` ships every
occurrence of the head entity to one reducer.  Every wide aggregation in this
engine therefore runs in three levels:

  1. **per-batch partial** (``map_batches``): collapse duplicates inside each
     Arrow batch before anything is shuffled — for dup-heavy web text this is
     the big volume reducer;
  2. **salted combine** (``groupby(keys + [_salt])``): partials for the same
     key are spread over ``salt_buckets`` reducers (salt = stable hash of the
     partial's origin), bounding any single reducer's group size;
  3. **final combine** (``groupby(keys)``): at most ``salt_buckets`` rows per
     key remain — trivially cheap.

The combine function must be associative + commutative over partial rows
(min-by-seq keep-first, sum-of-count, …), which makes the result independent
of partition count and execution order — property-tested in
tests/test_invariance.py.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_u64

SALT_COL = "_salt"


def add_salt(batch: pa.Table, salt_from: str, salt_buckets: int) -> pa.Table:
    """Append a deterministic salt column derived from ``salt_from``."""
    vals = batch.column(salt_from).to_pylist()
    salts = pa.array([stable_u64(v) % salt_buckets for v in vals], pa.int32())
    return batch.append_column(SALT_COL, salts)


def salted_grouped_agg(
    ds,
    keys: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt_from: str,
    salt_buckets: int = 16,
):
    """Three-level skew-aware aggregation; see module docstring.

    ``partial_fn``: pandas batch → one row per key present in the batch.
    ``combine_fn``: pandas group (all rows share ``keys``) → one row.
    Both must emit the same schema (keys + aggregate columns).
    """

    def _partial_with_salt(batch: pd.DataFrame) -> pd.DataFrame:
        part = partial_fn(batch)
        # salt from the partial's representative origin row: deterministic,
        # and different batches' partials for the same key get different
        # salts, spreading the head key over salt_buckets reducers
        part[SALT_COL] = [stable_u64(str(v)) % salt_buckets for v in part[salt_from]]
        return part

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(group)

    def _combine_drop_salt(group: pd.DataFrame) -> pd.DataFrame:
        out = combine_fn(group)
        return out.drop(columns=[SALT_COL], errors="ignore")

    partials = ds.map_batches(_partial_with_salt, batch_format="pandas")
    level2 = partials.groupby(keys + [SALT_COL]).map_groups(
        _combine, batch_format="pandas"
    )
    return level2.groupby(keys).map_groups(_combine_drop_salt, batch_format="pandas")


# ---------------------------------------------------------------------------
# Stock partial/combine pairs
# ---------------------------------------------------------------------------


def keep_first_partial(keys: list[str], order_col: str):
    """Partial: keep the min-``order_col`` row per key within the batch."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(order_col, kind="mergesort")
            .drop_duplicates(subset=keys, keep="first")
            .reset_index(drop=True)
        )

    return _partial


def keep_first_combine(keys: list[str], order_col: str):
    """Combine: min-``order_col`` row of the group (associative keep-first)."""

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(order_col, kind="mergesort").head(1).reset_index(drop=True)
        )

    return _combine


def count_first_partial(keys: list[str], order_col: str, weight_col: str = "weight"):
    """Partial: per key — row count as ``weight`` + min-order representative."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = batch.groupby(keys, sort=False).size().rename(weight_col)
        first = (
            batch.sort_values(order_col, kind="mergesort")
            .drop_duplicates(subset=keys, keep="first")
            .set_index(keys)
        )
        out = first.join(counts).reset_index()
        return out

    return _partial


def count_first_combine(keys: list[str], order_col: str, weight_col: str = "weight"):
    """Combine: sum partial weights, keep min-order representative fields."""

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        total = group[weight_col].sum()
        row = group.sort_values(order_col, kind="mergesort").head(1).copy()
        row[weight_col] = total
        return row.reset_index(drop=True)

    return _combine
