"""Relational operators over the TPC-H-ish testdata tables.

General query/data-processing capability of the engine — grouped aggregates
with per-batch partials, broadcast hash joins, global sort + limit, and the
event-stream windowing ops (tumbling window, gap sessionization) that cover
the "streaming-shaped" surface (SURVEY.md §2.9: the reference is batch-only;
these are the engine's additions, expressed as groupby/map_groups over a
partitioned, time-sorted log per the Ray guide).

Numeric policy for the DuckDB gate: aggregate integers only — floats are
floored to integer cents *per row* before summation (`floor(x*100)` is
IEEE-deterministic, summation of int64 is exact and order-independent),
so distributed vs single-process sums hash identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sources import read_table


def agg_lineitem_ds(sf_dir: str):
    """Pricing-summary aggregate (TPC-H Q1 shape): per (returnflag,
    linestatus) — integer quantities/cents, exact across partitionings."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": np.floor(batch["l_quantity"]).astype("int64"),
                "price_cents": np.floor(batch["l_extendedprice"] * 100).astype("int64"),
                "disc_price_cents": np.floor(
                    batch["l_extendedprice"] * (1.0 - batch["l_discount"]) * 100
                ).astype("int64"),
            }
        )
        g = b.groupby(["l_returnflag", "l_linestatus"], sort=False)
        out = g.agg(
            sum_qty=("qty", "sum"),
            sum_price_cents=("price_cents", "sum"),
            sum_disc_price_cents=("disc_price_cents", "sum"),
            n_rows=("qty", "size"),
        ).reset_index()
        out["n_rows"] = out["n_rows"].astype("int64")
        return out

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        out = group.head(1)[["l_returnflag", "l_linestatus"]].copy()
        for c in ("sum_qty", "sum_price_cents", "sum_disc_price_cents", "n_rows"):
            out[c] = group[c].sum()
        return out.reset_index(drop=True)

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return (
        li.map_batches(_partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .map_groups(_combine, batch_format="pandas")
    )


def join_volume_ds(sf_dir: str):
    """Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation.

    orders/customer/nation are the small sides → broadcast once via
    ``ray.put`` (a composed suppkey/custkey → nation map), probed inside
    ``map_batches`` — no shuffle join on the big fact table (Ray guide
    "small side: broadcast it")."""
    import ray

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).to_pandas()
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()

    ok2nation = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")[["o_orderkey", "n_name"]]
    )
    lookup_ref = ray.put(dict(zip(ok2nation["o_orderkey"], ok2nation["n_name"])))

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        n_name = batch["l_orderkey"].map(lookup)
        cents = np.floor(
            batch["l_extendedprice"] * (1.0 - batch["l_discount"]) * 100
        ).astype("int64")
        b = pd.DataFrame({"n_name": n_name, "revenue_cents": cents})
        b = b[b["n_name"].notna()]
        g = b.groupby("n_name", sort=False)["revenue_cents"]
        return pd.DataFrame(
            {
                "n_name": g.sum().index,
                "revenue_cents": g.sum().values,
                "n_items": g.size().values.astype("int64"),
            }
        )

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": [group["n_name"].iloc[0]],
                "revenue_cents": [group["revenue_cents"].sum()],
                "n_items": [group["n_items"].sum()],
            }
        )

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    return li.map_batches(_partial, batch_format="pandas").groupby("n_name").map_groups(
        _combine, batch_format="pandas"
    )


def top_parts_ds(sf_dir: str, k: int = 10):
    """Global sort + limit: top-k parts by retail price (tiebreak partkey)."""
    parts = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    # single-key descending sort, then a deterministic tiebreak inside the
    # (tiny) k-row result
    return parts.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(k)


def events_window_ds(sf_dir: str):
    """Tumbling 1-hour window per event_type: n events + floored value cents.
    Window key = floor(epoch_seconds / 3600) — computable per batch, so the
    only shuffle is the tiny post-partial groupby."""

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        secs = batch["ts"].astype("datetime64[us]").astype("int64") / 1_000_000.0
        hour = np.floor(secs / 3600.0).astype("int64")
        cents = np.floor(batch["value"] * 100).astype("int64")
        b = pd.DataFrame({"event_type": batch["event_type"], "hour_bucket": hour, "cents": cents})
        g = b.groupby(["event_type", "hour_bucket"], sort=False)["cents"]
        return pd.DataFrame(
            {
                "event_type": [i[0] for i in g.sum().index],
                "hour_bucket": [i[1] for i in g.sum().index],
                "sum_value_cents": g.sum().values,
                "n_events": g.size().values.astype("int64"),
            }
        )

    def _combine(group: pd.DataFrame) -> pd.DataFrame:
        out = group.head(1)[["event_type", "hour_bucket"]].copy()
        out["sum_value_cents"] = group["sum_value_cents"].sum()
        out["n_events"] = group["n_events"].sum()
        return out.reset_index(drop=True)

    ev = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    return (
        ev.map_batches(_partial, batch_format="pandas")
        .groupby(["event_type", "hour_bucket"])
        .map_groups(_combine, batch_format="pandas")
    )


def events_sessionize_ds(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (session = events ≤ gap apart).

    The partitioning assumption (documented per the task brief): all of one
    user's events co-locate via ``groupby(user_id)``; within the group the
    pandas fn sorts by ts and splits on gaps — the Ray-guide pattern for
    stream-shaped workloads."""
    gap_us = gap_minutes * 60 * 1_000_000

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].astype("datetime64[us]").astype("int64")
        new_session = np.ones(len(g), dtype=bool)
        new_session[1:] = (ts.values[1:] - ts.values[:-1]) > gap_us
        sid = np.cumsum(new_session)
        out = pd.DataFrame({"user_id": g["user_id"].values, "sid": sid, "ts_us": ts.values})
        agg = out.groupby("sid")["ts_us"]
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]] * agg.ngroups,
                "session_start_us": agg.min().values,
                "session_end_us": agg.max().values,
                "n_events": agg.size().values.astype("int64"),
            }
        )

    ev = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    return ev.groupby("user_id").map_groups(_sessions, batch_format="pandas")
