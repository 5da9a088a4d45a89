"""Distributed PageRank over the page-link graph.

Same iterative-round shape as connected components (stages/cc.py): the edge
list materializes ONCE to the object store; each round is a reduce-side
merge (edges ⋈ ranks on src — tag, union, hash-route, vectorized pandas
merge per partition; Ray's Arrow join is avoided for the same skewed-key
reason) followed by one hash-partitioned sum per dst.  The driver holds
only scalars (iteration counter, dangling mass, node count).

Fixed iteration count (deterministic control flow); rank VALUES are float64
sums whose partition-order addition differs in final ulps across runs —
consumers that need bit-stable output should round (the query rounds to
rank_micros int64 on a scale where ulp noise vanishes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pagerank_pairs(edges: pd.DataFrame, damping: float = 0.85, iters: int = 10,
                   src: str = "src_url", dst: str = "dst_url") -> pd.DataFrame:
    """Driver-side reference implementation (plain dicts) for tests."""
    nodes = sorted(set(edges[src]) | set(edges[dst]))
    n = len(nodes)
    out_deg: dict = {}
    adj: dict = {}
    for s, d in zip(edges[src], edges[dst]):
        out_deg[s] = out_deg.get(s, 0) + 1
        adj.setdefault(s, []).append(d)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out_deg)
        nxt = {v: (1.0 - damping) / n + damping * dangling / n for v in nodes}
        for s, ds_ in adj.items():
            share = damping * r[s] / out_deg[s]
            for d in ds_:
                nxt[d] += share
        r = nxt
    return pd.DataFrame({"url": nodes, "rank": [r[v] for v in nodes]})


def triangles_ds(edges_ds, src: str = "src_url", dst: str = "dst_url",
                 num_parts: int = 8):
    """Distinct triangles (u < v < w) of the undirected graph — the
    two-join distributed shape: canonical edges (u<v) → wedge join on the
    shared middle vertex (many-to-many reduce-side merge) → closing-edge
    semi-join on the (u,w) pair.  Every exchange is hash-partitioned; no
    broadcast (the edge set is corpus-scale)."""
    import ray.data as rd

    from .grouped import PART_COL, _key_hash, distinct_block, hash_partitioned_agg

    def _canon(d: pd.DataFrame) -> pd.DataFrame:
        a = d.get(src, pd.Series([], dtype=object))
        b = d.get(dst, pd.Series([], dtype=object))
        lo = np.where(np.asarray(a) < np.asarray(b), a, b) if len(d) else []
        hi = np.where(np.asarray(a) < np.asarray(b), b, a) if len(d) else []
        out = pd.DataFrame({"u": lo, "v": hi})
        return out[out["u"] != out["v"]] if len(out) else out

    und = hash_partitioned_agg(
        edges_ds.map_batches(_canon, batch_format="pandas"),
        ["u", "v"], distinct_block(["u", "v"]), num_parts=num_parts,
    ).materialize()

    # wedge join on the middle vertex v: (u,v) ⋈ (v,w) — many-to-many, so
    # a per-partition pandas merge (the reduce-side pattern, m:n capable)
    lo_side = und.map_batches(
        lambda d: pd.DataFrame({"k": d.get("v", []), "u": d.get("u", []),
                                "w": None, "_s": 0}),
        batch_format="pandas",
    )
    hi_side = und.map_batches(
        lambda d: pd.DataFrame({"k": d.get("u", []), "u": None,
                                "w": d.get("v", []), "_s": 1}),
        batch_format="pandas",
    )

    def _wedge(g: pd.DataFrame) -> pd.DataFrame:
        le = g[g["_s"] == 0]
        ri = g[g["_s"] == 1]
        m = le[["k", "u"]].merge(ri[["k", "w"]], on="k", how="inner")
        m = m[m["w"] > m["k"]]  # enforce v < w → u < v < w
        return pd.DataFrame({"u": m["u"], "v": m["k"], "w": m["w"]})

    wedges = (
        lo_side.union(hi_side)
        .map_batches(
            lambda d: d.assign(**{PART_COL: (_key_hash(d, ["k"]) % num_parts).astype("int64")}),
            batch_format="pandas",
        )
        .repartition(num_parts)
        .groupby(PART_COL)
        .map_groups(_wedge, batch_format="pandas")
    )

    # closing edge: keep wedges whose (u,w) is an edge — semi-join on the
    # composite key
    SEP = "\x1f"

    def _wkey(d: pd.DataFrame) -> pd.DataFrame:
        if "u" not in d.columns:
            return pd.DataFrame({"u": pd.Series([], dtype=object),
                                 "v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "uw": pd.Series([], dtype=object)})
        return d.assign(uw=d["u"].astype(str) + SEP + d["w"].astype(str))

    def _ekey(d: pd.DataFrame) -> pd.DataFrame:
        if "u" not in d.columns:
            return pd.DataFrame({"uw": pd.Series([], dtype=object)})
        return pd.DataFrame({"uw": d["u"].astype(str) + SEP + d["v"].astype(str)})

    from .grouped import reduce_side_semi_join

    return reduce_side_semi_join(
        wedges.map_batches(_wkey, batch_format="pandas"),
        ["u", "v", "w"], "uw",
        und.map_batches(_ekey, batch_format="pandas"), "uw",
        num_parts=num_parts,
    )


def pagerank_ds(edges_ds, damping: float = 0.85, iters: int = 10,
                num_parts: int = 8, src: str = "src_url", dst: str = "dst_url",
                driver_threshold: int = 2_000_000):
    """Dataset(src, dst) → Dataset(url, rank); see module docstring.

    Counted dispatch (same policy as stages/cc.py): the edge list is
    materialized and COUNTED; at or below ``driver_threshold`` edges the
    dict reference runs driver-side (identical math, none of the per-round
    barrier overhead), above it the distributed rounds run."""
    import ray.data as rd

    from .grouped import PART_COL, _key_hash, distinct_block, hash_partitioned_agg

    def _both_nodes(d: pd.DataFrame) -> pd.DataFrame:
        # runs over the RENAMED edge table (src/dst)
        return pd.concat(
            [
                pd.DataFrame({"url": d.get("src", [])}),
                pd.DataFrame({"url": d.get("dst", [])}),
            ],
            ignore_index=True,
        )

    edges = edges_ds.map_batches(
        lambda d: pd.DataFrame({"src": d.get(src, []), "dst": d.get(dst, [])}),
        batch_format="pandas",
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame({"url": [], "rank": []}))
    if n_edges <= driver_threshold:
        pdf = edges.to_pandas()
        return rd.from_pandas(
            pagerank_pairs(pdf, damping=damping, iters=iters, src="src", dst="dst")
        )

    nodes = hash_partitioned_agg(
        edges.map_batches(_both_nodes, batch_format="pandas"),
        ["url"], distinct_block(["url"]), num_parts=num_parts,
    ).materialize()
    n = nodes.count()

    # out-degree per src (tiny vs corpus: one row per linking node)
    def _deg_rows(d: pd.DataFrame) -> pd.DataFrame:
        if "src" not in d.columns:
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "deg": pd.Series([], dtype="int64")})
        return pd.DataFrame({"node": d["src"], "deg": np.int64(1)})

    def _deg_sum(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("node", sort=False, as_index=False)["deg"].sum()

    degs = hash_partitioned_agg(edges.map_batches(_deg_rows, batch_format="pandas"),
                                ["node"], _deg_sum, num_parts=num_parts).materialize()

    # attach degree to ranks once per round via reduce-side merge; nodes
    # with no out-edges (deg NaN) are the dangling set
    ranks = nodes.map_batches(
        lambda d: pd.DataFrame({"url": d.get("url", []), "rank": 1.0 / n}),
        batch_format="pandas",
    ).materialize()

    def _route(ds_in, key):
        return (
            ds_in.map_batches(
                lambda d: d.assign(**{PART_COL: (_key_hash(d, [key]) % num_parts).astype("int64")}),
                batch_format="pandas",
            )
            .repartition(num_parts)
            .groupby(PART_COL)
        )

    for _ in range(iters):
        # ranks ⋈ degs on url/node (left) → share = damping * rank / deg
        a_side = ranks.map_batches(
            lambda d: pd.DataFrame({"k": d.get("url", []), "rank": d.get("rank", []),
                                    "deg": None, "_s": 0}),
            batch_format="pandas",
        )
        b_side = degs.map_batches(
            lambda d: pd.DataFrame({"k": d.get("node", []), "rank": None,
                                    "deg": d.get("deg", []), "_s": 1}),
            batch_format="pandas",
        )

        def _attach(g: pd.DataFrame) -> pd.DataFrame:
            le = g[g["_s"] == 0]
            ri = g[g["_s"] == 1]
            m = le[["k", "rank"]].merge(ri[["k", "deg"]], on="k", how="left")
            return pd.DataFrame({"url": m["k"], "rank": m["rank"], "deg": m["deg"]})

        rk = _route(a_side.union(b_side), "k").map_groups(_attach, batch_format="pandas")
        rk = rk.materialize()

        # dangling mass: one tiny aggregate
        def _dang(d: pd.DataFrame) -> pd.DataFrame:
            if "deg" not in d.columns:
                return pd.DataFrame({"m": [0.0]})
            return pd.DataFrame({"m": [float(d.loc[d["deg"].isna(), "rank"].sum())]})

        dangling = float(
            rk.map_batches(_dang, batch_format="pandas").to_pandas()["m"].sum()
        )

        # contributions: edges ⋈ rk on src → (dst, damping*rank/deg)
        e_side = edges.map_batches(
            lambda d: pd.DataFrame({"k": d.get("src", []), "dst": d.get("dst", []),
                                    "rank": None, "deg": None, "_s": 0}),
            batch_format="pandas",
        )
        r_side = rk.map_batches(
            lambda d: pd.DataFrame({"k": d.get("url", []), "dst": None,
                                    "rank": d.get("rank", []), "deg": d.get("deg", []),
                                    "_s": 1}),
            batch_format="pandas",
        )

        def _contrib(g: pd.DataFrame) -> pd.DataFrame:
            le = g[g["_s"] == 0]
            ri = g[g["_s"] == 1]
            m = le[["k", "dst"]].merge(ri[["k", "rank", "deg"]], on="k", how="inner")
            share = damping * m["rank"].astype(float) / m["deg"].astype(float)
            return pd.DataFrame({"url": m["dst"], "contrib": share})

        contribs = _route(e_side.union(r_side), "k").map_groups(_contrib, batch_format="pandas")

        base = (1.0 - damping) / n + damping * dangling / n

        def _zero_rows(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"url": d.get("url", []), "contrib": 0.0})

        def _sum_contrib(d: pd.DataFrame) -> pd.DataFrame:
            if "url" not in d.columns:
                return pd.DataFrame({"url": pd.Series([], dtype=object),
                                     "contrib": pd.Series([], dtype="float64")})
            return d.groupby("url", sort=False, as_index=False)["contrib"].sum()

        summed = hash_partitioned_agg(
            nodes.map_batches(_zero_rows, batch_format="pandas").union(contribs),
            ["url"], _sum_contrib, num_parts=num_parts,
        )
        ranks = summed.map_batches(
            lambda d: pd.DataFrame({"url": d.get("url", []),
                                    "rank": d.get("contrib", pd.Series([], dtype=float)) + base}),
            batch_format="pandas",
        ).materialize()

    return ranks
