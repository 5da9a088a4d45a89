"""Distributed connected components — iterative min-label propagation.

Union-find at scale (SURVEY.md §7.4): a driver-side DSU only works when the
edge set is provably small — near-dup pairs on a boilerplate-heavy crawl are
NOT (pairs can approach corpus size).  So every round here is expressed in
Dataset ops; neither the edge list nor the label table ever materializes on
the driver:

    labels(v) ← min(labels(v), min over neighbors u of labels(u))

Per round: ``edges ⋈ labels`` on src flows each node's label to its
neighbors, a hash-partitioned min-combine collapses candidates, then one
pointer-jumping self-join (label ← label(label)) turns O(diameter)
propagation into O(log n) rounds.  Convergence is detected with a tiny
per-round label-table checksum aggregate (an order-invariant uint64 sum),
not a driver-side compare.

The joins are REDUCE-SIDE merges built from the engine's own partitioning
machinery (tag sides → union → hash-partition on the key → one vectorized
pandas merge per partition) rather than ``Dataset.join``: converged labels
are maximally skewed (one giant component ⇒ one label value), and Ray's
Arrow hash join errors out when a shuffle partition receives zero rows on
one side — which skewed keys make routine.  Skew note: a giant component
routes its rows to one reducer; the merge inside is vectorized C, so the
bound is one partition's rows in one worker's memory — beyond that,
salt-split the label key (documented limitation, standard for CC).

The only whole-table operations are ``materialize()`` calls on the
*iterative state* (edges once, labels per round) — object-store resident,
spillable, required so round N+1 does not re-execute the entire upstream
pair-generation DAG N times.

Used by the near-dup clustering query (minhash pairs → duplicate clusters).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def connected_components_pairs(pairs: pd.DataFrame, a: str = "id_a", b: str = "id_b",
                               max_rounds: int = 10) -> pd.DataFrame:
    """Driver-side reference implementation over a pairs DataFrame →
    (node, cluster) with cluster = min node id of the component."""
    label = {}
    for x in pd.concat([pairs[a], pairs[b]]).unique():
        label[x] = x
    for _ in range(max_rounds):
        changed = False
        for x, y in zip(pairs[a], pairs[b]):
            m = min(label[x], label[y])
            if label[x] != m or label[y] != m:
                label[x] = m
                label[y] = m
                changed = True
        if not changed:
            break
    # path-compress to fixpoint
    for _ in range(max_rounds):
        changed = False
        for x in list(label):
            if label[label[x]] != label[x]:
                label[x] = label[label[x]]
                changed = True
        if not changed:
            break
    return pd.DataFrame({"node": list(label), "cluster": [label[x] for x in label]})


def dsu_pairs(pairs: pd.DataFrame, a: str = "id_a", b: str = "id_b") -> pd.DataFrame:
    """Union-find with path compression and union-by-min (the root IS the
    min id of the component, matching the min-label semantics).  The fast
    path for pair sets that COUNTED small — O(α) per edge."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(pairs[a], pairs[b]):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    return pd.DataFrame({"node": list(parent), "cluster": [find(x) for x in parent]})


def _label_checksum(labels_ds) -> int:
    """Order-invariant uint64 checksum of a (node, label) Dataset — one tiny
    aggregate pass; equal checksums across rounds ⇒ converged."""

    def _chk(df: pd.DataFrame) -> pd.DataFrame:
        if "node" not in df.columns or len(df) == 0:  # empty passthrough block
            return pd.DataFrame({"h": np.array([0], dtype=np.uint64)})
        h = pd.util.hash_pandas_object(
            df["node"].astype(str) + "\x1f" + df["label"].astype(str), index=False
        ).to_numpy(dtype=np.uint64)
        return pd.DataFrame({"h": np.array([h.sum()], dtype=np.uint64)})

    parts = labels_ds.map_batches(_chk, batch_format="pandas").to_pandas()
    return int(np.array(parts["h"], dtype=np.uint64).sum(dtype=np.uint64)) if len(parts) else 0


def connected_components_ds(pairs_ds, a: str = "id_a", b: str = "id_b",
                            max_rounds: int = 16, num_parts: int = 8,
                            driver_threshold: int = 2_000_000):
    """Dataset of pairs → Dataset(node, cluster).

    Dispatch is COUNTED, not assumed: the directed edge list is materialized
    once (object store) and counted.  At or below ``driver_threshold``
    directed edges the exact DSU runs driver-side (pairs provably fit);
    above it — the adversarial boilerplate-replication case where pairs
    approach corpus size — the distributed min-label rounds run with
    Dataset joins only.  Both paths produce identical (node, min-id
    cluster) output (property-tested)."""
    import ray.data as rd

    from .grouped import distinct_block, hash_partitioned_agg
    from .spill import pin

    def _both(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [
                batch[[a, b]].rename(columns={a: "src", b: "dst"}),
                batch[[a, b]].rename(columns={b: "src", a: "dst"}),
            ],
            ignore_index=True,
        )

    # materialize the directed edge list ONCE (object store, not driver) so
    # each round's join does not re-run the upstream pair-generation DAG
    edges_raw = pin(pairs_ds.map_batches(_both, batch_format="pandas"), "cc-edges")
    n_directed = edges_raw.count()
    if n_directed == 0:
        return rd.from_pandas(pd.DataFrame({"node": [], "cluster": []}))
    if n_directed <= driver_threshold:
        pdf = edges_raw.to_pandas()
        return rd.from_pandas(dsu_pairs(pdf, "src", "dst"))

    from .grouped import PART_COL, _key_hash

    edges = edges_raw

    def _route(ds):
        """Attach the shuffle partition id (hash of 'k') and repartition —
        the common front half of every reduce-side merge below.  Inputs
        always carry full columns (the tagging lambdas emit them even for
        zero rows), so the assign works on empty frames too."""
        keyed = ds.map_batches(
            lambda d: d.assign(**{PART_COL: (_key_hash(d, ["k"]) % num_parts).astype("int64")}),
            batch_format="pandas",
        )
        return keyed.repartition(num_parts).groupby(PART_COL)

    def _propagate(labels_ds):
        """(node,label) ⋈ edges on src → candidate (node=dst, label)."""
        e = edges.map_batches(
            lambda d: pd.DataFrame({"k": d.get("src", []), "dst": d.get("dst", []),
                                    "label": None, "_s": 0}),
            batch_format="pandas",
        )
        l = labels_ds.map_batches(
            lambda d: pd.DataFrame({"k": d.get("node", []), "dst": None,
                                    "label": d.get("label", []), "_s": 1}),
            batch_format="pandas",
        )

        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            le = g[g["_s"] == 0]
            ri = g[g["_s"] == 1]
            m = le[["k", "dst"]].merge(ri[["k", "label"]], on="k", how="inner")
            return pd.DataFrame({"node": m["dst"], "label": m["label"]})

        return _route(e.union(l)).map_groups(_merge, batch_format="pandas")

    def _jump(labels_ds):
        """Pointer jumping: label ← label(label) — self reduce-side merge
        keyed on the label value (min labels are themselves node ids)."""
        a_side = labels_ds.map_batches(
            lambda d: pd.DataFrame({"k": d.get("label", []), "node": d.get("node", []),
                                    "jlabel": None, "_s": 0}),
            batch_format="pandas",
        )
        b_side = labels_ds.map_batches(
            lambda d: pd.DataFrame({"k": d.get("node", []), "node": None,
                                    "jlabel": d.get("label", []), "_s": 1}),
            batch_format="pandas",
        )

        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            le = g[g["_s"] == 0]
            ri = g[g["_s"] == 1]
            m = le[["k", "node"]].merge(ri[["k", "jlabel"]], on="k", how="left")
            return pd.DataFrame({"node": m["node"], "label": m["jlabel"].fillna(m["k"])})

        return _route(a_side.union(b_side)).map_groups(_merge, batch_format="pandas")

    def _min_label_block(df: pd.DataFrame) -> pd.DataFrame:
        if "node" not in df.columns:  # empty passthrough block
            return pd.DataFrame({"node": [], "label": []})
        return df.groupby("node", sort=False, as_index=False)["label"].min()

    labels = (
        hash_partitioned_agg(
            edges.map_batches(
                lambda d: d[["src"]].rename(columns={"src": "node"})
                if "src" in d.columns
                else pd.DataFrame({"node": []}),
                batch_format="pandas",
            ),
            ["node"],
            distinct_block(["node"]),
            num_parts=num_parts,
        )
        .map_batches(
            lambda d: pd.DataFrame({"node": d.get("node", []), "label": d.get("node", [])}),
            batch_format="pandas",
        )
    )
    labels = pin(labels, "cc-labels")

    prev_chk = _label_checksum(labels)
    for _ in range(max_rounds):
        cand = labels.union(_propagate(labels))
        new_labels = hash_partitioned_agg(cand, ["node"], _min_label_block,
                                          num_parts=num_parts)
        labels = pin(_jump(new_labels), "cc-labels")
        chk = _label_checksum(labels)
        if chk == prev_chk:
            break
        prev_chk = chk

    return labels.map_batches(
        lambda d: d.rename(columns={"label": "cluster"}), batch_format="pandas"
    )


def ancestor_closure_ds(nodes_ds, id_col: str = "id", parent_col: str = "parent",
                        max_depth: int = 10, num_parts: int = 8):
    """Dataset(id, parent) → Dataset(id, anc, depth): the transitive parent
    closure to ``max_depth``, fully distributed — no driver-side pointer
    chasing (round-2 verdict replaced a per-node Python while-loop here).

    Parent pointers are FUNCTIONAL (one parent per node), so the closure is
    built by frontier composition with doubling: keep C = all (id, anc, d)
    found so far (d ≤ p) and F = the single row per id at exact depth p;
    one reduce-side join F(id, m, p) ⋈ C(m, a, d) yields depths p+1..2p with
    no duplicate (id, depth) — ranges are disjoint, so no dedup pass is
    needed.  ceil(log2(max_depth)) joins total (4 for depth 10) instead of
    max_depth sequential rounds.  Chains stop where parent == ''; self-loop
    chains terminate at the depth cap exactly like the SQL recursion."""
    import ray.data as rd

    from .grouped import PART_COL, _key_hash

    def _base(d: pd.DataFrame) -> pd.DataFrame:
        if id_col not in d.columns:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "anc": pd.Series([], dtype=object),
                                 "depth": pd.Series([], dtype="int64")})
        m = d[d[parent_col] != ""]
        return pd.DataFrame({"id": m[id_col], "anc": m[parent_col],
                             "depth": np.int64(1)})

    from .spill import pin

    closure = pin(nodes_ds.map_batches(_base, batch_format="pandas"), "anc-closure")
    frontier = closure  # exact-depth-p rows; p = 1

    def _compose(front, clos, p: int):
        """front(id, m, p) ⋈ clos(m, a, d) on m → (id, a, p+d) capped."""
        f_side = front.map_batches(
            lambda d: pd.DataFrame({"k": d.get("anc", []), "id": d.get("id", []),
                                    "a2": None, "d2": None, "_s": 0}),
            batch_format="pandas",
        )
        c_side = clos.map_batches(
            lambda d: pd.DataFrame({"k": d.get("id", []), "id": None,
                                    "a2": d.get("anc", []), "d2": d.get("depth", []),
                                    "_s": 1}),
            batch_format="pandas",
        )

        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            le = g[g["_s"] == 0]
            ri = g[g["_s"] == 1]
            m = le[["k", "id"]].merge(ri[["k", "a2", "d2"]], on="k", how="inner")
            depth = m["d2"].astype("int64") + np.int64(p)
            keep = depth <= max_depth
            return pd.DataFrame({"id": m["id"][keep], "anc": m["a2"][keep],
                                 "depth": depth[keep]})

        return (
            f_side.union(c_side)
            .map_batches(
                lambda d: d.assign(**{PART_COL: (_key_hash(d, ["k"]) % num_parts).astype("int64")}),
                batch_format="pandas",
            )
            .repartition(num_parts)
            .groupby(PART_COL)
            .map_groups(_merge, batch_format="pandas")
        )

    p = 1
    while p < max_depth:
        new_rows = pin(_compose(frontier, closure, p), "anc-rows")
        closure = pin(closure.union(new_rows), "anc-closure")
        p *= 2
        if p < max_depth:  # next round still composes: refresh the frontier
            frontier = new_rows.map_batches(
                lambda d, depth=p: d[d.get("depth", pd.Series([], dtype="int64")) == depth]
                if "depth" in d.columns else d,
                batch_format="pandas",
            )

    def _pin(d: pd.DataFrame) -> pd.DataFrame:
        if "id" not in d.columns:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "anc": pd.Series([], dtype=object),
                                 "depth": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id": d["id"], "anc": d["anc"],
                             "depth": d["depth"].astype("int64")})

    return closure.map_batches(_pin, batch_format="pandas")
