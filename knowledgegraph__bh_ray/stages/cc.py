"""Distributed connected components — iterative min-label propagation.

Union-find at scale (SURVEY.md §7.4): a driver-side DSU only works when the
edge set is provably small, so the engine's default is bounded rounds of
min-label propagation expressed as shuffles:

    labels(v) ← min(labels(v), min over neighbors u of labels(u))

Each round: explode edges both directions, attach current labels to the
source side (broadcast — the *label table* is |V|-sized; for vocabularies
beyond worker memory swap the broadcast for a Dataset.join on node), group
by target, take the min.  Convergence in ≤ diameter rounds; near-dup
clusters are shallow (stars/cliques), so ``max_rounds`` defaults small and
the loop exits early when no label changes.

Used by the near-dup clustering query (minhash pairs → duplicate clusters).
"""

from __future__ import annotations

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


def connected_components_ds(pairs_ds, a: str = "id_a", b: str = "id_b",
                            max_rounds: int = 10, num_parts: int = 8):
    """Dataset of pairs → Dataset(node, cluster) via min-label propagation.

    Each round: broadcast the directed edge list (the LSH-collision pair
    set, ≪ corpus by construction), propagate labels along edges inside
    map_batches, then one hash-partitioned min-combine per round:
    new_label(v) = min(label(v), min(label(u) for u→v)).  If the pair set
    ever outgrew worker memory, the broadcast merge becomes a per-round
    Dataset.join on ``src`` — same round structure."""
    import ray
    import ray.data as rd

    from .grouped import PART_COL, _key_hash

    # materialize the (small) edge list once; labels iterate on the driver
    # loop but all heavy work (join+min) is a Dataset shuffle per round
    edges_pdf = pairs_ds.to_pandas()[[a, b]]
    if len(edges_pdf) == 0:
        return rd.from_pandas(pd.DataFrame({"node": [], "cluster": []}))
    both = pd.concat(
        [
            edges_pdf.rename(columns={a: "src", b: "dst"}),
            edges_pdf.rename(columns={b: "src", a: "dst"}),
        ],
        ignore_index=True,
    )
    edges_ref = ray.put(both)

    labels = pd.DataFrame({"node": pd.concat([edges_pdf[a], edges_pdf[b]]).unique()})
    labels["label"] = labels["node"]

    for _ in range(max_rounds):
        labels_ds = rd.from_pandas(labels).repartition(num_parts)

        def _propagate(batch: pd.DataFrame) -> pd.DataFrame:
            e = ray.get(edges_ref)
            # labels of this batch's nodes flow to their neighbors
            prop = e.merge(batch, left_on="src", right_on="node")[["dst", "label"]]
            prop = prop.rename(columns={"dst": "node"})
            return pd.concat([batch[["node", "label"]], prop], ignore_index=True)

        cand = labels_ds.map_batches(_propagate, batch_format="pandas")
        cand = cand.map_batches(
            lambda df: df.assign(**{PART_COL: (_key_hash(df, ["node"]) % num_parts).astype("int64")}),
            batch_format="pandas",
        )
        new_labels = (
            cand.repartition(num_parts)
            .groupby(PART_COL)
            .map_groups(
                lambda g: g.groupby("node", sort=False, as_index=False)["label"].min(),
                batch_format="pandas",
            )
            .to_pandas()
        )
        merged = labels.merge(new_labels, on="node", suffixes=("_old", ""))
        converged = (merged["label"] == merged["label_old"]).all()
        labels = merged[["node", "label"]]
        # pointer-jumping compression (label ← label(label)) to a local
        # fixpoint: turns O(diameter) propagation into O(log n) rounds; the
        # label table is |V(pairs)|-sized (small by assumption)
        while True:
            lut = dict(zip(labels["node"], labels["label"]))
            jumped = labels["label"].map(lambda l: lut.get(l, l))
            if (jumped == labels["label"]).all():
                break
            labels = pd.DataFrame({"node": labels["node"], "label": jumped})
        if converged:
            break

    return rd.from_pandas(labels.rename(columns={"label": "cluster"}))
