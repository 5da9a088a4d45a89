"""The knowledge-graph construction DAG (SURVEY.md §7.1 target dataflow).

    pages ─extract+parse─▶ parsed ─┬─▶ links
                                   ├─▶ nodes_raw ─▶ nodes (keep-first by id)
                                   │        └────▶ canonical map (blocking-key groupby)
                                   └─▶ triples_raw ─▶ edges (dedup + count, dangling dropped)
                                             └─────▶ edges_canonical (broadcast-linked)

Each function returns a *lazy* ``ray.data.Dataset``; nothing materializes
until the caller consumes (write_parquet / to_pandas on small results).
Wide steps use the salted three-level aggregation in stages/grouped.py;
small-side lookups (node-id vocabulary, canonical map) are broadcast via
``ray.put`` — never re-shipped per batch and never a second shuffle.

Batch-size note: html rows are a few KB; 256 rows/batch keeps per-task
overhead amortized while a batch × 32 concurrent tasks stays ≪ worker heap.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..sources import read_pages
from ..stages.extract import extract_parse_batch, extract_text_batch, flatten_list_column
from ..stages.grouped import (
    count_first_block,
    keep_first_block,
    salted_grouped_agg,
)
from ..stages.linkage import CanonicalizeTriples, canonical_map_ds, normalize_surface_series

EXTRACT_BATCH_SIZE = 256


def parsed_ds(pages_path: str):
    """pages → parsed page records (url, title, summary, text_out, links,
    nodes, triples).  Column-pruned read: only url + html leave storage."""
    return read_pages(pages_path, columns=["url", "html"]).map_batches(
        extract_parse_batch, batch_format="pyarrow", batch_size=EXTRACT_BATCH_SIZE
    )


def extracted_ds(pages_path: str):
    """pages → (url, title, summary, text_out, n_paras) — byte-identical-text
    surface (north-rule invariant)."""
    return read_pages(pages_path, columns=["url", "html"]).map_batches(
        extract_text_batch, batch_format="pyarrow", batch_size=EXTRACT_BATCH_SIZE
    )


def links_ds(pages_path: str):
    """Exploded scoped links (url, text, link_url) — ops M2/M3."""
    return parsed_ds(pages_path).map_batches(
        lambda t: flatten_list_column(t, "links", keep=["url"]),
        batch_format="pyarrow",
    )


def nodes_raw_ds(source):
    """parsed → one row per concept occurrence (pre-dedup).

    ``source`` is a parsed Dataset or a pages path (string)."""
    ds = parsed_ds(source) if isinstance(source, str) else source
    return ds.map_batches(
        lambda t: flatten_list_column(t, "nodes", keep=["url"]),
        batch_format="pyarrow",
    )


def triples_raw_ds(source):
    """parsed → one row per emitted relation (duplicates preserved —
    md2csv.py:93 appends without dedup; dedup is the edges stage)."""
    ds = parsed_ds(source) if isinstance(source, str) else source
    return ds.map_batches(
        lambda t: flatten_list_column(t, "triples", keep=["url"]),
        batch_format="pyarrow",
    )


def nodes_ds(source, salt_buckets: int = 16):
    """Global node dedup: keep-first by canonical id, ordered by ``seq``
    (G1 resolved keep-first to match the scored Neo4j-side semantics G6 —
    SURVEY.md §7.4 'last-write-wins vs first-wins')."""
    return salted_grouped_agg(
        nodes_raw_ds(source),
        keys=["id"],
        block_agg=keep_first_block(["id"], "seq"),
        salt_from="url",
        salt_buckets=salt_buckets,
    )


def _node_id_set(source) -> frozenset:
    """Distinct node ids — the entity vocabulary (small side, broadcast).

    Vocabulary cardinality ~ |entities|, not |corpus|; at 100 TB this is the
    canonical broadcast-semi-join case (SURVEY.md §2.5 J1).  The distinct
    runs DISTRIBUTED (hash-partitioned dedup) so only the vocabulary-sized
    result ever reaches the driver — never the corpus-sized occurrence
    column.  If even the vocabulary outgrew memory, use
    ``edges_ds(join_mode="bucketed")`` (a real distributed join)."""
    from ..stages.grouped import distinct_block, hash_partitioned_agg

    ids = hash_partitioned_agg(
        nodes_raw_ds(source).select_columns(["id"]), ["id"], distinct_block(["id"])
    ).to_pandas()
    # an empty Dataset materializes with no columns at all
    return frozenset(ids["id"]) if "id" in ids.columns else frozenset()


TRIPLE_COLS = ["url", "seq", "subj", "pred", "obj", "subj_name", "obj_name", "props_json"]


def edges_ds(source, node_ids: frozenset | None = None, salt_buckets: int = 16,
             use_bloom: bool = False, join_mode: str = "broadcast"):
    """Triple dedup + graph materialization (G2/G6): drop dangling endpoints
    (reference policy J1: both endpoints must be known concepts), then
    groupby (subj, pred, obj) → weight = occurrence count, representative
    names/props = global keep-first by seq.

    ``join_mode``:
      * ``"broadcast"`` (default) — the node-id vocabulary is broadcast via
        ``ray.put`` and probed per batch; right when the vocabulary fits a
        worker (the common corpus/vocab ratio).
      * ``"bucketed"`` — NO broadcast: the distinct-id Dataset semi-joins
        the triples by key hash (stages/grouped.reduce_side_semi_join),
        once on subj and once on obj.  The scale path when even the
        vocabulary outgrows worker memory.  Output identical (tested).

    ``use_bloom`` (broadcast mode): ship a Bloom filter of the id set ahead
    of the exact set — bits instead of strings; the exact set still
    verifies the bloom survivors, so output is identical either way."""
    import ray

    from ..functions.bloom import BloomFilter

    triples = triples_raw_ds(source)
    if join_mode == "bucketed":
        from ..stages.grouped import distinct_block, hash_partitioned_agg, reduce_side_semi_join

        ids_ds = hash_partitioned_agg(
            nodes_raw_ds(source).select_columns(["id"]), ["id"], distinct_block(["id"])
        )
        kept = reduce_side_semi_join(triples, TRIPLE_COLS, "subj", ids_ds, "id")
        kept = reduce_side_semi_join(kept, TRIPLE_COLS, "obj", ids_ds, "id")
    else:
        if node_ids is None:
            node_ids = _node_id_set(source)
        ids_ref = ray.put(node_ids)
        bloom_ref = ray.put(BloomFilter.build(node_ids) if use_bloom else None)

        def _drop_dangling(batch: pd.DataFrame) -> pd.DataFrame:
            bloom = ray.get(bloom_ref)
            if bloom is not None and len(batch):
                # vectorized probe: one (rows × n_hashes) broadcast per column
                m0 = bloom.contains_many(batch["subj"].to_numpy()) & bloom.contains_many(
                    batch["obj"].to_numpy()
                )
                batch = batch[m0]
            ids = ray.get(ids_ref)
            m = batch["subj"].isin(ids) & batch["obj"].isin(ids)
            return batch[m].reset_index(drop=True)

        kept = triples.map_batches(_drop_dangling, batch_format="pandas")
    return salted_grouped_agg(
        kept,
        keys=["subj", "pred", "obj"],
        block_agg=count_first_block(["subj", "pred", "obj"], "seq"),
        salt_from="url",
        salt_buckets=salt_buckets,
    )


def canonical_nodes_ds(source, salt_buckets: int = 16):
    """Canonical entity table after linking: one row per blocking key —
    (norm_key, canon_name, canon_id)."""
    return canonical_map_ds(nodes_raw_ds(source), salt_buckets=salt_buckets)


def edges_canonical_ds(source, canon_map: dict | None = None, concurrency=(2, 16),
                       join_mode: str = "broadcast"):
    """Canonicalized, deduplicated edge table: endpoints rewritten to
    canonical ids, unknown blocking keys dropped, then the same salted
    dedup-count as edges_ds.

    ``join_mode="broadcast"`` (default): the canonical map is broadcast and
    applied by an actor pool (map fetched once per actor) — right while the
    entity vocabulary fits a worker.  ``join_mode="bucketed"``: NO
    broadcast — the canonical-map Dataset is reduce-side-joined against the
    triples on the blocking key (subj pass then obj pass), the scale path
    for vocabularies beyond worker memory.  Output identical (tested)."""
    import ray

    triples = triples_raw_ds(source)
    if join_mode == "bucketed":
        from ..stages.grouped import reduce_side_lookup

        canon_ds = canonical_nodes_ds(source)

        def _keys(d: pd.DataFrame) -> pd.DataFrame:
            d = d.copy()
            d["sk"] = normalize_surface_series(d["subj_name"])
            d["ok"] = normalize_surface_series(d["obj_name"])
            return d

        with_keys = triples.map_batches(_keys, batch_format="pandas")
        l1 = reduce_side_lookup(
            with_keys, ["url", "seq", "pred", "props_json", "ok"], "sk",
            canon_ds, "norm_key", ["canon_id", "canon_name"],
        ).map_batches(
            lambda d: d.rename(columns={"canon_id": "subj", "canon_name": "subj_name"}),
            batch_format="pandas",
        )
        linked = reduce_side_lookup(
            l1, ["url", "seq", "pred", "props_json", "subj", "subj_name"], "ok",
            canon_ds, "norm_key", ["canon_id", "canon_name"],
        ).map_batches(
            lambda d: d.rename(columns={"canon_id": "obj", "canon_name": "obj_name"}),
            batch_format="pandas",
        )
    else:
        if canon_map is None:
            canon_pdf = canonical_nodes_ds(source).to_pandas()
            canon_map = (
                {
                    k: (i, n)
                    for k, i, n in zip(
                        canon_pdf["norm_key"], canon_pdf["canon_id"], canon_pdf["canon_name"]
                    )
                }
                if "norm_key" in canon_pdf.columns
                else {}
            )
        ref = ray.put(canon_map)
        linked = triples.map_batches(
            CanonicalizeTriples,
            fn_constructor_args=(ref,),
            batch_format="pandas",
            concurrency=concurrency,
        )
    return salted_grouped_agg(
        linked,
        keys=["subj", "pred", "obj"],
        block_agg=count_first_block(["subj", "pred", "obj"], "seq"),
        salt_from="url",
        salt_buckets=16,
    )


# ---------------------------------------------------------------------------
# Page-level graph (web-branch constructor semantics, J4/G5)
# ---------------------------------------------------------------------------


def page_graph_edges_ds(pages_path: str):
    """Distinct page-link edges (src_url, dst_url, text) — the reference's
    BFS children/parents relation (constructor.py:189-244) re-expressed
    order-free: global distinct instead of visited-set mutation."""
    from ..stages.grouped import distinct_block, hash_partitioned_agg

    links = links_ds(pages_path).map_batches(
        lambda df: df.rename(columns={"url": "src_url", "link_url": "dst_url"}),
        batch_format="pandas",
    )
    return hash_partitioned_agg(
        links, ["src_url", "dst_url", "text"], distinct_block(["src_url", "dst_url", "text"])
    )


def page_graph_nodes_ds(pages_path: str):
    """Page nodes with placeholder semantics: crawled pages keep their
    extracted title; link targets never crawled become placeholders named by
    the (min) link text — the reference's placeholder-upsert
    (constructor.py:207-229) as a groupby merge instead of a shared dict.
    Deterministic delta vs the reference: placeholder name = lexicographic
    min link text (the reference keeps BFS-encounter order)."""
    import numpy as np

    from ..stages.grouped import hash_partitioned_agg

    real = extracted_ds(pages_path).map_batches(
        lambda df: pd.DataFrame(
            {"url": df["url"], "name": df["title"], "is_placeholder": np.int64(0)}
        ),
        batch_format="pandas",
    )
    targets = links_ds(pages_path).map_batches(
        lambda df: pd.DataFrame(
            {"url": df["link_url"], "name": df["text"], "is_placeholder": np.int64(1)}
        ),
        batch_format="pandas",
    )

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        # real row (flag 0) wins; among placeholders, min name
        return (
            df.sort_values(["is_placeholder", "name"], kind="mergesort")
            .drop_duplicates(subset=["url"], keep="first")
            .reset_index(drop=True)
        )

    return hash_partitioned_agg(real.union(targets), ["url"], _merge)


def node_parents_ds(source):
    """Parent resolution self-join (ops J2/J3) — order-independent: the
    reference resolves ``parent`` only when the parent row precedes the
    child in file order (csv2owl.py:49-57).  Implemented as a distributed
    hash-partitioned ``Dataset.join`` (nodes ⋈ nodes on parent = id) — the
    both-sides-large join form; dangling parents → ''.  (When the node
    table is vocabulary-sized a broadcast map is equivalent and cheaper —
    this op deliberately exercises the shuffle join.)"""
    nodes = nodes_ds(source)
    left = nodes.select_columns(["id", "name", "parent"])
    right = nodes.select_columns(["id", "name"])
    joined = left.join(
        right,
        join_type="left_outer",
        num_partitions=8,
        on=("parent",),
        right_on=("id",),
        left_suffix="",
        right_suffix="_p",
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.rename(columns={"name_p": "parent_name"})
        out["parent_name"] = out["parent_name"].fillna("")
        return out[["id", "name", "parent", "parent_name"]]

    return joined.map_batches(_finish, batch_format="pandas")


def bfs_reachable(pages_path: str, start_url: str, max_depth: int = 2, max_nodes: int = 100):
    """BFS frontier with depth/node caps (reference op T2,
    constructor.py:135-159) over the page-link graph.

    Scale shape: the edge table lives in the OBJECT STORE (materialized
    once so levels don't re-run extraction); the driver holds only the
    visited/frontier sets — bounded by ``max_nodes`` — and each level
    fetches just the frontier's out-edges via a broadcast-frontier
    semi-filter (frontier is cap-bounded, the canonical small side).
    Deterministic: frontier processed in sorted-url order per level."""
    import pandas as pd
    import ray

    from ..stages.spill import pin

    edges = pin(page_graph_edges_ds(pages_path).select_columns(["src_url", "dst_url"]), "bfs-edges")

    visited: dict[str, int] = {start_url: 0}
    frontier = [start_url]
    depth = 0
    while frontier and depth < max_depth and len(visited) < max_nodes:
        f_ref = ray.put(frozenset(frontier))

        def _frontier_edges(b: pd.DataFrame, f_ref=f_ref) -> pd.DataFrame:
            f = ray.get(f_ref)
            return b[b["src_url"].isin(f)].reset_index(drop=True)

        lvl = edges.map_batches(_frontier_edges, batch_format="pandas").to_pandas()
        adj = (
            lvl.groupby("src_url")["dst_url"].apply(sorted).to_dict()
            if len(lvl)
            else {}
        )
        nxt = []
        for u in sorted(frontier):
            for v in adj.get(u, []):
                if v not in visited and len(visited) < max_nodes:
                    visited[v] = depth + 1
                    nxt.append(v)
        frontier = nxt
        depth += 1
    out = pd.DataFrame({"url": list(visited), "depth": list(visited.values())})
    out["depth"] = out["depth"].astype("int64")
    return out.sort_values(["depth", "url"]).reset_index(drop=True)
