"""End-to-end resumable KG run: pages → parsed checkpoint → graph tables.

Phase structure (each phase is a resume unit, SURVEY.md §7.2 step 6):

  phase 1  ``parsed/shard=K/``   extract+parse, sharded by url-hash into
           ``num_shards`` units (``resume_granularity`` shards run per
           Dataset pass — granularity 1 means one pass, no read
           amplification; tests use >1 to exercise mid-run kill/resume)
  phase 2  ``nodes/``            global keep-first dedup over the checkpoint
  phase 3  ``edges/``            dangling-drop + dedup-count
  phase 4  ``canonical/`` + ``edges_canonical/``  linking outputs

Phase 2+ read the *parsed checkpoint*, column-pruned to what each phase
needs — extraction runs exactly once per page per run, and a killed run
resumes from the last completed unit (write-then-log manifest).  Outputs are
partitioned Parquet directories, never one giant file.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import bucket_of
from ..sources import read_pages
from ..state.lineage import CounterActor, Manifest
from . import kg


def _add_shard(batch: pa.Table, num_shards: int) -> pa.Table:
    shards = pa.array(
        [bucket_of(u, num_shards) for u in batch.column("url").to_pylist()], pa.int32()
    )
    return batch.append_column("shard", shards)


def run_kg_pipeline(
    pages_path: str,
    out_dir: str,
    num_shards: int = 8,
    resume_granularity: int = 1,
    counter: "ray.actor.ActorHandle | None" = None,
    _fail_after_units: int | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns the manifest records.

    ``resume_granularity`` = how many manifest units phase 1 is split into
    (each unit = one Dataset pass over its subset of url-hash shards).
    """
    import ray

    manifest = Manifest(out_dir)
    done = manifest.done_units()
    counter = counter or CounterActor.remote()
    completed_now = 0

    def _checkpoint_gate():
        """Test hook: simulate a mid-run kill after N completed units."""
        nonlocal completed_now
        completed_now += 1
        if _fail_after_units is not None and completed_now >= _fail_after_units:
            raise RuntimeError(f"injected failure after {completed_now} units")

    # ---- phase 1: extract+parse → parsed/shard=K ---------------------------
    groups = [
        list(range(g, num_shards, resume_granularity))
        for g in range(resume_granularity)
    ]
    parsed_dir = os.path.join(out_dir, "parsed")
    for gi, shard_list in enumerate(groups):
        unit = f"parsed:group={gi}"
        if unit in done:
            continue
        t0 = time.time()
        shard_set = frozenset(shard_list)
        pages = read_pages(pages_path, columns=["url", "html"])

        def _extract_group(batch: pa.Table, shard_set=shard_set) -> pa.Table:
            batch = _add_shard(batch, num_shards)
            import pyarrow.compute as pc

            mask = pc.is_in(batch.column("shard"), value_set=pa.array(list(shard_set), pa.int32()))
            sub = batch.filter(mask)
            n_in = sub.num_rows
            parsed = kg.extract_parse_batch(sub.select(["url", "html"]))
            counter.incr.remote("pages_in", n_in)
            counter.incr.remote("pages_dropped_verification", n_in - parsed.num_rows)
            return _add_shard(parsed, num_shards)

        ds = pages.map_batches(
            _extract_group, batch_format="pyarrow", batch_size=kg.EXTRACT_BATCH_SIZE
        )
        # clean any partial output of a previous killed attempt for this unit
        for s in shard_list:
            manifest.clean_unit_dir(os.path.join(parsed_dir, f"shard={s}"))
        ds.write_parquet(parsed_dir, partition_cols=["shard"])
        # row count from parquet footers — no data re-read
        import pyarrow.parquet as pq

        rows = 0
        for s in shard_list:
            sdir = os.path.join(parsed_dir, f"shard={s}")
            if os.path.isdir(sdir):
                for f in os.listdir(sdir):
                    if f.endswith(".parquet"):
                        rows += pq.ParquetFile(os.path.join(sdir, f)).metadata.num_rows
        manifest.mark_done(
            unit,
            rows,
            counters=ray.get(counter.get_all.remote()),
            wall_sec=time.time() - t0,
        )
        _checkpoint_gate()

    def _parsed(columns=None):
        return rd.read_parquet(parsed_dir, columns=columns)

    # ---- phase 2: nodes ----------------------------------------------------
    nodes_dir = os.path.join(out_dir, "nodes")
    if "nodes" not in done:
        t0 = time.time()
        manifest.clean_unit_dir(nodes_dir)
        nodes = kg.nodes_ds(_parsed(columns=["url", "nodes"]))
        nodes.write_parquet(nodes_dir)
        n = rd.read_parquet(nodes_dir).count()
        manifest.mark_done("nodes", n, wall_sec=time.time() - t0)
        _checkpoint_gate()

    # ---- phase 3: edges ----------------------------------------------------
    edges_dir = os.path.join(out_dir, "edges")
    if "edges" not in done:
        t0 = time.time()
        manifest.clean_unit_dir(edges_dir)
        node_ids = frozenset(rd.read_parquet(nodes_dir, columns=["id"]).unique("id"))
        edges = kg.edges_ds(_parsed(columns=["url", "triples"]), node_ids=node_ids)
        edges.write_parquet(edges_dir)
        n = rd.read_parquet(edges_dir).count()
        manifest.mark_done("edges", n, wall_sec=time.time() - t0)
        _checkpoint_gate()

    # ---- phase 4: canonicalization ----------------------------------------
    canon_dir = os.path.join(out_dir, "canonical")
    ecanon_dir = os.path.join(out_dir, "edges_canonical")
    if "canonical" not in done:
        t0 = time.time()
        manifest.clean_unit_dir(canon_dir)
        manifest.clean_unit_dir(ecanon_dir)
        canon = kg.canonical_nodes_ds(_parsed(columns=["url", "nodes"]))
        canon.write_parquet(canon_dir)
        canon_pdf = rd.read_parquet(canon_dir).to_pandas()
        canon_map = {
            k: (i, n)
            for k, i, n in zip(
                canon_pdf["norm_key"], canon_pdf["canon_id"], canon_pdf["canon_name"]
            )
        }
        ecanon = kg.edges_canonical_ds(_parsed(columns=["url", "triples"]), canon_map=canon_map)
        ecanon.write_parquet(ecanon_dir)
        n = rd.read_parquet(ecanon_dir).count()
        manifest.mark_done("canonical", n, wall_sec=time.time() - t0)
        _checkpoint_gate()

    return {
        "out_dir": out_dir,
        "records": manifest.records(),
        "counters": ray.get(counter.get_all.remote()),
    }


def read_output(out_dir: str, table: str):
    return rd.read_parquet(os.path.join(out_dir, table))
