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
from ..state.lineage import Manifest, ShardedCounter
from . import kg

# fsspec's HTTP module needs aiohttp (absent here) and FAILS to import; a
# failed import is retried — and re-executed — on every attempt, so two
# driver threads creating Datasets concurrently can race the partial module
# and crash Ray's path resolution with "cannot import name HTTPFileSystem"
# (an ImportError its ModuleNotFoundError guard does not catch).  Pin a
# sentinel module in sys.modules so every later import is a cache hit;
# Ray's isinstance() check against the sentinel class is False for every
# real filesystem — identical behavior to the ModuleNotFoundError branch.
try:  # pragma: no cover - environment-dependent
    from fsspec.implementations.http import HTTPFileSystem as _HTTPFS  # noqa: F401
except Exception:  # pragma: no cover
    import sys as _sys
    import types as _types

    _m = _types.ModuleType("fsspec.implementations.http")

    class _SentinelHTTPFileSystem:  # real one unimportable in this env
        pass

    _m.HTTPFileSystem = _SentinelHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _m


def _dir_rows(d: str) -> int:
    """Row count of a parquet dir from file footers — no data read."""
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def _read_small(d: str, columns=None) -> "pd.DataFrame":
    """Driver-side read of a small output table via pyarrow (no Ray job)."""
    import pyarrow.parquet as pq

    return pq.read_table(d, columns=columns).to_pandas()


def _write_adjacency(edges_ds, out_dir: str, n_buckets: int = 16) -> None:
    """Sorted, subj-bucketed Parquet adjacency layout (north-star
    materialization): partition dirs by ``subj_bucket = stable_hash(subj) %
    n_buckets``, rows sorted by subj WITHIN each bucket — a reader doing
    per-entity adjacency lookups prunes to one bucket dir and one sorted
    range.  The sort is per-bucket (one hash shuffle + vectorized sort per
    group), not global: cross-bucket order serves no reader (bucket ids are
    hash-assigned), and a global range-sort is a second all-to-all."""
    from ..functions.hashing import bucket_of

    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["subj_bucket"] = [bucket_of(s, n_buckets) for s in out["subj"]]
        return out

    def _sort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("subj", kind="mergesort").reset_index(drop=True)

    (
        edges_ds.map_batches(_bucket, batch_format="pandas")
        .groupby("subj_bucket")
        .map_groups(_sort_bucket, batch_format="pandas")
        .write_parquet(out_dir, partition_cols=["subj_bucket"])
    )


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
    counter: "ShardedCounter | None" = None,
    tagger: str = "gazetteer",
    _fail_after_units: int | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns the manifest records.

    ``resume_granularity`` = how many manifest units phase 1 is split into
    (each unit = one Dataset pass over its subset of url-hash shards).
    ``tagger`` selects the phase-5 mention detector — the pluggable A2
    model slot: ``"gazetteer"`` (vocabulary alternation, oracle-gated),
    ``"crf"`` (numpy BiLSTM-CRF, stages/crf.py), or ``"pattern"``
    (typed regex rules)."""
    import ray

    manifest = Manifest(out_dir)
    done = manifest.done_units()
    counter = counter or ShardedCounter()
    completed_now = 0

    def _checkpoint_gate():
        """Test hook: simulate a mid-run kill after N completed units."""
        nonlocal completed_now
        completed_now += 1
        if _fail_after_units is not None and completed_now >= _fail_after_units:
            raise RuntimeError(f"injected failure after {completed_now} units")

    # ---- phase 1: extract+parse → parsed/group=G --------------------------
    # resume unit = one group of url-hash shards; each group writes its own
    # subdirectory (plain files — one per block, no per-shard partition-dir
    # file explosion; the shard column stays in the data for lineage)
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
            stats: dict = {}
            parsed = kg.extract_parse_batch(sub.select(["url", "html"]), stats=stats)
            stats["pages_in"] = sub.num_rows
            # BLOCKING on purpose: fire-and-forget increments race the
            # driver's get_all after write_parquet (messages from worker
            # callers have no cross-caller ordering vs the driver's read —
            # observed as undercounted manifests in a busy session).  The
            # counter is SHARDED by worker pid so the awaited round-trips
            # don't serialize all workers through one actor.
            counter.incr_many_blocking(stats)
            return _add_shard(parsed, num_shards)

        ds = pages.map_batches(
            _extract_group, batch_format="pyarrow", batch_size=kg.EXTRACT_BATCH_SIZE
        )
        group_dir = os.path.join(parsed_dir, f"group={gi}")
        # clean any partial output of a previous killed attempt for this unit
        manifest.clean_unit_dir(group_dir)
        ds.write_parquet(group_dir)
        manifest.mark_done(
            unit,
            _dir_rows(group_dir),
            counters=counter.get_all(),
            wall_sec=time.time() - t0,
        )
        _checkpoint_gate()

    def _parsed(columns=None):
        # coalesce the checkpoint read into ~ncpu blocks: enough map-side
        # parallelism for the flatten/link stages, few enough that shuffle
        # barriers (per-input-block fixed cost) stay cheap
        import ray as _ray

        nblocks = max(16, int(_ray.cluster_resources().get("CPU", 8)))
        return rd.read_parquet(parsed_dir, columns=columns, override_num_blocks=nblocks)

    # ---- phase 2: nodes ----------------------------------------------------
    nodes_dir = os.path.join(out_dir, "nodes")
    if "nodes" not in done:
        t0 = time.time()
        manifest.clean_unit_dir(nodes_dir)
        nodes = kg.nodes_ds(_parsed(columns=["url", "nodes"]))
        nodes.write_parquet(nodes_dir)
        manifest.mark_done("nodes", _dir_rows(nodes_dir), wall_sec=time.time() - t0)
        _checkpoint_gate()

    # ---- phases 3-5: edges / canonical / mentions --------------------------
    # Mutually independent given the parsed checkpoint and the nodes table.
    # They CAN run concurrently from driver threads (KGBH_CONCURRENT_PHASES
    # =1), but sequential is the measured default in local mode: three
    # streaming executors on one driver GIL thrash — same-load A/B on the
    # 50k-page bench measured 23.6 s concurrent vs 13.6 s sequential
    # (PERF.md round 3).  On a multi-node cluster, where driver-side
    # coordination is a small fraction of each phase, the overlap is worth
    # re-measuring — the machinery below is load-tested (resume + deadlock
    # guards) either way.  Resume semantics are identical in both modes:
    # each unit writes its own dir and appends its own manifest line
    # (lock-serialized).  The kill-injection test hook (_fail_after_units)
    # forces sequential order so unit-count semantics in tests stay
    # deterministic.
    import threading

    _mark_lock = threading.Lock()

    def _mark(unit: str, rows: int, t0: float) -> None:
        with _mark_lock:
            manifest.mark_done(unit, rows, wall_sec=time.time() - t0)

    ncpu_now = int(ray.cluster_resources().get("CPU", 8))
    concurrent_phases = (_fail_after_units is None
                         and os.environ.get('KGBH_CONCURRENT_PHASES') == '1')
    # two actor-pool phases may coexist: split the pool budget so BOTH
    # pools together claim at most ncpu-2 — two slots must stay free for
    # the pools' own upstream read tasks or the phase deadlocks (round-1
    # PERF note, observed again here at the 4-CPU test session)
    if concurrent_phases:
        pool_cap = max(1, min(ncpu_now // 4, (ncpu_now - 2) // 2))
    else:
        pool_cap = max(2, min(8, ncpu_now // 2))

    edges_dir = os.path.join(out_dir, "edges")

    def _run_edges() -> None:
        t0 = time.time()
        manifest.clean_unit_dir(edges_dir)
        node_ids = frozenset(_read_small(nodes_dir, ["id"])["id"])
        edges = kg.edges_ds(_parsed(columns=["url", "triples"]), node_ids=node_ids)
        _write_adjacency(edges, edges_dir)
        _mark("edges", _dir_rows(edges_dir), t0)

    canon_dir = os.path.join(out_dir, "canonical")
    ecanon_dir = os.path.join(out_dir, "edges_canonical")

    def _run_canonical() -> None:
        t0 = time.time()
        manifest.clean_unit_dir(canon_dir)
        manifest.clean_unit_dir(ecanon_dir)
        # canonical pick over the deduped nodes table ≡ over raw occurrences:
        # each id's keep-first row already carries the min-seq surface form,
        # so min-by-seq per blocking key is unchanged.  The deduped node
        # table is vocabulary-sized (≪ corpus), so the canonical map is
        # computed driver-side in one vectorized pandas pass instead of a
        # Ray job — same keep-first-by-seq semantics as the distributed
        # canonical_map_ds (which remains the oracle-gated query path).
        import pyarrow.parquet as _pq

        from ..functions.hashing import md5_id
        from ..stages.linkage import normalize_surface_series

        nodes_pdf = _read_small(nodes_dir, ["url", "seq", "name"])
        nodes_pdf["norm_key"] = normalize_surface_series(nodes_pdf["name"])
        canon_pdf = (
            nodes_pdf.sort_values("seq", kind="mergesort")
            .drop_duplicates(subset=["norm_key"], keep="first")
            .rename(columns={"name": "canon_name"})[["norm_key", "canon_name"]]
            .reset_index(drop=True)
        )
        canon_pdf["canon_id"] = [md5_id(n) for n in canon_pdf["canon_name"]]
        os.makedirs(canon_dir, exist_ok=True)
        _pq.write_table(
            pa.Table.from_pandas(canon_pdf, preserve_index=False),
            os.path.join(canon_dir, "part-00000.parquet"),
        )
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
        # fixed pool, capped (see pool_cap above): the per-batch work is a
        # vectorized dict map — spin-up of a CPU-wide pool costs more than
        # it buys and starves the checkpoint read (same measurement as the
        # mentions pool, PERF.md round 3)
        ecanon = kg.edges_canonical_ds(
            _parsed(columns=["url", "triples"]),
            canon_map=canon_map,
            concurrency=pool_cap,
        )
        _write_adjacency(ecanon, ecanon_dir)
        _mark("canonical", _dir_rows(ecanon_dir), t0)

    mentions_dir = os.path.join(out_dir, "mentions")

    def _run_mentions() -> None:
        t0 = time.time()
        manifest.clean_unit_dir(mentions_dir)
        # STREAM the checkpoint into a bounded tagger pool: slots stay free
        # for the upstream read tasks so the pool never starves its own
        # input (a pool equal to the CPU count deadlocks — PERF.md round 1),
        # and no corpus-sized dataset is ever pinned in the object store
        # (round-1 verdict's #1 scale-killer)
        extracted = rd.read_parquet(
            parsed_dir, columns=["url", "text_out"], override_num_blocks=ncpu_now * 2
        )
        pool = max(1, ncpu_now - 2)
        if tagger == "crf":
            from ..stages.crf import crf_mentions_ds

            mentions = crf_mentions_ds(
                extracted, concurrency=max(2, pool_cap) if concurrent_phases else pool
            )
        elif tagger == "pattern":
            from ..stages.ner import pattern_mentions_ds

            mentions = pattern_mentions_ds(
                extracted, concurrency=max(2, pool_cap) if concurrent_phases else pool
            )
        else:
            from ..stages.ner import mentions_ds

            # gazetteer = the longest node names (vocab cap keeps the
            # compiled pattern bounded; documented truncation) — same
            # longest-win policy as GazetteerMatcher's own MAX_GAZETTEER
            # cap; ties broken by name
            names_pdf = _read_small(nodes_dir, ["name", "type"])
            names_pdf = (
                names_pdf.assign(_len=names_pdf["name"].str.len())
                .sort_values(["_len", "name"], ascending=[False, True], kind="mergesort")
                .head(5000)
            )
            gaz = (names_pdf["name"].tolist(), names_pdf["type"].tolist())
            # trie matcher → compute is ~0.13 ms/page: a small pool leaves
            # the CPUs to the read/write tasks (see mentions_ds docstring)
            mentions = mentions_ds(extracted, gaz, concurrency=min(pool_cap, pool))
        mentions.write_parquet(mentions_dir)
        _mark("mentions", _dir_rows(mentions_dir), t0)

    pending = [(unit, fn) for unit, fn in
               [("edges", _run_edges), ("canonical", _run_canonical),
                ("mentions", _run_mentions)] if unit not in done]
    if concurrent_phases and len(pending) > 1:
        errors: list[BaseException] = []

        def _guard(t_fn):
            def run():
                try:
                    t_fn()
                except BaseException as e:  # surface thread failures
                    errors.append(e)
            return run

        threads = [threading.Thread(target=_guard(fn), name=f"phase-{u}")
                   for u, fn in pending]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
    else:
        for _unit, fn in pending:
            fn()
            _checkpoint_gate()

    return {
        "out_dir": out_dir,
        "records": manifest.records(),
        "counters": counter.get_all(),
    }


def read_output(out_dir: str, table: str):
    return rd.read_parquet(os.path.join(out_dir, table))


def degree_from_adjacency(out_dir: str, table: str = "edges"):
    """SHUFFLE-FREE per-entity degree over the bucketed adjacency layout.

    ``_write_adjacency`` partitions edges by ``hash(subj) % n_buckets`` and
    sorts by subj, so every row of a subject lives in exactly one bucket
    dir — the partitioning key chosen at WRITE time is reused at read time:
    one task per bucket does a vectorized local groupby and the results
    concatenate with zero all-to-all exchange.  (At larger bucket sizes the
    within-bucket rows are subj-sorted, so the same aggregation streams.)"""
    import glob

    def _agg(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"subj": batch["subj"], "n_out": 1, "total_weight": batch["weight"]}
        )
        out = d.groupby("subj", sort=False, as_index=False)[["n_out", "total_weight"]].sum()
        for c in ("n_out", "total_weight"):
            out[c] = out[c].astype("int64")
        return out

    dirs = sorted(glob.glob(os.path.join(out_dir, table, "subj_bucket=*")))
    parts = [
        rd.read_parquet(d, columns=["subj", "weight"], override_num_blocks=1).map_batches(
            _agg, batch_size=None, batch_format="pandas"
        )
        for d in dirs
    ]
    if not parts:
        return rd.from_pandas(pd.DataFrame({"subj": [], "n_out": [], "total_weight": []}))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
