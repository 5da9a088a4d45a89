"""Kill-and-resume ≡ fresh run (north rule: resumable from checkpoint with
per-partition lineage).  The injected failure kills the run after each
completed unit; repeated resumes must converge to the fresh-run output and
never redo completed units."""

import os
import shutil

import pandas as pd
import pytest
import ray.data as rd

from knowledgegraph__bh_ray.pipelines.run import run_kg_pipeline
from knowledgegraph__bh_ray.state.lineage import Manifest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_kill_resume_equals_fresh(ray_session, pages_small, tmp_path):
    fresh_dir = str(tmp_path / "fresh")
    resumed_dir = str(tmp_path / "resumed")

    run_kg_pipeline(pages_small, fresh_dir, num_shards=4, resume_granularity=2)

    # killed run: fail after every completed unit, resume until done
    attempts = 0
    while attempts < 20:
        attempts += 1
        try:
            run_kg_pipeline(
                pages_small,
                resumed_dir,
                num_shards=4,
                resume_granularity=2,
                _fail_after_units=1,
            )
            break
        except RuntimeError as e:
            assert "injected failure" in str(e)
    assert attempts > 3  # it really was killed mid-run several times

    for name in ("nodes", "edges", "canonical", "edges_canonical"):
        a = _canon(rd.read_parquet(os.path.join(fresh_dir, name)).to_pandas())
        b = _canon(rd.read_parquet(os.path.join(resumed_dir, name)).to_pandas())
        pd.testing.assert_frame_equal(a, b)

    # lineage: every unit has a manifest record with counters/wall time
    units = {r["unit"] for r in Manifest(resumed_dir).records()}
    assert units == {
        "parsed:group=0",
        "parsed:group=1",
        "nodes",
        "edges",
        "canonical",
        "mentions",
    }


def test_resume_skips_completed_units(ray_session, pages_small, tmp_path):
    out = str(tmp_path / "run")
    run_kg_pipeline(pages_small, out, num_shards=4, resume_granularity=2)
    records_before = Manifest(out).records()
    # resuming a finished run must do nothing new
    run_kg_pipeline(pages_small, out, num_shards=4, resume_granularity=2)
    records_after = Manifest(out).records()
    assert len(records_after) == len(records_before)


def test_degree_from_adjacency_no_shuffle(ray_session, pages_small, tmp_path):
    """Bucketed-layout reuse: degree computed per bucket dir (no shuffle)
    equals the shuffle-based kg_degree aggregation."""
    import pandas as pd

    from knowledgegraph__bh_ray.pipelines import kg
    from knowledgegraph__bh_ray.pipelines.run import degree_from_adjacency, run_kg_pipeline
    from knowledgegraph__bh_ray.stages.grouped import hash_partitioned_agg

    out = str(tmp_path / "run")
    run_kg_pipeline(pages_small, out, num_shards=4)
    got = (
        degree_from_adjacency(out)
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )

    edges = kg.edges_ds(pages_small)

    def _to_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"subj": batch["subj"], "n_out": 1, "total_weight": batch["weight"]}
        )

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("subj", sort=False, as_index=False)[["n_out", "total_weight"]].sum()
        for c in ("n_out", "total_weight"):
            out[c] = out[c].astype("int64")
        return out

    want = (
        hash_partitioned_agg(edges.map_batches(_to_rows, batch_format="pandas"), ["subj"], _agg)
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["subj", "n_out", "total_weight"]],
                                  want[["subj", "n_out", "total_weight"]])


def test_pipeline_tagger_slot_pluggable(ray_session, pages_small, tmp_path):
    """Phase-5 model slot: the CRF tagger drops into the pipeline in place
    of the gazetteer; earlier phases resume untouched."""
    import ray.data as rd

    from knowledgegraph__bh_ray.pipelines.run import run_kg_pipeline

    out = str(tmp_path / "crf_run")
    res = run_kg_pipeline(pages_small, out, num_shards=4, tagger="crf")
    assert "mentions" in {r["unit"] for r in res["records"]}
    m = rd.read_parquet(out + "/mentions").to_pandas()
    assert set(m.columns) >= {"url", "para_idx", "entity", "etype", "start", "end"}


def test_sharded_counter_exact_across_shards(ray_session):
    """ShardedCounter: concurrent awaited increments from many remote
    tasks (different pids → different shards) must sum exactly in
    get_all(), and reset() clears every shard."""
    import ray

    from knowledgegraph__bh_ray.state.lineage import ShardedCounter

    c = ShardedCounter(n_shards=4)

    @ray.remote
    def bump(counter, i):
        counter.incr_many_blocking({"a": i, "b": 1})
        return i

    total = sum(ray.get([bump.remote(c, i) for i in range(40)]))
    got = c.get_all()
    assert got == {"a": total, "b": 40}
    # increments actually spread over >1 shard actor (pid routing)
    per_shard = ray.get([h.get_all.remote() for h in c.shards])
    assert sum(1 for d in per_shard if d) > 1, per_shard
    c.reset()
    assert c.get_all() == {}
