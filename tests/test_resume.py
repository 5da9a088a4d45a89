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
