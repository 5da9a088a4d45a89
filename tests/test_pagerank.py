"""PageRank: distributed rounds vs the driver-side dict reference."""

import numpy as np
import pandas as pd
import ray.data as rd

from knowledgegraph__bh_ray.stages.pagerank import pagerank_ds, pagerank_pairs


def _graph():
    # small graph with a dangling node (d has no out-edges) and a hub
    return pd.DataFrame(
        {
            "src_url": ["a", "a", "b", "c", "c", "e"],
            "dst_url": ["b", "c", "c", "a", "d", "a"],
        }
    )


def test_reference_properties():
    r = pagerank_pairs(_graph()).set_index("url")["rank"]
    assert abs(r.sum() - 1.0) < 1e-9  # stochastic: ranks sum to 1
    assert r["a"] > r["d"]  # hub outranks the leaf


def test_distributed_matches_reference(ray_session):
    want = pagerank_pairs(_graph()).sort_values("url").reset_index(drop=True)
    got = (
        pagerank_ds(rd.from_pandas(_graph()), num_parts=2, driver_threshold=0)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got["url"].tolist() == want["url"].tolist()
    assert np.allclose(got["rank"].to_numpy(), want["rank"].to_numpy(), atol=1e-9)


def test_empty_graph(ray_session):
    got = pagerank_ds(
        rd.from_pandas(pd.DataFrame({"src_url": pd.Series([], dtype=object),
                                     "dst_url": pd.Series([], dtype=object)}))
    ).to_pandas()
    assert len(got) == 0
