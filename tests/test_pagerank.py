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


def _brute_triangles(edges: pd.DataFrame):
    und = set()
    for s, d in zip(edges["src_url"], edges["dst_url"]):
        if s != d:
            und.add((min(s, d), max(s, d)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = set()
    for u, v in und:
        for w in adj[u] & adj[v]:
            out.add(tuple(sorted((u, v, w))))
    return sorted(out)


def _tri_rows(ds):
    got = ds.to_pandas()
    if not len(got):  # zero triangles → Ray emits a column-less empty frame
        return []
    return sorted(zip(got["u"], got["v"], got["w"]))


def test_triangles_random_graph_matches_brute(ray_session):
    from knowledgegraph__bh_ray.stages.pagerank import triangles_ds

    rng = np.random.RandomState(7)
    n = 30
    e = pd.DataFrame({
        "src_url": [f"n{i}" for i in rng.randint(0, n, 160)],
        "dst_url": [f"n{i}" for i in rng.randint(0, n, 160)],
    })
    got = _tri_rows(triangles_ds(rd.from_pandas(e), num_parts=3))
    assert got == _brute_triangles(e)
    assert len(got) > 0  # the fixture actually contains triangles


def test_triangles_star_hub_no_quadratic_wedges(ray_session):
    """Adversarial Zipf hub: a star graph has NO triangles, and under the
    degree orientation the hub is the HIGH end of every edge — each leaf
    has out-degree 1, so zero wedge pairs are generated anywhere (the
    pre-round-3 middle-vertex form shuffled d² pairs at the hub)."""
    from knowledgegraph__bh_ray.stages.pagerank import triangles_ds

    d = 200
    e = pd.DataFrame({"src_url": ["hub"] * d,
                      "dst_url": [f"leaf{i}" for i in range(d)]})
    assert _tri_rows(triangles_ds(rd.from_pandas(e), num_parts=3)) == []


def test_triangles_wheel_graph(ray_session):
    """Hub + cycle rim: every rim edge closes a triangle with the hub."""
    from knowledgegraph__bh_ray.stages.pagerank import triangles_ds

    k = 8
    rim = [(f"r{i}", f"r{(i + 1) % k}") for i in range(k)]
    spokes = [("hub", f"r{i}") for i in range(k)]
    e = pd.DataFrame({"src_url": [a for a, _ in rim + spokes],
                      "dst_url": [b for _, b in rim + spokes]})
    got = _tri_rows(triangles_ds(rd.from_pandas(e), num_parts=3))
    assert got == _brute_triangles(e)
    assert len(got) == k
