"""Property tests: results are independent of partitioning / batch size /
parallelism — the guarantee that makes the salted aggregation correct and
resume ≡ fresh run possible (SURVEY.md §5(c))."""

import pandas as pd

from knowledgegraph__bh_ray.pipelines import kg
from knowledgegraph__bh_ray.sources import read_pages
from knowledgegraph__bh_ray.stages.extract import extract_parse_batch
from knowledgegraph__bh_ray.stages.grouped import count_first_block, salted_grouped_agg


def _edges_with(pages_path, batch_size, salt_buckets, num_blocks):
    pages = read_pages(pages_path, columns=["url", "html"])
    if num_blocks:
        pages = pages.repartition(num_blocks)
    parsed = pages.map_batches(
        extract_parse_batch, batch_format="pyarrow", batch_size=batch_size
    )
    return (
        kg.edges_ds(parsed, node_ids=None, salt_buckets=salt_buckets)
        .to_pandas()[["subj", "pred", "obj", "weight"]]
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )


def test_edges_invariant_to_partitioning(ray_session, pages_small):
    base = _edges_with(pages_small, batch_size=256, salt_buckets=16, num_blocks=None)
    small_batches = _edges_with(pages_small, batch_size=17, salt_buckets=3, num_blocks=7)
    pd.testing.assert_frame_equal(base, small_batches)


def test_salted_agg_equals_pandas_groupby(ray_session):
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500).astype(str),
            "seq": [f"{i:05d}" for i in rng.permutation(500)],
            "url": [f"u{i % 37}" for i in range(500)],
            "v": rng.integers(0, 100, 500),
        }
    )
    ds = rd.from_pandas(df).repartition(11)
    out = (
        salted_grouped_agg(
            ds,
            keys=["k"],
            block_agg=count_first_block(["k"], "seq"),
            salt_from="url",
            salt_buckets=5,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp_first = df.sort_values("seq", kind="mergesort").drop_duplicates("k", keep="first")
    exp = (
        exp_first.merge(df.groupby("k").size().rename("weight").reset_index(), on="k")
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "seq", "v", "weight"]],
        exp[["k", "seq", "v", "weight"]].astype({"weight": out["weight"].dtype}),
    )


def test_reduce_side_ops_partition_invariance(ray_session):
    """The reduce-side join family must be invariant to partition count
    (same algebraic guarantee as the salted aggregations)."""
    import pandas as pd
    import ray.data as rd

    from knowledgegraph__bh_ray.stages.grouped import (
        reduce_side_anti_join,
        reduce_side_lookup,
        reduce_side_semi_join,
    )

    data = pd.DataFrame({"rid": range(120), "k": [f"k{i % 17}" for i in range(120)]})
    keys = pd.DataFrame({"kk": [f"k{i}" for i in range(0, 17, 2)]})
    lut = pd.DataFrame({"kk": [f"k{i}" for i in range(17)], "v": [f"v{i}" for i in range(17)]})

    def run(fn, **kw):
        outs = []
        for parts in (3, 16):
            ds = rd.from_pandas(data).repartition(5)
            out = fn(ds, num_parts=parts, **kw).to_pandas()
            outs.append(out.sort_values("rid").reset_index(drop=True).astype(str))
        return outs

    a, b = run(lambda ds, **kw: reduce_side_semi_join(ds, ["rid", "k"], "k",
                                                      rd.from_pandas(keys), "kk", **kw))
    assert a.equals(b) and len(a) > 0
    a, b = run(lambda ds, **kw: reduce_side_anti_join(ds, ["rid", "k"], "k",
                                                      rd.from_pandas(keys), "kk", **kw))
    assert a.equals(b) and len(a) > 0
    a, b = run(lambda ds, **kw: reduce_side_lookup(ds, ["rid", "k"], "k",
                                                   rd.from_pandas(lut), "kk", ["v"], **kw))
    assert a.equals(b) and len(a) == 120


def test_node_similarity_partition_invariance(ray_session):
    """node_similarity output must not depend on num_parts (every exchange
    is keyed; pair generation happens only within a middle's full run)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from knowledgegraph__bh_ray.stages.pagerank import node_similarity_ds

    rng = np.random.default_rng(33)
    edges = list({(f"v{a}", f"v{b}") for a, b in rng.integers(0, 25, (90, 2)) if a != b})
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src_url", "dst_url"]))

    def run(parts):
        return (
            node_similarity_ds(ds, num_parts=parts)
            .to_pandas()
            .sort_values(["node_a", "node_b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(2), run(7))


def test_profile_documents_partition_invariance(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from knowledgegraph__bh_ray.pipelines.textops import profile_documents_ds

    rng = np.random.default_rng(4)
    n = 300
    # two files so the read produces multiple blocks
    for i, sl in enumerate((slice(0, 150), slice(150, n))):
        ids = np.arange(n, dtype="int64")[sl]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": ["x"] * len(ids),
                    "lang": rng.choice(["en", "zh", "de"], len(ids)).tolist(),
                    "source": rng.choice(["a", "b"], len(ids)).tolist(),
                    "n_chars": pa.array(rng.integers(1, 50, len(ids)), pa.int64()),
                }
            ),
            str(tmp_path / f"documents_{i}.parquet"),
        )
    import shutil
    # profile reads documents.parquet; build a directory-compatible single file
    # by concatenating both halves deterministically
    both = pa.concat_tables([pq.read_table(str(tmp_path / f"documents_{i}.parquet")) for i in (0, 1)])
    pq.write_table(both, str(tmp_path / "documents.parquet"))

    a = profile_documents_ds(str(tmp_path)).to_pandas().sort_values("column").reset_index(drop=True)
    b = profile_documents_ds(str(tmp_path)).to_pandas().sort_values("column").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # sanity vs pandas truth
    df = both.to_pandas()
    row = a.set_index("column").loc["lang"]
    assert row["n_distinct"] == df["lang"].nunique() and row["n_rows"] == n
