import numpy as np
import pandas as pd

from knowledgegraph__bh_ray.functions.bloom import BloomFilter
from knowledgegraph__bh_ray.stages.ner import PatternTagger


def test_bloom_no_false_negatives_and_low_fp():
    keys = [f"id{i:06d}" for i in range(5000)]
    bf = BloomFilter.build(keys, fp_rate=0.01)
    assert all(k in bf for k in keys)  # no false negatives, ever
    probes = [f"other{i:06d}" for i in range(5000)]
    fp = sum(1 for p in probes if p in bf) / len(probes)
    assert fp < 0.03  # ~target rate


def test_pattern_tagger_rules():
    t = PatternTagger()
    out = t.tag("见《机器学习》与 Entity7 于 2024-05-01 强度 0.9")
    got = {(m["entity"], m["etype"]) for m in out}
    assert ("《机器学习》", "TITLE") in got
    assert ("Entity7", "IDENT") in got
    assert ("2024-05-01", "DATE") in got
    assert ("0.9", "NUMBER") in got
    # spans are exact
    first = [m for m in out if m["etype"] == "TITLE"][0]
    assert first["start"] == 1 and first["end"] == 7


def test_pattern_tagger_batch_shape():
    t = PatternTagger()
    df = t(pd.DataFrame({"url": ["u"], "text_out": ["实体3 见 2024-01-02\n无"]}))
    assert set(df.columns) == {"url", "para_idx", "entity", "etype", "start", "end"}
    assert len(df) == 2
    assert df["para_idx"].dtype == np.int64


def test_edges_bloom_path_identical(ray_session, pages_small):
    from knowledgegraph__bh_ray.pipelines import kg

    a = kg.edges_ds(pages_small).to_pandas()
    b = kg.edges_ds(pages_small, use_bloom=True).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key + ["weight"]],
        b.sort_values(key).reset_index(drop=True)[key + ["weight"]],
    )


def test_edges_bucketed_join_identical(ray_session, pages_small):
    """Scale-path equivalence: the no-broadcast reduce-side semi-join
    produces byte-identical edges to the broadcast path."""
    from knowledgegraph__bh_ray.pipelines import kg

    key = ["subj", "pred", "obj"]
    a = kg.edges_ds(pages_small).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        kg.edges_ds(pages_small, join_mode="bucketed")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    cols = key + ["subj_name", "obj_name", "weight"]
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_edges_canonical_bucketed_join_identical(ray_session, pages_small):
    from knowledgegraph__bh_ray.pipelines import kg

    key = ["subj", "pred", "obj"]
    a = kg.edges_canonical_ds(pages_small).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        kg.edges_canonical_ds(pages_small, join_mode="bucketed")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    cols = key + ["subj_name", "obj_name", "weight"]
    pd.testing.assert_frame_equal(a[cols], b[cols])
