"""Robustness: degenerate inputs must not crash the pipeline."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from knowledgegraph__bh_ray.pagegen import PAGES_SCHEMA
from knowledgegraph__bh_ray.pipelines import kg
from knowledgegraph__bh_ray.stages.extract import extract_parse_batch


def test_empty_batch_extract():
    empty = pa.Table.from_pydict({"url": [], "html": []},
                                 schema=pa.schema([("url", pa.string()), ("html", pa.binary())]))
    out = extract_parse_batch(empty)
    assert out.num_rows == 0


def test_all_verification_pages(tmp_path, ray_session):
    t = pa.Table.from_arrays(
        [
            pa.array(["u1", "u2"], pa.string()),
            pa.array([pd.Timestamp("2025-01-01")] * 2, pa.timestamp("us")),
            pa.array(["百度安全验证".encode()] * 2, pa.binary()),
            pa.array(["", ""], pa.string()),
            pa.array(["zh", "zh"], pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    ext = kg.extracted_ds(str(d)).to_pandas()
    assert len(ext) == 0


def test_page_without_grammar(tmp_path, ray_session):
    html = (
        '<html><body><h1 class="lemmaTitle_x">普通页</h1>'
        '<div class="mainContent_M"><p class="para_WzwJ3">没有任何语法行。</p></div>'
        "</body></html>"
    )
    t = pa.Table.from_arrays(
        [
            pa.array(["u1"], pa.string()),
            pa.array([pd.Timestamp("2025-01-01")], pa.timestamp("us")),
            pa.array([html.encode()], pa.binary()),
            pa.array([""], pa.string()),
            pa.array(["zh"], pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
    d = tmp_path / "pages"
    d.mkdir()
    pq.write_table(t, str(d / "part-0.parquet"))
    assert kg.triples_raw_ds(str(d)).count() == 0
    nodes = kg.nodes_ds(str(d)).to_pandas()
    assert len(nodes) == 0
    edges = kg.edges_ds(str(d)).to_pandas()
    assert len(edges) == 0


def test_new_ops_on_empty_inputs(ray_session):
    """Round-2 ops on zero-row inputs: no crashes, typed/empty results."""
    import numpy as np

    from knowledgegraph__bh_ray.pipelines.relational import (
        events_quantiles_ds,
        top_anchor_texts_ds,
    )
    from knowledgegraph__bh_ray.stages.dedup import (
        minhash_signatures_batch,
        simhash64_batch,
    )
    from knowledgegraph__bh_ray.stages.crf import CRFNER

    # vectorized signature kernels: zero docs, and docs with zero tokens
    assert minhash_signatures_batch([]).shape == (0, 32)
    assert (minhash_signatures_batch(["", "   "]) == 0).all()
    assert simhash64_batch([]).shape == (0,)
    assert (simhash64_batch(["", "  "]) == 0).all()

    # CRF tagger: empty batch and empty paragraphs
    df = CRFNER()(pd.DataFrame({"url": [], "text_out": []}))
    assert len(df) == 0
    df = CRFNER()(pd.DataFrame({"url": ["u"], "text_out": ["\n\n"]}))
    assert len(df) == 0

    # top-k over an empty links table
    links = rd.from_pandas(
        pd.DataFrame({"url": pd.Series([], dtype=object),
                      "text": pd.Series([], dtype=object),
                      "href": pd.Series([], dtype=object)})
    )
    out = top_anchor_texts_ds("/root/testdata/sf0.001", links).to_pandas()
    assert len(out) == 0


def test_pdf_stage_empty_payload(ray_session):
    from knowledgegraph__bh_ray.stages.pdf import PdfTextExtractor

    ex = PdfTextExtractor(decode_fn=lambda p: [])
    df = ex(pd.DataFrame({"doc_id": [1], "payload": [b""]}))
    assert df["text"].tolist() == [""] and df["n_pages"].tolist() == [0]
