"""S1/S2 PDF reader stage: join layout, per-page pipeline, pluggable slot."""

import pandas as pd
import ray.data as rd

from knowledgegraph__bh_ray.stages.pdf import (
    PdfTextExtractor,
    fake_decode_pdf,
    pdf_pages_to_text,
    pdf_text_ds,
)


def test_join_layout_matches_reference():
    """Image placeholder is its own '\\n'-terminated entry BEFORE the page
    text; entries joined with '\\n' (pdf_extractor.py:86-111, 139-143)."""
    pages = [
        {"text": "first page", "has_images": True},
        {"text": "second page", "has_images": False},
    ]
    assert pdf_pages_to_text(pages) == "[图片]\n\nfirst page\nsecond page"


def test_per_page_pipeline_applied():
    # latex converted, formula page replaced wholesale, markers expanded
    pages = [{"text": "能量 $E$ 式", "has_images": False}]
    assert pdf_pages_to_text(pages) == "能量 \\(E\\) 式"
    pages = [{"text": "∑∏∫∮√∞∠∥≈≠", "has_images": False}]
    assert pdf_pages_to_text(pages) == "[公式]"


def test_fake_decoder_deterministic():
    a = fake_decode_pdf(b"%PDF-1.4 fake body bytes for testing purposes")
    b = fake_decode_pdf(b"%PDF-1.4 fake body bytes for testing purposes")
    assert a == b
    assert 1 <= len(a) <= 3
    assert all(set(p) == {"text", "has_images"} for p in a)


def test_injected_decoder_slot():
    calls = []

    def my_decode(payload):
        calls.append(payload)
        return [{"text": "hello", "has_images": False}]

    ex = PdfTextExtractor(decode_fn=my_decode)
    assert ex.backend == "injected"
    df = ex(pd.DataFrame({"doc_id": [1], "payload": [b"x"]}))
    assert df["text"].tolist() == ["hello"]
    assert calls == [b"x"]


def test_pdf_stage_distributed(ray_session):
    pdfs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": list(range(6)), "payload": [f"%PDF-{i} body".encode() for i in range(6)]}
        )
    )
    out = pdf_text_ds(pdfs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text", "n_pages"]
    assert len(out) == 6
    assert (out["n_pages"] >= 1).all()
    # deterministic across runs
    out2 = pdf_text_ds(pdfs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
