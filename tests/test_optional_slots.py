"""Env-gated slot wiring (round-2 verdict 'missing' #3).

The three real-library paths (pdfplumber decode, sentence-transformers
encoder, PIL media decode) can't run in this container — but their WIRING
can rot silently.  Two layers of guard:

  * monkeypatched-import tests (always run): a fake module in sys.modules
    must flip the backend ladder to the real path — catches renamed
    attributes, broken try/except, constructor signature drift;
  * importorskip tests (run only where the library exists): drive the real
    decoder end-to-end on a tiny in-test payload.
"""

from __future__ import annotations

import sys
import types

import pytest


# ---------------------------------------------------------------------------
# backend-ladder wiring (always run)
# ---------------------------------------------------------------------------


def test_pdf_backend_ladder(monkeypatch):
    from knowledgegraph__bh_ray.stages import pdf as pdfmod

    monkeypatch.setitem(sys.modules, "pdfplumber", types.ModuleType("pdfplumber"))
    ex = pdfmod.PdfTextExtractor()
    assert ex.backend == "pdfplumber"
    assert ex.decode is pdfmod._real_decode

    injected = lambda payload: []  # noqa: E731
    assert pdfmod.PdfTextExtractor(decode_fn=injected).decode is injected


def test_pdf_backend_fake_without_library(monkeypatch):
    from knowledgegraph__bh_ray.stages import pdf as pdfmod

    monkeypatch.setitem(sys.modules, "pdfplumber", None)  # forces ImportError
    ex = pdfmod.PdfTextExtractor()
    assert ex.backend == "fake"
    assert ex.decode is pdfmod.fake_decode_pdf


def test_embedder_backend_ladder(monkeypatch):
    from knowledgegraph__bh_ray.stages import embed as embmod

    calls = {}

    def fake_real_encoder(model_name):
        calls["model"] = model_name
        return embmod.fake_encode

    monkeypatch.setitem(
        sys.modules, "sentence_transformers", types.ModuleType("sentence_transformers")
    )
    monkeypatch.setattr(embmod, "_real_encoder", fake_real_encoder)
    e = embmod.Embedder("name")
    assert e.backend == "sentence_transformers"
    assert calls["model"] == embmod.Embedder.MODEL_NAME

    injected = lambda texts, dim: embmod.fake_encode(texts, dim)  # noqa: E731
    assert embmod.Embedder("name", encode_fn=injected).backend == "injected"


def test_embedder_backend_fake_without_library(monkeypatch):
    from knowledgegraph__bh_ray.stages import embed as embmod

    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    e = embmod.Embedder("name")
    assert e.backend == "fake"
    assert e.encode is embmod.fake_encode


def test_media_backend_ladder(monkeypatch):
    from knowledgegraph__bh_ray.stages import media as medmod

    monkeypatch.setitem(sys.modules, "PIL", types.ModuleType("PIL"))
    ex = medmod.MediaFeatureExtractor()
    assert ex.backend == "pil"
    assert ex.decode is medmod._real_decode

    monkeypatch.setitem(sys.modules, "PIL", None)
    assert medmod.MediaFeatureExtractor().backend == "fake"

    injected = medmod.stub_decode
    assert medmod.MediaFeatureExtractor(decode_fn=injected).backend == "injected"


def test_injected_decoder_flows_through_stage_batch():
    """The injected slot must reach __call__ — shape contract, no Ray."""
    import pandas as pd

    from knowledgegraph__bh_ray.stages.media import MediaFeatureExtractor

    def decode(payload: bytes) -> dict:
        return {"width": 1, "height": 2, "feature": [0.5] * 16}

    out = MediaFeatureExtractor(decode_fn=decode)(
        pd.DataFrame({"url": ["u1"], "html": [b"xx"]})
    )
    assert out.loc[0, "width"] == 1 and out.loc[0, "height"] == 2
    assert list(out.columns) == ["url", "width", "height", "feature"]


# ---------------------------------------------------------------------------
# real-library end-to-end (skip in this container, run where libs exist)
# ---------------------------------------------------------------------------

_MINIMAL_PDF = (
    b"%PDF-1.1\n"
    b"1 0 obj<</Type/Catalog/Pages 2 0 R>>endobj\n"
    b"2 0 obj<</Type/Pages/Kids[3 0 R]/Count 1>>endobj\n"
    b"3 0 obj<</Type/Page/Parent 2 0 R/MediaBox[0 0 200 200]/Contents 4 0 R"
    b"/Resources<</Font<</F1 5 0 R>>>>>>endobj\n"
    b"4 0 obj<</Length 44>>stream\nBT /F1 12 Tf 50 150 Td (Hello slot) Tj ET\nendstream\nendobj\n"
    b"5 0 obj<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>endobj\n"
    b"trailer<</Root 1 0 R>>\n%%EOF\n"
)


def test_pdf_real_decode_end_to_end():
    pytest.importorskip("pdfplumber")
    from knowledgegraph__bh_ray.stages.pdf import PdfTextExtractor

    ex = PdfTextExtractor()
    assert ex.backend == "pdfplumber"
    pages = ex.decode(_MINIMAL_PDF)
    assert len(pages) == 1
    assert "Hello slot" in pages[0]["text"]


def test_media_real_decode_end_to_end():
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from knowledgegraph__bh_ray.stages.media import MediaFeatureExtractor

    buf = io.BytesIO()
    Image.new("RGB", (8, 6), (255, 0, 0)).save(buf, format="PNG")
    ex = MediaFeatureExtractor()
    assert ex.backend == "pil"
    f = ex.decode(buf.getvalue())
    assert (f["width"], f["height"]) == (8, 6)
    assert len(f["feature"]) == 16


def test_embedder_real_encode_end_to_end():
    pytest.importorskip("sentence_transformers")
    from knowledgegraph__bh_ray.stages.embed import EMBED_DIM, Embedder

    import pandas as pd

    e = Embedder("name")
    assert e.backend == "sentence_transformers"
    out = e(pd.DataFrame({"name": ["hello", "world"]}))
    assert all(len(v) == EMBED_DIM for v in out["embedding"])
