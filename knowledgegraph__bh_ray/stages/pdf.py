"""PDF → text reader stage (reference ops S1/S2, pdf_extractor.py).

The reference extracts per-page text with pdfplumber or pymupdf
(pdf_extractor.py:86-136), prepends ``[图片]\\n`` as its own entry for
pages containing images (pdf_extractor.py:139-143), runs the default
formula pipeline per page (latex → formula → markers,
pdf_extractor.py:145-154) and joins the entries with ``\\n``.

Ray-side shape: PDFs are rows of an opaque ``binary`` column (the
multimodal-column model, stages/media.py); extraction is an actor-pool
``map_batches`` stage with the PAGE-DECODE SLOT pluggable:

    decode_fn(payload: bytes) -> list[{"text": str, "has_images": bool}]

``PdfTextExtractor`` tries the real libraries in ``__init__`` (import-gated
— neither pdfplumber nor pymupdf ships in this container) and otherwise
falls back to :func:`fake_decode_pdf`, a CLEARLY-MARKED deterministic
stand-in that fabricates page dicts from the payload bytes so the
surrounding plumbing (binary column → page entries → per-page
normalization → joined doc text) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from ..functions.textnorm import IMAGE_PLACEHOLDER, normalize_pdf_page


def fake_decode_pdf(payload: bytes) -> list[dict]:
    """DETERMINISTIC FAKE page decoder (environment stand-in, NOT a PDF
    parser): fabricates 1-3 pages whose text is derived from the payload
    bytes.  Replace via the ``decode_fn`` slot in any real deployment."""
    h = hashlib.md5(payload).digest()
    n_pages = 1 + h[0] % 3
    pages = []
    for p in range(n_pages):
        frag = payload[p * 40 : (p + 1) * 40] or payload[:40]
        text = frag.decode("utf-8", errors="replace")
        pages.append({"text": f"page {p}: {text}", "has_images": h[p + 1] % 2 == 0})
    return pages


def _real_decode(payload: bytes) -> list[dict]:
    """Real decoder via pdfplumber (pdf_extractor.py:86-111 flow) — only
    reachable when the library is installed."""
    import io

    import pdfplumber

    pages = []
    with pdfplumber.open(io.BytesIO(payload)) as pdf:
        for page in pdf.pages:
            text = page.extract_text(layout=True, x_tolerance=1, y_tolerance=1) or ""
            pages.append({"text": text, "has_images": bool(page.images)})
    return pages


def pdf_pages_to_text(pages: list[dict]) -> str:
    """Reference join layout (pdf_extractor.py:86-111): the image
    placeholder is its OWN entry with a trailing newline, emitted before
    the page's processed text; entries joined with '\\n'."""
    entries: list[str] = []
    for page in pages:
        if page.get("has_images"):
            entries.append(IMAGE_PLACEHOLDER + "\n")
        entries.append(normalize_pdf_page(page.get("text", "")))
    return "\n".join(entries)


class PdfTextExtractor:
    """Actor-pool PDF reader: decoder chosen once per actor in
    ``__init__`` (real library if importable, else the marked fake, else an
    injected ``decode_fn``); per batch, each binary payload becomes one
    (doc_id, text, n_pages) row.  Keep ``batch_size`` small — PDF payloads
    are large binary rows (see stages/media.py sizing note)."""

    def __init__(self, decode_fn=None):
        if decode_fn is not None:
            self.decode = decode_fn
            self.backend = "injected"
        else:
            try:
                import pdfplumber  # noqa: F401

                self.decode = _real_decode
                self.backend = "pdfplumber"
            except ImportError:
                self.decode = fake_decode_pdf
                self.backend = "fake"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "text": [], "n_pages": []}
        for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
            pages = self.decode(payload)
            out["doc_id"].append(doc_id)
            out["text"].append(pdf_pages_to_text(pages))
            out["n_pages"].append(len(pages))
        df = pd.DataFrame(out)
        df["n_pages"] = df["n_pages"].astype("int64")
        return df


def pdf_text_ds(pdfs, decode_fn=None, concurrency=(1, 4), batch_size: int = 16):
    """Dataset(doc_id, payload: binary) → Dataset(doc_id, text, n_pages)."""
    return pdfs.map_batches(
        PdfTextExtractor,
        fn_constructor_args=(decode_fn,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
