"""Multimodal column plumbing (task brief: image/audio/video as opaque binary).

The engine treats media payloads as opaque ``binary`` columns with typed
metadata.  The decode/feature-extract step is an actor-pool stage whose
*decoder slot is stubbed* — the real image/audio libraries are not in this
container — but the Ray-side plumbing (schema, batch sizing for large binary
rows, actor signature, output layout) is real and tested.  ``media_meta_batch``
is the vectorized metadata path (byte length + content hash, zero decode).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def media_meta_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → (url, n_bytes, content_md5), Arrow-vectorized
    length + per-row md5 (the only per-row Python is the C hash call)."""
    n_bytes = pc.cast(pc.binary_length(batch.column("html")), pa.int64())
    md5s = pa.array(
        [hashlib.md5(b).hexdigest() for b in batch.column("html").to_pylist()], pa.string()
    )
    return pa.table({"url": batch.column("url"), "n_bytes": n_bytes, "content_md5": md5s})


def stub_decode(payload: bytes) -> dict:
    """Deterministic stand-in for the media decoder.

    A real deployment replaces this with PIL/ffmpeg decoding; the container
    has neither, so the stub derives a fake fixed-size feature from the
    bytes.  Marked clearly so nobody mistakes it for a real decoder."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "feature": [b / 255.0 for b in h],  # 16-dim fake feature
    }


def _real_decode(payload: bytes) -> dict:
    """Real image decoder via PIL — only reachable when the library is
    installed.  Same output layout as ``stub_decode``; feature = flattened
    4×4 grayscale thumbnail in [0, 1].  Undecodable payloads (not an image)
    fall back to the stub so mixed binary columns don't kill the stage."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            thumb = im.convert("L").resize((4, 4))
            feature = [p / 255.0 for p in thumb.getdata()]
        return {"width": w, "height": h, "feature": feature}
    except Exception:
        return stub_decode(payload)


class MediaFeatureExtractor:
    """Actor-pool media stage: 'codec init' once per actor, small batches —
    large binary rows mean batch_size must stay small so batch × concurrency
    fits the worker heap (pass batch_size≈32 for multi-MB payloads).

    Backend ladder (same pattern as stages/pdf.PdfTextExtractor): injected
    ``decode_fn`` > PIL if importable > the documented stub."""

    def __init__(self, decode_fn=None):
        if decode_fn is not None:
            self.decode = decode_fn
            self.backend = "injected"
        else:
            try:
                import PIL  # noqa: F401

                self.decode = _real_decode
                self.backend = "pil"
            except ImportError:
                self.decode = stub_decode  # stubbed path (this container)
                self.backend = "fake"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [self.decode(b) for b in batch["html"]]
        return pd.DataFrame(
            {
                "url": batch["url"],
                "width": pd.Series([f["width"] for f in feats], dtype="int64"),
                "height": pd.Series([f["height"] for f in feats], dtype="int64"),
                "feature": [f["feature"] for f in feats],
            }
        )


def media_features_ds(pages, concurrency=(1, 4), batch_size: int = 32,
                      decode_fn=None):
    return pages.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=(decode_fn,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
