"""Dataset sources — thin, column-pruning wrappers over ray.data readers.

Every reader takes ``columns`` so stages read only what they transform
(a read that loads all columns for a 2-column transform is wrong at 100 TB).
"""

from __future__ import annotations

import os

import ray.data as rd


def read_pages(pages_path: str, columns: list[str] | None = None):
    """Common-Crawl-style pages table (url, warc_ts, html, text, lang)."""
    return rd.read_parquet(pages_path, columns=columns)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """One of the driver's testdata tables (documents, embeddings, lineitem…)."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
