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


def read_csv(path: str, columns: list[str] | None = None):
    """CSV reader (reference op S7 — csv.DictReader full-file loops become
    parallel block reads)."""
    ds = rd.read_csv(path)
    return ds.select_columns(columns) if columns else ds


def train_val_split(ds, val_frac: float = 0.2, seed: int = 42):
    """Seeded random train/val split (reference op T5, seed 42 —
    bilstm_crf_ner.py:41-49, 739-749)."""
    shuffled = ds.random_shuffle(seed=seed)
    return shuffled.train_test_split(test_size=val_frac)
