"""Extraction + parse batch UDFs (the narrow, embarrassingly-parallel path).

``extract_parse_batch`` is the engine's fused per-page stage: html →
verification filter (M4) → DOM-field extraction (M1–M3) → paragraph
normalization (M5–M8) → markdown-grammar parse (M10–M13).  One Arrow batch
in, one Arrow batch out (one row per surviving page, concepts/triples as
Arrow list<struct> columns) — fusing avoids re-shipping the html bytes
between stages and keeps the heavy nested columns out of the object store
until the flatten stages prune to just what they need.

All regexes are compiled at module import (once per worker process); the
per-row Python work is the HTML parse itself — the same per-document cost
the reference pays single-threaded (knowledge_extractor.py:142-246), here
spread across Ray tasks.

Per-document sequential parse state (``current_concept``) never crosses a
batch boundary because parsing runs per page inside one UDF call
(SURVEY.md §7.4).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.htmlparse import extract_page, is_verification_page
from ..functions.lineparse import parse_doc_lines
from ..functions.textnorm import normalize_paragraph


def seq_key(url: str, idx: int) -> str:
    """Global keep-first ordering key: url + zero-padded line index."""
    return f"{url}#{idx:06d}"


NODE_STRUCT = pa.struct(
    [
        ("seq", pa.string()),
        ("id", pa.string()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("parent", pa.string()),
        ("props_json", pa.string()),
    ]
)
TRIPLE_STRUCT = pa.struct(
    [
        ("seq", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_name", pa.string()),
        ("obj_name", pa.string()),
        ("props_json", pa.string()),
    ]
)
LINK_STRUCT = pa.struct([("text", pa.string()), ("link_url", pa.string())])

PARSED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("summary", pa.string()),
        ("text_out", pa.string()),
        ("n_paras", pa.int64()),
        ("links", pa.list_(LINK_STRUCT)),
        ("nodes", pa.list_(NODE_STRUCT)),
        ("triples", pa.list_(TRIPLE_STRUCT)),
    ]
)


def extract_parse_batch(batch: pa.Table, stats: dict | None = None) -> pa.Table:
    """pages(url, html) → parsed page records (PARSED_SCHEMA).

    Per-row skip-bad-record policy (SURVEY.md §4): undecodable or
    unparseable pages are quarantined (counted in ``stats`` — fed to the
    lineage counters by the pipeline runner) instead of failing the task."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()

    out = {name: [] for name in PARSED_SCHEMA.names}

    for url, html_bytes in zip(urls, htmls):
        try:
            html_text = html_bytes.decode("utf-8")
        except UnicodeDecodeError:
            if stats is not None:
                stats["pages_failed_decode"] = stats.get("pages_failed_decode", 0) + 1
            continue
        if is_verification_page(html_text):
            if stats is not None:
                stats["pages_dropped_verification"] = (
                    stats.get("pages_dropped_verification", 0) + 1
                )
            continue
        try:
            info = extract_page(html_text)
        except Exception:  # noqa: BLE001 — quarantine, never poison the task
            if stats is not None:
                stats["pages_failed_parse"] = stats.get("pages_failed_parse", 0) + 1
            continue
        paras = [normalize_paragraph(p) for p in info["paragraphs"]]
        parsed = parse_doc_lines(paras)

        out["url"].append(url)
        out["title"].append(info["title"])
        out["summary"].append(info["summary"])
        out["text_out"].append("\n".join(paras))
        out["n_paras"].append(len(paras))
        out["links"].append(
            [{"text": l["text"], "link_url": l["url"]} for l in info["links_scoped"]]
        )
        out["nodes"].append(
            [
                {
                    "seq": seq_key(url, c["line_no"]),
                    "id": c["id"],
                    "name": c["name"],
                    "type": c["type"],
                    "parent": c["parent"],
                    "props_json": json.dumps(c["props"], ensure_ascii=False, sort_keys=True),
                }
                for c in parsed.concepts.values()
            ]
        )
        out["triples"].append(
            [
                {
                    "seq": seq_key(url, r["line_no"]),
                    "subj": r["subj"],
                    "pred": r["pred"],
                    "obj": r["obj"],
                    "subj_name": r["subj_name"],
                    "obj_name": r["obj_name"],
                    "props_json": json.dumps(r["props"], ensure_ascii=False, sort_keys=True),
                }
                for r in parsed.relations
            ]
        )

    return pa.Table.from_pydict(out, schema=PARSED_SCHEMA)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → (url, title, summary, text_out, n_paras) only —
    the cheap projection used by the byte-identical-text query."""
    t = extract_parse_batch(batch)
    return t.select(["url", "title", "summary", "text_out", "n_paras"])


def flatten_list_column(parsed: pa.Table, column: str, keep: list[str]) -> pa.Table:
    """Explode one list<struct> column to rows, carrying parent ``keep``
    columns — vectorized via Arrow list kernels (no Python loop)."""
    import pyarrow.compute as pc

    col = parsed.column(column).combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks == 1 else pa.concat_arrays(col.chunks)
    parent_idx = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    arrays = []
    names = []
    for k in keep:
        arrays.append(pc.take(parsed.column(k), parent_idx))
        names.append(k)
    for field in flat.type:
        arrays.append(pc.struct_field(flat, field.name))
        names.append(field.name)
    return pa.table(dict(zip(names, arrays)))


RECORDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("name", pa.string()),
        ("contents", pa.string()),
        ("basic_info_json", pa.string()),
        ("catalog_json", pa.string()),
        ("paragraphs_json", pa.string()),
        ("references_json", pa.string()),
    ]
)


def extract_records_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) → full ontology-record projection (the web-branch
    record shape, constructor.py:121-131): name=title, contents=summary,
    basic_info (insertion-ordered dict), catalog, raw paragraphs,
    references — nested fields as JSON strings for a stable driver-compare
    surface."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out = {name: [] for name in RECORDS_SCHEMA.names}
    for url, html_bytes in zip(urls, htmls):
        html_text = html_bytes.decode("utf-8")
        if is_verification_page(html_text):
            continue
        info = extract_page(html_text)
        out["url"].append(url)
        out["name"].append(info["title"])
        out["contents"].append(info["summary"])
        out["basic_info_json"].append(
            json.dumps(dict(info["basic_info"]), ensure_ascii=False)
        )
        out["catalog_json"].append(json.dumps(info["catalog"], ensure_ascii=False))
        out["paragraphs_json"].append(json.dumps(info["paragraphs"], ensure_ascii=False))
        out["references_json"].append(json.dumps(info["references"], ensure_ascii=False))
    return pa.Table.from_pydict(out, schema=RECORDS_SCHEMA)
