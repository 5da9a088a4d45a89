"""Web-branch graph JSON exporter (reference op W5).

Emits the constructor-style knowledge-graph JSON — a list of ontology
records ``{name, contents, children, parents, URL, basic_info, catalog,
content_paragraphs, references}`` with children/parents as
``{name, index}`` pairs (constructor.py:121-131, 253-277; the committed
sample ``web_crawler2/KnowledgeGraph/knowledge_graph.json`` has exactly
these keys).

Deterministic delta vs the reference: node indices follow sorted-url order
instead of BFS-encounter order (the BFS visit order is an artifact of the
single-process crawl loop, not of the graph).
"""

from __future__ import annotations

import json

import pandas as pd


def page_graph_to_json(
    records: pd.DataFrame, nodes: pd.DataFrame, edges: pd.DataFrame
) -> list[dict]:
    """records(url, name, contents, basic_info_json, catalog_json,
    references_json) + page-graph nodes/edges → constructor-style list."""
    nodes = nodes.sort_values("url", kind="mergesort").reset_index(drop=True)
    index_of = {u: i for i, u in enumerate(nodes["url"])}
    rec_by_url = {r["url"]: r for _, r in records.iterrows()}

    out = []
    for _, n in nodes.iterrows():
        rec = rec_by_url.get(n["url"])
        out.append(
            {
                "name": n["name"],
                "contents": rec["contents"] if rec is not None else "",
                "children": [],
                "parents": [],
                "URL": n["url"],
                "basic_info": json.loads(rec["basic_info_json"]) if rec is not None else {},
                "catalog": json.loads(rec["catalog_json"]) if rec is not None else [],
                "content_paragraphs": json.loads(rec["paragraphs_json"]) if rec is not None else [],
                "references": json.loads(rec["references_json"]) if rec is not None else [],
            }
        )

    seen_children: set[tuple[int, int]] = set()
    for _, e in edges.iterrows():
        src = index_of.get(e["src_url"])
        dst = index_of.get(e["dst_url"])
        if src is None or dst is None or (src, dst) in seen_children:
            continue
        seen_children.add((src, dst))
        out[src]["children"].append({"name": e["text"], "index": dst})
        out[dst]["parents"].append({"name": out[src]["name"], "index": src})
    return out
