"""Single-process reference-rule oracle (SURVEY.md §5 test strategy).

A straight-line, non-Ray implementation of the engine's semantics, used as
ground truth by pytest and by the driver's DuckDB correctness gate (golden
parquet files under ``/tmp/kgbh_golden/<sf>/``).

Independence model (what a mismatch would catch):
  * HTML extraction here uses a real tokenizer — stdlib ``html.parser``
    building a small DOM — while the engine uses compiled regexes; the
    per-url byte-identical-text invariant compares the two.
  * Pipeline orchestration here is a single ordered loop; the engine is a
    distributed Ray Data DAG — comparing triples/nodes/edges catches
    partitioning, shuffle, ordering and dedup bugs.
  * The markdown-grammar *rule spec* (lineparse) and the text normalizers
    are shared regex constants by design — the regex IS the spec
    (md2csv.py / pdf_extractor.py); their correctness is pinned by unit
    tests against hand-written expected outputs, not by this oracle.

Golden tables (all carry ``seq = url + '#' + zero-padded line/para index`` as
the global keep-first ordering key):
  extracted    url, title, summary, text_out, n_paras
  links_raw    url, text, href            (scoped anchors, pre-filter)
  nodes_raw    url, seq, id, name, type, parent, props_json
  triples_raw  url, seq, subj, pred, obj, subj_name, obj_name, props_json
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from html import unescape
from html.parser import HTMLParser

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.lineparse import parse_doc_lines
from .functions.textnorm import normalize_paragraph
from .pagegen import ensure_pages

GOLDEN_ROOT = "/tmp/kgbh_golden"
BAIKE_PREFIX = "https://baike.baidu.com"

VERIFICATION_PATTERNS = ("百度安全验证", "请输入验证码", "security_verify", "安全验证中心")

_SCOPED_LINK_CLASSES = {"innerLink_KLXyc", "lemma_inlink"}


# ---------------------------------------------------------------------------
# Minimal DOM via the stdlib HTML tokenizer
# ---------------------------------------------------------------------------


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list = []  # str | _Node

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def text(self) -> str:
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return unescape("".join(out))

    def walk(self):
        yield self
        for c in self.children:
            if isinstance(c, _Node):
                yield from c.walk()

    def find_all(self, tag: str | None = None, class_prefix: str | None = None):
        for n in self.walk():
            if n is self:
                continue
            if tag and n.tag != tag:
                continue
            if class_prefix and not any(c.startswith(class_prefix) for c in n.classes):
                continue
            yield n

    def find(self, tag: str | None = None, class_prefix: str | None = None):
        return next(self.find_all(tag, class_prefix), None)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[root]", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].children.append(data)


def parse_dom(html_text: str) -> _Node:
    tb = _TreeBuilder()
    tb.feed(html_text)
    return tb.root


# ---------------------------------------------------------------------------
# Reference-rule extraction over the DOM (knowledge_extractor.py:142-246)
# ---------------------------------------------------------------------------


def oracle_extract(html_text: str) -> dict | None:
    """Extract one page; None if it is an anti-bot verification page."""
    if any(p in html_text for p in VERIFICATION_PATTERNS):
        return None
    dom = parse_dom(html_text)

    title_elem = dom.find("h1", "lemmaTitle_")
    title = title_elem.text().strip() if title_elem else ""

    summary_elem = dom.find("div", "lemmaSummary_")
    summary = summary_elem.text().strip() if summary_elem else ""

    basic_info: list[list[str]] = []
    basic_elem = dom.find("div", "basicInfo_")
    if basic_elem:
        names = [n.text().strip() for n in basic_elem.find_all("dt", "basicInfoItem_")
                 if any(c.startswith("itemName_") for c in n.classes)]
        values = [n.text().strip() for n in basic_elem.find_all("dd", "basicInfoItem_")
                  if any(c.startswith("itemValue_") for c in n.classes)]
        basic_info = [[k, v] for k, v in zip(names, values)]

    catalog: list[str] = []
    cat_elem = dom.find("div", "catalogList_")
    if cat_elem:
        for li in cat_elem.find_all("li"):
            level = "level1" if "level1" in li.classes else "level2"
            span = li.find("span", "catalogText_")
            a = span.find("a") if span else None
            if a:
                text = a.text().strip()
                catalog.append("    " + text if level == "level2" else text)

    paragraphs = [t for t in (p.text().strip() for p in dom.find_all("p", "para_WzwJ3")) if t]

    links_all: list[tuple[str, str]] = []
    for a in dom.find_all("a"):
        text = a.text().strip()
        href = a.attrs.get("href", "")
        if text and href:  # M2 — nonempty text and url (knowledge_extractor.py:31-35)
            links_all.append((text, href))

    links_raw: list[tuple[str, str]] = []
    main = dom.find("div", "mainContent_")
    if main:
        for a in main.find_all("a"):
            if set(a.classes) & _SCOPED_LINK_CLASSES:
                links_raw.append((a.text().strip(), a.attrs.get("href", "")))

    references: list[dict] = []
    for item in dom.find_all("div", "referenceItem_"):
        link = item.find("a", "refLink_")
        if link is None:
            continue
        ref_url = link.attrs.get("href", "")
        if ref_url and not ref_url.startswith("http"):
            ref_url = f"{BAIKE_PREFIX}{ref_url}"  # knowledge_extractor.py:221-222
        spans = [n for n in item.find_all("span")]
        references.append(
            {
                "title": link.text().strip(),
                "url": ref_url,
                "source": spans[0].text().strip() if len(spans) > 0 else "",
                "date": spans[1].text().strip() if len(spans) > 1 else "",
            }
        )

    return {
        "title": title,
        "summary": summary,
        "basic_info": basic_info,
        "catalog": catalog,
        "paragraphs": paragraphs,
        "links_raw": links_raw,
        "links_all": links_all,
        "references": references,
    }


def seq_key(url: str, idx: int) -> str:
    return f"{url}#{idx:06d}"


def oracle_tag_mentions(text: str, names_by_len: list[str], name_set: set[str]) -> list[dict]:
    """Independent gazetteer tagger: at each position try candidate lengths
    longest-first against a hash set (maximum forward matching) — same
    leftmost-longest semantics as the engine's length-ordered regex
    alternation, different implementation."""
    lengths = sorted({len(n) for n in name_set}, reverse=True)
    out = []
    i = 0
    n = len(text)
    while i < n:
        hit = None
        for L in lengths:
            if i + L <= n and text[i : i + L] in name_set:
                hit = L
                break
        if hit is None:
            i += 1
        else:
            out.append({"entity": text[i : i + hit], "start": i, "end": i + hit})
            i += hit
    return out


def oracle_run(pages_table: pa.Table) -> dict[str, pa.Table]:
    """Run the full single-process pipeline over a pages table."""
    urls = pages_table.column("url").to_pylist()
    htmls = pages_table.column("html").to_pylist()

    ext_rows = {"url": [], "title": [], "summary": [], "text_out": [], "n_paras": []}
    rec_rows = {"url": [], "name": [], "contents": [], "basic_info_json": [],
                "catalog_json": [], "paragraphs_json": [], "references_json": []}
    link_rows = {"url": [], "text": [], "href": []}
    link_all_rows = {"url": [], "text": [], "href": []}
    node_rows = {"url": [], "seq": [], "id": [], "name": [], "type": [],
                 "parent": [], "props_json": []}
    triple_rows = {"url": [], "seq": [], "subj": [], "pred": [], "obj": [],
                   "subj_name": [], "obj_name": [], "props_json": []}
    mention_rows = {"url": [], "para_idx": [], "entity": [], "etype": [],
                    "start": [], "end": []}
    docs = []  # (url, paras) for the mention pass (needs the global gazetteer)

    for url, html_bytes in zip(urls, htmls):
        info = oracle_extract(html_bytes.decode("utf-8"))
        if info is None:
            continue
        paras = [normalize_paragraph(p) for p in info["paragraphs"]]
        text_out = "\n".join(paras)

        ext_rows["url"].append(url)
        ext_rows["title"].append(info["title"])
        ext_rows["summary"].append(info["summary"])
        ext_rows["text_out"].append(text_out)
        ext_rows["n_paras"].append(len(paras))

        rec_rows["url"].append(url)
        rec_rows["name"].append(info["title"])
        rec_rows["contents"].append(info["summary"])
        rec_rows["basic_info_json"].append(
            json.dumps(dict(map(tuple, info["basic_info"])), ensure_ascii=False)
        )
        rec_rows["catalog_json"].append(json.dumps(info["catalog"], ensure_ascii=False))
        rec_rows["paragraphs_json"].append(json.dumps(info["paragraphs"], ensure_ascii=False))
        rec_rows["references_json"].append(json.dumps(info["references"], ensure_ascii=False))

        for text, href in info["links_raw"]:
            link_rows["url"].append(url)
            link_rows["text"].append(text)
            link_rows["href"].append(href)
        for text, href in info["links_all"]:
            link_all_rows["url"].append(url)
            link_all_rows["text"].append(text)
            link_all_rows["href"].append(href)

        docs.append((url, paras))
        parsed = parse_doc_lines(paras)
        for c in parsed.concepts.values():
            node_rows["url"].append(url)
            node_rows["seq"].append(seq_key(url, c["line_no"]))
            node_rows["id"].append(c["id"])
            node_rows["name"].append(c["name"])
            node_rows["type"].append(c["type"])
            node_rows["parent"].append(c["parent"])
            node_rows["props_json"].append(json.dumps(c["props"], ensure_ascii=False, sort_keys=True))
        for r in parsed.relations:
            triple_rows["url"].append(url)
            triple_rows["seq"].append(seq_key(url, r["line_no"]))
            triple_rows["subj"].append(r["subj"])
            triple_rows["pred"].append(r["pred"])
            triple_rows["obj"].append(r["obj"])
            triple_rows["subj_name"].append(r["subj_name"])
            triple_rows["obj_name"].append(r["obj_name"])
            triple_rows["props_json"].append(json.dumps(r["props"], ensure_ascii=False, sort_keys=True))

    # mention pass: gazetteer = distinct node names under the SAME
    # longest-win vocabulary cap as the engine (stages/ner.MAX_GAZETTEER,
    # same (-len, name) sort key) — the golden-hash gate stays valid at
    # scales where the vocabulary exceeds the cap
    from .stages.ner import MAX_GAZETTEER

    names_by_len = sorted(
        set(n for n in node_rows["name"] if n), key=lambda x: (-len(x), x)
    )[:MAX_GAZETTEER]
    name_set = set(names_by_len)
    for url, paras in docs:
        for pi, para in enumerate(paras):
            for m in oracle_tag_mentions(para, names_by_len, name_set):
                mention_rows["url"].append(url)
                mention_rows["para_idx"].append(pi)
                mention_rows["entity"].append(m["entity"])
                mention_rows["etype"].append("CONCEPT")
                mention_rows["start"].append(m["start"])
                mention_rows["end"].append(m["end"])

    ext_rows["n_paras"] = pa.array(ext_rows["n_paras"], pa.int64())
    for c in ("para_idx", "start", "end"):
        mention_rows[c] = pa.array(mention_rows[c], pa.int64())
    return {
        "extracted": pa.table(ext_rows),
        "records": pa.table(rec_rows),
        "links_raw": pa.table(link_rows),
        "links_all": pa.table(link_all_rows),
        "nodes_raw": pa.table(node_rows),
        "triples_raw": pa.table(triple_rows),
        "mentions": pa.table(mention_rows),
    }


# ---------------------------------------------------------------------------
# Golden-file cache
# ---------------------------------------------------------------------------

GOLDEN_TABLES = ("extracted", "records", "links_raw", "links_all", "nodes_raw", "triples_raw", "mentions")
GOLDEN_VERSION = "4"  # bump when oracle semantics change → stale /tmp caches regenerate


def golden_dir(sf_dir: str, root: str = GOLDEN_ROOT) -> str:
    return os.path.join(root, os.path.basename(os.path.normpath(sf_dir)))


def ensure_golden(sf_dir: str, root: str = GOLDEN_ROOT) -> str:
    """Generate (once, atomically) the golden tables for an sf dir."""
    gdir = golden_dir(sf_dir, root)
    vfile = os.path.join(gdir, "VERSION")
    version_ok = os.path.exists(vfile) and open(vfile).read().strip() == GOLDEN_VERSION
    if version_ok and all(
        os.path.exists(os.path.join(gdir, f"{t}.parquet")) for t in GOLDEN_TABLES
    ):
        return gdir
    os.makedirs(gdir, exist_ok=True)
    pages = pq.read_table(ensure_pages(sf_dir))
    tables = oracle_run(pages)
    for name, table in tables.items():
        out = os.path.join(gdir, f"{name}.parquet")
        fd, tmp = tempfile.mkstemp(dir=gdir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, out)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    with open(os.path.join(gdir, "VERSION"), "w") as f:
        f.write(GOLDEN_VERSION)
    return gdir
