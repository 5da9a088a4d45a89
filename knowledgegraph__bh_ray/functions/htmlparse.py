"""HTML page extraction (reference ops M1–M4, SURVEY.md §2.3).

Clean-room, compiled-regex re-implementation of the extraction rules of the
reference's ``web_crawler2/knowledge_extractor.py`` (M1: title / summary /
infobox / catalog / paragraphs / references; M2: all links; M4: anti-bot
verification predicate) and ``web_crawler2/constructor.py:42-79`` (M3: scoped
``/item/`` link extraction with query-string strip + absolutization).

The reference uses BeautifulSoup class-token matching; this engine targets the
same page layout (versioned class-name prefixes ``lemmaTitle_*``,
``lemmaSummary_*``, ``basicInfo_*``, ``catalogList_*``, ``para_WzwJ3``,
``mainContent_*``, ``innerLink_*``/``lemma_inlink``,
``referenceItem_Z9PAD``) with compiled regexes — vectorization-friendly and
dependency-free.  Semantics parity is enforced by tests against the
independent single-process oracle (``knowledgegraph__bh_ray.oracle``) which
parses with a real HTML tokenizer (stdlib ``html.parser``); the per-url
extracted text must be byte-identical between the two.

Limitations (documented, by construction of the input): no nested ``<div>``
inside the summary / basicInfo / catalog / mainContent containers; attribute
quoting is double-quote.  Real Common-Crawl HTML would swap this module for a
tokenizer-based extractor behind the same function signature.
"""

from __future__ import annotations

import html as _html
import re

BAIKE_PREFIX = "https://baike.baidu.com"

# M4 — web_crawler.py:133-145 / knowledge_extractor.py:75-80 blocklist
VERIFICATION_PATTERNS = (
    "百度安全验证",
    "请输入验证码",
    "security_verify",
    "安全验证中心",
)

_RE_TAG = re.compile(r"<[^>]+>")
_RE_TITLE = re.compile(r'<h1 class="lemmaTitle_[^"]*"[^>]*>(.*?)</h1>', re.S)
_RE_SUMMARY = re.compile(r'<div class="lemmaSummary_[^"]*"[^>]*>(.*?)</div>', re.S)
_RE_BASIC = re.compile(r'<div class="basicInfo_[^"]*"[^>]*>(.*?)</div>', re.S)
_RE_DT = re.compile(r'<dt class="basicInfoItem_[^"]* itemName_[^"]*"[^>]*>(.*?)</dt>', re.S)
_RE_DD = re.compile(r'<dd class="basicInfoItem_[^"]* itemValue_[^"]*"[^>]*>(.*?)</dd>', re.S)
_RE_CATALOG = re.compile(r'<div class="catalogList_[^"]*"[^>]*>(.*?)</div>', re.S)
_RE_LI = re.compile(r'<li class="(level[12])[^"]*"[^>]*>(.*?)</li>', re.S)
_RE_CAT_TEXT = re.compile(r'<span class="catalogText_[^"]*"[^>]*>\s*<a[^>]*>(.*?)</a>', re.S)
_RE_PARA = re.compile(r'<p class="para_WzwJ3"[^>]*>(.*?)</p>', re.S)
_RE_MAIN = re.compile(r'<div class="mainContent_[^"]*"[^>]*>(.*?)</div>', re.S)
_RE_A = re.compile(r"<a\s([^>]*)>(.*?)</a>", re.S)
_RE_ATTR = re.compile(r'([a-zA-Z-]+)="([^"]*)"')
_RE_REFITEM = re.compile(r'<div class="referenceItem_Z9PAD J-ref-item"[^>]*>(.*?)</div>', re.S)
_RE_REFLINK = re.compile(r'<a class="refLink_[^"]*"\s*([^>]*)>(.*?)</a>', re.S)
_RE_SPAN = re.compile(r"<span[^>]*>(.*?)</span>", re.S)

_SCOPED_LINK_CLASSES = frozenset({"innerLink_KLXyc", "lemma_inlink"})


def get_text(fragment: str) -> str:
    """BeautifulSoup ``get_text().strip()`` equivalent: drop tags,
    unescape entities, strip (knowledge_extractor.py:163-210 passim)."""
    return _html.unescape(_RE_TAG.sub("", fragment)).strip()


def is_verification_page(html_text: str) -> bool:
    """M4 — substring blocklist (web_crawler.py:123-169)."""
    return any(p in html_text for p in VERIFICATION_PATTERNS)


def _attrs(attr_str: str) -> dict[str, str]:
    return dict(_RE_ATTR.findall(attr_str))


def extract_page(html_text: str) -> dict:
    """M1 — full page extraction (knowledge_extractor.py:142-246).

    Returns a dict with keys title, summary, basic_info (list of [k, v]
    pairs, insertion order), catalog (list, level2 indented 4 spaces),
    paragraphs (non-empty, stripped — knowledge_extractor.py:207-210),
    references (list of dicts), links_all, links_scoped.
    """
    title = ""
    m = _RE_TITLE.search(html_text)
    if m:
        title = get_text(m.group(1))

    summary = ""
    m = _RE_SUMMARY.search(html_text)
    if m:
        summary = get_text(m.group(1))

    basic_info: list[list[str]] = []
    m = _RE_BASIC.search(html_text)
    if m:
        names = [get_text(g) for g in _RE_DT.findall(m.group(1))]
        values = [get_text(g) for g in _RE_DD.findall(m.group(1))]
        basic_info = [[k, v] for k, v in zip(names, values)]

    catalog: list[str] = []
    m = _RE_CATALOG.search(html_text)
    if m:
        for level, inner in _RE_LI.findall(m.group(1)):
            tm = _RE_CAT_TEXT.search(inner)
            if tm:
                text = get_text(tm.group(1))
                # level2 entries get a 4-space indent (knowledge_extractor.py:198-201)
                catalog.append("    " + text if level == "level2" else text)

    paragraphs = [t for t in (get_text(g) for g in _RE_PARA.findall(html_text)) if t]

    references: list[dict] = []
    for inner in _RE_REFITEM.findall(html_text):
        lm = _RE_REFLINK.search(inner)
        if not lm:
            continue
        ref_url = _attrs(lm.group(1)).get("href", "")
        if ref_url and not ref_url.startswith("http"):
            ref_url = f"{BAIKE_PREFIX}{ref_url}"  # knowledge_extractor.py:221-222
        spans = _RE_SPAN.findall(inner)
        references.append(
            {
                "title": get_text(lm.group(2)),
                "url": ref_url,
                "source": get_text(spans[0]) if len(spans) > 0 else "",
                "date": get_text(spans[1]) if len(spans) > 1 else "",
            }
        )

    links_all: list[dict] = []
    for attr_str, inner in _RE_A.findall(html_text):
        attrs = _attrs(attr_str)
        text = get_text(inner)
        href = attrs.get("href", "")
        if text and href:  # M2 — nonempty text and url (knowledge_extractor.py:31-35)
            links_all.append({"text": text, "url": href})

    links_scoped: list[dict] = []
    m = _RE_MAIN.search(html_text)
    if m:
        for attr_str, inner in _RE_A.findall(m.group(1)):
            attrs = _attrs(attr_str)
            classes = set(attrs.get("class", "").split())
            if not (classes & _SCOPED_LINK_CLASSES):
                continue
            href = attrs.get("href", "")
            # M3 — keep /item/ links only, strip query, absolutize
            # (constructor.py:67-74)
            if href.startswith("/item/"):
                links_scoped.append(
                    {
                        "text": get_text(inner),
                        "url": f"{BAIKE_PREFIX}{href.split('?')[0]}",
                    }
                )

    return {
        "title": title,
        "summary": summary,
        "basic_info": basic_info,
        "catalog": catalog,
        "paragraphs": paragraphs,
        "references": references,
        "links_all": links_all,
        "links_scoped": links_scoped,
    }
