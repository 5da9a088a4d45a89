"""Markdown-grammar line parser → concepts + raw triples (ops M10–M13).

Clean-room re-implementation of the reference's ``md2csv.py`` NoteParser
line rules (citations file:line into /root/reference/md2csv.py), operating on
one document's extracted-text lines *in order* inside a single call — the
parser carries per-document sequential state (``current_concept``,
md2csv.py:18,55-57) so a document's lines must never be split across batches
(SURVEY.md §7.4).

Reproduced rules, including the reference's quirks (they are the spec the
P/R gate scores against):

  * ``## 【核心概念】`` resets the current-concept cursor (md2csv.py:34-36);
    the relation section header does NOT reset it.
  * concept line ``(-+)\\s*(.*?)\\s*@(\\w+)`` (md2csv.py:39): dash-count is the
    indent; only indent==1 updates the cursor, deeper concepts attach to the
    *current* indent-1 concept as parent.
  * same-name concepts share ``id = md5(name)[:8]`` and the later occurrence
    overwrites (within-document last-wins, md2csv.py:46-53).
  * relation line ``^-+\\s*(.*?)\\s*-->\\s*(.*?)\\s*:\\s*([^\\s]+)(?:\\s+(.*))?$``
    (md2csv.py:62); leading ``[\\s-]+`` stripped from source only
    (md2csv.py:69); ``类型=X`` unwrapped to ``X`` (md2csv.py:72-73);
    duplicate relations are kept (md2csv.py:93) — dedup happens downstream.
  * property pairs ``(\\w+)\\s*=\\s*([^\\s=]+|"[^"]+")`` — the *unquoted*
    alternative is tried first, so a quoted value containing a space matches
    only up to the space (e.g. ``描述="有 空格"`` yields value ``"有``); the
    quote-strip branch only fires for quoted values without spaces.  This is
    the reference's actual behavior and is reproduced verbatim.
  * *any* line containing ``=`` while a concept is current — including concept
    and relation lines themselves — merges its k=v pairs into the current
    concept's props (md2csv.py:95-105).

Deliberate delta (verified against md2csv.py directly): the reference merges
relation props with ``relation.update(rel_props)`` (md2csv.py:92), so a prop
literally keyed ``type`` / ``source`` / ``target`` silently CLOBBERS the
triple's fields — ``source`` even becomes the raw prop string instead of an
md5 id, corrupting the row.  The engine keeps props in a separate dict and
preserves the typed (subj, pred, obj) schema; the reference's own grammar
uses Chinese prop keys, so its test documents never hit this path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .hashing import md5_id

RE_SECTION_CONCEPTS = re.compile(r"## 【核心概念】")
RE_CONCEPT = re.compile(r"(-+)\s*(.*?)\s*@(\w+)")
RE_RELATION = re.compile(r"^-+\s*(.*?)\s*-->\s*(.*?)\s*:\s*([^\s]+)(?:\s+(.*))?$")
RE_REL_TYPE_UNWRAP = re.compile(r"类型\s*=\s*(.+)")
RE_SOURCE_STRIP = re.compile(r"^[\s-]+")
RE_PROP = re.compile(r'(\w+)\s*=\s*([^\s=]+|"[^"]+")')


def _unquote(value: str) -> str:
    if value.startswith('"') and value.endswith('"'):
        return value[1:-1]
    return value


@dataclass
class ParsedDoc:
    """Parse result for one document: concepts keyed by id (last-wins) and
    the append-only relation list, both carrying the emitting line number."""

    concepts: dict[str, dict] = field(default_factory=dict)
    relations: list[dict] = field(default_factory=list)


def parse_doc_lines(lines: list[str]) -> ParsedDoc:
    """Run the NoteParser line rules over one document's lines in order."""
    out = ParsedDoc()
    current: str | None = None

    for lineno, line in enumerate(lines):
        line = line.strip()

        if RE_SECTION_CONCEPTS.match(line):
            current = None
            continue

        m = RE_CONCEPT.match(line)
        if m:
            indent = len(m.group(1))
            name = m.group(2).strip()
            ctype = m.group(3)
            cid = md5_id(name)
            out.concepts[cid] = {
                "id": cid,
                "name": name,
                "type": ctype,
                "parent": current or "",
                "props": {},
                "line_no": lineno,
            }
            if indent == 1:
                current = cid

        m = RE_RELATION.match(line)
        if m:
            source = RE_SOURCE_STRIP.sub("", m.group(1).strip())
            target = m.group(2).strip()
            rel_type = m.group(3).strip()
            props_str = m.group(4)

            um = RE_REL_TYPE_UNWRAP.match(rel_type)
            if um:
                rel_type = um.group(1)

            rel_props = {}
            if props_str:
                for pm in RE_PROP.finditer(props_str):
                    key, value = pm.groups()
                    rel_props[key.strip()] = _unquote(value).strip()

            out.relations.append(
                {
                    "subj": md5_id(source),
                    "obj": md5_id(target),
                    "pred": rel_type,
                    "subj_name": source,
                    "obj_name": target,
                    "props": rel_props,
                    "line_no": lineno,
                }
            )

        if current is not None and "=" in line:
            for pm in RE_PROP.finditer(line):
                key, value = pm.groups()
                out.concepts[current]["props"][key.strip()] = _unquote(value).strip()

    return out
