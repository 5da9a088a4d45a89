"""Unit tests for the markdown-grammar line parser — hand-written expected
outputs pin the reference rules (md2csv.py:24-105) including the quirks; this
is the independent check for the shared rule spec (see oracle.py docstring).
"""

from knowledgegraph__bh_ray.functions.hashing import md5_id
from knowledgegraph__bh_ray.functions.lineparse import parse_doc_lines


def test_concept_basic_and_parent():
    out = parse_doc_lines(
        [
            "## 【核心概念】",
            "- 机器学习 @概念",
            "-- 监督学习 @类别",
            "- 深度学习 @概念",
        ]
    )
    ml, sup, dl = md5_id("机器学习"), md5_id("监督学习"), md5_id("深度学习")
    assert set(out.concepts) == {ml, sup, dl}
    assert out.concepts[ml]["parent"] == ""
    # indent-2 child attaches to the current indent-1 concept
    assert out.concepts[sup]["parent"] == ml
    # indent-2 does NOT update the cursor; next indent-1 is top-level again
    assert out.concepts[dl]["parent"] == ml  # cursor was still 机器学习


def test_section_header_resets_cursor():
    out = parse_doc_lines(["- A @概念", "## 【核心概念】", "- B @概念"])
    assert out.concepts[md5_id("B")]["parent"] == ""


def test_concept_props_on_same_line_merge_into_itself():
    out = parse_doc_lines(["- A @概念 权重=0.8"])
    assert out.concepts[md5_id("A")]["props"] == {"权重": "0.8"}


def test_props_line_goes_to_current_concept():
    out = parse_doc_lines(["- A @概念", '描述="demo" 级别=3'])
    assert out.concepts[md5_id("A")]["props"] == {"描述": "demo", "级别": "3"}


def test_nested_concept_props_go_to_parent_cursor():
    # indent-2 concept does not take the cursor, so its same-line k=v lands
    # on the indent-1 parent (reference behavior, md2csv.py:46-57 + 95-105)
    out = parse_doc_lines(["- P @概念", "-- C @类别 来源=x"])
    assert out.concepts[md5_id("P")]["props"] == {"来源": "x"}
    assert out.concepts[md5_id("C")]["props"] == {}


def test_relation_forms():
    out = parse_doc_lines(
        [
            "- A --> B : 包含",
            "- A --> C : 类型=属于",
            "-- D --> E : 相关 强度=0.9",
        ]
    )
    rels = [(r["subj_name"], r["obj_name"], r["pred"]) for r in out.relations]
    assert rels == [("A", "B", "包含"), ("A", "C", "属于"), ("D", "E", "相关")]
    assert out.relations[2]["props"] == {"强度": "0.9"}
    assert out.relations[0]["subj"] == md5_id("A")


def test_relation_duplicates_preserved():
    out = parse_doc_lines(["- A --> B : 包含", "- A --> B : 包含"])
    assert len(out.relations) == 2  # md2csv.py:93 appends, no dedup


def test_quoted_prop_without_space_unquoted():
    out = parse_doc_lines(['- A --> B : 相关 描述="compact"'])
    assert out.relations[0]["props"] == {"描述": "compact"}


def test_quoted_prop_with_space_is_mangled_like_reference():
    # the reference regex tries the unquoted branch first, so a quoted value
    # containing a space captures only up to the space, quote included
    out = parse_doc_lines(['- A --> B : 相关 描述="有 空格"'])
    assert out.relations[0]["props"]["描述"] == '"有'


def test_relation_line_props_leak_into_current_concept():
    # any '=' line feeds the current concept's props — including relation
    # lines (three independent if-blocks in the reference parse_line)
    out = parse_doc_lines(["- X @概念", "- A --> B : 相关 强度=0.7"])
    assert out.concepts[md5_id("X")]["props"] == {"强度": "0.7"}


def test_same_name_same_id_last_wins():
    out = parse_doc_lines(["- A @概念", "- A @类别"])
    assert len(out.concepts) == 1
    assert out.concepts[md5_id("A")]["type"] == "类别"


def test_md5_id_matches_duckdb():
    import duckdb

    for name in ("机器学习", "Entity0", "实体5"):
        (sql_id,) = duckdb.sql(
            "SELECT substr(md5(?), 1, 8)", params=[name]
        ).fetchone()
        assert sql_id == md5_id(name)


# ---------------------------------------------------------------------------
# Round-2 quirk fixtures — expectations hand-derived from md2csv.py rules
# (NOT from engine output): the shared regex constants are invisible to the
# DuckDB gate, so these pin the behavior the regexes must produce.
# ---------------------------------------------------------------------------


def test_multi_arrow_line_lazy_groups():
    """md2csv.py:62 — group(1) is lazy, so the FIRST --> splits source; the
    second --> lands inside the (also lazy) target group."""
    out = parse_doc_lines(["- A --> B --> C : 关系 k=v"])
    assert len(out.relations) == 1
    r = out.relations[0]
    assert r["subj_name"] == "A"
    assert r["obj_name"] == "B --> C"
    assert r["pred"] == "关系"
    assert r["props"] == {"k": "v"}


def test_quoted_value_containing_equals_is_mangled():
    """md2csv.py:78 — the unquoted alternative [^\\s=]+ is tried first and
    stops at '=', so c="q=2" yields value '"q' (the quoted branch never
    fires); d=="v" yields nothing (value cannot start with '=')."""
    out = parse_doc_lines(['- S --> T : r a=1 b="x y" c="q=2" d=="v"'])
    r = out.relations[0]
    assert r["props"] == {"a": "1", "b": '"x', "c": '"q'}


def test_top_level_concepts_chain_as_parents():
    """md2csv.py:50 — parent is the CURRENT cursor at creation, even for an
    indent-1 concept: consecutive top-level concepts chain."""
    out = parse_doc_lines(["## 【核心概念】", "- A @概念", "- C @概念"])
    ids = {c["name"]: c for c in out.concepts.values()}
    assert ids["A"]["parent"] == ""
    assert ids["C"]["parent"] == ids["A"]["id"]


def test_deep_concept_before_any_top_level_has_no_parent():
    """Indent-2 concept with a None cursor: parent '' and cursor stays None
    (md2csv.py:56-57 only indent==1 updates it)."""
    out = parse_doc_lines(["## 【核心概念】", "-- D @概念", "- E @概念"])
    ids = {c["name"]: c for c in out.concepts.values()}
    assert ids["D"]["parent"] == ""
    # E's parent: cursor still None when E created
    assert ids["E"]["parent"] == ""


def test_relation_source_dash_strip_is_source_only():
    """md2csv.py:69 strips leading [\\s-]+ from SOURCE only; a dashy target
    keeps its dashes."""
    out = parse_doc_lines(["--- - X --> - Y : t"])
    r = out.relations[0]
    assert r["subj_name"] == "X"
    assert r["obj_name"] == "- Y"


def test_mixed_indent_tree_cursor_semantics():
    """Indent-2 concepts attach to the current indent-1 cursor and do NOT
    move it; a later indent-1 concept re-points the cursor."""
    out = parse_doc_lines(
        ["## 【核心概念】", "- A @概念", "-- B @概念", "-- C @概念", "- D @概念", "-- E @概念"]
    )
    ids = {c["name"]: c for c in out.concepts.values()}
    a, d = ids["A"]["id"], ids["D"]["id"]
    assert ids["B"]["parent"] == a and ids["C"]["parent"] == a
    assert ids["D"]["parent"] == a  # chaining quirk
    assert ids["E"]["parent"] == d


def test_concept_and_relation_double_fire_same_line():
    """No elif between the rule blocks (md2csv.py:39,62): a line matching
    both the concept and the relation grammar emits BOTH — the concept
    regex lazily stops at the first '@', the relation keeps the raw left
    side as source."""
    d = parse_doc_lines(["- A @T --> B : r"])
    assert [c["name"] for c in d.concepts.values()] == ["A"]
    assert len(d.relations) == 1
    assert d.relations[0]["subj_name"] == "A @T"
    assert d.relations[0]["obj_name"] == "B"
    assert d.relations[0]["pred"] == "r"


def test_concept_first_at_sign_wins():
    """Lazy name group: '- a@b @T' parses as name 'a', type 'b' — the
    trailing ' @T' is silently ignored (md2csv.py:39)."""
    d = parse_doc_lines(["- a@b @T"])
    (c,) = d.concepts.values()
    assert (c["name"], c["type"]) == ("a", "b")


def test_relation_colon_in_target_splits_early():
    """Lazy target + ':' separator: a URL-ish target containing ':' is cut
    at its first colon and the remainder becomes the relation type
    (md2csv.py:62) — '- A --> http://x : r' yields target 'http', type
    '//x'; the real type lands in the ignored props tail."""
    d = parse_doc_lines(["- A --> http://x : r"])
    (r,) = d.relations
    assert r["obj_name"] == "http"
    assert r["pred"] == "//x"
    assert r["props"] == {}


def test_relation_type_unwrap_requires_attached_value():
    """'类型= x' (value after a space): rel_type captures '类型=' and the
    unwrap regex needs a non-empty value after '=', so the literal '类型='
    survives as the predicate (md2csv.py:62,72)."""
    d = parse_doc_lines(["- A --> B : 类型= x"])
    (r,) = d.relations
    assert r["pred"] == "类型="


def test_prop_key_with_dash_truncates_to_word_tail():
    """Prop key group is (\\w+): 'k-ey=v' silently records key 'ey'
    (md2csv.py:99)."""
    d = parse_doc_lines(["- C @T", "k-ey=v 描述=ok"])
    (c,) = d.concepts.values()
    assert c["props"] == {"ey": "v", "描述": "ok"}


# --- edge-of-grammar fixtures (second round-3 session): pin the shared
# regex spec on inputs the synthesized corpus does not exercise ---


def test_empty_concept_name_hashes_empty_string():
    # '- @概念': the non-greedy name group matches '' (md2csv.py:39) — the
    # reference happily creates a concept whose id is md5('')[:8]
    out = parse_doc_lines(["- @概念"])
    assert set(out.concepts) == {md5_id("")}
    assert out.concepts[md5_id("")]["name"] == ""
    assert out.concepts[md5_id("")]["type"] == "概念"


def test_concept_type_truncates_at_non_word_char():
    # '@\\w+' stops at the first non-word char; the tail is ignored
    out = parse_doc_lines(["- X @deep-learn"])
    assert out.concepts[md5_id("X")]["type"] == "deep"


def test_rel_type_with_equals_not_unwrapped_and_leaks():
    # rel_type '[^\\s]+' may contain '='; only a 类型= prefix unwraps.
    # The whole line also feeds the concept-prop leak, which sees BOTH
    # pairs (描述=x from the rel_type token, 强度=0.9 from the tail).
    out = parse_doc_lines(["- A @概念", "- a --> b : 描述=x 强度=0.9"])
    (rel,) = out.relations
    assert rel["pred"] == "描述=x"
    assert rel["props"] == {"强度": "0.9"}
    assert out.concepts[md5_id("A")]["props"] == {"描述": "x", "强度": "0.9"}


def test_rel_type_unwrap_is_greedy_through_equals():
    # 类型=a=b → unwrap regex '(.+)' grabs everything after the first '='
    out = parse_doc_lines(["- a --> b : 类型=a=b"])
    assert out.relations[0]["pred"] == "a=b"


def test_relation_empty_target():
    # '- a -->  : t' — target group is non-greedy and can be empty
    out = parse_doc_lines(["- a -->  : t"])
    (rel,) = out.relations
    assert rel["obj_name"] == "" and rel["obj"] == md5_id("")
    assert rel["subj_name"] == "a" and rel["pred"] == "t"


def test_relations_section_header_does_not_reset_cursor():
    # only '## 【核心概念】' resets (md2csv.py:34-36); the relations header
    # is an ordinary line, so the cursor — and the prop leak — survive it
    out = parse_doc_lines(["- A @概念", "## 【关联关系】", "-- B @类别", "级别=2"])
    assert out.concepts[md5_id("B")]["parent"] == md5_id("A")
    assert out.concepts[md5_id("A")]["props"] == {"级别": "2"}


def test_props_line_before_any_concept_goes_nowhere():
    out = parse_doc_lines(["级别=2", "- A @概念"])
    assert out.concepts[md5_id("A")]["props"] == {}


def test_section_header_line_skips_all_other_rules():
    # the reference RETURNS on the section header (md2csv.py:34-36), so a
    # concept-looking tail on the same line is never parsed
    out = parse_doc_lines(["## 【核心概念】 - X @概念"])
    assert out.concepts == {}


def test_poison_prop_keys_do_not_clobber_relation_fields():
    """Deliberate delta: the reference's relation.update(rel_props)
    (md2csv.py:92) lets props keyed 'type'/'source'/'target' overwrite the
    triple's own fields — 'source' even becomes the raw prop string, not an
    id (verified against the reference parser).  The engine keeps props
    separate and the typed schema intact."""
    out = parse_doc_lines(["- a --> b : 包含 type=覆盖 source=snap"])
    (rel,) = out.relations
    assert rel["pred"] == "包含"
    assert rel["subj"] == md5_id("a") and rel["obj"] == md5_id("b")
    assert rel["props"] == {"type": "覆盖", "source": "snap"}
