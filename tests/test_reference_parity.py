"""Randomized differential tests: engine rule functions vs the REFERENCE's
own parser/normalizer, executed directly from /root/reference.

The DuckDB oracle gate cannot catch a wrong shared regex (the regex IS the
spec on both sides), so these tests are the independent check: hypothesis
generates adversarial grammar-ish lines and the engine must agree with the
reference byte-for-byte.  Skipped cleanly when /root/reference is absent
(the repo stays standalone).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "md2csv.py")),
    reason="reference checkout not present",
)


@pytest.fixture(scope="module")
def ref_md2csv():
    spec = importlib.util.spec_from_file_location(
        "_ref_md2csv", os.path.join(REF, "md2csv.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_pdfx():
    # pdf_extractor imports pdf libs at module top; the rule functions under
    # test are pure.  Stub ONLY what is missing, and restore afterwards so
    # other tests' import-try probes are unaffected.
    added = []
    for name in ("pdfplumber", "fitz"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
                added.append(name)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_pdfx", os.path.join(REF, "pdf_extractor.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


# pieces the grammar actually uses, plus adversarial glyphs
_ATOMS = [
    "-", "--", "—", " ", "@", "概念", "类型", "=", '"', ":", "-->", ">",
    "实体", "A", "b3", "x_y", "《》", "0.9", "描述", "##", "【核心概念】",
    "【关联关系】", "值 带 空格", "==", "@@", "$",
]
_line = st.lists(st.sampled_from(_ATOMS), min_size=0, max_size=12).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=8)


@settings(max_examples=300, deadline=None)
@given(_doc)
def test_lineparse_differential(ref_md2csv, doc):
    from knowledgegraph__bh_ray.functions.lineparse import parse_doc_lines

    ref = ref_md2csv.NoteParser()
    for ln in doc:
        ref.parse_line(ln.strip())
    got = parse_doc_lines(doc)

    # concepts: id → (name, type, parent, props)
    ref_c = {
        cid: (c["name"], c["type"], c["parent"] or "", c["props"])
        for cid, c in ref.concepts.items()
    }
    got_c = {
        cid: (c["name"], c["type"], c["parent"] or "", c["props"])
        for cid, c in got.concepts.items()
    }
    assert got_c == ref_c, f"concepts diverge on {doc!r}"

    # relations: ordered (source_id, target_id, type, props)
    def _ref_props(r):
        return {k: v for k, v in r.items()
                if k not in ("source", "target", "type", "_o_source_", "_o_target_")}

    ref_r = [(r["source"], r["target"], r["type"], _ref_props(r))
             for r in ref.relations]
    got_r = [(r["subj"], r["obj"], r["pred"], r["props"]) for r in got.relations]
    assert got_r == ref_r, f"relations diverge on {doc!r}"


_MATHY = st.text(
    alphabet="∑∏∫≈≠≤≥±×÷ abc字文$\\_^{}()0123456789αβ\n",
    min_size=0, max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(_MATHY)
def test_textnorm_differential(ref_pdfx, text):
    from knowledgegraph__bh_ray.functions import textnorm

    assert textnorm.convert_latex(text) == ref_pdfx._convert_latex(text)
    assert textnorm.replace_dir_markers(text) == ref_pdfx._replace_dir_markers(text)
    if text:  # the reference divides by len(text) unguarded (documented delta)
        assert textnorm.is_math_formula(text) == ref_pdfx._is_math_formula(text)


@pytest.fixture(scope="module")
def ref_jsonld():
    spec = importlib.util.spec_from_file_location(
        "_ref_jsonld", os.path.join(REF, "csv2rdf-jsonld.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _frames():
    import pandas as pd

    from knowledgegraph__bh_ray.functions.hashing import md5_id

    nodes = pd.DataFrame(
        {
            "id": [md5_id("机器学习"), md5_id("监督学习"), md5_id("张三")],
            "name": ["机器学习", "监督学习", "张三"],
            "type": ["概念", "类别", "人物"],
            "parent": ["", md5_id("机器学习"), md5_id("监督学习")],
            "props_json": ['{"描述": "ML desc"}', '{"强度": "0.9"}', "{}"],
        }
    )
    edges = pd.DataFrame(
        {
            "subj": [md5_id("机器学习")],
            "pred": ["包 含"],
            "obj": [md5_id("监督学习")],
            "subj_name": ["机器学习"],
            "obj_name": ["监督学习"],
            "props_json": ["{}"],
        }
    )
    return nodes, edges


def test_jsonld_differential_vs_reference(ref_jsonld, tmp_path):
    """Engine JSON-LD ≡ the reference's csv2rdf-jsonld output, fed the
    engine's own W3 concepts CSV.  The relations CSV uses a lowercase
    ``type`` column — the only layout the reference's relations() reads
    (see test_reference_relations_csv_contract_bug)."""
    import csv as _csv
    import json as _json

    from knowledgegraph__bh_ray.exporters.neo4j_csv import nodes_to_neo4j_csv
    from knowledgegraph__bh_ray.exporters.rdf import nodes_edges_to_jsonld

    nodes, edges = _frames()
    (tmp_path / "concepts.csv").write_text(nodes_to_neo4j_csv(nodes), encoding="utf-8")
    with open(tmp_path / "relations.csv", "w", newline="", encoding="utf-8") as f:
        w = _csv.DictWriter(f, fieldnames=[":START_ID", ":END_ID", "type"])
        w.writeheader()
        for _, r in edges.iterrows():
            w.writerow({":START_ID": r["subj"], ":END_ID": r["obj"], "type": r["pred"]})

    out = tmp_path / "out.jsonld"
    ref_jsonld.main(str(tmp_path / "concepts.csv"), str(tmp_path / "relations.csv"), str(out))
    ref = _json.loads(out.read_text(encoding="utf-8"))

    got = nodes_edges_to_jsonld(nodes, edges)
    assert got == ref


def test_reference_relations_csv_contract_bug(ref_jsonld, tmp_path):
    """Verified reference-internal bug: md2csv.export_csv writes the
    relation type column as ':TYPE' (md2csv.py:142), but
    csv2rdf-jsonld.relations() reads row['type'] (csv2rdf-jsonld.py:95) —
    feeding the reference its own relations.csv raises KeyError.  The
    engine's emitter implements the evident intent (fold relations by
    type), which this pins."""
    import csv as _csv

    with open(tmp_path / "relations.csv", "w", newline="", encoding="utf-8") as f:
        w = _csv.DictWriter(f, fieldnames=[":START_ID", ":END_ID", ":TYPE"])
        w.writeheader()
        w.writerow({":START_ID": "a", ":END_ID": "b", ":TYPE": "含"})
    with pytest.raises(KeyError):
        ref_jsonld.relations(str(tmp_path / "relations.csv"), {"a": "u", "b": "v"})


@pytest.fixture(scope="module")
def ref_rag():
    added = []
    if "sentence_transformers" not in sys.modules:
        stub = types.ModuleType("sentence_transformers")
        stub.SentenceTransformer = lambda *a, **k: None
        sys.modules["sentence_transformers"] = stub
        added.append("sentence_transformers")
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_rag", os.path.join(REF, "rag_query.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for name in added:
            sys.modules.pop(name, None)


def test_rag_topk_differential_vs_reference(ref_rag, ray_session):
    """Engine brute-force cosine top-k ≡ the reference's _search_similar on
    a tie-free corpus (same query vector).  Tie-break is a documented
    delta: the reference orders equal similarities by input index (stable
    argsort reversed), the engine by (similarity DESC, text ASC) — a
    distributed partial top-k cannot see input order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from knowledgegraph__bh_ray.stages.embed import fake_encode, rag_topk

    cls = next(
        v for v in vars(ref_rag).values()
        if isinstance(v, type) and hasattr(v, "_search_similar")
    )

    names = [f"概念{i}" for i in range(40)]
    embs = [fake_encode([n])[0].astype(np.float64) for n in names]
    df = pd.DataFrame({"name": names, "embedding": embs})

    q = fake_encode(["实体1"])[0].astype(np.float64)
    ref_hits = cls._search_similar(None, q, df, top_k=5)
    ref_pairs = [(h["text"], float(h["similarity"])) for h in ref_hits]

    ds = rd.from_pandas(pd.DataFrame({"name": names, "embedding": embs}))
    got = rag_topk(ds, "实体1", "name", k=5)
    got_pairs = list(zip(got["name"], got["similarity"].astype(float)))

    assert [t for t, _ in got_pairs] == [t for t, _ in ref_pairs]
    for (_, a), (_, b) in zip(got_pairs, ref_pairs):
        assert abs(a - b) < 1e-12


@pytest.fixture(scope="module")
def ref_mdf():
    spec = importlib.util.spec_from_file_location(
        "_ref_mdf", os.path.join(REF, "md_formatter.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_MD_TEXT = st.text(
    alphabet="![]()<img src=\"ab.png\">\\begin{figure}end$x字\n ",
    min_size=0, max_size=80,
)


@settings(max_examples=300, deadline=None)
@given(_MD_TEXT)
def test_md_formatter_differential(ref_mdf, text):
    """Engine image/formula scrubbing ≡ md_formatter._replace_patterns with
    the reference's own pattern lists, including the combined-alternation
    order ($$ before $) and the blank-line block rule."""
    from knowledgegraph__bh_ray.functions.textnorm import (scrub_formulas_md,
                                                           scrub_images)

    assert scrub_images(text) == ref_mdf._replace_patterns(
        text, ref_mdf.DEFAULT_IMAGE_PATTERNS, "[图片]"
    )
    assert scrub_formulas_md(text) == ref_mdf._replace_patterns(
        text, ref_mdf.DEFAULT_FORMULA_PATTERNS, "[公式]"
    )


# ---------------------------------------------------------------------------
# csv2owl differential: engine triple model ≡ the reference's rdflib calls
# ---------------------------------------------------------------------------


def _rdflib_recording_stub():
    """Minimal rdflib stand-in that RECORDS g.add() triples (no serializer
    — the env has no rdflib, and the semantics under test are the triple
    set, not rdflib's XML writer)."""
    m = types.ModuleType("rdflib")

    class URIRef(str):
        pass

    class Literal(str):
        pass

    class Namespace(str):
        def __getitem__(self, key):
            return URIRef(str(self) + key)

    class Graph:
        def __init__(self):
            self.t = []

        def add(self, triple):
            self.t.append(triple)

        def bind(self, *a, **k):
            pass

        def triples(self, pat):
            s, p, o = pat
            for t in self.t:
                if (s is None or t[0] == s) and (p is None or t[1] == p) \
                        and (o is None or t[2] == o):
                    yield t

    class _NS:
        def __init__(self, base):
            self._b = base

        def __getattr__(self, k):
            return URIRef(self._b + k)

    ns = types.ModuleType("rdflib.namespace")
    ns.RDF = _NS("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
    ns.RDFS = _NS("http://www.w3.org/2000/01/rdf-schema#")
    ns.OWL = _NS("http://www.w3.org/2002/07/owl#")
    ns.XSD = _NS("http://www.w3.org/2001/XMLSchema#")
    m.Graph, m.Namespace, m.URIRef, m.Literal = Graph, Namespace, URIRef, Literal
    m.namespace = ns
    return m, ns


@pytest.fixture(scope="module")
def rdflib_stub():
    """ONE stub shared by every csv2owl/csv2ttl fixture in this module —
    a per-fixture stub would leave isinstance checks pointing at a
    different Literal/URIRef class than the one the reference imported."""
    m, ns = _rdflib_recording_stub()
    added = []
    for name, mod in (("rdflib", m), ("rdflib.namespace", ns)):
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)
    try:
        yield sys.modules["rdflib"]
    finally:
        for name in added:
            sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def ref_csv2owl(rdflib_stub):
    spec = importlib.util.spec_from_file_location(
        "_ref_csv2owl", os.path.join(REF, "csv2owl.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, rdflib_stub


def _ref_triples(graph, stub):
    out = set()
    for s, p, o in graph.t:
        if isinstance(o, stub.Literal):
            out.add((str(s), str(p), ("lit", str(o))))
        else:
            out.add((str(s), str(p), ("uri", str(o))))
    return out


_ONT = "http://x.org/ont#"


def _write_ref_csvs(tmp_path, type_header="type:LABLE"):
    """Concepts/relations CSVs in the layout csv2owl EXPECTS (the md2csv
    header-contract mismatch is pinned separately below).  Rows are
    parents-first and prop keys need only ':'/' ' sanitizing, neutralizing
    the engine's two documented deterministic deltas (order-free parent
    resolution, full NCName sanitize)."""
    import csv as _csv

    concepts = tmp_path / "concepts.csv"
    with open(concepts, "w", newline="", encoding="utf-8") as f:
        w = _csv.DictWriter(f, fieldnames=[":ID", "name", type_header, "parent",
                                           "描述", "level of:thing"])
        w.writeheader()
        rows = [
            ("c1", "机器学习", "概念", "", "ML ", ""),          # class, padded prop
            ("c2", "监督学习", "类别", "c1", "", "3"),           # class child → subClassOf
            ("i1", "张三", "人物", "c1", "一个人", ""),          # individual typed by class parent
            ("i2", "李四", "人物", "i1", "", ""),                # parent is individual → no typing
            ("c3", "空类型", "", "c2", "", ""),                 # empty type → individual
        ]
        for rid, name, typ, parent, d, lvl in rows:
            w.writerow({":ID": rid, "name": name, type_header: typ,
                        "parent": parent, "描述": d, "level of:thing": lvl})
    relations = tmp_path / "relations.csv"
    with open(relations, "w", newline="", encoding="utf-8") as f:
        w = _csv.DictWriter(f, fieldnames=[":START_ID", ":END_ID", ":TYPE"])
        w.writeheader()
        w.writerow({":START_ID": "c1", ":END_ID": "c2", ":TYPE": "包含"})
        w.writerow({":START_ID": "i1", ":END_ID": "i2", ":TYPE": "认识 的"})  # space → _
        w.writerow({":START_ID": "c1", ":END_ID": "i1", ":TYPE": "包含"})    # repeat pred
        w.writerow({":START_ID": "c1", ":END_ID": "zz", ":TYPE": "包含"})    # dangling
        w.writerow({":START_ID": "c2", ":END_ID": "c1", ":TYPE": "描述"})    # pred == prop name
    return concepts, relations


def test_owl_triples_differential_vs_reference(ref_csv2owl, tmp_path):
    """Engine OWL triple model ≡ the reference's csv2owl rdflib calls on the
    same input (class/individual split, parent typing vs subClassOf, prop
    declaration-on-first-use, relation ObjectProperty+label, the
    pred-collides-with-prop quirk, dangling skip)."""
    import pandas as pd

    from knowledgegraph__bh_ray.exporters.rdf import nodes_edges_to_owl_triples

    mod, stub = ref_csv2owl
    concepts, relations = _write_ref_csvs(tmp_path)
    g, id_to_uri = mod.concepts_to_owl(str(concepts), _ONT)
    g = mod.relations_to_owl(g, str(relations), id_to_uri, _ONT)
    ref = _ref_triples(g, stub) | {(_ONT, stub.namespace.RDF._b + "type",
                                    ("uri", stub.namespace.OWL._b + "Ontology"))}

    nodes = pd.DataFrame(
        {
            "id": ["c1", "c2", "i1", "i2", "c3"],
            "name": ["机器学习", "监督学习", "张三", "李四", "空类型"],
            "type": ["概念", "类别", "人物", "人物", ""],
            "parent": ["", "c1", "c1", "i1", "c2"],
            "props_json": ['{"描述": "ML "}', '{"level of:thing": "3"}',
                           '{"描述": "一个人"}', "{}", "{}"],
        }
    )
    edges = pd.DataFrame(
        {
            "subj": ["c1", "i1", "c1", "c1", "c2"],
            "pred": ["包含", "认识 的", "包含", "包含", "描述"],
            "obj": ["c2", "i2", "i1", "zz", "c1"],
        }
    )
    eng = set(nodes_edges_to_owl_triples(nodes, edges, _ONT))
    assert eng == ref


def test_reference_owl_header_contract_bug(ref_csv2owl, tmp_path):
    """Verified reference-internal bug: csv2owl reads 'type:LABLE' (typo'd
    LABEL) but md2csv writes a bare 'type' column — so on the reference's
    OWN concepts.csv every entity degrades to NamedIndividual and the real
    type value leaks out as a generic annotation-property literal.  The
    engine reads the actual 'type' column (deliberate delta, documented at
    exporters/rdf.py)."""
    mod, stub = ref_csv2owl
    concepts, relations = _write_ref_csvs(tmp_path, type_header="type")
    g, _ = mod.concepts_to_owl(str(concepts), _ONT)
    ref = _ref_triples(g, stub)
    OWLNS = stub.namespace.OWL._b
    RDFNS = stub.namespace.RDF._b
    # 机器学习 is 概念 (a class type) — yet it is typed NamedIndividual…
    assert (_ONT + "c1", RDFNS + "type", ("uri", OWLNS + "NamedIndividual")) in ref
    assert not any(o == ("uri", OWLNS + "Class") for _, _, o in ref)
    # …and its type value escapes as a plain literal property
    assert (_ONT + "c1", _ONT + "type", ("lit", "概念")) in ref


@pytest.fixture(scope="module")
def ref_csv2ttl(rdflib_stub):
    spec = importlib.util.spec_from_file_location(
        "_ref_csv2ttl", os.path.join(REF, "csv2ttl.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, rdflib_stub


_DATA = "http://x.org/data/"


def test_ttl_triples_differential_vs_reference(ref_csv2ttl, tmp_path):
    """Engine TTL triple model ≡ the reference's csv2ttl rdflib calls on
    the same input — the two-namespace layout (classes in ont, individuals
    in data), the 15-type class set, prop AnnotationProperty+label
    declarations, value stripping, and the pred-collides-with-prop quirk."""
    import pandas as pd

    from knowledgegraph__bh_ray.exporters.rdf import nodes_edges_to_ttl_triples

    mod, stub = ref_csv2ttl
    concepts, relations = _write_ref_csvs(tmp_path)
    g, id_to_uri = mod.concepts_to_ttl(str(concepts), _ONT, _DATA)
    g = mod.relations_to_ttl(g, str(relations), id_to_uri, _ONT, _DATA)
    ref = _ref_triples(g, stub)

    nodes = pd.DataFrame(
        {
            "id": ["c1", "c2", "i1", "i2", "c3"],
            "name": ["机器学习", "监督学习", "张三", "李四", "空类型"],
            "type": ["概念", "类别", "人物", "人物", ""],
            "parent": ["", "c1", "c1", "i1", "c2"],
            "props_json": ['{"描述": "ML "}', '{"level of:thing": "3"}',
                           '{"描述": "一个人"}', "{}", "{}"],
        }
    )
    edges = pd.DataFrame(
        {
            "subj": ["c1", "i1", "c1", "c1", "c2"],
            "pred": ["包含", "认识 的", "包含", "包含", "描述"],
            "obj": ["c2", "i2", "i1", "zz", "c1"],
        }
    )
    eng = set(nodes_edges_to_ttl_triples(nodes, edges, _ONT, _DATA))
    assert eng == ref


def test_ttl_text_serializes_its_own_triples(tmp_path):
    """The TTL text and the triple list come from one emitter — every
    triple must be recoverable from the text's qname lines (guards the
    writer against drifting from the differential-tested semantics)."""
    import pandas as pd

    from knowledgegraph__bh_ray.exporters.rdf import (
        nodes_edges_to_ttl, nodes_edges_to_ttl_triples)

    nodes = pd.DataFrame(
        {"id": ["a", "b"], "name": ["机器学习", "张三"],
         "type": ["概念", "人物"], "parent": ["", "a"],
         "props_json": ['{"描述": "x"}', "{}"]}
    )
    edges = pd.DataFrame({"subj": ["a"], "pred": ["包含"], "obj": ["b"]})
    text = nodes_edges_to_ttl(nodes, edges, _ONT, _DATA)
    triples = nodes_edges_to_ttl_triples(nodes, edges, _ONT, _DATA)
    # spot checks: every subject/predicate localname appears in the text
    assert f"ont:a a owl:Class ;" in text
    assert f"data:b a owl:NamedIndividual ;" in text
    assert "data:b a ont:a ." in text            # individual typed by class parent
    assert "ont:描述 a owl:AnnotationProperty ;" in text
    assert "ont:包含 a owl:ObjectProperty ;" in text
    assert len(triples) == sum(
        1 for ln in text.splitlines()
        if ln.strip() and not ln.startswith("@prefix")
        and (ln.endswith(" .") or ln.endswith(" ;"))
    ) - 0  # one line per statement ("a X ;" + label line are two statements)


# ---------------------------------------------------------------------------
# embedding_generator differential: engine phrase assembly ≡ the reference,
# fed the engine's OWN Neo4j-layout CSVs, sharing one deterministic encoder
# ---------------------------------------------------------------------------


@pytest.fixture()
def ref_embgen():
    """OVERRIDES any existing sentence_transformers entry (ref_rag's
    module-scoped dummy may still be installed) and restores it after —
    generate_embeddings imports the module lazily at call time, so the
    entry present DURING THE TEST is the one that matters."""
    from knowledgegraph__bh_ray.stages.embed import fake_encode

    stub = types.ModuleType("sentence_transformers")

    class SentenceTransformer:
        def __init__(self, name):
            self.name = name

        def encode(self, texts):
            return fake_encode(list(texts))

    stub.SentenceTransformer = SentenceTransformer
    prev = sys.modules.get("sentence_transformers")
    sys.modules["sentence_transformers"] = stub
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_embgen", os.path.join(REF, "embedding_generator.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        if prev is None:
            sys.modules.pop("sentence_transformers", None)
        else:
            sys.modules["sentence_transformers"] = prev


def test_embedding_generator_differential(ref_embgen, tmp_path):
    """End-to-end: engine-exported concepts/relations CSVs (md2csv layout)
    → the reference's generate_embeddings (encoder stubbed with the
    engine's own deterministic fake) → per-name / per-phrase vectors must
    equal the engine's encode of its nodes and relation phrases — pinning
    the '_o_source_ :TYPE _o_target_' phrase-assembly rule
    (embedding_generator.py:55) and the name-column contract."""
    import ast
    from pathlib import Path

    import numpy as np
    import pandas as pd

    from knowledgegraph__bh_ray.exporters.neo4j_csv import (
        edges_to_neo4j_csv, nodes_to_neo4j_csv)
    from knowledgegraph__bh_ray.functions.hashing import md5_id
    from knowledgegraph__bh_ray.stages.embed import fake_encode

    nodes = pd.DataFrame(
        {
            "id": [md5_id("机器学习"), md5_id("监督学习")],
            "name": ["机器学习", "监督学习"],
            "type": ["概念", "类别"],
            "parent": ["", md5_id("机器学习")],
            "props_json": ["{}", "{}"],
        }
    )
    edges = pd.DataFrame(
        {
            "subj": [md5_id("机器学习")],
            "pred": ["包含"],
            "obj": [md5_id("监督学习")],
            "subj_name": ["机器学习"],
            "obj_name": ["监督学习"],
            "props_json": ["{}"],
        }
    )
    cpath, rpath = tmp_path / "concepts.csv", tmp_path / "relations.csv"
    cpath.write_text(nodes_to_neo4j_csv(nodes), encoding="utf-8")
    rpath.write_text(edges_to_neo4j_csv(edges), encoding="utf-8")

    out = tmp_path / "out"
    ref_embgen.generate_embeddings(Path(cpath), Path(rpath), Path(out), "kg")

    ref_c = pd.read_csv(out / "kg_concepts_embeddings.csv")
    assert ref_c["concept_name"].tolist() == nodes["name"].tolist()
    got_c = np.array([ast.literal_eval(e) for e in ref_c["embedding"]], dtype=np.float32)
    assert (got_c == fake_encode(nodes["name"].tolist())).all()

    ref_r = pd.read_csv(out / "kg_relations_embeddings.csv")
    phrases = [f"{r.subj_name} {r.pred} {r.obj_name}" for r in edges.itertuples()]
    assert ref_r["relation_phrase"].tolist() == phrases  # engine rule ≡ reference rule
    got_r = np.array([ast.literal_eval(e) for e in ref_r["embedding"]], dtype=np.float32)
    assert (got_r == fake_encode(phrases)).all()
