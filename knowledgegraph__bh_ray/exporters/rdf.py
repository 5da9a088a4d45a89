"""RDF exporters — JSON-LD (op W6), Turtle (op W8), OWL-style typing (W7).

Clean-room re-expression of the reference's converters (no rdflib in this
container — serialization is emitted directly):

  * JSON-LD (csv2rdf-jsonld.py:16-156): ontology header entity, entity
    ``@id = <iri>#md5(name)[:8]``, ``@type`` Class vs NamedIndividual by
    the class-type set (csv2rdf-jsonld.py:10), rdfs:label, rdfs:comment
    from the ``描述`` property, parent → subClassOf (classes) or rdf:type
    (individuals), other properties as ``<iri>#<key>`` lists; relations
    folded into the subject entity with per-@id dedup; **dangling
    relations silently dropped** (csv2rdf-jsonld.py:94-99 — the engine's
    edges table has already enforced this policy, counted in lineage).
  * Merge-on-load (csv2rdf-jsonld.py:122-153): same ``@id`` ⇒ merge
    key-by-key, list values unioned element-wise.
  * Turtle (csv2ttl.py:13-129): classes in the ontology namespace,
    individuals in the data namespace; rdf:type / rdfs:subClassOf from
    parent; labels; relation predicates declared as owl:ObjectProperty.

These run as driver-side formatters over the (small, post-shuffle)
nodes/edges tables; at scale the same functions drop into a map_batches
formatter stage writing one file per partition.
"""

from __future__ import annotations

import json

import pandas as pd

ONTOLOGY_IRI = "http://www.semanticweb.org/dell/ontologies/2025/2/untitled-ontology-8"
DATA_IRI = "http://www.example.org/data/"

# csv2rdf-jsonld.py:10 class-type set (csv2ttl.py:11 uses a superset)
CLASS_TYPES = {"概念", "元素", "类别", "模型", "组件"}

OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _props(row) -> dict:
    return json.loads(row["props_json"]) if row.get("props_json") else {}


def nodes_edges_to_jsonld(
    nodes: pd.DataFrame,
    edges: pd.DataFrame,
    ontology_iri: str = ONTOLOGY_IRI,
    existing: list | None = None,
) -> list:
    """nodes+edges tables → JSON-LD entity list (merge-on-load supported)."""
    out = [{"@id": ontology_iri, "@type": [f"{OWL}Ontology"]}]
    id_to_uri = {}
    name_by_id = dict(zip(nodes["id"], nodes["name"]))

    for _, row in nodes.iterrows():
        uri = f"{ontology_iri}#{row['id']}"
        id_to_uri[row["id"]] = uri
        entity: dict = {"@id": uri}
        is_class = row["type"] in CLASS_TYPES
        entity["@type"] = [f"{OWL}Class" if is_class else f"{OWL}NamedIndividual"]
        entity[f"{RDFS}label"] = [row["name"]]
        props = _props(row)
        if props.get("描述"):
            entity[f"{RDFS}comment"] = [props["描述"]]
        parent = (row.get("parent") or "").strip()
        if parent and parent in name_by_id:
            parent_uri = f"{ontology_iri}#{parent}"
            if is_class:
                entity[f"{RDFS}subClassOf"] = [{"@id": parent_uri}]
            else:
                entity[f"{RDF}type"] = [{"@id": parent_uri}]
        # the reference consumes the W3 CSV, whose prop columns are named
        # ``<key>:LABEL`` and are ALL re-emitted as ``IRI#<column>`` props —
        # including 描述:LABEL, which therefore appears BOTH as rdfs:comment
        # and as a prop (verified against csv2rdf-jsonld.py:75-81 directly)
        for k, v in props.items():
            if v:
                entity[f"{ontology_iri}#{k}:LABEL"] = [v]
        out.append(entity)

    merged = list(existing) if existing else []
    existing_ids = {e.get("@id") for e in merged}
    for entity in out:
        if entity["@id"] not in existing_ids:
            merged.append(entity)
            continue
        for target in merged:
            if target.get("@id") != entity["@id"]:
                continue
            for key, value in entity.items():
                if key not in target:
                    target[key] = value
                elif isinstance(target[key], list) and isinstance(value, list):
                    for v in value:
                        if v not in target[key]:
                            target[key].append(v)
            break

    by_id = {e.get("@id"): e for e in merged}
    for _, rel in edges.iterrows():
        subj_uri = id_to_uri.get(rel["subj"])
        obj_uri = id_to_uri.get(rel["obj"])
        if not subj_uri or not obj_uri:
            continue  # dangling — already-dropped policy
        predicate = f"{ontology_iri}#{str(rel['pred']).replace(' ', '_')}"
        entity = by_id.get(subj_uri)
        if entity is None:
            continue
        values = entity.setdefault(predicate, [])
        if not any(isinstance(v, dict) and v.get("@id") == obj_uri for v in values):
            values.append({"@id": obj_uri})
    return merged


# ---------------------------------------------------------------------------
# OWL RDF/XML (op W7) — csv2owl.py semantics, serialized without rdflib
# ---------------------------------------------------------------------------

# csv2owl.py:10 — the OWL converter's larger class-type set
CLASS_TYPES_OWL = {
    "概念", "元素", "类别", "模型", "组件", "现象", "类型", "目标",
    "方法", "算法", "属性", "操作", "主题", "任务", "组织",
}

_NCNAME_BAD = None  # compiled lazily (regex below)


def _ncname(s: str) -> str:
    """Sanitize a property/predicate key into a valid XML NCName (the
    reference only does ':'→'_' and ' '→'_', csv2owl.py:81,112 — rdflib
    then rejects anything unserializable; we sanitize fully instead)."""
    import re as _re

    global _NCNAME_BAD
    if _NCNAME_BAD is None:
        _NCNAME_BAD = _re.compile(r"[^\w.\-一-鿿]", _re.UNICODE)
    out = _NCNAME_BAD.sub("_", s.replace(":", "_").replace(" ", "_"))
    if not out or out[0].isdigit() or out[0] in ".-":
        out = "_" + out
    return out


def nodes_edges_to_owl_triples(
    nodes: pd.DataFrame, edges: pd.DataFrame, ontology_iri: str = ONTOLOGY_IRI + "#"
) -> list[tuple]:
    """nodes+edges → RDF triple list with csv2owl.py's exact semantics:

      * ontology declaration (csv2owl.py:20);
      * Class vs NamedIndividual by CLASS_TYPES_OWL (csv2owl.py:40-46);
      * individuals typed by their parent when the parent is a class
        (csv2owl.py:48-57); classes get rdfs:subClassOf (csv2owl.py:65-75);
        ORDER-FREE delta: the reference resolves a parent only if its row
        precedes the child in file order (id_to_uri insertion order) —
        here any parent in the table resolves (documented, deterministic);
      * props → owl:AnnotationProperty declared on FIRST use + literal
        (csv2owl.py:79-87); relation predicates → owl:ObjectProperty +
        label, NOT redeclared if the URI is already defined — so a
        predicate sharing a prop's name keeps the AnnotationProperty
        typing, a faithful reference quirk (csv2owl.py:117-121);
      * dangling relations skipped (csv2owl.py:107-109).

    Objects are ("uri", value) or ("lit", value) tuples."""
    EX = ontology_iri
    triples: list[tuple] = [(ontology_iri, f"{RDF}type", ("uri", f"{OWL}Ontology"))]
    ids = set(nodes["id"])
    is_class = {r["id"]: r["type"] in CLASS_TYPES_OWL for _, r in nodes.iterrows()}
    declared: set[str] = set()

    for _, row in nodes.iterrows():
        uri = EX + row["id"]
        if is_class[row["id"]]:
            triples.append((uri, f"{RDF}type", ("uri", f"{OWL}Class")))
        else:
            triples.append((uri, f"{RDF}type", ("uri", f"{OWL}NamedIndividual")))
            parent = (row.get("parent") or "").strip()
            if parent in ids and is_class.get(parent):
                triples.append((uri, f"{RDF}type", ("uri", EX + parent)))
        triples.append((uri, f"{RDFS}label", ("lit", row["name"])))
        parent = (row.get("parent") or "").strip()
        if is_class[row["id"]] and parent in ids and is_class.get(parent):
            triples.append((uri, f"{RDFS}subClassOf", ("uri", EX + parent)))
        for k, v in _props(row).items():
            if v and str(v).strip():
                prop_uri = EX + _ncname(k)
                if prop_uri not in declared:
                    declared.add(prop_uri)
                    triples.append((prop_uri, f"{RDF}type", ("uri", f"{OWL}AnnotationProperty")))
                triples.append((uri, prop_uri, ("lit", str(v).strip())))

    for _, rel in edges.iterrows():
        if rel["subj"] not in ids or rel["obj"] not in ids:
            continue  # dangling — csv2owl.py:107-109
        pred_uri = EX + _ncname(str(rel["pred"]))
        if pred_uri not in declared:
            declared.add(pred_uri)
            triples.append((pred_uri, f"{RDF}type", ("uri", f"{OWL}ObjectProperty")))
            triples.append((pred_uri, f"{RDFS}label", ("lit", str(rel["pred"]))))
        triples.append((EX + rel["subj"], pred_uri, ("uri", EX + rel["obj"])))
    return triples


def triples_to_rdfxml(triples: list[tuple], ontology_iri: str = ONTOLOGY_IRI + "#") -> str:
    """Serialize the triple list as RDF/XML (rdf:Description blocks grouped
    by subject — the layout rdflib's format='xml' emits)."""
    from xml.sax.saxutils import escape, quoteattr

    ns = {"rdf": RDF, "rdfs": RDFS, "owl": OWL, "ex": ontology_iri}

    def qname(uri: str) -> str:
        for p, base in ns.items():
            if uri.startswith(base) and uri != base:
                return f"{p}:{uri[len(base):]}"
        return None

    by_subj: dict[str, list] = {}
    order: list[str] = []
    for s, p, o in triples:
        if s not in by_subj:
            by_subj[s] = []
            order.append(s)
        by_subj[s].append((p, o))

    lines = [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<rdf:RDF",
        *(f'  xmlns:{p}={quoteattr(base)}' for p, base in ns.items()),
        ">",
    ]
    for s in order:
        lines.append(f"  <rdf:Description rdf:about={quoteattr(s)}>")
        for p, o in by_subj[s]:
            q = qname(p)
            if q is None:  # predicate outside known namespaces
                continue
            kind, val = o
            if kind == "uri":
                lines.append(f"    <{q} rdf:resource={quoteattr(val)}/>")
            else:
                lines.append(f"    <{q}>{escape(val)}</{q}>")
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines) + "\n"


def parse_rdfxml(text: str) -> set[tuple]:
    """Parse RDF/XML (Description-block subset) back into the triple set —
    the round-trip verifier used by tests."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    out: set[tuple] = set()
    for desc in root:
        s = desc.attrib.get(f"{{{RDF}}}about")
        for el in desc:
            # ElementTree tags are {namespace}local
            pred = el.tag.replace("{", "").replace("}", "", 1)
            res = el.attrib.get(f"{{{RDF}}}resource")
            if res is not None:
                out.add((s, pred, ("uri", res)))
            else:
                out.add((s, pred, ("lit", el.text or "")))
    return out


def _ttl_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _ttl_emit(nodes: pd.DataFrame, edges: pd.DataFrame,
              ontology_iri: str, data_iri: str) -> tuple[list, list]:
    """Shared csv2ttl semantics: build the Turtle LINES and the triple LIST
    from one loop so the writer and the differential tests cannot drift.

    Reference behaviors reproduced (csv2ttl.py):
      * classes live in the ontology namespace, individuals in the data
        namespace (csv2ttl.py:40-47); class set = the 15-type superset
        (csv2ttl.py:11 — NOT the 5-type jsonld set);
      * individuals are typed by their parent only when the parent is a
        class (URI starts with the ontology iri, csv2ttl.py:55-60); class
        children get rdfs:subClassOf (csv2ttl.py:67-72);
        ORDER-FREE delta as in the OWL exporter: any parent in the table
        resolves, not just ones whose row precedes the child;
      * props are declared ``owl:AnnotationProperty`` + rdfs:label(raw key)
        on FIRST use, values stripped, empty-after-strip skipped
        (csv2ttl.py:77-93);
      * relation predicates are ``owl:ObjectProperty`` + label unless the
        URI is already declared — a predicate sharing a prop's local name
        keeps the AnnotationProperty typing (csv2ttl.py:104-121);
      * dangling relations skipped (csv2ttl.py:112-117)."""
    lines: list[str] = []
    triples: list[tuple] = []
    is_class = {row["id"]: row["type"] in CLASS_TYPES_OWL for _, row in nodes.iterrows()}

    def ref(nid: str) -> str:
        return f"ont:{nid}" if is_class.get(nid) else f"data:{nid}"

    def uri(nid: str) -> str:
        return (ontology_iri if is_class.get(nid) else data_iri) + nid

    declared: set[str] = set()

    for _, row in nodes.iterrows():
        nid = row["id"]
        subject = ref(nid)
        kind = "Class" if is_class[nid] else "NamedIndividual"
        lines.append(f"{subject} a owl:{kind} ;")
        lines.append(f'    rdfs:label "{_ttl_escape(row["name"])}" .')
        triples.append((uri(nid), f"{RDF}type", ("uri", f"{OWL}{kind}")))
        triples.append((uri(nid), f"{RDFS}label", ("lit", row["name"])))
        parent = (row.get("parent") or "").strip()
        if parent and parent in is_class:
            if is_class[nid] and is_class[parent]:
                lines.append(f"{subject} rdfs:subClassOf {ref(parent)} .")
                triples.append((uri(nid), f"{RDFS}subClassOf", ("uri", uri(parent))))
            elif not is_class[nid] and is_class[parent]:
                lines.append(f"{subject} a {ref(parent)} .")
                triples.append((uri(nid), f"{RDF}type", ("uri", uri(parent))))
        for k, v in _props(row).items():
            if v and str(v).strip():
                prop = k.replace(":", "_").replace(" ", "_")
                if prop not in declared:
                    declared.add(prop)
                    lines.append(f"ont:{prop} a owl:AnnotationProperty ;")
                    lines.append(f'    rdfs:label "{_ttl_escape(k)}" .')
                    triples.append((ontology_iri + prop, f"{RDF}type",
                                    ("uri", f"{OWL}AnnotationProperty")))
                    triples.append((ontology_iri + prop, f"{RDFS}label", ("lit", k)))
                lines.append(f'{subject} ont:{prop} "{_ttl_escape(str(v).strip())}" .')
                triples.append((uri(nid), ontology_iri + prop, ("lit", str(v).strip())))

    for _, rel in edges.iterrows():
        if rel["subj"] not in is_class or rel["obj"] not in is_class:
            continue  # dangling dropped (csv2ttl.py:112-117)
        pred = str(rel["pred"]).replace(" ", "_")
        if pred not in declared:
            declared.add(pred)
            lines.append(f"ont:{pred} a owl:ObjectProperty ;")
            lines.append(f'    rdfs:label "{_ttl_escape(str(rel["pred"]))}" .')
            triples.append((ontology_iri + pred, f"{RDF}type",
                            ("uri", f"{OWL}ObjectProperty")))
            triples.append((ontology_iri + pred, f"{RDFS}label", ("lit", str(rel["pred"]))))
        lines.append(f'{ref(rel["subj"])} ont:{pred} {ref(rel["obj"])} .')
        triples.append((uri(rel["subj"]), ontology_iri + pred, ("uri", uri(rel["obj"]))))
    return lines, triples


def nodes_edges_to_ttl_triples(
    nodes: pd.DataFrame,
    edges: pd.DataFrame,
    ontology_iri: str = ONTOLOGY_IRI + "#",
    data_iri: str = DATA_IRI,
) -> list[tuple]:
    """csv2ttl-semantics triple list (full URIs; objects as ("uri"/"lit",
    value)) — the differential-test surface for the TTL exporter."""
    return _ttl_emit(nodes, edges, ontology_iri, data_iri)[1]


def nodes_edges_to_ttl(
    nodes: pd.DataFrame,
    edges: pd.DataFrame,
    ontology_iri: str = ONTOLOGY_IRI + "#",
    data_iri: str = DATA_IRI,
) -> str:
    """nodes+edges tables → Turtle text (csv2ttl.py namespaces + semantics,
    see _ttl_emit)."""
    lines = [
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .",
        "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
        f"@prefix ont: <{ontology_iri}> .",
        f"@prefix data: <{data_iri}> .",
        "",
    ]
    return "\n".join(lines + _ttl_emit(nodes, edges, ontology_iri, data_iri)[0]) + "\n"
