"""OBO-graph JSON → enriched ontology term records.

Semantics-faithful reimplementation of the reference parser
(``/root/reference/app/go_parser.py:7-162``) with a vectorized Arrow batch
wrapper for Ray Data.  Deliberately preserved reference quirks:

* cross-references are NOT deduplicated — the same xref appearing in
  ``meta.definition.xrefs``, ``meta.xrefs`` and ``basicPropertyValues`` is
  emitted once per occurrence (asserted by the reference at
  ``tests/test_do_cross_reference_extraction.py:216-242``);
* CURIE normalization is ``uri.split("/")[-1]`` followed by
  ``str.replace`` of EVERY occurrence of each ``prefix_replacement`` pair —
  ``malformed_uri`` → ``malformed:uri`` (``app/go_parser.py:97-100``,
  pinned by ``tests/test_go_data_parsing.py:291-298``);
* synonyms with unknown preds land only in ``all_synonyms``
  (``app/go_parser.py:18-32``); empty synonym ``val`` is skipped entirely;
* nodes missing ``id`` or ``lbl`` are dropped, all other missing fields
  degrade to ``""`` / ``[]`` (``app/go_parser.py:91-95``, ``:103-110``);
* ``searchable_text`` is ``" ".join(filter(None, [name, definition] +
  all_synonyms))`` (``app/go_parser.py:122-127``) — note the SPACE join,
  distinct from the ``" | "`` join of the manager path (see ``text.py``);
* only ``graphs[0]`` of the document is read (``app/go_parser.py:149-153``).
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

_NAMESPACE_PRED = "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace"

_SYNONYM_BUCKETS = {
    "hasExactSynonym": "exact_synonyms",
    "hasNarrowSynonym": "narrow_synonyms",
    "hasBroadSynonym": "broad_synonyms",
    "hasRelatedSynonym": "related_synonyms",
}

TERM_SCHEMA = pa.schema(
    [
        ("term_id", pa.string()),
        ("name", pa.string()),
        ("definition", pa.large_string()),
        ("exact_synonyms", pa.list_(pa.string())),
        ("narrow_synonyms", pa.list_(pa.string())),
        ("broad_synonyms", pa.list_(pa.string())),
        ("related_synonyms", pa.list_(pa.string())),
        ("all_synonyms", pa.list_(pa.string())),
        ("cross_references", pa.list_(pa.string())),
        ("namespace", pa.string()),
        ("searchable_text", pa.large_string()),
        ("is_obsolete", pa.bool_()),
    ]
)


def get_nested_value(data: dict, path: list[str], default: Any = "") -> Any:
    """Walk a nested-dict path with a default (reference: app/main.py:95-103)."""
    cur: Any = data
    for key in path:
        if isinstance(cur, dict) and key in cur:
            cur = cur[key]
        else:
            return default
    return cur


def extract_synonyms_from_node(node: dict) -> dict[str, list[str]]:
    """Bucket ``meta.synonyms`` by pred (reference: app/go_parser.py:7-40)."""
    meta = node.get("meta") or {}
    synonyms = meta.get("synonyms", []) if isinstance(meta, dict) else []

    out: dict[str, list[str]] = {
        "exact_synonyms": [],
        "narrow_synonyms": [],
        "broad_synonyms": [],
        "related_synonyms": [],
        "all_synonyms": [],
    }
    if not isinstance(synonyms, list):
        return out
    for syn in synonyms:
        if not isinstance(syn, dict):
            continue
        val = syn.get("val", "")
        pred = syn.get("pred", "")
        if val:
            out["all_synonyms"].append(val)
            bucket = _SYNONYM_BUCKETS.get(pred)
            if bucket:
                out[bucket].append(val)
    return out


def extract_cross_references(node: dict) -> list[str]:
    """Concat xrefs from all three sources, duplicates preserved
    (reference: app/go_parser.py:43-71)."""
    meta = node.get("meta") or {}
    if not isinstance(meta, dict):
        return []
    xrefs: list[str] = []

    definition = meta.get("definition", {})
    if isinstance(definition, dict) and "xrefs" in definition:
        dx = definition["xrefs"]
        if isinstance(dx, list):
            xrefs.extend(x for x in dx if isinstance(x, str))

    for xref in meta.get("xrefs", []) or []:
        if isinstance(xref, dict) and "val" in xref:
            val = xref["val"]
            if val and isinstance(val, str):
                xrefs.append(val)
        elif isinstance(xref, str) and xref:
            xrefs.append(xref)

    for prop in meta.get("basicPropertyValues", []) or []:
        if not isinstance(prop, dict):
            continue
        if "hasDbXref" in (prop.get("pred") or ""):
            val = prop.get("val", "")
            if val and isinstance(val, str):
                xrefs.append(val)
    return xrefs


def get_ontology_namespace(node: dict) -> str:
    """hasOBONamespace basicPropertyValue, else "" (reference: app/go_parser.py:74-83)."""
    meta = node.get("meta") or {}
    if not isinstance(meta, dict):
        return ""
    for prop in meta.get("basicPropertyValues", []) or []:
        if isinstance(prop, dict) and prop.get("pred") == _NAMESPACE_PRED:
            return prop.get("val", "")
    return ""


def _is_obsolete(node: dict) -> bool:
    """OBO deprecation flag: ``meta.deprecated`` truthy or name prefix
    ``obsolete `` (the GO path parses obsolete terms rather than dropping
    them — reference tests/test_go_data_parsing.py:201-209; the DO embed
    path filters them later, quality.py)."""
    meta = node.get("meta") or {}
    if isinstance(meta, dict) and meta.get("deprecated"):
        return True
    lbl = node.get("lbl", "")
    return isinstance(lbl, str) and lbl.lower().startswith("obsolete ")


def parse_enhanced_term(node: dict, id_format: dict | None = None) -> dict | None:
    """Node → enriched flat term dict; None when id/lbl missing
    (reference: app/go_parser.py:86-141)."""
    if id_format is None:
        id_format = {"prefix_replacement": {"_": ":"}}

    try:
        id_uri = node["id"]
        name = node["lbl"]
    except (KeyError, TypeError):
        return None
    if not isinstance(id_uri, str) or not isinstance(name, str):
        return None

    term_id = id_uri.split("/")[-1]
    for old, new in (id_format.get("prefix_replacement") or {}).items():
        term_id = term_id.replace(old, new)

    definition = ""
    meta = node.get("meta") or {}
    if isinstance(meta, dict) and "definition" in meta:
        def_obj = meta["definition"]
        if isinstance(def_obj, dict):
            definition = def_obj.get("val", "")
        else:
            definition = str(def_obj)
    if not isinstance(definition, str):
        definition = str(definition)

    synonym_data = extract_synonyms_from_node(node)
    xrefs = extract_cross_references(node)
    namespace = get_ontology_namespace(node)

    searchable_components = [name, definition]
    searchable_components.extend(synonym_data["all_synonyms"])
    searchable_text = " ".join(filter(None, searchable_components))

    return {
        "term_id": term_id,
        "name": name,
        "definition": definition,
        "exact_synonyms": synonym_data["exact_synonyms"],
        "narrow_synonyms": synonym_data["narrow_synonyms"],
        "broad_synonyms": synonym_data["broad_synonyms"],
        "related_synonyms": synonym_data["related_synonyms"],
        "all_synonyms": synonym_data["all_synonyms"],
        "cross_references": xrefs,
        "namespace": namespace,
        "searchable_text": searchable_text,
        "is_obsolete": _is_obsolete(node),
    }


def parse_ontology_json(doc: dict, id_format: dict | None = None) -> list[dict]:
    """Whole-document parse (reference: app/go_parser.py:144-162).

    Reads only ``graphs[0].nodes``; keeps nodes having both ``lbl`` and
    ``id``.  Used driver-side for small documents; the distributed path is
    :func:`parse_nodes_batch` over a Dataset of node rows.
    """
    graphs = doc.get("graphs", []) if isinstance(doc, dict) else []
    if not graphs:
        return []
    nodes = graphs[0].get("nodes", []) or []
    parsed: list[dict] = []
    for node in nodes:
        if isinstance(node, dict) and "lbl" in node and "id" in node:
            term = parse_enhanced_term(node, id_format)
            if term is not None:
                parsed.append(term)
    return parsed


def parse_nodes_batch(batch: pa.Table, id_format: dict | None = None) -> pa.Table:
    """Vectorized Ray Data stage: Arrow batch of raw nodes → enriched terms.

    Input: one column ``node_json`` (string) holding one OBO node per row —
    the shape produced by :mod:`..sources.ontology_json`.  Output:
    :data:`TERM_SCHEMA`.  Dropped rows (missing id/lbl) simply don't appear,
    mirroring the reference filter at ``app/go_parser.py:157``.

    The per-node work is structural JSON traversal (no hot inner loop to
    vectorize further); Arrow in/out keeps the exchange zero-copy.
    """
    rows = [json.loads(s) for s in batch.column("node_json").to_pylist()]
    parsed = []
    for node in rows:
        if isinstance(node, dict) and "lbl" in node and "id" in node:
            term = parse_enhanced_term(node, id_format)
            if term is not None:
                parsed.append(term)
    if not parsed:
        return TERM_SCHEMA.empty_table()
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)
