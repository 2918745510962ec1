"""Ontology snapshot identity & skip-if-same semantics.

Reimplements the reference's version manager
(``/root/reference/app/ontology_version_manager.py``):

* :func:`compute_version_hash` — SHA-256 over a canonical JSON of
  ``{version_date, version_url, nodes_count, graph_id}`` truncated to 16 hex
  chars (``:67-84``).  Deliberately NOT a full-content hash, matching the
  reference.
* :func:`extract_version_info` — graph ``meta.basicPropertyValues``:
  ``owl#versionInfo`` → version_date, ``hasOBOFormatVersion`` →
  format_version, plus graph id and node count (``:31-65``).
* :func:`needs_update` — equal hash → skip re-embedding (``:149-183``);
  the pipelines use this as the stage-checkpoint key (see state/manifest.py).
"""

from __future__ import annotations

import hashlib
import json

_VERSION_INFO_PRED_SUFFIX = "versionInfo"
_FORMAT_VERSION_PRED_SUFFIX = "hasOBOFormatVersion"


def extract_version_info(doc: dict) -> dict:
    """Pull version metadata out of an OBO graph document."""
    graphs = doc.get("graphs", []) if isinstance(doc, dict) else []
    graph = graphs[0] if graphs else {}
    meta = graph.get("meta", {}) or {}

    version_date = ""
    format_version = ""
    for prop in meta.get("basicPropertyValues", []) or []:
        if not isinstance(prop, dict):
            continue
        pred = prop.get("pred", "") or ""
        if pred.endswith(_VERSION_INFO_PRED_SUFFIX):
            version_date = prop.get("val", "")
        elif pred.endswith(_FORMAT_VERSION_PRED_SUFFIX):
            format_version = prop.get("val", "")

    return {
        "version_date": version_date,
        "version_url": meta.get("version", ""),
        "format_version": format_version,
        "graph_id": graph.get("id", ""),
        "nodes_count": len(graph.get("nodes", []) or []),
    }


def compute_version_hash(version_info: dict) -> str:
    """16-hex snapshot hash (ontology_version_manager.py:67-84 recipe)."""
    identity = {
        "version_date": version_info.get("version_date", ""),
        "version_url": version_info.get("version_url", ""),
        "nodes_count": version_info.get("nodes_count", 0),
        "graph_id": version_info.get("graph_id", ""),
    }
    blob = json.dumps(identity, sort_keys=True).encode("utf-8")
    return hashlib.sha256(blob).hexdigest()[:16]


def snapshot_hash(doc: dict) -> str:
    return compute_version_hash(extract_version_info(doc))


def needs_update(stored_hash: str | None, new_hash: str) -> bool:
    """True when re-processing is required (version-compare semantics,
    ontology_version_manager.py:149-183: equal hash → 'using cached data')."""
    return stored_hash is None or stored_hash != new_hash
