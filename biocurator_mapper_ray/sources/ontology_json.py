"""Ontology document staging & node source.

Replaces the reference's download/admin flow
(``app/main.py:105-265`` streamed HTTP download with progress,
``streamlit_app.py:13-78`` simple download + latest-pointer,
``app/main.py:500-510`` whole-file JSON load):

* :func:`stage_snapshot` — copy a local ontology JSON into the snapshot
  store under its content identity (``<root>/<snapshot_hash>.json``) and
  record it in the download-history manifest (capped at 10, reference
  ``app/config_updater.py:160-184``).  Network fetch is out of scope in
  this environment; a URL fetcher plugs in by writing to the same store.
* :func:`load_document` — parse a staged snapshot (small-side data;
  loaded driver-side exactly like the reference's ``json.loads``).
* :func:`nodes_dataset` — document → Ray Dataset of ``node_json`` rows
  (graphs[0] only, reference ``app/go_parser.py:149-153``), the input to
  the distributed parse stage.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

from ..ontology.versioning import extract_version_info, compute_version_hash
from ..state.manifest import _atomic_write_json, _read_json

HISTORY_CAP = 10


def load_document(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def stage_snapshot(src_path: str, store_root: str) -> tuple[str, str]:
    """Stage an ontology JSON file into the snapshot store.

    Returns ``(staged_path, snapshot_hash)``.  Re-staging the same
    snapshot is a no-op (hash identity, reference skip-if-same).
    History records mirror the reference's download-history shape
    (filename / timestamp / size_mb / status).
    """
    doc = load_document(src_path)
    snap = compute_version_hash(extract_version_info(doc))
    os.makedirs(store_root, exist_ok=True)
    staged = os.path.join(store_root, f"{snap}.json")
    if not os.path.exists(staged):
        shutil.copyfile(src_path, staged)

    history_path = os.path.join(store_root, "_download_history.json")
    history = _read_json(history_path, [])
    if not any(r.get("snapshot_hash") == snap for r in history):
        history.append(
            {
                "filename": os.path.basename(staged),
                "snapshot_hash": snap,
                "timestamp": datetime.now(timezone.utc).isoformat(),
                "size_mb": round(os.path.getsize(staged) / 1e6, 3),
                "status": "available",
            }
        )
        _atomic_write_json(history_path, history[-HISTORY_CAP:])
    return staged, snap


def latest_available(store_root: str) -> dict | None:
    """Reverse-scan history for the newest record whose file exists
    (reference semantics, app/config_updater.py:249-262)."""
    history = _read_json(os.path.join(store_root, "_download_history.json"), [])
    for record in reversed(history):
        if os.path.exists(os.path.join(store_root, record.get("filename", ""))):
            return record
    return None


def nodes_dataset(doc: dict, parallelism: int = 8):
    """Document → Dataset of one ``node_json`` row per OBO node."""
    import ray.data as rd

    graphs = doc.get("graphs", []) if isinstance(doc, dict) else []
    nodes = (graphs[0].get("nodes", []) or []) if graphs else []
    items = [{"node_json": json.dumps(n)} for n in nodes]
    blocks = max(1, min(parallelism, max(1, len(items) // 64)))
    return rd.from_items(items, override_num_blocks=blocks)
