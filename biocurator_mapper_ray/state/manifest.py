"""Run manifests and atomic registry flips.

Reimplements the reference's JSON registry semantics
(``/root/reference/app/config_updater.py``):

* atomic writes: temp file + ``os.replace`` (``:21-75``);
* the registry pointer flip that makes a new collection live
  (``update_ontology_version``, ``:84-93``) becomes
  :meth:`Manifest.flip_snapshot`;
* history capped at the last 10 records per key (``:160-184``);
* stage checkpointing: a stage directory keyed by
  ``(snapshot_hash, extractor_version)`` with a ``_SUCCESS`` marker is
  skippable on resume (A3 version-compare semantics,
  ``app/ontology_version_manager.py:149-183``).
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime, timezone

HISTORY_CAP = 10


def _atomic_write_json(path: str, data) -> None:
    """temp file + os.replace (config_updater.py:21-75 contract)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _read_json(path: str, default):
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return default


class Manifest:
    """Per-pipeline-run registry under ``root/manifest.json``."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "manifest.json")

    def read(self) -> dict:
        return _read_json(self.path, {"current": None, "history": []})

    def current_snapshot(self) -> str | None:
        cur = self.read().get("current")
        return cur.get("snapshot_hash") if cur else None

    def flip_snapshot(self, snapshot_hash: str, extra: dict | None = None) -> None:
        """Atomic pointer swap + history append (capped at 10)."""
        data = self.read()
        record = {
            "snapshot_hash": snapshot_hash,
            "stored_at": datetime.now(timezone.utc).isoformat(),
            **(extra or {}),
        }
        data["current"] = record
        data["history"] = (data.get("history", []) + [record])[-HISTORY_CAP:]
        _atomic_write_json(self.path, data)

    def latest_available(self, exists=os.path.exists) -> dict | None:
        """Reverse-scan history for the first record whose artifact exists
        (config_updater.py:249-262 semantics)."""
        for record in reversed(self.read().get("history", [])):
            index_dir = record.get("index_dir")
            if index_dir and exists(os.path.join(index_dir, "_SUCCESS")):
                return record
        return None

    def verify_history(self, exists=os.path.exists) -> list[dict]:
        """Stamp availability status per record
        (config_updater.py:202-247 semantics)."""
        data = self.read()
        now = datetime.now(timezone.utc).isoformat()
        for record in data.get("history", []):
            index_dir = record.get("index_dir", "")
            ok = bool(index_dir) and exists(os.path.join(index_dir, "_SUCCESS"))
            record["status"] = "available" if ok else "file_missing"
            record["last_verified"] = now
        _atomic_write_json(self.path, data)
        return data.get("history", [])


def stage_dir(root: str, stage: str, snapshot_hash: str, extractor_version: str) -> str:
    """Deterministic stage-output directory; resume = skip when _SUCCESS
    exists for the same (snapshot, extractor-version) identity."""
    return os.path.join(root, stage, f"{snapshot_hash}__{extractor_version}")


def stage_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def mark_stage_complete(path: str, info: dict | None = None) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        json.dump(info or {}, f)
