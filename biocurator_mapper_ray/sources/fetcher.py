"""Pluggable streaming fetcher for ontology sources (S1/S2).

Reference parity: the streamed HTTP download with progress %, byte
counters and cooperative cancellation at
``/root/reference/app/main.py:172-229`` (8192-byte chunks,
``download_percentage`` / ``download_bytes`` / ``download_total_bytes``
progress fields, cancelled-status polling) and the simpler Streamlit
download at ``streamlit_app.py:13-78``.

The transport is a URL scheme: ``http(s)://`` and ``file://`` stream
through ``urllib.request`` (same chunked loop), bare paths stream from
the local filesystem.  This sandbox has no network, so HTTP is exercised
through ``file://`` URLs in tests — the chunk/progress/cancel mechanics
are identical for every scheme.

:func:`fetch_and_stage` composes the fetcher with
:func:`~biocurator_mapper_ray.sources.ontology_json.stage_snapshot`, so
a remote source lands in the same content-addressed snapshot store +
download-history manifest the rest of the engine reads.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

CHUNK_SIZE = 8192  # reference: iter_content(chunk_size=8192)


class FetchCancelled(RuntimeError):
    """Raised when the cancel callback reports True mid-stream."""


class ProgressRecorder:
    """In-memory progress store shaped like the reference's
    ``update_progress_store`` entries (status / percentage / message /
    download_* fields).  ``updates`` keeps the full sequence so callers
    (and tests) can observe monotonic progress."""

    def __init__(self):
        self.updates: list[dict] = []

    def __call__(self, status: str, percentage: int, message: str, **extra):
        self.updates.append(
            {"status": status, "percentage": percentage, "message": message, **extra}
        )

    @property
    def latest(self) -> dict:
        return self.updates[-1] if self.updates else {}


def _open_source(source: str):
    """→ (readable stream, total_bytes or 0 when unknown)."""
    if "://" in source:
        import urllib.request

        resp = urllib.request.urlopen(source)  # noqa: S310 — scheme chosen by caller
        length = resp.headers.get("Content-Length")
        total = int(length) if length else 0
        if not total and source.startswith("file://"):
            try:
                total = os.path.getsize(source[len("file://"):])
            except OSError:
                total = 0
        return resp, total
    f = open(source, "rb")
    return f, os.path.getsize(source)


def stream_fetch(
    source: str,
    dest_path: str,
    *,
    progress: Callable[..., None] | None = None,
    cancel: Callable[[], bool] | None = None,
    chunk_size: int = CHUNK_SIZE,
) -> int:
    """Stream ``source`` to ``dest_path`` in fixed-size chunks.

    * ``progress(status, percentage, message, download_percentage=,
      download_bytes=, download_total_bytes=)`` fires per chunk with the
      reference's field names; percentage maps download progress onto
      the 10–40 band exactly like ``app/main.py:201-206``.
    * ``cancel()`` is polled per chunk; a True return aborts the stream,
      removes the partial file and raises :class:`FetchCancelled`
      (reference: cancelled-status polling in the chunk loop).

    Returns the byte count written.
    """
    stream, total = _open_source(source)
    written = 0
    if progress:
        progress("downloading", 10, f"Starting download ({total // 1024 // 1024} MB)",
                 download_percentage=0, download_bytes=0, download_total_bytes=total)
    try:
        with open(dest_path, "wb") as out:
            while True:
                if cancel is not None and cancel():
                    raise FetchCancelled(f"fetch of {source} cancelled")
                chunk = stream.read(chunk_size)
                if not chunk:
                    break
                out.write(chunk)
                written += len(chunk)
                if progress and total > 0:
                    pct = int(written / total * 100)
                    progress(
                        "downloading", 10 + int(written / total * 30),
                        f"Downloaded {written // 1024 // 1024} MB of "
                        f"{total // 1024 // 1024} MB",
                        download_percentage=pct, download_bytes=written,
                        download_total_bytes=total,
                    )
    except FetchCancelled:
        if os.path.exists(dest_path):
            os.remove(dest_path)
        if progress:
            progress("cancelled", 0, "Download cancelled")
        raise
    finally:
        stream.close()
    if progress:
        progress("completed", 100, f"Download completed! File saved to {dest_path}")
    return written


def fetch_and_stage(
    source: str,
    store_root: str,
    *,
    progress: Callable[..., None] | None = None,
    cancel: Callable[[], bool] | None = None,
) -> tuple[str, str]:
    """Fetch a remote/local ontology JSON and stage it into the snapshot
    store: stream → temp file → content-addressed
    :func:`~biocurator_mapper_ray.sources.ontology_json.stage_snapshot`
    (which records the download-history manifest entry).

    Returns ``(staged_path, snapshot_hash)``."""
    from .ontology_json import stage_snapshot

    os.makedirs(store_root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".json", dir=store_root, prefix="_fetch_")
    os.close(fd)
    try:
        stream_fetch(source, tmp, progress=progress, cancel=cancel)
        return stage_snapshot(tmp, store_root)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
