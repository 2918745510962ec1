"""Checkpoint-resumable flagship runs.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics".  The unit of resume is an INPUT SHARD — a
conv-id-hash bucket (the same bucket stamped into every triple's
``input_shard`` lineage column).  Each shard is one bounded Ray Data
pipeline whose output lands in ``out_root/shard=NNN/`` with a
``_SUCCESS`` marker carrying its metrics; a re-run skips completed
shards (mirrors the reference's version-hash skip + registry-pointer
semantics, ``app/ontology_version_manager.py:149-183`` /
``app/config_updater.py:84-93``).

Shard identity is ``(snapshot_hash, extractor_version, shard)`` — any
change to the ontology snapshot or extractor invalidates all markers.

Scale note: each shard pass filters the full input by conv-hash (the
filter is vectorized and cheap relative to linking, but it does re-read
the input per shard).  On a production layout the input is already
partitioned by conv-hash directory, so the filter becomes a path prune;
``num_shards`` here is the resume granularity knob, not a parallelism
limit — within a shard the pipeline uses the whole cluster.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

from .. import EXTRACTOR_VERSION
from ..functions.hashing import hash64_column
from .kg import N_INPUT_SHARDS, extract_triples


def _shard_filter(batch: pa.Table, shard: int, num_shards: int) -> pa.Table:
    h = hash64_column(batch.column("conv_id")) % N_INPUT_SHARDS
    # resume shards group the lineage buckets evenly
    mask = (h % np.uint64(num_shards)) == shard
    return batch.filter(pa.array(mask))


def shard_marker(out_root: str, shard: int) -> str:
    return os.path.join(out_root, f"shard={shard:03d}", "_SUCCESS")


def run_resumable(
    transcripts,
    terms: pa.Table,
    out_root: str,
    *,
    snapshot_hash: str,
    num_shards: int = 8,
    force: bool = False,
    **extract_kwargs,
) -> dict:
    """Run the flagship pipeline shard-by-shard with skip-if-complete.

    ``transcripts`` is a zero-arg factory returning a fresh Dataset (a
    Dataset cannot be consumed twice), e.g.
    ``lambda: ray.data.read_parquet(path)``.  Returns the run summary
    (per-shard metrics + skip/compute decisions), also persisted to
    ``out_root/run_manifest.json``.
    """
    identity = {
        "snapshot_hash": snapshot_hash,
        "extractor_version": EXTRACTOR_VERSION,
        "num_shards": num_shards,
    }
    shards = []
    for shard in range(num_shards):
        marker = shard_marker(out_root, shard)
        shard_dir = os.path.dirname(marker)
        if not force and os.path.exists(marker):
            with open(marker) as f:
                existing = json.load(f)
            if existing.get("identity") == identity:
                shards.append({"shard": shard, "status": "skipped", **existing["metrics"]})
                continue
        t0 = time.time()
        ds = transcripts()
        sub = ds.map_batches(
            lambda b, s=shard: _shard_filter(b, s, num_shards), batch_format="pyarrow"
        )
        triples = extract_triples(sub, terms, snapshot_hash=snapshot_hash,
                                  **extract_kwargs)
        # clear any partial/stale output — write_parquet appends part files
        import shutil

        shutil.rmtree(shard_dir, ignore_errors=True)
        os.makedirs(shard_dir, exist_ok=True)
        triples.write_parquet(shard_dir)
        elapsed = time.time() - t0
        import pyarrow.dataset as pads

        n_triples = pads.dataset(shard_dir, format="parquet").count_rows()
        metrics = {
            "n_triples": int(n_triples),
            "elapsed_sec": round(elapsed, 3),
        }
        with open(marker, "w") as f:
            json.dump({"identity": identity, "metrics": metrics}, f)
        shards.append({"shard": shard, "status": "computed", **metrics})

    summary = {"identity": identity, "shards": shards,
               "computed": sum(1 for s in shards if s["status"] == "computed"),
               "skipped": sum(1 for s in shards if s["status"] == "skipped")}
    with open(os.path.join(out_root, "_run_manifest.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def _settle_fsspec_http_probe() -> None:
    """Ray probes ``fsspec.implementations.http`` on every datasource /
    datasink construction; with aiohttp absent the import fails, and
    CONCURRENT probes (shard pipelines in driver threads) can observe
    the partially-initialized module and raise a plain ImportError that
    Ray only guards as ModuleNotFoundError.  Seed a benign stub once so
    every probe succeeds deterministically (the stub class is never
    instantiated; Ray's isinstance check correctly reports False for
    local filesystems)."""
    import sys
    import types

    if "fsspec.implementations.http" in sys.modules:
        return
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        stub = types.ModuleType("fsspec.implementations.http")

        class _NoHTTPFileSystem:
            pass

        stub.HTTPFileSystem = _NoHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = stub


def run_sharded_files(
    files: list[str],
    terms: pa.Table,
    out_root: str,
    *,
    snapshot_hash: str,
    num_shards: int = 4,
    in_flight: int = 2,
    force: bool = False,
    blocks_per_shard: int | None = None,
    columns: list[str] | None = ("conv_id", "turn_idx", "text"),
    **extract_kwargs,
) -> dict:
    """File-partitioned resumable run with OVERLAPPED shard pipelines.

    The input parquet files are split round-robin into ``num_shards``
    shards; each shard runs the flagship pipeline end-to-end (read →
    link pool → canonicalize exchange → ``out_root/shard=NNN/`` +
    ``_SUCCESS`` marker), and up to ``in_flight`` shard pipelines run
    concurrently from driver threads.  Overlap is the point: a single
    monolithic run leaves cores idle in its post-barrier tail (sort
    reduce + canonicalize + write after the last link task — measured
    ~40% of wall time at 16 CPUs on the 64M-turn corpus); with two
    shards in flight, one shard's tail executes under another shard's
    link compute, so the cluster stays busy end-to-end.  Size the link
    pool as total_actors / in_flight per shard.

    Partitioning assumption (SURVEY §2 custom-operator rule): every
    conversation's rows live in ONE input file (conv-contiguous or
    conv-hash-partitioned layout — the engine's own corpus/writers
    guarantee this), so shards are semantically independent and their
    outputs union to exactly the monolithic result.

    Resume contract matches :func:`run_resumable`: identity is
    ``(snapshot_hash, extractor_version, num_shards)`` plus this
    shard's file list; completed shards are skipped.
    """
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    _settle_fsspec_http_probe()

    identity = {
        "snapshot_hash": snapshot_hash,
        "extractor_version": EXTRACTOR_VERSION,
        "num_shards": num_shards,
    }
    shard_files = [sorted(files)[i::num_shards] for i in range(num_shards)]

    def run_shard(shard: int) -> dict:
        import shutil

        import pyarrow.dataset as pads

        marker = shard_marker(out_root, shard)
        shard_dir = os.path.dirname(marker)
        shard_identity = {**identity, "files": shard_files[shard]}
        if not force and os.path.exists(marker):
            with open(marker) as f:
                existing = json.load(f)
            if existing.get("identity") == shard_identity:
                return {"shard": shard, "status": "skipped", **existing["metrics"]}
        t0 = time.time()
        reader_kwargs = {}
        if blocks_per_shard:
            reader_kwargs["override_num_blocks"] = blocks_per_shard
        if columns is not None:
            # prune at the read: the fused link stage consumes exactly
            # (conv_id, turn_idx, text) — role/tool/ts never need to
            # leave storage or transit the object store
            reader_kwargs["columns"] = list(columns)
        ds = rd.read_parquet(shard_files[shard], **reader_kwargs)
        triples = extract_triples(ds, terms, snapshot_hash=snapshot_hash,
                                  **extract_kwargs)
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.makedirs(shard_dir, exist_ok=True)
        triples.write_parquet(shard_dir)
        metrics = {
            "n_triples": int(pads.dataset(shard_dir, format="parquet").count_rows()),
            "elapsed_sec": round(time.time() - t0, 3),
        }
        with open(marker, "w") as f:
            json.dump({"identity": shard_identity, "metrics": metrics}, f)
        return {"shard": shard, "status": "computed", **metrics}

    with ThreadPoolExecutor(max_workers=max(1, in_flight)) as ex:
        shards = list(ex.map(run_shard, range(num_shards)))

    summary = {"identity": identity, "shards": shards,
               "computed": sum(1 for s in shards if s["status"] == "computed"),
               "skipped": sum(1 for s in shards if s["status"] == "skipped")}
    with open(os.path.join(out_root, "_run_manifest.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
