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
