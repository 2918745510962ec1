"""Poison-row isolation for per-batch transforms.

Generalizes the reference's parse-error contract (R4: malformed nodes
drop with a counter, ``app/ontology_data_manager.py`` parse loop) to ANY
batch transform: at 100-TB scale a handful of undecodable rows must not
kill a week-long job, and silently dropping whole BATCHES loses five
orders of magnitude more data than the rows at fault.

:func:`resilient_map_batches` wraps a per-batch function with recursive
bisection: a failing batch splits in half and each half retries, so N
poison rows in a B-row batch cost O(N·log B) extra calls while every
healthy row still flows through the normal vectorized path.  Poison
rows are QUARANTINED — emitted on a side dataset with the error text —
never silently dropped, mirroring the engine's error-row convention
(stages/link.py LINK_SCHEMA.error).
"""

from __future__ import annotations

import pyarrow as pa

QUARANTINE_ERROR_COL = "__error"


def _apply_bisect(fn, batch: pa.Table, good: list[pa.Table],
                  bad: list[pa.Table]) -> None:
    try:
        good.append(fn(batch))
        return
    except Exception as exc:  # noqa: BLE001 — quarantine decides
        if len(batch) <= 1:
            bad.append(batch.append_column(
                QUARANTINE_ERROR_COL,
                pa.array([f"{type(exc).__name__}: {exc}"[:500]]
                         * len(batch), pa.string())))
            return
    mid = len(batch) // 2
    _apply_bisect(fn, batch.slice(0, mid), good, bad)
    _apply_bisect(fn, batch.slice(mid), good, bad)


def resilient_map_batches(ds, fn, *, quarantine: str | None = None,
                          batch_format: str = "pyarrow", **map_kw):
    """``ds.map_batches(fn)`` that survives poison rows: failing batches
    bisect down to the offending row(s), which land — with the error
    message — in parquet under ``quarantine`` (one file per task,
    resumable-output contract) instead of failing the job or vanishing.
    Healthy rows pay nothing; a poison row costs O(log B) retries of
    ever-smaller slices.

    The output dataset contains ``fn``'s results for every non-poison
    row.  Read the quarantine directory afterwards for the error table
    (empty directory = clean run).  ``fn`` must be side-effect-free on
    failure (it may be re-invoked on sub-slices).
    """
    import os
    import uuid

    if quarantine is not None:
        os.makedirs(quarantine, exist_ok=True)

    def run(batch: pa.Table) -> pa.Table:
        good: list[pa.Table] = []
        bad: list[pa.Table] = []
        _apply_bisect(fn, batch, good, bad)
        if bad and quarantine is not None:
            import pyarrow.parquet as pq

            qt = pa.concat_tables(bad, promote_options="default")
            pq.write_table(
                qt, os.path.join(quarantine,
                                 f"quarantine-{uuid.uuid4().hex}.parquet"))
        good = [g for g in good if len(g)]
        if not good:
            # schema-preserving empty: probe fn on a 0-row slice
            return fn(batch.slice(0, 0))
        return pa.concat_tables(good, promote_options="default")

    return ds.map_batches(run, batch_format=batch_format, **map_kw)
