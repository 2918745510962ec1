"""Text-format sources/sinks: JSONL and CSV, plain or gzip.

Reference parity: the reference engine reads its ontology snapshots as
one JSON document (`sources/ontology_json.py`); bulk corpora in the
wild arrive as JSON-Lines and CSV, usually gzipped per shard.  These
wrappers put a stable, projection-aware face on Ray Data's native
readers so pipelines can swap parquet <-> jsonl <-> csv without
touching operator code:

- column projection is applied IN the reader where the format supports
  pushdown (CSV via ``pyarrow.csv.ConvertOptions.include_columns``),
  else immediately after as a ``select_columns`` so downstream stages
  never see dropped fields;
- gzip is auto-detected from the ``.gz`` suffix; a mixed list of plain
  and gzipped shards is split into one read per compression mode and
  unioned (Arrow's open-stream compression is per-read, not per-file),
  each mode decompressing streaming in its read tasks;
- writers shard output one file per block (resumable-output contract:
  a partial run leaves complete files that a re-run can skip).

JSONL/CSV shards should be sized like parquet row-groups (tens to
hundreds of MB): a single giant .gz file is ONE task (gzip is not
splittable) — at 100 TB ship many shards, not one archive.
"""

from __future__ import annotations

import ray.data as rd


def _split_by_compression(paths) -> list[tuple[list[str], str | None]]:
    """[(paths, compression)] groups — one Ray read per group."""
    ps = [paths] if isinstance(paths, str) else list(paths)
    gz = [p for p in ps if str(p).endswith(".gz")]
    plain = [p for p in ps if not str(p).endswith(".gz")]
    groups: list[tuple[list[str], str | None]] = []
    if plain:
        groups.append((plain, None))
    if gz:
        groups.append((gz, "gzip"))
    return groups


def _read_grouped(read_one, paths):
    parts = [
        read_one(group,
                 {"compression": comp} if comp else None)
        for group, comp in _split_by_compression(paths)
    ]
    if not parts:
        raise ValueError("no input paths")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def read_jsonl(paths, *, columns: list[str] | None = None, **kwargs):
    """JSON-Lines → Dataset.  ``columns`` projects immediately after
    parse (json has no byte-range pushdown); ``.gz`` inputs decompress
    streaming in the read tasks, and plain/gz shards may be mixed."""

    def read_one(group, open_args):
        return rd.read_json(
            group,
            arrow_open_stream_args=open_args,
            file_extensions=None,  # accept .jsonl/.json/.gz alike
            **kwargs,
        )

    ds = _read_grouped(read_one, paths)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv(paths, *, columns: list[str] | None = None, **kwargs):
    """CSV → Dataset with column projection pushed into the Arrow
    reader (unprojected columns are never materialized); plain/gz
    shards may be mixed."""
    from pyarrow import csv as pacsv

    if columns and "convert_options" not in kwargs:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            include_columns=columns)

    def read_one(group, open_args):
        return rd.read_csv(
            group,
            arrow_open_stream_args=open_args,
            file_extensions=None,
            **kwargs,
        )

    return _read_grouped(read_one, paths)


def write_jsonl(ds, path: str, **kwargs) -> None:
    """Dataset → JSON-Lines directory, one file per block (resumable
    sharded layout, same contract as the parquet sinks)."""
    ds.write_json(path, **kwargs)


def write_csv(ds, path: str, **kwargs) -> None:
    """Dataset → CSV directory, one file per block."""
    ds.write_csv(path, **kwargs)


def write_parquet_partitioned(ds, path: str, *, by: list[str], **kwargs) -> None:
    """Dataset → hive-partitioned parquet (``path/col=value/…``), one
    directory per key combination.  This is the resumable-output layout
    the 100-TB contract asks for: a failed run leaves whole partitions
    complete, a re-run skips them, and any downstream read that knows
    its keys prunes to the matching directories without touching the
    rest (see :func:`read_parquet_partition` and the IVF probed-cell
    read in ops/similarity.py, which uses the same layout)."""
    ds.write_parquet(path, partition_cols=by, **kwargs)


def read_parquet_partition(path: str, *, partitions: dict,
                           columns: list[str] | None = None, **kwargs):
    """Read ONLY the hive partitions matching ``partitions`` (a
    {col: value} dict in the same order the data was partitioned by) —
    unmatched partitions never leave storage.  Values are URL-quoted
    the way the Arrow writer encodes them."""
    import os
    from urllib.parse import quote

    sub = path
    for k, v in partitions.items():
        sub = os.path.join(sub, f"{k}={quote(str(v))}")
    return rd.read_parquet(sub, columns=columns, **kwargs)


def read_orc(paths, *, columns: list[str] | None = None,
             rows_per_read_hint: int | None = None):
    """ORC source (Ray 2.49 has no native ``read_orc``): distribute the
    file list and decode each file inside its read task with
    ``pyarrow.orc`` — column projection pushed into the ORC reader
    (stripes for unprojected columns are never decoded).  One task per
    file, so shard ORC like parquet row-groups; a directory is expanded
    to its ``.orc`` members."""
    import os

    import pyarrow as pa

    if isinstance(paths, str):
        paths = [paths]
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".orc")))
        else:
            expanded.append(p)

    def decode(batch: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        tbls = [_orc.read_table(p, columns=columns)
                for p in batch.column("path").to_pylist()]
        return pa.concat_tables(tbls) if tbls else pa.table({})

    files = rd.from_items([{"path": p} for p in expanded])
    # one decode task per file: override_num_blocks on the items source
    return files.repartition(max(1, len(expanded))).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def write_orc(ds, path: str) -> None:
    """ORC sink: one ``.orc`` file per block (the resumable-output
    contract of the JSONL/CSV writers), encoded with ``pyarrow.orc``
    inside each task — block data never passes through the driver."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)

    def dump(batch: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        if len(batch):
            name = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
            _orc.write_table(batch, name)
        return pa.table({"rows": pa.array([len(batch)], pa.int64())})

    # consume: per-block side-effect tasks, driver sees only row counts
    ds.map_batches(dump, batch_format="pyarrow",
                   batch_size=None).materialize()


def union_by_name(*datasets, strict: bool = False):
    """Union Datasets whose schemas differ in column ORDER or PRESENCE
    (SQL ``UNION ALL BY NAME``) — the shard-harmonizer for corpora
    collected over time where later shards grew columns.

    Each input is aligned map-side to the union of all column names
    (missing columns null-filled with the type observed on the side
    that has them; same-named columns must agree on type).  With
    ``strict=True`` a missing column raises instead of null-filling.
    Pure map work — no exchange; blocks stream straight through.
    """
    import pyarrow as pa

    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    schemas = [ds.schema() for ds in datasets]
    types: dict[str, pa.DataType] = {}
    order: list[str] = []
    for sch in schemas:
        for name, typ in zip(sch.names, sch.types):
            if name not in types:
                types[name] = typ
                order.append(name)
            elif types[name] != typ:
                raise ValueError(
                    f"union_by_name: column {name!r} has conflicting "
                    f"types {types[name]} vs {typ}")
    if strict:
        for sch in schemas:
            missing = set(order) - set(sch.names)
            if missing:
                raise ValueError(
                    f"union_by_name(strict): missing columns {sorted(missing)}")

    def align(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in order:
            if name in batch.schema.names:
                cols[name] = batch.column(name)
            else:
                cols[name] = pa.nulls(len(batch), types[name])
        return pa.table(cols)

    aligned = [ds.map_batches(align, batch_format="pyarrow")
               for ds in datasets]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
