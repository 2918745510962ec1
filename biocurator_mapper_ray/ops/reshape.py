"""Reshape operators: pivot (long → wide conditional counts/sums).

No reference equivalent; the standard reporting reshape.  The wide
result is (distinct row-keys × distinct col-keys) cells — result-scale
by definition (a pivot with corpus-scale keys is a different query) —
so the plan is: one lean map-side partial aggregate, a small
groupby().sum() exchange, then a driver-side reshape of the ALREADY
AGGREGATED frame.  The corpus is never materialized.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pivot_counts(ds, *, row_key: str, col_key: str, values: list[str],
                 prefix: str = "n_"):
    """Row counts per (row_key, col_key), pivoted wide: one row per
    ``row_key``, one int64 column ``{prefix}{v}`` per value in
    ``values`` (a FIXED, caller-declared column set — the schema can't
    depend on the data at plan time; unseen values raise, missing cells
    are 0).

    Returns a pandas DataFrame sorted by ``row_key`` (the wide result
    is result-scale; callers needing a Dataset can ``from_pandas`` it).
    """
    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.select([row_key, col_key]).to_pandas()
              .value_counts([row_key, col_key]).reset_index(name="__c"))
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([row_key, col_key]).sum("__c").to_pandas())
    seen = set(agg[col_key].unique())
    unknown = seen - set(values)
    if unknown:
        raise ValueError(f"unseen {col_key} values: {sorted(unknown)}")
    wide = agg.pivot_table(index=row_key, columns=col_key,
                           values="sum(__c)", fill_value=0, aggfunc="sum")
    out = pd.DataFrame({row_key: wide.index})
    for v in values:
        out[f"{prefix}{v}"] = (
            wide[v].to_numpy() if v in wide.columns else 0
        )
        out[f"{prefix}{v}"] = out[f"{prefix}{v}"].astype("int64")
    return out.sort_values(row_key).reset_index(drop=True)


def grouped_count_distinct(ds, *, key: str, value: str):
    """Exact COUNT(DISTINCT value) per key — the standard cardinality
    aggregate (distinct users per segment, distinct domains per source).

    Scale shape: the map side reduces each batch to its DISTINCT
    (key, value) pairs — the exchange ships pair-cardinality, never row
    count — then ONE key-grouped exchange counts unique values per key
    vectorized (np.unique over the bucket's pairs).  A corpus-scale
    row stream with a bounded pair universe costs a bounded exchange;
    for UNbounded value universes at 100 TB, switch to the HLL register
    path (ops/sketch.py) and trade exactness for a constant-size state.
    """
    import numpy as np

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).group_by(
            [key, value]).aggregate([])

    def count_in_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n_distinct": [int(g[value].nunique())],
        })

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    # second map-side distinct across batch boundaries is free inside
    # the groupby; the exchange already carries only per-batch-distinct
    # pairs
    return pairs.groupby(key).map_groups(count_in_group,
                                         batch_format="pandas")


def explode_list(batch: pa.Table, *, column: str, out_value: str = "value",
                 out_pos: str = "pos") -> pa.Table:
    """Generic UNNEST: one output row per list element, all other
    columns repeated, plus the element's 1-based position — the
    long-form primitive under tokens/paragraphs/spans tables.

    Pure Arrow offsets arithmetic (values buffer reused zero-copy, other
    columns expanded with one ``take``); batch-local, no exchange — at
    any scale the cost is the output's own size.
    """
    import numpy as np
    import pyarrow.compute as pc

    col = batch.column(column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(col).fill_null(0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    total = int(counts.sum()) if len(counts) else 0
    # vectorized within-list ramp: global index minus each list's start
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    pos = (np.arange(total, dtype=np.int64) - starts + 1
           if total else np.zeros(0, dtype=np.int64))
    out = {}
    idx = pa.array(parents)
    for name in batch.schema.names:
        if name == column:
            continue
        out[name] = batch.column(name).take(idx)
    out[out_pos] = pa.array(pos.astype(np.int64))
    out[out_value] = pc.list_flatten(col)
    return pa.table(out)


def ordered_group_concat(ds, *, key: str, value: str, sep: str = ",",
                         buckets: int | None = None,
                         size_hint: int | None = None):
    """SQL ``string_agg(value, sep ORDER BY value)`` per key: one
    key-bucketed exchange (each key's rows co-locate), then a fully
    vectorized per-bucket rebuild — sort, group-boundary offsets, one
    ListArray + ``binary_join`` — no per-group Python.

    Output strings are key-group-sized by construction; a key whose
    concat would not fit a task does not fit the downstream consumer
    either (same contract as pivot's result-scale note)."""
    import numpy as np
    import pyarrow.compute as pc

    from biocurator_mapper_ray.functions.hashing import hash64_column
    from biocurator_mapper_ray.ops.join import derive_buckets

    if buckets is None:
        n = size_hint if size_hint is not None else ds.count()
        buckets = derive_buckets(n)

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(key))
        return pa.table({
            key: batch.column(key),
            value: pc.cast(batch.column(value), pa.string()),
            "__bucket": pa.array((h % np.uint64(buckets)).astype(np.int32)),
        })

    def concat_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([key, value], kind="mergesort")
        keys = g[key].to_numpy()
        first = np.concatenate([[True], keys[1:] != keys[:-1]])
        counts = np.diff(np.append(np.flatnonzero(first), len(keys)))
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        vals = pa.array(g[value].to_numpy(), pa.string())
        lst = (pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
               if offsets[-1] < 2**31 else
               pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                             vals))
        return pa.table({
            key: pa.array(keys[first]),
            "concat": pc.binary_join(lst, sep),
        })

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(concat_bucket, batch_format="pandas"))
