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
    if agg.empty:  # empty to_pandas drops columns — typed empty out
        return pd.DataFrame({row_key: pd.Series([], dtype=object),
                             **{f"{prefix}{v}": pd.Series([], dtype="int64")
                                for v in values}})
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


def pivot_sum(ds, *, row_key: str, col_key: str, value: str,
              values: list[str], cents: bool = True, prefix: str = "sum_"):
    """``value`` sums per (row_key, col_key), pivoted wide — the
    conditional-aggregation report (revenue per priority × status).
    Same fixed-schema contract as :func:`pivot_counts`; sums use the
    integer-cents convention so cells hash engine-independently.

    Scale shape: map-side per-batch (row, col) partial sums — the
    exchange ships cell-cardinality rows, never data rows — then a
    result-scale driver reshape."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value)
        if cents:
            v = pc.cast(pc.round(pc.multiply(v, 100.0), ndigits=0),
                        pa.int64())
        else:
            v = pc.cast(v, pa.int64())
        t = pa.table({row_key: batch.column(row_key),
                      col_key: batch.column(col_key), "__v": v})
        g = t.group_by([row_key, col_key],
                       use_threads=False).aggregate([("__v", "sum")])
        return g.rename_columns([row_key, col_key, "__v"])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby([row_key, col_key]).sum("__v").to_pandas())
    if agg.empty:  # empty to_pandas drops columns — typed empty out
        return pd.DataFrame({row_key: pd.Series([], dtype=object),
                             **{f"{prefix}{v}": pd.Series([], dtype="int64")
                                for v in values}})
    seen = set(agg[col_key].unique())
    unknown = seen - set(values)
    if unknown:
        raise ValueError(f"unseen {col_key} values: {sorted(unknown)}")
    wide = agg.pivot_table(index=row_key, columns=col_key,
                           values="sum(__v)", fill_value=0, aggfunc="sum")
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


def grouped_mode(ds, *, key: str, value: str, buckets: int | None = None,
                 size_hint: int | None = None):
    """Deterministic MODE per key: the most frequent ``value``, ties
    broken by the SMALLEST value — exactly SQL's
    ``row_number() OVER (PARTITION BY key ORDER BY count(*) DESC, value)
    = 1`` (DuckDB's bare ``mode()`` is tie-nondeterministic, so the
    pinned tiebreak IS the contract).

    Scale shape (same as :func:`grouped_count_distinct`): the map side
    reduces each batch to its (key, value, count) triples — the
    exchange ships pair-cardinality, never row count — then ONE
    key-bucketed exchange merges the partial counts and takes each
    key's argmax vectorized (sort + head(1) per key, no per-group
    Python).  Returns (key, mode_value, mode_count:int64).
    """
    from biocurator_mapper_ray.functions.hashing import hash64_column
    from biocurator_mapper_ray.ops.join import derive_buckets

    if buckets is None:
        n = size_hint if size_hint is not None else ds.count()
        buckets = derive_buckets(n)

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.select([key, value]).to_pandas()
              .value_counts([key, value]).reset_index(name="__c"))
        t = pa.Table.from_pandas(df, preserve_index=False)
        import numpy as np

        h = hash64_column(t.column(key))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def mode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = (g.groupby([key, value], sort=False)["__c"].sum().reset_index()
             .sort_values([key, "__c", value],
                          ascending=[True, False, True], kind="mergesort"))
        first = m.groupby(key, sort=False).head(1)
        return pd.DataFrame({
            key: first[key].to_numpy(),
            "mode_value": first[value].to_numpy(),
            "mode_count": first["__c"].to_numpy().astype("int64"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(mode_bucket, batch_format="pandas"))


def rollup_sum(ds, *, keys: list[str], value: str, cents: bool = True,
               sum_name: str = "sum_cents", count_name: str = "n_rows"):
    """SQL ``GROUP BY ROLLUP(k1, k2, …)`` in ONE corpus pass: sums and
    counts at every key-prefix granularity, coarser levels NULL-filling
    the trailing keys (the (k1,), () subtotal rows a reporting rollup
    emits).

    Monetary convention (``cents=True``): the value is rounded to
    integer cents per ROW before summation — float64 sums are
    summation-order-dependent across engines at ULP level
    (``pricing_summary`` note); integer sums are exact.

    Scale shape: one map-side partial aggregate at the FINEST level
    (the only pass over the corpus), a small multi-key groupby exchange
    to finalize it, then every coarser level is re-aggregated from the
    finest RESULT-SCALE frame on the driver (distinct key combos ×
    levels rows — a rollup whose finest level is corpus-scale is a
    different query, same contract as :func:`pivot_counts`).
    Returns a pandas DataFrame sorted by ``keys`` (NULLs last).
    """
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value)
        if cents:
            v = pc.cast(pc.round(pc.multiply(v, 100.0), ndigits=0),
                        pa.int64())
        else:
            v = pc.cast(v, pa.int64())
        t = pa.table({**{k: batch.column(k) for k in keys}, "__v": v})
        g = t.group_by(keys, use_threads=False).aggregate(
            [("__v", "sum"), ("__v", "count")])
        return g.rename_columns(keys + ["__s", "__c"])

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys).sum(["__s", "__c"]).to_pandas()
              .rename(columns={"sum(__s)": sum_name, "sum(__c)": count_name}))
    if finest.empty:  # empty to_pandas drops columns — typed empty out
        return pd.DataFrame({**{k: pd.Series([], dtype=object)
                                for k in keys},
                             sum_name: pd.Series([], dtype="int64"),
                             count_name: pd.Series([], dtype="int64")})

    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            lvl = (finest.groupby(kept, sort=False)[[sum_name, count_name]]
                   .sum().reset_index())
        else:
            lvl = pd.DataFrame({sum_name: [finest[sum_name].sum()],
                                count_name: [finest[count_name].sum()]})
        for k in keys[depth:]:
            lvl[k] = None
        levels.append(lvl[keys + [sum_name, count_name]])

    out = pd.concat(levels, ignore_index=True)
    out[sum_name] = out[sum_name].astype("int64")
    out[count_name] = out[count_name].astype("int64")
    return (out.sort_values(keys, na_position="last", kind="mergesort")
            .reset_index(drop=True))


def cube_sum(ds, *, keys: list[str], value: str, cents: bool = True,
             sum_name: str = "sum_cents", count_name: str = "n_rows"):
    """SQL ``GROUP BY CUBE(k1, k2, …)`` in ONE corpus pass: sums and
    counts at EVERY subset of the keys (2^len(keys) granularities),
    unused keys NULL-filled — :func:`rollup_sum`'s prefix levels plus
    the cross-cut subtotals a rollup cannot express (e.g. per-status
    totals across all priorities).

    Same scale contract as rollup_sum: the corpus is read once at the
    finest level; every coarser cut re-aggregates the RESULT-scale
    finest frame on the driver (distinct combos × 2^k rows).  The key
    count is caller-bounded (2^k cuts) — practical cubes are 2–4 keys.
    Returns a pandas DataFrame sorted by ``keys`` (NULLs last).
    """
    import itertools

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value)
        if cents:
            v = pc.cast(pc.round(pc.multiply(v, 100.0), ndigits=0),
                        pa.int64())
        else:
            v = pc.cast(v, pa.int64())
        t = pa.table({**{k: batch.column(k) for k in keys}, "__v": v})
        g = t.group_by(keys, use_threads=False).aggregate(
            [("__v", "sum"), ("__v", "count")])
        return g.rename_columns(keys + ["__s", "__c"])

    finest = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(keys).sum(["__s", "__c"]).to_pandas()
              .rename(columns={"sum(__s)": sum_name,
                               "sum(__c)": count_name}))
    if finest.empty:  # empty to_pandas drops columns — typed empty out
        return pd.DataFrame({**{k: pd.Series([], dtype=object)
                                for k in keys},
                             sum_name: pd.Series([], dtype="int64"),
                             count_name: pd.Series([], dtype="int64")})

    cuts = []
    for r in range(len(keys), -1, -1):
        for kept in itertools.combinations(keys, r):
            if r == len(keys):
                lvl = finest.copy()
            elif kept:
                lvl = (finest.groupby(list(kept), sort=False)
                       [[sum_name, count_name]].sum().reset_index())
            else:
                lvl = pd.DataFrame({
                    sum_name: [finest[sum_name].sum()],
                    count_name: [finest[count_name].sum()]})
            for k in keys:
                if k not in kept:
                    lvl[k] = None
            cuts.append(lvl[keys + [sum_name, count_name]])

    out = pd.concat(cuts, ignore_index=True)
    out[sum_name] = out[sum_name].astype("int64")
    out[count_name] = out[count_name].astype("int64")
    return (out.sort_values(keys, na_position="last", kind="mergesort")
            .reset_index(drop=True))


def unpivot(ds, *, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable", value_name: str = "value"):
    """Wide→long melt (SQL UNPIVOT / pandas ``melt``): each input row
    becomes one row per entry of ``value_cols``, tagged with the source
    column name.  Pure map-side — NO exchange; the id columns of the
    per-variable slices share the batch's Arrow buffers, so the only
    new allocation is the constant variable-name column and the value
    cast.  Values are cast to float64 (the common wide-measure case);
    mixed-type melts should cast upstream.
    """
    import pyarrow.compute as pc

    def melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        parts = []
        for vc in value_cols:
            cols = {c: batch.column(c) for c in id_cols}
            cols[var_name] = pa.nulls(n, pa.string()).fill_null(vc)
            cols[value_name] = pc.cast(batch.column(vc), pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")
