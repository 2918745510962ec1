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
