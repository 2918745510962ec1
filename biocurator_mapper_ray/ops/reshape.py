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
