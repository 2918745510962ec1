"""Data profiling: one streaming pass → per-column summary statistics.

No reference equivalent; the standard first-contact operator for a new
100-TB table (null density, value ranges) before any pipeline is
designed.  Plan shape: each batch reduces to ONE lean row per profiled
column (counts + typed extrema channels — an int64 pair for integer
columns, a string pair for string columns — so one partial schema fits
both), then a column-keyed groupby combines partials; the exchange is
columns × batches rows, corpus-size-free.

SQL-checkability: integer extrema stringify identically on both engines
(``CAST(min(col) AS VARCHAR)`` == ``str(int)``) and string extrema
compare under binary collation on both, so the profile of int/string
columns has an exact DuckDB oracle.  Float columns are profiled too but
excluded from the oracle query (VARCHAR float formatting diverges
between engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, *, columns: list[str]):
    """(column, n_rows, n_nulls, min_v, max_v) with extrema as strings
    (NULL-only columns → null extrema) — exact, one pass."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"column": [], "n_rows": [], "n_nulls": [],
               "min_i": [], "max_i": [], "min_s": [], "max_s": []}
        for c in columns:
            col = batch.column(c)
            out["column"].append(c)
            out["n_rows"].append(len(col))
            out["n_nulls"].append(col.null_count)
            mins = maxs = None
            mini = maxi = None
            if len(col) - col.null_count:
                mm = pc.min_max(col).as_py()
                if pa.types.is_integer(col.type):
                    mini, maxi = int(mm["min"]), int(mm["max"])
                else:
                    mins, maxs = str(mm["min"]), str(mm["max"])
            out["min_i"].append(mini)
            out["max_i"].append(maxi)
            out["min_s"].append(mins)
            out["max_s"].append(maxs)
        return pa.table({
            "column": pa.array(out["column"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_nulls": pa.array(out["n_nulls"], pa.int64()),
            "min_i": pa.array(out["min_i"], pa.int64()),
            "max_i": pa.array(out["max_i"], pa.int64()),
            "min_s": pa.array(out["min_s"], pa.string()),
            "max_s": pa.array(out["max_s"], pa.string()),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        min_i = g["min_i"].dropna()
        min_s = g["min_s"].dropna()
        if len(min_i):
            lo = str(int(min_i.min()))
            hi = str(int(g["max_i"].dropna().max()))
        elif len(min_s):
            lo = min_s.min()
            hi = g["max_s"].dropna().max()
        else:
            lo = hi = None
        return pd.DataFrame({
            "column": [g["column"].iloc[0]],
            "n_rows": [int(g["n_rows"].sum())],
            "n_nulls": [int(g["n_nulls"].sum())],
            "min_v": [lo],
            "max_v": [hi],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("column").map_groups(combine, batch_format="pandas"))
