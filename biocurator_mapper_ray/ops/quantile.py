"""Exact distributed order statistics over an integer column.

Two-pass histogram refinement — the classic distributed-selection
algorithm: pass 1 counts values by COARSE bucket (a distributive
groupby whose result is bounded by the bucket count, ~2^16, never by
rows); the driver folds the bucket CDF to locate each quantile's
bucket; pass 2 counts exact values inside only the needed buckets
(bounded by those buckets' distinct values).  Driver-side data is
bucket-scale at every step, so the op holds at any corpus size, and
the answers are EXACT — rank = ceil(q·n), matching DuckDB's
``quantile_disc`` (verified empirically), which gives it an exact SQL
oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def exact_quantiles(ds, column: str, qs: list[float], *,
                    coarse_bits: int = 16) -> pd.DataFrame:
    """→ DataFrame (q float64, value int64): the exact ceil(q·n)-th
    smallest value of ``column`` (int64) for each q.

    Three bounded executions: min/max aggregate, coarse-bucket count
    exchange, needed-bucket value-count exchange.
    """
    # pass 0: (lo, hi, n) folded from one row per batch — a single
    # execution instead of three Aggregate ops
    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy()
        if not len(v):
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(v.min())]),
                         "hi": pa.array([int(v.max())]),
                         "n": pa.array([len(v)])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=np.int64)})
    lo, hi, n = int(mm["lo"].min()), int(mm["hi"].max()), int(mm["n"].sum())
    span = hi - lo
    shift = max(0, span.bit_length() - coarse_bits)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy().astype(np.int64)
        b = (v - lo) >> shift
        uniq, counts = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uniq),
                         "cnt": pa.array(counts.astype(np.int64)),
                         "__s": pa.array((uniq % 16).astype(np.int32))})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        # salt-shard combine: one task per shard, vectorized within — a
        # per-bucket-key groupby would pay per-group task overhead for
        # up to 2^coarse_bits singleton groups
        return (
            group.drop(columns="__s")
            .groupby("bucket", sort=True)["cnt"].sum().reset_index()
        )

    hist = (
        ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()  # ≤ 2^coarse_bits rows — bucket-scale, not row-scale
        .sort_values("bucket")
    )
    buckets = hist["bucket"].to_numpy()
    cum = hist["cnt"].to_numpy().cumsum()

    # locate each rank's bucket and its within-bucket residual rank
    ranks = [min(n, max(1, int(np.ceil(q * n)))) for q in qs]
    need: dict[int, list[tuple[float, int]]] = {}
    for q, k in zip(qs, ranks):
        i = int(np.searchsorted(cum, k, side="left"))
        below = int(cum[i - 1]) if i else 0
        need.setdefault(int(buckets[i]), []).append((q, k - below))

    needed = set(need)

    def value_counts(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy().astype(np.int64)
        b = (v - lo) >> shift
        mask = np.isin(b, list(needed))
        uniq, counts = np.unique(v[mask], return_counts=True)
        return pa.table({"value": pa.array(uniq),
                         "cnt": pa.array(counts.astype(np.int64)),
                         "__s": pa.array((uniq % 16).astype(np.int32))})

    def combine_v(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.drop(columns="__s")
            .groupby("value", sort=True)["cnt"].sum().reset_index()
        )

    fine = (
        ds.map_batches(value_counts, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(combine_v, batch_format="pandas")
        .to_pandas()  # distinct values inside the needed buckets only
        .sort_values("value")
    )
    out_q, out_v = [], []
    fv = fine["value"].to_numpy()
    fb = (fv - lo) >> shift
    fc = fine["cnt"].to_numpy()
    for bucket, wants in need.items():
        sel = fb == bucket
        vals, counts = fv[sel], fc[sel].cumsum()
        for q, resid in wants:
            j = int(np.searchsorted(counts, resid, side="left"))
            out_q.append(q)
            out_v.append(int(vals[j]))
    return (
        pd.DataFrame({"q": np.asarray(out_q, dtype=np.float64),
                      "value": np.asarray(out_v, dtype=np.int64)})
        .sort_values("q")
        .reset_index(drop=True)
    )
