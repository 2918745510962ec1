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
import pyarrow.compute as pc


def grouped_exact_quantiles(ds, column: str, group_col: str, qs: list[float], *,
                            coarse_bits: int = 16) -> pd.DataFrame:
    """Exact per-group quantiles → DataFrame (group, q, value), the
    grouped form of :func:`exact_quantiles` with the same two-pass
    histogram refinement, every exchange keyed by (group, bucket).

    Scale contract: driver-side state is groups × needed-buckets (the
    RESULT is per-group scalars, so group cardinality is driver-bounded
    by definition); row-scale data never leaves the cluster.  Bucketing
    uses one global [lo, hi) span — per-group spans would save refine
    work only when group ranges are disjoint.
    """
    def minmax(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        g = df.groupby(group_col, sort=False)[column].agg(["min", "max", "count"])
        g = g.reset_index()
        g.columns = [group_col, "lo", "hi", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=np.int64)})
    per_group = mm.groupby(group_col).agg(
        lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
    )
    lo = int(per_group["lo"].min())
    span = int(per_group["hi"].max()) - lo
    shift = max(0, span.bit_length() - coarse_bits)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        df["bucket"] = (df[column].to_numpy().astype(np.int64) - lo) >> shift
        g = df.groupby([group_col, "bucket"], sort=False).size().reset_index(name="cnt")
        salt = (g["bucket"].to_numpy() % 16).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).append_column(
            "__s", pa.array(salt))

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.drop(columns="__s")
            .groupby([group_col, "bucket"], sort=True)["cnt"].sum().reset_index()
        )

    hist = (
        ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("__s").map_groups(combine, batch_format="pandas")
        .to_pandas()  # ≤ groups × 2^coarse_bits rows
        .sort_values([group_col, "bucket"])
    )

    # per-group CDF → (group, bucket) → [(q, residual rank)]
    need: dict[tuple, list[tuple[float, int]]] = {}
    for grp, gh in hist.groupby(group_col, sort=False):
        n = int(per_group.loc[grp, "n"])
        buckets = gh["bucket"].to_numpy()
        cum = gh["cnt"].to_numpy().cumsum()
        for q in qs:
            k = min(n, max(1, int(np.ceil(q * n))))
            i = int(np.searchsorted(cum, k, side="left"))
            below = int(cum[i - 1]) if i else 0
            need.setdefault((grp, int(buckets[i])), []).append((q, k - below))

    needed_buckets = {b for (_, b) in need}

    def value_counts(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        v = df[column].to_numpy().astype(np.int64)
        b = (v - lo) >> shift
        mask = np.isin(b, list(needed_buckets))
        df = df[mask]
        g = df.groupby([group_col, column], sort=False).size().reset_index(name="cnt")
        salt = (g[column].to_numpy() % 16).astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False).append_column(
            "__s", pa.array(salt))

    def combine_v(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.drop(columns="__s")
            .groupby([group_col, column], sort=True)["cnt"].sum().reset_index()
        )

    fine = (
        ds.map_batches(value_counts, batch_format="pyarrow")
        .groupby("__s").map_groups(combine_v, batch_format="pandas")
        .to_pandas()
        .sort_values([group_col, column])
    )
    out_g, out_q, out_v = [], [], []
    for grp, gf in fine.groupby(group_col, sort=False):
        fv = gf[column].to_numpy()
        fb = (fv - lo) >> shift
        fc = gf["cnt"].to_numpy()
        for (g2, bucket), wants in need.items():
            if g2 != grp:
                continue
            sel = fb == bucket
            vals, counts = fv[sel], fc[sel].cumsum()
            for q, resid in wants:
                j = int(np.searchsorted(counts, resid, side="left"))
                out_g.append(grp)
                out_q.append(q)
                out_v.append(int(vals[j]))
    return (
        pd.DataFrame({group_col: out_g,
                      "q": np.asarray(out_q, dtype=np.float64),
                      "value": np.asarray(out_v, dtype=np.int64)})
        .sort_values([group_col, "q"])
        .reset_index(drop=True)
    )


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


def filter_by_quantile(ds, column: str, *, lo_q: float = 0.05,
                       hi_q: float = 0.95, coarse_bits: int = 16):
    """Keep rows whose ``column`` lies inside the EXACT [lo_q, hi_q]
    quantile band — the length/outlier trim every curation pipeline
    applies ("drop the shortest 5% and longest 5%"), composed from
    :func:`exact_quantiles` (driver state: two ints) + a map-side
    vectorized filter.  Inclusive on both thresholds, matching DuckDB's
    ``BETWEEN quantile_disc(lo_q) AND quantile_disc(hi_q)``.
    """
    qdf = exact_quantiles(ds, column, [lo_q, hi_q], coarse_bits=coarse_bits)
    if qdf.empty:
        return ds
    lo_v = int(qdf["value"].iloc[0])
    hi_v = int(qdf["value"].iloc[-1])

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(column)
        mask = pc.and_(pc.greater_equal(v, lo_v), pc.less_equal(v, hi_v))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
