"""Windowed / ordered aggregates over keyed streams.

Ray Data has no event-time windows; per the engine's streaming-shaped
design (SURVEY §4), the input is treated as an ordered, key-partitioned
log.  All per-key operators here use the BUCKET-THEN-VECTORIZE pattern
(the same one measured ~3.5 ms/group cheaper than per-key map_groups in
stages/canonicalize.py): keys are hashed into a bounded number of salt
buckets, ONE map_groups task per bucket sorts its rows by (key, ts,
tiebreak) and computes every key's window with vectorized pandas
``groupby(...).cumsum/diff/rolling`` — per-key framework tasks never
exist, so millions of small keys cost what one sort per bucket costs.

Ordering assumption: the stated sort key makes results deterministic;
the tie-break column must be unique per key (e.g. event_id).
Partitioning assumption (SURVEY §2 custom-operator rule): one key's
rows fit in one bucket task; buckets spread keys, not rows, so skewed
single keys bound task memory by that key's row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import derive_buckets


def _window_buckets(ds, buckets, size_hint) -> int:
    """Resolve the per-key bucket count: explicit wins; else size_hint;
    else ``ds.count()`` (metadata-free on reads, an extra execution on
    lazy transformed inputs — hot-path callers pass ``size_hint`` from
    the raw read's metadata count)."""
    if buckets is not None:
        return buckets
    return derive_buckets(size_hint if size_hint is not None else ds.count())


def _with_key_bucket(ds, key: str, buckets: int):
    """Append __kb = hash(key) % buckets (Arrow batch path)."""
    import pyarrow as pa

    from ..functions.hashing import hash64_column

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(key))
        return batch.append_column(
            "__kb", pa.array((h % np.uint64(buckets)).astype(np.int32))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _per_bucket(fn):
    """Wrap a bucket-frame transform: drop the bucket tag, skip empties."""

    def run(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__kb")
        if group.empty:
            return group
        return fn(group)

    return run


_TUMBLING_MERGE = {"size": "sum", "count": "sum", "sum": "sum",
                   "min": "min", "max": "max"}


def tumbling_window(ds, *, key: str, ts: str, freq: str, agg: dict,
                    partials_only: bool = False,
                    buckets: int | None = None,
                    size_hint: int | None = None):
    """Fixed windows per key: ``agg`` like {"n": ("value", "size"), ...}.

    Two-level: vectorized in-batch partial aggregation (map_batches),
    then one salted (key, window)-bucket exchange that merges the
    partials into FINAL per-(key, window) rows — so the helper alone
    returns finished windows.  ``partials_only=True`` skips the merge
    and returns the raw per-batch partials (the escape hatch for fused
    query paths like __ray_entry__.hourly_events that fold the merge
    into their own downstream exchange).  Aggregations must be
    partial-mergeable (size/count/sum/min/max); mean etc. need a
    sum+count decomposition by the caller.
    """
    import pyarrow as pa

    from ..functions.hashing import hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__w"] = df[ts].dt.floor(freq)
        g = df.groupby([key, "__w"], sort=False).agg(**agg).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if partials_only:
        return partials

    bad = [fn for (_, fn) in agg.values() if fn not in _TUMBLING_MERGE]
    if bad:
        raise ValueError(
            f"tumbling_window cannot merge partials for {bad}; use "
            "partials_only=True and combine downstream, or decompose "
            "(e.g. mean -> sum + size)")
    merge_agg = {name: (name, _TUMBLING_MERGE[fn])
                 for name, (_, fn) in agg.items()}
    n_buckets = _window_buckets(ds, buckets, size_hint)

    def tag(batch: pa.Table) -> pa.Table:
        hk = hash64_column(batch.column(key))
        hw = hash64_column(batch.column("__w").cast(pa.int64()))
        h = ((hk << np.uint64(13)) | (hk >> np.uint64(51))) ^ hw
        return batch.append_column(
            "__kb", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__kb")
        return g.groupby([key, "__w"], sort=False).agg(**merge_agg).reset_index()

    return (partials.map_batches(tag, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(combine, batch_format="pandas"))


def session_windows(ds, *, key: str, ts: str, tiebreak: str, gap: pd.Timedelta,
                    buckets: int | None = None, size_hint: int | None = None):
    """Session assignment per key: rows sorted by (ts, tiebreak); a gap
    > ``gap`` starts a new session.  Emits the input plus ``session_id``
    (0-based per key) — the general form of the n_sessions count query."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak]).copy()
        gaps = g.groupby(key, sort=False)[ts].diff()
        new = gaps > gap
        g["session_id"] = new.groupby(g[key], sort=False).cumsum().astype(np.int32)
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def running_aggregate(ds, *, key: str, ts: str, tiebreak: str,
                      value: str, out: str = "running_sum",
                      buckets: int | None = None, size_hint: int | None = None):
    """Cumulative sum of ``value`` per key in (ts, tiebreak) order."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak]).copy()
        g[out] = g.groupby(key, sort=False)[value].cumsum()
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def rolling_time_aggregate(ds, *, key: str, ts: str, tiebreak: str,
                           value: str, window: str = "1h",
                           out: str = "rolling_sum",
                           buckets: int | None = None,
                           size_hint: int | None = None):
    """Trailing time-window sum per key: for each row, the sum of
    ``value`` over this key's rows with ``ts`` in ``[row.ts - window,
    row.ts]`` (both ends inclusive — SQL ``RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW`` semantics; with ts ties the SQL RANGE
    frame sees all peer rows, so ``ts`` must be unique per key — the
    stated corpus invariant)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak]).copy()
        rolled = (
            g.groupby(key, sort=False)
            .rolling(window, on=ts, closed="both")[value]
            .sum()
        )
        g[out] = rolled.to_numpy().astype(g[value].dtype)
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def lag_lead(ds, *, key: str, order_by: list[str], value: str, n: int = 1,
             buckets: int | None = None, size_hint: int | None = None):
    """SQL ``LAG(value, n)`` / ``LEAD(value, n)`` per key: the input plus
    ``lag_{value}`` and ``lead_{value}`` columns (null at the partition
    edges) — the delta/feature-shift primitive of event pipelines.

    Same bucket-then-vectorize shape as the sibling windows: one
    key-bucketed exchange (every row of a key co-locates), then a
    per-bucket pandas sort and two C-level ``groupby(...).shift`` calls
    — no per-key Python."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, *order_by], kind="mergesort")
        grp = g.groupby(key, sort=False)[value]
        lag, lead = grp.shift(n), grp.shift(-n)
        if pd.api.types.is_integer_dtype(g[value]):
            # keep SQL's BIGINT-with-NULL semantics: a plain shift of an
            # int column silently floats it (NaN), which hash-mismatches
            # an integer oracle
            lag, lead = lag.astype("Int64"), lead.astype("Int64")
        g[f"lag_{value}"] = lag
        g[f"lead_{value}"] = lead
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def grouped_first_last(ds, *, key: str, order_by: list[str], value: str,
                       buckets: int | None = None,
                       size_hint: int | None = None):
    """Per-key FIRST_VALUE / LAST_VALUE in a total (order_by) order plus
    the row count — "first and last event per user" analytics — as
    (key, first_{value}, last_{value}, n) rows.

    Scale shape: each batch reduces to ONE candidate row per key it saw
    (lexicographic first and last by ``order_by`` + a partial count),
    so the exchange is keys×batches lean rows, never row-scale; the
    key-bucketed combine replays the same sort over candidates only."""

    def partial(batch):
        import pyarrow as pa

        df = batch.to_pandas().sort_values([key, *order_by],
                                           kind="mergesort")
        f = df.drop_duplicates(key, keep="first")
        l = df.drop_duplicates(key, keep="last")
        n = df.groupby(key, sort=False).size().reset_index(name="__n")
        out = f[[key, *order_by, value]].rename(
            columns={value: "__fv", **{c: f"__f_{c}" for c in order_by}})
        out = out.merge(
            l[[key, *order_by, value]].rename(
                columns={value: "__lv",
                         **{c: f"__l_{c}" for c in order_by}}),
            on=key).merge(n, on=key)
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        f_cols = [f"__f_{c}" for c in order_by]
        l_cols = [f"__l_{c}" for c in order_by]
        f = (g.sort_values([key, *f_cols], kind="mergesort")
             .drop_duplicates(key, keep="first")[[key, "__fv"]])
        l = (g.sort_values([key, *l_cols], kind="mergesort")
             .drop_duplicates(key, keep="last")[[key, "__lv"]])
        n = g.groupby(key, sort=False)["__n"].sum().reset_index()
        out = f.merge(l, on=key).merge(n, on=key)
        return out.rename(columns={"__fv": f"first_{value}",
                                   "__lv": f"last_{value}",
                                   "__n": "n"})

    n_buckets = _window_buckets(ds, buckets, size_hint)
    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(  # key-bucket the lean candidate rows
                lambda t, b=n_buckets: _with_key_bucket_table(t, key, b),
                batch_format="pyarrow")
            .groupby("__kb").map_groups(_per_bucket(combine),
                                        batch_format="pandas"))


def _with_key_bucket_table(batch, key: str, buckets: int):
    """Arrow-table form of :func:`_with_key_bucket`'s tag step."""
    import pyarrow as pa

    from ..functions.hashing import hash64_column

    h = hash64_column(batch.column(key))
    return batch.append_column(
        "__kb", pa.array((h % np.uint64(buckets)).astype(np.int32)))


def cumulative_new_keys(ds, *, key: str, ts: str, unit: str = "day"):
    """First-seen analysis: per period (``floor_temporal(ts, unit)``),
    how many keys appear for the FIRST time, and the running distinct-
    key total — the "cumulative unique users by day" growth curve that
    plain per-period aggregates cannot express (a key active in many
    periods must count once, at its first).

    ONE corpus pass reduces each batch to its distinct (key, period)
    pairs (pair-cardinality exchange, never row count); the lean pair
    table is materialized once and consumed twice — ``groupby(key).min``
    for first-seen periods, ``groupby(period)`` for the period
    universe — then the two RESULT-SCALE frames (periods × 1 rows)
    merge on the driver with a cumulative sum.  Periods with no new
    keys still appear (new_keys = 0, flat curve).

    Returns a pandas DataFrame (period, new_keys:int64, cum_keys:int64)
    sorted by period.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch.column(ts), unit=unit)
        t = pa.table({key: batch.column(key), "period": d})
        return t.group_by([key, "period"], use_threads=False).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow").materialize()

    # (key → first period) stays distributed (distinct-key-scale); only
    # the per-period COUNT of first-seen keys reaches the driver
    new_per = (pairs.groupby(key).min("period")
               .groupby("min(period)").count().to_pandas()
               .rename(columns={"min(period)": "period",
                                "count()": "new_keys"}))
    periods = (pairs.groupby("period").count().to_pandas()[["period"]]
               .drop_duplicates())

    out = periods.merge(new_per, on="period", how="left").fillna({"new_keys": 0})
    out = out.sort_values("period").reset_index(drop=True)
    out["new_keys"] = out["new_keys"].astype("int64")
    out["cum_keys"] = out["new_keys"].cumsum().astype("int64")
    return out


def debounce(ds, *, key: str, ts: str, tiebreak: str,
             min_gap: pd.Timedelta, buckets: int | None = None,
             size_hint: int | None = None):
    """Per-key event throttle: keep a row only when at least ``min_gap``
    has passed since the key's PREVIOUS event (in (ts, tiebreak) order)
    — the repeated-fire suppressor for noisy emitters (duplicate
    webhooks, retry storms, double-clicks).  A key's first event always
    survives.

    Gap semantics are LAG-based (vs the previous event, kept or not) —
    exactly SQL's ``lag(ts) OVER (PARTITION BY key ORDER BY ts,
    tiebreak) IS NULL OR ts - lag > gap``, which keeps the op one
    vectorized shift; suppress-until-quiet (vs the previous KEPT event)
    is a sequential per-key scan — a different, rarely-needed op.

    Same bucket-then-vectorize shape as :func:`lag_lead`.
    """
    gap_us = np.int64(min_gap // pd.Timedelta(microseconds=1))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak], kind="mergesort")
        prev = g.groupby(key, sort=False)[ts].shift(1)
        delta = (g[ts] - prev).dt.total_seconds() * 1e6
        keep = prev.isna() | (delta > float(gap_us))
        return g[keep.to_numpy()]

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def keep_best_per_key(ds, *, key: str, score: str, tiebreak: str,
                      ascending: bool = False,
                      buckets: int | None = None,
                      size_hint: int | None = None):
    """Keep exactly ONE row per key: the one with the best ``score``
    (max by default; ``ascending=True`` keeps the min) — the
    "keep the highest-quality duplicate" curation primitive (dedup
    groups, per-user best order, per-domain canonical page).  Ties
    break on the smallest ``tiebreak``, making the winner total and
    deterministic (SQL ``row_number() OVER (PARTITION BY key ORDER BY
    score [DESC], tiebreak) = 1``).

    Scale shape: each batch first reduces to one candidate row per key
    it saw (the combiner), so the exchange ships keys×batches rows with
    ALL their columns — never the full row-scale input; the key-bucketed
    combine replays the same argmax over candidates only."""

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, score, tiebreak],
                            ascending=[True, ascending, True],
                            kind="mergesort")
        return df.drop_duplicates(key, keep="first")

    def partial(batch):
        import pyarrow as pa

        return pa.Table.from_pandas(best(batch.to_pandas()),
                                    preserve_index=False)

    n_buckets = _window_buckets(ds, buckets, size_hint)
    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(
                lambda t, b=n_buckets: _with_key_bucket_table(t, key, b),
                batch_format="pyarrow")
            .groupby("__kb").map_groups(_per_bucket(best),
                                        batch_format="pandas"))


def rolling_rows_aggregate(ds, *, key: str, ts: str, tiebreak: str,
                           value: str, k: int, out: str = "rolling_sum",
                           cents: bool = True,
                           buckets: int | None = None,
                           size_hint: int | None = None):
    """Trailing ROWS-frame sum per key: for each row (in (ts, tiebreak)
    order within its key) the sum of ``value`` over the last ``k``
    preceding rows plus the current one — SQL ``SUM(...) OVER
    (PARTITION BY key ORDER BY ts, tiebreak ROWS BETWEEN k PRECEDING
    AND CURRENT ROW)``.

    Exactness: values are cents-quantized to int64 and the window sum
    is computed as a cumsum DIFFERENCE (cs[i] − cs[i−k−1]) — exact
    integer arithmetic, then ONE float64 division back to units, so the
    floats hash bit-equal to the SQL mirror (pandas' own
    ``rolling(k).sum`` accumulates floats and would not)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak], kind="mergesort").copy()
        if cents:
            v = np.round(g[value].to_numpy(dtype=np.float64) * 100.0)
            v = v.astype(np.int64)
        else:
            v = g[value].to_numpy(dtype=np.int64)
        cs = np.cumsum(v)
        # reset at key boundaries: rebase each key's frame on its own
        # prefix (positions within key < k+1 use the key-local cumsum)
        pos = g.groupby(key, sort=False).cumcount().to_numpy()
        starts = np.flatnonzero(pos == 0)
        key_base = np.zeros(len(g), dtype=np.int64)
        if len(starts):
            base_vals = np.concatenate([[0], cs[starts[1:] - 1]]) \
                if len(starts) > 1 else np.array([0], dtype=np.int64)
            key_base = np.repeat(base_vals,
                                 np.diff(np.append(starts, len(g))))
        local_cs = cs - key_base
        win = local_cs.copy()
        far = pos > k
        win[far] = local_cs[far] - (local_cs[np.flatnonzero(far) - (k + 1)])
        g[out] = win / 100.0 if cents else win
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def resample_fill(ds, *, ts: str, unit: str = "hour",
                  value: str | None = None):
    """Global gap-filled time series: one row per ``unit`` period
    between the corpus min and max timestamp, with the period's row
    count (and sum of ``value`` if given) — zero rows for empty periods
    (the monitoring/throughput view a plain groupby cannot give you,
    because it drops silent periods).

    Scale shape: map-side per-batch period partials (periods×batches
    lean rows), one period-scale exchange, then a RESULT-scale driver
    gap fill (the period axis is bounded by the corpus timespan, not by
    rows).  Count is exact int; sum is exact int cents divided back
    once (bit-equal to the SQL mirror).
    """
    import pyarrow as pa

    freq = {"hour": "h", "day": "D", "minute": "min"}[unit]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__p"] = df[ts].dt.floor(freq)
        if value is not None:
            df["__v"] = np.round(
                df[value].to_numpy(dtype=np.float64) * 100.0
            ).astype(np.int64)
            g = df.groupby("__p", sort=False).agg(
                n=("__p", "size"), __s=("__v", "sum")).reset_index()
        else:
            g = df.groupby("__p", sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = {"n": ("n", "sum")}
    if value is not None:
        agg["__s"] = ("__s", "sum")
    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__p")
              .map_groups(lambda g: g.groupby("__p", sort=False)
                          .agg(**agg).reset_index(),
                          batch_format="pandas")
              .to_pandas())
    if merged.empty:
        cols = {"period": pd.Series([], dtype="datetime64[us]"),
                "n": pd.Series([], dtype=np.int64)}
        if value is not None:
            cols[f"sum_{value}"] = pd.Series([], dtype=np.float64)
        return pd.DataFrame(cols)
    full = pd.DataFrame({"period": pd.date_range(
        merged["__p"].min(), merged["__p"].max(), freq=freq)})
    out = full.merge(merged.rename(columns={"__p": "period"}),
                     on="period", how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    if value is not None:
        out[f"sum_{value}"] = out["__s"].fillna(0).astype(np.int64) / 100.0
        out = out.drop(columns="__s")
    return out


def forward_fill(ds, *, key: str, ts: str, tiebreak: str, value: str,
                 out: str | None = None,
                 buckets: int | None = None,
                 size_hint: int | None = None):
    """Per-key last-observation-carried-forward: in (ts, tiebreak)
    order within each key, a NULL ``value`` takes the most recent
    non-NULL value of the same key (rows before the key's first
    observation stay NULL) — SQL ``last_value(value IGNORE NULLS) OVER
    (PARTITION BY key ORDER BY ts, tiebreak)``.

    Pure value COPYING (no arithmetic), so any dtype hashes exactly.
    Same bucket-then-vectorize contract as the other keyed windows:
    one salted key-bucket exchange, pandas C-level groupby ffill per
    bucket."""
    out = out if out is not None else f"{value}_ff"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak], kind="mergesort").copy()
        g[out] = g.groupby(key, sort=False)[value].ffill()
        return g

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def max_streak(ds, *, key: str, ts: str, unit: str = "day"):
    """Longest run of CONSECUTIVE active periods per key (the
    gaps-and-islands problem: "longest daily-activity streak per
    user").  Returns (key, n_periods:int64, max_streak:int64).

    Scale shape: each batch reduces to its DISTINCT (key, period)
    pairs map-side (periods×keys exchange, never row-scale); the
    key-bucketed finish sorts a key's periods once and finds islands
    vectorized — ``period − rank(period)`` is constant within an
    island (the classic trick), sized with one groupby size.
    """
    import pyarrow as pa

    freq = {"day": "D", "hour": "h", "week": "W"}[unit]
    np_unit = {"day": "D", "hour": "h", "week": "W"}[unit]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__p"] = df[ts].dt.floor(freq)
        out = df[[key, "__p"]].drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key, "__p"]) \
             .sort_values([key, "__p"], kind="mergesort")
        pos = g.groupby(key, sort=False).cumcount().to_numpy()
        # unit-count since epoch, independent of the column's storage
        # resolution (pandas 2 round-trips timestamps as datetime64[us];
        # a raw int64 view would be unit-dependent)
        pnum = g["__p"].to_numpy().astype(
            f"datetime64[{np_unit}]").astype(np.int64)
        island = pnum - pos  # constant within a consecutive run
        runs = (pd.DataFrame({key: g[key].to_numpy(), "__i": island})
                .groupby([key, "__i"], sort=False).size()
                .reset_index(name="__len"))
        out = runs.groupby(key, sort=False)["__len"].max() \
                  .reset_index(name="max_streak")
        n = g.groupby(key, sort=False).size().reset_index(name="n_periods")
        return n.merge(out, on=key)

    from ..functions.hashing import hash64_column  # noqa: F401 (doc)

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    n_buckets = _window_buckets(ds, None, None)
    return (_with_key_bucket(pairs, key, n_buckets)
            .groupby("__kb").map_groups(_per_bucket(finish),
                                        batch_format="pandas"))


def rolling_distinct(ds, *, key: str, ts: str, window: int,
                     unit: str = "day"):
    """Per period: COUNT(DISTINCT key) over the TRAILING ``window``
    periods (inclusive) — the rolling 7-day-active-users metric that a
    plain per-period distinct cannot express and a naive range
    self-join makes quadratic.

    Exact via the cover trick: a key active in period p is active in
    every rolling window ending at p..p+window−1, so each distinct
    (key, period) pair EXPLODES to the ``window`` periods it covers and
    the rolling distinct becomes a plain per-period distinct of the
    covered pairs.  One corpus pass reduces batches to distinct pairs
    (pair-cardinality exchange), the cover multiplies that by
    ``window`` (lean 2-column rows), and one groupby(period) counts
    uniques inside each period group — per-group memory is
    window-active-key scale, the documented partitioning assumption.
    Trailing periods with no direct activity still appear while a key's
    window covers them.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    secs_per = {"day": 86_400, "hour": 3_600}[unit]
    unit_scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch.column(ts), unit=unit)
        t = pa.table({key: batch.column(key), "period": d})
        return t.group_by([key, "period"], use_threads=False).aggregate([])

    def cover(batch: pa.Table) -> pa.Table:
        ptype = batch.schema.field("period").type
        if len(batch) == 0:
            return batch
        ticks = batch.column("period").cast(pa.int64()).to_numpy()
        k = batch.column(key).to_numpy(zero_copy_only=False)
        per = secs_per * unit_scale[ptype.unit]  # ticks per period
        off = np.arange(window, dtype=np.int64) * per
        covered = (ticks[:, None] + off[None, :]).reshape(-1)
        t = pa.table({key: pa.array(np.repeat(k, window)),
                      "period": pa.array(covered).cast(ptype)})
        return t.group_by([key, "period"], use_threads=False).aggregate([])

    covered = (ds.map_batches(distinct_pairs, batch_format="pyarrow")
                 .map_batches(cover, batch_format="pyarrow"))

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"period": [g["period"].iloc[0]],
                             "n_active": np.array([g[key].nunique()],
                                                  dtype=np.int64)})

    return covered.groupby("period").map_groups(count_distinct,
                                                batch_format="pandas")


def interarrival_stats(ds, *, key: str, ts: str, tiebreak: str,
                       label: str, buckets: int | None = None,
                       size_hint: int | None = None):
    """Per-label inter-arrival cadence evidence: for every ``label``
    value, integer ``(n, sum_us, min_us, max_us)`` over the gaps (µs)
    between each event and the SAME key's previous event, the gap
    attributed to the LATTER event's label — the event-cadence profile
    ("how long after the previous user action does a purchase come"),
    with mean gap as the reader-side ratio.  Exact integers ⇒ hashes
    identically to the SQL ``lag() OVER (PARTITION BY key)`` oracle.

    One key-hash exchange of lean (key, ts, tiebreak, label) rows;
    per-bucket vectorized sort + shifted diff, pre-aggregated per label
    before a label-scale final fold.
    """
    n_buckets = _window_buckets(ds, buckets, size_hint)

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key), ts: batch.column(ts),
                      tiebreak: batch.column(tiebreak),
                      label: batch.column(label)})
        from ..functions.hashing import hash64_column
        h = hash64_column(t.column(key))
        return t.append_column(
            "__kb", pa.array((h % np.uint64(n_buckets)).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({label: pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "sum_us": pa.array([], pa.int64()),
                          "min_us": pa.array([], pa.int64()),
                          "max_us": pa.array([], pa.int64())})
        g = g.sort_values([key, ts, tiebreak], kind="mergesort")
        k = g[key].to_numpy()
        same = k[:-1] == k[1:]
        if not same.any():
            return empty
        t_us = g[ts].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap = (t_us[1:] - t_us[:-1])[same]
        lab = g[label].to_numpy()[1:][same]
        agg = (pd.DataFrame({label: lab, "gap": gap})
               .groupby(label)["gap"]
               .agg(n="count", sum_us="sum", min_us="min", max_us="max")
               .reset_index())
        return pa.table({
            label: pa.array(agg[label], pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
            "sum_us": pa.array(agg["sum_us"].to_numpy(np.int64)),
            "min_us": pa.array(agg["min_us"].to_numpy(np.int64)),
            "max_us": pa.array(agg["max_us"].to_numpy(np.int64))})

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__kb").map_groups(
                 lambda g: per_bucket(g.drop(columns="__kb")),
                 batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(label, as_index=False, sort=True)
                .agg(n=("n", "sum"), sum_us=("sum_us", "sum"),
                     min_us=("min_us", "min"), max_us=("max_us", "max")))

    return parts.groupby(label).map_groups(fold, batch_format="pandas")

def merge_intervals(ds, *, key: str, start: str, end: str,
                    buckets: int | None = None,
                    size_hint: int | None = None):
    """Gaps-and-islands: merge overlapping-or-touching ``[start, end]``
    intervals per key into maximal covered spans — the "total active
    time from overlapping sessions" / "coalesce retry windows" op.
    Emits one row per island: ``(key, start, end, n_rows)`` where
    start/end are the island's extent and ``n_rows`` the number of
    input intervals it absorbed.  Touching intervals
    (``next.start == prev.end``) merge; a strict gap splits.

    Classic SQL islands semantics (``max(end) OVER (... 1 PRECEDING)``
    vs the current start), computed bucket-then-vectorized: one
    hash(key) exchange of lean (key, start, end) rows, then per bucket a
    single sort + grouped cummax/shift/cumsum — no per-key tasks, no
    driver collection.  One key's intervals live in one bucket task
    (buckets spread keys, not rows).
    """
    n_buckets = _window_buckets(ds, buckets, size_hint)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, start, end], kind="mergesort")
        cm = g.groupby(key, sort=False)[end].cummax()
        prev = cm.groupby(g[key], sort=False).shift(1)
        new = prev.isna() | (g[start] > prev)
        island = new.cumsum()  # global cumsum is fine: keys are contiguous
        out = (g.groupby([key, island], sort=False)
               .agg(**{start: (start, "min"), end: (end, "max"),
                       "n_rows": (start, "size")})
               .reset_index(level=0))
        out["n_rows"] = out["n_rows"].astype(np.int64)
        return out.reset_index(drop=True)

    lean = ds.map_batches(
        lambda t: t.select([key, start, end]), batch_format="pyarrow")
    return (_with_key_bucket(lean, key, n_buckets)
            .groupby("__kb")
            .map_groups(_per_bucket(per_bucket), batch_format="pandas"))

def sequence_legality(ds, *, key: str, ts: str, tiebreak: str,
                      label: str, allowed: set[tuple[str, str]],
                      buckets: int | None = None,
                      size_hint: int | None = None):
    """Per-key sequence validation against an allowed-transition set —
    the transcript role-alternation / event-grammar check: rows sorted
    by (ts, tiebreak) per key, every adjacent ``label`` pair is legal
    iff it appears in ``allowed``.  Emits integer evidence per key:
    ``n_rows``, ``n_pairs``, ``n_violations`` and ``first_bad``
    (1-based position of the first illegal pair's SECOND row; -1 when
    clean) — hash-exact against a SQL ``lag()`` oracle; the boolean
    verdict is ``n_violations == 0`` reader-side.

    One key-hash exchange of lean (key, ts, tiebreak, label) rows; per
    bucket one sort + one vectorized membership test of packed
    (prev, curr) label-id pairs against the (tiny, sorted) allowed set.
    """
    n_buckets = _window_buckets(ds, buckets, size_hint)
    sort_cols = list(dict.fromkeys([key, ts, tiebreak]))
    lean_cols = list(dict.fromkeys([key, ts, tiebreak, label]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        k = g[key].to_numpy()
        lab, labels = pd.factorize(g[label], sort=True)
        n_lab = max(len(labels), 1)
        # encode the allowed set in THIS bucket's label-id space;
        # transitions mentioning labels absent here can never occur
        lut = {v: i for i, v in enumerate(labels)}
        allow_codes = np.array(sorted(
            lut[a] * n_lab + lut[b]
            for a, b in allowed if a in lut and b in lut), dtype=np.int64)
        same = k[:-1] == k[1:]
        pair_code = lab[:-1].astype(np.int64) * n_lab + lab[1:]
        if len(allow_codes):
            pos = np.minimum(np.searchsorted(allow_codes, pair_code),
                             len(allow_codes) - 1)
            legal = allow_codes[pos] == pair_code
        else:
            legal = np.zeros(len(pair_code), dtype=bool)
        viol = same & ~legal
        # per-key fold (keys contiguous after the sort)
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.concatenate([starts[1:], [len(k)]])
        n_rows = ends - starts
        pad_viol = np.concatenate([viol, [False]])
        n_viol = np.add.reduceat(pad_viol.astype(np.int64), starts)
        # clamp reduceat overrun on single-row tail groups
        n_pairs = np.add.reduceat(np.concatenate([same, [False]])
                                  .astype(np.int64), starts)
        first_bad = np.full(len(starts), -1, dtype=np.int64)
        vidx = np.flatnonzero(viol)
        if len(vidx):
            grp = np.searchsorted(starts, vidx, side="right") - 1
            # first violation per group: vidx ascending, keep first
            first_mask = np.concatenate([[True], grp[1:] != grp[:-1]])
            first_bad[grp[first_mask]] = (vidx[first_mask]
                                          - starts[grp[first_mask]] + 2)
        return pd.DataFrame({key: k[starts], "n_rows": n_rows,
                             "n_pairs": n_pairs,
                             "n_violations": n_viol,
                             "first_bad": first_bad})

    lean = ds.map_batches(
        lambda t: t.select(lean_cols), batch_format="pyarrow")
    return (_with_key_bucket(lean, key, n_buckets)
            .groupby("__kb")
            .map_groups(_per_bucket(per_bucket), batch_format="pandas"))


def suffix_budget_fit(ds, *, key: str, ts: str, tiebreak: str,
                      weight: str, budget: int,
                      buckets: int | None = None,
                      size_hint: int | None = None):
    """Context-window fitting: per key, keep the MAXIMAL SUFFIX of the
    (ts, tiebreak)-ordered rows whose ``weight`` sum is ≤ ``budget`` —
    the "newest turns that fit the context window" truncation every
    chat-SFT pipeline runs before packing.  Rows heavier than the
    budget alone drop with the rest of the prefix.  Emits the kept
    rows plus ``suffix_sum`` (the running suffix total at that row,
    ≤ budget) — integer evidence when ``weight`` is integer, so a SQL
    reverse-running-sum oracle hashes exactly.

    One key-hash exchange, per bucket one sort + reversed grouped
    cumsum + mask; nothing key-scale on the driver.
    """
    n_buckets = _window_buckets(ds, buckets, size_hint)
    sort_cols = list(dict.fromkeys([key, ts, tiebreak]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        rev = g.iloc[::-1]
        suffix = rev.groupby(key, sort=False)[weight].cumsum().iloc[::-1]
        g = g.assign(suffix_sum=suffix)
        return g[g["suffix_sum"] <= budget]

    return (_with_key_bucket(ds, key, n_buckets)
            .groupby("__kb")
            .map_groups(_per_bucket(per_bucket), batch_format="pandas"))


def scd2_intervals(ds, *, key: str, ts: str, tiebreak: str, value: str,
                   collapse: bool = True, buckets: int | None = None,
                   size_hint: int | None = None):
    """Build a slowly-changing-dimension (type 2) history from a change
    log: per key, each row's value becomes valid over ``[ts, next
    change's ts)``, the open current row carrying a NULL ``valid_to`` —
    the point-in-time dimension table every warehouse derives from CDC
    feeds.  ``collapse=True`` first drops consecutive rows whose value
    did not change (idempotent re-sends), so intervals are maximal.

    Same bucket-then-vectorize shape as the sibling windows: one
    key-bucketed exchange, then a per-bucket pandas sort, a C-level
    grouped shift for the change mask and another for ``valid_to``.
    Returns (key, value, valid_from, valid_to).
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts, tiebreak], kind="mergesort")
        grp = g.groupby(key, sort=False)
        if collapse:
            changed = (g[value] != grp[value].shift(1)) \
                | grp.cumcount().eq(0)
            g = g[changed.to_numpy()]
            grp = g.groupby(key, sort=False)
        out = pd.DataFrame({
            key: g[key].to_numpy(),
            value: g[value].to_numpy(),
            "valid_from": g[ts].to_numpy(),
            "valid_to": grp[ts].shift(-1).to_numpy(),
        })
        return out

    return _with_key_bucket(ds, key, _window_buckets(ds, buckets, size_hint)) \
        .groupby("__kb").map_groups(_per_bucket(per_bucket),
                                    batch_format="pandas")


def decayed_window_sum(ds, *, key: str, order: list[str], value: str,
                       horizon: int = 8, buckets: int | None = None,
                       size_hint: int | None = None):
    """Exponentially-decayed windowed sum with INTEGER evidence: for
    every row ``t`` of a key's ordered stream, ``decayed = Σ_{j<H}
    v_{t−j} · 2^{H−1−j}`` over the last ``horizon`` rows — the
    recency-weighted activity score (EWMA with α = 1/2) behind
    engagement ranking and decayed frequency features.  Weights are
    powers of two and the window is bounded, so the score is an exact
    int64 (the true EWMA is ``decayed / 2^{H−1}``, a reader-side
    ratio per the float-free convention) and has an exact ranked
    self-join SQL oracle (``1 << (H−1−gap)`` weights).

    BUCKET-THEN-VECTORIZE like every op in this module: one key-hash
    exchange, per-bucket sort by ``(key, order…)``, then ``horizon``
    shifted adds over the contiguous value array with cross-key
    positions zeroed — no per-key tasks, no per-row Python.  ``value``
    must be integral (scale cents before calling); ``horizon ≤ 32``
    keeps ``Σ v·2^{H−1}`` comfortably inside int64 for cent-scale
    values.

    Returns the key, order and value columns plus ``rn`` (1-based row
    number per key) and ``decayed``.
    """
    if not (1 <= horizon <= 32):
        raise ValueError("horizon must be in [1, 32]")
    b = _window_buckets(ds, buckets, size_hint)
    tagged = _with_key_bucket(ds, key, b)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__kb")
             .sort_values([key] + order, kind="mergesort")
             .reset_index(drop=True))
        v = g[value].to_numpy(np.int64)
        k = g[key].to_numpy()
        n = len(g)
        first = np.zeros(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = k[1:] != k[:-1]
        # doc-local row index: position since the key's first row
        idx = np.arange(n, dtype=np.int64)
        start = np.maximum.accumulate(np.where(first, idx, 0))
        local = idx - start
        dec = np.zeros(n, dtype=np.int64)
        for j in range(horizon):
            w = np.int64(1) << np.int64(horizon - 1 - j)
            if j == 0:
                dec += v * w
            else:
                contrib = np.zeros(n, dtype=np.int64)
                contrib[j:] = v[:-j] * w
                contrib[local < j] = 0  # window never crosses keys
                dec += contrib
        g["rn"] = local + 1
        g["decayed"] = dec
        return g

    return tagged.groupby("__kb").map_groups(fold, batch_format="pandas")


def sliding_row_windows(ds, *, key: str, order: list[str], token: str,
                        k: int, stride: int, sep: str = "|",
                        buckets: int | None = None,
                        size_hint: int | None = None):
    """Overlapping ROW windows with stride over a keyed ordered stream:
    every complete run of ``k`` consecutive rows starting at local
    offsets 0, stride, 2·stride, … — the context-window extraction
    that turns a conversation/event log into fixed-size training
    examples with overlap (``ops/pack.chunk_spans`` does this at token
    granularity inside one string; this op does it at row granularity
    across a key's stream).  Keys with fewer than ``k`` rows emit
    nothing; ragged tails are dropped (complete windows only), so the
    result is exactly SQL's ``rn BETWEEN w·stride+1 AND w·stride+k``
    ranked range join.

    BUCKET-THEN-VECTORIZE: one key-hash exchange; per bucket, sort by
    ``(key, order…)``, compute each key's window starts arithmetically,
    gather the window members with one fancy-index
    (``starts[:, None] + arange(k)``), and rebuild the joined token
    string through a ListArray + ``binary_join`` — no per-window
    Python.  Windows-per-key is ``⌊(n−k)/stride⌋+1``: a mega-key costs
    its own windows, never the bucket's.

    Returns ``(key, window_id, n_rows, first_<order[0]>,
    last_<order[0]>, tokens)``.
    """
    import pyarrow.compute as pc

    if k < 1 or stride < 1:
        raise ValueError("k and stride must be >= 1")
    b = _window_buckets(ds, buckets, size_hint)
    tagged = _with_key_bucket(ds, key, b)
    o0 = order[0]

    def fold(g: pd.DataFrame) -> pa.Table:
        g = (g.drop(columns="__kb")
             .sort_values([key] + order, kind="mergesort")
             .reset_index(drop=True))
        kv = g[key].to_numpy()
        n = len(g)
        # type the empty first_/last_ columns from the ACTUAL order
        # column so a timestamp/float order key doesn't make empty
        # buckets emit a conflicting int64 schema vs non-empty ones
        ov_dt = g[o0].to_numpy().dtype
        o_type = (pa.from_numpy_dtype(ov_dt)
                  if ov_dt.kind in "iufM" else pa.string())
        empty = pa.table({
            key: pa.array([], pa.from_numpy_dtype(kv.dtype)
                          if kv.dtype.kind in "iuf" else pa.string()),
            "window_id": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            f"first_{o0}": pa.array([], o_type),
            f"last_{o0}": pa.array([], o_type),
            "tokens": pa.array([], pa.string())})
        if n == 0:
            return empty
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = kv[1:] != kv[:-1]
        starts_of_key = np.flatnonzero(first)
        counts = np.diff(np.append(starts_of_key, n))
        n_wins = np.where(counts >= k, (counts - k) // stride + 1, 0)
        if n_wins.sum() == 0:
            return empty
        # window start indices, flat across keys
        key_idx = np.repeat(np.arange(len(starts_of_key)), n_wins)
        win_local = (np.arange(int(n_wins.sum()))
                     - np.repeat(np.concatenate(
                         ([0], np.cumsum(n_wins)[:-1])), n_wins))
        w_start = starts_of_key[key_idx] + win_local * stride
        gather = (w_start[:, None]
                  + np.arange(k, dtype=np.int64)[None, :]).ravel()
        toks = g[token].astype(str).to_numpy(dtype=object)[gather]
        offs = np.arange(0, (len(w_start) + 1) * k, k, dtype=np.int64)
        if offs[-1] < 2**31:
            lst = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(toks, pa.string()))
        else:  # mirror pack.py's 64-bit offset fallback
            lst = pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()),
                pa.array(toks, pa.large_string()))
        ov = g[o0].to_numpy()
        return pa.table({
            key: pa.array(kv[w_start]),
            "window_id": pa.array(win_local, pa.int64()),
            "n_rows": pa.array(np.full(len(w_start), k, np.int64)),
            f"first_{o0}": pa.array(ov[w_start]),
            f"last_{o0}": pa.array(ov[w_start + k - 1]),
            "tokens": pc.binary_join(lst, sep).cast(pa.string())})

    return tagged.groupby("__kb").map_groups(fold, batch_format="pandas")
