"""Ordered-funnel and cohort-retention analytics over an event stream.

No reference equivalent (biocurator_mapper has no event analytics); these
are the standard product-analytics operators a transcript/event corpus
needs, expressed Ray-Data-first:

* :func:`funnel_counts` — how many keys (users) reach each stage of an
  ORDERED funnel (stage k+1 must happen strictly AFTER the key first
  reached stage k).
* :func:`cohort_retention` — the classic cohort matrix: keys grouped by
  first-seen day, counted per whole-week offset of later activity.

Both ship ONE lean key-bucketed exchange (key, ts, type — never payload
columns); per-key state lives entirely inside the key's bucket, so the
reduction to (stage, users) / (cohort, offset, users) is a tiny second
groupby over per-bucket partials.  Buckets follow the data-sized
``derive_buckets`` rule, so one bucket's pandas frame stays bounded at
corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import derive_buckets
from .window import _with_key_bucket


def _per_bucket_agg(fn, empty: pd.DataFrame):
    """Like window._per_bucket, but for AGGREGATING transforms whose
    output schema differs from the input's: an empty probe group must
    come back in the OUTPUT schema (``empty``), or Ray unions
    mismatched block schemas."""

    def run(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__kb")
        if group.empty:
            return empty.copy()
        return fn(group)

    return run


def funnel_counts(ds, *, key: str, ts: str, type_col: str,
                  stages: list[str], buckets: int | None = None,
                  size_hint: int | None = None):
    """Count keys reaching each stage of an ordered funnel.

    Stage 1 is reached at the key's earliest ``stages[0]`` event; stage
    k+1 at the earliest ``stages[k]`` event STRICTLY AFTER the stage-k
    reach time (SQL mirror: iterated ``JOIN prev USING(key) WHERE
    e.ts > prev.t`` CTEs).  Ties at exactly the previous stage's
    timestamp do NOT advance the funnel.

    Returns (stage int64 1-based, event_type, users int64), one row per
    stage.  Plan: filter to funnel types map-side, ONE key-bucket
    exchange, per-bucket vectorized stage walk (len(stages) merges over
    per-key min-times — no per-row Python), then a stages-sized global
    sum.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    stage_set = list(dict.fromkeys(stages))
    if len(stage_set) != len(stages):
        raise ValueError("funnel stages must be distinct")

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column(type_col),
                        value_set=pa.array(stages, pa.string()))
        return batch.select([key, ts, type_col]).filter(mask)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        reached = (g[g[type_col] == stages[0]]
                   .groupby(key, sort=False)[ts].min()
                   .reset_index().rename(columns={ts: "__prev"}))
        users = [len(reached)]
        for st in stages[1:]:
            ev = g.loc[g[type_col] == st, [key, ts]].merge(reached, on=key)
            ev = ev[ev[ts] > ev["__prev"]]
            reached = (ev.groupby(key, sort=False)[ts].min()
                       .reset_index().rename(columns={ts: "__prev"}))
            users.append(len(reached))
        return pd.DataFrame({
            "stage": np.arange(1, len(stages) + 1, dtype=np.int64),
            "event_type": stages,
            "users": np.asarray(users, dtype=np.int64),
        })

    empty = pd.DataFrame({"stage": pd.Series([], dtype=np.int64),
                          "event_type": pd.Series([], dtype=str),
                          "users": pd.Series([], dtype=np.int64)})
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())
    pruned = ds.map_batches(prune, batch_format="pyarrow")
    partials = (_with_key_bucket(pruned, key, n_buckets)
                .groupby("__kb")
                .map_groups(_per_bucket_agg(per_bucket, empty),
                            batch_format="pandas"))
    return partials.groupby(["stage", "event_type"]).sum("users") \
        .map_batches(lambda t: t.rename_columns(
            ["stage", "event_type", "users"]), batch_format="pyarrow")


def cohort_retention(ds, *, key: str, ts: str, buckets: int | None = None,
                     size_hint: int | None = None):
    """Cohort-retention matrix: keys bucketed by FIRST-SEEN day, counted
    once per whole-week offset of any later activity.

    Returns (cohort_day timestamp, week_offset int64, active_users
    int64) where ``cohort_day = date_trunc('day', min(ts) per key)`` and
    ``week_offset = datediff('day', cohort_day, date_trunc('day', ts))
    // 7`` — integer day arithmetic, so the oracle hashes bit-exactly.

    A key's rows all live in its bucket, so the per-bucket distinct
    (key, offset) is globally distinct and the final groupby sums
    disjoint partials.
    """
    def prune(batch: pa.Table) -> pa.Table:
        return batch.select([key, ts])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        day = g[ts].dt.floor("D")
        first = day.groupby(g[key], sort=False).transform("min")
        off = ((day - first).dt.days // 7).astype(np.int64)
        out = pd.DataFrame({key: g[key], "cohort_day": first,
                            "week_offset": off})
        out = out.drop_duplicates()
        return (out.groupby(["cohort_day", "week_offset"], sort=False)
                .size().reset_index(name="active_users"))

    empty = pd.DataFrame({
        "cohort_day": pd.Series([], dtype="datetime64[us]"),
        "week_offset": pd.Series([], dtype=np.int64),
        "active_users": pd.Series([], dtype=np.int64)})
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())
    pruned = ds.map_batches(prune, batch_format="pyarrow")
    partials = (_with_key_bucket(pruned, key, n_buckets)
                .groupby("__kb")
                .map_groups(_per_bucket_agg(per_bucket, empty),
                            batch_format="pandas"))
    return partials.groupby(["cohort_day", "week_offset"]) \
        .sum("active_users") \
        .map_batches(lambda t: t.rename_columns(
            ["cohort_day", "week_offset", "active_users"]),
            batch_format="pyarrow")
