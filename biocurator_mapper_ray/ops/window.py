"""Windowed / ordered aggregates over keyed streams.

Ray Data has no event-time windows; per the engine's streaming-shaped
design (SURVEY §4), the input is treated as an ordered, key-partitioned
log: ``groupby(key).map_groups`` over (ts, tiebreak)-sorted groups
computes tumbling windows, session windows and running aggregates with
vectorized pandas inside the group.  Ordering assumption: the stated
sort key makes results deterministic; the tie-break column must be
unique per key (e.g. event_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling_window(ds, *, key: str, ts: str, freq: str, agg: dict):
    """Fixed windows per key: ``agg`` like {"n": ("value", "size"), ...}.

    Two-level: vectorized in-batch partial aggregation (map_batches) then
    a small groupby — same shape as the pricing-summary pattern, exposed
    through __ray_entry__.hourly_events.  This helper exists for ad-hoc
    frequencies; see that query for the scale-tuned version.
    """
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__w"] = df[ts].dt.floor(freq)
        g = df.groupby([key, "__w"], sort=False).agg(**agg).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow")


def session_windows(ds, *, key: str, ts: str, tiebreak: str, gap: pd.Timedelta):
    """Session assignment per key: rows sorted by (ts, tiebreak); a gap
    > ``gap`` starts a new session.  Emits the input plus ``session_id``
    (0-based per key) — the general form of the n_sessions count query."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, tiebreak]).copy()
        new = g[ts].diff() > gap
        g["session_id"] = new.cumsum().astype(np.int32)
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def running_aggregate(ds, *, key: str, ts: str, tiebreak: str,
                      value: str, out: str = "running_sum"):
    """Cumulative sum of ``value`` per key in (ts, tiebreak) order."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, tiebreak]).copy()
        g[out] = g[value].cumsum()
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def rolling_time_aggregate(ds, *, key: str, ts: str, tiebreak: str,
                           value: str, window: str = "1h",
                           out: str = "rolling_sum"):
    """Trailing time-window sum per key: for each row, the sum of
    ``value`` over this key's rows with ``ts`` in ``[row.ts - window,
    row.ts]`` (both ends inclusive — SQL ``RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW`` semantics; with ts ties the SQL RANGE
    frame sees all peer rows, so ``ts`` must be unique per key — the
    stated corpus invariant)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts, tiebreak]).copy()
        g[out] = (
            g.rolling(window, on=ts, closed="both")[value].sum().astype(g[value].dtype)
        )
        return g

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
