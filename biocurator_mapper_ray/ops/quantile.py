"""Exact distributed order statistics over an integer or float column.

Multi-pass histogram refinement — the classic distributed-selection
algorithm, generalised from the usual integer-only form with an
order-preserving ``uint64`` key encoding (identity-shift for integers,
the IEEE-754 monotone bit trick for floats), so quantiles come back in
the column's NATIVE dtype with no silent truncation:

* pass 0 folds (min key, max key, n) from one lean row per batch;
* each refinement pass counts rows by coarse key-bucket (a distributive
  groupby whose result is bounded by ``qs × 2^coarse_bits`` rows, never
  by data rows) and the driver folds the bucket CDF to locate each
  quantile's bucket plus its residual rank;
* passes repeat at ``coarse_bits`` finer granularity per level until the
  bucket width is one key unit — at which point the located key IS the
  answer.  Driver-side state is bucket-scale at every level (the old
  two-pass form collected all DISTINCT values inside the needed buckets,
  which a pathological column could blow up; the loop removes that).

Answers are EXACT — rank = ceil(q·n), matching DuckDB's
``quantile_disc`` (verified empirically), which gives every caller an
exact SQL oracle.  NaNs are not supported (the IEEE key maps them to
the extremes, silently skewing ranks — filter them first); -0.0 and
+0.0 are kept distinct (-0.0 sorts first), the one knowable divergence
from SQL comparison semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SIGN = np.uint64(1 << 63)
_ALL1 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _encode_keys(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 key: k(a) < k(b)  ⇔  a < b.

    Integers shift by 2^63; floats use the IEEE-754 monotone bit trick
    (positive: set the sign bit; negative: flip all bits).
    """
    if v.dtype.kind == "u":
        return v.astype(np.uint64)
    if v.dtype.kind == "i":
        return v.astype(np.int64).view(np.uint64) ^ _SIGN
    bits = v.astype(np.float64).view(np.uint64)
    neg = (bits >> np.uint64(63)).astype(bool)
    return bits ^ np.where(neg, _ALL1, _SIGN)


def _decode_key(key: int, arrow_type: pa.DataType):
    """Inverse of :func:`_encode_keys` for one driver-side key."""
    k = np.uint64(key)
    if pa.types.is_floating(arrow_type):
        bits = (k ^ _ALL1) if (k >> np.uint64(63)) == 0 else (k ^ _SIGN)
        return float(np.uint64(bits).view(np.float64))
    if pa.types.is_unsigned_integer(arrow_type):
        return int(k)
    return int((k ^ _SIGN).view(np.int64))


def _value_series(keys: list[int], arrow_type: pa.DataType) -> np.ndarray:
    vals = [_decode_key(k, arrow_type) for k in keys]
    dt = np.float64 if pa.types.is_floating(arrow_type) else np.int64
    return np.asarray(vals, dtype=dt)


def _rel(v: np.ndarray, lo: int) -> np.ndarray:
    """Key distance from the global minimum, exact in uint64."""
    return _encode_keys(v) - np.uint64(lo)


def _column_type(ds, column: str) -> pa.DataType:
    sch = ds.schema()
    return dict(zip(sch.names, sch.types))[column]


def exact_quantiles(ds, column: str, qs: list[float], *,
                    coarse_bits: int = 16) -> pd.DataFrame:
    """→ DataFrame (q float64, value in the column's native dtype): the
    exact ceil(q·n)-th smallest value of ``column`` for each q.

    ``2 + ceil(key_span_bits / coarse_bits)`` bounded executions: one
    min/max/n fold, then one coarse-bucket count exchange per refinement
    level (integer columns with span < 2^32 finish in two levels; float
    columns take up to four).
    """
    arrow_type = _column_type(ds, column)

    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy()
        if not len(v):
            return pa.table({"lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        k = _encode_keys(v)
        return pa.table({"lo": pa.array([k.min()], pa.uint64()),
                         "hi": pa.array([k.max()], pa.uint64()),
                         "n": pa.array([len(v)])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        dt = np.float64 if pa.types.is_floating(arrow_type) else np.int64
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=dt)})
    lo = int(mm["lo"].min())
    span = int(mm["hi"].max()) - lo
    n = int(mm["n"].sum())

    ranks = [min(n, max(1, int(np.ceil(q * n)))) for q in qs]
    keys_by_rank = _keys_at_ranks(ds, column, ranks, lo=lo, span=span,
                                  coarse_bits=coarse_bits)
    keys = [keys_by_rank[r] for r in ranks]
    return (
        pd.DataFrame({"q": np.asarray(list(qs), dtype=np.float64),
                      "value": _value_series(keys, arrow_type)})
        .sort_values("q")
        .reset_index(drop=True)
    )


def _keys_at_ranks(ds, column: str, ranks: list[int], *, lo: int, span: int,
                   coarse_bits: int, weight: str | None = None) -> dict:
    """Rank-parameterized histogram refinement: the encoded key of the
    r-th smallest value (1-based) for each requested rank — the shared
    core under both the discrete and the interpolated quantile forms.
    Driver state per level: one (needed bucket, residual rank) pair per
    distinct rank.  With ``weight`` set, bucket counts are exact int64
    WEIGHT sums and a rank addresses the cumulative-weight axis — the
    weighted-quantile core (same passes, same driver state)."""
    # per-rank residual within its current needed bucket; the bucket
    # itself is tracked at prev_shift granularity (None = whole span)
    state = {r: [None, int(r)] for r in sorted(set(ranks))}
    shift = max(0, span.bit_length() - coarse_bits)
    prev_shift: int | None = None

    while True:
        s, ps = shift, prev_shift
        needed = (np.unique(np.array([b for b, _ in state.values()],
                                     dtype=np.uint64))
                  if ps is not None else None)

        def bucket_counts(batch: pa.Table, *, _s=s, _ps=ps,
                          _needed=needed) -> pa.Table:
            rel = _rel(batch.column(column).to_numpy(), lo)
            w = (batch.column(weight).to_numpy(zero_copy_only=False)
                 .astype(np.int64) if weight is not None else None)
            if _ps is not None:
                keep = np.isin(rel >> np.uint64(_ps), _needed)
                rel = rel[keep]
                if w is not None:
                    w = w[keep]
            b = rel >> np.uint64(_s)
            if w is None:
                uniq, counts = np.unique(b, return_counts=True)
                counts = counts.astype(np.int64)
            else:
                uniq, inv = np.unique(b, return_inverse=True)
                counts = np.zeros(len(uniq), dtype=np.int64)
                np.add.at(counts, inv, w)
            return pa.table({"bucket": pa.array(uniq, pa.uint64()),
                             "cnt": pa.array(counts),
                             "__s": pa.array((uniq % 16).astype(np.int32))})

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            # salt-shard combine: one task per shard, vectorized within —
            # a per-bucket-key groupby would pay per-group task overhead
            # for up to qs × 2^coarse_bits singleton groups
            return (
                group.drop(columns="__s")
                .groupby("bucket", sort=True)["cnt"].sum().reset_index()
            )

        hist = (
            ds.map_batches(bucket_counts, batch_format="pyarrow")
            .groupby("__s")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()  # ≤ qs × 2^coarse_bits rows — bucket-scale
            .sort_values("bucket")
        )
        buckets = hist["bucket"].to_numpy().astype(np.uint64)
        counts = hist["cnt"].to_numpy()

        width = ps - s if ps is not None else None
        for _r, st in state.items():
            if ps is None:
                sel = np.ones(len(buckets), dtype=bool)
            else:
                sel = (buckets >> np.uint64(width)) == st[0]
            cum = counts[sel].cumsum()
            i = int(np.searchsorted(cum, st[1], side="left"))
            below = int(cum[i - 1]) if i else 0
            st[0] = buckets[sel][i]
            st[1] -= below

        if shift == 0:
            break
        prev_shift, shift = shift, max(0, shift - coarse_bits)

    return {r: lo + int(st[0]) for r, st in state.items()}


def grouped_exact_quantiles(ds, column: str, group_col: str, qs: list[float], *,
                            coarse_bits: int = 16) -> pd.DataFrame:
    """Exact per-group quantiles → DataFrame (group, q, value), the
    grouped form of :func:`exact_quantiles` with the same multi-pass
    histogram refinement, every exchange keyed by (group, bucket).

    Scale contract: driver-side state is groups × qs needed buckets per
    level (the RESULT is per-group scalars, so group cardinality is
    driver-bounded by definition); row-scale data never leaves the
    cluster.  Bucketing uses one global [lo, hi) key span — per-group
    spans would save refine work only when group ranges are disjoint.
    """
    arrow_type = _column_type(ds, column)
    val_dt = np.float64 if pa.types.is_floating(arrow_type) else np.int64

    def minmax(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        df["__k"] = _encode_keys(df[column].to_numpy())
        g = df.groupby(group_col, sort=False)["__k"].agg(["min", "max", "count"])
        g = g.reset_index()
        g.columns = [group_col, "lo", "hi", "n"]
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.set_column(t.schema.get_field_index("lo"), "lo",
                            t.column("lo").cast(pa.uint64())).set_column(
            t.schema.get_field_index("hi"), "hi",
            t.column("hi").cast(pa.uint64()))

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=val_dt)})
    per_group = mm.groupby(group_col).agg(
        lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum")
    )
    lo = int(per_group["lo"].min())
    span = int(per_group["hi"].max()) - lo

    rank_map = {
        grp: [min(int(row["n"]), max(1, int(np.ceil(q * int(row["n"])))))
              for q in qs]
        for grp, row in per_group.iterrows()
    }
    keys = _grouped_keys_at_ranks(ds, column, group_col, rank_map,
                                  lo=lo, span=span,
                                  coarse_bits=coarse_bits)
    out_g, out_q, out_k = [], [], []
    for grp, row in per_group.iterrows():
        n = int(row["n"])
        for q in qs:
            r = min(n, max(1, int(np.ceil(q * n))))
            out_g.append(grp)
            out_q.append(q)
            out_k.append(keys[(grp, r)])
    return (
        pd.DataFrame({group_col: out_g,
                      "q": np.asarray(out_q, dtype=np.float64),
                      "value": _value_series(out_k, arrow_type)})
        .sort_values([group_col, "q"])
        .reset_index(drop=True)
    )


def _grouped_keys_at_ranks(ds, column: str, group_col: str,
                           rank_map: dict, *, lo: int, span: int,
                           coarse_bits: int = 16) -> dict:
    """Rank-parameterized core of the grouped histogram refinement:
    for every group, the encoded keys of its 1-based order-statistic
    ranks in ``rank_map[group]`` — ALL of a group's ranks refine
    together in the same passes (one extra rank costs no extra pass).
    Returns ``{(group, rank): encoded key int}``.  The grouped sibling
    of the global ``_keys_at_ranks``; see
    :func:`grouped_exact_quantiles` for the scale contract."""
    # state[(grp, rank)] = [needed bucket at prev_shift (None = all), resid]
    state: dict[tuple, list] = {}
    for grp, ranks in rank_map.items():
        for r in set(ranks):
            state[(grp, r)] = [None, int(r)]
    shift = max(0, span.bit_length() - coarse_bits)
    prev_shift: int | None = None

    while True:
        s, ps = shift, prev_shift
        if ps is not None:
            need_pairs = pd.DataFrame(
                [(g, int(st[0])) for (g, _), st in state.items()],
                columns=[group_col, "__pb"],
            ).drop_duplicates()
        else:
            need_pairs = None

        def bucket_counts(batch: pa.Table, *, _s=s, _ps=ps,
                          _need=need_pairs) -> pa.Table:
            grp_type = batch.schema.field(group_col).type
            empty = pa.table({group_col: pa.array([], grp_type),
                              "bucket": pa.array([], pa.int64()),
                              "cnt": pa.array([], pa.int64()),
                              "__s": pa.array([], pa.int32())})
            df = batch.select([group_col, column]).to_pandas()
            if df.empty:
                return empty
            rel = _rel(df[column].to_numpy(), lo)
            if _ps is not None:
                df["__pb"] = (rel >> np.uint64(_ps)).astype(np.int64)
                df["__rel"] = rel
                df = df.merge(_need, on=[group_col, "__pb"])  # semi-join
                if df.empty:  # typed empty keeps block schemas uniform
                    return empty
                rel = df["__rel"].to_numpy().astype(np.uint64)
            out = pd.DataFrame({
                group_col: df[group_col].to_numpy(),
                "bucket": (rel >> np.uint64(_s)).astype(np.int64),
            })
            g = out.groupby([group_col, "bucket"], sort=False).size() \
                   .reset_index(name="cnt")
            salt = (g["bucket"].to_numpy() % 16).astype(np.int32)
            return pa.Table.from_pandas(g, preserve_index=False) \
                           .append_column("__s", pa.array(salt))

        def combine(group: pd.DataFrame) -> pd.DataFrame:
            return (
                group.drop(columns="__s")
                .groupby([group_col, "bucket"], sort=True)["cnt"].sum()
                .reset_index()
            )

        hist = (
            ds.map_batches(bucket_counts, batch_format="pyarrow")
            .groupby("__s").map_groups(combine, batch_format="pandas")
            .to_pandas()  # ≤ groups × qs × 2^coarse_bits rows
            .sort_values([group_col, "bucket"])
        )

        width = ps - s if ps is not None else None
        for grp, gh in hist.groupby(group_col, sort=False):
            gb = gh["bucket"].to_numpy().astype(np.uint64)
            gc = gh["cnt"].to_numpy()
            for r in set(rank_map.get(grp, ())):
                st = state[(grp, r)]
                if ps is None:
                    sel = np.ones(len(gb), dtype=bool)
                else:
                    sel = (gb >> np.uint64(width)) == st[0]
                cum = gc[sel].cumsum()
                i = int(np.searchsorted(cum, st[1], side="left"))
                below = int(cum[i - 1]) if i else 0
                st[0] = gb[sel][i]
                st[1] -= below

        if shift == 0:
            break
        prev_shift, shift = shift, max(0, shift - coarse_bits)

    return {key: lo + int(st[0]) for key, st in state.items()}


def filter_by_quantile(ds, column: str, *, lo_q: float = 0.05,
                       hi_q: float = 0.95, coarse_bits: int = 16):
    """Keep rows whose ``column`` lies inside the EXACT [lo_q, hi_q]
    quantile band — the length/outlier trim every curation pipeline
    applies ("drop the shortest 5% and longest 5%"), composed from
    :func:`exact_quantiles` (driver state: two scalars) + a map-side
    vectorized filter.  Inclusive on both thresholds in the column's
    NATIVE dtype (no integer truncation on float columns), matching
    DuckDB's ``BETWEEN quantile_disc(lo_q) AND quantile_disc(hi_q)``.
    """
    qdf = exact_quantiles(ds, column, [lo_q, hi_q], coarse_bits=coarse_bits)
    if qdf.empty:
        return ds
    lo_v = qdf["value"].iloc[0].item()
    hi_v = qdf["value"].iloc[-1].item()

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(column)
        mask = pc.and_(pc.greater_equal(v, lo_v), pc.less_equal(v, hi_v))
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def winsorize_by_quantile(ds, column: str, *, lo_q: float = 0.05,
                          hi_q: float = 0.95, coarse_bits: int = 16,
                          out_column: str | None = None):
    """CLAMP ``column`` to the exact [lo_q, hi_q] quantile band (the
    outlier treatment that keeps every row, where
    :func:`filter_by_quantile` drops them): values below the lo_q
    quantile become that quantile, above hi_q become that one.

    Thresholds come from :func:`exact_quantiles` (driver state: two
    scalars) and are DISCRETE data values (``quantile_disc``), so every
    output value appears verbatim in the input — no arithmetic, the
    clamp is bit-exact across engines on floats too.  Appends
    ``out_column`` (default ``column_w``); same-name overwrite
    supported.
    """
    if out_column is None:
        out_column = f"{column}_w"
    qdf = exact_quantiles(ds, column, [lo_q, hi_q], coarse_bits=coarse_bits)

    def clamp(batch: pa.Table) -> pa.Table:
        v = batch.column(column)
        if not qdf.empty:
            lo_v = qdf["value"].iloc[0]
            hi_v = qdf["value"].iloc[-1]
            w = pc.min_element_wise(pc.max_element_wise(v, lo_v), hi_v)
        else:
            w = v  # empty input: nothing to clamp
        if out_column in batch.schema.names:
            return batch.set_column(
                batch.schema.get_field_index(out_column), out_column, w)
        return batch.append_column(out_column, w)

    return ds.map_batches(clamp, batch_format="pyarrow")


def quantiles_cont(ds, column: str, qs: list[float], *,
                   coarse_bits: int = 16) -> pd.DataFrame:
    """Interpolated (``quantile_cont`` / PERCENTILE_CONT) quantiles →
    DataFrame (q float64, value float64): with h = (n-1)·q, linear
    interpolation between the floor(h)+1-th and floor(h)+2-th smallest
    values.

    Built on the SAME rank-refinement core as :func:`exact_quantiles`
    (both bracket ranks refine together — one extra rank per q, no
    extra passes); the interpolation itself is one float64 expression
    over two EXACT data values, mirrored verbatim by the SQL oracle, so
    the result hashes bit-equal across engines.
    """
    arrow_type = _column_type(ds, column)

    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy()
        if not len(v):
            return pa.table({"lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        k = _encode_keys(v)
        return pa.table({"lo": pa.array([k.min()], pa.uint64()),
                         "hi": pa.array([k.max()], pa.uint64()),
                         "n": pa.array([len(v)])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=np.float64)})
    lo = int(mm["lo"].min())
    span = int(mm["hi"].max()) - lo
    n = int(mm["n"].sum())

    # bracket ranks per q (1-based); h floors in float64 exactly as the
    # SQL mirror computes them
    hs = [float(n - 1) * float(q) for q in qs]
    lo_ranks = [min(n, int(np.floor(h)) + 1) for h in hs]
    hi_ranks = [min(n, int(np.floor(h)) + 2) for h in hs]
    keys = _keys_at_ranks(ds, column, sorted(set(lo_ranks + hi_ranks)),
                          lo=lo, span=span, coarse_bits=coarse_bits)

    vals = []
    for q, h, rl, rh in zip(qs, hs, lo_ranks, hi_ranks):
        vl = float(_decode_key(keys[rl], arrow_type))
        vh = float(_decode_key(keys[rh], arrow_type))
        frac = h - np.floor(h)
        vals.append(vl + frac * (vh - vl))
    return (pd.DataFrame({"q": np.asarray(qs, dtype=np.float64),
                          "value": np.asarray(vals, dtype=np.float64)})
            .sort_values("q").reset_index(drop=True))


def mad_filter(ds, column: str, *, k: float = 3.0,
               coarse_bits: int = 16):
    """Keep rows within ``k`` median-absolute-deviations of the median —
    the robust outlier trim (immune to the heavy tails that wreck a
    z-score band).

    Two exact interpolated medians (:func:`quantiles_cont`, driver
    state: one scalar each): med = median(column), then
    mad = median(abs(column - med)) over a map-side derived column; the
    keep predicate ``abs(v - med) <= k * mad`` is one float64 expression
    mirrored verbatim by the SQL oracle (DuckDB ``median`` on numerics
    IS percentile_cont 0.5), so the surviving row set matches
    bit-exactly.  Both passes stream; nothing materializes.
    """
    med_df = quantiles_cont(ds, column, [0.5], coarse_bits=coarse_bits)
    if med_df.empty:
        return ds
    med = float(med_df["value"].iloc[0])

    def dev(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(column), pa.float64())
        return pa.table({"__dev": pc.abs(pc.subtract(v, med))})

    mad_df = quantiles_cont(ds.map_batches(dev, batch_format="pyarrow"),
                            "__dev", [0.5], coarse_bits=coarse_bits)
    lim = float(k) * float(mad_df["value"].iloc[0])

    def keep(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(column), pa.float64())
        return batch.filter(pc.less_equal(pc.abs(pc.subtract(v, med)), lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_quantiles_cont(ds, column: str, group_col: str,
                           qs: list[float], *,
                           coarse_bits: int = 16) -> pd.DataFrame:
    """Per-group interpolated PERCENTILE_CONT → DataFrame (group, q,
    value float64): within each group, h = (n_g − 1)·q and linear
    interpolation between the floor(h)+1-th and floor(h)+2-th smallest
    values — the grouped form of :func:`quantiles_cont`.

    Both bracket ranks for every (group, q) refine together through
    ONE :func:`_grouped_keys_at_ranks` run (no extra passes vs the
    discrete version); the interpolation is one float64 expression
    over two EXACT data values, mirrored verbatim by the SQL oracle,
    so results hash bit-equal across engines."""
    arrow_type = _column_type(ds, column)

    def minmax(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, column]).to_pandas()
        if df.empty:
            # keep the group column's REAL type on empty blocks — a
            # string-typed empty would poison the union's schema when
            # groups are integers
            gt = (batch.schema.field(group_col).type
                  if group_col in batch.schema.names else pa.string())
            return pa.table({group_col: pa.array([], gt),
                             "lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        df["__k"] = _encode_keys(df[column].to_numpy())
        g = df.groupby(group_col, sort=False)["__k"] \
              .agg(["min", "max", "count"]).reset_index()
        g.columns = [group_col, "lo", "hi", "n"]
        t = pa.Table.from_pandas(g, preserve_index=False)
        return t.set_column(t.schema.get_field_index("lo"), "lo",
                            t.column("lo").cast(pa.uint64())).set_column(
            t.schema.get_field_index("hi"), "hi",
            t.column("hi").cast(pa.uint64()))

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=np.float64)})
    per_group = mm.groupby(group_col).agg(
        lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
    lo = int(per_group["lo"].min())
    span = int(per_group["hi"].max()) - lo

    brackets: dict = {}   # (grp, q) -> (h, rank_lo, rank_hi)
    rank_map: dict = {}
    for grp, row in per_group.iterrows():
        n = int(row["n"])
        ranks = []
        for q in qs:
            h = float(n - 1) * float(q)
            rl = min(n, int(np.floor(h)) + 1)
            rh = min(n, int(np.floor(h)) + 2)
            brackets[(grp, q)] = (h, rl, rh)
            ranks.extend((rl, rh))
        rank_map[grp] = ranks
    keys = _grouped_keys_at_ranks(ds, column, group_col, rank_map,
                                  lo=lo, span=span,
                                  coarse_bits=coarse_bits)

    out_g, out_q, vals = [], [], []
    for grp in per_group.index:
        for q in qs:
            h, rl, rh = brackets[(grp, q)]
            vl = float(_decode_key(keys[(grp, rl)], arrow_type))
            vh = float(_decode_key(keys[(grp, rh)], arrow_type))
            frac = h - np.floor(h)
            out_g.append(grp)
            out_q.append(q)
            vals.append(vl + frac * (vh - vl))
    return (pd.DataFrame({group_col: out_g,
                          "q": np.asarray(out_q, dtype=np.float64),
                          "value": np.asarray(vals, dtype=np.float64)})
            .sort_values([group_col, "q"]).reset_index(drop=True))


def weighted_quantiles(ds, column: str, weight: str, qs: list[float], *,
                       coarse_bits: int = 16) -> pd.DataFrame:
    """Exact weighted discrete quantiles → DataFrame (q, value): the
    smallest ``column`` value whose running ``weight`` sum (values
    ascending) reaches ``ceil(q · W)`` — token-budget quantiles ("the
    doc length below which half the TOKENS live"), cost percentiles
    weighted by spend.  Weights must be non-negative integers; the
    rank threshold ``ceil(q · W)`` is the identical float64 expression
    on both engines, so results hash-exactly against SQL's
    running-sum-window form.

    Same multi-pass histogram refinement and driver state as
    :func:`exact_quantiles` (the shared rank-parameterized core) —
    bucket counts become exact int64 weight sums; no extra passes.
    """
    arrow_type = _column_type(ds, column)

    def minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy()
        w = batch.column(weight).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if not len(v):
            return pa.table({"lo": pa.array([], pa.uint64()),
                             "hi": pa.array([], pa.uint64()),
                             "W": pa.array([], pa.int64())})
        k = _encode_keys(v)
        return pa.table({"lo": pa.array([k.min()], pa.uint64()),
                         "hi": pa.array([k.max()], pa.uint64()),
                         "W": pa.array([int(w.sum())])})

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if mm.empty or mm["W"].sum() == 0:
        dt = np.float64 if pa.types.is_floating(arrow_type) else np.int64
        return pd.DataFrame({"q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=dt)})
    lo = int(mm["lo"].min())
    span = int(mm["hi"].max()) - lo
    W = int(mm["W"].sum())

    ranks = [min(W, max(1, int(np.ceil(q * W)))) for q in qs]
    keys_by_rank = _keys_at_ranks(ds, column, ranks, lo=lo, span=span,
                                  coarse_bits=coarse_bits, weight=weight)
    keys = [keys_by_rank[r] for r in ranks]
    return (
        pd.DataFrame({"q": np.asarray(list(qs), dtype=np.float64),
                      "value": _value_series(keys, arrow_type)})
        .sort_values("q")
        .reset_index(drop=True)
    )
