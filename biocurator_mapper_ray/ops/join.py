"""Join operators.

The reference has no joins at all (its "join" is a Weaviate lookup plus a
Python dict scan — ``app/llm_matcher.py:117-125``); the engine provides
the three shapes a data platform needs:

* broadcast lookup join — small side via ``ray.put`` (used by
  pipelines and __ray_entry__ directly; no code here needed);
* :func:`hash_join` — both sides large: explicit partitioned hash join.
  Each side is tagged, unioned, bucketed by ``hash(key) % B`` and merged
  pairwise inside ``groupby(bucket).map_groups`` with pandas.  B bounds
  per-task memory (rows/B per side must fit a worker); skewed keys can
  be salted by raising B.  This is the portable pattern until
  ``Dataset.join`` semantics stabilize across Ray releases.
* :func:`asof_join` — per-key ordered as-of (backward) join: bucket by
  key, ``pd.merge_asof`` inside each group.  Partitioning assumption:
  one key's rows fit in one group (true for per-user/per-conversation
  streams; salt by time range for pathological keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column


def derive_buckets(n_rows: int | None, *, rows_per_bucket: int = 1 << 17,
                   lo: int = 8, hi: int = 8192) -> int:
    """Bucket count sized to the DATA (the minhash exchange rule,
    ops/dedup.py): one bucket's frame materializes as pandas inside a
    single task, so the count must grow with input — a fixed default is
    a per-task OOM at corpus scale — while small inputs keep few buckets
    (task dispatch ~10-25 ms dominates tiny groups).  ``hi`` caps the
    shuffle's task count; past it a bucket frame grows again (~1.5 GB of
    lean join rows at 10^11 input rows) — raise ``hi`` before raising
    ``rows_per_bucket`` if that bites."""
    if n_rows is None:
        return 64
    return int(min(hi, max(lo, n_rows // rows_per_bucket + 1)))


def _join_buckets(buckets, size_hint, *sides) -> int:
    """Resolve an explicit/derived bucket count for a join: explicit
    wins; else size_hint; else the summed ``count()`` of the sides —
    metadata-free on reads/materialized inputs, but an extra execution
    on lazy transformed plans (callers with expensive lazy inputs should
    pass ``size_hint`` or ``buckets``)."""
    if buckets is not None:
        return buckets
    n = size_hint if size_hint is not None else sum(s.count() for s in sides)
    return derive_buckets(n)


def _tag_and_bucket(ds, key: str, side: int, buckets: int, all_cols: list[str]):
    """Add __side/__bucket, pad to the unified column set (nulls)."""

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(key))  # int keys hash natively
        bucket = (h % np.uint64(buckets)).astype(np.int32)
        cols = {name: batch.column(name) for name in batch.schema.names}
        out: dict = {}
        for name in all_cols:
            if name in cols:
                out[name] = cols[name]
            else:
                out[name] = pa.nulls(len(batch))
        out["__side"] = pa.array(np.full(len(batch), side, dtype=np.int8))
        out["__bucket"] = pa.array(bucket)
        return pa.table(out)

    return ds.map_batches(tag, batch_format="pyarrow")


def _side_dtypes(ds, cols):
    """Pandas dtypes of ``cols`` in ``ds``, for restoring them after the
    null-padded union erodes them (a side's absent columns are null-typed,
    so pandas widens ints to float/object)."""
    schema = ds.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        fields = [base.field(c) for c in cols]
        return pa.schema(fields).empty_table().to_pandas().dtypes.to_dict()
    # PandasBlockSchema (from_pandas datasets): names + pandas dtypes
    names = getattr(schema, "names", None)
    types = getattr(base, "types", None) or getattr(schema, "types", None)
    if names and types is not None:
        m = dict(zip(names, types))
        try:
            return {c: m[c] for c in cols}
        except KeyError:
            return None
    return None


def hash_join(
    left,
    right,
    left_on: str,
    right_on: str,
    *,
    buckets: int | None = None,
    size_hint: int | None = None,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    left_dtypes: dict | None = None,
    right_dtypes: dict | None = None,
    bucket_postprocess=None,
):
    """Partitioned hash join of two Datasets on equality of keys.

    ``how`` accepts pandas' equality modes plus ``"semi"`` / ``"anti"``:
    left rows WITH / WITHOUT a key match on the right, left columns
    only, never duplicated by multiple right matches (SQL
    EXISTS / NOT EXISTS).  The right side of a semi/anti join should be
    projected to its key column (``right_columns=[right_on]``) so the
    exchange ships keys, not payloads.

    ``bucket_postprocess`` (optional ``DataFrame → DataFrame``) runs on
    each bucket's merged output inside the join task.  Because buckets
    partition by join key, EVERY row of a given key is in the frame it
    sees — so per-key aggregates computed here are final (combiner push-
    down: a follow-up groupby over the join output can pre-reduce here
    and ship bucket-level partials instead of raw joined rows).
    """
    lcols = left_columns or left.schema().names
    rcols = right_columns or right.schema().names
    overlap = (set(lcols) & set(rcols)) - ({left_on} if left_on == right_on else set())
    if overlap:
        raise ValueError(f"ambiguous columns in join: {sorted(overlap)}")
    all_cols = list(dict.fromkeys(lcols + rcols))
    buckets = _join_buckets(buckets, size_hint, left, right)

    # explicit dtype overrides let callers with lazy inputs (map_groups
    # chains whose schema is unknown until executed) skip the ds.schema()
    # call, which would otherwise force an extra execution of the plan
    l_dtypes = left_dtypes if left_dtypes is not None else _side_dtypes(left, lcols)
    r_dtypes = right_dtypes if right_dtypes is not None else _side_dtypes(right, rcols)

    tagged_l = _tag_and_bucket(left.select_columns(lcols), left_on, 0, buckets, all_cols)
    tagged_r = _tag_and_bucket(right.select_columns(rcols), right_on, 1, buckets, all_cols)
    unioned = tagged_l.union(tagged_r)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][lcols]
        r = group[group["__side"] == 1][rcols]
        if l_dtypes:
            l = l.astype(l_dtypes)
        if r_dtypes:
            r = r.astype(r_dtypes)
        if how in ("semi", "anti"):
            mask = l[left_on].isin(r[right_on].unique())
            out = l[mask if how == "semi" else ~mask]
        else:
            out = l.merge(r, left_on=left_on, right_on=right_on, how=how)
        if bucket_postprocess is not None:
            out = bucket_postprocess(out)
        if out.empty and len(out.columns):
            # typed empty Arrow table: an empty object-dtype frame makes
            # Ray's block size estimator np.vectorize() each column and
            # log an error per no-match bucket — the common case for
            # selective semi/anti joins (diff_bucket note).  Types come
            # from the empty frame's own non-object dtypes, else from
            # the group's actual non-null rows; if any column stays
            # untypeable, fall back to the pandas empty (correct, noisy)
            fields = []
            for c in out.columns:
                if str(out[c].dtype) != "object":
                    # Array.from_pandas on the typed EMPTY series covers
                    # numpy dtypes AND pandas extension dtypes (Int64 …),
                    # which pa.from_numpy_dtype rejects
                    fields.append(pa.field(
                        c, pa.Array.from_pandas(out[c]).type))
                    continue
                s = group[c].dropna() if c in group.columns else None
                if s is not None and len(s):
                    fields.append(pa.field(
                        c, pa.Array.from_pandas(s.head(1)).type))
                else:
                    break
            if len(fields) == len(out.columns):
                return pa.schema(fields).empty_table()
        return out

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def pair_feature_join(
    pairs,
    features,
    *,
    verify,
    feature_column: str = "sig",
    buckets: int | None = None,
):
    """Attach a per-doc feature to both sides of an (a, b) pair Dataset
    and verify — the distributed backbone of the LSH verify stages.

    ``features`` is (doc_id, <feature_column>) with the feature packed as
    a binary value (signatures, vectors).  Two bucketed :func:`hash_join`
    exchanges attach the feature for ``a`` (renamed ``f_a``) then ``b``
    (renamed ``f_b``); ``verify(df)`` runs fused inside the second join's
    bucket task on a frame with columns (a, b, f_a, f_b) and returns the
    final verified rows.  Features for docs in no candidate pair simply
    find no partner in their bucket — nothing is collected on the driver
    and no "candidates fit in memory" assumption exists.

    Passing explicit column/dtype hints into :func:`hash_join` keeps the
    lazy ``pairs`` plan unexecuted until the single final run.
    """
    i64 = np.dtype(np.int64)
    obj = np.dtype(object)
    if buckets is None:
        # size from the features side only: pairs is a lazy plan the
        # caller wants executed exactly once (counting it would run it)
        buckets = derive_buckets(features.count())

    with_f_a = hash_join(
        pairs, features, left_on="a", right_on="doc_id", buckets=buckets,
        left_columns=["a", "b"], right_columns=["doc_id", feature_column],
        left_dtypes={"a": i64, "b": i64},
        right_dtypes={"doc_id": i64, feature_column: obj},
    ).map_batches(
        lambda t: t.select(["a", "b", feature_column]).rename_columns(
            ["a", "b", "f_a"]
        ),
        batch_format="pyarrow",
    )

    def post(df: pd.DataFrame) -> pd.DataFrame:
        return verify(df.rename(columns={feature_column: "f_b"}))

    return hash_join(
        with_f_a, features, left_on="b", right_on="doc_id", buckets=buckets,
        left_columns=["a", "b", "f_a"], right_columns=["doc_id", feature_column],
        left_dtypes={"a": i64, "b": i64, "f_a": obj},
        right_dtypes={"doc_id": i64, feature_column: obj},
        bucket_postprocess=post,
    )


def symmetric_diff(
    left,
    right,
    *,
    keys: list[str],
    buckets: int | None = None,
    size_hint: int | None = None,
    left_name: str = "left_only",
    right_name: str = "right_only",
):
    """Set-semantics symmetric difference of two Datasets over ``keys``:
    one row per distinct key tuple present on exactly one side, with a
    ``side`` column naming which.  Empty output == the two key sets are
    equal — the distributed set-equality check (used by the flagship's
    ``kg_triples_diff`` verification: emitted triples vs the planted
    expected set must differ by NOTHING, a far stronger driver-visible
    guarantee than matching row counts).

    Shape: each side is projected to ``keys``, tagged, bucketed by a
    mixed hash over ALL key columns (equal tuples land in the same
    bucket regardless of side), and the per-bucket diff is a vectorized
    pandas drop_duplicates + indicator merge — nothing key-set-scale
    ever lands on the driver.
    """

    buckets = _join_buckets(buckets, size_hint, left, right)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = np.zeros(len(batch), dtype=np.uint64)
            for k in keys:
                # rotate-and-xor mix so (x, y) and (y, x) differ
                h = ((h << np.uint64(13)) | (h >> np.uint64(51))) ^ hash64_column(
                    batch.column(k)
                )
            out = {k: batch.column(k) for k in keys}
            out["__side"] = pa.array(np.full(len(batch), side, dtype=np.int8))
            out["__bucket"] = pa.array((h % np.uint64(buckets)).astype(np.int32))
            return pa.table(out)

        return fn

    tagged_l = left.select_columns(keys).map_batches(tag(0), batch_format="pyarrow")
    tagged_r = right.select_columns(keys).map_batches(tag(1), batch_format="pyarrow")

    def diff_bucket(group: pd.DataFrame):
        l = group[group["__side"] == 0][keys].drop_duplicates()
        r = group[group["__side"] == 1][keys].drop_duplicates()
        out = l.merge(r, on=keys, how="outer", indicator=True)
        out = out[out["_merge"] != "both"]
        if out.empty:
            # typed empty Arrow table (types inferred from the group's
            # actual rows — the group is never empty): an empty
            # object-dtype frame types every key column null, and Ray's
            # block size estimator np.vectorize()s each one, spamming
            # 'cannot call vectorize on size 0 inputs' per bucket on the
            # common all-equal path
            sch = pa.Table.from_pandas(group[keys].head(1),
                                       preserve_index=False).schema
            cols = {k: pa.array([], sch.field(k).type) for k in keys}
            cols["side"] = pa.array([], pa.string())
            return pa.table(cols)
        side = np.where(out["_merge"] == "left_only", left_name, right_name)
        out = out.drop(columns="_merge")
        # plain-object dtype: Ray's size estimator chokes on numpy str_
        out["side"] = pd.Series(side, index=out.index, dtype=object)
        return out

    return (
        tagged_l.union(tagged_r)
        .groupby("__bucket")
        .map_groups(diff_bucket, batch_format="pandas")
    )


def interval_count_join(
    left,
    right,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_offset: pd.Timedelta,
    hi_offset: pd.Timedelta,
    left_columns: list[str],
    count_name: str = "n_matches",
    buckets: int | None = None,
    size_hint: int | None = None,
):
    """Range (interval) join reduced to a per-left-row COUNT: for every
    left row, the number of right rows with the same ``key`` and
    ``right_ts`` in the inclusive window
    ``[left_ts + lo_offset, left_ts + hi_offset]``.

    The classic funnel/attribution query ("clicks in the hour before
    each purchase").  Shape: both sides are bucketed by key hash (one
    exchange each, same as :func:`hash_join`); inside a bucket the right
    side is sorted ONCE by (key, ts) and every left row's window is
    located with two vectorized ``np.searchsorted`` calls on a
    structured (key, ts) array — no per-row loops and, unlike a
    full range join, no |left|×|matches| intermediate ever exists.

    Partitioning assumption: one bucket's rows fit in one task (keys are
    spread across ``buckets``; raise it for skew).  Left rows with no
    match are kept with count 0 (LEFT-join semantics).
    """
    buckets = _join_buckets(buckets, size_hint, left, right)
    rcols = [key, right_ts]
    all_cols = list(dict.fromkeys(left_columns + rcols))
    l_dtypes = _side_dtypes(left, left_columns)

    lo_us = np.int64(lo_offset // pd.Timedelta(microseconds=1))
    hi_us = np.int64(hi_offset // pd.Timedelta(microseconds=1))
    key_ts = np.dtype([("k", "<i8"), ("t", "<i8")])

    tagged_l = _tag_and_bucket(left.select_columns(left_columns), key, 0,
                               buckets, all_cols)
    tagged_r = _tag_and_bucket(right.select_columns(rcols), key, 1,
                               buckets, all_cols)
    unioned = tagged_l.union(tagged_r)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][left_columns]
        if l_dtypes:
            l = l.astype(l_dtypes)
        r = group[group["__side"] == 1]
        rk = r[key].to_numpy().astype(np.int64)
        rt = r[right_ts].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((rt, rk))
        sorted_r = np.empty(len(rk), dtype=key_ts)
        sorted_r["k"], sorted_r["t"] = rk[order], rt[order]

        lk = l[key].to_numpy().astype(np.int64)
        lt = l[left_ts].to_numpy().astype("datetime64[us]").view(np.int64)
        q_lo = np.empty(len(lk), dtype=key_ts)
        q_lo["k"], q_lo["t"] = lk, lt + lo_us
        q_hi = np.empty(len(lk), dtype=key_ts)
        q_hi["k"], q_hi["t"] = lk, lt + hi_us
        n = (np.searchsorted(sorted_r, q_hi, side="right")
             - np.searchsorted(sorted_r, q_lo, side="left"))
        out = l.copy()
        out[count_name] = n.astype(np.int64)
        return out

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def asof_join(
    left,
    right,
    *,
    key: str,
    ts: str,
    direction: str = "backward",
    right_value_columns: list[str],
    tolerance: pd.Timedelta | None = None,
    buckets: int | None = None,
    size_hint: int | None = None,
):
    """As-of join: for each left row, the latest (backward) right row with
    the same ``key`` and ``right.ts <= left.ts``.

    Implemented as bucket-by-key + ``pd.merge_asof`` per group over
    (key, ts)-sorted frames.  Partitioning assumption (documented per
    SURVEY §2 custom-operator rule): all rows of one key land in one
    group; keys are spread over ``buckets`` hash buckets.
    """
    buckets = _join_buckets(buckets, size_hint, left, right)
    lcols = left.schema().names
    rcols = [key, ts] + right_value_columns
    all_cols = list(dict.fromkeys(lcols + rcols))

    # restore per-side dtypes eroded by the null-padded union, exactly as
    # hash_join does (absent columns are null-typed → pandas widens int64
    # to float64 after the union; e.g. a non-null left event_id column)
    l_dtypes = _side_dtypes(left, lcols)
    r_dtypes = _side_dtypes(right, rcols)

    tagged_l = _tag_and_bucket(left, key, 0, buckets, all_cols)
    tagged_r = _tag_and_bucket(right.select_columns(rcols), key, 1, buckets, all_cols)
    unioned = tagged_l.union(tagged_r)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        l = group[group["__side"] == 0][lcols]
        r = group[group["__side"] == 1][rcols]
        if l_dtypes:
            l = l.astype(l_dtypes)
        if r_dtypes:
            r = r.astype(r_dtypes)
        l = l.sort_values(ts)
        r = r.sort_values(ts)
        if l.empty:
            return l
        out = pd.merge_asof(
            l, r, on=ts, by=key, direction=direction, tolerance=tolerance,
            suffixes=("", "_right"),
        )
        return out

    return unioned.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def distinct_set_op(left, right, *, left_on: str, right_on: str | None = None,
                    op: str = "intersect", buckets: int | None = None,
                    size_hint: int | None = None):
    """Distributed SQL ``INTERSECT`` / ``EXCEPT`` on DISTINCT keys — the
    set algebra between two corpora a curation pipeline uses to audit
    coverage ("which ids appear in both crawls", "which vanished").

    Both sides reduce map-side to per-batch distinct keys (the combiner:
    at most |batch distinct| rows ship), then ONE salted key-hash
    exchange colocates every occurrence of a key; a key survives when
    both sides saw it (intersect) or only the left did (except).
    Returns a single-column dataset named ``left_on``.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")
    right_on = right_on if right_on is not None else left_on
    n_buckets = _join_buckets(buckets, size_hint, left, right)

    def lean(ds, col, side):
        def prep(batch: pa.Table) -> pa.Table:
            keys = batch.select([col]).rename_columns([left_on])
            keys = keys.group_by([left_on]).aggregate([])  # batch distinct
            h = hash64_column(keys.column(left_on))
            return pa.table({
                left_on: keys.column(left_on),
                "__kb": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
                "__side": pa.array(
                    np.full(len(keys), side, dtype=np.int8)),
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    want_right = op == "intersect"

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        key_type = (pa.string() if g[left_on].dtype == object
                    else pa.from_numpy_dtype(g[left_on].dtype))
        sides = g.groupby(left_on, sort=False)["__side"].agg(["min", "max"])
        keep = sides.index[(sides["min"] == 0)
                           & ((sides["max"] == 1) == want_right)]
        return pa.table({left_on: pa.array(keep.to_numpy(), key_type)})

    both = lean(left, left_on, 0).union(lean(right, right_on, 1))
    return both.groupby("__kb").map_groups(
        lambda g: per_bucket(g.drop(columns="__kb")),
        batch_format="pandas")


def bag_set_op(left, right, *, left_on: str, right_on: str | None = None,
               op: str = "intersect_all", buckets: int | None = None,
               size_hint: int | None = None):
    """Distributed SQL ``INTERSECT ALL`` / ``EXCEPT ALL`` — BAG
    semantics: a key appearing l times on the left and r times on the
    right survives min(l, r) times (intersect_all) or max(l − r, 0)
    times (except_all).  The multiplicity-aware audit between corpus
    snapshots ("how many COPIES vanished"), where
    :func:`distinct_set_op` answers only membership.

    Both sides reduce map-side to per-batch (key, count) partials —
    the exchange ships batch-distinct keys with int64 counts, never
    rows — then ONE salted key-hash exchange folds counts and emits
    each surviving key with its multiplicity.  Returns
    (``left_on``, ``n``: int64) — the caller can explode to rows if a
    bag is literally needed; at corpus scale the (key, count) form IS
    the useful one.
    """
    if op not in ("intersect_all", "except_all"):
        raise ValueError(f"unknown bag set op {op!r}")
    right_on = right_on if right_on is not None else left_on
    n_buckets = _join_buckets(buckets, size_hint, left, right)

    def lean(ds, col, side):
        def prep(batch: pa.Table) -> pa.Table:
            keys = batch.select([col]).rename_columns([left_on])
            g = keys.group_by([left_on]).aggregate([(left_on, "count")])
            g = g.rename_columns([left_on, "__c"])
            h = hash64_column(g.column(left_on))
            return pa.table({
                left_on: g.column(left_on),
                "__c": pc.cast(g.column("__c"), pa.int64()),
                "__kb": pa.array((h % np.uint64(n_buckets)).astype(np.int32)),
                "__side": pa.array(np.full(len(g), side, dtype=np.int8)),
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    intersect = op == "intersect_all"

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        key_type = (pa.string() if g[left_on].dtype == object
                    else pa.from_numpy_dtype(g[left_on].dtype))
        piv = g.pivot_table(index=left_on, columns="__side", values="__c",
                            aggfunc="sum", fill_value=0)
        l = piv[0].to_numpy(dtype=np.int64) if 0 in piv.columns \
            else np.zeros(len(piv), dtype=np.int64)
        r = piv[1].to_numpy(dtype=np.int64) if 1 in piv.columns \
            else np.zeros(len(piv), dtype=np.int64)
        n = np.minimum(l, r) if intersect else np.maximum(l - r, 0)
        keep = n > 0
        return pa.table({
            left_on: pa.array(piv.index.to_numpy()[keep], key_type),
            "n": pa.array(n[keep]),
        })

    both = lean(left, left_on, 0).union(lean(right, right_on, 1))
    return both.groupby("__kb").map_groups(
        lambda g: per_bucket(g.drop(columns="__kb")),
        batch_format="pandas")


def delta_by_key(left, right, *, key: str, compare: list[str],
                 buckets: int | None = None, size_hint: int | None = None):
    """Row-level snapshot delta between two keyed tables: for every key
    present in either side, emit ``change`` ∈ {'added', 'removed',
    'changed'} — 'added' = only in ``right`` (the new snapshot),
    'removed' = only in ``left``, 'changed' = in both with any
    ``compare`` column differing; unchanged keys emit nothing.  The
    incremental-corpus audit artifact (what moved between crawls).

    Lean exchange: each side ships (key, xxhash64 of the compare
    columns) — payloads never move; ONE salted key-hash exchange
    decides the change type per key.  Keys must be unique per side
    (snapshot semantics); duplicates raise in the bucket task.
    """
    n_buckets = _join_buckets(buckets, size_hint, left, right)

    def lean(ds, side):
        def prep(batch: pa.Table) -> pa.Table:
            h = np.zeros(len(batch), dtype=np.uint64)
            for c in compare:
                h ^= hash64_column(batch.column(c)) * np.uint64(
                    0x9E3779B97F4A7C15)
                h = (h << np.uint64(13)) | (h >> np.uint64(51))
            kb = (hash64_column(batch.column(key))
                  % np.uint64(n_buckets)).astype(np.int32)
            return pa.table({
                key: batch.column(key),
                "__h": pa.array(h.view(np.int64)),
                "__kb": pa.array(kb),
                "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        key_type = (pa.string() if g[key].dtype == object
                    else pa.from_numpy_dtype(g[key].dtype))
        if g.duplicated([key, "__side"]).any():
            raise ValueError("delta_by_key: duplicate keys within a side")
        # nullable Int64 keeps the 64-bit hashes EXACT through the
        # missing-side padding — a float64 pivot would truncate to 53
        # bits, where two different hashes near 2^63 collide with
        # probability ~2^-11 (silently missed 'changed' rows)
        l = g.loc[g["__side"] == 0].set_index(key)["__h"].astype("Int64")
        r = g.loc[g["__side"] == 1].set_index(key)["__h"].astype("Int64")
        idx = l.index.union(r.index, sort=True)
        l2 = l.reindex(idx)
        r2 = r.reindex(idx)
        added = l2.isna().to_numpy()
        removed = r2.isna().to_numpy()
        differs = (l2 != r2).fillna(False).to_numpy()
        change = np.where(added, "added",
                          np.where(removed, "removed",
                                   np.where(differs, "changed", "")))
        keep = change != ""
        return pa.table({
            key: pa.array(idx.to_numpy()[keep], key_type),
            "change": pa.array(change[keep].astype(object), pa.string()),
        })

    both = lean(left, 0).union(lean(right, 1))
    return both.groupby("__kb").map_groups(
        lambda g: per_bucket(g.drop(columns="__kb")),
        batch_format="pandas")


def merge_upsert(base, updates, *, key: str | list[str], order_col: str,
                 tiebreak: str | None = None,
                 buckets: int | None = None,
                 size_hint: int | None = None,
                 columns: list[str] | None = None):
    """Lakehouse MERGE/upsert: one row per ``key`` (a column name or a
    composite list — e.g. a (subj, pred, obj) triple), where any row in
    ``updates`` overrides ``base`` and, within a side, the greatest
    ``order_col`` (latest write) wins — last-writer-wins CDC compaction
    (SQL: union both sides with a source flag, ``row_number() OVER
    (PARTITION BY key ORDER BY src DESC, order_col DESC, tiebreak)
    = 1``).  Ties break on the smallest ``tiebreak`` (default: the key
    itself) so the winner is total and deterministic.

    Scale shape (the keep_best_per_key rule, ops/window.py:363): each
    batch first reduces to ONE candidate row per key it saw, so the
    key-hash exchange ships keys×batches candidate rows, never the full
    input; the bucketed combine replays the same argmax.  Both sides
    stream — neither is materialized or broadcast, so the update side
    may be as large as the base (full-snapshot refresh) without a plan
    change.
    """
    keys = [key] if isinstance(key, str) else list(key)
    tiebreak = tiebreak or keys[0]
    # column alignment: prefer caller-declared columns — on a LAZY base
    # (e.g. a whole extraction pipeline) Dataset.schema() executes the
    # plan up to its first block, which behind an all-to-all exchange
    # means executing the entire branch ONCE just to read column names,
    # then again in the real run (measured ~10 s of the kg_incremental
    # wall).  Pass `columns` when both sides' layout is known.
    if columns is not None:
        cols = list(columns)
        base = base.select_columns(cols)
        updates = updates.select_columns(cols)
    else:
        cols = base.schema().names
        if updates.schema().names != cols:
            updates = updates.select_columns(cols)

    def tag(src: int):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__src", pa.array(np.full(len(batch), src, dtype=np.int8)))
        return add

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([*keys, "__src", order_col, tiebreak],
                            ascending=[*([True] * len(keys)),
                                       False, False, True],
                            kind="mergesort")
        return df.drop_duplicates(keys, keep="first")

    both = (base.map_batches(tag(0), batch_format="pyarrow")
            .union(updates.map_batches(tag(1), batch_format="pyarrow")))
    if buckets is None:
        buckets = derive_buckets(size_hint)

    def partial(batch: pa.Table) -> pa.Table:
        out = pa.Table.from_pandas(best(batch.to_pandas()),
                                   preserve_index=False)
        # composite keys: rotate-XOR the per-column hashes so the
        # bucket key depends on every component
        h = np.zeros(len(out), dtype=np.uint64)
        for i, k in enumerate(keys):
            hk = hash64_column(out.column(k))
            r = np.uint64(i * 21 % 64)
            h ^= (hk << r) | (hk >> (np.uint64(64) - r)) if i else hk
        return out.append_column(
            "__kb", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__kb")
        if g.empty:
            return g
        return best(g).drop(columns="__src")

    return (both.map_batches(partial, batch_format="pyarrow")
            .groupby("__kb").map_groups(combine, batch_format="pandas"))


def skew_join(left, right, left_on: str, right_on: str, *,
              hot_threshold: int = 100_000,
              left_columns: list[str] | None = None,
              right_columns: list[str] | None = None,
              buckets: int | None = None,
              size_hint: int | None = None):
    """Skew-aware inner equi-join: same result as ``how='inner'``
    :func:`hash_join`, but HOT keys never enter the exchange.

    The classic hot-key hybrid (the explicit-skew-handling plan the
    engine runs when one probe key dominates — a mega-customer, a
    viral document, an ontology root term):

    1. ONE lean count pass over the LEFT (probe) side finds keys with
       > ``hot_threshold`` rows — by construction at most
       ``|left| / hot_threshold`` keys, a driver-bounded set.
    2. The RIGHT rows of those keys are collected and broadcast via
       ``ray.put`` (bounded by |hot keys| × right-rows-per-key — the
       build side of a foreign-key join is small per key; if YOUR
       right side is also skewed, salt-replicate instead).
    3. Hot left rows merge against the broadcast map-side — zero
       exchange for exactly the rows that would have melted a bucket —
       while cold rows flow through the normal bucketed
       :func:`hash_join`; the two streams union.

    A bucket in the cold path now holds ≤ ``hot_threshold`` rows per
    key, so per-bucket memory is bounded no matter how skewed the
    input.  Inner-join semantics only (hot-path outer semantics would
    need a broadcast-miss channel).
    """
    import ray as _ray
    import pyarrow.compute as pc

    from ..functions.hashing import hash64_column  # noqa: F401 (parity)

    lcols = left_columns or left.schema().names
    rcols = right_columns or right.schema().names
    left = left.select_columns(lcols)
    right = right.select_columns(rcols)

    # 1. probe-side key histogram, pre-aggregated per batch
    def key_part(b: pa.Table) -> pa.Table:
        t = b.select([left_on]).group_by(
            [left_on], use_threads=False).aggregate([([], "count_all")])
        return t.rename_columns(["k", "c"])

    from ray.data.aggregate import Sum as _Sum
    counts = (left.map_batches(key_part, batch_format="pyarrow")
              .groupby("k").aggregate(_Sum("c", alias_name="c")))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("c"),
                                      hot_threshold)).select(["k"]),
        batch_format="pyarrow").to_pandas()  # ≤ |left|/threshold rows
    # an all-empty to_pandas drops columns — no hot keys at all
    hot_keys = (np.sort(hot["k"].to_numpy())
                if "k" in hot.columns else np.array([], dtype=np.int64))

    if len(hot_keys) == 0:
        return hash_join(left, right, left_on, right_on,
                         left_columns=lcols, right_columns=rcols,
                         buckets=buckets, size_hint=size_hint)

    def is_hot(b: pa.Table, col: str, keys: np.ndarray) -> np.ndarray:
        v = b.column(col).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, v), len(keys) - 1)
        return keys[pos] == v

    # empty blocks can arrive with an ERASED schema (no columns) —
    # both map-side stages below need typed empties to pass through
    l_dtypes = _side_dtypes(left, lcols) or {}
    empty_left_pd = pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in l_dtypes.items()})

    # 2. broadcast the right side's hot rows
    hot_right = right.map_batches(
        lambda b, k=hot_keys: b.filter(pa.array(is_hot(b, right_on, k))),
        batch_format="pyarrow").to_pandas()
    if left_on not in hot_right.columns and right_on not in hot_right.columns:
        # all-empty blocks dropped columns: rebuild a typed empty
        r_dtypes = _side_dtypes(right, rcols) or {}
        hot_right = pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in r_dtypes.items()})
    hr_ref = _ray.put(hot_right)

    def split_left(b: pa.Table, k=hot_keys) -> pa.Table:
        if left_on not in b.schema.names:  # erased empty block
            return pa.Table.from_pandas(empty_left_pd,
                                        preserve_index=False)
        return b.filter(pa.array(~is_hot(b, left_on, k)))

    def hot_merge(b: pa.Table, ref=None) -> pd.DataFrame:
        hr = ref if isinstance(ref, pd.DataFrame) else _ray.get(ref)
        if left_on not in b.schema.names:  # erased empty block
            lb = empty_left_pd
        else:
            lb = b.filter(pa.array(is_hot(b, left_on, hot_keys))) \
                 .to_pandas()
        return lb.merge(hr, left_on=left_on, right_on=right_on,
                        how="inner")

    # 3. cold rows take the bucketed exchange (hot filter fused into
    # the scan), hot rows merge map-side against the broadcast
    cold = hash_join(left.map_batches(split_left, batch_format="pyarrow"),
                     right, left_on, right_on,
                     left_columns=lcols, right_columns=rcols,
                     buckets=buckets, size_hint=size_hint)
    hot_out = left.map_batches(hot_merge, fn_kwargs={"ref": hr_ref},
                               batch_format="pyarrow")
    return cold.union(hot_out)
