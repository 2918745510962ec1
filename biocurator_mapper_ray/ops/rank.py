"""Ranking operators: exact top-k rows per group.

No reference equivalent (biocurator_mapper ranks only its k=5 Weaviate
candidates per request — ``app/ontology_searcher.py:95-151``); this is
the general distributed form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column


def top_k_per_group(
    ds,
    group_col: str,
    order_col: str,
    k: int,
    *,
    ascending: bool = False,
    tiebreak_col: str | None = None,
    shards: int = 32,
):
    """Exact top-``k`` rows per group by ``order_col`` (desc by default),
    ties broken by ``tiebreak_col`` ascending — fully deterministic.

    Map-side combiner push-down: each batch first reduces to ITS top-k
    per group (a batch can't contribute more than k rows to any group's
    final top-k), so the exchange ships ≤ batches×groups×k rows instead
    of the whole table; the shard merge then takes the per-group top-k
    over the salted group-hash shard (a group's rows all land in one
    shard, so per-group results are final there).  Adds ``rn`` (1-based
    rank within the group).
    """
    sort_cols = [group_col, order_col] + ([tiebreak_col] if tiebreak_col else [])
    sort_asc = [True, ascending] + ([True] if tiebreak_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        df = df.groupby(group_col, sort=False).head(k)
        salt = (hash64_column(pa.Array.from_pandas(df[group_col].astype(str))
                              if df[group_col].dtype == object
                              else pa.Array.from_pandas(df[group_col]))
                % np.uint64(shards)).astype(np.int32)
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("__s", pa.array(salt))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__s")
        group = group.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
        group = group.groupby(group_col, sort=False).head(k).copy()
        group["rn"] = group.groupby(group_col, sort=False).cumcount() + 1
        return group

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(merge, batch_format="pandas")
    )


def _sample_boundaries(ds, value_col: str, shards: int,
                       sample_cap: int = 65536) -> np.ndarray:
    """Deterministic value-range shard boundaries from a bounded sample.

    The sample is the first ``sample_cap`` values in block order (cheap,
    deterministic for a fixed input layout); boundaries are its sample
    quantiles.  Boundaries only steer BALANCE — correctness never
    depends on them because shard assignment is a pure function of the
    value (equal values always co-shard), so even a pathological sample
    just skews shard sizes.
    """
    from .quantile import _encode_keys

    vals = ds.select_columns([value_col]).limit(sample_cap).to_pandas()
    keys = _encode_keys(vals[value_col].to_numpy())
    if len(keys) == 0:
        return np.zeros(0, dtype=np.uint64)
    qs = np.linspace(0, 1, shards + 1)[1:-1]
    return np.unique(np.quantile(keys, qs).astype(np.uint64))


def value_ranks(
    ds,
    *,
    value_col: str,
    group_col: str,
    shards: int | None = None,
):
    """Exact SQL ``RANK()`` / ``PERCENT_RANK()`` over ``value_col``
    ascending, partitioned by ``group_col``, for EVERY row — fully
    distributed (no reference equivalent; the general windowed-rank
    form a curation pipeline needs for score-percentile filtering).

    Three-phase plan (the ``sequence_pack`` offset pattern generalized
    to value ranges):

    1. Sampled value-range boundaries (driver state: ≤64k sample keys).
       Shard = ``searchsorted(boundaries, key)`` — a pure function of
       the value, so ties NEVER straddle a shard boundary and per-shard
       min-ranks are exact.
    2. Lean partial counts per (group, shard) → driver offset table of
       groups × shards rows (bounded: document groups must be modest —
       priorities, languages, sources; NOT user ids).  Exclusive prefix
       over shards within each group gives each shard's rank offset;
       group totals give the ``PERCENT_RANK`` denominator.
    3. Full rows exchange ONCE by shard; within a shard, pandas
       ``rank(method="min")`` per group + the shard offset is the exact
       global rank.  One shard's frame is corpus/shards rows — shards
       derive from input size (``derive_buckets`` rule).

    Returns the input columns plus ``rnk`` (int64, 1-based) and
    ``pct_rank`` (double, ``(rnk-1)/(n_group-1)``, 0.0 for singleton
    groups — SQL semantics).
    """
    from .join import derive_buckets
    from .quantile import _encode_keys

    n = ds.count()
    if shards is None:
        shards = derive_buckets(n)
    bounds = _sample_boundaries(ds, value_col, shards)

    def add_shard(batch: pa.Table) -> pa.Table:
        keys = _encode_keys(batch.column(value_col).to_numpy())
        s = np.searchsorted(bounds, keys, side="right").astype(np.int32)
        return batch.append_column("__s", pa.array(s))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow").materialize()

    # lean per-(group, shard) counts -> exclusive shard offsets per group
    def partial_counts(batch: pa.Table) -> pa.Table:
        df = (batch.select([group_col, "__s"]).to_pandas()
              .value_counts([group_col, "__s"]).reset_index(name="__c"))
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (sharded.map_batches(partial_counts, batch_format="pyarrow")
              .groupby([group_col, "__s"]).sum("__c").to_pandas())
    counts = counts.sort_values([group_col, "__s"])
    grp = counts.groupby(group_col, sort=False)["sum(__c)"]
    counts["__off"] = grp.cumsum() - counts["sum(__c)"]
    counts["__n_grp"] = grp.transform("sum")
    off_map = {(g, s): (int(o), int(t)) for g, s, o, t in zip(
        counts[group_col], counts["__s"], counts["__off"], counts["__n_grp"])}

    def rank_shard(group: pd.DataFrame) -> pd.DataFrame:
        s = int(group["__s"].iloc[0])
        local = group[value_col].groupby(
            group[group_col], sort=False).rank(method="min").astype(np.int64)
        meta = group[group_col].map(lambda g: off_map[(g, s)])
        group = group.drop(columns="__s").copy()
        group["rnk"] = local + np.fromiter(
            (m[0] for m in meta), dtype=np.int64, count=len(meta))
        n_grp = np.fromiter((m[1] for m in meta), dtype=np.int64,
                            count=len(meta))
        group["pct_rank"] = np.where(
            n_grp > 1, (group["rnk"].to_numpy() - 1) / (n_grp - 1), 0.0)
        return group

    return sharded.groupby("__s").map_groups(rank_shard, batch_format="pandas")


def ntile(
    ds,
    *,
    value_col: str,
    group_col: str,
    tiebreak_col: str,
    n: int,
    shards: int | None = None,
):
    """Exact SQL ``NTILE(n) OVER (PARTITION BY group ORDER BY value,
    tiebreak)`` for every row — the quantile-bucket assignment used to
    stratify a corpus into equal-population quality bands.

    Same three-phase plan as :func:`value_ranks` (sampled value-range
    shards → lean per-(group, shard) count offsets → one full exchange),
    but the in-shard rank is a ROW_NUMBER over the deterministic
    (value, tiebreak) composite: shard assignment is a pure function of
    ``value_col`` alone, so all rows tying on the value co-shard and the
    in-shard sort settles the composite order exactly.  The tile then
    follows SQL's big-buckets-first rule: with ``c`` group rows,
    ``q, r = divmod(c, n)``, the first ``r`` tiles hold ``q+1`` rows.

    Returns the input columns plus ``rn`` (int64 row number, 1-based)
    and ``tile`` (int64, 1-based).
    """
    from .join import derive_buckets
    from .quantile import _encode_keys

    if n < 1:
        raise ValueError("ntile n must be >= 1")
    n_rows = ds.count()
    if shards is None:
        shards = derive_buckets(n_rows)
    bounds = _sample_boundaries(ds, value_col, shards)

    def add_shard(batch: pa.Table) -> pa.Table:
        keys = _encode_keys(batch.column(value_col).to_numpy())
        s = np.searchsorted(bounds, keys, side="right").astype(np.int32)
        return batch.append_column("__s", pa.array(s))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow").materialize()

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = (batch.select([group_col, "__s"]).to_pandas()
              .value_counts([group_col, "__s"]).reset_index(name="__c"))
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (sharded.map_batches(partial_counts, batch_format="pyarrow")
              .groupby([group_col, "__s"]).sum("__c").to_pandas())
    counts = counts.sort_values([group_col, "__s"])
    grp = counts.groupby(group_col, sort=False)["sum(__c)"]
    counts["__off"] = grp.cumsum() - counts["sum(__c)"]
    counts["__n_grp"] = grp.transform("sum")
    off_map = {(g, s): (int(o), int(t)) for g, s, o, t in zip(
        counts[group_col], counts["__s"], counts["__off"], counts["__n_grp"])}

    big = np.int64(n)

    def tile_shard(group: pd.DataFrame) -> pd.DataFrame:
        s = int(group["__s"].iloc[0])
        group = group.sort_values([group_col, value_col, tiebreak_col],
                                  kind="mergesort")
        meta = group[group_col].map(lambda g: off_map[(g, s)])
        off = np.fromiter((m[0] for m in meta), dtype=np.int64,
                          count=len(meta))
        c = np.fromiter((m[1] for m in meta), dtype=np.int64,
                        count=len(meta))
        rn = group.groupby(group_col, sort=False).cumcount() \
                  .to_numpy(dtype=np.int64) + 1 + off
        q, r = c // big, c % big
        in_big = rn <= r * (q + 1)
        # past the first r big tiles, the remaining rows split into
        # tiles of q rows each (q>0 there: r*(q+1) >= c iff q==0)
        tile = np.where(
            in_big,
            (rn - 1) // np.maximum(q + 1, 1),
            r + (rn - 1 - r * (q + 1)) // np.maximum(q, 1),
        ) + 1
        group = group.drop(columns="__s").copy()
        group["rn"] = rn
        group["tile"] = tile.astype(np.int64)
        return group

    return sharded.groupby("__s").map_groups(tile_shard,
                                             batch_format="pandas")


def pareto_frontier(ds, *, x: str, y: str) -> pd.DataFrame:
    """DISTINCT 2-D Pareto frontier (skyline) maximizing both columns:
    the points no other point weakly dominates with at least one strict
    coordinate (SQL: sort distinct points by ``x DESC, y DESC``; keep a
    row iff its ``y`` exceeds the running max over all preceding rows).
    The multi-objective "best trade-off" primitive — biggest basket at
    the highest price, longest doc with the best quality score.

    Scale shape: each batch reduces to ITS local frontier (np.unique +
    one lexsort + a running max — any global frontier point survives
    every local pass, and local non-frontier points can never re-enter),
    so the driver collects only frontier-candidate × batches rows and
    replays the same fold once.  That collect is bounded by the frontier
    size, not the input (documented bounded collect); a frontier that is
    itself data-scale (near-sorted anti-correlated axes) needs a
    range-partitioned variant instead.
    """

    def frontier(xv: np.ndarray, yv: np.ndarray) -> np.ndarray:
        pts = np.unique(np.stack([xv, yv], axis=1), axis=0)
        order = np.lexsort((-pts[:, 1], -pts[:, 0]))  # x desc, y desc
        p = pts[order]
        keep = np.empty(len(p), dtype=bool)
        keep[0] = True
        keep[1:] = p[1:, 1] > np.maximum.accumulate(p[:, 1])[:-1]
        return p[keep]

    def local(batch: pa.Table) -> pa.Table:
        xv = batch.column(x).to_numpy(zero_copy_only=False)
        yv = batch.column(y).to_numpy(zero_copy_only=False)
        if len(xv) == 0:
            return pa.table({x: batch.column(x), y: batch.column(y)})
        p = frontier(xv, yv)
        return pa.table({x: pa.array(p[:, 0], batch.schema.field(x).type),
                         y: pa.array(p[:, 1], batch.schema.field(y).type)})

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if len(cand) == 0:
        return cand
    p = frontier(cand[x].to_numpy(), cand[y].to_numpy())
    return pd.DataFrame({x: p[:, 0], y: p[:, 1]}).sort_values(
        x, ignore_index=True)


def global_top_rank(ds, *, by: str, tiebreak: str, k: int,
                    descending: bool = True, out_rank: str = "rank"):
    """Global top-``k`` rows by ``(by, tiebreak)`` with attached 1-based
    dense ranks (``row_number`` semantics — the tiebreak column must be
    unique, so ranks are total and deterministic).

    Scale shape: every batch first reduces to ITS local top-k (one
    vectorized sort + head — a global top-k row survives every local
    pass), so the exchange ships at most tasks × k rows; the final
    order-and-rank step then runs on ≤ that, single-partition by
    construction (k is result-scale, e.g. a retrieval candidate list).
    """

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([by, tiebreak],
                            ascending=[not descending, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([by, tiebreak],
                            ascending=[not descending, True],
                            kind="mergesort").head(k).reset_index(drop=True)
        df[out_rank] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    pruned = ds.map_batches(local, batch_format="pyarrow")
    return (pruned.repartition(1)
            .map_batches(attach, batch_format="pandas"))


def rrf_fuse(lists, *, id_col: str, rank_col: str = "rank", k: int = 60):
    """Reciprocal-rank fusion of ranked candidate lists: for every id,
    ``rrf = Σ_lists 1 / (k + rank)`` over the lists that contain it,
    plus ``n_lists``, the membership count — the standard
    training-free way to combine retrieval rankings (BM25 ∪ dense,
    multi-query retrieval).

    Each element of ``lists`` is a Dataset holding (id_col, rank_col)
    with 1-based ranks (see :func:`global_top_rank`).  The union is
    mapped to per-row ``1/(k+rank)`` terms and folded with one
    id-grouped exchange.  Bit-exactness note: IEEE addition is
    commutative, so with ≤ 2 lists the sum is order-independent and
    hashes identically to a SQL oracle; with more lists the fold order
    within an id group is the exchange's merge order (values still
    deterministic to ~1 ulp).
    """
    uni = None
    for ds in lists:
        lean = ds.map_batches(
            lambda t: pa.table({
                id_col: t.column(id_col),
                "__term": pc.divide(
                    1.0, pc.add(pc.cast(t.column(rank_col),
                                        pa.float64()), float(k))),
            }), batch_format="pyarrow")
        uni = lean if uni is None else uni.union(lean)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(id_col, as_index=False, sort=False)
               .agg(rrf=("__term", "sum"), n_lists=("__term", "size")))
        out["n_lists"] = out["n_lists"].astype(np.int64)
        return out

    return uni.groupby(id_col).map_groups(fold, batch_format="pandas")


def preference_pairs(ds, *, group_col: str, id_col: str, score_col: str,
                     k: int = 1, min_margin: int = 0, shards: int = 32):
    """RLHF preference-pair construction: within each group (the prompt),
    cross the top-``k`` scored rows (chosen) with the bottom-``k``
    (rejected), keeping pairs with ``chosen_score > rejected_score +
    min_margin`` — the reward-model training-set builder.

    Deterministic: top-k is (score desc, id asc), bottom-k is (score
    asc, id asc); a row never pairs with itself.  Scale shape mirrors
    :func:`top_k_per_group` — a batch can contribute at most its own
    top-k ∪ bottom-k per group, so the map-side combiner ships ≤
    batches×groups×2k lean rows into ONE salted group-hash exchange;
    pair building is a vectorized self-merge inside the shard (≤ k² rows
    per group, result-scale).  No reference equivalent (the reference
    scores candidates one request at a time, ``app/llm_matcher.py``).
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, id_col, score_col]).to_pandas()
        top = (df.sort_values([group_col, score_col, id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
               .groupby(group_col, sort=False).head(k))
        bot = (df.sort_values([group_col, score_col, id_col],
                              ascending=[True, True, True],
                              kind="mergesort")
               .groupby(group_col, sort=False).head(k))
        keep = df.loc[top.index.union(bot.index)]
        ga = (pa.Array.from_pandas(keep[group_col].astype(str))
              if keep[group_col].dtype == object
              else pa.Array.from_pandas(keep[group_col]))
        salt = (hash64_column(ga) % np.uint64(shards)).astype(np.int32)
        out = pa.Table.from_pandas(keep, preserve_index=False)
        return out.append_column("__s", pa.array(salt))

    def merge(shard: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            group_col: pd.Series(dtype=shard[group_col].dtype),
            "chosen_id": pd.Series(dtype=shard[id_col].dtype),
            "rejected_id": pd.Series(dtype=shard[id_col].dtype),
            "chosen_score": pd.Series(dtype=shard[score_col].dtype),
            "rejected_score": pd.Series(dtype=shard[score_col].dtype)})
        if shard.empty:
            return empty
        shard = shard.drop(columns="__s")
        top = (shard.sort_values([group_col, score_col, id_col],
                                 ascending=[True, False, True],
                                 kind="mergesort")
               .groupby(group_col, sort=False).head(k)
               .rename(columns={id_col: "chosen_id",
                                score_col: "chosen_score"}))
        bot = (shard.sort_values([group_col, score_col, id_col],
                                 ascending=[True, True, True],
                                 kind="mergesort")
               .groupby(group_col, sort=False).head(k)
               .rename(columns={id_col: "rejected_id",
                                score_col: "rejected_score"}))
        pairs = top.merge(bot, on=group_col)
        pairs = pairs[
            (pairs["chosen_score"].to_numpy()
             > pairs["rejected_score"].to_numpy() + min_margin)
            & (pairs["chosen_id"].to_numpy()
               != pairs["rejected_id"].to_numpy())]
        if pairs.empty:
            return empty
        return pairs[[group_col, "chosen_id", "rejected_id",
                      "chosen_score", "rejected_score"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__s")
            .map_groups(merge, batch_format="pandas"))


def ranking_metrics(ranked, gold, *, query_col: str, item_col: str,
                    rank_col: str = "rank", k: int = 10,
                    buckets: int | None = None):
    """Retrieval-evaluation join: for every GOLD ``(query, item)`` pair,
    look up its rank in the ``ranked`` candidate table and emit the
    standard integer metrics — ``found_rank`` (0 when the gold item was
    not retrieved at all), ``hit_at_k`` (0/1) and ``rr_bp``
    (``10000 // rank``, the reciprocal rank in basis points — integer
    so the result hashes exactly across engines).  Averages of
    ``hit_at_k`` / ``rr_bp`` over queries are Recall@k and MRR×10⁴.

    ONE composite-key-bucketed exchange: both sides ship lean
    ``(query, item, rank?)`` rows salted by ``md5(query:item)``, each
    bucket resolves its pairs with a vectorized left merge — gold
    pairs and candidate lists are never broadcast and never meet
    outside their bucket.
    """
    from ..functions.hashing import md5_prefix_u64
    from .join import derive_buckets

    if buckets is None:
        buckets = derive_buckets(gold.count())

    def tag(batch: pa.Table, side: int) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column(query_col), pa.string()),
            pc.cast(batch.column(item_col), pa.string()), ":")
        b = (md5_prefix_u64(key, 16) % np.uint64(buckets)).astype(np.int32)
        return pa.table({
            query_col: batch.column(query_col),
            item_col: batch.column(item_col),
            rank_col: (batch.column(rank_col) if side == 0
                       else pa.nulls(len(batch), pa.int64())),
            "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "__bucket": pa.array(b),
        })

    r_t = ranked.map_batches(tag, fn_kwargs={"side": 0},
                             batch_format="pyarrow")
    g_t = gold.map_batches(tag, fn_kwargs={"side": 1},
                           batch_format="pyarrow")

    def resolve(g: pd.DataFrame):
        want = g[g["__side"] == 1][[query_col, item_col]]
        if not len(want):
            return pa.table({query_col: pa.array([], pa.int64()),
                             item_col: pa.array([], pa.int64()),
                             "found_rank": pa.array([], pa.int64()),
                             "hit_at_k": pa.array([], pa.int64()),
                             "rr_bp": pa.array([], pa.int64())})
        have = g[g["__side"] == 0][[query_col, item_col, rank_col]]
        # a (q, item) pair can legitimately appear once per side only;
        # keep the best (min) rank if the candidate table repeats it
        have = have.groupby([query_col, item_col], as_index=False,
                            sort=False)[rank_col].min()
        m = want.merge(have, on=[query_col, item_col], how="left")
        rank = m[rank_col].fillna(0).to_numpy(np.int64)
        found = rank > 0
        out = pd.DataFrame({
            query_col: m[query_col].to_numpy(),
            item_col: m[item_col].to_numpy(),
            "found_rank": rank,
            "hit_at_k": (found & (rank <= k)).astype(np.int64),
            "rr_bp": np.where(found, 10000 // np.maximum(rank, 1), 0),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    return r_t.union(g_t).groupby("__bucket").map_groups(
        resolve, batch_format="pandas")
