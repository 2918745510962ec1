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


def conversation_profile(ds, *, conv_col: str = "conv_id",
                         turn_col: str = "turn_idx",
                         role_col: str = "role",
                         text_col: str = "text",
                         tool_col: str = "tool"):
    """Per-conversation profile of a transcript table (the north-rule
    input shape): turn count, tool-turn count, per-role counts, total
    text chars, max turn index — the triage pass a 10^12-turn corpus
    gets before KG extraction (drop empty/degenerate conversations,
    spot mega-conversations that need block splitting).

    Plan: each batch folds to ONE lean row per distinct conv in the
    batch (Arrow group_by inside the task — a conversation spanning
    many batches contributes one partial per batch, so the
    mega-conversation hot key costs its batch count, not its turn
    count), then a conv-keyed aggregate combines partials.  The
    exchange carries conv-cardinality rows, never turns.
    """
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        role = batch.column(role_col)
        tool = batch.column(tool_col)
        t = pa.table({
            "conv_id": batch.column(conv_col),
            "n_turns": pa.array(np.ones(n, dtype=np.int64)),
            "n_tool_turns": pc.cast(
                pc.invert(pc.equal(tool.fill_null(""), "")), pa.int64()),
            "n_user_turns": pc.cast(pc.equal(role, "user"), pa.int64()),
            "n_assistant_turns": pc.cast(pc.equal(role, "assistant"),
                                         pa.int64()),
            "total_chars": pc.cast(
                pc.utf8_length(batch.column(text_col).fill_null("")),
                pa.int64()),
            "max_turn_idx": pc.cast(batch.column(turn_col), pa.int64()),
        })
        return t.group_by("conv_id").aggregate(
            [("n_turns", "sum"), ("n_tool_turns", "sum"),
             ("n_user_turns", "sum"), ("n_assistant_turns", "sum"),
             ("total_chars", "sum"), ("max_turn_idx", "max")]) \
            .rename_columns(["conv_id", "n_turns", "n_tool_turns",
                             "n_user_turns", "n_assistant_turns",
                             "total_chars", "max_turn_idx"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("conv_id")
              .aggregate(Sum("n_turns", alias_name="n_turns"),
                         Sum("n_tool_turns", alias_name="n_tool_turns"),
                         Sum("n_user_turns", alias_name="n_user_turns"),
                         Sum("n_assistant_turns",
                             alias_name="n_assistant_turns"),
                         Sum("total_chars", alias_name="total_chars"),
                         Max("max_turn_idx", alias_name="max_turn_idx")))


def table_checksum(ds, *, columns: list[str], sep: str = "\x1f"):
    """Order-insensitive exact content checksum of a table projection:
    XOR of per-row md5-derived uint64 keys plus the row count, ONE row
    out.  The 100-TB migration/resume validation primitive — compare a
    source and a sink (or two engines) without moving or sorting
    either side; any single-row difference flips the checksum.

    Each batch folds to one (xor, n) partial inside the map task; the
    fold crosses batch-count rows only.  Key hash is DuckDB-md5-exact
    (functions/hashing.md5_prefix_u64), so the SQL mirror is
    ``bit_xor(CAST('0x' || substr(md5(key), 1, 16) AS UBIGINT))``.
    Columns are rendered with CAST-to-VARCHAR semantics — use string /
    integer columns (float and timestamp rendering is engine-specific).
    """
    from ..functions.hashing import md5_prefix_u64

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            parts.append(pc.cast(batch.column(c), pa.string()))
            parts.append(sep)
        key = pc.binary_join_element_wise(*parts[:-1], "")
        h = md5_prefix_u64(key)
        x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pa.table({"checksum": pa.array([x], type=pa.uint64()),
                         "n_rows": pa.array([len(batch)],
                                            type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"checksum": pd.Series([0], dtype="uint64"),
                             "n_rows": pd.Series([0], dtype="int64")})
    return pd.DataFrame({
        "checksum": pd.Series(
            [np.bitwise_xor.reduce(parts["checksum"]
                                   .to_numpy(dtype=np.uint64))],
            dtype="uint64"),
        "n_rows": pd.Series([int(parts["n_rows"].sum())], dtype="int64"),
    })


def numeric_histogram(ds, *, column: str, width: float):
    """Fixed-width histogram of a numeric column: ``bucket =
    CAST(floor(x / width) AS BIGINT)`` → count — the numeric sibling of
    sample.length_histogram and the standard distribution triage for a
    score/value column before choosing filter thresholds.

    Map-side np.unique folds each batch to its distinct buckets; the
    exchange ships bucket-cardinality partials, one small groupby sums.
    The bucket id is floor-of-IEEE-division on both engines, so the
    oracle is exact for double inputs.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(column).to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x.astype(np.float64))]
        b = np.floor(x / width).astype(np.int64)
        bucket, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(bucket),
                         "c": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("bucket").aggregate(Sum("c", alias_name="n")))


def grouped_diversity(ds, *, group: str, value: str):
    """Per-group collision statistics of a categorical column as exact
    INTEGER evidence: ``n`` (rows), ``n_distinct`` (distinct values),
    ``sum_c2`` (sum of squared value counts).  The float diagnostics
    derive trivially downstream — collision probability (Simpson index)
    = sum_c2/n², Gini-Simpson diversity = 1 − sum_c2/n² — but only the
    integers travel, so the oracle is hash-exact (the moments/linfit
    integer-evidence rule, ops/moments.py).

    Scale shape: per-batch ``(group, value, c)`` partials cap the first
    exchange at distinct-pairs × batches; counts combine exactly in one
    groupby, then the second exchange is distinct-pairs-sized and the
    final per-group fold touches one row per distinct value.
    """
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group, value]).group_by(
            [group, value]).aggregate([([], "count_all")])
        return t.rename_columns([group, value, "c"])

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby([group, value]).aggregate(Sum("c", alias_name="c")))

    def square(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({group: batch.column(group),
                         "c": pa.array(c),
                         "c2": pa.array(c * c)})

    return (counts.map_batches(square, batch_format="pyarrow")
            .groupby(group).aggregate(Sum("c", alias_name="n"),
                                      Count(alias_name="n_distinct"),
                                      Sum("c2", alias_name="sum_c2")))


def grouped_checksum(ds, *, group: str, columns: list[str],
                     sep: str = "\x1f"):
    """Per-group order-insensitive content checksum: the
    :func:`table_checksum` fold keyed by ``group`` — (group, checksum,
    n_rows) rows.  THE partition-level resume validator: after a
    partial re-run, compare each input shard's / partition key's
    checksum against the snapshot and re-process only the groups that
    changed, never the table.  Exchange is groups×batches lean partial
    rows; the same bit_xor(md5-u64) SQL mirror applies per group.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import md5_prefix_u64

    def partial(batch: pa.Table) -> pa.Table:
        parts = []
        for c in columns:
            parts.append(pc.cast(batch.column(c), pa.string()))
            parts.append(sep)
        key = pc.binary_join_element_wise(*parts[:-1], "")
        h = md5_prefix_u64(key)
        df = pd.DataFrame({group: batch.column(group).to_pandas(),
                           "h": h})
        agg = df.groupby(group, as_index=False).agg(
            checksum=("h", lambda s: np.bitwise_xor.reduce(
                s.to_numpy(dtype=np.uint64))),
            n_rows=("h", "size"))
        return pa.table({group: pa.array(agg[group]),
                         "checksum": pa.array(agg["checksum"]
                                              .astype(np.uint64)),
                         "n_rows": pa.array(agg["n_rows"]
                                            .astype(np.int64))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group: [g[group].iloc[0]],
            "checksum": pd.Series([np.bitwise_xor.reduce(
                g["checksum"].to_numpy(dtype=np.uint64))],
                dtype="uint64"),
            "n_rows": pd.Series([int(g["n_rows"].sum())], dtype="int64"),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group).map_groups(fold, batch_format="pandas"))


def first_digit_profile(ds, *, column: str, cents: bool = True):
    """Benford first-significant-digit profile of a positive numeric
    column: (digit 1-9, n) exact counts — the data-quality screen for
    fabricated or truncated value distributions (Benford's law;
    Newcomb 1881 / Benford 1938).  Zero/negative values are excluded
    (they carry no leading significant digit).

    Map-side: values scale to integer cents (exact, the moments rule),
    the leading digit falls out of the decimal rendering — one string
    cast per batch, 9-row partials; one tiny groupby combines.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column)
        if cents:
            v = pc.cast(pc.round(pc.multiply(v, 100.0), ndigits=0),
                        pa.int64())
        pos = pc.filter(v, pc.greater(v, 0))
        s = pc.cast(pos, pa.string())
        d = pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64())
        dig, cnt = np.unique(d.to_numpy(zero_copy_only=False),
                             return_counts=True)
        return pa.table({"digit": pa.array(dig),
                         "c": pa.array(cnt.astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("digit").aggregate(Sum("c", alias_name="n")))


def key_skew_profile(ds, *, key: str):
    """Count-of-counts skew profile of a key column: for each per-key
    row count c, how many keys have exactly c rows — THE diagnostic
    read before choosing a partitioning key (a heavy tail here means
    salt the hot keys; ops/dedup and ops/window size their bucket
    exchanges from exactly this shape).

    Two stacked count exchanges, both shrinking: per-batch (key, c)
    partials → key-cardinality combine → count-cardinality fold (the
    result is at most the distinct count values — tiny).
    """
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key]).group_by(
            [key], use_threads=False).aggregate([([], "count_all")])
        return t.rename_columns([key, "c"])

    per_key = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(key).aggregate(Sum("c", alias_name="c")))
    return (per_key.groupby("c").aggregate(Count(alias_name="n_keys")))


def fd_violations(ds, *, key: str, value: str, buckets: int = 64):
    """Functional-dependency violation profile of ``key → value``: for
    every key bound to MORE THAN ONE distinct value, ``(key, n_values,
    n_rows)`` — the KG-quality gate ("which surface forms resolve to
    multiple CURIEs", "which doc ids carry conflicting languages")
    run before trusting a mapping as canonical.

    Scale shape: per-batch dedup to distinct (key, value) pairs plus
    per-(key, value) row-count partials — the exchange ships pair-
    cardinality rows, never raw rows — then ONE hash(key) exchange
    whose buckets hold each key completely, so the per-bucket distinct
    count and row sum are final; only violating keys leave the bucket
    (result-scale output).
    """
    from ..functions.hashing import hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key, value]).group_by(
            [key, value], use_threads=False).aggregate([([], "count_all")])
        t = t.rename_columns([key, value, "c"])
        h = hash64_column(t.column(key))
        return t.append_column(
            "__kb", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby([key, value], as_index=False, sort=False)["c"]
               .sum().groupby(key, as_index=False, sort=True)
               .agg(n_values=(value, "nunique"), n_rows=("c", "sum")))
        return agg[agg["n_values"] > 1]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__kb").map_groups(
                lambda g: fold(g.drop(columns="__kb")),
                batch_format="pandas"))


def constraint_checks(ds, *, not_null: list[str] | None = None,
                      positive: list[str] | None = None,
                      enum: dict[str, list[str]] | None = None,
                      unique: list[str] | None = None):
    """Data-quality gate: violation counts per declared constraint —
    the pre-ingest validation a pipeline runs before committing a new
    corpus drop.  Returns lean (rule, n_violations) rows, one per rule,
    INCLUDING zero rows (a green gate is evidence, not absence).

    Rules: ``not_null`` (null count), ``positive`` (count of values
    ≤ 0, nulls excluded), ``enum`` (count outside the allowed set,
    nulls excluded), ``unique`` (count of SURPLUS rows per duplicated
    key, i.e. n_rows − n_distinct).

    Scale shape: every row-local rule folds to ONE int per batch
    map-side (the exchange is rules × batches rows); ``unique`` is the
    only exchange-bearing rule — map-side ``value_counts`` partials
    make it distinct-values-per-batch lean, one key groupby sums, and
    the surplus folds to a single driver-side integer
    (``Dataset.sum``), so each unique rule costs exactly one exchange.
    No reference equivalent (the reference validates one LLM response
    at a time, ``app/llm_matcher.py:parse``).
    """
    not_null = list(not_null or [])
    positive = list(positive or [])
    enum = dict(enum or {})

    def row_rules(batch: pa.Table) -> pa.Table:
        rules, counts = [], []
        for c in not_null:
            rules.append(f"not_null:{c}")
            counts.append(batch.column(c).null_count)
        for c in positive:
            col = batch.column(c)
            bad = pc.sum(pc.cast(pc.fill_null(
                pc.less_equal(col, 0), False), pa.int64())).as_py() or 0
            rules.append(f"positive:{c}")
            counts.append(int(bad))
        for c, allowed in enum.items():
            col = batch.column(c)
            ok = pc.is_in(col, value_set=pa.array(allowed))
            bad = pc.sum(pc.cast(pc.fill_null(pc.invert(ok), True),
                                 pa.int64())).as_py() or 0
            # is_in(null) is null → fill as violation (enum implies
            # not-null membership); declare nulls separately if allowed
            rules.append(f"enum:{c}")
            counts.append(int(bad))
        return pa.table({"rule": pa.array(rules, pa.string()),
                         "n_violations": pa.array(counts, pa.int64())})

    outs = []
    if not_null or positive or enum:
        folded = (ds.map_batches(row_rules, batch_format="pyarrow")
                  .groupby("rule").sum("n_violations"))
        outs.append(folded.map_batches(
            lambda t: t.rename_columns(["rule", "n_violations"]),
            batch_format="pyarrow"))

    unique_rows = {"rule": [], "n_violations": []}
    for c in unique or []:
        # per-key total count via one exchange, then a single
        # driver-side scalar: Σ(c-1) == n_rows − n_distinct
        def vc_total(batch: pa.Table, col=c) -> pa.Table:
            vc = pc.value_counts(batch.column(col))
            return pa.table({"k": vc.field("values"),
                             "c": pc.cast(vc.field("counts"), pa.int64())})

        per_key = (ds.map_batches(vc_total, batch_format="pyarrow")
                   .groupby("k").sum("c")
                   .map_batches(lambda t: pa.table({"surplus": [
                       pc.sum(pc.subtract(t.column("sum(c)"), 1)).as_py()
                       or 0]}), batch_format="pyarrow"))
        unique_rows["rule"].append(f"unique:{c}")
        unique_rows["n_violations"].append(int(per_key.sum("surplus") or 0))

    assert outs or unique_rows["rule"], "no constraints declared"
    if unique_rows["rule"]:
        import ray.data as _rd

        outs.append(_rd.from_arrow(pa.table({
            "rule": pa.array(unique_rows["rule"], pa.string()),
            "n_violations": pa.array(unique_rows["n_violations"],
                                     pa.int64())})))
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def k_anonymity_audit(ds, *, quasi: list[str], sensitive: str,
                      k: int = 10, l_div: int = 2, shards: int = 64):
    """Privacy re-identification audit: for every quasi-identifier
    combination, its equivalence-class size and the number of DISTINCT
    sensitive values it carries, flagged against the k-anonymity
    (class size < ``k``) and l-diversity (distinct sensitive values <
    ``l_div``) thresholds of Sweeney 2002 / Machanavajjhala et al.
    2007 — the release gate a training corpus with user-derived
    columns runs before the corpus (or its aggregates) leaves the
    trust boundary.

    Plan shape: each batch pre-folds to DISTINCT ``(quasi…, sensitive,
    n)`` partial rows (Arrow ``group_by`` — the exchange is
    distinct-combination-scale, never row-scale), one quasi-hash
    bucketed exchange co-locates each equivalence class, and the
    bucket task folds class size (Σn) + sensitive cardinality
    (``nunique``) vectorized per class.  Output is class-scale:
    ``(quasi…, group_n, n_sensitive, violates_k, violates_l)`` with
    integer 0/1 flags (float-free evidence convention).

    No reference equivalent; the natural companion of the PII scrub
    (``ops/pii.py``) on the governance side of a data engine.
    """
    from ..functions.hashing import hash64_column

    qcols = list(quasi)

    def partial(batch: pa.Table) -> pa.Table:
        g = (batch.select(qcols + [sensitive])
             .group_by(qcols + [sensitive]).aggregate([([], "count_all")]))
        key = g.column(qcols[0]).cast(pa.string())
        for c in qcols[1:]:
            key = pc.binary_join_element_wise(
                key, g.column(c).cast(pa.string()), "\x1f")
        h = hash64_column(pc.fill_null(key, "\x00"))
        return g.rename_columns(qcols + [sensitive, "n"]).append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(qcols, dropna=False)
               .agg(group_n=("n", "sum"),
                    n_sensitive=(sensitive, "nunique"))
               .reset_index())
        agg["group_n"] = agg["group_n"].astype(np.int64)
        agg["n_sensitive"] = agg["n_sensitive"].astype(np.int64)
        agg["violates_k"] = (agg["group_n"] < k).astype(np.int64)
        agg["violates_l"] = (agg["n_sensitive"] < l_div).astype(np.int64)
        return agg

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__kb").map_groups(fold, batch_format="pandas"))


def selfjoin_size(ds, *, key: str) -> pd.DataFrame:
    """Exact self-join cardinality prediction: ``Σₖ c(k)²`` over the
    per-key row counts — the planner diagnostic that tells you, BEFORE
    running a key-bucketed self-join / all-pairs dedup / co-occurrence
    expansion, exactly how many rows it will produce (and whether one
    hot key makes it quadratic).  Companion of
    :func:`key_skew_profile`: that op shows the count-of-counts shape,
    this one folds the single number a planner compares against its
    output budget.

    Map-side ``value_counts`` partials → ONE key-scale count exchange →
    per-batch ``(Σc², Σc, n_keys, max c)`` quads → a four-scalar
    driver fold.  Returns a one-row DataFrame ``(join_rows, n_rows,
    n_keys, max_cnt)`` — all int64 (Σc² needs the join to stay under
    ~9·10¹⁸; at that size you were not going to run it anyway).
    """
    from ray.data.aggregate import Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column(key))
        return pa.table({"k": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    per_key = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("k").sum("c"))

    def quad(b: pa.Table) -> pa.Table:
        c = b.column("sum(c)").to_numpy(zero_copy_only=False)
        return pa.table({
            "join_rows": pa.array([int(np.dot(c, c))], pa.int64()),
            "n_rows": pa.array([int(c.sum())], pa.int64()),
            "n_keys": pa.array([len(c)], pa.int64()),
            "max_cnt": pa.array([int(c.max()) if len(c) else 0],
                                pa.int64())})

    folded = per_key.map_batches(quad, batch_format="pyarrow").aggregate(
        Sum("join_rows", alias_name="join_rows"),
        Sum("n_rows", alias_name="n_rows"),
        Sum("n_keys", alias_name="n_keys"),
        Max("max_cnt", alias_name="max_cnt"))
    return pd.DataFrame([{k: int(folded[k] or 0) for k in
                          ("join_rows", "n_rows", "n_keys", "max_cnt")}])


def gini_key_counts(ds, *, key: str) -> pd.DataFrame:
    """Gini coefficient of the per-key row-count distribution, as
    EXACT integer evidence: with the m per-key counts sorted ascending
    (c₍₁₎ … c₍ₘ₎, N = Σc), ``gini = (2·Σ i·c₍ᵢ₎ − (m+1)·N) / (m·N)``
    — the single-number skew score next to
    :func:`key_skew_profile`'s full shape (G → 0: uniform keys, safe
    to hash-partition; G → 1: one hot key owns the table, salt it).

    The rank-weighted sum never needs a global sort: keys tying on a
    count value occupy a CONSECUTIVE rank run and Σi over a run is
    closed-form, so ``Σ i·c₍ᵢ₎ = Σ_v v·(before(v)·n_v + n_v(n_v+1)/2)``
    over the count-of-counts profile — which is exactly
    :func:`key_skew_profile`'s (distinct-count-values-scale, tiny)
    output, collected and folded on the driver.

    Returns a one-row DataFrame ``(gini_num, gini_den, n_keys,
    n_rows)``; the float Gini is the reader-side ratio.
    """
    prof = key_skew_profile(ds, key=key).to_pandas()
    if not len(prof):
        return pd.DataFrame([{"gini_num": 0, "gini_den": 0,
                              "n_keys": 0, "n_rows": 0}])
    prof = prof.sort_values("c").reset_index(drop=True)
    c = prof["c"].to_numpy(np.int64)
    nk = prof["n_keys"].to_numpy(np.int64)
    m = int(nk.sum())
    n = int(np.dot(c, nk))
    before = np.concatenate(([0], np.cumsum(nk)[:-1]))
    rank_sum = before * nk + nk * (nk + 1) // 2
    s = int(np.dot(c, rank_sum))
    return pd.DataFrame([{"gini_num": 2 * s - (m + 1) * n,
                          "gini_den": m * n,
                          "n_keys": m, "n_rows": n}])


def _combo_key(batch: pa.Table, cols: list[str]):
    """\\x1f-joined composite value string per row (null → \\x00
    sentinel) — the k-anonymity composite convention shared by both
    uniqueness modes."""
    key = pc.fill_null(batch.column(cols[0]).cast(pa.string()), "\x00")
    for c in cols[1:]:
        key = pc.binary_join_element_wise(
            key, pc.fill_null(batch.column(c).cast(pa.string()), "\x00"),
            "\x1f")
    return key


def uniqueness_profile(ds, *, combos: list[list[str]],
                       mode: str = "exact", hll_m: int = 4096,
                       recheck_ratio: float = 0.9, _n_rows: int | None = None):
    """Candidate-key discovery: for every declared column combination,
    the EXACT distinct-combination count next to the table's row count,
    with an ``is_key`` flag when they match — the uniqueness side of
    schema discovery (``fd_violations`` tests a dependency you name;
    this op tells you which column sets could be keys at all, the
    first question before choosing a partitioning or upsert key).

    One streaming pass for ALL combos: each batch emits its DISTINCT
    md5-128 composite digests per combo (``\\x1f``-joined values, the
    k-anonymity composite convention; null → ``\\x00`` sentinel), then
    two stacked shrinking exchanges — (combo, digest) dedup, then a
    combo-keyed count — exactly the ``key_skew_profile`` shape.  The
    128-bit digest makes the distinct count collision-safe where a
    64-bit hash would not be (the oracle's COUNT(DISTINCT …) is exact,
    so a single collision would hash-mismatch).

    Returns ``(combo:string, n_distinct:int64, n_rows:int64,
    is_key:int64)`` with ``combo`` = ``+``-joined column names.

    ``mode="sketch"`` (VERDICT r4 item 7): the exact mode's
    (combo, digest) exchange is row-scale × combos when a combo is
    near-unique — exactness requires it, but a billion-row table
    shouldn't ship a digest per row just to learn that a non-key combo
    has ~40 distinct values.  The sketch mode runs ONE pass emitting
    ≤ ``hll_m`` (combo, register, rank) partial rows per batch per
    combo (HLL, the :mod:`sketch` estimator), folds registers with a
    register-scale groupby-max, and runs the EXACT path only for
    combos whose estimate ≥ ``recheck_ratio``·n_rows — true keys
    always estimate ≈ n_rows (HLL σ = 1.04/√m ≈ 1.6 % at m=4096, far
    inside the 10 % band), so ``is_key`` is exact while the exchange
    for non-key combos is register-scale.  Non-candidate combos
    report the rounded estimate with ``exact = 0``; candidates carry
    exact counts with ``exact = 1``.
    """
    from ray.data.aggregate import Count

    if mode == "sketch":
        # n_rows folds into the register exchange — no separate pass
        return _uniqueness_sketch(ds, combos=combos, m=hll_m,
                                  recheck_ratio=recheck_ratio,
                                  n_rows=_n_rows)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    n_rows = ds.count() if _n_rows is None else _n_rows

    from ..functions.hashing import md5_u128

    names = ["+".join(c) for c in combos]

    def partial(batch: pa.Table) -> pa.Table:
        # int-keyed lean rows: (combo id, md5 hi, md5 lo) — never ship
        # hex strings or string-keyed blocks into the exchange (the
        # engine's recorded groupby lesson); the 128-bit pair keeps the
        # distinct count collision-safe where a 64-bit hash would not
        out_c, out_hi, out_lo = [], [], []
        for cid, cols in enumerate(combos):
            hi, lo = md5_u128(_combo_key(batch, cols))
            pair = np.unique(np.stack(
                [hi.view(np.int64), lo.view(np.int64)], axis=1), axis=0)
            out_c.append(np.full(len(pair), cid, dtype=np.int32))
            out_hi.append(pair[:, 0])
            out_lo.append(pair[:, 1])
        return pa.table({
            "cid": pa.array(np.concatenate(out_c), pa.int32()),
            "hi": pa.array(np.concatenate(out_hi), pa.int64()),
            "lo": pa.array(np.concatenate(out_lo), pa.int64())})

    per_digest = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby(["cid", "hi", "lo"])
                  .aggregate(Count(alias_name="c")))

    # the distinct rows are already co-located per (cid, hi, lo) after
    # the ONE row-scale exchange above; counting them per cid must NOT
    # be a second row-scale groupby — per-block partial counts fold
    # through chained coalescing map-side sums (the tree-fold shape)
    def block_counts(t: pa.Table) -> pa.Table:
        cids = t.column("cid").to_numpy(zero_copy_only=False)
        cnt = np.bincount(cids, minlength=len(combos)).astype(np.int64)
        return pa.table({
            "cid": pa.array(np.arange(len(combos), dtype=np.int32)),
            "n": pa.array(cnt)})

    def fold_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        cids = t.column("cid").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        cnt = np.zeros(len(combos), dtype=np.int64)
        np.add.at(cnt, cids, n)
        return pa.table({
            "cid": pa.array(np.arange(len(combos), dtype=np.int32)),
            "n": pa.array(cnt)})

    lean = per_digest.map_batches(block_counts, batch_format="pyarrow")
    for _ in range(3):
        lean = lean.map_batches(fold_counts, batch_format="pyarrow",
                                batch_size=1_048_576)
    totals = fold_counts(pa.Table.from_pandas(lean.to_pandas()))
    nd = totals.column("n").to_numpy(zero_copy_only=False)

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "combo": pa.array(names, pa.string()),
        "n_distinct": pa.array(nd.astype(np.int64)),
        "n_rows": pa.array(np.full(len(names), n_rows, np.int64)),
        "is_key": pa.array((nd == n_rows).astype(np.int64))}))


def _uniqueness_sketch(ds, *, combos: list[list[str]], m: int,
                       recheck_ratio: float, n_rows: int | None):
    """HLL-estimate + exact-recheck body of
    ``uniqueness_profile(mode="sketch")`` — see its docstring.

    Exchange shape: batches × combos × ≤ m lean (combo, register,
    rank) rows through ONE register-keyed groupby aggregate; the
    register table (combos × m rows) folds on the driver; only is_key
    CANDIDATE combos re-run the row-scale exact path.  When ``n_rows``
    is None the row count rides the SAME exchange (one sentinel row
    per batch summed by the aggregate) instead of a separate pass.
    """
    import ray.data as rd

    from ..functions.hashing import hash64_column
    from .sketch import _rank_of, hll_estimate

    assert m & (m - 1) == 0, "hll_m must be a power of two"
    bits = m.bit_length() - 1
    max_rank = 64 - bits + 1

    names = ["+".join(c) for c in combos]

    def partial(batch: pa.Table) -> pa.Table:
        out_c, out_r, out_k = [], [], []
        for cid, cols in enumerate(combos):
            h = hash64_column(_combo_key(batch, cols))
            reg = (h % np.uint64(m)).astype(np.int64)
            rank = _rank_of(h >> np.uint64(bits), max_rank)
            # batch-local register max: ≤ m rows leave the task;
            # int combo ids, not strings, key the exchange
            order = np.lexsort((-rank, reg))
            reg_s, rank_s = reg[order], rank[order]
            first = np.concatenate([[True], reg_s[1:] != reg_s[:-1]])
            out_c.append(np.full(int(first.sum()), cid, dtype=np.int32))
            out_r.append(reg_s[first])
            out_k.append(rank_s[first])
        k = sum(len(r) for r in out_r)
        # sentinel row cid=-1 carries this batch's row count
        return pa.table({
            "cid": pa.array(np.concatenate(
                [np.concatenate(out_c), [-1]]).astype(np.int32)),
            "register": pa.array(np.concatenate(
                [np.concatenate(out_r), [0]]).astype(np.int64)),
            "rank": pa.array(np.concatenate(
                [np.concatenate(out_k), [0]]).astype(np.int64)),
            "n": pa.array(np.concatenate(
                [np.zeros(k, np.int64), [len(batch)]]).astype(np.int64))})

    def fold(batch: pa.Table) -> pa.Table:
        # segment max(rank) / sum(n) per (cid, register) — a map-side
        # tree-reduce level; every output block is ≤ combos × (m+1)
        # rows no matter how many partial blocks coalesced into it
        if len(batch) == 0:
            return batch
        cid = batch.column("cid").to_numpy(zero_copy_only=False)
        reg = batch.column("register").to_numpy(zero_copy_only=False)
        rank = batch.column("rank").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((-rank, reg, cid))
        c, r, k, nn = cid[order], reg[order], rank[order], n[order]
        first = np.concatenate([[True],
                                (c[1:] != c[:-1]) | (r[1:] != r[:-1])])
        seg = np.cumsum(first) - 1
        nsum = np.bincount(seg, weights=nn).astype(np.int64)
        return pa.table({
            "cid": pa.array(c[first], pa.int32()),
            "register": pa.array(r[first], pa.int64()),
            "rank": pa.array(k[first], pa.int64()),
            "n": pa.array(nsum, pa.int64())})

    # big partial batches: each emits ≤ combos × m lean rows however
    # many input rows it covers.  The register fold is NOT a groupby —
    # an all-to-all Aggregate costs seconds of fixed shuffle latency for
    # a register-scale table; three chained coalescing map-side folds
    # (each merges ~64 blocks, ~256k× total reduction) keep it a pure
    # streaming tree-reduce, and the driver folds the last few blocks.
    lean = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
    for _ in range(3):
        lean = lean.map_batches(fold, batch_format="pyarrow",
                                batch_size=1_048_576)
    regs = fold(pa.Table.from_pandas(lean.to_pandas())).to_pandas()
    regs = regs.rename(columns={"rank": "max_rank"})
    if n_rows is None:
        n_rows = int(regs.loc[regs["cid"] == -1, "n"].sum())
    regs = regs[regs["cid"] >= 0]

    est = {}
    for cid, name in enumerate(names):
        sub = regs[regs["cid"] == cid]
        est[name] = hll_estimate(sub[["register", "max_rank"]], m)

    cand = [c for c, name in zip(combos, names)
            if est[name] >= recheck_ratio * n_rows]
    exact = {}
    if cand:
        ex = uniqueness_profile(ds, combos=cand, mode="exact",
                                _n_rows=n_rows).to_pandas()
        exact = dict(zip(ex["combo"], ex["n_distinct"]))

    out = pd.DataFrame({
        "combo": names,
        "n_distinct": [int(exact.get(nm, round(est[nm])))
                       for nm in names],
        "n_rows": np.full(len(names), n_rows, np.int64),
        "is_key": [int(exact.get(nm, -1) == n_rows) for nm in names],
        "exact": [int(nm in exact) for nm in names]})
    out = out.astype({"n_distinct": np.int64, "is_key": np.int64,
                      "exact": np.int64})
    return rd.from_pandas(out)
