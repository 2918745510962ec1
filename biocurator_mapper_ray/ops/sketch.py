"""Sketch operators: HyperLogLog / count-min / Bloom filters.

No reference equivalent; the standard cardinality sketch for 100-TB
corpora (distinct tokens / users / URLs) where an exact distinct is a
full vocabulary exchange.  Published algorithm: Flajolet et al. 2007,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm".

Design for SQL-checkability: the hash is md5_u64 (byte-identical to
DuckDB's ``CAST('0x' || substr(md5(x), 1, 16) AS UBIGINT)``) and the
register rank is 1 + trailing-zeros of the remaining bits (isolated
with ``rest & (~rest + 1)``, whose log2 is a power of two and therefore
EXACT in float64 on both engines).  The geometric rank distribution is
identical to the classic leading-zero formulation, but every step is
expressible in portable SQL integer/bit arithmetic — so the register
table (the op's full state) has an exact DuckDB oracle, and the float
estimate is derived from it deterministically on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rank_of(rest: np.ndarray, max_rank: int) -> np.ndarray:
    """1 + trailing zeros of ``rest`` (uint64); rest==0 → ``max_rank``."""
    low = rest & ((~rest) + np.uint64(1))
    with np.errstate(divide="ignore"):
        tz = np.where(rest == 0, max_rank - 1,
                      np.log2(low.astype(np.float64))).astype(np.int64)
    return tz + 1


class HLLTokenStage:
    """documents batch → per-batch partial HLL registers over the text's
    whitespace tokens: ≤ ``m`` lean (register, rank) rows per batch
    regardless of batch size — the exchange is register-scale, never
    token-scale."""

    def __init__(self, text_column: str = "text", m: int = 256):
        assert m & (m - 1) == 0, "m must be a power of two"
        self.text_column = text_column
        self.m = m
        self.bits = m.bit_length() - 1
        self.max_rank = 64 - self.bits + 1

    def _hash_tokens(self, toks: np.ndarray) -> np.ndarray:
        # ONE vectorized C call per batch (shared DuckDB md5 kernel)
        # instead of a per-token Python loop
        from ..functions.hashing import md5_prefix_u64

        return md5_prefix_u64(toks, 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(batch.column(self.text_column)), r"\s+"
            )
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        uniq = pc.unique(toks).to_numpy(zero_copy_only=False)
        if not len(uniq):
            return pa.table({"register": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        h = self._hash_tokens(uniq)
        reg = (h % np.uint64(self.m)).astype(np.int64)
        rank = _rank_of(h >> np.uint64(self.bits), self.max_rank)
        # batch-local register max: ≤ m rows leave the task
        order = np.lexsort((-rank, reg))
        reg_s, rank_s = reg[order], rank[order]
        first = np.concatenate([[True], reg_s[1:] != reg_s[:-1]])
        return pa.table({"register": pa.array(reg_s[first]),
                         "rank": pa.array(rank_s[first])})


def hll_registers(ds, *, text_column: str = "text", m: int = 256):
    """Distributed HLL register table (register int64, max_rank int64)
    over the corpus's whitespace tokens — ≤ m rows, one register-keyed
    exchange of ≤ batches×m partial rows."""
    partials = ds.map_batches(
        HLLTokenStage, fn_constructor_kwargs={"text_column": text_column, "m": m},
        batch_format="pyarrow", concurrency=(1, 8),
    )
    agg = partials.groupby("register").max("rank")
    return agg.map_batches(
        lambda t: t.rename_columns(["register", "max_rank"]),
        batch_format="pyarrow",
    ).sort("register")


def hll_estimate(registers: pd.DataFrame, m: int = 256) -> float:
    """Cardinality estimate from a (register, max_rank) table: the
    classic HLL harmonic mean with small-range (linear counting) and
    empty-register corrections.  Derived deterministically on the
    driver from the exact register table."""
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    ranks = np.zeros(m, dtype=np.int64)
    ranks[registers["register"].to_numpy()] = registers["max_rank"].to_numpy()
    est = alpha * m * m / np.sum(np.exp2(-ranks.astype(np.float64)))
    zeros = int(np.sum(ranks == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_union_registers(ds_a, ds_b, *, text_column: str = "text",
                        m: int = 256) -> pa.Table:
    """Merged HLL register table for two corpora: ``(register, rank_a,
    rank_b, rank_union)`` with 0 for a side that never touched the
    register and ``rank_union = max(rank_a, rank_b)`` — the mergeability
    that makes HLL the right sketch for cross-corpus overlap at scale:
    each side is one distributed register build (≤ m rows leave it),
    and the merge is a driver-side join of two ≤ m-row tables.

    Feed the result to :func:`hll_union_estimate` for |A|, |B|, |A∪B|,
    the inclusion-exclusion |A∩B| and the Jaccard estimate."""
    ra = ds_a if isinstance(ds_a, pd.DataFrame) else (
        hll_registers(ds_a, text_column=text_column, m=m).to_pandas())
    rb = ds_b if isinstance(ds_b, pd.DataFrame) else (
        hll_registers(ds_b, text_column=text_column, m=m).to_pandas())
    merged = ra.rename(columns={"max_rank": "rank_a"}).merge(
        rb.rename(columns={"max_rank": "rank_b"}),
        on="register", how="outer").fillna(0)
    merged["register"] = merged["register"].astype(np.int64)
    merged["rank_a"] = merged["rank_a"].astype(np.int64)
    merged["rank_b"] = merged["rank_b"].astype(np.int64)
    merged["rank_union"] = merged[["rank_a", "rank_b"]].max(axis=1)
    merged = merged.sort_values("register").reset_index(drop=True)
    return pa.Table.from_pandas(merged, preserve_index=False)


def hll_union_estimate(merged, m: int = 256) -> dict:
    """Cardinality estimates from a merged register table
    (:func:`hll_union_registers` output): ``card_a``, ``card_b``,
    ``card_union`` via the standard estimator on each rank column,
    ``card_inter`` by inclusion-exclusion (clamped ≥ 0) and
    ``jaccard`` = inter/union."""
    if isinstance(merged, pa.Table):
        merged = merged.to_pandas()

    def est(col: str) -> float:
        sub = merged[merged[col] > 0].rename(columns={col: "max_rank"})
        return hll_estimate(sub[["register", "max_rank"]], m)

    a, b, u = est("rank_a"), est("rank_b"), est("rank_union")
    inter = max(0.0, a + b - u)
    return {"card_a": a, "card_b": b, "card_union": u,
            "card_inter": inter,
            "jaccard": inter / u if u > 0 else 0.0}


class CountMinTokenStage:
    """documents batch → partial count-min registers over the text's
    whitespace token OCCURRENCES: ≤ depth×width lean (row, bucket,
    count) rows per batch regardless of batch size — the exchange is
    register-scale, never token-scale.

    Same SQL-checkability device as HLL: row ``j``'s hash of token
    ``t`` is the first 16 md5 hex chars of ``"j:t"`` mod ``width``,
    byte-identical to DuckDB's
    ``CAST('0x' || substr(md5(j || ':' || t), 1, 16) AS UBIGINT) % w``.
    """

    def __init__(self, text_column: str = "text", depth: int = 4,
                 width: int = 512):
        self.text_column = text_column
        self.depth = depth
        self.width = width

    def _hash_tokens(self, toks: np.ndarray) -> np.ndarray:
        """(len(toks), depth) uint64 of md5('j:tok') prefixes — one
        vectorized C call per depth row instead of a per-token loop."""
        from ..functions.hashing import md5_prefix_u64

        out = np.empty((len(toks), self.depth), dtype=np.uint64)
        for j in range(self.depth):
            out[:, j] = md5_prefix_u64(toks, 16, prefix=f"{j}:")
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(batch.column(self.text_column)), r"\s+"
            )
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        if not len(toks):
            return pa.table({"row": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64())})
        vc = toks.value_counts()
        uniq = vc.field("values").to_numpy(zero_copy_only=False)
        occ = vc.field("counts").to_numpy()
        h = self._hash_tokens(uniq) % np.uint64(self.width)
        # batch-local register sums: ≤ depth×width rows leave the task
        grid = np.zeros((self.depth, self.width), dtype=np.int64)
        for j in range(self.depth):
            np.add.at(grid[j], h[:, j].astype(np.int64), occ)
        row, bucket = np.nonzero(grid)
        return pa.table({"row": pa.array(row.astype(np.int64)),
                         "bucket": pa.array(bucket.astype(np.int64)),
                         "count": pa.array(grid[row, bucket])})


def cms_registers(ds, *, text_column: str = "text", depth: int = 4,
                  width: int = 512):
    """Distributed count-min sketch (row, bucket, count — ≤ depth×width
    rows) over the corpus's whitespace token occurrences.  Published
    algorithm: Cormode & Muthukrishnan 2005, "An improved data stream
    summary: the count-min sketch and its applications".  One
    register-keyed exchange of ≤ batches×depth×width partial rows."""
    partials = ds.map_batches(
        CountMinTokenStage,
        fn_constructor_kwargs={"text_column": text_column, "depth": depth,
                               "width": width},
        batch_format="pyarrow", concurrency=(1, 8),
    )
    agg = partials.groupby(["row", "bucket"]).sum("count")
    return agg.map_batches(
        lambda t: t.rename_columns(["row", "bucket", "count"]),
        batch_format="pyarrow",
    ).sort(["row", "bucket"])


def cms_query(registers: pd.DataFrame, tokens: list[str], *,
              depth: int = 4, width: int = 512) -> dict[str, int]:
    """Point-frequency estimates (the min-over-rows rule) from an exact
    register table, driver-side."""
    grid = np.zeros((depth, width), dtype=np.int64)
    grid[registers["row"].to_numpy(), registers["bucket"].to_numpy()] = (
        registers["count"].to_numpy())
    out = {}
    for t in tokens:
        b = t.encode("utf-8")
        est = min(
            grid[j, int(hashlib.md5(b"%d:%s" % (j, b)).hexdigest()[:16], 16)
                 % width]
            for j in range(depth)
        )
        out[t] = int(est)
    return out


def _bloom_key_bits(batch: pa.Table, *, key_column: str, k: int,
                    m_bits: int) -> pa.Table:
    """batch → DISTINCT set-bit positions of a Bloom filter over a key
    column: ≤ ``m_bits`` lean single-column rows per batch regardless of
    batch size — the exchange is bit-scale, never key-scale.  A plain
    task-pool function (no per-batch state worth an actor pool — the
    md5 kernel is process-global).

    Same SQL-checkability device as HLL/CMS: hash ``j`` of key ``x`` is
    the first 16 md5 hex chars of ``"j:" || CAST(x AS VARCHAR)`` mod
    ``m_bits``, byte-identical to DuckDB's
    ``CAST('0x' || substr(md5(j || ':' || CAST(x AS VARCHAR)), 1, 16) AS
    UBIGINT) % m``.  Keys must be integer or string columns (float
    VARCHAR formatting is not portable across engines).
    """
    from biocurator_mapper_ray.functions.hashing import md5_prefix_u64

    col = batch.column(key_column)
    if pa.types.is_floating(col.type):
        raise TypeError("bloom keys must be integer or string columns")
    keys = pc.unique(pc.cast(col, pa.string()))
    keys = keys.filter(pc.is_valid(keys))
    if not len(keys):
        return pa.table({"bit": pa.array([], pa.int64())})
    bits = np.concatenate([
        (md5_prefix_u64(keys, prefix=f"{j}:") % np.uint64(m_bits))
        .astype(np.int64)
        for j in range(k)
    ])
    return pa.table({"bit": pa.array(np.unique(bits))})


def bloom_bits(ds, *, key_column: str, k: int = 4, m_bits: int = 8192,
               sort: bool = True):
    """Distributed Bloom filter over a key column, as its exact set-bit
    table (bit int64, ≤ m_bits rows; sorted unless ``sort=False`` — the
    internal consumers pack it into a bool array where order is noise
    and the extra all-to-all is pure fixed cost).  Published algorithm:
    Bloom 1970, "Space/time trade-offs in hash coding with allowable
    errors".  One bit-keyed exchange of ≤ batches×m_bits partial rows;
    the register table has an exact DuckDB oracle (see module doc)."""
    partials = ds.map_batches(
        _bloom_key_bits,
        fn_kwargs={"key_column": key_column, "k": k, "m_bits": m_bits},
        batch_format="pyarrow",
    )
    agg = partials.groupby("bit").count().select_columns(["bit"])
    return agg.sort("bit") if sort else agg


def bloom_contains(bits: pd.DataFrame, keys: list, *, k: int = 4,
                   m_bits: int = 8192) -> dict:
    """Driver-side membership probe of an exact set-bit table: True
    means POSSIBLY present (false-positive rate ~(1-e^{-kn/m})^k),
    False means definitely absent."""
    from biocurator_mapper_ray.functions.hashing import md5_prefix_u64

    arr = np.zeros(m_bits, dtype=bool)
    arr[bits["bit"].to_numpy()] = True
    out = {}
    for key in keys:
        hs = [int(md5_prefix_u64([str(key)], prefix=f"{j}:")[0]) % m_bits
              for j in range(k)]
        out[key] = bool(all(arr[h] for h in hs))
    return out


def _bloom_prefilter(batch: pa.Table, *, bits_ref, key_column: str,
                     k: int, m_bits: int) -> pa.Table:
    """Map-side candidate filter: keep rows whose key hits all k bits of
    a broadcast Bloom filter.  ``ray.get`` of the packed bool array is
    zero-copy from the local object store, so a plain task-pool
    function beats an actor pool (no setup worth amortizing, no ramp
    latency, fuses with the upstream read)."""
    import ray

    arr = ray.get(bits_ref) if not isinstance(bits_ref, np.ndarray) else bits_ref
    from biocurator_mapper_ray.functions.hashing import md5_prefix_u64

    keys = pc.cast(batch.column(key_column), pa.string())
    mask = np.ones(len(batch), dtype=bool)
    mask &= pc.is_valid(keys).to_numpy(zero_copy_only=False)
    for j in range(k):
        h = (md5_prefix_u64(keys, prefix=f"{j}:")
             % np.uint64(m_bits)).astype(np.int64)
        mask &= arr[h]
        if not mask.any():
            break
    return batch.filter(pa.array(mask))


def bloom_semi_join(left, right, left_on: str, right_on: str, *,
                    k: int = 4, m_bits: int = 1 << 20,
                    left_columns: list[str] | None = None,
                    recheck: bool = True,
                    size_hint: int | None = None):
    """Semi join accelerated by a broadcast Bloom prefilter: build a
    Bloom filter over the right side's keys (bit-scale exchange, packed
    to m_bits/8 bytes on the driver), drop non-matching left rows
    MAP-SIDE, then exact-recheck the surviving candidates with a
    partitioned semi ``hash_join``.

    At 100 TB this is the scale path for "big table ∩ big-ish key set":
    the all-to-all exchange ships only true matches plus the Bloom
    false-positive tail (~0.05% at k=4, m/n=16) instead of every left
    row — the filter itself is a constant-size broadcast no matter how
    many keys the right side holds.  With ``recheck=False`` the result
    may contain false positives (useful as a pre-pass feeding another
    exact operator)."""
    import ray

    from biocurator_mapper_ray.ops.join import hash_join

    bits = bloom_bits(right, key_column=right_on, k=k, m_bits=m_bits,
                      sort=False)
    # exact set-bit table is ≤ m_bits rows by construction — the ONLY
    # driver-side collect, bounded by the filter size, not the data
    arr = np.zeros(m_bits, dtype=bool)
    bits_pd = bits.to_pandas()
    if len(bits_pd):  # empty right side → empty frame may lose its schema
        arr[bits_pd["bit"].to_numpy()] = True
    ref = ray.put(arr)
    cand = left.map_batches(
        _bloom_prefilter,
        fn_kwargs={"bits_ref": ref, "key_column": left_on,
                   "k": k, "m_bits": m_bits},
        batch_format="pyarrow",
    )
    if left_columns:
        cand = cand.select_columns(left_columns)
    if not recheck:
        return cand
    if size_hint is None:
        # derive the join's bucket count from the filter occupancy
        # (≈ k keys per distinct set bit is an upper-ish bound on the
        # right side; candidates are match-scale): an explicit hint
        # stops hash_join from count()ing its LAZY sides, which would
        # re-execute the whole prefilter plan a second time just to
        # size buckets
        size_hint = max(64, (len(bits_pd) // max(1, k)) * 8)
    # resolve the left column list from the ORIGINAL input: a fully
    # filtered-out candidate stream has no blocks and a None schema,
    # which would crash hash_join's projection setup
    lcols = left_columns
    if lcols is None:
        lsch = left.schema()
        lcols = lsch.names if lsch is not None else [left_on]
    return hash_join(cand, right, left_on, right_on, how="semi",
                     left_columns=lcols,
                     right_columns=[right_on],
                     size_hint=size_hint)


def heavy_hitters(ds, *, text_column: str = "text", threshold: int,
                  summary_k: int = 256, shards: int = 32):
    """EXACT frequent tokens (count ≥ ``threshold``) via a Misra-Gries
    style sketch-then-verify — the bounded-memory path when batch
    vocabularies are too large to ship whole (open-vocabulary web text):

    1. **Sketch pass**: each batch counts its tokens exactly
       (vectorized), then COMPRESSES to ≤ ``summary_k`` entries by the
       MG decrement — subtract the (k+1)-th largest count from every
       entry and drop non-positives.  A token's per-batch undercount is
       ≤ that decrement d_b; the batch also emits d_b.  The exchange
       ships ≤ summary_k rows per batch regardless of vocabulary.
    2. **Candidates**: after summing summaries, true_count ∈
       [est, est + Σd_b], so every token with true count ≥ threshold
       satisfies est + Σd_b ≥ threshold — the candidate filter has NO
       false negatives by the MG guarantee.
    3. **Verify pass**: the (small) candidate set broadcasts via
       ``ray.put``; one more streaming pass counts ONLY candidates
       exactly, and the final filter is the exact SQL
       ``HAVING count(*) >= threshold``.

    Returns (token, n) exact rows.  Choose ``summary_k`` ≳
    total_tokens / threshold so candidates stay small."""
    import ray

    from ..functions.hashing import hash64_column

    def tokenize(batch: pa.Table) -> pa.ChunkedArray:
        toks = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.utf8_lower(batch.column(text_column))), r"\s+"))
        return toks.filter(pc.not_equal(toks, ""))

    def summarize(batch: pa.Table) -> pa.Table:
        toks = tokenize(batch)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__err": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int32())})
        g = pa.table({"token": toks}).group_by(["token"]).aggregate(
            [("token", "count")])
        names = g.column("token")
        counts = g.column("token_count").to_numpy().astype(np.int64)
        d = 0
        if len(counts) > summary_k:
            d = int(np.partition(counts, -summary_k - 1)[-summary_k - 1])
            keep = counts > d
            names = names.filter(pa.array(keep))
            counts = counts[keep] - d
        err_row = pa.table({"token": pa.array([""], pa.string()),
                            "n": pa.array([0], pa.int64()),
                            "__err": pa.array([d], pa.int64()),
                            "__s": pa.array([-1], pa.int32())})
        salt = (hash64_column(names) % np.uint64(shards)).astype(np.int32)
        body = pa.table({"token": names,
                         "n": pa.array(counts),
                         "__err": pa.array(np.zeros(len(counts),
                                                    dtype=np.int64)),
                         "__s": pa.array(salt)})
        return pa.concat_tables([body, err_row])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", sort=False)[["n", "__err"]].sum() \
               .reset_index()
        return out

    summary = (ds.map_batches(summarize, batch_format="pyarrow")
               .groupby("__s")
               .map_groups(lambda g: combine(g.drop(columns="__s")),
                           batch_format="pandas")
               .to_pandas())
    if summary.empty:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    total_err = int(summary["__err"].sum())
    body = summary[summary["token"] != ""]
    if total_err >= threshold:
        # a token dropped from EVERY summary has est = 0 and could
        # still reach the threshold — the sketch is uninformative at
        # this (summary_k, threshold) pair, so the candidate set is
        # formally "all tokens".  Verify exactly over everything
        # (vocab-scale exchange, the word_counts shape) instead of
        # silently missing hitters; raise summary_k to restore the
        # bounded-exchange path (need Σ d_b < threshold, i.e.
        # summary_k ≳ total_tokens / threshold).
        import warnings

        warnings.warn(
            f"heavy_hitters: summary error {total_err} ≥ threshold "
            f"{threshold}; falling back to the exact full-vocabulary "
            "pass — raise summary_k for the bounded-exchange path",
            stacklevel=2)
        cand_ref = None
    else:
        cands = body.loc[body["n"] + total_err >= threshold, "token"]
        cand_set = set(cands.tolist())
        if not cand_set:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        cand_ref = ray.put(cand_set)

    def recount(batch: pa.Table, cand_ref=cand_ref) -> pa.Table:
        toks = tokenize(batch)
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        if cand_ref is not None:
            cset = ray.get(cand_ref) if not isinstance(cand_ref, set) \
                else cand_ref
            mask = pa.array(pd.Series(
                toks.to_numpy(zero_copy_only=False)).isin(cset).to_numpy())
            toks = toks.filter(mask)
        g = pa.table({"token": toks}).group_by(["token"]).aggregate(
            [("token", "count")])
        return pa.table({"token": g.column("token"),
                         "n": pc.cast(g.column("token_count"),
                                      pa.int64())})

    exact = (ds.map_batches(recount, batch_format="pyarrow")
             .groupby("token").sum("n").to_pandas()
             .rename(columns={"sum(n)": "n"}))
    if exact.empty:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    exact["n"] = exact["n"].astype("int64")
    out = exact[exact["n"] >= threshold].sort_values("token") \
        .reset_index(drop=True)
    return out[["token", "n"]]


class GroupedHLLStage:
    """batch → per-(group, register) partial max HLL rank over the
    DISTINCT ``value``s seen in the batch: ≤ groups×m lean rows leave
    each task regardless of batch size.  Same SQL-checkability device
    as :class:`HLLTokenStage`; values hash as their decimal/VARCHAR
    rendering (``md5(CAST(v AS VARCHAR))``), vectorized through the
    batched md5 kernel (functions/hashing.md5_prefix_u64)."""

    def __init__(self, group: str, value: str, m: int = 64):
        assert m & (m - 1) == 0, "m must be a power of two"
        self.group = group
        self.value = value
        self.m = m
        self.bits = m.bit_length() - 1
        self.max_rank = 64 - self.bits + 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_prefix_u64

        df = batch.select([self.group, self.value]).to_pandas() \
            .drop_duplicates()
        if df.empty:
            return pa.table({self.group: pa.array([], batch.schema
                                                  .field(self.group).type),
                             "register": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        h = md5_prefix_u64(df[self.value].astype(str).to_numpy())
        out = pd.DataFrame({
            self.group: df[self.group].to_numpy(),
            "register": (h % np.uint64(self.m)).astype(np.int64),
            "rank": _rank_of(h >> np.uint64(self.bits), self.max_rank),
        }).groupby([self.group, "register"], as_index=False)["rank"].max()
        return pa.Table.from_pandas(out, preserve_index=False)


def grouped_hll_registers(ds, *, group: str, value: str, m: int = 64):
    """Per-group HLL register table (group, register, max_rank) —
    approximate COUNT(DISTINCT value) GROUP BY group as exact integer
    state: the exchange is ≤ groups×m×batches lean partial rows, never
    value-scale, and the register table has an exact DuckDB oracle.
    Feed each group's rows to :func:`hll_estimate` for the float."""
    partials = ds.map_batches(
        GroupedHLLStage, fn_constructor_kwargs={
            "group": group, "value": value, "m": m},
        batch_format="pyarrow", concurrency=(1, 8))
    agg = partials.groupby([group, "register"]).max("rank")
    return agg.map_batches(
        lambda t: t.rename_columns([group, "register", "max_rank"]),
        batch_format="pyarrow").sort([group, "register"])


def grouped_hll_estimate(registers: pd.DataFrame, *, group: str,
                         m: int = 64) -> pd.DataFrame:
    """(group, estimate) from a grouped register table — driver-side
    fold over register-scale state."""
    rows = [(g, hll_estimate(sub, m))
            for g, sub in registers.groupby(group, sort=True)]
    return pd.DataFrame(rows, columns=[group, "estimate"])


# ---------------------------------------------------------------- KMV

def kmv_sample(ds, *, text_column: str = "text", k: int = 64):
    """K-minimum-values sketch (Bar-Yossef et al. 2002): the ``k``
    DISTINCT tokens with the smallest md5 hashes — simultaneously a
    UNIFORM sample of the distinct-value domain (hash order is
    independent of frequency, unlike a row sample, which a heavy
    hitter dominates) and a cardinality sketch
    (:func:`kmv_estimate`).  Returns (token, h) sorted by h.

    Scale shape: a global-k member is necessarily in its batch's
    top-k, so each batch ships ≤ k lean rows and the final
    sort+limit sees batches×k rows — vocabulary never leaves the
    mappers.  15-hex md5 hashes (< 2^60) keep both engines in int64,
    so the sample set has an exact DuckDB oracle
    (``ORDER BY hash LIMIT k`` over distinct tokens)."""
    from ..functions.hashing import md5_prefix_u64

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(batch.column(text_column)), r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        uniq = pc.unique(toks).to_numpy(zero_copy_only=False)
        if not len(uniq):
            return pa.table({"token": pa.array([], pa.string()),
                             "h": pa.array([], pa.int64())})
        h = md5_prefix_u64(uniq.astype(str), 15).astype(np.int64)
        order = np.argsort(h)[:k]
        return pa.table({"token": pa.array(uniq[order].tolist(), pa.string()),
                         "h": pa.array(h[order])})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def dedup_k(df: pd.DataFrame) -> pd.DataFrame:
        # the same token reaches the reducer from several batches
        return df.drop_duplicates("h").nsmallest(k, "h")[["token", "h"]]

    # batches×k rows: one tiny global fold
    return partials.repartition(1).map_batches(
        dedup_k, batch_format="pandas").sort("h").limit(k)


def kmv_estimate(sample: pd.DataFrame, k: int, *, nhex: int = 15) -> float:
    """Distinct-count estimate from a KMV sample: (k-1) / h_(k) scaled
    to the hash domain, the standard unbiased KMV estimator; returns
    the exact sample size when fewer than k distinct values exist."""
    if isinstance(sample, pa.Table):
        sample = sample.to_pandas()
    if len(sample) < k:
        return float(len(sample))
    hk = float(sample["h"].max())
    return (k - 1) * float(16 ** nhex) / hk


def _compress_weighted(v: np.ndarray, w: np.ndarray, k: int):
    """Compress sorted-by-value weighted points to ≤ ``k`` survivors at
    evenly spaced cumulative-weight targets (first and last always
    kept); each survivor keeps the total weight of the points it
    absorbs, so Σw is preserved exactly and a survivor's cumulative
    weight is within ``Σw/k`` of the true cumulative weight at its
    value."""
    if len(v) <= k:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    targets = (np.arange(1, k + 1, dtype=np.float64) / k) * total
    idx = np.unique(np.searchsorted(cw, targets, side="left"))
    idx[-1] = len(v) - 1
    idx = np.unique(idx)
    keep_cw = cw[idx]
    nw = np.diff(np.concatenate(([0.0], keep_cw)))
    return v[idx], nw


def quantile_sketch(ds, *, value: str, k: int = 256,
                    qs: tuple = (0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
                    fold_buckets: int = 64) -> pd.DataFrame:
    """ONE-PASS mergeable quantile summary (the weighted-compaction
    ε-sketch behind Spark's approxQuantile / Greenwald–Khanna style
    summaries): each batch compresses its sorted values to ``k``
    weighted points, partials fold through one bounded exchange, and
    the driver merges ``fold_buckets × k`` points — so a 100-TB column
    gets its quantiles in a single streaming scan, where
    ``ops/quantile.exact_quantiles`` needs two (its histogram-refine
    pass re-reads the column).  Rank error is ≈ Σ levels/k of the
    compaction tree (2 levels here): ``≤ ~2·n/k`` ranks — tight enough
    for trimming/binning decisions, never bit-exact (use the exact op
    when the threshold itself must be reproducible).

    Deterministic for a fixed partition layout (every merge sorts the
    full point set before compacting — arrival order never matters),
    but NOT partition-invariant: batch boundaries move the compaction
    cut points within the ±ε band.  Rows-only correctness contract:
    the ε rank bound, pinned by tests.

    Returns a DataFrame ``(q, est)`` plus an ``n`` column (exact total
    count, preserved through every compression).
    """
    from ..functions.hashing import stable_hash64

    def partial(b: pa.Table) -> pa.Table:
        x = b.column(value).to_numpy(zero_copy_only=False)
        x = x[~pd.isna(x)]
        x = np.sort(x.astype(np.float64))
        v, w = _compress_weighted(x, np.ones(len(x)), k)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64()),
                             "__fb": pa.array([], pa.int32())})
        fb = stable_hash64(repr(float(v[0])) + f":{len(v)}") % fold_buckets
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64()),
                         "__fb": pa.array(
                             np.full(len(v), fb, np.int32))})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="mergesort")
        v, w = _compress_weighted(g["v"].to_numpy(np.float64),
                                  g["w"].to_numpy(np.float64), k)
        return pd.DataFrame({"v": v, "w": w})

    pts = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("__fb").map_groups(combine, batch_format="pandas")
           .to_pandas())  # ≤ fold_buckets × k rows — bounded
    if not len(pts):
        return pd.DataFrame({"q": list(qs),
                             "est": [float("nan")] * len(qs),
                             "n": [0] * len(qs)})
    pts = pts.sort_values("v", kind="mergesort")
    v = pts["v"].to_numpy(np.float64)
    w = pts["w"].to_numpy(np.float64)
    cw = np.cumsum(w)
    n = cw[-1]
    est = [float(v[np.searchsorted(cw, q * n, side="left")
                   .clip(0, len(v) - 1)]) for q in qs]
    return pd.DataFrame({"q": list(qs), "est": est,
                         "n": [int(round(n))] * len(qs)})
