"""Dataset curation primitives: deterministic sampling / train-test
splits and distribution histograms.

A training-data pipeline needs reproducible subsetting that is stable
across runs, engines and partitionings — so sampling here is keyed
content hashing, not RNG state: a row's fate depends only on its id and
the seed.  The md5-derived variant is byte-identical to DuckDB
(``CAST('0x' || substr(md5(...), 1, 16) AS UBIGINT)``), giving these
ops exact SQL oracles.

* :func:`hash_sample` — keep rows whose keyed hash lands under
  ``pct``; O(1) state, no shuffle, exact same subset on any cluster.
* :func:`hash_split` — disjoint train/test assignment from the same
  hash (test = the sampled stratum, train = the rest).
* :func:`length_histogram` — bucketed distribution of a numeric
  expression (e.g. whitespace token counts) via map-side partial
  counts + one tiny groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column, md5_prefix_u64


def _md5_bucket(values, buckets: int, seed: int) -> np.ndarray:
    """Deterministic bucket in [0, buckets) from md5 of ``seed:value``
    (first 16 hex chars → uint64 — DuckDB-reproducible); vectorized via
    the shared DuckDB md5 kernel, no per-row Python."""
    h = md5_prefix_u64(values, 16, prefix=f"{seed}:")
    return (h % np.uint64(buckets)).astype(np.int64)


def hash_sample(ds, *, key_column: str = "doc_id", pct: int = 20,
                seed: int = 42, buckets: int = 100):
    """Keep rows whose md5 bucket < ``pct`` — a deterministic ~pct%
    sample, identical on any engine/partitioning."""

    def keep(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_column), buckets, seed)
        return batch.filter(pa.array(b < pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds, *, key_column: str = "doc_id", test_pct: int = 10,
               seed: int = 42, buckets: int = 100):
    """Append a ``split`` column ('test' for the sampled stratum,
    'train' otherwise) — disjoint and exhaustive by construction."""

    def tag(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_column), buckets, seed)
        split = np.where(b < test_pct, "test", "train")
        return batch.append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def grouped_split(ds, *, group_column: str, test_pct: int = 10,
                  seed: int = 42, buckets: int = 100,
                  out_column: str = "split"):
    """Leakage-safe train/test split: EVERY row of a group (source,
    domain, near-dup cluster id) lands on the same side, so a test
    example can never share its group — and therefore its likely
    near-duplicates — with training data.  Same md5 device as
    :func:`hash_split`, keyed on the group VALUE instead of the row id:
    still map-side only (the group key is hashed per row, no exchange
    to co-locate groups), so it composes with any upstream partitioning
    at 100-TB scale."""

    def tag(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(group_column), buckets, seed)
        split = np.where(b < test_pct, "test", "train")
        return batch.append_column(
            out_column, pa.array(split.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def kfold_split(ds, *, key_column: str = "doc_id", k: int = 5,
                seed: int = 42, out_column: str = "fold"):
    """K-fold cross-validation assignment: ``fold = md5(seed:key) % k``
    — disjoint, exhaustive, reproducible on any engine/partitioning,
    and map-side only.  Key on a GROUP column instead of the row id for
    the leakage-safe grouped variant (same contract as
    :func:`grouped_split`)."""

    def tag(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_column), k, seed)
        return batch.append_column(out_column, pa.array(b, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")


def stratified_sample(ds, *, key_column: str = "doc_id",
                      group_column: str, pct_by_group: dict[str, int],
                      default_pct: int = 0, seed: int = 42,
                      buckets: int = 100):
    """Per-group deterministic sampling: each row's keep-probability is
    its group's entry in ``pct_by_group`` (percent, 0-100; groups absent
    from the map get ``default_pct``).  The curation primitive for
    rebalancing a corpus — e.g. keep 100% of a rare language, 10% of
    the dominant one — with the same md5-keyed determinism as
    :func:`hash_sample`: a row's fate depends only on (seed, key), so
    the subset is identical on any engine or partitioning, and
    membership is monotone in pct (raising a group's pct only ADDS
    rows — stable incremental curation).

    Map-side only: no shuffle, O(1) state; the group→pct map rides into
    each task as a closure (it is group-cardinality-sized, i.e. tiny).
    """

    def keep(batch: pa.Table) -> pa.Table:
        b = _md5_bucket(batch.column(key_column), buckets, seed)
        groups = batch.column(group_column).to_pylist()
        cut = np.fromiter(
            (pct_by_group.get(g, default_pct) for g in groups),
            count=len(groups), dtype=np.int64,
        )
        return batch.filter(pa.array(b < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def length_histogram(ds, *, column: str = "text", bucket_width: int = 50):
    """Histogram of whitespace token counts: (bucket_lo, n_docs) rows,
    bucket_lo = floor(n_tokens / width) * width.

    Map-side partial counts per batch, then one tiny groupby over at
    most (max_len / width) rows per batch — the exchange is bounded by
    the histogram's support, not the corpus.
    """

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(column)
        trimmed = pc.utf8_trim_whitespace(text)
        ws = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        empty = pc.equal(pc.utf8_length(trimmed), 0)
        ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
        n = ws.to_numpy(zero_copy_only=False).astype(np.int64)
        lo = (n // bucket_width) * bucket_width
        uniq, counts = np.unique(lo, return_counts=True)
        return pa.table({"bucket_lo": pa.array(uniq),
                         "n_docs": pa.array(counts.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # final combine keyed by the bucket itself: the exchange carries
    # (batches × support) partial rows spread over support-many groups —
    # no single-task fan-in even when the corpus has millions of batches
    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby("bucket_lo", sort=True)["n_docs"].sum().reset_index()

    return partials.groupby("bucket_lo").map_groups(combine, batch_format="pandas")


def budget_sample(ds, *, group_column: str, budget: int,
                  value_column: str, key_column: str = "doc_id",
                  seed: int = 42, shards: int = 32):
    """Keep, per group, the md5-lowest rows whose RUNNING value total
    stays under ``budget`` — "cap each source at N tokens/chars", the
    mixture-control knob of corpus assembly (a quota counts documents;
    a budget counts the quantity training actually consumes).

    Keep rule: a row survives iff the summed values of rows BEFORE it
    (same group, ``(md5(seed:key), key)`` ascending) are < ``budget`` —
    so a group's first row always survives even if oversized, and the
    kept set is engine- and partitioning-invariant with an exact SQL
    window-sum oracle.  Emits ``cum_before`` (that exact prefix sum).

    Combiner push-down (exact, not heuristic): a batch's survivors are
    its own budget-feasible prefix per group.  Any batch-dropped row d
    has batch-prefix ≥ budget, which means SURVIVING batch rows before
    d already sum ≥ budget and all precede d (hence any global row
    after d) in key order — so rows the batch drops can neither survive
    globally nor shift a global survivor's prefix.  The single salted
    exchange therefore ships only per-batch feasible prefixes
    (≈ batches × (budget / mean value + 1) rows per group), never the
    corpus, and the merge recomputes exact global prefixes from
    survivors alone.
    """

    def key60(vals) -> np.ndarray:
        return md5_prefix_u64(vals, 15, prefix=f"{seed}:").astype(np.int64)

    def feasible(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_column, "__qkey", key_column],
                            kind="mergesort")
        v = df[value_column].to_numpy().astype(np.int64)
        cum = df.groupby(group_column, sort=False)[value_column].cumsum(
        ).to_numpy().astype(np.int64)
        df = df.assign(cum_before=cum - v)
        return df[df["cum_before"] < budget]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["__qkey"] = key60(df[key_column].to_list())
        df = feasible(df).drop(columns="cum_before")
        gcol = df[group_column]
        salt = (hash64_column(pa.Array.from_pandas(gcol.astype(str))
                              if gcol.dtype == object
                              else pa.Array.from_pandas(gcol))
                % np.uint64(shards)).astype(np.int32)
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("__s", pa.array(salt))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return feasible(group.drop(columns="__s")).drop(columns="__qkey")

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__s")
              .map_groups(merge, batch_format="pandas"))


def quota_sample(ds, *, group_column: str, quota: int,
                 key_column: str = "doc_id", seed: int = 42,
                 shards: int = 32):
    """Keep at most ``quota`` rows per group, chosen deterministically
    by md5 order — the per-domain / per-source cap every web-scale
    curation pipeline applies (don't let one domain dominate the
    corpus).

    Selection key is ``md5(seed:key)``'s first 15 hex chars as int64
    (60 bits — sign-safe in both numpy and DuckDB), ascending, ties by
    ``key_column``: a row's fate depends only on (seed, key, its
    group's other members), so the subset is engine- and
    partitioning-invariant and SQL-checkable.  Distribution is
    :func:`~biocurator_mapper_ray.ops.rank.top_k_per_group`'s combiner
    push-down — the exchange ships ≤ batches×groups×quota rows.  Adds
    ``rn`` (1-based rank within the group's kept rows).
    """
    from .rank import top_k_per_group

    def key(batch: pa.Table) -> pa.Table:
        ks = md5_prefix_u64(batch.column(key_column), 15,
                            prefix=f"{seed}:").astype(np.int64)
        return batch.append_column("__qkey", pa.array(ks))

    out = top_k_per_group(
        ds.map_batches(key, batch_format="pyarrow"),
        group_column, "__qkey", quota,
        ascending=True, tiebreak_col=key_column, shards=shards,
    )
    return out.drop_columns(["__qkey"])


def hash_top_k(ds, *, key_column: str = "doc_id", k: int = 100,
               seed: int = 42):
    """Exact-k deterministic global sample: the k rows with the
    smallest md5(seed:key) — the distributed, partition-invariant
    equivalent of reservoir sampling (``ORDER BY md5(...) LIMIT k``).

    Combiner push-down: each batch keeps only ITS k smallest keys, so
    the final sort+limit sees ≤ batches×k rows, never the corpus.
    """
    def partial(batch: pa.Table) -> pa.Table:
        h = md5_prefix_u64(batch.column(key_column), 16, prefix=f"{seed}:")
        batch = batch.append_column("__mk", pa.array(h))
        if len(batch) > k:
            idx = np.lexsort((batch.column(key_column).to_numpy(
                zero_copy_only=False), h))[:k]
            batch = batch.take(pa.array(np.sort(idx)))
        return batch

    out = ds.map_batches(partial, batch_format="pyarrow")
    return (out.sort(["__mk", key_column]).limit(k)
            .drop_columns(["__mk"]))


def weighted_sample(ds, *, weight_column: str, key_column: str = "doc_id",
                    denominator: int = 1000, seed: int = 42):
    """Deterministic weighted Bernoulli sample: keep each row with
    probability ``weight/denominator`` exactly — the source up/down-
    weighting primitive of a mixture-curation pipeline (keep probability
    ∝ a per-row quality/priority weight).

    Keep rule: ``md5_u64(seed:key) % denominator < weight`` (weights
    clamped to [0, denominator]) — all-integer, so the decision is
    reproducible on any engine/partitioning and has an exact SQL
    oracle; rows with weight ≥ denominator are always kept, weight ≤ 0
    never.  Pure map-side filter: ZERO exchange, streams at any scale.
    """

    def keep(batch: pa.Table) -> pa.Table:
        h = md5_prefix_u64(batch.column(key_column), 16, prefix=f"{seed}:")
        draw = (h % np.uint64(denominator)).astype(np.int64)
        w = pc.cast(batch.column(weight_column), pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(draw < w))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_top_k_per_group(ds, *, group_column: str, key_column: str = "doc_id",
                         k: int = 10, seed: int = 42,
                         buckets: int | None = None,
                         size_hint: int | None = None):
    """Exact-k deterministic sample PER GROUP: each group's k rows with
    the smallest md5(seed:key) — the balanced per-language / per-domain
    sample a mixture pipeline takes (SQL ``QUALIFY row_number() OVER
    (PARTITION BY g ORDER BY md5, key) <= k``), partition-invariant by
    construction.

    Combiner push-down: each batch keeps only ITS k smallest keys per
    group it saw, so the group-bucketed exchange ships ≤ groups×batches×k
    rows, never the corpus; the per-bucket finish replays the same
    (md5, key) order over candidates only.
    """
    from ..functions.hashing import hash64_column

    from .join import derive_buckets

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_column, "__mk", key_column],
                            kind="mergesort")
        return df.groupby(group_column, sort=False).head(k)

    def partial(batch: pa.Table) -> pa.Table:
        h = md5_prefix_u64(batch.column(key_column), 16, prefix=f"{seed}:")
        batch = batch.append_column("__mk", pa.array(h))
        return pa.Table.from_pandas(topk(batch.to_pandas()),
                                    preserve_index=False)

    if buckets is None:
        n = size_hint if size_hint is not None else ds.count()
        buckets = derive_buckets(n)

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(group_column))
        return batch.append_column(
            "__gb", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return topk(g.drop(columns="__gb")).drop(columns="__mk")

    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__gb")
            .map_groups(finish, batch_format="pandas"))


def negative_pairs(ds, *, id_col: str, m: int = 3, seed: int = 0,
                   id_lo: int | None = None, id_n: int | None = None):
    """Deterministic random-negative mining for contrastive training:
    for every anchor row, ``m`` pseudo-random partner ids drawn from a
    DENSE integer id space ``[id_lo, id_lo + id_n)`` by keyed md5 —
    ``neg = id_lo + md5_60("seed:anchor:j") % id_n``, bumped by one
    (mod ``id_n``) when it collides with the anchor.  A row's negatives
    depend only on (id, j, seed): stable across runs, engines and
    partitionings, and exactly mirrored by a SQL oracle.

    Pure map-side (no exchange, no all-pairs): each batch expands to
    m× rows with one vectorized md5 kernel call.  The dense-id
    assumption is the documented partitioning contract — sparse id
    spaces need a rank join (``value_ranks``) from sampled positions to
    real ids first.  ``id_lo``/``id_n`` default to a one-pass
    min/count aggregate over the input.
    """
    if id_lo is None or id_n is None:
        import ray.data as rd  # noqa: F401 (aggregate below)

        agg = ds.map_batches(
            lambda t: pa.table({
                "lo": pa.array([pc.min(t.column(id_col)).as_py()],
                               pa.int64()),
                "n": pa.array([len(t)], pa.int64())}),
            batch_format="pyarrow").to_pandas()  # one row per batch
        id_lo = int(agg["lo"].min())
        id_n = int(agg["n"].sum())
    if id_n <= 1:
        raise ValueError("negative_pairs needs an id space of size >= 2")

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        anchors = np.repeat(ids, m)
        js = np.tile(np.arange(1, m + 1, dtype=np.int64), len(ids))
        keys = pc.binary_join_element_wise(
            pc.cast(pa.array(anchors), pa.string()),
            pc.cast(pa.array(js), pa.string()), ":")
        h = md5_prefix_u64(keys, 15, prefix=f"{seed}:")
        neg = id_lo + (h % np.uint64(id_n)).astype(np.int64)
        hit = neg == anchors
        if hit.any():
            neg[hit] = id_lo + ((h[hit] + np.uint64(1))
                                % np.uint64(id_n)).astype(np.int64)
        return pa.table({
            "anchor_id": pa.array(anchors, pa.int64()),
            "j": pa.array(js, pa.int64()),
            "neg_id": pa.array(neg, pa.int64()),
        })

    lean = ds.map_batches(lambda t: t.select([id_col]),
                          batch_format="pyarrow")
    return lean.map_batches(expand, batch_format="pyarrow")


def mixture_schedule(ds, *, group_column: str, key_column: str,
                     weights: dict, default_weight: int = 10000,
                     seed: int = 0):
    """Deterministic data-MIXING order: assign every row a global
    training position so that source ``g`` appears with frequency
    ∝ ``weights[g]`` (basis points) — the reproducible interleave a
    multi-source pretraining run uses instead of an RNG shuffle.

    Within each source, rows are ordered by ``md5(seed:key)`` (a
    deterministic shuffle); row ``r`` of source ``g`` is scheduled at
    ``mix_pos = r * 10000 // weights[g]``, so a weight-5000 source
    lands every 2 positions and a weight-1000 source every 10 —
    sorting by ``(mix_pos, key)`` yields the interleaved curriculum.

    Scale shape: the per-source ranking is
    :func:`~biocurator_mapper_ray.ops.rank.value_ranks` (sampled range
    boundaries + lean offset table — groups must be modest: sources,
    not users); everything else is map-side.  Returns
    (key, group, rnk, mix_pos).
    """
    from .rank import value_ranks

    def key(batch: pa.Table) -> pa.Table:
        mk = md5_prefix_u64(batch.column(key_column), 15,
                            prefix=f"{seed}:").astype(np.int64)
        return batch.append_column("__mk", pa.array(mk))

    ranked = value_ranks(ds.map_batches(key, batch_format="pyarrow"),
                         value_col="__mk", group_col=group_column)

    def pos(batch: pa.Table) -> pa.Table:
        g = batch.column(group_column).to_pandas()
        w = g.map(weights).fillna(default_weight).to_numpy(np.int64)
        rnk = batch.column("rnk").to_numpy()
        return pa.table({key_column: batch.column(key_column),
                         group_column: batch.column(group_column),
                         "rnk": batch.column("rnk"),
                         "mix_pos": pa.array(rnk * 10000 // w)})

    return ranked.map_batches(pos, batch_format="pyarrow")


def _doc_bigram_buckets(batch: pa.Table, *, text_column: str,
                        m: int, seed: int):
    """Per-document hashed-bigram buckets under the engine's lowercase
    whitespace contract.  Returns ``(buckets, doc_ptr)`` where
    ``buckets`` is the flat int64 bucket id of every bigram occurrence
    (md5-prefix parity with the DuckDB oracle expression) and
    ``doc_ptr`` are the reduceat boundaries, one slot per document
    (documents with <2 tokens own an empty slice)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(
            pc.cast(batch.column(text_column), pa.string()))),
        r"\s+")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    if len(flat) < 2:
        return (np.zeros(0, dtype=np.int64),
                np.zeros(len(lens), dtype=np.int64),
                np.zeros(len(lens), dtype=np.int64))
    # adjacent-pair join over the flat token array; positions that
    # straddle a document boundary (or touch the empty token an empty
    # text splits to) are masked out
    left = flat.slice(0, len(flat) - 1)
    right = flat.slice(1)
    pairs = pc.binary_join_element_wise(left, right, " ")
    ends = np.cumsum(lens)
    valid = np.ones(len(flat) - 1, dtype=bool)
    valid[ends[:-1] - 1] = False  # last token of each doc starts no bigram
    empty = pc.equal(flat, "").to_numpy(zero_copy_only=False)
    valid &= ~empty[:-1] & ~empty[1:]
    idx = np.flatnonzero(valid)
    bg = pc.take(pairs, pa.array(idx, type=pa.int64()))
    buckets = (md5_prefix_u64(bg, 15, prefix=f"{seed}:")
               % np.uint64(m)).astype(np.int64)
    # bigrams per doc = nonzero-token-count - 1 (clamped at 0)
    n_tok = lens - np.add.reduceat(
        empty.astype(np.int64),
        np.concatenate([[0], ends[:-1]]).astype(np.int64)) \
        if len(lens) else np.zeros(0, dtype=np.int64)
    n_bg = np.maximum(n_tok - 1, 0)
    starts = np.concatenate([[0], np.cumsum(n_bg)[:-1]]).astype(np.int64)
    return buckets, starts, n_bg


def dsir_select(ds, *, target_column: str = "lang",
                target_value: str = "en", text_column: str = "text",
                id_column: str = "doc_id", m: int = 2048, k: int = 100,
                seed: int = 7, scale: int = 1_000_000):
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) over hashed bigram features — pick the ``k`` raw
    documents whose feature distribution looks most like the target
    subset (rows where ``target_column == target_value``).

    Two streaming passes, both map-side:

    1. hashed-bigram bucket counts (``m`` buckets, md5-prefix parity
       with DuckDB) for the raw corpus and the target subset — per-batch
       ``bincount`` partials, ONE tiny ``groupby(bucket)`` exchange
       bounded by ``m``, never by rows;
    2. the ``m``-entry integer weight table is broadcast (``ray.put``)
       and every batch scores its documents with one flat
       hash + gather + ``reduceat`` pass; per-block top-k partials fold
       to ``blocks × k`` rows on the driver.

    Integer-exact contract (same convention as the engine's monetary
    cents): the paper's per-feature log-ratio is replaced by the
    fixed-point smoothed importance RATIO

        ``w[b] = (scale * (ct[b]+1) * (Tr+m)) // ((cr[b]+1) * (Tt+m))``

    computed in unbounded Python ints (HUGEINT in the oracle), and a
    document's score is the SUM of its bigram-occurrence weights — an
    order-free integer, so the whole operator hash-matches SQL.  The
    log-sum variant changes only the driver-side weight table; the
    distributed machinery (global counts, broadcast, map-side scoring,
    distributed top-k) — the part worth verifying — is identical.

    Returns the top ``k`` as (doc_id, n_bigrams, score, sel_rank)
    ordered by (score DESC, doc_id).
    """
    import ray as _ray

    def partial_counts(batch: pa.Table) -> pa.Table:
        buckets, starts, n_bg = _doc_bigram_buckets(
            batch, text_column=text_column, m=m, seed=seed)
        cr = np.bincount(buckets, minlength=m).astype(np.int64)
        tmask = pc.fill_null(
            pc.equal(pc.cast(batch.column(target_column), pa.string()),
                     target_value), False).to_numpy(zero_copy_only=False)
        t_occ = np.repeat(tmask.astype(bool), n_bg)
        ct = np.bincount(buckets[t_occ], minlength=m).astype(np.int64)
        nz = np.flatnonzero(cr)
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "cr": pa.array(cr[nz]), "ct": pa.array(ct[nz])})

    cdf = (ds.map_batches(partial_counts, batch_format="pyarrow")
             .groupby("bucket").sum(["cr", "ct"])
             .to_pandas())
    cr = np.zeros(m, dtype=np.int64)
    ct = np.zeros(m, dtype=np.int64)
    cr[cdf["bucket"].to_numpy()] = cdf["sum(cr)"].to_numpy()
    ct[cdf["bucket"].to_numpy()] = cdf["sum(ct)"].to_numpy()
    tr, tt = int(cr.sum()), int(ct.sum())
    # unbounded-int weight fold (m entries, driver-side): int64 would
    # overflow scale * ct * Tr at corpus scale
    w = np.fromiter(
        ((scale * (int(ct[b]) + 1) * (tr + m))
         // ((int(cr[b]) + 1) * (tt + m)) for b in range(m)),
        dtype=np.int64, count=m)
    wref = _ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wt = _ray.get(wref) if not isinstance(wref, np.ndarray) else wref
        buckets, starts, n_bg = _doc_bigram_buckets(
            batch, text_column=text_column, m=m, seed=seed)
        occ = wt[buckets]
        # reduceat needs strictly-valid boundaries; empty slices (docs
        # with <2 tokens) are zeroed explicitly
        if len(occ):
            s = np.add.reduceat(occ, np.minimum(starts, len(occ) - 1))
            s = np.where(n_bg > 0, s, 0)
        else:
            s = np.zeros(len(n_bg), dtype=np.int64)
        keep = n_bg > 0
        return pa.table({
            id_column: pc.take(batch.column(id_column),
                               pa.array(np.flatnonzero(keep))),
            "n_bigrams": pa.array(n_bg[keep]),
            "score": pa.array(s[keep])})

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["score", id_column], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = (ds.map_batches(score, batch_format="pyarrow")
               .map_batches(local_topk, batch_format="pyarrow")
               .to_pandas())
    out = (parts.sort_values(["score", id_column],
                             ascending=[False, True])
                .head(k).reset_index(drop=True))
    out["sel_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out
