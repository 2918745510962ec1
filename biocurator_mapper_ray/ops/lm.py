"""N-gram language-model-style scoring signals.

No reference equivalent (biocurator_mapper scores candidates with an
LLM, ``app/openai_matcher.py``); this is the corpus-statistics analog a
pretraining-data pipeline uses to flag low-likelihood text: per-document
counts of bigrams that are RARE in the whole corpus (the integer
evidence behind an OOV-rate / perplexity proxy — integers so the oracle
hashes exactly; a float log-prob sum would be summation-order-dependent
across engines).

Plan — ONE all-to-all on lean (doc_id, bigram) pairs:

1. map: tokenize (lower + whitespace split, empties dropped — the
   repo-wide oracle tokenizer), build consecutive-token bigrams with
   Arrow's ``binary_join_element_wise`` (zero per-row Python), emit
   (doc_id, bigram, bucket=hash(bigram)%B).  Per-doc TOTAL bigram
   counts are computed map-side (a row is a whole document) and never
   shuffled with the text.
2. groupby(bucket): a bigram's every occurrence co-locates, so its
   in-bucket count IS its corpus count; keep occurrences of bigrams
   with count < min_count and reduce to per-doc partial rare-counts.
3. union the (doc_id, total, 0) and (doc_id, 0, rare) partials and sum
   per doc — a join expressed as a groupby, no second exchange of wide
   rows.

Buckets follow ``derive_buckets`` so one bucket's pandas frame stays
bounded at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column
from .join import derive_buckets

# must match __ray_entry__._WS_CLASS / the DuckDB regexp_split oracles
WS_CLASS = "[ \\t\\n\\r\\f\\x0b]+"


def _doc_bigrams(batch: pa.Table, *, id_column: str, text_column: str):
    """(parent_idx, bigram StringArray, nonempty-token count per row)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_column)), WS_CLASS)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    offs = toks.offsets.to_numpy()
    parent = np.repeat(np.arange(len(toks), dtype=np.int64), np.diff(offs))
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parent = parent[nonempty]
    tok_counts = np.bincount(parent, minlength=len(toks)).astype(np.int64)
    if len(parent) < 2:
        return parent[:0], pa.array([], pa.string()), tok_counts
    same = parent[:-1] == parent[1:]
    bigrams = pc.binary_join_element_wise(
        flat.slice(0, len(flat) - 1), flat.slice(1), " ").filter(
            pa.array(same))
    return parent[:-1][same], bigrams, tok_counts


def rare_bigram_stats(ds, *, id_column: str = "doc_id",
                      text_column: str = "text", min_count: int = 5,
                      buckets: int | None = None,
                      size_hint: int | None = None):
    """Per-document (total_bigrams, rare_bigrams) where a bigram is rare
    when its CORPUS occurrence count is below ``min_count``.  Documents
    with fewer than two tokens come back with (0, 0).
    """
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())

    def explode(batch: pa.Table) -> pa.Table:
        parent, bigrams, _ = _doc_bigrams(
            batch, id_column=id_column, text_column=text_column)
        ids = batch.column(id_column).take(pa.array(parent))
        kb = (hash64_column(bigrams) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({id_column: ids, "bigram": bigrams,
                         "__kb": pa.array(kb)})

    def totals(batch: pa.Table) -> pa.Table:
        _, _, tok_counts = _doc_bigrams(
            batch, id_column=id_column, text_column=text_column)
        return pa.table({
            id_column: batch.column(id_column),
            "total_bigrams": pa.array(np.maximum(tok_counts - 1, 0)),
            "rare_bigrams": pa.array(np.zeros(len(batch), dtype=np.int64)),
        })

    def rare_in_bucket(g: pd.DataFrame) -> pa.Table:
        # typed Arrow output: the union side is Arrow-blocked, and an
        # empty pandas frame would both mismatch block types and lose
        # the id dtype
        id_type = (pa.string() if g[id_column].dtype == object
                   else pa.from_numpy_dtype(g[id_column].dtype))
        empty = pa.table({id_column: pa.array([], id_type),
                          "total_bigrams": pa.array([], pa.int64()),
                          "rare_bigrams": pa.array([], pa.int64())})
        if g.empty:
            return empty
        cnt = g["bigram"].map(g["bigram"].value_counts())
        rare = g.loc[cnt.to_numpy() < min_count, id_column] \
                .value_counts().reset_index()
        if not len(rare):
            return empty
        return pa.table({
            id_column: pa.array(rare[id_column], id_type),
            "total_bigrams": pa.array(
                np.zeros(len(rare), dtype=np.int64)),
            "rare_bigrams": pa.array(
                rare["count"].to_numpy(dtype=np.int64)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    rare_partials = exploded.groupby("__kb").map_groups(
        lambda g: rare_in_bucket(g.drop(columns="__kb")),
        batch_format="pandas")
    per_doc = ds.map_batches(totals, batch_format="pyarrow") \
                .union(rare_partials)
    out = per_doc.groupby(id_column).sum(
        ["total_bigrams", "rare_bigrams"])
    return out.map_batches(
        lambda t: t.rename_columns([id_column, "total_bigrams",
                                    "rare_bigrams"]),
        batch_format="pyarrow")


def collocation_stats(ds, *, id_column: str = "doc_id",
                      text_column: str = "text", min_count: int = 5):
    """Collocation evidence: for every adjacent-token bigram with
    corpus count ≥ ``min_count``, the exact INTEGER tuple
    (w1, w2, n_pair, n_w1, n_w2, n_tokens) under which every standard
    association score — PMI, log-likelihood ratio, t-score — is a pure
    driver-side float expression.  The vocabulary-building diagnostic
    ("which token pairs deserve a merged vocab entry").

    Scale shape: ONE tokenize pass emits per-batch (token, c) partials
    (vocab-scale lean rows, text never shuffles), materialized once and
    consumed twice (total-token fold + unigram combine); bigram-count
    partials take one vocab-scale exchange, and the ``min_count``
    filter makes survivors result-scale — only THEIR word counts come
    back to the driver (map-side membership against the broadcast
    survivor-word set).
    """
    import ray as _ray

    def upart(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    uni = ds.map_batches(upart, batch_format="pyarrow").materialize()
    n_tokens = int(uni.sum("c") or 0)

    def bpart(batch: pa.Table) -> pa.Table:
        _, bigrams, _ = _doc_bigrams(batch, id_column=id_column,
                                     text_column=text_column)
        vc = pc.value_counts(bigrams)
        return pa.table({"bigram": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    big = (ds.map_batches(bpart, batch_format="pyarrow")
           .groupby("bigram").sum("c")
           .map_batches(lambda t: t.filter(pc.greater_equal(
               t.column("sum(c)"), min_count)), batch_format="pyarrow")
           .to_pandas())  # result-scale by the min_count contract
    if len(big) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in [
            ("w1", object), ("w2", object), ("n_pair", np.int64),
            ("n_w1", np.int64), ("n_w2", np.int64),
            ("n_tokens", np.int64)]})
    parts = big["bigram"].str.split(" ", n=1, expand=True)
    big["w1"], big["w2"] = parts[0], parts[1]
    needed = np.sort(pd.unique(pd.concat([big["w1"], big["w2"]])
                               .to_numpy()))
    needed_ref = _ray.put(needed)

    def only_needed(batch: pa.Table, ref=None) -> pa.Table:
        nd = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
        t = batch.column("token").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(nd, t), len(nd) - 1)
        return batch.filter(pa.array(nd[pos] == t))

    ucounts = (uni.map_batches(only_needed, fn_kwargs={"ref": needed_ref},
                               batch_format="pyarrow")
               .groupby("token").sum("c").to_pandas())
    cmap = dict(zip(ucounts["token"], ucounts["sum(c)"].astype(np.int64)))
    out = pd.DataFrame({
        "w1": big["w1"], "w2": big["w2"],
        "n_pair": big["sum(c)"].astype(np.int64),
        "n_w1": big["w1"].map(cmap).astype(np.int64),
        "n_w2": big["w2"].map(cmap).astype(np.int64),
        "n_tokens": np.int64(n_tokens),
    })
    return out.sort_values(["w1", "w2"], ignore_index=True)


def next_token_stats(ds, *, id_column: str = "doc_id",
                     text_column: str = "text", min_count: int = 5,
                     buckets: int | None = None,
                     size_hint: int | None = None):
    """Maximum-likelihood next-token table of the corpus bigram LM: for
    every prefix token ``w1`` with ≥ ``min_count`` continuations, the
    most frequent successor and its evidence — ``(w1, w2_top, n_pair,
    n_w1)`` where ``n_pair`` is the winning bigram's corpus count and
    ``n_w1`` the prefix's total continuation count (ties on count break
    to the lexicographically smallest ``w2``).  The conditional
    probability ``n_pair / n_w1`` is a reader-side ratio — integers
    only, so the result hashes exactly against the SQL oracle.  This is
    the training step of the n-gram-LM family (the model TABLE, where
    :func:`rare_bigram_stats` is the scoring side).

    Scale shape: one tokenize pass per batch emits in-batch
    pre-aggregated ``(w1, w2, c)`` partials (vocab²-bounded lean rows —
    text never shuffles), ONE hash(w1) exchange co-locates each
    prefix's partials, and the bucket task sums, filters on the prefix
    total and argmaxes — output is result-scale (one row per surviving
    prefix).  Tokens cannot contain whitespace (the split class), so
    the space-joined bigram key splits back losslessly.
    """
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())

    def bpart(batch: pa.Table) -> pa.Table:
        _, bigrams, _ = _doc_bigrams(batch, id_column=id_column,
                                     text_column=text_column)
        vc = pc.value_counts(bigrams)
        bg = vc.field("values")
        parts = pc.split_pattern(bg, " ", max_splits=1)
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        kb = (hash64_column(w1) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({"w1": w1, "w2": w2,
                         "c": pc.cast(vc.field("counts"), pa.int64()),
                         "__kb": pa.array(kb)})

    def elect(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2_top": pa.array([], pa.string()),
                          "n_pair": pa.array([], pa.int64()),
                          "n_w1": pa.array([], pa.int64())})
        if g.empty:
            return empty
        cnt = g.groupby(["w1", "w2"], as_index=False)["c"].sum()
        tot = cnt.groupby("w1")["c"].transform("sum")
        cnt = cnt[tot >= min_count].assign(n_w1=tot[tot >= min_count])
        if cnt.empty:
            return empty
        cnt = cnt.sort_values(["w1", "c", "w2"],
                              ascending=[True, False, True],
                              kind="mergesort").drop_duplicates("w1")
        return pa.table({
            "w1": pa.array(cnt["w1"], pa.string()),
            "w2_top": pa.array(cnt["w2"], pa.string()),
            "n_pair": pa.array(cnt["c"].to_numpy(np.int64)),
            "n_w1": pa.array(cnt["n_w1"].to_numpy(np.int64))})

    return (ds.map_batches(bpart, batch_format="pyarrow")
              .groupby("__kb").map_groups(
                  lambda g: elect(g.drop(columns="__kb")),
                  batch_format="pandas"))


def vocab_contingency(ds, *, group_col: str = "source",
                      text_column: str = "text", min_count: int = 50,
                      buckets: int | None = None,
                      size_hint: int | None = None):
    """Token × group contingency table: ``(token, group, n)`` counts
    for every token whose CORPUS total is ≥ ``min_count`` — the exact
    integer evidence under which corpus-drift diagnostics (KL
    divergence between sources, χ² vocabulary-shift tests, domain-
    mixture weights) are pure reader-side float expressions.

    Scale shape: one tokenize pass per batch pre-aggregates
    ``(token, group, c)`` partials in-Arrow (vocab×groups-bounded lean
    rows, text never shuffles); ONE hash(token) exchange co-locates
    each token's rows so the per-bucket corpus-total filter is exact
    and final.  Output is (surviving vocab × groups)-scale.
    """
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        grp = pc.cast(batch.column(group_col), pa.string()) \
            .take(pa.array(parent[keep]))
        t = pa.table({"token": flat, "g": grp}).group_by(
            ["token", "g"], use_threads=False).aggregate([([], "count_all")])
        t = t.rename_columns(["token", "g", "c"])
        kb = (hash64_column(t.column("token"))
              % np.uint64(n_buckets)).astype(np.int32)
        return t.append_column("__kb", pa.array(kb))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["token", "g"], as_index=False, sort=True)["c"].sum()
        tot = cnt.groupby("token")["c"].transform("sum")
        out = cnt[tot >= min_count].rename(columns={"g": group_col,
                                                    "c": "n"})
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__kb").map_groups(
                lambda g: fold(g.drop(columns="__kb")),
                batch_format="pandas"))


# ----------------------------------------------------------- BPE


def bpe_train(ds, *, text_column: str = "text", num_merges: int = 50,
              shards: int = 32) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge training (Sennrich et al. 2016),
    distributed the way production tokenizer trainers are: the ONLY
    corpus-scale pass is the exact word-count map-reduce
    (:func:`~biocurator_mapper_ray.ops.textstats.word_counts`); the
    merge loop then runs on the (word → count) dictionary — bounded by
    the corpus' distinct-word vocabulary, not its token stream, so the
    driver-side loop is vocab-scale by construction (same bound as the
    broadcast-vocab ops).

    Symbols start as single characters (no end-of-word marker — pieces
    never span words because counting is per word).  Each round merges
    the most frequent adjacent symbol pair, ties broken lexicographic
    — deterministic across runs/engines.  Stops early when no pair
    repeats.  Returns the ordered merge list for :func:`bpe_encode`.
    """
    from .textstats import word_counts

    wc = word_counts(ds, text_column=text_column, shards=shards).to_pandas()
    words = [tuple(w) for w in wc["token"].tolist()]
    counts = wc["n"].to_numpy(np.int64)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merged = a + b
        merges.append((a, b))

        def apply(syms: tuple[str, ...]) -> tuple[str, ...]:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        words = [apply(s) if a in s else s for s in words]
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with trained merges: repeatedly apply the
    lowest-rank applicable merge (the standard greedy BPE inference)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncodeStage:
    """documents batch → (id, n_words, n_pieces) with the merge table
    held per ACTOR (built once in ``__init__`` from the broadcast merge
    list) and a per-batch DISTINCT-WORD memo: each distinct word is
    encoded once per batch regardless of its frequency — the loop is
    batch-vocabulary-bounded, not token-stream-bounded."""

    def __init__(self, merges_ref, text_column: str = "text",
                 id_column: str = "doc_id"):
        import ray

        merges = merges_ref if isinstance(merges_ref, list) \
            else ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(self.text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n = len(lens)
        keep = flat != ""
        uniq, inv = np.unique(flat, return_inverse=True)
        pieces_per = np.array(
            [len(bpe_encode_word(w, self.ranks)) if w else 0
             for w in uniq.tolist()], dtype=np.int64)
        per_tok = np.where(keep, pieces_per[inv], 0)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        if len(flat):
            n_words = np.add.reduceat(keep.astype(np.int64), starts)
            n_pieces = np.add.reduceat(per_tok, starts)
        else:
            n_words = np.zeros(n, dtype=np.int64)
            n_pieces = np.zeros(n, dtype=np.int64)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "n_words": pa.array(n_words),
            "n_pieces": pa.array(n_pieces)})


def bpe_piece_counts(ds, merges, *, text_column: str = "text",
                     id_column: str = "doc_id"):
    """Per-doc BPE piece counts under trained ``merges`` — the token
    accounting an LM data pipeline budgets with.  Merges are broadcast
    once (``ray.put``) into an actor pool; see :class:`BpeEncodeStage`
    for the distinct-word memo bound."""
    import ray

    ref = ray.put(list(merges))
    return ds.map_batches(
        BpeEncodeStage, fn_constructor_args=(ref, text_column, id_column),
        batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)


def skipgram_pairs(ds, *, text_column: str = "text", window: int = 3,
                   min_count: int = 2, buckets: int | None = None,
                   size_hint: int | None = None):
    """Directional skip-gram co-occurrence counts — the GloVe/word2vec
    embedding-training prep: for every token position ``i`` and offset
    ``d`` in 1..``window`` inside one document, count the ordered pair
    ``(ws[i], ws[i+d])``; return ``(w1, w2, pair_count)`` for pairs
    whose CORPUS count is ≥ ``min_count``.

    Scale shape: a document's window pairs are batch-local (a row is a
    whole document), so the explode pass pre-aggregates in-batch with
    Arrow's C-level ``group_by`` before ONE pair-hash-bucketed exchange
    of lean (w1, w2, partial-count) rows; the ``min_count`` filter runs
    inside the bucket so only survivors leave.  No reference equivalent
    (the reference embeds with a remote model, ``app/do_embeddings.py``);
    this is the corpus-statistics path a pipeline trains its own
    embeddings from.  Buckets follow ``derive_buckets``.
    """
    n_buckets = buckets if buckets is not None else derive_buckets(
        size_hint if size_hint is not None else ds.count())
    empty = pa.table({"w1": pa.array([], pa.string()),
                      "w2": pa.array([], pa.string()),
                      "pair_count": pa.array([], pa.int64())})

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        w1_parts, w2_parts = [], []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            same = pa.array(parent[:-d] == parent[d:])
            w1_parts.append(flat.slice(0, len(flat) - d).filter(same))
            w2_parts.append(flat.slice(d).filter(same))
        if not w1_parts or not sum(len(p) for p in w1_parts):
            return empty.append_column("__kb", pa.array([], pa.int32()))
        w1 = pa.concat_arrays([p.combine_chunks() if isinstance(
            p, pa.ChunkedArray) else p for p in w1_parts])
        w2 = pa.concat_arrays([p.combine_chunks() if isinstance(
            p, pa.ChunkedArray) else p for p in w2_parts])
        agg = pa.table({"w1": w1, "w2": w2}).group_by(
            ["w1", "w2"]).aggregate([([], "count_all")])
        joined = pc.binary_join_element_wise(
            agg.column("w1"), agg.column("w2"), "\x1f")
        kb = (hash64_column(joined) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({
            "w1": agg.column("w1"), "w2": agg.column("w2"),
            "pair_count": pc.cast(agg.column("count_all"), pa.int64()),
            "__kb": pa.array(kb)})

    def fold(g: pd.DataFrame) -> pa.Table:
        if g.empty:
            return empty
        agg = (g.groupby(["w1", "w2"], sort=False)["pair_count"]
               .sum().reset_index())
        agg = agg[agg["pair_count"].to_numpy() >= min_count]
        if not len(agg):
            return empty
        return pa.table({
            "w1": pa.array(agg["w1"], pa.string()),
            "w2": pa.array(agg["w2"], pa.string()),
            "pair_count": pa.array(
                agg["pair_count"].to_numpy(dtype=np.int64))})

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby("__kb")
            .map_groups(lambda g: fold(g.drop(columns="__kb")),
                        batch_format="pandas"))


def mask_tokens(ds, *, id_column: str = "doc_id", text_column: str = "text",
                pct: int = 15, seed: int = 7, sentinel: str = "[MASK]"):
    """Deterministic BERT-style whole-token masking: each token of the
    oracle tokenization (lower + whitespace split, empties dropped) is
    replaced by ``sentinel`` when ``md5('{id}:{pos}:{seed}') % 100 <
    pct`` — the masked-LM training-data transform, reproducible across
    engines and partitionings because the mask depends only on
    (doc_id, token position, seed).

    Returns (id, masked_text, n_tokens, n_masked).  MAP-ONLY — a row is
    a whole document, so the mask draw, replacement and text rebuild
    (ListArray + one ``binary_join``) never leave the batch; zero
    exchange at any scale.  The md5 draw goes through the shared DuckDB
    kernel, so a SQL oracle reproduces the mask bit-exactly.
    """
    from ..functions.hashing import md5_prefix_u64

    def mask(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        n = np.bincount(parent, minlength=len(toks)).astype(np.int64)
        if len(parent):
            # 1-based position within the doc, vectorized
            doc_off = np.concatenate([[0], np.cumsum(n)])
            pos = np.arange(len(parent), dtype=np.int64) \
                - doc_off[parent] + 1
            ids = batch.column(id_column).take(pa.array(parent))
            keys = pc.binary_join_element_wise(
                pc.cast(ids, pa.string()), pa.array(
                    pos.astype(str), pa.string()),
                str(seed), ":")
            masked = (md5_prefix_u64(keys, 15)
                      % np.uint64(100)) < np.uint64(pct)
            out_toks = pc.if_else(pa.array(masked), sentinel, flat)
            n_masked = np.bincount(parent[masked],
                                   minlength=len(toks)).astype(np.int64)
        else:
            out_toks = flat
            n_masked = np.zeros(len(toks), dtype=np.int64)
        out_vals = (out_toks if isinstance(out_toks, pa.Array)
                    else out_toks.combine_chunks())
        offs64 = np.concatenate([[0], np.cumsum(n)])
        if offs64[-1] < 2**31:  # mirror pack.chunk_spans' offset guard
            lists = pa.ListArray.from_arrays(
                pa.array(offs64, pa.int32()), out_vals)
        else:
            lists = pa.LargeListArray.from_arrays(
                pa.array(offs64, pa.int64()), pc.cast(
                    out_vals, pa.large_string()))
        return pa.table({
            id_column: batch.column(id_column),
            "masked_text": pc.binary_join(lists, " "),
            "n_tokens": pa.array(n),
            "n_masked": pa.array(n_masked),
        })

    return ds.map_batches(mask, batch_format="pyarrow")


def span_corrupt(ds, *, id_column: str = "doc_id",
                 text_column: str = "text", seg_tokens: int = 16,
                 span_tokens: int = 4, seed: int = 11):
    """T5-style span corruption, fully deterministic: each COMPLETE
    ``seg_tokens`` segment of a document contributes one masked span of
    ``span_tokens`` tokens at offset ``md5('{id}:{k}:{seed}') %
    (seg−span+1)`` inside segment ``k``; the corrupted text replaces
    each span with its ``<extra_id_k>`` sentinel and the target text is
    the sentinel-prefixed span sequence — the seq2seq denoising
    training pair (Raffel et al. 2020), reproducible across engines and
    partitionings.

    Returns (id, corrupted_text, target_text, n_spans); documents
    shorter than one segment pass through unmasked with an empty
    target.  MAP-ONLY: span draw, replacement and both text rebuilds
    happen in-batch (the target's sentinel-before-span interleave is a
    single lexsort on (doc, 2·pos+flag) keys); zero exchange.  The md5
    draw uses the shared DuckDB kernel, so a SQL oracle mirrors both
    output strings bit-exactly.
    """
    from ..functions.hashing import md5_prefix_u64

    S, L = seg_tokens, span_tokens
    if not 0 < L < S:
        raise ValueError("need 0 < span_tokens < seg_tokens")

    def _join_lists(vals: np.ndarray, counts: np.ndarray) -> pa.Array:
        offs = np.concatenate([[0], np.cumsum(counts)])
        arr = pa.array(vals, pa.string())
        if offs[-1] < 2**31:
            lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), arr)
        else:
            lists = pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()), pc.cast(arr, pa.large_string()))
        return pc.binary_join(lists, " ")

    def corrupt(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        n = np.bincount(parent, minlength=len(toks)).astype(np.int64)
        n_spans = n // S
        if len(parent) == 0:
            return pa.table({
                id_column: batch.column(id_column),
                "corrupted_text": pa.array([""] * len(toks), pa.string()),
                "target_text": pa.array([""] * len(toks), pa.string()),
                "n_spans": pa.array(n_spans)})

        doc_off = np.concatenate([[0], np.cumsum(n)])
        i = np.arange(len(parent), dtype=np.int64) - doc_off[parent]
        k = i // S
        within = i - k * S
        ids = batch.column(id_column).take(pa.array(parent))
        keys = pc.binary_join_element_wise(
            pc.cast(ids, pa.string()),
            pa.array(k.astype(str), pa.string()), str(seed), ":")
        off = (md5_prefix_u64(keys, 15)
               % np.uint64(S - L + 1)).astype(np.int64)
        in_span_seg = k < n_spans[parent]
        masked = in_span_seg & (within >= off) & (within < off + L)
        start = in_span_seg & (within == off)

        tok_np = flat.to_numpy(zero_copy_only=False)
        maxk = int(k[start].max()) + 1 if start.any() else 1
        lut = np.array([f"<extra_id_{j}>" for j in range(maxk)],
                       dtype=object)

        keep = (~masked) | start
        corr_vals = np.where(start[keep], lut[np.minimum(k[keep], maxk - 1)],
                             tok_np[keep])
        corrupted = _join_lists(corr_vals, np.bincount(
            parent[keep], minlength=len(toks)))

        # target: sentinel sorts immediately before its span's tokens
        p_t = np.concatenate([parent[start], parent[masked]])
        key_t = np.concatenate([2 * i[start], 2 * i[masked] + 1])
        val_t = np.concatenate([lut[k[start]], tok_np[masked]])
        order = np.lexsort((key_t, p_t))
        target = _join_lists(val_t[order], np.bincount(
            p_t, minlength=len(toks)))

        return pa.table({
            id_column: batch.column(id_column),
            "corrupted_text": corrupted,
            "target_text": target,
            "n_spans": pa.array(n_spans)})

    return ds.map_batches(corrupt, batch_format="pyarrow")


def _join_token_lists(vals, counts: np.ndarray) -> pa.Array:
    """Join per-doc token slices back into one string per doc (space
    separator), with the repo-wide int32→int64 list-offset guard."""
    offs = np.concatenate([[0], np.cumsum(counts)])
    arr = vals if isinstance(vals, pa.Array) else pa.array(vals, pa.string())
    if offs[-1] < 2**31:
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), arr)
    else:
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), pc.cast(arr, pa.large_string()))
    return pc.binary_join(lists, " ")


def fim_split(ds, *, id_column: str = "doc_id", text_column: str = "text",
              seed: int = 13):
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"):
    split each document's token sequence at two deterministic cut
    points into (prefix, middle, suffix) so the trainer can emit the
    PSM/SPM rearrangement.  Cut points are ``md5('{id}:a:{seed}') %
    (n+1)`` and ``md5('{id}:b:{seed}') % (n+1)`` (lo = min, hi = max)
    over the oracle tokenization (lower + whitespace split, empties
    dropped) — reproducible across engines and partitionings because
    the draw depends only on (doc_id, seed).

    Returns (id, prefix_text, middle_text, suffix_text, n_tokens,
    cut_lo, cut_hi).  MAP-ONLY: the cut draw, the three mask selections
    and the three text rebuilds all happen in-batch; zero exchange at
    any scale.  The md5 draw uses the shared DuckDB kernel, so a SQL
    oracle mirrors all three output strings bit-exactly.
    """
    from ..functions.hashing import md5_prefix_u64

    def split(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), WS_CLASS)
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        n = np.bincount(parent, minlength=len(toks)).astype(np.int64)

        ids_str = pc.cast(batch.column(id_column), pa.string())
        c1 = (md5_prefix_u64(pc.binary_join_element_wise(
            ids_str, "a", str(seed), ":"), 15)
            % (n + 1).astype(np.uint64)).astype(np.int64)
        c2 = (md5_prefix_u64(pc.binary_join_element_wise(
            ids_str, "b", str(seed), ":"), 15)
            % (n + 1).astype(np.uint64)).astype(np.int64)
        lo = np.minimum(c1, c2)
        hi = np.maximum(c1, c2)

        if len(parent):
            doc_off = np.concatenate([[0], np.cumsum(n)])
            i = np.arange(len(parent), dtype=np.int64) - doc_off[parent]
            pre = i < lo[parent]
            mid = (~pre) & (i < hi[parent])
            suf = i >= hi[parent]
            tok_np = flat.to_numpy(zero_copy_only=False)
            parts = [
                _join_token_lists(tok_np[m], np.bincount(
                    parent[m], minlength=len(toks)))
                for m in (pre, mid, suf)]
        else:
            empty = pa.array([""] * len(toks), pa.string())
            parts = [empty, empty, empty]

        return pa.table({
            id_column: batch.column(id_column),
            "prefix_text": parts[0],
            "middle_text": parts[1],
            "suffix_text": parts[2],
            "n_tokens": pa.array(n),
            "cut_lo": pa.array(lo),
            "cut_hi": pa.array(hi),
        })

    return ds.map_batches(split, batch_format="pyarrow")


# ---------------------------------------------------------------- nucleus

def vocab_coverage(ds, *, text_column: str = "text", p_bp: int = 9000,
                   max_partial: int = 1_000_000):
    """Nucleus (top-p) vocabulary truncation: the smallest
    (count DESC, token ASC)-ranked prefix of the vocabulary covering
    ``p_bp``/10000 of all token occurrences — the standard vocabulary
    cut for tokenizer training / OOV budgeting.  Returns the kept
    (token, n) rows, sorted (n DESC, token ASC).

    Membership rule (integer-exact on both engines): token ``t`` is
    kept iff ``10000 * cum_before(t) < p_bp * total`` where
    ``cum_before`` is the occurrence mass ranked strictly before ``t``.

    Scale shape — no global ordered prefix sum is materialized:

    1. :func:`~biocurator_mapper_ray.ops.textstats.word_counts` builds
       the (token, n) table (one salted vocab-scale exchange).
    2. A count-VALUE-scale rollup (distinct count values ≤ max doc
       frequency — thousands, not vocabulary-scale) comes to the
       driver; suffix sums over it decide, per count value ``n``, how
       many of its tokens are kept (``k_n``), exactly.
    3. Count values fully inside the nucleus pass a broadcast-set
       filter map-side; only the BOUNDARY groups (0 < k_n < group
       size, normally exactly one) go through a per-group
       lexicographic min-k — map-side partial head-k, then one
       boundary-scale ``map_groups`` final.

    ``max_partial`` caps the boundary selection (a p→1 cut whose
    boundary lands in the n=1 long tail would otherwise pull
    vocabulary-scale rows through the min-k); past it the op raises
    rather than silently truncating.
    """
    import warnings

    from .textstats import word_counts

    counts = word_counts(ds, text_column=text_column)

    def per_n_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["n"]).group_by(["n"], use_threads=False).aggregate(
            [("n", "count")])
        return g.rename_columns(["n", "toks"])

    pn = counts.map_batches(per_n_partial, batch_format="pyarrow").groupby(
        "n").sum("toks").to_pandas()
    if pn.empty or "n" not in pn.columns:  # empty corpus
        return counts
    pn = pn.rename(columns={"sum(toks)": "toks"}).sort_values(
        "n", ascending=False).reset_index(drop=True)
    ns = pn["n"].to_numpy(np.int64)
    toks = pn["toks"].to_numpy(np.int64)
    mass = ns * toks
    total = int(mass.sum())
    if total == 0:
        return counts.sort(["n", "token"], descending=[True, False])
    cum_before = np.concatenate([[0], np.cumsum(mass)[:-1]])
    num = np.int64(p_bp) * total - np.int64(10000) * cum_before
    k = np.where(num <= 0, 0, -(-num // (np.int64(10000) * ns)))
    k = np.minimum(k, toks).astype(np.int64)

    full_ns = ns[(k > 0) & (k == toks)].tolist()
    partial_mask = (k > 0) & (k < toks)
    partial_k = dict(zip(ns[partial_mask].tolist(), k[partial_mask].tolist()))
    if partial_k and sum(partial_k.values()) > max_partial:
        raise ValueError(
            f"vocab_coverage boundary selection needs "
            f"{sum(partial_k.values())} rows (> max_partial="
            f"{max_partial}); p_bp={p_bp} cuts too deep into the "
            f"long tail — lower p_bp or raise max_partial")

    full_set = pa.array(full_ns, pa.int64())

    def keep_full(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("n"), value_set=full_set))

    kept = counts.map_batches(keep_full, batch_format="pyarrow")
    if partial_k:
        pmax = partial_k

        def head_k(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["n"].isin(pmax)]
            if not len(df):
                return df
            df = df.sort_values(["n", "token"])
            return df.groupby("n", sort=False, group_keys=False).apply(
                lambda g: g.head(pmax[int(g["n"].iloc[0])]))

        def head_k_arrow(df: pd.DataFrame) -> pa.Table:
            # arrow output so the union with the arrow-block full
            # branch stays homogeneous
            return pa.Table.from_pandas(
                head_k(df), preserve_index=False).replace_schema_metadata(None)

        cands = counts.map_batches(head_k, batch_format="pandas")
        boundary = cands.groupby("n").map_groups(
            head_k_arrow, batch_format="pandas")
        kept = kept.union(boundary)
    return kept.sort(["n", "token"], descending=[True, False])
