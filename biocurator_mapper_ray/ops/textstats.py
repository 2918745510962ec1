"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All vectorized (pyarrow.compute / pandas str
kernels / precompiled regex); designed so that the SQL-expressible ones
have exact DuckDB oracles (see __ray_entry__.oracle_sql):

* whitespace token count  ↔ ``array_length(regexp_split_to_array(trim(text),'\\s+'))``
* char/punct/digit counts ↔ ``length(regexp_replace(...))``
* md5 fingerprint         ↔ ``md5(lower(trim(text)))``
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish word/number/punct tokenizer (GPT-2-style contraction handling,
# public pattern shape; no external tokenizer dependency)
_BPEISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"
_DIGIT_CLASS = r"[0-9]"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "was", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "von"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "du", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "de", "para", "en", "que", "por"},
}
_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def token_counts(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """(id cols) + n_tokens_ws (whitespace) + n_tokens_bpe (regex-BPE-ish)."""
    text = batch.column(text_column)
    ws = pc.list_value_length(pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+"))
    # empty/whitespace-only text → 0 (split of "" yields [""] → fix up)
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
    ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
    texts = text.to_pylist()
    bpe = np.fromiter(
        (len(_BPEISH.findall(t or "")) for t in texts), count=len(texts), dtype=np.int64
    )
    return batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64())).append_column(
        "n_tokens_bpe", pa.array(bpe)
    )


def quality_scores(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Length/punctuation/digit/uppercase ratio features (all exact-SQL
    expressible; ratios emitted rounded to 6 so Ray and DuckDB hash equal)."""
    text = batch.column(text_column)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    no_punct = pc.replace_substring_regex(text, _PUNCT_CLASS, "")
    no_digit = pc.replace_substring_regex(text, _DIGIT_CLASS, "")
    n_punct = pc.subtract(n_chars, pc.cast(pc.utf8_length(no_punct), pa.int64()))
    n_digit = pc.subtract(n_chars, pc.cast(pc.utf8_length(no_digit), pa.int64()))
    n_upper = pc.subtract(
        n_chars,
        pc.cast(pc.utf8_length(pc.replace_substring_regex(text, r"[A-Z]", "")), pa.int64()),
    )
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    def ratio(num):
        return pc.round(pc.divide(pc.cast(num, pa.float64()), pc.cast(denom, pa.float64())), ndigits=6)
    return (
        batch.append_column("n_chars_txt", n_chars)
        .append_column("n_punct", n_punct)
        .append_column("n_digit", n_digit)
        .append_column("n_upper", n_upper)
        .append_column("punct_ratio", ratio(n_punct))
        .append_column("digit_ratio", ratio(n_digit))
        .append_column("upper_ratio", ratio(n_upper))
    )


class LangIdStage:
    """Stopword-overlap language heuristic → (``lang_pred``, ``lang_score``).

    Actor-pool stage: stopword tables and the word regex are per-actor
    state; scoring is a vocabulary-overlap vote over the first
    ``max_tokens`` words.  ``und`` (undetermined) when nothing matches.
    Ties break to the lexicographically-first language (the sorted scan
    only replaces the best on a STRICT improvement) — the SQL oracle
    mirrors this with an ordered CASE over the per-language hit counts.

    ``details=True`` additionally emits the exact integer evidence —
    ``lang_hits``, ``lang_n_words`` and per-language ``<lang>_hits`` —
    which is what the driver-checked query compares (pure int64: no
    float rounding-mode hazards between numpy and DuckDB).
    """

    def __init__(self, text_column: str = "text", max_tokens: int = 200,
                 details: bool = False):
        self.text_column = text_column
        self.max_tokens = max_tokens
        self.details = details
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.langs = sorted(self.tables)

    def _vote(self, text: str) -> tuple[str, int, int, dict[str, int]]:
        words = _WORD_RE.findall((text or "").lower())[: self.max_tokens]
        hits = {lang: sum(1 for w in words if w in self.tables[lang])
                for lang in self.langs}
        best_lang, best_hits = "und", 0
        for lang in self.langs:
            if hits[lang] > best_hits:
                best_lang, best_hits = lang, hits[lang]
        return best_lang, best_hits, len(words), hits

    def predict(self, text: str) -> tuple[str, float]:
        lang, best_hits, n_words, _ = self._vote(text)
        if not n_words or not best_hits:
            return "und", 0.0
        return lang, round(best_hits / n_words, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        votes = [self._vote(t) for t in texts]
        out = batch.append_column(
            "lang_pred", pa.array([v[0] for v in votes], pa.string())
        ).append_column(
            "lang_score",
            pa.array([round(v[1] / v[2], 6) if v[2] and v[1] else 0.0 for v in votes],
                     pa.float64()),
        )
        if self.details:
            out = out.append_column(
                "lang_hits", pa.array([v[1] for v in votes], pa.int64())
            ).append_column(
                "lang_n_words", pa.array([v[2] for v in votes], pa.int64())
            )
            for lang in self.langs:
                out = out.append_column(
                    f"{lang}_hits", pa.array([v[3][lang] for v in votes], pa.int64())
                )
        return out


def word_counts(ds, *, text_column: str = "text", top_k: int | None = None,
                shards: int = 32):
    """Exact corpus word counts (the canonical map-reduce): batch-local
    Arrow token explode + ``group_by`` partial counts, then a salted
    exchange keyed by token hash with a vectorized per-shard combine.
    ``top_k`` sorts by (count DESC, token ASC) and truncates — the
    deterministic heavy-hitters view.

    Scale shape: the exchange carries per-batch PARTIAL counts (bounded
    by each batch's distinct vocabulary, not its token stream) and the
    shard combine is one pandas groupby over its vocabulary slice.
    """
    import numpy as np

    from ..functions.hashing import hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_trim_whitespace(pc.utf8_lower(batch.column(text_column))),
                r"\s+",
            )
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"token": toks})
        g = t.group_by(["token"], use_threads=False).aggregate([("token", "count")])
        g = g.rename_columns(["token", "n"])
        salt = (hash64_column(g.column("token")) % np.uint64(shards)).astype(np.int32)
        return g.append_column("__s", pa.array(salt))

    def combine(group):
        group = group.drop(columns="__s")
        out = group.groupby("token", sort=False)["n"].sum().reset_index(name="n")
        if top_k is not None:
            # a global top-k member is necessarily in its shard's top-k
            # (tokens never split across shards), so the final sort sees
            # shards×top_k rows instead of the whole vocabulary
            out = out.sort_values(["n", "token"], ascending=[False, True]).head(top_k)
        return out

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__s")
        .map_groups(combine, batch_format="pandas")
    )
    if top_k is None:
        return counts
    # deterministic heavy hitters: count DESC then token ASC
    return counts.sort(["n", "token"], descending=[True, False]).limit(top_k)


def corpus_freq_scores(ds, *, text_column: str = "text",
                       id_column: str = "doc_id", top_v: int | None = None,
                       shards: int = 32):
    """Corpus-statistics document scoring, the two-phase shape of every
    "score each doc against global statistics" stage (unigram LM
    scoring, OOV-rate filters, rare-token flags):

    1. global token counts via :func:`word_counts` (partial-combine
       exchange bounded by vocabulary);
    2. the vocabulary — optionally truncated to the ``top_v`` heaviest
       tokens (count DESC, token ASC; deterministic) — is broadcast
       sorted via ``ray.put``, and every batch scores its documents
       map-side with one flat tokenize + searchsorted pass.

    Emits EXACT integer evidence per document (no float scores, so the
    whole operator is hash-checkable against SQL): ``n_tokens``,
    ``n_oov`` (tokens outside the vocab) and ``sum_freq`` (summed
    global counts of in-vocab tokens, repeats included).  Downstream
    turns these into OOV-rate / mean-log-frequency scores however it
    likes.

    Driver state is the vocabulary table (the corpus' distinct tokens —
    inherently the small side; cap with ``top_v`` on open-vocabulary
    corpora where the tail is noise anyway).
    """
    import ray as _ray

    cdf = (word_counts(ds, text_column=text_column, shards=shards)
           .to_pandas()
           .sort_values(["n", "token"], ascending=[False, True]))
    if top_v is not None:
        cdf = cdf.head(top_v)
    order = np.argsort(cdf["token"].to_numpy())
    vtok = cdf["token"].to_numpy()[order]
    vcnt = cdf["n"].to_numpy()[order].astype(np.int64)
    ref = _ray.put((vtok, vcnt))

    def score(batch: pa.Table) -> pa.Table:
        vt, vc = ref if isinstance(ref, tuple) else _ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n_docs = len(lens)
        if n_docs == 0 or not len(flat):
            z = np.zeros(n_docs, dtype=np.int64)
            return pa.table({id_column: batch.column(id_column),
                             "n_tokens": pa.array(z), "n_oov": pa.array(z),
                             "sum_freq": pa.array(z)})
        keep = flat != ""
        if len(vt):
            pos = np.minimum(np.searchsorted(vt, flat), len(vt) - 1)
            inv = (vt[pos] == flat) & keep
            freq = np.where(inv, vc[pos], 0)
        else:
            inv = np.zeros(len(flat), dtype=bool)
            freq = np.zeros(len(flat), dtype=np.int64)
        # split() of "" yields [""] so every doc owns ≥1 slot — reduceat
        # boundaries are strictly increasing
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        n_tokens = np.add.reduceat(keep.astype(np.int64), starts)
        n_oov = np.add.reduceat((keep & ~inv).astype(np.int64), starts)
        sum_freq = np.add.reduceat(freq, starts)
        return pa.table({id_column: batch.column(id_column),
                         "n_tokens": pa.array(n_tokens),
                         "n_oov": pa.array(n_oov),
                         "sum_freq": pa.array(sum_freq)})

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_top_terms(ds, *, text_column: str = "text", id_column: str = "doc_id",
                    k: int = 5, idf_scale: int = 1_000_000, n_docs: int | None = None,
                    shards: int = 32):
    """Top-``k`` terms per document by integer-scaled tf·idf.

    ``score = tf * ((idf_scale * N) // df)`` — an inverse-document-
    frequency weight kept in EXACT integer arithmetic (floor division)
    instead of ``ln(N/df)``: the ranking is deterministic and identical
    in any engine (float ``ln`` differs at ULP level between libms,
    which would make top-k membership engine-dependent at ties), giving
    the op an exact DuckDB oracle.

    Distributed shape (one doc's text is one row, so per-batch
    (doc, token, tf) counts are exact with NO exchange):

    1. tf table: Arrow token explode + batch-local group_by;
    2. df table: per-batch partial counts over the tf rows, one salted
       token-keyed exchange (vocabulary-scale, like word_counts);
    3. tf ⋈ df by token: bucketed :func:`~biocurator_mapper_ray.ops.join.hash_join`;
    4. per-doc top-k: :func:`~biocurator_mapper_ray.ops.rank.top_k_per_group`
       with its batch-level combiner push-down.
    """
    import numpy as np

    from ..functions.hashing import hash64_column
    from ..ops.join import hash_join
    from ..ops.rank import top_k_per_group

    if n_docs is None:
        n_docs = ds.count()

    def tf_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        doc_ids = pa.chunked_array([batch.column(id_column)]).combine_chunks()
        lens = pc.list_value_length(toks)
        ids_rep = np.repeat(doc_ids.to_numpy(), lens.to_numpy())
        t = pa.table({"doc_id": pa.array(ids_rep), "token": flat})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        g = t.group_by(["doc_id", "token"], use_threads=False).aggregate(
            [("token", "count")]
        )
        return g.rename_columns(["doc_id", "token", "tf"])

    tf = ds.map_batches(tf_partial, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["token"], use_threads=False).aggregate([("token", "count")])
        g = g.rename_columns(["token", "df"])
        salt = (hash64_column(g.column("token")) % np.uint64(shards)).astype(np.int32)
        return g.append_column("__s", pa.array(salt))

    def df_combine(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__s")
        return group.groupby("token", sort=False)["df"].sum().reset_index(name="df")

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("__s").map_groups(df_combine, batch_format="pandas")
    )

    scale_n = idf_scale * n_docs

    def score(merged: pd.DataFrame) -> pd.DataFrame:
        merged = merged.copy()
        merged["score"] = merged["tf"].to_numpy() * (
            scale_n // merged["df"].to_numpy().astype(np.int64)
        )
        return merged

    i64, obj = np.dtype(np.int64), np.dtype(object)
    scored = hash_join(
        tf, df_tbl, left_on="token", right_on="token",
        buckets=shards,
        left_columns=["doc_id", "token", "tf"], right_columns=["token", "df"],
        left_dtypes={"doc_id": i64, "token": obj, "tf": i64},
        right_dtypes={"token": obj, "df": i64},
        bucket_postprocess=score,
    )
    return top_k_per_group(scored, "doc_id", "score", k,
                           tiebreak_col="token", shards=shards)


def repetition_stats(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 quality rules — public
    paper), emitted as EXACT integer evidence so the op has a DuckDB
    oracle (the float "fraction in top n-gram" rules are these numerators
    over ``n_words`` / ``n_bigrams``):

    * ``n_words`` / ``n_distinct_words`` / ``top_word_n`` — token stream
      size, vocabulary size, and the most-frequent token's count;
    * ``n_bigrams`` / ``n_distinct_bigrams`` / ``top_bigram_n`` — same
      over adjacent word 2-grams.

    Fully vectorized: one Arrow lower+split per batch, token/bigram
    streams exploded with a repeated doc index, counts via two Arrow
    ``group_by`` passes (no exchange — a doc's text is one row, so the
    per-batch counts are exact and final).
    """
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(batch.column(text_column))),
        r"\s+",
    )
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    n = len(batch)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    # empty-text rows split to [""] — drop empty tokens
    nonempty = flat != ""
    flat, doc_idx = flat[nonempty], doc_idx[nonempty]

    def per_doc(keys: np.ndarray, grams: np.ndarray) -> tuple[np.ndarray, ...]:
        """→ (stream size, distinct grams, top-gram count) per doc row."""
        total = np.zeros(n, np.int64)
        distinct = np.zeros(n, np.int64)
        top = np.zeros(n, np.int64)
        if len(keys):
            t = pa.table({"d": pa.array(keys), "g": pa.array(grams)})
            g = t.group_by(["d", "g"], use_threads=False).aggregate([("g", "count")])
            d = g.column("d").to_numpy()
            c = g.column("g_count").to_numpy().astype(np.int64)
            np.add.at(total, d, c)
            np.add.at(distinct, d, 1)
            np.maximum.at(top, d, c)
        return total, distinct, top

    n_words, n_distinct_words, top_word_n = per_doc(doc_idx, flat)

    adjacent = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) else np.zeros(0, bool)
    bi_left = flat[:-1][adjacent] if len(flat) else flat
    bi_right = flat[1:][adjacent] if len(flat) else flat
    bigrams = np.char.add(np.char.add(bi_left.astype(str), " "),
                          bi_right.astype(str)) if len(bi_left) else bi_left
    bi_idx = doc_idx[:-1][adjacent] if len(doc_idx) else doc_idx
    n_bigrams, n_distinct_bigrams, top_bigram_n = per_doc(bi_idx, bigrams)

    return (
        batch.append_column("n_words", pa.array(n_words))
        .append_column("n_distinct_words", pa.array(n_distinct_words))
        .append_column("top_word_n", pa.array(top_word_n))
        .append_column("n_bigrams", pa.array(n_bigrams))
        .append_column("n_distinct_bigrams", pa.array(n_distinct_bigrams))
        .append_column("top_bigram_n", pa.array(top_bigram_n))
    )


def quality_filter(batch: pa.Table, text_column: str = "text",
                   *, min_words: int = 5, max_words: int = 50_000,
                   top_word_frac: tuple[int, int] = (1, 2),
                   min_distinct_frac: tuple[int, int] = (1, 4)) -> pa.Table:
    """Composite keep/drop quality decision (the C4/Gopher-style filter
    stage a pre-training pipeline actually applies), built ONLY from
    exact integer evidence so the decision has an exact SQL oracle —
    every fraction rule is an integer cross-multiplication, never a
    float division:

    keep ⇔  min_words ≤ n_words ≤ max_words
         ∧  top_word_n · den ≤ num · n_words      (no word dominates)
         ∧  n_distinct_words · den' ≥ num' · n_words  (type-token ratio)

    Emits ``keep`` (bool) plus the :func:`repetition_stats` evidence it
    was decided on — downstream stages filter on ``keep``; audits read
    the evidence.
    """
    out = repetition_stats(batch, text_column)
    n_words = out.column("n_words").to_numpy()
    top_word = out.column("top_word_n").to_numpy()
    distinct = out.column("n_distinct_words").to_numpy()
    tnum, tden = top_word_frac
    dnum, dden = min_distinct_frac
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (top_word * tden <= tnum * n_words)
        & (distinct * dden >= dnum * n_words)
    )
    return out.append_column("keep", pa.array(keep))


def fingerprints(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Document fingerprints:

    * ``fp_md5``  — md5 of the normalized text (lower+trim); has an exact
      DuckDB oracle (``md5(lower(trim(text)))``).
    * ``fp_sim64`` — 64-bit rolling-hash content fingerprint
      (engine-internal; used as a cheap shard-stable dedup/partition key).
    """
    from ..functions.hashing import hash64_column

    from ..functions.hashing import md5_hex

    norm = pc.utf8_trim_whitespace(pc.utf8_lower(batch.column(text_column)))
    md5s = md5_hex(norm)  # vectorized DuckDB kernel, no per-row Python
    sim = hash64_column(norm).astype(np.int64)
    return batch.append_column("fp_md5", pa.array(md5s, pa.string())).append_column(
        "fp_sim64", pa.array(sim)
    )


def compression_ratio(batch: pa.Table, text_column: str = "text",
                      level: int = 6) -> pa.Table:
    """(id cols…) + n_bytes / n_bytes_zlib / zlib_ratio (rounded 6):
    the compressibility quality signal — highly repetitive or templated
    text compresses far below natural prose (used by Gopher-family
    filters as `symbol-to-word`'s blunt cousin; see also C4's heuristic
    family).  Rows-only (no zlib in SQL): pinned by construction tests.

    zlib is stdlib C — the per-row loop spends its time inside the
    codec, not the interpreter (same dispensation as the compiled-regex
    loop in token_counts)."""
    import zlib

    texts = batch.column(text_column).to_pylist()
    n_bytes = np.empty(len(texts), dtype=np.int64)
    n_comp = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        n_bytes[i] = len(b)
        n_comp[i] = len(zlib.compress(b, level))
    ratio = np.round(n_comp / np.maximum(n_bytes, 1), 6)
    return (batch.append_column("n_bytes", pa.array(n_bytes))
            .append_column("n_bytes_zlib", pa.array(n_comp))
            .append_column("zlib_ratio", pa.array(ratio)))


def sentence_stats(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Sentence-level shape features (readability/quality signals):
    appends

    * ``n_sentences`` — count of sentence-terminator RUNS (``[.!?]+``);
      integer, so it hashes exactly, and it equals
      ``len(regexp_split_to_array(text, '[.!?]+')) - 1`` in SQL (a split
      always yields runs+1 pieces, trailing terminator or not);
    * ``n_words`` — whitespace token count (the token_counts rule);
    * ``n_chars`` — UTF-8 character length.

    One Arrow RE2 pass per feature, batch-local, no exchange.
    """
    text = batch.column(text_column)
    runs = pc.count_substring_regex(text, r"[.!?]+")
    ws = pc.list_value_length(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(text), r"\s+"))
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
    ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
    return (batch
            .append_column("n_sentences", pc.cast(runs, pa.int64()))
            .append_column("n_words", pc.cast(ws, pa.int64()))
            .append_column("n_chars",
                           pc.cast(pc.utf8_length(text), pa.int64())))


def inverted_index(ds, *, text_column: str = "text",
                   id_column: str = "doc_id", min_docs: int = 1,
                   shards: int = 32):
    """Inverted index: for every token, the count of documents
    containing it and the NUMERICALLY sorted posting list of their ids
    (comma-joined) — the retrieval-side artifact a corpus engine
    materializes next to the forward store.

    Scale shape (the word_counts contract): each batch explodes to its
    DISTINCT (token, id) pairs — the combiner bound is batch vocabulary
    × docs, never the token stream — and ONE salted token-hash exchange
    co-locates each token's postings; the per-shard rebuild is one
    sort + group-boundary offsets + ``binary_join`` (no per-token
    Python).  A token's posting list is token-group-sized by
    construction: the same result-scale contract as group_concat.
    ``min_docs`` drops the long tail at the source.
    """
    import numpy as np

    from ..functions.hashing import hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(
            pc.utf8_lower(batch.column(text_column)))
        toks = pc.split_pattern_regex(txt, r"\s+")
        n_per_doc = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        ids = np.repeat(batch.column(id_column).to_numpy(
            zero_copy_only=False), n_per_doc)
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table({"token": flat.filter(pa.array(mask)),
                      id_column: pa.array(ids[mask])})
        g = t.group_by(["token", id_column]).aggregate([])  # distinct
        salt = (hash64_column(g.column("token"))
                % np.uint64(shards)).astype(np.int32)
        return g.append_column("__s", pa.array(salt))

    def combine(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["token", id_column]) \
             .sort_values(["token", id_column], kind="mergesort")
        keys = g["token"].to_numpy()
        first = np.concatenate([[True], keys[1:] != keys[:-1]])
        counts = np.diff(np.append(np.flatnonzero(first), len(keys)))
        keep = counts >= min_docs
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        vals = pa.array(g[id_column].astype(str).to_numpy(), pa.string())
        lst = (pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), vals)
               if offsets[-1] < 2**31 else
               pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                             vals))
        joined = pc.binary_join(lst, ",")
        out = pa.table({
            "token": pa.array(keys[first], pa.string()),
            "n_docs": pa.array(counts.astype(np.int64)),
            "doc_ids": joined,
        })
        return out.filter(pa.array(keep))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__s")
            .map_groups(lambda g: combine(g.drop(columns="__s")),
                        batch_format="pandas"))


def bm25_evidence(ds, *, query_terms: list[str],
                  text_column: str = "text", id_column: str = "doc_id"):
    """Exact integer BM25 evidence for a fixed lexical query: one row
    per (doc, query term) with ``tf > 0`` carrying
    ``(doc_id, term, tf, dl, df, n_docs, sum_dl)`` — term frequency,
    the doc's whitespace token length, the term's document frequency,
    and the corpus size / total token count (constant columns, so the
    whole table is integers and hash-checkable against SQL; see
    :func:`bm25_scores` for the float composition).

    Scale shape: one vectorized tokenize + searchsorted pass per batch
    computes every doc's tf over the (tiny, sorted, broadcast-by-
    closure) query-term list — no exchange for matching; per-batch
    (n_docs, sum_dl) partials fold driver-side (one row per batch); df
    is a term-scale groupby collected to a dict of ≤ |query| entries
    and attached map-side.  Query terms are matched lowercase.
    """
    import ray as _ray  # noqa: F401

    qt = np.array(sorted({t.lower() for t in query_terms}))
    if len(qt) == 0:
        raise ValueError("bm25_evidence needs at least one query term")

    def match(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n = len(lens)
        empty = pa.table({
            id_column: pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64())})
        if n == 0 or not len(flat):
            return empty
        keep = flat != ""
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        dl = np.add.reduceat(keep.astype(np.int64), starts)
        pos = np.minimum(np.searchsorted(qt, flat), len(qt) - 1)
        hit = (qt[pos] == flat) & keep
        if not hit.any():
            return empty
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        cell = doc_idx[hit] * len(qt) + pos[hit]
        tf_flat = np.bincount(cell, minlength=n * len(qt))
        nz = np.flatnonzero(tf_flat)
        d, t = nz // len(qt), nz % len(qt)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table({
            id_column: pa.array(ids[d], pa.int64()),
            "term": pa.array(qt[t], pa.string()),
            "tf": pa.array(tf_flat[nz], pa.int64()),
            "dl": pa.array(dl[d], pa.int64())})

    def dl_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        return pa.table({
            "n_docs": pa.array([len(batch)], pa.int64()),
            "sum_dl": pa.array([int((flat != "").sum())], pa.int64())})

    # bounded driver folds: one row per batch / one row per query term
    totals = ds.map_batches(dl_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(totals["n_docs"].sum())
    sum_dl = int(totals["sum_dl"].sum())

    # materialized: (docs × |query|)-bounded, and consumed twice (df
    # fold + attach) — avoids re-tokenizing the corpus
    matches = ds.map_batches(match, batch_format="pyarrow").materialize()
    dft = matches.groupby("term").count().to_pandas()
    df_map = dict(zip(dft["term"], dft["count()"].astype(int)))

    def attach(batch: pa.Table) -> pa.Table:
        # dictionary-encode: python touches only the ≤|query| distinct
        # terms, rows get a vectorized take
        enc = pc.dictionary_encode(
            batch.column("term").combine_chunks()
            if isinstance(batch.column("term"), pa.ChunkedArray)
            else batch.column("term"))
        dvals = np.array([df_map[t] for t in enc.dictionary.to_pylist()],
                         dtype=np.int64)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "df", pa.array(dvals[idx])
        ).append_column(
            "n_docs", pa.array(np.full(len(batch), n_docs), pa.int64())
        ).append_column(
            "sum_dl", pa.array(np.full(len(batch), sum_dl), pa.int64()))

    return matches.map_batches(attach, batch_format="pyarrow")


def bm25_scores(evidence: pd.DataFrame, *, k1: float = 1.2,
                b: float = 0.75) -> pd.DataFrame:
    """Reader-side BM25 composition of :func:`bm25_evidence` rows →
    one ``(doc_id, score)`` per doc: Robertson/Sparck-Jones idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` times the saturated tf
    term, summed over the doc's matched query terms."""
    if len(evidence) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})
    e = evidence
    avgdl = e["sum_dl"].iloc[0] / max(e["n_docs"].iloc[0], 1)
    idf = np.log(1.0 + (e["n_docs"] - e["df"] + 0.5) / (e["df"] + 0.5))
    tfs = (e["tf"] * (k1 + 1)
           / (e["tf"] + k1 * (1 - b + b * e["dl"] / avgdl)))
    out = (pd.DataFrame({"doc_id": e.iloc[:, 0], "score": idf * tfs})
           .groupby("doc_id", as_index=False, sort=True)["score"].sum())
    return out


def build_vocab(ds, *, text_column: str = "text", vocab_size: int = 1000,
                shards: int = 32) -> pd.DataFrame:
    """Deterministic frequency vocabulary: the corpus' ``vocab_size``
    heaviest tokens (count DESC, token ASC) with dense ids 0..V-1 in
    that order — the tokenizer-vocab-construction step.  Driver state
    is the vocab table itself (result-scale by definition; the
    exchange is bounded per :func:`word_counts`)."""
    vdf = word_counts(ds, text_column=text_column, top_k=vocab_size,
                      shards=shards).to_pandas()
    vdf = vdf.reset_index(drop=True)
    vdf["token_id"] = np.arange(len(vdf), dtype=np.int64)
    return vdf[["token", "token_id", "n"]]


def encode_tokens(ds, *, text_column: str = "text",
                  id_column: str = "doc_id", vocab_size: int = 1000,
                  oov_id: int = -1, shards: int = 32,
                  vocab: pd.DataFrame | None = None):
    """Corpus encoding: tokenize every doc and map each token to its
    :func:`build_vocab` id, emitting EXPLODED integer rows
    ``(doc_id, pos, token_id)`` — ``pos`` is the token's 0-based
    position in the doc, OOV tokens keep their slot with ``oov_id``.
    The tokenize→encode step every LM training pipeline runs before
    packing (compose with ops/pack.sequence_pack); exploded integers
    keep the whole output hash-checkable against a SQL rank+join
    oracle.

    Two-phase broadcast shape (same as :func:`corpus_freq_scores`):
    the vocab is built once (or passed in), ``ray.put`` once, and
    every batch encodes map-side with one flat tokenize + searchsorted
    — the corpus text is read in exactly one distributed pass, no
    exchange on the token stream.
    """
    import ray as _ray

    if vocab is None:
        vocab = build_vocab(ds, text_column=text_column,
                            vocab_size=vocab_size, shards=shards)
    order = np.argsort(vocab["token"].to_numpy())
    vtok = vocab["token"].to_numpy()[order]
    vid = vocab["token_id"].to_numpy()[order].astype(np.int64)
    ref = _ray.put((vtok, vid))

    def encode(batch: pa.Table) -> pa.Table:
        vt, vi = ref if isinstance(ref, tuple) else _ray.get(ref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        n = len(lens)
        if n == 0 or not len(flat):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "token_id": pa.array([], pa.int64())})
        keep = flat != ""
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        kept = np.flatnonzero(keep)
        kept_doc = doc_idx[kept]
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), starts)
        # token stream is doc-major: positions restart at each doc
        pos = (np.arange(len(kept), dtype=np.int64)
               - np.repeat(np.concatenate([[0],
                                           np.cumsum(kept_per_doc)[:-1]]),
                           kept_per_doc))
        if len(vt):
            p = np.minimum(np.searchsorted(vt, flat[kept]), len(vt) - 1)
            hit = vt[p] == flat[kept]
            tid = np.where(hit, vi[p], oov_id)
        else:
            tid = np.full(len(kept), oov_id, dtype=np.int64)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        return pa.table({id_column: pa.array(ids[kept_doc], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "token_id": pa.array(tid, pa.int64())})

    return ds.map_batches(encode, batch_format="pyarrow")


def group_token_overlap(ds, *, group_column: str = "source",
                        text_column: str = "text", shards: int = 32):
    """Lexical overlap matrix between document GROUPS (sources, crawl
    snapshots, languages): for every group pair (a < b) the exact
    distinct-token intersection ``inter``, the group vocabulary sizes
    ``n_a`` / ``n_b`` and their Jaccard — the "how much do my corpus
    slices overlap" curation diagnostic.  Integer evidence + one IEEE
    division per row, so it hashes exactly against a SQL
    DISTINCT-set self-join.

    Scale shape: each batch reduces to its DISTINCT (group, token)
    pairs map-side; ONE token-hash-sharded exchange (bounded by
    vocabulary × groups, not the token stream) makes the pairs
    globally distinct; each shard task then self-merges its vocabulary
    slice on token (a token lives in exactly one shard, so per-shard
    pair counts are disjoint partials) and a group-pair-scale fold
    finishes.  Group count is assumed small (it names corpus slices);
    per-group vocabulary sizes fold driver-side from shard partials.
    """
    from ..functions.hashing import hash64_column

    def distinct_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(batch.column(text_column), pa.string()))),
            r"\s+")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        grp = batch.column(group_column).to_numpy(zero_copy_only=False)
        t = pa.table({"g": pa.array(np.repeat(grp, lens)), "token": flat})
        t = t.filter(pc.not_equal(t.column("token"), ""))
        t = t.group_by(["g", "token"], use_threads=False).aggregate([])
        salt = (hash64_column(t.column("token"))
                % np.uint64(shards)).astype(np.int32)
        return t.append_column("__s", pa.array(salt))

    dist = (ds.map_batches(distinct_partial, batch_format="pyarrow")
            .groupby("__s")
            .map_groups(lambda g: g.drop(columns="__s")
                        .drop_duplicates(["g", "token"]),
                        batch_format="pandas")
            .materialize())  # vocabulary × groups — bounded

    sizes = (dist.map_batches(
        lambda t: t.group_by(["g"], use_threads=False)
                   .aggregate([("token", "count")]),
        batch_format="pyarrow").to_pandas())
    size_map = sizes.groupby("g")["token_count"].sum().to_dict()

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="token")
        m = m[m["g_x"] < m["g_y"]]
        out = (m.groupby(["g_x", "g_y"], as_index=False, sort=False)
               .size().rename(columns={"g_x": "src_a", "g_y": "src_b",
                                       "size": "inter"}))
        out["inter"] = out["inter"].astype(np.int64)
        return out

    # re-shard for the self-merge: token-hash again (dist rows lost
    # their tag in the distinct fold)
    def retag(t: pa.Table) -> pa.Table:
        salt = (hash64_column(t.column("token"))
                % np.uint64(shards)).astype(np.int32)
        return t.append_column("__s", pa.array(salt))

    partials = (dist.map_batches(retag, batch_format="pyarrow")
                .groupby("__s")
                .map_groups(lambda g: shard_pairs(g.drop(columns="__s")),
                            batch_format="pandas"))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["src_a", "src_b"], as_index=False, sort=True)
               ["inter"].sum())
        na = out["src_a"].map(size_map).astype(np.int64)
        nb = out["src_b"].map(size_map).astype(np.int64)
        out["n_a"], out["n_b"] = na, nb
        out["jaccard"] = out["inter"] / (na + nb - out["inter"])
        return out

    # group-pair-scale final fold (single group: pair space is tiny)
    return (partials
            .map_batches(lambda t: t.append_column(
                "__one", pa.array(np.zeros(len(t), np.int32))),
                batch_format="pyarrow")
            .groupby("__one")
            .map_groups(lambda g: finish(g.drop(columns="__one")),
                        batch_format="pandas"))


def winnow_fingerprints(ds, *, id_column: str = "doc_id",
                        text_column: str = "text",
                        k: int = 5, window: int = 4):
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson &
    Aiken, SIGMOD 2003): hash every word ``k``-gram, slide a
    ``window`` over consecutive gram hashes and record each window's
    MINIMUM — the guarantee-bearing local-minima sketch for substring-
    level plagiarism / near-dup detection (any shared run of
    ``k + window - 1`` tokens shares at least one fingerprint).
    Emits the DISTINCT (doc, fp) pairs; density ≈ 2/(window+1).

    MAP-ONLY: tokenize → aligned-slice k-gram build → one vectorized
    md5 kernel call → ``sliding_window_view`` min — no exchange, no
    per-row Python.  The gram hash is the first 15 md5 hex chars
    (< 2^60, int64-safe on both engines), so the fingerprint set has
    an exact DuckDB oracle via the window-min SQL form.  Docs shorter
    than ``k + window - 1`` tokens emit nothing (no full window).
    """
    from ..functions.hashing import md5_prefix_u64

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy()
        empty = pa.table({
            id_column: pa.array([], batch.schema.field(id_column).type),
            "fp": pa.array([], pa.int64())})
        toks_list = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = np.asarray(toks_list.flatten(), dtype=object)
        counts = np.asarray(pc.list_value_length(toks_list),
                            dtype=np.int64)
        parents = np.repeat(np.arange(len(ids)), counts)
        mask = flat != ""
        flat, parents = flat[mask], parents[mask]
        n = len(flat)
        if n < k:
            return empty
        s = flat.astype(str)
        gram = s[: n - k + 1].copy()
        for off in range(1, k):
            gram = np.char.add(np.char.add(gram, " "),
                               s[off: n - k + 1 + off])
        gp = parents[: n - k + 1]
        same_doc = parents[k - 1:] == gp
        gram, gp = gram[same_doc], gp[same_doc]
        m = len(gram)
        if m < window:
            return empty
        h = md5_prefix_u64(gram, 15).astype(np.int64)
        sw = np.lib.stride_tricks.sliding_window_view(h, window)
        minima = sw.min(axis=1)
        wvalid = gp[window - 1:] == gp[: m - window + 1]
        doc_pos = gp[: m - window + 1][wvalid]
        fps = minima[wvalid]
        if not len(fps):
            return empty
        pairs = np.unique(np.stack([doc_pos, fps], axis=1), axis=0)
        return pa.table({id_column: pa.array(ids[pairs[:, 0]]),
                         "fp": pa.array(pairs[:, 1])})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def ngram_diversity(ds, *, id_column: str = "doc_id",
                    text_column: str = "text", n: int = 2):
    """Per-document n-gram diversity (distinct-n): total n-grams,
    distinct n-grams and the ratio in basis points — the integer
    repetitiveness signal behind distinct-1/distinct-2 style corpus
    diagnostics (templated or looping text scores low).  MAP-ONLY.

    Distinctness is decided on 15-hex md5 gram hashes (int64-safe on
    both engines) so the per-doc counts have an exact DuckDB oracle;
    a collision undercounts distinct by 1 with probability ~2^-60 per
    gram pair.  Docs with fewer than ``n`` tokens emit nothing (no
    grams to measure).
    """
    from ..functions.hashing import md5_prefix_u64

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy()
        empty = pa.table({
            id_column: pa.array([], batch.schema.field(id_column).type),
            "n_grams": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "diversity_bp": pa.array([], pa.int64())})
        toks_list = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)), r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = np.asarray(toks_list.flatten(), dtype=object)
        counts = np.asarray(pc.list_value_length(toks_list), dtype=np.int64)
        parents = np.repeat(np.arange(len(ids)), counts)
        mask = flat != ""
        flat, parents = flat[mask], parents[mask]
        nt = len(flat)
        if nt < n:
            return empty
        s = flat.astype(str)
        gram = s[: nt - n + 1].copy()
        for off in range(1, n):
            gram = np.char.add(np.char.add(gram, " "),
                               s[off: nt - n + 1 + off])
        gp = parents[: nt - n + 1]
        same = parents[n - 1:] == gp
        gram, gp = gram[same], gp[same]
        if not len(gram):
            return empty
        h = md5_prefix_u64(gram, 15).astype(np.int64)
        total = np.bincount(gp, minlength=len(ids)).astype(np.int64)
        # distinct per doc: sort (doc, hash), count run starts
        order = np.lexsort((h, gp))
        hs, gs = h[order], gp[order]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (gs[1:] != gs[:-1])
        distinct = np.bincount(gs[first], minlength=len(ids)).astype(np.int64)
        has = total > 0
        div = np.zeros(len(ids), dtype=np.int64)
        div[has] = distinct[has] * 10000 // total[has]
        return pa.table({id_column: pa.array(ids[has]),
                         "n_grams": pa.array(total[has]),
                         "n_distinct": pa.array(distinct[has]),
                         "diversity_bp": pa.array(div[has])})

    return ds.map_batches(per_batch, batch_format="pyarrow")
