"""Dialog-native operators over (conv_id, turn_idx, text) transcripts.

The engine's payload axis is conversation transcripts (the flagship KG
pipeline consumes them; sources/transcripts.py synthesizes them); these
operators treat the DIALOG structure itself as data: topic-shift
segmentation from adjacent-turn lexical cohesion.  No reference
equivalent (biocurator_mapper maps isolated passages).

Partitioning assumption (shared with the KG canonicalization pass,
pipelines/kg.py): one conversation's turns fit in one group — true for
dialog data by construction; a mega-conversation is salted upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column
from .dedup import _ws_tokens


def _turn_token_rows(batch: pa.Table, conv_col: str, order_col: str,
                     text_col: str) -> pa.Table:
    """batch → distinct (conv, turn, token-hash, n_tokens) rows: the
    lean exchange unit (token-SET cardinality, text never shuffled)."""
    convs = batch.column(conv_col).to_pylist()
    turns = batch.column(order_col).to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    all_toks: list[str] = []
    lengths = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = sorted(set(_ws_tokens((t or "").lower())))
        lengths[i] = len(toks)
        all_toks.extend(toks)
    h = (hash64_column(pa.chunked_array([pa.array(all_toks)]))
         if all_toks else np.zeros(0, dtype=np.uint64))
    rep = np.repeat(np.arange(len(texts)), lengths)
    h_int = h.view(np.int64)
    # token-free turns still need a presence row (n_tok=0 sentinel,
    # excluded from intersection merges) or adjacency would skip them
    empty_idx = np.where(lengths == 0)[0]
    if len(empty_idx):
        rep = np.concatenate([rep, empty_idx])
        h_int = np.concatenate(
            [h_int, np.zeros(len(empty_idx), dtype=np.int64)])
    return pa.table({
        conv_col: pa.array(np.asarray(convs, dtype=object)[rep]),
        order_col: pa.array(turns[rep]),
        "h": pa.array(h_int),
        "n_tok": pa.array(lengths[rep]),
    })


def segment_conversations(ds, *, conv_col: str = "conv_id",
                          order_col: str = "turn_idx",
                          text_col: str = "text",
                          threshold: float = 0.1,
                          shards: int = 64):
    """Topic-shift segmentation: per conversation in turn order, the
    Jaccard similarity of consecutive turns' token SETS; a new segment
    starts where similarity drops below ``threshold`` (and at turn 0).
    Returns (conv, turn, sim_prev float64, segment_id int64) — the
    dialog-splitting primitive for per-topic KG extraction windows and
    long-context chunking along natural boundaries.

    Scale shape: each batch reduces to distinct (conv, turn, token-hash)
    rows — token-set scale, the TEXT never shuffles — then ONE conv-hash
    bucketed exchange; inside each bucket the adjacent-turn intersection
    is a vectorized self-merge on (conv, turn+1, hash) and the segment
    ids are a per-conv boundary cumsum.  No per-pair Python.
    """

    out_schema = pa.schema([(conv_col, pa.string()),
                            (order_col, pa.int64()),
                            ("sim_prev", pa.float64()),
                            ("segment_id", pa.int64())])

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        # Arrow out: downstream sorts/aggregates on pandas object-dtype
        # string blocks were 3-5× the whole op's cost (measured 9.5 s
        # for a 200k-row groupby at sf0.1)
        g = g.drop(columns="__kb")
        if g.empty:
            return out_schema.empty_table()
        # per-turn set sizes (n_tok repeats per token row; 0-token turns
        # carry no rows and are handled by the reindex below)
        sizes = (g.groupby([conv_col, order_col], sort=False)["n_tok"]
                 .first())
        real = g[g["n_tok"] > 0]
        nxt = real.copy()
        nxt[order_col] = nxt[order_col] + 1
        inter = (real.merge(nxt[[conv_col, order_col, "h"]],
                            on=[conv_col, order_col, "h"], how="inner")
                 .groupby([conv_col, order_col], sort=False).size())
        df = sizes.rename("n").reset_index()
        df = df.sort_values([conv_col, order_col], kind="mergesort",
                            ignore_index=True)
        key = pd.MultiIndex.from_arrays([df[conv_col], df[order_col]])
        df["inter"] = inter.reindex(key, fill_value=0).to_numpy()
        prev_n = df.groupby(conv_col, sort=False)["n"].shift(1)
        first = prev_n.isna().to_numpy()
        union = df["n"].to_numpy() + prev_n.fillna(0).to_numpy() \
            - df["inter"].to_numpy()
        with np.errstate(invalid="ignore"):
            sim = np.where(union > 0, df["inter"].to_numpy() / union, 0.0)
        sim[first] = np.nan
        boundary = first | (np.nan_to_num(sim, nan=0.0) < threshold)
        seg = (pd.Series(boundary).groupby(
            pd.factorize(df[conv_col])[0]).cumsum() - 1).to_numpy()
        return pa.table({conv_col: pa.array(df[conv_col], pa.string()),
                         order_col: pa.array(
                             df[order_col].to_numpy().astype(np.int64)),
                         "sim_prev": pa.array(sim, pa.float64()),
                         "segment_id": pa.array(seg.astype(np.int64))})

    def tag(batch: pa.Table) -> pa.Table:
        t = _turn_token_rows(batch, conv_col, order_col, text_col)
        h = hash64_column(t.column(conv_col))
        return t.append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__kb").map_groups(per_bucket, batch_format="pandas"))


def sequence_transitions(ds, *, key_col: str = "conv_id",
                         order_cols: list[str] | None = None,
                         label_col: str = "tool",
                         min_count: int = 1, buckets: int = 64):
    """First-order transition counts over per-key ordered label
    sequences: ``(label_a, label_b, n_pairs)`` for every adjacent label
    pair inside a key's sequence — the agent-behavior profile of a
    transcript corpus ("which tool follows which"), and the Markov-
    chain estimation step over any (user, timestamp, event) log.

    Scale shape: rows project to lean (key, order…, label) columns
    map-side (text/payloads never shuffle), ONE hash(key) exchange
    co-locates each key's sequence, the bucket task sorts by
    ``order_cols`` (deterministic total order — pass a tie-breaking
    column), forms adjacent pairs with a shifted compare (vectorized,
    no per-row Python) and pre-aggregates ``pair → count`` before a
    result-scale final fold.  A key's sequence must fit its bucket
    (dialog/user-log scale by construction; salt mega-keys upstream).
    """
    order_cols = order_cols or ["turn_idx"]

    def tag(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch.column(key_col),
                label_col: pc.cast(batch.column(label_col), pa.string())}
        for c in order_cols:
            cols[c] = batch.column(c)
        h = hash64_column(batch.column(key_col))
        cols["__kb"] = pa.array((h % np.uint64(buckets)).astype(np.int32))
        return pa.table(cols)

    def pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"label_a": pa.array([], pa.string()),
                          "label_b": pa.array([], pa.string()),
                          "n_pairs": pa.array([], pa.int64())})
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        same = g[key_col].to_numpy()[:-1] == g[key_col].to_numpy()[1:]
        if not same.any():
            return empty
        lab = g[label_col].to_numpy()
        df = pd.DataFrame({"label_a": lab[:-1][same],
                           "label_b": lab[1:][same]})
        out = df.groupby(["label_a", "label_b"], sort=False,
                         as_index=False).size()
        return pa.table({
            "label_a": pa.array(out["label_a"], pa.string()),
            "label_b": pa.array(out["label_b"], pa.string()),
            "n_pairs": pa.array(out["size"].to_numpy(np.int64))})

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__kb").map_groups(
                 lambda g: pairs(g.drop(columns="__kb")),
                 batch_format="pandas"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["label_a", "label_b"], sort=True,
                        as_index=False)["n_pairs"].sum()
        return out[out["n_pairs"] >= min_count]

    def salt(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("label_a"), batch.column("label_b"), "\x1f")
        s = hash64_column(key) % np.uint64(16)
        return batch.append_column("__s", pa.array(s.astype(np.int32)))

    return (parts.map_batches(salt, batch_format="pyarrow")
            .groupby("__s").map_groups(
                lambda g: fold(g.drop(columns="__s")),
                batch_format="pandas"))


def build_examples(ds, *, conv_col: str = "conv_id",
                   order_col: str = "turn_idx", role_col: str = "role",
                   text_col: str = "text", target_role: str = "assistant",
                   max_context_chars: int = 2000, buckets: int = 64):
    """Supervised-example extraction from multi-turn transcripts: one
    training pair per ``target_role`` turn — ``(conv_id, turn_idx,
    context, target, n_context_turns)`` where ``context`` is the
    concatenation of ALL prior turns as ``role: text`` lines, truncated
    from the LEFT to the most recent ``max_context_chars`` characters
    (whole turns only: the oldest partially-fitting turn is dropped,
    mirroring a context-window budget).  The transcripts→SFT-rows step
    of an assistant-training pipeline.

    Scale shape: ONE hash(conv) exchange co-locates each conversation
    (the repo-wide dialog partitioning assumption; salt mega-convs
    upstream), the bucket task sorts by (conv, turn) and builds each
    conversation's running context with a cumulative-length vector —
    per-target slicing is a join of a bounded line window, not a
    re-concatenation of the whole prefix per turn.
    """
    def tag(batch: pa.Table) -> pa.Table:
        t = pa.table({conv_col: batch.column(conv_col),
                      order_col: batch.column(order_col),
                      role_col: batch.column(role_col),
                      text_col: batch.column(text_col)})
        h = hash64_column(t.column(conv_col))
        return t.append_column(
            "__kb", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def emit(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({
            conv_col: pa.array([], pa.string()),
            order_col: pa.array([], pa.int64()),
            "context": pa.array([], pa.string()),
            "target": pa.array([], pa.string()),
            "n_context_turns": pa.array([], pa.int64())})
        g = g.sort_values([conv_col, order_col], kind="mergesort")
        conv = g[conv_col].to_numpy()
        role = g[role_col].to_numpy()
        text = g[text_col].fillna("").to_numpy()
        order = g[order_col].to_numpy()
        is_tgt = role == target_role
        if not is_tgt.any():
            return empty
        lines = np.char.add(np.char.add(role.astype(str), ": "),
                            text.astype(str))
        out_c, out_i, out_ctx, out_tgt, out_n = [], [], [], [], []
        starts = np.ones(len(g), dtype=bool)
        starts[1:] = conv[1:] != conv[:-1]
        for s, e in zip(np.nonzero(starts)[0],
                        np.append(np.nonzero(starts)[0][1:], len(g))):
            cl = lines[s:e]
            # cumulative chars INCLUDING the "\n" joiner per line
            lens = np.char.str_len(cl).astype(np.int64) + 1
            cum = np.concatenate([[0], np.cumsum(lens)])
            for j in np.nonzero(is_tgt[s:e])[0]:
                # oldest whole turn index k such that the window
                # [k, j) fits the char budget
                need = cum[j] - max_context_chars
                k = int(np.searchsorted(cum[:j + 1], need, side="left"))
                out_c.append(conv[s])
                out_i.append(order[s + j])
                out_ctx.append("\n".join(cl[k:j]))
                out_tgt.append(text[s + j])
                out_n.append(j - k)
        return pa.table({
            conv_col: pa.array([str(x) for x in out_c], pa.string()),
            order_col: pa.array(np.asarray(out_i, dtype=np.int64)),
            "context": pa.array(out_ctx, pa.string()),
            "target": pa.array(out_tgt, pa.string()),
            "n_context_turns": pa.array(np.asarray(out_n,
                                                   dtype=np.int64))})

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__kb").map_groups(
                lambda g: emit(g.drop(columns="__kb")),
                batch_format="pandas"))


def sequence_ngrams(ds, *, key_col: str = "conv_id",
                    order_cols: list[str] | None = None,
                    label_col: str = "tool", n: int = 3,
                    min_count: int = 1, buckets: int = 64):
    """Order-``n`` sequential pattern counts over per-key ordered label
    sequences — :func:`sequence_transitions` generalized past adjacent
    pairs: every run of ``n`` consecutive labels inside a key's
    sequence, counted corpus-wide (``n = 3`` is the dialog-flow /
    clickstream "what sequence of three acts repeats" miner; ``n = 2``
    reduces exactly to the transition matrix).

    Same plan shape as the pair form: lean projection map-side, ONE
    hash(key) exchange, per-bucket sort + ``n`` aligned slices with an
    endpoint same-key mask (the sort makes key equality of the run's
    endpoints imply the whole run), in-bucket pre-aggregation, then a
    salted result-scale fold.  Returns ``(label_1 … label_n,
    n_grams)``; SQL mirror is ``n−1`` stacked LEADs.
    """
    order_cols = order_cols or ["turn_idx"]
    lcols = [f"label_{i + 1}" for i in range(n)]

    def tag(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch.column(key_col),
                label_col: pc.cast(batch.column(label_col), pa.string())}
        for c in order_cols:
            cols[c] = batch.column(c)
        h = hash64_column(batch.column(key_col))
        cols["__kb"] = pa.array((h % np.uint64(buckets)).astype(np.int32))
        return pa.table(cols)

    def grams(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({**{c: pa.array([], pa.string()) for c in lcols},
                          "n_grams": pa.array([], pa.int64())})
        if len(g) < n:
            return empty
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        k = g[key_col].to_numpy()
        same = k[: len(k) - n + 1] == k[n - 1:]
        if not same.any():
            return empty
        lab = g[label_col].to_numpy()
        m = len(lab) - n + 1
        df = pd.DataFrame({c: lab[i: m + i][same]
                           for i, c in enumerate(lcols)})
        out = df.groupby(lcols, sort=False, as_index=False).size()
        return pa.table({**{c: pa.array(out[c], pa.string())
                            for c in lcols},
                         "n_grams": pa.array(
                             out["size"].to_numpy(np.int64))})

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("__kb").map_groups(
                 lambda g: grams(g.drop(columns="__kb")),
                 batch_format="pandas"))

    def salt(batch: pa.Table) -> pa.Table:
        key = batch.column(lcols[0])
        for c in lcols[1:]:
            key = pc.binary_join_element_wise(key, batch.column(c),
                                              "\x1f")
        s = hash64_column(key) % np.uint64(16)
        return batch.append_column("__s",
                                   pa.array(s.astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__s").groupby(
            lcols, sort=True, as_index=False)["n_grams"].sum()
        return out[out["n_grams"] >= min_count]

    return (parts.map_batches(salt, batch_format="pyarrow")
            .groupby("__s").map_groups(fold, batch_format="pandas"))
