"""Training-sequence assembly operators: deterministic sequence packing
(GPT-style concat-and-chunk) and fixed-window document chunking (the
RAG / long-doc split).

No reference equivalent (biocurator_mapper never assembles training
sequences); these are the last-mile operators between a curated corpus
and a pre-training or retrieval job:

* :func:`sequence_pack` — lay every document out on ONE global token
  axis in a deterministic md5-keyed order (the reproducible "shuffle
  then concatenate" of pre-training data loaders) and assign each doc
  the fixed-size training sequence its span starts in
  (``seq_id = tok_start // budget``).  The global offsets come from a
  DISTRIBUTED ORDERED PREFIX SUM: the md5 key's top bits are the range
  partition (uniform by construction — no planning pass needed), so
  per-shard token totals (one tiny exchange, ≤ ``2^shard_bits`` rows on
  the driver) turn into exclusive shard offsets, and each shard then
  computes its rows' exact global offsets independently.  A row's
  placement depends only on (seed, its key, the multiset of other
  rows) — engine- and partitioning-invariant, with an exact SQL window
  ``SUM() OVER (ORDER BY ...)`` oracle.
* :func:`chunk_spans` — split each document's token stream into
  overlapping fixed windows (``chunk_tokens`` wide, every ``stride``),
  emitting the chunk TEXT rebuilt zero-Python-loop: per-chunk token
  indices are one repeat/ramp expansion, the (overlapping) slices are
  one Arrow ``take`` into a ListArray, and ``binary_join`` rebuilds the
  strings — map-side only, no exchange.

Scale shape: ``sequence_pack``'s lean projection (id, n_tokens, key —
~24 B/row) is materialized once so passes A (shard totals) and B
(per-shard layout) don't recompute tokenization; at 10⁹ docs that is
~24 GB spread across the cluster's object store, while the driver holds
only the ``2^shard_bits`` shard totals.  ``chunk_spans`` streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_prefix_u64


def _tokenize_counts(batch: pa.Table, text_column: str):
    """(list<token>, n_tokens) with the engine's whitespace contract:
    split trimmed text on ``\\s+``, drop empty tokens (empty text → 0)."""
    text = pc.cast(batch.column(text_column), pa.string())
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    # "" splits to [""] — a single empty token that must not count
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_empty_runs = np.add.reduceat(
        (~keep).astype(np.int64),
        np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64),
    ) if len(lens) else np.zeros(0, dtype=np.int64)
    n = np.where(lens > 0, lens - n_empty_runs, 0)
    return toks, flat, keep, lens, n


def _md5_key60(values, seed: int) -> np.ndarray:
    """First 15 md5 hex chars of ``seed:value`` as int64 (60 bits —
    sign-safe in numpy and DuckDB's UBIGINT cast); vectorized via the
    shared DuckDB md5 kernel, no per-row Python."""
    return md5_prefix_u64(values, 15, prefix=f"{seed}:").astype(np.int64)


def sequence_pack(ds, *, budget: int, id_column: str = "doc_id",
                  text_column: str = "text", seed: int = 42,
                  shard_bits: int = 6):
    """Assign every document a global token offset and training-sequence
    id under deterministic md5-order concatenation.

    Returns (doc_id, n_tokens, tok_start, seq_id) where ``tok_start``
    is the exclusive prefix sum of token counts in (md5 key, doc_id)
    order and ``seq_id = tok_start // budget`` — the sequence whose
    window the document STARTS in under the standard concatenate-then-
    split-every-``budget``-tokens layout.
    """
    shards = 1 << shard_bits

    def lean(batch: pa.Table) -> pa.Table:
        _, _, _, _, n = _tokenize_counts(batch, text_column)
        ids = batch.column(id_column).to_pylist()
        qkey = _md5_key60(ids, seed)
        return pa.table({
            id_column: batch.column(id_column),
            "n_tokens": pa.array(n),
            "__qkey": pa.array(qkey),
            # top bits of a uniform 60-bit key = ordered range partition
            "__shard": pa.array((qkey >> (60 - shard_bits)).astype(np.int32)),
        })

    lean_ds = ds.map_batches(lean, batch_format="pyarrow").materialize()

    # pass A: per-shard token totals -> exclusive global shard offsets.
    # Driver state is <= 2^shard_bits rows, never corpus rows.
    totals = (lean_ds.groupby("__shard").sum("n_tokens").to_pandas()
              .sort_values("__shard"))
    offs = np.zeros(shards, dtype=np.int64)
    sums = np.zeros(shards, dtype=np.int64)
    if len(totals):  # empty input → empty frame with no columns
        sums[totals["__shard"].to_numpy()] = totals["sum(n_tokens)"].to_numpy()
    offs[1:] = np.cumsum(sums)[:-1]

    # pass B: each shard lays out its own rows — key order within the
    # shard plus the shard's global offset gives exact global positions
    def layout(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["__qkey", id_column], kind="mergesort")
        n = group["n_tokens"].to_numpy()
        start = offs[int(group["__shard"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame({
            id_column: group[id_column].to_numpy(),
            "n_tokens": n,
            "tok_start": start,
            "seq_id": start // budget,
        })

    return lean_ds.groupby("__shard").map_groups(layout, batch_format="pandas")


def assign_row_ids(ds, *, id_column: str = "doc_id", seed: int = 42,
                   shard_bits: int = 6):
    """Contiguous global row ids 0..N-1 in deterministic (md5 key, id)
    order — the stable-global-ordinal primitive (example index files,
    reproducible corpus shuffles) WITHOUT a single-node sort: the same
    two-pass range-shard layout as :func:`sequence_pack` with unit
    counts.  Pass A folds per-shard row counts (driver state is
    2^``shard_bits`` integers, never rows); pass B lays each shard out
    independently against its exclusive global offset.

    Returns (id, row_id); ``row_id`` equals the SQL
    ``row_number() OVER (ORDER BY md5('{seed}:' || id), id) - 1``.
    """
    shards = 1 << shard_bits

    def lean(batch: pa.Table) -> pa.Table:
        qkey = _md5_key60(batch.column(id_column).to_pylist(), seed)
        return pa.table({
            id_column: batch.column(id_column),
            "__qkey": pa.array(qkey),
            "__shard": pa.array(
                (qkey >> (60 - shard_bits)).astype(np.int32)),
        })

    lean_ds = ds.map_batches(lean, batch_format="pyarrow").materialize()

    totals = lean_ds.groupby("__shard").count().to_pandas()
    offs = np.zeros(shards, dtype=np.int64)
    sums = np.zeros(shards, dtype=np.int64)
    if len(totals):  # empty input → empty frame with no columns
        sums[totals["__shard"].to_numpy()] = totals["count()"].to_numpy()
    offs[1:] = np.cumsum(sums)[:-1]

    def layout(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["__qkey", id_column], kind="mergesort")
        start = offs[int(group["__shard"].iloc[0])]
        return pd.DataFrame({
            id_column: group[id_column].to_numpy(),
            "row_id": start + np.arange(len(group), dtype=np.int64),
        })

    return lean_ds.groupby("__shard").map_groups(layout, batch_format="pandas")


def chunk_spans(ds, *, chunk_tokens: int, stride: int | None = None,
                id_column: str = "doc_id", text_column: str = "text"):
    """Split each document into fixed token windows (``chunk_tokens``
    wide, starting every ``stride`` tokens; stride defaults to the
    window → non-overlapping) and rebuild each window's text.

    Emits (doc_id, chunk_id, tok_lo, tok_hi, chunk_text); documents
    with zero tokens emit no chunks.  Map-side only: the per-chunk
    token index set is one repeat/ramp expansion, the overlapping
    slices are one Arrow ``take`` into a ListArray (offsets =
    cumulative chunk widths), and ``binary_join_element_wise``-free
    string rebuild happens in one ``pc.binary_join`` call.
    """
    stride = stride or chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        _, flat, keep, lens, n = _tokenize_counts(batch, text_column)
        ids = batch.column(id_column).to_numpy()
        # flat token array with empties dropped; per-doc start offsets
        vals = flat.filter(pa.array(keep))
        doc_off = np.concatenate([[0], np.cumsum(n)])
        # chunk counts per doc: ceil(n / stride) for n > 0
        c = np.where(n > 0, (n + stride - 1) // stride, 0).astype(np.int64)
        total = int(c.sum())
        empty = pa.table({
            id_column: pa.array([], batch.column(id_column).type),
            "chunk_id": pa.array([], pa.int64()),
            "tok_lo": pa.array([], pa.int64()),
            "tok_hi": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        })
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), c)
        run_starts = np.cumsum(c) - c
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(run_starts, c)
        lo = chunk_id * stride
        hi = np.minimum(lo + chunk_tokens, n[doc_idx])
        widths = hi - lo
        # per-chunk flat token indices (overlap-safe: take duplicates)
        w_total = int(widths.sum())
        w_starts = np.cumsum(widths) - widths
        ramp = np.arange(w_total, dtype=np.int64) - np.repeat(w_starts, widths)
        take = np.repeat(doc_off[doc_idx] + lo, widths) + ramp
        taken = vals.take(pa.array(take))
        if isinstance(taken, pa.ChunkedArray):
            taken = taken.combine_chunks()
        offs = np.concatenate([[0], np.cumsum(widths)])
        if offs[-1] < 2**31:
            sliced = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), taken)
        else:  # overlap factor × giant batch: spill to 64-bit offsets
            sliced = pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()), taken)
        return pa.table({
            id_column: pa.array(ids[doc_idx]),
            "chunk_id": pa.array(chunk_id),
            "tok_lo": pa.array(lo),
            "tok_hi": pa.array(hi),
            "chunk_text": pc.binary_join(sliced, " "),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def bin_pack(ds, *, budget: int, id_column: str = "doc_id",
             text_column: str = "text", seed: int = 0,
             shard_bits: int = 6):
    """NO-SPLIT training-batch packing: assign whole documents to bins
    of at most ``budget`` tokens (next-fit-decreasing) — the packing
    used when examples must stay intact (instruction tuning, eval
    batches), complementing :func:`sequence_pack`'s concatenate-then-
    split layout.  Documents longer than ``budget`` get a singleton
    bin (flagged oversize).

    Deterministic and distributed: docs route to md5-range shards (the
    sequence_pack device), each shard sorts ITS docs by (tokens desc,
    key) and packs greedily — the greedy loop runs per BIN, not per
    doc (``searchsorted`` on the shard's size cumsum finds each bin's
    extent), so a shard with millions of docs costs its bin count in
    Python steps.  ``bin_id = (shard << 32) | local_bin`` is globally
    unique and reproducible; bins never cross shards, costing at most
    one underfull bin per shard vs the sequential greedy.

    Emits (id, n_tokens, bin_id, oversize).
    """
    shards = 1 << shard_bits

    def lean(batch: pa.Table) -> pa.Table:
        _, _, _, _, n = _tokenize_counts(batch, text_column)
        ids = batch.column(id_column).to_pylist()
        qkey = _md5_key60(ids, seed)
        return pa.table({
            id_column: batch.column(id_column),
            "n_tokens": pa.array(n),
            "__qkey": pa.array(qkey),
            "__shard": pa.array((qkey >> (60 - shard_bits)).astype(np.int32)),
        })

    def layout(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["n_tokens", "__qkey", id_column],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        n = group["n_tokens"].to_numpy()
        shard = int(group["__shard"].iloc[0])
        bin_ids = np.empty(len(n), dtype=np.int64)
        cum = np.cumsum(n)
        i, b = 0, 0
        while i < len(n):
            if n[i] >= budget:        # oversize or exact-fit singleton
                j = i + 1
            else:
                base = cum[i - 1] if i else 0
                j = int(np.searchsorted(cum, base + budget,
                                        side="right"))
                j = max(j, i + 1)
            bin_ids[i:j] = b
            i, b = j, b + 1
        return pd.DataFrame({
            id_column: group[id_column].to_numpy(),
            "n_tokens": n,
            "bin_id": (np.int64(shard) << np.int64(32)) | bin_ids,
            "oversize": n > budget,
        })

    return (ds.map_batches(lean, batch_format="pyarrow")
            .groupby("__shard").map_groups(layout, batch_format="pandas"))


def shard_manifest(ds, *, id_column: str = "doc_id",
                   text_column: str | None = None, seed: int = 42,
                   shard_bits: int = 6):
    """Per-shard manifest (shard, n_docs[, n_tokens]) of the
    deterministic md5 range-sharding shared with :func:`sequence_pack`
    and :func:`assign_row_ids` — the resume index a 100-TB writer
    consults to skip finished output partitions (SURVEY §6 resumable
    output; the KG sink's manifest-flip analog for bulk corpora).

    Map-side: each batch folds to ≤ 2^``shard_bits`` lean partial rows
    (np.bincount over shard ids); ONE shard-scale groupby finishes.
    ``text_column`` adds exact whitespace-token totals per shard.
    """
    shards = 1 << shard_bits

    def partial(batch: pa.Table) -> pa.Table:
        qkey = _md5_key60(batch.column(id_column).to_pylist(), seed)
        sh = (qkey >> (60 - shard_bits)).astype(np.int64)
        n_docs = np.bincount(sh, minlength=shards).astype(np.int64)
        cols = {"shard": pa.array(np.arange(shards, dtype=np.int64)),
                "n_docs": pa.array(n_docs)}
        if text_column is not None:
            _, _, _, _, n_tok = _tokenize_counts(batch, text_column)
            cols["n_tokens"] = pa.array(np.bincount(
                sh, weights=n_tok, minlength=shards).astype(np.int64))
        t = pa.table(cols)
        return t.filter(pc.greater(t.column("n_docs"), 0))

    folded = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby("shard")
    if text_column is not None:
        out = folded.sum(["n_docs", "n_tokens"])
        return out.map_batches(
            lambda t: t.rename_columns(["shard", "n_docs", "n_tokens"]),
            batch_format="pyarrow")
    out = folded.sum("n_docs")
    return out.map_batches(
        lambda t: t.rename_columns(["shard", "n_docs"]),
        batch_format="pyarrow")


def cdc_chunks(ds, *, id_column: str = "doc_id",
               text_column: str = "text", k: int = 3, divisor: int = 8):
    """Content-defined chunking (the FastCDC/LBFS idea at word
    granularity): split each document into variable-size chunks whose
    boundaries are decided by the CONTENT — a cut falls after token
    ``j`` whenever the hash of the ``k``-token gram ending at ``j`` is
    ≡ 0 (mod ``divisor``) — so an insertion early in a document shifts
    only the chunks it touches, never the whole tail (fixed-window
    chunking re-keys everything downstream of an edit).  Chunk-level
    exact dedup over these pieces is the storage/dedup backbone of
    large snapshot corpora; expected chunk length ≈ ``divisor`` tokens.

    MAP-ONLY: a row is a whole document, so there is NO exchange —
    tokenize → winnow-style aligned-slice gram build → one vectorized
    md5 kernel call → doc-local cumsum chunk ids → zero-loop Arrow
    ``ListArray``/``binary_join`` chunk rebuild.  The gram hash is the
    first 15 md5 hex chars of the space-joined gram (int64-safe), so
    the chunking has an exact DuckDB oracle (window cumsum over the
    same flag).  Empty documents emit nothing; a document emits
    ``1 + n_boundaries`` chunks.

    Returns ``(id, chunk_id, chunk_text, n_tokens)`` — ``chunk_text``
    is the space-joined normalized token run (original inter-token
    whitespace is not preserved; pair with ``chunk_spans`` when byte
    fidelity matters).
    """

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        id_type = batch.schema.field(id_column).type
        empty = pa.table({
            id_column: pa.array([], id_type),
            "chunk_id": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64())})
        toks_list = pc.split_pattern_regex(batch.column(text_column),
                                           r"\s+")
        if isinstance(toks_list, pa.ChunkedArray):
            toks_list = toks_list.combine_chunks()
        flat = np.asarray(toks_list.flatten(), dtype=object)
        counts = np.asarray(pc.list_value_length(toks_list),
                            dtype=np.int64)
        parents = np.repeat(np.arange(len(ids)), counts)
        mask = flat != ""
        flat, parents = flat[mask], parents[mask]
        n = len(flat)
        if n == 0:
            return empty

        # boundary flag on token j: hash of the k-gram ENDING at j
        flags = np.zeros(n, dtype=bool)
        if n >= k:
            s = flat.astype(str)
            gram = s[: n - k + 1].copy()
            for off in range(1, k):
                gram = np.char.add(np.char.add(gram, " "),
                                   s[off: n - k + 1 + off])
            same_doc = parents[k - 1:] == parents[: n - k + 1]
            gpos = np.flatnonzero(same_doc)  # gram start p -> token p+k-1
            if len(gpos):
                h = md5_prefix_u64(gram[gpos], 15)
                flags[gpos + k - 1] = (h % np.uint64(divisor)
                                       ) == np.uint64(0)

        # a cut after token j starts a new chunk at j+1 (never across
        # documents: the shifted flag is zeroed on each doc's first
        # token)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        first[1:] = parents[1:] != parents[:-1]
        shifted = np.concatenate(([False], flags[:-1]))
        shifted[first] = False
        cs = np.cumsum(shifted.astype(np.int64))
        doc_first_idx = np.flatnonzero(first)
        chunk_local = cs - np.repeat(cs[doc_first_idx],
                                     np.diff(np.append(doc_first_idx, n)))

        starts = first | shifted
        offs = np.append(np.flatnonzero(starts), n).astype(np.int64)
        if offs[-1] < 2**31:
            lst = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(flat, pa.string()))
        else:  # mirror chunk_spans' 64-bit offset fallback
            lst = pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()),
                pa.array(flat, pa.large_string()))
        seg_start = offs[:-1]
        return pa.table({
            id_column: pa.array(ids[parents[seg_start]], id_type),
            "chunk_id": pa.array(chunk_local[seg_start], pa.int64()),
            "chunk_text": pc.binary_join(
                lst, " ").cast(pa.string()),
            "n_tokens": pa.array(np.diff(offs), pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")
