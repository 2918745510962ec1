"""Boilerplate line removal: drop lines that repeat across many
documents (navigation bars, cookie banners, footers) while preserving
each document's remaining line order — the line-level dedup pass
web-corpus pipelines (CCNet / C4 / FineWeb lineage) run before
document-level filters.

No reference equivalent (biocurator_mapper has no corpus ops).

Two phases, the same small-side/broadcast shape as
:mod:`~biocurator_mapper_ray.ops.decontam`:

1. :func:`frequent_line_hashes` — count DISTINCT documents per line
   (per-batch distinct (doc, line) explode, partial counts through one
   salted exchange bounded by batch line-vocabulary), keep lines in
   ≥ ``min_docs`` documents.  That set is small by construction (its
   size is ≤ total_lines / min_docs) and is returned as a sorted
   uint64 hash array for broadcast.
2. :func:`remove_frequent_lines` — map-side scrub: split, hash, one
   ``searchsorted`` membership probe, rebuild each document from its
   surviving lines with one Arrow ``binary_join`` (ListArray over the
   kept lines — contiguous, so no take/copy) — no per-row Python, no
   exchange.

Membership is tested on 64-bit line hashes (not the strings), exactly
like the decontamination op: a false positive needs a 2^-64 collision
with a frequent line, and only ever over-removes a boilerplate-like
line — acceptable at any corpus size, documented here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column


def _explode_lines(batch: pa.Table, text_column: str, id_column: str):
    """(doc_index, line) pairs for one batch — one Arrow split pass."""
    text = pc.cast(batch.column(text_column), pa.string())
    lines = pc.split_pattern(text, "\n")
    flat = pc.list_flatten(lines)
    lens = pc.list_value_length(lines).to_numpy().astype(np.int64)
    doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, doc, lens


def frequent_line_hashes(ds, *, text_column: str = "text",
                         id_column: str = "doc_id", min_docs: int,
                         shards: int = 32,
                         max_lines: int = 4_000_000) -> np.ndarray:
    """Sorted uint64 hashes of lines appearing in ≥ ``min_docs``
    DISTINCT documents (the broadcast side of the scrub).

    ``max_lines`` bounds the broadcast set — and, because the cap is
    applied INSIDE the salted combine (each shard keeps its
    ``max_lines/shards`` most-frequent qualifying lines, ties broken by
    hash), the driver-side collect too.  An adversarial corpus where
    every line qualifies therefore cannot pull corpus-line-scale data
    to the driver; the least-frequent overflow lines are left unscrubbed
    and a warning reports how many were dropped.  Hashes are salted
    uniformly across shards, so the per-shard quota is an unbiased
    approximation of the global top-``max_lines``.
    """
    quota = max(1, max_lines // shards)

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc, _ = _explode_lines(batch, text_column, id_column)
        if not len(doc):
            return pa.table({"h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int32())})
        h = hash64_column(flat if isinstance(flat, pa.ChunkedArray)
                          else pa.chunked_array([flat]))
        # distinct (doc, line-hash): doc counts, not occurrence counts
        key = np.lexsort((h, doc))
        hs, ds_ = h[key], doc[key]
        first = np.ones(len(hs), dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
        hs = hs[first]
        uniq, counts = np.unique(hs, return_counts=True)
        salt = (uniq % np.uint64(shards)).astype(np.int32)
        return pa.table({"h": pa.array(uniq), "n": pa.array(counts),
                         "__s": pa.array(salt)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("h", sort=False, as_index=False)["n"].sum()
        g = g[g["n"] >= min_docs]
        dropped = 0
        if len(g) > quota:
            dropped = len(g) - quota
            g = g.sort_values(["n", "h"],
                              ascending=[False, True]).head(quota)
        g = g[["h"]].reset_index(drop=True)
        g["__dropped"] = 0
        if dropped:
            g.loc[0, "__dropped"] = dropped
        return g

    freq = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__s")
              .map_groups(combine, batch_format="pandas")
              .to_pandas())
    if not len(freq):
        return np.zeros(0, dtype=np.uint64)
    n_dropped = int(freq["__dropped"].sum())
    if n_dropped:
        import warnings

        warnings.warn(
            f"frequent_line_hashes: broadcast set capped at ~{max_lines} "
            f"lines ({n_dropped} qualifying lines dropped, least-frequent "
            "first — they will not be scrubbed); raise max_lines to keep "
            "them", stacklevel=2)
    return np.sort(freq["h"].to_numpy().astype(np.uint64))


def remove_frequent_lines(ds, freq_hashes, *, text_column: str = "text",
                          id_column: str = "doc_id"):
    """Scrub the broadcast frequent-line set out of every document
    (``freq_hashes``: sorted uint64 array or a ``ray.put`` handle).
    Emits (id, text, n_removed); line order is preserved, documents
    whose every line was boilerplate become the empty string."""
    import ray as _ray

    def scrub(batch: pa.Table) -> pa.Table:
        freq = (freq_hashes if isinstance(freq_hashes, np.ndarray)
                else _ray.get(freq_hashes))
        flat, doc, lens = _explode_lines(batch, text_column, id_column)
        n_docs = len(lens)
        if not len(doc):
            return pa.table({id_column: batch.column(id_column),
                             text_column: batch.column(text_column),
                             "n_removed": pa.array(
                                 np.zeros(n_docs, dtype=np.int64))})
        h = hash64_column(flat if isinstance(flat, pa.ChunkedArray)
                          else pa.chunked_array([flat]))
        if len(freq):
            pos = np.minimum(np.searchsorted(freq, h), len(freq) - 1)
            drop = freq[pos] == h
        else:
            drop = np.zeros(len(h), dtype=bool)
        keep = ~drop
        kept_per_doc = np.bincount(doc[keep], minlength=n_docs).astype(np.int64)
        flat_arr = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        kept_lines = flat_arr.filter(pa.array(keep))
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
        # mirror pack.py's guard: spill to 64-bit offsets past 2^31 lines
        if offsets[-1] < 2**31:
            kept_list = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), kept_lines)
        else:
            kept_list = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()),
                kept_lines.cast(pa.large_string()))
        rebuilt = pc.binary_join(kept_list, "\n")
        n_removed = (lens - kept_per_doc).astype(np.int64)
        return pa.table({id_column: batch.column(id_column),
                         text_column: rebuilt,
                         "n_removed": pa.array(n_removed)})

    return ds.map_batches(scrub, batch_format="pyarrow")


def boilerplate_scrub(ds, *, text_column: str = "text",
                      id_column: str = "doc_id", min_docs: int,
                      shards: int = 32, max_lines: int = 4_000_000):
    """Phase 1 + broadcast + phase 2 in one call."""
    import ray as _ray

    freq = frequent_line_hashes(ds, text_column=text_column,
                                id_column=id_column, min_docs=min_docs,
                                shards=shards, max_lines=max_lines)
    return remove_frequent_lines(ds, _ray.put(freq),
                                 text_column=text_column,
                                 id_column=id_column)


# ------------------------------------------------- global line dedup

def dedup_lines_global(ds, *, text_column: str = "text",
                       id_column: str = "doc_id",
                       buckets: int | None = None,
                       size_hint: int | None = None):
    """C4-style GLOBAL line dedup: every exact duplicate line keeps
    only its corpus-wide first occurrence (owner = min
    ``(doc_id, line_idx)``); later occurrences — in other documents OR
    later in the same document — are removed and each document is
    rebuilt from its surviving lines in order.  Emits
    ``(id, text_dedup, n_removed)``.

    Distinct from :func:`boilerplate_scrub` (which drops EVERY copy of
    a line frequent in ≥ min_docs documents): this keeps exactly one
    copy of every line, the standard C4/Dolma line-dedup contract.

    Scale shape — the :func:`~biocurator_mapper_ray.ops.dedup.remove_duplicate_spans`
    design at line granularity, two lean exchanges:

    1. occurrence rows ``(h64(line), doc, idx)`` (~24 B each, no line
       text) through a hash-salted exchange; each bucket emits its
       LOSERS — every occurrence of a line except the global minimum.
       Loser volume is duplicate-scale, not corpus-scale.
    2. a doc-bucketed union join where each bucket carries its docs'
       text ONCE plus their loser positions; the rebuild is the
       :func:`remove_frequent_lines` ListArray/binary_join kernel.

    Membership/ownership is decided on 64-bit line hashes (the
    :func:`frequent_line_hashes` contract): a 2^-64 collision merges
    two distinct lines' ownership chains — acceptable at any corpus
    size, documented here.
    """
    from ..functions.hashing import hash64_column as _h64
    from .join import derive_buckets

    n_docs = ds.count()
    if buckets is None:
        est = size_hint if size_hint is not None else n_docs * 8
        buckets = derive_buckets(est)
    doc_buckets = derive_buckets(n_docs, rows_per_bucket=1 << 15)

    def occ_rows(batch: pa.Table) -> pa.Table:
        flat, doc, lens = _explode_lines(batch, text_column, id_column)
        if not len(doc):
            return pa.table({"__h": pa.array([], pa.uint64()),
                             id_column: pa.array([], pa.int64()),
                             "idx": pa.array([], pa.int64()),
                             "__bucket": pa.array([], pa.int32())})
        h = hash64_column(flat if isinstance(flat, pa.ChunkedArray)
                          else pa.chunked_array([flat]))
        # line index within its document: position minus the doc's offset
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        idx = np.arange(len(doc), dtype=np.int64) - offs[doc]
        ids = batch.column(id_column).to_numpy()
        return pa.table({
            "__h": pa.array(h),
            id_column: pa.array(ids[doc]),
            "idx": pa.array(idx),
            "__bucket": pa.array((h % np.uint64(buckets)).astype(np.int32)),
        })

    def losers_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__h", id_column, "idx"], kind="mergesort")
        lose = g.duplicated("__h", keep="first")
        out = g.loc[lose, [id_column, "idx"]]
        if not len(out):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "idx": pa.array([], pa.int64())})
        return out

    losers = (ds.map_batches(occ_rows, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(losers_in_bucket, batch_format="pandas"))

    def tag(batch: pa.Table, side: int) -> pa.Table:
        h = _h64(batch.column(id_column))
        return pa.table({
            id_column: batch.column(id_column),
            "__text": (batch.column(text_column) if side == 0
                       else pa.nulls(len(batch), pa.string())),
            "idx": (batch.column("idx") if side == 1
                    else pa.nulls(len(batch), pa.int64())),
            "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "__dbucket": pa.array(
                (h % np.uint64(doc_buckets)).astype(np.int32)),
        })

    docs_t = ds.map_batches(tag, fn_kwargs={"side": 0},
                            batch_format="pyarrow")
    dels_t = losers.map_batches(tag, fn_kwargs={"side": 1},
                                batch_format="pyarrow")

    def rebuild_bucket(g: pd.DataFrame):
        docs = g[g["__side"] == 0]
        if not len(docs):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "text_dedup": pa.array([], pa.string()),
                             "n_removed": pa.array([], pa.int64())})
        sub = pa.table({
            id_column: pa.array(docs[id_column].to_numpy()),
            text_column: pa.array(docs["__text"].to_numpy(), pa.string()),
        })
        flat, doc, lens = _explode_lines(sub, text_column, id_column)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        keep = np.ones(int(offs[-1]), dtype=bool)
        dels = g[g["__side"] == 1]
        if len(dels):
            ids = docs[id_column].to_numpy()
            pos_of = pd.Series(np.arange(len(ids)), index=ids)
            dd = pos_of[dels[id_column].to_numpy()].to_numpy(np.int64)
            # idx arrives as float64 (NaN-padded by the union tag)
            keep[offs[dd] + dels["idx"].to_numpy(np.int64)] = False
        n_docs_b = len(lens)
        kept_per_doc = np.bincount(doc[keep], minlength=n_docs_b).astype(
            np.int64)
        flat_arr = (flat.combine_chunks()
                    if isinstance(flat, pa.ChunkedArray) else flat)
        kept_lines = flat_arr.filter(pa.array(keep))
        koffs = np.concatenate([[0], np.cumsum(kept_per_doc)])
        if koffs[-1] < 2**31:
            kept_list = pa.ListArray.from_arrays(
                pa.array(koffs, pa.int32()), kept_lines)
        else:
            kept_list = pa.LargeListArray.from_arrays(
                pa.array(koffs, pa.int64()),
                kept_lines.cast(pa.large_string()))
        return pa.table({
            id_column: sub.column(id_column),
            "text_dedup": pc.binary_join(kept_list, "\n"),
            "n_removed": pa.array((lens - kept_per_doc).astype(np.int64)),
        })

    return docs_t.union(dels_t).groupby("__dbucket").map_groups(
        rebuild_bucket, batch_format="pandas")
