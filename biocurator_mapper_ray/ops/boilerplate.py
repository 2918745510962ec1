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
