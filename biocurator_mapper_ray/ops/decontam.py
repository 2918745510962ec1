"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out benchmark/eval set.

Standard practice for LLM training corpora (the contamination check in
GPT-3/PaLM/Llama-style data pipelines): any training document containing
a long-enough n-gram that also appears in an evaluation set is flagged
(and usually dropped) so eval numbers aren't inflated by memorization.
No reference equivalent (biocurator_mapper has no corpus ops) — this is
one of the first-class training-data operators the engine adds.

Scale shape (the 100-TB path):

* the benchmark side is SMALL (eval sets are thousands of documents) —
  its unique shingle-hash set is built once with one pass, sorted, and
  broadcast via ``ray.put`` (8 B per distinct benchmark shingle);
* the corpus side STREAMS map-side with no exchange: each batch shingles
  its texts in one flat pass (the same vectorized tokenizer the dedup
  suite uses), probes the sorted benchmark set with one
  ``np.searchsorted``, and reduces per-doc overlap counts with
  ``np.add.reduceat`` — no per-row Python in the probe, no shuffle,
  nothing corpus-scale on the driver.

Collision caveat: membership is tested on 64-bit shingle hashes, so a
corpus shingle can collide with a distinct benchmark shingle with
probability ~2^-64 per pair (at 10^12 corpus × 10^6 benchmark shingles,
expected false flags ≈ 5×10^-2 across the whole run — and a false flag
only ever OVER-counts contamination, it can never let a contaminated
document through).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _shingle_strings
from ..functions.hashing import hash64_column


def benchmark_shingle_set(texts: list[str], n: int = 8) -> np.ndarray:
    """Sorted unique shingle-hash set of the benchmark texts (one flat
    hash pass; the broadcast side of :func:`contamination_counts`)."""
    all_shingles: list[str] = []
    for t in texts:
        all_shingles.extend(_shingle_strings(t or "", n))
    if not all_shingles:
        return np.zeros(0, dtype=np.uint64)
    h = hash64_column(pa.chunked_array([pa.array(all_shingles)]))
    return np.unique(h)


def _overlap_counts(texts: list[str], bench: np.ndarray, n: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(hits, n_distinct_shingles) per text — ONE flat shingle pass over
    the whole batch, one searchsorted probe, one segmented reduce."""
    n_docs = len(texts)
    all_shingles: list[str] = []
    lengths = np.empty(n_docs, dtype=np.int64)
    for i, t in enumerate(texts):
        # distinct grams per doc: contamination is a set property
        sh = sorted(set(_shingle_strings(t or "", n)))
        lengths[i] = len(sh)
        all_shingles.extend(sh)
    hits = np.zeros(n_docs, dtype=np.int64)
    if all_shingles and len(bench):
        h = hash64_column(pa.chunked_array([pa.array(all_shingles)]))
        pos = np.minimum(np.searchsorted(bench, h), len(bench) - 1)
        member = (bench[pos] == h).astype(np.int64)
        nonempty = lengths > 0
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])[nonempty]
        hits[nonempty] = np.add.reduceat(member, starts)
    return hits, lengths


def contamination_counts(ds, bench_hashes: np.ndarray, *, n: int = 8,
                         text_column: str = "text", id_column: str = "doc_id"):
    """(doc_id, n_contaminated, n_shingles, contaminated) per corpus
    document: ``n_contaminated`` = how many of the doc's DISTINCT word
    n-grams appear in the benchmark set.

    ``bench_hashes`` is the sorted array from
    :func:`benchmark_shingle_set`; it is ``ray.put`` once here and read
    (zero-copy) by every map task.
    """
    import ray as _ray

    bench_ref = _ray.put(np.ascontiguousarray(bench_hashes, dtype=np.uint64))

    def probe(batch: pa.Table, ref=None) -> pa.Table:
        bench = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
        texts = batch.column(text_column).to_pylist()
        hits, lengths = _overlap_counts(texts, bench, n)
        return pa.table({
            "doc_id": batch.column(id_column),
            "n_contaminated": pa.array(hits),
            "n_shingles": pa.array(lengths),
            "contaminated": pa.array(hits > 0),
        })

    return ds.map_batches(probe, fn_kwargs={"ref": bench_ref},
                          batch_format="pyarrow")


def decontaminate(ds, bench_hashes: np.ndarray, *, n: int = 8,
                  text_column: str = "text", id_column: str = "doc_id",
                  max_overlap: int = 0):
    """Corpus rows whose benchmark n-gram overlap is ≤ ``max_overlap``
    (default: drop any document sharing even one n-gram).  Map-side
    only — clean rows stream through untouched, no exchange."""
    import ray as _ray

    bench_ref = _ray.put(np.ascontiguousarray(bench_hashes, dtype=np.uint64))

    def keep_clean(batch: pa.Table, ref=None) -> pa.Table:
        bench = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
        texts = batch.column(text_column).to_pylist()
        hits, _ = _overlap_counts(texts, bench, n)
        return batch.filter(pa.array(hits <= max_overlap))

    return ds.map_batches(keep_clean, fn_kwargs={"ref": bench_ref},
                          batch_format="pyarrow")


def fuzzy_contamination(ds, bench_texts: list[str], *,
                        text_column: str = "text",
                        id_column: str = "doc_id",
                        num_perm: int = 128, bands: int = 16,
                        shingle_n: int = 3, seed: int = 42,
                        hash_mode: str = "fast"):
    """FUZZY cross-corpus decontamination: ``(doc_id, n_hit_bands)`` for
    every corpus document sharing at least one MinHash LSH band with ANY
    benchmark document — catches paraphrased/near-duplicate eval leakage
    that exact n-gram overlap (:func:`contamination_counts`) misses,
    with the LSH collision probability of the corpus dedup path
    (ops/dedup.MinHashBandStage: same shingles, permutations and band
    fold, so one tuned threshold serves both).

    Scale shape: the benchmark side is eval-set-sized by definition, so
    its band table is computed driver-side and broadcast ONCE via
    ``ray.put`` as per-band sorted hash arrays; the corpus side is one
    map-side signature pass + ``bands`` vectorized searchsorted probes
    — ZERO shuffle, nothing doc-scale leaves the map tasks.  With
    ``hash_mode='md5'`` every hash is DuckDB-expressible, giving an
    exact SQL oracle.
    """
    import ray as _ray

    from .dedup import _SIG_SENTINEL, MinHashBandStage

    stage = MinHashBandStage(text_column=text_column, id_column=id_column,
                             num_perm=num_perm, bands=bands,
                             shingle_n=shingle_n, seed=seed,
                             hash_mode=hash_mode)
    bsigs = stage.signatures([t or "" for t in bench_texts])
    bsigs = bsigs[~(bsigs == _SIG_SENTINEL).all(axis=1)]
    if len(bsigs):
        bh = stage.band_hashes(bsigs)
        per_band = [np.unique(bh[:, j]) for j in range(bands)]
    else:
        per_band = [np.zeros(0, dtype=np.uint64) for _ in range(bands)]
    bench_ref = _ray.put(per_band)

    def probe(batch: pa.Table, ref=None) -> pa.Table:
        pb = ref if isinstance(ref, list) else _ray.get(ref)
        texts = batch.column(text_column).to_pylist()
        sigs = stage.signatures(texts)
        live = ~(sigs == _SIG_SENTINEL).all(axis=1)
        hits = np.zeros(len(texts), dtype=np.int64)
        if live.any():
            ch = stage.band_hashes(sigs[live])
            nh = np.zeros(int(live.sum()), dtype=np.int64)
            for j in range(bands):
                ref_j = pb[j]
                if len(ref_j) == 0:
                    continue
                col = ch[:, j]
                pos = np.minimum(np.searchsorted(ref_j, col),
                                 len(ref_j) - 1)
                nh += (ref_j[pos] == col).astype(np.int64)
            hits[live] = nh
        keep = hits > 0
        return pa.table({
            "doc_id": batch.column(id_column).filter(pa.array(keep)),
            "n_hit_bands": pa.array(hits[keep]),
        })

    return ds.map_batches(probe, fn_kwargs={"ref": bench_ref},
                          batch_format="pyarrow")
