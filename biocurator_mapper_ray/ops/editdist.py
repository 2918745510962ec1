"""Fuzzy near-duplicate pairs by bounded edit distance.

No reference equivalent (biocurator_mapper's fuzzy matching is embedding
cosine via its vector store, ``app/ontology_searcher.py:95-151``); this
is the character-level member of the dedup family — MinHash/SimHash/
n-gram Jaccard (``ops/dedup.py``) catch token-set overlap, ExactSubstr
catches verbatim spans, and edit distance catches small character
edits (typo variants, template fills, OCR noise).

SEMANTICS CONTRACT — mirrored exactly by the SQL oracle:

* candidates are pairs in the SAME length block
  ``length(text) // length_bucket`` (a necessary-condition prune for
  small distances ONLY within a block; a true near-pair whose lengths
  straddle a block boundary is NOT emitted — run twice with offset
  bucketings for belt-and-braces recall);
* the kernel is ``levenshtein`` over the first ``prefix_len``
  LOWERCASED characters — bounding the O(len²) DP and making the cost
  per pair a constant.  Differences past ``prefix_len`` are invisible
  by definition.

Scale shape: the map side reduces each doc to a ≤``prefix_len``-char
lean row (id, block, prefix) — the full text NEVER leaves the read —
then ONE block-grouped exchange runs the pairwise kernel inside each
block via DuckDB's C++ ``levenshtein`` (the same kernel the oracle
runs: zero parity risk, zero per-row Python).  Within-block compute is
quadratic in block size: exact-on-a-block is the ground-truth/bounded-
corpus tool, like ``ngram_jaccard_pairs(candidates='all')``.  At corpus
scale feed MinHash LSH candidates to :func:`verify_pairs_edit_distance`
instead of blocking on length alone.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_PAIRS = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                          ("dist", pa.int64())])


def _lean_prefix_table(batch: pa.Table, *, text_column: str, id_column: str,
                       prefix_len: int, length_bucket: int) -> pa.Table:
    txt = pc.cast(batch.column(text_column), pa.string())
    low = pc.utf8_lower(txt)
    ln = pc.cast(pc.utf8_length(txt), pa.int64())
    return pa.table({
        "id": pc.cast(batch.column(id_column), pa.int64()),
        "p": pc.utf8_slice_codeunits(low, 0, prefix_len),
        # int64 / int64 divide truncates == floor for non-negative lens
        "blk": pc.divide(ln, pa.scalar(length_bucket, pa.int64())),
    })


def _pairs_kernel(frame: pd.DataFrame, max_dist: int,
                  join_on_blk: bool) -> pa.Table:
    """DuckDB pairwise levenshtein over a bounded frame (C++ kernel —
    the SAME function the DuckDB oracle evaluates)."""
    import duckdb

    con = duckdb.connect()
    try:
        con.register("g", frame)
        blk_eq = "AND l.blk = r.blk" if join_on_blk else ""
        out = con.execute(f"""
            SELECT a, b, dist FROM (
                SELECT l.id AS a, r.id AS b,
                       CAST(levenshtein(l.p, r.p) AS BIGINT) AS dist
                FROM g l JOIN g r ON l.id < r.id {blk_eq}
            ) WHERE dist <= {int(max_dist)}
        """).arrow()
    finally:
        con.close()
    if out.num_rows == 0:
        return _EMPTY_PAIRS.empty_table()
    return out.cast(_EMPTY_PAIRS)


def fuzzy_pairs_edit_distance(
    ds,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_dist: int = 8,
    prefix_len: int = 48,
    length_bucket: int = 32,
):
    """All (a < b) doc pairs in the same length block whose lowercased
    ``prefix_len``-char prefixes are within ``max_dist`` edits.

    Returns a Dataset of (a, b, dist) — int64 throughout.  One lean
    map pass + one block-grouped exchange; each block task's memory is
    its own block's lean rows plus the emitted pairs.
    """
    lean = ds.map_batches(
        _lean_prefix_table,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "prefix_len": prefix_len, "length_bucket": length_bucket},
        batch_format="pyarrow",
    )

    def block_pairs(g: pd.DataFrame) -> pa.Table:
        return _pairs_kernel(g, max_dist, join_on_blk=False)

    return lean.groupby("blk").map_groups(block_pairs, batch_format="pandas")


def verify_pairs_edit_distance(
    ds,
    candidates,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_dist: int = 8,
    prefix_len: int = 48,
    buckets: int | None = None,
):
    """Scale path: re-verify CANDIDATE pairs (a Dataset of (a, b) —
    e.g. from :func:`~biocurator_mapper_ray.ops.dedup.minhash_lsh_pairs`)
    with the exact bounded edit-distance kernel, via the bucketed
    :func:`~biocurator_mapper_ray.ops.join.pair_feature_join` backbone —
    no quadratic block, exchanges sized to candidates + lean prefixes.
    """
    from .join import pair_feature_join

    lean = ds.map_batches(
        _lean_prefix_table,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "prefix_len": prefix_len, "length_bucket": 1},
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.rename_columns(["doc_id", "p", "blk"]).drop_columns(["blk"]),
        batch_format="pyarrow",
    )

    def verify_df(df: pd.DataFrame) -> pd.DataFrame:
        """Fused into the second join's bucket task: DuckDB levenshtein
        over the bucket's candidate pairs (same C++ kernel as the
        blocked exact path)."""
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "dist": pd.Series(dtype=np.int64)})
        import duckdb

        con = duckdb.connect()
        try:
            con.register("g", df[["a", "b", "f_a", "f_b"]])
            out = con.execute(f"""
                SELECT a, b, dist FROM (
                    SELECT a, b, CAST(levenshtein(f_a, f_b) AS BIGINT) AS dist
                    FROM g
                ) WHERE dist <= {int(max_dist)}
            """).df()
        finally:
            con.close()
        return out

    return pair_feature_join(candidates, lean, verify=verify_df,
                             feature_column="p", buckets=buckets)
