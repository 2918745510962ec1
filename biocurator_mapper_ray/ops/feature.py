"""ML featurization operators: the hashing trick and rare-category
bucketing.

No reference equivalent (biocurator_mapper featurizes with a remote
embedding model, ``app/do_embeddings.py:40-80``); these are the
classic sparse/categorical featurizers a training-data pipeline runs
before any model sees a row.

Scale shapes:

* :func:`feature_hash_counts` is MAP-ONLY — a row is a whole document,
  so its (feature, count) vector is batch-local; zero exchange, the
  cheapest possible plan at 100 TB.  The bucket function is the
  md5-prefix kernel shared with the sampling/packing ops so the DuckDB
  oracle expression ``CAST('0x' || substr(md5(w),1,15) AS UBIGINT) %
  n`` matches bit-exactly.
* :func:`bucket_rare_values` is the boilerplate-removal shape: one
  vocab-scale count exchange (map-side ``value_counts`` partials, so
  the exchange carries distinct values per batch, not rows), a
  BOUNDED driver collect of the frequent survivors (``max_keep`` cap +
  warning — mirrors ``ops/boilerplate.frequent_line_hashes``), then a
  broadcast ``ray.put`` set probed map-side with a sorted
  ``searchsorted`` membership test.  Text/rows never shuffle.
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_prefix_u64


def feature_hash_counts(ds, *, id_column: str = "doc_id",
                        text_column: str = "text", n_features: int = 64):
    """Hashing-trick featurizer: per document, the count of tokens
    landing in each of ``n_features`` hash buckets — the fixed-width
    sparse representation (Weinberger et al. 2009) used when the vocab
    is unbounded.  Returns lean (id, feature, n) rows for features with
    n > 0 only.

    Tokenization is the repo-wide oracle tokenizer (lower + whitespace
    split, empties dropped); the bucket is ``md5-prefix60 % n_features``
    so a DuckDB oracle reproduces it exactly.
    """

    def fh(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_column)),
            "[ \\t\\n\\r\\f\\x0b]+")
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        flat = toks.flatten()
        offs = toks.offsets.to_numpy()
        parent = np.repeat(np.arange(len(toks), dtype=np.int64),
                           np.diff(offs))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        if len(parent) == 0:
            return pa.table({
                id_column: batch.column(id_column).slice(0, 0),
                "feature": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64())})
        feat = (md5_prefix_u64(flat, 15)
                % np.uint64(n_features)).astype(np.int64)
        # one flat key per (row, feature): C-level unique+count, no
        # per-row Python
        key = parent * n_features + feat
        uk, counts = np.unique(key, return_counts=True)
        return pa.table({
            id_column: batch.column(id_column).take(
                pa.array(uk // n_features)),
            "feature": pa.array((uk % n_features).astype(np.int64)),
            "n": pa.array(counts.astype(np.int64))})

    return ds.map_batches(fh, batch_format="pyarrow")


def bucket_rare_values(ds, *, columns, min_count: int,
                       other: str = "__other__", sep: str = ":",
                       out_column: str | None = None,
                       max_keep: int = 1_000_000):
    """Replace category values whose GLOBAL count is below ``min_count``
    with the ``other`` sentinel — the rare-category bucketing every
    categorical feature pipeline applies before one-hot/target encoding
    (unseen-at-serve and long-tail categories collapse to one bucket).

    ``columns`` is a column name or a list of names; multi-column keys
    are joined with ``sep`` (matching the SQL ``a || sep || b``
    expression).  Adds ``out_column`` (default
    ``{cols}_bucketed``) to the dataset; input rows/columns pass
    through untouched otherwise.

    The frequent-set collect is capped at ``max_keep`` values (kept by
    highest count, ties by value) with a warning — an adversarial
    all-values-frequent corpus degrades to extra ``other`` rows, never
    to a driver OOM.
    """
    import ray as _ray

    cols = [columns] if isinstance(columns, str) else list(columns)
    out_column = out_column or ("_".join(cols) + "_bucketed")

    def cat_col(batch: pa.Table) -> pa.Array:
        arrs = [pc.cast(batch.column(c), pa.string()) for c in cols]
        if len(arrs) == 1:
            a = arrs[0]
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        j = pc.binary_join_element_wise(*arrs, sep)
        return j.combine_chunks() if isinstance(j, pa.ChunkedArray) else j

    def cpart(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(cat_col(batch))
        return pa.table({"cat": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    freq = (ds.map_batches(cpart, batch_format="pyarrow")
            .groupby("cat").sum("n")
            .map_batches(lambda t: t.filter(pc.greater_equal(
                t.column("sum(n)"), min_count)), batch_format="pyarrow")
            .to_pandas())  # frequent-category scale, capped just below
    if len(freq) > max_keep:
        warnings.warn(
            f"bucket_rare_values: frequent set capped at {max_keep} of "
            f"{len(freq)} qualifying values (the overflow collapses to "
            f"'{other}'); raise max_keep to keep them all")
        freq = freq.sort_values(
            ["sum(n)", "cat"], ascending=[False, True]).head(max_keep)
    keep = np.sort(freq["cat"].to_numpy(dtype=str)) if len(freq) \
        else np.array([], dtype=str)
    ref = _ray.put(keep)

    def replace(batch: pa.Table, ref=None) -> pa.Table:
        kp = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
        vals = cat_col(batch).to_numpy(zero_copy_only=False)
        if len(kp) and len(vals):
            pos = np.minimum(np.searchsorted(kp, vals), len(kp) - 1)
            kept = kp[pos] == vals
        else:
            kept = np.zeros(len(vals), dtype=bool)
        out = np.where(kept, vals, other)
        return batch.append_column(out_column, pa.array(out, pa.string()))

    return ds.map_batches(replace, fn_kwargs={"ref": ref},
                          batch_format="pyarrow")


def calendar_features(batch: pa.Table, *, ts_column: str = "ts",
                      prefix: str = "") -> pa.Table:
    """Calendar feature extraction from a timestamp column — the
    standard temporal featurization before any seasonality-aware
    model or time-stratified split: appends ``dow`` (0=Monday, ISO
    weekday − 1), ``hour`` (0–23), ``month`` (1–12), ``is_weekend``
    (0/1 int64).  MAP-ONLY pure Arrow temporal kernels (zero copy,
    zero exchange); DuckDB mirror: ``isodow(ts)-1``, ``hour(ts)``,
    ``month(ts)``, ``CASE WHEN isodow(ts) >= 6``.
    """
    ts = batch.column(ts_column)
    dow = pc.subtract(
        pc.day_of_week(ts, count_from_zero=False,
                       week_start=1).cast(pa.int64()), 1)
    hour = pc.hour(ts).cast(pa.int64())
    month = pc.month(ts).cast(pa.int64())
    weekend = pc.cast(pc.greater_equal(dow, 5), pa.int64())
    out = batch
    for name, col in ((f"{prefix}dow", dow), (f"{prefix}hour", hour),
                      (f"{prefix}month", month),
                      (f"{prefix}is_weekend", weekend)):
        out = out.append_column(name, col)
    return out
