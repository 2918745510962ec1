"""Hashed linear text classification — fasttext-style batched inference.

No reference equivalent; this is the standard cheap quality/domain
classifier of web-scale curation pipelines (CCNet, DataComp-LM filter
models): score(doc) = Σ weight(feature(token)), features hashed into a
fixed-size table so the model is a dense vector independent of
vocabulary size.  Published pattern: Joulin et al. 2016, "Bag of Tricks
for Efficient Text Classification" (fastText); Weinberger et al. 2009,
"Feature Hashing for Large Scale Multitask Learning".

The Ray-side plumbing is real batched model inference: the weight table
ships once through the object store (zero-copy ``ray.get`` per task),
each batch scores vectorized (unique-token md5 via the DuckDB-backed
kernel + np.add.at scatter per doc), and no exchange happens at all —
per-document scoring is embarrassingly parallel.  Swapping in a trained
model = passing its weights array via ``ray.put``.

SQL-checkability: the default weight of token ``t`` is
``(md5_u64(t) % 2001) - 1000`` — byte-identical to DuckDB's
``CAST(CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT) % 2001 AS BIGINT)
- 1000`` — so ``weight_sum``/``n_tokens``/``label`` are exact integers
with a full value-hash oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# md5-derived integer weights in [-1000, 1000]; 2001 odd so the
# distribution over residues is (near-)uniform and symmetric
_WEIGHT_MOD = 2001
_WEIGHT_OFF = 1000


def hashed_linear_score(batch: pa.Table, *, text_column: str = "text",
                        weights_ref=None) -> pa.Table:
    """documents batch → (id cols…, weight_sum, n_tokens, label): the
    integer score of a hashed linear model over whitespace tokens.

    ``weights_ref``: optional ``ray.ObjectRef`` of a ``(table_size,)``
    float/int weight array for a real trained model — ``ray.get`` is
    zero-copy from the local object store, so a plain task function
    beats an actor pool (no setup worth amortizing, fuses with the
    read); tokens index by ``md5_u64(tok) % table_size``.  Without it
    the deterministic md5-derived weights are used (exact SQL oracle).
    """
    weights = None
    if weights_ref is not None:
        import ray

        weights = np.asarray(
            ray.get(weights_ref)
            if not isinstance(weights_ref, np.ndarray) else weights_ref)

    def _token_weights(uniq: pa.Array) -> np.ndarray:
        from biocurator_mapper_ray.functions.hashing import md5_prefix_u64

        h = md5_prefix_u64(uniq)
        if weights is not None:
            return weights[(h % np.uint64(len(weights))).astype(np.int64)]
        return ((h % np.uint64(_WEIGHT_MOD)).astype(np.int64) - _WEIGHT_OFF)

    text = batch.column(text_column)
    toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_np = flat.to_numpy(zero_copy_only=False)[keep]
    parents = parents[keep]

    n_tokens = np.zeros(len(batch), dtype=np.int64)
    weight_sum = np.zeros(len(batch), dtype=np.int64)
    if len(flat_np):
        # weight per DISTINCT token once (heavy-tailed vocabulary),
        # then scatter-add occurrences back to their documents
        uniq, inv = np.unique(flat_np, return_inverse=True)
        w = _token_weights(pa.array(uniq)).astype(np.int64)
        np.add.at(n_tokens, parents, 1)
        np.add.at(weight_sum, parents, w[inv])
    return (
        batch.drop_columns([text_column])
        .append_column("weight_sum", pa.array(weight_sum))
        .append_column("n_tokens", pa.array(n_tokens))
        .append_column("label", pa.array(weight_sum > 0))
    )


def classify_documents(ds, *, text_column: str = "text",
                       weights_ref=None):
    """Score every document with the hashed linear model — a pure
    task-pool map, zero exchange (the model ships through the object
    store and resolves zero-copy per task)."""
    return ds.map_batches(
        hashed_linear_score,
        fn_kwargs={"text_column": text_column, "weights_ref": weights_ref},
        batch_format="pyarrow",
    )


def range_lookup(ds, *, column: str, breaks, labels: list[str],
                 out: str = "band"):
    """Broadcast range/banding lookup: label each row by which
    ``breaks`` interval its ``column`` value falls in —
    ``labels[i]`` for values in ``[breaks[i-1], breaks[i])`` (first
    label below ``breaks[0]``, last at/above ``breaks[-1]``).  The
    IP→geo / price-band / SLA-tier pattern: the dimension side is
    result-scale by definition, so it rides INSIDE the map task as a
    sorted numpy array + one vectorized ``searchsorted`` per batch —
    never a join, never an exchange (the decontam broadcast rule).

    ``len(labels) == len(breaks) + 1``; breaks must be sorted
    ascending.  SQL mirror: the equivalent CASE/BETWEEN cascade.
    """
    br = np.asarray(breaks)
    if len(labels) != len(br) + 1:
        raise ValueError("need len(labels) == len(breaks) + 1")
    if np.any(np.diff(br) <= 0):
        raise ValueError("breaks must be strictly ascending")
    lab = np.asarray(labels, dtype=object)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(br, v, side="right")
        return batch.append_column(out, pa.array(lab[idx], pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")
