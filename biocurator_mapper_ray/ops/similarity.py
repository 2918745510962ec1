"""Similarity search over embedding columns.

* :func:`knn_search` — exact brute-force cosine top-k: per-batch numpy
  matmul against a broadcast query matrix, batch-local top-k, then a
  tiny ``groupby(query_id)`` merge of the per-batch winners.  The merge
  input is ≤ (num_batches × k) rows per query — never the full corpus.
* :func:`embedding_near_dup_pairs` — random-hyperplane LSH (sign-bit
  signatures, banded like MinHash) → bucket groupby → within-bucket
  exact cosine verification.  The scale path for all-pairs similarity.
* :class:`HyperplaneLSH` — shared signature kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(column) -> np.ndarray:
    """list<float> Arrow column → (n, d) float32 matrix."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    flat = column.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(column)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


class BatchTopK:
    """Per-batch brute-force scorer against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_column: str, vec_column: str):
        import ray

        q = queries_ref if isinstance(queries_ref, np.ndarray) else ray.get(queries_ref)
        self.queries = _normalize(np.asarray(q, dtype=np.float32))
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(self.vec_column)))
        ids = batch.column(self.id_column).to_numpy()
        sims = self.queries @ mat.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        if k == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    self.id_column: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float32()),
                }
            )
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        psims = np.take_along_axis(sims, part, axis=1)
        out_q = np.repeat(np.arange(sims.shape[0], dtype=np.int64), k)
        return pa.table(
            {
                "query_id": pa.array(out_q),
                self.id_column: pa.array(ids[part].reshape(-1)),
                "cosine": pa.array(psims.reshape(-1).astype(np.float32)),
            }
        )


def knn_search(ds, queries: np.ndarray, k: int = 10,
               id_column: str = "vec_id", vec_column: str = "embedding"):
    """Exact top-k by cosine for each query row; returns
    (query_id, vec_id, cosine, rank) with deterministic tie-break on id."""
    import ray

    queries_ref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        BatchTopK,
        fn_constructor_args=(queries_ref, k, id_column, vec_column),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_column], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class HyperplaneLSH:
    """Sign-bit signatures from seeded random hyperplanes."""

    def __init__(self, dim: int, num_bits: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(num_bits, dim)).astype(np.float32)
        self.num_bits = num_bits

    def signature_bits(self, mat: np.ndarray) -> np.ndarray:
        """(n, d) → (n, num_bits) uint8 sign bits."""
        return (mat @ self.planes.T > 0).astype(np.uint8)


def embedding_near_dup_pairs(
    ds,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    num_bits: int = 64,
    bands: int = 8,
    seed: int = 42,
):
    """All-pairs cosine ≥ threshold via hyperplane-LSH bucketing.

    Two vectors with cosine ≥ t agree on a random hyperplane bit with
    probability 1 − arccos(t)/π; banding b×r bits makes high-cosine pairs
    collide in ≥ 1 band w.h.p.  Verified exactly inside the bucket.
    """
    assert num_bits % bands == 0
    rows_per_band = num_bits // bands
    lsh = HyperplaneLSH(dim, num_bits, seed)

    def band_rows(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(vec_column)))
        bits = lsh.signature_bits(mat)  # (n, num_bits)
        ids = batch.column(id_column).to_numpy()
        weights = (1 << np.arange(rows_per_band, dtype=np.int64))
        out = {"doc_id": [], "band_id": [], "band_val": [], "vec": []}
        for band in range(bands):
            chunk = bits[:, band * rows_per_band : (band + 1) * rows_per_band]
            vals = chunk.astype(np.int64) @ weights
            out["doc_id"].append(ids)
            out["band_id"].append(np.full(len(ids), band, dtype=np.int32))
            out["band_val"].append(vals)
            out["vec"].append(mat)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out["doc_id"])),
                "band_id": pa.array(np.concatenate(out["band_id"])),
                "band_val": pa.array(np.concatenate(out["band_val"])),
                "vec": pa.array(
                    [v.tolist() for m in out["vec"] for v in m], pa.list_(pa.float32())
                ),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []}).astype(
                {"a": np.int64, "b": np.int64, "cosine": np.float64}
            )
        ids = g["doc_id"].to_numpy()
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in g["vec"]])
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "a": ids[ia[keep]].astype(np.int64),
                "b": ids[ib[keep]].astype(np.int64),
                "cosine": sims[ia[keep], ib[keep]].astype(np.float64),
            }
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(verify, batch_format="pandas")
    )
    deduped = pairs.groupby(["a", "b"]).max("cosine")
    return deduped.map_batches(
        lambda t: t.rename_columns(["a", "b", "cosine"]), batch_format="pyarrow"
    )
