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


def _canonical_rows(mat: np.ndarray) -> np.ndarray:
    """Sort sample rows into a canonical (lexicographic) order.

    ``ds.limit(n).to_pandas()`` returns blocks in whatever order the
    streaming executor finished them, so the SAME sample set can arrive
    in a different row order run-to-run — and a seeded k-means init that
    indexes into the sample then trains different centroids.  Lexsorting
    the (bounded, driver-side) sample makes index training a pure
    function of the sample SET.  O(n log n) on ≤ sample_size rows."""
    if len(mat) <= 1:
        return mat
    order = np.lexsort(mat.T[::-1])
    return mat[order]


def _kmeans(sample: np.ndarray, n_cells: int, iters: int, seed: int) -> np.ndarray:
    """Deterministic Lloyd k-means on a normalized sample (IVF training)."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    centroids = sample[rng.choice(n, size=min(n_cells, n), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ivf_partition(
    ds,
    out_dir: str,
    *,
    n_cells: int = 64,
    sample_size: int = 4096,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
    kmeans_iters: int = 8,
) -> np.ndarray:
    """Build an IVF index as a PARTITIONED PARQUET LAYOUT: k-means
    centroids trained on a bounded sample, every vector written under
    ``out_dir/cell=<c>/`` (hive partitioning).  Searching then reads
    only the probed cells' files — the pruning happens at the READ, which
    is the lever that matters at 100 TB (brute force must stream every
    byte past the CPUs; IVF never loads unprobed partitions at all).

    Returns the (n_cells, d) centroid matrix, also saved to
    ``out_dir/_centroids.npy``."""
    import os

    import ray

    sample_tbl = ds.limit(sample_size).select_columns([vec_column]).to_pandas()
    sample = _canonical_rows(_normalize(
        np.asarray(sample_tbl[vec_column].tolist(), dtype=np.float32)
    ))
    centroids = _kmeans(sample, n_cells, kmeans_iters, seed)
    cent_ref = ray.put(centroids)

    class Assign:
        def __init__(self, ref):
            import ray as _r

            self.cent = ref if isinstance(ref, np.ndarray) else _r.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_as_matrix(batch.column(vec_column)))
            cell = np.argmax(mat @ self.cent.T, axis=1).astype(np.int32) if len(mat) \
                else np.zeros(0, np.int32)
            # cell twice: "cell" becomes the hive partition directory
            # (dropped from file data), "cell_id" stays as a data column
            # so readers of pruned file lists still see the assignment
            return batch.append_column("cell", pa.array(cell)).append_column(
                "cell_id", pa.array(cell)
            )

    ds.map_batches(Assign, fn_constructor_args=(cent_ref,),
                   batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
                   ).write_parquet(out_dir, partition_cols=["cell"])
    os.makedirs(out_dir, exist_ok=True)
    # leading underscore: Arrow dataset discovery ignores it
    np.save(os.path.join(out_dir, "_centroids.npy"), centroids)
    return centroids


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    *,
    n_probe: int = 8,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Approximate top-k over an :func:`ivf_partition` layout.

    Reads ONLY the union of every query's ``n_probe`` nearest cells
    (partition pruning at the read); each batch is scored with one
    matmul and per-query results outside that query's probed cells are
    masked out.  ``n_probe = n_cells`` degrades gracefully to exact
    brute force over the whole layout."""
    import os

    import ray
    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float32))
    n_probe = min(n_probe, len(centroids))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]  # (Q, P)
    probe_mask = np.zeros((len(q), len(centroids)), dtype=bool)
    for qi in range(len(q)):
        probe_mask[qi, probe[qi]] = True
    needed = sorted({int(c) for row in probe for c in row})

    # partition pruning by explicit file listing: unprobed cells'
    # files never enter the read plan at all.  (A pyarrow filter on the
    # hive column would be equivalent, but Ray 2.49 binds read filters
    # against the FILE schema, which omits partition-only columns.)
    import glob

    files = [
        f
        for c in needed
        for f in sorted(glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))
    ]
    ds = rd.read_parquet(files)

    q_ref = ray.put(q)
    mask_ref = ray.put(probe_mask)

    class ProbedTopK:
        def __init__(self, qr, mr):
            import ray as _r

            self.queries = qr if isinstance(qr, np.ndarray) else _r.get(qr)
            self.mask = mr if isinstance(mr, np.ndarray) else _r.get(mr)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_as_matrix(batch.column(vec_column)))
            ids = batch.column(id_column).to_numpy()
            cells = np.asarray(batch.column("cell_id").to_pylist(), dtype=np.int64)
            sims = self.queries @ mat.T  # (Q, B)
            sims = np.where(self.mask[:, cells], sims, -np.inf)
            kk = min(self.k, sims.shape[1])
            if kk == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_column: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float32())})
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(np.arange(sims.shape[0]), kk)
            cols = part.reshape(-1)
            keep = np.isfinite(sims[rows, cols])
            return pa.table(
                {
                    "query_id": pa.array(rows[keep].astype(np.int64)),
                    id_column: pa.array(ids[cols[keep]]),
                    "cosine": pa.array(sims[rows, cols][keep].astype(np.float32)),
                }
            )

    partials = ds.map_batches(ProbedTopK, fn_constructor_args=(q_ref, mask_ref),
                              batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)

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
    collide in ≥ 1 band w.h.p.

    Scale design mirrors :func:`~biocurator_mapper_ray.ops.dedup
    .minhash_lsh_pairs`: the band exchange ships LEAN (doc_id, band_id,
    band_val) rows only — the previous layout duplicated the full vector
    into every band row, multiplying shuffle volume by ``bands`` — then
    all within-bucket candidate pairs are emitted inside 64 salt shards
    and the exact-cosine verify runs fused in a bucketed feature join
    against a packed (4·dim B/doc) vector table.
    """
    assert num_bits % bands == 0
    rows_per_band = num_bits // bands
    lsh = HyperplaneLSH(dim, num_bits, seed)

    from .dedup import _allpairs_index
    from .join import pair_feature_join

    def pack_vecs(batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(vec_column)))
        width = mat.shape[1] * 4 if len(mat) else dim * 4
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(mat),
            [None, pa.py_buffer(np.ascontiguousarray(mat, dtype=np.float32).tobytes())],
        )
        return pa.table({"doc_id": batch.column(id_column), "sig": packed})

    # packed normalized-vector table: the only pass over the raw
    # embedding column; band rows and both verify-join sides read it
    vecs = ds.map_batches(pack_vecs, batch_format="pyarrow").materialize()

    # data-sized exchanges (see ops/dedup.minhash_lsh_pairs): shard /
    # bucket / block counts grow with the corpus instead of inheriting
    # the read's block count, so lean-data exchanges don't pay hundreds
    # of dispatch-bound tasks
    n_docs = vecs.count()
    n_salt = int(min(64, max(8, n_docs // 4096 + 1)))
    vec_blocks = max(1, n_docs // 16384 + 1)
    if vecs.num_blocks() > 2 * vec_blocks:
        vecs = vecs.repartition(vec_blocks).materialize()

    def band_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        mat = (
            np.frombuffer(b"".join(batch.column("sig").to_pylist()),
                          dtype=np.float32).reshape(n, -1)
            if n else np.zeros((0, dim), dtype=np.float32)
        )
        bits = lsh.signature_bits(mat)  # (n, num_bits)
        ids = batch.column("doc_id").to_numpy()
        weights = (1 << np.arange(rows_per_band, dtype=np.int64))
        out = {"doc_id": [], "band_id": [], "band_val": []}
        for band in range(bands):
            chunk = bits[:, band * rows_per_band : (band + 1) * rows_per_band]
            vals = chunk.astype(np.int64) @ weights
            out["doc_id"].append(ids)
            out["band_id"].append(np.full(len(ids), band, dtype=np.int32))
            out["band_val"].append(vals)
        band_id = np.concatenate(out["band_id"])
        band_val = np.concatenate(out["band_val"])
        salt = ((band_val.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + band_id.astype(np.uint64)) % np.uint64(n_salt)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out["doc_id"])),
                "band_id": pa.array(band_id),
                "band_val": pa.array(band_val),
                "__salt": pa.array(salt),
            }
        )

    def cands_in_salt(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group.duplicated(["band_id", "band_val"], keep=False)]
        if g.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        g = g.sort_values(["band_id", "band_val", "doc_id"]).drop_duplicates(
            ["band_id", "band_val", "doc_id"]
        )
        sizes = g.groupby(["band_id", "band_val"], sort=False).size().to_numpy()
        ia, ib = _allpairs_index(sizes)
        docs = g["doc_id"].to_numpy()
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]}).drop_duplicates()

    cands = (
        vecs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(cands_in_salt, batch_format="pandas")
    )

    def verify_df(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        mat_a = np.frombuffer(b"".join(group["f_a"]), dtype=np.float32).reshape(
            len(group), -1
        )
        mat_b = np.frombuffer(b"".join(group["f_b"]), dtype=np.float32).reshape(
            len(group), -1
        )
        cos = np.einsum("ij,ij->i", mat_a, mat_b).astype(np.float64)
        keep = cos >= threshold
        return pd.DataFrame({"a": group["a"].to_numpy()[keep],
                             "b": group["b"].to_numpy()[keep],
                             "cosine": cos[keep]})

    pairs = pair_feature_join(cands, vecs, verify=verify_df, buckets=n_salt)
    deduped = pairs.groupby(["a", "b"]).max("cosine")

    def rename_or_empty(t: pa.Table) -> pa.Table:
        if t.num_columns == 3:
            return t.rename_columns(["a", "b", "cosine"])
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})

    return deduped.map_batches(rename_or_empty, batch_format="pyarrow")


def sq8_fit(ds, *, vec_column: str = "embedding") -> tuple:
    """Fit per-dimension SQ8 (scalar 8-bit) quantization bounds over an
    embedding column: one streaming pass of per-batch (min_d, max_d)
    partials — driver state is 2×d floats, never vectors.

    Returns ``(lo, hi)`` float32 arrays of shape (d,).  SQ8 is the
    standard 4× memory cut for billion-vector ANN (FAISS's SQ8): at
    100 TB the embedding column is usually the dominant byte share, and
    the codes column keeps the whole index in a quarter of the RAM."""
    def partial(batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column(vec_column))
        if not len(mat):
            return pa.table({"lo": pa.array([], pa.list_(pa.float32())),
                             "hi": pa.array([], pa.list_(pa.float32()))})
        return pa.table({"lo": pa.array([mat.min(axis=0).tolist()],
                                        pa.list_(pa.float32())),
                         "hi": pa.array([mat.max(axis=0).tolist()],
                                        pa.list_(pa.float32()))})

    mm = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack(mm["lo"].to_numpy()), axis=0).astype(np.float32)
    hi = np.max(np.stack(mm["hi"].to_numpy()), axis=0).astype(np.float32)
    return lo, hi


def sq8_encode(ds, bounds, *, vec_column: str = "embedding",
               code_column: str = "code"):
    """Encode vectors to uint8 codes against broadcast ``bounds``
    (``(lo, hi)`` arrays or a ``ray.put`` handle):
    ``code = round((v − lo) · 255 / (hi − lo))`` per dimension, clipped.
    Map-side only; output carries ``code_column`` as binary(d)."""
    import ray

    def encode(batch: pa.Table, bounds=bounds) -> pa.Table:
        lo, hi = (ray.get(bounds) if not isinstance(bounds, tuple)
                  else bounds)
        span = (hi - lo).astype(np.float32)
        span[span == 0] = 1.0
        mat = _as_matrix(batch.column(vec_column))
        codes = np.clip(np.rint((mat - lo) * (255.0 / span)),
                        0, 255).astype(np.uint8) if len(mat) else \
            np.zeros((0, len(lo)), dtype=np.uint8)
        # fixed_size_binary over one contiguous buffer: zero per-row
        # Python, zero copies beyond the single tobytes
        col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(len(lo)), len(codes),
            [None, pa.py_buffer(codes.tobytes())])
        out = batch.drop_columns([vec_column])
        return out.append_column(code_column, col)

    return ds.map_batches(encode, batch_format="pyarrow")


def sq8_knn(codes_ds, bounds, queries: np.ndarray, *, k: int = 10,
            id_column: str = "vec_id", code_column: str = "code"):
    """Brute-force cosine top-k over SQ8 codes: each batch decodes its
    uint8 block against the broadcast bounds (one fused multiply-add)
    and scores like :func:`knn_search` — approximate by quantization
    only (recall@10 ≥ 0.9 pinned by tests on clusters whose spread
    exceeds the quantization step; degrades when within-cluster
    distances shrink toward span/255, as any SQ8 does).  Returns
    (query_id, vec_id, cosine, rank)."""
    import ray

    queries_ref = ray.put(_normalize(
        np.asarray(queries, dtype=np.float32)))
    bounds_ref = bounds if not isinstance(bounds, tuple) else ray.put(bounds)

    def score(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(bounds_ref)
        q = ray.get(queries_ref)
        n = len(batch)
        if not n:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float32())})
        d = len(lo)
        arr = batch.column(code_column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_fixed_size_binary(arr.type):
            buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            raw = buf[arr.offset * d:(arr.offset + n) * d].reshape(n, d)
        else:  # plain binary column (e.g. read back from parquet)
            raw = np.frombuffer(b"".join(arr.to_pylist()),
                                dtype=np.uint8).reshape(n, d)
        span = (hi - lo).astype(np.float32)
        span[span == 0] = 1.0
        mat = _normalize(raw.astype(np.float32) * (span / 255.0) + lo)
        sims = mat @ q.T  # (n, nq)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        take = min(k, n)
        out_q, out_i, out_s = [], [], []
        for qi in range(q.shape[0]):
            part = np.argpartition(-sims[:, qi], take - 1)[:take]
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_i.append(ids[part])
            out_s.append(sims[part, qi])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_column: pa.array(np.concatenate(out_i)),
                         "cosine": pa.array(
                             np.concatenate(out_s).astype(np.float32))})

    partials = codes_ds.map_batches(score, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_column],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")


def pq_fit(ds, *, vec_column: str = "embedding", m: int = 8,
           k: int = 256, sample_size: int = 20000, iters: int = 10,
           seed: int = 42) -> np.ndarray:
    """Product-quantization codebooks (Jegou et al. 2011, "Product
    quantization for nearest neighbor search"): the d dims split into
    ``m`` subspaces, each with its own ``k``-centroid Lloyd codebook —
    a d-dim vector compresses to m bytes (32× at d=256, m=8 vs SQ8's
    4×), the billion-vector memory regime.

    Fit is a bounded head sample on the driver (the kmeans init rule,
    ops/cluster.py): state is the sample + m×k×(d/m) codebook floats —
    index-scale, never corpus-scale.  Vectors are L2-normalized before
    chunking so ADC inner product approximates cosine.
    """
    sample_tbl = ds.limit(sample_size).select_columns([vec_column]) \
        .to_pandas()
    if len(sample_tbl) == 0:
        return np.zeros((m, 0, 0), dtype=np.float32)
    mat = _canonical_rows(_normalize(
        np.asarray(sample_tbl[vec_column].tolist(), dtype=np.float32)))
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k = min(k, len(mat))
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float32)
    for j in range(m):
        X = mat[:, j * dsub:(j + 1) * dsub]
        C = X[rng.choice(len(X), size=k, replace=False)].copy()
        xn = (X * X).sum(axis=1)
        for _ in range(iters):
            d2 = xn[:, None] + (C * C).sum(axis=1)[None, :] \
                - 2.0 * (X @ C.T)
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, X)
            cnt = np.bincount(assign, minlength=k).astype(np.float32)
            nz = cnt > 0
            C[nz] = sums[nz] / cnt[nz, None]  # empty cells keep position
        books[j] = C
    return books


def pq_encode(ds, codebooks, *, vec_column: str = "embedding",
              code_column: str = "pq_code"):
    """Encode vectors to m uint8 codes against broadcast codebooks
    (array or ``ray.put`` handle): per subspace, nearest centroid by
    one matmul per batch.  Output carries ``code_column`` as
    fixed_size_binary(m) — zero per-row Python (the SQ8 buffer
    device)."""
    import ray

    def encode(batch: pa.Table, books=codebooks) -> pa.Table:
        B = ray.get(books) if not isinstance(books, np.ndarray) else books
        m, k, dsub = B.shape
        mat = _normalize(_as_matrix(batch.column(vec_column)))
        n = len(mat)
        codes = np.zeros((n, m), dtype=np.uint8)
        for j in range(m):
            X = mat[:, j * dsub:(j + 1) * dsub]
            d2 = -2.0 * (X @ B[j].T) + (B[j] * B[j]).sum(axis=1)[None, :]
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), n, [None, pa.py_buffer(codes.tobytes())])
        return batch.drop_columns([vec_column]).append_column(
            code_column, col)

    return ds.map_batches(encode, batch_format="pyarrow")


def pq_knn(codes_ds, codebooks, queries: np.ndarray, *, k: int = 10,
           id_column: str = "vec_id", code_column: str = "pq_code"):
    """Asymmetric-distance (ADC) top-k over PQ codes: queries build one
    (m, k) inner-product lookup table against the broadcast codebooks;
    each batch's score is m fancy-indexed lookups summed — never a
    decode, never a d-dim matmul.  Same partial-top-k + per-query merge
    shape as :func:`knn_search`.  Returns (query_id, vec_id, cosine,
    rank); approximate by quantization (recall pinned by tests)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    books = codebooks if isinstance(codebooks, np.ndarray) \
        else ray.get(codebooks)
    m, kc, dsub = books.shape
    # (m, nq, kc) inner-product tables — index-scale, broadcast once
    luts = np.stack([qn[:, j * dsub:(j + 1) * dsub] @ books[j].T
                     for j in range(m)])
    luts_ref = ray.put(luts.astype(np.float32))

    def score(batch: pa.Table) -> pa.Table:
        L = ray.get(luts_ref)
        n = len(batch)
        if not n:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float32())})
        arr = batch.column(code_column)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_fixed_size_binary(arr.type):
            buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            codes = buf[arr.offset * m:(arr.offset + n) * m].reshape(n, m)
        else:
            codes = np.frombuffer(b"".join(arr.to_pylist()),
                                  dtype=np.uint8).reshape(n, m)
        nq = L.shape[1]
        sims = np.zeros((n, nq), dtype=np.float32)
        for j in range(m):
            sims += L[j][:, codes[:, j]].T  # (n, nq) lookup-add
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        take = min(k, n)
        out_q, out_i, out_s = [], [], []
        for qi in range(nq):
            part = np.argpartition(-sims[:, qi], take - 1)[:take]
            out_q.append(np.full(take, qi, dtype=np.int64))
            out_i.append(ids[part])
            out_s.append(sims[part, qi])
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         id_column: pa.array(np.concatenate(out_i)),
                         "cosine": pa.array(
                             np.concatenate(out_s).astype(np.float32))})

    partials = codes_ds.map_batches(score, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_column],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")


def ivf_pq_partition(ds, out_dir: str, *, n_cells: int = 64, m: int = 8,
                     k_codes: int = 64, sample_size: int = 4096,
                     id_column: str = "vec_id",
                     vec_column: str = "embedding", seed: int = 42,
                     kmeans_iters: int = 8):
    """IVF-PQ index layout (the FAISS IVFPQ shape, minus residual
    encoding): coarse cells prune the READ
    (:func:`ivf_partition`'s probed-cell file listing), PQ codes
    shrink the BYTES each probed file holds to m per vector
    (:func:`pq_encode`) — at 100 TB the two compose: unprobed
    partitions never leave storage AND probed ones are 32× smaller.
    Codes quantize the raw (normalized) vector, not the cell residual
    — simpler, costs some recall at high n_cells vs true IVFPQ.

    One combined map pass assigns the cell and encodes the codes;
    centroids + codebooks land beside the data as ``_centroids.npy`` /
    ``_pq_books.npy``.  Returns (centroids, codebooks).
    """
    import os

    import ray

    sample_tbl = ds.limit(sample_size).select_columns([vec_column]) \
        .to_pandas()
    sample = _canonical_rows(_normalize(
        np.asarray(sample_tbl[vec_column].tolist(), dtype=np.float32)))
    centroids = _kmeans(sample, n_cells, kmeans_iters, seed)
    books = pq_fit(ds, vec_column=vec_column, m=m, k=k_codes,
                   sample_size=sample_size, seed=seed)
    cent_ref, books_ref = ray.put(centroids), ray.put(books)

    class AssignEncode:
        def __init__(self, cr, br):
            import ray as _r

            self.cent = _r.get(cr) if not isinstance(cr, np.ndarray) else cr
            self.books = _r.get(br) if not isinstance(br, np.ndarray) else br

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = _normalize(_as_matrix(batch.column(vec_column)))
            n = len(mat)
            mm, kc, dsub = self.books.shape
            cell = (np.argmax(mat @ self.cent.T, axis=1).astype(np.int32)
                    if n else np.zeros(0, np.int32))
            codes = np.zeros((n, mm), dtype=np.uint8)
            for j in range(mm):
                X = mat[:, j * dsub:(j + 1) * dsub]
                d2 = -2.0 * (X @ self.books[j].T) \
                    + (self.books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            code_col = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(mm), n, [None, pa.py_buffer(codes.tobytes())])
            return pa.table({
                id_column: batch.column(id_column),
                "cell": pa.array(cell),
                "cell_id": pa.array(cell),
                "pq_code": code_col,
            })

    ds.map_batches(AssignEncode, fn_constructor_args=(cent_ref, books_ref),
                   batch_format="pyarrow", concurrency=(1, 8), num_cpus=1,
                   ).write_parquet(out_dir, partition_cols=["cell"])
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "_centroids.npy"), centroids)
    np.save(os.path.join(out_dir, "_pq_books.npy"), books)
    return centroids, books


def ivf_pq_search(index_dir: str, queries: np.ndarray, k: int = 10, *,
                  n_probe: int = 8, id_column: str = "vec_id"):
    """ADC top-k over an :func:`ivf_pq_partition` layout: probed-cell
    file pruning (unprobed partitions never read) + per-batch
    lookup-table scoring (:func:`pq_knn`'s ADC) with out-of-probe
    masking.  ``n_probe = n_cells`` → brute-force over codes."""
    import glob
    import os

    import ray
    import ray.data as rd

    centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
    books = np.load(os.path.join(index_dir, "_pq_books.npy"))
    m, kc, dsub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float32))
    n_probe = min(n_probe, len(centroids))
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :n_probe]
    probe_mask = np.zeros((len(q), len(centroids)), dtype=bool)
    for qi in range(len(q)):
        probe_mask[qi, probe[qi]] = True
    needed = sorted({int(c) for row in probe for c in row})
    files = [f for c in needed for f in sorted(
        glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet")))]
    ds = rd.read_parquet(files)

    luts = np.stack([q[:, j * dsub:(j + 1) * dsub] @ books[j].T
                     for j in range(m)]).astype(np.float32)
    luts_ref, mask_ref = ray.put(luts), ray.put(probe_mask)

    def score(batch: pa.Table) -> pa.Table:
        L = ray.get(luts_ref)
        mask = ray.get(mask_ref)
        n = len(batch)
        if not n:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_column: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float32())})
        arr = batch.column("pq_code")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_fixed_size_binary(arr.type):
            buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
            codes = buf[arr.offset * m:(arr.offset + n) * m].reshape(n, m)
        else:
            codes = np.frombuffer(b"".join(arr.to_pylist()),
                                  dtype=np.uint8).reshape(n, m)
        cells = np.asarray(batch.column("cell_id").to_pylist(),
                           dtype=np.int64)
        nq = L.shape[1]
        sims = np.zeros((nq, n), dtype=np.float32)
        for j in range(m):
            sims += L[j][:, codes[:, j]]
        sims = np.where(mask[:, cells], sims, -np.inf)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        kk = min(k, n)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        keep = np.isfinite(sims[rows, cols])
        return pa.table({
            "query_id": pa.array(rows[keep].astype(np.int64)),
            id_column: pa.array(ids[cols[keep]]),
            "cosine": pa.array(sims[rows, cols][keep].astype(np.float32)),
        })

    partials = ds.map_batches(score, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_column],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")


class _MaskedTopK:
    """Per-batch brute-force scorer with per-query EXCLUSION: candidates
    sharing a query's label (or its id) are masked out before the local
    top-k — the hard-negative selection kernel."""

    def __init__(self, ref, k: int, id_column: str, vec_column: str,
                 label_column: str):
        import ray

        q, labels, qids = ref if isinstance(ref, tuple) else ray.get(ref)
        self.queries = _normalize(np.asarray(q, dtype=np.float32))
        self.qlabels = np.asarray(labels)
        self.qids = np.asarray(qids, dtype=np.int64)
        self.k = k
        self.id_column = id_column
        self.vec_column = vec_column
        self.label_column = label_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_as_matrix(batch.column(self.vec_column)))
        ids = batch.column(self.id_column).to_numpy()
        labs = batch.column(self.label_column).to_numpy(zero_copy_only=False)
        sims = self.queries @ mat.T  # (Q, B)
        # mask same-label candidates and the anchor itself
        bad = (self.qlabels[:, None] == labs[None, :]) \
            | (self.qids[:, None] == ids[None, :])
        sims = np.where(bad, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        if k == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_column: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float32())})
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        psims = np.take_along_axis(sims, part, axis=1)
        out_q = np.repeat(np.arange(sims.shape[0], dtype=np.int64), k)
        keep = np.isfinite(psims.reshape(-1))
        return pa.table({
            "query_id": pa.array(out_q[keep]),
            self.id_column: pa.array(ids[part].reshape(-1)[keep]),
            "cosine": pa.array(psims.reshape(-1)[keep].astype(np.float32)),
        })


def hard_negatives(ds, queries: np.ndarray, query_labels, query_ids,
                   k: int = 5, id_column: str = "vec_id",
                   vec_column: str = "embedding",
                   label_column: str = "label"):
    """Contrastive hard-negative mining: for each anchor (query vector
    + its label + its id), the top-``k`` HIGHEST-cosine vectors whose
    ``label_column`` DIFFERS from the anchor's (self excluded) —
    "similar but wrong" examples, the standard way to sharpen
    embedding training beyond random negatives
    (cf. ops/sample.negative_pairs for the random baseline).

    Same scale shape as :func:`knn_search`: the (anchors, labels, ids)
    triple is ``ray.put`` once and scored against every batch map-side
    (one matmul + masked partial top-k per batch, nothing
    corpus-scale anywhere), then one query-grouped merge keeps the
    global top-k with (cosine DESC, id) tie-break."""
    import ray

    ref = ray.put((np.asarray(queries, dtype=np.float32),
                   np.asarray(query_labels), np.asarray(query_ids)))
    partials = ds.map_batches(
        _MaskedTopK,
        fn_constructor_args=(ref, k, id_column, vec_column, label_column),
        batch_format="pyarrow",
        concurrency=(1, 8),
        num_cpus=1,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_column],
                              ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return partials.groupby("query_id").map_groups(merge,
                                                   batch_format="pandas")
