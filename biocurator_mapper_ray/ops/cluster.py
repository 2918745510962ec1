"""Distributed embedding clustering + cluster-based semantic dedup.

Two operators a large-scale training-data pipeline needs on top of the
LSH near-dup family in :mod:`~biocurator_mapper_ray.ops.similarity`:

* :func:`kmeans_embeddings` — full-data Lloyd k-means expressed as Ray
  Data passes: each iteration is ONE ``map_batches`` pass emitting
  per-batch (cluster, count, partial-sum) rows, combined through a
  cluster-keyed exchange of k·batches LEAN rows (d+2 floats each, never
  vectors×rows), with the k×d centroid matrix — the only driver-side
  state — re-broadcast via ``ray.put`` each round.  Unlike the
  sample-trained IVF ``_kmeans`` (``similarity.py``), every vector
  participates in every update.
* :func:`semdedup_embeddings` — SemDeDup-style semantic deduplication
  (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  through semantic deduplication", arXiv:2303.09540 — public paper):
  k-means-cluster the corpus, then WITHIN each cluster greedily keep the
  lowest-id member of every cosine-ε ball.  The O(m²) work is confined
  to single clusters (k sized so corpus/k fits a task), shipped through
  one ``groupby(cluster)`` exchange.

:func:`kmeans_exact` is the ORACLE-PARITY twin of
:func:`kmeans_embeddings` (the minhash fast/md5 split, ops/dedup.py):
quantized int64 vectors, floor-division centroid updates, md5-order
init — every step exact integer or reproducible double arithmetic, so
an unrolled-Lloyd DuckDB SQL query computes bit-identical assignments.
``kmeans_embeddings`` (float, k-means++) stays the scale path; its
correctness is pinned by planted-cluster tests (``tests/test_ops.py``).

Reference parity note: the reference's vector side is a Weaviate kNN
index (``/root/reference/app/ontology_manager.py``); it has no
clustering op.  These extend the engine beyond the reference surface,
as SURVEY.md §2's training-data addendum calls for.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import _as_matrix, _normalize


def _init_centroids(ds, k: int, *, vec_column: str, sample_size: int,
                    seed: int) -> np.ndarray:
    """Deterministic k-means++ init on a bounded head sample (collects
    ≤ sample_size×d floats on the driver — size-invariant at corpus
    scale)."""
    sample_tbl = ds.limit(sample_size).select_columns([vec_column]).to_pandas()
    if len(sample_tbl) == 0:
        # empty input: (0, 0) centroids — callers short-circuit to an
        # empty assignments dataset instead of an obscure numpy error
        return np.zeros((0, 0), dtype=np.float32)
    from .similarity import _canonical_rows

    sample = _canonical_rows(_normalize(
        np.asarray(sample_tbl[vec_column].tolist(), dtype=np.float32)
    ))
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cents = np.empty((k, sample.shape[1]), dtype=np.float32)
    cents[0] = sample[rng.integers(len(sample))]
    # k-means++: next centroid ∝ squared cosine distance to nearest chosen
    d2 = np.maximum(1.0 - sample @ cents[0], 0.0) ** 2
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        cents[i] = sample[rng.choice(len(sample), p=probs)]
        d2 = np.minimum(d2, np.maximum(1.0 - sample @ cents[i], 0.0) ** 2)
    return _normalize(cents)


def kmeans_embeddings(
    ds,
    *,
    k: int = 8,
    iters: int = 5,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
    init_sample: int = 4096,
):
    """Distributed Lloyd k-means over a (normalized) embedding column.

    Returns ``(assignments, centroids)``: a Dataset of
    ``(id_column, cluster:int32)`` rows and the final ``(k, d)`` float32
    centroid matrix.

    Scale shape — per iteration:

    1. one streaming ``map_batches`` pass: per batch, argmax-cosine
       assignment (one matmul) then ``np.add.at`` partial sums → k lean
       rows ``(cluster, n, sum:list<float>)`` per batch;
    2. one ``groupby(cluster)`` exchange over those k·n_batches lean
       rows with a vectorized stack-and-sum combine → exactly k rows;
    3. driver: normalize sums into the next centroid matrix (k×d — the
       only driver-resident state), ``ray.put`` for the next round.

    Empty clusters keep their previous centroid (deterministic).  The
    input vector blocks are materialized once and re-read per iteration
    (Ray re-executes lazy lineage otherwise, multiplying upstream work
    by ``iters``).
    """
    import ray

    vecs = ds.select_columns([id_column, vec_column]).materialize()
    cents = _init_centroids(vecs, k, vec_column=vec_column,
                            sample_size=init_sample, seed=seed)
    k = len(cents)
    if k == 0:  # empty input

        def empty_assign(batch: pa.Table) -> pa.Table:
            return pa.table({id_column: batch.column(id_column),
                             "cluster": pa.array(
                                 np.zeros(len(batch), np.int32))})

        return vecs.map_batches(empty_assign, batch_format="pyarrow"), cents

    def partials_fn(cent_ref):
        def partials(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            mat = _normalize(_as_matrix(batch.column(vec_column)))
            if not len(mat):
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            assign = np.argmax(mat @ cent.T, axis=1)
            sums = np.zeros((k, mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            live = counts > 0
            return pa.table({
                "cluster": pa.array(np.flatnonzero(live).astype(np.int32)),
                "n": pa.array(counts[live]),
                "vsum": pa.array(list(sums[live])),
            })
        return partials

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        vs = np.stack(group["vsum"].to_numpy()).sum(axis=0)
        return pd.DataFrame({
            "cluster": [int(group["cluster"].iloc[0])],
            "n": [int(group["n"].sum())],
            "vsum": [vs],
        })

    for _ in range(iters):
        cent_ref = ray.put(cents)
        combined = (
            vecs.map_batches(partials_fn(cent_ref), batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()  # exactly k rows
        )
        nxt = cents.copy()
        for _, row in combined.iterrows():
            if row["n"] > 0:
                nxt[int(row["cluster"])] = row["vsum"] / row["n"]
        cents = _normalize(nxt.astype(np.float32))

    cent_ref = ray.put(cents)

    def assign_final(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _normalize(_as_matrix(batch.column(vec_column)))
        cl = (np.argmax(mat @ cent.T, axis=1).astype(np.int32)
              if len(mat) else np.zeros(0, np.int32))
        return pa.table({
            id_column: batch.column(id_column),
            "cluster": pa.array(cl),
        })

    assignments = vecs.map_batches(assign_final, batch_format="pyarrow")
    return assignments, cents


def kmeans_exact(
    ds,
    *,
    k: int = 8,
    iters: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
    scale_bits: int = 20,
):
    """Integer-exact distributed Lloyd k-means → assignments Dataset
    ``(id_column, cluster:int32)``, bit-reproducible by a DuckDB SQL
    oracle (see ``__ray_entry__._kmeans_exact_oracle``).

    Exactness contract (each step has a literal SQL equivalent):

    * quantize: ``q = floor(float64(v) * 2^scale_bits + 0.5)`` as int64
      (parquet float32 → double is exact on both sides; multiply and
      add stay separate operations, never FMA-fused);
    * init: centroids are the vectors of the k rows with the smallest
      ``(md5('{seed}:'||id)[:15], id)`` — a distributed per-batch top-k
      whose driver state is k×batches lean rows; cluster label =
      ascending rank of that key;
    * assign: argmin of the exact int64 squared L2 distance, ties to
      the lowest cluster index (sums bounded by d·2^(2·scale_bits+2) —
      int64-safe for d ≤ 2^19 at the default scale);
    * update: elementwise FLOOR division ``sum // count`` (exact
      integer; the SQL mirror uses the sign-safe
      ``(s - ((s%n)+n)%n) // n`` since DuckDB ``//`` truncates);
      empty clusters keep their previous centroid.

    Same scale shape as :func:`kmeans_embeddings`: one streaming pass +
    one k-row exchange per iteration, k×d int64 driver state.  This is
    the correctness-gate mode; use the float path when the corpus is
    the point.
    """
    import ray

    from ..functions.hashing import md5_prefix_u64

    scale = float(1 << scale_bits)

    def quant(batch: pa.Table) -> pa.Table:
        mat = _as_matrix(batch.column(vec_column))
        q = np.floor(mat.astype(np.float64) * scale + 0.5).astype(np.int64)
        return pa.table({id_column: batch.column(id_column),
                         "q": pa.array(list(q))})

    qds = ds.select_columns([id_column, vec_column]).map_batches(
        quant, batch_format="pyarrow").materialize()

    def _q_matrix(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.int64, copy=False)

    # distributed init top-k: each batch ships its k smallest keys
    def batch_topk(batch: pa.Table) -> pa.Table:
        keys = md5_prefix_u64(batch.column(id_column), 15,
                              prefix=f"{seed}:").astype(np.int64)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))[:k]
        return pa.table({"key": pa.array(keys[order]),
                         "id": pa.array(ids[order]),
                         "q": batch.column("q").take(pa.array(order))})

    head = (qds.map_batches(batch_topk, batch_format="pyarrow")
            .to_pandas()  # ≤ k × batches lean rows
            .sort_values(["key", "id"]).head(k))
    if head.empty:
        return qds.map_batches(
            lambda b: pa.table({id_column: b.column(id_column),
                                "cluster": pa.array(
                                    np.zeros(len(b), np.int32))}),
            batch_format="pyarrow")
    cents = np.asarray(head["q"].tolist(), dtype=np.int64)
    kk = len(cents)

    def assign_of(cent: np.ndarray, q: np.ndarray) -> np.ndarray:
        # exact int64 squared L2; np.argmin returns the FIRST min index
        # (lowest cluster on ties), matching ORDER BY (d, cluster)
        d2 = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        return np.argmin(d2, axis=1)

    def partials_fn(cent_ref):
        def partials(batch: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            if not len(batch):
                return pa.table({"cluster": pa.array([], pa.int32()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.int64()))})
            q = _q_matrix(batch.column("q"))
            assign = assign_of(cent, q)
            sums = np.zeros((kk, q.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, q)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            live = counts > 0
            return pa.table({
                "cluster": pa.array(np.flatnonzero(live).astype(np.int32)),
                "n": pa.array(counts[live]),
                "vsum": pa.array(list(sums[live])),
            })
        return partials

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        vs = np.stack(group["vsum"].to_numpy()).sum(axis=0)
        return pd.DataFrame({
            "cluster": [int(group["cluster"].iloc[0])],
            "n": [int(group["n"].sum())],
            "vsum": [vs],
        })

    for _ in range(iters):
        cent_ref = ray.put(cents)
        combined = (
            qds.map_batches(partials_fn(cent_ref), batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()  # exactly k rows
        )
        nxt = cents.copy()
        for _, row in combined.iterrows():
            if row["n"] > 0:
                nxt[int(row["cluster"])] = \
                    np.asarray(row["vsum"], dtype=np.int64) // int(row["n"])
        cents = nxt

    cent_ref = ray.put(cents)

    def assign_final(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        cl = (assign_of(cent, _q_matrix(batch.column("q"))).astype(np.int32)
              if len(batch) else np.zeros(0, np.int32))
        return pa.table({id_column: batch.column(id_column),
                         "cluster": pa.array(cl)})

    return qds.map_batches(assign_final, batch_format="pyarrow")


def semdedup_embeddings(
    ds,
    *,
    threshold: float = 0.97,
    k: int = 8,
    iters: int = 5,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    seed: int = 42,
):
    """SemDeDup: drop all but the lowest-id member of every within-cluster
    cosine-ε ball.  Returns a Dataset of surviving
    ``(id_column, cluster:int32)`` rows.

    The greedy keep rule (scan members in id order; keep a vector iff
    its max cosine against the already-KEPT set is < ``threshold``) is
    order-deterministic and engine-independent.  Each cluster's O(m²)
    similarity work runs inside its own ``map_groups`` task — k bounds
    the expected cluster size at corpus/k, and the greedy loop is one
    vectorized (kept × 1) matmul per member, never a full m×m allocation.

    Duplicates that land in DIFFERENT clusters are not compared — the
    documented SemDeDup approximation (the paper accepts this; raise k
    for tighter balls, or run :func:`embedding_near_dup_pairs` for
    LSH-based cross-cluster recall).
    """
    import ray

    # the assignment is a pure function of the k×d centroid matrix, so
    # no id→cluster join/broadcast is needed: re-derive the cluster per
    # batch from the broadcast centroids (one matmul) on the SAME pass
    # that ships the vectors into the cluster-keyed exchange
    _assignments, cents = kmeans_embeddings(
        ds, k=k, iters=iters, id_column=id_column, vec_column=vec_column,
        seed=seed,
    )
    cent_ref = ray.put(cents)

    vec_by_id = ds.select_columns([id_column, vec_column])

    def tag(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        mat = _normalize(_as_matrix(batch.column(vec_column)))
        cl = (np.argmax(mat @ cent.T, axis=1).astype(np.int32)
              if len(mat) else np.zeros(0, np.int32))
        return batch.append_column("cluster", pa.array(cl))

    def dedup_group(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_column)
        mat = _normalize(np.asarray(group[vec_column].tolist(),
                                    dtype=np.float32))
        # incremental kept-matrix buffer: one (nk, d) @ (d,) matvec per
        # member, no per-iteration fancy-index copy of the kept set
        kept_mat = np.empty_like(mat)
        kept_idx: list[int] = []
        nk = 0
        for i in range(len(group)):
            if nk == 0 or float(np.max(kept_mat[:nk] @ mat[i])) < threshold:
                kept_mat[nk] = mat[i]
                nk += 1
                kept_idx.append(i)
        out = group.iloc[kept_idx]
        return pd.DataFrame({
            id_column: out[id_column].to_numpy(),
            "cluster": out["cluster"].to_numpy(),
        })

    return (
        vec_by_id.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_group, batch_format="pandas")
    )


def pca_fit(ds, *, vec_column: str = "embedding", dim: int = 2):
    """Distributed PCA fit: (mean, components) from exact full-corpus
    second moments.

    One ``map_batches`` pass emits a single lean row per batch — count,
    the d-vector feature sum and the FLATTENED d×d outer-product sum —
    so the driver holds batches×(d²+d+1) floats (d is the embedding
    width, e.g. 32-1024: kilobytes per batch, size-invariant in corpus
    rows, the kmeans-partials shape).  The covariance eigendecomposition
    runs driver-side on the d×d matrix; component signs are fixed
    deterministically (largest-|entry| coordinate made positive) so the
    fit is reproducible across partitionings.

    Published algorithm: standard batch PCA via moment accumulation
    (Pearson 1901); the distributed shape is the classic one-pass
    sufficient-statistics reduction.
    """

    def moments(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "n": pa.array([0], pa.int64()),
                "d": pa.array([0], pa.int64()),
                "s1": pa.array([[]], pa.list_(pa.float64())),
                "s2": pa.array([[]], pa.list_(pa.float64())),
            })
        x = _as_matrix(batch.column(vec_column))
        s1 = x.sum(axis=0, dtype=np.float64)
        s2 = (x.T.astype(np.float64) @ x.astype(np.float64)).ravel()
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "d": pa.array([x.shape[1]], pa.int64()),
            "s1": pa.array([s1.tolist()], pa.list_(pa.float64())),
            "s2": pa.array([s2.tolist()], pa.list_(pa.float64())),
        })

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    if not len(parts) or "n" not in parts.columns:
        # empty input produces no partial blocks (and a schemaless frame)
        return np.zeros(0, dtype=np.float64), np.zeros((0, dim))
    parts = parts[parts["n"] > 0]
    if not len(parts):
        return np.zeros(0, dtype=np.float64), np.zeros((0, dim))
    d = int(parts["d"].max())
    n = int(parts["n"].sum())
    s1 = np.sum([np.asarray(v) for v in parts["s1"]], axis=0)
    s2 = np.sum([np.asarray(v) for v in parts["s2"]], axis=0).reshape(d, d)
    mean = s1 / n
    cov = (s2 - n * np.outer(mean, mean)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    comp = vecs[:, ::-1][:, :dim]             # top-`dim` columns
    # deterministic sign: the largest-|entry| coordinate is positive
    flips = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(comp.shape[1])])
    flips[flips == 0] = 1.0
    return mean, comp * flips


def pca_project(ds, *, vec_column: str = "embedding",
                id_column: str = "vec_id", dim: int = 2,
                fitted: tuple | None = None):
    """Project every embedding onto its corpus's top principal
    components: (id_column, proj list<float64>).  The (mean,
    components) pair — fitted here unless passed in — broadcasts once
    per actor via ``ray.put``; projection is a zero-exchange map
    (one matmul per batch)."""
    import ray as _ray

    mean, comp = fitted if fitted is not None else pca_fit(
        ds, vec_column=vec_column, dim=dim)
    ref = _ray.put((mean, comp))

    def project(batch: pa.Table, r=None) -> pa.Table:
        m, c = _ray.get(r) if not isinstance(r, tuple) else r
        x = _as_matrix(batch.column(vec_column)).astype(np.float64)
        if not len(m):
            proj = np.zeros((len(x), 0), dtype=np.float64)
        else:
            proj = (x - m) @ c
        return pa.table({
            id_column: batch.column(id_column),
            "proj": pa.array(proj.tolist(), pa.list_(pa.float64())),
        })

    return ds.map_batches(project, fn_kwargs={"r": ref},
                          batch_format="pyarrow")
