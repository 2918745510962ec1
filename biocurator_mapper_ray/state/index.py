"""Broadcastable in-memory vector index.

Replaces the reference's Weaviate collection + near_vector kNN
(``/root/reference/app/ontology_manager.py:24-55`` client,
``app/ontology_searcher.py:29-93`` search): the term-vector small side is
built once, broadcast via ``ray.put``, and each retriever actor
materializes a dense matrix replica in ``__init__`` — no shuffle join.

Brute-force cosine top-k (numpy matmul per query batch) is the exact
baseline; at 100 TB the term side stays small (ontologies are 10^4–10^6
terms → ≤ a few hundred MB at D=256 float32), so a replica per actor is
the right scale path.  For larger term sides, ``ops/similarity.py``
provides the LSH-bucketed variant.

Similarity metadata mirrors Weaviate's near_vector metadata contract
(``app/ontology_searcher.py:70-72``): ``distance`` = 1 − cosine,
``certainty`` = (1 + cosine) / 2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.embedder import HashingEmbedder


class VectorIndex:
    """Dense term-vector index with brute-force top-k cosine."""

    def __init__(self, term_ids: np.ndarray, matrix: np.ndarray,
                 namespaces: np.ndarray | None = None, snapshot_hash: str = ""):
        assert matrix.ndim == 2 and len(term_ids) == matrix.shape[0]
        self.term_ids = np.asarray(term_ids)
        # rows are already unit vectors (or zero); keep float32
        self.matrix = np.ascontiguousarray(matrix, dtype=np.float32)
        self.namespaces = np.asarray(namespaces) if namespaces is not None else None
        self.snapshot_hash = snapshot_hash

    def __len__(self) -> int:
        return self.matrix.shape[0]

    @property
    def dim(self) -> int:
        return self.matrix.shape[1]

    @classmethod
    def from_terms_table(cls, terms: pa.Table, embedder: HashingEmbedder | None = None,
                         snapshot_hash: str = "") -> "VectorIndex":
        """Build from a parsed-terms Arrow table (TERM_SCHEMA).

        Each term vector = mean of unit vectors of its surfaces
        (name + all_synonyms) — see HashingEmbedder.embed_term.
        """
        embedder = embedder or HashingEmbedder()
        names = terms.column("name").to_pylist()
        all_syns = terms.column("all_synonyms").to_pylist()
        term_ids = np.array(terms.column("term_id").to_pylist(), dtype=object)
        namespaces = (
            np.array(terms.column("namespace").to_pylist(), dtype=object)
            if "namespace" in terms.schema.names else None
        )
        mat = np.zeros((len(names), embedder.dim), dtype=np.float32)
        for i, (name, syns) in enumerate(zip(names, all_syns)):
            mat[i] = embedder.embed_term(name, syns or [])
        return cls(term_ids, mat, namespaces, snapshot_hash)

    @classmethod
    def from_vectors_table(cls, tbl: pa.Table, snapshot_hash: str = "") -> "VectorIndex":
        """Rehydrate from a term_vectors parquet table
        (columns: term_id, embedding list<float>, optional namespace)."""
        term_ids = np.array(tbl.column("term_id").to_pylist(), dtype=object)
        mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
        namespaces = (
            np.array(tbl.column("namespace").to_pylist(), dtype=object)
            if "namespace" in tbl.schema.names else None
        )
        return cls(term_ids, mat, namespaces, snapshot_hash)

    def topk(self, queries: np.ndarray, k: int = 5,
             namespace_filter: str | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k: (n, D) unit query matrix → (idx (n,k), cos (n,k)).

        Results are sorted by descending cosine with a deterministic
        tie-break on row index (stable ordering across runs/processes).
        ``namespace_filter`` reproduces the reference's filtered search
        (``app/ontology_searcher.py:95-151``) by masking the term side.
        """
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        n = queries.shape[0]

        if namespace_filter is not None and self.namespaces is not None:
            mask = self.namespaces == namespace_filter
            sub_idx = np.nonzero(mask)[0]
            if sub_idx.size == 0:
                return (np.zeros((n, 0), dtype=np.int64), np.zeros((n, 0), dtype=np.float32))
            sims = queries @ self.matrix[sub_idx].T
        else:
            sub_idx = None
            sims = queries @ self.matrix.T

        t = sims.shape[1]
        k = min(k, t)
        if k == 0:
            return (np.zeros((n, 0), dtype=np.int64), np.zeros((n, 0), dtype=np.float32))
        # argpartition then stable sort of the k slice (desc cos, asc index)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        part_sims = np.take_along_axis(sims, part, axis=1)
        order = np.lexsort((part, -part_sims), axis=1)
        idx = np.take_along_axis(part, order, axis=1)
        top_sims = np.take_along_axis(part_sims, order, axis=1)
        if sub_idx is not None:
            idx = sub_idx[idx]
        return idx.astype(np.int64), top_sims.astype(np.float32)

    def to_vectors_table(self) -> pa.Table:
        """Serialize to the term_vectors parquet schema."""
        cols = {
            "term_id": pa.array(list(self.term_ids), pa.string()),
            "embedding": pa.array([row.tolist() for row in self.matrix],
                                  pa.list_(pa.float32())),
        }
        if self.namespaces is not None:
            cols["namespace"] = pa.array(list(self.namespaces), pa.string())
        cols["snapshot_hash"] = pa.array([self.snapshot_hash] * len(self), pa.string())
        return pa.table(cols)
