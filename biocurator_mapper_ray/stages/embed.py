"""Embedding stages (actor pools).

Replaces the reference's sequential 100-term batch loop
(``app/ontology_manager.py:310-338``) and its OpenAI client singleton
(``app/openai_client.py:40-118``) with actor-pool ``map_batches`` stages:
the embedder is constructed ONCE per actor in ``__init__``; each
``__call__`` embeds one Arrow batch.  Throughput counters (the reference's
embedding_stats, ``app/ontology_manager.py:166-176``) fall out of
``Dataset.stats()`` + the pipeline metrics rows instead of a progress dict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.embedder import HashingEmbedder


class TermEmbedStage:
    """Parsed-terms batch → term_id/name/namespace/embedding rows.

    Term vector = normalized mean of surface vectors (name + all_synonyms)
    — see HashingEmbedder.embed_term.  ``snapshot_hash`` is stamped on
    every row as lineage (A2 semantics).
    """

    def __init__(self, dim: int = 256, seed: int = 42, snapshot_hash: str = ""):
        self.embedder = HashingEmbedder(dim=dim, seed=seed)
        self.snapshot_hash = snapshot_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column("name").to_pylist()
        syns = batch.column("all_synonyms").to_pylist()
        mat = np.zeros((len(names), self.embedder.dim), dtype=np.float32)
        for i, (name, ss) in enumerate(zip(names, syns)):
            mat[i] = self.embedder.embed_term(name, ss or [])
        return pa.table(
            {
                "term_id": batch.column("term_id"),
                "name": batch.column("name"),
                "namespace": batch.column("namespace"),
                "embedding": pa.array([row.tolist() for row in mat], pa.list_(pa.float32())),
                "snapshot_hash": pa.array([self.snapshot_hash] * len(names), pa.string()),
            }
        )


class TextEmbedStage:
    """Generic text column → embedding column (adds ``embedding``).

    Used by the document-similarity ops; ``text_column`` configurable.
    """

    def __init__(self, text_column: str = "text", dim: int = 256, seed: int = 42):
        self.embedder = HashingEmbedder(dim=dim, seed=seed)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        mat = self.embedder.embed_texts([t or "" for t in texts])
        return batch.append_column(
            "embedding", pa.array([row.tolist() for row in mat], pa.list_(pa.float32()))
        )
