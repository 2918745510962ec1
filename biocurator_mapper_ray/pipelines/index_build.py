"""Offline index-build pipeline (replay of POST /admin/generate_embeddings).

Reference flow (``app/main.py:437-577`` → ``app/ontology_manager.py:146-537``):
load ontology JSON → parse → enrich → sequential 100-term batch loop into a
Weaviate collection named ``{ont}_{unix_ts}`` → atomic registry pointer flip.

Ours: ontology doc → node Dataset → parse map_batches → quality filter →
TermEmbedStage actor pool → ``write_parquet(index_root/<snapshot_hash>/)``.
The snapshot-hash directory is the "versioned collection name"; the
manifest flip (state/manifest.py) is the registry pointer swap; an equal
hash skips the rebuild entirely (A3 skip-if-same,
``app/ontology_version_manager.py:149-183``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

import ray.data as rd

from ..ontology.parser import parse_nodes_batch
from ..ontology.quality import filter_terms_batch
from ..ontology.versioning import extract_version_info, compute_version_hash
from ..stages.embed import TermEmbedStage
from ..state.manifest import Manifest


def ontology_nodes_dataset(doc: dict, parallelism: int = 8):
    """Ontology doc (small side) → Dataset of node_json rows."""
    from ..sources.ontology_json import nodes_dataset

    return nodes_dataset(doc, parallelism)


def build_term_index(
    doc: dict,
    index_root: str,
    *,
    embeddings_config: dict | None = None,
    id_format: dict | None = None,
    dim: int = 256,
    seed: int = 42,
    apply_quality_filter: bool = True,
    concurrency: int = 2,
    force: bool = False,
) -> tuple[str, str]:
    """Build (or skip) the term-vector parquet index for an ontology doc.

    Returns ``(index_dir, snapshot_hash)``.  Skip-if-same: when the
    manifest already points at this snapshot hash and the output exists,
    nothing is recomputed (reference 'using cached data' path).
    """
    from ..config import DEFAULT_EMBEDDINGS_CONFIG

    embeddings_config = embeddings_config or DEFAULT_EMBEDDINGS_CONFIG
    snap = compute_version_hash(extract_version_info(doc))
    index_dir = os.path.join(index_root, snap)
    manifest = Manifest(index_root)

    if not force and manifest.current_snapshot() == snap and os.path.exists(
        os.path.join(index_dir, "_SUCCESS")
    ):
        return index_dir, snap

    nodes = ontology_nodes_dataset(doc)
    terms = nodes.map_batches(
        lambda b: parse_nodes_batch(b, id_format), batch_format="pyarrow"
    )
    if apply_quality_filter:
        terms = terms.map_batches(
            lambda b: filter_terms_batch(b, embeddings_config), batch_format="pyarrow"
        )
    vectors = terms.map_batches(
        TermEmbedStage,
        fn_constructor_kwargs={"dim": dim, "seed": seed, "snapshot_hash": snap},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    os.makedirs(index_dir, exist_ok=True)
    vectors.write_parquet(index_dir)
    with open(os.path.join(index_dir, "_SUCCESS"), "w") as f:
        f.write(snap)
    # registry pointer flip — atomic, mirrors config_updater.update_ontology_version
    manifest.flip_snapshot(snap, extra={"index_dir": index_dir})
    return index_dir, snap


def load_term_index_table(index_dir: str) -> pa.Table:
    import pyarrow.dataset as pads

    return pads.dataset(index_dir, format="parquet").to_table()
