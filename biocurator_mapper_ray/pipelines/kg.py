"""Flagship pipeline: transcripts → deduplicated (subj, pred, obj) triples.

Ray-Data replay of the reference's per-request resolve flow
(``app/main.py:68-88``) in bulk, per SURVEY.md §7.1:

    transcripts.parquet
      → MentionLinkStage (ONE fused actor pool: dictionary spotting +
        embed + top-k + selection contract, broadcast term side)
      → combine_links_batch (stateless partial aggregation — skew guard)
      → groupby(__bucket = hash(conv_id) % B).map_groups(canonicalize_bucket)
        [the ONE shuffle; ~B groups, numpy boundary slicing per conv inside]
      → lineage columns → sort(subj, pred, obj) → triples

Scale notes:
* The term side is broadcast once (``ray.put``) and replicated per actor —
  no shuffle join (the reference's Weaviate lookup becomes an in-actor
  index).
* The only all-to-all exchange is the canonicalization groupby, and it
  runs over PRE-COMBINED partial rows (distinct (conv, surface, term)
  per batch), so a mega-conversation contributes its distinct-pair count,
  not its turn count, to the shuffle.
* The final sort is on the (small) triples output, not the input.
* Lineage: every triple carries ``extractor_version``,
  ``ontology_snapshot_hash`` and ``input_shard`` (conv-hash bucket) —
  enough to re-run one shard and get the identical sub-output (A2/A3
  semantics, ``app/ontology_version_manager.py:67-183``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .. import EXTRACTOR_VERSION
from ..functions.hashing import hash64_column
from ..stages.canonicalize import (
    canonicalize_bucket,
    canonicalize_bucket_term_level,
    combine_links_batch,
)
from ..stages.link import MentionLinkStage


N_INPUT_SHARDS = 64


_SHARD_NAMES = pa.array([f"conv_bucket={s:03d}" for s in range(N_INPUT_SHARDS)])


def add_lineage(batch: pa.Table, snapshot_hash: str) -> pa.Table:
    n = len(batch)
    shard = (hash64_column(batch.column("conv_id")) % N_INPUT_SHARDS).astype(np.int64)
    return (
        batch.append_column("input_shard", _SHARD_NAMES.take(pa.array(shard)))
        .append_column("extractor_version", pa.nulls(n, pa.string()).fill_null(EXTRACTOR_VERSION))
        .append_column("ontology_snapshot_hash", pa.nulls(n, pa.string()).fill_null(snapshot_hash))
    )


def extract_links(
    transcripts,
    terms: pa.Table,
    *,
    k: int = 5,
    dim: int = 256,
    seed: int = 42,
    confidence_threshold: float = 0.5,
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """transcripts Dataset → link-decision Dataset (no shuffle).

    One FUSED actor pool (detect + link share the broadcast term side);
    autoscaling (1, concurrency) so task stages are never starved.
    """
    terms_ref = ray.put(terms)
    pool = concurrency if isinstance(concurrency, tuple) else (1, concurrency)
    links = transcripts.map_batches(
        MentionLinkStage,
        fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=1,
    )
    return links


def extract_triples(
    transcripts,
    terms: pa.Table,
    *,
    snapshot_hash: str = "",
    k: int = 5,
    dim: int = 256,
    seed: int = 42,
    confidence_threshold: float = 0.5,
    concurrency: int = 4,
    batch_size: int = 4096,
    sort_output: bool = True,
    canonicalize_buckets: int = 128,
    deterministic_scorer: bool = True,
):
    """Full flagship flow; returns the triples Dataset (lazy).

    ``deterministic_scorer=True`` (the default — :class:`RuleScorer` is
    deterministic) combines partials to ``(conv_id, term_id)`` level,
    which shrinks the canonicalization shuffle ~3×; pass ``False`` when
    plugging in a nondeterministic scorer (e.g. a sampled LLM), which
    needs mention-level partials so union-find can merge a surface that
    resolved to different terms on different turns.
    """
    terms_ref = ray.put(terms)
    pool = concurrency if isinstance(concurrency, tuple) else (1, concurrency)
    if deterministic_scorer:
        # fully fused hot stage: detect + link + term-level combine +
        # bucketize in ONE actor call — raw link rows never leave the
        # actor, and the plan has no task-pool operator between the scan
        # and the canonicalization exchange (task dispatch is the
        # dominant fixed cost at high core counts)
        bucketed = transcripts.map_batches(
            MentionLinkStage,
            fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold,
                                 "partials", canonicalize_buckets),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=1,
        )
        triples = bucketed.groupby("__bucket").map_groups(
            lambda g: canonicalize_bucket_term_level(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    else:
        links = transcripts.map_batches(
            MentionLinkStage,
            fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=pool,
            num_cpus=1,
        )
        partials = links.map_batches(combine_links_batch, batch_format="pyarrow")

        def bucketize(batch: pa.Table) -> pa.Table:
            b = (hash64_column(batch.column("conv_id")) % np.uint64(canonicalize_buckets)).astype(np.int32)
            return batch.append_column("__bucket", pa.array(b))

        bucketed = partials.map_batches(bucketize, batch_format="pyarrow")
        triples = bucketed.groupby("__bucket").map_groups(
            lambda g: canonicalize_bucket(g.drop(columns=["__bucket"])),
            batch_format="pandas",
        )

    triples = triples.map_batches(
        lambda b: add_lineage(b, snapshot_hash), batch_format="pyarrow"
    )
    if sort_output:
        # Global deterministic order for small correctness runs / oracle
        # diffs.  At scale this is the single most expensive operator in
        # the plan (an all-to-all range sort of every triple — measured
        # 33 s of a 39 s run at 8M turns), so benchmarks and production
        # writes keep sort_output=False: output stays bucket-partitioned
        # with deterministic within-bucket order (canonicalize_bucket
        # sorts each bucket's triples before emit).
        triples = triples.sort(["subj", "pred", "obj"])
    return triples


def triples_quality(triples_tbl: pa.Table, expected_tbl: pa.Table) -> dict:
    """Precision/recall of emitted triples vs planted ground truth."""
    def keyset(tbl: pa.Table) -> set[tuple]:
        return set(
            zip(
                tbl.column("subj").to_pylist(),
                tbl.column("pred").to_pylist(),
                tbl.column("obj").to_pylist(),
            )
        )

    got, want = keyset(triples_tbl), keyset(expected_tbl)
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    return {
        "emitted": len(got),
        "expected": len(want),
        "true_positives": tp,
        "precision": precision,
        "recall": recall,
        "f1": (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0,
    }
