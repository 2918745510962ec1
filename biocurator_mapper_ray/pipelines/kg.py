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
    canonicalize_bucket_arrow,
    canonicalize_bucket_term_level,
    combine_links_batch,
    term_partials_to_triples,
)
from ..stages.link import MentionLinkStage


N_INPUT_SHARDS = 64


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        return 0


def _clamp_pool(pool: tuple[int, int], n_pools: int = 1) -> tuple[tuple[int, int], float]:
    """Size an actor pool so the pipeline's pooled stages can never pin
    EVERY CPU slot: a fixed pool whose actor count equals the cluster's
    CPU count deadlocks the streaming executor — the pool holds every
    slot while the upstream ReadParquet waits forever for one (observed
    on a num_cpus=2 session with a (2, 2) pool — 30+ min, zero blocks
    output).

    Returns ``(clamped_pool, num_cpus_per_actor)``: both pool ends are
    capped at cluster_CPUs - 1 (floor 1), and when the pipeline runs
    ``n_pools`` pooled stages on a session too narrow to give each its
    own slot plus one for tasks (cluster_CPUs <= n_pools), actors drop
    to 0.5 CPU each so two share a slot instead of starving the reader.
    Only relevant on tiny/debug sessions — a real cluster never hits
    either branch."""
    total = _cluster_cpus()
    if total <= 1:
        return pool, 1.0
    cap = max(1, total - 1)
    clamped = (max(1, min(pool[0], cap)), max(1, min(pool[1], cap)))
    actor_cpus = 0.5 if total <= n_pools * clamped[0] else 1.0
    return clamped, actor_cpus


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
    pool, _actor_cpus = _clamp_pool(
        concurrency if isinstance(concurrency, tuple) else (1, concurrency)
    )
    links = transcripts.map_batches(
        MentionLinkStage,
        fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=_actor_cpus,
    )
    return links


def retrieve_candidates(
    transcripts,
    terms: pa.Table,
    *,
    namespace_filter: str | None = None,
    k: int = 5,
    dim: int = 256,
    seed: int = 42,
    concurrency: int = 4,
    batch_size: int = 4096,
):
    """transcripts Dataset → exploded candidate rows (search-only flow,
    no selection): MentionDetector pool → RetrieverStage pool, both over
    the broadcast term side.  ``namespace_filter`` restricts retrieval
    to one ontology namespace end-to-end — the reference's filtered
    search (``/root/reference/app/ontology_searcher.py:95-151``) as a
    bulk pipeline."""
    from ..stages.link import RetrieverStage
    from ..stages.mention import MentionDetector

    terms_ref = ray.put(terms)
    pool, _actor_cpus = _clamp_pool(
        concurrency if isinstance(concurrency, tuple) else (1, concurrency),
        n_pools=2,
    )
    mentions = transcripts.map_batches(
        MentionDetector,
        fn_constructor_args=(terms_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=_actor_cpus,
    )
    return mentions.map_batches(
        RetrieverStage,
        fn_constructor_args=(terms_ref, k, dim, seed, namespace_filter),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=_actor_cpus,
    )


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
    assume_conv_contiguous: bool = False,
):
    """Full flagship flow; returns the triples Dataset (lazy).

    ``deterministic_scorer=True`` (the default — :class:`RuleScorer` is
    deterministic) combines partials to ``(conv_id, term_id)`` level,
    which shrinks the canonicalization shuffle ~3×; pass ``False`` when
    plugging in a nondeterministic scorer (e.g. a sampled LLM), which
    needs mention-level partials so union-find can merge a surface that
    resolved to different terms on different turns.

    ``assume_conv_contiguous=True`` declares that each conversation's
    rows are stored contiguously (per-conversation parquet layout — true
    of this engine's corpus and the natural layout for transcript
    stores).  The canonicalization exchange then moves only the convs
    that straddle a batch boundary (~2 per 64k-row batch, plus the mega
    conversation) instead of every (conv, term) partial; interior convs
    short-circuit straight to the sink.  Leave False for arbitrary row
    order — a conversation scattered across non-adjacent batches would
    otherwise emit duplicate triples.
    """
    terms_ref = ray.put(terms)
    pool, _actor_cpus = _clamp_pool(
        concurrency if isinstance(concurrency, tuple) else (1, concurrency)
    )
    if deterministic_scorer and assume_conv_contiguous:
        import pyarrow.compute as pc

        combined = transcripts.map_batches(
            MentionLinkStage,
            fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold,
                                 "split_contiguous", canonicalize_buckets),
            batch_format="pyarrow",
            # batch_size=None → one batch per BLOCK.  A block is a
            # contiguous slice of one file, so positional first/last-conv
            # classification is correct under any execution order; a
            # sized batch may concatenate blocks in completion order,
            # which interleaves conversations and breaks the split.
            batch_size=None,
            concurrency=pool,
            num_cpus=_actor_cpus,
        ).materialize()  # bounded: one row per distinct (conv, term) pair

        def keep(final: bool):
            def f(t: pa.Table) -> pa.Table:
                mask = t.column("final") if final else pc.invert(t.column("final"))
                return t.filter(mask).drop_columns(["final"])
            return f

        finals = combined.map_batches(
            # interior (conv, term) partials are unique by construction —
            # straight column build, no re-aggregation
            lambda t: term_partials_to_triples(keep(True)(t).drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
        merged = (
            combined.map_batches(keep(False), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda g: canonicalize_bucket_term_level(g.drop_columns(["__bucket"])),
                batch_format="pyarrow",
            )
        )
        triples = finals.union(merged)
    elif deterministic_scorer:
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
            num_cpus=_actor_cpus,
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
            num_cpus=_actor_cpus,
        )
        partials = links.map_batches(combine_links_batch, batch_format="pyarrow")

        def bucketize(batch: pa.Table) -> pa.Table:
            b = (hash64_column(batch.column("conv_id")) % np.uint64(canonicalize_buckets)).astype(np.int32)
            return batch.append_column("__bucket", pa.array(b))

        bucketed = partials.map_batches(bucketize, batch_format="pyarrow")
        triples = bucketed.groupby("__bucket").map_groups(
            lambda g: canonicalize_bucket_arrow(g.drop_columns(["__bucket"])),
            batch_format="pyarrow",
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


def extract_triples_to_parquet(
    transcripts,
    terms: pa.Table,
    out_dir: str,
    *,
    snapshot_hash: str = "",
    k: int = 5,
    dim: int = 256,
    seed: int = 42,
    confidence_threshold: float = 0.5,
    concurrency: int = 4,
    canonicalize_buckets: int = 128,
) -> int:
    """Production sink for conv-contiguous input: transcripts → triples
    parquet under ``out_dir``, returning the triple count.

    The hot actor writes each block's interior conversations' finished
    triples straight to ``out_dir`` (idempotent shard files) and emits
    only boundary partials — the lone exchange moves ~2 convs per block
    (plus the mega conversation) instead of every (conv, term) pair.
    Same layout contract as ``assume_conv_contiguous=True``: each
    conversation's rows contiguous within their file.  Requires a
    deterministic scorer.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    terms_ref = ray.put(terms)
    pool, _actor_cpus = _clamp_pool(
        concurrency if isinstance(concurrency, tuple) else (1, concurrency)
    )
    boundary = transcripts.map_batches(
        MentionLinkStage,
        fn_constructor_args=(terms_ref, k, dim, seed, confidence_threshold,
                             "write_interior", canonicalize_buckets, out_dir,
                             snapshot_hash),
        batch_format="pyarrow",
        batch_size=None,  # one batch per block — see assume_conv_contiguous
        concurrency=pool,
        num_cpus=_actor_cpus,
    )
    merged = boundary.groupby("__bucket").map_groups(
        lambda g: add_lineage(
            canonicalize_bucket_term_level(g.drop_columns(["__bucket"])),
            snapshot_hash,
        ),
        batch_format="pyarrow",
    )
    merged.write_parquet(out_dir)
    # interior shards were written by the actors; total = read-back count
    import ray.data as rd

    return rd.read_parquet(out_dir).count()


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


def incremental_update(prev_triples, transcripts, terms: pa.Table, *,
                       snapshot_hash: str = "",
                       **extract_kw):
    """Incremental KG maintenance: extract triples from NEW transcript
    shards and MERGE them into an existing triple snapshot by the
    (subj, pred, obj) identity — the day-2 operation of a
    continuously-updated knowledge graph, so a nightly delta of
    conversations never re-processes the corpus.

    Semantics: fresh extractions override the snapshot row for the same
    triple (so confidence, provenance and lineage — extractor_version,
    ontology_snapshot_hash, input_shard — always reflect the NEWEST
    evidence); unchanged snapshot triples stream through; novel triples
    insert.  Within a side, the highest-confidence row wins (conv_id
    tiebreak keeps it total).

    Scale shape: the extraction side is delta-sized; the merge is
    ops/join.merge_upsert's composite-key exchange — both sides reduce
    to per-batch per-triple candidates before the key-hash exchange, so
    the snapshot streams through without materializing.  Output order
    is bucket-partitioned (sort at read time if needed — the snapshot
    sink is content-addressed, not order-addressed).
    """
    from ..ops.join import merge_upsert
    from ..stages.canonicalize import TRIPLE_COLUMNS

    new_triples = extract_triples(transcripts, terms,
                                  snapshot_hash=snapshot_hash,
                                  sort_output=False, **extract_kw)
    # both sides are extract_triples output: declare the layout so the
    # merge never calls .schema() on the lazy snapshot branch (which
    # would execute that whole pipeline once just for column names)
    triple_cols = list(TRIPLE_COLUMNS) + [
        "input_shard", "extractor_version", "ontology_snapshot_hash"]
    return merge_upsert(prev_triples, new_triples,
                        key=["subj", "pred", "obj"],
                        order_col="confidence", tiebreak="conv_id",
                        columns=triple_cols)
