"""Candidate retrieval + best-match selection stages.

Replays the reference's per-request resolve flow (``app/main.py:68-88``:
embed passage → Weaviate near_vector top-k → LLM select) as actor-pool
``map_batches`` stages over mention rows:

* :class:`RetrieverStage` — mirrors ``OntologySearcher.search_ontology``
  (``app/ontology_searcher.py:29-93``): per mention, embed and take top-k
  against the in-actor :class:`~..state.index.VectorIndex` replica; emits
  exploded candidate rows with ``rank`` and the Weaviate-style
  ``similarity_distance`` / ``similarity_certainty`` metadata.
* :class:`LinkStage` — the fused fast path used by the flagship pipeline:
  retrieve + select in one pass (no candidate materialization between
  stages, no shuffle).  Selection semantics are :class:`RuleScorer`'s
  (the reference's llm_matcher contract).

Both actors hold all state (terms table, index matrix, embedder, scorer,
and a per-distinct-mention memo — mention surfaces come from a finite
vocabulary, so the top-k/selection work per distinct string is done once
per actor) built in ``__init__`` from broadcast refs: ``ray.put`` the
terms table once on the driver; every actor reads it zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.embedder import HashingEmbedder
from ..state.index import VectorIndex
from .score import RuleScorer

LINK_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("term_id", pa.string()),
        ("name", pa.string()),
        ("confidence", pa.float32()),
        ("reason", pa.string()),
        ("similarity_distance", pa.float32()),
        ("similarity_certainty", pa.float32()),
        ("accepted", pa.bool_()),
        ("error", pa.string()),
    ]
)

CANDIDATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("term_id", pa.string()),
        ("name", pa.string()),
        ("similarity_distance", pa.float32()),
        ("similarity_certainty", pa.float32()),
        ("rank", pa.int32()),
    ]
)


class _TermSide:
    """Shared actor state: terms table + index + embedder.

    ``namespace_filter`` reproduces the reference's namespace-restricted
    search (``/root/reference/app/ontology_searcher.py:95-151``): both
    the exact-surface owner side and the vector top-k are masked to the
    requested namespace before ranking.
    """

    def __init__(self, terms_ref, k: int, dim: int, seed: int,
                 namespace_filter: str | None = None):
        import ray

        terms: pa.Table = ray.get(terms_ref) if not isinstance(terms_ref, pa.Table) else terms_ref
        self.embedder = HashingEmbedder(dim=dim, seed=seed)
        self.index = VectorIndex.from_terms_table(terms, self.embedder)
        self.k = k
        self.namespace_filter = namespace_filter
        # candidate payload columns, list-indexed like the index rows
        self.names = terms.column("name").to_pylist()
        self.definitions = terms.column("definition").to_pylist()
        self.exact_synonyms = terms.column("exact_synonyms").to_pylist()
        self.narrow_synonyms = terms.column("narrow_synonyms").to_pylist()
        self.broad_synonyms = terms.column("broad_synonyms").to_pylist()
        self.all_synonyms = terms.column("all_synonyms").to_pylist()
        self.namespaces = terms.column("namespace").to_pylist()
        # hybrid-retrieval dictionary side: surface → owning term rows.
        # Pure vector top-k can drop the true owner of a surface shared
        # bigram-wise with many sibling terms; exact owners are always
        # candidates (the vector list fills the rest), mirroring
        # keyword+vector hybrid search.
        from .mention import normalize_surface

        self._surface_owners: dict[str, list[int]] = {}
        for i, (name, syns) in enumerate(zip(self.names, self.all_synonyms)):
            for s in [name] + (syns or []):
                key = normalize_surface(s)
                if key:
                    self._surface_owners.setdefault(key, []).append(i)
        self._normalize_surface = normalize_surface

    def candidates_for(self, mention: str) -> list[dict]:
        """Weaviate-candidate-shaped dicts (ontology_searcher.py:74-87),
        hybrid: exact-surface owners ∪ vector top-k."""
        q = self.embedder.embed_text(mention)
        idx, cos = self.index.topk(q[None, :], self.k,
                                   namespace_filter=self.namespace_filter)
        owner_rows = self._surface_owners.get(self._normalize_surface(mention), [])
        if self.namespace_filter is not None:
            owner_rows = [i for i in owner_rows
                          if self.namespaces[i] == self.namespace_filter]
        ranked: list[tuple[int, float]] = []
        seen: set[int] = set()
        for i in owner_rows:
            ranked.append((i, float(q @ self.index.matrix[i])))
            seen.add(i)
        ranked.sort(key=lambda t: (-t[1], t[0]))
        for rank in range(idx.shape[1]):
            i = int(idx[0, rank])
            if i not in seen and len(ranked) < max(self.k, len(owner_rows)):
                ranked.append((i, float(cos[0, rank])))
        out = []
        for i, c in ranked:
            out.append(
                {
                    "id": str(self.index.term_ids[i]),
                    "name": self.names[i],
                    "definition": self.definitions[i],
                    "exact_synonyms": self.exact_synonyms[i],
                    "narrow_synonyms": self.narrow_synonyms[i],
                    "broad_synonyms": self.broad_synonyms[i],
                    "all_synonyms": self.all_synonyms[i],
                    "namespace": self.namespaces[i],
                    "similarity_distance": 1.0 - c,
                    "similarity_certainty": (1.0 + c) / 2.0,
                }
            )
        return out


class MentionLinkStage:
    """Fused transcripts → link rows stage (one actor pool).

    Mention detection and linking are both per-row maps over the same
    broadcast term side; fusing them removes an object-store exchange of
    the exploded mention rows and halves the actor-pool footprint — at
    cluster scale the mention stream is ~1 row per mention and never
    needs to exist outside the actor.

    ``emit="partials"`` additionally folds the flagship's post-link
    partial combine + bucketize (term-level, deterministic scorer) into
    the same actor call: the raw link rows then never leave the actor
    either, removing one task-pool operator's dispatch overhead and an
    object-store exchange of ~150 B/link.  ``n_buckets`` sets the
    ``__bucket`` fan-in for the downstream canonicalization groupby.
    """

    def __init__(self, terms_ref, k: int = 5, dim: int = 256, seed: int = 42,
                 confidence_threshold: float = 0.5, emit: str = "links",
                 n_buckets: int = 128, out_dir: str | None = None,
                 snapshot_hash: str = ""):
        import ray

        from .mention import MentionDetector

        # resolve the broadcast once; both sub-stages share the table
        terms = ray.get(terms_ref) if not isinstance(terms_ref, pa.Table) else terms_ref
        self.detector = MentionDetector(terms)
        self.linker = LinkStage(terms, k, dim, seed, confidence_threshold)
        self.emit = emit
        self.n_buckets = n_buckets
        self.out_dir = out_dir
        self.snapshot_hash = snapshot_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.emit == "partials":
            return self._partials(batch)
        if self.emit == "split_contiguous":
            return self._partials(batch, split_contiguous=True)
        if self.emit == "write_interior":
            return self._write_interior(batch)
        return self.linker(self.detector(batch))

    def _write_interior(self, batch: pa.Table) -> pa.Table:
        """Sink-fused split path: write interior convs' finished triples
        to ``out_dir`` here (idempotent, content-addressed shard name —
        a retried task overwrites the same file), return ONLY the
        boundary partials.  The downstream exchange then moves ~2 convs
        per block instead of every (conv, term) pair; Dataset-level
        stream splitting would need a materialize barrier + two filter
        passes instead (measured strictly slower)."""
        import hashlib
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..pipelines.kg import add_lineage
        from .canonicalize import term_partials_to_triples

        split = self._partials(batch, split_contiguous=True)
        finals = split.filter(split.column("final")).drop_columns(["final", "__bucket"])
        boundary = split.filter(pc.invert(split.column("final"))).drop_columns(["final"])
        if len(finals):
            triples = add_lineage(term_partials_to_triples(finals), self.snapshot_hash)
            ident = hashlib.sha1(
                "|".join(
                    [
                        str(finals.column("conv_id")[0]),
                        str(finals.column("conv_id")[len(finals) - 1]),
                        str(len(finals)),
                        str(len(batch)),
                    ]
                ).encode()
            ).hexdigest()[:16]
            tmp = os.path.join(self.out_dir, f".interior-{ident}.tmp")
            pq.write_table(triples, tmp)
            os.replace(tmp, os.path.join(self.out_dir, f"interior-{ident}.parquet"))
        return boundary

    def _partials(self, batch: pa.Table, split_contiguous: bool = False) -> pa.Table:
        """Allocation-lean fused path: detect → memoized link → accepted
        (row, term) pairs → Arrow group_by partial combine.

        Never materializes the 13-column link table, never converts
        ``conv_id``/``turn_idx`` to Python (mention rows address them by
        row index + ``take``); memory-bandwidth churn in this stage is
        what throttles all-core scaling (per-task CPU inflated 64% at 30
        actors vs 7 on the list-of-lists path).
        """
        import pyarrow.compute as pc

        from ..functions.hashing import hash64_column

        detect = self.detector.detect
        link = self.linker._link_one
        row_idx: list[int] = []
        term_ids: list[str] = []
        confs: list[float] = []
        for i, text in enumerate(batch.column("text").to_pylist()):
            if not text:
                continue
            for mention, _s, _e in detect(text):
                t = link(mention)
                if t[6]:  # accepted
                    row_idx.append(i)
                    term_ids.append(t[0])
                    confs.append(t[2])

        idx = pa.array(np.asarray(row_idx, dtype=np.int64))
        pairs = pa.table(
            {
                "conv_id": batch.column("conv_id").take(idx),
                "term_id": pa.array(term_ids, pa.string()),
                "confidence": pa.array(np.asarray(confs, dtype=np.float32)),
                "turn_idx": batch.column("turn_idx").take(idx),
            }
        )
        agg = pairs.group_by(["conv_id", "term_id"], use_threads=False).aggregate(
            [("confidence", "count"), ("confidence", "max"), ("turn_idx", "min")]
        )
        partials = pa.table(
            {
                "conv_id": agg.column("conv_id"),
                "term_id": agg.column("term_id"),
                "n_links": pc.cast(agg.column("confidence_count"), pa.int64()),
                "max_confidence": agg.column("confidence_max"),
                "min_turn_idx": agg.column("turn_idx_min"),
            }
        )
        b = (hash64_column(partials.column("conv_id")) % np.uint64(self.n_buckets)).astype(
            np.int32
        )
        partials = partials.append_column("__bucket", pa.array(b))
        if not split_contiguous:
            return partials
        # conv-contiguous layout (documented assumption of the caller):
        # a conversation's rows sit in consecutive batches, so only the
        # batch's FIRST and LAST conv can continue in a neighboring batch
        # — every other conv's partials are already its complete,
        # canonical (conv, term) aggregate.  Mark those final; only the
        # boundary sliver rides the exchange.
        n_rows = len(batch)
        if n_rows == 0 or len(partials) == 0:
            return partials.append_column(
                "final", pa.nulls(len(partials), pa.bool_()).fill_null(False)
            )
        conv_col = batch.column("conv_id")
        first_conv, last_conv = conv_col[0], conv_col[n_rows - 1]
        pconv = partials.column("conv_id")
        boundary = pc.or_(pc.equal(pconv, first_conv), pc.equal(pconv, last_conv))
        return partials.append_column("final", pc.invert(boundary))


class RetrieverStage:
    """mentions → exploded candidate rows with rank (ST3 analog).

    ``namespace_filter`` restricts retrieval to one ontology namespace
    (reference parity: ``app/ontology_searcher.py:95-151``)."""

    def __init__(self, terms_ref, k: int = 5, dim: int = 256, seed: int = 42,
                 namespace_filter: str | None = None):
        self.side = _TermSide(terms_ref, k, dim, seed, namespace_filter)
        self._memo: dict[str, list[dict]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        mentions = batch.column("mention").to_pylist()
        starts = batch.column("span_start").to_pylist()
        ends = batch.column("span_end").to_pylist()

        rows: dict[str, list] = {f.name: [] for f in CANDIDATE_SCHEMA}
        for cid, tix, mention, s, e in zip(conv_ids, turn_idxs, mentions, starts, ends):
            cands = self._memo.get(mention)
            if cands is None:
                cands = self.side.candidates_for(mention)
                self._memo[mention] = cands
            for rank, c in enumerate(cands):
                rows["conv_id"].append(cid)
                rows["turn_idx"].append(tix)
                rows["mention"].append(mention)
                rows["span_start"].append(s)
                rows["span_end"].append(e)
                rows["term_id"].append(c["id"])
                rows["name"].append(c["name"])
                rows["similarity_distance"].append(c["similarity_distance"])
                rows["similarity_certainty"].append(c["similarity_certainty"])
                rows["rank"].append(rank)
        return pa.Table.from_pydict(rows, schema=CANDIDATE_SCHEMA)


class LinkStage:
    """mentions → link-decision rows (fused retrieve + select)."""

    def __init__(self, terms_ref, k: int = 5, dim: int = 256, seed: int = 42,
                 confidence_threshold: float = 0.5, scorer_factory=None):
        self.side = _TermSide(terms_ref, k, dim, seed)
        # scorer_factory: zero-arg callable built ONCE PER ACTOR here —
        # e.g. lambda-free functools.partial(LLMScorer, RemoteChatClient(...))
        # plugs the remote matcher (functions/llm_client.py) in place of
        # the deterministic rule; both expose select_best_match/alternatives
        self.scorer = scorer_factory() if scorer_factory else \
            RuleScorer(confidence_threshold)
        self.confidence_threshold = confidence_threshold
        self._memo: dict[str, tuple] = {}

    def _link_one(self, mention: str) -> tuple:
        """(term_id, name, confidence, reason, dist, cert, accepted, error)"""
        got = self._memo.get(mention)
        if got is not None:
            return got
        candidates = self.side.candidates_for(mention)
        result = self.scorer.select_best_match(mention, candidates)
        if "error" in result:
            out = ("", "", 0.0, "", 1.0, 0.0, False, result["error"])
        else:
            conf = float(result["confidence"])
            cert = float(result.get("similarity_certainty", 0.0))
            out = (
                result["id"],
                result["name"],
                conf,
                result["reason"],
                1.0 - (2.0 * cert - 1.0),
                cert,
                conf >= self.confidence_threshold,
                "",
            )
        self._memo[mention] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch.column("mention").to_pylist()
        linked = [self._link_one(m) for m in mentions]

        def col(i, dtype=None):
            vals = [row[i] for row in linked]
            return np.asarray(vals, dtype=dtype) if dtype else vals

        return pa.Table.from_pydict(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "mention": batch.column("mention"),
                "span_start": batch.column("span_start"),
                "span_end": batch.column("span_end"),
                "term_id": col(0),
                "name": col(1),
                "confidence": col(2, np.float32),
                "reason": col(3),
                "similarity_distance": col(4, np.float32),
                "similarity_certainty": col(5, np.float32),
                "accepted": col(6, np.bool_),
                "error": col(7),
            },
            schema=LINK_SCHEMA,
        )
