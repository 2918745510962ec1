"""Per-conversation canonicalization and triple emission.

The reference returns one best match per passage (``app/main.py:79-85``);
in bulk mode a conversation yields many link rows whose surface forms must
be merged to canonical CURIEs before triples are emitted (north rule).

Two-phase design so a skewed mega-conversation never ships its raw rows
through the shuffle:

1. **Partial combine** (:func:`combine_links_batch`, stateless
   ``map_batches``): accepted link rows → one partial row per
   ``(conv_id, mention_norm, term_id)`` per batch with summed counts and
   max confidence.  This bounds groupby input by the conversation's
   DISTINCT (surface, term) pairs — a 10M-turn conversation with a normal
   vocabulary reduces by orders of magnitude before the exchange.
2. **Merge** (:func:`canonicalize_group`, ``groupby("conv_id").
   map_groups``): union-find over the bipartite surface↔term graph; each
   component's canonical CURIE is the member term with the highest summed
   confidence (deterministic tie-break on term_id); one triple
   ``(conv:<conv_id>, mentions, canonical_curie)`` per component.

Exact triple dedup on (subj, pred, obj) is inherent: one conversation is
one group, and components partition its terms.  The final cross-dataset
``sort(["subj","pred","obj"])`` gives a deterministic materialized order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TRIPLE_COLUMNS = [
    "subj", "pred", "obj", "conv_id", "turn_idx", "confidence", "n_mentions",
]

PRED_MENTIONS = "mentions"


def combine_links_term_level(batch: pa.Table) -> pa.Table:
    """Stateless pre-aggregation for DETERMINISTIC scorers: accepted
    links → one partial row per ``(conv_id, term_id)``.

    With a deterministic scorer a surface always maps to the same term,
    so the surface↔term graph per conversation is a star forest and the
    union-find/mention machinery of :func:`canonicalize_bucket` is inert
    — canonicalization degenerates to an algebraic
    (sum, max, min) merge keyed by ``(conv_id, term_id)``.  Dropping the
    ``mention`` string column and collapsing to term level shrinks the
    only all-to-all exchange in the flagship plan by ~3× (measured
    4.28M×~70B → 2.5M×~40B rows at 8M turns).
    """
    df = batch.select(
        ["conv_id", "turn_idx", "term_id", "confidence", "accepted"]
    ).to_pandas()
    df = df[df["accepted"]]
    if df.empty:
        return pa.Table.from_pydict(
            {
                "conv_id": pa.array([], pa.string()),
                "term_id": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
                "max_confidence": pa.array([], pa.float32()),
                "min_turn_idx": pa.array([], pa.int32()),
            }
        )
    grouped = (
        df.groupby(["conv_id", "term_id"], sort=False)
        .agg(
            n_links=("confidence", "size"),
            max_confidence=("confidence", "max"),
            min_turn_idx=("turn_idx", "min"),
        )
        .reset_index()
    )
    grouped["max_confidence"] = grouped["max_confidence"].astype(np.float32)
    grouped["min_turn_idx"] = grouped["min_turn_idx"].astype(np.int32)
    return pa.Table.from_pandas(grouped, preserve_index=False)


def canonicalize_bucket_term_level(group: pa.Table) -> pa.Table:
    """One hash bucket of term-level partials → triples.

    Pure Arrow: C++ hash aggregate + vectorized string build (the pandas
    two-string-key groupby version of this merge was the top CPU consumer
    of the whole flagship plan at 32M turns — ~23 µs/row across 390 CPU-s).
    """
    import pyarrow.compute as pc

    agg = group.group_by(["conv_id", "term_id"], use_threads=False).aggregate(
        [("n_links", "sum"), ("max_confidence", "max"), ("min_turn_idx", "min")]
    )
    return term_partials_to_triples(
        agg, "n_links_sum", "max_confidence_max", "min_turn_idx_min"
    )


def term_partials_to_triples(
    t: pa.Table,
    n_links_col: str = "n_links",
    conf_col: str = "max_confidence",
    turn_col: str = "min_turn_idx",
) -> pa.Table:
    """Unique (conv_id, term_id) partial rows → triple rows (no re-agg);
    sorted (conv_id, term_id) for deterministic within-block order."""
    import pyarrow.compute as pc

    t = t.sort_by([("conv_id", "ascending"), ("term_id", "ascending")])
    n = len(t)
    conv = t.column("conv_id")
    return pa.table(
        {
            "subj": pc.binary_join_element_wise(
                pa.nulls(n, pa.string()).fill_null("conv:"), conv, ""
            ),
            "pred": pa.nulls(n, pa.string()).fill_null(PRED_MENTIONS),
            "obj": t.column("term_id"),
            "conv_id": conv,
            "turn_idx": t.column(turn_col),
            "confidence": t.column(conf_col),
            "n_mentions": t.column(n_links_col),
        }
    )


def combine_links_batch(batch: pa.Table) -> pa.Table:
    """Stateless pre-aggregation: accepted links → partial rows."""
    df = batch.select(
        ["conv_id", "turn_idx", "mention", "term_id", "confidence", "accepted"]
    ).to_pandas()
    df = df[df["accepted"]]
    if df.empty:
        return pa.Table.from_pydict(
            {
                "conv_id": pa.array([], pa.string()),
                "mention": pa.array([], pa.string()),
                "term_id": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
                "max_confidence": pa.array([], pa.float32()),
                "min_turn_idx": pa.array([], pa.int32()),
            }
        )
    grouped = (
        df.groupby(["conv_id", "mention", "term_id"], sort=False)
        .agg(
            n_links=("confidence", "size"),
            max_confidence=("confidence", "max"),
            min_turn_idx=("turn_idx", "min"),
        )
        .reset_index()
    )
    grouped["max_confidence"] = grouped["max_confidence"].astype(np.float32)
    grouped["min_turn_idx"] = grouped["min_turn_idx"].astype(np.int32)
    return pa.Table.from_pandas(grouped, preserve_index=False)


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def _canonicalize_rows(
    conv_id: str,
    mentions: list[str],
    term_ids: list[str],
    n_links: list[int],
    max_confs: list[float],
    min_turns: list[int],
) -> list[tuple]:
    """Core merge for ONE conversation over plain lists (no pandas —
    per-group DataFrame machinery dominated the stage wall time)."""
    # re-merge partials that came from different batches
    agg: dict[tuple[str, str], list] = {}
    for m, t, n, c, x in zip(mentions, term_ids, n_links, max_confs, min_turns):
        r = agg.get((m, t))
        if r is None:
            agg[(m, t)] = [int(n), float(c), int(x)]
        else:
            r[0] += int(n)
            if c > r[1]:
                r[1] = float(c)
            if x < r[2]:
                r[2] = int(x)

    uf = _UnionFind()
    term_weight: dict[str, float] = {}
    for (m, t), (n, c, _x) in agg.items():
        uf.union(f"m:{m}", f"t:{t}")
        term_weight[t] = term_weight.get(t, 0.0) + c * n

    comp_terms: dict[str, list[str]] = {}
    for t in term_weight:
        comp_terms.setdefault(uf.find(f"t:{t}"), []).append(t)
    canonical: dict[str, str] = {}
    for root, terms in comp_terms.items():
        terms.sort(key=lambda t: (-term_weight[t], t))
        canonical[root] = terms[0]

    # one triple per component
    rows: dict[str, list] = {}
    for (m, t), (n, c, x) in agg.items():
        obj = canonical[uf.find(f"t:{t}")]
        r = rows.get(obj)
        if r is None:
            rows[obj] = [x, c, n]
        else:
            if x < r[0]:
                r[0] = x
            if c > r[1]:
                r[1] = c
            r[2] += n
    subj = f"conv:{conv_id}"
    return [
        (subj, PRED_MENTIONS, obj, conv_id, x, c, n)
        for obj, (x, c, n) in rows.items()
    ]


def _triples_frame(rows: list[tuple]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=TRIPLE_COLUMNS)
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["confidence"] = out["confidence"].astype(np.float32)
    out["n_mentions"] = out["n_mentions"].astype(np.int64)
    return out


def canonicalize_group(group: pd.DataFrame) -> pd.DataFrame:
    """One conversation's partial rows → deduplicated triples
    (``groupby("conv_id").map_groups`` callable)."""
    rows = _canonicalize_rows(
        group["conv_id"].iloc[0],
        group["mention"].tolist(),
        group["term_id"].tolist(),
        group["n_links"].tolist(),
        group["max_confidence"].tolist(),
        group["min_turn_idx"].tolist(),
    )
    return _triples_frame(rows)


def canonicalize_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """Many conversations' partial rows (one hash bucket) → triples.

    The scale path: ``groupby("conv_id").map_groups`` pays ~ms-level
    framework overhead PER GROUP (measured 3.5 ms × 10^4-10^5 convs
    dominating the whole pipeline), so the pipeline buckets conversations
    (``__bucket = hash(conv_id) % B``) and processes each bucket's convs
    inside one call.

    Within the bucket, conversations where no surface maps to more than
    one term (the only way union-find can merge anything) take a fully
    vectorized pandas path; union-find runs only on the ambiguous
    remainder (with deterministic linking that remainder is empty — it
    exists for pluggable nondeterministic scorers).
    """
    amb = group.groupby(["conv_id", "mention"], sort=False)["term_id"].nunique()
    amb_convs = set(amb[amb > 1].index.get_level_values(0))

    fast = group[~group["conv_id"].isin(amb_convs)] if amb_convs else group
    frames: list[pd.DataFrame] = []
    if len(fast):
        agg = (
            fast.groupby(["conv_id", "term_id"], sort=False)
            .agg(
                n_mentions=("n_links", "sum"),
                confidence=("max_confidence", "max"),
                turn_idx=("min_turn_idx", "min"),
            )
            .reset_index()
        )
        out = pd.DataFrame(
            {
                "subj": "conv:" + agg["conv_id"],
                "pred": PRED_MENTIONS,
                "obj": agg["term_id"],
                "conv_id": agg["conv_id"],
                "turn_idx": agg["turn_idx"].astype(np.int32),
                "confidence": agg["confidence"].astype(np.float32),
                "n_mentions": agg["n_mentions"].astype(np.int64),
            },
            columns=TRIPLE_COLUMNS,
        )
        frames.append(out)

    if amb_convs:
        slow = group[group["conv_id"].isin(amb_convs)]
        rows: list[tuple] = []
        for conv_id, g in slow.groupby("conv_id", sort=False):
            rows.extend(
                _canonicalize_rows(
                    conv_id,
                    g["mention"].tolist(),
                    g["term_id"].tolist(),
                    g["n_links"].tolist(),
                    g["max_confidence"].tolist(),
                    g["min_turn_idx"].tolist(),
                )
            )
        frames.append(_triples_frame(rows))

    if not frames:
        return _triples_frame([])
    out = pd.concat(frames, ignore_index=True)
    # deterministic within-bucket order (cheap: one bucket's triples);
    # the optional cross-dataset sort in extract_triples is for small
    # correctness runs only — at scale the output stays bucket-partitioned
    return out.sort_values(["subj", "obj"], ignore_index=True)


def canonicalize_bucket_arrow(group: pa.Table) -> pa.Table:
    """Arrow-block wrapper for :func:`canonicalize_bucket` so the
    nondeterministic-scorer path emits Arrow blocks like every other
    mode — string-keyed pandas blocks downstream of a groupby were the
    recorded kg_segments/BASELINE lesson (they make any later exchange
    or sort pathologically slow).  The ambiguous-remainder union-find
    still runs on pandas INSIDE the call; only the block format changes
    (metadata stripped so dtypes don't round-trip through to_pandas)."""
    out = canonicalize_bucket(group.to_pandas())
    return pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None)
