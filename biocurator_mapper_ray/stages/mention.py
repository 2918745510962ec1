"""Mention detection over transcript turns.

The reference resolves one whole passage per request (``app/main.py:68-88``)
— there is no span detection.  In bulk mode each turn's text may contain
zero or many ontology mentions, so the engine adds an explicit dictionary
spotting stage: surfaces = term names + all synonyms (the same surface set
Weaviate vectorizes into ``searchable_text``, ``app/go_parser.py:122-127``),
matched leftmost-longest on token boundaries, case-insensitive.

Implemented as a single compiled regex alternation (C-speed scan; patterns
sorted longest-first so the longest surface wins at a position), built ONCE
per actor in ``__init__`` from the broadcast terms table.  Lowercasing for
the match preserves offsets, so (span_start, span_end) index the ORIGINAL
text — the ``text`` column itself is never mutated (per-turn text-equality
invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def normalize_surface(s: str) -> str:
    """Canonical surface key: lowercase, collapsed whitespace."""
    return " ".join(s.lower().split())


def build_surface_vocab(terms: pa.Table) -> dict[str, list[str]]:
    """surface (normalized) → sorted list of term_ids carrying it."""
    vocab: dict[str, set[str]] = {}
    term_ids = terms.column("term_id").to_pylist()
    names = terms.column("name").to_pylist()
    all_syns = terms.column("all_synonyms").to_pylist()
    for tid, name, syns in zip(term_ids, names, all_syns):
        for surface in [name] + (syns or []):
            key = normalize_surface(surface)
            if key:
                vocab.setdefault(key, set()).add(tid)
    return {k: sorted(v) for k, v in vocab.items()}


def _trie_regex(words: list[str]) -> str:
    """Compile a word list into a prefix-trie regex.

    A flat 2500-way alternation makes Python's backtracking engine try
    every alternative at every position (~170µs per short turn measured);
    sharing prefixes in a trie keeps the scan near-linear.  Longest-match
    preference is preserved because at each trie node the "end here"
    branch is emitted AFTER the longer continuations.
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}  # end-of-word marker

    def emit(node: dict) -> str:
        end = "" in node
        keys = [k for k in node if k != ""]
        branches = []
        for ch in sorted(keys):
            child = node[ch]
            ckeys = [k for k in child if k != ""]
            suffix = emit(child)
            branches.append(re.escape(ch) + suffix)
        if not branches:
            return ""
        if len(branches) == 1 and not end:
            return branches[0]
        body = "|".join(branches)
        if end:
            # longer continuations first, then the empty (end-here) branch
            return f"(?:{body})?" if len(branches) == 1 else f"(?:(?:{body}))?"
        return f"(?:{body})"

    return emit(trie)


def compile_surface_pattern(surfaces: list[str]) -> re.Pattern:
    """Trie-compressed pattern with alnum-boundary guards; longest match
    wins at a position (trie emits longer continuations before end-marks,
    and the trailing boundary guard rejects partial-word cutoffs)."""
    body = _trie_regex(sorted(surfaces))
    return re.compile(rf"(?<![a-z0-9])(?:{body})(?![a-z0-9])")


MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("mention", pa.string()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
    ]
)


class MentionDetector:
    """Actor-pool map_batches stage: transcripts → exploded mention rows.

    State (vocab + compiled pattern) built once per actor from a broadcast
    terms-table ref (``ray.put`` on the driver) or a plain table.
    """

    def __init__(self, terms_ref):
        import ray

        terms = ray.get(terms_ref) if not isinstance(terms_ref, pa.Table) else terms_ref
        self.vocab = build_surface_vocab(terms)
        self.pattern = compile_surface_pattern(list(self.vocab)) if self.vocab else None

    def detect(self, text: str) -> list[tuple[str, int, int]]:
        if not text or self.pattern is None:
            return []
        out = []
        for m in self.pattern.finditer(text.lower()):
            out.append((m.group(0), m.start(), m.end()))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()

        o_conv, o_turn, o_mention, o_s, o_e = [], [], [], [], []
        for cid, tix, text in zip(conv_ids, turn_idxs, texts):
            for mention, s, e in self.detect(text or ""):
                o_conv.append(cid)
                o_turn.append(tix)
                o_mention.append(mention)
                o_s.append(s)
                o_e.append(e)
        return pa.Table.from_pydict(
            {
                "conv_id": o_conv,
                "turn_idx": np.asarray(o_turn, dtype=np.int32),
                "mention": o_mention,
                "span_start": np.asarray(o_s, dtype=np.int32),
                "span_end": np.asarray(o_e, dtype=np.int32),
            },
            schema=MENTION_SCHEMA,
        )
