"""Deterministic multi-turn transcript synthesizer (north-rule input).

Produces the exact input shape from BASELINE.json ``input_hint``:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])`` — plus a parallel ``expected_triples``
table derived from the planting process, so triple P/R vs the engine's
output is measurable without circular logic: every planted surface maps to
exactly one term by construction (fixtures.py surfaces are globally
unique), so ground truth is independent of the engine's scorer.

Properties (FIXTURES.md §4):

* conversations of 1–~120 turns plus ONE mega-conversation holding ~10% of
  all turns (conv ``conv00000000``) — the skew case the salted
  canonicalization combine must absorb;
* plants via term name / exact / narrow / broad / related synonym;
  near-miss distractors (scrambled vocab words that form no surface);
  unicode turns; empty-text turns; tool turns;
* ``ts`` monotone within a conversation; text never mutated downstream;
* fully deterministic from (seed, n_turns, n_terms) — conversation content
  depends only on the conversation index, not on partitioning, so any
  parallel generation plan yields byte-identical tables.

Generation itself is a Ray Data pipeline (``range(n_convs)`` →
``map_batches`` → ``write_parquet``) — at 10^12 turns this is the same
code, just more blocks.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from ..ontology.fixtures import make_document, make_performance_nodes
from ..ontology.parser import parse_ontology_json

GENERATOR_VERSION = "tgen-1"

_FILLER = (
    "please could you check the latest report and summarize findings from "
    "our meeting about patient records we reviewed yesterday during rounds "
    "also note that follow up is required before next week when results "
    "come back from the lab team thanks again for helping with this case "
    "today maybe consider an alternative plan if numbers look wrong"
).split()

_UNICODE_SNIPPETS = ["résumé naïve façade", "αβγ δέλτα", "差分 プライバシー", "مرحبا بالعالم"]
_TOOLS = ["search", "calculator", "retrieval", "summarizer", ""]

MEGA_CONV_IDX = 0


def build_vocabulary(n_terms: int = 500, seed: int = 42) -> tuple[list[dict], dict[str, str]]:
    """Parsed terms + surface→term_id map (all surfaces unique)."""
    doc = make_document(make_performance_nodes(n_terms, seed=seed))
    terms = parse_ontology_json(doc)
    surface_to_term: dict[str, str] = {}
    for t in terms:
        for s in [t["name"]] + t["all_synonyms"]:
            key = " ".join(s.lower().split())
            assert key not in surface_to_term or surface_to_term[key] == t["term_id"], (
                f"fixture surface collision: {key}"
            )
            surface_to_term[key] = t["term_id"]
    return terms, surface_to_term


class _ConvGen:
    """Deterministic per-conversation turn generator."""

    def __init__(self, n_terms: int, seed: int, n_turns_total: int):
        terms, _ = build_vocabulary(n_terms, seed)
        self.surfaces: list[tuple[str, str]] = []  # (surface, term_id)
        for t in terms:
            for s in [t["name"]] + t["all_synonyms"]:
                self.surfaces.append((s, t["term_id"]))
        self.distractors = [
            f"{t['name'].split()[1]} {t['name'].split()[0]} {t['name'].split()[2]}"
            for t in terms[: min(100, len(terms))]
        ]
        self.seed = seed
        self.mega_turns = max(1, n_turns_total // 10)
        self.base_ts_us = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in us

    def conv_size(self, conv_idx: int) -> int:
        if conv_idx == MEGA_CONV_IDX:
            return self.mega_turns
        h = stable_hash64(f"convsize:{conv_idx}", self.seed)
        return 1 + h % 120

    def turns_for_conv(self, conv_idx: int) -> list[dict]:
        size = self.conv_size(conv_idx)
        conv_id = f"conv{conv_idx:08d}"
        rng = np.random.default_rng(stable_hash64(f"conv:{conv_idx}", self.seed) % (2**63))
        rows = []
        for turn_idx in range(size):
            roll = rng.random()
            role = ("user", "assistant")[turn_idx % 2]
            tool = ""
            if roll < 0.05:
                role = "tool"
                tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))]

            planted: list[tuple[str, str]] = []
            text_roll = rng.random()
            if text_roll < 0.03:
                text = ""
            elif text_roll < 0.05:
                text = _UNICODE_SNIPPETS[int(rng.integers(0, len(_UNICODE_SNIPPETS)))]
            else:
                n_plants = 0
                if text_roll < 0.45:
                    n_plants = 1
                elif text_roll < 0.55:
                    n_plants = 2
                words: list[str] = list(
                    rng.choice(_FILLER, size=int(rng.integers(6, 15)))
                )
                for _ in range(n_plants):
                    surface, term_id = self.surfaces[int(rng.integers(0, len(self.surfaces)))]
                    pos = int(rng.integers(0, len(words) + 1))
                    words.insert(pos, surface)
                    planted.append((surface, term_id))
                if rng.random() < 0.08:
                    d = self.distractors[int(rng.integers(0, len(self.distractors)))]
                    words.insert(int(rng.integers(0, len(words) + 1)), d)
                text = " ".join(words)

            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": self.base_ts_us + conv_idx * 1_000_000_000 + turn_idx * 1_000_000,
                    "_planted": planted,
                }
            )
        return rows


TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

EXPECTED_TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)


def plan_conversations(n_turns: int, n_terms: int, seed: int) -> int:
    """Number of conversations whose deterministic sizes sum to ≈ n_turns."""
    gen = _ConvGen(n_terms, seed, n_turns)
    total = gen.mega_turns
    n_convs = 1
    # deterministic walk; sizes are hash-derived so this is reproducible
    while total < n_turns:
        total += gen.conv_size(n_convs)
        n_convs += 1
    return n_convs


class TranscriptBatchGen:
    """Ray Data map_batches callable: conversation indexes → turn rows."""

    def __init__(self, n_terms: int, seed: int, n_turns_total: int, with_truth: bool):
        self.gen = _ConvGen(n_terms, seed, n_turns_total)
        self.with_truth = with_truth

    def __call__(self, batch: dict) -> pa.Table:
        rows: list[dict] = []
        for conv_idx in batch["id"].tolist():
            rows.extend(self.gen.turns_for_conv(int(conv_idx)))
        if self.with_truth:
            # distinct (conv, term) over planted turns; first turn wins
            seen: dict[tuple[str, str], int] = {}
            for r in rows:
                for _, term_id in r["_planted"]:
                    key = (r["conv_id"], term_id)
                    if key not in seen:
                        seen[key] = r["turn_idx"]
            return pa.Table.from_pydict(
                {
                    "subj": [f"conv:{c}" for c, _ in seen],
                    "pred": ["mentions"] * len(seen),
                    "obj": [t for _, t in seen],
                    "conv_id": [c for c, _ in seen],
                    "turn_idx": np.asarray(list(seen.values()), dtype=np.int32),
                },
                schema=EXPECTED_TRIPLE_SCHEMA,
            )
        return pa.Table.from_pydict(
            {
                "conv_id": [r["conv_id"] for r in rows],
                "turn_idx": np.asarray([r["turn_idx"] for r in rows], dtype=np.int32),
                "role": [r["role"] for r in rows],
                "text": [r["text"] for r in rows],
                "tool": [r["tool"] for r in rows],
                "ts": np.asarray([r["ts"] for r in rows], dtype="datetime64[us]"),
            },
            schema=TRANSCRIPT_SCHEMA,
        )


def _cache_tag(n_turns: int, n_terms: int, seed: int) -> str:
    ident = json.dumps(
        {"gen": GENERATOR_VERSION, "n_turns": n_turns, "n_terms": n_terms, "seed": seed},
        sort_keys=True,
    )
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def sf_turn_count(sf_dir: str) -> int:
    """Map a driver sf dir to a transcript corpus size (sf × 2M turns)."""
    name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.001
    return max(200, int(2_000_000 * sf))


def ensure_transcripts(
    n_turns: int,
    n_terms: int = 500,
    seed: int = 42,
    cache_root: str = "/tmp/bmr_cache",
) -> tuple[str, str]:
    """Generate (once) and return (transcripts_dir, expected_triples_dir).

    Cached under a content tag; a ``_SUCCESS`` marker makes re-runs skip
    finished work (the engine-wide resumability convention, state/manifest).
    """
    import ray.data as rd

    tag = _cache_tag(n_turns, n_terms, seed)
    base = os.path.join(cache_root, f"transcripts_{tag}")
    tdir, edir = os.path.join(base, "transcripts"), os.path.join(base, "expected_triples")
    marker = os.path.join(base, "_SUCCESS")
    if os.path.exists(marker):
        return tdir, edir
    if os.path.exists(base):
        # a previous generation died before its marker: write_parquet
        # APPENDS files into an existing dir, so regenerating on top of
        # the partial output would double-count turns — wipe it first
        import shutil

        shutil.rmtree(base, ignore_errors=True)

    n_convs = plan_conversations(n_turns, n_terms, seed)
    parallelism = max(4, min(256, n_convs // 64))
    convs = rd.range(n_convs, override_num_blocks=parallelism)
    convs.map_batches(
        TranscriptBatchGen(n_terms, seed, n_turns, with_truth=False),
        batch_format="numpy",
    ).write_parquet(tdir)
    rd.range(n_convs, override_num_blocks=parallelism).map_batches(
        TranscriptBatchGen(n_terms, seed, n_turns, with_truth=True),
        batch_format="numpy",
    ).write_parquet(edir)
    with open(marker, "w") as f:
        f.write(tag)
    return tdir, edir
