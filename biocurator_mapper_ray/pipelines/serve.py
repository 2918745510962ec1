"""Single-passage resolve shim — the reference's online serving surface
as a plain function, not a web framework.

Replays ``POST /resolve_biocurated_data``
(``/root/reference/app/main.py:68-88``) over the SAME state the bulk
pipeline uses: an in-process :class:`~..stages.link._TermSide` (embedder
+ vector index + hybrid surface owners) per configured ontology and a
scorer with the reference matcher's selection contract.  The bulk path
(``MentionLinkStage``) and this per-request path therefore cannot
diverge — both call ``candidates_for`` → ``select_best_match``.

Response shape mirrors the reference's ``ResolveResponse``: a
``best_match {id, name}``, ``confidence``, ``reason``, ``alternatives``
(every candidate that is not the winner, ``app/main.py:84``), and an
``error`` field instead of an exception when the matcher declines.
Unknown ontology names return the 404-shaped error the reference raises
(``app/main.py:71-73``); unexpected failures return the 500-shaped one
(``app/main.py:86-88``) rather than crashing the caller.
"""

from __future__ import annotations

import datetime

import pyarrow as pa

from ..stages.link import _TermSide
from ..stages.score import RuleScorer


class ResolveService:
    """Per-request resolve over broadcast-style term state.

    ``ontologies`` maps ontology name → parsed-terms ``pa.Table`` (the
    ``TERM_SCHEMA`` table every link stage consumes) — the "current
    version" the reference's ontology manager would look up
    (``app/main.py:70``); flip a snapshot by replacing the entry via
    :meth:`configure`.  State is built ONCE here, exactly like an actor
    ``__init__``; ``resolve`` is then per-passage work, so the same
    object drops into an actor pool unchanged if a caller wants to
    serve at scale.
    """

    def __init__(self, ontologies: dict[str, pa.Table], *, k: int = 5,
                 dim: int = 256, seed: int = 42,
                 confidence_threshold: float = 0.5, scorer=None):
        self._k, self._dim, self._seed = k, dim, seed
        self._sides: dict[str, _TermSide] = {}
        for name, terms in ontologies.items():
            self.configure(name, terms)
        self._scorer = scorer or RuleScorer(confidence_threshold)

    def configure(self, ontology_name: str, terms: pa.Table) -> None:
        """Point ``ontology_name`` at a (new) terms table — the
        manifest flip's serving-side effect."""
        self._sides[ontology_name] = _TermSide(
            terms, k=self._k, dim=self._dim, seed=self._seed)

    def health(self) -> dict:
        """``GET /health`` parity (``app/main.py:58-65``)."""
        return {
            "status": "healthy",
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(),
            "service": "biocurator-mapper-ray-resolve",
        }

    def resolve(self, passage: str, ontology_name: str) -> dict:
        side = self._sides.get(ontology_name)
        if side is None:
            return {"error": "Ontology not configured",
                    "status_code": 404}
        try:
            candidates = side.candidates_for(passage)
            match = self._scorer.select_best_match(passage, candidates)
            if "error" in match:
                return {"best_match": None, "confidence": None,
                        "reason": None, "alternatives": [],
                        "error": match["error"]}
            best_id = match["id"]
            return {
                "best_match": {"id": best_id,
                               "name": match.get("name", "")},
                "confidence": match.get("confidence"),
                "reason": match.get("reason"),
                "alternatives": [
                    {"id": c["id"], "name": c.get("name", "")}
                    for c in candidates if c.get("id") != best_id],
                "error": None,
            }
        except Exception as e:  # noqa: BLE001 — 500-shaped, never raise
            return {"error": str(e), "status_code": 500}
