"""Best-match selection (entity-link scoring).

Deterministic reimplementation of the reference's LLM matcher contract
(``/root/reference/app/llm_matcher.py:77-138``):

* empty candidate list → ``{"error": "No candidates provided"}`` (``:79-80``);
* the chosen ``id`` MUST be one of the candidate ids (``:111-114``);
* a structurally invalid response → error result, never an exception
  (``:105-109``, ``:130-138``);
* the winner is joined back with ``definition``, ``exact_synonyms``,
  ``namespace``, ``similarity_certainty`` (``:117-125``);
* ``alternatives`` = candidates minus the winner (``app/main.py:84``).

The default scorer replaces GPT-4 with a seeded rule: score =
``similarity_certainty`` + exact-surface bonus; winner = max score with a
lexicographic term-id tie-break (stable across runs).  A real LLM client
plugs in via :func:`parse_llm_response`, which reproduces the reference's
fence-stripping + strict-JSON validation (``:94-114``) for remote output.
"""

from __future__ import annotations

import json

from .mention import normalize_surface

EXACT_SURFACE_BONUS = 0.5


def parse_llm_response(content: str, candidates: list[dict]) -> dict:
    """Validate a raw LLM response against the reference contract
    (llm_matcher.py:94-114).  Returns the parsed result or an error dict."""
    content = content.strip()
    if content.startswith("```json"):
        content = content[7:]
    if content.endswith("```"):
        content = content[:-3]
    content = content.strip()

    try:
        result = json.loads(content)
    except json.JSONDecodeError as e:
        return {"error": f"JSON decode error: {e}"}

    required_keys = {"id", "name", "confidence", "reason"}
    if not isinstance(result, dict) or not all(k in result for k in required_keys):
        missing = required_keys - set(result.keys() if isinstance(result, dict) else [])
        return {"error": f"LLM response missing required keys: {missing}"}

    candidate_ids = {c["id"] for c in candidates}
    if result["id"] not in candidate_ids:
        return {"error": f"LLM chose invalid ID {result['id']} not in candidates"}
    return result


def join_back_winner(result: dict, candidates: list[dict]) -> dict:
    """Attach the winner's full term data (llm_matcher.py:117-125)."""
    for candidate in candidates:
        if candidate["id"] == result["id"]:
            result.update(
                {
                    "definition": candidate.get("definition", ""),
                    "exact_synonyms": candidate.get("exact_synonyms", []),
                    "namespace": candidate.get("namespace", ""),
                    "similarity_certainty": candidate.get("similarity_certainty", 0.0),
                }
            )
            break
    return result


class RuleScorer:
    """Deterministic selection: certainty + exact-surface bonus, stable
    tie-break; emits the same result shape as the reference matcher."""

    def __init__(self, confidence_threshold: float = 0.5):
        self.confidence_threshold = confidence_threshold

    def score_candidate(self, mention: str, candidate: dict) -> tuple[float, bool]:
        mnorm = normalize_surface(mention)
        surfaces = {normalize_surface(candidate.get("name", ""))}
        for s in candidate.get("all_synonyms", []) or []:
            surfaces.add(normalize_surface(s))
        exact = mnorm in surfaces
        score = float(candidate.get("similarity_certainty", 0.0))
        if exact:
            score += EXACT_SURFACE_BONUS
        return score, exact

    def select_best_match(self, mention: str, candidates: list[dict]) -> dict:
        if not candidates:
            return {"error": "No candidates provided"}

        best = None
        best_key = None
        best_exact = False
        for c in candidates:
            score, exact = self.score_candidate(mention, c)
            # deterministic: max score, then lexicographically smallest id
            key = (-score, str(c.get("id", "")))
            if best_key is None or key < best_key:
                best, best_key, best_exact = c, key, exact

        certainty = float(best.get("similarity_certainty", 0.0))
        if best_exact:
            confidence = min(0.99, 0.90 + 0.09 * certainty)
            reason = (
                f"Exact surface match of '{mention}' to term "
                f"{best['id']} ({best.get('name', '')})"
            )
        else:
            confidence = max(0.0, 0.80 * certainty)
            reason = (
                f"Vector similarity {certainty:.3f} of '{mention}' to term "
                f"{best['id']} ({best.get('name', '')})"
            )

        result = {
            "id": best["id"],
            "name": best.get("name", ""),
            "confidence": round(confidence, 6),
            "reason": reason,
        }
        # mirror the validation path even though construction guarantees it
        checked = parse_llm_response(json.dumps(result), candidates)
        if "error" in checked:
            return checked
        return join_back_winner(checked, candidates)

    def alternatives(self, result: dict, candidates: list[dict]) -> list[dict]:
        """candidates minus the winner (app/main.py:84)."""
        if "error" in result:
            return candidates
        return [c for c in candidates if c["id"] != result["id"]]

    def explain_match(self, passage: str, selected_term: dict) -> str:
        """Secondary cheap explain path (reference parity:
        ``/root/reference/app/llm_matcher.py:140-160`` — a separate
        2–3-sentence explanation call over the selected term's name, id,
        definition and exact synonyms).  Deterministic here: the
        explanation is built from the same evidence the scorer used, and
        like the reference it degrades to a similarity-based fallback
        sentence rather than raising."""
        try:
            name = selected_term["name"]
            term_id = selected_term["id"]
            score, exact = self.score_candidate(passage, selected_term)
            definition = (selected_term.get("definition") or "").strip()
            synonyms = [s for s in (selected_term.get("exact_synonyms") or []) if s]
            if exact:
                first = (
                    f"The term '{name}' ({term_id}) is the best match because the "
                    f"passage surface '{passage}' exactly matches its "
                    f"{'name' if normalize_surface(name) == normalize_surface(passage) else 'exact synonym'}."
                )
            else:
                cert = float(selected_term.get("similarity_certainty", 0.0))
                first = (
                    f"The term '{name}' ({term_id}) is the best match by vector "
                    f"similarity (certainty {cert:.3f}) to the passage "
                    f"'{passage}'."
                )
            parts = [first]
            if definition:
                parts.append(f"Its definition — \"{definition}\" — covers the "
                             f"concept the passage describes.")
            if synonyms:
                parts.append("Known exact synonyms: " + ", ".join(synonyms[:5]) + ".")
            return " ".join(parts)
        except Exception as e:  # reference: never raise from explain
            return (
                "Match selected based on semantic similarity "
                f"(explanation generation failed: {e})"
            )
