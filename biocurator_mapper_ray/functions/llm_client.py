"""OpenAI-compatible chat-completions client + LLM match scorer.

Closes the engine's last pluggable seam with a CONCRETE client: the
reference selects the winning ontology term by calling
``chat.completions.create`` with a rich candidate prompt
(``/root/reference/app/llm_matcher.py:18-90``) and validating the JSON
reply (``:100-125``); the engine until now shipped only the
deterministic :class:`~biocurator_mapper_ray.stages.score.RuleScorer`
plus the response validator.  This module adds:

* :func:`build_match_prompt` — the reference's prompt layout
  (numbered ``name (id) | [namespace] | Definition | Exact synonyms
  (first 3) | Similarity``) so a remote model sees the same evidence.
* :class:`RemoteChatClient` — stdlib-``urllib`` POST to
  ``/v1/chat/completions`` (no SDK), ``temperature=0.1`` /
  ``max_tokens=500`` defaults per the reference call site
  (``llm_matcher.py:87-92``); HTTP failures carry ``status_code`` for
  the shared retryable classifier.
* :class:`LLMScorer` — drop-in for ``RuleScorer`` inside
  :class:`~biocurator_mapper_ray.stages.link.MentionLinkStage`
  (same ``select_best_match`` / ``alternatives`` surface): prompt →
  capped-backoff retried chat call → fence-strip + strict-JSON
  validation via ``parse_llm_response`` → winner join-back.  Errors
  become ``{"error": ...}`` rows, never exceptions — the reference's
  R5 contract (LLM error → error result, ``llm_matcher.py:126-133``).

Construct ONCE PER ACTOR (``__init__`` of a map_batches class); each
``select_best_match`` is one remote round trip, so real deployments
should batch mentions per conversation the way the link stage already
groups them.
"""

from __future__ import annotations

import json
import time

from .embedder import classify_retryable

DEFAULT_TEMPERATURE = 0.1
DEFAULT_MAX_TOKENS = 500


class RemoteChatError(Exception):
    """HTTP failure from a chat-completions endpoint; carries
    ``status_code`` for :func:`classify_retryable`."""

    def __init__(self, message: str, status_code: int | None = None):
        super().__init__(message)
        self.status_code = status_code


class RemoteChatClient:
    """OpenAI-compatible ``/v1/chat/completions`` REST client, stdlib
    ``urllib`` only (mirror of ``functions.embedder.RemoteEmbedder``
    for the chat side; reference client: ``app/llm_matcher.py:13-16``
    + the ``create`` call ``:87-92``)."""

    def __init__(self, endpoint: str, *, model: str,
                 api_key: str | None = None,
                 temperature: float = DEFAULT_TEMPERATURE,
                 max_tokens: int = DEFAULT_MAX_TOKENS,
                 timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.temperature = temperature
        self.max_tokens = max_tokens
        self.timeout = timeout
        self.model_name = f"remote-chat:{model}"

    def complete(self, prompt: str) -> str:
        """One user-message completion → assistant text content."""
        import urllib.error
        import urllib.request

        body = json.dumps({
            "model": self.model,
            "messages": [{"role": "user", "content": prompt}],
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/v1/chat/completions", data=body,
            method="POST",
            headers={"Content-Type": "application/json",
                     **({"Authorization": f"Bearer {self.api_key}"}
                        if self.api_key else {})})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            detail = ""
            try:
                detail = exc.read().decode("utf-8", "replace")[:500]
            except Exception:  # noqa: BLE001 — body is best-effort
                pass
            raise RemoteChatError(
                f"chat endpoint returned {exc.code}: {detail}",
                status_code=exc.code) from exc
        except urllib.error.URLError as exc:
            raise RemoteChatError(
                f"chat endpoint unreachable: {exc.reason}") from exc
        try:
            return str(payload["choices"][0]["message"]["content"])
        except (KeyError, IndexError, TypeError) as exc:
            raise RemoteChatError(
                f"malformed chat response: {exc!r}") from exc


def build_match_prompt(passage: str, candidates: list[dict]) -> str:
    """Reference-parity candidate prompt
    (``app/llm_matcher.py:18-76``): numbered rich descriptions joined
    with `` | ``, then the instruction block demanding strict JSON
    with keys ``id/name/confidence/reason``."""
    descs = []
    for idx, c in enumerate(candidates, 1):
        parts = [f"{idx}. {c.get('name', '')} ({c.get('id', '')})"]
        if c.get("namespace"):
            parts.append(f"[{c['namespace']}]")
        if c.get("definition"):
            parts.append(f"Definition: {c['definition']}")
        exact = c.get("exact_synonyms") or []
        if exact:
            parts.append(f"Exact synonyms: {', '.join(exact[:3])}")
        narrow = c.get("narrow_synonyms") or []
        if narrow:
            parts.append(f"Narrow synonyms: {', '.join(narrow[:3])}")
        if "similarity_certainty" in c:
            parts.append(f"Similarity: {c['similarity_certainty']:.3f}")
        descs.append(" | ".join(parts))
    return (
        "You are an expert curator. Given a passage and candidate "
        "ontology terms (with their synonyms and metadata), choose the "
        "single best matching term.\n\n"
        "Consider:\n"
        "- Semantic similarity between passage and term definition\n"
        "- Relevance of synonyms to the passage content\n"
        "- Appropriateness of the ontology namespace\n"
        "- Vector similarity scores as a guide\n\n"
        "Respond ONLY in valid JSON format with these exact keys:\n"
        "{\n"
        '  "id": "...",  // Must be one of the provided candidate IDs\n'
        '  "name": "exact term name",\n'
        '  "confidence": 0.95,  // Float between 0-1\n'
        '  "reason": "brief explanation"\n'
        "}\n\n"
        f"Passage:\n{passage}\n\n"
        f"Candidate terms:\n" + "\n".join(descs) + "\n"
    )


class LLMScorer:
    """Remote-LLM term selection with the RuleScorer surface, so
    ``MentionLinkStage(scorer=LLMScorer(client))`` swaps the
    deterministic rule for a real model without touching the pipeline.

    Retry contract matches the embedding side (R1–R3): per-call retry
    ≤ ``max_retries``, delay doubling from ``base_delay`` capped at
    60 s, retryability decided by the shared classifier.  Exhausted or
    non-retryable failures return ``{"error": ...}`` (R5) — the link
    stage already routes error dicts into ``LINK_SCHEMA.error`` rows.
    """

    def __init__(self, client, *, max_retries: int = 3,
                 base_delay: float = 0.1, sleep=time.sleep):
        self.client = client
        self.max_retries = max_retries
        self.base_delay = base_delay
        self._sleep = sleep
        self.retry_count = 0
        self.error_count = 0

    def _complete_with_retries(self, prompt: str) -> str:
        attempt = 0
        while True:
            try:
                return self.client.complete(prompt)
            except Exception as exc:  # noqa: BLE001 — classifier decides
                status = getattr(exc, "status_code", None)
                if (attempt >= self.max_retries
                        or not classify_retryable(status, str(exc))):
                    raise
                self._sleep(min(self.base_delay * (2 ** attempt), 60.0))
                attempt += 1
                self.retry_count += 1

    def select_best_match(self, mention: str, candidates: list[dict]) -> dict:
        from ..stages.score import join_back_winner, parse_llm_response

        if not candidates:
            return {"error": "No candidates provided"}
        try:
            content = self._complete_with_retries(
                build_match_prompt(mention, candidates))
        except Exception as exc:  # noqa: BLE001 — R5: error row, not raise
            self.error_count += 1
            return {"error": f"LLM error: {exc}"}
        result = parse_llm_response(content, candidates)
        if "error" in result:
            self.error_count += 1
            return result
        return join_back_winner(result, candidates)

    def alternatives(self, result: dict, candidates: list[dict]) -> list[dict]:
        """candidates minus the winner (reference ``app/main.py:84``)."""
        if "error" in result:
            return candidates
        return [c for c in candidates if c.get("id") != result.get("id")]
