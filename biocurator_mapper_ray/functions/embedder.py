"""Deterministic feature-hashing text embedder.

Replaces the reference's OpenAI embedding client
(``/root/reference/app/openai_client.py:40-118`` — lazy singleton, batched
``embeddings.create``) with a seeded, dependency-free, vectorizable model so
the whole engine is reproducible in tests; a real client is pluggable via
the same interface (``embed_texts``).

Model: token unigram + bigram feature hashing into D dims with ±1 signs
(the standard hashing trick), L2-normalized.  An exact surface-form match
therefore embeds to exactly the same vector as the surface itself, and a
term vector built as the mean of its surface vectors retains high cosine
to each surface — which is what makes deterministic top-k retrieval
faithful to the reference's "embed surface text, kNN against term vectors"
flow (``app/ontology_searcher.py:21-61``).

Retries/rate-limit handling from the reference (R1–R3,
``app/ontology_manager.py:357-456``, ``app/openai_client.py:120-160``) are
client-side concerns; the :class:`RetryingEmbedder` wrapper reproduces the
classifier + capped exponential backoff contract for pluggable remote
clients while the deterministic model needs none.
"""

from __future__ import annotations

import re
import time

import numpy as np

from .hashing import stable_hash64

_TOKEN_RE = re.compile(r"[a-z0-9]+")

DEFAULT_DIM = 256


class HashingEmbedder:
    """Deterministic embedder; safe to construct in every actor.

    Feature→(index, sign) pairs are memoized per instance, so repeated
    vocabulary (conversational text) amortizes the hashing cost.
    """

    def __init__(self, dim: int = DEFAULT_DIM, seed: int = 42):
        self.dim = dim
        self.seed = seed
        self.model_name = f"hashing-v1-d{dim}-s{seed}"
        self._feat_cache: dict[str, tuple[int, float]] = {}

    def _feature(self, feat: str) -> tuple[int, float]:
        got = self._feat_cache.get(feat)
        if got is None:
            h = stable_hash64(feat, self.seed)
            got = (h % self.dim, 1.0 if (h >> 63) & 1 else -1.0)
            self._feat_cache[feat] = got
        return got

    @staticmethod
    def tokenize(text: str) -> list[str]:
        return _TOKEN_RE.findall(text.lower())

    def embed_text(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float32)
        toks = self.tokenize(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for feat in feats:
            idx, sign = self._feature(feat)
            vec[idx] += sign
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec /= norm
        return vec

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        """Batched embedding → (n, dim) float32, rows L2-normalized
        (zero rows for empty/token-free texts)."""
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i] = self.embed_text(t)
        return out

    def embed_term(self, name: str, synonyms: list[str]) -> np.ndarray:
        """Term vector = normalized mean of unit surface vectors
        (name + synonyms).  Keeps cosine(term, any exact surface) high."""
        surfaces = [name] + [s for s in synonyms if s]
        mat = self.embed_texts(surfaces)
        vec = mat.mean(axis=0)
        norm = float(np.linalg.norm(vec))
        if norm > 0:
            vec /= norm
        return vec.astype(np.float32)


def classify_retryable(status_code: int | None, error_text: str = "") -> bool:
    """Retryable-error classifier, reference parity
    (``app/openai_client.py:120-160``): 429/timeout/connection/5xx →
    retry; 4xx/auth → no retry; unknown → retry."""
    text = error_text.lower()
    if status_code is not None:
        if status_code == 429 or status_code >= 500:
            return True
        if 400 <= status_code < 500:
            return False
    if any(w in text for w in ("timeout", "timed out", "connection", "rate limit")):
        return True
    if any(w in text for w in ("unauthorized", "invalid api key", "authentication")):
        return False
    return True


class RemoteEmbedderError(Exception):
    """HTTP failure from a remote embedding endpoint; carries
    ``status_code`` for :func:`classify_retryable`."""

    def __init__(self, message: str, status_code: int | None = None):
        super().__init__(message)
        self.status_code = status_code


class RemoteEmbedder:
    """Concrete OpenAI-compatible ``/v1/embeddings`` REST client
    (reference parity: ``/root/reference/app/openai_client.py:40-118``
    lazy client + batched ``embeddings.create`` ``:224-301``), stdlib
    ``urllib`` only — no SDK dependency.

    Construct once per ACTOR (``__init__`` of a map_batches class) and
    wrap in :class:`RetryingEmbedder` for the retry/backoff contract;
    errors surface with ``status_code`` so the shared
    :func:`classify_retryable` decides retryability.  Requests above
    ``max_batch`` texts are split client-side (the reference caps
    batches the same way) and results are re-ordered by the response's
    ``index`` field, never by arrival order.
    """

    def __init__(self, endpoint: str, *, model: str,
                 api_key: str | None = None, max_batch: int = 256,
                 timeout: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.max_batch = max_batch
        self.timeout = timeout
        self.model_name = f"remote:{model}"

    def _post(self, texts: list[str]) -> np.ndarray:
        import json
        import urllib.error
        import urllib.request

        body = json.dumps({"model": self.model, "input": texts}).encode()
        req = urllib.request.Request(
            f"{self.endpoint}/v1/embeddings", data=body, method="POST",
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
            raise RemoteEmbedderError(
                f"embeddings endpoint returned {exc.code}: {detail}",
                status_code=exc.code) from exc
        except urllib.error.URLError as exc:
            raise RemoteEmbedderError(
                f"embeddings endpoint unreachable: {exc.reason}") from exc
        rows = sorted(payload["data"], key=lambda d: d["index"])
        if len(rows) != len(texts):
            raise RemoteEmbedderError(
                f"endpoint returned {len(rows)} embeddings for "
                f"{len(texts)} inputs")
        return np.asarray([r["embedding"] for r in rows], dtype=np.float32)

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, 0), dtype=np.float32)
        chunks = [self._post(list(texts[i:i + self.max_batch]))
                  for i in range(0, len(texts), self.max_batch)]
        return chunks[0] if len(chunks) == 1 else np.vstack(chunks)


class RetryingEmbedder:
    """Wraps a pluggable (possibly remote) embedder with the reference's
    retry contract: per-call retry ≤ max_retries with exponential backoff
    capped at 60 s (``app/ontology_manager.py:423-456``)."""

    def __init__(self, inner, max_retries: int = 3, base_delay: float = 0.1,
                 sleep=time.sleep):
        self.inner = inner
        self.max_retries = max_retries
        self.base_delay = base_delay
        self._sleep = sleep
        self.retry_count = 0
        self.failed_count = 0

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        attempt = 0
        while True:
            try:
                return self.inner.embed_texts(texts)
            except Exception as exc:  # noqa: BLE001 — classifier decides
                status = getattr(exc, "status_code", None)
                if attempt >= self.max_retries or not classify_retryable(status, str(exc)):
                    self.failed_count += len(texts)
                    raise
                self._sleep(min(self.base_delay * (2 ** attempt), 60.0))
                attempt += 1
                self.retry_count += 1
