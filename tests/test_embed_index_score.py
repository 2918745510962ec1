"""Embedder, hashing, vector index and selection-contract tests."""

import json

import numpy as np
import pyarrow as pa
import pytest

from biocurator_mapper_ray.functions.embedder import (
    HashingEmbedder,
    RetryingEmbedder,
    classify_retryable,
)
from biocurator_mapper_ray.functions.hashing import hash64_column, stable_hash64
from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
from biocurator_mapper_ray.ontology.parser import parse_ontology_json, TERM_SCHEMA
from biocurator_mapper_ray.stages.score import RuleScorer, parse_llm_response
from biocurator_mapper_ray.state.index import VectorIndex


def terms_table(n=50):
    parsed = parse_ontology_json(make_document(make_performance_nodes(n)))
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


class TestHashing:
    def test_stable_across_calls(self):
        assert stable_hash64("hello") == stable_hash64("hello")
        assert stable_hash64("hello", 1) != stable_hash64("hello", 2)

    def test_column_hash_deterministic_and_distinct(self):
        arr = pa.chunked_array([["a", "b", "", "a", "longer string value here"]])
        h1, h2 = hash64_column(arr), hash64_column(arr)
        assert (h1 == h2).all()
        assert h1[0] == h1[3]
        assert h1[0] != h1[1]
        assert h1[2] != h1[0]

    def test_column_hash_long_strings(self):
        arr = pa.chunked_array([["x" * 10000, "x" * 10000 + "y", "x" * 9999]])
        h = hash64_column(arr)
        assert len(set(h.tolist())) == 3

    def test_column_hash_seed_changes(self):
        arr = pa.chunked_array([["a", "b"]])
        assert hash64_column(arr, 0).tolist() != hash64_column(arr, 7).tolist()

    def test_sliced_array(self):
        arr = pa.array(["aa", "bb", "cc", "dd"])
        full = hash64_column(pa.chunked_array([arr]))
        sliced = hash64_column(pa.chunked_array([arr.slice(1, 2)]))
        assert sliced.tolist() == full[1:3].tolist()


class TestEmbedder:
    def test_deterministic(self):
        e1, e2 = HashingEmbedder(), HashingEmbedder()
        v1, v2 = e1.embed_text("hello world"), e2.embed_text("hello world")
        assert np.allclose(v1, v2)

    def test_unit_norm(self):
        v = HashingEmbedder().embed_text("some sample text")
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_empty_text_zero_vector(self):
        v = HashingEmbedder().embed_text("")
        assert np.linalg.norm(v) == 0.0

    def test_similar_texts_closer(self):
        e = HashingEmbedder()
        a = e.embed_text("chronic hepatic fibrosis")
        b = e.embed_text("chronic hepatic fibrosis disorder")
        c = e.embed_text("completely unrelated words about weather")
        assert a @ b > a @ c

    def test_exact_surface_high_cos_to_term(self):
        e = HashingEmbedder()
        name = "chronic hepatic fibrosis"
        syns = ["hepatic fibrosis disorder", "chronic fibrosis of hepatic tissue"]
        term_vec = e.embed_term(name, syns)
        assert e.embed_text(name) @ term_vec > 0.55

    def test_batch_matches_single(self):
        e = HashingEmbedder()
        texts = ["one two", "three four five", ""]
        mat = e.embed_texts(texts)
        for i, t in enumerate(texts):
            assert np.allclose(mat[i], e.embed_text(t))


class TestRetryContract:
    def test_classifier(self):
        # reference parity: app/openai_client.py:120-160
        assert classify_retryable(429)
        assert classify_retryable(500)
        assert classify_retryable(503)
        assert not classify_retryable(400)
        assert not classify_retryable(401)
        assert classify_retryable(None, "Connection reset")
        assert classify_retryable(None, "request timed out")
        assert not classify_retryable(None, "invalid api key")
        assert classify_retryable(None, "some unknown error")

    def test_retry_then_success(self):
        calls = {"n": 0}

        class Flaky:
            def embed_texts(self, texts):
                calls["n"] += 1
                if calls["n"] < 3:
                    raise RuntimeError("rate limit hit")
                return np.ones((len(texts), 4), dtype=np.float32)

        slept = []
        r = RetryingEmbedder(Flaky(), max_retries=3, base_delay=0.1, sleep=slept.append)
        out = r.embed_texts(["a", "b"])
        assert out.shape == (2, 4)
        assert r.retry_count == 2
        # exponential: 0.1, 0.2
        assert slept == [0.1, 0.2]

    def test_non_retryable_raises_immediately(self):
        class Dead:
            def embed_texts(self, texts):
                raise RuntimeError("invalid api key")

        r = RetryingEmbedder(Dead(), max_retries=3, sleep=lambda s: None)
        with pytest.raises(RuntimeError):
            r.embed_texts(["a"])

    def test_backoff_capped_at_60(self):
        class AlwaysFail:
            def embed_texts(self, texts):
                raise RuntimeError("timeout")

        slept = []
        r = RetryingEmbedder(AlwaysFail(), max_retries=12, base_delay=1.0, sleep=slept.append)
        with pytest.raises(RuntimeError):
            r.embed_texts(["a"])
        assert max(slept) == 60.0


class TestVectorIndex:
    def test_topk_exact_surface_first(self):
        tbl = terms_table(50)
        idx = VectorIndex.from_terms_table(tbl)
        e = HashingEmbedder()
        names = tbl.column("name").to_pylist()
        hits = 0
        for i in [0, 7, 23, 41]:
            q = e.embed_text(names[i])
            top_idx, top_cos = idx.topk(q, k=5)
            if idx.term_ids[top_idx[0, 0]] == tbl.column("term_id")[i].as_py():
                hits += 1
            assert np.all(np.diff(top_cos[0]) <= 1e-6)  # descending
        assert hits == 4

    def test_topk_matches_bruteforce(self):
        tbl = terms_table(40)
        idx = VectorIndex.from_terms_table(tbl)
        rng = np.random.default_rng(0)
        q = rng.normal(size=(3, idx.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        top_idx, top_cos = idx.topk(q, k=7)
        full = q @ idx.matrix.T
        for r in range(3):
            best = np.lexsort((np.arange(full.shape[1]), -full[r]))[:7]
            assert top_idx[r].tolist() == best.tolist()

    def test_namespace_filter(self):
        tbl = terms_table(10)
        idx = VectorIndex.from_terms_table(tbl)
        q = np.ones((1, idx.dim), dtype=np.float32)
        i1, _ = idx.topk(q, k=5, namespace_filter="disease_ontology")
        assert i1.shape == (1, 5)
        i2, _ = idx.topk(q, k=5, namespace_filter="no_such_namespace")
        assert i2.shape == (1, 0)

    def test_roundtrip_via_vectors_table(self):
        tbl = terms_table(12)
        idx = VectorIndex.from_terms_table(tbl, snapshot_hash="abc")
        back = VectorIndex.from_vectors_table(idx.to_vectors_table(), "abc")
        assert np.allclose(idx.matrix, back.matrix)
        assert list(idx.term_ids) == list(back.term_ids)


def cand(id, name, cert, syns=()):
    return {
        "id": id,
        "name": name,
        "definition": f"def of {name}",
        "exact_synonyms": list(syns),
        "narrow_synonyms": [],
        "broad_synonyms": [],
        "all_synonyms": list(syns),
        "namespace": "disease_ontology",
        "similarity_certainty": cert,
    }


class TestSelectionContract:
    # reference parity: app/llm_matcher.py:77-138
    def test_empty_candidates_error(self):
        assert RuleScorer().select_best_match("x", []) == {"error": "No candidates provided"}

    def test_exact_surface_wins_over_higher_certainty(self):
        cands = [cand("DOID:2", "other term", 0.99), cand("DOID:1", "my term", 0.7)]
        res = RuleScorer().select_best_match("my term", cands)
        assert res["id"] == "DOID:1"
        assert res["confidence"] >= 0.9

    def test_winner_joined_back(self):
        cands = [cand("DOID:1", "my term", 0.8, syns=["alias"])]
        res = RuleScorer().select_best_match("my term", cands)
        assert res["definition"] == "def of my term"
        assert res["exact_synonyms"] == ["alias"]
        assert res["namespace"] == "disease_ontology"
        assert res["similarity_certainty"] == 0.8

    def test_tie_break_min_id(self):
        cands = [cand("DOID:9", "same", 0.8), cand("DOID:3", "same", 0.8)]
        res = RuleScorer().select_best_match("same", cands)
        assert res["id"] == "DOID:3"

    def test_synonym_exact_match_counts(self):
        cands = [cand("DOID:1", "name one", 0.6, syns=["the alias"]),
                 cand("DOID:2", "name two", 0.9)]
        res = RuleScorer().select_best_match("THE  alias", cands)
        assert res["id"] == "DOID:1"

    def test_alternatives_minus_winner(self):
        s = RuleScorer()
        cands = [cand("DOID:1", "a", 0.9), cand("DOID:2", "b", 0.5)]
        res = s.select_best_match("a", cands)
        alts = s.alternatives(res, cands)
        assert [c["id"] for c in alts] == ["DOID:2"]


class TestLLMResponseParser:
    # reference parity: app/llm_matcher.py:94-114
    CANDS = [cand("GO:1", "a", 0.5)]

    def ok(self):
        return {"id": "GO:1", "name": "a", "confidence": 0.9, "reason": "r"}

    def test_plain_json(self):
        assert parse_llm_response(json.dumps(self.ok()), self.CANDS)["id"] == "GO:1"

    def test_markdown_fences_stripped(self):
        raw = "```json\n" + json.dumps(self.ok()) + "\n```"
        assert parse_llm_response(raw, self.CANDS)["id"] == "GO:1"

    def test_missing_keys_error(self):
        raw = json.dumps({"id": "GO:1", "name": "a"})
        assert "missing required keys" in parse_llm_response(raw, self.CANDS)["error"]

    def test_invalid_id_error(self):
        bad = dict(self.ok(), id="GO:999")
        assert "invalid ID" in parse_llm_response(json.dumps(bad), self.CANDS)["error"]

    def test_garbage_json_error(self):
        assert "JSON decode error" in parse_llm_response("not json {", self.CANDS)["error"]


class TestHardNegatives:
    def test_same_label_and_self_excluded(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import hard_negatives

        # anchor [1,0]; same-label near-identical vec must be skipped,
        # different-label vectors rank by cosine
        vecs = {
            0: ([1.0, 0.0], "a"),
            1: ([0.99, 0.14], "a"),   # same label: excluded
            2: ([0.9, 0.44], "b"),    # best legal negative
            3: ([0.0, 1.0], "b"),
            4: ([-1.0, 0.0], "c"),
        }
        df = pd.DataFrame({
            "vec_id": list(vecs),
            "embedding": [v[0] for v in vecs.values()],
            "label": [v[1] for v in vecs.values()],
        })
        got = hard_negatives(
            rd.from_pandas(df).repartition(2),
            queries=np.array([vecs[0][0]]), query_labels=np.array(["a"]),
            query_ids=np.array([0]), k=3).to_pandas() \
            .sort_values("rank")
        assert got["vec_id"].tolist() == [2, 3, 4]
        assert 1 not in set(got["vec_id"])
        assert 0 not in set(got["vec_id"])

    def test_all_same_label_yields_empty(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import hard_negatives

        df = pd.DataFrame({
            "vec_id": [0, 1],
            "embedding": [[1.0, 0.0], [0.5, 0.5]],
            "label": ["a", "a"],
        })
        got = hard_negatives(
            rd.from_pandas(df), queries=np.array([[1.0, 0.0]]),
            query_labels=np.array(["a"]), query_ids=np.array([0]),
            k=2).to_pandas()
        assert len(got) == 0
