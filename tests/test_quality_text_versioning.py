"""Quality-filter, text-builder and versioning contracts
(reference parity: app/do_embeddings.py:35-145, app/ontology_manager.py:109-144,
app/ontology_version_manager.py:31-183)."""

import json

import pyarrow as pa

from biocurator_mapper_ray.config import DEFAULT_EMBEDDINGS_CONFIG
from biocurator_mapper_ray.ontology import (
    build_searchable_text,
    compose_weighted_text,
    compute_version_hash,
    extract_version_info,
    filter_terms_batch,
    meets_quality_filters,
    needs_update,
    parse_nodes_batch,
    parse_ontology_json,
)
from biocurator_mapper_ray.ontology.fixtures import (
    make_document,
    make_edge_case_nodes,
    make_performance_nodes,
)
from biocurator_mapper_ray.ontology.versioning import snapshot_hash

CFG = DEFAULT_EMBEDDINGS_CONFIG


def term(**kw):
    base = {
        "term_id": "DOID:1",
        "name": "test disease",
        "definition": "A long enough definition for the filter.",
        "exact_synonyms": [],
        "narrow_synonyms": [],
        "broad_synonyms": [],
        "related_synonyms": [],
        "all_synonyms": [],
        "cross_references": [],
        "namespace": "",
        "searchable_text": "",
        "is_obsolete": False,
    }
    base.update(kw)
    return base


class TestQualityFilters:
    def test_short_definition_rejected(self):
        assert not meets_quality_filters(term(definition="short"), CFG)

    def test_min_length_boundary(self):
        # min_definition_length=10: len>=10 passes
        assert meets_quality_filters(term(definition="x" * 10), CFG)
        assert not meets_quality_filters(term(definition="x" * 9), CFG)

    def test_exclude_pattern_in_name(self):
        assert not meets_quality_filters(term(name="an OBSOLETE thing"), CFG)

    def test_exclude_pattern_in_definition(self):
        assert not meets_quality_filters(
            term(definition="This term is deprecated but long enough."), CFG
        )

    def test_missing_definition_rejected_when_required(self):
        assert not meets_quality_filters(term(definition=""), CFG)

    def test_obsolete_excluded(self):
        assert not meets_quality_filters(term(is_obsolete=True), CFG)

    def test_good_term_passes(self):
        assert meets_quality_filters(term(), CFG)

    def test_batch_matches_scalar(self):
        docs = make_document(make_edge_case_nodes())
        parsed = parse_ontology_json(docs)
        batch = parse_nodes_batch(
            pa.table({"node_json": [json.dumps(n) for n in make_edge_case_nodes()]})
        )
        kept = filter_terms_batch(batch, CFG)
        expected_ids = [t["term_id"] for t in parsed if meets_quality_filters(t, CFG)]
        assert kept.column("term_id").to_pylist() == expected_ids


class TestSearchableTextBuilders:
    def test_manager_path_pipe_join_excludes_related(self):
        t = term(
            name="N",
            definition="D" * 20,
            exact_synonyms=["E"],
            narrow_synonyms=["Na"],
            broad_synonyms=["B"],
            related_synonyms=["R"],
        )
        text = build_searchable_text(t, CFG)
        assert text == "N | " + "D" * 20 + " | E | Na | B"
        assert "R" not in text.split(" | ")

    def test_manager_path_lowercase_and_punct(self):
        cfg = json.loads(json.dumps(CFG))
        cfg["preprocessing"]["lowercase"] = True
        cfg["preprocessing"]["remove_punctuation"] = True
        t = term(name="Hello, World!", definition="Def. One")
        assert build_searchable_text(t, cfg) == "hello world | def one"

    def test_weighted_composition_sections(self):
        t = term(
            name="angio thing",
            definition="A vascular condition definition.",
            exact_synonyms=["vessel thing"],
            related_synonyms=["rel thing"],
            cross_references=["MESH:D1", "NOPE:2", "OMIM:3"],
        )
        cfg = json.loads(json.dumps(CFG))
        cfg["do_specific"]["text_composition"]["context_fields"] = [
            "definition", "synonyms", "xrefs",
        ]
        text = compose_weighted_text(t, cfg)
        assert text.startswith("Name: angio thing | Definition: A vascular condition definition.")
        assert "Synonyms: exact_synonym: vessel thing, related_synonym: rel thing" in text
        # xrefs filtered to prioritized sources only
        assert "References: MESH:D1, OMIM:3" in text
        assert "NOPE:2" not in text

    def test_weighted_composition_truncation(self):
        t = term(name="n", definition="d" * 10000)
        text = compose_weighted_text(t, CFG)
        assert len(text) == 8000
        assert text.endswith("...")

    def test_zero_weight_gates_field(self):
        cfg = json.loads(json.dumps(CFG))
        cfg["vectorize_fields"]["definition"] = 0
        t = term(name="n", definition="a definitely long definition")
        assert "Definition:" not in compose_weighted_text(t, cfg)


class TestVersioning:
    def test_extract_version_info(self):
        doc = make_document(make_performance_nodes(5), version_date="2026-02-02")
        info = extract_version_info(doc)
        assert info["version_date"] == "2026-02-02"
        assert info["format_version"] == "1.2"
        assert info["nodes_count"] == 5
        assert info["graph_id"].endswith(".owl")

    def test_hash_16_hex_and_stable(self):
        doc = make_document(make_performance_nodes(5))
        h1, h2 = snapshot_hash(doc), snapshot_hash(doc)
        assert h1 == h2 and len(h1) == 16
        int(h1, 16)

    def test_hash_changes_with_node_count(self):
        a = snapshot_hash(make_document(make_performance_nodes(5)))
        b = snapshot_hash(make_document(make_performance_nodes(6)))
        assert a != b

    def test_needs_update_semantics(self):
        assert needs_update(None, "abc")
        assert needs_update("old", "abc")
        assert not needs_update("abc", "abc")


class TestSnapshotStaging:
    def test_stage_and_history(self, tmp_path):
        import json as _json
        import os

        from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
        from biocurator_mapper_ray.sources.ontology_json import (
            latest_available, load_document, stage_snapshot,
        )

        src = tmp_path / "doid.json"
        doc = make_document(make_performance_nodes(5), version_date="2026-05-05")
        src.write_text(_json.dumps(doc))
        store = str(tmp_path / "store")

        staged, snap = stage_snapshot(str(src), store)
        assert os.path.exists(staged) and staged.endswith(f"{snap}.json")
        assert load_document(staged)["graphs"][0]["nodes"][0]["lbl"]

        # restage is a no-op (same identity)
        m1 = os.path.getmtime(staged)
        staged2, snap2 = stage_snapshot(str(src), store)
        assert (staged2, snap2) == (staged, snap)
        assert os.path.getmtime(staged) == m1

        latest = latest_available(store)
        assert latest and latest["snapshot_hash"] == snap
        assert latest["status"] == "available"

        # new version -> new snapshot staged alongside
        doc2 = make_document(make_performance_nodes(5), version_date="2026-06-06")
        src2 = tmp_path / "doid2.json"
        src2.write_text(_json.dumps(doc2))
        _, snap3 = stage_snapshot(str(src2), store)
        assert snap3 != snap
        assert latest_available(store)["snapshot_hash"] == snap3

    def test_latest_skips_missing_file(self, tmp_path):
        import json as _json
        import os

        from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
        from biocurator_mapper_ray.sources.ontology_json import latest_available, stage_snapshot

        store = str(tmp_path / "store")
        for date in ["2026-01-01", "2026-02-02"]:
            src = tmp_path / f"o{date}.json"
            src.write_text(_json.dumps(make_document(make_performance_nodes(3), version_date=date)))
            staged, snap = stage_snapshot(str(src), store)
        os.unlink(staged)  # newest file vanishes
        latest = latest_available(store)
        assert latest is not None and latest["snapshot_hash"] != snap


class TestStreamingFetcher:
    """S1/S2 fetch surface: chunked streaming with progress %, byte
    counters and cooperative cancel (reference app/main.py:172-229),
    exercised over file:// URLs and bare paths (no network here; the
    chunk loop is scheme-independent)."""

    def _write_doc(self, tmp_path, n=40, date="2026-03-03"):
        import json as _json

        from biocurator_mapper_ray.ontology.fixtures import (
            make_document, make_performance_nodes,
        )

        src = tmp_path / "src.json"
        src.write_text(_json.dumps(make_document(make_performance_nodes(n),
                                                 version_date=date)))
        return src

    def test_stream_fetch_progress_sequence(self, tmp_path):
        from biocurator_mapper_ray.sources.fetcher import (
            ProgressRecorder, stream_fetch,
        )

        src = self._write_doc(tmp_path)
        dest = tmp_path / "out.json"
        rec = ProgressRecorder()
        n = stream_fetch(f"file://{src}", str(dest), progress=rec,
                         chunk_size=1024)
        assert n == src.stat().st_size == dest.stat().st_size
        assert dest.read_bytes() == src.read_bytes()
        assert rec.updates[0]["status"] == "downloading"
        assert rec.latest["status"] == "completed" and rec.latest["percentage"] == 100
        mids = [u for u in rec.updates if u["status"] == "downloading"][1:]
        assert len(mids) >= 2  # multiple chunks reported
        bytes_seq = [u["download_bytes"] for u in mids]
        assert bytes_seq == sorted(bytes_seq)
        assert mids[-1]["download_percentage"] == 100
        assert all(u["download_total_bytes"] == n for u in mids)

    def test_stream_fetch_cancel_removes_partial(self, tmp_path):
        import pytest

        from biocurator_mapper_ray.sources.fetcher import (
            FetchCancelled, ProgressRecorder, stream_fetch,
        )

        src = self._write_doc(tmp_path, n=80)
        dest = tmp_path / "out.json"
        rec = ProgressRecorder()
        calls = {"n": 0}

        def cancel_after_two():
            calls["n"] += 1
            return calls["n"] > 2

        with pytest.raises(FetchCancelled):
            stream_fetch(str(src), str(dest), progress=rec,
                         cancel=cancel_after_two, chunk_size=512)
        assert not dest.exists()
        assert rec.latest["status"] == "cancelled"

    def test_fetch_and_stage_integrates_with_store(self, tmp_path):
        import os

        from biocurator_mapper_ray.sources.fetcher import fetch_and_stage
        from biocurator_mapper_ray.sources.ontology_json import latest_available

        src = self._write_doc(tmp_path, date="2026-04-04")
        store = str(tmp_path / "store")
        staged, snap = fetch_and_stage(f"file://{src}", store)
        assert os.path.exists(staged) and staged.endswith(f"{snap}.json")
        assert latest_available(store)["snapshot_hash"] == snap
        # no temp droppings left behind
        leftovers = [f for f in os.listdir(store) if f.startswith("_fetch_")]
        assert leftovers == []


class TestExplainMatch:
    def test_exact_and_vector_explanations(self):
        from biocurator_mapper_ray.stages.score import RuleScorer

        scorer = RuleScorer()
        term = {
            "id": "DOID:1", "name": "angiosarcoma",
            "definition": "A malignant vascular tumor.",
            "exact_synonyms": ["hemangiosarcoma"], "all_synonyms": ["hemangiosarcoma"],
            "similarity_certainty": 0.91,
        }
        exact = scorer.explain_match("angiosarcoma", term)
        assert "DOID:1" in exact and "exactly matches" in exact
        assert "malignant vascular tumor" in exact
        assert "hemangiosarcoma" in exact
        syn = scorer.explain_match("hemangiosarcoma", term)
        assert "exact synonym" in syn
        vec = scorer.explain_match("vascular cancer of the scalp", term)
        assert "vector similarity" in vec.lower() and "0.910" in vec
        # degrades instead of raising (reference fallback sentence)
        broken = scorer.explain_match("x", {"no": "fields"})
        assert "explanation generation failed" in broken


class TestConfigReload:
    def test_reload_swaps_surfaces_in_place(self, tmp_path):
        from biocurator_mapper_ray.config import EngineConfig

        p = tmp_path / "cfg.yaml"
        p.write_text(
            "embeddings:\n  model:\n    name: hashing-v1\n"
            "ontology:\n  ontologies:\n    GO:\n      enabled: true\n"
        )
        cfg = EngineConfig.from_yaml(str(p))
        assert cfg.embeddings["model"]["name"] == "hashing-v1"
        p.write_text(
            "embeddings:\n  model:\n    name: hashing-v2\n"
            "ontology:\n  ontologies:\n    HPO:\n      enabled: true\n"
        )
        out = cfg.reload()
        assert out["status"] == "success"
        assert out["embedding_model"] == "hashing-v2"
        assert "HPO" in out["ontologies"]
        assert cfg.embeddings["model"]["name"] == "hashing-v2"

    def test_reload_without_source_errors(self):
        from biocurator_mapper_ray.config import EngineConfig

        out = EngineConfig().reload()
        assert out["status"] == "error"

    def test_reload_bad_yaml_reports_error(self, tmp_path):
        from biocurator_mapper_ray.config import EngineConfig

        p = tmp_path / "cfg.yaml"
        p.write_text("embeddings:\n  model:\n    name: ok\n")
        cfg = EngineConfig.from_yaml(str(p))
        p.write_text("embeddings: [unclosed\n  bad: {")
        out = cfg.reload()
        assert out["status"] == "error"
        # old values stay active on a failed reload
        assert cfg.embeddings["model"]["name"] == "ok"


class TestSentenceStats:
    def test_counts_terminator_runs_and_words(self, ray_session):
        import pyarrow as pa

        from biocurator_mapper_ray.ops.textstats import sentence_stats

        batch = pa.table({
            "doc_id": [0, 1, 2, 3],
            "text": ["Hi there. Two!? Three... tail no terminator",
                     "", "   ", "One sentence."],
        })
        out = sentence_stats(batch)
        assert out.column("n_sentences").to_pylist() == [3, 0, 0, 1]
        assert out.column("n_words").to_pylist() == [7, 0, 0, 2]
        assert out.column("n_chars").to_pylist() == [43, 0, 3, 13]


class TestInvertedIndex:
    def test_matches_brute_force_posting_lists(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import inverted_index

        docs = ["the cat sat", "the dog", "CAT naps", "", "the the the"]
        ds = rd.from_arrow(pa.table({
            "doc_id": [10, 2, 7, 3, 1], "text": docs})).repartition(3)
        got = inverted_index(ds).to_pandas().set_index("token")
        expect = {}
        for i, t in zip([10, 2, 7, 3, 1], docs):
            for tok in set(t.lower().split()):
                expect.setdefault(tok, []).append(i)
        for tok, ids in expect.items():
            ids = sorted(ids)
            assert got.loc[tok, "n_docs"] == len(ids)
            assert got.loc[tok, "doc_ids"] == ",".join(map(str, ids))
        assert len(got) == len(expect)
        # numeric order, not lexicographic: 2 < 7 < 10
        assert got.loc["the", "doc_ids"] == "1,2,10"

    def test_min_docs_filters(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import inverted_index

        ds = rd.from_arrow(pa.table({
            "doc_id": [1, 2], "text": ["shared only1", "shared only2"]}))
        got = inverted_index(ds, min_docs=2).to_pandas()
        assert got["token"].tolist() == ["shared"]
