"""Mention detection, link stage and canonicalization unit tests
(no Ray needed — stages are plain callables over Arrow batches)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
from biocurator_mapper_ray.ontology.parser import TERM_SCHEMA, parse_ontology_json
from biocurator_mapper_ray.stages.canonicalize import (
    canonicalize_group,
    combine_links_batch,
)
from biocurator_mapper_ray.stages.link import LinkStage, RetrieverStage
from biocurator_mapper_ray.stages.mention import (
    MentionDetector,
    build_surface_vocab,
    compile_surface_pattern,
)


def terms_table(n=50):
    parsed = parse_ontology_json(make_document(make_performance_nodes(n)))
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


def custom_terms(rows):
    base = {
        "definition": "a definition that is long enough",
        "exact_synonyms": [],
        "narrow_synonyms": [],
        "broad_synonyms": [],
        "related_synonyms": [],
        "cross_references": [],
        "namespace": "",
        "searchable_text": "",
        "is_obsolete": False,
    }
    full = []
    for r in rows:
        d = dict(base)
        d.update(r)
        d.setdefault("all_synonyms", d["exact_synonyms"])
        d["searchable_text"] = d["name"]
        full.append(d)
    cols = {f.name: [t[f.name] for t in full] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


def turns_batch(rows):
    return pa.Table.from_pydict(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.asarray([r[1] for r in rows], dtype=np.int32),
            "role": ["user"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": [""] * len(rows),
            "ts": np.asarray([0] * len(rows), dtype="datetime64[us]"),
        }
    )


class TestMentionDetection:
    def test_finds_planted_name_with_offsets(self):
        tbl = terms_table(20)
        name = tbl.column("name")[0].as_py()
        det = MentionDetector(tbl)
        text = f"we observed {name} in the sample"
        out = det(turns_batch([("c1", 0, text)]))
        assert out.num_rows == 1
        row = out.to_pylist()[0]
        assert row["mention"] == name.lower()
        assert text[row["span_start"]:row["span_end"]].lower() == name.lower()

    def test_case_insensitive_original_text_untouched(self):
        tbl = terms_table(5)
        name = tbl.column("name")[0].as_py()
        det = MentionDetector(tbl)
        text = f"DIAGNOSIS: {name.upper()}!"
        out = det(turns_batch([("c1", 0, text)]))
        assert out.num_rows == 1

    def test_no_match_inside_words(self):
        tbl = custom_terms([{"term_id": "X:1", "name": "flu"}])
        det = MentionDetector(tbl)
        out = det(turns_batch([("c1", 0, "influenza fluids reflux"), ("c1", 1, "a flu case")]))
        assert out.num_rows == 1
        assert out.to_pylist()[0]["turn_idx"] == 1

    def test_longest_surface_wins_on_overlap(self):
        tbl = custom_terms(
            [
                {"term_id": "X:1", "name": "chronic hepatic fibrosis",
                 "exact_synonyms": ["chronic hepatic fibrosis disorder"]},
            ]
        )
        det = MentionDetector(tbl)
        out = det(turns_batch([("c1", 0, "has chronic hepatic fibrosis disorder today")]))
        assert out.num_rows == 1
        assert out.to_pylist()[0]["mention"] == "chronic hepatic fibrosis disorder"

    def test_multiple_and_zero_mentions(self):
        tbl = terms_table(20)
        n0, n1 = tbl.column("name")[0].as_py(), tbl.column("name")[1].as_py()
        det = MentionDetector(tbl)
        out = det(turns_batch([
            ("c1", 0, f"{n0} then later {n1}"),
            ("c1", 1, "nothing relevant here"),
            ("c1", 2, ""),
        ]))
        assert out.num_rows == 2

    def test_empty_vocab(self):
        tbl = custom_terms([])
        det = MentionDetector(tbl)
        out = det(turns_batch([("c1", 0, "anything")]))
        assert out.num_rows == 0

    def test_vocab_maps_all_surfaces(self):
        tbl = terms_table(10)
        vocab = build_surface_vocab(tbl)
        name0 = tbl.column("name")[0].as_py().lower()
        assert vocab[name0] == [tbl.column("term_id")[0].as_py()]
        # each term contributes name + 4 synonyms
        assert len(vocab) == 50

    def test_regex_special_chars_escaped(self):
        tbl = custom_terms([{"term_id": "X:1", "name": "type (a) syndrome"}])
        det = MentionDetector(tbl)
        out = det(turns_batch([("c1", 0, "diagnosed type (a) syndrome early")]))
        assert out.num_rows == 1


def mentions_batch(rows):
    return pa.Table.from_pydict(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.asarray([r[1] for r in rows], dtype=np.int32),
            "mention": [r[2] for r in rows],
            "span_start": np.asarray([0] * len(rows), dtype=np.int32),
            "span_end": np.asarray([len(r[2]) for r in rows], dtype=np.int32),
        }
    )


class TestLinkStage:
    def test_exact_mention_links_to_its_term(self):
        tbl = terms_table(30)
        stage = LinkStage(tbl)
        name3 = tbl.column("name")[3].as_py().lower()
        out = stage(mentions_batch([("c1", 0, name3)])).to_pylist()[0]
        assert out["term_id"] == tbl.column("term_id")[3].as_py()
        assert out["accepted"] is True
        assert out["confidence"] >= 0.9
        assert out["error"] == ""

    def test_synonym_links_to_owner(self):
        tbl = terms_table(30)
        stage = LinkStage(tbl)
        syn = tbl.column("exact_synonyms")[5].as_py()[0].lower()
        out = stage(mentions_batch([("c1", 0, syn)])).to_pylist()[0]
        assert out["term_id"] == tbl.column("term_id")[5].as_py()

    def test_memoization_consistency(self):
        tbl = terms_table(10)
        stage = LinkStage(tbl)
        name = tbl.column("name")[0].as_py().lower()
        a = stage(mentions_batch([("c1", 0, name)])).to_pylist()[0]
        b = stage(mentions_batch([("c2", 7, name)])).to_pylist()[0]
        assert a["term_id"] == b["term_id"] and a["confidence"] == b["confidence"]

    def test_retriever_rank_and_metadata(self):
        tbl = terms_table(30)
        stage = RetrieverStage(tbl, k=5)
        name = tbl.column("name")[2].as_py().lower()
        out = stage(mentions_batch([("c1", 0, name)]))
        assert out.num_rows == 5
        rows = out.to_pylist()
        assert [r["rank"] for r in rows] == [0, 1, 2, 3, 4]
        assert rows[0]["term_id"] == tbl.column("term_id")[2].as_py()
        for r in rows:
            assert 0.0 <= r["similarity_certainty"] <= 1.0
            assert abs((1 - r["similarity_distance"]) - (2 * r["similarity_certainty"] - 1)) < 1e-5

    def test_retriever_namespace_filter(self):
        """Reference parity (app/ontology_searcher.py:95-151): both the
        exact-owner path and the vector top-k honor the namespace mask."""
        import pyarrow as pa

        tbl = terms_table(30)
        ns = pa.array(
            ["ns_even" if i % 2 == 0 else "ns_odd" for i in range(len(tbl))],
            pa.string(),
        )
        tbl = tbl.set_column(tbl.schema.get_field_index("namespace"), "namespace", ns)
        allowed = {
            str(t): n
            for t, n in zip(tbl.column("term_id").to_pylist(), ns.to_pylist())
        }
        # mention = exact surface of an ODD (filtered-out) term: the
        # exact-owner path must NOT resurrect it
        odd_name = tbl.column("name")[3].as_py().lower()
        stage = RetrieverStage(tbl, k=5, namespace_filter="ns_even")
        out = stage(mentions_batch([("c1", 0, odd_name)])).to_pylist()
        assert out, "filtered retrieval returned no candidates"
        for r in out:
            assert allowed[r["term_id"]] == "ns_even"
        # and an even term's surface still retrieves itself at rank 0
        even_name = tbl.column("name")[2].as_py().lower()
        out2 = stage(mentions_batch([("c1", 0, even_name)])).to_pylist()
        assert out2[0]["term_id"] == tbl.column("term_id")[2].as_py()

    def test_ambiguous_surface_deterministic(self):
        tbl = custom_terms(
            [
                {"term_id": "X:9", "name": "unique nine", "exact_synonyms": ["shared surface"]},
                {"term_id": "X:2", "name": "unique two", "exact_synonyms": ["shared surface"]},
            ]
        )
        stage = LinkStage(tbl)
        out = stage(mentions_batch([("c1", 0, "shared surface")])).to_pylist()[0]
        out2 = LinkStage(tbl)(mentions_batch([("c9", 3, "shared surface")])).to_pylist()[0]
        assert out["term_id"] == out2["term_id"]  # stable across actors


def links_df_to_batch(rows):
    """rows: (conv_id, turn_idx, mention, term_id, confidence, accepted)"""
    return pa.Table.from_pydict(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.asarray([r[1] for r in rows], dtype=np.int32),
            "mention": [r[2] for r in rows],
            "span_start": np.asarray([0] * len(rows), dtype=np.int32),
            "span_end": np.asarray([1] * len(rows), dtype=np.int32),
            "term_id": [r[3] for r in rows],
            "name": ["n"] * len(rows),
            "confidence": np.asarray([r[4] for r in rows], dtype=np.float32),
            "reason": ["r"] * len(rows),
            "similarity_distance": np.zeros(len(rows), dtype=np.float32),
            "similarity_certainty": np.ones(len(rows), dtype=np.float32),
            "accepted": np.asarray([r[5] for r in rows], dtype=np.bool_),
            "error": [""] * len(rows),
        }
    )


class TestCanonicalize:
    def test_combine_dedups_within_batch(self):
        batch = links_df_to_batch(
            [
                ("c1", 0, "m", "T:1", 0.9, True),
                ("c1", 5, "m", "T:1", 0.7, True),
                ("c1", 2, "other", "T:2", 0.8, True),
                ("c1", 3, "rej", "T:3", 0.2, False),
            ]
        )
        out = combine_links_batch(batch).to_pylist()
        assert len(out) == 2
        m = {r["term_id"]: r for r in out}
        assert m["T:1"]["n_links"] == 2
        assert abs(m["T:1"]["max_confidence"] - 0.9) < 1e-6
        assert m["T:1"]["min_turn_idx"] == 0
        assert "T:3" not in m

    def test_group_merges_surfaces_to_one_triple(self):
        partials = pd.DataFrame(
            {
                "conv_id": ["c1"] * 3,
                "mention": ["name a", "syn a", "name a"],
                "term_id": ["T:1", "T:1", "T:1"],
                "n_links": [2, 1, 1],
                "max_confidence": np.asarray([0.9, 0.95, 0.8], dtype=np.float32),
                "min_turn_idx": np.asarray([4, 2, 9], dtype=np.int32),
            }
        )
        out = canonicalize_group(partials)
        assert len(out) == 1
        r = out.iloc[0]
        assert r["subj"] == "conv:c1" and r["pred"] == "mentions" and r["obj"] == "T:1"
        assert r["turn_idx"] == 2 and r["n_mentions"] == 4
        assert abs(r["confidence"] - 0.95) < 1e-6

    def test_union_find_merges_via_shared_mention(self):
        # same surface linked to two terms (pluggable nondeterministic
        # scorer scenario) -> one component, canonical = higher weight
        partials = pd.DataFrame(
            {
                "conv_id": ["c1"] * 2,
                "mention": ["shared", "shared"],
                "term_id": ["T:2", "T:1"],
                "n_links": [3, 1],
                "max_confidence": np.asarray([0.9, 0.9], dtype=np.float32),
                "min_turn_idx": np.asarray([0, 1], dtype=np.int32),
            }
        )
        out = canonicalize_group(partials)
        assert len(out) == 1
        assert out.iloc[0]["obj"] == "T:2"  # 3*0.9 beats 1*0.9

    def test_distinct_terms_stay_separate(self):
        partials = pd.DataFrame(
            {
                "conv_id": ["c1"] * 2,
                "mention": ["a", "b"],
                "term_id": ["T:1", "T:2"],
                "n_links": [1, 1],
                "max_confidence": np.asarray([0.9, 0.9], dtype=np.float32),
                "min_turn_idx": np.asarray([0, 1], dtype=np.int32),
            }
        )
        out = canonicalize_group(partials)
        assert sorted(out["obj"]) == ["T:1", "T:2"]
