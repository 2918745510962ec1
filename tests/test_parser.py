"""Operator-level parser tests porting the reference's pinned assertions
(tests/test_go_data_parsing.py, test_do_synonym_type_parsing.py,
test_do_cross_reference_extraction.py) onto our synthesized fixture corpus."""

import pyarrow as pa

from biocurator_mapper_ray.ontology import (
    extract_cross_references,
    extract_synonyms_from_node,
    get_nested_value,
    get_ontology_namespace,
    parse_enhanced_term,
    parse_nodes_batch,
    parse_ontology_json,
)
from biocurator_mapper_ray.ontology.fixtures import (
    OBO_PREFIX,
    make_comprehensive_nodes,
    make_document,
    make_edge_case_nodes,
    make_malformed_nodes,
    make_performance_nodes,
    standard_corpus,
)


def node(id_suffix="GO_0000001", lbl="test term", meta=None):
    n = {"id": f"{OBO_PREFIX}/{id_suffix}", "lbl": lbl}
    if meta is not None:
        n["meta"] = meta
    return n


class TestIdConversion:
    # reference: tests/test_go_data_parsing.py:113-130, 257-298
    def test_default_underscore_to_colon(self):
        parsed = parse_enhanced_term(node("GO_0000001"))
        assert parsed["term_id"] == "GO:0000001"

    def test_custom_replacement(self):
        parsed = parse_enhanced_term(node("GO_0000001"), {"prefix_replacement": {"_": "-"}})
        assert parsed["term_id"] == "GO-0000001"

    def test_no_replacement(self):
        parsed = parse_enhanced_term(node("GO_0000001"), {"prefix_replacement": {}})
        assert parsed["term_id"] == "GO_0000001"

    def test_malformed_uri_replaces_all_occurrences(self):
        # str.replace semantics: malformed_uri -> malformed:uri
        parsed = parse_enhanced_term({"id": "malformed_uri", "lbl": "t"})
        assert parsed["term_id"] == "malformed:uri"

    def test_multi_underscore(self):
        parsed = parse_enhanced_term({"id": "A_B_C", "lbl": "t"})
        assert parsed["term_id"] == "A:B:C"


class TestRequiredFields:
    def test_missing_lbl_dropped(self):
        assert parse_enhanced_term({"id": "x", "meta": {}}) is None

    def test_missing_id_dropped(self):
        assert parse_enhanced_term({"lbl": "x", "meta": {}}) is None

    def test_missing_definition_empty_string(self):
        parsed = parse_enhanced_term(node(meta={}))
        assert parsed["definition"] == ""

    def test_definition_as_bare_string(self):
        parsed = parse_enhanced_term(node(meta={"definition": "bare"}))
        assert parsed["definition"] == "bare"


class TestSynonyms:
    # reference: tests/test_do_synonym_type_parsing.py
    def test_bucketing_all_four_types(self):
        meta = {
            "synonyms": [
                {"pred": "hasExactSynonym", "val": "E1"},
                {"pred": "hasNarrowSynonym", "val": "N1"},
                {"pred": "hasBroadSynonym", "val": "B1"},
                {"pred": "hasRelatedSynonym", "val": "R1"},
            ]
        }
        syn = extract_synonyms_from_node(node(meta=meta))
        assert syn["exact_synonyms"] == ["E1"]
        assert syn["narrow_synonyms"] == ["N1"]
        assert syn["broad_synonyms"] == ["B1"]
        assert syn["related_synonyms"] == ["R1"]
        assert syn["all_synonyms"] == ["E1", "N1", "B1", "R1"]

    def test_unknown_pred_only_in_all(self):
        meta = {"synonyms": [{"pred": "hasUnknownSynonym", "val": "U1"}]}
        syn = extract_synonyms_from_node(node(meta=meta))
        assert syn["all_synonyms"] == ["U1"]
        assert syn["exact_synonyms"] == []
        assert syn["narrow_synonyms"] == []

    def test_empty_val_skipped(self):
        meta = {"synonyms": [{"pred": "hasExactSynonym", "val": ""}]}
        syn = extract_synonyms_from_node(node(meta=meta))
        assert syn["all_synonyms"] == []

    def test_case_and_whitespace_preserved(self):
        meta = {"synonyms": [{"pred": "hasExactSynonym", "val": "  MiXeD CaSe  "}]}
        syn = extract_synonyms_from_node(node(meta=meta))
        assert syn["exact_synonyms"] == ["  MiXeD CaSe  "]

    def test_unicode_preserved(self):
        meta = {"synonyms": [{"pred": "hasExactSynonym", "val": "ñáéíóú αβγδε 中文"}]}
        syn = extract_synonyms_from_node(node(meta=meta))
        assert syn["exact_synonyms"] == ["ñáéíóú αβγδε 中文"]


class TestCrossReferences:
    # reference: tests/test_do_cross_reference_extraction.py:216-242
    def test_no_deduplication(self):
        meta = {
            "xrefs": [{"val": "MESH:D123456"}, {"val": "MESH:D123456"}, {"val": "ICD10:E123"}],
            "basicPropertyValues": [
                {"pred": "http://www.geneontology.org/formats/oboInOwl#hasDbXref", "val": "MESH:D123456"}
            ],
        }
        xrefs = extract_cross_references(node(meta=meta))
        assert xrefs.count("MESH:D123456") == 3
        assert "ICD10:E123" in xrefs

    def test_definition_xrefs_included(self):
        meta = {"definition": {"val": "d", "xrefs": ["url:http://x"]}}
        assert extract_cross_references(node(meta=meta)) == ["url:http://x"]

    def test_bare_string_and_empty_skip(self):
        meta = {"xrefs": ["OK:1", "", {"val": ""}, {"noval": 1}]}
        assert extract_cross_references(node(meta=meta)) == ["OK:1"]

    def test_order_definition_meta_props(self):
        meta = {
            "definition": {"val": "d", "xrefs": ["A:1"]},
            "xrefs": [{"val": "B:2"}],
            "basicPropertyValues": [
                {"pred": "x#hasDbXref", "val": "C:3"},
            ],
        }
        assert extract_cross_references(node(meta=meta)) == ["A:1", "B:2", "C:3"]


class TestNamespaceAndNested:
    def test_namespace(self):
        meta = {
            "basicPropertyValues": [
                {"pred": "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace",
                 "val": "biological_process"}
            ]
        }
        assert get_ontology_namespace(node(meta=meta)) == "biological_process"

    def test_namespace_missing(self):
        assert get_ontology_namespace(node(meta={})) == ""

    def test_nested_value(self):
        n = node(meta={"definition": {"val": "hello"}})
        assert get_nested_value(n, ["meta", "definition", "val"]) == "hello"
        assert get_nested_value(n, ["meta", "missing", "path"], "default") == "default"


class TestSearchableText:
    def test_space_join_name_definition_synonyms(self):
        meta = {
            "definition": {"val": "the def"},
            "synonyms": [{"pred": "hasExactSynonym", "val": "syn one"}],
        }
        parsed = parse_enhanced_term(node(lbl="the name", meta=meta))
        assert parsed["searchable_text"] == "the name the def syn one"

    def test_empty_components_filtered(self):
        parsed = parse_enhanced_term(node(lbl="only name", meta={}))
        assert parsed["searchable_text"] == "only name"


class TestDocumentParse:
    def test_empty_graphs(self):
        assert parse_ontology_json({"graphs": []}) == []

    def test_missing_graphs_key(self):
        assert parse_ontology_json({"not_graphs": True}) == []

    def test_only_first_graph_read(self):
        doc = {
            "graphs": [
                {"nodes": [node("GO_0000001")]},
                {"nodes": [node("GO_0000002")]},
            ]
        }
        parsed = parse_ontology_json(doc)
        assert [t["term_id"] for t in parsed] == ["GO:0000001"]

    def test_malformed_corpus_drop_counts(self):
        doc = make_document(make_malformed_nodes())
        parsed = parse_ontology_json(doc)
        # missing-id and missing-lbl rows dropped; 5 of 7 survive
        ids = [t["term_id"] for t in parsed]
        assert len(parsed) == 5
        assert "malformed:uri" in ids

    def test_obsolete_term_parsed_not_dropped(self):
        # reference GO path parses obsolete terms (test_go_data_parsing.py:201-209)
        doc = make_document(make_edge_case_nodes())
        parsed = {t["term_id"]: t for t in parse_ontology_json(doc)}
        assert "DOID:2000004" in parsed
        assert parsed["DOID:2000004"]["is_obsolete"] is True

    def test_performance_corpus_parses_fully(self):
        doc = make_document(make_performance_nodes(100))
        parsed = parse_ontology_json(doc)
        assert len(parsed) == 100
        assert parsed[0]["term_id"] == "DOID:8000001"
        assert all(t["exact_synonyms"] and t["cross_references"] for t in parsed)

    def test_names_unique_in_performance_corpus(self):
        parsed = parse_ontology_json(make_document(make_performance_nodes(500)))
        names = [t["name"] for t in parsed]
        assert len(set(names)) == len(names)


class TestArrowBatchParity:
    def test_batch_matches_rowwise(self):
        import json

        corpus = standard_corpus(n_performance=50)
        for name, doc in corpus.items():
            nodes = (doc.get("graphs") or [{}])[0].get("nodes", []) if doc.get("graphs") else []
            expected = parse_ontology_json(doc)
            batch = pa.table({"node_json": [json.dumps(n) for n in nodes]})
            got = parse_nodes_batch(batch)
            assert got.num_rows == len(expected), name
            got_rows = got.to_pylist()
            for e, g in zip(expected, got_rows):
                for k, v in e.items():
                    assert g[k] == v, (name, k)
