"""Deterministic ontology fixture corpus.

Mirrors the reference's curated test corpus structure
(``/root/reference/tests/data/`` — comprehensive 6 / edge-cases 8 /
malformed 6 / performance N, documented in
``tests/data/TEST_DATA_DOCUMENTATION.md:211-225``) without copying any of
its content: every node here is synthesized from seeded word lists.  The
performance corpus doubles as the mention vocabulary for the transcript
synthesizer (sources/transcripts.py), so its names and synonyms are
multi-word phrases that can be planted into conversational text.
"""

from __future__ import annotations

import random

OBO_PREFIX = "http://purl.obolibrary.org/obo"
_NS_PRED = "http://www.geneontology.org/formats/oboInOwl#hasOBONamespace"
_XREF_PRED = "http://www.geneontology.org/formats/oboInOwl#hasDbXref"

_ADJECTIVES = [
    "chronic", "acute", "recurrent", "benign", "malignant", "congenital",
    "idiopathic", "familial", "juvenile", "systemic", "focal", "diffuse",
    "primary", "secondary", "atypical", "refractory", "latent", "severe",
]
_TISSUES = [
    "hepatic", "renal", "cardiac", "pulmonary", "gastric", "neural",
    "dermal", "ocular", "splenic", "thyroid", "pancreatic", "vascular",
    "lymphoid", "osseous", "mucosal", "adrenal", "bronchial", "cortical",
]
_CONDITIONS = [
    "fibrosis", "dysplasia", "atrophy", "hyperplasia", "stenosis",
    "necrosis", "edema", "carcinoma", "adenoma", "neuropathy",
    "myopathy", "dystrophy", "sclerosis", "granuloma", "ischemia",
    "thrombosis", "aneurysm", "lesion",
]
_SYNONYM_WORDS = [
    "disorder", "syndrome", "disease", "condition", "anomaly", "defect",
    "ailment", "affliction", "malady", "complication", "abnormality",
    "pathology", "illness", "impairment", "degeneration", "malformation",
    "irregularity", "disturbance",
]
_RELATED_WORDS = [
    "presentation", "manifestation", "involvement", "phenotype", "variant",
    "subtype", "process", "pattern", "complex", "spectrum", "episode",
    "occurrence", "progression", "expression", "formation", "development",
    "reaction", "response",
]
_XREF_SOURCES = ["MESH", "ICD10CM", "SNOMEDCT", "OMIM", "NCI", "UMLS_CUI"]


def _term_phrases(rng: random.Random, idx: int) -> tuple[str, dict[str, str]]:
    """Unique multi-word name + synonym surfaces for term #idx.

    Every surface (name and all four synonym classes) is GLOBALLY unique
    across terms for idx < 18^3 = 5832:

    * name    = adj·tissue·cond         (3-token index of the term)
    * exact   = tissue·cond·syn[adj_i]  (adj index re-encoded via syn word)
    * narrow  = adj·cond·"of"·tissue·"tissue"
    * broad   = name + " disorder"      (longest-first overlap exercise)
    * related = adj·cond·rel[tissue_i]

    Word classes are pairwise disjoint, so no surface of one class can
    equal a surface of another, and the transcript synthesizer's planted
    truth maps surface→term with no disambiguation.
    """
    ai = idx % len(_ADJECTIVES)
    ti = (idx // len(_ADJECTIVES)) % len(_TISSUES)
    ci = (idx // (len(_ADJECTIVES) * len(_TISSUES))) % len(_CONDITIONS)
    adj, tissue, cond = _ADJECTIVES[ai], _TISSUES[ti], _CONDITIONS[ci]
    name = f"{adj} {tissue} {cond}"
    surfaces = {
        "exact": f"{tissue} {cond} {_SYNONYM_WORDS[ai]}",
        "narrow": f"{adj} {cond} of {tissue} tissue",
        "broad": f"{name} disorder",
        "related": f"{adj} {cond} {_RELATED_WORDS[ti]}",
    }
    return name, surfaces


def make_performance_nodes(n: int = 100, seed: int = 42, prefix: str = "DOID",
                            base_id: int = 8000001) -> list[dict]:
    """N uniform, fully-populated nodes (ids ``{prefix}_{base_id}…``).

    Mirrors the reference's generated performance corpus
    (sample_do_performance.json: 100 uniform terms with all four synonym
    types + multiple xrefs; TEST_DATA_DOCUMENTATION.md:68-82).
    """
    rng = random.Random(seed)
    nodes = []
    for i in range(n):
        name, syns = _term_phrases(rng, i)
        num = base_id + i
        definition = (
            f"A {name} characterized by progressive changes in affected tissue, "
            f"with onset typically documented in case series {i:04d}."
        )
        node = {
            "id": f"{OBO_PREFIX}/{prefix}_{num}",
            "lbl": name,
            "type": "CLASS",
            "meta": {
                "definition": {
                    "val": definition,
                    "xrefs": [f"url:https://example.org/cases/{i:04d}"],
                },
                "synonyms": [
                    {"pred": "hasExactSynonym", "val": syns["exact"], "xrefs": []},
                    {"pred": "hasNarrowSynonym", "val": syns["narrow"], "xrefs": []},
                    {"pred": "hasBroadSynonym", "val": syns["broad"], "xrefs": []},
                    {"pred": "hasRelatedSynonym", "val": syns["related"], "xrefs": []},
                ],
                "xrefs": [
                    {"val": f"{_XREF_SOURCES[i % len(_XREF_SOURCES)]}:{rng.randint(100000, 999999)}"},
                    {"val": f"{_XREF_SOURCES[(i + 1) % len(_XREF_SOURCES)]}:{rng.randint(100000, 999999)}"},
                ],
                "basicPropertyValues": [
                    {"pred": _NS_PRED, "val": "disease_ontology"},
                ],
            },
        }
        nodes.append(node)
    return nodes


def make_comprehensive_nodes() -> list[dict]:
    """6 fully-featured nodes: all four synonym preds, multi-source xrefs,
    namespace set (mirrors sample_do_comprehensive.json structure)."""
    nodes = make_performance_nodes(6, seed=7, base_id=1000001)
    # add definition-xref + basicPropertyValues-xref diversity
    for i, node in enumerate(nodes):
        node["meta"]["basicPropertyValues"].append(
            {"pred": _XREF_PRED, "val": f"OMIM:{600000 + i}"}
        )
    return nodes


def make_edge_case_nodes() -> list[dict]:
    """8 edge cases (mirrors sample_do_edge_cases.json coverage intent)."""
    return [
        # minimal node
        {"id": f"{OBO_PREFIX}/DOID_2000001", "lbl": "minimal node", "type": "CLASS"},
        # empty definition
        {
            "id": f"{OBO_PREFIX}/DOID_2000002",
            "lbl": "empty definition term",
            "meta": {"definition": {"val": "", "xrefs": []}},
        },
        # empty synonym vals (must be skipped entirely)
        {
            "id": f"{OBO_PREFIX}/DOID_2000003",
            "lbl": "empty synonym term",
            "meta": {
                "synonyms": [
                    {"pred": "hasExactSynonym", "val": "", "xrefs": []},
                    {"pred": "hasExactSynonym", "val": "real synonym", "xrefs": []},
                ]
            },
        },
        # obsolete term (parsed, flagged; GO path keeps, DO embed path drops)
        {
            "id": f"{OBO_PREFIX}/DOID_2000004",
            "lbl": "obsolete archaic ailment",
            "meta": {
                "deprecated": True,
                "definition": {"val": "An obsolete classification retained for history.", "xrefs": []},
            },
        },
        # unicode
        {
            "id": f"{OBO_PREFIX}/DOID_2000005",
            "lbl": "unicode term ñáéíóú αβγδε 中文 العربية",
            "meta": {"definition": {"val": "Definition with unicode: ñáéíóú αβγδε 中文 العربية", "xrefs": []}},
        },
        # long name/definition
        {
            "id": f"{OBO_PREFIX}/DOID_2000006",
            "lbl": "extremely " + "very " * 50 + "long term name",
            "meta": {"definition": {"val": "long definition " * 400, "xrefs": []}},
        },
        # unknown synonym pred → only all_synonyms
        {
            "id": f"{OBO_PREFIX}/DOID_2000007",
            "lbl": "unknown synonym pred term",
            "meta": {
                "definition": {"val": "Term carrying an unknown synonym predicate.", "xrefs": []},
                "synonyms": [
                    {"pred": "hasUnknownSynonym", "val": "mystery synonym", "xrefs": []},
                    {"pred": "hasExactSynonym", "val": "known synonym", "xrefs": []},
                ],
            },
        },
        # duplicate xrefs: 2× meta.xrefs + 1× basicPropertyValues → emit 3×
        {
            "id": f"{OBO_PREFIX}/DOID_2000008",
            "lbl": "duplicate xref term",
            "meta": {
                "xrefs": [{"val": "MESH:D999999"}, {"val": "MESH:D999999"}, {"val": "ICD10CM:Z99"}],
                "basicPropertyValues": [{"pred": _XREF_PRED, "val": "MESH:D999999"}],
            },
        },
    ]


def make_malformed_nodes() -> list[dict]:
    """6 malformed nodes (mirrors sample_do_malformed.json coverage)."""
    return [
        {"lbl": "missing id term", "meta": {}},                      # no id → dropped
        {"id": f"{OBO_PREFIX}/DOID_3000002", "meta": {}},            # no lbl → dropped
        {"id": f"{OBO_PREFIX}/DOID_3000003", "lbl": "meta as string", "meta": "not a dict"},
        {
            "id": f"{OBO_PREFIX}/DOID_3000004",
            "lbl": "definition as string",
            "meta": {"definition": "bare string definition"},
        },
        {
            "id": f"{OBO_PREFIX}/DOID_3000005",
            "lbl": "invalid synonym structures",
            "meta": {"synonyms": ["bare string", {"pred": "hasExactSynonym"}, None, 42]},
        },
        {
            "id": f"{OBO_PREFIX}/DOID_3000006",
            "lbl": "xrefs with junk",
            "meta": {"xrefs": [{"val": None}, {"noval": 1}, 17, "OK:1", ""]},
        },
        {"id": "malformed_uri", "lbl": "malformed uri term", "meta": {}},
    ]


def make_document(nodes: list[dict], graph_id: str = "synthetic-do",
                  version_date: str = "2026-01-01") -> dict:
    """Wrap nodes into an OBO graph document (graphs[0] only is read)."""
    return {
        "graphs": [
            {
                "id": f"{OBO_PREFIX}/{graph_id}.owl",
                "meta": {
                    "version": f"{OBO_PREFIX}/releases/{version_date}/{graph_id}.owl",
                    "basicPropertyValues": [
                        {"pred": "http://www.w3.org/2002/07/owl#versionInfo", "val": version_date},
                        {
                            "pred": "http://www.geneontology.org/formats/oboInOwl#hasOBOFormatVersion",
                            "val": "1.2",
                        },
                    ],
                },
                "nodes": nodes,
            }
        ]
    }


def standard_corpus(n_performance: int = 100, seed: int = 42) -> dict[str, dict]:
    """The full fixture suite keyed by corpus name."""
    return {
        "comprehensive": make_document(make_comprehensive_nodes(), "synthetic-comprehensive"),
        "edge_cases": make_document(make_edge_case_nodes(), "synthetic-edge"),
        "malformed": make_document(make_malformed_nodes(), "synthetic-malformed"),
        "performance": make_document(make_performance_nodes(n_performance, seed), "synthetic-perf"),
        "empty": {"graphs": []},
        "invalid": {"not_graphs": True},
    }
