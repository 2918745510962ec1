"""Single-passage resolve shim (pipelines/serve.ResolveService) —
reference POST /resolve_biocurated_data parity (app/main.py:68-88).
Plain callables over Arrow state; no Ray needed."""

from biocurator_mapper_ray.ontology.fixtures import (
    make_document,
    make_performance_nodes,
)
from biocurator_mapper_ray.ontology.parser import (
    TERM_SCHEMA,
    parse_ontology_json,
)
from biocurator_mapper_ray.pipelines.serve import ResolveService


def _terms(n=20):
    import pyarrow as pa

    parsed = parse_ontology_json(make_document(make_performance_nodes(n)))
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


class TestResolveService:
    def test_exact_passage_resolves_to_owner(self):
        terms = _terms(20)
        svc = ResolveService({"do": terms})
        name = terms.column("name")[0].as_py()
        tid = terms.column("term_id")[0].as_py()
        r = svc.resolve(name, "do")
        assert r["error"] is None
        assert r["best_match"] == {"id": tid, "name": name}
        assert r["confidence"] >= 0.9  # exact-surface path
        assert "Exact surface match" in r["reason"]
        # alternatives = candidates minus the winner (app/main.py:84)
        alt_ids = {a["id"] for a in r["alternatives"]}
        assert tid not in alt_ids and len(alt_ids) >= 1

    def test_agrees_with_bulk_link_stage(self):
        # the serving shim and the bulk pipeline share _TermSide +
        # RuleScorer — same passage, same winner and confidence
        import pyarrow as pa

        from biocurator_mapper_ray.stages.link import LinkStage
        from biocurator_mapper_ray.stages.mention import MentionDetector

        terms = _terms(15)
        svc = ResolveService({"do": terms})
        name = terms.column("name")[3].as_py()
        batch = pa.table({
            "conv_id": ["c1"], "turn_idx": pa.array([0], pa.int32()),
            "role": ["user"], "text": [f"patient presents with {name}"],
            "tool": [""]})
        links = LinkStage(terms)(MentionDetector(terms)(batch))
        got = svc.resolve(name, "do")
        assert links.num_rows == 1
        assert links.column("term_id")[0].as_py() == got["best_match"]["id"]
        assert abs(links.column("confidence")[0].as_py()
                   - got["confidence"]) < 1e-6

    def test_unknown_ontology_is_404_shaped(self):
        svc = ResolveService({"do": _terms(5)})
        r = svc.resolve("anything", "nope")
        assert r == {"error": "Ontology not configured",
                     "status_code": 404}

    def test_configure_flips_snapshot(self):
        t5, t20 = _terms(5), _terms(20)
        svc = ResolveService({"do": t5})
        svc.configure("do", t20)
        name = t20.column("name")[19].as_py()
        r = svc.resolve(name, "do")
        assert r["best_match"]["id"] == t20.column("term_id")[19].as_py()

    def test_health_shape(self):
        svc = ResolveService({})
        h = svc.health()
        assert h["status"] == "healthy" and "timestamp" in h
