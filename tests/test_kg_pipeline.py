"""End-to-end flagship pipeline tests on synthesized transcripts
(Ray local mode, session-scoped)."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
from biocurator_mapper_ray.ontology.parser import TERM_SCHEMA, parse_ontology_json
from biocurator_mapper_ray.pipelines.kg import (
    extract_triples,
    extract_triples_to_parquet,
    triples_quality,
)
from biocurator_mapper_ray.pipelines.index_build import build_term_index, load_term_index_table
from biocurator_mapper_ray.sources.transcripts import ensure_transcripts
from biocurator_mapper_ray.state.index import VectorIndex

N_TERMS = 120
N_TURNS = 1500


def terms_table():
    parsed = parse_ontology_json(make_document(make_performance_nodes(N_TERMS)))
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bmr"))
    tdir, edir = ensure_transcripts(N_TURNS, n_terms=N_TERMS, seed=42, cache_root=root)
    return tdir, edir


class TestSynthesizer:
    def test_shape_and_determinism(self, corpus):
        tdir, _ = corpus
        tbl = pads.dataset(tdir, format="parquet").to_table()
        assert set(tbl.schema.names) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
        assert tbl.schema.field("turn_idx").type == pa.int32()
        assert tbl.schema.field("ts").type == pa.timestamp("us")
        assert tbl.num_rows >= N_TURNS

    def test_mega_conversation_skew(self, corpus):
        tdir, _ = corpus
        tbl = pads.dataset(tdir, format="parquet").to_table()
        import collections

        counts = collections.Counter(tbl.column("conv_id").to_pylist())
        assert counts["conv00000000"] >= tbl.num_rows // 11

    def test_ts_monotone_within_conv(self, corpus):
        tdir, _ = corpus
        tbl = pads.dataset(tdir, format="parquet").to_table().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        df = tbl.to_pandas()
        for _, g in df.groupby("conv_id"):
            assert g["ts"].is_monotonic_increasing

    def test_regeneration_is_cached_and_stable(self, corpus, tmp_path):
        tdir, edir = corpus
        tdir2, edir2 = ensure_transcripts(
            N_TURNS, n_terms=N_TERMS, seed=42,
            cache_root=os.path.dirname(os.path.dirname(tdir)),
        )
        assert tdir2 == tdir  # cache hit, no regeneration


class TestFlagshipPipeline:
    def test_precision_recall(self, corpus, ray_session):
        import ray.data as rd

        tdir, edir = corpus
        transcripts = rd.read_parquet(tdir)
        triples = extract_triples(
            transcripts, terms_table(), snapshot_hash="testsnap", concurrency=1
        )
        got = pa.Table.from_pandas(triples.to_pandas())
        expected = pads.dataset(edir, format="parquet").to_table()
        q = triples_quality(got, expected)
        assert q["expected"] > 50
        assert q["precision"] >= 0.95, q
        assert q["recall"] >= 0.95, q

    def test_lineage_and_dedup_and_order(self, corpus, ray_session):
        import ray.data as rd

        tdir, _ = corpus
        transcripts = rd.read_parquet(tdir)
        triples = extract_triples(
            transcripts, terms_table(), snapshot_hash="snap42", concurrency=1
        ).to_pandas()
        assert (triples["extractor_version"] == "bmr-0.1.0").all()
        assert (triples["ontology_snapshot_hash"] == "snap42").all()
        assert triples["input_shard"].str.startswith("conv_bucket=").all()
        keys = list(zip(triples["subj"], triples["pred"], triples["obj"]))
        assert len(keys) == len(set(keys))  # exact dedup
        assert keys == sorted(keys)  # deterministic output order


class TestContiguousLayoutPaths:
    """The three canonicalization strategies must agree triple-for-triple:
    mention-level full shuffle (general), term-level full shuffle
    (deterministic scorer), and the boundary-split paths that exploit
    conv-contiguous file layout."""

    CMP = ["subj", "pred", "obj", "turn_idx", "confidence", "n_mentions"]

    def _reference(self, tdir):
        import ray.data as rd

        return (
            extract_triples(
                rd.read_parquet(tdir), terms_table(), deterministic_scorer=False,
                snapshot_hash="s", concurrency=2,
            )
            .to_pandas()[self.CMP]
            .reset_index(drop=True)
        )

    def test_boundary_split_equals_general(self, corpus, ray_session):
        import ray.data as rd

        tdir, _ = corpus
        want = self._reference(tdir)
        got = (
            extract_triples(
                rd.read_parquet(tdir), terms_table(), assume_conv_contiguous=True,
                snapshot_hash="s", concurrency=2,
            )
            .to_pandas()[self.CMP]
            .reset_index(drop=True)
        )
        assert got.equals(want)

    def test_sink_fused_equals_general(self, corpus, ray_session, tmp_path):
        import ray.data as rd

        tdir, _ = corpus
        want = self._reference(tdir).sort_values(self.CMP).reset_index(drop=True)
        out = str(tmp_path / "sink")
        n = extract_triples_to_parquet(
            rd.read_parquet(tdir), terms_table(), out, snapshot_hash="s", concurrency=2
        )
        got = (
            rd.read_parquet(out).to_pandas()[self.CMP]
            .sort_values(self.CMP)
            .reset_index(drop=True)
        )
        assert n == len(want)
        assert got.equals(want)

    def test_interior_write_is_idempotent(self, corpus, ray_session, tmp_path):
        """A retried interior-write task overwrites the SAME shard file
        (content-addressed name), so task replay cannot duplicate data."""
        import pyarrow.parquet as pq

        from biocurator_mapper_ray.stages.link import MentionLinkStage

        tdir, _ = corpus
        out = str(tmp_path / "sink2")
        os.makedirs(out)
        batch = pads.dataset(tdir, format="parquet").to_table()
        stage = MentionLinkStage(
            terms_table(), emit="write_interior", out_dir=out, snapshot_hash="s"
        )
        b1 = stage(batch)
        files1 = sorted(os.listdir(out))
        b2 = stage(batch)
        files2 = sorted(os.listdir(out))
        assert files1 == files2 and len(files1) == 1
        assert b1.to_pydict() == b2.to_pydict()
        assert pq.read_table(os.path.join(out, files1[0])).num_rows > 0


class TestIndexBuildPipeline:
    def test_build_skip_and_rebuild(self, ray_session, tmp_path):
        doc = make_document(make_performance_nodes(40), version_date="2026-03-01")
        root = str(tmp_path / "index")
        d1, snap1 = build_term_index(doc, root, dim=64)
        assert os.path.exists(os.path.join(d1, "_SUCCESS"))
        tbl = load_term_index_table(d1)
        assert tbl.num_rows == 40
        assert set(tbl.column("snapshot_hash").to_pylist()) == {snap1}
        idx = VectorIndex.from_vectors_table(tbl, snap1)
        assert idx.dim == 64

        # same snapshot → skip (mtime unchanged)
        m1 = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
        d2, snap2 = build_term_index(doc, root, dim=64)
        assert (d2, snap2) == (d1, snap1)
        assert os.path.getmtime(os.path.join(d1, "_SUCCESS")) == m1

        # new version → new dir, manifest flipped
        doc2 = make_document(make_performance_nodes(40), version_date="2026-04-01")
        d3, snap3 = build_term_index(doc2, root, dim=64)
        assert snap3 != snap1 and d3 != d1
        from biocurator_mapper_ray.state.manifest import Manifest

        assert Manifest(root).current_snapshot() == snap3
        assert len(Manifest(root).read()["history"]) == 2

        # A6: verify_history stamps per-record availability status
        # (reference config_updater.py:202-247) and persists it
        import shutil

        history = Manifest(root).verify_history()
        assert [r["status"] for r in history] == ["available", "available"]
        assert all(r["last_verified"] for r in history)
        shutil.rmtree(d1)  # oldest index artifact vanishes
        history = Manifest(root).verify_history()
        by_snap = {r["snapshot_hash"]: r["status"] for r in history}
        assert by_snap[snap1] == "file_missing"
        assert by_snap[snap3] == "available"
        # persisted: a fresh Manifest sees the stamped statuses
        persisted = Manifest(root).read()["history"]
        assert {r["snapshot_hash"]: r["status"] for r in persisted} == by_snap
        # and latest_available skips the missing artifact
        assert Manifest(root).latest_available()["snapshot_hash"] == snap3

    def test_quality_filter_applied(self, ray_session, tmp_path):
        from biocurator_mapper_ray.ontology.fixtures import make_edge_case_nodes

        doc = make_document(make_edge_case_nodes())
        d, _ = build_term_index(doc, str(tmp_path / "idx2"), dim=32)
        tbl = load_term_index_table(d)
        # 8 edge nodes parse -> 3 survive quality
        assert tbl.num_rows == 3


class TestPoolClamp:
    """_clamp_pool must never let pooled stages pin every CPU slot (the
    num_cpus=2 + (2,2)-pool ReadParquet deadlock)."""

    def test_caps_at_cluster_minus_one(self, ray_session):
        from biocurator_mapper_ray.pipelines.kg import _clamp_pool, _cluster_cpus

        total = _cluster_cpus()  # 4 in the test session
        pool, cpus = _clamp_pool((total, total))
        assert pool == (total - 1, total - 1)
        assert cpus == 1.0

    def test_fractional_cpus_when_pools_would_saturate(self, ray_session):
        from biocurator_mapper_ray.pipelines.kg import _clamp_pool, _cluster_cpus

        total = _cluster_cpus()
        # two pooled stages each wanting total/2 actors: together they
        # would pin every slot -> actors shrink to half a CPU
        pool, cpus = _clamp_pool((total // 2, total // 2), n_pools=2)
        assert pool == (total // 2, total // 2)
        assert cpus == 0.5

    def test_wide_session_untouched(self, ray_session):
        from biocurator_mapper_ray.pipelines.kg import _clamp_pool

        pool, cpus = _clamp_pool((1, 2))
        assert pool == (1, 2) and cpus == 1.0


class TestIncrementalUpdate:
    def test_delta_merge_equals_full_extraction(self, corpus, ray_session):
        """Splitting the corpus into a snapshot half and a delta half
        and merging must yield the same triple SET as one full run,
        with delta-side rows carrying the fresh snapshot hash."""
        import pyarrow.compute as pc
        import ray.data as rd

        from biocurator_mapper_ray.pipelines.kg import incremental_update

        tdir, _ = corpus
        terms = terms_table()
        full = rd.read_parquet(tdir).to_pandas()
        convs = sorted(full["conv_id"].unique())
        cut = len(convs) // 2
        old_part = full[full["conv_id"].isin(convs[:cut])]
        new_part = full[full["conv_id"].isin(convs[cut:])]

        prev = extract_triples(rd.from_pandas(old_part), terms,
                               snapshot_hash="v1", sort_output=False,
                               concurrency=2)
        merged = incremental_update(
            prev, rd.from_pandas(new_part), terms,
            snapshot_hash="v2", concurrency=2).to_pandas()

        want = extract_triples(rd.read_parquet(tdir), terms,
                               snapshot_hash="vX", sort_output=False,
                               concurrency=2).to_pandas()

        key = ["subj", "pred", "obj"]
        assert sorted(map(tuple, merged[key].values.tolist())) == \
            sorted(map(tuple, want[key].values.tolist()))
        assert not merged.duplicated(key).any()
        # provenance: delta-covered conversations carry the new hash
        by_hash = merged.groupby("ontology_snapshot_hash").size()
        assert set(by_hash.index) == {"v1", "v2"}
        new_convs = set(new_part["conv_id"])
        got_v2 = merged[merged["ontology_snapshot_hash"] == "v2"]
        assert set(got_v2["conv_id"]).issubset(new_convs)
