"""Checkpoint-resume semantics for the sharded flagship runner."""

import json
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pytest

from biocurator_mapper_ray.ontology.fixtures import make_document, make_performance_nodes
from biocurator_mapper_ray.ontology.parser import TERM_SCHEMA, parse_ontology_json
from biocurator_mapper_ray.pipelines.resume import run_resumable, shard_marker
from biocurator_mapper_ray.sources.transcripts import ensure_transcripts


def terms_table(n=60):
    parsed = parse_ontology_json(make_document(make_performance_nodes(n)))
    cols = {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA}
    return pa.Table.from_pydict(cols, schema=TERM_SCHEMA)


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bmr_resume"))
    tdir, _ = ensure_transcripts(800, n_terms=60, seed=42, cache_root=root)
    return tdir


def test_run_skip_and_selective_recompute(ray_session, corpus, tmp_path):
    import ray.data as rd

    out_root = str(tmp_path / "out")
    terms = terms_table()
    factory = lambda: rd.read_parquet(corpus)

    s1 = run_resumable(factory, terms, out_root, snapshot_hash="snapA",
                       num_shards=4, concurrency=1)
    assert s1["computed"] == 4 and s1["skipped"] == 0
    full1 = pads.dataset(out_root, format="parquet").to_table().sort_by(
        [("subj", "ascending"), ("obj", "ascending")]
    )
    assert full1.num_rows > 0
    # every lineage bucket present and consistent with its shard dir
    assert set(full1.column("ontology_snapshot_hash").to_pylist()) == {"snapA"}

    # second run: everything skipped, output untouched
    mtime = os.path.getmtime(shard_marker(out_root, 2))
    s2 = run_resumable(factory, terms, out_root, snapshot_hash="snapA",
                       num_shards=4, concurrency=1)
    assert s2["computed"] == 0 and s2["skipped"] == 4
    assert os.path.getmtime(shard_marker(out_root, 2)) == mtime

    # damage one shard -> only that shard recomputes; output identical
    os.unlink(shard_marker(out_root, 1))
    s3 = run_resumable(factory, terms, out_root, snapshot_hash="snapA",
                       num_shards=4, concurrency=1)
    assert s3["computed"] == 1 and s3["skipped"] == 3
    full2 = pads.dataset(out_root, format="parquet").to_table().sort_by(
        [("subj", "ascending"), ("obj", "ascending")]
    )
    assert full1.equals(full2)

    # new snapshot hash invalidates all markers
    s4 = run_resumable(factory, terms, out_root, snapshot_hash="snapB",
                       num_shards=4, concurrency=1)
    assert s4["computed"] == 4

    # manifest persisted with metrics
    with open(os.path.join(out_root, "_run_manifest.json")) as f:
        m = json.load(f)
    assert all("n_triples" in s and "elapsed_sec" in s for s in m["shards"])


def test_shards_partition_output(ray_session, corpus, tmp_path):
    import ray.data as rd

    out_root = str(tmp_path / "out2")
    run_resumable(lambda: rd.read_parquet(corpus), terms_table(), out_root,
                  snapshot_hash="s", num_shards=2, concurrency=1)
    t0 = pads.dataset(os.path.join(out_root, "shard=000"), format="parquet").to_table()
    t1 = pads.dataset(os.path.join(out_root, "shard=001"), format="parquet").to_table()
    convs0 = set(t0.column("conv_id").to_pylist())
    convs1 = set(t1.column("conv_id").to_pylist())
    assert convs0 and convs1 and not (convs0 & convs1)


def test_sharded_files_overlapped_equals_monolithic(ray_session, corpus, tmp_path):
    """File-partitioned overlapped shards: output union == monolithic
    triples exactly, resume skips completed shards, and a changed file
    list invalidates its shard only."""
    import ray.data as rd

    from biocurator_mapper_ray.pipelines.kg import extract_triples
    from biocurator_mapper_ray.pipelines.resume import run_sharded_files

    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    terms = terms_table()
    mono = extract_triples(rd.read_parquet(files), terms, snapshot_hash="s").to_pandas()

    out_root = str(tmp_path / "sharded")
    s = run_sharded_files(files, terms, out_root, snapshot_hash="s",
                          num_shards=2, in_flight=2, sort_output=False)
    assert s["computed"] == 2 and s["skipped"] == 0
    got = pads.dataset(out_root, format="parquet").to_table().to_pandas()
    cols = [c for c in mono.columns if c in got.columns]
    a = mono[cols].sort_values(cols).reset_index(drop=True)
    b = got[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    # resume: everything skips
    s2 = run_sharded_files(files, terms, out_root, snapshot_hash="s",
                           num_shards=2, in_flight=2, sort_output=False)
    assert s2["computed"] == 0 and s2["skipped"] == 2

    # identity includes the shard's file list: dropping a marker recomputes
    os.remove(os.path.join(out_root, "shard=000", "_SUCCESS"))
    s3 = run_sharded_files(files, terms, out_root, snapshot_hash="s",
                           num_shards=2, in_flight=2, sort_output=False)
    assert s3["computed"] == 1 and s3["skipped"] == 1


def test_ensure_transcripts_wipes_partial_generation(tmp_path, ray_session):
    """A generation that died before its _SUCCESS marker must not leave
    partial parquet files that a retry would append to (write_parquet
    appends into existing dirs, silently doubling the corpus)."""
    import os

    from biocurator_mapper_ray.sources.transcripts import ensure_transcripts

    root = str(tmp_path / "cache")
    tdir, edir = ensure_transcripts(2000, n_terms=50, seed=7,
                                    cache_root=root)
    import ray.data as rd

    n_clean = rd.read_parquet(tdir).count()

    # simulate a crashed generation: marker gone, stale files remain
    base = os.path.dirname(tdir)
    os.remove(os.path.join(base, "_SUCCESS"))
    tdir2, _ = ensure_transcripts(2000, n_terms=50, seed=7,
                                  cache_root=root)
    assert tdir2 == tdir
    assert rd.read_parquet(tdir2).count() == n_clean  # not doubled
