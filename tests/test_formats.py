"""JSONL/CSV source + sink wrappers (sources/formats.py)."""

import csv
import gzip
import json
import os


def _write_fixture(tmp_path):
    rows = [{"doc_id": i, "text": f"doc {i}", "score": i * 0.5}
            for i in range(100)]
    a = str(tmp_path / "a.jsonl")
    b = str(tmp_path / "b.jsonl.gz")
    with open(a, "w") as f:
        for r in rows[:50]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(b, "wt") as f:
        for r in rows[50:]:
            f.write(json.dumps(r) + "\n")
    c = str(tmp_path / "c.csv")
    d = str(tmp_path / "d.csv.gz")
    with open(c, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "score"])
        w.writeheader()
        for r in rows[:60]:
            w.writerow(r)
    with gzip.open(d, "wt", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["doc_id", "text", "score"])
        w.writeheader()
        for r in rows[60:]:
            w.writerow(r)
    return rows, a, b, c, d


class TestFormats:
    def test_jsonl_mixed_compression_and_projection(self, ray_session,
                                                    tmp_path):
        from biocurator_mapper_ray.sources.formats import read_jsonl

        rows, a, b, _, _ = _write_fixture(tmp_path)
        df = (read_jsonl([a, b], columns=["doc_id", "text"])
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(df.columns) == ["doc_id", "text"]
        assert df["doc_id"].tolist() == list(range(100))

    def test_csv_mixed_compression_and_pushdown(self, ray_session, tmp_path):
        from biocurator_mapper_ray.sources.formats import read_csv

        rows, _, _, c, d = _write_fixture(tmp_path)
        df = (read_csv([c, d], columns=["doc_id", "score"])
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(df.columns) == ["doc_id", "score"]
        assert len(df) == 100
        assert df["score"].iloc[99] == 49.5

    def test_write_read_roundtrip_sharded(self, ray_session, tmp_path):
        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import (
            read_csv, read_jsonl, write_csv, write_jsonl)

        rows = [{"doc_id": i, "text": f"t{i}"} for i in range(30)]
        src = rd.from_items(rows).repartition(3)
        out_j = str(tmp_path / "out_jsonl")
        out_c = str(tmp_path / "out_csv")
        write_jsonl(src, out_j)
        write_csv(src, out_c)
        assert len(os.listdir(out_j)) == 3  # one file per block (resumable)
        assert read_jsonl(out_j).count() == 30
        assert read_csv(out_c).count() == 30
