"""JSONL/CSV source + sink wrappers (sources/formats.py)."""

import csv
import gzip
import json
import os

import numpy as np
import pandas as pd


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


class TestPartitionedParquet:
    def test_write_then_pruned_read(self, ray_session, tmp_path):
        import os

        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import (
            read_parquet_partition, write_parquet_partitioned)

        rows = [{"k": ["a", "b", "c"][i % 3], "v": i} for i in range(90)]
        out = str(tmp_path / "part")
        write_parquet_partitioned(rd.from_items(rows).repartition(3),
                                  out, by=["k"])
        assert sorted(os.listdir(out)) == ["k=a", "k=b", "k=c"]
        got = read_parquet_partition(out, partitions={"k": "b"}).to_pandas()
        assert len(got) == 30
        assert set(got["k"]) == {"b"}
        assert sorted(got["v"]) == sorted(i for i in range(90) if i % 3 == 1)

    def test_quoted_partition_values(self, ray_session, tmp_path):
        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import (
            read_parquet_partition, write_parquet_partitioned)

        rows = [{"k": "NOT SPECIFIED" if i % 2 else "OK", "v": i}
                for i in range(20)]
        out = str(tmp_path / "part2")
        write_parquet_partitioned(rd.from_items(rows), out, by=["k"])
        got = read_parquet_partition(
            out, partitions={"k": "NOT SPECIFIED"}).to_pandas()
        assert len(got) == 10


class TestOrc:
    def test_round_trip_and_projection(self, ray_session, tmp_path):
        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import read_orc, write_orc

        df = pd.DataFrame({
            "a": np.arange(100, dtype=np.int64),
            "b": [f"s{i}" for i in range(100)],
            "c": np.linspace(0, 1, 100),
        })
        ds = rd.from_pandas(df).repartition(4)
        out = str(tmp_path / "orc_dir")
        write_orc(ds, out)
        import os
        files = [f for f in os.listdir(out) if f.endswith(".orc")]
        assert len(files) >= 1  # one file per non-empty block

        back = read_orc(out).to_pandas().sort_values("a").reset_index(drop=True)
        pd.testing.assert_frame_equal(back, df)

        proj = read_orc(out, columns=["a"]).to_pandas()
        assert list(proj.columns) == ["a"]
        assert sorted(proj["a"]) == list(range(100))


class TestUnionByName:
    def test_aligns_order_and_fills_missing(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import union_by_name

        a = rd.from_pandas(pd.DataFrame({"x": [1, 2], "y": ["a", "b"]}))
        b = rd.from_pandas(pd.DataFrame({"y": ["c"], "x": [3],
                                         "z": [9.5]}))
        out = union_by_name(a, b).to_pandas().sort_values("x")
        assert list(out.columns) == ["x", "y", "z"]
        assert out["x"].tolist() == [1, 2, 3]
        assert out["z"].isna().tolist() == [True, True, False]

    def test_strict_and_type_conflicts_raise(self, ray_session):
        import pytest
        import ray.data as rd

        from biocurator_mapper_ray.sources.formats import union_by_name

        a = rd.from_pandas(pd.DataFrame({"x": [1]}))
        b = rd.from_pandas(pd.DataFrame({"x": [1], "y": [2]}))
        with pytest.raises(ValueError, match="missing columns"):
            union_by_name(a, b, strict=True)
        c = rd.from_pandas(pd.DataFrame({"x": ["s"]}))
        with pytest.raises(ValueError, match="conflicting"):
            union_by_name(a, c)
