"""Sequence packing / chunking tests: global md5-order offsets via the
distributed prefix sum, and fixed-window chunk text rebuild."""

import hashlib

import numpy as np
import pyarrow as pa

from biocurator_mapper_ray.ops.pack import chunk_spans, sequence_pack


def _key(seed, v):
    return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:15], 16)


class TestSequencePack:
    def test_offsets_match_brute_force_and_partition_invariant(self, ray_session):
        import ray.data as rd

        texts = {i: " ".join(["w"] * ((i * 13) % 7)) for i in range(40)}
        texts[3] = ""        # zero-token doc keeps a (width-0) place
        texts[5] = "   "     # whitespace-only is also zero tokens
        tbl = pa.table({"doc_id": list(texts), "text": list(texts.values())})

        order = sorted(texts, key=lambda i: (_key(42, i), i))
        start, expect = 0, {}
        for i in order:
            n = len(texts[i].split())
            expect[i] = (n, start, start // 16)
            start += n

        for parts in (1, 7):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = sequence_pack(ds, budget=16, shard_bits=3).to_pandas()
            assert len(got) == len(texts)
            for r in got.itertuples():
                assert expect[r.doc_id] == (r.n_tokens, r.tok_start, r.seq_id), r

    def test_total_tokens_conserved(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"doc_id": [0, 1, 2], "text": ["a b", "c", "d e f"]})
        got = sequence_pack(rd.from_arrow(tbl), budget=4).to_pandas()
        assert got["n_tokens"].sum() == 6
        assert sorted(got["tok_start"] + got["n_tokens"]) >= sorted(got["tok_start"])
        # offsets tile [0, total) exactly
        rows = sorted(zip(got["tok_start"], got["n_tokens"]))
        pos = 0
        for s, n in rows:
            assert s == pos
            pos += n
        assert pos == 6


class TestChunkSpans:
    def test_overlapping_windows(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"doc_id": [7], "text": ["t0 t1 t2 t3 t4"]})
        got = chunk_spans(rd.from_arrow(tbl), chunk_tokens=3,
                          stride=2).to_pandas()
        rows = [(r.chunk_id, r.tok_lo, r.tok_hi, r.chunk_text)
                for r in got.itertuples()]
        assert rows == [(0, 0, 3, "t0 t1 t2"), (1, 2, 5, "t2 t3 t4"),
                        (2, 4, 5, "t4")]

    def test_non_overlapping_default_and_empty_docs(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"doc_id": [0, 1, 2],
                        "text": ["a b c d", "", "  x  y  "]})
        got = chunk_spans(rd.from_arrow(tbl).repartition(3),
                          chunk_tokens=2).to_pandas()
        by_doc = {d: sorted(
            (r.chunk_id, r.chunk_text) for r in got.itertuples()
            if r.doc_id == d) for d in (0, 1, 2)}
        assert by_doc[0] == [(0, "a b"), (1, "c d")]
        assert by_doc[1] == []
        assert by_doc[2] == [(0, "x y")]

    def test_window_wider_than_doc(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"doc_id": [0], "text": ["only two"]})
        got = chunk_spans(rd.from_arrow(tbl), chunk_tokens=100).to_pandas()
        assert len(got) == 1
        assert got.loc[0, "chunk_text"] == "only two"
        assert got.loc[0, "tok_hi"] == 2


class TestBinPack:
    def test_budget_respected_and_deterministic(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.pack import bin_pack

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [" ".join(["w"] * int(k))
                     for k in rng.integers(1, 60, 200)]})
        a = bin_pack(rd.from_pandas(df).repartition(4),
                     budget=100).to_pandas()
        b = bin_pack(rd.from_pandas(df).repartition(9),
                     budget=100).to_pandas()
        # partition-invariant assignment
        assert dict(zip(a["doc_id"], a["bin_id"])) == \
            dict(zip(b["doc_id"], b["bin_id"]))
        sums = a.groupby("bin_id")["n_tokens"].sum()
        assert (sums <= 100).all()
        assert not a["oversize"].any()
        # packing efficiency: NFD within shards stays near optimal
        total = a["n_tokens"].sum()
        assert len(sums) <= int(np.ceil(total / 100)) + 64  # +1/shard

    def test_oversize_doc_gets_singleton_bin(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.pack import bin_pack

        df = pd.DataFrame({
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [" ".join(["w"] * 150), "w w", "w"]})
        got = bin_pack(rd.from_pandas(df), budget=100).to_pandas()
        big = got[got["doc_id"] == 1]
        assert bool(big["oversize"].iloc[0])
        # the oversize bin contains only that doc
        assert (got["bin_id"] == big["bin_id"].iloc[0]).sum() == 1
