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


class TestCdcChunks:
    def _chunks(self, texts, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.pack import cdc_chunks

        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = cdc_chunks(rd.from_pandas(df).repartition(2),
                         **kw).to_pandas()
        out = {}
        for r in got.sort_values(["doc_id", "chunk_id"]).itertuples():
            out.setdefault(int(r.doc_id), []).append(
                (int(r.chunk_id), r.chunk_text, int(r.n_tokens)))
        return out

    def test_reconstruction_and_short_doc(self, ray_session):
        rng = np.random.default_rng(5)
        words = [f"w{v}" for v in rng.integers(0, 50, size=400)]
        long_doc = " ".join(words)
        got = self._chunks([long_doc, "a b", ""], k=3, divisor=4)
        # chunks concatenate back to the normalized token stream
        assert " ".join(t for _, t, _ in got[0]) == long_doc
        assert [c for c, _, _ in got[0]] == list(range(len(got[0])))
        assert sum(n for _, _, n in got[0]) == 400
        assert len(got[0]) > 1  # divisor 4 on 400 tokens must cut
        # doc shorter than k: single chunk, no gram to flag
        assert got[1] == [(0, "a b", 2)]
        assert 2 not in got  # empty doc emits nothing

    def test_edit_locality(self, ray_session):
        rng = np.random.default_rng(9)
        words = [f"t{v}" for v in rng.integers(0, 40, size=300)]
        base = self._chunks([" ".join(words)], k=3, divisor=8)[0]
        edited_words = words[:5] + ["INSERTED"] + words[5:]
        edit = self._chunks([" ".join(edited_words)], k=3, divisor=8)[0]
        base_texts = [t for _, t, _ in base]
        edit_texts = [t for _, t, _ in edit]
        # content-defined boundaries resynchronize: the chunk suffix
        # after the edit region is byte-identical
        tail = min(len(base_texts), len(edit_texts)) - 2
        assert tail > 3
        assert base_texts[-tail:] == edit_texts[-tail:]

    def test_partition_invariance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.pack import cdc_chunks

        rng = np.random.default_rng(3)
        texts = [" ".join(f"x{v}" for v in
                          rng.integers(0, 30, size=rng.integers(0, 60)))
                 for _ in range(40)]
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        a = cdc_chunks(rd.from_pandas(df).repartition(1),
                       divisor=4).to_pandas()
        b = cdc_chunks(rd.from_pandas(df).repartition(13),
                       divisor=4).to_pandas()
        key = ["doc_id", "chunk_id"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True))
