"""Featurization ops: hashing trick, rare-category bucketing, skip-gram
pairs, global row-id assignment — each pinned against a brute-force
pandas/hashlib reference and checked partition-invariant."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from biocurator_mapper_ray.ops.feature import (bucket_rare_values,
                                               feature_hash_counts)
from biocurator_mapper_ray.ops.lm import skipgram_pairs
from biocurator_mapper_ray.ops.pack import assign_row_ids

DOCS = {
    0: "the cat sat on the mat",
    1: "the dog  sat\ton the LOG",   # mixed whitespace + case folds
    2: "",                            # zero tokens
    3: "   ",                         # whitespace-only
    4: "one",
    5: "a b a b a b c",
    6: "the cat sat on the mat",      # exact dup of 0
}


def _docs_table():
    return pa.table({"doc_id": list(DOCS), "text": list(DOCS.values())})


def _tok(s):
    return [w for w in s.lower().split() if w]


class TestFeatureHash:
    def test_matches_per_row_hashlib(self, ray_session):
        import ray.data as rd

        expect = {}
        for i, s in DOCS.items():
            for w in _tok(s):
                b = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 64
                expect[(i, b)] = expect.get((i, b), 0) + 1

        for parts in (1, 5):
            ds = rd.from_arrow(_docs_table()).repartition(parts)
            got = feature_hash_counts(ds, n_features=64).to_pandas()
            assert {(r.doc_id, r.feature): r.n
                    for r in got.itertuples()} == expect

    def test_empty_docs_emit_nothing(self, ray_session):
        import ray.data as rd

        got = feature_hash_counts(
            rd.from_arrow(_docs_table()), n_features=8).to_pandas()
        assert not set(got["doc_id"]) & {2, 3}
        # total counts conserve total tokens
        assert got["n"].sum() == sum(len(_tok(s)) for s in DOCS.values())


class TestSkipgramPairs:
    @staticmethod
    def _brute(window, min_count):
        cnt = {}
        for s in DOCS.values():
            ws = _tok(s)
            for i in range(len(ws)):
                for d in range(1, window + 1):
                    if i + d < len(ws):
                        k = (ws[i], ws[i + d])
                        cnt[k] = cnt.get(k, 0) + 1
        return {k: v for k, v in cnt.items() if v >= min_count}

    @pytest.mark.parametrize("window,min_count", [(1, 1), (3, 2), (10, 1)])
    def test_matches_brute_force(self, ray_session, window, min_count):
        import ray.data as rd

        expect = self._brute(window, min_count)
        for parts in (1, 4):
            ds = rd.from_arrow(_docs_table()).repartition(parts)
            got = skipgram_pairs(ds, window=window,
                                 min_count=min_count).to_pandas()
            assert {(r.w1, r.w2): r.pair_count
                    for r in got.itertuples()} == expect

    def test_window_1_equals_bigrams(self, ray_session):
        import ray.data as rd

        got = skipgram_pairs(rd.from_arrow(_docs_table()), window=1,
                             min_count=1).to_pandas()
        # "the cat" appears in docs 0 and 6
        m = {(r.w1, r.w2): r.pair_count for r in got.itertuples()}
        assert m[("the", "cat")] == 2
        assert m[("a", "b")] == 3
        assert ("b", "a") in m and m[("b", "a")] == 2


class TestBucketRareValues:
    def test_matches_pandas(self, ray_session):
        import ray.data as rd

        vals = ["x"] * 5 + ["y"] * 3 + ["z"] * 1 + ["w"] * 4
        tbl = pa.table({"id": list(range(len(vals))), "v": vals})
        counts = pd.Series(vals).value_counts()
        keep = set(counts[counts >= 4].index)
        for parts in (1, 3):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = bucket_rare_values(ds, columns="v", min_count=4) \
                .to_pandas().sort_values("id")
            expect = [v if v in keep else "__other__" for v in vals]
            assert list(got["v_bucketed"]) == expect
            # passthrough columns intact
            assert list(got["v"]) == vals

    def test_multi_column_key_and_sep(self, ray_session):
        import ray.data as rd

        tbl = pa.table({
            "id": [0, 1, 2, 3],
            "a": ["p", "p", "p", "q"],
            "b": ["1", "1", "2", "1"],
        })
        got = bucket_rare_values(
            rd.from_arrow(tbl), columns=["a", "b"], min_count=2,
            out_column="cat").to_pandas().sort_values("id")
        assert list(got["cat"]) == ["p:1", "p:1", "__other__", "__other__"]

    def test_cap_warns_and_keeps_top(self, ray_session):
        import ray.data as rd

        vals = ["a"] * 5 + ["b"] * 4 + ["c"] * 3
        tbl = pa.table({"id": list(range(len(vals))), "v": vals})
        with pytest.warns(UserWarning, match="capped"):
            got = bucket_rare_values(
                rd.from_arrow(tbl), columns="v", min_count=2,
                max_keep=2).to_pandas().sort_values("id")
        assert list(got["v_bucketed"]) == (
            ["a"] * 5 + ["b"] * 4 + ["__other__"] * 3)

    def test_all_rare(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"id": [0, 1], "v": ["a", "b"]})
        got = bucket_rare_values(rd.from_arrow(tbl), columns="v",
                                 min_count=3).to_pandas()
        assert set(got["v_bucketed"]) == {"__other__"}


class TestAssignRowIds:
    def test_permutation_in_md5_order(self, ray_session):
        import ray.data as rd

        ids = list(range(57))
        tbl = pa.table({"doc_id": ids})
        order = sorted(ids, key=lambda i: (
            int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:15], 16), i))
        expect = {doc: r for r, doc in enumerate(order)}
        for parts in (1, 6):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = assign_row_ids(ds, seed=7, shard_bits=3).to_pandas()
            assert {r.doc_id: r.row_id
                    for r in got.itertuples()} == expect
            assert sorted(got["row_id"]) == ids

    def test_empty_input(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        assert assign_row_ids(ds).count() == 0


class TestMaskTokens:
    def test_matches_per_row_hashlib(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import mask_tokens

        def brute(i, s, pct=30, seed=7):
            ws = [w for w in s.lower().split() if w]
            out, nm = [], 0
            for p, w in enumerate(ws, start=1):
                h = int(hashlib.md5(
                    f"{i}:{p}:{seed}".encode()).hexdigest()[:15], 16)
                if h % 100 < pct:
                    out.append("[MASK]")
                    nm += 1
                else:
                    out.append(w)
            return " ".join(out), len(ws), nm

        expect = {i: brute(i, s) for i, s in DOCS.items()}
        for parts in (1, 5):
            ds = rd.from_arrow(_docs_table()).repartition(parts)
            got = mask_tokens(ds, pct=30, seed=7).to_pandas()
            assert {r.doc_id: (r.masked_text, r.n_tokens, r.n_masked)
                    for r in got.itertuples()} == expect
        # empty docs come back with empty text, zero counts
        assert expect[2] == ("", 0, 0)

    def test_pct_zero_and_hundred(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import mask_tokens

        ds = rd.from_arrow(_docs_table())
        none = mask_tokens(ds, pct=0).to_pandas()
        assert (none["n_masked"] == 0).all()
        allm = mask_tokens(ds, pct=100).to_pandas()
        assert (allm["n_masked"] == allm["n_tokens"]).all()
        row = allm.set_index("doc_id").loc[5]
        assert row["masked_text"] == " ".join(["[MASK]"] * 7)


class TestSpanCorrupt:
    @staticmethod
    def _brute(i, s, S=6, L=2, seed=11):
        ws = [w for w in s.lower().split() if w]
        n_spans = len(ws) // S
        spans = []
        for k in range(n_spans):
            h = int(hashlib.md5(
                f"{i}:{k}:{seed}".encode()).hexdigest()[:15], 16)
            off = h % (S - L + 1)
            spans.append((k, k * S + off))
        corr, tgt = [], []
        masked = {k * 0 + p for k, st in spans for p in range(st, st + L)}
        starts = {st: k for k, st in spans}
        for p, w in enumerate(ws):
            if p in starts:
                corr.append(f"<extra_id_{starts[p]}>")
                tgt.extend([f"<extra_id_{starts[p]}>", w])
            elif p in masked:
                tgt.append(w)
            else:
                corr.append(w)
        return " ".join(corr), " ".join(tgt), n_spans

    def test_matches_per_row_hashlib(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import span_corrupt

        docs = dict(DOCS)
        docs[7] = " ".join(f"w{j}" for j in range(40))  # 6 full segments
        docs[8] = " ".join(f"x{j}" for j in range(13))  # 2 segments + tail
        tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
        expect = {i: self._brute(i, s) for i, s in docs.items()}
        for parts in (1, 4):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = span_corrupt(ds, seg_tokens=6, span_tokens=2,
                               seed=11).to_pandas()
            assert {r.doc_id: (r.corrupted_text, r.target_text, r.n_spans)
                    for r in got.itertuples()} == expect

    def test_short_docs_pass_through(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import span_corrupt

        got = span_corrupt(rd.from_arrow(_docs_table()), seg_tokens=100,
                           span_tokens=3).to_pandas()
        m = got.set_index("doc_id")
        assert (m["n_spans"] == 0).all()
        assert m.loc[0, "corrupted_text"] == DOCS[0]
        assert (m["target_text"] == "").all()

    def test_token_conservation(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import span_corrupt

        docs = {1: " ".join(f"t{j}" for j in range(50))}
        got = span_corrupt(
            rd.from_arrow(pa.table({"doc_id": [1],
                                    "text": [docs[1]]})),
            seg_tokens=8, span_tokens=3, seed=2).to_pandas().iloc[0]
        corr = got["corrupted_text"].split()
        tgt = got["target_text"].split()
        sents = {w for w in corr if w.startswith("<extra_id_")}
        # every original token appears exactly once across the pair
        originals = [w for w in corr + tgt if not w.startswith("<extra_id_")]
        assert sorted(originals) == sorted(docs[1].split())
        # sentinel sets agree between the two sides
        assert sents == {w for w in tgt if w.startswith("<extra_id_")}
        assert got["n_spans"] == 6 and len(sents) == 6


class TestFimSplit:
    @staticmethod
    def _brute(i, s, seed=13):
        ws = [w for w in s.lower().split() if w]
        n = len(ws)
        c1 = int(hashlib.md5(f"{i}:a:{seed}".encode()).hexdigest()[:15],
                 16) % (n + 1)
        c2 = int(hashlib.md5(f"{i}:b:{seed}".encode()).hexdigest()[:15],
                 16) % (n + 1)
        lo, hi = min(c1, c2), max(c1, c2)
        return (" ".join(ws[:lo]), " ".join(ws[lo:hi]), " ".join(ws[hi:]),
                n, lo, hi)

    def test_matches_per_row_hashlib(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import fim_split

        expect = {i: self._brute(i, s) for i, s in DOCS.items()}
        for parts in (1, 5):
            ds = rd.from_arrow(_docs_table()).repartition(parts)
            got = fim_split(ds, seed=13).to_pandas()
            assert {r.doc_id: (r.prefix_text, r.middle_text, r.suffix_text,
                               r.n_tokens, r.cut_lo, r.cut_hi)
                    for r in got.itertuples()} == expect
        # empty doc: all three segments empty, cuts at zero
        assert expect[2] == ("", "", "", 0, 0, 0)

    def test_segments_reassemble(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.lm import fim_split

        got = fim_split(rd.from_arrow(_docs_table()), seed=99).to_pandas()
        for r in got.itertuples():
            joined = " ".join(x for x in (r.prefix_text, r.middle_text,
                                          r.suffix_text) if x)
            assert joined.split() == _tok(DOCS[r.doc_id])
            assert 0 <= r.cut_lo <= r.cut_hi <= r.n_tokens


class TestCalendarFeatures:
    def test_known_timestamps(self, ray_session):
        import pandas as pd
        import pyarrow as pa

        from biocurator_mapper_ray.ops.feature import calendar_features

        # 2026-08-17 is a Monday; 2026-08-22 a Saturday
        ts = pd.to_datetime(["2026-08-17 00:05:00",
                             "2026-08-22 23:59:59",
                             "2026-12-20 12:00:00"])  # Sunday
        t = pa.table({"ts": pa.array(ts)})
        out = calendar_features(t)
        assert out.column("dow").to_pylist() == [0, 5, 6]
        assert out.column("hour").to_pylist() == [0, 23, 12]
        assert out.column("month").to_pylist() == [8, 8, 12]
        assert out.column("is_weekend").to_pylist() == [0, 1, 1]
