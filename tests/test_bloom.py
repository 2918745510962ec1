"""Bloom filter sketch + bloom-prefiltered semi join (ops/sketch.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest


def _expected_bits(keys, k=4, m_bits=8192):
    bits = set()
    for key in keys:
        for j in range(k):
            h = int(hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:16], 16)
            bits.add(h % m_bits)
    return sorted(bits)


class TestBloomBits:
    def test_register_parity_with_hashlib(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_bits

        keys = [3, 17, 99, 1234, 888888]
        ds = rd.from_items([{"k": v} for v in keys]).repartition(3)
        got = bloom_bits(ds, key_column="k", k=4, m_bits=8192).to_pandas()
        assert got["bit"].tolist() == _expected_bits(keys)

    def test_string_keys_and_duplicates(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_bits

        ds = rd.from_items([{"k": s} for s in ["a", "b", "a", "a", "b"]])
        got = bloom_bits(ds, key_column="k", k=3, m_bits=1024).to_pandas()
        assert got["bit"].tolist() == _expected_bits(["a", "b"], k=3,
                                                     m_bits=1024)

    def test_float_keys_rejected(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_bits

        ds = rd.from_items([{"k": 1.5}])
        with pytest.raises(Exception, match="integer or string"):
            bloom_bits(ds, key_column="k").count()

    def test_contains_no_false_negatives(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_bits, bloom_contains

        keys = list(range(100))
        ds = rd.from_items([{"k": v} for v in keys])
        bits = bloom_bits(ds, key_column="k", k=4, m_bits=8192).to_pandas()
        probe = bloom_contains(bits, keys + [10_000 + i for i in range(200)],
                               k=4, m_bits=8192)
        assert all(probe[v] for v in keys)  # never a false negative
        # at k=4, m/n≈20 the fp rate is ~0.1%; 200 absent probes should
        # be overwhelmingly False (deterministic given the md5 hash)
        fp = sum(probe[10_000 + i] for i in range(200))
        assert fp <= 2


class TestBloomSemiJoin:
    def test_matches_exact_semi_join(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_semi_join

        rng = np.random.default_rng(7)
        left = pd.DataFrame({
            "lk": rng.integers(0, 500, 3000),
            "payload": rng.integers(0, 10**6, 3000),
        })
        right = pd.DataFrame({"rk": rng.choice(500, 120, replace=False)})
        out = bloom_semi_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(2),
            "lk", "rk", k=4, m_bits=4096,
            left_columns=["lk", "payload"],
        ).to_pandas().sort_values(["lk", "payload"]).reset_index(drop=True)
        want = (left[left["lk"].isin(set(right["rk"]))]
                .sort_values(["lk", "payload"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(out[["lk", "payload"]], want,
                                      check_dtype=False)

    def test_prefilter_only_is_superset(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_semi_join

        rng = np.random.default_rng(11)
        left = pd.DataFrame({"lk": rng.integers(0, 2000, 4000)})
        right = pd.DataFrame({"rk": rng.choice(2000, 50, replace=False)})
        cand = bloom_semi_join(
            rd.from_pandas(left), rd.from_pandas(right), "lk", "rk",
            k=4, m_bits=2048, recheck=False,
        ).to_pandas()
        true_keys = set(right["rk"])
        n_true = int(left["lk"].isin(true_keys).sum())
        # superset of true matches, with a small false-positive tail
        assert len(cand) >= n_true
        assert set(left[left["lk"].isin(true_keys)]["lk"]) <= set(cand["lk"])
        assert len(cand) <= n_true + 0.05 * len(left)

    def test_empty_right_side(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import bloom_semi_join

        left = pd.DataFrame({"lk": [1, 2, 3]})
        right = pd.DataFrame({"rk": pd.array([], dtype="int64")})
        out = bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                              "lk", "rk", m_bits=1024)
        assert out.count() == 0


class TestNovelAgainst:
    def test_only_novel_content_survives(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import novel_against

        base = rd.from_items(
            [{"doc_id": i, "text": f"base doc {i}"} for i in range(50)]
            + [{"doc_id": 100, "text": "shared text one"},
               {"doc_id": 101, "text": "shared text two"}]).repartition(3)
        new = rd.from_items([
            {"doc_id": 200, "text": "novel alpha"},
            {"doc_id": 201, "text": "shared text one"},
            {"doc_id": 202, "text": "novel beta"},
            {"doc_id": 203, "text": "shared text two"},
            {"doc_id": 204, "text": "base doc 7"},
        ]).repartition(2)
        out = (novel_against(new, base).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [200, 202]
        assert out["text"].tolist() == ["novel alpha", "novel beta"]

    def test_empty_base_keeps_everything(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import novel_against

        new = rd.from_items([{"doc_id": 1, "text": "a"},
                             {"doc_id": 2, "text": "b"}])
        base = rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.array([], dtype="int64"),
             "text": pd.array([], dtype="string")}))
        assert novel_against(new, base).count() == 2

    def test_duplicate_within_shard_both_kept(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import novel_against

        # novelty is vs BASE only; intra-shard dedup is exact_dedup's job
        new = rd.from_items([{"doc_id": 1, "text": "same"},
                             {"doc_id": 2, "text": "same"}])
        base = rd.from_items([{"doc_id": 9, "text": "other"}])
        assert novel_against(new, base).count() == 2


class TestHeavyHitters:
    def test_exact_vs_brute_force_with_tight_summary(self, ray_session):
        import collections

        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import heavy_hitters

        rng = np.random.default_rng(3)
        # zipf-ish: few frequent tokens + a long tail, many batches
        vocab = [f"tok{i}" for i in range(300)]
        probs = np.array([1.0 / (i + 1) for i in range(300)])
        probs /= probs.sum()
        docs = [" ".join(rng.choice(vocab, size=40, p=probs))
                for _ in range(200)]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(8)
        counter = collections.Counter(
            t for d in docs for t in d.lower().split())
        for thr in (50, 150):
            got = heavy_hitters(ds, threshold=thr, summary_k=16)
            want = {t: c for t, c in counter.items() if c >= thr}
            assert dict(zip(got["token"], got["n"])) == want, thr

    def test_empty_and_no_hitters(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import heavy_hitters

        ds = rd.from_pandas(pd.DataFrame({"text": ["a b", "c"]}))
        assert len(heavy_hitters(ds, threshold=10)) == 0
        empty = ds.filter(lambda r: False)
        assert len(heavy_hitters(empty, threshold=1)) == 0


class TestQuantileSketch:
    def test_rank_error_within_bound(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import quantile_sketch

        rng = np.random.default_rng(13)
        n, k = 60_000, 256
        x = rng.normal(0, 100, size=n)
        ds = rd.from_pandas(pd.DataFrame({"x": x})).repartition(24)
        got = quantile_sketch(ds, value="x", k=k,
                              qs=(0.1, 0.5, 0.9, 0.99))
        assert set(got["n"]) == {n}
        xs = np.sort(x)
        for r in got.itertuples():
            true_rank = np.searchsorted(xs, r.est)
            # 2-level compaction: ~2n/k bound, asserted with 2x slack
            assert abs(true_rank - r.q * n) <= 4 * n / k, (r.q, true_rank)

    def test_exact_when_small(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import quantile_sketch

        ds = rd.from_pandas(pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0]}))
        got = quantile_sketch(ds, value="x", k=64, qs=(0.5, 1.0))
        assert got[got["q"] == 1.0]["est"].iloc[0] == 4.0
        assert got["n"].iloc[0] == 4

    def test_empty_input(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import quantile_sketch

        ds = rd.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=float)}))
        got = quantile_sketch(ds, value="x", k=16, qs=(0.5,))
        assert got["n"].iloc[0] == 0
