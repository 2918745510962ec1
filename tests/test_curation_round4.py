"""Round-4 curation additions: leakage-safe grouped split, HLL
union/overlap sketch merge, URL canonicalization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestGroupedSplit:
    def test_group_coherent_and_exhaustive(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import grouped_split

        df = pd.DataFrame({
            "doc_id": np.arange(600),
            "source": [f"src{i % 17}" for i in range(600)],
        })
        out = grouped_split(
            rd.from_pandas(df).repartition(5),
            group_column="source", test_pct=30, seed=11,
        ).to_pandas()
        assert len(out) == 600
        assert set(out["split"]) <= {"train", "test"}
        # leakage safety: every group is entirely on one side
        sides = out.groupby("source")["split"].nunique()
        assert (sides == 1).all()
        # with 17 groups at 30% both sides should be populated
        assert out["split"].nunique() == 2

    def test_md5_parity_with_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import grouped_split

        df = pd.DataFrame({"doc_id": np.arange(50),
                           "source": [f"s{i % 9}" for i in range(50)]})
        out = grouped_split(rd.from_pandas(df), group_column="source",
                            test_pct=40, seed=7).to_pandas()
        want = duckdb.sql("""
            SELECT doc_id,
                   CASE WHEN CAST('0x' || substr(md5('7:' || source), 1, 16)
                             AS UBIGINT) % 100 < 40
                        THEN 'test' ELSE 'train' END AS split
            FROM df ORDER BY doc_id
        """).df()
        got = out.sort_values("doc_id").reset_index(drop=True)
        assert (got["split"].to_numpy() == want["split"].to_numpy()).all()


class TestHLLUnion:
    def test_union_and_overlap_estimates(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import (
            hll_union_estimate, hll_union_registers)

        # A = tok0000..tok2999, B = tok2000..tok4999 → |A∩B| = 1000,
        # |A∪B| = 5000, Jaccard = 0.2
        docs_a = [" ".join(f"tok{j:04d}" for j in range(i, i + 50))
                  for i in range(0, 2951, 50)]
        docs_b = [" ".join(f"tok{j:04d}" for j in range(i, i + 50))
                  for i in range(2000, 4951, 50)]
        ds_a = rd.from_items([{"text": d} for d in docs_a]).repartition(3)
        ds_b = rd.from_items([{"text": d} for d in docs_b]).repartition(3)
        merged = hll_union_registers(ds_a, ds_b, m=256)
        mdf = merged.to_pandas()
        assert (mdf["rank_union"]
                == mdf[["rank_a", "rank_b"]].max(axis=1)).all()
        est = hll_union_estimate(merged, m=256)
        assert abs(est["card_a"] - 3000) / 3000 < 0.25
        assert abs(est["card_b"] - 3000) / 3000 < 0.25
        assert abs(est["card_union"] - 5000) / 5000 < 0.25
        # intersection inherits both errors — generous band, but must
        # be far from 0 and far from |A|
        assert 300 < est["card_inter"] < 2200
        assert 0.05 < est["jaccard"] < 0.5

    def test_union_matches_concatenated_corpus(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import (
            hll_registers, hll_union_registers)

        docs_a = [f"alpha{i} beta{i % 7}" for i in range(40)]
        docs_b = [f"alpha{i + 20} gamma{i % 5}" for i in range(40)]
        ds_a = rd.from_items([{"text": d} for d in docs_a])
        ds_b = rd.from_items([{"text": d} for d in docs_b])
        merged = hll_union_registers(ds_a, ds_b, m=64).to_pandas()
        both = rd.from_items([{"text": d} for d in docs_a + docs_b])
        direct = hll_registers(both, m=64).to_pandas()
        got = merged[merged["rank_union"] > 0][
            ["register", "rank_union"]].reset_index(drop=True)
        want = direct.rename(columns={"max_rank": "rank_union"})
        pd.testing.assert_frame_equal(got, want.reset_index(drop=True))

    def test_disjoint_sides_zero_fill(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import hll_union_registers

        ds_a = rd.from_items([{"text": "only-in-a"}])
        ds_b = rd.from_items([{"text": "only-in-b"}])
        mdf = hll_union_registers(ds_a, ds_b, m=64).to_pandas()
        # each side contributes one register; the other side's rank is 0
        assert ((mdf["rank_a"] == 0) ^ (mdf["rank_b"] == 0)).all() or \
            len(mdf) == 1  # unless both tokens hash to one register


class TestCanonicalizeUrl:
    def canon(self, urls):
        from biocurator_mapper_ray.ops.normalize import canonicalize_url

        t = pa.table({"url": pa.array(urls, pa.string())})
        return canonicalize_url(t).column("url_canon").to_pylist()

    def test_case_port_fragment_tracking_sort(self):
        got = self.canon([
            "HTTP://Site3.EXAMPLE.com:80/p1?z=2&utm_source=news&a=4#s9",
            "HTTPS://CDN5.Example.org:443/x/y/?b=1",
            "https://api.example.net:8443/v1?k=3",
        ])
        assert got == [
            "http://site3.example.com/p1?a=4&z=2",
            "https://cdn5.example.org/x/y/?b=1",
            "https://api.example.net:8443/v1?k=3",
        ]

    def test_empty_path_and_only_tracking_params(self):
        got = self.canon([
            "http://host.com",
            "http://h.com/?utm_campaign=x&gclid=abc&fbclid=z",
        ])
        assert got == ["http://host.com/", "http://h.com/"]

    def test_non_urls_and_empty_pass_as_empty(self):
        assert self.canon(["not a url", "", "ftp//x"]) == ["", "", ""]

    def test_non_http_scheme_port_kept(self):
        # unknown scheme has no default port → port kept
        assert self.canon(["ftp://Files.Example.com:21/a"]) == [
            "ftp://files.example.com:21/a"]

    def test_param_sort_is_bytewise(self):
        got = self.canon(["http://h.com/p?b=1&B=2&a=3"])
        assert got == ["http://h.com/p?B=2&a=3&b=1"]

    def test_query_case_preserved_path_case_preserved(self):
        got = self.canon(["HTTP://H.com/CaseD/Path?Key=Val"])
        assert got == ["http://h.com/CaseD/Path?Key=Val"]


class TestKFold:
    def test_disjoint_exhaustive_and_parity(self, ray_session):
        import duckdb
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import kfold_split

        df = pd.DataFrame({"doc_id": np.arange(300)})
        out = kfold_split(rd.from_pandas(df).repartition(4), k=5,
                          seed=3).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert set(out["fold"]) == set(range(5))
        want = duckdb.sql("""
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5('3:' || CAST(doc_id AS VARCHAR)),
                                            1, 16) AS UBIGINT) % 5
                        AS BIGINT) AS fold
            FROM df ORDER BY doc_id
        """).df()
        assert (out["fold"].to_numpy() == want["fold"].to_numpy()).all()


class TestVocabCoverage:
    def _exact(self, docs, p_bp):
        from collections import Counter

        c = Counter(t for d in docs for t in d.lower().split())
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(c.values())
        cum, want = 0, []
        for t, n in items:
            if 10000 * cum < p_bp * total:
                want.append((t, n))
            cum += n
        return pd.DataFrame(want, columns=["token", "n"])

    @pytest.mark.parametrize("p_bp", [5000, 8000, 9990])
    def test_matches_exact_nucleus(self, ray_session, p_bp):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_coverage

        # Zipf-ish: token i appears ~200/(i+1) times → the boundary
        # group is non-trivial at every p level
        toks = []
        for i in range(150):
            toks.extend([f"w{i:03d}"] * (200 // (i + 1) + 1))
        docs = [" ".join(toks[j:j + 40]) for j in range(0, len(toks), 40)]
        ds = rd.from_items([{"text": d} for d in docs]).repartition(4)
        got = vocab_coverage(ds, p_bp=p_bp).to_pandas().reset_index(drop=True)
        want = self._exact(docs, p_bp)
        want["n"] = want["n"].astype(got["n"].dtype)
        pd.testing.assert_frame_equal(got, want)

    def test_boundary_ties_resolved_lexicographically(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_coverage

        # 10 tokens all with count 3 → p=0.5 keeps exactly the 5
        # lexicographically smallest
        docs = [" ".join(f"t{i}" for i in range(10))] * 3
        ds = rd.from_items([{"text": d} for d in docs]).repartition(2)
        got = vocab_coverage(ds, p_bp=5000).to_pandas()
        assert got["token"].tolist() == [f"t{i}" for i in range(5)]

    def test_max_partial_cap_raises(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_coverage

        docs = [" ".join(f"u{i}" for i in range(50))]
        ds = rd.from_items([{"text": d} for d in docs])
        with pytest.raises(ValueError, match="max_partial"):
            vocab_coverage(ds, p_bp=5000, max_partial=3)

    def test_empty_corpus(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_coverage

        ds = rd.from_items([{"text": "   "}])
        assert vocab_coverage(ds, p_bp=8000).count() == 0


class TestWinnowFingerprints:
    def run_op(self, docs, **kw):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import winnow_fingerprints

        ds = rd.from_items([{"doc_id": i, "text": d}
                            for i, d in enumerate(docs)]).repartition(2)
        return winnow_fingerprints(ds, **kw).to_pandas()

    def test_guarantee_shared_run_shares_fingerprint(self, ray_session):
        # winnowing guarantee: any shared token run of length
        # k + window - 1 (= 8 here) yields ≥1 common fingerprint
        shared = "alpha beta gamma delta epsilon zeta eta theta"
        docs = [f"one two three {shared} four five",
                f"nine eight {shared} seven six"]
        out = self.run_op(docs, k=5, window=4)
        fps = {d: set(g["fp"]) for d, g in out.groupby("doc_id")}
        assert fps[0] & fps[1]

    def test_short_docs_emit_nothing(self, ray_session):
        out = self.run_op(["a b c", "x", ""], k=3, window=4)
        # 3 grams need k+window-1 = 6 tokens for one full window
        assert len(out) == 0

    def test_repetitive_doc_collapses(self, ray_session):
        out = self.run_op(["x x x x x x x x x x"], k=3, window=4)
        # all grams identical → one distinct fingerprint
        assert len(out) == 1

    def test_matches_pure_python_reference(self, ray_session):
        import hashlib

        docs = ["the quick brown fox jumps over the lazy dog again",
                "pack my box with five dozen liquor jugs today now"]
        k, w = 3, 4
        want = set()
        for d, text in enumerate(docs):
            toks = text.lower().split()
            grams = [" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1)]
            hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                  for g in grams]
            for i in range(len(hs) - w + 1):
                want.add((d, min(hs[i:i + w])))
        out = self.run_op(docs, k=k, window=w)
        got = set(zip(out["doc_id"], out["fp"]))
        assert got == want


class TestDedupLinesGlobal:
    def run_op(self, docs):
        import ray.data as rd

        from biocurator_mapper_ray.ops.boilerplate import dedup_lines_global

        ds = rd.from_items([{"doc_id": k, "text": v}
                            for k, v in docs.items()]).repartition(3)
        return dedup_lines_global(ds).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

    def exact(self, docs):
        seen, want = set(), {}
        for d in sorted(docs):
            kept, r = [], 0
            for line in docs[d].split("\n"):
                if line in seen:
                    r += 1
                else:
                    seen.add(line)
                    kept.append(line)
            want[d] = ("\n".join(kept), r)
        return want

    def test_first_occurrence_wins_cross_and_within_doc(self, ray_session):
        docs = {0: "hello\nshared\nworld",
                1: "shared\nunique1\nhello",
                2: "unique2\nworld\nshared",
                3: "shared\nshared\nonly3",
                4: ""}
        out = self.run_op(docs)
        want = self.exact(docs)
        for _, row in out.iterrows():
            t, r = want[row["doc_id"]]
            assert row["text_dedup"] == t and row["n_removed"] == r

    def test_all_docs_identical_one_survivor(self, ray_session):
        docs = {i: "a\nb\nc" for i in range(8)}
        out = self.run_op(docs)
        assert out.loc[out.doc_id == 0, "text_dedup"].iloc[0] == "a\nb\nc"
        assert (out.loc[out.doc_id > 0, "text_dedup"] == "").all()
        assert (out.loc[out.doc_id > 0, "n_removed"] == 3).all()

    def test_no_duplicates_identity(self, ray_session):
        docs = {i: f"u{i}a\nu{i}b" for i in range(5)}
        out = self.run_op(docs)
        assert (out["n_removed"] == 0).all()
        for _, row in out.iterrows():
            assert row["text_dedup"] == docs[row["doc_id"]]


class TestKMV:
    def test_matches_exact_min_hashes(self, ray_session):
        import hashlib

        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import kmv_sample

        vocab = [f"tok{i:04d}" for i in range(500)]
        docs = [" ".join(vocab[i:i + 25]) for i in range(0, 500, 5)]
        ds = rd.from_items([{"text": d} for d in docs]).repartition(4)
        out = kmv_sample(ds, k=32).to_pandas()
        want = sorted((int(hashlib.md5(t.encode()).hexdigest()[:15], 16), t)
                      for t in vocab)[:32]
        assert list(zip(out["h"], out["token"])) == want

    def test_estimator_accuracy_and_small_domain(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import kmv_estimate, kmv_sample

        vocab = [f"v{i:05d}" for i in range(5000)]
        docs = [" ".join(vocab[i:i + 50]) for i in range(0, 5000, 50)]
        ds = rd.from_items([{"text": d} for d in docs]).repartition(4)
        k = 128
        sample = kmv_sample(ds, k=k).to_pandas()
        est = kmv_estimate(sample, k)
        assert abs(est - 5000) / 5000 < 0.3
        # domain smaller than k → exact
        tiny = rd.from_items([{"text": "a b c"}])
        s2 = kmv_sample(tiny, k=10).to_pandas()
        assert kmv_estimate(s2, 10) == 3.0


class TestNgramDiversity:
    def test_counts_and_ratio(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import ngram_diversity

        docs = {0: "a b a b a",      # bigrams: ab ba ab ba → 4 total 2 distinct
                1: "x y z w",         # 3 total 3 distinct
                2: "solo",            # < n tokens → absent
                3: "r r r r r r"}     # 5 total 1 distinct
        ds = rd.from_items([{"doc_id": k, "text": v}
                            for k, v in docs.items()]).repartition(2)
        out = ngram_diversity(ds, n=2).to_pandas().set_index("doc_id")
        assert 2 not in out.index
        assert out.loc[0, "n_grams"] == 4 and out.loc[0, "n_distinct"] == 2
        assert out.loc[0, "diversity_bp"] == 5000
        assert out.loc[1, "n_grams"] == 3 and out.loc[1, "n_distinct"] == 3
        assert out.loc[1, "diversity_bp"] == 10000
        assert out.loc[3, "n_grams"] == 5 and out.loc[3, "n_distinct"] == 1
        assert out.loc[3, "diversity_bp"] == 2000


class TestRankingMetrics:
    def test_hits_misses_and_mrr(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import ranking_metrics

        ranked = rd.from_items([
            {"q": 1, "item": 10, "rank": 1},
            {"q": 1, "item": 11, "rank": 2},
            {"q": 2, "item": 20, "rank": 1},
            {"q": 2, "item": 21, "rank": 2},
            {"q": 2, "item": 22, "rank": 3},
        ]).repartition(2)
        gold = rd.from_items([
            {"q": 1, "item": 11},   # rank 2 → rr 5000, hit@2 yes
            {"q": 2, "item": 22},   # rank 3 → rr 3333, hit@2 no
            {"q": 3, "item": 99},   # not retrieved → all zero
        ]).repartition(2)
        out = ranking_metrics(ranked, gold, query_col="q",
                              item_col="item", rank_col="rank",
                              k=2).to_pandas().sort_values(
            "q").reset_index(drop=True)
        assert out["found_rank"].tolist() == [2, 3, 0]
        assert out["hit_at_k"].tolist() == [1, 0, 0]
        assert out["rr_bp"].tolist() == [5000, 3333, 0]

    def test_duplicate_candidate_takes_best_rank(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import ranking_metrics

        ranked = rd.from_items([
            {"q": 1, "item": 5, "rank": 4},
            {"q": 1, "item": 5, "rank": 2},
        ])
        gold = rd.from_items([{"q": 1, "item": 5}])
        out = ranking_metrics(ranked, gold, query_col="q",
                              item_col="item", rank_col="rank",
                              k=3).to_pandas()
        assert out["found_rank"].tolist() == [2]
        assert out["hit_at_k"].tolist() == [1]


class TestSplitLeakage:
    def test_cross_split_pairs_only(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import split_leakage_pairs

        rows = [
            {"doc_id": 0, "text": "same", "split": "train"},
            {"doc_id": 1, "text": "same", "split": "test"},
            {"doc_id": 2, "text": "same", "split": "train"},
            {"doc_id": 3, "text": "other", "split": "train"},
            {"doc_id": 4, "text": "other", "split": "train"},
            {"doc_id": 5, "text": "solo", "split": "test"},
        ]
        ds = rd.from_items(rows).repartition(3)
        out = split_leakage_pairs(ds).to_pandas().sort_values(
            ["a", "b"]).reset_index(drop=True)
        # 'same' group: (0,1) and (1,2) cross; (0,2) same-side;
        # 'other' group all train → no rows
        assert list(zip(out["a"], out["b"])) == [(0, 1), (1, 2)]
        assert (out["split_a"] != out["split_b"]).all()

    def test_clean_split_emits_nothing(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import split_leakage_pairs

        rows = [{"doc_id": i, "text": f"t{i}", "split": "train"}
                for i in range(10)]
        ds = rd.from_items(rows).repartition(2)
        assert split_leakage_pairs(ds).count() == 0


class TestMixtureSchedule:
    def test_weights_drive_interleave_density(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import mixture_schedule

        rows = ([{"doc_id": i, "source": "big"} for i in range(100)]
                + [{"doc_id": 100 + i, "source": "small"}
                   for i in range(100)])
        ds = rd.from_items(rows).repartition(4)
        out = mixture_schedule(
            ds, group_column="source", key_column="doc_id",
            weights={"big": 5000, "small": 1000}, seed=1,
        ).to_pandas()
        # rank r of weight-w source schedules at r*10000//w
        big = out[out["source"] == "big"].sort_values("rnk")
        small = out[out["source"] == "small"].sort_values("rnk")
        assert (big["mix_pos"].to_numpy()
                == big["rnk"].to_numpy() * 10000 // 5000).all()
        assert (small["mix_pos"].to_numpy()
                == small["rnk"].to_numpy() * 10000 // 1000).all()
        # in the first window (positions ≤ 100) big appears ~5× more
        head = out[out["mix_pos"] <= 100]
        nb = (head["source"] == "big").sum()
        nsml = (head["source"] == "small").sum()
        assert nb == 50 and nsml == 10

    def test_deterministic_across_partitionings(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import mixture_schedule

        rows = [{"doc_id": i, "source": f"s{i % 3}"} for i in range(60)]
        outs = []
        for parts in (1, 5):
            ds = rd.from_items(rows).repartition(parts)
            o = mixture_schedule(ds, group_column="source",
                                 key_column="doc_id",
                                 weights={"s0": 3000}, seed=9)
            outs.append(o.to_pandas().sort_values("doc_id")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
