"""Funnel, cohort-retention, NTILE, MAD-filter, and rare-bigram tests."""

import numpy as np
import pandas as pd
import pytest

from biocurator_mapper_ray.ops.funnel import cohort_retention, funnel_counts
from biocurator_mapper_ray.ops.lm import rare_bigram_stats
from biocurator_mapper_ray.ops.quantile import mad_filter
from biocurator_mapper_ray.ops.rank import ntile


def ts(s):
    return pd.Timestamp(s)


class TestFunnel:
    def _run(self, df, stages, **kw):
        import ray.data as rd

        out = funnel_counts(rd.from_pandas(df), key="u", ts="t",
                            type_col="e", stages=stages, buckets=3, **kw)
        return (out.to_pandas().sort_values("stage")
                .reset_index(drop=True))

    def test_ordered_progression(self, ray_session):
        df = pd.DataFrame({
            # u1 completes A->B->C; u2 does B before A (no stage 2);
            # u3 only A
            "u": [1, 1, 1, 2, 2, 3],
            "t": [ts("2024-01-01"), ts("2024-01-02"), ts("2024-01-03"),
                  ts("2024-01-02"), ts("2024-01-01"), ts("2024-01-05")],
            "e": ["A", "B", "C", "A", "B", "A"],
        })
        out = self._run(df, ["A", "B", "C"])
        assert out["users"].tolist() == [3, 1, 1]
        assert out["event_type"].tolist() == ["A", "B", "C"]

    def test_tie_does_not_advance(self, ray_session):
        # B at exactly the same timestamp as first A must NOT count
        df = pd.DataFrame({
            "u": [1, 1],
            "t": [ts("2024-01-01"), ts("2024-01-01")],
            "e": ["A", "B"],
        })
        out = self._run(df, ["A", "B"])
        assert out["users"].tolist() == [1, 0]

    def test_earliest_reach_time_used(self, ray_session):
        # second A is later; B sits between the two As -> B counts
        # (reach time is the EARLIEST A)
        df = pd.DataFrame({
            "u": [1, 1, 1],
            "t": [ts("2024-01-01"), ts("2024-01-05"), ts("2024-01-03")],
            "e": ["A", "A", "B"],
        })
        out = self._run(df, ["A", "B"])
        assert out["users"].tolist() == [1, 1]

    def test_duplicate_stages_rejected(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"u": [1], "t": [ts("2024-01-01")], "e": ["A"]})
        with pytest.raises(ValueError):
            funnel_counts(rd.from_pandas(df), key="u", ts="t",
                          type_col="e", stages=["A", "A"])


class TestCohortRetention:
    def test_week_offsets(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "u": [1, 1, 1, 2, 2],
            "t": [ts("2024-01-01 09:00"), ts("2024-01-04"),   # offsets 0, 0
                  ts("2024-01-08 23:00"),                     # day 7 -> 1
                  ts("2024-01-03"), ts("2024-01-20")],        # 0 and 17d -> 2
        })
        out = (cohort_retention(rd.from_pandas(df), key="u", ts="t",
                                buckets=3)
               .to_pandas()
               .sort_values(["cohort_day", "week_offset"])
               .reset_index(drop=True))
        assert out["cohort_day"].tolist() == [
            ts("2024-01-01"), ts("2024-01-01"),
            ts("2024-01-03"), ts("2024-01-03")]
        assert out["week_offset"].tolist() == [0, 1, 0, 2]
        # one distinct user per (cohort, offset) cell here
        assert out["active_users"].tolist() == [1, 1, 1, 1]

    def test_same_week_counted_once(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "u": [7, 7, 7],
            "t": [ts("2024-03-01"), ts("2024-03-02"), ts("2024-03-03")],
        })
        out = cohort_retention(rd.from_pandas(df), key="u", ts="t",
                               buckets=2).to_pandas()
        assert len(out) == 1
        assert out["active_users"].iloc[0] == 1


class TestNtile:
    def test_matches_sql_ntile_rule(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "g": rng.integers(0, 3, 100),
            "v": rng.integers(0, 20, 100),   # heavy ties
            "id": np.arange(100),
        })
        out = (ntile(rd.from_pandas(df), value_col="v", group_col="g",
                     tiebreak_col="id", n=4, shards=5)
               .to_pandas().sort_values("id").reset_index(drop=True))
        want = df.sort_values(["g", "v", "id"]).copy()
        want["rn"] = want.groupby("g").cumcount() + 1
        for g, sub in want.groupby("g"):
            c, n = len(sub), 4
            q, r = divmod(c, n)
            tiles = np.repeat(np.arange(1, n + 1),
                              [q + 1 if i < r else q for i in range(n)])
            want.loc[sub.index, "tile"] = tiles[: c]
        want = want.sort_values("id").reset_index(drop=True)
        assert out["rn"].tolist() == want["rn"].tolist()
        assert out["tile"].tolist() == want["tile"].astype(int).tolist()

    def test_n_larger_than_group(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"g": ["x", "x"], "v": [5, 3],
                           "id": [1, 2]})
        out = (ntile(rd.from_pandas(df), value_col="v", group_col="g",
                     tiebreak_col="id", n=10, shards=2)
               .to_pandas().sort_values("rn"))
        assert out["tile"].tolist() == [1, 2]


class TestMadFilter:
    def test_band_vs_pandas(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(11)
        v = np.concatenate([rng.normal(10, 1, 400), [1000.0, -1000.0]])
        df = pd.DataFrame({"id": np.arange(len(v)), "x": v})
        out = mad_filter(rd.from_pandas(df), "x", k=3.0).to_pandas()
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        want = df[np.abs(df["x"] - med) <= 3.0 * mad]
        assert sorted(out["id"]) == sorted(want["id"])
        assert 1000.0 not in out["x"].to_numpy()

    def test_empty_input(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                           "x": pd.Series([], dtype=np.float64)})
        out = mad_filter(rd.from_pandas(df), "x").to_pandas()
        assert len(out) == 0


class TestRareBigrams:
    def test_counts(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the cat sat",          # bigrams: "the cat", "cat sat"
                "the cat ran",          # "the cat", "cat ran"
                "one",                  # no bigram
                "",                     # no tokens
            ],
        })
        out = (rare_bigram_stats(rd.from_pandas(df), min_count=2,
                                 buckets=3)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        # "the cat" occurs twice (not rare at min_count=2);
        # "cat sat"/"cat ran" occur once each (rare)
        assert out["total_bigrams"].tolist() == [2, 2, 0, 0]
        assert out["rare_bigrams"].tolist() == [1, 1, 0, 0]

    def test_case_and_whitespace_folding(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["Hello   World", "hello world"],
        })
        out = (rare_bigram_stats(rd.from_pandas(df), min_count=2,
                                 buckets=2)
               .to_pandas().sort_values("doc_id"))
        # both fold to the same bigram -> corpus count 2 -> not rare
        assert out["rare_bigrams"].tolist() == [0, 0]


class TestCollocationStats:
    def test_matches_manual_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import collocation_stats

        docs = ["the big cat and the big dog",
                "a big cat sat",
                "the big cat ran",
                ""]
        df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                           "text": docs})
        got = collocation_stats(rd.from_pandas(df).repartition(3),
                                min_count=3)
        row = got[(got["w1"] == "big") & (got["w2"] == "cat")]
        assert len(row) == 1
        r = row.iloc[0]
        assert r["n_pair"] == 3 and r["n_w1"] == 4 and r["n_w2"] == 3
        assert r["n_tokens"] == sum(len(d.split()) for d in docs)
        # below-threshold bigrams are absent
        assert not ((got["w1"] == "the") & (got["w2"] == "big")).any() \
            or got[(got["w1"] == "the") & (got["w2"] == "big")].iloc[0]["n_pair"] >= 3

    def test_empty_corpus(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import collocation_stats

        df = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                           "text": pd.Series([], dtype=object)})
        got = collocation_stats(rd.from_pandas(df))
        assert len(got) == 0


class TestNextTokenStats:
    def test_argmax_and_tiebreak(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import next_token_stats

        docs = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a b a b a c",          # a->b x2, a->c x1, b->a x2
                     "a c a c",              # a->c x2, c->a x1
                     "z q z q"],             # z->q x2, q->z x1
        })
        got = next_token_stats(rd.from_pandas(docs).repartition(2),
                               min_count=2).to_pandas()
        by = {r.w1: (r.w2_top, r.n_pair, r.n_w1) for r in got.itertuples()}
        # a: b=2, c=3 -> c wins; prefix total 5
        assert by["a"] == ("c", 3, 5)
        assert by["b"] == ("a", 2, 2)
        assert by["z"] == ("q", 2, 2)
        # c and q have prefix totals 1 -> filtered by min_count=2
        assert "c" not in by and "q" not in by

    def test_tie_breaks_lexicographic(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import next_token_stats

        docs = pd.DataFrame({"doc_id": [1], "text": ["x b x a"]})
        got = next_token_stats(rd.from_pandas(docs),
                               min_count=2).to_pandas()
        by = {r.w1: (r.w2_top, r.n_pair, r.n_w1) for r in got.itertuples()}
        assert by == {"x": ("a", 1, 2)}

    def test_empty_and_short_docs(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import next_token_stats

        docs = pd.DataFrame({"doc_id": [1, 2, 3],
                             "text": ["", "solo", "  \t "]})
        got = next_token_stats(rd.from_pandas(docs),
                               min_count=1).to_pandas()
        assert len(got) == 0


class TestVocabContingency:
    def test_counts_and_min_count(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_contingency

        df = pd.DataFrame({
            "text": ["cat cat dog", "cat bird", "dog dog", "bird"],
            "source": ["a", "a", "b", "b"],
        })
        got = vocab_contingency(rd.from_pandas(df).repartition(2),
                                min_count=3).to_pandas()
        by = {(r.token, r.source): r.n for r in got.itertuples()}
        # corpus totals: cat=3, dog=3, bird=2 (filtered)
        assert by == {("cat", "a"): 3, ("dog", "a"): 1, ("dog", "b"): 2}

    def test_empty_text(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import vocab_contingency

        df = pd.DataFrame({"text": ["", "  "], "source": ["a", "b"]})
        got = vocab_contingency(rd.from_pandas(df), min_count=1) \
            .to_pandas()
        assert len(got) == 0


class TestBPE:
    def test_train_merges_exact_small_case(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import bpe_train

        ds = rd.from_items([{"doc_id": 1, "text": "aaab aaab"},
                            {"doc_id": 2, "text": "ab"}])
        merges = bpe_train(ds, num_merges=10)
        # hand-derived: (a,a) wins 4v3, then (a,b) 3, then (aa,ab) 2
        assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]

    def test_encode_greedy_rank_order(self, ray_session):
        from biocurator_mapper_ray.ops.lm import bpe_encode_word

        ranks = {("a", "a"): 0, ("a", "b"): 1, ("aa", "ab"): 2}
        assert bpe_encode_word("aaab", ranks) == ["aaab"]
        assert bpe_encode_word("ab", ranks) == ["ab"]
        assert bpe_encode_word("ba", ranks) == ["b", "a"]
        assert bpe_encode_word("x", ranks) == ["x"]

    def test_piece_counts_pipeline(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.lm import bpe_piece_counts, bpe_train

        rows = [{"doc_id": 1, "text": "aaab ab"},
                {"doc_id": 2, "text": "ba   "},
                {"doc_id": 3, "text": ""}]
        ds = rd.from_items(rows)
        merges = bpe_train(ds, num_merges=10)
        got = bpe_piece_counts(ds, merges).to_pandas() \
            .set_index("doc_id").sort_index()
        # merges learned here: (a,a), (a,b) — the (aa,ab) pair occurs
        # only once in THIS corpus so training stops before it; 'aaab'
        # encodes to (aa, ab) = 2 pieces, 'ab' to 1
        assert got.loc[1].tolist() == [2, 3]
        assert got.loc[2].tolist() == [1, 2]   # 'ba' stays 2 pieces
        assert got.loc[3].tolist() == [0, 0]
