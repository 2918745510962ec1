

class TestSequenceTransitions:
    def test_basic_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import sequence_transitions

        df = pd.DataFrame({
            "conv_id": ["c1"] * 4 + ["c2"] * 3,
            "turn_idx": [0, 1, 2, 3, 0, 1, 2],
            "tool": ["search", "fetch", "search", "fetch",
                     "search", "fetch", "fetch"],
        })
        got = sequence_transitions(
            rd.from_pandas(df).repartition(3)).to_pandas()
        by = {(r.label_a, r.label_b): r.n_pairs for r in got.itertuples()}
        assert by == {("search", "fetch"): 3,
                      ("fetch", "search"): 1,
                      ("fetch", "fetch"): 1}

    def test_order_columns_respected(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import sequence_transitions

        # rows arrive shuffled; order by turn_idx must reconstruct a->b->c
        df = pd.DataFrame({
            "conv_id": ["c"] * 3,
            "turn_idx": [2, 0, 1],
            "tool": ["c", "a", "b"],
        })
        got = sequence_transitions(rd.from_pandas(df)).to_pandas()
        by = {(r.label_a, r.label_b): r.n_pairs for r in got.itertuples()}
        assert by == {("a", "b"): 1, ("b", "c"): 1}

    def test_min_count_and_single_turn_keys(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import sequence_transitions

        df = pd.DataFrame({
            "conv_id": ["a", "b", "c", "c"],
            "turn_idx": [0, 0, 0, 1],
            "tool": ["x", "x", "x", "y"],
        })
        got = sequence_transitions(rd.from_pandas(df),
                                   min_count=2).to_pandas()
        assert len(got) == 0


class TestBuildExamples:
    def _run(self, df, **kw):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import build_examples

        return build_examples(rd.from_pandas(df).repartition(2),
                              **kw).to_pandas()

    def test_context_accumulates(self, ray_session):
        import pandas as pd

        df = pd.DataFrame({
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["hi", "hello", "how?", "fine"],
        })
        got = self._run(df).sort_values("turn_idx")
        assert list(got["turn_idx"]) == [1, 3]
        r1, r3 = got.iloc[0], got.iloc[1]
        assert r1["context"] == "user: hi" and r1["target"] == "hello"
        assert r1["n_context_turns"] == 1
        assert r3["context"] == "user: hi\nassistant: hello\nuser: how?"
        assert r3["target"] == "fine" and r3["n_context_turns"] == 3

    def test_char_budget_drops_whole_oldest_turns(self, ray_session):
        import pandas as pd

        df = pd.DataFrame({
            "conv_id": ["c"] * 4,
            "turn_idx": [0, 1, 2, 3],
            "role": ["user", "user", "user", "assistant"],
            "text": ["aaaaaaaaaa", "bbbb", "cc", "done"],
        })
        # full context = "user: aaaaaaaaaa\nuser: bbbb\nuser: cc" = 37 chars
        got = self._run(df, max_context_chars=25)
        assert len(got) == 1
        assert got.iloc[0]["context"] == "user: bbbb\nuser: cc"
        assert got.iloc[0]["n_context_turns"] == 2

    def test_first_turn_target_empty_context(self, ray_session):
        import pandas as pd

        df = pd.DataFrame({
            "conv_id": ["a", "b"],
            "turn_idx": [0, 0],
            "role": ["assistant", "user"],
            "text": ["opener", "lurker"],
        })
        got = self._run(df)
        assert len(got) == 1
        assert got.iloc[0]["context"] == ""
        assert got.iloc[0]["n_context_turns"] == 0
        assert got.iloc[0]["target"] == "opener"

    def test_multiple_conversations_isolated(self, ray_session):
        import pandas as pd

        df = pd.DataFrame({
            "conv_id": ["a", "a", "b", "b"],
            "turn_idx": [0, 1, 0, 1],
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["qa", "ra", "qb", "rb"],
        })
        got = self._run(df)
        by = {r.conv_id: r.context for r in got.itertuples()}
        assert by == {"a": "user: qa", "b": "user: qb"}


class TestSequenceNgrams:
    def test_trigrams_match_bruteforce(self, ray_session):
        import collections

        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import sequence_ngrams

        rng = np.random.default_rng(2)
        rows = []
        for c in range(8):
            for i in range(int(rng.integers(1, 15))):
                rows.append((c, i, f"t{rng.integers(0, 3)}"))
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "tool"])
        got = sequence_ngrams(
            rd.from_pandas(df.sample(frac=1, random_state=3))
            .repartition(3), n=3, buckets=4).to_pandas()
        have = {(r.label_1, r.label_2, r.label_3): int(r.n_grams)
                for r in got.itertuples()}
        want = collections.Counter()
        for _, grp in df.sort_values("turn_idx").groupby("conv_id"):
            seq = grp["tool"].tolist()
            for i in range(len(seq) - 2):
                want[tuple(seq[i:i + 3])] += 1
        assert have == dict(want)

    def test_n2_matches_transitions(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import (sequence_ngrams,
                                                      sequence_transitions)

        df = pd.DataFrame({
            "conv_id": [1, 1, 1, 2, 2],
            "turn_idx": [0, 1, 2, 0, 1],
            "tool": ["a", "b", "a", "a", "b"]})
        ds = rd.from_pandas(df).repartition(2)
        g2 = sequence_ngrams(ds, n=2, buckets=2).to_pandas()
        tr = sequence_transitions(ds, buckets=2).to_pandas()
        a = {(r.label_1, r.label_2): int(r.n_grams)
             for r in g2.itertuples()}
        b = {(r.label_a, r.label_b): int(r.n_pairs)
             for r in tr.itertuples()}
        assert a == b
