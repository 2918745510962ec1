

class TestFdViolations:
    def test_flags_multivalue_keys(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import fd_violations

        df = pd.DataFrame({
            "k": ["a", "a", "a", "b", "b", "c"],
            "v": ["x", "x", "y", "z", "z", "w"],
        })
        got = fd_violations(rd.from_pandas(df).repartition(3),
                            key="k", value="v").to_pandas()
        by = {r.k: (r.n_values, r.n_rows) for r in got.itertuples()}
        assert by == {"a": (2, 3)}

    def test_clean_fd_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import fd_violations

        df = pd.DataFrame({"k": [1, 1, 2], "v": [5, 5, 6]})
        got = fd_violations(rd.from_pandas(df), key="k",
                            value="v").to_pandas()
        assert len(got) == 0


class TestKAnonymityAudit:
    def test_flags_small_and_undiverse_classes(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import k_anonymity_audit

        # class A: 4 rows, 3 distinct sensitive; class B: 2 rows, 1
        # distinct (violates both at k=3, l_div=2); class C: 3 rows but
        # all one sensitive value (k ok, l violated)
        df = pd.DataFrame({
            "zip": ["A"] * 4 + ["B"] * 2 + ["C"] * 3,
            "age": [30] * 4 + [40] * 2 + [50] * 3,
            "diag": ["x", "y", "z", "x", "q", "q", "w", "w", "w"],
        })
        got = k_anonymity_audit(
            rd.from_pandas(df).repartition(3), quasi=["zip", "age"],
            sensitive="diag", k=3, l_div=2).to_pandas()
        rows = {(r.zip, r.age): (r.group_n, r.n_sensitive,
                                 r.violates_k, r.violates_l)
                for r in got.itertuples()}
        assert rows == {("A", 30): (4, 3, 0, 0),
                        ("B", 40): (2, 1, 1, 1),
                        ("C", 50): (3, 1, 0, 1)}

    def test_partial_dedup_across_batches(self, ray_session):
        # the same (quasi, sensitive) pair split across many blocks must
        # count once toward n_sensitive but sum toward group_n
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import k_anonymity_audit

        df = pd.DataFrame({"q": ["g"] * 12, "s": ["v"] * 10 + ["u"] * 2})
        got = k_anonymity_audit(
            rd.from_pandas(df).repartition(6), quasi=["q"],
            sensitive="s", k=20, l_div=3).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (int(r.group_n), int(r.n_sensitive),
                int(r.violates_k), int(r.violates_l)) == (12, 2, 1, 1)


class TestSelfjoinSize:
    def test_exact_quadratic_sum(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import selfjoin_size

        # counts: a->3, b->2, c->1  => 9+4+1 = 14
        df = pd.DataFrame({"k": list("aaabbc")})
        got = selfjoin_size(rd.from_pandas(df).repartition(4), key="k")
        r = got.iloc[0]
        assert (r.join_rows, r.n_rows, r.n_keys, r.max_cnt) == (14, 6, 3, 3)


class TestGiniKeyCounts:
    def _gini(self, keys):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import gini_key_counts

        df = pd.DataFrame({"k": keys})
        return gini_key_counts(rd.from_pandas(df).repartition(3),
                               key="k").iloc[0]

    def test_uniform_counts_give_zero(self, ray_session):
        r = self._gini(list("aabbcc"))
        assert (r.gini_num, r.n_keys, r.n_rows) == (0, 3, 6)
        assert r.gini_den == 18

    def test_matches_bruteforce_rank_formula(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(6)
        keys = [f"k{v}" for v in rng.integers(0, 12, size=300)]
        r = self._gini(keys)
        import collections
        cs = sorted(collections.Counter(keys).values())
        m, n = len(cs), sum(cs)
        s = sum((i + 1) * c for i, c in enumerate(cs))
        assert r.gini_num == 2 * s - (m + 1) * n
        assert r.gini_den == m * n


class TestUniquenessProfile:
    def test_key_flags_and_null_handling(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import uniqueness_profile

        df = pd.DataFrame({
            "a": [1, 2, 3, 4, 4],
            "b": ["x", "x", "y", None, None],
            "c": [1, 1, 1, 2, 3],
        })
        got = uniqueness_profile(
            rd.from_pandas(df).repartition(3),
            combos=[["a"], ["b"], ["a", "b"], ["a", "c"]]).to_pandas()
        rows = {r.combo: (int(r.n_distinct), int(r.is_key))
                for r in got.itertuples()}
        assert rows == {"a": (4, 0), "b": (3, 0),
                        "a+b": (4, 0), "a+c": (5, 1)}
        assert set(got["n_rows"]) == {5}

    def test_sketch_mode_matches_exact_is_key(self, ray_session):
        # sketch mode (HLL + exact recheck of is_key candidates) must
        # agree with exact mode on is_key / n_rows, carry EXACT
        # n_distinct for every rechecked candidate, and stay within
        # the HLL error band for estimated combos (VERDICT r4 item 7)
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import uniqueness_profile

        n = 5000
        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "id": np.arange(n),                      # true key
            "near": np.where(np.arange(n) % 97 == 0, 0,
                             np.arange(n)),          # 99% unique: recheck
            "cat": rng.integers(0, 40, n),           # low-card: estimate
        })
        ds = rd.from_pandas(df).repartition(4)
        combos = [["id"], ["near"], ["cat"], ["cat", "near"]]
        exact = uniqueness_profile(ds, combos=combos).to_pandas()
        sk = uniqueness_profile(ds, combos=combos,
                                mode="sketch").to_pandas()
        e = exact.set_index("combo")
        s = sk.set_index("combo")
        assert (s["is_key"] == e.loc[s.index, "is_key"]).all()
        assert set(s["n_rows"]) == {n}
        # rechecked candidates are exact
        for combo in s.index[s["exact"] == 1]:
            assert s.loc[combo, "n_distinct"] == e.loc[combo, "n_distinct"]
        assert s.loc["id", "exact"] == 1 and s.loc["near", "exact"] == 1
        # estimated combos stay inside a generous HLL band
        for combo in s.index[s["exact"] == 0]:
            true = e.loc[combo, "n_distinct"]
            assert abs(s.loc[combo, "n_distinct"] - true) <= \
                max(2, 0.1 * true)
