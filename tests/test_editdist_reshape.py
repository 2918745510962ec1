"""Edit-distance fuzzy pairs + grouped mode + rollup aggregates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from biocurator_mapper_ray.ops.editdist import (
    fuzzy_pairs_edit_distance,
    verify_pairs_edit_distance,
)
from biocurator_mapper_ray.ops.reshape import grouped_mode, rollup_sum


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestFuzzyPairsEditDistance:
    def test_exact_dup_and_near_variant(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog again"
        texts = [
            base,                       # 0
            base,                       # 1: exact dup → dist 0
            base.replace("quick", "quack"),  # 2: 1 edit in the prefix
            "completely different content that shares nothing at all!!",  # 3
        ]
        got = fuzzy_pairs_edit_distance(
            _docs_ds(texts), max_dist=3, prefix_len=48, length_bucket=32
        ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        pairs = {(r.a, r.b): r.dist for r in got.itertuples()}
        assert pairs[(0, 1)] == 0
        assert pairs[(0, 2)] == 1 and pairs[(1, 2)] == 1
        assert not any(3 in p for p in pairs)

    def test_blocking_is_part_of_the_contract(self, ray_session):
        # two near-identical docs whose lengths straddle a block
        # boundary are NOT candidates — the documented miss
        a = "x" * 31
        b = "x" * 33
        got = fuzzy_pairs_edit_distance(
            _docs_ds([a, b]), max_dist=3, prefix_len=48, length_bucket=32
        ).to_pandas()
        assert len(got) == 0

    def test_case_insensitive_prefix_kernel(self, ray_session):
        texts = ["HELLO WORLD " * 4, "hello world " * 4]
        got = fuzzy_pairs_edit_distance(
            _docs_ds(texts), max_dist=0, prefix_len=48, length_bucket=32
        ).to_pandas()
        assert len(got) == 1 and got["dist"].iloc[0] == 0

    def test_verify_path_matches_blocked_exact(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        base = "some sentence about data pipelines at scale number"
        texts = []
        for i in range(40):
            t = f"{base} {i % 5}"
            if i % 3 == 0:
                t = t.replace("data", "dsta")
            texts.append(t)
        ds = _docs_ds(texts)
        exact = fuzzy_pairs_edit_distance(
            ds, max_dist=4, prefix_len=48, length_bucket=1 << 30
        ).to_pandas()
        # candidate set = ALL pairs → verify path must reproduce exact
        ids = np.arange(len(texts), dtype=np.int64)
        a, b = np.meshgrid(ids, ids)
        keep = a.ravel() < b.ravel()
        cands = rd.from_arrow(pa.table({
            "a": pa.array(a.ravel()[keep]), "b": pa.array(b.ravel()[keep])
        }))
        verified = verify_pairs_edit_distance(
            ds, cands, max_dist=4, prefix_len=48
        ).to_pandas()
        key = lambda df: sorted(map(tuple, df[["a", "b", "dist"]].to_numpy()))
        assert key(verified) == key(exact)

    def test_empty_input(self, ray_session):
        got = fuzzy_pairs_edit_distance(_docs_ds([])).to_pandas()
        assert len(got) == 0


class TestGroupedMode:
    def test_mode_with_deterministic_tiebreak(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "k": ["a"] * 5 + ["b"] * 4 + ["c"] * 1,
            "v": ["x", "x", "y", "y", "z",   # a: x/y tie 2-2 → "x"
                  "q", "q", "q", "p",        # b: q wins 3-1
                  "solo"],                   # c: singleton
        })
        got = grouped_mode(rd.from_pandas(df), key="k", value="v") \
            .to_pandas().sort_values("k").reset_index(drop=True)
        assert list(got["mode_value"]) == ["x", "q", "solo"]
        assert list(got["mode_count"]) == [2, 3, 1]

    def test_counts_merge_across_batches(self, ray_session):
        import ray.data as rd

        # split so each batch alone would pick the WRONG mode
        df = pd.DataFrame({"k": ["g"] * 9,
                           "v": ["a", "a", "b", "b", "b",
                                 "a", "a", "a", "b"]})
        ds = rd.from_pandas(df).repartition(3)
        got = grouped_mode(ds, key="k", value="v").to_pandas()
        assert got["mode_value"].iloc[0] == "a"  # 5 a vs 4 b overall
        assert got["mode_count"].iloc[0] == 5

    def test_empty(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                     "v": pa.array([], pa.string())}))
        assert grouped_mode(ds, key="k", value="v").count() == 0


class TestRollupSum:
    def test_matches_manual_levels(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "k1": ["p", "p", "p", "q"],
            "k2": ["a", "a", "b", "a"],
            "val": [1.0, 2.0, 3.5, 10.0],
        })
        got = rollup_sum(rd.from_pandas(df), keys=["k1", "k2"], value="val")
        # finest: (p,a)=300c/2, (p,b)=350c/1, (q,a)=1000c/1
        # level1: (p,·)=650c/3, (q,·)=1000c/1 ; total: 1650c/4
        assert len(got) == 3 + 2 + 1
        finest = got.dropna(subset=["k2"]).set_index(["k1", "k2"])
        assert finest.loc[("p", "a"), "sum_cents"] == 300
        assert finest.loc[("p", "b"), "sum_cents"] == 350
        lvl1 = got[got["k2"].isna() & got["k1"].notna()].set_index("k1")
        assert lvl1.loc["p", "sum_cents"] == 650
        assert lvl1.loc["p", "n_rows"] == 3
        total = got[got["k1"].isna()]
        assert total["sum_cents"].iloc[0] == 1650
        assert total["n_rows"].iloc[0] == 4

    def test_single_key_rollup(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": ["a", "b", "a"], "val": [1.0, 2.0, 3.0]})
        got = rollup_sum(rd.from_pandas(df), keys=["k"], value="val",
                         cents=False)
        assert len(got) == 3  # a, b, total
        assert got[got["k"].isna()]["sum_cents"].iloc[0] == 6


class TestWinsorize:
    def test_clamps_to_discrete_quantiles(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.quantile import winsorize_by_quantile

        vals = list(range(1, 101))  # 1..100
        ds = rd.from_pandas(pd.DataFrame({"x": [float(v) for v in vals]}))
        got = winsorize_by_quantile(ds, "x", lo_q=0.05, hi_q=0.95) \
            .to_pandas().sort_values("x").reset_index(drop=True)
        assert got["x_w"].min() == 5.0   # quantile_disc(.05) of 1..100
        assert got["x_w"].max() == 95.0
        # interior values untouched
        mid = got[(got["x"] >= 5.0) & (got["x"] <= 95.0)]
        assert (mid["x_w"] == mid["x"]).all()

    def test_empty_input(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.quantile import winsorize_by_quantile

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
        assert winsorize_by_quantile(ds, "x").count() == 0


class TestRegexExtract:
    def test_match_and_no_match(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.normalize import regex_extract

        ds = rd.from_pandas(pd.DataFrame({
            "doc_id": [0, 1, 2],
            "text": ["a table scan here", "no keyword", None],
        }))
        got = ds.map_batches(
            regex_extract,
            fn_kwargs={"column": "text", "pattern": r"table (\w+)",
                       "out_column": "g"},
            batch_format="pyarrow",
        ).to_pandas().sort_values("doc_id")
        assert got["g"].tolist()[0] == "scan"
        assert pd.isna(got["g"].tolist()[1])
        assert pd.isna(got["g"].tolist()[2])

    def test_group_selection(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.normalize import regex_extract

        ds = rd.from_pandas(pd.DataFrame({"text": ["k=v1;k2=v2"]}))
        got = ds.map_batches(
            regex_extract,
            fn_kwargs={"column": "text", "pattern": r"(\w+)=(\w+)",
                       "group": 2, "out_column": "g"},
            batch_format="pyarrow",
        ).to_pandas()
        assert got["g"].iloc[0] == "v1"


class TestCumulativeNewKeys:
    def test_growth_curve_counts_first_appearance_once(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import cumulative_new_keys

        ts = pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 11:00",  # u1, u2 first
            "2024-01-02 09:00",                       # u1 again (no new)
            "2024-01-03 09:00", "2024-01-03 10:00",  # u3 first, u2 again
        ])
        ds = rd.from_pandas(pd.DataFrame({
            "k": ["u1", "u2", "u1", "u3", "u2"], "ts": ts}))
        got = cumulative_new_keys(ds, key="k", ts="ts", unit="day")
        assert got["new_keys"].tolist() == [2, 0, 1]
        assert got["cum_keys"].tolist() == [2, 2, 3]

    def test_batch_split_does_not_double_count(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import cumulative_new_keys

        ts = pd.to_datetime(["2024-01-01"] * 4 + ["2024-01-02"] * 4)
        ds = rd.from_pandas(pd.DataFrame({
            "k": ["a", "a", "b", "b", "a", "b", "c", "c"], "ts": ts})
        ).repartition(4)
        got = cumulative_new_keys(ds, key="k", ts="ts", unit="day")
        assert got["new_keys"].tolist() == [2, 1]
        assert got["cum_keys"].tolist() == [2, 3]


class TestGroupedMoments:
    def test_variance_matches_numpy(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_moments

        vals = [1.0, 2.0, 3.0, 4.0, 10.0]
        ds = rd.from_pandas(pd.DataFrame({"k": ["g"] * 5, "v": vals}))
        got = grouped_moments(ds, key="k", value="v").to_pandas()
        assert got["n"].iloc[0] == 5
        assert got["sum_cents"].iloc[0] == 2000
        assert got["mean"].iloc[0] == pytest.approx(4.0)
        assert got["var"].iloc[0] == pytest.approx(np.var(vals, ddof=1))

    def test_singleton_group_null_var(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_moments

        ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [5.0]}))
        got = grouped_moments(ds, key="k", value="v").to_pandas()
        assert pd.isna(got["var"].iloc[0])

    def test_partials_merge_across_batches(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_moments

        vals = list(map(float, range(100)))
        ds = rd.from_pandas(pd.DataFrame({"k": ["g"] * 100, "v": vals})) \
            .repartition(7)
        got = grouped_moments(ds, key="k", value="v").to_pandas()
        assert got["var"].iloc[0] == pytest.approx(np.var(vals, ddof=1))

    def test_covariance(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_covariance

        x = [1.0, 2.0, 3.0, 4.0]
        y = [2.0, 4.0, 6.0, 8.0]  # perfectly linear: cov = 2*var(x)
        ds = rd.from_pandas(pd.DataFrame({"k": ["g"] * 4, "x": x, "y": y}))
        got = grouped_covariance(ds, key="k", x="x", y="y").to_pandas()
        assert got["cov"].iloc[0] == pytest.approx(np.cov(x, y, ddof=1)[0, 1])


class TestQuantilesCont:
    def test_interpolated_matches_numpy_linear(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.quantile import quantiles_cont

        vals = [float(v) for v in range(1, 101)]
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
        got = quantiles_cont(ds, "x", [0.25, 0.5, 0.9])
        want = np.quantile(vals, [0.25, 0.5, 0.9])  # linear interpolation
        assert got["value"].to_numpy() == pytest.approx(want)

    def test_exact_at_data_points(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.quantile import quantiles_cont

        ds = rd.from_pandas(pd.DataFrame({"x": [10.0, 20.0, 30.0]}))
        got = quantiles_cont(ds, "x", [0.0, 0.5, 1.0])
        assert got["value"].tolist() == [10.0, 20.0, 30.0]

    def test_empty(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.quantile import quantiles_cont

        ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
        assert len(quantiles_cont(ds, "x", [0.5])) == 0


class TestZscoreByGroup:
    def test_standardizes_per_group(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import zscore_by_group

        df = pd.DataFrame({
            "k": ["a"] * 4 + ["b"] * 4,
            "v": [1.0, 2.0, 3.0, 4.0, 100.0, 200.0, 300.0, 400.0],
        })
        got = zscore_by_group(rd.from_pandas(df), key="k", value="v") \
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        for grp in ["a", "b"]:
            z = got[got["k"] == grp]["z"].to_numpy()
            v = df[df["k"] == grp]["v"].to_numpy()
            want = (v - v.mean()) / v.std(ddof=1)
            assert z == pytest.approx(want)

    def test_singleton_group_null_z(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import zscore_by_group

        df = pd.DataFrame({"k": ["solo"], "v": [5.0]})
        got = zscore_by_group(rd.from_pandas(df), key="k", value="v") \
            .to_pandas()
        assert pd.isna(got["z"].iloc[0])


class TestDebounce:
    def test_keeps_first_and_gapped_events(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import debounce

        ts = pd.to_datetime([
            "2024-01-01 10:00:00",  # u1 first -> keep
            "2024-01-01 10:00:30",  # u1 +30s  -> drop (gap <= 60s)
            "2024-01-01 10:02:00",  # u1 +90s since PREVIOUS -> keep
            "2024-01-01 10:00:10",  # u2 first -> keep
        ])
        ds = rd.from_pandas(pd.DataFrame({
            "eid": [1, 2, 3, 4], "u": ["u1", "u1", "u1", "u2"], "ts": ts}))
        got = debounce(ds, key="u", ts="ts", tiebreak="eid",
                       min_gap=pd.Timedelta(seconds=60)).to_pandas()
        assert sorted(got["eid"].tolist()) == [1, 3, 4]

    def test_exact_gap_is_dropped(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import debounce

        ts = pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:01:00"])
        ds = rd.from_pandas(pd.DataFrame({
            "eid": [1, 2], "u": ["u", "u"], "ts": ts}))
        got = debounce(ds, key="u", ts="ts", tiebreak="eid",
                       min_gap=pd.Timedelta(seconds=60)).to_pandas()
        # strict >: exactly 60s is NOT enough (SQL ts - pts > INTERVAL)
        assert sorted(got["eid"].tolist()) == [1]


class TestGroupedLinfit:
    def test_matches_numpy_polyfit(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_linfit

        df = pd.DataFrame({
            "g": ["x"] * 4 + ["y"] * 3,
            "a": [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0],
            "b": [2.0, 4.1, 6.0, 8.2, 3.0, 4.0, 5.0],
        })
        got = grouped_linfit(rd.from_pandas(df), key="g", x="a",
                             y="b").to_pandas().set_index("g")
        for g, sub in df.groupby("g"):
            # cents quantization: compare against the fit of rounded data
            xa = np.round(sub["a"] * 100) / 100
            ya = np.round(sub["b"] * 100) / 100
            slope, intercept = np.polyfit(xa, ya, 1)
            assert abs(got.loc[g, "slope"] - slope) < 1e-9
            assert abs(got.loc[g, "intercept"] - intercept) < 1e-9
            assert got.loc[g, "n"] == len(sub)

    def test_degenerate_groups_null(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_linfit

        df = pd.DataFrame({
            "g": ["one", "zerovar", "zerovar"],
            "a": [1.0, 5.0, 5.0],   # n=1; zero x-variance
            "b": [2.0, 1.0, 9.0],
        })
        got = grouped_linfit(rd.from_pandas(df), key="g", x="a",
                             y="b").to_pandas().set_index("g")
        assert pd.isna(got.loc["one", "slope"])
        assert pd.isna(got.loc["one", "intercept"])
        assert pd.isna(got.loc["zerovar", "slope"])


class TestGroupedCorr:
    def test_matches_numpy_corrcoef(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_corr

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "g": np.repeat(["a", "b"], 50),
            "x": np.round(rng.normal(10, 2, 100), 2),
        })
        df["y"] = np.round(df["x"] * 1.5 + rng.normal(0, 1, 100), 2)
        got = grouped_corr(rd.from_pandas(df), key="g", x="x",
                           y="y").to_pandas().set_index("g")
        for g, sub in df.groupby("g"):
            ref = np.corrcoef(sub["x"], sub["y"])[0, 1]
            assert abs(got.loc[g, "corr"] - ref) < 1e-9
            assert got.loc[g, "n"] == 50

    def test_perfect_and_degenerate(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import grouped_corr

        df = pd.DataFrame({
            "g": ["lin", "lin", "lin", "const", "const", "single"],
            "x": [1.0, 2.0, 3.0, 7.0, 7.0, 1.0],
            "y": [2.0, 4.0, 6.0, 1.0, 2.0, 1.0],
        })
        got = grouped_corr(rd.from_pandas(df), key="g", x="x",
                           y="y").to_pandas().set_index("g")
        assert abs(got.loc["lin", "corr"] - 1.0) < 1e-12
        assert pd.isna(got.loc["const", "corr"])   # zero x-variance
        assert pd.isna(got.loc["single", "corr"])  # n = 1


class TestCubeSum:
    def test_all_cuts_match_brute_force(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.reshape import cube_sum

        rng = np.random.default_rng(4)
        df = pd.DataFrame({
            "a": rng.choice(["x", "y"], 60),
            "b": rng.choice(["p", "q", "r"], 60),
            "v": np.round(rng.uniform(0, 10, 60), 2),
        })
        got = cube_sum(rd.from_pandas(df).repartition(4),
                       keys=["a", "b"], value="v")
        cents = np.round(df["v"] * 100).astype(np.int64)
        # 4 cuts: (a,b), (a,), (b,), ()
        n_combos = (df.groupby(["a", "b"]).ngroups
                    + df["a"].nunique() + df["b"].nunique() + 1)
        assert len(got) == n_combos
        total = got[got["a"].isna() & got["b"].isna()]
        assert total["sum_cents"].iloc[0] == cents.sum()
        assert total["n_rows"].iloc[0] == 60
        # the cross-cut rollup can't express: per-b totals
        for b, sub in df.groupby("b"):
            row = got[got["a"].isna() & (got["b"] == b)]
            assert row["sum_cents"].iloc[0] == \
                np.round(sub["v"] * 100).astype(np.int64).sum()
            assert row["n_rows"].iloc[0] == len(sub)


class TestPivotSum:
    def test_cells_match_brute_force(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.reshape import pivot_sum

        rng = np.random.default_rng(6)
        df = pd.DataFrame({
            "r": rng.choice(["x", "y"], 80),
            "c": rng.choice(["A", "B"], 80),
            "v": np.round(rng.uniform(0, 50, 80), 2),
        })
        got = pivot_sum(rd.from_pandas(df).repartition(4), row_key="r",
                        col_key="c", value="v", values=["A", "B", "Z"])
        cents = np.round(df["v"] * 100).astype(np.int64)
        for r, sub in df.groupby("r"):
            row = got[got["r"] == r].iloc[0]
            for c in ("A", "B"):
                want = np.round(
                    sub.loc[sub["c"] == c, "v"] * 100
                ).astype(np.int64).sum()
                assert row[f"sum_{c}"] == want
            assert row["sum_Z"] == 0  # declared but unseen column

    def test_unseen_value_raises(self, ray_session):
        import pytest
        import ray.data as rd
        from biocurator_mapper_ray.ops.reshape import pivot_sum

        df = pd.DataFrame({"r": ["x"], "c": ["SURPRISE"], "v": [1.0]})
        with pytest.raises(ValueError, match="unseen"):
            pivot_sum(rd.from_pandas(df), row_key="r", col_key="c",
                      value="v", values=["A"])


class TestRobustScale:
    def test_matches_numpy_median_iqr(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import robust_scale_by_group

        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b"], 500),
            "id": np.arange(500),
            "v": np.round(rng.normal(50, 10, 500), 2),
        })
        got = robust_scale_by_group(rd.from_pandas(df).repartition(5),
                                    key="g", value="v") \
            .to_pandas().set_index("id")
        for g, sub in df.groupby("g"):
            med = np.percentile(sub["v"], 50, method="linear")
            iqr = (np.percentile(sub["v"], 75, method="linear")
                   - np.percentile(sub["v"], 25, method="linear"))
            for _, row in sub.iterrows():
                want = (row["v"] - med) / iqr
                assert abs(got.loc[row["id"], "rs"] - want) < 1e-9

    def test_zero_iqr_emits_null(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.moments import robust_scale_by_group

        df = pd.DataFrame({"g": ["c"] * 4, "id": range(4),
                           "v": [5.0, 5.0, 5.0, 5.0]})
        got = robust_scale_by_group(rd.from_pandas(df), key="g",
                                    value="v").to_pandas()
        assert got["rs"].isna().all()


class TestEmptyInputs:
    """Every late-round-4 op returns a typed empty result on an empty
    dataset instead of crashing on Ray's column-dropping empty
    to_pandas (the known 0-row gotcha)."""

    def test_all_new_ops_tolerate_empty(self, ray_session):
        import ray.data as rd

        def empty_df(**cols):
            return rd.from_pandas(pd.DataFrame(
                {k: pd.Series([], dtype=t) for k, t in cols.items()}))

        from biocurator_mapper_ray.ops.join import distinct_set_op
        from biocurator_mapper_ray.ops.moments import (
            grouped_corr, grouped_linfit, robust_scale_by_group)
        from biocurator_mapper_ray.ops.quantile import grouped_quantiles_cont
        from biocurator_mapper_ray.ops.reshape import cube_sum, pivot_sum
        from biocurator_mapper_ray.ops.sample import hash_top_k_per_group
        from biocurator_mapper_ray.ops.textstats import inverted_index
        from biocurator_mapper_ray.ops.window import (
            forward_fill, keep_best_per_key, rolling_rows_aggregate)

        e_kv = empty_df(k="int64")
        assert len(distinct_set_op(e_kv, e_kv, left_on="k").to_pandas()) == 0
        e_w = empty_df(k="int64", s="float64", id="int64")
        assert len(keep_best_per_key(e_w, key="k", score="s",
                                     tiebreak="id").to_pandas()) == 0
        e_t = empty_df(u="int64", ts="datetime64[ns]", id="int64",
                       v="float64")
        assert len(rolling_rows_aggregate(e_t, key="u", ts="ts",
                                          tiebreak="id", value="v",
                                          k=2).to_pandas()) == 0
        assert len(forward_fill(e_t, key="u", ts="ts", tiebreak="id",
                                value="v").to_pandas()) == 0
        e_g = empty_df(g="object", a="float64", b="float64")
        assert len(grouped_linfit(e_g, key="g", x="a", y="b").to_pandas()) == 0
        assert len(grouped_corr(e_g, key="g", x="a", y="b").to_pandas()) == 0
        assert len(grouped_quantiles_cont(e_g, "a", "g", [0.5])) == 0
        assert len(robust_scale_by_group(e_g, key="g",
                                         value="a").to_pandas()) == 0
        assert len(cube_sum(e_g, keys=["g"], value="a")) == 0
        assert len(pivot_sum(e_g, row_key="g", col_key="g", value="a",
                             values=["x"])) == 0
        e_doc = empty_df(doc_id="int64", text="object")
        assert len(inverted_index(e_doc).to_pandas()) == 0
        assert len(hash_top_k_per_group(e_doc, group_column="text",
                                        key_column="doc_id",
                                        k=3).to_pandas()) == 0


class TestUnpivot:
    def test_matches_pandas_melt(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import unpivot

        rng = np.random.default_rng(5)
        df = pd.DataFrame({"k": np.arange(20), "grp": rng.integers(0, 3, 20),
                           "a": rng.normal(size=20),
                           "b": rng.normal(size=20)})
        got = unpivot(rd.from_pandas(df).repartition(4),
                      id_cols=["k", "grp"], value_cols=["a", "b"]) \
            .to_pandas().sort_values(["k", "variable"]).reset_index(drop=True)
        ref = df.melt(id_vars=["k", "grp"], value_vars=["a", "b"],
                      var_name="variable", value_name="value") \
            .sort_values(["k", "variable"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "grp", "variable", "value"]],
            ref[["k", "grp", "variable", "value"]],
            check_dtype=False)

    def test_int_values_cast_to_float(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import unpivot

        df = pd.DataFrame({"k": [1, 2], "x": [3, 4]})
        got = unpivot(rd.from_pandas(df), id_cols=["k"],
                      value_cols=["x"]).to_pandas()
        assert got["value"].dtype == np.float64
        assert sorted(got["value"]) == [3.0, 4.0]
