"""Preference pairs, constraint gate, grouped min-max scaling and the
shard manifest — pinned against brute-force pandas references and
checked partition-invariant."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from biocurator_mapper_ray.ops.moments import minmax_scale_by_group
from biocurator_mapper_ray.ops.pack import shard_manifest
from biocurator_mapper_ray.ops.profile import constraint_checks
from biocurator_mapper_ray.ops.rank import preference_pairs


class TestPreferencePairs:
    @staticmethod
    def _brute(df, k, margin=0):
        out = set()
        for g, grp in df.groupby("g"):
            top = grp.sort_values(["s", "i"], ascending=[False, True]).head(k)
            bot = grp.sort_values(["s", "i"], ascending=[True, True]).head(k)
            for c in top.itertuples():
                for r in bot.itertuples():
                    if c.s > r.s + margin and c.i != r.i:
                        out.add((g, c.i, r.i, c.s, r.s))
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.integers(0, 12, 200),
            "i": np.arange(200),
            "s": rng.integers(0, 40, 200),
        })
        expect = self._brute(df, k=2)
        for parts in (1, 7):
            ds = rd.from_pandas(df).repartition(parts)
            got = preference_pairs(ds, group_col="g", id_col="i",
                                   score_col="s", k=2).to_pandas()
            assert {(r.g, r.chosen_id, r.rejected_id, r.chosen_score,
                     r.rejected_score) for r in got.itertuples()} == expect

    def test_margin_and_singleton_groups(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"g": [0, 0, 0, 1], "i": [1, 2, 3, 4],
                           "s": [10, 12, 15, 99]})
        got = preference_pairs(rd.from_pandas(df), group_col="g",
                               id_col="i", score_col="s", k=2,
                               min_margin=2).to_pandas()
        # 15>10+2 and 15>12+2 pass; 12>10+2 fails (strict >);
        # singleton group 1 emits nothing
        assert {(r.chosen_id, r.rejected_id)
                for r in got.itertuples()} == {(3, 1), (3, 2)}

    def test_tie_scores_emit_no_pair(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"g": [0, 0], "i": [1, 2], "s": [5, 5]})
        got = preference_pairs(rd.from_pandas(df), group_col="g",
                               id_col="i", score_col="s", k=1).to_pandas()
        assert len(got) == 0


class TestConstraintChecks:
    def test_counts(self, ray_session):
        import ray.data as rd

        tbl = pa.table({
            "k": [1, 1, 2, 3, 3, 3],
            "v": pa.array([5, -1, 0, None, 2, 7], pa.int64()),
            "e": ["a", "b", "zz", "a", None, "b"],
        })
        for parts in (1, 3):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = constraint_checks(
                ds, not_null=["v", "e"], positive=["v"],
                enum={"e": ["a", "b"]}, unique=["k"]).to_pandas()
            m = dict(zip(got["rule"], got["n_violations"]))
            assert m == {
                "not_null:v": 1, "not_null:e": 1,
                "positive:v": 2,       # -1 and 0; null excluded
                "enum:e": 2,           # "zz" and the null
                "unique:k": 3,         # 6 rows - 3 distinct keys
            }

    def test_clean_table_all_zero(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"k": [1, 2], "v": [3, 4]})
        got = constraint_checks(rd.from_arrow(tbl), not_null=["v"],
                                positive=["v"], unique=["k"]).to_pandas()
        assert set(got["rule"]) == {"not_null:v", "positive:v", "unique:k"}
        assert (got["n_violations"] == 0).all()


class TestMinmaxScale:
    def test_matches_pandas(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c"], 300),
            "v": np.round(rng.normal(0, 50, 300), 2),
        })
        cents = np.round(df["v"] * 100).astype(np.int64)
        mn = cents.groupby(df["k"]).transform("min")
        mx = cents.groupby(df["k"]).transform("max")
        span = (mx - mn).to_numpy()
        expect = np.where(span > 0,
                          (cents - mn).to_numpy() * 10000
                          // np.maximum(span, 1), 0)
        for parts in (1, 5):
            ds = rd.from_pandas(df).repartition(parts)
            got = minmax_scale_by_group(ds, key="k", value="v").to_pandas()
            # map back by original value order is lost; compare multisets
            # per (k, cents) pair instead
            gm = got.assign(c=np.round(got["v"] * 100).astype(np.int64))
            lookup = {(r.k, r.c): r.bp for r in gm.itertuples()}
            for i in range(len(df)):
                assert lookup[(df["k"][i], cents[i])] == expect[i]

    def test_constant_group_is_zero(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": ["x", "x", "y"], "v": [2.0, 2.0, 9.0]})
        got = minmax_scale_by_group(rd.from_pandas(df), key="k",
                                    value="v").to_pandas()
        assert (got["bp"] == 0).all()
        # endpoints of a non-constant group hit 0 and scale exactly
        df2 = pd.DataFrame({"k": ["x"] * 3, "v": [1.0, 2.0, 3.0]})
        got2 = minmax_scale_by_group(rd.from_pandas(df2), key="k",
                                     value="v").to_pandas().sort_values("v")
        assert list(got2["bp"]) == [0, 5000, 10000]


class TestShardManifest:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        texts = {i: " ".join(["w"] * (i % 4)) for i in range(50)}
        tbl = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        expect = {}
        for i, t in texts.items():
            q = int(hashlib.md5(f"9:{i}".encode()).hexdigest()[:15], 16)
            sh = q >> 56  # 60 - shard_bits(4)
            d, n = expect.get(sh, (0, 0))
            expect[sh] = (d + 1, n + len(t.split()))
        for parts in (1, 6):
            ds = rd.from_arrow(tbl).repartition(parts)
            got = shard_manifest(ds, text_column="text", seed=9,
                                 shard_bits=4).to_pandas()
            assert {r.shard: (r.n_docs, r.n_tokens)
                    for r in got.itertuples()} == expect
            assert got["n_docs"].sum() == 50

    def test_docs_only(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"doc_id": list(range(20))})
        got = shard_manifest(rd.from_arrow(tbl), shard_bits=2).to_pandas()
        assert got["n_docs"].sum() == 20
        assert "n_tokens" not in got.columns


class TestScd2Intervals:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import scd2_intervals

        ts = pd.to_datetime([
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
            "2024-01-01", "2024-01-05",
        ])
        df = pd.DataFrame({
            "k": [1, 1, 1, 1, 2, 2],
            "i": [10, 11, 12, 13, 14, 15],
            "v": ["a", "a", "b", "a", "x", "x"],
            "ts": ts,
        })
        for parts in (1, 3):
            ds = rd.from_pandas(df).repartition(parts)
            got = (scd2_intervals(ds, key="k", ts="ts", tiebreak="i",
                                  value="v").to_pandas()
                   .sort_values(["k", "valid_from"]).reset_index(drop=True))
            # key 1: a [01-01, 01-03), b [01-03, 01-04), a [01-04, NULL);
            # key 2: x [01-01, NULL) — repeats collapsed to maximal spans
            assert list(got["k"]) == [1, 1, 1, 2]
            assert list(got["v"]) == ["a", "b", "a", "x"]
            assert got["valid_from"].tolist() == pd.to_datetime(
                ["2024-01-01", "2024-01-03", "2024-01-04",
                 "2024-01-01"]).tolist()
            assert got["valid_to"].tolist()[:2] == pd.to_datetime(
                ["2024-01-03", "2024-01-04"]).tolist()
            assert pd.isna(got["valid_to"].iloc[2])
            assert pd.isna(got["valid_to"].iloc[3])

    def test_no_collapse_keeps_every_change_row(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.window import scd2_intervals

        df = pd.DataFrame({
            "k": [1, 1], "i": [0, 1], "v": ["a", "a"],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        })
        got = scd2_intervals(rd.from_pandas(df), key="k", ts="ts",
                             tiebreak="i", value="v",
                             collapse=False).to_pandas()
        assert len(got) == 2
