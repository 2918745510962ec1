"""Round-4 operators: text normalization/cleaning, distributed rank,
count-min sketch, semi/anti join, pivot, exact-k hash sample."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from biocurator_mapper_ray.ops.normalize import (
    dedup_paragraphs,
    domain_counts,
    extract_domain,
    normalize_text,
    strip_markup,
)
from biocurator_mapper_ray.ops.rank import value_ranks
from biocurator_mapper_ray.ops.reshape import pivot_counts
from biocurator_mapper_ray.ops.sample import hash_top_k
from biocurator_mapper_ray.ops.sketch import cms_query, cms_registers


class TestNormalizeKernels:
    def test_normalize_lower_collapse_trim(self):
        b = pa.table({"text": ["  Hello   WORLD \t x ", "", "A\nB", "  "]})
        out = normalize_text(b).column("text_norm").to_pylist()
        assert out == ["hello world x", "", "a b", ""]

    def test_strip_markup_tags_and_entities(self):
        b = pa.table({"text": [
            "<p>Hi &amp; bye</p><b>Z</b>",
            "no markup",
            "&amp;lt; stays escaped once",  # single unescape pass
            "<a href='x\" y'>t</a>",
        ]})
        out = strip_markup(b).column("text_plain").to_pylist()
        assert out == ["Hi & bye Z", "no markup",
                       "&lt; stays escaped once", "t"]

    def test_extract_domain_first_url_and_empty(self):
        b = pa.table({"text": [
            "see http://a.example.com/x and http://b.com",
            "no url here",
            "go https://B-2.org/y",
        ]})
        assert extract_domain(b).column("domain").to_pylist() == [
            "a.example.com", "", "B-2.org"]

    def test_dedup_paragraphs_first_occurrence_order(self):
        b = pa.table({"text": ["a\nb\na\nb\nc", "x", "", "\n\n", "q\nq"]})
        out = dedup_paragraphs(b).column("text_dedup").to_pylist()
        # '' paragraphs dedup too: '\n\n' = ['', '', ''] -> ['']
        assert out == ["a\nb\nc", "x", "", "", "q"]

    def test_dedup_paragraphs_empty_batch(self):
        b = pa.table({"text": pa.array([], pa.string())})
        assert len(dedup_paragraphs(b)) == 0

    def test_domain_counts_excludes_no_url(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"text": [
            "http://a.com/x", "http://a.com/y", "plain", "https://b.org"]})
        got = (domain_counts(rd.from_pandas(df).repartition(2))
               .to_pandas().sort_values("domain").reset_index(drop=True))
        assert got["domain"].tolist() == ["a.com", "b.org"]
        assert got["n_docs"].tolist() == [2, 1]


class TestValueRanks:
    def test_matches_duckdb_rank_with_ties_and_negatives(self, ray_session):
        import duckdb
        import ray.data as rd

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "k": np.arange(3000),
            "g": rng.choice(["a", "b", "c", "solo"], 3000,
                            p=[0.4, 0.4, 0.199, 0.001]),
            "v": np.round(rng.normal(0, 50, 3000), 1),
        })
        df.loc[::5, "v"] = -3.5  # heavy tie block, negative
        got = value_ranks(rd.from_pandas(df).repartition(5),
                          value_col="v", group_col="g", shards=7).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, g, v, CAST(RANK() OVER w AS BIGINT) rnk, "
            "PERCENT_RANK() OVER w pct_rank FROM t "
            "WINDOW w AS (PARTITION BY g ORDER BY v)").df()
        g = (got[["k", "g", "v", "rnk", "pct_rank"]]
             .sort_values("k").reset_index(drop=True))
        w = want.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)

    def test_singleton_group_pct_rank_zero(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": [1], "g": ["only"], "v": [9.0]})
        got = value_ranks(rd.from_pandas(df), value_col="v",
                          group_col="g", shards=4).to_pandas()
        assert got["rnk"].tolist() == [1]
        assert got["pct_rank"].tolist() == [0.0]


class TestCountMin:
    def test_register_totals_and_point_queries(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"text": [
            "the cat sat", "THE the dog", "", "cat  cat cat", "x y z"]})
        regs = cms_registers(rd.from_pandas(df).repartition(3),
                             depth=4, width=64).to_pandas()
        # each row of the sketch sums ALL token occurrences
        totals = regs.groupby("row")["count"].sum()
        assert (totals == 12).all() and len(totals) == 4
        est = cms_query(regs, ["the", "cat", "zzz"], depth=4, width=64)
        # CMS never underestimates; at this tiny scale it is exact
        assert est["the"] == 3 and est["cat"] == 4 and est["zzz"] == 0


class TestSemiAntiJoin:
    def test_semi_anti_partition_and_no_duplication(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import hash_join

        left = pd.DataFrame({"k": [1, 2, 3, 4, 5], "x": list("abcde")})
        # duplicate matching keys on the right must NOT duplicate output
        right = pd.DataFrame({"k": [2, 2, 4, 9]})
        l_ds = rd.from_pandas(left).repartition(2)
        r_ds = rd.from_pandas(right)
        semi = hash_join(l_ds, r_ds, "k", "k", how="semi",
                         buckets=4).to_pandas().sort_values("k")
        anti = hash_join(l_ds, r_ds, "k", "k", how="anti",
                         buckets=4).to_pandas().sort_values("k")
        assert semi["k"].tolist() == [2, 4]
        assert anti["k"].tolist() == [1, 3, 5]
        assert list(semi.columns) == ["k", "x"]
        # disjoint + exhaustive
        assert sorted(semi["k"].tolist() + anti["k"].tolist()) == [1, 2, 3, 4, 5]


class TestPivot:
    def test_counts_match_conditional_agg(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({
            "p": ["hi", "hi", "lo", "lo", "lo"],
            "s": ["F", "O", "F", "F", "P"],
        })
        out = pivot_counts(rd.from_pandas(df).repartition(3),
                           row_key="p", col_key="s", values=["F", "O", "P"])
        assert out["p"].tolist() == ["hi", "lo"]
        assert out["n_F"].tolist() == [1, 2]
        assert out["n_O"].tolist() == [1, 0]
        assert out["n_P"].tolist() == [0, 1]

    def test_unseen_value_raises(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"p": ["a"], "s": ["X"]})
        with pytest.raises(ValueError, match="unseen"):
            pivot_counts(rd.from_pandas(df), row_key="p", col_key="s",
                         values=["F"])


class TestHashTopK:
    def test_exact_k_and_partition_invariance(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.functions.hashing import md5_prefix_u64

        ids = pd.DataFrame({"doc_id": np.arange(1000)})
        a = (hash_top_k(rd.from_pandas(ids).repartition(2),
                        key_column="doc_id", k=25)
             .to_pandas()["doc_id"].sort_values().tolist())
        b = (hash_top_k(rd.from_pandas(ids).repartition(13),
                        key_column="doc_id", k=25)
             .to_pandas()["doc_id"].sort_values().tolist())
        assert a == b and len(a) == 25
        h = md5_prefix_u64(pa.array(np.arange(1000)), 16, prefix="42:")
        want = sorted(np.argsort(h, kind="stable")[:25].tolist())
        assert a == want

    def test_k_larger_than_input(self, ray_session):
        import ray.data as rd

        ids = pd.DataFrame({"doc_id": [3, 1, 2]})
        got = hash_top_k(rd.from_pandas(ids), key_column="doc_id",
                         k=10).to_pandas()
        assert sorted(got["doc_id"].tolist()) == [1, 2, 3]


class TestGroupedCountDistinct:
    def test_matches_pandas_nunique(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import grouped_count_distinct

        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "k": rng.choice(["p", "q", "r"], 5000),
            "v": rng.integers(0, 200, 5000),
        })
        got = (grouped_count_distinct(rd.from_pandas(df).repartition(6),
                                      key="k", value="v")
               .to_pandas().sort_values("k").reset_index(drop=True))
        want = (df.groupby("k")["v"].nunique().reset_index(name="n_distinct")
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestExplodeList:
    def test_positions_and_passthrough(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import explode_list

        rows = [
            {"id": 1, "xs": ["a", "b", "c"], "tag": "t1"},
            {"id": 2, "xs": [], "tag": "t2"},
            {"id": 3, "xs": ["z"], "tag": "t3"},
        ]
        out = (rd.from_items(rows)
               .map_batches(explode_list, fn_kwargs={"column": "xs"},
                            batch_format="pyarrow")
               .to_pandas().sort_values(["id", "pos"])
               .reset_index(drop=True))
        assert out["id"].tolist() == [1, 1, 1, 3]     # empty list → no rows
        assert out["pos"].tolist() == [1, 2, 3, 1]
        assert out["value"].tolist() == ["a", "b", "c", "z"]
        assert out["tag"].tolist() == ["t1", "t1", "t1", "t3"]

    def test_null_list_drops(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import explode_list

        df = pd.DataFrame({"id": [1, 2], "xs": [["a"], None]})
        out = (rd.from_pandas(df)
               .map_batches(explode_list, fn_kwargs={"column": "xs"},
                            batch_format="pyarrow").to_pandas())
        assert out["id"].tolist() == [1]


class TestOrderedGroupConcat:
    def test_matches_pandas_reference(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.reshape import ordered_group_concat

        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "k": rng.choice(["a", "b", "c", "d"], 2000),
            "v": rng.integers(0, 500, 2000),
        })
        got = (ordered_group_concat(rd.from_pandas(df).repartition(5),
                                    key="k", value="v", sep="|")
               .to_pandas().sort_values("k").reset_index(drop=True))
        want = (df.assign(s=df["v"].astype(str)).sort_values(["k", "s"])
                .groupby("k")["s"].agg("|".join)
                .reset_index(name="concat")
                .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "concat"]], want,
                                      check_dtype=False)


class TestProfileColumns:
    def test_counts_nulls_and_typed_extrema(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import profile_columns

        df = pd.DataFrame({
            "i": pd.array([5, None, -3, 9_000_000_000_000_000_000], # > 2^53
                          dtype="Int64"),
            "s": ["b", "a", None, "z"],
            "all_null": pd.array([None] * 4, dtype="Int64"),
        })
        got = (profile_columns(rd.from_pandas(df).repartition(2),
                               columns=["i", "s", "all_null"])
               .to_pandas().set_index("column"))
        assert got.loc["i", "n_rows"] == 4 and got.loc["i", "n_nulls"] == 1
        assert got.loc["i", "min_v"] == "-3"
        assert got.loc["i", "max_v"] == "9000000000000000000"  # int-exact
        assert got.loc["s", "min_v"] == "a" and got.loc["s", "max_v"] == "z"
        assert got.loc["all_null", "n_nulls"] == 4
        assert got.loc["all_null", "min_v"] is None


class TestUnicodeNfc:
    def test_composes_combining_marks(self, ray_session):
        import ray.data as rd
        import unicodedata
        from biocurator_mapper_ray.ops.normalize import unicode_nfc

        raw = ["cafe\u0301", "a\u030a b", "already composed \u00e9", None, ""]
        ds = rd.from_items([{"i": i, "t": t} for i, t in enumerate(raw)])
        got = (ds.map_batches(unicode_nfc, fn_kwargs={"column": "t"},
                              batch_format="pyarrow")
                 .to_pandas().sort_values("i"))
        for t, g in zip(raw, got["t_nfc"]):
            if t is None:
                assert g is None or (isinstance(g, float) and np.isnan(g))
            else:
                assert g == unicodedata.normalize("NFC", t)
        # bytes actually changed for the decomposed inputs
        assert got["t_nfc"].iloc[0] == "caf\u00e9"
        assert len(got["t_nfc"].iloc[0]) < len(raw[0])


class TestStripAccents:
    def test_removes_diacritics(self, ray_session):
        import ray.data as rd
        from biocurator_mapper_ray.ops.normalize import strip_accents

        raw = ["mühsam", "naïve café", "plain", None]
        ds = rd.from_items([{"i": i, "t": t} for i, t in enumerate(raw)])
        got = (ds.map_batches(strip_accents, fn_kwargs={"column": "t"},
                              batch_format="pyarrow")
                 .to_pandas().sort_values("i"))
        assert got["t_ascii"].iloc[0] == "muhsam"
        assert got["t_ascii"].iloc[1] == "naive cafe"
        assert got["t_ascii"].iloc[2] == "plain"


class TestGlobalTopRank:
    def test_top_k_ranks_and_tiebreak(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import global_top_rank

        df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                           "v": [10, 30, 30, 5, 20]})
        got = global_top_rank(rd.from_pandas(df).repartition(3),
                              by="v", tiebreak="id", k=3).to_pandas()
        # v desc, id asc: 30@2, 30@3, 20@5
        assert list(zip(got["id"], got["rank"])) == [(2, 1), (3, 2), (5, 3)]

    def test_ascending(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import global_top_rank

        df = pd.DataFrame({"id": [1, 2, 3], "v": [9, 1, 4]})
        got = global_top_rank(rd.from_pandas(df), by="v", tiebreak="id",
                              k=2, descending=False).to_pandas()
        assert list(zip(got["id"], got["rank"])) == [(2, 1), (3, 2)]


class TestRRFFuse:
    def test_two_list_fusion(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import rrf_fuse

        la = rd.from_pandas(pd.DataFrame({"id": [1, 2], "rank": [1, 2]}))
        lb = rd.from_pandas(pd.DataFrame({"id": [2, 3], "rank": [1, 2]}))
        got = rrf_fuse([la, lb], id_col="id").to_pandas() \
            .set_index("id").sort_index()
        assert got.loc[1, "rrf"] == 1 / 61 and got.loc[1, "n_lists"] == 1
        assert got.loc[2, "rrf"] == 1 / 62 + 1 / 61
        assert got.loc[2, "n_lists"] == 2
        assert got.loc[3, "rrf"] == 1 / 62 and got.loc[3, "n_lists"] == 1

    def test_custom_k(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import rrf_fuse

        la = rd.from_pandas(pd.DataFrame({"id": [9], "rank": [3]}))
        got = rrf_fuse([la], id_col="id", k=10).to_pandas()
        assert got.loc[0, "rrf"] == 1 / 13


class TestPathPrefixRollup:
    def test_rollup_counts_and_ragged_depths(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.normalize import path_prefix_rollup

        urls = [
            "http://A.com/x/y/z",      # depth 0,1,2,3
            "https://a.com/x/q",       # same host (case-folded)
            "http://a.com/x/y",        # shares /x and /x/y
            "http://b.org",            # host only, no segments
            "http://b.org//",          # empty segments masked
            "not a url",               # contributes nothing
            "http://c.net/solo",
        ]
        df = pd.DataFrame({"url": urls})
        got = path_prefix_rollup(
            rd.from_pandas(df).repartition(3), max_depth=3).to_pandas()
        rows = {(int(r.depth), r.prefix): int(r.n_docs)
                for r in got.itertuples()}
        assert rows == {
            (0, "a.com"): 3, (0, "b.org"): 2, (0, "c.net"): 1,
            (1, "a.com/x"): 3, (1, "c.net/solo"): 1,
            (2, "a.com/x/y"): 2, (2, "a.com/x/q"): 1,
            (3, "a.com/x/y/z"): 1,
        }


class TestJsonSchemaProfile:
    def test_key_and_type_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.normalize import json_schema_profile

        rows = ['{"a": 1, "b": "x"}',
                '{"a": "now-a-string"}',
                '{"a": 2, "c": [1, 2]}',
                'not json',
                None,
                '{"d": {"e": 1}}']
        df = pd.DataFrame({"s": rows})
        got = json_schema_profile(
            rd.from_pandas(df).repartition(3), column="s").to_pandas()
        rows_by = {(r.key, r.json_type): int(r.n_rows)
                   for r in got.itertuples()}
        assert rows_by[("b", "VARCHAR")] == 1
        assert rows_by[("c", "ARRAY")] == 1
        assert rows_by[("d", "OBJECT")] == 1
        # key 'a' appears with TWO types: numeric twice, string once
        a_types = {t: n for (k, t), n in rows_by.items() if k == "a"}
        assert a_types.pop("VARCHAR") == 1
        assert sum(a_types.values()) == 2  # the numeric rows
        assert len(got) == 5
