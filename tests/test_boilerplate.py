"""Boilerplate line-removal tests: frequent-line detection, order-
preserving scrub, full-removal edge, partition invariance."""

import numpy as np
import ray.data as rd

from biocurator_mapper_ray.ops.boilerplate import (
    boilerplate_scrub,
    frequent_line_hashes,
    remove_frequent_lines,
)


def _docs():
    return [
        {"doc_id": 0, "text": "COOKIE BANNER\nreal content zero\nfooter"},
        {"doc_id": 1, "text": "COOKIE BANNER\nreal content one\nfooter"},
        {"doc_id": 2, "text": "COOKIE BANNER\nreal content two"},
        {"doc_id": 3, "text": "all alone here"},
        {"doc_id": 4, "text": "COOKIE BANNER\nfooter"},  # fully boilerplate
    ]


class TestFrequentLines:
    def test_doc_counts_not_occurrence_counts(self, ray_session):
        # a line repeated INSIDE one doc counts once toward min_docs
        rows = [{"doc_id": 0, "text": "x\nx\nx"},
                {"doc_id": 1, "text": "y"}]
        freq = frequent_line_hashes(rd.from_items(rows), min_docs=2)
        assert len(freq) == 0
        freq2 = frequent_line_hashes(rd.from_items(rows), min_docs=1)
        assert len(freq2) == 2  # x and y

    def test_threshold(self, ray_session):
        ds = rd.from_items(_docs())
        # COOKIE BANNER in 4 docs, footer in 3
        assert len(frequent_line_hashes(ds, min_docs=3)) == 2
        assert len(frequent_line_hashes(ds, min_docs=4)) == 1
        assert len(frequent_line_hashes(ds, min_docs=5)) == 0

    def test_broadcast_cap_keeps_most_frequent(self, ray_session):
        # adversarial corpus: every line qualifies — the cap must bound
        # the broadcast set (most-frequent lines kept) and warn
        import warnings

        rows = [{"doc_id": d, "text": "\n".join(
            ["shared"] + [f"uniq-{d}-{i}" for i in range(20)])}
            for d in range(10)]
        ds = rd.from_items(rows)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            freq = frequent_line_hashes(ds, min_docs=1, shards=1,
                                        max_lines=5)
            assert any("capped" in str(x.message) for x in w)
        assert len(freq) == 5
        # 'shared' (10 docs) must survive the cap
        from biocurator_mapper_ray.functions.hashing import hash64_column
        import pyarrow as pa

        h = hash64_column(pa.chunked_array([pa.array(["shared"])]))[0]
        assert h in freq
        # uncapped: all 201 distinct lines qualify
        assert len(frequent_line_hashes(ds, min_docs=1)) == 201


class TestScrub:
    def test_removes_frequent_preserves_order(self, ray_session):
        for parts in (1, 4):
            ds = rd.from_items(_docs()).repartition(parts)
            got = boilerplate_scrub(ds, min_docs=3).to_pandas()
            got = got.set_index("doc_id").sort_index()
            # min_docs=3: COOKIE BANNER (4 docs) and footer (3 docs) go
            assert got.loc[0, "text"] == "real content zero"
            assert got.loc[0, "n_removed"] == 2
            assert got.loc[2, "text"] == "real content two"
            assert got.loc[3, "text"] == "all alone here"
            assert got.loc[3, "n_removed"] == 0
            assert got.loc[4, "text"] == ""
            assert got.loc[4, "n_removed"] == 2

    def test_empty_frequent_set_is_noop(self, ray_session):
        ds = rd.from_items(_docs())
        got = remove_frequent_lines(
            ds, np.zeros(0, dtype=np.uint64)).to_pandas()
        src = {d["doc_id"]: d["text"] for d in _docs()}
        for r in got.itertuples():
            assert r.text == src[r.doc_id]
            assert r.n_removed == 0
