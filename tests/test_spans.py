"""Cross-document duplicated-span detection (ops/dedup.duplicate_spans)."""

import numpy as np
import pandas as pd


class TestDuplicateSpans:
    def test_cross_doc_and_within_doc_repeats(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import duplicate_spans

        docs = [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "x y a b c d q"},
            {"doc_id": 3, "text": "zz"},       # < n tokens → no spans
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": "p p p p p"},  # within-doc repeat
        ]
        out = (duplicate_spans(rd.from_items(docs).repartition(2),
                               n=4, buckets=8)
               .to_pandas().sort_values(["doc_id", "start"])
               .reset_index(drop=True))
        want = pd.DataFrame({"doc_id": [1, 2, 5, 5],
                             "start": [1, 3, 1, 2]})
        pd.testing.assert_frame_equal(out[["doc_id", "start"]], want,
                                      check_dtype=False)

    def test_no_duplicates_empty_result(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import duplicate_spans

        docs = [{"doc_id": i, "text": f"u{i} v{i} w{i} x{i} y{i}"}
                for i in range(10)]
        out = duplicate_spans(rd.from_items(docs), n=4, buckets=4)
        assert out.count() == 0

    def test_tokenization_is_whitespace_class(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import duplicate_spans

        # tabs/newlines/case-folding must all normalize to the same span
        docs = [
            {"doc_id": 1, "text": "Alpha\tbeta  GAMMA\ndelta"},
            {"doc_id": 2, "text": "alpha beta gamma delta"},
        ]
        out = (duplicate_spans(rd.from_items(docs), n=4, buckets=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 2]
        assert out["start"].tolist() == [1, 1]

    def test_positions_are_one_based_in_filtered_tokens(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import duplicate_spans

        # leading whitespace produces an empty first split piece that
        # must NOT shift positions
        docs = [
            {"doc_id": 1, "text": "   s t u v tail1"},
            {"doc_id": 2, "text": "s t u v tail2"},
        ]
        out = (duplicate_spans(rd.from_items(docs), n=4, buckets=4)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["start"].tolist() == [1, 1]

    def test_scales_with_planted_duplicate_block(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import duplicate_spans

        rng = np.random.default_rng(5)
        shared = " ".join(f"dup{i}" for i in range(12))  # 12-token block
        docs = []
        for i in range(50):
            noise = " ".join(f"n{i}_{j}" for j in range(20))
            text = f"{noise} {shared}" if i % 10 == 0 else noise
            docs.append({"doc_id": i, "text": text})
        out = (duplicate_spans(rd.from_items(docs).repartition(4), n=8)
               .to_pandas())
        # 5 docs carry the shared block → 12-8+1 = 5 duplicated starts
        # each, all at token offset 21..25
        assert len(out) == 25
        assert sorted(out["doc_id"].unique()) == [0, 10, 20, 30, 40]
        assert set(out["start"]) == {21, 22, 23, 24, 25}


class TestRemoveDuplicateSpans:
    def test_scrub_matches_hand_computation(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import remove_duplicate_spans

        docs = [
            {"doc_id": 1, "text": "a b c d e f"},
            {"doc_id": 2, "text": "x y a b c d q"},
            {"doc_id": 3, "text": "zz"},
            {"doc_id": 4, "text": ""},
            {"doc_id": 5, "text": "p p p p p"},  # self-overlap: repeat
        ]                                         # eats into canonical
        out = (remove_duplicate_spans(rd.from_items(docs).repartition(2),
                                      n=4, buckets=8)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert out["text_dedup"].tolist() == [
            "a b c d e f",  # canonical occurrence untouched
            "x y q",        # non-canonical 'a b c d' removed
            "zz",
            "",
            "p",            # windows at 2..5 deleted, token 1 survives
        ]

    def test_no_duplicates_only_normalizes(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import remove_duplicate_spans

        docs = [{"doc_id": 0, "text": "Mixed\tCASE   and spacing here ok"}]
        out = remove_duplicate_spans(rd.from_items(docs), n=4,
                                     buckets=4).to_pandas()
        assert out["text_dedup"].iloc[0] == "mixed case and spacing here ok"

    def test_canonical_is_corpus_min_doc_start(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import remove_duplicate_spans

        shared = "s1 s2 s3 s4"
        docs = [
            {"doc_id": 9, "text": f"tail9 {shared}"},
            {"doc_id": 2, "text": f"{shared} tail2"},   # min doc_id wins
            {"doc_id": 5, "text": f"pre5 {shared} post5"},
        ]
        out = (remove_duplicate_spans(rd.from_items(docs).repartition(3),
                                      n=4, buckets=8)
               .to_pandas().set_index("doc_id")["text_dedup"])
        assert out[2] == f"{shared} tail2"
        assert out[5] == "pre5 post5"
        assert out[9] == "tail9"
