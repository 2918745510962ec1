

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
