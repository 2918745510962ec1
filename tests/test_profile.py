

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
