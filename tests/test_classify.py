"""Hashed linear text classifier (ops/classify.py)."""

import hashlib

import numpy as np
import pandas as pd


def _w(tok: str) -> int:
    h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
    return h % 2001 - 1000


class TestHashedLinearScorer:
    def test_parity_with_hashlib(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.classify import classify_documents

        docs = [
            {"doc_id": 0, "text": "Alpha beta ALPHA  gamma"},
            {"doc_id": 1, "text": "  "},
            {"doc_id": 2, "text": "delta"},
            {"doc_id": 3, "text": "beta beta beta"},
        ]
        out = (classify_documents(rd.from_items(docs).repartition(2))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = []
        for d in docs:
            toks = [t for t in d["text"].lower().split() if t]
            s = sum(_w(t) for t in toks)
            want.append((d["doc_id"], s, len(toks), s > 0))
        want_df = pd.DataFrame(
            want, columns=["doc_id", "weight_sum", "n_tokens", "label"])
        pd.testing.assert_frame_equal(
            out[["doc_id", "weight_sum", "n_tokens", "label"]], want_df,
            check_dtype=False)

    def test_broadcast_trained_weights(self, ray_session):
        import ray
        import ray.data as rd

        from biocurator_mapper_ray.ops.classify import classify_documents

        table = np.arange(64, dtype=np.int64) - 32  # "trained" weights
        ref = ray.put(table)
        docs = [{"doc_id": 0, "text": "foo bar foo"}]
        out = classify_documents(
            rd.from_items(docs), weights_ref=ref).to_pandas()

        def w(tok):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
            return int(table[h % 64])

        assert out["weight_sum"].iloc[0] == 2 * w("foo") + w("bar")
        assert out["n_tokens"].iloc[0] == 3

    def test_label_sign(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.classify import classify_documents

        out = classify_documents(
            rd.from_items([{"doc_id": 0, "text": ""}])).to_pandas()
        assert out["weight_sum"].iloc[0] == 0
        assert out["n_tokens"].iloc[0] == 0
        assert not bool(out["label"].iloc[0])


class TestPCA:
    def test_recovers_planted_principal_axis(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import pca_fit, pca_project

        rng = np.random.default_rng(3)
        axis = np.array([3.0, 4.0, 0.0]) / 5.0  # unit planted direction
        t = rng.normal(0, 10, 500)
        x = np.outer(t, axis) + rng.normal(0, 0.01, (500, 3)) + [1, 2, 3]
        rows = [{"vec_id": i, "embedding": x[i].astype(np.float32).tolist()}
                for i in range(500)]
        ds = rd.from_items(rows).repartition(4)
        mean, comp = pca_fit(ds, dim=1)
        assert np.allclose(mean, [1, 2, 3], atol=0.5)
        assert abs(abs(comp[:, 0] @ axis) - 1.0) < 1e-3  # axis recovered
        proj = (pca_project(ds, dim=1, fitted=(mean, comp))
                .to_pandas().sort_values("vec_id"))
        got = np.array(proj["proj"].tolist())[:, 0]
        # projections reproduce the planted coordinates up to sign/noise
        s = np.sign(got[np.abs(t).argmax()] * t[np.abs(t).argmax()])
        assert np.corrcoef(got * s, t)[0, 1] > 0.9999

    def test_partition_invariant_fit(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import pca_fit

        rng = np.random.default_rng(9)
        x = rng.normal(0, 1, (300, 4)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": x[i].tolist()}
                for i in range(300)]
        m1, c1 = pca_fit(rd.from_items(rows).repartition(2), dim=2)
        m2, c2 = pca_fit(rd.from_items(rows).repartition(7), dim=2)
        assert np.allclose(m1, m2, atol=1e-9)
        assert np.allclose(c1, c2, atol=1e-7)  # deterministic signs

    def test_empty_input(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import pca_fit

        ds = rd.from_pandas(pd.DataFrame(
            {"vec_id": pd.array([], dtype="int64"),
             "embedding": pd.Series([], dtype=object)}))
        mean, comp = pca_fit(ds, dim=2)
        assert len(mean) == 0 and comp.shape == (0, 2)


class TestWeightedSample:
    def test_keep_rule_matches_hashlib(self, ray_session):
        import hashlib

        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import weighted_sample

        rows = [{"doc_id": i, "w": (i * 37) % 120} for i in range(300)]
        out = weighted_sample(
            rd.from_items(rows).repartition(3), weight_column="w",
            key_column="doc_id", denominator=100, seed=5,
        ).to_pandas().sort_values("doc_id")
        want = []
        for r in rows:
            h = int(hashlib.md5(f"5:{r['doc_id']}".encode())
                    .hexdigest()[:16], 16)
            if h % 100 < r["w"]:
                want.append(r["doc_id"])
        assert out["doc_id"].tolist() == want
        # weight >= denominator rows are always kept
        assert all(r["doc_id"] in want for r in rows if r["w"] >= 100)

    def test_zero_weight_never_kept(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import weighted_sample

        rows = [{"doc_id": i, "w": 0} for i in range(50)]
        assert weighted_sample(rd.from_items(rows), weight_column="w",
                               denominator=10).count() == 0


class TestCompressionRatio:
    def test_repetitive_text_compresses_more(self, ray_session):
        import zlib

        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import compression_ratio

        docs = [
            {"doc_id": 0, "text": "spam " * 400},                # templated
            {"doc_id": 1, "text": "x"},
            {"doc_id": 2, "text": ""},
        ]
        rng = np.random.default_rng(2)
        natural = " ".join(
            "".join(chr(97 + c) for c in rng.integers(0, 26, 7))
            for _ in range(400))
        docs.append({"doc_id": 3, "text": natural})
        out = (rd.from_items(docs)
               .map_batches(compression_ratio, batch_format="pyarrow")
               .to_pandas().set_index("doc_id"))
        assert out.loc[0, "zlib_ratio"] < 0.05       # repetition collapses
        assert out.loc[3, "zlib_ratio"] > 0.5        # random stays big
        assert out.loc[2, "n_bytes"] == 0 and out.loc[2, "n_bytes_zlib"] > 0
        b = ("spam " * 400).encode()
        assert out.loc[0, "n_bytes_zlib"] == len(zlib.compress(b, 6))
