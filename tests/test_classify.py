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
