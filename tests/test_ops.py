"""Training-data operator tests: dedup, similarity search, text analysis,
multimodal plumbing (Ray local mode, driver testdata at sf0.001)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biocurator_mapper_ray.ops.dedup import (
    MinHasher,
    _shingle_hashes,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_pairs,
)
from biocurator_mapper_ray.ops.multimodal import (
    FrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    suggest_batch_size,
    synth_media_batch,
)
from biocurator_mapper_ray.ops.similarity import embedding_near_dup_pairs, knn_search
from biocurator_mapper_ray.ops.textstats import (
    LangIdStage,
    fingerprints,
    quality_scores,
    token_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet")


class TestExactDedup:
    def test_keeps_min_id_per_text(self, ray_session):
        import ray.data as rd

        ds = rd.from_items(
            [
                {"doc_id": 5, "text": "aaa"},
                {"doc_id": 1, "text": "aaa"},
                {"doc_id": 2, "text": "bbb"},
                {"doc_id": 9, "text": "bbb"},
                {"doc_id": 3, "text": "ccc"},
            ]
        )
        out = exact_dedup(ds).to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == [1, 2, 3]
        assert set(out.columns) == {"doc_id", "text"}

    def test_on_real_documents(self, ray_session, docs_tbl):
        import duckdb
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = exact_dedup(ds).to_pandas()
        want = duckdb.sql(
            f"select min(doc_id) from read_parquet('{SF}/documents.parquet') group by text"
        ).df()
        assert sorted(got["doc_id"].tolist()) == sorted(want.iloc[:, 0].tolist())


class TestExactDedupIds:
    """Text-light variant: identical survivors to exact_dedup, text never
    crosses an exchange (only (id, h64, md5) rows do)."""

    def test_winners_match_exact_dedup(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import exact_dedup_ids, semi_join_ids

        rows = [
            {"doc_id": 5, "text": "aaa"},
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
            {"doc_id": 9, "text": "bbb"},
            {"doc_id": 3, "text": ""},
            {"doc_id": 7, "text": ""},
        ]
        ds = rd.from_items(rows)
        winners = exact_dedup_ids(ds)
        out = semi_join_ids(ds, winners).to_pandas().sort_values("doc_id")
        base = exact_dedup(ds).to_pandas().sort_values("doc_id")
        assert out["doc_id"].tolist() == base["doc_id"].tolist() == [1, 2, 3]
        assert out["text"].tolist() == base["text"].tolist()

    def test_identical_survivors_on_real_documents(self, ray_session, docs_tbl):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import exact_dedup_ids, semi_join_ids

        ds = rd.read_parquet(f"{SF}/documents.parquet")
        got = semi_join_ids(ds, exact_dedup_ids(ds)).to_pandas()
        base = exact_dedup(ds).to_pandas()
        assert sorted(got["doc_id"].tolist()) == sorted(base["doc_id"].tolist())

    def test_semi_join_empty_ids(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import semi_join_ids

        ds = rd.from_items([{"doc_id": 1, "text": "x"}])
        empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        assert semi_join_ids(ds, empty).count() == 0


class TestSymmetricDiff:
    def test_equal_sets_empty_diff(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import symmetric_diff

        rows = [{"s": f"s{i}", "p": "p", "o": f"o{i % 3}"} for i in range(50)]
        left = rd.from_items(rows)
        right = rd.from_items(list(reversed(rows)))
        assert symmetric_diff(left, right, keys=["s", "p", "o"]).count() == 0

    def test_one_sided_rows_surface_with_side(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import symmetric_diff

        shared = [{"s": f"s{i}", "p": "p", "o": "o"} for i in range(10)]
        left = rd.from_items(shared + [{"s": "only_l", "p": "p", "o": "o"}])
        # duplicates on one side must NOT surface (set semantics)
        right = rd.from_items(shared + shared + [{"s": "only_r", "p": "p", "o": "o"}])
        out = (
            symmetric_diff(left, right, keys=["s", "p", "o"],
                           left_name="emitted_only", right_name="expected_only")
            .to_pandas().sort_values("s")
        )
        assert out["s"].tolist() == ["only_l", "only_r"]
        assert out["side"].tolist() == ["emitted_only", "expected_only"]


class TestDecontam:
    def test_planted_overlap_counts(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.decontam import (
            benchmark_shingle_set,
            contamination_counts,
            decontaminate,
        )

        bench = benchmark_shingle_set(
            ["the quick brown fox jumps over the lazy dog"], n=3
        )
        rows = [
            # contains "the quick brown" etc. → contaminated
            {"doc_id": 1, "text": "well the quick brown fox appeared"},
            {"doc_id": 2, "text": "completely unrelated words here today"},
            {"doc_id": 3, "text": ""},  # no shingles → clean
        ]
        ds = rd.from_items(rows)
        out = contamination_counts(ds, bench, n=3).to_pandas().sort_values("doc_id")
        assert out["contaminated"].tolist() == [True, False, False]
        assert out.loc[out.doc_id == 1, "n_contaminated"].iloc[0] >= 2
        assert out.loc[out.doc_id == 3, "n_shingles"].iloc[0] == 0
        clean = decontaminate(ds, bench, n=3).to_pandas()
        assert sorted(clean["doc_id"].tolist()) == [2, 3]

    def test_empty_benchmark_flags_nothing(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.decontam import (
            benchmark_shingle_set,
            contamination_counts,
        )

        bench = benchmark_shingle_set([], n=3)
        assert bench.size == 0
        ds = rd.from_items([{"doc_id": 1, "text": "some words here"}])
        out = contamination_counts(ds, bench, n=3).to_pandas()
        assert out["contaminated"].tolist() == [False]


class TestMinHash:
    def test_signature_estimates_jaccard(self):
        h = MinHasher(256)
        a = "the quick brown fox jumps over the lazy dog again and again today"
        b = "the quick brown fox jumps over the lazy dog again and again tonight"
        c = "completely different text with nothing shared at all whatsoever"
        sa, sb, sc = (h.signature(_shingle_hashes(t)) for t in (a, b, c))
        true_ab = ngram_jaccard(a, b)
        est_ab = MinHasher.estimate_jaccard(sa, sb)
        assert abs(est_ab - true_ab) < 0.15
        assert MinHasher.estimate_jaccard(sa, sc) < 0.1

    def test_lsh_finds_near_dups(self, ray_session):
        import ray.data as rd

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi"
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " omega"},          # near-dup of 1
            {"doc_id": 3, "text": "totally unrelated words about the weather in spring"},
            {"doc_id": 4, "text": base},                      # exact dup of 1
        ]
        pairs = minhash_lsh_pairs(rd.from_items(rows), threshold=0.5).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert (1, 4) in got
        assert (1, 2) in got or (2, 4) in got
        assert not any(3 in p for p in got)

    def test_jaccard_kernel(self):
        assert ngram_jaccard("a b c d", "a b c d") == 1.0
        assert ngram_jaccard("a b c d", "x y z w") == 0.0
        assert ngram_jaccard("", "") == 0.0  # empty sets: no grams, no pair (oracle parity)
        assert ngram_jaccard("a b c", "") == 0.0

    def test_three_identical_docs_emit_all_pairs(self, ray_session):
        """Regression: star-pattern emission dropped the (2, 3) pair —
        all within-bucket pairs must surface, not just anchor-vs-rest."""
        import ray.data as rd

        text = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [{"doc_id": i, "text": text} for i in (1, 2, 3)]
        pairs = minhash_lsh_pairs(rd.from_items(rows), threshold=0.5).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert got == {(1, 2), (1, 3), (2, 3)}

    def test_distributed_cluster_high_dup_corpus(self, ray_session):
        """Skew test: a dup-heavy corpus (many large duplicate groups)
        clusters correctly through the fully-distributed path — no
        driver-side candidate/signature/edge materialization exists in
        the implementation to fall back on."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import minhash_dedup

        rows = []
        for g in range(5):
            text = " ".join(f"group{g}word{i} filler{i} token{i}" for i in range(12))
            for j in range(20):  # 20 identical docs per group
                rows.append({"doc_id": g * 100 + j, "text": text})
        out = minhash_dedup(rd.from_items(rows), threshold=0.7).to_pandas()
        assert len(out) == 100
        by_cluster = out.groupby("cluster_id")["doc_id"].apply(
            lambda s: sorted(s.tolist())
        )
        assert sorted(map(tuple, by_cluster)) == [
            tuple(range(g * 100, g * 100 + 20)) for g in range(5)
        ]
        # cluster id is the component's min doc_id
        assert sorted(by_cluster.index.tolist()) == [0, 100, 200, 300, 400]

    def test_ngram_jaccard_pairs_modes(self, ray_session):
        """Exact all-pairs mode == per-pair kernel truth; minhash
        candidate mode re-verifies with exact Jaccard (recall ≤ exact,
        values identical where found)."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import ngram_jaccard_pairs

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " extra"},
            {"doc_id": 3, "text": base},
            {"doc_id": 4, "text": "totally different words with no overlap at all here now"},
        ]
        exact = ngram_jaccard_pairs(rd.from_items(rows), threshold=0.5,
                                    candidates="all").to_pandas()
        got = {tuple(sorted((a, b))): j
               for a, b, j in zip(exact["a"], exact["b"], exact["jaccard"])}
        want = {}
        for i in range(len(rows)):
            for k in range(i + 1, len(rows)):
                j = ngram_jaccard(rows[i]["text"], rows[k]["text"])
                if j >= 0.5:
                    want[(rows[i]["doc_id"], rows[k]["doc_id"])] = j
        assert set(got) == set(want)
        for p, j in want.items():
            assert abs(got[p] - j) < 1e-12
        assert (1, 3) in got and got[(1, 3)] == 1.0

        lsh = ngram_jaccard_pairs(rd.from_items(rows), threshold=0.5,
                                  candidates="minhash").to_pandas()
        lsh_got = {tuple(sorted((a, b))): j
                   for a, b, j in zip(lsh["a"], lsh["b"], lsh["jaccard"])}
        assert set(lsh_got) <= set(got)
        for p, j in lsh_got.items():
            assert abs(got[p] - j) < 1e-12
        assert (1, 3) in lsh_got  # identical docs always collide

    def test_pair_index_helpers(self):
        from biocurator_mapper_ray.ops.dedup import _allpairs_index, _connect_index

        ia, ib = _allpairs_index(np.array([3, 1, 2]))
        assert list(zip(ia.tolist(), ib.tolist())) == [(0, 1), (0, 2), (1, 2), (4, 5)]
        ia, ib = _allpairs_index(np.array([], dtype=np.int64))
        assert len(ia) == 0
        ia, ib = _connect_index(np.array([4, 2]))
        got = set(zip(ia.tolist(), ib.tolist()))
        # chain 0-1-2-3 + star 0-2, 0-3; chain 4-5
        assert got == {(0, 1), (1, 2), (2, 3), (0, 2), (0, 3), (4, 5)}


class TestSimHash:
    def test_near_identical_pair_found(self, ray_session):
        import ray.data as rd

        base = " ".join(f"word{i}" for i in range(60))
        rows = [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("word59", "word99")},
            {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(60))},
        ]
        pairs = simhash_pairs(rd.from_items(rows), max_hamming=8).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert (1, 2) in got
        assert not any(3 in p for p in got)

    def test_three_identical_docs_emit_all_pairs(self, ray_session):
        """Regression: anchor-vs-rest comparison dropped (2, 3); the
        pigeonhole guarantee requires every within-bucket pair."""
        import ray.data as rd

        text = " ".join(f"word{i}" for i in range(60))
        rows = [{"doc_id": i, "text": text} for i in (1, 2, 3)]
        pairs = simhash_pairs(rd.from_items(rows), max_hamming=3).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert got == {(1, 2), (1, 3), (2, 3)}
        assert (pairs["hamming"] == 0).all()

    def test_matches_bruteforce_hamming(self, ray_session):
        """LSH-banded pairs == brute-force all-pairs Hamming ≤ 3 (the
        pigeonhole recall guarantee, end to end on a varied corpus)."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import SimHashStage, _popcount64

        rng = np.random.default_rng(7)
        vocab = [f"tok{i}" for i in range(50)]
        rows = []
        for d in range(30):
            n = rng.integers(20, 40)
            rows.append({"doc_id": d, "text": " ".join(rng.choice(vocab, n))})
        # planted near-dups: single-token edits of doc 0 land within a
        # few Hamming bits; exact dups land at 0
        base = rows[0]["text"]
        rows.append({"doc_id": 30, "text": base})
        rows.append({"doc_id": 31, "text": base + " tok0"})
        rows.append({"doc_id": 32, "text": base})
        got = simhash_pairs(rd.from_items(rows), max_hamming=3).to_pandas()
        got_pairs = {(a, b) for a, b in zip(got["a"], got["b"])}
        assert {(0, 30), (0, 32), (30, 32)} <= got_pairs

        stage = SimHashStage()
        sims = np.array([stage.simhash(r["text"]) for r in rows], dtype=np.uint64)
        ham = _popcount64(sims[:, None] ^ sims[None, :])
        want = {
            (i, j)
            for i in range(len(rows))
            for j in range(i + 1, len(rows))
            if ham[i, j] <= 3
        }
        assert got_pairs == want


class TestKnnSearch:
    def test_matches_numpy_bruteforce(self, ray_session):
        import ray.data as rd

        tbl = pq.read_table(f"{SF}/embeddings.parquet")
        mat = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
        ids = tbl.column("vec_id").to_numpy()
        queries = mat[:3]
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        got = knn_search(ds, queries, k=10).to_pandas()

        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qn @ mn.T
        for q in range(3):
            order = np.lexsort((ids, -sims[q]))[:10]
            expect = ids[order].tolist()
            sub = got[got["query_id"] == q].sort_values("rank")
            assert sub["vec_id"].tolist() == expect

    def test_embedding_near_dup(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(0)
        base = rng.normal(size=32).astype(np.float32)
        rows = [
            {"vec_id": 1, "embedding": base.tolist()},
            {"vec_id": 2, "embedding": (base + rng.normal(size=32, scale=0.01).astype(np.float32)).tolist()},
            {"vec_id": 3, "embedding": rng.normal(size=32).astype(np.float32).tolist()},
        ]
        pairs = embedding_near_dup_pairs(
            rd.from_items(rows), dim=32, threshold=0.95
        ).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert got == {(1, 2)}

    def test_embedding_near_dup_all_pairs_vs_bruteforce(self, ray_session):
        """Engine pairs == numpy brute-force cosine ≥ t, including pairs
        where neither member is the bucket anchor (star-pattern
        regression), with cosines pinned to 1e-5 of float64 truth."""
        import ray.data as rd

        rng = np.random.default_rng(3)
        base = rng.normal(size=(20, 16)).astype(np.float32)
        rows = [{"vec_id": i, "embedding": v.tolist()} for i, v in enumerate(base)]
        for vid in (100, 101, 102):
            pert = base[0] + 0.001 * rng.normal(size=16).astype(np.float32)
            rows.append({"vec_id": vid, "embedding": pert.tolist()})
        got = embedding_near_dup_pairs(
            rd.from_items(rows), dim=16, threshold=0.99
        ).to_pandas()
        got_pairs = {tuple(sorted((a, b))) for a, b in zip(got["a"], got["b"])}

        ids = np.array([r["vec_id"] for r in rows])
        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        want = {
            tuple(sorted((int(ids[i]), int(ids[j]))))
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if sims[i, j] >= 0.99
        }
        assert got_pairs == want
        assert {(100, 101), (100, 102), (101, 102)} <= got_pairs
        id_pos = {int(v): i for i, v in enumerate(ids)}
        for _, row in got.iterrows():
            truth = sims[id_pos[int(row["a"])], id_pos[int(row["b"])]]
            assert abs(row["cosine"] - truth) < 1e-5

    def test_ivf_recall_on_clustered_data(self, ray_session, tmp_path):
        """Clustered vectors: probing a quarter of the cells recovers the
        true neighbors; probing all cells is exactly brute force."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import ivf_partition, ivf_search

        rng = np.random.default_rng(7)
        centers = rng.normal(size=(8, 24)).astype(np.float32) * 4
        rows = []
        for i in range(400):
            c = i % 8
            v = centers[c] + rng.normal(size=24, scale=0.05).astype(np.float32)
            rows.append({"vec_id": i, "embedding": v.tolist()})
        ds = rd.from_items(rows)
        out = str(tmp_path / "ivf")
        ivf_partition(ds, out, n_cells=8, sample_size=400, kmeans_iters=10)

        queries = np.stack([np.asarray(rows[i]["embedding"]) for i in (0, 1, 5)])
        from biocurator_mapper_ray.ops.similarity import knn_search

        exact = knn_search(rd.from_items(rows), queries, k=10).to_pandas()
        approx = ivf_search(out, queries, k=10, n_probe=2).to_pandas()
        for qi in range(3):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            assert len(a & e) / 10 >= 0.9, (qi, a, e)

        full = ivf_search(out, queries, k=10, n_probe=8).to_pandas()
        for qi in range(3):
            assert (
                full[full["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
                == exact[exact["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
            )


class TestTextStats:
    def test_token_counts(self):
        batch = pa.table({"doc_id": [1, 2, 3, 4], "text": ["a b  c", "", "  ", "don't stop"]})
        out = token_counts(batch).to_pylist()
        assert [r["n_tokens_ws"] for r in out] == [3, 0, 0, 2]
        assert out[3]["n_tokens_bpe"] == 3  # don | 't | stop

    def test_quality_scores(self):
        batch = pa.table({"doc_id": [1], "text": ["Ab1! x"]})
        r = quality_scores(batch).to_pylist()[0]
        assert r["n_chars_txt"] == 6
        assert r["n_punct"] == 1
        assert r["n_digit"] == 1
        assert r["n_upper"] == 1
        assert abs(r["punct_ratio"] - round(1 / 6, 6)) < 1e-9

    def test_langid(self):
        stage = LangIdStage()
        batch = pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat is on the mat and it is happy with the sun",
                    "el gato es una mascota para la casa y es feliz",
                    "zzz qqq xxx",
                ],
            }
        )
        out = stage(batch).to_pylist()
        assert out[0]["lang_pred"] == "en"
        assert out[1]["lang_pred"] == "es"
        assert out[2]["lang_pred"] == "und"

    def test_fingerprints_match_hashlib(self):
        batch = pa.table({"doc_id": [1, 2], "text": ["  Hello World  ", "abc"]})
        out = fingerprints(batch).to_pylist()
        assert out[0]["fp_md5"] == hashlib.md5(b"hello world").hexdigest()
        assert out[1]["fp_md5"] == hashlib.md5(b"abc").hexdigest()
        assert out[0]["fp_sim64"] != out[1]["fp_sim64"]


class TestAudioOps:
    def test_decode_resample_features_pipeline(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.multimodal import (
            AudioDecodeStage, AudioFeatureStage, AudioResampleStage,
            synth_media_batch,
        )

        ds = rd.from_arrow(synth_media_batch(10, kind="audio", payload_bytes=4096))
        out = (
            ds.map_batches(AudioDecodeStage,
                           fn_constructor_kwargs={"fake": True, "sample_rate": 16000},
                           batch_format="pyarrow", concurrency=2)
            .map_batches(AudioResampleStage, fn_constructor_kwargs={"target_rate": 8000},
                         batch_format="pyarrow", concurrency=2)
            .map_batches(AudioFeatureStage, batch_format="pyarrow", concurrency=2)
        ).to_pandas()
        assert len(out) == 10
        # 4096 bytes → 2048 samples at 16k → ~1024 at 8k
        assert all(abs(len(s) - 1024) <= 1 for s in out["samples"])
        assert (out["sample_rate"] == 8000).all()
        for f in out["audio_features"]:
            rms, zcr, peak, n = f
            assert 0 < rms <= peak <= 32768
            assert 0.0 <= zcr <= 1.0 and n > 0

    def test_resample_identity_and_exactness(self):
        import pyarrow as pa

        from biocurator_mapper_ray.ops.multimodal import AudioResampleStage

        # a pure ramp resampled 2:1 by linear interp keeps the ramp
        x = np.arange(0, 2000, 2, dtype=np.int16)  # 1000 samples
        batch = pa.table({
            "samples": pa.array([x.tolist()], pa.list_(pa.int16())),
            "sample_rate": pa.array([16000], pa.int32()),
        })
        out = AudioResampleStage(target_rate=8000)(batch)
        y = np.asarray(out.column("samples").to_pylist()[0])
        assert len(y) == 500
        ramp = np.diff(y.astype(np.int64))
        assert (np.abs(ramp - 4) <= 1).all()  # ~double the step
        # same-rate input passes through untouched
        out2 = AudioResampleStage(target_rate=16000)(batch)
        assert out2.column("samples").to_pylist()[0] == x.tolist()

    def test_real_decode_non_riff_raises_loudly(self):
        # real mode now always has the stdlib WAV codec; non-RIFF
        # payloads (compressed codecs without soundfile) fail loudly
        # inside the decode
        import pytest

        from biocurator_mapper_ray.ops.multimodal import (
            AudioDecodeStage, synth_media_batch,
        )

        stage = AudioDecodeStage(fake=False)
        with pytest.raises(Exception, match="RIFF|soundfile|WAV"):
            stage(synth_media_batch(1, kind="audio"))


class TestMultimodal:
    def test_decode_non_ppm_raises_without_fake(self):
        # real mode now always has the pure-numpy PPM codec; non-PPM
        # payloads (compressed formats without Pillow) fail in decode
        stage = ImageDecodeStage()
        with pytest.raises(Exception, match="PPM|Pillow"):
            stage(synth_media_batch(1))

    def test_fake_decode_pipeline(self, ray_session):
        import ray.data as rd

        tbl = synth_media_batch(10)
        ds = rd.from_arrow(tbl)
        decoded = ds.map_batches(
            ImageDecodeStage, fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow", batch_size=suggest_batch_size(4096), concurrency=1,
        )
        feats = decoded.map_batches(ImageFeatureStage, batch_format="pyarrow", concurrency=1)
        out = feats.to_pandas()
        assert len(out) == 10
        assert all(len(f) == 6 for f in out["features"])
        # deterministic: same payload -> same features
        out2 = (
            rd.from_arrow(synth_media_batch(10))
            .map_batches(ImageDecodeStage, fn_constructor_kwargs={"fake": True},
                         batch_format="pyarrow", concurrency=1)
            .map_batches(ImageFeatureStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        assert np.allclose(np.stack(out["features"]), np.stack(out2["features"]))

    def test_frame_sampling(self):
        tbl = synth_media_batch(3, kind="video", payload_bytes=5000)
        out = FrameSampleStage(every_n_bytes=1024, max_frames=4)(tbl).to_pylist()
        assert out[0]["frame_offsets"] == [0, 1024, 2048, 3072]

    def test_batch_size_suggestion(self):
        assert suggest_batch_size(1 << 20) == 64
        assert suggest_batch_size(1) == 4096
        assert suggest_batch_size(1 << 30) == 1


class TestSampleOps:
    def test_hash_sample_deterministic_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import hash_sample

        rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(300)]
        a = hash_sample(rd.from_items(rows), pct=20, seed=42).to_pandas()
        b = hash_sample(rd.from_items(rows).repartition(7), pct=20, seed=42).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        # roughly pct-sized, never empty at this n
        assert 30 <= len(a) <= 90
        # a different seed draws a different subset
        c = hash_sample(rd.from_items(rows), pct=20, seed=1).to_pandas()
        assert sorted(c["doc_id"]) != sorted(a["doc_id"])

    def test_hash_split_disjoint_exhaustive(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import hash_split

        rows = [{"doc_id": i, "text": "x"} for i in range(400)]
        out = hash_split(rd.from_items(rows), test_pct=10, seed=7).to_pandas()
        assert len(out) == 400
        assert set(out["split"]) == {"train", "test"}
        n_test = (out["split"] == "test").sum()
        assert 15 <= n_test <= 80
        # same rows always land in the same split
        out2 = hash_split(rd.from_items(rows), test_pct=10, seed=7).to_pandas()
        m = out.merge(out2, on="doc_id")
        assert (m["split_x"] == m["split_y"]).all()

    def test_length_histogram_counts_every_doc(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import length_histogram

        rows = (
            [{"text": "one two three"}] * 5          # 3 tokens -> bucket 0
            + [{"text": " ".join(["w"] * 60)}] * 2   # 60 tokens -> bucket 50
            + [{"text": ""}]                          # 0 tokens -> bucket 0
        )
        out = length_histogram(rd.from_items(rows), bucket_width=50).to_pandas()
        got = dict(zip(out["bucket_lo"], out["n_docs"]))
        assert got == {0: 6, 50: 2}


class TestQuantilesAndWordCounts:
    def test_exact_quantiles_match_numpy_rank(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import exact_quantiles

        rng = np.random.default_rng(5)
        vals = rng.integers(-10_000, 10_000_000, 5000).astype(np.int64)
        qs = [0.01, 0.25, 0.5, 0.9, 0.99]
        out = exact_quantiles(
            rd.from_pandas(pd.DataFrame({"v": vals})).repartition(6), "v", qs
        )
        s = np.sort(vals)
        for q, v in zip(out["q"], out["value"]):
            k = min(len(s), max(1, int(np.ceil(q * len(s)))))
            assert v == s[k - 1], (q, v, s[k - 1])

    def test_exact_quantiles_float_native_dtype(self, ray_session):
        # float columns must come back as exact data values in float64 —
        # no int() truncation (ADVICE r3: int(10.7)=10 silently widened
        # the band in filter_by_quantile)
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import exact_quantiles

        rng = np.random.default_rng(9)
        vals = np.concatenate([rng.normal(10.7, 3.0, 4000),
                               [-0.0, 0.0, -123.456, 1e9]])
        qs = [0.01, 0.25, 0.5, 0.9, 1.0]
        out = exact_quantiles(
            rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5), "v", qs
        )
        assert out["value"].dtype == np.float64
        s = np.sort(vals)
        for q, v in zip(out["q"], out["value"]):
            k = min(len(s), max(1, int(np.ceil(q * len(s)))))
            assert v == s[k - 1], (q, v, s[k - 1])

    def test_grouped_exact_quantiles_float(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import grouped_exact_quantiles

        rng = np.random.default_rng(13)
        df = pd.DataFrame({
            "grp": rng.choice(["a", "b"], 1500),
            "v": rng.normal(0.0, 50.0, 1500),
        })
        out = grouped_exact_quantiles(
            rd.from_pandas(df).repartition(4), "v", "grp", [0.25, 0.9]
        )
        assert out["value"].dtype == np.float64
        for grp, gdf in df.groupby("grp"):
            sv = np.sort(gdf["v"].to_numpy())
            for q in [0.25, 0.9]:
                k = min(len(sv), max(1, int(np.ceil(q * len(sv)))))
                got = out[(out["grp"] == grp) & (out["q"] == q)]["value"].iloc[0]
                assert got == sv[k - 1], (grp, q, got, sv[k - 1])

    def test_filter_by_quantile_float_band_is_exact(self, ray_session):
        # regression for the int()-truncation defect: thresholds must be
        # the exact discrete quantile values of the float column
        import duckdb
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import filter_by_quantile

        rng = np.random.default_rng(21)
        df = pd.DataFrame({"id": np.arange(3000, dtype=np.int64),
                           "score": np.round(rng.normal(10.7, 3.0, 3000), 3)})
        got = (filter_by_quantile(rd.from_pandas(df).repartition(4), "score",
                                  lo_q=0.1, hi_q=0.9)
               .to_pandas().sort_values("id").reset_index(drop=True))
        want = duckdb.sql(
            """SELECT id FROM df WHERE score BETWEEN
               (SELECT quantile_disc(score, 0.1) FROM df)
               AND (SELECT quantile_disc(score, 0.9) FROM df)
               ORDER BY id"""
        ).df()
        assert (got["id"].to_numpy() == want["id"].to_numpy()).all()

    def test_exact_quantiles_heavy_duplicates(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import exact_quantiles

        vals = np.array([7] * 900 + [100] * 90 + [5000] * 10, dtype=np.int64)
        out = exact_quantiles(rd.from_pandas(pd.DataFrame({"v": vals})), "v",
                              [0.5, 0.95, 1.0])
        got = dict(zip(out["q"], out["value"]))
        assert got == {0.5: 7, 0.95: 100, 1.0: 5000}

    def test_word_counts_topk_deterministic(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import word_counts

        rows = [{"text": "b a a"}, {"text": "c b a"}, {"text": "  "},
                {"text": "d c b a"}]
        out = word_counts(rd.from_items(rows), top_k=3).to_pandas()
        assert list(zip(out["token"], out["n"])) == [("a", 4), ("b", 3), ("c", 2)]


class TestRankJoinSketchOps:
    def test_interval_count_join_matches_bruteforce(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import interval_count_join

        rng = np.random.default_rng(5)
        n_l, n_r = 300, 900
        left = pd.DataFrame({
            "event_id": np.arange(n_l, dtype=np.int64),
            "user_id": rng.integers(0, 20, n_l),
            "ts": pd.Timestamp("2026-02-01")
            + pd.to_timedelta(rng.integers(0, 86_400, n_l), unit="s"),
        })
        right = pd.DataFrame({
            "user_id": rng.integers(0, 20, n_r),
            "ts": pd.Timestamp("2026-02-01")
            + pd.to_timedelta(rng.integers(0, 86_400, n_r), unit="s"),
        })
        out = interval_count_join(
            rd.from_pandas(left).repartition(4),
            rd.from_pandas(right).repartition(4),
            key="user_id", left_ts="ts", right_ts="ts",
            lo_offset=pd.Timedelta(minutes=-30), hi_offset=pd.Timedelta(0),
            left_columns=["event_id", "user_id", "ts"], count_name="n",
        ).to_pandas()
        assert len(out) == n_l
        got = dict(zip(out["event_id"], out["n"]))
        for _, row in left.iterrows():
            lo = row["ts"] - pd.Timedelta(minutes=30)
            want = int(((right["user_id"] == row["user_id"])
                        & (right["ts"] >= lo)
                        & (right["ts"] <= row["ts"])).sum())
            assert got[row["event_id"]] == want

    def test_top_k_per_group_matches_pandas(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import top_k_per_group

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "g": rng.integers(0, 9, 500),
            "v": rng.integers(0, 40, 500).astype(np.int64),  # many ties
            "id": np.arange(500, dtype=np.int64),
        })
        out = top_k_per_group(
            rd.from_pandas(df).repartition(6), "g", "v", 3, tiebreak_col="id"
        ).to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
        ref = (df.sort_values(["g", "v", "id"], ascending=[True, False, True],
                              kind="mergesort")
               .groupby("g").head(3).copy())
        ref["rn"] = ref.groupby("g").cumcount() + 1
        ref = ref.sort_values(["g", "rn"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out[["g", "v", "id", "rn"]], ref[["g", "v", "id", "rn"]],
            check_dtype=False)

    def test_grouped_exact_quantiles(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import grouped_exact_quantiles

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "grp": rng.choice(["a", "b", "c"], 2000),
            "v": rng.integers(-10_000, 10_000_000, 2000).astype(np.int64),
        })
        out = grouped_exact_quantiles(
            rd.from_pandas(df).repartition(5), "v", "grp", [0.25, 0.5, 0.99]
        )
        for grp, gdf in df.groupby("grp"):
            vals = np.sort(gdf["v"].to_numpy())
            for q in [0.25, 0.5, 0.99]:
                k = min(len(vals), max(1, int(np.ceil(q * len(vals)))))
                want = int(vals[k - 1])  # rank = ceil(q*n), quantile_disc
                got = out[(out["grp"] == grp) & (out["q"] == q)]["value"].iloc[0]
                assert got == want, (grp, q, got, want)

    def test_hll_estimate_accuracy(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import hll_estimate, hll_registers

        # 4000 distinct tokens spread over 400 docs, each repeated in
        # several docs — estimate must land within ~3 standard errors
        # (1.04/sqrt(256) ≈ 6.5%)
        rng = np.random.default_rng(3)
        vocab = [f"tok{i:05d}" for i in range(4000)]
        docs = [" ".join(rng.choice(vocab, 40, replace=False))
                for _ in range(400)]
        distinct = len({t for d in docs for t in d.split()})
        ds = rd.from_items([{"text": d} for d in docs]).repartition(4)
        regs = hll_registers(ds, m=256).to_pandas()
        est = hll_estimate(regs, m=256)
        assert abs(est - distinct) / distinct < 0.20
        assert (regs["register"].between(0, 255)).all()
        assert (regs["max_rank"].between(1, 57)).all()

    def test_rank_of_kernel(self):
        from biocurator_mapper_ray.ops.sketch import _rank_of

        rest = np.array([0, 1, 2, 12, 96, 2**55], dtype=np.uint64)
        got = _rank_of(rest, 57)
        assert got.tolist() == [57, 1, 2, 3, 6, 56]

    def test_tfidf_top_terms_small(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import tfidf_top_terms

        rows = [
            {"doc_id": 0, "text": "apple apple banana common"},
            {"doc_id": 1, "text": "banana cherry common"},
            {"doc_id": 2, "text": "common common cherry"},
        ]
        out = tfidf_top_terms(rd.from_items(rows), k=2).to_pandas()
        n, scale = 3, 1_000_000
        # doc 0: apple tf=2 df=1 → 2*(3M//1)=6M; banana tf=1 df=2 → 1.5M
        d0 = out[out["doc_id"] == 0].sort_values("rn")
        assert list(d0["token"]) == ["apple", "banana"]
        assert list(d0["score"]) == [2 * (scale * n // 1), scale * n // 2]
        # doc 2: common tf=2 df=3 → 2M; cherry tf=1 df=2 → 1.5M
        d2 = out[out["doc_id"] == 2].sort_values("rn")
        assert list(d2["token"]) == ["common", "cherry"]


class TestRepetitionStats:
    def test_counts_and_edges(self):
        from biocurator_mapper_ray.ops.textstats import repetition_stats

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["a a a b b a", "", "solo", "x y x y x"], pa.string()
            ),
        })
        out = (repetition_stats(tbl).to_pandas().set_index("doc_id")
               .drop(columns="text"))
        # doc 0: words a×4 b×2; bigrams: "a a"×2 "a b" "b b" "b a"
        assert out.loc[0, ["n_words", "n_distinct_words", "top_word_n"]].tolist() == [6, 2, 4]
        assert out.loc[0, ["n_bigrams", "n_distinct_bigrams", "top_bigram_n"]].tolist() == [5, 4, 2]
        assert out.loc[1].tolist() == [0, 0, 0, 0, 0, 0]
        assert out.loc[2].tolist() == [1, 1, 1, 0, 0, 0]
        # doc 3: "x y"×2 "y x"×2
        assert out.loc[3, ["n_bigrams", "n_distinct_bigrams", "top_bigram_n"]].tolist() == [4, 2, 2]

    def test_batch_boundary_independence(self):
        """A doc's stats must not depend on its neighbours (bigrams never
        cross doc boundaries)."""
        from biocurator_mapper_ray.ops.textstats import repetition_stats

        a = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array(["p q"], pa.string())})
        b = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["q r"], pa.string())})
        both = pa.concat_tables([a, b])
        merged = repetition_stats(both).to_pandas().set_index("doc_id")
        solo = repetition_stats(a).to_pandas().set_index("doc_id")
        assert merged.loc[0].tolist() == solo.loc[0].tolist()
        assert merged.loc[0, "n_bigrams"] == 1  # "p q" only — no "q q"


class TestPIIScrub:
    def test_patterns_and_redaction_order(self):
        from biocurator_mapper_ray.ops.pii import pii_scrub

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                "mail a.user+tag@sub.example.org now",
                "call +1 555-123-4567 or 10.0.0.1 x",
                "clean text with no pii at all",
            ], pa.string()),
        })
        out = pii_scrub(tbl).to_pandas().set_index("doc_id")
        assert out.loc[0, "n_email"] == 1 and "<EMAIL>" in out.loc[0, "text_clean"]
        assert "@" not in out.loc[0, "text_clean"]
        assert out.loc[1, "n_phone"] == 1 and out.loc[1, "n_ipv4"] == 1
        assert out.loc[1, "text_clean"] == "call +1 <PHONE> or <IP> x"
        assert out.loc[2][["n_email", "n_phone", "n_ipv4"]].sum() == 0
        assert out.loc[2, "text_clean"] == out.loc[2, "text"]

    def test_counts_on_original_text(self):
        """Counts are per-pattern on the ORIGINAL text, not post-redaction."""
        from biocurator_mapper_ray.ops.pii import pii_scrub

        tbl = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a@b.co c@d.io 1.2.3.4"], pa.string()),
        })
        out = pii_scrub(tbl).to_pandas().iloc[0]
        assert out["n_email"] == 2 and out["n_ipv4"] == 1
        assert out["text_clean"] == "<EMAIL> <EMAIL> <IP>"


def _planted_gaussians(n_per=40, dim=16, seed=7):
    """3 well-separated clusters + exact duplicate tail rows."""
    rng = np.random.default_rng(seed)
    centers = np.zeros((3, dim), np.float32)
    centers[0, 0] = centers[1, 1] = centers[2, 2] = 10.0
    rows = []
    for c in range(3):
        pts = centers[c] + rng.normal(0, 0.05, size=(n_per, dim)).astype(np.float32)
        rows.append(pts)
    mat = np.vstack(rows)
    return mat


class TestKMeansEmbeddings:
    def test_recovers_planted_partition(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import kmeans_embeddings

        mat = _planted_gaussians()
        items = [{"vec_id": i, "embedding": mat[i].tolist()}
                 for i in range(len(mat))]
        ds = rd.from_items(items).repartition(4)
        assigns, cents = kmeans_embeddings(ds, k=3, iters=5)
        df = assigns.to_pandas().sort_values("vec_id")
        labels = df["cluster"].to_numpy()
        # every planted cluster maps to ONE kmeans cluster, all distinct
        blocks = [set(labels[i * 40:(i + 1) * 40]) for i in range(3)]
        assert all(len(b) == 1 for b in blocks)
        assert len(set().union(*blocks)) == 3
        assert cents.shape == (3, 16)
        # centroids are unit-normalized
        np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-5)

    def test_kmeans_exact_matches_local_reference(self, ray_session):
        # the oracle-parity mode must equal a straight local replay of
        # its spec: md5-rank init, int64 distances, floor-div updates
        import ray.data as rd

        from biocurator_mapper_ray.functions.hashing import md5_prefix_u64
        from biocurator_mapper_ray.ops.cluster import kmeans_exact

        rng = np.random.default_rng(3)
        mat = rng.normal(0, 1, (200, 8)).astype(np.float32)
        ids = np.arange(200, dtype=np.int64)
        items = [{"vec_id": int(i), "embedding": mat[i].tolist()}
                 for i in ids]
        k, iters, scale = 4, 3, float(1 << 20)

        q = np.floor(mat.astype(np.float64) * scale + 0.5).astype(np.int64)
        keys = md5_prefix_u64(ids, 15, prefix="42:").astype(np.int64)
        cents = q[np.lexsort((ids, keys))[:k]].copy()
        for _ in range(iters):
            d2 = ((q * q).sum(1)[:, None] - 2 * (q @ cents.T)
                  + (cents * cents).sum(1)[None, :])
            a = np.argmin(d2, axis=1)
            for c in range(k):
                m = a == c
                if m.any():
                    cents[c] = q[m].sum(0) // int(m.sum())
        d2 = ((q * q).sum(1)[:, None] - 2 * (q @ cents.T)
              + (cents * cents).sum(1)[None, :])
        want = np.argmin(d2, axis=1)

        for parts in (1, 5):
            out = (kmeans_exact(rd.from_items(items).repartition(parts),
                                k=k, iters=iters)
                   .to_pandas().sort_values("vec_id"))
            assert (out["cluster"].to_numpy() == want).all()

    def test_empty_input_returns_empty(self, ray_session):
        # ADVICE r3: empty input must not die inside numpy init
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import (kmeans_embeddings,
                                                       semdedup_embeddings)

        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "embedding": pd.Series([], dtype=object)})
        assigns, cents = kmeans_embeddings(rd.from_pandas(empty), k=3)
        assert assigns.count() == 0
        assert cents.shape[0] == 0
        kept = semdedup_embeddings(rd.from_pandas(empty), k=3)
        assert kept.count() == 0

    def test_deterministic_across_partitionings(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import kmeans_embeddings

        mat = _planted_gaussians()
        items = [{"vec_id": i, "embedding": mat[i].tolist()}
                 for i in range(len(mat))]
        outs = []
        for parts in (2, 7):
            ds = rd.from_items(items).repartition(parts)
            assigns, _ = kmeans_embeddings(ds, k=3, iters=3)
            outs.append(assigns.to_pandas().sort_values("vec_id")
                        .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestSemDeDup:
    def test_drops_planted_near_dups_keeps_lowest_id(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import semdedup_embeddings

        mat = _planted_gaussians()
        # plant exact duplicates of rows 0 and 40 at high ids
        dup_src = [0, 0, 40]
        items = [{"vec_id": i, "embedding": mat[i].tolist()}
                 for i in range(len(mat))]
        for j, src in enumerate(dup_src):
            items.append({"vec_id": 1000 + j, "embedding": mat[src].tolist()})
        ds = rd.from_items(items).repartition(4)
        out = semdedup_embeddings(ds, threshold=0.999999, k=3, iters=5)
        kept = set(out.to_pandas()["vec_id"])
        # exact dups of kept lower ids are gone; originals survive
        assert {1000, 1001, 1002}.isdisjoint(kept)
        assert {0, 40} <= kept

    def test_threshold_one_keeps_everything_distinct(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.cluster import semdedup_embeddings

        mat = _planted_gaussians(n_per=10)
        items = [{"vec_id": i, "embedding": mat[i].tolist()}
                 for i in range(len(mat))]
        ds = rd.from_items(items).repartition(3)
        out = semdedup_embeddings(ds, threshold=1.01, k=3, iters=3)
        assert len(out.to_pandas()) == len(mat)


class TestQualityFilter:
    def test_keep_rules_on_crafted_docs(self):
        import pyarrow as pa

        from biocurator_mapper_ray.ops.textstats import quality_filter

        docs = {
            0: "one two three four five six seven",   # healthy -> keep
            1: "too short",                            # n_words < 5 -> drop
            2: "spam spam spam spam spam ham",         # top word 5/6 > 1/2 -> drop
            3: " ".join(["a b c d"] * 10),             # distinct 4/40 < 1/4 -> drop
            4: "",                                     # empty -> drop
        }
        tbl = pa.table({"doc_id": list(docs), "text": list(docs.values())})
        out = quality_filter(tbl).to_pandas().set_index("doc_id")
        assert out.loc[0, "keep"]
        assert not out.loc[1, "keep"]
        assert not out.loc[2, "keep"]
        assert not out.loc[3, "keep"]
        assert not out.loc[4, "keep"]
        # evidence columns carried through for audit
        assert out.loc[2, "top_word_n"] == 5 and out.loc[2, "n_words"] == 6

    def test_boundary_is_inclusive(self):
        import pyarrow as pa

        from biocurator_mapper_ray.ops.textstats import quality_filter

        # exactly at every boundary: 8 words, top word 4 (== n/2),
        # distinct 2 (== n/4) -> keep (all rules are <= / >=)
        text = "x x x x y y z w"
        tbl = pa.table({"doc_id": [0], "text": [text]})
        out = quality_filter(tbl).to_pandas()
        assert out.loc[0, "n_words"] == 8
        assert out.loc[0, "top_word_n"] == 4
        assert out.loc[0, "keep"]


class TestQuotaSample:
    def test_quota_enforced_and_partition_invariant(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import quota_sample

        rows = [{"doc_id": i, "domain": f"d{i % 3}"} for i in range(120)]
        a = quota_sample(rd.from_items(rows), group_column="domain",
                        quota=10).to_pandas()
        b = quota_sample(rd.from_items(rows).repartition(7),
                        group_column="domain", quota=10).to_pandas()
        assert len(a) == 30  # 3 domains x quota
        assert a.groupby("domain").size().max() == 10
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])
        # rn is 1..quota within each group
        assert sorted(a[a["domain"] == "d0"]["rn"]) == list(range(1, 11))

    def test_small_groups_survive_whole(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import quota_sample

        rows = [{"doc_id": i, "domain": "big"} for i in range(50)]
        rows += [{"doc_id": 100 + i, "domain": "tiny"} for i in range(3)]
        out = quota_sample(rd.from_items(rows), group_column="domain",
                          quota=20).to_pandas()
        assert (out["domain"] == "tiny").sum() == 3
        assert (out["domain"] == "big").sum() == 20


class TestBudgetSample:
    def test_matches_brute_force_and_partition_invariant(self, ray_session):
        import hashlib

        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import budget_sample

        rows = [{"doc_id": i, "src": f"s{i % 3}", "v": 10 + (i * 7) % 25}
                for i in range(90)]

        def key(i):
            return int(hashlib.md5(f"42:{i}".encode()).hexdigest()[:15], 16)

        expect = {}
        for s in ("s0", "s1", "s2"):
            run = 0
            for r in sorted((r for r in rows if r["src"] == s),
                            key=lambda r: (key(r["doc_id"]), r["doc_id"])):
                if run < 100:
                    expect[r["doc_id"]] = run
                run += r["v"]

        for parts in (1, 8):
            ds = rd.from_items(rows).repartition(parts)
            got = budget_sample(ds, group_column="src", budget=100,
                                value_column="v").to_pandas()
            assert {r.doc_id: r.cum_before for r in got.itertuples()} == expect

    def test_first_row_survives_even_oversized(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import budget_sample

        rows = [{"doc_id": i, "src": "only", "v": 10_000} for i in range(5)]
        got = budget_sample(rd.from_items(rows), group_column="src",
                            budget=100, value_column="v").to_pandas()
        assert len(got) == 1
        assert got["cum_before"].iloc[0] == 0

    def test_budget_monotone(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import budget_sample

        rows = [{"doc_id": i, "src": "s", "v": 7} for i in range(40)]
        ds = rd.from_items(rows)
        small = budget_sample(ds, group_column="src", budget=70,
                              value_column="v").to_pandas()
        big = budget_sample(ds, group_column="src", budget=140,
                            value_column="v").to_pandas()
        assert set(small["doc_id"]).issubset(set(big["doc_id"]))
        assert len(small) == 10 and len(big) == 20


class TestCorpusFreqScores:
    def test_evidence_matches_brute_force(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import corpus_freq_scores

        docs = {0: "a a b c", 1: "b b b", 2: "", 3: "c d d"}
        # counts: b=4, a=2, d=2, c=2 -> top_v=2 vocab {b(4), a(2)}
        # (count DESC, token ASC tie-break: a before c/d)
        ds = rd.from_items(
            [{"doc_id": k, "text": v} for k, v in docs.items()]).repartition(2)
        got = corpus_freq_scores(ds, top_v=2).to_pandas().set_index("doc_id")
        assert got.loc[0].tolist() == [4, 1, 8]   # a,a,b in vocab: 2+2+4
        assert got.loc[1].tolist() == [3, 0, 12]  # b,b,b: 4*3
        assert got.loc[2].tolist() == [0, 0, 0]
        assert got.loc[3].tolist() == [3, 3, 0]   # c,d,d all OOV

    def test_full_vocab_has_no_oov(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import corpus_freq_scores

        ds = rd.from_items([{"doc_id": 0, "text": "x y x"}])
        got = corpus_freq_scores(ds).to_pandas()
        assert got.loc[0, "n_oov"] == 0
        assert got.loc[0, "sum_freq"] == 2 + 1 + 2


class TestFilterByQuantile:
    def test_band_matches_duckdb_semantics(self, ray_session):
        import duckdb
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import filter_by_quantile

        vals = [(i * 37) % 101 for i in range(200)]
        rows = [{"doc_id": i, "v": v} for i, v in enumerate(vals)]
        got = filter_by_quantile(
            rd.from_items(rows).repartition(5), "v",
            lo_q=0.1, hi_q=0.9).to_pandas()
        lo, hi = duckdb.sql(
            "SELECT quantile_disc(v, 0.1), quantile_disc(v, 0.9) "
            "FROM (SELECT unnest(?) AS v)", params=[vals]).fetchone()
        keep = [i for i, v in enumerate(vals) if lo <= v <= hi]
        assert sorted(got["doc_id"]) == keep

    def test_degenerate_single_value(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import filter_by_quantile

        rows = [{"doc_id": i, "v": 5} for i in range(10)]
        got = filter_by_quantile(rd.from_items(rows), "v").to_pandas()
        assert len(got) == 10


class TestAntiJoinIds:
    def test_anti_drops_members_keeps_rest(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import semi_join_ids

        ds = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(10)])
        block = rd.from_items([{"doc_id": i} for i in (2, 5, 7)])
        out = semi_join_ids(ds, block, anti=True).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 3, 4, 6, 8, 9]
        # semi (default) is the complement
        kept = semi_join_ids(ds, block).to_pandas()
        assert sorted(kept["doc_id"]) == [2, 5, 7]

    def test_empty_blocklist_keeps_everything(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import semi_join_ids

        ds = rd.from_items([{"doc_id": 1, "text": "x"}])
        empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        assert semi_join_ids(ds, empty, anti=True).count() == 1


class TestCorpusFreqPartitionInvariance:
    def test_same_evidence_any_partitioning(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import corpus_freq_scores

        rows = [{"doc_id": i, "text": f"w{i % 5} w{i % 3} common"}
                for i in range(60)]
        a = corpus_freq_scores(rd.from_items(rows), top_v=4).to_pandas()
        b = corpus_freq_scores(rd.from_items(rows).repartition(7),
                               top_v=4).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestSq8Quantization:
    def test_roundtrip_error_bounded_and_recall(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import (
            knn_search, sq8_encode, sq8_fit, sq8_knn)

        rng = np.random.default_rng(7)
        centers = rng.normal(size=(8, 24)).astype(np.float32) * 4
        rows = [{"vec_id": i,
                 "embedding": (centers[i % 8]
                               + rng.normal(size=24, scale=0.5)
                               .astype(np.float32)).tolist()}
                for i in range(400)]
        ds = rd.from_items(rows)
        lo, hi = sq8_fit(ds)
        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
        assert np.allclose(lo, mat.min(axis=0)) and \
            np.allclose(hi, mat.max(axis=0))

        codes = sq8_encode(ds, (lo, hi)).materialize()
        # decode one batch and bound the per-dim quantization error
        row0 = codes.take(1)[0]
        span = hi - lo
        dec = np.frombuffer(row0["code"], dtype=np.uint8).astype(
            np.float32) * (span / 255.0) + lo
        orig = np.asarray(rows[int(row0["vec_id"])]["embedding"],
                          dtype=np.float32)
        assert (np.abs(dec - orig) <= span / 255.0 * 0.5 + 1e-5).all()

        queries = np.stack([mat[i] for i in (0, 1, 5)])
        approx = sq8_knn(codes, (lo, hi), queries, k=10).to_pandas()
        exact = knn_search(rd.from_items(rows), queries, k=10).to_pandas()
        for qi in range(3):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(approx[approx["query_id"] == qi]["vec_id"])
            assert len(a & e) / 10 >= 0.9, qi


class TestConversationProfile:
    def test_matches_pandas_across_block_boundaries(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import conversation_profile

        rng = np.random.default_rng(3)
        n = 200
        df = pd.DataFrame({
            "conv_id": [f"c{int(x)}" for x in rng.integers(0, 12, n)],
            "turn_idx": rng.integers(0, 50, n).astype("int32"),
            "role": rng.choice(["user", "assistant", "tool"], n),
            "text": ["x" * int(k) for k in rng.integers(0, 9, n)],
            "tool": rng.choice(["", "search", "calc"], n),
        })
        got = conversation_profile(rd.from_pandas(df).repartition(7)) \
            .to_pandas().set_index("conv_id").sort_index()
        ref = df.groupby("conv_id").apply(
            lambda g: pd.Series({
                "n_turns": len(g),
                "n_tool_turns": int((g["tool"] != "").sum()),
                "n_user_turns": int((g["role"] == "user").sum()),
                "n_assistant_turns": int((g["role"] == "assistant").sum()),
                "total_chars": int(g["text"].str.len().sum()),
                "max_turn_idx": int(g["turn_idx"].max()),
            }), include_groups=False).sort_index()
        for c in ref.columns:
            assert dict(got[c]) == dict(ref[c]), c

    def test_null_text_and_tool(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import conversation_profile

        df = pd.DataFrame({
            "conv_id": ["a", "a"], "turn_idx": [0, 1],
            "role": ["user", "assistant"],
            "text": [None, "hey"], "tool": [None, ""]})
        got = conversation_profile(rd.from_pandas(df)).to_pandas()
        r = got.iloc[0]
        assert (r["n_turns"], r["n_tool_turns"], r["total_chars"],
                r["max_turn_idx"]) == (2, 0, 3, 1)


class TestTableChecksum:
    def _df(self):
        import pandas as pd

        rng = np.random.default_rng(9)
        return pd.DataFrame({
            "k": np.arange(50, dtype=np.int64),
            "s": [f"row{i}v{int(x)}" for i, x in
                  enumerate(rng.integers(0, 7, 50))]})

    def test_matches_duckdb_and_partition_invariant(self, ray_session):
        import duckdb
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import table_checksum

        df = self._df()
        ref = duckdb.sql(
            "SELECT bit_xor(CAST('0x' || substr(md5("
            "CAST(k AS VARCHAR) || chr(31) || s), 1, 16) AS UBIGINT)) "
            "AS checksum, CAST(count(*) AS BIGINT) AS n_rows FROM df"
        ).df()
        for parts in (1, 7):
            got = table_checksum(rd.from_pandas(df).repartition(parts),
                                 columns=["k", "s"])
            assert np.uint64(got["checksum"].iloc[0]) == \
                np.uint64(ref["checksum"].iloc[0])
            assert int(got["n_rows"].iloc[0]) == 50

    def test_detects_single_row_change(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import table_checksum

        df = self._df()
        a = table_checksum(rd.from_pandas(df), columns=["k", "s"])
        df2 = df.copy()
        df2.loc[17, "s"] = "mutated"
        b = table_checksum(rd.from_pandas(df2), columns=["k", "s"])
        assert np.uint64(a["checksum"].iloc[0]) != \
            np.uint64(b["checksum"].iloc[0])

    def test_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import table_checksum

        df = self._df().iloc[:0]
        got = table_checksum(rd.from_pandas(df), columns=["k", "s"])
        assert int(got["n_rows"].iloc[0]) == 0


class TestNumericHistogram:
    def test_matches_numpy(self, ray_session):
        import ray.data as rd
        import pandas as pd

        from biocurator_mapper_ray.ops.profile import numeric_histogram

        rng = np.random.default_rng(4)
        x = rng.normal(0, 10, 500)
        df = pd.DataFrame({"v": x})
        got = numeric_histogram(rd.from_pandas(df).repartition(5),
                                column="v", width=5.0).to_pandas()
        b = np.floor(x / 5.0).astype(np.int64)
        bucket, cnt = np.unique(b, return_counts=True)
        assert dict(zip(got["bucket"], got["n"])) == \
            dict(zip(bucket.tolist(), cnt.tolist()))


class TestMergeUpsert:
    def _base_upd(self):
        import pandas as pd

        base = pd.DataFrame({
            "k": np.arange(10, dtype=np.int64),
            "v": np.arange(10, dtype=np.int64) * 10,
            "ver": np.full(10, 5, dtype=np.int64)})
        upd = pd.DataFrame({
            "k": np.array([3, 5, 12, 5], dtype=np.int64),
            "v": np.array([333, 555, 1212, 556], dtype=np.int64),
            # update for k=3 is OLDER than base; k=5 has two update
            # versions (7 wins); k=12 is an insert
            "ver": np.array([1, 6, 2, 7], dtype=np.int64)})
        return base, upd

    def test_updates_override_and_insert(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import merge_upsert

        base, upd = self._base_upd()
        got = merge_upsert(rd.from_pandas(base).repartition(4),
                           rd.from_pandas(upd).repartition(3),
                           key="k", order_col="ver") \
            .to_pandas().sort_values("k", ignore_index=True)
        assert len(got) == 11
        m = dict(zip(got["k"], got["v"]))
        assert m[3] == 333          # update wins even with older ver
        assert m[5] == 556          # latest update version wins
        assert m[12] == 1212        # insert
        assert m[0] == 0 and m[9] == 90   # untouched base rows
        assert list(got.columns) == ["k", "v", "ver"]

    def test_duplicate_base_keys_latest_wins(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import merge_upsert

        base = pd.DataFrame({"k": [1, 1, 2], "v": [10, 11, 20],
                             "ver": [1, 2, 1]})
        upd = base.iloc[:0]
        got = merge_upsert(rd.from_pandas(base), rd.from_pandas(upd),
                           key="k", order_col="ver").to_pandas()
        m = dict(zip(got["k"], got["v"]))
        assert m == {1: 11, 2: 20}


class TestGroupedDiversity:
    def test_matches_manual_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import grouped_diversity

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 300),
            "v": rng.choice(list("xyzw"), 300)})
        got = grouped_diversity(rd.from_pandas(df).repartition(5),
                                group="g", value="v").to_pandas()
        for _, r in got.iterrows():
            sub = df[df["g"] == r["g"]]["v"].value_counts()
            assert r["n"] == sub.sum()
            assert r["n_distinct"] == len(sub)
            assert r["sum_c2"] == int((sub ** 2).sum())


class TestParetoFrontier:
    def test_matches_bruteforce_dominance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import pareto_frontier

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "x": rng.integers(0, 40, 400).astype(np.int64),
            "y": rng.integers(0, 40, 400).astype(np.int64)})
        got = pareto_frontier(rd.from_pandas(df).repartition(7),
                              x="x", y="y")
        pts = df.drop_duplicates().to_numpy()
        expect = []
        for px, py in np.unique(pts, axis=0):
            dominated = any(
                (qx >= px and qy >= py and (qx > px or qy > py))
                for qx, qy in pts)
            if not dominated:
                expect.append((px, py))
        assert sorted(zip(got["x"], got["y"])) == sorted(expect)
        # frontier y strictly decreases as x increases
        assert (np.diff(got["y"].to_numpy()) < 0).all()

    def test_empty(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.rank import pareto_frontier

        df = pd.DataFrame({"x": pd.Series([], dtype=np.int64),
                           "y": pd.Series([], dtype=np.int64)})
        got = pareto_frontier(rd.from_pandas(df), x="x", y="y")
        assert len(got) == 0


class TestZOrder:
    def test_morton_matches_reference_bits(self):
        from biocurator_mapper_ray.ops.layout import morton_interleave

        x = np.array([0, 1, 2, 3, 255], dtype=np.int64)
        y = np.array([0, 0, 3, 3, 255], dtype=np.int64)
        z = morton_interleave([x, y], 8)
        # bit-by-bit reference: x bit i -> 2i+1, y bit i -> 2i
        want = [sum((((int(a) >> i) & 1) << (2 * i + 1))
                    + (((int(b) >> i) & 1) << (2 * i))
                    for i in range(8)) for a, b in zip(x, y)]
        assert z.tolist() == want
        # locality sanity: (2,3) and (3,3) are adjacent cells
        assert abs(z[3] - z[2]) < abs(z[4] - z[2])

    def test_masking_and_width_guard(self):
        from biocurator_mapper_ray.ops.layout import morton_interleave

        z = morton_interleave([np.array([256 + 5]), np.array([7])], 8)
        zm = morton_interleave([np.array([5]), np.array([7])], 8)
        assert z.tolist() == zm.tolist()  # masked to 8 bits
        with pytest.raises(ValueError):
            morton_interleave([np.zeros(1)] * 4, 16)

    def test_cluster_sorts_and_colocates(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.layout import zorder_cluster

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "a": rng.integers(0, 64, 400).astype(np.int64),
            "b": rng.integers(0, 64, 400).astype(np.int64)})
        got = zorder_cluster(rd.from_pandas(df).repartition(5),
                             cols=["a", "b"], bits=6).to_pandas()
        assert (np.diff(got["zkey"].to_numpy()) >= 0).all()
        assert len(got) == 400
        # z-sorted halves split the (a, b) plane into bounded boxes:
        # each half's bounding box must not cover the full domain on
        # both axes (that's the data-skipping property)
        half = got.iloc[:200]
        spans = (half["a"].max() - half["a"].min(),
                 half["b"].max() - half["b"].min())
        assert min(spans) < 63 or max(spans) < 63


class TestFuzzyContamination:
    def _corpus(self):
        import pandas as pd

        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(60)]
        bench = [" ".join(rng.choice(vocab, 40)) for _ in range(4)]
        near = bench[0].split()
        near[5] = "CHANGED"          # light paraphrase of bench[0]
        docs = ([" ".join(near)]
                + [" ".join(rng.choice(vocab, 40)) for _ in range(20)]
                + [bench[2]]          # verbatim leak
                + [""])               # empty text: contributes nothing
        return bench, pd.DataFrame({
            "doc_id": np.arange(len(docs), dtype=np.int64),
            "text": docs})

    def test_flags_verbatim_and_near_duplicates(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.decontam import fuzzy_contamination

        bench, df = self._corpus()
        got = fuzzy_contamination(
            rd.from_pandas(df).repartition(3), bench,
            hash_mode="fast").to_pandas()
        hits = dict(zip(got["doc_id"], got["n_hit_bands"]))
        assert hits.get(21) == 16        # verbatim: every band collides
        assert 0 in hits                 # near-duplicate caught by LSH
        assert hits[0] < 16              # but not on every band
        assert 22 not in hits            # empty text never flagged
        # unrelated random docs: none should hit all bands
        assert all(v < 16 for k, v in hits.items() if k not in (21,))

    def test_empty_bench_flags_nothing(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.decontam import fuzzy_contamination

        _, df = self._corpus()
        got = fuzzy_contamination(rd.from_pandas(df), [],
                                  hash_mode="fast").to_pandas()
        assert len(got) == 0


class TestGroupedHLL:
    def test_estimate_within_hll_error(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import (
            grouped_hll_estimate, grouped_hll_registers,
        )

        rng = np.random.default_rng(13)
        # group 'a': 500 distinct values, 'b': 50, 'c': 3
        df = pd.DataFrame({
            "g": ["a"] * 2000 + ["b"] * 500 + ["c"] * 100,
            "v": np.concatenate([rng.integers(0, 500, 2000),
                                 rng.integers(1000, 1050, 500),
                                 rng.integers(9000, 9003, 100)])})
        truth = df.groupby("g")["v"].nunique()
        regs = grouped_hll_registers(
            rd.from_pandas(df).repartition(6), group="g", value="v",
            m=64).to_pandas()
        est = grouped_hll_estimate(regs, group="g", m=64)
        for _, r in est.iterrows():
            t = truth[r["g"]]
            assert abs(r["estimate"] - t) / t < 0.35  # m=64 → ~13% rse

    def test_partition_invariant_registers(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sketch import grouped_hll_registers

        df = pd.DataFrame({"g": ["x"] * 200,
                           "v": np.arange(200, dtype=np.int64)})
        a = grouped_hll_registers(rd.from_pandas(df), group="g",
                                  value="v", m=32).to_pandas()
        b = grouped_hll_registers(rd.from_pandas(df).repartition(9),
                                  group="g", value="v", m=32).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestWeightedQuantiles:
    def test_matches_numpy_repeat(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import weighted_quantiles

        rng = np.random.default_rng(17)
        df = pd.DataFrame({
            "v": rng.integers(-50, 50, 400).astype(np.int64),
            "w": rng.integers(0, 9, 400).astype(np.int64)})
        qs = [0.1, 0.5, 0.95]
        got = weighted_quantiles(rd.from_pandas(df).repartition(6),
                                 "v", "w", qs)
        # ground truth: expand each value w times, take ceil(q*W)-th
        expanded = np.sort(np.repeat(df["v"].to_numpy(),
                                     df["w"].to_numpy()))
        W = len(expanded)
        for q, val in zip(got["q"], got["value"]):
            r = min(W, max(1, int(np.ceil(q * W))))
            assert val == expanded[r - 1]

    def test_zero_weight_rows_ignored(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import weighted_quantiles

        df = pd.DataFrame({"v": [1, 2, 1000], "w": [1, 1, 0]})
        got = weighted_quantiles(rd.from_pandas(df), "v", "w", [1.0])
        assert got["value"].iloc[0] == 2  # the w=0 outlier never wins


class TestRollingDistinct:
    def test_matches_bruteforce_window(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.window import rolling_distinct

        rng = np.random.default_rng(23)
        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame({
            "u": rng.integers(0, 30, 500),
            "ts": base + pd.to_timedelta(
                rng.integers(0, 20 * 24, 500), unit="h")})
        got = rolling_distinct(rd.from_pandas(df).repartition(5),
                               key="u", ts="ts", window=7).to_pandas() \
            .sort_values("period", ignore_index=True)
        days = df.assign(d=df["ts"].dt.floor("D"))
        for _, r in got.iterrows():
            p = pd.Timestamp(r["period"])
            w = days[(days["d"] <= p) & (days["d"] > p - pd.Timedelta(days=7))]
            assert r["n_active"] == w["u"].nunique(), p
        # trailing coverage: last period = last active day + 6
        assert pd.Timestamp(got["period"].iloc[-1]) == \
            days["d"].max() + pd.Timedelta(days=6)


class TestSegmentConversations:
    def _df(self):
        import pandas as pd

        rows = [
            # conv A: two topics with an overlap break at turn 2
            ("A", 0, "the cat sat on the mat"),
            ("A", 1, "the cat likes the mat a lot"),
            ("A", 2, "quarterly revenue grew nine percent"),
            ("A", 3, "revenue growth beat forecasts"),
            # conv B: single topic, plus an empty turn
            ("B", 0, "hello world"),
            ("B", 1, ""),
            ("B", 2, "hello again world"),
        ]
        return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])

    def test_boundaries_and_segments(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import segment_conversations

        got = segment_conversations(
            rd.from_pandas(self._df()).repartition(3),
            threshold=0.1).to_pandas() \
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        a = got[got["conv_id"] == "A"]
        assert a["segment_id"].tolist() == [0, 0, 1, 1]
        assert np.isnan(a["sim_prev"].iloc[0])
        # cohesive pair: {the,cat,sat,on,mat} vs {the,cat,likes,mat,a,lot}
        assert a["sim_prev"].iloc[1] == 3 / 8
        assert a["sim_prev"].iloc[2] == 0.0
        b = got[got["conv_id"] == "B"]
        # empty turn: sim 0 -> boundary; next turn compares against the
        # empty turn (inter 0) -> boundary again
        assert b["segment_id"].tolist() == [0, 1, 2]
        assert len(got) == 7

    def test_segment_count_per_conv(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dialog import segment_conversations

        rng = np.random.default_rng(31)
        rows = []
        for c in range(12):
            for t in range(10):
                topic = t // 5  # hard topic switch mid-conv
                vocab = [f"w{topic}_{i}" for i in range(20)]
                # anchors guarantee within-topic cohesion; the random
                # tail varies the surface
                text = (f"anchor{topic}a anchor{topic}b "
                        + " ".join(rng.choice(vocab, 6)))
                rows.append((f"c{c}", t, text))
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
        got = segment_conversations(rd.from_pandas(df).repartition(4),
                                    threshold=0.05).to_pandas()
        segs = got.groupby("conv_id")["segment_id"].nunique()
        assert (segs == 2).all()  # exactly the planted topic switch


class TestMergeUpsertCompositeKey:
    def test_triple_key_merge(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.join import merge_upsert

        base = pd.DataFrame({
            "s": ["a", "a", "b"], "p": ["r", "r", "r"],
            "o": ["x", "y", "x"],
            "conf": [0.5, 0.6, 0.7], "ver": [1, 1, 1]})
        upd = pd.DataFrame({
            "s": ["a", "c"], "p": ["r", "r"], "o": ["y", "z"],
            "conf": [0.9, 0.4], "ver": [2, 2]})
        got = merge_upsert(rd.from_pandas(base).repartition(2),
                           rd.from_pandas(upd),
                           key=["s", "p", "o"], order_col="conf") \
            .to_pandas().sort_values(["s", "o"], ignore_index=True)
        assert len(got) == 4
        m = {(r["s"], r["p"], r["o"]): (r["conf"], r["ver"])
             for _, r in got.iterrows()}
        assert m[("a", "r", "y")] == (0.9, 2)   # updated
        assert m[("a", "r", "x")] == (0.5, 1)   # untouched
        assert m[("c", "r", "z")] == (0.4, 2)   # inserted


class TestResilientMapBatches:
    def _fn(self):
        def double_or_die(batch):
            import pyarrow as pa

            v = batch.column("v").to_numpy(zero_copy_only=False)
            if (v % 37 == 0).any() and len(v) > 0:
                raise ValueError("poison value")
            return pa.table({"v2": pa.array(v * 2)})
        return double_or_die

    def test_poison_rows_quarantined_not_lost(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.dataset as pads
        import ray.data as rd

        from biocurator_mapper_ray.ops.resilient import (
            resilient_map_batches,
        )

        df = pd.DataFrame({"v": np.arange(1, 301, dtype=np.int64)})
        q = str(tmp_path / "quarantine")
        got = resilient_map_batches(
            rd.from_pandas(df).repartition(4), self._fn(),
            quarantine=q).to_pandas()
        poison = set(range(37, 301, 37))
        assert sorted(got["v2"]) == \
            sorted(2 * v for v in range(1, 301) if v not in poison)
        qt = pads.dataset(q).to_table().to_pandas()
        assert sorted(qt["v"]) == sorted(poison)
        assert qt["__error"].str.contains("poison value").all()

    def test_clean_run_touches_nothing(self, ray_session, tmp_path):
        import os
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.resilient import (
            resilient_map_batches,
        )

        df = pd.DataFrame({"v": np.array([1, 2, 3], dtype=np.int64)})
        q = str(tmp_path / "q2")
        got = resilient_map_batches(rd.from_pandas(df), self._fn(),
                                    quarantine=q).to_pandas()
        assert sorted(got["v2"]) == [2, 4, 6]
        assert os.listdir(q) == []


class TestGroupedChecksum:
    def test_matches_duckdb_per_group(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import grouped_checksum

        rng = np.random.default_rng(41)
        df = pd.DataFrame({
            "g": rng.choice(["x", "y", "z"], 120),
            "k": np.arange(120, dtype=np.int64),
            "s": [f"s{i % 11}" for i in range(120)]})
        got = grouped_checksum(rd.from_pandas(df).repartition(5),
                               group="g", columns=["k", "s"]).to_pandas()
        ref = duckdb.sql(
            "SELECT g, bit_xor(CAST('0x' || substr(md5("
            "CAST(k AS VARCHAR) || chr(31) || s), 1, 16) AS UBIGINT)) "
            "AS checksum, CAST(count(*) AS BIGINT) AS n_rows "
            "FROM df GROUP BY g ORDER BY g").df()
        got = got.sort_values("g", ignore_index=True)
        assert got["g"].tolist() == ref["g"].tolist()
        assert [np.uint64(x) for x in got["checksum"]] == \
            [np.uint64(x) for x in ref["checksum"]]
        assert got["n_rows"].tolist() == ref["n_rows"].tolist()


class TestFirstDigitProfile:
    def test_excludes_nonpositive_and_counts(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.profile import first_digit_profile

        df = pd.DataFrame({"v": [1.23, 9.99, 0.0, -5.4, 0.005, 123.0]})
        got = first_digit_profile(rd.from_pandas(df).repartition(3),
                                  column="v").to_pandas()
        # cents: 123, 999, 0(drop), -540(drop), 1(round .5 to even->0?
        # 0.005*100=0.5 rounds to 0 -> drop), 12300
        m = dict(zip(got["digit"], got["n"]))
        assert m == {1: 2, 9: 1}


class TestProductQuantization:
    def test_codebook_shapes_encode_and_recall(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import (
            knn_search, pq_encode, pq_fit, pq_knn)

        rng = np.random.default_rng(11)
        centers = rng.normal(size=(8, 32)).astype(np.float32) * 4
        rows = [{"vec_id": i,
                 "embedding": (centers[i % 8]
                               + rng.normal(size=32, scale=0.3)
                               .astype(np.float32)).tolist()}
                for i in range(400)]
        ds = rd.from_items(rows)
        books = pq_fit(ds, m=8, k=64, sample_size=400, seed=3)
        assert books.shape == (8, 64, 4)

        codes = pq_encode(ds, books).materialize()
        row0 = codes.take(1)[0]
        assert len(row0["pq_code"]) == 8  # 32 floats -> 8 bytes (16x)

        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
        queries = np.stack([mat[i] for i in (0, 3, 7)])
        approx = pq_knn(codes, books, queries, k=10).to_pandas()
        # PQ is coarse WITHIN a cluster by design (the codes quantize
        # away noise-scale distances); the semantic contract is that
        # every neighbor comes from the query's cluster
        for qpos, qid in enumerate((0, 3, 7)):
            a = approx[approx["query_id"] == qpos]["vec_id"].to_numpy()
            assert (a % 8 == qid % 8).all(), qpos
        # and recall@50 contains the exact top-10 (standard PQ eval)
        exact = knn_search(rd.from_items(rows), queries, k=10).to_pandas()
        wide = pq_knn(codes, books, queries, k=50).to_pandas()
        for qi in range(3):
            e = set(exact[exact["query_id"] == qi]["vec_id"])
            a = set(wide[wide["query_id"] == qi]["vec_id"])
            assert len(a & e) / 10 >= 0.9, qi

    def test_empty_and_indivisible_dim(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import pq_fit

        rows = [{"vec_id": 0, "embedding": [0.1] * 30}]
        with pytest.raises(ValueError):
            pq_fit(rd.from_items(rows), m=8, sample_size=10)
        empty = rd.from_items(rows).filter(lambda r: False)
        assert pq_fit(empty, m=8).shape == (8, 0, 0)


class TestIvfPq:
    def test_prunes_reads_and_finds_cluster_neighbors(self, ray_session,
                                                      tmp_path):
        import glob
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import (
            ivf_pq_partition, ivf_pq_search)

        rng = np.random.default_rng(5)
        centers = rng.normal(size=(6, 32)).astype(np.float32) * 5
        rows = [{"vec_id": i,
                 "embedding": (centers[i % 6]
                               + rng.normal(size=32, scale=0.2)
                               .astype(np.float32)).tolist()}
                for i in range(360)]
        idx = str(tmp_path / "ivfpq")
        cents, books = ivf_pq_partition(
            rd.from_items(rows), idx, n_cells=12, m=8, k_codes=32,
            sample_size=360, seed=9)
        assert books.shape == (8, 32, 4)
        assert len(glob.glob(idx + "/cell=*/")) <= 12

        mat = np.asarray([r["embedding"] for r in rows], dtype=np.float32)
        queries = np.stack([mat[0], mat[4]])
        got = ivf_pq_search(idx, queries, k=10, n_probe=3).to_pandas()
        for qpos, qid in enumerate((0, 4)):
            a = got[got["query_id"] == qpos]["vec_id"].to_numpy()
            assert len(a) == 10
            assert (a % 6 == qid % 6).all(), qpos  # right cluster

    def test_full_probe_matches_flat_pq(self, ray_session, tmp_path):
        import ray.data as rd

        from biocurator_mapper_ray.ops.similarity import (
            ivf_pq_partition, ivf_pq_search)

        rng = np.random.default_rng(6)
        rows = [{"vec_id": i,
                 "embedding": rng.normal(size=16).astype(np.float32)
                 .tolist()} for i in range(120)]
        idx = str(tmp_path / "ivfpq2")
        ivf_pq_partition(rd.from_items(rows), idx, n_cells=4, m=4,
                         k_codes=16, sample_size=120, seed=2)
        q = np.asarray([rows[3]["embedding"]], dtype=np.float32)
        full = ivf_pq_search(idx, q, k=5, n_probe=4).to_pandas()
        one = ivf_pq_search(idx, q, k=5, n_probe=1).to_pandas()
        # full probe is a superset-quality result: its top-5 score set
        # dominates the 1-probe result
        assert full["cosine"].iloc[0] >= one["cosine"].iloc[0] - 1e-6
        assert len(full) == 5


class TestNegativePairs:
    def test_deterministic_partition_invariant_no_self(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import negative_pairs

        df = pd.DataFrame({"doc_id": list(range(20))})
        a = negative_pairs(rd.from_pandas(df), id_col="doc_id",
                           m=3, seed=7).to_pandas()
        b = negative_pairs(rd.from_pandas(df).repartition(5),
                           id_col="doc_id", m=3, seed=7).to_pandas()
        key = ["anchor_id", "j"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) == 60
        assert (a["anchor_id"] != a["neg_id"]).all()
        assert a["neg_id"].between(0, 19).all()

    def test_explicit_id_space_and_seed_changes_draws(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import negative_pairs

        df = pd.DataFrame({"doc_id": [100, 101]})
        got = negative_pairs(rd.from_pandas(df), id_col="doc_id", m=2,
                             seed=1, id_lo=100, id_n=50).to_pandas()
        assert got["neg_id"].between(100, 149).all()
        other = negative_pairs(rd.from_pandas(df), id_col="doc_id", m=2,
                               seed=2, id_lo=100, id_n=50).to_pandas()
        key = ["anchor_id", "j"]
        assert not got.sort_values(key)["neg_id"].reset_index(drop=True) \
            .equals(other.sort_values(key)["neg_id"].reset_index(drop=True))

    def test_tiny_id_space_raises(self, ray_session):
        import pandas as pd
        import ray.data as rd

        import pytest as _pytest

        from biocurator_mapper_ray.ops.sample import negative_pairs

        df = pd.DataFrame({"doc_id": [0]})
        with _pytest.raises(ValueError):
            negative_pairs(rd.from_pandas(df), id_col="doc_id", m=1)


class TestNgramContainment:
    def test_asymmetric_quote_detected(self, ray_session):
        """A short doc quoted whole inside a much longer one: high
        containment (cont_a == 1.0), Jaccard well below the same
        threshold — the case the symmetric metric misses."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import (
            ngram_containment_pairs, ngram_jaccard_pairs)

        short = "alpha beta gamma delta epsilon"
        filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
        rows = [
            {"doc_id": 1, "text": short},
            {"doc_id": 2, "text": short + " " + filler},
            {"doc_id": 3, "text": "unrelated words entirely different content here"},
        ]
        got = ngram_containment_pairs(rd.from_items(rows), threshold=0.8,
                                      candidates="all").to_pandas()
        pairs = {(a, b): (ca, cb) for a, b, ca, cb in
                 zip(got["a"], got["b"], got["cont_a"], got["cont_b"])}
        assert set(pairs) == {(1, 2)}
        ca, cb = pairs[(1, 2)]
        assert ca == 1.0          # every 3-gram of doc 1 is in doc 2
        assert cb < 0.2           # doc 2 is mostly other content
        jac = ngram_jaccard_pairs(rd.from_items(rows), threshold=0.8,
                                  candidates="all").to_pandas()
        assert len(jac) == 0      # Jaccard misses the quote at 0.8

    def test_empty_side_scores_zero(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import ngram_containment_pairs

        rows = [{"doc_id": 1, "text": "   "},
                {"doc_id": 2, "text": "   "},
                {"doc_id": 3, "text": "some real text here"}]
        got = ngram_containment_pairs(rd.from_items(rows), threshold=0.1,
                                      candidates="all").to_pandas()
        assert len(got) == 0


class TestBM25:
    def test_evidence_counts(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import bm25_evidence

        rows = [
            {"doc_id": 1, "text": "Hash join hash"},
            {"doc_id": 2, "text": "no match here"},
            {"doc_id": 3, "text": "join the stream"},
        ]
        got = bm25_evidence(rd.from_items(rows).repartition(2),
                            query_terms=["hash", "join"]).to_pandas() \
            .sort_values(["doc_id", "term"]).reset_index(drop=True)
        recs = [tuple(r) for r in got.to_records(index=False)]
        # (doc, term, tf, dl, df, n_docs, sum_dl)
        assert recs == [
            (1, "hash", 2, 3, 1, 3, 9),
            (1, "join", 1, 3, 2, 3, 9),
            (3, "join", 1, 3, 2, 3, 9),
        ]

    def test_scores_match_reference(self, ray_session):
        import math

        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import (
            bm25_evidence, bm25_scores)

        corpus = {
            1: "hash join hash join hash",
            2: "join stream vector data table",
            3: "completely unrelated words only",
            4: "hash",
        }
        rows = [{"doc_id": i, "text": t} for i, t in corpus.items()]
        q = ["hash", "join"]
        ev = bm25_evidence(rd.from_items(rows), query_terms=q).to_pandas()
        got = bm25_scores(ev, k1=1.2, b=0.75).set_index("doc_id")["score"]

        # independent scalar reference
        n = len(corpus)
        toks = {i: t.lower().split() for i, t in corpus.items()}
        avgdl = sum(len(v) for v in toks.values()) / n
        df = {t: sum(1 for v in toks.values() if t in v) for t in q}
        want = {}
        for i, v in toks.items():
            s = 0.0
            for t in q:
                tf = v.count(t)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
            if s > 0:
                want[i] = s
        assert set(got.index) == set(want)
        for i, s in want.items():
            assert abs(got[i] - s) < 1e-12
        # doc 1 (tf-heavy on both terms) outranks doc 4 (single hash)
        assert got[1] > got[4]


class TestEncodeTokens:
    def test_vocab_ids_positions_and_oov(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import (
            build_vocab, encode_tokens)

        rows = [
            {"doc_id": 1, "text": "b a b  c"},
            {"doc_id": 2, "text": "a b rare"},
            {"doc_id": 3, "text": "   "},
        ]
        ds = rd.from_items(rows).repartition(2)
        vocab = build_vocab(ds, vocab_size=2)
        # counts: b=3, a=2, c=1, rare=1 -> vocab b:0, a:1
        assert vocab["token"].tolist() == ["b", "a"]
        assert vocab["token_id"].tolist() == [0, 1]

        got = encode_tokens(ds, vocab_size=2).to_pandas() \
            .sort_values(["doc_id", "pos"]).reset_index(drop=True)
        recs = [tuple(r) for r in got.to_records(index=False)]
        assert recs == [
            (1, 0, 0), (1, 1, 1), (1, 2, 0), (1, 3, -1),  # c is OOV
            (2, 0, 1), (2, 1, 0), (2, 2, -1),             # rare is OOV
        ]  # doc 3 (whitespace-only) emits nothing

    def test_prebuilt_vocab_reused(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import encode_tokens

        vocab = pd.DataFrame({"token": ["x"], "token_id": [7], "n": [1]})
        ds = rd.from_items([{"doc_id": 1, "text": "x y"}])
        got = encode_tokens(ds, vocab=vocab).to_pandas() \
            .sort_values("pos")
        assert got["token_id"].tolist() == [7, -1]


class TestGroupTokenOverlap:
    def test_exact_pairwise_overlap(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.textstats import group_token_overlap

        rows = [
            {"source": "a", "text": "x y z"},
            {"source": "a", "text": "x q"},      # vocab a = {x,y,z,q}
            {"source": "b", "text": "x y"},      # vocab b = {x,y}
            {"source": "c", "text": "unrelated"},
        ]
        got = group_token_overlap(rd.from_items(rows).repartition(3)) \
            .to_pandas().sort_values(["src_a", "src_b"]) \
            .reset_index(drop=True)
        recs = {(r.src_a, r.src_b): (r.inter, r.n_a, r.n_b, r.jaccard)
                for r in got.itertuples()}
        # disjoint pairs emit nothing (no shared token rows)
        assert set(recs) == {("a", "b")}
        assert recs[("a", "b")] == (2, 4, 2, 0.5)


class TestComponentsPointerJumping:
    def test_long_chain_converges_in_log_rounds(self, ray_session):
        """A 400-hop chain needs ~400 plain propagation rounds; with
        adaptive pointer jumping it must settle (no non-convergence
        warning) within 16 — and label everything with the chain min."""
        import warnings as _warnings

        import numpy as np
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import connected_components

        e = pd.DataFrame({"a": np.arange(399), "b": np.arange(1, 400)})
        e = e.sample(frac=1.0, random_state=1).reset_index(drop=True)
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", RuntimeWarning)
            out = connected_components(
                rd.from_pandas(e).repartition(8),
                max_iters=16).to_pandas()
        assert len(out) == 400
        assert (out["component"] == 0).all()


class TestCuratePipeline:
    def test_stages_filter_monotonically(self, ray_session):
        """The composed curation chain on sf0.001: every stage only
        removes rows; packed output covers survivors exactly once with
        contiguous token offsets."""
        import __ray_entry__ as entry

        out = entry._q_curate_pipeline_documents(
            "/root/testdata/sf0.001").to_pandas()
        assert len(out) > 0
        assert out["doc_id"].is_unique
        # offsets are an exclusive prefix sum in emitted order
        assert out["tok_start"].iloc[0] == 0
        expect = (out["tok_start"] + out["n_tokens"]).iloc[:-1].to_numpy()
        assert (out["tok_start"].iloc[1:].to_numpy() == expect).all()
        assert (out["seq_id"] == out["tok_start"] // 256).all()


class TestSequenceDedup:
    def test_identical_streams_collapse_to_min_key(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import sequence_dedup

        # users 1 and 7 share the exact ordered stream; 3 differs only
        # in order; 9 differs in one token
        rows = []
        for u, seq in [(1, ["a", "b", "c"]), (7, ["a", "b", "c"]),
                       (3, ["b", "a", "c"]), (9, ["a", "b", "x"])]:
            for i, t in enumerate(seq):
                rows.append((u, i, t))
        df = pd.DataFrame(rows, columns=["user_id", "pos", "event_type"])
        got = sequence_dedup(
            rd.from_pandas(df.sample(frac=1, random_state=0))
            .repartition(3),
            key="user_id", order=["pos"]).to_pandas()
        canon = dict(zip(got["user_id"], got["canonical"]))
        assert canon == {1: 1, 7: 1, 3: 3, 9: 9}
        assert set(got["seq_len"]) == {3}
        md5s = dict(zip(got["user_id"], got["seq_md5"]))
        assert md5s[1] == md5s[7] != md5s[3]

    def test_md5_matches_duckdb_string_agg(self, ray_session):
        import duckdb
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import sequence_dedup

        df = pd.DataFrame({
            "user_id": [5, 5, 5, 2, 2],
            "pos": [2, 0, 1, 1, 0],
            "event_type": ["zz", "a a", "", "k", "k"]})
        got = sequence_dedup(
            rd.from_pandas(df).repartition(2), key="user_id",
            order=["pos"]).to_pandas()
        ref = duckdb.sql("""
            SELECT user_id,
                   md5(string_agg(event_type, '|' ORDER BY pos)) AS h
            FROM df GROUP BY user_id""").df()
        want = dict(zip(ref["user_id"], ref["h"]))
        for r in got.itertuples():
            assert r.seq_md5 == want[r.user_id]


class TestSortedNeighborhoodPairs:
    def _pairs(self, keys, ids=None, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.dedup import sorted_neighborhood_pairs

        ids = list(ids if ids is not None else range(len(keys)))
        df = pd.DataFrame({"doc_id": ids, "key": keys})
        got = sorted_neighborhood_pairs(
            rd.from_pandas(df.sample(frac=1, random_state=1))
            .repartition(3), **kw).to_pandas()
        return {(int(a), int(b)): int(g) for a, b, g in
                zip(got["id_a"], got["id_b"], got["gap"])}

    def test_matches_ranked_self_join(self, ray_session):
        rng = np.random.default_rng(17)
        keys = ["".join(chr(97 + c) for c in rng.integers(0, 4, size=6))
                for _ in range(80)]
        w = 4
        got = self._pairs(keys, window=w, bucket_rows=16)
        order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
        want = {}
        for p, i in enumerate(order):
            for d in range(1, w):
                if p + d < len(order):
                    want[(i, order[p + d])] = d
        assert got == want

    def test_window_two_is_adjacent_only(self, ray_session):
        got = self._pairs(["b", "a", "c"], ids=[10, 20, 30], window=2)
        # order: a(20), b(10), c(30)
        assert got == {(20, 10): 1, (10, 30): 1}

    def test_tie_keys_break_by_id(self, ray_session):
        got = self._pairs(["k", "k", "k"], ids=[5, 1, 3], window=2)
        assert got == {(1, 3): 1, (3, 5): 1}

    def test_control_chars_in_key_order_like_sql_tuple(self, ray_session):
        # raw-text-prefix keys can contain tab/newline (< 0x20); the
        # order must match ORDER BY (key, id) tuple semantics, which a
        # separator-joined composite would invert (ADVICE r4)
        keys = ["a", "a\tb", "a\nx", "a b", "a!", "", "\x01z", "a"]
        w = 3
        got = self._pairs(keys, window=w, bucket_rows=3)
        order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
        want = {}
        for p, i in enumerate(order):
            for d in range(1, w):
                if p + d < len(order):
                    want[(i, order[p + d])] = d
        assert got == want


class TestDsirSelect:
    def test_matches_duckdb_oracle(self, ray_session):
        import duckdb
        import ray.data as rd

        import __ray_entry__ as entry

        got = entry._q_dsir_documents(SF)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
        want = con.execute(entry.oracle_sql()["dsir_documents"]).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False)

    def test_target_docs_rank_high(self, ray_session):
        """A corpus where target docs share a distinctive bigram: DSIR
        must rank the raw docs containing it above the rest."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import dsir_select

        rows = []
        for i in range(20):
            rows.append({"doc_id": i, "lang": "en",
                         "text": "alpha beta alpha beta gamma"})
        for i in range(20, 40):
            rows.append({"doc_id": i, "lang": "zz",
                         "text": "delta epsilon zeta eta theta"})
        # two zz docs that LOOK like the en subset
        rows.append({"doc_id": 100, "lang": "zz",
                     "text": "alpha beta alpha beta gamma"})
        rows.append({"doc_id": 101, "lang": "zz",
                     "text": "delta epsilon alpha beta gamma"})
        out = dsir_select(rd.from_items(rows), target_column="lang",
                          target_value="en", m=256, k=42, seed=3)
        assert out["sel_rank"].tolist() == list(range(1, len(out) + 1))
        scores = dict(zip(out["doc_id"], out["score"]))
        # the zz look-alike ties the en docs exactly; the half-overlap
        # doc sits between them and the disjoint-bigram zz corpus
        assert scores[100] == scores[0]
        assert scores[0] > scores[101] > scores[20]

    def test_short_and_empty_docs_dropped(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import dsir_select

        rows = [
            {"doc_id": 1, "lang": "en", "text": "one two three"},
            {"doc_id": 2, "lang": "en", "text": "single"},
            {"doc_id": 3, "lang": "en", "text": ""},
            {"doc_id": 4, "lang": "en", "text": "   "},
            {"doc_id": 5, "lang": "zz", "text": "one two"},
        ]
        out = dsir_select(rd.from_items(rows), target_column="lang",
                          target_value="en", m=64, k=10, seed=1)
        assert set(out["doc_id"]) == {1, 5}
        assert out.loc[out["doc_id"] == 1, "n_bigrams"].item() == 2


class TestDsirPartitionInvariance:
    def test_same_result_across_partitionings(self, ray_session):
        """DSIR's counts, weights and top-k must not depend on how the
        input is blocked: the bucket counts fold through a groupby and
        the scores are per-row — both partitioning-free by design."""
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import dsir_select

        rng = np.random.default_rng(17)
        vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
        rows = [{"doc_id": i,
                 "lang": "en" if i % 3 == 0 else "xx",
                 "text": " ".join(rng.choice(vocab,
                                             size=rng.integers(2, 9)))}
                for i in range(60)]
        outs = []
        for parts in (1, 7):
            ds = rd.from_items(rows).repartition(parts)
            out = dsir_select(ds, target_column="lang",
                              target_value="en", m=128, k=25, seed=9)
            outs.append(out.reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])
