"""Multimodal column plumbing (image/audio/video as opaque binary).

Codec resolution is layered: an optional library (Pillow / soundfile)
when installed → a REAL stdlib/pure-numpy codec for the formats this
container can genuinely decode (RIFF/WAVE 16-bit PCM via the stdlib
``wave`` module; binary PPM "P6" images with nearest-neighbor resize)
→ a deterministic fake decoder for everything else.  Compressed
formats (JPEG/PNG/MP3/FLAC) still need the optional library — that is
the one remaining stub boundary — but the real-mode dispatch, schemas,
actor-pool signatures and batch sizing are exercised end-to-end on
genuine WAV/PPM payloads with pinned-bytes golden tests.

Design rules encoded here:
* payloads travel as Arrow ``large_binary`` with typed metadata columns
  (never Python objects);
* decode/feature stages are ACTOR pools (codec/model state per actor);
* batch sizes stay small for wide binary rows (``suggest_batch_size``) so
  batch × concurrency fits worker heaps and the object store can spill
  block-by-block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),            # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def suggest_batch_size(avg_payload_bytes: int, target_batch_bytes: int = 64 << 20) -> int:
    """Small batches for fat rows: batch_size ≈ target / payload size."""
    return max(1, min(4096, target_batch_bytes // max(1, avg_payload_bytes)))


def synth_media_batch(n: int, kind: str = "image", payload_bytes: int = 4096,
                      seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["application/octet-stream"] * n),
            "width": pa.array(np.full(n, 64, dtype=np.int32)),
            "height": pa.array(np.full(n, 64, dtype=np.int32)),
            "duration_ms": pa.array(np.full(n, -1, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_ppm(payload: bytes, out_hw: tuple[int, int] | None = None) -> np.ndarray:
    """REAL binary-PPM (``P6``) decoder in pure numpy: header parse
    (magic, width, height, maxval; ``#`` comments allowed), raw RGB
    read, optional nearest-neighbor resize to ``out_hw``.  No external
    dependency — the genuinely decodable image format in this
    container."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    # header: three whitespace-separated ints after the magic, with
    # '#'-to-EOL comments permitted between tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw pixels
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pix = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    img = pix.reshape(h, w, 3)
    if out_hw is not None and (h, w) != out_hw:
        oh, ow = out_hw
        ri = (np.arange(oh) * h) // oh
        ci = (np.arange(ow) * w) // ow
        img = img[ri][:, ci]
    return np.ascontiguousarray(img)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL RIFF/WAVE decoder via the stdlib ``wave`` module → (int16
    mono samples, rate).  16-bit PCM only; multi-channel is averaged to
    mono (ties round half-to-even via np.rint, documented)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n_ch = f.getnchannels()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    data = np.frombuffer(raw, dtype="<i2")
    if n_ch > 1:
        data = np.rint(
            data.reshape(-1, n_ch).mean(axis=1)
        ).astype(np.int16)
    return data, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (stdlib ``wave``) — the synth
    side of the real-codec round-trip tests and queries."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary-PPM bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def synth_wav_batch(n: int, rate: int = 16000, n_samples: int = 4096,
                    seed: int = 42) -> pa.Table:
    """Media table with REAL RIFF/WAVE payloads: per-clip deterministic
    int16 ramps + sign flips derived from (seed, media_id)."""
    payloads = []
    for i in range(n):
        t = np.arange(n_samples, dtype=np.int64)
        s = (((t * (seed + 3 + i)) % 4001) - 2000).astype(np.int16)
        payloads.append(encode_wav(s, rate))
    dur = int(1000 * n_samples / rate)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n),
            "width": pa.array(np.full(n, -1, dtype=np.int32)),
            "height": pa.array(np.full(n, -1, dtype=np.int32)),
            "duration_ms": pa.array(np.full(n, dur, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_ppm_batch(n: int, hw: tuple[int, int] = (16, 16),
                    seed: int = 42) -> pa.Table:
    """Media table with REAL binary-PPM payloads, pixels deterministic
    from (seed, media_id)."""
    h, w = hw
    payloads = []
    for i in range(n):
        idx = np.arange(h * w * 3, dtype=np.int64)
        img = ((idx * (seed + 7 + i)) % 251).astype(np.uint8).reshape(h, w, 3)
        payloads.append(encode_ppm(img))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/x-portable-pixmap"] * n),
            "width": pa.array(np.full(n, w, dtype=np.int32)),
            "height": pa.array(np.full(n, h, dtype=np.int32)),
            "duration_ms": pa.array(np.full(n, -1, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def default_image_decoder(out_hw: tuple[int, int]):
    """→ a ``payload_bytes → (h, w, 3) uint8 ndarray`` callable: Pillow
    when installed (any format), else the pure-numpy PPM codec (real,
    always available).  Compressed formats without Pillow raise inside
    the decode with a clear message."""
    try:  # optional dependency — not in this container
        import io

        from PIL import Image  # type: ignore

        def decode(payload: bytes) -> np.ndarray:
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((out_hw[1], out_hw[0]))
            return np.asarray(img, dtype=np.uint8)

        return decode
    except ImportError:
        def decode(payload: bytes) -> np.ndarray:
            if payload[:2] != b"P6":
                raise NotImplementedError(
                    "only binary PPM decodes without Pillow; install "
                    "Pillow for JPEG/PNG or pass decoder=")
            return decode_ppm(payload, out_hw)

        return decode


class ImageDecodeStage:
    """payload → decoded (h, w, 3) pixel tensor column.

    Three modes, resolved once per ACTOR in ``__init__``:

    * ``fake=True`` — deterministic payload-derived pixels (schema and
      plumbing identical to a real decoder; the test/bench path);
    * ``fake=False, decoder=<callable>`` — REAL mode with an injected
      ``payload → (h, w, 3) uint8`` codec (how a user plugs Pillow/cv2/
      turbojpeg in; also how tests prove the real-mode plumbing);
    * ``fake=False`` — auto-detects a codec
      (:func:`default_image_decoder`): Pillow when installed, else the
      always-available pure-numpy PPM codec (non-PPM payloads then
      raise a clear ``NotImplementedError`` inside the decode).
    """

    def __init__(self, fake: bool = False, out_hw: tuple[int, int] = (8, 8),
                 decoder=None):
        self.out_hw = out_hw
        if fake:
            self.decoder = None
            return
        self.decoder = decoder or default_image_decoder(out_hw)
        if self.decoder is None:
            raise NotImplementedError(
                "image decoding requires a codec library (e.g. Pillow) not "
                "present in this environment; install one, pass decoder=, or "
                "construct with fake=True for the deterministic test decoder"
            )

    def _fake_decode(self, payload: bytes, size: int) -> np.ndarray:
        buf = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(size / max(1, len(buf))))
        return np.tile(buf, reps)[:size]

    def __call__(self, batch: pa.Table) -> pa.Table:
        h, w = self.out_hw
        size = h * w * 3
        pixels = []
        for payload in batch.column("payload").to_pylist():
            if self.decoder is not None:
                arr = np.asarray(self.decoder(payload), dtype=np.uint8)
                if arr.shape != (h, w, 3):
                    raise ValueError(
                        f"decoder returned shape {arr.shape}, expected {(h, w, 3)}"
                    )
                pixels.append(arr.reshape(-1).tolist())
            else:
                pixels.append(self._fake_decode(payload, size).tolist())
        return batch.append_column(
            "pixels", pa.array(pixels, pa.list_(pa.uint8(), size))
        ).append_column(
            "pixel_shape", pa.array([[h, w, 3]] * len(batch), pa.list_(pa.int32(), 3))
        )


class ImageFeatureStage:
    """pixels → small feature vector (channel means/stds; numpy, exact)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("pixels")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
        n = len(batch)
        mat = flat.reshape(n, -1, 3) if n else flat.reshape(0, 0, 3)
        feats = np.concatenate([mat.mean(axis=1), mat.std(axis=1)], axis=1)
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), 6))
        )


def default_audio_decoder():
    """→ ``payload_bytes → (int16 samples, rate)``: soundfile when
    installed (any format), else the stdlib :func:`decode_wav` (real,
    always available).  Compressed formats without soundfile raise
    inside the decode with a clear message."""
    try:  # optional dependency — not in this container
        import io

        import soundfile  # type: ignore

        def decode(payload: bytes):
            data, rate = soundfile.read(io.BytesIO(payload), dtype="int16")
            if data.ndim > 1:
                data = data.mean(axis=1).astype(np.int16)
            return data, int(rate)

        return decode
    except ImportError:
        def decode(payload: bytes):
            if payload[:4] != b"RIFF":
                raise NotImplementedError(
                    "only RIFF/WAVE decodes without soundfile; install "
                    "soundfile for mp3/ogg/flac or pass decoder=")
            return decode_wav(payload)

        return decode


class AudioDecodeStage:
    """payload → int16 PCM sample column.

    Real mode decodes RIFF/WAVE via the stdlib codec (always
    available); compressed codecs (mp3/ogg/flac) additionally need
    soundfile and raise a clear ``NotImplementedError`` inside the
    decode without it.  Fake mode reinterprets the payload bytes as raw
    little-endian int16 PCM — which is also the REAL decode for
    ``audio/L16`` payloads.
    """

    def __init__(self, fake: bool = False, sample_rate: int = 16000,
                 decoder=None):
        self.sample_rate = sample_rate
        if fake:
            self.decoder = None
            return
        # real mode: injected codec (``payload → (int16 samples, rate)``,
        # e.g. soundfile.read) or an optional-import default
        self.decoder = decoder or default_audio_decoder()
        if self.decoder is None:
            raise NotImplementedError(
                "compressed-audio decoding requires a codec library (e.g. "
                "soundfile) not present in this environment; install one, "
                "pass decoder=, or construct with fake=True for the raw-PCM "
                "reinterpretation decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        samples, rates = [], []
        for payload in batch.column("payload").to_pylist():
            if self.decoder is not None:
                pcm, rate = self.decoder(payload)
                samples.append(np.asarray(pcm, dtype=np.int16).tolist())
                rates.append(rate)
            else:
                buf = payload[: len(payload) - (len(payload) % 2)]
                samples.append(np.frombuffer(buf, dtype="<i2").tolist())
                rates.append(self.sample_rate)
        return batch.append_column(
            "samples", pa.array(samples, pa.list_(pa.int16()))
        ).append_column(
            "sample_rate", pa.array(np.asarray(rates, dtype=np.int32))
        )


class AudioResampleStage:
    """PCM samples → linear-interpolation resample to ``target_rate``.

    Real DSP (numpy ``interp`` over the sample grid), not a stub — the
    codec boundary is :class:`AudioDecodeStage`; everything after it
    operates on plain PCM.
    """

    def __init__(self, target_rate: int = 8000):
        self.target_rate = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates = batch.column("sample_rate").to_numpy()
        out = []
        for samples, rate in zip(batch.column("samples").to_pylist(), rates):
            x = np.asarray(samples, dtype=np.float32)
            if not len(x) or rate == self.target_rate:
                out.append(np.asarray(samples, dtype=np.int16).tolist())
                continue
            n_out = max(1, int(round(len(x) * self.target_rate / rate)))
            t_in = np.arange(len(x), dtype=np.float64) / rate
            t_out = np.arange(n_out, dtype=np.float64) / self.target_rate
            y = np.interp(t_out, t_in, x)
            out.append(np.clip(np.round(y), -32768, 32767).astype(np.int16).tolist())
        n = len(batch)
        return (
            batch.drop_columns(["samples", "sample_rate"])
            .append_column("samples", pa.array(out, pa.list_(pa.int16())))
            .append_column(
                "sample_rate", pa.array(np.full(n, self.target_rate, dtype=np.int32))
            )
        )


class AudioFeatureStage:
    """PCM samples → (rms, zero-crossing rate, peak, n_samples) features
    — exact numpy DSP per clip."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for samples in batch.column("samples").to_pylist():
            x = np.asarray(samples, dtype=np.float64)
            if not len(x):
                feats.append([0.0, 0.0, 0.0, 0.0])
                continue
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
            feats.append([rms, zcr, float(np.abs(x).max()), float(len(x))])
        return batch.append_column(
            "audio_features", pa.array(feats, pa.list_(pa.float64(), 4))
        )


class FrameSampleStage:
    """video payload → every-k-th "frame" offsets (stub sampling policy;
    real mode would demux — same signature)."""

    def __init__(self, every_n_bytes: int = 1024, max_frames: int = 8):
        self.every = every_n_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        offsets = []
        for payload in batch.column("payload").to_pylist():
            offs = list(range(0, len(payload), self.every))[: self.max_frames]
            offsets.append(offs)
        return batch.append_column("frame_offsets", pa.array(offsets, pa.list_(pa.int64())))
