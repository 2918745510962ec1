"""Stable hashing primitives.

Everything downstream that needs determinism across processes/workers
(feature hashing, exact-dedup keys, MinHash seeds, salting) goes through
these — never Python's builtin ``hash`` (randomized per process).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK64 = (1 << 64) - 1
_FNV_PRIME = np.uint64(1099511628211)
_MIX = np.uint64(0x9E3779B97F4A7C15)


def stable_hash64(s: str | bytes, seed: int = 0) -> int:
    """Deterministic 64-bit hash of a single string (blake2b-based)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    h = hashlib.blake2b(s, digest_size=8, key=(seed & _MASK64).to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def _finalize(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def hash64_column(arr: pa.ChunkedArray | pa.Array, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit polynomial hash of an Arrow string column.

    One numpy pass over the concatenated UTF-8 buffer (no per-row Python):
    ``H(s) = finalize(sum_j b[j] * P^(len-1-j)  (mod 2^64)  xor  len*MIX)``.
    Used for exact-dedup keys, shingle hashing and partition salting; for
    cryptographic-grade identity use :func:`stable_hash64` per row.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        # integer keys: splitmix-style finalize straight off the values —
        # never round-trip through strings
        vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return _finalize(vals + np.uint64(seed) * _MIX)
    if pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())

    n = len(arr)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out

    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32, count=n + 1 + arr.offset)
    offsets = offsets[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)

    starts = offsets[:-1]
    ends = offsets[1:]
    lengths = ends - starts
    total = int(offsets[-1])
    seed_mix = np.uint64((seed * 0x9E3779B97F4A7C15) & _MASK64)

    if total > 0:
        maxlen = int(lengths.max())
        # P^k table (uint64 wrap-around is part of the hash definition)
        pows = np.empty(maxlen + 1, dtype=np.uint64)
        p = 1
        for k in range(maxlen + 1):  # python ints then mask — avoids numpy overflow warnings
            pows[k] = p & _MASK64
            p = (p * 1099511628211) & _MASK64
        # exponent of byte j = (end_of_its_string - 1 - j)
        byte_ends = np.repeat(ends, lengths)
        exps = byte_ends - 1 - np.arange(int(offsets[0]), total)
        contrib = data[int(offsets[0]):total].astype(np.uint64) * pows[exps]
        # segmented sum per string
        nonempty = lengths > 0
        red_starts = (starts - offsets[0])[nonempty]
        if red_starts.size:
            sums = np.add.reduceat(contrib, red_starts)
            out[nonempty] = sums
    out ^= lengths.astype(np.uint64) * _MIX
    out ^= seed_mix
    out = _finalize(out)

    if arr.null_count:
        mask = np.asarray(arr.is_null())
        out[mask] = 0
    return out


def stable_bucket(s: str, buckets: int, seed: int = 0) -> int:
    return stable_hash64(s, seed) % buckets
