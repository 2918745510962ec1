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


# --- vectorized md5 (DuckDB kernel) -----------------------------------
#
# Several ops key rows by md5 so their DuckDB oracles can reproduce the
# key bit-for-bit (sampling, sequence packing, text-light exact dedup).
# hashlib costs a Python loop per row — at billions of rows that loop
# dominates the lean pass (ADVICE r3).  These helpers evaluate the SAME
# md5 SQL expression the oracles use, inside an embedded single-threaded
# DuckDB connection cached per worker process: vectorized C, zero-copy
# Arrow in/out, order-preserving (preserve_insertion_order defaults on
# and threads=1 removes scan-parallelism reordering).

_DUCK = None


def _duck():
    global _DUCK
    if _DUCK is None:
        import duckdb

        _DUCK = duckdb.connect(config={"threads": 1})
    return _DUCK


def _as_string_array(arr) -> pa.Array:
    if isinstance(arr, (list, np.ndarray)):
        try:
            arr = pa.array(arr)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            arr = pa.array([None if v is None else str(v) for v in arr],
                           pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = pc.cast(arr, pa.string())
    return arr


def md5_prefix_u64(strings, nhex: int = 16, prefix: str = "") -> np.ndarray:
    """uint64 array from the first ``nhex`` (≤16) hex chars of
    ``md5(prefix || s)`` — identical to the oracle expression
    ``CAST('0x' || substr(md5(prefix || s), 1, nhex) AS UBIGINT)``."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    tbl = pa.table({"s": pc.fill_null(arr, "")})  # noqa: F841 (duckdb scan)
    lit = prefix.replace("'", "''")
    out = _duck().execute(
        f"SELECT CAST('0x' || substr(md5('{lit}' || s), 1, {nhex}) "
        "AS UBIGINT) AS h FROM tbl"
    ).arrow()
    return out.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)


def md5_u128(strings) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) uint64 arrays of the full 16-byte md5 digest (big-endian
    hex halves), null strings hashed as the empty string."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        z = np.zeros(0, dtype=np.uint64)
        return z, z
    tbl = pa.table({"s": pc.fill_null(arr, "")})  # noqa: F841
    out = _duck().execute(
        "SELECT CAST('0x' || substr(md5(s), 1, 16) AS UBIGINT) AS hi, "
        "CAST('0x' || substr(md5(s), 17, 16) AS UBIGINT) AS lo FROM tbl"
    ).arrow()
    return (out.column("hi").to_numpy(zero_copy_only=False).astype(np.uint64),
            out.column("lo").to_numpy(zero_copy_only=False).astype(np.uint64))


def md5_hex(strings) -> list[str]:
    """Full 32-hex-char md5 of each string (DuckDB-vectorized, null →
    hash of empty string) — the lean cross-corpus content key."""
    arr = _as_string_array(strings)
    if len(arr) == 0:
        return []
    tbl = pa.table({"s": pc.fill_null(arr, "")})  # noqa: F841
    out = _duck().execute("SELECT md5(s) AS h FROM tbl").arrow()
    return out.column("h").to_pylist()
