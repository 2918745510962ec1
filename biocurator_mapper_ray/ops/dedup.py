"""Deduplication operators over document tables.

No reference equivalent (biocurator_mapper processes one passage per
request); these are the first-class large-scale training-data operators
the engine adds.  All are Ray-Data-native:

* :func:`exact_dedup` — content-hash partition + per-group first.  The
  groupby key is the 64-bit content hash (cheap to shuffle); full-text
  equality is re-checked inside the group so hash collisions can never
  merge distinct texts.
* :func:`minhash_lsh_pairs` / :func:`minhash_dedup` — word-shingle
  MinHash signatures → banded LSH → ONE salted exchange of lean
  (doc_id, band_id, band_hash) rows emitting star-pattern candidate
  pairs → broadcast-signature estimated-Jaccard verify → connected
  components by vectorized min-label propagation over the (small)
  candidate edge list.
* :func:`simhash_pairs` — 64-bit SimHash, banded by 16-bit chunks,
  verified by exact Hamming distance.
* :func:`ngram_jaccard` — exact shingle-set Jaccard for a pair of texts
  (the verification kernel).
"""

from __future__ import annotations

import hashlib
import re
import warnings

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column, md5_prefix_u64, md5_u128

_MERSENNE = np.uint64((1 << 61) - 1)
# 2^31-1 (Mersenne prime) — the md5-oracle hash domain: products a*h with
# a, h < 2^31 stay < 2^62, exact in BOTH numpy uint64 and DuckDB UBIGINT
# (DuckDB raises on UBIGINT overflow, so the affine minhash transform must
# never exceed 64 bits on either side)
_M31 = np.uint64((1 << 31) - 1)

# Explicit ASCII-whitespace tokenizer shared by the Python-side text ops
# (minhash shingles, simhash tokens, n-gram Jaccard).  The SQL oracles
# split on the IDENTICAL character class, so engine/oracle tokenization
# agrees for every input — Python's str.split() and RE2's \s differ on
# unicode whitespace (U+00A0 etc.), which is why neither is used here.
_WS_RE = re.compile(r"[ \t\n\r\f\x0b]+")


def _ws_tokens(text: str) -> list[str]:
    """Lowercased ASCII-whitespace tokens, empties dropped."""
    return [t for t in _WS_RE.split((text or "").lower()) if t]

# 8-bit popcount lookup (numpy < 2.0 has no bitwise_count kernel)
_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape)."""
    flat = np.ascontiguousarray(x, dtype=np.uint64)
    return _POPCNT8[flat.view(np.uint8)].reshape(flat.shape + (8,)).sum(axis=-1)


def _allpairs_index(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All (i < j) row-index pairs within contiguous groups of the given
    sizes — fully vectorized (repeat + cumsum; no per-group Python).

    Given rows sorted so each group is contiguous, returns global row
    indices (ia, ib) covering every unordered pair inside every group:
    a group of size s contributes s*(s-1)/2 pairs.
    """
    sizes = np.asarray(sizes, dtype=np.int64)
    total = int(sizes.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ends = np.cumsum(sizes)
    # rep[x] = (group end) - 1 - x: how many partners follow row x in its group
    rep = np.repeat(ends, sizes) - 1 - np.arange(total, dtype=np.int64)
    n_pairs = int(rep.sum())
    if n_pairs == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ia = np.repeat(np.arange(total, dtype=np.int64), rep)
    run_starts = np.cumsum(rep) - rep
    ib = (
        np.arange(n_pairs, dtype=np.int64)
        - np.repeat(run_starts, rep)
        + np.repeat(np.arange(1, total + 1, dtype=np.int64), rep)
    )
    return ia, ib


def _connect_index(sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Chain + star row-index pairs within contiguous groups: for a group
    (r0..r_{s-1}) emits chain (r_i, r_{i+1}) and star (r0, r_j) edges —
    2s-3 edges instead of s*(s-1)/2.  Linear in bucket size; used by the
    clustering path where connectivity (not the full pair set) is needed.

    Recall trade-off (NOT a guarantee): every emitted edge is later
    verified against the similarity threshold, and for buckets of size
    ≥ 4 a qualifying pair like (b, d) is simply never emitted — if all
    emitted chain/star edges touching b and d fail the verify, docs that
    the full pair set would cluster together end up in separate
    components (under-merge).  The chain+star redundancy only tolerates
    SOME single-edge failures.  Clustering callers that need full-pair
    recall on small buckets should use :func:`_hybrid_index`."""
    sizes = np.asarray(sizes, dtype=np.int64)
    total = int(sizes.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    ends = np.cumsum(sizes)
    starts = ends - sizes
    idx = np.arange(total, dtype=np.int64)
    not_last = idx < np.repeat(ends - 1, sizes)
    chain_a = idx[not_last]
    chain_b = chain_a + 1
    # star edges anchor→member for members ≥ 2 positions past the anchor
    # (anchor→start+1 is already the first chain edge)
    group_start = np.repeat(starts, sizes)
    deep = idx >= group_start + 2
    star_a = group_start[deep]
    star_b = idx[deep]
    return np.concatenate([chain_a, star_a]), np.concatenate([chain_b, star_b])


_HYBRID_CUTOFF = 16


def _hybrid_index(sizes: np.ndarray, cutoff: int = _HYBRID_CUTOFF) -> tuple[np.ndarray, np.ndarray]:
    """All pairs for groups of size ≤ ``cutoff``, chain+star connect
    edges above it: full verify-recall where it is cheap (a 16-doc
    bucket is 120 pairs), linear emission where a pathological bucket
    would be quadratic.  Above the cutoff the under-merge trade-off of
    :func:`_connect_index` applies and is documented there."""
    sizes = np.asarray(sizes, dtype=np.int64)
    small = sizes <= cutoff
    rows = np.arange(int(sizes.sum()), dtype=np.int64)
    row_small = np.repeat(small, sizes)
    small_rows, large_rows = rows[row_small], rows[~row_small]
    sa, sb = _allpairs_index(sizes[small])
    la, lb = _connect_index(sizes[~small])
    return (np.concatenate([small_rows[sa], large_rows[la]]),
            np.concatenate([small_rows[sb], large_rows[lb]]))


def _allpairs_blocks(sizes: np.ndarray, max_pairs: int):
    """Yield (ia, ib) global row-index blocks covering every within-group
    (i < j) pair, each block holding at most ~``max_pairs`` pairs.

    Unlike calling :func:`_allpairs_index` once and slicing the result,
    no O(total_pairs) index is ever materialized: consecutive small
    groups are batched up to the pair budget, and an oversized group
    (e.g. a heavy-duplicate bucket where thousands of identical docs
    share one hash) is tiled (i-block × j-block) so the allocation peak
    stays at ~max_pairs regardless of bucket size."""
    sizes = np.asarray(sizes, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    pair_counts = sizes * (sizes - 1) // 2
    n_groups = len(sizes)
    g = 0
    while g < n_groups:
        if pair_counts[g] > max_pairs:
            s, base = int(sizes[g]), int(starts[g])
            blk = max(1, int(np.sqrt(max_pairs)))
            for i0 in range(0, s, blk):
                ii = np.arange(i0, min(i0 + blk, s), dtype=np.int64)
                for j0 in range(i0, s, blk):
                    jj = np.arange(j0, min(j0 + blk, s), dtype=np.int64)
                    ia = np.repeat(ii, len(jj))
                    ib = np.tile(jj, len(ii))
                    keep = ia < ib
                    if keep.any():
                        yield base + ia[keep], base + ib[keep]
            g += 1
            continue
        h, tot = g, 0
        while h < n_groups and pair_counts[h] <= max_pairs and tot + pair_counts[h] <= max_pairs:
            tot += pair_counts[h]
            h += 1
        if h == g:
            h = g + 1
        ia, ib = _allpairs_index(sizes[g:h])
        if len(ia):
            yield starts[g] + ia, starts[g] + ib
        g = h


# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table, column: str, out: str = "content_hash") -> pa.Table:
    h = hash64_column(batch.column(column))
    return batch.append_column(out, pa.array(h.astype(np.int64)))


def _rename_or_empty(t: pa.Table, names: list[str], types: list) -> pa.Table:
    """Rename a groupby-aggregate block; an all-empty aggregation can
    emit a zero-column block (the per-shard empty frames lose their
    schema through the exchange) — substitute a typed empty table so
    downstream consumers keep a stable schema."""
    if t.num_columns == len(names):
        return t.rename_columns(names)
    return pa.table({n: pa.array([], ty) for n, ty in zip(names, types)})


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id",
                *, shards: int = 64):
    """Keep the min-id row per distinct value of ``column``.

    Shuffle key = content-hash SHARD (fixed 4 bytes/row regardless of
    text size; equal texts share a hash, hence a shard), with the
    min-id-per-exact-value selection vectorized across each shard's
    whole frame — one task per shard, not one per distinct value.
    Grouping inside the shard is by the exact value, so hash collisions
    can never merge distinct texts.
    """

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(column))
        return batch.append_column(
            "__shard", pa.array((h % np.uint64(shards)).astype(np.int32))
        )

    def first_per_text(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__shard")
        idx = group.groupby(column, sort=False)[id_column].idxmin()
        return group.loc[sorted(idx)]

    return ds.map_batches(tag, batch_format="pyarrow").groupby("__shard").map_groups(
        first_per_text, batch_format="pandas"
    )


def exact_dedup_ids(ds, column: str = "text", id_column: str = "doc_id",
                    *, shards: int = 64):
    """Text-light exact dedup: the min-id WINNER per distinct value of
    ``column``, emitted as an id Dataset (``id_column`` only) without
    ever shipping text through an exchange.

    :func:`exact_dedup` re-checks full-text equality inside the shard,
    which is bulletproof but ships every surviving document's text
    through the one groupby exchange — at 100 TB that exchange IS the
    job.  This variant shuffles lean (doc_id, h64, md5) rows (~40 B/row
    regardless of text size): equality of the composite
    (64-bit engine hash, 128-bit md5) key stands in for text equality —
    a false merge needs a simultaneous collision in two independent
    hash families (< 2^-120 per pair; no known engineered preimage pair
    collides BOTH md5 and the engine's xx-style hash).  Survivor rows
    are then read back FROM SOURCE with :func:`semi_join_ids`, so text
    bytes move at most once, storage → sink.

    Use :func:`exact_dedup` when absolute value-equality semantics are
    required; use this when the corpus dwarfs the exchange.
    """

    def lean_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        h = hash64_column(texts)
        # vectorized md5 (shared DuckDB kernel) — no per-row Python
        md5_hi, md5_lo = md5_u128(texts)
        return pa.table({
            id_column: batch.column(id_column),
            "__h64": pa.array(h.view(np.int64)),
            "__md5_hi": pa.array(md5_hi.view(np.int64)),
            "__md5_lo": pa.array(md5_lo.view(np.int64)),
            "__shard": pa.array((h % np.uint64(shards)).astype(np.int32)),
        })

    def min_id_per_key(group: pd.DataFrame) -> pd.DataFrame:
        winners = group.groupby(
            ["__h64", "__md5_hi", "__md5_lo"], sort=False
        )[id_column].min()
        return pd.DataFrame({id_column: winners.to_numpy()})

    return (
        ds.map_batches(lean_rows, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(min_id_per_key, batch_format="pandas")
    )


def semi_join_ids(ds, ids, id_column: str = "doc_id", *,
                  anti: bool = False):
    """Filter ``ds`` to rows whose ``id_column`` appears in the ``ids``
    Dataset — a broadcast semi-join: the id set (8 B/row) is collected
    once, sorted, shipped to the object store via ``ray.put`` and probed
    per batch with a vectorized ``np.searchsorted`` — the big side
    streams map-side with NO exchange.

    ``anti=True`` inverts the membership test (broadcast ANTI-join):
    keep rows whose id is NOT in the set — the blocklist / tombstone
    filter of a curation pipeline (banned URLs, opt-out ids, revoked
    licenses).  An empty blocklist then keeps everything.

    Partitioning assumption (SURVEY §2 custom-operator rule): the id
    set fits in worker memory (8 GB per billion ids).  Beyond that,
    partition the id set and run one broadcast pass per partition, or
    fall back to the bucketed :func:`~biocurator_mapper_ray.ops.join.hash_join`
    (which exchanges the big side)."""
    import ray as _ray

    id_arr = np.sort(
        np.concatenate(
            [b.column(id_column).to_numpy() for b in
             ids.iter_batches(batch_format="pyarrow", batch_size=65536)]
            or [np.zeros(0, dtype=np.int64)]
        )
    )
    ids_ref = _ray.put(id_arr)

    def keep_members(batch: pa.Table, ref=None) -> pa.Table:
        members = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
        if members.size == 0:
            return batch if anti else batch.slice(0, 0)
        vals = batch.column(id_column).to_numpy()
        pos = np.minimum(np.searchsorted(members, vals), len(members) - 1)
        member = members[pos] == vals
        return batch.filter(pa.array(~member if anti else member))

    return ds.map_batches(keep_members, fn_kwargs={"ref": ids_ref},
                          batch_format="pyarrow")


# -------------------------------------------------------------- minhash


def _shingle_strings(text: str, n: int = 3) -> list[str]:
    """Word n-gram shingle strings over ASCII-whitespace tokens (the
    exact gram construction the DuckDB oracles mirror: split on
    ``[ \\t\\n\\r\\f\\x0b]+``, drop empties, join with single spaces;
    texts with < n words yield one whole-text shingle, empty texts
    none)."""
    toks = _ws_tokens(text)
    if not toks:
        return []
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _shingle_hashes(text: str, n: int = 3, seed: int = 0) -> np.ndarray:
    """Word n-gram shingle hashes (uint64)."""
    toks = _ws_tokens(text)
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return hash64_column(pa.chunked_array([pa.array(shingles)]), seed)


def minhash_md5_params(num_perm: int = 128, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Affine coefficients (a, b) for the md5-oracle minhash mode, drawn
    below 2^31-1 so ``a*h + b`` (h also < 2^31-1) stays < 2^62 — exact in
    numpy uint64 AND DuckDB UBIGINT (which raises on overflow).  The same
    literal values are inlined into the SQL oracle, so the engine and
    DuckDB compute bit-identical signatures."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_M31), num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_M31), num_perm, dtype=np.uint64)
    return a, b


def md5_u64(s: str) -> int:
    """First 16 hex chars of md5 as uint64 — byte-identical to DuckDB's
    ``CAST('0x' || substr(md5(s), 1, 16) AS UBIGINT)``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)


class MinHasher:
    """Vectorized MinHash: sig[i] = min over shingles of (a_i*h + b_i)."""

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (S, P) broadcast, uint64 wrap-around is fine for min-hashing
        vals = shingle_hashes[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))


_SIG_SENTINEL = np.iinfo(np.uint64).max


class MinHashBandStage:
    """docs batch → (doc_id, band_id, band_hash, signature) rows.

    ``hash_mode='fast'`` (default) hashes shingles with the engine's
    xx-style 64-bit hash and folds bands with a polynomial mix.
    ``hash_mode='md5'`` computes h = md5_u64(shingle) % (2^31-1),
    sig_i = (a_i*h + b_i) % (2^31-1) with :func:`minhash_md5_params`
    coefficients, and band_hash = md5_u64 of the '-'-joined band values —
    every step byte-identical to a DuckDB SQL expression, giving MinHash
    LSH an EXACT SQL oracle (the md5 calls make it ~3× slower; it is the
    correctness-gate path, not the scale path)."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 num_perm: int = 128, bands: int = 16, shingle_n: int = 3,
                 seed: int = 42, hash_mode: str = "fast"):
        assert num_perm % bands == 0
        assert hash_mode in ("fast", "md5")
        self.hasher = MinHasher(num_perm, seed)
        self.text_column = text_column
        self.id_column = id_column
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.hash_mode = hash_mode
        if hash_mode == "md5":
            self.md5_a, self.md5_b = minhash_md5_params(num_perm, seed)
        self._md5_cache: dict[str, int] = {}

    def _md5_shingle_hashes(self, shingles: list[str]) -> np.ndarray:
        cache = self._md5_cache
        if len(cache) > 1_000_000:
            cache.clear()
        # factorize to the batch vocabulary, md5 only the cache misses in
        # ONE vectorized kernel call — the per-item Python loop runs over
        # the (heavy-tailed, mostly-cached) vocab, never the shingle
        # stream
        codes, uniques = pd.factorize(np.asarray(shingles, dtype=object))
        vals = np.empty(len(uniques), dtype=np.uint64)
        miss = []
        for j, u in enumerate(uniques):
            v = cache.get(u)
            if v is None:
                miss.append(j)
            else:
                vals[j] = v
        if miss:
            hv = md5_prefix_u64([uniques[j] for j in miss], 16) % _M31
            for j, v in zip(miss, hv):
                cache[uniques[j]] = vals[j] = v
        return vals[codes]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 — one flat hash pass + segmented min.

        All shingles of the batch are hashed in ONE Arrow/numpy pass and
        the per-doc minima come from ``np.minimum.reduceat`` — the
        per-doc-loop version spent ~2 ms/doc on Arrow array construction.
        Empty texts get the all-ones sentinel signature (callers drop
        sentinel docs from the band pass: an empty doc pairs with
        nothing, matching the SQL oracle where it contributes no rows).
        """
        all_shingles: list[str] = []
        lengths = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            sh = _shingle_strings(text or "", self.shingle_n)
            lengths[i] = len(sh)
            all_shingles.extend(sh)

        sigs = np.full((len(texts), self.hasher.num_perm),
                       _SIG_SENTINEL, dtype=np.uint64)
        if all_shingles:
            if self.hash_mode == "md5":
                h = self._md5_shingle_hashes(all_shingles)
                vals = (h[:, None] * self.md5_a[None, :] + self.md5_b[None, :]) % _M31
            else:
                h = hash64_column(pa.chunked_array([pa.array(all_shingles)]))
                vals = h[:, None] * self.hasher.a[None, :] + self.hasher.b[None, :]
            nonempty = lengths > 0
            starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])[nonempty]
            sigs[nonempty] = np.minimum.reduceat(vals, starts, axis=0)
        return sigs

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n, num_perm) signatures → (n, bands) band hashes.

        fast: polynomial fold of each band's rows, vectorized over
        (docs × bands), mixed so different bands with equal rows differ.
        md5: md5_u64('-'.join(band values)) — the exact expression the
        SQL oracle computes with string_agg + md5, so bucket membership
        matches DuckDB bit-for-bit (band_id disambiguates bands there
        via an explicit group key, here via the per-band join below)."""
        n = sigs.shape[0]
        bands3 = sigs.reshape(n, self.bands, self.rows_per_band)
        if self.hash_mode == "md5":
            joined = ["-".join(map(str, row)) for row in
                      bands3.reshape(n * self.bands,
                                     self.rows_per_band).tolist()]
            return md5_prefix_u64(joined, 16).reshape(n, self.bands)
        P = np.uint64(1099511628211)
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            bh = bh * P + bands3[:, :, r]
        bh ^= (bh >> np.uint64(33))
        bh += np.arange(self.bands, dtype=np.uint64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
        return bh

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ids = batch.column(self.id_column).to_numpy()
        n = len(texts)
        sigs = self.signatures(texts)
        bh = self.band_hashes(sigs)
        n_rows = n * self.bands
        sig_list = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n_rows + 1) * self.hasher.num_perm,
                               self.hasher.num_perm, dtype=np.int32)),
            pa.array(np.repeat(sigs.view(np.int64), self.bands, axis=0).reshape(-1)),
        ) if n else pa.array([], pa.list_(pa.int64()))
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands)),
                "band_id": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
                "signature": sig_list,
            }
        )


class MinHashSignatureStage:
    """docs batch → one (doc_id, sig) row per doc; ``sig`` is the packed
    little-endian uint64[num_perm] signature as a fixed-length binary
    value (1 KiB at num_perm=128) — binary packs shuffle/join cleanly
    where list columns trip Ray's pandas-block schema hashing."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 num_perm: int = 128, shingle_n: int = 3, seed: int = 42,
                 hash_mode: str = "fast"):
        self.band_stage = MinHashBandStage(text_column, id_column, num_perm,
                                           bands=1, shingle_n=shingle_n, seed=seed,
                                           hash_mode=hash_mode)
        self.text_column = text_column
        self.id_column = id_column
        self.num_perm = num_perm

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        sigs = self.band_stage.signatures(texts)
        width = sigs.shape[1] * 8
        packed = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(texts),
            [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())],
        )
        return pa.table({"doc_id": batch.column(self.id_column), "sig": packed})


def _unpack_sigs(col, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 matrix from a packed-binary pandas column."""
    if len(col) == 0:
        return np.zeros((0, num_perm), dtype=np.uint64)
    buf = b"".join(col)
    return np.frombuffer(buf, dtype=np.uint64).reshape(len(col), num_perm)


def minhash_lsh_pairs(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    num_perm: int = 128,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
    dedup_pairs: bool = True,
    emit_mode: str = "all",
    hash_mode: str = "fast",
    sig_join_buckets: int | None = None,
):
    """Near-duplicate pairs (a < b, deduplicated across bands unless
    ``dedup_pairs=False`` — clustering callers tolerate duplicate edges
    and skip that exchange), verified by signature-estimated Jaccard ≥
    ``threshold``.

    Scale design — fully distributed, nothing candidate-scale on the
    driver:

    * the full corpus makes ONE pass through the band exchange — lean
      (doc_id, band_id, band_hash) rows (20 B, no signature payload)
      salted into 64 shards, each shard emitting ALL within-bucket
      candidate pairs with a duplicated-mask + one vectorized all-pairs
      index (no per-bucket Python; ``emit_mode='connect'`` emits linear
      chain+star edges instead for clustering callers);
    * signatures are computed once into a compact packed-binary table
      (8·num_perm B/doc) and attached to candidate pairs by two bucketed
      hash joins (:func:`~biocurator_mapper_ray.ops.join.hash_join`);
      the estimated-Jaccard verify is fused into the second join's
      bucket task as one vectorized equality.  Non-candidate signatures
      simply find no partner in their bucket — no driver collection, no
      broadcast dict, no "candidates fit in driver memory" assumption.
    """
    from .join import pair_feature_join

    stage = MinHashBandStage(text_column, id_column, num_perm, bands, shingle_n,
                             seed, hash_mode)

    def band_rows_salted(batch: pa.Table) -> pa.Table:
        """Lean salted band rows derived from the PACKED SIGNATURE table
        (not the text corpus): the expensive shingle+hash pass over the
        text runs exactly once (MinHashSignatureStage below); banding is
        a cheap fold over the 1 KiB/doc signatures.  Empty docs (the
        all-ones sentinel signature) are dropped here — an empty doc has
        no shingles, pairs with nothing (Jaccard with an empty set is
        0), and would otherwise collapse into ONE giant bucket of
        mutually-'identical' sentinel signatures."""
        sigs_mat = _unpack_sigs(batch.column("sig").to_pylist(), num_perm)
        ids = batch.column("doc_id").to_numpy()
        nonempty = ~(sigs_mat == _SIG_SENTINEL).all(axis=1)
        sigs_mat, ids = sigs_mat[nonempty], ids[nonempty]
        n = len(ids)
        bh = stage.band_hashes(sigs_mat).reshape(-1).view(np.int64) if n else \
            np.zeros(0, dtype=np.int64)
        salt = (bh.view(np.uint64) % np.uint64(n_salt)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh),
            "__salt": pa.array(salt),
        })

    pair_index = {"all": _allpairs_index, "connect": _connect_index,
                  "hybrid": _hybrid_index}[emit_mode]

    def cands_in_salt(group: pd.DataFrame) -> pd.DataFrame:
        """One salt shard → candidate pairs, vectorized (duplicated-mask
        to drop singleton buckets, then one all-pairs/connect index over
        the contiguous sorted buckets — no per-bucket Python).  Emits ALL
        within-bucket pairs (``emit_mode='all'``), so a qualifying (b, c)
        pair is produced even when neither doc is the bucket's min-id
        member — the star-pattern emission this replaces dropped those."""
        g = group[group.duplicated(["band_id", "band_hash"], keep=False)]
        if g.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        g = g.sort_values(["band_id", "band_hash", "doc_id"]).drop_duplicates(
            ["band_id", "band_hash", "doc_id"]
        )
        sizes = g.groupby(["band_id", "band_hash"], sort=False).size().to_numpy()
        ia, ib = pair_index(sizes)
        docs = g["doc_id"].to_numpy()
        return pd.DataFrame({"a": docs[ia], "b": docs[ib]}).drop_duplicates()

    # signature table: the ONLY pass over the text corpus, computed once
    # and reused by the band pass and both join sides; compact
    # (8·num_perm B/doc) so materializing is ~1000× lighter than the
    # text corpus and the object store may spill it freely
    sigs = ds.map_batches(
        MinHashSignatureStage(text_column, id_column, num_perm, shingle_n, seed,
                              hash_mode),
        batch_format="pyarrow",
    ).materialize()

    # size every downstream exchange to the DATA, not the read's block
    # count: a sort-shuffle's cost here is dominated by task dispatch
    # (~10-25 ms each), so a 5k-doc corpus inheriting the read's 64
    # blocks pays ~300 tasks per exchange for milliseconds of work.
    # Shard/bucket counts grow with the corpus (full 64-way at ≥256k
    # docs), so cluster-scale behavior is unchanged.
    n_docs = sigs.count()
    n_salt = int(min(64, max(8, n_docs // 4096 + 1)))
    sig_blocks = max(1, n_docs // 32768 + 1)
    if sigs.num_blocks() > 2 * sig_blocks:
        sigs = sigs.repartition(sig_blocks).materialize()
    if sig_join_buckets is None:
        sig_join_buckets = n_salt

    # the ONE full-data band exchange: salted groupby (64 shards)
    # emitting candidate pairs directly — no separate count aggregate,
    # no second pass over the text
    cands = (
        sigs.map_batches(band_rows_salted, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(cands_in_salt, batch_format="pandas")
    )

    def verify_df(df: pd.DataFrame) -> pd.DataFrame:
        """Fused into the second join's bucket task: one vectorized
        signature-equality pass over the bucket's candidate pairs."""
        if df.empty:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "est_jaccard": pd.Series(dtype=np.float64)})
        mat_a = _unpack_sigs(df["f_a"].to_numpy(), num_perm)
        mat_b = _unpack_sigs(df["f_b"].to_numpy(), num_perm)
        est = (mat_a == mat_b).mean(axis=1)
        # defense in depth: sentinel (empty-doc) signatures compare as
        # identical but mean "no shingles" — Jaccard with an empty set
        # is 0, never a near-dup (the band pass already drops them)
        sentinel = ((mat_a == _SIG_SENTINEL).all(axis=1)
                    | (mat_b == _SIG_SENTINEL).all(axis=1))
        est[sentinel] = 0.0
        keep = est >= threshold
        return pd.DataFrame({"a": df["a"].to_numpy()[keep],
                             "b": df["b"].to_numpy()[keep],
                             "est_jaccard": est[keep]})

    pairs = pair_feature_join(cands, sigs, verify=verify_df,
                              buckets=sig_join_buckets)
    if not dedup_pairs:
        return pairs
    # same pair can surface from several bands → keep max estimate
    # (rename via map_batches: Dataset.rename_columns chokes on the
    # pandas-format blocks that groupby aggregations emit)
    deduped = pairs.groupby(["a", "b"]).max("est_jaccard")
    return deduped.map_batches(
        lambda t: _rename_or_empty(t, ["a", "b", "est_jaccard"],
                                   [pa.int64(), pa.int64(), pa.float64()]),
        batch_format="pyarrow",
    )


def _contract_edge_batch(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """In-task local contraction of an edge batch: min-label propagation
    over just these edges (vectorized numpy), emitting (root, member)
    star edges — depth 1 within the batch.  Pure connectivity rewrite
    (no pairs are dropped or added as reachability), so global rounds
    over contracted edges converge in far fewer iterations."""
    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    lab = np.arange(len(uniq), dtype=np.int64)
    while True:
        m = np.minimum(lab[ia], lab[ib])
        before = lab.copy()
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        # path-halving keeps local convergence O(log) on chains
        lab = lab[lab]
        if np.array_equal(lab, before):
            break
    members = np.nonzero(lab != np.arange(len(uniq)))[0]
    return uniq[lab[members]], uniq[members]


def connected_components(edges, *, max_iters: int = 10, shards: int = 64):
    """Distributed connected components over an (a, b) edge Dataset:
    (node, component) rows where component = min doc_id in the component.

    Each input batch is first locally contracted in its map task
    (:func:`_contract_edge_batch` — star edges, depth 1 per batch), then
    min-label propagation runs with the label state carried ON the edge-
    endpoint rows (a, b, node, label) — two rows per edge — so each
    round is two salted groupby exchanges and zero joins:

    1. group by edge (a, b): both endpoint rows take the edge's min
       label (the label crosses the edge);
    2. group by node: all of a node's rows take the node's min label
       (the label fans back out over the node's incident edges).

    Each round's transforms are vectorized inside the salt shards
    (pandas ``groupby(...).transform('min')`` — no per-edge/per-node
    Python).  Labels decrease monotonically, so an unchanged
    ``sum(label)`` between materialized states proves convergence;
    after local contraction components typically settle in 1–2 global
    rounds.  Nothing edge-scale ever lands on the driver.
    """
    import ray.data as rd

    def to_endpoint_rows(batch: pa.Table) -> pa.Table:
        a0 = batch.column("a").to_numpy().astype(np.int64)
        b0 = batch.column("b").to_numpy().astype(np.int64)
        if len(a0):
            a, b = _contract_edge_batch(a0, b0)
        else:
            a, b = a0, b0
        node = np.concatenate([a, b])
        ea = np.concatenate([a, a])
        eb = np.concatenate([b, b])
        return pa.table({
            "a": pa.array(ea), "b": pa.array(eb),
            "node": pa.array(node), "label": pa.array(node.copy()),
        })

    P = np.uint64(0x9E3779B97F4A7C15)

    def add_edge_shard(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.uint64)
        b = batch.column("b").to_numpy().astype(np.uint64)
        s = ((a * P + b) ^ ((a * P + b) >> np.uint64(29))) % np.uint64(shards)
        return batch.append_column("__shard", pa.array(s.astype(np.int32)))

    def add_node_shard(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy().astype(np.uint64)
        s = ((n * P) ^ ((n * P) >> np.uint64(29))) % np.uint64(shards)
        return batch.append_column("__shard", pa.array(s.astype(np.int32)))

    def edge_min(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__shard")
        group["label"] = group.groupby(["a", "b"], sort=False)["label"].transform("min")
        return group

    def node_min(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__shard")
        group["label"] = group.groupby("node", sort=False)["label"].transform("min")
        return group

    def one_round(ds_state):
        return (
            ds_state.map_batches(add_edge_shard, batch_format="pyarrow")
            .groupby("__shard").map_groups(edge_min, batch_format="pandas")
            .map_batches(add_node_shard, batch_format="pyarrow")
            .groupby("__shard").map_groups(node_min, batch_format="pandas")
        )

    def to_shortcut_rows(batch: pa.Table) -> pa.Table:
        """State rows → pointer-jump exchange rows: DEF rows publish
        each node's current label (kind 0, keyed by node; unique — a
        node's rows share one label and one node_min output block),
        USE rows are the state keyed by its label (kind 1)."""
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        node = batch.column("node").to_numpy().astype(np.int64)
        label = batch.column("label").to_numpy().astype(np.int64)
        dn, di = np.unique(node, return_index=True)
        z = np.zeros(len(dn), dtype=np.int64)
        return pa.table({
            "key": pa.array(np.concatenate([dn, label])),
            "kind": pa.array(np.concatenate(
                [np.zeros(len(dn), np.int8), np.ones(len(a), np.int8)])),
            "a": pa.array(np.concatenate([z, a])),
            "b": pa.array(np.concatenate([z, b])),
            "node": pa.array(np.concatenate([dn, node])),
            "label": pa.array(np.concatenate([label[di], label])),
        })

    def add_key_shard(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy().astype(np.uint64)
        s = ((k * P) ^ ((k * P) >> np.uint64(29))) % np.uint64(shards)
        return batch.append_column("__shard", pa.array(s.astype(np.int32)))

    def shortcut_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__shard")
        m = (g[g["kind"] == 0].drop_duplicates("key")
             .set_index("key")["label"])
        u = g[g["kind"] == 1]
        jumped = u["key"].map(m)
        return u.assign(
            label=np.minimum(u["label"].to_numpy(),
                             jumped.fillna(u["label"]).to_numpy()
                             .astype(np.int64))
        )[["a", "b", "node", "label"]]

    def shortcut_round(ds_state):
        """Pointer jumping: label := label(label).  One extra exchange
        that lets labels cross 2^k hops by round k instead of one —
        the high-diameter (chain) escape hatch; engaged adaptively
        below so the common shallow near-dup graphs never pay for it."""
        return (ds_state.map_batches(to_shortcut_rows,
                                     batch_format="pyarrow")
                .map_batches(add_key_shard, batch_format="pyarrow")
                .groupby("__shard").map_groups(shortcut_shard,
                                               batch_format="pandas"))

    state = edges.map_batches(to_endpoint_rows, batch_format="pyarrow").materialize()
    n_rows = state.count()
    if n_rows == 0:
        return rd.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype=np.int64),
                          "component": pd.Series(dtype=np.int64)})
        )
    # size shards and the state's block count to the edge data (task
    # dispatch dominates exchange cost on lean rows — see
    # minhash_lsh_pairs); full shard width returns at ≥0.5M rows
    shards = int(min(shards, max(8, n_rows // 8192 + 1)))
    state_blocks = max(1, n_rows // 65536 + 1)
    if state.num_blocks() > 2 * state_blocks:
        state = state.repartition(state_blocks).materialize()
    # sums are metadata-cheap on materialized states; comparing
    # consecutive sums detects convergence (labels only decrease)
    prev_sum = state.sum("label")
    converged = False
    for it in range(max_iters):
        state = one_round(state)
        if it >= 2:
            # still not settled after two plain rounds: a deep
            # component — engage pointer jumping (labels then cross
            # 2^k hops by round k, so chains converge in O(log D)
            # rounds instead of O(D))
            state = shortcut_round(state)
        state = state.materialize()
        label_sum = state.sum("label")
        if label_sum == prev_sum:
            converged = True
            break
        prev_sum = label_sum
    if not converged:
        # a high-diameter component (long chains stitched across batches)
        # can outlive max_iters; returning silently would hand back an
        # inconsistent (node, component) assignment
        warnings.warn(
            f"connected_components: min-label propagation still changing "
            f"after {max_iters} rounds — labels may be inconsistent for "
            f"high-diameter components; raise max_iters",
            RuntimeWarning,
            stacklevel=2,
        )

    comps = state.groupby("node").min("label")
    return comps.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def minhash_dedup(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    threshold: float = 0.7,
    max_iters: int = 10,
    emit_mode: str = "hybrid",
    **kwargs,
):
    """Cluster near-duplicates and return (doc_id, cluster_id) rows.

    Fully distributed: candidate edges stay a Dataset, verification is
    the fused signature join in :func:`minhash_lsh_pairs`, and
    clustering is :func:`connected_components` min-label propagation —
    no driver-side edge list, signature dict, or candidate
    materialization anywhere.

    ``emit_mode`` governs the recall/cost trade-off per LSH bucket:
    ``'hybrid'`` (default) emits the FULL pair set for buckets ≤ 16
    docs and linear chain+star connect edges above — since every edge
    is verified against the Jaccard threshold, connect-only emission
    can under-merge when its few edges touching a doc all fail the
    verify while an unemitted pair would have passed; ``'all'``
    guarantees the exact verified-pair closure (quadratic in bucket
    size), ``'connect'`` is the linear-cost floor.
    """
    pairs = minhash_lsh_pairs(ds, text_column, id_column, threshold=threshold,
                              dedup_pairs=False, emit_mode=emit_mode, **kwargs)
    comps = connected_components(pairs, max_iters=max_iters)
    return comps.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]), batch_format="pyarrow"
    )


# -------------------------------------------------------------- simhash


class SimHashStage:
    """docs batch → (doc_id, simhash) rows (64-bit).

    ``token_hash='fast'`` (default) hashes tokens with the engine's
    xx-style 64-bit hash; ``token_hash='md5'`` uses the first 16 hex
    chars of md5 — byte-identical to DuckDB's
    ``CAST('0x' || substr(md5(tok), 1, 16) AS UBIGINT)``, which gives
    the op an exact SQL oracle (md5 values are cached per actor; the
    token vocabulary is tiny relative to the token stream).
    """

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 seed: int = 42, token_hash: str = "fast"):
        assert token_hash in ("fast", "md5")
        self.text_column = text_column
        self.id_column = id_column
        self.seed = seed
        self.token_hash = token_hash
        self._md5_cache: dict[str, int] = {}

    def _hash_tokens(self, toks: list[str]) -> np.ndarray:
        if self.token_hash == "fast":
            return hash64_column(pa.chunked_array([pa.array(toks)]), self.seed)
        cache = self._md5_cache
        if len(cache) > 1_000_000:
            # bound per-actor memory over long runs; the vocabulary of a
            # batch stream is heavy-tailed, so a periodic reset keeps the
            # hot head cached at negligible recompute cost
            cache.clear()
        # vocab-factorized, vectorized-md5 misses (same shape as
        # MinHashStage._md5_shingle_hashes)
        codes, uniques = pd.factorize(np.asarray(toks, dtype=object))
        vals = np.empty(len(uniques), dtype=np.uint64)
        miss = []
        for j, u in enumerate(uniques):
            v = cache.get(u)
            if v is None:
                miss.append(j)
            else:
                vals[j] = v
        if miss:
            hv = md5_prefix_u64([uniques[j] for j in miss], 16)
            for j, v in zip(miss, hv):
                cache[uniques[j]] = vals[j] = v
        return vals[codes]

    def _simhash_batch(self, texts: list[str]) -> np.ndarray:
        """One flat hash pass over all tokens + segmented sign-sum via
        ``np.add.reduceat`` — no per-doc hashing loop."""
        lengths = np.empty(len(texts), dtype=np.int64)
        all_toks: list[str] = []
        for i, t in enumerate(texts):
            tk = _ws_tokens(t)
            lengths[i] = len(tk)
            all_toks.extend(tk)
        sims = np.zeros(len(texts), dtype=np.uint64)
        if all_toks:
            h = self._hash_tokens(all_toks)
            bit_idx = np.arange(64, dtype=np.uint64)
            sign = (2 * ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int32) - 1)
            nonempty = lengths > 0
            starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])[nonempty]
            scores = np.add.reduceat(sign, starts, axis=0)
            sims[nonempty] = (
                (scores > 0).astype(np.uint64) << bit_idx[None, :]
            ).sum(axis=1)
        return sims

    def simhash(self, text: str) -> int:
        return int(self._simhash_batch([text])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        sims = self._simhash_batch(texts)
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "simhash": pa.array(sims.astype(np.int64)),
            }
        )


def simhash_pairs(ds, text_column: str = "text", id_column: str = "doc_id",
                  *, max_hamming: int = 3, seed: int = 42,
                  simhash_stage=None, pair_block: int = 1024):
    """Near-dup pairs by SimHash: band 64 bits into 4×16-bit chunks
    (pigeonhole: any pair within Hamming ≤ 3 shares ≥ 1 exact chunk),
    verify exact Hamming distance inside the bucket.

    Emits ALL within-bucket pairs via a blocked pairwise-XOR popcount
    (tiles of ``pair_block``² bound memory on oversized buckets), so the
    pigeonhole recall guarantee actually holds — the previous anchor-vs-
    rest comparison dropped any qualifying pair not involving the
    bucket's min-id doc.  Like minhash, the bucket scan is salted into
    data-sized shards with singleton buckets dropped by a vectorized
    duplicated mask — no per-bucket task overhead (shard count grows
    with the corpus; ``ds.count()`` is metadata-cheap on parquet reads).
    """
    n_docs = ds.count()
    n_salt = int(min(64, max(8, (n_docs or 0) // 4096 + 1)))
    stage = simhash_stage or SimHashStage(text_column, id_column, seed)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        hashed = stage(batch)
        sims = hashed.column("simhash").to_numpy().astype(np.uint64)
        ids = hashed.column("doc_id").to_numpy()
        out_id, out_chunk, out_val, out_sim = [], [], [], []
        for chunk in range(4):
            vals = (sims >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_chunk.append(np.full(len(ids), chunk, dtype=np.int32))
            out_val.append(vals.astype(np.int64))
            out_sim.append(sims.astype(np.int64))
        chunk_col = np.concatenate(out_chunk)
        val_col = np.concatenate(out_val)
        salt = ((val_col.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + chunk_col.astype(np.uint64)) % np.uint64(n_salt)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "chunk_id": pa.array(chunk_col),
                "chunk_val": pa.array(val_col),
                "simhash": pa.array(np.concatenate(out_sim)),
                "__salt": pa.array(salt),
            }
        )

    def pairs_in_shard(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        g = group[group.duplicated(["chunk_id", "chunk_val"], keep=False)]
        if g.empty:
            return empty
        g = g.sort_values(["chunk_id", "chunk_val", "doc_id"]).drop_duplicates(
            ["chunk_id", "chunk_val", "doc_id"]
        )
        sizes = g.groupby(["chunk_id", "chunk_val"], sort=False).size().to_numpy()
        docs = g["doc_id"].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        out = []
        # blocked all-pairs per bucket: the (ia, ib) index stream itself
        # is generated in ≤ pair_block² tiles (_allpairs_blocks), so a
        # pathological bucket (thousands of docs sharing one chunk
        # value) never allocates its quadratic index up front
        for ia, ib in _allpairs_blocks(sizes, pair_block * pair_block):
            ham = _popcount64(sims[ia] ^ sims[ib])
            keep = ham <= max_hamming
            if keep.any():
                out.append(pd.DataFrame({"a": docs[ia][keep],
                                         "b": docs[ib][keep],
                                         "hamming": ham[keep]}))
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    pairs = (
        ds.map_batches(explode_chunks, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(pairs_in_shard, batch_format="pandas")
    )
    deduped = pairs.groupby(["a", "b"]).min("hamming")
    return deduped.map_batches(
        lambda t: _rename_or_empty(t, ["a", "b", "hamming"],
                                   [pa.int64(), pa.int64(), pa.int64()]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------- jaccard


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (verification kernel).

    Either set empty → 0.0, INCLUDING both-empty: Jaccard of two empty
    sets is undefined, the SQL oracles build gram sets that simply
    contain no rows for empty docs (so no pair is ever emitted), and
    scoring empty-vs-empty as 1.0 would emit spurious 'near-dup' pairs
    for every pair of whitespace-only docs in a corpus."""
    sa = set(_shingle_hashes(text_a, n).tolist())
    sb = set(_shingle_hashes(text_b, n).tolist())
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _pair_set_intersections(col_a, col_b):
    """Per-pair set-intersection sizes over packed (sorted, unique)
    uint64 sets: one vectorized sort-merge over ALL of a bucket's
    candidate pairs — the two packed sides are stacked into flat
    (pair_idx, value) key arrays; after one mergesort of the
    concatenation, adjacent equal keys are exactly the per-pair
    intersections (each side's keys are unique within a pair), counted
    with one bincount.  No per-pair Python loop.  Returns
    ``(inter, n_a, n_b)`` int64 arrays."""
    n_pairs = len(col_a)
    key_t = np.dtype([("p", "<u8"), ("v", "<u8")])

    def stack(col) -> tuple[np.ndarray, np.ndarray]:
        lens = np.fromiter((len(x) for x in col), count=n_pairs,
                           dtype=np.int64) // 8
        keys = np.empty(int(lens.sum()), dtype=key_t)
        keys["p"] = np.repeat(np.arange(n_pairs, dtype=np.uint64), lens)
        keys["v"] = np.frombuffer(b"".join(col), dtype=np.uint64)
        return keys, lens

    ka, na = stack(col_a)
    kb, nb = stack(col_b)
    allk = np.concatenate([ka, kb])
    allk.sort(kind="mergesort")
    eq = allk[1:] == allk[:-1]
    inter = np.bincount(allk["p"][:-1][eq].astype(np.int64),
                        minlength=n_pairs)
    return inter, na, nb


class _ShingleSetStage:
    """docs batch → (doc_id, n_shingles, sig) rows; ``sig`` is the packed
    SORTED UNIQUE shingle-hash set (variable-length binary)."""

    def __init__(self, text_column: str, id_column: str, n: int):
        self.text_column = text_column
        self.id_column = id_column
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        packed, counts = [], []
        for t in texts:
            s = np.unique(_shingle_hashes(t or "", self.n))
            packed.append(s.tobytes())
            counts.append(len(s))
        return pa.table({
            "doc_id": batch.column(self.id_column),
            "n_shingles": pa.array(counts, pa.int64()),
            "sig": pa.array(packed, pa.binary()),
        })


def _ngram_pair_scores(
    ds,
    text_column: str,
    id_column: str,
    *,
    n: int,
    candidates: str,
    score_fn,
    score_cols: list[str],
    lsh_kwargs: dict,
):
    """Shared backbone for exact shingle-set pair scoring
    (:func:`ngram_jaccard_pairs` / :func:`ngram_containment_pairs`):
    build packed shingle sets once, generate candidate pairs (all-pairs
    baseline or MinHash-LSH scale path), and score each pair's exact
    set overlap inside the bucketed :func:`pair_feature_join`.
    ``score_fn(inter, na, nb) -> (keep_mask, {col: array})`` turns the
    vectorized intersection counts into output columns."""
    import ray.data as rd  # noqa: F401

    from .join import pair_feature_join

    sigs = ds.map_batches(
        _ShingleSetStage(text_column, id_column, n), batch_format="pyarrow"
    ).materialize()
    n_docs = sigs.count()
    n_buckets = int(min(64, max(8, n_docs // 4096 + 1)))

    if candidates == "all":
        ids = sigs.select_columns(["doc_id"])

        def all_pairs_block(batch: pa.Table, ids_ref=None) -> pa.Table:
            import ray as _ray

            every = ids_ref if isinstance(ids_ref, np.ndarray) else _ray.get(ids_ref)
            mine = batch.column("doc_id").to_numpy()
            a = np.repeat(mine, len(every))
            b = np.tile(every, len(mine))
            keep = a < b
            return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

        import ray as _ray

        ids_ref = _ray.put(ids.to_pandas()["doc_id"].to_numpy())
        cands = ids.map_batches(
            all_pairs_block, fn_kwargs={"ids_ref": ids_ref}, batch_format="pyarrow"
        )
    elif candidates == "minhash":
        cands = minhash_lsh_pairs(
            ds, text_column, id_column, dedup_pairs=False, threshold=0.0,
            **lsh_kwargs,
        ).map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        )
    else:
        raise ValueError(f"unknown candidates mode {candidates!r}")

    def verify_df(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-pair set intersections
        (:func:`_pair_set_intersections`) folded through ``score_fn``."""
        if df.empty:
            cols = {"a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64)}
            cols.update({c: pd.Series(dtype=np.float64)
                         for c in score_cols})
            return pd.DataFrame(cols)
        inter, na, nb = _pair_set_intersections(df["f_a"].to_numpy(),
                                                df["f_b"].to_numpy())
        keep, scores = score_fn(inter, na, nb)
        out = {"a": df["a"].to_numpy()[keep],
               "b": df["b"].to_numpy()[keep]}
        out.update({c: v[keep] for c, v in scores.items()})
        return pd.DataFrame(out)

    pairs = pair_feature_join(cands, sigs.select_columns(["doc_id", "sig"]),
                              verify=verify_df, buckets=n_buckets)
    if candidates == "all":
        return pairs
    deduped = pairs.groupby(["a", "b"]).max(score_cols)
    return deduped.map_batches(
        lambda t: _rename_or_empty(t, ["a", "b"] + score_cols,
                                   [pa.int64(), pa.int64()]
                                   + [pa.float64()] * len(score_cols)),
        batch_format="pyarrow",
    )


def ngram_jaccard_pairs(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.5,
    candidates: str = "all",
    **lsh_kwargs,
):
    """EXACT word-n-gram Jaccard pairs ≥ threshold.

    ``candidates='all'`` is the exact brute-force baseline (the role
    :func:`~biocurator_mapper_ray.ops.similarity.knn_search` plays for
    ANN): every (a < b) pair is generated by self-joining the shingle-set
    table through the bucketed :func:`pair_feature_join` backbone and
    verified with a sorted-array intersection — O(n²) pairs, exact
    answers, the small/medium-corpus and ground-truth tool.
    ``candidates='minhash'`` is the scale path: LSH candidate pairs from
    :func:`minhash_lsh_pairs` (recall < 1 by design, governed by
    bands/num_perm) re-verified with EXACT Jaccard instead of the
    signature estimate.
    """

    def score(inter, na, nb):
        union = na + nb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        # either side empty -> 0.0 (see ngram_jaccard)
        jac[(na == 0) | (nb == 0)] = 0.0
        return jac >= threshold, {"jaccard": jac}

    return _ngram_pair_scores(ds, text_column, id_column, n=n,
                              candidates=candidates, score_fn=score,
                              score_cols=["jaccard"], lsh_kwargs=lsh_kwargs)


def ngram_containment_pairs(
    ds,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.8,
    candidates: str = "all",
    **lsh_kwargs,
):
    """EXACT word-n-gram CONTAINMENT pairs: emit (a < b) with
    ``cont_a = |A∩B| / |A|`` and ``cont_b = |A∩B| / |B|`` whenever
    either direction ≥ threshold — the asymmetric near-duplicate
    signal Jaccard misses (a doc quoted whole inside a much longer one
    scores high containment but low Jaccard; the boilerplate-wrapper
    and quote-expansion dedup case).  Empty sides score 0.0, mirroring
    :func:`ngram_jaccard`.  Same candidate machinery and scale shape
    as :func:`ngram_jaccard_pairs` (all-pairs baseline vs MinHash
    candidates; note LSH recall is tuned for Jaccard, so a short doc
    buried in a long one may need higher ``bands``)."""

    def score(inter, na, nb):
        ca = np.where(na > 0, inter / np.maximum(na, 1), 0.0)
        cb = np.where(nb > 0, inter / np.maximum(nb, 1), 0.0)
        zero = (na == 0) | (nb == 0)
        ca[zero] = 0.0
        cb[zero] = 0.0
        return (np.maximum(ca, cb) >= threshold,
                {"cont_a": ca, "cont_b": cb})

    return _ngram_pair_scores(ds, text_column, id_column, n=n,
                              candidates=candidates, score_fn=score,
                              score_cols=["cont_a", "cont_b"],
                              lsh_kwargs=lsh_kwargs)


# ----------------------------------------------------- duplicate spans


def _span_shingle_rows(batch: pa.Table, *, text_column: str = "text",
                       id_column: str = "doc_id", n: int = 8,
                       buckets: int = 64) -> pa.Table:
    """documents batch → one lean (doc_id, start, __h, __bucket) row per
    n-token shingle POSITION: the map side of exact duplicated-span
    detection (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better" — the ExactSubstr signal, here at fixed
    token granularity instead of suffix arrays).  A stateless task-pool
    function: it fuses with the upstream read, no actor ramp.

    Vectorized: one Arrow split per batch, empties masked out of the
    flat token array, the n-gram strings built by n-1 elementwise
    concatenations over the whole batch (doc boundaries excluded by a
    parent-index mask — never a per-doc Python loop), then ONE
    DuckDB-vectorized md5 over all shingles.  ``start`` is the 1-based
    index in the doc's empty-filtered token list, matching the SQL
    oracle's ``unnest(range(...))`` convention; docs with < n tokens
    contribute nothing.
    """
    toks = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_column)),
        r"[ \t\n\r\f\x0b]+")
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    toks_np = flat.to_numpy(zero_copy_only=False)[keep]
    parents = parents[keep]

    empty = pa.table({
        id_column: pa.array([], batch.column(id_column).type),
        "start": pa.array([], pa.int64()),
        "__h": pa.array([], pa.int64()),
        "__bucket": pa.array([], pa.int32()),
    })
    if len(toks_np) < n:
        return empty
    # windows fully inside one doc: same parent at both ends
    m = len(toks_np) - n + 1
    valid = parents[:m] == parents[n - 1:]
    if not valid.any():
        return empty
    sh = toks_np[:m].copy()
    for j in range(1, n):
        sh = sh + " "
        sh = sh + toks_np[j:m + j]
    sh = sh[valid]
    # 1-based position within the doc's filtered token list
    first_occ = np.searchsorted(parents, parents, side="left")
    start = (np.arange(len(parents)) - first_occ + 1)[:m][valid]
    ids = batch.column(id_column).take(
        pa.array(parents[:m][valid]))
    h = md5_prefix_u64(sh)
    return pa.table({
        id_column: ids,
        "start": pa.array(start.astype(np.int64)),
        "__h": pa.array(h.view(np.int64)),
        "__bucket": pa.array(
            (h % np.uint64(buckets)).astype(np.int32)),
    })


def duplicate_spans(ds, *, text_column: str = "text",
                    id_column: str = "doc_id", n: int = 8,
                    buckets: int | None = None,
                    size_hint: int | None = None):
    """All duplicated n-token span positions in the corpus: (doc_id,
    start) rows for every position whose shingle occurs at ≥ 2
    positions corpus-wide (within-doc repeats count, per ExactSubstr).

    Honest cost statement: this is the one op whose exchange is
    POSITION-scale — ~20 lean bytes per token (id, start, h64, bucket),
    i.e. a fixed small fraction of corpus bytes, hash-bucketed so each
    reduce task sees one data-sized bucket frame and resolves its
    duplicates with a vectorized value_counts.  Text itself never
    shuffles; downstream removal reads survivors back from source
    (compose with :func:`semi_join_ids` / a scrub map).  That is the
    same shape as suffix-array ExactSubstr's sort — there is no cheaper
    exact formulation — and it streams: no stage holds more than a
    bucket.

    ``buckets`` defaults data-sized from ``size_hint`` (estimated span
    rows) or ``ds.count() × 128`` — the minhash exchange rule; a fixed
    default would be a per-task OOM at corpus scale."""
    from biocurator_mapper_ray.ops.join import derive_buckets

    if buckets is None:
        est = size_hint if size_hint is not None else ds.count() * 128
        buckets = derive_buckets(est)

    spans = ds.map_batches(
        _span_shingle_rows,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "n": n, "buckets": buckets},
        batch_format="pyarrow",
    )

    def dups_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g["__h"].value_counts()
        out = g.loc[g["__h"].map(c) >= 2, [id_column, "start"]]
        if not len(out):  # typed empty: Ray's size estimator chokes on
            return pa.table({  # object-dtype empties (join.py note)
                id_column: pa.array([], pa.int64()),
                "start": pa.array([], pa.int64())})
        return out

    out = spans.groupby("__bucket").map_groups(
        dups_in_bucket, batch_format="pandas")
    # union a 0-row typed block so an all-unique corpus still yields a
    # schema'd (id, start) dataset instead of a schemaless empty
    import ray.data as _rd

    anchor = _rd.from_arrow(pa.table({
        id_column: pa.array([], pa.int64()),
        "start": pa.array([], pa.int64())}))
    return out.union(anchor)


def _scrub_spans_kernel(texts: pa.Array, starts_per_doc: list, n: int) -> pa.Array:
    """Rebuild each text with the tokens of its deletion spans removed:
    token positions (1-based, empty-filtered) covered by any
    ``[s, s+n-1]`` window in the doc's start list are dropped, the rest
    re-joined with single spaces (lowercased — tokenization is the
    normalization, same contract as the SQL oracle's string_agg).
    Vectorized rebuild: repeat/ramp window expansion → global bool mask
    → ListArray from kept counts → binary_join (the dedup_paragraphs
    pattern, ops/normalize.py)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(texts),
                                  r"[ \t\n\r\f\x0b]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offsets = toks.offsets.to_numpy()
    counts = np.diff(offsets)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # position of each kept token within its doc's FILTERED list (1-based)
    kept_parents = parents[keep]
    first_occ = np.searchsorted(kept_parents, kept_parents, side="left")
    pos = np.arange(len(kept_parents)) - first_occ + 1

    # expand deletion windows into (doc, pos) pairs
    del_docs, del_pos = [], []
    for d, starts in enumerate(starts_per_doc):
        if starts is None or not len(starts):
            continue
        s = np.asarray(starts, dtype=np.int64)
        del_docs.append(np.full(len(s) * n, d, dtype=np.int64))
        del_pos.append((np.repeat(s, n)
                        + np.tile(np.arange(n, dtype=np.int64), len(s))))
    if del_docs:
        dd = np.concatenate(del_docs)
        dp = np.concatenate(del_pos)
        # membership test via a sorted composite key (doc << 32 | pos
        # overflows on giant docs; use lexsorted pair search instead)
        key_del = np.unique(dd * (pos.max() + 2 if len(pos) else 1) + dp)
        key_tok = kept_parents * (pos.max() + 2 if len(pos) else 1) + pos
        idx = np.minimum(np.searchsorted(key_del, key_tok),
                         len(key_del) - 1)
        deleted = key_del[idx] == key_tok
    else:
        deleted = np.zeros(len(kept_parents), dtype=bool)

    final_keep = keep.copy()
    final_keep[np.flatnonzero(keep)[deleted]] = False
    new_counts = np.bincount(parents[final_keep], minlength=len(counts))
    new_offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_offsets[1:])
    kept_values = flat.filter(pa.array(final_keep))
    if new_offsets[-1] < 2**31:
        lst = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_values)
    else:
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, pa.int64()), kept_values)
    return pc.binary_join(lst, " ")


def remove_duplicate_spans(ds, *, text_column: str = "text",
                           id_column: str = "doc_id", n: int = 8,
                           buckets: int | None = None,
                           size_hint: int | None = None):
    """ExactSubstr SCRUB: rewrite every document with its duplicated
    n-token spans removed, keeping only the canonical occurrence — the
    corpus-wide first (min ``(doc_id, start)``) position of each
    duplicated shingle.  Deletion is token-granular: any token covered
    by a NON-canonical duplicated window is dropped (where a repeat
    overlaps its own canonical copy — ``"p p p p p"`` — the overlap is
    dropped too; the contract is deterministic and SQL-checkable, not
    byte-identical to suffix-array ExactSubstr).  Output is
    ``(id_column, text_dedup)`` with ``text_dedup`` lowercased and
    single-space joined (tokenization IS the normalization).

    Two exchanges, both lean: the position-scale shingle exchange of
    :func:`duplicate_spans`, then a doc-bucketed exchange where each
    bucket carries its docs' text ONCE plus their deletion positions —
    never text × deletions.  Scale shape: everything bucket-bounded,
    text bytes move once."""
    from biocurator_mapper_ray.ops.join import derive_buckets

    n_docs = ds.count()
    if buckets is None:
        est = size_hint if size_hint is not None else n_docs * 128
        buckets = derive_buckets(est)
    doc_buckets = derive_buckets(n_docs, rows_per_bucket=1 << 15)

    spans = ds.map_batches(
        _span_shingle_rows,
        fn_kwargs={"text_column": text_column, "id_column": id_column,
                   "n": n, "buckets": buckets},
        batch_format="pyarrow",
    )

    def noncanon_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g["__h"].value_counts()
        dup = g[g["__h"].map(c) >= 2]
        dup = dup.sort_values(["__h", id_column, "start"], kind="mergesort")
        out = dup.loc[dup.duplicated("__h", keep="first"),
                      [id_column, "start"]]
        if not len(out):
            # typed empty Arrow table: an empty object-dtype frame makes
            # Ray's size estimator spam per bucket (ops/join.py note)
            return pa.table({id_column: pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64())})
        return out

    dels = spans.groupby("__bucket").map_groups(
        noncanon_in_bucket, batch_format="pandas")

    def tag_doc(batch: pa.Table, side: int) -> pa.Table:
        h = hash64_column(batch.column(id_column))
        cols = {
            id_column: batch.column(id_column),
            "__text": (batch.column(text_column) if side == 0
                       else pa.nulls(len(batch), pa.string())),
            "start": (batch.column("start") if side == 1
                      else pa.nulls(len(batch), pa.int64())),
            "__side": pa.array(np.full(len(batch), side, dtype=np.int8)),
            "__dbucket": pa.array(
                (h % np.uint64(doc_buckets)).astype(np.int32)),
        }
        return pa.table(cols)

    docs_t = ds.map_batches(tag_doc, fn_kwargs={"side": 0},
                            batch_format="pyarrow")
    dels_t = dels.map_batches(tag_doc, fn_kwargs={"side": 1},
                              batch_format="pyarrow")

    def scrub_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["__side"] == 0]
        if not len(docs):
            return pa.table({id_column: pa.array([], pa.int64()),
                             "text_dedup": pa.array([], pa.string())})
        starts_by_id = (g[g["__side"] == 1]
                        .groupby(id_column)["start"].apply(np.asarray))
        ids = docs[id_column].to_numpy()
        starts = [starts_by_id.get(i) for i in ids]
        out = _scrub_spans_kernel(
            pa.array(docs["__text"].to_numpy(), pa.string()), starts, n)
        return pd.DataFrame({id_column: ids,
                             "text_dedup": out.to_pandas().to_numpy()})

    out = docs_t.union(dels_t).groupby("__dbucket").map_groups(
        scrub_bucket, batch_format="pandas")
    import ray.data as _rd

    anchor = _rd.from_arrow(pa.table({
        id_column: pa.array([], pa.int64()),
        "text_dedup": pa.array([], pa.string())}))
    return out.union(anchor)


# -------------------------------------------------- incremental update


def novel_against(new, base, *, column: str = "text",
                  id_column: str = "doc_id", k: int = 4,
                  m_bits: int | None = None, buckets: int | None = None):
    """Rows of ``new`` whose ``column`` content does not already appear
    in ``base`` — the incremental corpus-update primitive (ingest a new
    crawl shard against the standing corpus, keep only novel documents).

    Scale design for the incremental scenario (new shard ≪ base): a
    Bloom filter of the NEW side's content keys — constant-size, ~2
    bytes/new-row — broadcasts to the base scan, so the 100-TB base
    ships only keys that might collide with the shard (true matches +
    the ~0.2% fp tail) instead of its whole key set.  Candidates meet
    the shard's lean (id, md5) rows in one bucketed semi ``hash_join``;
    matched ids leave the shard via the broadcast anti
    :func:`semi_join_ids`, so shard text is read once from source and
    base text never moves at all.  Content equality = full-128-bit md5
    equality (the :func:`exact_dedup_ids` rationale).
    """
    from biocurator_mapper_ray.functions.hashing import md5_hex
    from biocurator_mapper_ray.ops.join import hash_join
    from biocurator_mapper_ray.ops.sketch import bloom_bits, _bloom_prefilter

    import ray as _ray

    n_new = new.count()
    if n_new == 0:
        return new  # nothing to ingest; avoids a schemaless empty join
    if m_bits is None:
        # ~16 bits/key → fp ≈ 0.24% at k=4; power of two for cheap mod
        m_bits = 1 << max(16, int(max(1, n_new) * 16 - 1).bit_length())

    def lean_keys(batch: pa.Table, with_id: bool) -> pa.Table:
        cols = {"__k": pa.array(md5_hex(batch.column(column)), pa.string())}
        if with_id:
            cols[id_column] = batch.column(id_column)
        return pa.table(cols)

    new_lean = new.map_batches(lean_keys, fn_kwargs={"with_id": True},
                               batch_format="pyarrow")

    # constant-size filter of the shard's keys (bit-scale exchange)
    bits = bloom_bits(new_lean, key_column="__k", k=k, m_bits=m_bits,
                      sort=False)
    arr = np.zeros(m_bits, dtype=bool)
    bits_pd = bits.to_pandas()
    if len(bits_pd):
        arr[bits_pd["bit"].to_numpy()] = True
    ref = _ray.put(arr)

    # base streams map-side: only possibly-shared keys leave the scan
    base_cand = base.map_batches(
        lean_keys, fn_kwargs={"with_id": False}, batch_format="pyarrow",
    ).map_batches(
        _bloom_prefilter,
        fn_kwargs={"bits_ref": ref, "key_column": "__k",
                   "k": k, "m_bits": m_bits},
        batch_format="pyarrow",
    )

    dup_ids = hash_join(new_lean, base_cand, "__k", "__k", how="semi",
                        left_columns=[id_column, "__k"],
                        right_columns=["__k"],
                        buckets=buckets,
                        size_hint=n_new).select_columns([id_column])
    return semi_join_ids(new, dup_ids, id_column=id_column, anti=True)


# ------------------------------------------------- split-leakage audit

def split_leakage_pairs(ds, *, text_column: str = "text",
                        id_column: str = "doc_id",
                        split_column: str = "split",
                        shards: int = 64):
    """Train/test LEAKAGE AUDIT: every pair of documents with identical
    text that landed on OPPOSITE sides of a split — the check a
    curation pipeline runs after splitting to prove its held-out set is
    clean (zero rows = no exact-dup leakage).  Emits
    ``(a, b, split_a, split_b)`` with ``a < b``.

    Same lean-exchange shape as :func:`exact_dedup_ids`: rows ship as
    (id, split, h64, md5-128) — text never shuffled — salted by the
    text hash so equal texts co-locate; each bucket expands only its
    OWN duplicate groups into cross-split pairs (pair volume is
    duplicate-scale, never all-pairs).  A cross-split false pair needs
    a simultaneous 64+128-bit double collision (the exact_dedup_ids
    argument).
    """
    from ..functions.hashing import hash64_column, md5_u128

    def lean(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column)
        h = hash64_column(texts)
        hi, lo = md5_u128(texts)
        return pa.table({
            id_column: batch.column(id_column),
            split_column: batch.column(split_column),
            "__h": pa.array(h.view(np.int64)),
            "__hi": pa.array(hi.view(np.int64)),
            "__lo": pa.array(lo.view(np.int64)),
            "__s": pa.array((h % np.uint64(shards)).astype(np.int32)),
        })

    def cross_pairs(g: pd.DataFrame):
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "split_a": pa.array([], pa.string()),
                          "split_b": pa.array([], pa.string())})
        key = ["__h", "__hi", "__lo"]
        sizes = g.groupby(key)[id_column].transform("size")
        dup = g[sizes >= 2]
        if not len(dup):
            return empty
        rows = []
        for _, grp in dup.groupby(key, sort=False):
            # duplicate groups are small by construction; expand the
            # cross-split pairs with a vectorized meshgrid per group
            ids = grp[id_column].to_numpy()
            sp = grp[split_column].to_numpy()
            i, j = np.meshgrid(np.arange(len(ids)), np.arange(len(ids)),
                               indexing="ij")
            m = (i < j) & (sp[i] != sp[j])
            if m.any():
                rows.append(pd.DataFrame({
                    "a": ids[i[m]], "b": ids[j[m]],
                    "split_a": sp[i[m]], "split_b": sp[j[m]]}))
        if not rows:
            return empty
        out = pd.concat(rows, ignore_index=True)
        swap = out["a"] > out["b"]
        # guard the no-swap case: assigning an EMPTY selection upcasts
        # the int64 id columns to float64 (pandas empty-setitem quirk),
        # which then poisons the whole column's dtype downstream
        if swap.any():
            out.loc[swap, ["a", "b", "split_a", "split_b"]] = out.loc[
                swap, ["b", "a", "split_b", "split_a"]].to_numpy()
            out["a"] = out["a"].astype(np.int64)
            out["b"] = out["b"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(lean, batch_format="pyarrow")
              .groupby("__s")
              .map_groups(cross_pairs, batch_format="pandas"))


def sequence_dedup(ds, *, key: str = "user_id",
                   order: list[str] | None = None,
                   token: str = "event_type", sep: str = "|",
                   shards: int = 64):
    """Exact dedup of ordered SEQUENCES: two keys whose full ordered
    token streams are identical collapse to the min-key canonical — the
    conversation/session-level twin of document exact-dedup (two
    transcripts with the same turn sequence are one training example;
    two users with the same clickstream are one behavioral trace).

    Plan shape: rows ship LEAN (key, order, token) through ONE key-hash
    exchange that co-locates each key's stream; the bucket task
    lexsorts, joins each key's tokens (vectorized ``binary_join`` over
    an offsets-built ListArray — no per-key Python), and md5-hashes the
    joined stream through the shared DuckDB kernel.  A SECOND
    hash-keyed exchange (key-scale rows, one per key) folds the min-key
    canonical per identical hash.  Output ``(key, seq_len, seq_md5,
    canonical)`` — sequence text itself never travels past the first
    exchange.

    The md5 is over ``token₁‖sep‖token₂‖…`` in ``order``, identical to
    ``md5(string_agg(token, sep ORDER BY order…))``, so the result has
    an exact SQL oracle.
    """
    from ..functions.hashing import hash64_column, md5_hex

    order = list(order or [])

    def lean(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column(key).cast(pa.string()))
        return b.select([key] + order + [token]).append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key] + order, kind="stable")
        toks = g[token].astype(str).to_numpy(dtype=object)
        keys = g[key].to_numpy()
        first = np.zeros(len(g), dtype=bool)
        if len(g):
            first[0] = True
            first[1:] = keys[1:] != keys[:-1]
        offs = np.append(np.flatnonzero(first),
                         len(g)).astype(np.int64)
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                       pa.array(toks, pa.string()))
        joined = pc.binary_join(lst, sep)
        return pd.DataFrame({
            key: keys[offs[:-1]],
            "seq_len": np.diff(offs),
            "seq_md5": md5_hex(joined)})

    seqs = (ds.map_batches(lean, batch_format="pyarrow")
            .groupby("__kb").map_groups(fold, batch_format="pandas"))

    def hb(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column("seq_md5"))
        return b.append_column(
            "__hb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__hb")
        g["canonical"] = g.groupby("seq_md5")[key].transform("min")
        return g

    return (seqs.map_batches(hb, batch_format="pyarrow")
            .groupby("__hb").map_groups(canon, batch_format="pandas"))


def sorted_neighborhood_pairs(ds, *, id_column: str = "doc_id",
                              key_column: str = "key", window: int = 4,
                              shards: int | None = None,
                              bucket_rows: int | None = None):
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo 1995): order ALL records by a blocking key and emit every
    candidate pair within ``window`` positions of each other — the
    linear-candidate alternative to hash blocking when near-duplicates
    share key PREFIXES rather than exact keys (names, titles, lightly
    edited text heads).

    Distributed in two stages, both exact:

    1. Global ROW_NUMBER over ``(key, id)`` — the ``sequence_pack``
       range-shard pattern generalized to string order: shard by the
       key's 8-byte UTF-8 prefix (an order-preserving coarsening, so
       equal prefixes co-shard) and settle the exact order in-shard by
       sorting the TUPLE ``(key, id)`` — never a separator-joined
       composite, so keys containing control characters (tab/newline
       in raw-text-prefix keys) order exactly like the SQL
       ``ORDER BY key, id``.  Driver state is shard counts only;
       skewed key prefixes skew shard SIZES, never correctness.
    2. Positions are contiguous integers, so pairing is an integer-
       bucketed exchange: rank-bucket ``rnk // bucket_rows`` with the
       next bucket's first ``window−1`` rows replicated in — each pair
       is emitted exactly once (by its LEFT row's home bucket) via
       aligned slicing, never a quadratic block.

    Returns ``(id_a, id_b, gap)`` with ``gap = rank_b − rank_a`` ∈
    ``[1, window−1]`` — exactly SQL's ranked self-join
    ``b.rn BETWEEN a.rn + 1 AND a.rn + window − 1`` under
    ``row_number() OVER (ORDER BY key, id)``.
    """
    import ray.data as rd  # noqa: F401 (plan-shape parity with peers)

    from .join import derive_buckets

    n = ds.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "gap": pa.array([], pa.int64())}))
    if shards is None:
        shards = derive_buckets(n)
    if bucket_rows is None:
        # data-sized like every exchange default (derive_buckets rule):
        # one pair bucket's frame is ~bucket_rows rows in one task
        bucket_rows = max(window, n // derive_buckets(n) + 1)

    def mk_lean(b: pa.Table) -> pa.Table:
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        key = pc.fill_null(b.column(key_column).cast(pa.string()), "")
        enc = np.char.encode(
            np.asarray(key.to_numpy(zero_copy_only=False), dtype="U"),
            "utf-8", "surrogatepass")
        p64 = np.frombuffer(enc.astype("S8").tobytes(), dtype=">u8"
                            ).astype(np.uint64)
        return pa.table({id_column: pa.array(ids, pa.int64()),
                         "__k": key,
                         "__p64": pa.array(p64, pa.uint64())})

    lean = ds.map_batches(mk_lean, batch_format="pyarrow").materialize()

    samp = lean.select_columns(["__p64"]).limit(65536).to_pandas()
    keys = samp["__p64"].to_numpy(np.uint64)
    qs = np.linspace(0, 1, shards + 1)[1:-1]
    bounds = np.unique(np.quantile(keys, qs).astype(np.uint64))

    def add_shard(b: pa.Table) -> pa.Table:
        s = np.searchsorted(
            bounds, b.column("__p64").to_numpy(), side="right")
        return b.append_column("__s", pa.array(s.astype(np.int32)))

    sharded = lean.map_batches(add_shard,
                               batch_format="pyarrow").materialize()
    counts = (sharded.groupby("__s").count().to_pandas()
              .sort_values("__s"))
    offs = np.zeros(len(bounds) + 1, dtype=np.int64)
    if len(counts):
        per = np.zeros(len(bounds) + 1, dtype=np.int64)
        per[counts["__s"].to_numpy()] = counts["count()"].to_numpy()
        offs[1:] = np.cumsum(per)[:-1]

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__k", id_column], kind="mergesort")
        base = offs[int(g["__s"].iloc[0])]
        return pd.DataFrame({
            id_column: g[id_column].to_numpy(np.int64),
            "rnk0": base + np.arange(len(g), dtype=np.int64)})

    ranked = sharded.groupby("__s").map_groups(rank_shard,
                                               batch_format="pandas")

    w = int(window)

    def fan(b: pa.Table) -> pa.Table:
        r = b.column("rnk0").to_numpy(zero_copy_only=False)
        ids = b.column(id_column).to_numpy(zero_copy_only=False)
        home = r // bucket_rows
        head = (r % bucket_rows <= w - 2) & (home > 0)
        bk = np.concatenate([home, home[head] - 1])
        return pa.table({
            id_column: pa.array(np.concatenate([ids, ids[head]]),
                                pa.int64()),
            "rnk0": pa.array(np.concatenate([r, r[head]]), pa.int64()),
            "__pb": pa.array(bk.astype(np.int64))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rnk0", kind="mergesort")
        r = g["rnk0"].to_numpy(np.int64)
        ids = g[id_column].to_numpy(np.int64)
        bkt = int(g["__pb"].iloc[0])
        out_a, out_b, out_g = [], [], []
        for d in range(1, w):
            if len(r) <= d:
                break
            la, lb = r[:-d], r[d:]
            ok = (lb - la == d) & (la // bucket_rows == bkt)
            out_a.append(ids[:-d][ok])
            out_b.append(ids[d:][ok])
            out_g.append(np.full(int(ok.sum()), d, np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "gap": np.array([], np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "gap": np.concatenate(out_g)})

    return (ranked.map_batches(fan, batch_format="pyarrow")
            .groupby("__pb").map_groups(pairs, batch_format="pandas"))
