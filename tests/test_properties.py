"""Property-based tests for the pure numpy kernels (hypothesis) and
seeded randomized parity tests for the windowed ops (Ray vs pandas
reference semantics)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from biocurator_mapper_ray.ops.dedup import (
    _allpairs_index,
    _connect_index,
    _contract_edge_batch,
    _popcount64,
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=0, max_size=8))
def test_allpairs_index_is_exactly_all_within_group_pairs(sizes):
    sizes = np.asarray(sizes, dtype=np.int64)
    ia, ib = _allpairs_index(sizes)
    got = set(zip(ia.tolist(), ib.tolist()))
    want = set()
    start = 0
    for s in sizes:
        for i in range(start, start + s):
            for j in range(i + 1, start + s):
                want.add((i, j))
        start += s
    assert got == want
    assert (ia < ib).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=0, max_size=8))
def test_connect_index_spans_each_group(sizes):
    """Chain+star edges connect every group completely (union-find) and
    never cross group boundaries."""
    sizes = np.asarray(sizes, dtype=np.int64)
    ia, ib = _connect_index(sizes)
    total = int(sizes.sum())
    parent = list(range(total))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    bounds = np.cumsum(sizes)
    group_of = np.searchsorted(bounds, np.arange(total), side="right")
    for a, b in zip(ia.tolist(), ib.tolist()):
        assert group_of[a] == group_of[b]
        parent[find(a)] = find(b)
    start = 0
    for s in sizes:
        roots = {find(i) for i in range(start, start + s)}
        assert len(roots) == 1
        start += s


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=32))
def test_popcount_matches_python(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = _popcount64(arr)
    want = [bin(v).count("1") for v in vals]
    assert got.tolist() == want


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=40))
def test_contract_edge_batch_preserves_connectivity(pairs):
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    ra, rb = _contract_edge_batch(a, b)

    def components(edge_a, edge_b):
        nodes = set(edge_a.tolist()) | set(edge_b.tolist())
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(edge_a.tolist(), edge_b.tolist()):
            parent[find(x)] = find(y)
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), set()).add(n)
        return {frozenset(v) for v in comp.values()}

    assert components(a, b) == components(ra, rb)
    # contracted edges are star edges from each component's min node
    assert (ra < rb).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_running_and_rolling_match_pandas_reference(ray_session, seed):
    import ray.data as rd

    from biocurator_mapper_ray.ops.window import (
        rolling_time_aggregate,
        running_aggregate,
    )

    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 3_600_000, n), unit="s"),
        "v": rng.integers(-50, 200, n).astype(np.int64),
    })
    df = df.drop_duplicates(subset=["user_id", "ts"]).reset_index(drop=True)

    run = running_aggregate(rd.from_pandas(df), key="user_id", ts="ts",
                            tiebreak="event_id", value="v").to_pandas()
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["running_sum"] = ref.groupby("user_id")["v"].cumsum()
    merged = run.merge(ref[["event_id", "running_sum"]], on="event_id",
                       suffixes=("", "_ref"))
    assert (merged["running_sum"] == merged["running_sum_ref"]).all()

    roll = rolling_time_aggregate(rd.from_pandas(df), key="user_id", ts="ts",
                                  tiebreak="event_id", value="v",
                                  window="1h").to_pandas()
    # brute-force reference: trailing [ts-1h, ts] inclusive per key
    ref_map = {}
    for _, row in df.iterrows():
        lo = row["ts"] - pd.Timedelta(hours=1)
        mask = (df["user_id"] == row["user_id"]) & (df["ts"] >= lo) & (df["ts"] <= row["ts"])
        ref_map[row["event_id"]] = df.loc[mask, "v"].sum()
    assert all(ref_map[e] == s for e, s in zip(roll["event_id"], roll["rolling_sum"]))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=12), min_size=0, max_size=8),
       st.integers(min_value=1, max_value=30))
def test_allpairs_blocks_equals_allpairs_index(sizes, max_pairs):
    """The blocked generator covers EXACTLY the all-pairs set for any
    budget, including budgets smaller than a single group's pair count
    (the oversized-bucket tiling path)."""
    from biocurator_mapper_ray.ops.dedup import _allpairs_blocks

    sizes = np.asarray(sizes, dtype=np.int64)
    want_a, want_b = _allpairs_index(sizes)
    want = set(zip(want_a.tolist(), want_b.tolist()))
    got = set()
    for ia, ib in _allpairs_blocks(sizes, max_pairs):
        assert len(ia) <= max(max_pairs,
                              int(np.sqrt(max_pairs)) ** 2) or len(ia) <= max_pairs
        block = set(zip(ia.tolist(), ib.tolist()))
        assert not (block & got), "pair emitted twice"
        got |= block
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40), min_size=0, max_size=6))
def test_hybrid_index_full_pairs_small_connect_large(sizes):
    from biocurator_mapper_ray.ops.dedup import _HYBRID_CUTOFF, _hybrid_index

    sizes = np.asarray(sizes, dtype=np.int64)
    ia, ib = _hybrid_index(sizes)
    got = set(zip(ia.tolist(), ib.tolist()))
    bounds = np.cumsum(sizes)
    starts = bounds - sizes
    n_expected = 0
    for g, s in enumerate(sizes):
        rows = range(int(starts[g]), int(bounds[g]))
        group_pairs = {(i, j) for i, j in got
                       if i in rows and j in rows}
        if s <= _HYBRID_CUTOFF:
            assert group_pairs == {(i, j) for i in rows for j in rows if i < j}
        else:
            assert len(group_pairs) == 2 * s - 3
            # still spans the group (connectivity)
            parent = {i: i for i in rows}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for i, j in group_pairs:
                parent[find(i)] = find(j)
            assert len({find(i) for i in rows}) == 1
        n_expected += len(group_pairs)
    assert len(got) == n_expected


def test_connected_components_warns_when_unconverged(ray_session):
    """A long chain with max_iters=1 must WARN instead of silently
    returning inconsistent labels (ADVICE r2)."""
    import warnings as _warnings

    import ray.data as rd

    from biocurator_mapper_ray.ops.dedup import connected_components

    # one long chain, one edge per block so local contraction can't
    # collapse it and a single global round can't reach the fixpoint
    n = 40
    edges = rd.from_pandas(
        pd.DataFrame({"a": np.arange(n - 1), "b": np.arange(1, n)})
    ).repartition(n - 1)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        connected_components(edges, max_iters=1).to_pandas()
    assert any("still changing" in str(w.message) for w in rec)

    # a short chain converges within the budget and stays silent
    m = 8
    short = rd.from_pandas(
        pd.DataFrame({"a": np.arange(m - 1), "b": np.arange(1, m)})
    ).repartition(m - 1)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        out = connected_components(short, max_iters=10).to_pandas()
    assert not any("still changing" in str(w.message) for w in rec)
    assert set(out["component"]) == {0} and len(out) == m


# ---------------------------------------------------------- graph closure


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 15), st.integers(0, 14)),
                min_size=0, max_size=30))
def test_closure_matches_bfs_on_random_dags(edges):
    from biocurator_mapper_ray.ops.graph import ParentCSR, _closure_for_batch

    # parent < child guarantees a DAG; dedup identical edges
    edges = sorted({(c, p) for c, p in edges if p < c})
    if not edges:
        return
    children = np.array([c for c, _ in edges], dtype=np.int64)
    parents = np.array([p for _, p in edges], dtype=np.int64)
    csr = ParentCSR(children, parents)

    # brute force: BFS per node over the parent relation (min depth)
    adj = {}
    for c, p in edges:
        adj.setdefault(c, []).append(p)
    want = set()
    nodes = sorted({c for c, _ in edges} | {p for _, p in edges})
    for n0 in nodes:
        depth = {n0: 0}
        frontier = [n0]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in depth:
                        depth[v] = depth[u] + 1
                        nxt.append(v)
            frontier = nxt
        for v, d in depth.items():
            if d > 0:
                want.add((n0, v, d))

    n, a, d = _closure_for_batch(np.array(nodes, dtype=np.int64), csr,
                                 max_depth=64, include_self=False)
    assert set(zip(n.tolist(), a.tolist(), d.tolist())) == want


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=20),
       st.lists(st.integers(0, 9), min_size=1, max_size=6))
def test_parent_csr_expand_matches_per_node_lists(edges, probe):
    from biocurator_mapper_ray.ops.graph import ParentCSR

    children = np.array([c for c, _ in edges], dtype=np.int64)
    parents = np.array([p for _, p in edges], dtype=np.int64)
    csr = ParentCSR(children, parents)
    idx = csr.index_of(np.array(probe, dtype=np.int64))
    idx = idx[idx >= 0]
    if not len(idx):
        return
    src, tgt = csr.expand(idx)
    got = {}
    for s, t in zip(src.tolist(), tgt.tolist()):
        got.setdefault(s, []).append(int(csr.ids[t]))
    for i, dense in enumerate(idx.tolist()):
        node = int(csr.ids[dense])
        want = sorted(p for c, p in edges if c == node)
        assert sorted(got.get(i, [])) == want


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["a", "b", "c", "d"]),
                         min_size=0, max_size=12),
                min_size=1, max_size=12),
       st.integers(min_value=2, max_value=4))
def test_duplicate_spans_matches_bruteforce(docs_toks, n):
    """duplicate_spans ≡ brute-force shingle positions on random tiny
    corpora over a 4-letter alphabet (heavy collisions by construction)."""
    import ray.data as rd

    from biocurator_mapper_ray.ops.dedup import duplicate_spans

    docs = [{"doc_id": i, "text": " ".join(t)} for i, t in enumerate(docs_toks)]
    got = duplicate_spans(rd.from_items(docs), n=n, buckets=4).to_pandas()
    got_set = (set(zip(got["doc_id"], got["start"]))
               if len(got.columns) else set())

    from collections import Counter
    spans = []
    for i, toks in enumerate(docs_toks):
        for s in range(len(toks) - n + 1):
            spans.append((i, s + 1, " ".join(toks[s:s + n])))
    counts = Counter(sh for _, _, sh in spans)
    want = {(i, s) for i, s, sh in spans if counts[sh] >= 2}
    assert got_set == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50),
                min_size=0, max_size=40),
       st.lists(st.integers(min_value=0, max_value=50),
                min_size=0, max_size=40))
def test_bloom_semi_join_equals_set_intersection(left_keys, right_keys):
    import pandas as pd
    import ray.data as rd

    from biocurator_mapper_ray.ops.sketch import bloom_semi_join

    left = pd.DataFrame({"lk": pd.array(left_keys, dtype="int64")})
    right = pd.DataFrame({"rk": pd.array(sorted(set(right_keys)),
                                         dtype="int64")})
    out = bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                          "lk", "rk", m_bits=1024).to_pandas()
    got = sorted(out["lk"]) if len(out.columns) else []
    want = sorted(k for k in left_keys if k in set(right_keys))
    assert got == want


class TestHashTopKPerGroup:
    def test_partition_invariant_and_exact_k(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import hash_top_k_per_group

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 200),
            "id": np.arange(200),
        })
        outs = []
        for nblocks in (1, 13):
            got = hash_top_k_per_group(
                rd.from_pandas(df).repartition(nblocks),
                group_column="g", key_column="id", k=7).to_pandas()
            outs.append(got.sort_values(["g", "id"]).reset_index(drop=True))
            assert (got.groupby("g").size() == 7).all()
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_small_group_keeps_all(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.sample import hash_top_k_per_group

        df = pd.DataFrame({"g": ["x", "x", "y"], "id": [1, 2, 3]})
        got = hash_top_k_per_group(rd.from_pandas(df), group_column="g",
                                   key_column="id", k=10).to_pandas()
        assert len(got) == 3


class TestGroupedQuantilesCont:
    def test_matches_numpy_linear_interpolation(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import grouped_quantiles_cont

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 2000),
            "v": np.round(rng.normal(100, 30, 2000), 2),
        })
        got = grouped_quantiles_cont(
            rd.from_pandas(df).repartition(7), "v", "g",
            [0.25, 0.5, 0.9]).set_index(["g", "q"])
        for g, sub in df.groupby("g"):
            for q in (0.25, 0.5, 0.9):
                ref = np.percentile(sub["v"].to_numpy(), q * 100,
                                    method="linear")
                assert abs(got.loc[(g, q), "value"] - ref) < 1e-9, (g, q)

    def test_single_row_group(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.quantile import grouped_quantiles_cont

        df = pd.DataFrame({"g": ["only"], "v": [42.5]})
        got = grouped_quantiles_cont(rd.from_pandas(df), "v", "g",
                                     [0.1, 0.9])
        assert (got["value"] == 42.5).all()
