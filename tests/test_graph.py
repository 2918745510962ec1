"""Graph / hierarchy operator tests: ancestor closure (DAG + cycle
safety), subtree rollup, token co-occurrence edges."""

import numpy as np
import pyarrow as pa
import pytest

from biocurator_mapper_ray.ops.graph import (
    ParentCSR,
    _closure_for_batch,
    ancestor_closure,
    cooccur_edges,
    parent_csr_from_edges,
    subtree_rollup,
)


def _closure_set(nodes, csr, **kw):
    n, a, d = _closure_for_batch(np.asarray(nodes, dtype=np.int64), csr,
                                 kw.pop("max_depth", 64),
                                 kw.pop("include_self", False))
    return set(zip(n.tolist(), a.tolist(), d.tolist()))


class TestClosureKernel:
    def test_diamond_dag_dedups_and_takes_min_depth(self):
        # 3 -> {1, 2} -> 0: ancestor 0 reachable twice at depth 2,
        # emitted once
        csr = ParentCSR(np.array([3, 3, 1, 2]), np.array([1, 2, 0, 0]))
        got = _closure_set([3], csr)
        assert got == {(3, 1, 1), (3, 2, 1), (3, 0, 2)}

    def test_shortcut_edge_gives_shortest_depth(self):
        # 4 -> 2 -> 1 -> 0 plus shortcut 4 -> 0: depth(4, 0) == 1
        csr = ParentCSR(np.array([4, 2, 1, 4]), np.array([2, 1, 0, 0]))
        got = dict(((n, a), d) for n, a, d in _closure_set([4], csr))
        assert got[(4, 0)] == 1
        assert got[(4, 2)] == 1 and got[(4, 1)] == 2

    def test_cycle_terminates(self):
        csr = ParentCSR(np.array([1, 2]), np.array([2, 1]))
        assert _closure_set([1], csr) == {(1, 2, 1)}

    def test_unknown_node_and_include_self(self):
        csr = ParentCSR(np.array([1]), np.array([0]))
        assert _closure_set([99], csr) == set()
        got = _closure_set([99, 1], csr, include_self=True)
        assert (99, 99, 0) in got and (1, 1, 0) in got and (1, 0, 1) in got

    def test_max_depth_truncates(self):
        csr = ParentCSR(np.array([3, 2, 1]), np.array([2, 1, 0]))
        got = _closure_set([3], csr, max_depth=2)
        assert got == {(3, 2, 1), (3, 1, 2)}


class TestAncestorClosure:
    def test_matches_brute_force_and_partition_invariant(self, ray_session):
        import ray
        import ray.data as rd

        # binary tree over 0..63
        ids = np.arange(64)
        edges = rd.from_arrow(pa.table({"child": ids[1:], "parent": ids[1:] // 2}))
        csr = parent_csr_from_edges(edges, child_col="child", parent_col="parent")
        nodes = rd.from_arrow(pa.table({"doc_id": ids}))

        def brute(i):
            out, d = [], 0
            while i >= 1:
                d += 1
                i //= 2
                out.append((d, i))
            return out

        expect = {(i, a, d) for i in ids for d, a in brute(i)}
        got = ancestor_closure(nodes, ray.put(csr)).to_pandas()
        assert set(map(tuple, got.values)) == expect
        got7 = ancestor_closure(nodes.repartition(7), ray.put(csr)).to_pandas()
        assert set(map(tuple, got7.values)) == expect

    def test_duplicate_input_rows_re_emit(self, ray_session):
        import ray.data as rd

        csr = ParentCSR(np.array([1]), np.array([0]))
        nodes = rd.from_arrow(pa.table({"doc_id": [1, 1, 0]}))
        got = ancestor_closure(nodes, csr).to_pandas()
        assert len(got) == 2  # each dup row emits its chain; 0 has none
        assert set(got["node"]) == {1} and set(got["ancestor"]) == {0}


class TestSubtreeRollup:
    def test_sums_match_brute_force(self, ray_session):
        import ray
        import ray.data as rd

        ids = np.arange(32)
        vals = (ids * 7 + 3).astype(np.int64)
        edges = rd.from_arrow(pa.table({"child": ids[1:], "parent": ids[1:] // 2}))
        csr = parent_csr_from_edges(edges, child_col="child", parent_col="parent")
        ds = rd.from_arrow(pa.table({"doc_id": ids, "v": vals})).repartition(5)

        expect_sum = {int(i): 0 for i in ids}
        expect_cnt = {int(i): 0 for i in ids}
        for i in ids:
            j = int(i)
            while True:
                expect_sum[j] += int(vals[i])
                expect_cnt[j] += 1
                if j == 0:
                    break
                j //= 2

        got = subtree_rollup(ds, ray.put(csr), node_col="doc_id",
                             value_col="v").to_pandas().set_index("node")
        assert len(got) == 32
        for i in ids:
            assert got.loc[i, "subtree_value"] == expect_sum[int(i)]
            assert got.loc[i, "n_desc"] == expect_cnt[int(i)]

    def test_isolated_node_keeps_own_value(self, ray_session):
        import ray.data as rd

        csr = ParentCSR(np.array([1]), np.array([0]))
        ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 99], "v": [10, 5, 7]}))
        got = subtree_rollup(ds, csr, node_col="doc_id",
                             value_col="v").to_pandas().set_index("node")
        assert got.loc[99, "subtree_value"] == 7
        assert got.loc[0, "subtree_value"] == 15


class TestCooccurEdges:
    def test_counts_match_brute_force(self, ray_session):
        import itertools

        import ray.data as rd

        docs = ["a b c", "b a a", "c d", "", "a  b"]  # double space + empty
        ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))),
                                     "text": docs})).repartition(3)
        expect: dict[tuple, int] = {}
        for t in docs:
            toks = sorted(set(t.split()))
            for pair in itertools.combinations(toks, 2):
                expect[pair] = expect.get(pair, 0) + 1
        got = cooccur_edges(ds, min_count=1).to_pandas()
        got_map = {(r.tok_a, r.tok_b): r.n_docs for r in got.itertuples()}
        assert got_map == expect
        # min_count filters
        got2 = cooccur_edges(ds, min_count=2).to_pandas()
        assert {(r.tok_a, r.tok_b) for r in got2.itertuples()} == {
            p for p, c in expect.items() if c >= 2}

    def test_vocab_restriction(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c d"]}))
        got = cooccur_edges(ds, vocab=["a", "c"]).to_pandas()
        assert set(map(tuple, got[["tok_a", "tok_b"]].values)) == {("a", "c")}


class TestPagerank:
    def _numpy_pagerank(self, E, iters, d=0.85):
        import collections

        nodes = sorted({x for e in E for x in e})
        idx = {n: i for i, n in enumerate(nodes)}
        outd = collections.Counter(s for s, _ in E)
        N = len(nodes)
        r = np.full(N, 1.0 / N)
        for _ in range(iters):
            nr = np.zeros(N)
            dang = sum(r[idx[n]] for n in nodes if outd[n] == 0)
            for s, t in E:
                nr[idx[t]] += r[idx[s]] / outd[s]
            r = (1 - d) / N + d * (nr + dang / N)
        return {n: r[idx[n]] for n in nodes}

    def test_matches_power_iteration_with_dangling(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import pagerank

        # a: hub, e: dangling sink, d: source-only
        E = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("a", "e")]
        got = pagerank(rd.from_items(
            [{"src": s, "dst": t} for s, t in E]), iters=3).to_pandas()
        ref = self._numpy_pagerank(E, 3)
        assert len(got) == len(ref)
        for _, row in got.iterrows():
            assert abs(row["rank"] - ref[row["node"]]) < 1e-12, row["node"]
        # probability mass is conserved (dangling redistribution works)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_rank_order_and_sum_on_integer_graph(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import pagerank

        # 0 <- everyone, 0 -> 1, 1 dangling (rank mass oscillates
        # between 0 and 1 across iterations — parity-sensitive, so the
        # only stable claims are numpy parity and mass conservation)
        E = [(2, 0), (3, 0), (4, 0), (5, 0), (0, 1)]
        got = pagerank(rd.from_items(
            [{"src": s, "dst": t} for s, t in E]),
            iters=5).to_pandas().set_index("node")["rank"]
        assert abs(got.sum() - 1.0) < 1e-9
        ref = self._numpy_pagerank(E, 5)
        for n, r in ref.items():
            assert abs(got[n] - r) < 1e-12

    def test_empty_edges(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import pagerank

        ds = rd.from_items([{"src": 1, "dst": 2}]).filter(lambda r: False)
        got = pagerank(ds, iters=2).to_pandas()
        assert len(got) == 0

    def test_pinned_matches_shuffle_mode(self, ray_session):
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import pagerank

        import pandas as pd

        rng = np.random.default_rng(11)
        E = [(int(s), int(t)) for s, t in
             zip(rng.integers(0, 40, 200), rng.integers(0, 40, 200))]
        # from_pandas: ONE block — from_items would fan 200 rows into
        # 200 blocks and drown the run in per-block task dispatch
        mk = lambda: rd.from_pandas(pd.DataFrame(
            {"src": [s for s, _ in E], "dst": [t for _, t in E]}))
        a = pagerank(mk(), iters=3, mode="pinned") \
            .to_pandas().set_index("node")["rank"].sort_index()
        b = pagerank(mk(), iters=3, mode="shuffle") \
            .to_pandas().set_index("node")["rank"].sort_index()
        assert len(a) == len(b)
        assert float((a - b).abs().max()) < 1e-12
        ref = self._numpy_pagerank(E, 3)
        for n, r in ref.items():
            assert abs(a[n] - r) < 1e-12


class TestEdgeSetPrimitives:
    def _edges_ds(self, pairs):
        import pandas as pd
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}))

    def test_distinct_edges_canonicalizes(self, ray_session):
        from biocurator_mapper_ray.ops.graph import distinct_edges

        # duplicates, both orientations, self-loop
        pairs = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 5), (5, 2), (0, 1)]
        got = distinct_edges(self._edges_ds(pairs), buckets=4).to_pandas()
        have = set(zip(got["u"], got["v"]))
        assert have == {(1, 2), (2, 5), (0, 1)}

    def test_node_degrees_and_histogram(self, ray_session):
        import pandas as pd

        from biocurator_mapper_ray.ops.graph import (
            degree_histogram, distinct_edges, node_degrees)

        rng = np.random.default_rng(7)
        pairs = list(zip(rng.integers(0, 30, 300).tolist(),
                         rng.integers(0, 30, 300).tolist()))
        canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
        deg = {}
        for u, v in canon:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1

        got = node_degrees(
            distinct_edges(self._edges_ds(pairs), buckets=8),
            buckets=8).to_pandas()
        assert dict(zip(got["node"], got["deg"])) == deg

        hist = degree_histogram(self._edges_ds(pairs), buckets=8) \
            .to_pandas().set_index("degree")["n_nodes"]
        ref = pd.Series(list(deg.values())).value_counts()
        assert dict(hist) == {int(k): int(v) for k, v in ref.items()}

    def _brute_triangles(self, pairs, n):
        A = np.zeros((n, n), dtype=np.int64)
        for a, b in pairs:
            if a != b:
                A[a, b] = A[b, a] = 1
        return int(np.trace(A @ A @ A) // 6)

    def test_triangle_count_random_graph(self, ray_session):
        from biocurator_mapper_ray.ops.graph import triangle_count

        rng = np.random.default_rng(13)
        pairs = list(zip(rng.integers(0, 25, 400).tolist(),
                         rng.integers(0, 25, 400).tolist()))
        got = triangle_count(self._edges_ds(pairs), buckets=4)
        assert int(got["triangles"].iloc[0]) == \
            self._brute_triangles(pairs, 25)

    def test_triangle_count_known_and_empty(self, ray_session):
        from biocurator_mapper_ray.ops.graph import triangle_count

        # K4 has 4 triangles; duplicate/reversed edges must not inflate
        k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
              (1, 0), (2, 0), (3, 2)]
        got = triangle_count(self._edges_ds(k4), buckets=3)
        assert int(got["triangles"].iloc[0]) == 4

        tri_free = [(0, 1), (1, 2), (2, 3), (3, 4)]
        got = triangle_count(self._edges_ds(tri_free), buckets=3)
        assert int(got["triangles"].iloc[0]) == 0

    def test_grouped_pair_counts_matches_pandas(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import grouped_pair_counts

        rng = np.random.default_rng(21)
        df = pd.DataFrame({
            "basket": rng.integers(0, 40, 500),
            "item": [f"i{x}" for x in rng.integers(0, 12, 500)]})
        d = df.drop_duplicates()
        m = d.merge(d, on="basket")
        m = m[m["item_x"] < m["item_y"]]
        ref = m.groupby(["item_x", "item_y"]).size()

        got = grouped_pair_counts(
            rd.from_pandas(df), group_col="basket", item_col="item",
            buckets=8, shards=4).to_pandas()
        assert dict(zip(zip(got["item_a"], got["item_b"]),
                        got["n_groups"])) == \
            {k: int(v) for k, v in ref.items()}

        got2 = grouped_pair_counts(
            rd.from_pandas(df), group_col="basket", item_col="item",
            min_count=5, buckets=8, shards=4).to_pandas()
        assert dict(zip(zip(got2["item_a"], got2["item_b"]),
                        got2["n_groups"])) == \
            {k: int(v) for k, v in ref.items() if v >= 5}

    def test_common_neighbors_matches_brute_force(self, ray_session):
        from biocurator_mapper_ray.ops.graph import common_neighbors

        rng = np.random.default_rng(31)
        pairs = list(zip(rng.integers(0, 20, 150).tolist(),
                         rng.integers(0, 20, 150).tolist()))
        adj = {}
        for a, b in pairs:
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        ref = {}
        nodes = sorted(adj)
        for i, x in enumerate(nodes):
            for y in nodes[i + 1:]:
                c = len(adj[x] & adj[y])
                if c:
                    ref[(x, y)] = c

        got = common_neighbors(self._edges_ds(pairs), buckets=4,
                               shards=3).to_pandas()
        assert dict(zip(zip(got["node_a"], got["node_b"]),
                        got["n_common"])) == ref

        got2 = common_neighbors(self._edges_ds(pairs), min_count=3,
                                buckets=4, shards=3).to_pandas()
        assert dict(zip(zip(got2["node_a"], got2["node_b"]),
                        got2["n_common"])) == \
            {k: v for k, v in ref.items() if v >= 3}

    def test_common_neighbors_max_degree_drops_hub_centers(
            self, ray_session):
        from biocurator_mapper_ray.ops.graph import common_neighbors

        # star: center 0 adjacent to 1..5 (degree 5), plus a 1-2 edge.
        # cap 4 removes node 0 as a CENTER, so only centers 1 and 2
        # (degree 2 each) contribute pairs.
        pairs = [(0, k) for k in range(1, 6)] + [(1, 2)]
        got = common_neighbors(self._edges_ds(pairs), max_degree=4,
                               buckets=3, shards=2).to_pandas()
        ref = {}
        adj = {0: {1, 2, 3, 4, 5}, 1: {0, 2}, 2: {0, 1},
               3: {0}, 4: {0}, 5: {0}}
        for c, ns in adj.items():
            if len(ns) > 4:
                continue
            ns = sorted(ns)
            for i, x in enumerate(ns):
                for y in ns[i + 1:]:
                    ref[(x, y)] = ref.get((x, y), 0) + 1
        assert dict(zip(zip(got["node_a"], got["node_b"]),
                        got["n_common"])) == ref


class TestKCore:
    def _peel_reference(self, edges, k):
        import collections

        edges = set(map(tuple, edges))
        while True:
            deg = collections.Counter()
            for u, v in edges:
                deg[u] += 1
                deg[v] += 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return sorted(deg)
            edges = {(u, v) for u, v in edges
                     if u not in drop and v not in drop}
            if not edges:
                return []

    def test_matches_sequential_peel(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import k_core

        rng = np.random.default_rng(19)
        # dense clique (0-7) + sparse periphery chains
        edges = [(u, v) for u in range(8) for v in range(u + 1, 8)]
        nxt = 8
        for _ in range(30):
            a = int(rng.integers(0, 8))
            edges.append((a, nxt))
            edges.append((nxt, nxt + 1))
            nxt += 2
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = k_core(rd.from_pandas(df).repartition(4), k=4).to_pandas()
        want = self._peel_reference(edges, 4)
        assert sorted(got["node"]) == want
        assert want == list(range(8))  # the clique survives, chains peel

    def test_empty_core(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import k_core

        df = pd.DataFrame({"src": [1, 2], "dst": [2, 3]}).astype(np.int64)
        got = k_core(rd.from_pandas(df), k=3).to_pandas()
        assert len(got) == 0


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import label_propagation

        edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
        edges += [(u, v) for u in range(10, 15)
                  for v in range(u + 1, 15)]
        edges.append((4, 10))  # bridge
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = label_propagation(rd.from_pandas(df).repartition(3),
                                rounds=5).to_pandas()
        lab = dict(zip(got["node"], got["label"]))
        c1 = {lab[n] for n in range(5)}
        c2 = {lab[n] for n in range(10, 15)}
        assert len(c1) == 1 and len(c2) == 1
        assert c1 != c2  # the bridge does not merge the cliques

    def test_deterministic_across_partitionings(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import label_propagation

        rng = np.random.default_rng(8)
        edges = rng.integers(0, 40, size=(120, 2))
        edges = edges[edges[:, 0] != edges[:, 1]]
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        a = label_propagation(rd.from_pandas(df), rounds=3).to_pandas()
        b = label_propagation(rd.from_pandas(df).repartition(7),
                              rounds=3).to_pandas()
        assert dict(zip(a["node"], a["label"])) == \
            dict(zip(b["node"], b["label"]))


class TestBfsDistances:
    def _run(self, edges, sources, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import bfs_distances

        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = bfs_distances(rd.from_pandas(df).repartition(3),
                            sources, **kw).to_pandas()
        return dict(zip(got["node"], got["dist"]))

    def test_path_graph(self, ray_session):
        # 0-1-2-3-4 chain
        d = self._run([(i, i + 1) for i in range(4)], [0])
        assert d == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}

    def test_multi_source_min(self, ray_session):
        d = self._run([(i, i + 1) for i in range(6)], [0, 6])
        assert d == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1, 6: 0}

    def test_max_depth_truncates(self, ray_session):
        d = self._run([(i, i + 1) for i in range(6)], [0], max_depth=2)
        assert d == {0: 0, 1: 1, 2: 2}

    def test_disconnected_component_absent(self, ray_session):
        d = self._run([(0, 1), (1, 2), (10, 11)], [0])
        assert d == {0: 0, 1: 1, 2: 2}

    def test_cycle_converges_early(self, ray_session):
        d = self._run([(0, 1), (1, 2), (2, 0)], [0], max_depth=50)
        assert d == {0: 0, 1: 1, 2: 1}

    def test_matches_reference_bfs(self, ray_session):
        rng = np.random.default_rng(11)
        e = rng.integers(0, 60, size=(150, 2))
        e = [(int(a), int(b)) for a, b in e if a != b]
        d = self._run(e, [0], max_depth=20)
        # reference: plain python BFS over the same undirected edges
        adj: dict[int, set] = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        ref, frontier = {0: 0}, [0]
        lvl = 0
        while frontier:
            lvl += 1
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in ref:
                        ref[m] = lvl
                        nxt.append(m)
            frontier = nxt
        assert d == ref


def _undirected(edges):
    adj: dict[int, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    return adj


class TestJaccardLinks:
    def test_matches_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import jaccard_links

        rng = np.random.default_rng(21)
        e = rng.integers(0, 30, size=(120, 2))
        df = pd.DataFrame(e, columns=["src", "dst"]).astype(np.int64)
        got = jaccard_links(rd.from_pandas(df).repartition(4),
                            min_common=2).to_pandas()
        got = got.sort_values(["node_a", "node_b"]).reset_index(drop=True)

        adj = _undirected(e)
        exp = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                common = len(adj[a] & adj[b])
                if common >= 2:
                    exp[(a, b)] = (common, len(adj[a] | adj[b]))
        assert {(r.node_a, r.node_b): (r.n_common, r.n_union)
                for r in got.itertuples()} == exp

    def test_empty_graph(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import jaccard_links

        df = pd.DataFrame({"src": [1], "dst": [1]}).astype(np.int64)
        got = jaccard_links(rd.from_pandas(df)).to_pandas()
        assert len(got) == 0


class TestLocalClustering:
    def test_triangle_plus_tail(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import local_clustering

        # triangle 0-1-2 with a tail 2-3
        df = pd.DataFrame([(0, 1), (1, 2), (2, 0), (2, 3)],
                          columns=["src", "dst"]).astype(np.int64)
        got = local_clustering(rd.from_pandas(df)).to_pandas()
        by = {r.node: (r.deg, r.n_triangles, r.n_wedges)
              for r in got.itertuples()}
        assert by == {0: (2, 1, 1), 1: (2, 1, 1),
                      2: (3, 1, 3), 3: (1, 0, 0)}

    def test_matches_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import local_clustering

        rng = np.random.default_rng(22)
        e = rng.integers(0, 25, size=(100, 2))
        df = pd.DataFrame(e, columns=["src", "dst"]).astype(np.int64)
        got = local_clustering(rd.from_pandas(df).repartition(4)) \
            .to_pandas()

        adj = _undirected(e)
        exp = {}
        for n, nb in adj.items():
            nb_l = sorted(nb)
            t = sum(1 for i, x in enumerate(nb_l) for y in nb_l[i + 1:]
                    if y in adj[x])
            d = len(nb)
            exp[n] = (d, t, d * (d - 1) // 2)
        assert {r.node: (r.deg, r.n_triangles, r.n_wedges)
                for r in got.itertuples()} == exp


class TestHits:
    @staticmethod
    def _numpy_hits(edges, iters):
        nodes = sorted({n for e in edges for n in e})
        idx = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for a, b in edges:
            A[idx[a], idx[b]] = 1.0
        hub = np.ones(len(nodes))
        auth = np.ones(len(nodes))
        for _ in range(iters):
            auth = A.T @ hub
            auth /= np.linalg.norm(auth) or 1.0
            hub = A @ auth
            hub /= np.linalg.norm(hub) or 1.0
        return ({n: hub[idx[n]] for n in nodes},
                {n: auth[idx[n]] for n in nodes})

    def test_matches_numpy_power_iteration(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import hits

        rng = np.random.default_rng(31)
        raw = rng.integers(0, 20, size=(60, 2))
        edges = sorted({(int(a), int(b)) for a, b in raw if a != b})
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = hits(rd.from_pandas(df).repartition(4), iters=4).to_pandas()
        eh, ea = self._numpy_hits(edges, 4)
        for r in got.itertuples():
            assert abs(r.hub - eh[r.node]) < 1e-9
            assert abs(r.authority - ea[r.node]) < 1e-9

    def test_star_hub(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import hits

        # node 0 points at 1..4: 0 is the pure hub, 1..4 authorities
        df = pd.DataFrame([(0, i) for i in range(1, 5)],
                          columns=["src", "dst"]).astype(np.int64)
        got = hits(rd.from_pandas(df), iters=3).to_pandas()
        by = {r.node: (r.hub, r.authority) for r in got.itertuples()}
        assert abs(by[0][0] - 1.0) < 1e-12 and abs(by[0][1]) < 1e-12
        for i in range(1, 5):
            assert abs(by[i][1] - 0.5) < 1e-12 and abs(by[i][0]) < 1e-12

    def test_mode_parity(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import hits

        rng = np.random.default_rng(32)
        raw = rng.integers(0, 15, size=(40, 2))
        edges = sorted({(int(a), int(b)) for a, b in raw if a != b})
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        a = hits(rd.from_pandas(df), iters=3, mode="pinned").to_pandas()
        b = hits(rd.from_pandas(df), iters=3, mode="shuffle").to_pandas()
        am = {r.node: (r.hub, r.authority) for r in a.itertuples()}
        bm = {r.node: (r.hub, r.authority) for r in b.itertuples()}
        assert set(am) == set(bm)
        for n in am:
            assert abs(am[n][0] - bm[n][0]) < 1e-9
            assert abs(am[n][1] - bm[n][1]) < 1e-9


class TestPersonalizedPagerank:
    @staticmethod
    def _numpy_ppr(edges, seeds, d, iters):
        nodes = sorted({n for e in edges for n in e})
        idx = {n: i for i, n in enumerate(nodes)}
        W = np.zeros((len(nodes), len(nodes)))
        for a, b in edges:
            W[idx[a], idx[b]] = 1.0
        outdeg = W.sum(axis=1)
        nz = outdeg > 0
        W[nz] /= outdeg[nz][:, None]
        p = np.zeros(len(nodes))
        for s in seeds:
            p[idx[s]] = 1.0 / len(seeds)
        r = p.copy()
        for _ in range(iters):
            dang = r[~nz].sum()
            r = d * (W.T @ r) + ((1 - d) + d * dang) * p
        return {n: r[idx[n]] for n in nodes}

    def test_matches_numpy(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import personalized_pagerank

        rng = np.random.default_rng(41)
        raw = rng.integers(0, 25, size=(80, 2))
        edges = sorted({(int(a), int(b)) for a, b in raw if a != b})
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = personalized_pagerank(
            rd.from_pandas(df).repartition(3), [0, 7],
            iters=6).to_pandas()
        exp = self._numpy_ppr(edges, [0, 7], 0.85, 6)
        for r in got.itertuples():
            assert abs(r.rank - exp[r.node]) < 1e-9
        # nodes absent from the sparse result truly have rank 0
        absent = set(exp) - set(got["node"])
        assert all(exp[n] < 1e-12 for n in absent)

    def test_mass_conserved_and_seed_locality(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import personalized_pagerank

        # two disjoint chains; seeding in one leaves the other at zero
        edges = [(0, 1), (1, 2), (10, 11), (11, 12)]
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = personalized_pagerank(rd.from_pandas(df), [0],
                                    iters=8).to_pandas()
        assert abs(got["rank"].sum() - 1.0) < 1e-9
        assert set(got["node"]) == {0, 1, 2}

    def test_empty_seeds_raises(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import personalized_pagerank

        df = pd.DataFrame({"src": [0], "dst": [1]}).astype(np.int64)
        try:
            personalized_pagerank(rd.from_pandas(df), [])
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestAssortativity:
    def test_matches_bruteforce(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import (
            degree_assortativity_evidence,
        )

        rng = np.random.default_rng(61)
        e = rng.integers(0, 30, size=(100, 2))
        df = pd.DataFrame(e, columns=["src", "dst"]).astype(np.int64)
        got = degree_assortativity_evidence(
            rd.from_pandas(df).repartition(4)).to_pandas().iloc[0]

        adj = _undirected(e)
        deg = {n: len(v) for n, v in adj.items()}
        pairs = [(deg[a], deg[b]) for a, nb in adj.items() for b in nb]
        xs = np.array([p[0] for p in pairs], dtype=np.int64)
        ys = np.array([p[1] for p in pairs], dtype=np.int64)
        assert got["n"] == len(pairs)
        assert got["sum_x"] == xs.sum() and got["sum_y"] == ys.sum()
        assert got["sum_xy"] == (xs * ys).sum()
        assert got["sum_x2"] == (xs * xs).sum()
        assert got["sum_y2"] == (ys * ys).sum()
        # the reader-side coefficient is finite and in [-1, 1]
        n = got["n"]
        num = n * got["sum_xy"] - got["sum_x"] * got["sum_y"]
        den = np.sqrt(float(n * got["sum_x2"] - got["sum_x"] ** 2)
                      * float(n * got["sum_y2"] - got["sum_y"] ** 2))
        assert -1.0 <= num / den <= 1.0


class TestConsecutiveEdges:
    def _edges(self, rows, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import consecutive_edges

        cols = ["k", "o", "x"] + (["keep"] if "keep_col" in kw else [])
        df = pd.DataFrame(rows, columns=cols)
        got = consecutive_edges(
            rd.from_pandas(df).repartition(3),
            key_col="k", order_col="o", value_col="x", **kw,
        ).to_pandas()
        if got.empty:
            return set()
        return set(zip(got["u"].tolist(), got["v"].tolist()))

    def test_adjacent_pairs_canonical_and_deduped(self, ray_session):
        # chain 5-7-5: pairs (5,7) and (7,5) canonicalize + dedup to one
        rows = [(1, 1, 5), (1, 2, 7), (1, 3, 5)]
        assert self._edges(rows) == {(5, 7)}

    def test_gap_breaks_chain_and_self_loops_dropped(self, ray_session):
        # o jumps 2 -> 4 (no pair across the gap); (9,9) self pair dropped
        rows = [(1, 1, 9), (1, 2, 9), (1, 4, 3)]
        assert self._edges(rows) == set()

    def test_keys_do_not_bridge(self, ray_session):
        rows = [(1, 1, 2), (1, 2, 3), (2, 1, 3), (2, 2, 4)]
        assert self._edges(rows) == {(2, 3), (3, 4)}

    def test_keep_col_must_hold_on_both_ends(self, ray_session):
        rows = [(1, 1, 2, True), (1, 2, 3, False), (1, 3, 4, True),
                (1, 4, 5, True)]
        assert self._edges(rows, keep_col="keep") == {(4, 5)}

    def test_duplicate_order_rows_pair_cross_product(self, ray_session):
        # SQL self-join ON o2 = o1 + 1: two rows at o=1 each pair with
        # the row at o=2 (and not with each other)
        rows = [(1, 1, 2), (1, 1, 3), (1, 2, 4)]
        assert self._edges(rows) == {(2, 4), (3, 4)}


class TestSeedDistances:
    def _run(self, edges, sources, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import seed_distances

        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = seed_distances(rd.from_pandas(df).repartition(3),
                             sources, **kw).to_pandas()
        return {(s, n): d for s, n, d in
                zip(got["seed"], got["node"], got["dist"])}

    def test_path_graph_two_seeds_keep_identity(self, ray_session):
        # 0-1-2-3-4: unlike bfs_distances, BOTH seeds label every node
        d = self._run([(i, i + 1) for i in range(4)], [0, 4])
        assert d == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3,
                     (0, 4): 4,
                     (4, 4): 0, (4, 3): 1, (4, 2): 2, (4, 1): 3,
                     (4, 0): 4}

    def test_max_depth_and_isolated_seed(self, ray_session):
        # seed 10 has no edges: only its self row survives
        d = self._run([(0, 1), (1, 2), (2, 3)], [0, 10], max_depth=2)
        assert d == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (10, 10): 0}

    def test_matches_reference_per_seed_bfs(self, ray_session):
        rng = np.random.default_rng(7)
        e = [(int(a), int(b)) for a, b in
             rng.integers(0, 40, size=(90, 2)) if a != b]
        seeds = [0, 7, 23]
        d = self._run(e, seeds, max_depth=20)
        adj = _undirected(e)
        ref = {}
        for s in seeds:
            dist, frontier, lvl = {s: 0}, [s], 0
            while frontier:
                lvl += 1
                nxt = []
                for n in frontier:
                    for m in adj.get(n, ()):
                        if m not in dist:
                            dist[m] = lvl
                            nxt.append(m)
                frontier = nxt
            for n, dd in dist.items():
                ref[(s, n)] = dd
        assert d == ref


class TestClosenessFromSeeds:
    def test_closeness_integer_evidence(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import closeness_from_seeds

        # star: 0 at center of 1..5, plus a 2-hop tail 5-6
        edges = [(0, i) for i in range(1, 6)] + [(5, 6)]
        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = closeness_from_seeds(rd.from_pandas(df).repartition(2),
                                   [0, 6], max_depth=4).to_pandas()
        rows = {int(r.seed): (int(r.n_reached), int(r.total_dist))
                for r in got.itertuples()}
        # seed 0: 1..5 at dist 1, 6 at dist 2 -> (6, 7)
        # seed 6: 5@1, 0@2, 1..4@3 -> (6, 15)
        assert rows == {0: (6, 7), 6: (6, 15)}


class TestShortestPathCounts:
    def _run(self, edges, sources, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import shortest_path_counts

        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = shortest_path_counts(rd.from_pandas(df).repartition(3),
                                   sources, **kw).to_pandas()
        return {(s, n): (d, g) for s, n, d, g in
                zip(got["seed"], got["node"], got["dist"], got["sigma"])}

    def test_diamond_counts_two_paths(self, ray_session):
        # 0-1-3, 0-2-3: node 3 has two shortest paths from 0
        d = self._run([(0, 1), (0, 2), (1, 3), (2, 3)], [0])
        assert d == {(0, 0): (0, 1), (0, 1): (1, 1), (0, 2): (1, 1),
                     (0, 3): (2, 2)}

    def test_longer_path_does_not_count(self, ray_session):
        # direct edge 0-3 plus the diamond: dist 1, sigma 1
        d = self._run([(0, 1), (0, 2), (1, 3), (2, 3), (0, 3)], [0])
        assert d[(0, 3)] == (1, 1)

    def test_matches_reference_brandes_sigma(self, ray_session):
        rng = np.random.default_rng(11)
        # the op takes a DISTINCT undirected edge set (distinct_edges
        # upstream in production) — sigma counts edge multiplicity
        e = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in rng.integers(0, 30, size=(70, 2))
                    if a != b})
        seeds = [0, 9]
        got = self._run(e, seeds, max_depth=10)
        adj = _undirected(e)
        ref = {}
        for s in seeds:
            dist, sigma = {s: 0}, {s: 1}
            frontier = [s]
            while frontier:
                nxt = {}
                for n in frontier:
                    for m in adj.get(n, ()):
                        if m in dist and dist[m] <= dist[n]:
                            continue
                        nxt[m] = nxt.get(m, 0) + sigma[n]
                for m, c in nxt.items():
                    dist[m] = dist[frontier[0]] + 1
                    sigma[m] = c
                frontier = list(nxt)
            for n in dist:
                ref[(s, n)] = (dist[n], sigma[n])
        assert got == ref

    def test_max_depth_caps_walk(self, ray_session):
        d = self._run([(i, i + 1) for i in range(5)], [0], max_depth=2)
        assert set(d) == {(0, 0), (0, 1), (0, 2)}


class TestBetweennessFromSeeds:
    @staticmethod
    def _brandes_ref(adj, seeds):
        """Unnormalized sampled Brandes: bc[v] = Σ_seeds δ_s(v), v≠s."""
        bc: dict[int, float] = {}
        for s in seeds:
            dist, sigma = {s: 0}, {s: 1}
            preds: dict[int, list] = {}
            order, frontier = [s], [s]
            while frontier:
                nxt = []
                for v in frontier:
                    for w in adj.get(v, ()):
                        if w not in dist:
                            dist[w] = dist[v] + 1
                            sigma[w] = 0
                            nxt.append(w)
                        if dist[w] == dist[v] + 1:
                            sigma[w] += sigma[v]
                            preds.setdefault(w, []).append(v)
                seen, f2 = set(), []
                for w in nxt:
                    if w not in seen:
                        seen.add(w)
                        f2.append(w)
                order.extend(f2)
                frontier = f2
            delta = {v: 0.0 for v in order}
            for w in reversed(order):
                for v in preds.get(w, ()):
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
                if w != s:
                    bc[w] = bc.get(w, 0.0) + delta[w]
        return bc

    def _run(self, edges, seeds, **kw):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import betweenness_from_seeds

        df = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        got = betweenness_from_seeds(rd.from_pandas(df).repartition(3),
                                     seeds, **kw).to_pandas()
        return dict(zip(got["node"], got["bc"]))

    def test_path_graph_middle_node_dominates(self, ray_session):
        # 0-1-2-3-4 from both ends: interior nodes carry the paths
        got = self._run([(i, i + 1) for i in range(4)], [0, 4],
                        max_depth=4)
        adj = _undirected([(i, i + 1) for i in range(4)])
        ref = self._brandes_ref(adj, [0, 4])
        assert set(got) == set(ref)
        for n in ref:
            assert got[n] == pytest.approx(ref[n])

    def test_matches_reference_on_random_graph(self, ray_session):
        rng = np.random.default_rng(5)
        e = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in rng.integers(0, 25, size=(60, 2))
                    if a != b})
        seeds = [0, 7, 13]
        got = self._run(e, seeds, max_depth=12)
        ref = self._brandes_ref(_undirected(e), seeds)
        assert set(got) == set(ref)
        for n in ref:
            assert got[n] == pytest.approx(ref[n], rel=1e-9)


class TestHarmonicFromSeeds:
    def test_matches_reference_reciprocal_sums(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import harmonic_from_seeds

        rng = np.random.default_rng(3)
        e = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in rng.integers(0, 20, size=(40, 2))
                    if a != b})
        seeds = [0, 5]
        df = pd.DataFrame(e, columns=["src", "dst"]).astype(np.int64)
        got = harmonic_from_seeds(rd.from_pandas(df).repartition(3),
                                  seeds, max_depth=4).to_pandas()
        adj = _undirected(e)
        scale = 12
        ref: dict[int, int] = {}
        cnt: dict[int, int] = {}
        for s in seeds:
            dist, frontier = {s: 0}, [s]
            while frontier:
                nxt = []
                for n in frontier:
                    for m in adj.get(n, ()):
                        if m not in dist and dist[n] < 4:
                            dist[m] = dist[n] + 1
                            nxt.append(m)
                frontier = nxt
            for n, d in dist.items():
                if d > 0:
                    ref[n] = ref.get(n, 0) + scale // d
                    cnt[n] = cnt.get(n, 0) + 1
        gm = dict(zip(got["node"], got["h_scaled"]))
        gc = dict(zip(got["node"], got["n_seeds"]))
        assert gm == ref and gc == cnt

    def test_scale_must_divide_depths(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from biocurator_mapper_ray.ops.graph import harmonic_from_seeds

        df = pd.DataFrame([(0, 1)], columns=["src", "dst"])
        with pytest.raises(ValueError):
            harmonic_from_seeds(rd.from_pandas(df), [0], max_depth=3,
                                scale=4)
