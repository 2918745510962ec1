"""Graph / hierarchy operators for KG construction: ancestor closure
over an ontology DAG, hierarchical subtree rollup, and within-document
token co-occurrence edges.

Reference anchor: biocurator_mapper holds its whole ontology in memory
and consults parent links term-by-term while curating
(``/root/reference/app/go_parser.py`` keeps each term's relationship
list; the UI walks them on demand).  At corpus scale the equivalent
primitives are (a) the materialized ancestor CLOSURE of the ontology —
every (term, ancestor, depth) pair — which downstream joins consume for
subsumption reasoning, and (b) hierarchical rollups ("aggregate every
document's signal up the tree").  Co-occurrence edge extraction is the
standard first step of corpus-driven KG construction (count-based edge
weights feed PMI / embedding training).

Scale shape (the 100-TB path):

* the ontology EDGE SET is the small side by definition (100k terms ×
  a few parents ≈ MBs): it is compressed into CSR arrays once, shipped
  via ``ray.put``, and every closure/rollup stage streams map-side over
  the corpus-scale node/value table with NO exchange for the walk
  itself; only the rollup's per-ancestor partial sums cross one salted,
  support-bounded exchange.
* the per-level frontier expansion inside a batch is fully vectorized
  (CSR gather via repeat/cumsum, packed-key dedup via ``np.unique``) —
  no per-node Python in the walk.
* co-occurrence streams one Arrow tokenize pass per batch, expands
  per-document distinct-token pairs with the same repeat/cumsum pair
  index the dedup suite uses, pre-aggregates (pair → count) INSIDE the
  batch, and ships only the batch's distinct pairs through one salted
  exchange — bounded by vocabulary² per batch, not by token count.
  Restrict ``vocab`` (broadcast allow-list) to bound the blowup on
  open-vocabulary corpora.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _allpairs_index
from ..functions.hashing import hash64_column


# --------------------------------------------------------------- closure


class ParentCSR:
    """Compressed-sparse-row view of a (child → parents) edge set.

    Node ids are compressed to dense indices once; ``parents_of`` is a
    vectorized CSR gather.  Supports DAGs (multiple parents per child).
    This object is the BROADCAST side: build once on the driver from the
    (small) ontology edge table, ``ray.put`` it, read per actor.
    """

    def __init__(self, children: np.ndarray, parents: np.ndarray):
        children = np.asarray(children, dtype=np.int64)
        parents = np.asarray(parents, dtype=np.int64)
        self.ids = np.unique(np.concatenate([children, parents]))
        self.n = len(self.ids)
        c = np.searchsorted(self.ids, children)
        p = np.searchsorted(self.ids, parents)
        order = np.argsort(c, kind="stable")
        c, p = c[order], p[order]
        self.deg = np.bincount(c, minlength=self.n).astype(np.int64)
        self.offsets = np.concatenate([[0], np.cumsum(self.deg)])
        self.targets = p

    def index_of(self, nodes: np.ndarray) -> np.ndarray:
        """Dense index per node id; -1 for ids not in the graph."""
        idx = np.searchsorted(self.ids, nodes)
        idx = np.minimum(idx, self.n - 1)
        ok = self.ids[idx] == nodes
        return np.where(ok, idx, -1)

    def expand(self, idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """CSR multi-gather: for dense indices ``idx`` return
        (positions-into-idx repeated per parent, parent dense indices) —
        one repeat/cumsum pass, no per-node loop."""
        counts = self.deg[idx]
        total = int(counts.sum())
        if total == 0:
            z = np.zeros(0, dtype=np.int64)
            return z, z
        src = np.repeat(np.arange(len(idx), dtype=np.int64), counts)
        # flat positions into self.targets: offsets[idx] repeated, plus a
        # within-run ramp (global arange minus each run's start)
        run_starts = np.cumsum(counts) - counts
        ramp = np.arange(total, dtype=np.int64) - np.repeat(run_starts, counts)
        flat = np.repeat(self.offsets[idx], counts) + ramp
        return src, self.targets[flat]


def parent_csr_from_edges(edges_ds, *, child_col: str, parent_col: str) -> ParentCSR:
    """Build the broadcast :class:`ParentCSR` from an edge Dataset.

    Materializes the EDGE table to the driver — by design: ontology
    edge sets are the small side (MBs).  Corpus-scale tables never pass
    through here; they stream through :func:`ancestor_closure` /
    :func:`subtree_rollup` map-side.
    """
    df = edges_ds.select_columns([child_col, parent_col]).to_pandas()
    return ParentCSR(df[child_col].to_numpy(), df[parent_col].to_numpy())


def _closure_for_batch(nodes: np.ndarray, csr: ParentCSR, max_depth: int,
                       include_self: bool
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(node, ancestor, depth) triples for one batch of node ids —
    semi-naive level-wise expansion, deduped per level with packed keys
    so diamond DAG patterns can't blow up exponentially; depth is the
    SHORTEST path (first level an ancestor is reached at)."""
    out_n: list[np.ndarray] = []
    out_a: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    uniq, inv = np.unique(nodes, return_inverse=True)
    idx0 = csr.index_of(uniq)
    known = idx0 >= 0
    # frontier rows: (position-in-uniq, current dense index)
    f_src = np.nonzero(known)[0]
    f_cur = idx0[known]
    if include_self:
        out_n.append(uniq)
        out_a.append(uniq)
        out_d.append(np.zeros(len(uniq), dtype=np.int64))
    # per-origin seen set, as packed (origin_pos * n + dense) keys kept
    # sorted for searchsorted membership; n < 2**31 keeps products exact
    seen = np.sort(f_src * csr.n + f_cur)
    depth = 0
    while len(f_src) and depth < max_depth:
        depth += 1
        src, anc = csr.expand(f_cur)
        orig = f_src[src]
        keys = orig * csr.n + anc
        keys, first = np.unique(keys, return_index=True)
        orig, anc = orig[first], anc[first]
        pos = np.searchsorted(seen, keys)
        pos = np.minimum(pos, len(seen) - 1) if len(seen) else pos
        fresh = (seen[pos] != keys) if len(seen) else np.ones(len(keys), bool)
        orig, anc, keys = orig[fresh], anc[fresh], keys[fresh]
        if not len(orig):
            break
        seen = np.sort(np.concatenate([seen, keys]))
        out_n.append(uniq[orig])
        out_a.append(csr.ids[anc])
        out_d.append(np.full(len(orig), depth, dtype=np.int64))
        f_src, f_cur = orig, anc
    if not out_n:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return (np.concatenate(out_n), np.concatenate(out_a),
            np.concatenate(out_d))


def ancestor_closure(ds, csr_ref, *, node_col: str = "doc_id",
                     max_depth: int = 64, include_self: bool = False):
    """Transitive ancestor closure: for every node in ``ds``, emit
    (node, ancestor, depth) for all ancestors reachable through the
    broadcast edge set, depth = shortest path.

    Map-side only — each batch walks its own nodes' chains against the
    broadcast :class:`ParentCSR` (``csr_ref`` is a ``ray.put`` handle or
    a plain ``ParentCSR`` for tests); the walk itself needs NO exchange,
    and output size is Σ per-node ancestor counts (the closure, which is
    what the caller asked to materialize).  Duplicate node ids in ``ds``
    each re-emit their chain (closure over a node TABLE, not a set).
    """
    import ray as _ray

    def walk(batch: pa.Table) -> pa.Table:
        csr = csr_ref if isinstance(csr_ref, ParentCSR) else _ray.get(csr_ref)
        nodes = batch.column(node_col).to_numpy()
        uniq_n, uniq_a, uniq_d = _closure_for_batch(
            nodes, csr, max_depth, include_self)
        # re-expand per duplicate input row: join batch nodes -> unique rows
        order = np.argsort(uniq_n, kind="stable")
        uniq_n, uniq_a, uniq_d = uniq_n[order], uniq_a[order], uniq_d[order]
        starts = np.searchsorted(uniq_n, nodes, side="left")
        ends = np.searchsorted(uniq_n, nodes, side="right")
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "ancestor": pa.array([], pa.int64()),
                             "depth": pa.array([], pa.int64())})
        run_starts = np.cumsum(counts) - counts
        ramp = np.arange(total, dtype=np.int64) - np.repeat(run_starts, counts)
        flat = np.repeat(starts, counts) + ramp
        return pa.table({"node": pa.array(uniq_n[flat]),
                         "ancestor": pa.array(uniq_a[flat]),
                         "depth": pa.array(uniq_d[flat])})

    return ds.map_batches(walk, batch_format="pyarrow")


def subtree_rollup(ds, csr_ref, *, node_col: str = "doc_id",
                   value_col: str = "n_chars", max_depth: int = 64,
                   shards: int = 32):
    """Hierarchical rollup: every row's value is added to its own node
    AND every ancestor; returns (node, subtree_value, n_desc) — the
    classic "aggregate the corpus up the ontology" step.

    Map-side closure walk (broadcast CSR, no exchange) + per-batch
    partial sums keyed by ancestor, then ONE salted exchange bounded by
    (ancestor support × shards), never by corpus rows.
    """
    import ray as _ray

    def partial(batch: pa.Table) -> pa.Table:
        csr = csr_ref if isinstance(csr_ref, ParentCSR) else _ray.get(csr_ref)
        nodes = batch.column(node_col).to_numpy()
        vals = batch.column(value_col).to_numpy().astype(np.int64)
        n, a, _ = _closure_for_batch(nodes, csr, max_depth, include_self=True)
        # map each closure row's origin node back to batch rows (values
        # may repeat per node if ids duplicate — handled by summing per
        # node first)
        order = np.argsort(nodes, kind="stable")
        snodes = nodes[order]
        uniq, starts = np.unique(snodes, return_index=True)
        node_sum = np.add.reduceat(vals[order], starts)
        node_cnt = np.diff(np.concatenate([starts, [len(snodes)]]))
        ui = np.searchsorted(uniq, n)
        contrib = node_sum[ui]
        cnt = node_cnt[ui]
        df = pd.DataFrame({"node": a, "v": contrib, "c": cnt})
        g = df.groupby("node", sort=False, as_index=False).sum()
        salt = (hash64_column(pa.array(g["node"].to_numpy()))
                % np.uint64(shards)).astype(np.int32)
        return pa.table({"node": pa.array(g["node"].to_numpy()),
                         "v": pa.array(g["v"].to_numpy()),
                         "c": pa.array(g["c"].to_numpy()),
                         "__s": pa.array(salt)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("node", sort=True, as_index=False)[["v", "c"]].sum()
        return g.rename(columns={"v": "subtree_value", "c": "n_desc"})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__s")
              .map_groups(combine, batch_format="pandas"))


# --------------------------------------------------------- co-occurrence


def cooccur_edges(ds, *, text_column: str = "text", min_count: int = 1,
                  vocab: list[str] | None = None, shards: int = 32):
    """Within-document token co-occurrence edges: for every unordered
    pair of DISTINCT tokens appearing in the same document, count the
    documents containing both — the weighted edge list corpus-driven KG
    construction starts from (feed counts to PMI / node2vec downstream).

    Per batch: one Arrow lower+split pass, per-document distinct-token
    sets (sorted, so pairs come out canonically ordered tok_a < tok_b),
    pair expansion via the repeat/cumsum all-pairs index, and an
    IN-BATCH pre-aggregation so the single salted exchange ships each
    batch's distinct pairs once — bounded by (batch vocabulary)², not by
    corpus rows.  Pass ``vocab`` (allow-list, e.g. the top-k from
    :func:`~biocurator_mapper_ray.ops.textstats.word_counts`) to bound
    the per-document set size on open-vocabulary corpora.
    """
    vocab_arr = np.sort(np.asarray(vocab, dtype=object)) if vocab else None

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.cast(batch.column(text_column), pa.string())),
            r"\s+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        if vocab_arr is not None and len(flat):
            pos = np.minimum(np.searchsorted(vocab_arr, flat),
                             len(vocab_arr) - 1)
            keep &= vocab_arr[pos] == flat
        flat, doc = flat[keep], doc[keep]
        if not len(flat):
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int32())})
        # distinct (doc, token), token-sorted within doc: lexsort puts
        # each doc's tokens in order, unique on packed keys dedups
        order = np.lexsort((flat, doc))
        doc, flat = doc[order], flat[order]
        dup = np.zeros(len(doc), dtype=bool)
        dup[1:] = (doc[1:] == doc[:-1]) & (flat[1:] == flat[:-1])
        doc, flat = doc[~dup], flat[~dup]
        sizes = np.bincount(doc, minlength=int(doc.max()) + 1 if len(doc) else 0)
        sizes = sizes[sizes > 0]
        ia, ib = _allpairs_index(sizes)
        df = pd.DataFrame({"tok_a": flat[ia], "tok_b": flat[ib]})
        g = df.groupby(["tok_a", "tok_b"], sort=False, as_index=False).size()
        if not len(g):  # all docs < 2 distinct tokens — typed empty
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "__s": pa.array([], pa.int32())})
        key = np.char.add(g["tok_a"].to_numpy().astype(str),
                          g["tok_b"].to_numpy().astype(str))
        salt = (hash64_column(pa.array(key)) % np.uint64(shards)).astype(np.int32)
        return pa.table({"tok_a": pa.array(g["tok_a"]),
                         "tok_b": pa.array(g["tok_b"]),
                         "n_docs": pa.array(g["size"].to_numpy()),
                         "__s": pa.array(salt)})

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["tok_a", "tok_b"], sort=True,
                          as_index=False)["n_docs"].sum()
        return g[g["n_docs"] >= min_count]

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__s")
              .map_groups(combine, batch_format="pandas"))


def pagerank(edges, *, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 10,
             buckets: int | None = None, mode: str = "pinned"):
    """Distributed PageRank over an edge list — the canonical iterative
    graph rank (link-quality weighting for web corpora, centrality over
    the co-occurrence KG).

    Fully distributed: edge shards and rank shards live in the object
    store; the driver holds only refs and two scalars (N, the
    per-iteration dangling mass).  The update is the standard
    ``r' = (1-d)/N + d·(Σ_in contrib + dangling_mass/N)``.

    Two execution modes (the custom-operator rule of SURVEY §2 —
    iterative fixpoints are the one shape Ray Data's dataflow cannot
    express without re-shuffling static state every round):

    * ``mode='pinned'`` (default): the edge table is exchanged ONCE
      into S src-hash buckets pinned in the object store; each
      iteration is 2·S raw Ray tasks — bucket b joins its edges to
      rank shard b map-side (same hash ⇒ the srcs it needs are exactly
      shard b) and emits per-dst-shard partial sums; shard b' folds its
      S incoming pieces.  No sort, no edge movement, node-scale traffic
      only.  The S×S piece matrix caps S (≤ 64 here), so one bucket
      holds edges/S rows — fine up to ~10⁹-edge graphs per job; beyond
      that use ``mode='shuffle'``.
    * ``mode='shuffle'``: pure Ray Data — per iteration one salted
      union exchange colocating edges with their source's rank (with
      an in-bucket per-destination combiner) and one destination
      groupby fold.  Re-ships edges every iteration but has no S×S
      term: the unbounded-scale path.

    Returns (node, rank float64).  Rows-only semantics (iterative float
    sums are summation-order-dependent; pinned by planted-graph tests
    asserting numpy power-iteration parity to 1e-12).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    from ..functions.hashing import hash64_column
    from .join import derive_buckets, hash_join

    if mode not in ("pinned", "shuffle"):
        raise ValueError(f"unknown pagerank mode {mode!r}")

    n_edges = edges.count()
    B = buckets if buckets is not None else derive_buckets(n_edges)

    lean = edges.map_batches(
        lambda t: t.select([src, dst]).rename_columns(["__src", "__dst"]),
        batch_format="pyarrow")

    # ONE exchange yields nodes, out-degree and the dangling flag at
    # once: each batch emits (node, out-count partial) for srcs and
    # (node, 0) for dsts; after the sum, deg==0 ⇔ the node never
    # appears as a source ⇔ dangling.
    def node_partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column("__src").combine_chunks()
        dsts = batch.column("__dst").combine_chunks()
        t = pa.table({
            "node": pa.concat_arrays([srcs, dsts]),
            "__c": pa.array(np.concatenate([
                np.ones(len(srcs), dtype=np.int64),
                np.zeros(len(dsts), dtype=np.int64)])),
        })
        return t.group_by(["node"]).aggregate([("__c", "sum")]) \
                .rename_columns(["node", "__c"])

    node_deg = lean.map_batches(node_partial, batch_format="pyarrow") \
                   .groupby("node").sum("__c") \
                   .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                                batch_format="pyarrow").materialize()
    n_nodes = node_deg.count()
    if n_nodes == 0:
        return node_deg.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pa.nulls(len(t), pa.float64())}),
            batch_format="pyarrow")

    out_deg = node_deg.map_batches(
        lambda t: t.filter(pc.greater(t.column("deg"), 0)),
        batch_format="pyarrow")

    # dangling flag falls straight out of node_deg — no join needed
    r0 = 1.0 / float(n_nodes)

    if mode == "pinned":
        return _pagerank_pinned(lean, node_deg, n_nodes, damping, iters,
                                buckets)

    # edges weighted by 1/out_deg, pre-tagged with the source's bucket
    def weigh(batch: pa.Table) -> pa.Table:
        w = pc.divide(1.0, pc.cast(batch.column("deg"), pa.float64()))
        kb = (hash64_column(batch.column("__src"))
              % np.uint64(B)).astype(np.int32)
        return pa.table({
            "key": batch.column("__src"),
            "dst": batch.column("__dst"),
            "w": w,
            "r": pa.nulls(len(batch), pa.float64()),
            "__side": pa.array(np.zeros(len(batch), dtype=np.int8)),
            "__kb": pa.array(kb),
        })

    edges_w = hash_join(lean, out_deg, "__src", "node",
                        right_columns=["node", "deg"]) \
        .map_batches(weigh, batch_format="pyarrow").materialize()

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "dang": pc.cast(pc.equal(batch.column("deg"), 0), pa.int8()),
            "rank": pa.array(np.full(len(batch), r0, dtype=np.float64)),
        })

    ranks = node_deg.map_batches(init_ranks,
                                 batch_format="pyarrow").materialize()

    def tag_ranks(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field("node").type
        kb = (hash64_column(batch.column("node"))
              % np.uint64(B)).astype(np.int32)
        return pa.table({
            "key": batch.column("node"),
            "dst": pa.nulls(len(batch), key_type),
            "w": pa.nulls(len(batch), pa.float64()),
            "r": batch.column("rank"),
            "__side": pa.array(np.ones(len(batch), dtype=np.int8)),
            "__kb": pa.array(kb),
        })

    def contrib_bucket(g: pd.DataFrame) -> pa.Table:
        key_type = (pa.string() if g["key"].dtype == object
                    else pa.from_numpy_dtype(g["key"].dtype))
        empty = pa.table({"node": pa.array([], key_type),
                          "c": pa.array([], pa.float64()),
                          "dang": pa.array([], pa.int8())})
        e = g[g["__side"] == 0]
        if e.empty:
            return empty
        rmap = g.loc[g["__side"] == 1].set_index("key")["r"]
        r = e["key"].map(rmap).to_numpy(dtype=np.float64)
        out = pd.DataFrame({"node": e["dst"].to_numpy(),
                            "c": r * e["w"].to_numpy(dtype=np.float64)})
        out = out.groupby("node", sort=False)["c"].sum().reset_index()
        return pa.table({"node": pa.array(out["node"].to_numpy(), key_type),
                         "c": pa.array(out["c"].to_numpy(), pa.float64()),
                         "dang": pa.array(
                             np.zeros(len(out), dtype=np.int8))})

    for _ in range(iters):
        dang_mass = ranks.map_batches(
            lambda t: t.filter(pc.equal(t.column("dang"), 1))
                       .select(["rank"]),
            batch_format="pyarrow").sum("rank") or 0.0
        base = (1.0 - damping) / n_nodes \
            + damping * dang_mass / n_nodes
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        contribs = edges_w.union(tagged).groupby("__kb").map_groups(
            lambda g: contrib_bucket(g.drop(columns="__kb")),
            batch_format="pandas")
        zeros = ranks.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "c": pa.array(np.zeros(len(t), dtype=np.float64)),
                "dang": t.column("dang")}),
            batch_format="pyarrow")
        folded = contribs.union(zeros).groupby("node") \
            .aggregate(_Sum("c"), _Max("dang"))
        ranks = folded.map_batches(
            lambda t, _b=base: pa.table({
                "node": t.column("node"),
                "dang": pc.cast(t.column("max(dang)"), pa.int8()),
                "rank": pc.add(_b, pc.multiply(
                    damping, pc.cast(t.column("sum(c)"), pa.float64()))),
            }),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")


def _pagerank_pinned(lean, node_deg, n_nodes: int, damping: float,
                     iters: int, buckets: int | None):
    """The pinned-shard PageRank loop (see :func:`pagerank`).

    One exchange builds S edge buckets (by hash(src) % S, weights
    precomputed, dst shard pre-tagged) and S rank shards (by
    hash(node) % S) as object-store refs; each iteration is S contrib
    tasks + S fold tasks.  The driver touches refs and S dangling-mass
    partials only — never edge- or node-scale data."""
    import ray

    from ..functions.hashing import hash64_column
    from .join import derive_buckets, hash_join

    n_edges = lean.count()
    # S² contrib pieces per iteration caps S; one bucket holds ~edges/S
    S = buckets if buckets is not None else min(64, derive_buckets(n_edges))
    S = max(1, S)

    out_deg = node_deg.map_batches(
        lambda t: t.filter(pc.greater(t.column("deg"), 0)),
        batch_format="pyarrow")

    def tag_edges(batch: pa.Table) -> pa.Table:
        w = pc.divide(1.0, pc.cast(batch.column("deg"), pa.float64()))
        skb = (hash64_column(batch.column("__src"))
               % np.uint64(S)).astype(np.int32)
        dkb = (hash64_column(batch.column("__dst"))
               % np.uint64(S)).astype(np.int32)
        return pa.table({"src": batch.column("__src"),
                         "dst": batch.column("__dst"), "w": w,
                         "skb": pa.array(skb), "dkb": pa.array(dkb)})

    tagged = hash_join(lean, out_deg, "__src", "node",
                       right_columns=["node", "deg"]) \
        .map_batches(tag_edges, batch_format="pyarrow").materialize()

    def tag_nodes(batch: pa.Table) -> pa.Table:
        kb = (hash64_column(batch.column("node"))
              % np.uint64(S)).astype(np.int32)
        return pa.table({
            "node": batch.column("node"),
            "dang": pc.cast(pc.equal(batch.column("deg"), 0), pa.int8()),
            "nkb": pa.array(kb)})

    nodes_t = node_deg.map_batches(tag_nodes,
                                   batch_format="pyarrow").materialize()

    @ray.remote
    def split_block(tbl: pa.Table, col: str, n: int):
        # 0-row blocks can arrive with an ERASED schema (Ray drops the
        # schema of empty map outputs) — nothing to route either way
        if tbl is None or len(tbl) == 0 or col not in tbl.schema.names:
            return [None] * n if n > 1 else None
        out = []
        kb = tbl.column(col).to_numpy(zero_copy_only=False)
        for s in range(n):
            m = kb == s
            out.append(tbl.filter(pa.array(m)) if m.any() else None)
        return out if n > 1 else out[0]

    @ray.remote
    def assemble(*pieces):
        tbls = [p for p in pieces if p is not None]
        return pa.concat_tables(tbls) if tbls else None

    def exchange(ds, col):
        refs = ds.to_arrow_refs()
        if S == 1:
            return [assemble.remote(*refs)]
        # num_returns=S scatters each block's pieces into per-bucket
        # refs directly — no indexing hop, no whole-list fetches
        piece_refs = [split_block.options(num_returns=S).remote(r, col, S)
                      for r in refs]
        return [assemble.remote(*[pr[s] for pr in piece_refs])
                for s in range(S)]

    edge_buckets = exchange(tagged, "skb")
    node_shards = exchange(nodes_t, "nkb")

    r0 = 1.0 / float(n_nodes)

    @ray.remote(num_returns=3)
    def init_shard(nodes):
        if nodes is None:
            return None, 0.0, 0
        rank = np.full(len(nodes), r0, dtype=np.float64)
        dang = nodes.column("dang").to_numpy(zero_copy_only=False)
        shard = pa.table({"node": nodes.column("node"),
                          "dang": nodes.column("dang"),
                          "rank": pa.array(rank)})
        return shard, float(rank[dang == 1].sum()), len(nodes)

    inits = [init_shard.remote(ns) for ns in node_shards]
    shards = [i[0] for i in inits]
    dang_mass = float(sum(ray.get([i[1] for i in inits])))
    # a bucket with zero nodes stays empty forever — drop it from the
    # final assembly so a None shard can't poison the schema union
    live = [n > 0 for n in ray.get([i[2] for i in inits])]

    @ray.remote
    def contrib(edges_tbl, shard, n):
        if edges_tbl is None or shard is None or len(edges_tbl) == 0:
            return [None] * n if n > 1 else None
        rmap = pd.Series(shard.column("rank").to_numpy(),
                         index=shard.column("node").to_numpy(
                             zero_copy_only=False))
        r = pd.Series(edges_tbl.column("src").to_numpy(
            zero_copy_only=False)).map(rmap).to_numpy(np.float64)
        c = r * edges_tbl.column("w").to_numpy()
        df = pd.DataFrame({
            "dkb": edges_tbl.column("dkb").to_numpy(),
            "node": edges_tbl.column("dst").to_numpy(zero_copy_only=False),
            "c": c,
        }).groupby(["dkb", "node"], sort=False)["c"].sum().reset_index()
        out = [None] * n
        for kb, sub in df.groupby("dkb", sort=False):
            out[int(kb)] = pa.table({
                "node": pa.array(sub["node"].to_numpy()),
                "c": pa.array(sub["c"].to_numpy(), pa.float64())})
        return out if n > 1 else out[0]

    @ray.remote(num_returns=2)
    def fold(shard, base, d, *pieces):
        if shard is None:
            return None, 0.0
        idx = pd.Index(shard.column("node").to_numpy(zero_copy_only=False))
        sums = np.zeros(len(idx), dtype=np.float64)
        for p in pieces:
            if p is None:
                continue
            pos = idx.get_indexer(p.column("node").to_numpy(
                zero_copy_only=False))
            if (pos < 0).any():  # would silently scatter to index -1
                raise RuntimeError(
                    "pagerank: destination node missing from its rank "
                    "shard — src/dst bucketing hashes disagree")
            np.add.at(sums, pos, p.column("c").to_numpy())
        rank = base + d * sums
        dang = shard.column("dang").to_numpy(zero_copy_only=False)
        new = pa.table({"node": shard.column("node"),
                        "dang": shard.column("dang"),
                        "rank": pa.array(rank)})
        return new, float(rank[dang == 1].sum())

    for _ in range(iters):
        base = (1.0 - damping) / n_nodes \
            + damping * dang_mass / n_nodes
        if S > 1:
            contrib_refs = [
                contrib.options(num_returns=S).remote(
                    edge_buckets[s], shards[s], S)
                for s in range(S)]
            piece = [[cr[b] for cr in contrib_refs] for b in range(S)]
        else:
            piece = [[contrib.remote(edge_buckets[0], shards[0], S)]]
        folds = [fold.remote(shards[b], base, damping, *piece[b])
                 for b in range(S)]
        shards = [f[0] for f in folds]
        dang_mass = float(sum(ray.get([f[1] for f in folds])))

    import ray.data as rd

    @ray.remote
    def project(shard):
        return shard.select(["node", "rank"])

    return rd.from_arrow_refs(
        [project.remote(s) for s, ok in zip(shards, live) if ok])


# ------------------------------------------------- edge-set primitives


def _pair_hash(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Mixed 64-bit hash of an int node pair (vectorized, no strings)."""
    P = np.uint64(0x9E3779B97F4A7C15)
    h = u.astype(np.uint64) * P ^ (v.astype(np.uint64) + P)
    h ^= h >> np.uint64(33)
    return h * P


def distinct_edges(edges, *, src: str = "src", dst: str = "dst",
                   buckets: int = 64):
    """Canonical distinct undirected edge set: self-loops dropped, each
    edge emitted once as ``(u, v)`` with ``u < v``.

    One pass map-side canonicalize + IN-BATCH dedup (lexsort on the
    packed pair), then ONE hash-of-pair bucket exchange with a
    per-bucket final dedup — the exchange ships each batch's distinct
    pairs, never the raw multiplicity.  This is the normalization step
    every undirected-graph analytics pass (degree stats, triangle
    counting, clustering coefficient) starts from.
    """
    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        u, v = np.minimum(a, b), np.maximum(a, b)
        # in-batch distinct via lexsort + neighbor compare
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        if len(u):
            first = np.ones(len(u), dtype=bool)
            first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
            u, v = u[first], v[first]
        bkt = (_pair_hash(u, v) % np.uint64(buckets)).astype(np.int32)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "__b": pa.array(bkt)})

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(["u", "v"])[["u", "v"]]
        return out

    return (edges.map_batches(canon, batch_format="pyarrow")
                 .groupby("__b")
                 .map_groups(dedup_bucket, batch_format="pandas"))


def node_degrees(canon, *, buckets: int = 64):
    """Per-node degree over a canonical distinct edge set
    (:func:`distinct_edges` output) — map-side partial counts per batch
    (both endpoints), one node-hash exchange, per-bucket final sum.
    Returns a Dataset of ``(node:int64, deg:int64)``.
    """
    from ..functions.hashing import hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        nodes, cnt = np.unique(np.concatenate([u, v]), return_counts=True)
        bkt = (hash64_column(pa.array(nodes)) % np.uint64(buckets)) \
            .astype(np.int32)
        return pa.table({"node": pa.array(nodes),
                         "c": pa.array(cnt.astype(np.int64)),
                         "__b": pa.array(bkt)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", sort=False, as_index=False)["c"].sum()
        return out.rename(columns={"c": "deg"})

    return (canon.map_batches(partial, batch_format="pyarrow")
                 .groupby("__b")
                 .map_groups(fold, batch_format="pandas"))


def degree_histogram(edges, *, src: str = "src", dst: str = "dst",
                     buckets: int = 64):
    """Degree distribution of the undirected graph: ``(degree,
    n_nodes)`` — the first diagnostic of any web/citation/co-occurrence
    graph (power-law check, hub detection before a pagerank run).

    Composition: :func:`distinct_edges` (one pair exchange) →
    :func:`node_degrees` (one node exchange; a node's rows are complete
    inside its bucket, so the bucket's ``deg → n_nodes`` histogram is a
    valid PARTIAL) → one tiny ``groupby(degree)`` over per-bucket
    histogram rows, never node-scale data.
    """
    from ray.data.aggregate import Sum

    deg = node_degrees(distinct_edges(edges, src=src, dst=dst,
                                      buckets=buckets), buckets=buckets)

    def hist(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        degs, cnt = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(degs.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    out = (deg.map_batches(hist, batch_format="pyarrow")
              .groupby("degree").aggregate(Sum("n", alias_name="n_nodes")))
    return out


def triangle_count(edges, *, src: str = "src", dst: str = "dst",
                   buckets: int = 64):
    """Exact triangle count of the undirected graph — the classic
    compact-forward / degree-orientation algorithm, fully distributed.

    Stages (every exchange is hash-bucketed, nothing node- or
    edge-scale ever lands on the driver):

    1. :func:`distinct_edges` — canonical distinct ``(u < v)`` set.
    2. :func:`node_degrees` + two bucketed :func:`~.join.hash_join`
       passes decorate each edge with both endpoint degrees.
    3. Orient each edge low→high by ``(deg, id)``: out-degrees are then
       bounded by O(√m), so the wedge expansion below is O(m^{3/2})
       TOTAL regardless of hubs — the skew story for power-law graphs
       (a 10⁸-degree hub never enumerates its neighbor pairs; its
       edges all point INTO it).
    4. Wedges: bucket oriented edges by hash(tail); within a bucket
       every tail's out-list is complete, so the repeat/cumsum
       all-pairs index (``_allpairs_index``) emits each wedge once,
       pre-aggregated to ``(pair → wedge_count)`` before the exchange.
    5. Close: wedge pairs ⋈ canonical edges on the pair hash — a
       semi-join counting wedges whose closing edge exists; per-bucket
       partial sums, then a scalar fold.

    Returns the total as a 1-row pandas DataFrame ``{"triangles": n}``.
    """
    from .join import hash_join

    # canon feeds the degree fold, the degree joins AND the closing
    # edge probe; deg feeds two joins — materialize both or each lazy
    # consumer re-executes the distinct_edges exchange from scratch
    canon = distinct_edges(edges, src=src, dst=dst,
                           buckets=buckets).materialize()
    deg = node_degrees(canon, buckets=buckets).materialize()

    i64 = {"u": "int64", "v": "int64", "node": "int64", "deg": "int64"}
    ju = hash_join(canon, deg, "u", "node",
                   right_columns=["node", "deg"],
                   left_dtypes={k: i64[k] for k in ("u", "v")},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)
    ju = ju.map_batches(
        lambda t: t.select(["u", "v", "deg"]).rename_columns(
            ["u", "v", "du"]),
        batch_format="pyarrow")
    jv = hash_join(ju, deg, "v", "node",
                   left_columns=["u", "v", "du"],
                   right_columns=["node", "deg"],
                   left_dtypes={"u": "int64", "v": "int64", "du": "int64"},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)

    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("deg").to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        h = _pair_hash(a, np.zeros_like(a)) % np.uint64(buckets)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "__b": pa.array(h.astype(np.int32))})

    oriented = jv.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.ones(len(a), dtype=bool)
        starts[1:] = a[1:] != a[:-1]
        sizes = np.diff(np.append(np.nonzero(starts)[0], len(a)))
        ia, ib = _allpairs_index(sizes)
        if not len(ia):
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "wc": pd.Series([], dtype="int64")})
        x = np.minimum(b[ia], b[ib])
        y = np.maximum(b[ia], b[ib])
        df = pd.DataFrame({"x": x, "y": y})
        out = df.groupby(["x", "y"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "wc"})

    wedge_ds = oriented.groupby("__b").map_groups(
        wedges, batch_format="pandas")

    def tag_wedge(batch: pa.Table) -> pa.Table:
        h = _pair_hash(batch.column("x").to_numpy(zero_copy_only=False),
                       batch.column("y").to_numpy(zero_copy_only=False))
        return pa.table({"x": batch.column("x"), "y": batch.column("y"),
                         "wc": batch.column("wc"),
                         "__side": pa.array(
                             np.zeros(len(batch), dtype=np.int8)),
                         "__e": pa.array(
                             (h % np.uint64(buckets)).astype(np.int32))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        h = _pair_hash(u, v)
        return pa.table({"x": pa.array(u), "y": pa.array(v),
                         "wc": pa.array(np.zeros(len(u), dtype=np.int64)),
                         "__side": pa.array(np.ones(len(u), dtype=np.int8)),
                         "__e": pa.array(
                             (h % np.uint64(buckets)).astype(np.int32))})

    both = wedge_ds.map_batches(tag_wedge, batch_format="pyarrow").union(
        canon.map_batches(tag_edge, batch_format="pyarrow"))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["__side"] == 0]
        e = g[g["__side"] == 1][["x", "y"]]
        if w.empty or e.empty:
            return pd.DataFrame({"t": pd.Series([0], dtype="int64")})
        m = w.merge(e, on=["x", "y"], how="inner")
        return pd.DataFrame({"t": pd.Series([int(m["wc"].sum())],
                                            dtype="int64")})

    parts = both.groupby("__e").map_groups(close, batch_format="pandas")
    total = int(parts.to_pandas()["t"].sum())
    return pd.DataFrame({"triangles": pd.Series([total], dtype="int64")})


def grouped_pair_counts(ds, *, group_col: str, item_col: str,
                        min_count: int = 1, buckets: int = 64,
                        shards: int = 32):
    """Market-basket pair counting: for every unordered pair of DISTINCT
    items appearing in the same group, the number of groups containing
    both — :func:`cooccur_edges` generalized from within-row token sets
    to a (group, item) column pair whose groups SPAN rows and batches.

    Two bounded exchanges: (1) hash(group) co-locates each group, the
    bucket task dedups (group, item), sorts, and expands pairs with the
    repeat/cumsum all-pairs index, pre-aggregating ``pair → count``
    inside the bucket; (2) a salted pair exchange sums bucket partials.
    The pair space is bounded by (distinct items per group)² — cap the
    item domain upstream (e.g. map SKUs to brands/categories) exactly
    like ``cooccur_edges``'s ``vocab`` allow-list.
    """
    from ..functions.hashing import hash64_column

    def tag(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column(group_col)) % np.uint64(buckets)
        return pa.table({
            "g": batch.column(group_col),
            "i": pc.cast(batch.column(item_col), pa.string()),
            "__b": pa.array(h.astype(np.int32))})

    def expand(grp: pd.DataFrame) -> pd.DataFrame:
        d = grp[["g", "i"]].drop_duplicates()
        d = d.sort_values(["g", "i"], kind="stable")
        sizes = d.groupby("g", sort=False).size().to_numpy()
        ia, ib = _allpairs_index(sizes)
        items = d["i"].to_numpy()
        if not len(ia):
            return pd.DataFrame({
                "item_a": pd.Series([], dtype="object"),
                "item_b": pd.Series([], dtype="object"),
                "n_groups": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"item_a": items[ia], "item_b": items[ib]})
        out = df.groupby(["item_a", "item_b"], sort=False,
                         as_index=False).size()
        return out.rename(columns={"size": "n_groups"})

    pairs = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("__b").map_groups(expand, batch_format="pandas"))

    def salt(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(batch.column("item_a"), pa.string()),
            pc.cast(batch.column("item_b"), pa.string()), "\x1f")
        s = hash64_column(key) % np.uint64(shards)
        return batch.append_column("__s", pa.array(s.astype(np.int32)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["item_a", "item_b"], sort=True,
                        as_index=False)["n_groups"].sum()
        return out[out["n_groups"] >= min_count]

    return (pairs.map_batches(salt, batch_format="pyarrow")
                 .groupby("__s").map_groups(combine, batch_format="pandas"))


def common_neighbors(edges, *, src: str = "src", dst: str = "dst",
                     min_count: int = 1, max_degree: int | None = None,
                     buckets: int = 64, shards: int = 32):
    """Common-neighbor counts for every node pair sharing ≥
    ``min_count`` neighbors — the basic link-prediction / node-
    similarity primitive (the numerator of Jaccard / Adamic-Adar).

    Composition: :func:`distinct_edges` canonicalizes, each edge is
    expanded to both ``(center, neighbor)`` directions, ONE
    hash(center) exchange co-locates every center's full adjacency,
    and the bucket task expands neighbor pairs with the repeat/cumsum
    all-pairs index, pre-aggregated to ``pair → count`` before a salted
    pair exchange folds partials.

    A center of degree d emits d·(d−1)/2 pairs, so hubs are quadratic —
    the standard mitigation is ``max_degree``: a center's adjacency is
    COMPLETE inside its bucket, so the cap is an exact in-bucket filter
    (drop hub centers before expansion), mirroring the SQL
    ``HAVING count(*) <= cap`` per-center semantics.  At web scale pass
    a cap (top-degree hubs carry no link-prediction signal anyway).
    """
    canon = distinct_edges(edges, src=src, dst=dst, buckets=buckets)

    def bidir(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        c = np.concatenate([u, v])
        n = np.concatenate([v, u])
        bkt = (_pair_hash(c, np.zeros_like(c)) % np.uint64(buckets)) \
            .astype(np.int32)
        return pa.table({"c": pa.array(c), "n": pa.array(n),
                         "__b": pa.array(bkt)})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((n, c))
        c, n = c[order], n[order]
        starts = np.ones(len(c), dtype=bool)
        starts[1:] = c[1:] != c[:-1]
        sizes = np.diff(np.append(np.nonzero(starts)[0], len(c)))
        if max_degree is not None:
            keep = np.repeat(sizes <= max_degree, sizes)
            c, n = c[keep], n[keep]
            sizes = sizes[sizes <= max_degree]
        ia, ib = _allpairs_index(sizes)
        if not len(ia):
            return pd.DataFrame({"node_a": pd.Series([], dtype="int64"),
                                 "node_b": pd.Series([], dtype="int64"),
                                 "n_common": pd.Series([], dtype="int64")})
        x = np.minimum(n[ia], n[ib])
        y = np.maximum(n[ia], n[ib])
        df = pd.DataFrame({"node_a": x, "node_b": y})
        out = df.groupby(["node_a", "node_b"], sort=False,
                         as_index=False).size()
        return out.rename(columns={"size": "n_common"})

    pairs = (canon.map_batches(bidir, batch_format="pyarrow")
                  .groupby("__b").map_groups(expand, batch_format="pandas"))

    def salt(batch: pa.Table) -> pa.Table:
        h = _pair_hash(batch.column("node_a").to_numpy(zero_copy_only=False),
                       batch.column("node_b").to_numpy(zero_copy_only=False))
        return batch.append_column(
            "__s", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["node_a", "node_b"], sort=True,
                        as_index=False)["n_common"].sum()
        return out[out["n_common"] >= min_count]

    return (pairs.map_batches(salt, batch_format="pyarrow")
                 .groupby("__s").map_groups(fold, batch_format="pandas"))


def k_core(edges, k: int, *, src: str = "src", dst: str = "dst",
           max_iters: int = 50):
    """Nodes of the undirected k-core: iteratively peel nodes whose
    CURRENT degree is below ``k`` until a fixpoint (Seidman 1983) — the
    standard link-graph quality filter (spam rings and orphan pages
    fall out of low cores; the dense core survives).

    Input: a distinct undirected edge set (one (u, v) row per edge,
    e.g. :func:`distinct_edges` output).  Per round: ONE degree
    exchange (per-batch endpoint-count partials → groupby sum), the
    round's peeled nodes broadcast back (``ray.put``) and the edge set
    filters map-side.  The edge Dataset shrinks monotonically and is
    re-materialized per round, so each round's exchange is over the
    SURVIVING edges only.  Broadcast note: the round-1 peel can be
    node-scale on sparse graphs (8 B/node as a sorted uint64 array);
    at 10^10-node scale replace the broadcast with a bucketed semi-join
    on both endpoints — same fixpoint, two exchanges per round.

    Returns a Dataset of (node,) rows — the k-core membership.
    Converges in O(peeling depth) rounds; raises after ``max_iters``
    (a real graph's peel depth is far below 50).
    """
    import ray as _ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cur = edges.select_columns([src, dst]).materialize()
    for _ in range(max_iters):
        if cur.count() == 0:
            return rd.from_arrow(pa.table({"node": pa.array([],
                                                            pa.int64())}))

        def deg_part(batch: pa.Table) -> pa.Table:
            ends = np.concatenate([
                batch.column(src).to_numpy(zero_copy_only=False),
                batch.column(dst).to_numpy(zero_copy_only=False),
            ]).astype(np.int64)
            node, c = np.unique(ends, return_counts=True)
            return pa.table({"node": pa.array(node),
                             "c": pa.array(c.astype(np.int64))})

        deg = (cur.map_batches(deg_part, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("c", alias_name="deg"))
               .to_pandas())  # node-scale driver frame: see broadcast note
        drop = np.sort(deg.loc[deg["deg"] < k, "node"]
                       .to_numpy(dtype=np.int64))
        if len(drop) == 0:
            keep = pa.array(np.sort(deg["node"].to_numpy(dtype=np.int64)))
            return rd.from_arrow(pa.table({"node": keep}))
        drop_ref = _ray.put(drop)

        def peel(batch: pa.Table, ref=None) -> pa.Table:
            d = ref if isinstance(ref, np.ndarray) else _ray.get(ref)
            u = batch.column(src).to_numpy(zero_copy_only=False)
            v = batch.column(dst).to_numpy(zero_copy_only=False)
            bad = np.isin(u, d) | np.isin(v, d)
            return batch.filter(pa.array(~bad))

        cur = cur.map_batches(peel, fn_kwargs={"ref": drop_ref},
                              batch_format="pyarrow").materialize()
    raise RuntimeError(f"k_core did not converge in {max_iters} rounds")


def label_propagation(edges, *, src: str = "src", dst: str = "dst",
                      rounds: int = 5, shards: int = 64):
    """Deterministic SYNCHRONOUS label propagation (Raghavan et al.
    2007): every node starts as its own label; each round every node
    adopts the most frequent label among its neighbors (ties → smallest
    label), all nodes updating simultaneously for ``rounds`` rounds —
    the cheap community detector for near-dup cluster grouping and
    link-farm discovery where connected components are too coarse.

    Input: distinct undirected (u, v) edges.  Per round: labels ride ON
    the edge endpoints through ONE src-hash bucketed exchange — inside
    each bucket the (neighbor→label) vote count and argmax are
    vectorized pandas groupbys; node-label state is a Dataset, never
    driver-resident.  Synchronous + total tie-break ⇒ reproducible
    (async LPA is run-order-dependent; bipartite structures may
    oscillate, which bounded ``rounds`` absorbs).

    Returns (node, label) — label = the elected community id.
    """
    from ray.data.aggregate import Min

    both = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([
                b.column(dst).combine_chunks().cast(pa.int64()),
                b.column(src).combine_chunks().cast(pa.int64())]),
            "nbr": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.int64()),
                b.column(dst).combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow").materialize()

    # state: (node, label), initialized to identity
    labels = both.groupby("node").aggregate(
        Min("node", alias_name="label")).materialize()

    def _kb(b: pa.Table, col: str) -> pa.Table:
        h = hash64_column(b.column(col))
        return b.append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    for _ in range(rounds):
        # one aligned-schema union keyed by NEIGHBOR (the label owner):
        # adjacency rows carry label=null, label rows carry node=null
        adj = both.map_batches(
            lambda b: _kb(pa.table({
                "node": b.column("node"), "nbr": b.column("nbr"),
                "label": pa.nulls(len(b), pa.int64())}), "nbr"),
            batch_format="pyarrow")
        lab = labels.map_batches(
            lambda b: _kb(pa.table({
                "node": pa.nulls(len(b), pa.int64()),
                "nbr": b.column("node"),
                "label": b.column("label")}), "nbr"),
            batch_format="pyarrow")

        def vote(g: pd.DataFrame) -> pa.Table:
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "label": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})
            g = g.drop(columns="__kb")
            left = g.loc[g["label"].isna(), ["node", "nbr"]]
            right = g.loc[g["node"].isna(), ["nbr", "label"]]
            if left.empty or right.empty:
                return empty
            m = left.merge(right, on="nbr")
            cnt = (m.groupby(["node", "label"], as_index=False)
                   .size().rename(columns={"size": "c"}))
            return pa.table({
                "node": pa.array(cnt["node"].to_numpy(np.int64)),
                "label": pa.array(cnt["label"].to_numpy(np.int64)),
                "c": pa.array(cnt["c"].to_numpy(np.int64))})

        votes = (adj.union(lab)
                 .groupby("__kb").map_groups(vote, batch_format="pandas"))

        def elect(g: pd.DataFrame) -> pd.DataFrame:
            # vote counts arrive PARTIAL (one row per nbr-hash bucket a
            # neighbor landed in) — sum before the argmax or multi-bucket
            # majorities collapse to all-ones ties
            g = g.groupby(["node", "label"], as_index=False)["c"].sum()
            g = g.sort_values(["node", "c", "label"],
                              ascending=[True, False, True],
                              kind="mergesort")
            return g.drop_duplicates("node")[["node", "label"]]

        def tag_node(b: pa.Table) -> pa.Table:
            h = hash64_column(b.column("node"))
            return b.append_column(
                "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

        # block-count cap (see betweenness_from_seeds)
        labels = (votes.map_batches(tag_node, batch_format="pyarrow")
                  .groupby("__kb").map_groups(
                      lambda g: elect(g.drop(columns="__kb")),
                      batch_format="pandas")
                  .repartition(min(shards, 16))).materialize()
    return labels


def bfs_distances(edges, sources, *, src: str = "src", dst: str = "dst",
                  max_depth: int = 10, shards: int = 64):
    """Multi-source BFS over an undirected distinct edge set: the exact
    shortest hop-distance from the nearest seed in ``sources`` for every
    node within ``max_depth`` hops — the KG reachability primitive
    ("everything within k hops of these ontology roots") and the
    neighborhood-sampling step of graph-embedding pipelines.

    Per round: the CURRENT frontier (nodes first labeled last round)
    joins the adjacency through ONE node-hash bucketed exchange —
    frontier and adjacency rows union into aligned-schema blocks, the
    bucket task emits each frontier node's unseen-candidate neighbors —
    then a min-merge ``groupby(node)`` folds candidates into the
    distance state.  Distance state and adjacency stay Datasets end to
    end (nothing node- or edge-scale on the driver; ``sources`` itself
    is the only driver-side list and is seed-sized).  Frontier labeling
    is exact because unit-weight BFS first reaches a node at its true
    distance, so a node never re-enters the frontier.

    Unreached nodes are absent from the output (no infinity rows).
    Returns a Dataset of ``(node:int64, dist:int64)``.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    adj = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.int64()),
                b.column(dst).combine_chunks().cast(pa.int64())]),
            "nbr": pa.concat_arrays([
                b.column(dst).combine_chunks().cast(pa.int64()),
                b.column(src).combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow").materialize()

    seeds = np.asarray(sorted({int(s) for s in sources}), dtype=np.int64)
    dist = rd.from_arrow(pa.table({
        "node": pa.array(seeds),
        "dist": pa.array(np.zeros(len(seeds), np.int64))})).materialize()

    def _kb(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column("node"))
        return b.append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    n_known = dist.count()
    for r in range(max_depth):
        frontier = dist.map_batches(
            lambda b, rr=r: b.filter(pc.equal(b.column("dist"), rr)),
            batch_format="pyarrow")
        adj_k = adj.map_batches(
            lambda b: _kb(pa.table({
                "node": b.column("node"), "nbr": b.column("nbr")})),
            batch_format="pyarrow")
        fr_k = frontier.map_batches(
            lambda b: _kb(pa.table({
                "node": b.column("node"),
                "nbr": pa.nulls(len(b), pa.int64())})),
            batch_format="pyarrow")

        def expand(g: pa.Table, rr=r) -> pa.Table:
            # stays Arrow end to end: pandas would surface the nullable
            # nbr column as float64 and silently corrupt ids >= 2^53
            # (hash-derived 64-bit node ids round-trip wrong)
            has_nbr = pc.is_valid(g.column("nbr"))
            fset = g.filter(pc.invert(has_nbr)).column("node").combine_chunks()
            adj_rows = g.filter(has_nbr)
            hit = adj_rows.filter(
                pc.is_in(adj_rows.column("node"), value_set=fset)
            ).column("nbr")
            cand = np.unique(hit.to_numpy(zero_copy_only=False))
            return pa.table({
                "node": pa.array(cand, pa.int64()),
                "dist": pa.array(np.full(len(cand), rr + 1, np.int64))})

        cand = (adj_k.union(fr_k).groupby("__kb")
                .map_groups(expand, batch_format="pyarrow"))
        # block-count cap: every shuffle schedules one reduce task per
        # input block and union stacks blocks, so an uncapped dist's
        # per-round task count compounds (see betweenness_from_seeds)
        dist = (dist.union(cand).groupby("node")
                .aggregate(Min("dist", alias_name="dist"))
                .repartition(min(shards, 16))).materialize()
        n_now = dist.count()
        if n_now == n_known:  # empty effective frontier: fixpoint
            break
        n_known = n_now
    return dist


def jaccard_links(edges, *, src: str = "src", dst: str = "dst",
                  min_common: int = 1, max_degree: int | None = None,
                  buckets: int = 64, shards: int = 32):
    """Jaccard link prediction with INTEGER evidence: for every node
    pair sharing ≥ ``min_common`` neighbors, ``(node_a, node_b,
    n_common, n_union)`` where ``n_union = deg(a)+deg(b)−n_common`` —
    the Jaccard score is the driver-side (or reader-side) ratio, kept
    as exact integers so results hash identically across engines (the
    float-free evidence convention of the collocation/quality ops).

    Composition: :func:`common_neighbors` (one center exchange + one
    salted pair fold) decorated with :func:`node_degrees` through two
    bucketed :func:`~.join.hash_join` passes — pair-scale rows join
    node-scale degree rows; nothing lands on the driver.  ``max_degree``
    passes through to the hub cap (at web scale cap it: a hub's pairs
    are quadratic and its Jaccard is ~0 anyway).
    """
    from .join import hash_join

    # canon feeds common_neighbors AND the degree fold; deg feeds two
    # joins — materialize both (lazy re-execution rule, see
    # triangle_count)
    canon = distinct_edges(edges, src=src, dst=dst,
                           buckets=buckets).materialize()
    cn = common_neighbors(canon, src="u", dst="v", min_count=min_common,
                          max_degree=max_degree, buckets=buckets,
                          shards=shards)
    deg = node_degrees(canon, buckets=buckets).materialize()

    i64 = {"node_a": "int64", "node_b": "int64", "n_common": "int64",
           "node": "int64", "deg": "int64"}
    ja = hash_join(cn, deg, "node_a", "node",
                   left_columns=["node_a", "node_b", "n_common"],
                   right_columns=["node", "deg"],
                   left_dtypes={k: i64[k] for k in
                                ("node_a", "node_b", "n_common")},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)
    ja = ja.map_batches(
        lambda t: t.select(["node_a", "node_b", "n_common", "deg"])
                   .rename_columns(["node_a", "node_b", "n_common", "da"]),
        batch_format="pyarrow")
    jb = hash_join(ja, deg, "node_b", "node",
                   left_columns=["node_a", "node_b", "n_common", "da"],
                   right_columns=["node", "deg"],
                   left_dtypes={"node_a": "int64", "node_b": "int64",
                                "n_common": "int64", "da": "int64"},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)

    def finish(t: pa.Table) -> pa.Table:
        nc = t.column("n_common")
        union = pc.subtract(pc.add(t.column("da"), t.column("deg")), nc)
        return pa.table({"node_a": t.column("node_a"),
                         "node_b": t.column("node_b"),
                         "n_common": nc,
                         "n_union": union})

    return jb.map_batches(finish, batch_format="pyarrow")


def local_clustering(edges, *, src: str = "src", dst: str = "dst",
                     buckets: int = 64, shards: int = 32):
    """Per-node triangle participation with INTEGER evidence: ``(node,
    deg, n_triangles, n_wedges)`` where ``n_wedges = deg·(deg−1)/2`` —
    the local clustering coefficient is the reader-side ratio
    ``n_triangles / n_wedges`` (kept as exact integers, float-free).
    The KG-quality diagnostic: ontology hub terms with near-zero
    clustering are promiscuous link targets; dense triads are coherent
    concept clusters.

    Same degree-oriented compact-forward plan as :func:`triangle_count`
    (out-degrees bounded by O(√m) ⇒ O(m^{3/2}) wedge work TOTAL on any
    degree distribution), except wedges keep their CENTER so each
    closed wedge credits all three corners: wedge (x, y | a) matched
    against edge (x, y) in a pair-hash bucket emits per-node count
    partials (pre-aggregated in-bucket), folded by one salted node
    exchange and LEFT-joined onto the degree table (zero-triangle nodes
    kept).
    """
    from .join import hash_join

    # canon feeds the degree fold, the degree joins AND the closing
    # edge probe; deg feeds two joins — materialize both or each lazy
    # consumer re-executes the distinct_edges exchange from scratch
    canon = distinct_edges(edges, src=src, dst=dst,
                           buckets=buckets).materialize()
    deg = node_degrees(canon, buckets=buckets).materialize()

    i64 = {"u": "int64", "v": "int64", "node": "int64", "deg": "int64"}
    ju = hash_join(canon, deg, "u", "node",
                   right_columns=["node", "deg"],
                   left_dtypes={k: i64[k] for k in ("u", "v")},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)
    ju = ju.map_batches(
        lambda t: t.select(["u", "v", "deg"]).rename_columns(
            ["u", "v", "du"]),
        batch_format="pyarrow")
    jv = hash_join(ju, deg, "v", "node",
                   left_columns=["u", "v", "du"],
                   right_columns=["node", "deg"],
                   left_dtypes={"u": "int64", "v": "int64", "du": "int64"},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)

    def orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("deg").to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        h = _pair_hash(a, np.zeros_like(a)) % np.uint64(buckets)
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "__b": pa.array(h.astype(np.int32))})

    oriented = jv.map_batches(orient, batch_format="pyarrow")

    def wedges_c(g: pd.DataFrame) -> pd.DataFrame:
        a = g["a"].to_numpy()
        b = g["b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.ones(len(a), dtype=bool)
        starts[1:] = a[1:] != a[:-1]
        sizes = np.diff(np.append(np.nonzero(starts)[0], len(a)))
        ia, ib = _allpairs_index(sizes)
        if not len(ia):
            return pd.DataFrame({"x": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        x = np.minimum(b[ia], b[ib])
        y = np.maximum(b[ia], b[ib])
        return pd.DataFrame({"x": x, "y": y, "c": a[ia]})

    wedge_ds = oriented.groupby("__b").map_groups(
        wedges_c, batch_format="pandas")

    def tag_wedge(batch: pa.Table) -> pa.Table:
        h = _pair_hash(batch.column("x").to_numpy(zero_copy_only=False),
                       batch.column("y").to_numpy(zero_copy_only=False))
        return pa.table({"x": batch.column("x"), "y": batch.column("y"),
                         "c": batch.column("c"),
                         "__side": pa.array(
                             np.zeros(len(batch), dtype=np.int8)),
                         "__e": pa.array(
                             (h % np.uint64(buckets)).astype(np.int32))})

    def tag_edge(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        h = _pair_hash(u, v)
        return pa.table({"x": pa.array(u), "y": pa.array(v),
                         "c": pa.array(np.zeros(len(u), dtype=np.int64)),
                         "__side": pa.array(np.ones(len(u), dtype=np.int8)),
                         "__e": pa.array(
                             (h % np.uint64(buckets)).astype(np.int32))})

    both = wedge_ds.map_batches(tag_wedge, batch_format="pyarrow").union(
        canon.map_batches(tag_edge, batch_format="pyarrow"))

    def close_nodes(g: pd.DataFrame) -> pa.Table:
        w = g[g["__side"] == 0]
        e = g[g["__side"] == 1][["x", "y"]]
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "t": pa.array([], pa.int64())})
        if w.empty or e.empty:
            return empty
        m = w.merge(e, on=["x", "y"], how="inner")
        if m.empty:
            return empty
        corners = np.concatenate([m["x"].to_numpy(np.int64),
                                  m["y"].to_numpy(np.int64),
                                  m["c"].to_numpy(np.int64)])
        node, t = np.unique(corners, return_counts=True)
        return pa.table({"node": pa.array(node),
                         "t": pa.array(t.astype(np.int64))})

    tri_parts = both.groupby("__e").map_groups(
        close_nodes, batch_format="pandas")

    def tag_node(batch: pa.Table) -> pa.Table:
        h = hash64_column(batch.column("node"))
        return batch.append_column(
            "__s", pa.array((h % np.uint64(shards)).astype(np.int32)))

    tri = (tri_parts.map_batches(tag_node, batch_format="pyarrow")
           .groupby("__s").map_groups(
               lambda g: g.drop(columns="__s")
               .groupby("node", as_index=False)["t"].sum(),
               batch_format="pandas"))

    joined = hash_join(deg, tri, "node", "node",
                       how="left",
                       left_dtypes={"node": "int64", "deg": "int64"},
                       right_dtypes={"node": "int64", "t": "float64"},
                       buckets=buckets)

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        tri_n = t.column("t").to_numpy(zero_copy_only=False)
        tri_n = np.nan_to_num(tri_n.astype(np.float64), nan=0.0) \
            .astype(np.int64)
        return pa.table({"node": t.column("node"),
                         "deg": pa.array(d),
                         "n_triangles": pa.array(tri_n),
                         "n_wedges": pa.array(d * (d - 1) // 2)})

    return joined.map_batches(finish, batch_format="pyarrow")


def _hits_pinned(lean, iters: int, buckets: int | None):
    """Pinned-shard HITS loop (see :func:`hits`).

    TWO one-time exchanges pin the edge table keyed by hash(src) and
    by hash(dst) into S object-store buckets (each row pre-tagged with
    its TARGET's shard); node scores live in S hash(node) shards.  A
    half-step is S contrib tasks (bucket b's key scores are exactly
    score shard b) emitting an S×S piece matrix, folded by S shard
    tasks onto the node skeleton — node-scale traffic only, the edge
    table never moves again.  The S×S piece matrix caps S (≤ 64),
    bounding this mode at ~10⁹-edge graphs per job; ``mode='shuffle'``
    is the unbounded path."""
    import math

    import ray

    from .join import derive_buckets

    n_edges = lean.count()
    S = max(1, min(64, buckets if buckets is not None
                   else derive_buckets(n_edges)))

    @ray.remote
    def split_block(tbl: pa.Table, col: str, n: int):
        # 0-row blocks can arrive with an ERASED schema — nothing to
        # route either way
        if tbl is None or len(tbl) == 0 or col not in tbl.schema.names:
            return [None] * n if n > 1 else None
        out = []
        kb = tbl.column(col).to_numpy(zero_copy_only=False)
        for b in range(n):
            m = kb == b
            out.append(tbl.filter(pa.array(m)) if m.any() else None)
        return out if n > 1 else out[0]

    @ray.remote
    def assemble(*pieces):
        tbls = [p for p in pieces if p is not None]
        return pa.concat_tables(tbls) if tbls else None

    def exchange(ds, col):
        refs = ds.to_arrow_refs()
        if S == 1:
            return [assemble.remote(*refs)]
        piece_refs = [split_block.options(num_returns=S).remote(r, col, S)
                      for r in refs]
        return [assemble.remote(*[pr[b] for pr in piece_refs])
                for b in range(S)]

    def tag_dir(key_col: str, tgt_col: str):
        def tag(b: pa.Table) -> pa.Table:
            kkb = (hash64_column(b.column(key_col))
                   % np.uint64(S)).astype(np.int32)
            tkb = (hash64_column(b.column(tgt_col))
                   % np.uint64(S)).astype(np.int32)
            return pa.table({"k": b.column(key_col),
                             "t": b.column(tgt_col),
                             "kkb": pa.array(kkb),
                             "tkb": pa.array(tkb)})
        return lean.map_batches(tag, batch_format="pyarrow")

    fwd_buckets = exchange(tag_dir("src", "dst"), "kkb")  # auth step
    rev_buckets = exchange(tag_dir("dst", "src"), "kkb")  # hub step

    def node_part(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            b.column("src").to_numpy(zero_copy_only=False),
            b.column("dst").to_numpy(zero_copy_only=False)]))
        nkb = (hash64_column(pa.array(n)) % np.uint64(S)).astype(np.int32)
        return pa.table({"node": pa.array(n), "nkb": pa.array(nkb)})

    from ray.data.aggregate import Max as _Max
    nodes_t = (lean.map_batches(node_part, batch_format="pyarrow")
               .groupby("node").aggregate(_Max("nkb", alias_name="nkb")))
    skeletons = exchange(nodes_t, "nkb")

    @ray.remote
    def init_shard(skel):
        if skel is None:
            return None
        return pa.table({
            "node": skel.column("node"),
            "score": pa.array(np.ones(len(skel), np.float64))})

    @ray.remote
    def contrib(edges_tbl, shard, n):
        if edges_tbl is None or shard is None or len(edges_tbl) == 0:
            return [None] * n if n > 1 else None
        smap = pd.Series(shard.column("score").to_numpy(),
                         index=shard.column("node").to_numpy(
                             zero_copy_only=False))
        r = pd.Series(edges_tbl.column("k").to_numpy(
            zero_copy_only=False)).map(smap).to_numpy(np.float64)
        df = pd.DataFrame({
            "tkb": edges_tbl.column("tkb").to_numpy(),
            "node": edges_tbl.column("t").to_numpy(zero_copy_only=False),
            "c": r,
        }).groupby(["tkb", "node"], sort=False)["c"].sum().reset_index()
        out = [None] * n
        for kb, sub in df.groupby("tkb", sort=False):
            out[int(kb)] = pa.table({
                "node": pa.array(sub["node"].to_numpy(np.int64)),
                "c": pa.array(sub["c"].to_numpy(np.float64))})
        return out if n > 1 else out[0]

    @ray.remote
    def fold(skel, *pieces):
        if skel is None:
            return None
        tbls = [p for p in pieces if p is not None]
        nodes = np.sort(skel.column("node").to_numpy(zero_copy_only=False))
        acc = np.zeros(len(nodes), np.float64)
        if tbls:
            cat = pa.concat_tables(tbls)
            sums = (pd.DataFrame({
                "node": cat.column("node").to_numpy(zero_copy_only=False),
                "c": cat.column("c").to_numpy()})
                .groupby("node", sort=False)["c"].sum())
            pos = np.searchsorted(nodes, sums.index.to_numpy())
            acc[pos] = sums.to_numpy()
        return pa.table({"node": pa.array(nodes),
                         "score": pa.array(acc)})

    @ray.remote
    def sumsq(shard):
        if shard is None:
            return 0.0
        v = shard.column("score").to_numpy()
        return float(np.dot(v, v))

    @ray.remote
    def rescale(shard, norm):
        if shard is None:
            return None
        return pa.table({
            "node": shard.column("node"),
            "score": pa.array(shard.column("score").to_numpy() / norm)})

    def half(score_shards, edge_buckets):
        pieces = [contrib.options(num_returns=S).remote(
            edge_buckets[b], score_shards[b], S) for b in range(S)]             if S > 1 else [[contrib.remote(edge_buckets[0],
                                           score_shards[0], 1)]]
        return [fold.remote(skeletons[b], *[pieces[x][b]
                                            for x in range(S)])
                for b in range(S)]

    def l2(shards):
        n = math.sqrt(sum(ray.get([sumsq.remote(sh) for sh in shards])))
        return n if n else 1.0

    hub = [init_shard.remote(sk) for sk in skeletons]
    auth = hub
    for i in range(iters):
        auth = half(hub, fwd_buckets)
        hub = half(auth, rev_buckets)
        if (i + 1) % 4 == 0 and i + 1 < iters:  # float64 growth guard
            an, hn = l2(auth), l2(hub)
            auth = [rescale.remote(sh, an) for sh in auth]
            hub = [rescale.remote(sh, hn) for sh in hub]

    hn, an = l2(hub), l2(auth)

    @ray.remote
    def finish(h_sh, a_sh):
        if h_sh is None:
            return None
        return pa.table({
            "node": h_sh.column("node"),
            "hub": pa.array(h_sh.column("score").to_numpy() / hn),
            "authority": pa.array(a_sh.column("score").to_numpy() / an)})

    import ray.data as rd
    out = [finish.remote(h, a) for h, a in zip(hub, auth)]
    live = [r for r, t in zip(out, ray.get(out)) if t is not None]
    return rd.from_arrow_refs(live)


def hits(edges, *, src: str = "src", dst: str = "dst", iters: int = 5,
         renorm_every: int = 4, shards: int = 64, buckets: int | None = None,
         mode: str = "pinned"):
    """HITS hubs-and-authorities (Kleinberg 1999) over a DIRECTED edge
    list: per iteration authorities absorb their in-neighbors' hub
    scores, hubs absorb their out-neighbors' authority scores, each
    side L2-normalized — the bipartite-rank complement to
    :func:`pagerank` (curation use: rank tool/agent hubs against
    resource authorities in an interaction graph).

    Two execution modes, mirroring :func:`pagerank`:

    * ``mode='pinned'`` (default): two one-time exchanges pin the edge
      table keyed by hash(src) and hash(dst) into S object-store
      buckets; each half-step is S contrib + S fold raw tasks moving
      node-scale score shards only (see :func:`_hits_pinned`).  The
      S×S piece matrix caps S at 64 — ~10⁹ edges per job.
    * ``mode='shuffle'``: pure Ray Data — each half-step is ONE
      key-hash bucketed exchange (edges union score rows, in-bucket
      vectorized merge with a per-target combiner) plus a target-key
      fold.  Re-ships edges per half-step but has no S×S term: the
      unbounded-scale path.

    Both modes exploit that normalization is scale-invariant across
    the linear half-step chain: intermediate normalizes are
    algebraically redundant, so scores stay RAW and are L2-normalized
    once at the end (identical result, ~3× fewer passes), with a
    renorm pass every ``renorm_every`` iterations bounding float64
    growth (top-singular-value² per iteration; 4 unnormalized
    iterations stay far below 1e308 on any realistic graph).

    Returns (node, hub float64, authority float64) for every node.
    Rows-only semantics (iterative float sums are summation-order-
    dependent); pinned by numpy power-iteration parity tests.
    """
    import math

    from ray.data.aggregate import Sum

    if mode not in ("pinned", "shuffle"):
        raise ValueError(f"unknown hits mode {mode!r}")

    lean = edges.map_batches(
        lambda t: pa.table({
            "src": t.column(src).combine_chunks().cast(pa.int64()),
            "dst": t.column(dst).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    if mode == "pinned":
        return _hits_pinned(lean, iters, buckets)

    def nodes_part(b: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([
            b.column("src").to_numpy(zero_copy_only=False),
            b.column("dst").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(n)})

    nodes = (lean.map_batches(nodes_part, batch_format="pyarrow")
             .groupby("node").aggregate(Sum("node", alias_name="__x"))
             .map_batches(lambda t: pa.table({
                 "node": t.column("node"),
                 "score": pa.array(np.ones(len(t), np.float64))}),
              batch_format="pyarrow")).materialize()

    def _kb(b: pa.Table, col: str) -> pa.Table:
        h = hash64_column(b.column(col))
        return b.append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def half_step(scores, key_col: str, tgt_col: str):
        """raw new_scores[t] = Σ_{(k,t) edges} scores[k] (no norm)."""
        ek = lean.map_batches(
            lambda b: _kb(pa.table({
                "k": b.column(key_col), "t": b.column(tgt_col),
                "score": pa.nulls(len(b), pa.float64())}), "k"),
            batch_format="pyarrow")
        sk = scores.map_batches(
            lambda b: _kb(pa.table({
                "k": b.column("node"), "t": pa.nulls(len(b), pa.int64()),
                "score": b.column("score")}), "k"),
            batch_format="pyarrow")

        def contrib(g: pd.DataFrame) -> pa.Table:
            e = g.loc[g["score"].isna(), ["k", "t"]]
            s = g.loc[g["t"].isna(), ["k", "score"]]
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64())})
            if e.empty or s.empty:
                return empty
            m = e.merge(s, on="k")
            out = m.groupby("t", as_index=False)["score"].sum()
            return pa.table({
                "node": pa.array(out["t"].to_numpy(np.int64)),
                "score": pa.array(out["score"].to_numpy(np.float64))})

        return (ek.union(sk).groupby("__kb")
                .map_groups(contrib, batch_format="pandas")
                .groupby("node").aggregate(Sum("score",
                                               alias_name="score"))
                ).materialize()

    def l2norm(scores) -> float:
        sq = scores.map_batches(
            lambda t: pa.table({"s2": pc.multiply(t.column("score"),
                                                  t.column("score"))}),
            batch_format="pyarrow").sum("s2")
        return math.sqrt(sq) if sq else 1.0

    def rescale(scores, norm: float):
        return scores.map_batches(
            lambda t, nv=norm: pa.table({
                "node": t.column("node"),
                "score": pc.divide(t.column("score"), nv)}),
            batch_format="pyarrow").materialize()

    hub, auth = nodes, nodes
    for i in range(iters):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")
        if (i + 1) % renorm_every == 0 and i + 1 < iters:
            auth = rescale(auth, l2norm(auth))
            hub = rescale(hub, l2norm(hub))

    hn, an = l2norm(hub), l2norm(auth)
    h_rows = hub.map_batches(
        lambda t, nv=hn: pa.table({
            "node": t.column("node"),
            "hub": pc.divide(t.column("score"), nv),
            "authority": pa.array(np.zeros(len(t), np.float64))}),
        batch_format="pyarrow")
    a_rows = auth.map_batches(
        lambda t, nv=an: pa.table({
            "node": t.column("node"),
            "hub": pa.array(np.zeros(len(t), np.float64)),
            "authority": pc.divide(t.column("score"), nv)}),
        batch_format="pyarrow")
    return (h_rows.union(a_rows).groupby("node")
            .aggregate(Sum("hub", alias_name="hub"),
                       Sum("authority", alias_name="authority")))


def personalized_pagerank(edges, seeds, *, src: str = "src",
                          dst: str = "dst", damping: float = 0.85,
                          iters: int = 10, shards: int = 64):
    """Personalized PageRank (random walk with restart to ``seeds``):
    the KG relevance primitive — "rank every entity by proximity to
    this query's seed entities" — where :func:`pagerank` ranks by
    global centrality.  Restart distribution is uniform over the seed
    set; dangling mass also restarts to the seeds (the standard RWR
    convention, keeping total mass exactly 1).

    Fully sparse: rank rows exist ONLY for nodes already reached by
    the walk (the frontier grows like BFS from the seeds), so early
    iterations touch a neighborhood, not the graph.  Per iteration:
    ONE src-hash union exchange (out-degree-weighted edges, built once
    and materialized, union the current rank rows) with an in-bucket
    per-destination combiner, one destination fold, and one scalar
    ``sum`` — the dangling mass needs NO dangling-node join because
    mass is conserved: ``dang = total(=1) − Σ contribs``.

    Returns (node, rank float64), nodes with nonzero rank only.
    Rows-only semantics (iterative float sums); pinned by numpy
    power-iteration parity tests.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import hash_join

    lean = edges.map_batches(
        lambda t: pa.table({
            "__src": t.column(src).combine_chunks().cast(pa.int64()),
            "__dst": t.column(dst).combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")

    def deg_part(b: pa.Table) -> pa.Table:
        n, c = np.unique(b.column("__src").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"node": pa.array(n),
                         "deg": pa.array(c.astype(np.int64))})

    out_deg = (lean.map_batches(deg_part, batch_format="pyarrow")
               .groupby("node").aggregate(Sum("deg", alias_name="deg")))

    def weigh(b: pa.Table) -> pa.Table:
        kb = (hash64_column(b.column("__src"))
              % np.uint64(shards)).astype(np.int32)
        return pa.table({
            "k": b.column("__src"), "t": b.column("__dst"),
            "w": pc.divide(1.0, pc.cast(b.column("deg"), pa.float64())),
            "r": pa.nulls(len(b), pa.float64()),
            "__kb": pa.array(kb)})

    edges_w = hash_join(lean, out_deg, "__src", "node",
                        right_columns=["node", "deg"],
                        left_dtypes={"__src": "int64", "__dst": "int64"},
                        right_dtypes={"node": "int64", "deg": "int64"}) \
        .map_batches(weigh, batch_format="pyarrow").materialize()

    seed_arr = np.asarray(sorted({int(s) for s in seeds}), dtype=np.int64)
    if not len(seed_arr):
        raise ValueError("personalized_pagerank needs ≥ 1 seed")
    p0 = 1.0 / len(seed_arr)

    def seed_rows(mass: float):
        return rd.from_arrow(pa.table({
            "node": pa.array(seed_arr),
            "rank": pa.array(np.full(len(seed_arr), mass * p0,
                                     np.float64))}))

    ranks = seed_rows(1.0).materialize()

    def tag_ranks(b: pa.Table) -> pa.Table:
        kb = (hash64_column(b.column("node"))
              % np.uint64(shards)).astype(np.int32)
        return pa.table({
            "k": b.column("node"), "t": pa.nulls(len(b), pa.int64()),
            "w": pa.nulls(len(b), pa.float64()), "r": b.column("rank"),
            "__kb": pa.array(kb)})

    def contrib(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "c": pa.array([], pa.float64())})
        e = g[g["r"].isna()]
        s = g[g["t"].isna()]
        if e.empty or s.empty:
            return empty
        r = e["k"].map(s.set_index("k")["r"]).to_numpy(np.float64)
        hit = ~np.isnan(r)
        if not hit.any():
            return empty
        out = pd.DataFrame({
            "node": e["t"].to_numpy(np.int64)[hit],
            "c": r[hit] * e["w"].to_numpy(np.float64)[hit]})
        out = out.groupby("node", sort=False, as_index=False)["c"].sum()
        return pa.table({"node": pa.array(out["node"].to_numpy(np.int64)),
                         "c": pa.array(out["c"].to_numpy(np.float64))})

    for _ in range(iters):
        tagged = ranks.map_batches(tag_ranks, batch_format="pyarrow")
        contribs = (edges_w.union(tagged).groupby("__kb")
                    .map_groups(lambda g: contrib(g.drop(columns="__kb")),
                                batch_format="pandas")).materialize()
        passed = contribs.sum("c") or 0.0
        dang = 1.0 - passed  # mass conservation: Σ ranks was exactly 1
        restart_mass = (1.0 - damping) + damping * dang
        scaled = contribs.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "rank": pc.multiply(damping, t.column("c"))}),
            batch_format="pyarrow")
        # block-count cap (see betweenness_from_seeds): shuffles
        # schedule one reduce task per input block, and the union-fed
        # rank state otherwise gains blocks every iteration
        ranks = (scaled.union(seed_rows(restart_mass))
                 .groupby("node").aggregate(
                     Sum("rank", alias_name="rank"))
                 .repartition(min(shards, 16))).materialize()
    return ranks


def degree_assortativity_evidence(edges, *, src: str = "src",
                                  dst: str = "dst", buckets: int = 64):
    """Degree-assortativity INTEGER moments of the undirected graph:
    one row ``(n, sum_x, sum_y, sum_xy, sum_x2, sum_y2)`` over the
    DIRECTED view of the canonical edge set (each undirected edge
    counted in both orientations, the standard symmetrization), where
    x, y are the endpoint degrees.  Newman's assortativity coefficient
    is the reader-side Pearson expression over these exact integers —
    float-free, so the result hashes identically to the SQL oracle.
    The KG topology diagnostic: positive ⇒ hubs link hubs (social-like),
    negative ⇒ hubs link leaves (web/biology-like).

    Composition: :func:`distinct_edges` → :func:`node_degrees` → two
    bucketed :func:`~.join.hash_join` passes decorate each edge with
    both endpoint degrees (the :func:`triangle_count` plan) → per-batch
    integer moment partials → one single-row fold.
    """
    from ray.data.aggregate import Sum

    from .join import hash_join

    # canon feeds the degree fold, the degree joins AND the closing
    # edge probe; deg feeds two joins — materialize both or each lazy
    # consumer re-executes the distinct_edges exchange from scratch
    canon = distinct_edges(edges, src=src, dst=dst,
                           buckets=buckets).materialize()
    deg = node_degrees(canon, buckets=buckets).materialize()

    i64 = {"u": "int64", "v": "int64", "node": "int64", "deg": "int64"}
    ju = hash_join(canon, deg, "u", "node",
                   right_columns=["node", "deg"],
                   left_dtypes={k: i64[k] for k in ("u", "v")},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)
    ju = ju.map_batches(
        lambda t: t.select(["u", "v", "deg"]).rename_columns(
            ["u", "v", "du"]),
        batch_format="pyarrow")
    jv = hash_join(ju, deg, "v", "node",
                   left_columns=["u", "v", "du"],
                   right_columns=["node", "deg"],
                   left_dtypes={"u": "int64", "v": "int64", "du": "int64"},
                   right_dtypes={k: i64[k] for k in ("node", "deg")},
                   buckets=buckets)

    def moments(t: pa.Table) -> pa.Table:
        du = t.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t.column("deg").to_numpy(zero_copy_only=False).astype(np.int64)
        # both orientations: x spans du+dv, y spans dv+du
        sx = int(du.sum() + dv.sum())
        sxy = int(2 * (du * dv).sum())
        sx2 = int((du * du).sum() + (dv * dv).sum())
        return pa.table({"n": pa.array([2 * len(du)], pa.int64()),
                         "sum_x": pa.array([sx], pa.int64()),
                         "sum_y": pa.array([sx], pa.int64()),
                         "sum_xy": pa.array([sxy], pa.int64()),
                         "sum_x2": pa.array([sx2], pa.int64()),
                         "sum_y2": pa.array([sx2], pa.int64())})

    out = jv.map_batches(moments, batch_format="pyarrow")
    return _fold_single_row(out)


def _fold_single_row(ds):
    """Sum every int64 column of ``ds`` into one row (tiny driver-side
    fold of per-batch partial rows)."""
    import ray.data as rd

    df = ds.to_pandas()  # one partial row per batch — bounded
    total = df.sum(axis=0).astype(np.int64)
    return rd.from_pandas(pd.DataFrame([total]))


# ------------------------------------------------- consecutive edges


def consecutive_edges(ds, *, key_col: str, order_col: str,
                      value_col: str, keep_col: str | None = None,
                      buckets: int | None = None):
    """Canonical undirected edges between the ``value_col`` of rows at
    CONSECUTIVE ``order_col`` positions inside each ``key_col`` group —
    the "items adjacent in a sequence" graph (parts on neighbouring
    order lines, tools invoked back-to-back in a transcript, pages hit
    in succession inside a session).  Two rows pair only when their
    order values differ by exactly 1 (a gap breaks the chain), matching
    the SQL self-join ``ON r2.key = r1.key AND r2.ord = r1.ord + 1``.

    ``keep_col`` (optional bool column) must hold on BOTH members of a
    pair — equivalent to a WHERE on the joined pair, since the join
    matches on stored order VALUES (``o2 = o1 + 1``), not sort
    positions: duplicate (key, order) rows pair cross-product-style and
    gaps never bridge, exactly like the SQL self-join.

    Scale shape: rows project to lean (key, ord, value[, keep]) columns
    map-side, ONE hash(key) exchange co-locates each key's sequence,
    the bucket task forms pairs with a vectorized in-bucket self-merge
    on (key, ord+1) (no per-row Python), canonicalizes (min, max),
    dedups in-bucket, and a final :func:`distinct_edges` pass folds
    cross-bucket duplicates (none arise — a pair lives in its key's
    bucket — so the second exchange ships already-distinct pairs only).
    """
    n = ds.count()
    from .join import derive_buckets
    buckets = buckets if buckets is not None else derive_buckets(n)

    def tag(batch: pa.Table) -> pa.Table:
        cols = {
            "k": pc.cast(batch.column(key_col), pa.int64()),
            "o": pc.cast(batch.column(order_col), pa.int64()),
            "x": pc.cast(batch.column(value_col), pa.int64()),
        }
        if keep_col is not None:
            cols["keep"] = pc.cast(batch.column(keep_col), pa.bool_())
        h = hash64_column(batch.column(key_col))
        cols["__b"] = pa.array((h % np.uint64(buckets)).astype(np.int32))
        return pa.table(cols)

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # exact self-join semantics (ON k = k AND o2 = o1 + 1): DUPLICATE
        # (k, o) rows pair cross-product-style, which a sorted shifted
        # compare would miss — the in-bucket merge is still vectorized
        # and bucket-bounded
        if keep_col is not None:
            g = g[g["keep"].astype(bool)]
        left = g[["k", "o", "x"]].copy()
        left["o"] = left["o"] + 1
        m = left.merge(g[["k", "o", "x"]], on=["k", "o"],
                       suffixes=("_a", "_b"))
        a = m["x_a"].to_numpy()
        b = m["x_b"].to_numpy()
        ok = a != b
        a, b = a[ok], b[ok]
        u, v = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        return out

    lean = ds.map_batches(tag, batch_format="pyarrow")
    pairs = lean.groupby("__b").map_groups(pair_bucket, batch_format="pandas")
    return distinct_edges(pairs, src="u", dst="v", buckets=buckets)


def seed_distances(edges, sources, *, src: str = "src", dst: str = "dst",
                   max_depth: int = 6, shards: int = 64):
    """Per-seed BFS over an undirected distinct edge set: the exact hop
    distance ``(seed, node, dist)`` from EVERY seed in ``sources`` to
    every node within ``max_depth`` hops of it — :func:`bfs_distances`
    with seed identity preserved (that op folds to the NEAREST seed;
    this one keeps one distance row per reachable (seed, node) pair,
    the landmark-distance primitive behind sampled closeness/harmonic
    centrality and landmark-based shortest-path estimation).

    Same plan shape as :func:`bfs_distances`: per round the current
    frontier (rows first labeled last round, now carrying their seed)
    unions with the adjacency into ONE node-hash bucketed exchange, the
    bucket task emits each frontier row's ``(seed, neighbor)``
    candidates, and a ``groupby([seed, node]).min(dist)`` folds them
    into the distance state.  State is seeds × reachable-nodes rows —
    a Dataset end to end; keep ``sources`` a SAMPLE (state is
    ``|sources|`` × node-scale, which is why full closeness centrality
    is never computed exactly at web scale).  Unit-weight BFS first
    reaches a (seed, node) pair at its true distance, so pairs never
    re-enter the frontier and the capped walk is exactly a depth-capped
    recursive CTE.

    Returns a Dataset of ``(seed:int64, node:int64, dist:int64)``
    including the ``(seed, seed, 0)`` self rows.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    adj = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.int64()),
                b.column(dst).combine_chunks().cast(pa.int64())]),
            "nbr": pa.concat_arrays([
                b.column(dst).combine_chunks().cast(pa.int64()),
                b.column(src).combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow")

    seeds = np.asarray(sorted({int(s) for s in sources}), dtype=np.int64)
    dist = rd.from_arrow(pa.table({
        "seed": pa.array(seeds),
        "node": pa.array(seeds),
        "dist": pa.array(np.zeros(len(seeds), np.int64))})).materialize()

    def _kb(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column("node"))
        return b.append_column(
            "__kb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    # the adjacency's bucket tag is round-invariant: tag ONCE and reuse
    # the materialized blocks every round (bfs_distances re-tags per
    # round; at 4+ rounds this map over every edge dominates)
    adj_k = adj.map_batches(
        lambda b: _kb(pa.table({
            "node": b.column("node"), "nbr": b.column("nbr"),
            "seed": pa.nulls(len(b), pa.int64())})),
        batch_format="pyarrow").materialize()

    n_known = dist.count()
    for r in range(max_depth):
        frontier = dist.map_batches(
            lambda b, rr=r: b.filter(pc.equal(b.column("dist"), rr)),
            batch_format="pyarrow")
        fr_k = frontier.map_batches(
            lambda b: _kb(pa.table({
                "node": b.column("node"),
                "nbr": pa.nulls(len(b), pa.int64()),
                "seed": b.column("seed")})),
            batch_format="pyarrow")

        def expand(g: pa.Table, rr=r) -> pa.Table:
            # Arrow end to end: the pandas path surfaced the nullable
            # seed/nbr columns as float64 before the int64 cast, which
            # silently corrupts hash-derived ids >= 2^53
            is_fr = pc.is_valid(g.column("seed"))
            fr = g.filter(is_fr).select(["node", "seed"])
            ad = g.filter(pc.invert(is_fr)).select(["node", "nbr"])
            if not len(fr) or not len(ad):
                return pa.table({"seed": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64())})
            m = fr.join(ad, keys="node", join_type="inner")
            pairs = m.group_by(["seed", "nbr"]).aggregate([])
            return pa.table({
                "seed": pairs.column("seed").cast(pa.int64()),
                "node": pairs.column("nbr").cast(pa.int64()),
                "dist": pa.array(
                    np.full(len(pairs), rr + 1, np.int64))})

        cand = (adj_k.union(fr_k).groupby("__kb")
                .map_groups(expand, batch_format="pyarrow"))
        # same block-count cap as bfs_distances/betweenness_from_seeds
        dist = (dist.union(cand).groupby(["seed", "node"])
                .aggregate(Min("dist", alias_name="dist"))
                .repartition(min(shards, 16))).materialize()
        n_now = dist.count()
        if n_now == n_known:  # no new (seed, node) pair: fixpoint
            break
        n_known = n_now
    return dist


def closeness_from_seeds(edges, sources, *, src: str = "src",
                         dst: str = "dst", max_depth: int = 6,
                         shards: int = 64):
    """Sampled closeness-centrality evidence: for each seed in
    ``sources``, ``(seed, n_reached, total_dist)`` over the nodes
    within ``max_depth`` hops — ``n_reached`` EXCLUDES the seed itself,
    ``total_dist`` is the sum of hop distances.  The closeness score
    ``n_reached / total_dist`` (and the normalized Wasserman–Faust
    variant) is the reader-side ratio, kept as exact integers per the
    float-free evidence convention; exact full closeness is O(V·E), so
    production pipelines sample landmarks exactly like this.

    One :func:`seed_distances` walk (per round ONE node-hash exchange +
    one min-merge), then a seed-keyed Count/Sum fold — seeds-scale
    output.
    """
    from ray.data.aggregate import Count, Sum

    sd = seed_distances(edges, sources, src=src, dst=dst,
                        max_depth=max_depth, shards=shards)
    agg = sd.groupby("seed").aggregate(
        Count(), Sum("dist", alias_name="total_dist"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "seed": t.column("seed").cast(pa.int64()),
            "n_reached": pc.subtract(
                t.column("count()").cast(pa.int64()), 1),
            "total_dist": t.column("total_dist").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def shortest_path_counts(edges, sources, *, src: str = "src",
                         dst: str = "dst", max_depth: int = 3,
                         shards: int = 64):
    """Per-seed shortest-path COUNTING over an undirected distinct edge
    set: ``(seed, node, dist, sigma)`` where ``sigma`` is the number of
    distinct shortest paths from the seed — the σ table of Brandes'
    betweenness algorithm, computed for a landmark SAMPLE of seeds (the
    production form: exact betweenness is O(V·E), so web-scale
    estimators run Brandes from sampled sources, cf. Riondato &
    Kornaropoulos 2014).  The float dependency accumulation δ is a
    reader-side fold over this integer evidence; keeping the engine
    output integral makes the whole walk hash-checkable against an
    unrolled-level SQL oracle.

    Plan shape per level (same as :func:`seed_distances`): the
    adjacency is bucket-tagged ONCE and reused; the level-``r``
    frontier (whose sigmas are final — every shortest path to a
    level-``r+1`` node runs through a level-``r`` predecessor) joins
    the adjacency in ONE node-hash bucketed exchange emitting partial
    ``(seed, nbr, sigma)`` sums, then ONE (seed, node)-hash exchange
    sums partials across buckets and drops already-visited pairs.
    State is ``|sources|`` × reachable-nodes rows, a Dataset end to
    end.  ``sigma`` is int64 — counts grow with degree^depth, so keep
    ``max_depth`` small (the betweenness-sampling regime anyway).

    Returns ``(seed:int64, node:int64, dist:int64, sigma:int64)``
    including the ``(seed, seed, 0, 1)`` self rows.
    """
    import ray.data as rd

    adj = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.int64()),
                b.column(dst).combine_chunks().cast(pa.int64())]),
            "nbr": pa.concat_arrays([
                b.column(dst).combine_chunks().cast(pa.int64()),
                b.column(src).combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow")

    seeds = np.asarray(sorted({int(s) for s in sources}), dtype=np.int64)
    state = rd.from_arrow(pa.table({
        "seed": pa.array(seeds),
        "node": pa.array(seeds),
        "dist": pa.array(np.zeros(len(seeds), np.int64)),
        "sigma": pa.array(np.ones(len(seeds), np.int64))})).materialize()

    def _nb(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column("node"))
        return b.append_column(
            "__nb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    # adjacency rows carry sigma=null as the marker telling the bucket
    # task which side of the frontier⋈adjacency join they are
    adj_k = adj.map_batches(
        lambda b: _nb(pa.table({
            "node": b.column("node"), "nbr": b.column("nbr"),
            "seed": pa.nulls(len(b), pa.int64()),
            "sigma": pa.nulls(len(b), pa.int64())})),
        batch_format="pyarrow").materialize()

    def _pb(b: pa.Table) -> pa.Table:
        h = hash64_column(pc.binary_join_element_wise(
            pc.cast(b.column("seed"), pa.string()),
            pc.cast(b.column("node"), pa.string()), ":"))
        return b.append_column(
            "__pb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    n_known = state.count()
    for r in range(max_depth):
        def fr_rows(b: pa.Table, rr=r) -> pa.Table:
            f = b.filter(pc.equal(b.column("dist"), rr))
            return _nb(pa.table({
                "node": f.column("node"),
                "nbr": pa.nulls(len(f), pa.int64()),
                "seed": f.column("seed"),
                "sigma": f.column("sigma")}))

        fr_k = state.map_batches(fr_rows, batch_format="pyarrow")

        def expand(g: pa.Table) -> pa.Table:
            is_fr = pc.is_valid(g.column("sigma"))
            fr = g.filter(is_fr).select(["node", "seed", "sigma"])
            ad = g.filter(pc.invert(is_fr)).select(["node", "nbr"])
            if not len(fr) or not len(ad):
                return pa.table({"seed": pa.array([], pa.int64()),
                                 "node": pa.array([], pa.int64()),
                                 "sigma": pa.array([], pa.int64())})
            m = fr.join(ad, keys="node", join_type="inner")
            agg = (m.group_by(["seed", "nbr"])
                    .aggregate([("sigma", "sum")]))
            return pa.table({
                "seed": agg.column("seed").cast(pa.int64()),
                "node": agg.column("nbr").cast(pa.int64()),
                "sigma": agg.column("sigma_sum").cast(pa.int64())})

        cand = (adj_k.union(fr_k).groupby("__nb")
                .map_groups(expand, batch_format="pyarrow"))

        # second exchange: sum sigma partials across node-buckets and
        # drop (seed, node) pairs already labeled at an earlier level
        cand_m = cand.map_batches(
            lambda b: _pb(b.append_column(
                "__st", pa.array(np.zeros(len(b), np.int8)))),
            batch_format="pyarrow")
        seen_m = state.map_batches(
            lambda b: _pb(pa.table({
                "seed": b.column("seed"), "node": b.column("node"),
                "sigma": pa.array(np.zeros(len(b), np.int64)),
                "__st": pa.array(np.ones(len(b), np.int8))})),
            batch_format="pyarrow")

        def merge(g: pa.Table, rr=r) -> pa.Table:
            agg = (g.group_by(["seed", "node"])
                    .aggregate([("__st", "max"), ("sigma", "sum")]))
            fresh = agg.filter(pc.equal(agg.column("__st_max"), 0))
            return pa.table({
                "seed": fresh.column("seed").cast(pa.int64()),
                "node": fresh.column("node").cast(pa.int64()),
                "dist": pa.array(
                    np.full(len(fresh), rr + 1, np.int64)),
                "sigma": fresh.column("sigma_sum").cast(pa.int64())})

        new = (cand_m.union(seen_m).groupby("__pb")
               .map_groups(merge, batch_format="pyarrow"))
        # block-count cap: union stacks blocks and every shuffle here
        # schedules one reduce task per input block, so an uncapped
        # state's task count compounds round over round
        state = (state.union(new)
                 .repartition(min(shards, 16)).materialize())
        n_now = state.count()
        if n_now == n_known:  # no new (seed, node) pair: fixpoint
            break
        n_known = n_now
    return state


def betweenness_from_seeds(edges, sources, *, src: str = "src",
                           dst: str = "dst", max_depth: int = 3,
                           shards: int = 64):
    """Landmark-sampled betweenness centrality (Brandes 2001, sampled
    per Riondato & Kornaropoulos 2014): run the forward σ walk
    (:func:`shortest_path_counts`) from the seed sample, then
    accumulate the dependency δ backward level by level —

        δ(s,v) = Σ_{w : dist(s,w)=dist(s,v)+1, v~w}
                 σ(s,v)/σ(s,w) · (1 + δ(s,w))

    and emit ``bc = Σ_seeds δ(s,v)`` per node (self rows excluded).
    Exact betweenness is O(V·E); the seed-sampled estimator is the
    production form, and ``bc`` here is the raw sampled numerator — the
    caller rescales by n/|sources| (and /2 for undirected symmetry)
    however its estimator prescribes.

    Plan shape: the forward walk's two bucketed exchanges per level,
    then per BACKWARD level one node-hash exchange joining the deeper
    level's (σ_w, δ_w) rows to the once-tagged adjacency (emitting
    per-edge contributions keyed by the shallower endpoint) and one
    (seed, node)-hash exchange folding contributions into δ — state
    stays a Dataset of |sources| × reachable-nodes rows throughout.
    Float output (δ is a ratio sum): rows-only semantics, pinned by a
    pure-Python Brandes reference in tests.

    Returns ``(node:int64, bc:float64)`` sorted by node, one row per
    non-seed-self node reachable from any seed.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    _SENT = np.iinfo(np.int64).max  # dist sentinel on contrib rows

    sig = shortest_path_counts(edges, sources, src=src, dst=dst,
                               max_depth=max_depth,
                               shards=shards).materialize()
    max_d = sig.max("dist")

    adj = edges.map_batches(
        lambda b: pa.table({
            "node": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.int64()),
                b.column(dst).combine_chunks().cast(pa.int64())]),
            "nbr": pa.concat_arrays([
                b.column(dst).combine_chunks().cast(pa.int64()),
                b.column(src).combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow")

    def _nb(b: pa.Table) -> pa.Table:
        h = hash64_column(b.column("node"))
        return b.append_column(
            "__nb", pa.array((h % np.uint64(shards)).astype(np.int32)))

    adj_k = adj.map_batches(
        lambda b: _nb(pa.table({
            "node": b.column("node"), "nbr": b.column("nbr"),
            "seed": pa.nulls(len(b), pa.int64()),
            "val": pa.nulls(len(b), pa.float64())})),
        batch_format="pyarrow").materialize()

    # δ state rides on the σ table: (seed, node, dist, sigma, delta)
    state = sig.map_batches(
        lambda b: b.append_column(
            "delta", pa.array(np.zeros(len(b), np.float64))),
        batch_format="pyarrow").materialize()

    for r in range(int(max_d), 0, -1):
        # deeper level's (1+δ)/σ ships keyed by the DEEPER node; the
        # bucket task fans it out to every neighbor edge
        def deep_rows(b: pa.Table, rr=r) -> pa.Table:
            f = b.filter(pc.equal(b.column("dist"), rr))
            val = pc.divide(
                pc.add(f.column("delta"), 1.0),
                pc.cast(f.column("sigma"), pa.float64()))
            return _nb(pa.table({
                "node": f.column("node"),
                "nbr": pa.nulls(len(f), pa.int64()),
                "seed": f.column("seed"),
                "val": val}))

        deep_k = state.map_batches(deep_rows, batch_format="pyarrow")

        def fanout(g: pa.Table) -> pa.Table:
            # numpy join (sort + searchsorted): Acero joins inside
            # map_groups workers proved crash-prone on this path —
            # seed/node are non-null int64 so the numpy route is exact
            is_deep = pc.is_valid(g.column("val")).to_numpy(
                zero_copy_only=False)
            empty = pa.table({"seed": pa.array([], pa.int64()),
                              "node": pa.array([], pa.int64()),
                              "contrib": pa.array([], pa.float64())})
            if not is_deep.any() or is_deep.all():
                return empty
            node = g.column("node").to_numpy(zero_copy_only=False)
            dp_node = node[is_deep].astype(np.int64)
            dp_seed = g.column("seed").to_numpy(
                zero_copy_only=False)[is_deep].astype(np.int64)
            dp_val = g.column("val").to_numpy(
                zero_copy_only=False)[is_deep].astype(np.float64)
            ad_node = node[~is_deep].astype(np.int64)
            ad_nbr = g.column("nbr").to_numpy(
                zero_copy_only=False)[~is_deep].astype(np.int64)
            order = np.argsort(ad_node, kind="stable")
            ad_node, ad_nbr = ad_node[order], ad_nbr[order]
            lo = np.searchsorted(ad_node, dp_node, side="left")
            hi = np.searchsorted(ad_node, dp_node, side="right")
            cnt = hi - lo
            if not cnt.sum():
                return empty
            rep = np.repeat(np.arange(len(dp_node)), cnt)
            # flat adjacency positions for each (deep row, its edges)
            pos = (np.repeat(lo, cnt)
                   + (np.arange(len(rep))
                      - np.repeat(np.cumsum(cnt) - cnt, cnt)))
            out = pd.DataFrame({"seed": dp_seed[rep],
                                "node": ad_nbr[pos],
                                "contrib": dp_val[rep]})
            agg = (out.groupby(["seed", "node"], as_index=False)["contrib"]
                      .sum())
            return pa.table({
                "seed": pa.array(agg["seed"].to_numpy(np.int64)),
                "node": pa.array(agg["node"].to_numpy(np.int64)),
                "contrib": pa.array(agg["contrib"].to_numpy(np.float64))})

        # materialize per stage: chaining both bucketed exchanges into
        # one lazy plan re-executes catastrophically (round time tripled
        # per level until the executor wedged; measured on a 5-node
        # path graph) — the eager cut keeps every round constant-cost
        contrib = (adj_k.union(deep_k).groupby("__nb")
                   .map_groups(fanout,
                               batch_format="pyarrow")).materialize()

        # fold into δ of the SHALLOWER endpoint only: a contribution
        # lands on (seed, v) iff dist(s,v) == r-1 (neighbors at equal
        # or deeper level are not shortest-path predecessors).  The
        # fold is a plain (seed, node) aggregate — the proven
        # seed_distances state-update shape — followed by a map:
        # contribution rows carry dist/sigma sentinels that Min() lets
        # the real state row overwrite, and contrib sums beside them.
        contrib_m = contrib.map_batches(
            lambda b: pa.table({
                "seed": b.column("seed"), "node": b.column("node"),
                "dist": pa.array(np.full(len(b), _SENT, np.int64)),
                "sigma": pa.array(np.zeros(len(b), np.int64)),
                "delta": pa.array(np.zeros(len(b), np.float64)),
                "contrib": b.column("contrib")}),
            batch_format="pyarrow")
        state_m = state.map_batches(
            lambda b: b.append_column(
                "contrib", pa.array(np.zeros(len(b), np.float64))),
            batch_format="pyarrow")

        folded = (contrib_m.union(state_m).groupby(["seed", "node"])
                  .aggregate(Min("dist", alias_name="dist"),
                             Max("sigma", alias_name="sigma"),
                             Sum("delta", alias_name="delta"),
                             Sum("contrib", alias_name="contrib")))

        def apply_contrib(b: pa.Table, rr=r) -> pa.Table:
            dist = b.column("dist").to_numpy(zero_copy_only=False)
            keep = dist < _SENT  # contrib-only groups: unreached nodes
            sigma = b.column("sigma").to_numpy(
                zero_copy_only=False)[keep]
            delta = b.column("delta").to_numpy(
                zero_copy_only=False)[keep]
            ctb = b.column("contrib").to_numpy(
                zero_copy_only=False)[keep]
            d = dist[keep]
            extra = np.where(d == rr - 1, sigma.astype(np.float64) * ctb,
                             0.0)
            return pa.table({
                "seed": pa.array(b.column("seed").to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)),
                "node": pa.array(b.column("node").to_numpy(
                    zero_copy_only=False)[keep].astype(np.int64)),
                "dist": pa.array(d.astype(np.int64)),
                "sigma": pa.array(sigma.astype(np.int64)),
                "delta": pa.array((delta + extra).astype(np.float64))})

        # cap the block count: the aggregate's pull-based shuffle
        # submits one reduce task per INPUT block, and union stacks
        # blocks — without the cap, state blocks (and thus next round's
        # task count) grow geometrically round over round (measured:
        # 3.2x per level until the scheduler wedged)
        state = (folded.map_batches(apply_contrib,
                                    batch_format="pyarrow")
                 .repartition(min(shards, 16)).materialize())

    def emit(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b.column("dist"), 0))
        return pa.table({"node": f.column("node"),
                         "delta": f.column("delta")})

    out = (state.map_batches(emit, batch_format="pyarrow")
           .groupby("node").aggregate(Sum("delta", alias_name="bc")))
    return out.sort("node")


def harmonic_from_seeds(edges, sources, *, src: str = "src",
                        dst: str = "dst", max_depth: int = 4,
                        shards: int = 64, scale: int | None = None):
    """Sampled harmonic centrality: per NODE, the sum of reciprocal hop
    distances from the seed sample — the centrality that stays
    well-defined on disconnected graphs (Boldi & Vigna 2014, "Axioms
    for centrality"), estimated from landmarks exactly like
    :func:`closeness_from_seeds`.

    Float-free evidence convention: reciprocals are emitted as
    ``scale // dist`` with ``scale`` = lcm(1..max_depth) by default, so
    every reciprocal is an EXACT integer and the op hash-matches SQL;
    the caller divides by ``scale`` (and rescales by n/|sources|) at
    read time.  One :func:`seed_distances` walk, then a node-keyed
    Sum/Count fold — node-scale output.

    Returns ``(node:int64, h_scaled:int64, n_seeds:int64)``, self rows
    excluded, sorted by the caller.
    """
    from math import lcm

    from ray.data.aggregate import Count, Sum

    if scale is None:
        scale = lcm(*range(1, max_depth + 1))
    for d in range(1, max_depth + 1):
        if scale % d:
            raise ValueError(f"scale {scale} not divisible by {d}")

    sd = seed_distances(edges, sources, src=src, dst=dst,
                        max_depth=max_depth, shards=shards)

    def recip(b: pa.Table) -> pa.Table:
        dist = b.column("dist").to_numpy(zero_copy_only=False)
        keep = dist > 0
        return pa.table({
            "node": pa.array(b.column("node").to_numpy(
                zero_copy_only=False)[keep].astype(np.int64)),
            "r": pa.array((scale // dist[keep]).astype(np.int64))})

    agg = (sd.map_batches(recip, batch_format="pyarrow")
           .groupby("node").aggregate(
               Sum("r", alias_name="h_scaled"),
               Count(alias_name="n_seeds")))
    return agg.map_batches(
        lambda t: pa.table({
            "node": t.column("node").cast(pa.int64()),
            "h_scaled": t.column("h_scaled").cast(pa.int64()),
            "n_seeds": t.column("n_seeds").cast(pa.int64())}),
        batch_format="pyarrow")
