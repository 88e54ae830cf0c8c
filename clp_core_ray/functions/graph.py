"""Distributed graph analytics over edge Datasets.

PageRank as K streaming passes over the edge list: the rank vector — one
float per node, the same driver-state shape as k-means centroids
(clustering.py) — broadcasts via plasma each iteration; every edge batch
emits per-destination contribution partials that a groupby folds. The edge
Dataset is materialized once into the object store (iterative algorithms
re-read their input by construction; blocks spill under pressure) and
never touches the driver.

Scale assumptions, documented per the custom-operator rule: the edge list
is unbounded (streams, shuffles partially-aggregated contributions); the
NODE table must fit in one object-store object (rank vector broadcast) —
the same bound k-means places on centroids × dims. For node sets beyond
that, the rank join flips to auto_join's hash-partitioned path; not needed
at any tested scale.

Connected components live in functions/dedup.py (pointer jumping); this
module owns value-propagation algorithms.
"""

from __future__ import annotations

import math

import numpy as np

from clp_core_ray.pipelines.aggregate import \
    sql_round as _sql_round
import pyarrow as pa
import pyarrow.compute as pc


def _fold(ds) -> pa.Table:
    out = [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    return pa.concat_tables(out) if out else pa.table({})


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             damping: float = 0.85, iters: int = 3,
             ndigits: int = 9):
    """PageRank over a directed edge Dataset (dangling-free graphs).

    rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u)/outdeg(u), uniform
    init 1/N. Callers with dangling nodes should symmetrize their edges
    first (the classic bipartite treatment); with no dangling nodes the
    iteration preserves total mass 1 exactly, which is asserted.

    Each iteration: one map_batches over edges (vectorized gather of
    rank/outdeg by pc.index_in + per-batch groupby-sum partials) → one
    small groupby exchange (≤ one row per node per batch) → a node-sized
    fold on the driver. Returns a Dataset (node, rank) with rank rounded
    to ``ndigits`` so results hash-match a chained-CTE SQL oracle.
    """
    import ray
    import ray.data as rd

    edges = edges_ds.materialize()

    # out-degree + node universe (symmetric graphs: src set == node set)
    def deg_partial(b: pa.Table) -> pa.Table:
        out = b.select([src_col]).group_by([src_col]).aggregate(
            [(src_col, "count")])
        return out.rename_columns(["node", "deg"])

    from ray.data.aggregate import Sum

    deg_tbl = _fold(edges.map_batches(deg_partial, batch_format="pyarrow")
                    .groupby("node").aggregate(Sum("deg", alias_name="deg")))
    nodes = deg_tbl.column("node").combine_chunks()
    deg = np.asarray(deg_tbl.column("deg"), dtype=np.float64)
    n = len(nodes)
    rank = np.full(n, 1.0 / n)

    for _ in range(iters):
        state = ray.put((nodes, rank / deg))

        def contrib(b: pa.Table, _state=state) -> pa.Table:
            nd, w = ray.get(_state)
            si = np.asarray(pc.index_in(b.column(src_col), value_set=nd),
                            dtype=np.int64)
            t = pa.table({"node": b.column(dst_col),
                          "_c": pa.array(w[si])})
            return t.group_by(["node"]).aggregate([("_c", "sum")]) \
                .rename_columns(["node", "_c"])

        folded = _fold(edges.map_batches(contrib, batch_format="pyarrow")
                       .groupby("node").aggregate(Sum("_c", alias_name="_c")))
        idx = np.asarray(pc.index_in(folded.column("node"), value_set=nodes),
                         dtype=np.int64)
        inc = np.zeros(n)
        inc[idx] = np.asarray(folded.column("_c"), dtype=np.float64)
        rank = (1.0 - damping) / n + damping * inc
        # n float64 partial sums accumulate ~n·eps error — scale the mass
        # tolerance with n or the check fires spuriously at ~1e7 nodes
        assert abs(math.fsum(rank) - 1.0) < max(1e-9, n * 1e-15), \
            "mass leak: dangling nodes?"

    return rd.from_arrow(pa.table({
        "node": nodes, "rank": pa.array(_sql_round(rank, ndigits))}))


def cooccurrence_pairs(ds, *, basket_col: str, item_col: str,
                       top_k: int | None = None):
    """Market-basket co-occurrence: count (item_a < item_b) pairs that
    share a basket — the edge-building step for co-purchase / co-view
    graphs and item-item recommenders.

    Distinct (basket, item) rows reduce per batch then shuffle once into
    max(64, 4·CPUs) hash-coarse buckets (the dedup module's bucket rule);
    inside a bucket one lexsort finds basket runs and pair expansion is
    repeat/arange arithmetic — no Python per basket. Pair counts are
    partial-aggregated before the final (item_a, item_b) exchange.
    Basket sizes are domain-bounded (orders, sessions); a pathological
    mega-basket would expand quadratically — callers with such data
    should pre-cap baskets (the LSH star-cap treatment).
    """
    from clp_core_ray.pipelines.aggregate import count_by
    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = scaled_buckets()
    distinct = count_by(ds, [basket_col, item_col]) \
        .select_columns([basket_col, item_col])

    def bucket(b: pa.Table) -> pa.Table:
        # Knuth multiplicative hash on the basket id (int keys by contract)
        k = np.asarray(b.column(basket_col), dtype=np.int64).view(np.uint64)
        h = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column("_bk", pa.array((h % nb).astype(np.int64)))

    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table({"item_a": pa.array([], type=pa.int64()),
                          "item_b": pa.array([], type=pa.int64()),
                          "cnt": pa.array([], type=pa.int64())})
        m = len(g)
        if m < 2:
            return empty
        bk = np.asarray(g.column(basket_col), dtype=np.int64)
        it = np.asarray(g.column(item_col), dtype=np.int64)
        order = np.lexsort((it, bk))
        bk, it = bk[order], it[order]
        new_run = np.ones(m, dtype=bool)
        new_run[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, m))
        run_of_row = np.cumsum(new_run) - 1
        pos = np.arange(m) - starts[run_of_row]
        c = counts[run_of_row] - 1 - pos  # pairs this row opens
        total = int(c.sum())
        if total == 0:
            return empty
        left = np.repeat(np.arange(m), c)
        offs = np.arange(total) - np.repeat(np.cumsum(c) - c, c)
        right = left + 1 + offs
        t = pa.table({"item_a": pa.array(it[left]),
                      "item_b": pa.array(it[right])})
        return t.group_by(["item_a", "item_b"]).aggregate(
            [("item_a", "count")]).rename_columns(
            ["item_a", "item_b", "cnt"])

    from ray.data.aggregate import Sum

    pairs = (distinct.map_batches(bucket, batch_format="pyarrow")
             .groupby("_bk")
             .map_groups(expand, batch_format="pyarrow")
             .groupby(["item_a", "item_b"])
             .aggregate(Sum("cnt", alias_name="cnt")))
    if top_k is None:
        return pairs
    return pairs.sort(["cnt", "item_a", "item_b"],
                      descending=[True, False, False]).limit(top_k)


def bfs_depths(edges_ds, *, source: int, max_depth: int,
               src_col: str = "src", dst_col: str = "dst"):
    """Distributed frontier BFS: min hop-depth from ``source`` to every
    reachable node within ``max_depth`` (the k-hop-neighborhood /
    blast-radius primitive).

    Iterative like pagerank: per hop the CURRENT FRONTIER broadcasts via
    plasma (node-table-bounded, the module's documented state bound) and
    every edge batch emits destinations whose source is in the frontier —
    the edge list itself streams and is never collected. New nodes fold
    through one distinct exchange per hop; depths accumulate driver-side
    in the same node-bounded map the rank vector uses. Directed semantics:
    pass both orientations for an undirected graph.

    Returns pa.Table[(node, depth)] sorted by (depth, node).
    """
    import ray
    import ray.data as rd

    edges = edges_ds.materialize()  # re-read per hop, blocks spill
    depth: dict[int, int] = {int(source): 0}
    frontier = np.array([source], dtype=np.int64)
    for d in range(1, max_depth + 1):
        fr = ray.put(np.sort(frontier))

        def nbrs(b: pa.Table, _fr=fr) -> pa.Table:
            f = ray.get(_fr)
            s = np.asarray(b.column(src_col), dtype=np.int64)
            pos = np.searchsorted(f, s)
            pos[pos >= len(f)] = 0
            hit = f[pos] == s
            out = np.unique(np.asarray(b.column(dst_col),
                                       dtype=np.int64)[hit])
            return pa.table({"node": pa.array(out)})

        found = _fold(edges.map_batches(nbrs, batch_format="pyarrow")
                      .groupby("node").count())
        if found.num_rows == 0:
            break
        cand = np.asarray(found.column("node"), dtype=np.int64)
        new = cand[~np.isin(cand, np.fromiter(depth, np.int64,
                                              count=len(depth)))]
        if len(new) == 0:
            break
        for n in new.tolist():
            depth[n] = d
        frontier = new
    nodes = np.fromiter(depth, np.int64, count=len(depth))
    ds_ = np.fromiter(depth.values(), np.int64, count=len(depth))
    order = np.lexsort((nodes, ds_))
    return pa.table({"node": pa.array(nodes[order]),
                     "depth": pa.array(ds_[order])})


def triangle_count(edges_ds, *, src_col: str = "src",
                   dst_col: str = "dst") -> int:
    """Global triangle count over CANONICAL edges (src < dst), the
    graph-quality / clustering-coefficient primitive.

    Two bucketed vectorized stages (no driver-side adjacency, no per-node
    Python): (1) wedge generation — every edge feeds its endpoints'
    middle-node lists; inside each mid-hash bucket one lexsort + arithmetic
    cross-product expands (a, c) wedge endpoints per middle and
    pre-aggregates their multiplicity (#common middles) before the
    exchange; (2) closure test — wedge rows union with the edge set,
    bucket on a mixed pair hash, and each bucket sums multiplicities of
    pairs present in the edge set. Hub skew caveat: wedges per middle are
    deg_lo x deg_hi (the cooccurrence module's star-cap note applies to
    pathological hubs)."""
    import ray

    from clp_core_ray.pipelines.temporal import _key_and_bucket
    from clp_core_ray.pipelines.windows import scaled_buckets

    nb = scaled_buckets()

    def mid_rows(b: pa.Table) -> pa.Table:
        a = np.asarray(b.column(src_col), dtype=np.int64)
        c = np.asarray(b.column(dst_col), dtype=np.int64)
        # edge (a,c): a joins c's LOWER list, c joins a's UPPER list
        mid = np.r_[c, a]
        other = np.r_[a, c]
        side = np.r_[np.zeros(len(a), np.int8), np.ones(len(c), np.int8)]
        t = pa.table({"mid": pa.array(mid), "other": pa.array(other),
                      "side": pa.array(side)})
        _, bk = _key_and_bucket(t.column("mid"), nb)
        return t.append_column("_mb", bk)

    def wedges(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_mb"])
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "c": pa.array([], type=pa.int64()),
                          "w": pa.array([], type=pa.int64())})
        n = g.num_rows
        if n == 0:
            return empty
        mid = np.asarray(g.column("mid"), dtype=np.int64)
        other = np.asarray(g.column("other"), dtype=np.int64)
        side = np.asarray(g.column("side"), dtype=np.int8)
        order = np.lexsort((other, side, mid))
        mid, other, side = mid[order], other[order], side[order]
        brk = np.ones(n, dtype=bool)
        brk[1:] = mid[1:] != mid[:-1]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n]
        # per mid-run: lower block first (side 0), upper block second
        split = starts + np.add.reduceat((side == 0).astype(np.int64),
                                         starts)
        n0 = split - starts
        n1 = ends - split
        prod = n0 * n1
        total = int(prod.sum())
        if total == 0:
            return empty
        cs = np.concatenate([[0], np.cumsum(prod)[:-1]])
        off = np.arange(total, dtype=np.int64) - np.repeat(cs, prod)
        n1r = np.repeat(n1, prod)
        lo = np.repeat(starts, prod) + off // n1r
        hi = np.repeat(split, prod) + off % n1r
        t = pa.table({"a": pa.array(other[lo]), "c": pa.array(other[hi]),
                      "w": pa.array(np.ones(total, dtype=np.int64))})
        out = t.group_by(["a", "c"]).aggregate([("w", "sum")])
        return out.rename_columns(["a", "c", "w"])

    def _pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a"), dtype=np.int64).view(np.uint64)
        c = np.asarray(t.column("c"), dtype=np.int64).view(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ c
        h = (h ^ (h >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
        return t.append_column(
            "_pb", pa.array((h % np.uint64(nb)).astype(np.int32))), h

    def wedge_side(b: pa.Table) -> pa.Table:
        t = pa.table({"a": b.column("a"), "c": b.column("c"),
                      "w": b.column("w")})
        t, _ = _pair_bucket(t)
        return t

    def edge_side(b: pa.Table) -> pa.Table:
        t = pa.table({"a": b.column(src_col), "c": b.column(dst_col),
                      "w": pa.array(np.full(b.num_rows, -1,
                                            dtype=np.int64))})
        t, _ = _pair_bucket(t)
        return t

    def close(g: pa.Table) -> pa.Table:
        w = np.asarray(g.column("w"), dtype=np.int64)
        a = np.asarray(g.column("a"), dtype=np.int64).view(np.uint64)
        c = np.asarray(g.column("c"), dtype=np.int64).view(np.uint64)
        key = ((a * np.uint64(0x9E3779B97F4A7C15)) ^ c).view(np.int64)
        ek = np.sort(key[w < 0])
        wk = key[w > 0]
        ww = w[w > 0]
        if len(ek) == 0 or len(wk) == 0:
            return pa.table({"t": pa.array([0], type=pa.int64())})
        pos = np.searchsorted(ek, wk)
        pos[pos >= len(ek)] = 0
        hit = ek[pos] == wk
        return pa.table({"t": pa.array([int(ww[hit].sum())],
                                       type=pa.int64())})

    wedge_ds = (edges_ds.map_batches(mid_rows, batch_format="pyarrow")
                .groupby("_mb").map_groups(wedges, batch_format="pyarrow")
                .map_batches(wedge_side, batch_format="pyarrow"))
    edge_tagged = edges_ds.map_batches(edge_side, batch_format="pyarrow")
    parts = (wedge_ds.union(edge_tagged)
             .groupby("_pb").map_groups(close, batch_format="pyarrow"))
    tot = 0
    for b in parts.iter_batches(batch_format="pyarrow"):
        tot += sum(x or 0 for x in pa.table(b).column("t").to_pylist())
    return tot
