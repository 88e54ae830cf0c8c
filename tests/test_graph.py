"""PageRank vs dense numpy power iteration."""
import numpy as np
import pyarrow as pa


def test_pagerank_vs_dense(ray_session):
    import ray.data as rd

    from clp_core_ray.functions.graph import pagerank

    rng = np.random.default_rng(11)
    n = 40
    # random directed graph, then symmetrize so no node dangles
    a = rng.random((n, n)) < 0.08
    np.fill_diagonal(a, False)
    a = a | a.T
    a[0] = a[:, 0] = False; a[0, 1] = a[1, 0] = True  # keep node 0 connected
    src, dst = np.nonzero(a)
    names = np.array([f"n{i:02d}" for i in range(n)])
    ds = rd.from_arrow(pa.table({"src": pa.array(names[src]),
                                 "dst": pa.array(names[dst])})).repartition(5)
    out = pagerank(ds, iters=4, ndigits=12).to_pandas() \
        .set_index("node")["rank"]

    # dense reference: column-stochastic matrix power iteration
    deg = a.sum(axis=1)
    present = deg > 0
    m = (a / deg[:, None]).T  # m[v,u] = 1/deg(u) if u->v
    r = np.full(n, 1.0 / present.sum())[present]
    mm = m[np.ix_(present, present)]
    for _ in range(4):
        r = 0.15 / present.sum() + 0.85 * mm @ r
    want = dict(zip(names[present], np.round(r, 12)))
    got = out.to_dict()
    assert got == want


def test_cooccurrence_pairs_vs_brute(ray_session):
    import itertools

    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.graph import cooccurrence_pairs

    rng = np.random.default_rng(9)
    baskets = rng.integers(0, 50, 2000)
    items = rng.integers(0, 30, 2000)
    ds = rd.from_arrow(pa.table({"b": pa.array(baskets),
                                 "i": pa.array(items)})).repartition(6)
    out = cooccurrence_pairs(ds, basket_col="b", item_col="i").to_pandas()
    got = {(r.item_a, r.item_b): r.cnt for r in out.itertuples()}

    want = {}
    per_basket = {}
    for b, i in zip(baskets, items):
        per_basket.setdefault(b, set()).add(i)
    for s in per_basket.values():
        for a, b in itertools.combinations(sorted(s), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_bfs_depths_small_graph(ray_session):
    """BFS min-depths on a hand-checked graph incl. an unreachable node
    and a shorter-path-wins case."""
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.graph import bfs_depths

    und = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (6, 7)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    t = bfs_depths(ds, source=1, max_depth=5)
    got = dict(zip(t.column("node").to_pylist(),
                   t.column("depth").to_pylist()))
    # 4 is reachable at depth 2 via 5 (not 3 via 2-3)
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}


def test_triangle_count_small_graphs(ray_session):
    """Triangle counts on hand-checked graphs: K4 has 4, a square has 0,
    a square + one diagonal has 2."""
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.graph import triangle_count

    def tc(edges):
        t = pa.table({"src": [a for a, b in edges],
                      "dst": [b for a, b in edges]})
        return triangle_count(rd.from_arrow(t).repartition(2))

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert tc(k4) == 4
    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert tc(square) == 0
    assert tc(square + [(1, 3)]) == 2
