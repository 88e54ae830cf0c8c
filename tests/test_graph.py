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
