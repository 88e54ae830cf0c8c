"""HyperLogLog sketch: accuracy, determinism, merge associativity."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from clp_core_ray.functions.sketch import (
    _estimate,
    _hash_col,
    _registers,
    approx_distinct,
)


def test_register_rank_vectorization():
    # brute-force rank check against int.bit_length on random hashes
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**63, 5000, dtype=np.int64).astype(np.uint64)
    p = 10
    regs = _registers(h, p)
    exp = np.zeros(1 << p, dtype=np.uint8)
    for hv in h.tolist():
        idx = hv >> (64 - p)
        w = (hv << p) & ((1 << 64) - 1)
        rank = (64 - w.bit_length() + 1) if w else (64 - p + 1)
        rank = min(rank, 64 - p + 1)
        exp[idx] = max(exp[idx], rank)
    assert np.array_equal(regs, exp)


def test_estimate_accuracy_ranges():
    rng = np.random.default_rng(1)
    for true_n in (50, 1000, 40_000, 300_000):
        vals = rng.integers(0, 2**62, true_n, dtype=np.int64)
        h = _hash_col(pa.array(np.unique(vals)))
        est = _estimate(_registers(h, 12))
        assert abs(est - len(np.unique(vals))) / len(np.unique(vals)) < 0.05


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_dataset():
    n, dup = 30_000, 3
    ids = np.repeat(np.arange(n, dtype=np.int64), dup)
    ds = rd.from_arrow(pa.table({"x": pa.array(ids)})).repartition(6)
    est = approx_distinct(ds, "x", p=12)
    assert abs(est - n) / n < 0.05
    # deterministic across runs (fixed hash, max-fold is order-free)
    assert est == approx_distinct(ds, "x", p=12)
    # string column path
    ds2 = rd.from_arrow(
        pa.table({"s": pa.array([f"u{i % 5000}" for i in range(20_000)])})
    ).repartition(4)
    est2 = approx_distinct(ds2, "s", p=12)
    assert abs(est2 - 5000) / 5000 < 0.05


def test_heavy_hitters_zipf(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.4, size=60000) % 5000
    true = {}
    for v in vals.tolist():
        true[v] = true.get(v, 0) + 1
    ds = rd.from_arrow(pa.table({"u": pa.array(vals, type=pa.int64())})
                       ).repartition(8)
    out = heavy_hitters(ds, "u", k=10, capacity=64)
    got = dict(zip(out.column("u").to_pylist(),
                   zip(out.column("cnt_min").to_pylist(),
                       out.column("cnt_max").to_pylist())))
    err = out.column("cnt_max")[0].as_py() - out.column("cnt_min")[0].as_py()
    # bounds bracket the truth for every reported value
    for v, (lo, hi) in got.items():
        assert lo <= true[v] <= hi, (v, lo, true[v], hi)
    # every value heavier than the error bound is reported (top-10 slice)
    heavy = sorted(true.items(), key=lambda kv: -kv[1])[:10]
    for v, c in heavy:
        if c > err:
            assert v in got
    # exact when capacity exceeds per-batch cardinality
    small = rd.from_arrow(pa.table(
        {"u": pa.array(([1] * 50) + ([2] * 30) + ([3] * 20), type=pa.int64())}))
    ex = heavy_hitters(small, "u", k=3, capacity=100)
    assert ex.column("cnt_min").to_pylist() == ex.column("cnt_max").to_pylist() \
        == [50, 30, 20]


def test_approx_quantiles(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(5)
    x = rng.lognormal(0.0, 1.5, size=200000)  # heavy-tailed continuous
    ds = rd.from_arrow(pa.table({"x": pa.array(x)})).repartition(16)
    qs = (0.01, 0.25, 0.5, 0.9, 0.99)
    est = approx_quantiles(ds, "x", qs, sketch_size=2048)
    xs = np.sort(x)
    for q in qs:
        # rank error bound: position of the estimate within the sorted
        # sample must be within ~2/sketch_size of the target rank
        pos = np.searchsorted(xs, est[q]) / len(xs)
        assert abs(pos - q) < 3.0 / 2048 + 2e-3, (q, pos, est[q])

    # deterministic: rerun gives bit-identical estimates
    est2 = approx_quantiles(ds, "x", qs, sketch_size=2048)
    assert est == est2

    # nulls ignored; tiny input exact
    t = pa.table({"x": pa.array([1.0, None, 3.0, 2.0])})
    e = approx_quantiles(rd.from_arrow(t), "x", (0.5,))
    assert e[0.5] == 2.0


def test_approx_distinct_by(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.sketch import approx_distinct_by

    rng = np.random.default_rng(23)
    keys = np.array(["a", "b", "c"])[rng.choice(3, size=120000)]
    truth = {"a": 5000, "b": 300, "c": 40}
    vals = np.array([rng.integers(0, truth[k]) for k in keys.tolist()],
                    dtype=np.int64)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = approx_distinct_by(
        rd.from_arrow(t).repartition(8), "k", "v").to_pandas()
    got = dict(zip(out["k"], out["approx_distinct"]))
    assert set(got) == {"a", "b", "c"}
    for k, n in truth.items():
        assert abs(got[k] - n) / n < 0.08, (k, got[k], n)
    # deterministic across reruns
    out2 = approx_distinct_by(
        rd.from_arrow(t).repartition(8), "k", "v").to_pandas()
    assert dict(zip(out2["k"], out2["approx_distinct"])) == got


def test_approx_quantiles_by(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.sketch import approx_quantiles_by

    rng = np.random.default_rng(29)
    keys = np.array(["a", "b"])[rng.choice(2, size=100000, p=[0.8, 0.2])]
    x = np.where(keys == "a",
                 rng.normal(100, 10, 100000),
                 rng.lognormal(0, 1, 100000))
    t = pa.table({"k": pa.array(keys), "x": pa.array(x)})
    out = approx_quantiles_by(
        rd.from_arrow(t).repartition(8), "k", "x", (0.5, 0.9)).to_pandas()
    got = out.set_index("k")
    for k in ("a", "b"):
        xs = np.sort(x[keys == k])
        for q, colname in ((0.5, "q_50"), (0.9, "q_90")):
            pos = np.searchsorted(xs, got.loc[k, colname]) / len(xs)
            assert abs(pos - q) < 3.0 / 512 + 5e-3, (k, q, pos)
    # null values ignored
    t2 = pa.table({"k": ["z", "z", "z"],
                   "x": pa.array([1.0, None, 3.0])})
    o2 = approx_quantiles_by(rd.from_arrow(t2), "k", "x", (0.5,)).to_pandas()
    assert o2.loc[0, "q_50"] in (1.0, 3.0)


def test_approx_distinct_window_vs_exact(ray_session):
    """HLL windowed distinct within 5% of the exact WAU operator on the
    same Ray input, same day set, deterministic across runs."""
    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.sketch import approx_distinct_window
    from clp_core_ray.pipelines.windows import trailing_distinct_count

    rng = np.random.default_rng(29)
    n = 20000
    day = rng.integers(0, 20, n)
    users = rng.integers(0, 3000, n)
    base = 1_700_000_000_000_000
    ts = pa.array(base + day * 86_400_000_000 +
                  rng.integers(0, 86_400_000_000, n),
                  type=pa.timestamp("us"))
    tbl = pa.table({"u": pa.array(users), "ts": ts})
    ds = rd.from_arrow(tbl).repartition(5)
    exact = trailing_distinct_count(ds, key_col="u", ts_col="ts",
                                    window_days=7).to_pandas() \
        .set_index("day")["wau"]
    approx = approx_distinct_window(ds, key_col="u", ts_col="ts",
                                    window_days=7).to_pandas() \
        .set_index("day")["approx_wau"]
    assert set(exact.index) == set(approx.index)
    rel = np.abs(approx.sort_index().values - exact.sort_index().values) \
        / exact.sort_index().values
    assert rel.max() < 0.05, rel.max()
    again = approx_distinct_window(ds, key_col="u", ts_col="ts",
                                   window_days=7).to_pandas() \
        .set_index("day")["approx_wau"]
    assert (again.sort_index() == approx.sort_index()).all()


def test_cms_point_queries_bounded(ray_session):
    """CMS estimates never undercount and stay within eps*N of truth;
    merged-across-partitions sketch equals a single-partition build."""
    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.sketch import cms_build, cms_query

    rng = np.random.default_rng(41)
    # zipf-ish: few heavy keys, long tail
    keys = np.concatenate([
        np.repeat(np.arange(10, dtype=np.int64), 2000),
        rng.integers(100, 40000, 30000),
    ])
    rng.shuffle(keys)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(8)
    sketch, n = cms_build(ds, "k", width=2048, depth=4)
    assert n == len(keys)
    true = {k: int(c) for k, c in
            zip(*np.unique(keys, return_counts=True))}
    probe = list(range(10)) + [99999]  # heavies + one absent key
    est = cms_query(sketch, np.asarray(probe, dtype=np.int64))
    eps_n = (np.e / 2048) * n
    for k, e in zip(probe, est):
        t = true.get(k, 0)
        assert e >= t, (k, e, t)
        assert e <= t + eps_n, (k, e, t, eps_n)
    # determinism / merge-associativity: 1 partition == 8 partitions
    s1, _ = cms_build(rd.from_arrow(pa.table({"k": pa.array(keys)})), "k",
                      width=2048, depth=4)
    assert (s1 == sketch).all()


def test_grouped_ntile_vs_duckdb(ray_session):
    """grouped_ntile == SQL NTILE across remainder splits, n < tiles,
    string keys, and float values."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from clp_core_ray.pipelines.windows import grouped_ntile

    rng = np.random.default_rng(42)
    n = 5000
    t = pa.table({
        "eid": pa.array(np.arange(n, dtype=np.int64)),
        "g": pa.array(rng.choice(["x", "y", "z", "tiny"], n,
                                 p=[0.45, 0.45, 0.0994, 0.0006])),
        "v": pa.array(rng.normal(0, 3, n)),
    })
    for k in (3, 4, 7):
        got = (grouped_ntile(rd.from_arrow(t).repartition(6), key="g",
                             val_col="v", row_id_col="eid", n_tiles=k)
               .to_pandas().set_index("eid")["tile"].sort_index())
        want = duckdb.sql(
            f"SELECT eid, ntile({k}) OVER (PARTITION BY g ORDER BY v, eid)"
            " AS tile FROM t ORDER BY eid").df().set_index("eid")["tile"]
        assert (got.values == want.values).all(), k
