"""Join strategy selection: broadcast vs partitioned hash join."""

import numpy as np
import pyarrow as pa
import pytest

from clp_core_ray.pipelines import join as J


def _sides(n_left=20000, n_right=500, seed=5):
    rng = np.random.default_rng(seed)
    left = pa.table({"k": rng.integers(0, n_right + 50, size=n_left),
                     "x": rng.integers(0, 100, size=n_left)})
    right = pa.table({"rk": np.arange(n_right, dtype=np.int64),
                      "name": np.array([f"n{i % 23}" for i in range(n_right)])})
    return left, right


def _counts(ds, col="name"):
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for r in t.to_pylist():
            out[r[col]] = out.get(r[col], 0) + 1
    return out


def _expected(left, right):
    import pandas as pd

    df = left.to_pandas().merge(
        right.to_pandas(), left_on="k", right_on="rk", how="inner"
    )
    return df.groupby("name").size().to_dict()


def test_hash_join_matches_broadcast(ray_session):
    import ray.data as rd

    left, right = _sides()
    lds = rd.from_arrow(left).repartition(6)

    bro = J.broadcast_join(lds, right, "k", "rk", ["name"])
    bro_counts = _counts(bro.filter(lambda r: r["name"] is not None))

    hj = J.hash_join(rd.from_arrow(left).repartition(6),
                     rd.from_arrow(right), "k", "rk", num_partitions=4)
    hj_counts = _counts(hj)

    assert bro_counts == hj_counts == _expected(left, right)


def test_auto_join_picks_by_size(ray_session):
    import ray.data as rd

    left, right = _sides(5000, 200)
    lds = rd.from_arrow(left).repartition(4)

    # tiny cap forces the hash path; huge cap forces broadcast — results agree
    hashed = J.auto_join(lds, rd.from_arrow(right), "k", "rk", ["name"],
                         broadcast_cap=1)
    bro = J.auto_join(rd.from_arrow(left).repartition(4), right, "k", "rk",
                      ["name"], broadcast_cap=1 << 30)
    want = _expected(left, right)
    assert _counts(hashed) == want
    assert _counts(bro.filter(lambda r: r["name"] is not None)) == want


def test_estimated_bytes():
    t = pa.table({"a": np.arange(1000)})
    assert J.estimated_bytes(t) == t.nbytes


def test_bloom_semi_join_paths(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.pipelines.join import bloom_semi_join, build_bloom

    rng = np.random.default_rng(3)
    left_keys = rng.integers(0, 1000, size=5000)
    right_keys = np.unique(rng.integers(0, 1000, size=200))
    left = rd.from_arrow(pa.table({
        "k": pa.array(left_keys, type=pa.int64()),
        "v": pa.array(np.arange(5000, dtype=np.int64)),
    }))
    # right side with duplicate keys: inner-join verify must not multiply rows
    right = rd.from_arrow(pa.table({
        "k": pa.array(np.repeat(right_keys, 3), type=pa.int64())}))
    expect = sorted(
        int(v) for k, v in zip(left_keys, range(5000)) if k in set(right_keys))

    # broadcast verify path
    out = bloom_semi_join(left, right, "k").to_pandas()
    assert sorted(out["v"].tolist()) == expect
    # hash-join verify path (force it with a zero broadcast budget)
    out2 = bloom_semi_join(left, right, "k", broadcast_cap=0).to_pandas()
    assert sorted(out2["v"].tolist()) == expect
    # bloom-only: superset of the exact result, subset of left
    sup = bloom_semi_join(left, right, "k", exact=False).to_pandas()
    assert set(expect) <= set(sup["v"].tolist())
    assert len(sup) <= 5000

    # string keys hash through the same FNV family
    sl = rd.from_arrow(pa.table({"s": ["a", "b", "c", "d", "a"]}))
    sr = rd.from_arrow(pa.table({"s": ["a", "d", "zz"]}))
    so = bloom_semi_join(sl, sr, "s").to_pandas()
    assert sorted(so["s"].tolist()) == ["a", "a", "d"]

    # filter bits: every right key probes positive (no false negatives)
    bits = build_bloom(right, "k")
    from clp_core_ray.functions.sketch import _hash_col
    from clp_core_ray.pipelines.join import _bloom_positions
    posn = _bloom_positions(
        _hash_col(pa.array(right_keys, type=pa.int64())), 23, 5)
    hit = (bits[posn >> 6] >> (posn & 63).astype(np.uint64)
           & np.uint64(1)).astype(bool).all(axis=1)
    assert hit.all()
