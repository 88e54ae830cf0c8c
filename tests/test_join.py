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
