"""k-means (functions/clustering.py): brute-force parity + Lloyd invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from clp_core_ray.functions.clustering import (
    _assign,
    kmeans_assign,
    kmeans_fit,
    kmeans_sizes,
    seed_centroids,
)


def _mk(n=300, d=8, k=4, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(k, d)) * 5
    m = (base[rng.integers(0, k, n)] + rng.normal(size=(n, d))).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
        }
    )


def test_assign_matches_bruteforce():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(50, 6))
    cent = rng.normal(size=(5, 6))
    lab = _assign(m, cent)
    brute = np.argmin(
        ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2), axis=1
    )
    assert (lab == brute).all()


@pytest.mark.usefixtures("ray_session")
def test_kmeans_fit_decreases_inertia_and_is_deterministic():
    t = _mk()
    ds = rd.from_arrow(t).repartition(4)

    def inertia(cent):
        m = np.asarray(t.column("embedding").combine_chunks().flatten(),
                       dtype=np.float64).reshape(t.num_rows, -1)
        lab = _assign(m, cent)
        return float(((m - cent[lab]) ** 2).sum())

    c0 = seed_centroids(ds, k=4)
    prev = inertia(c0)
    for it in (1, 2, 4):
        c = kmeans_fit(ds, k=4, iters=it)
        cur = inertia(c)
        assert cur <= prev + 1e-9
        prev = cur
    # deterministic across independent runs
    assert np.array_equal(kmeans_fit(ds, k=4, iters=3), kmeans_fit(ds, k=4, iters=3))


@pytest.mark.usefixtures("ray_session")
def test_kmeans_sizes_sum_and_match_assign():
    t = _mk(n=200, k=3)
    ds = rd.from_arrow(t).repartition(3)
    cent = kmeans_fit(ds, k=3, iters=2)
    sizes = kmeans_sizes(ds, cent).to_pandas().set_index("cluster")["n"]
    lab = kmeans_assign(ds, cent).to_pandas()
    counted = lab.groupby("cluster").size()
    assert sizes.sum() == t.num_rows
    for cl, n in counted.items():
        assert sizes.get(cl, 0) == n
