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


def test_pca_fit_project_invariants(ray_session):
    """Streamed-moment PCA == numpy PCA on the same data (components up to
    sign — fit canonicalizes sign, so exact compare), projections match,
    explained variance descends."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.linalg import pca_fit, pca_project

    rng = np.random.default_rng(3)
    # anisotropic cloud so the spectrum is well separated
    base = rng.normal(size=(400, 6)) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    mix = rng.normal(size=(6, 6))
    x = (base @ mix).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x)), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), 6),
    })
    ds = rd.from_arrow(t).repartition(4)
    mean, comps = pca_fit(ds, k=3)

    xd = x.astype(np.float64)
    assert np.allclose(mean, xd.mean(axis=0), atol=1e-9)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # matches numpy eigh of the exact covariance (up to sign, which fit
    # canonicalizes; re-canonicalize the numpy side the same way)
    cov = np.cov(xd, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    ref = v[:, np.argsort(w)[::-1][:3]].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]
    assert np.allclose(comps, ref, atol=1e-6)
    # explained variance descending
    var = np.array([(xd - xd.mean(0)) @ c for c in comps])
    ev = (var ** 2).mean(axis=1)
    assert ev[0] >= ev[1] >= ev[2]

    proj = pca_project(ds, mean, comps).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    got = np.stack(proj["proj"].to_numpy())
    want = (xd - xd.mean(0)) @ comps.T
    assert np.allclose(got, want, atol=1e-6)


def test_gram_int_exact(ray_session):
    """Quantized Gram sums equal the direct integer computation regardless
    of batch/partition layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.linalg import gram_int

    rng = np.random.default_rng(11)
    x = rng.normal(size=(123, 5)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(x)), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1)), 5),
    })
    out = gram_int(rd.from_arrow(t).repartition(7),
                   emb_col="embedding").to_pandas()
    q = np.floor(x.astype(np.float64) * 1024).astype(np.int64)
    g = q.T @ q
    for _, r in out.iterrows():
        assert g[int(r.i), int(r.j)] == int(r.sxy)
    assert len(out) == 15  # 5*6/2 upper triangle
