"""Distributed k-means over an embedding column (Lloyd's algorithm).

The iterative-algorithm shape on Ray Data: centroids are TINY shared state
(k × d floats) broadcast to every task via the map_batches closure, and each
iteration is one streaming pass that reduces per-batch PARTIAL sums — a
(k × d) matrix and a k-vector of counts per batch — so the driver only ever
touches k × d numbers, never the dataset. At 100 TB the per-iteration cost is
one read + one small reduce; nothing materializes.

Assignment (:func:`kmeans_assign`) is an embarrassingly-parallel map:
``argmin_j ||x - c_j||²`` computed via the expanded form
``||x||² - 2 x·Cᵀ + ||c||²`` — one matmul per batch. Distances accumulate in
float64 regardless of the input column's float32 storage so ties resolve the
same way DuckDB's double-precision ``list_distance`` does.

Init is deterministic: the k rows with the smallest id column seed the
centroids (SQL-reproducible, no RNG to coordinate — the same reasoning as
curation.py's id-residue sampling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.functions.dedup import _emb_matrix


def _assign(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Row-wise argmin of squared L2 distance to each centroid (float64)."""
    # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row → drop it
    d = m @ cent.T  # (n, k)
    d *= -2.0
    d += (cent * cent).sum(axis=1)[None, :]
    return np.argmin(d, axis=1).astype(np.int64)


def seed_centroids(ds, *, emb_col: str = "embedding", id_col: str = "vec_id",
                   k: int = 8) -> np.ndarray:
    """Deterministic seeds: embeddings of the k smallest ids (one pruned
    read; SQL-expressible, so oracle queries can reproduce them)."""

    def pick(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch.column(id_col), k))
        return batch.select([id_col, emb_col])

    parts = [
        pa.table(b)
        for b in ds.map_batches(pick, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    ]
    t = pa.concat_tables([p for p in parts if p.num_rows] or parts[:1])
    order = pc.sort_indices(t.column(id_col))
    t = t.take(order)
    if t.num_rows != k:
        raise ValueError(f"need ids 0..{k-1} present, got {t.num_rows}")
    return _emb_matrix(t, emb_col)


def kmeans_fit(
    ds,
    *,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> np.ndarray:
    """Lloyd iterations; returns the final (k, d) float64 centroid matrix.

    Each iteration: one streaming pass emitting per-batch partial
    (sums, counts); the driver folds the partials (k × d values per batch —
    small by construction) and updates centroids. Empty clusters keep their
    previous centroid (the standard convention)."""
    cent = seed_centroids(ds, emb_col=emb_col, id_col=id_col, k=k)
    d = cent.shape[1]

    for _ in range(iters):
        c = cent  # bind current value into the closure

        def partial(batch: pa.Table, _c=c) -> pa.Table:
            m = _emb_matrix(batch, emb_col)
            lab = _assign(m, _c)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, lab, m)
            cnt = np.bincount(lab, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.ravel()], type=pa.list_(pa.float64())),
                    "cnt": pa.array([cnt], type=pa.list_(pa.int64())),
                }
            )

        sums = np.zeros((k, d), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            t = pa.table(b)
            for i in range(t.num_rows):
                sums += np.asarray(
                    t.column("sums")[i].values, dtype=np.float64
                ).reshape(k, d)
                cnt += np.asarray(t.column("cnt")[i].values, dtype=np.int64)
        nz = cnt > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / cnt[nz, None]
    return cent


def kmeans_assign(ds, centroids: np.ndarray, *, emb_col: str = "embedding",
                  id_col: str = "vec_id", out_col: str = "cluster"):
    """Dataset[(id_col, out_col)]: nearest-centroid label per row. The
    centroid matrix is broadcast once inside the closure (k × d floats)."""
    cent = np.asarray(centroids, dtype=np.float64)

    def fn(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        lab = _assign(m, cent)
        return pa.table(
            {id_col: batch.column(id_col), out_col: pa.array(lab)}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def kmeans_sizes(ds, centroids: np.ndarray, *, emb_col: str = "embedding",
                 id_col: str = "vec_id"):
    """Per-cluster row counts (partial bincount per batch + tiny groupby)."""
    cent = np.asarray(centroids, dtype=np.float64)
    k = cent.shape[0]

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        cnt = np.bincount(_assign(m, cent), minlength=k).astype(np.int64)
        return pa.table(
            {"cluster": pa.array(np.arange(k, dtype=np.int64)),
             "n": pa.array(cnt)}
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"))
    )
