"""Distributed linear algebra over an embedding column: second-moment (Gram)
accumulation and PCA projection.

The scale shape is the two-pass moment pattern (same driver-state discipline
as clustering.py's k-means): every batch reduces to an O(d²) partial — a d×d
product-sum matrix, a d-vector of sums and a count — so the exchange volume
per batch is constant in the row count, the driver only ever folds d×d
numbers, and the dataset itself never materializes. Projection is then an
embarrassingly-parallel map with the (k × d) component matrix broadcast in
the task closure.

Oracle strategy (the repo's integer-exact-core pattern, cf. text.tf_df_table):
float sums are order-dependent, so the CHECKABLE query quantizes q =
floor(x · 1024) — exact in double for float32 inputs because 1024 is a power
of two — and ships integer Gram sums, which are associative and reproducible
bit-for-bit by DuckDB. The float PCA (fit + project) is validated by pytest
invariants (orthonormal components, descending explained variance, projection
equals numpy PCA on the same data up to per-component sign).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clp_core_ray.functions.dedup import _emb_matrix

QUANT_SCALE = 1024.0  # 2^10: float32 * 1024 is exact in float64


def gram_int(ds, *, emb_col: str = "embedding", scale: float = QUANT_SCALE):
    """Integer-exact upper-triangle Gram sums of quantized embeddings.

    Returns Dataset[(i:int64, j:int64, sxy:int64)] with i ≤ j and
    sxy = Σ_rows floor(x_i·scale) · floor(x_j·scale) — the reproducible core
    of a covariance/PCA computation. Per batch the map emits d(d+1)/2 rows
    (constant in row count); a small groupby folds batches.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        q = np.floor(_emb_matrix(batch, emb_col) * scale).astype(np.int64)
        d = q.shape[1]
        g = q.T @ q  # (d, d) int64; |q|≲4k → safe to ~1e8 rows per batch
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "sxy": pa.array(g[iu, ju]),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("sxy", alias_name="sxy"))
    )


def moments(ds, *, emb_col: str = "embedding"):
    """One streaming pass → (n, sum: (d,), prod_sum: (d, d)) in float64.

    Per-batch partials ride as ONE row each (two list columns + a count);
    the driver folds rows — O(d²) state, never the data.
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        return pa.table({
            "n": pa.array([len(m)], type=pa.int64()),
            "s": pa.array([m.sum(axis=0).ravel()], type=pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel()], type=pa.list_(pa.float64())),
        })

    n_tot = 0
    s_tot = None
    ss_tot = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        t = pa.table(b)
        for r in range(t.num_rows):
            n_tot += t.column("n")[r].as_py()
            s = np.asarray(t.column("s")[r].values, dtype=np.float64)
            ss = np.asarray(t.column("ss")[r].values, dtype=np.float64)
            s_tot = s if s_tot is None else s_tot + s
            ss_tot = ss if ss_tot is None else ss_tot + ss
    if n_tot == 0:
        raise ValueError("moments() over an empty dataset")
    d = len(s_tot)
    return n_tot, s_tot, ss_tot.reshape(d, d)


def pca_fit(ds, *, emb_col: str = "embedding", k: int = 8):
    """Fit PCA from streamed moments; returns (mean: (d,), comps: (k, d)).

    cov = E[xxᵀ] − μμᵀ from the single-pass moments; eigh on the driver is
    O(d³) — d is the embedding width, never the data. Component sign is
    canonicalized (largest-|coeff| entry positive) so results are
    deterministic across BLAS builds.
    """
    n, s, ss = moments(ds, emb_col=emb_col)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return mean, comps * flip[:, None]


def pca_project(ds, mean: np.ndarray, comps: np.ndarray, *,
                emb_col: str = "embedding", id_col: str = "vec_id",
                out_col: str = "proj"):
    """Dataset[(id_col, proj: list<double>[k])] — (x − μ) · compsᵀ per batch;
    mean and components broadcast via the closure (k×d floats)."""
    mu = np.asarray(mean, dtype=np.float64)
    c = np.asarray(comps, dtype=np.float64)

    def fn(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        p = (m - mu[None, :]) @ c.T
        return pa.table({
            id_col: batch.column(id_col).combine_chunks().cast(pa.int64()),
            out_col: pa.FixedSizeListArray.from_arrays(
                pa.array(p.reshape(-1)), c.shape[0]
            ),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
