"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (ray.put once, read per actor), per-batch partial
top-k, merged on the driver (candidates are k per query per batch — tiny).

Scale path: IVF — a kmeans codebook trained on a sample, rows bucketed by
nearest centroid, queries probe only the nearest `n_probe` buckets so most
batches are filtered before the matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clp_core_ray.functions.dedup import _emb_matrix, _normalize


def _collect_normalized(ds, id_col: str, emb_col: str):
    """Driver-side collect of the full normalized matrix — demo-scale only
    (used by knn_label_vote; the scale paths are topk_cosine / _ivf and
    dedup.embedding_dup_pairs' block self-join)."""
    import numpy as np
    import pyarrow as pa

    mats, ids = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        mats.append(_emb_matrix(t, emb_col))
        ids.append(np.asarray(t.column(id_col), dtype=np.int64))
    mat = _normalize(np.concatenate(mats)) if mats else np.zeros((0, 0))
    return mat, (np.concatenate(ids) if ids else np.zeros(0, np.int64))


def topk_cosine(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding",
                exclude_self: bool = True):
    """Brute-force exact top-k: returns pa.Table(query_id, neighbor_id, rank).

    Ties broken by neighbor_id ascending (deterministic).
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((q, np.asarray(query_ids, dtype=np.int64)))

    class PartialTopK:
        def __init__(self):
            self.q, self.qids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            e = _normalize(_emb_matrix(batch, emb_col))
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            scores = self.q @ e.T  # (n_q, n_batch)
            if exclude_self:
                mask = self.qids[:, None] == ids[None, :]
                scores[mask] = -np.inf
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            nq = len(self.qids)
            return pa.table(
                {
                    "query_id": pa.array(np.repeat(self.qids, kk)),
                    "neighbor_id": pa.array(ids[part].reshape(-1)),
                    "score": pa.array(
                        np.take_along_axis(scores, part, axis=1).reshape(-1)
                    ),
                }
            )

    parts = ds.map_batches(PartialTopK, batch_format="pyarrow", concurrency=(1, 8))
    cand = pa.concat_tables(
        pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")
    )
    # final exact top-k per query on the tiny candidate set
    qid = np.asarray(cand.column("query_id"), dtype=np.int64)
    nid = np.asarray(cand.column("neighbor_id"), dtype=np.int64)
    sc = np.asarray(cand.column("score"), dtype=np.float64)
    order = np.lexsort((nid, -sc, qid))
    qs, ns, ss = qid[order], nid[order], sc[order]
    # rank within query
    new_q = np.ones(len(qs), dtype=bool)
    new_q[1:] = qs[1:] != qs[:-1]
    grp_start = np.flatnonzero(new_q)
    rank = np.arange(len(qs)) - np.repeat(grp_start, np.diff(np.append(grp_start, len(qs))))
    keep = rank < k
    return pa.table(
        {
            "query_id": pa.array(qs[keep]),
            "neighbor_id": pa.array(ns[keep]),
            "rank": pa.array((rank[keep] + 1).astype(np.int64)),
        }
    )


def train_ivf_centroids(sample: np.ndarray, n_centroids: int = 16,
                        n_iter: int = 10, seed: int = 11) -> np.ndarray:
    """Tiny deterministic k-means (driver-side, on a sample)."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float64))
    c = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def topk_cosine_ivf(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    n_centroids: int = 16, n_probe: int = 4,
                    sample_rows: int = 4096, exclude_self: bool = True):
    """IVF-bucketed approximate top-k (the 100-TB shape).

    Rows are assigned to their nearest centroid inside map_batches; only rows
    whose centroid is among any query's `n_probe` nearest participate in the
    matmul. Recall < 1.0 by construction; verified ≥0.9 vs brute force in
    tests at these defaults.
    """
    import ray

    # train centroids on a RANDOM sample, not the first blocks — limit()
    # would see only the head of the dataset and skew centroids on sorted
    # or sharded-by-source inputs. count() is parquet-metadata-cheap.
    n_total = ds.count() or 1
    frac = min(1.0, (2.0 * sample_rows) / n_total)
    sample_ds = ds.random_sample(frac, seed=11) if frac < 1.0 else ds
    sample = _emb_matrix(
        pa.concat_tables(
            pa.table(b)
            for b in sample_ds.limit(sample_rows).iter_batches(batch_format="pyarrow")
        ),
        emb_col,
    )
    cents = train_ivf_centroids(sample, n_centroids)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :n_probe]
    probe_set = np.unique(probes)
    ref = ray.put((q, np.asarray(query_ids, dtype=np.int64), cents, probe_set))

    class ProbedTopK:
        def __init__(self):
            self.q, self.qids, self.cents, self.probe_set = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            e = _normalize(_emb_matrix(batch, emb_col))
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            assign = (e @ self.cents.T).argmax(axis=1)
            m = np.isin(assign, self.probe_set)
            if not m.any():
                return pa.table(
                    {"query_id": pa.array([], type=pa.int64()),
                     "neighbor_id": pa.array([], type=pa.int64()),
                     "score": pa.array([], type=pa.float64())}
                )
            e, ids = e[m], ids[m]
            scores = self.q @ e.T
            if exclude_self:
                scores[self.qids[:, None] == ids[None, :]] = -np.inf
            kk = min(k, scores.shape[1])
            part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            return pa.table(
                {"query_id": pa.array(np.repeat(self.qids, kk)),
                 "neighbor_id": pa.array(ids[part].reshape(-1)),
                 "score": pa.array(np.take_along_axis(scores, part, axis=1).reshape(-1))}
            )

    parts = ds.map_batches(ProbedTopK, batch_format="pyarrow", concurrency=(1, 8))
    cand = pa.concat_tables(
        pa.table(b) for b in parts.iter_batches(batch_format="pyarrow")
    )
    if len(cand) == 0:
        return pa.table(
            {"query_id": pa.array([], type=pa.int64()),
             "neighbor_id": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64())}
        )
    qid = np.asarray(cand.column("query_id"), dtype=np.int64)
    nid = np.asarray(cand.column("neighbor_id"), dtype=np.int64)
    sc = np.asarray(cand.column("score"), dtype=np.float64)
    order = np.lexsort((nid, -sc, qid))
    qs, ns = qid[order], nid[order]
    new_q = np.ones(len(qs), dtype=bool)
    new_q[1:] = qs[1:] != qs[:-1]
    grp_start = np.flatnonzero(new_q)
    rank = np.arange(len(qs)) - np.repeat(grp_start, np.diff(np.append(grp_start, len(qs))))
    keep = rank < k
    return pa.table(
        {"query_id": pa.array(qs[keep]),
         "neighbor_id": pa.array(ns[keep]),
         "rank": pa.array((rank[keep] + 1).astype(np.int64))}
    )


def knn_label_vote(ds, k: int = 5, id_col: str = "vec_id",
                   emb_col: str = "embedding", label_col: str = "label"):
    """Predict each row's label by majority over its k nearest neighbors.

    Demonstrates the embedding join: the (small) label table is collected and
    broadcast; neighbors come from brute-force top-k.
    """
    labels = {}
    for b in ds.select_columns([id_col, label_col]).iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for i, l in zip(t.column(id_col).to_pylist(), t.column(label_col).to_pylist()):
            labels[i] = l
    mat, ids = _collect_normalized(ds, id_col, emb_col)
    topk = topk_cosine(ds, mat, ids, k=k, id_col=id_col, emb_col=emb_col)
    qid = np.asarray(topk.column("query_id"), dtype=np.int64)
    nid = np.asarray(topk.column("neighbor_id"), dtype=np.int64)
    import collections

    votes: dict[int, collections.Counter] = collections.defaultdict(collections.Counter)
    for q, n in zip(qid.tolist(), nid.tolist()):
        votes[q][labels[n]] += 1
    out_ids = sorted(votes)
    pred = [votes[i].most_common(1)[0][0] for i in out_ids]
    return pa.table(
        {id_col: pa.array(out_ids, type=pa.int64()),
         "label_pred": pa.array(pred, type=pa.int32())}
    )
