"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes follow the scale-correct patterns: content-hash → hash-partitioned
min-id for exact dedup; shingle→minhash→band→bucket groupby for MinHash-LSH
(candidate pairs only ever materialize per bucket); SimHash as a per-row
64-bit signature. Verification (exact Jaccard) runs only on LSH candidates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.functions.text import fingerprints, word_shingle_hashes

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_dedup_survivors(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset[(hash, doc_id)] → min id per content hash (first-wins dedup).

    Per-batch partial min, then a small groupby — the shuffle carries one row
    per distinct hash per batch (A4 pattern).
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = fingerprints(batch.column(text_col))
        t = pa.table({"content_hash": h, id_col: batch.column(id_col)})
        return t.group_by(["content_hash"]).aggregate([(id_col, "min")]).rename_columns(
            ["content_hash", id_col]
        )

    from ray.data.aggregate import Min

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16  # 16 bands × 4 rows → catches jaccard ≳ 0.5 reliably
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perm: int = N_PERM, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def minhash_signatures(texts: pa.Array, k_shingle: int = 3) -> np.ndarray:
    """(n_rows, N_PERM) uint64 MinHash signatures over word k-shingles.

    Rows with no shingles get all-max signatures (never collide).
    """
    shingles, offsets = word_shingle_hashes(texts, k=k_shingle)
    n = len(offsets) - 1
    sig = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(shingles) == 0:
        return sig
    with np.errstate(over="ignore"):
        # universal hashing h_k(s) = (a_k * s + b_k) mod 2^61-1 (vectorized
        # over shingles × perms, banded to bound memory)
        hv = (shingles[:, None] * _A[None, :] + _B[None, :]) % _MERSENNE
    counts = np.diff(offsets)
    nonempty = counts > 0
    # per-row min via minimum.reduceat on each perm column
    idx = offsets[:-1].clip(0, max(len(shingles) - 1, 0))
    red = np.minimum.reduceat(hv, idx, axis=0) if len(shingles) else hv
    sig[nonempty] = red[nonempty]
    return sig


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_rows, N_BANDS) int64 band bucket keys (FNV-mix of each band's rows)."""
    n, p = sig.shape
    rows_per_band = p // N_BANDS
    out = np.empty((n, N_BANDS), dtype=np.uint64)
    PRIME = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for b in range(N_BANDS):
            h = np.full(n, np.uint64(0xCBF29CE484222325))
            for r in range(rows_per_band):
                h = (h ^ sig[:, b * rows_per_band + r]) * PRIME
            out[:, b] = h
    return out.view(np.int64)


def minhash_lsh_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.5, k_shingle: int = 3):
    """Near-duplicate pairs via MinHash-LSH, verified by signature similarity.

    Stage 1 (map_batches): signature + band keys per doc → explode to
    (band, band_hash, doc_id, sig) rows.
    Stage 2 (groupby band+hash): per-bucket pairs; verify estimated Jaccard =
    fraction of matching minhashes ≥ threshold.
    Returns Dataset[(doc_a, doc_b, est_jaccard)] with doc_a < doc_b, distinct.
    """

    def explode(batch: pa.Table) -> pa.Table:
        sig = minhash_signatures(batch.column(text_col), k_shingle)
        bh = band_hashes(sig)
        n = len(batch)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n)),
                "band_hash": pa.array(bh.reshape(-1)),
                id_col: pa.array(np.repeat(ids, N_BANDS)),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(sig.view(np.int64), N_BANDS, axis=0).reshape(-1)),
                    N_PERM,
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col), dtype=np.int64)
        empty = pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "est_jaccard": pa.array([], type=pa.float64())}
        )
        # bucket = same (band, band_hash); duplicates of the same doc possible
        uniq_ids, first = np.unique(ids, return_index=True)
        if len(uniq_ids) < 2 or len(uniq_ids) > 2000:  # skip degenerate buckets
            return empty
        sig = np.asarray(
            group.column("sig").combine_chunks().flatten(), dtype=np.int64
        ).reshape(len(ids), N_PERM)[first]
        i, j = np.triu_indices(len(uniq_ids), k=1)
        est = (sig[i] == sig[j]).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {"doc_a": pa.array(uniq_ids[i[keep]]),
             "doc_b": pa.array(uniq_ids[j[keep]]),
             "est_jaccard": pa.array(est[keep])}
        )

    pairs = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    # distinct pairs (same pair can surface from several bands)
    def dedup_pairs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        key = (a.astype(np.uint64) << np.uint64(32)) ^ b.astype(np.uint64)
        _, first = np.unique(key, return_index=True)
        return batch.take(np.sort(first))

    from clp_core_ray.state.dictionaries import distinct_by_key

    def add_key(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("doc_a"), dtype=np.int64)
        b = np.asarray(batch.column("doc_b"), dtype=np.int64)
        key = ((a.astype(np.uint64) << np.uint64(32)) ^ b.astype(np.uint64)).view(
            np.int64
        )
        return batch.append_column("pair_key", pa.array(key))

    deduped = distinct_by_key(
        pairs.map_batches(dedup_pairs, batch_format="pyarrow").map_batches(
            add_key, batch_format="pyarrow"
        ),
        "pair_key",
    )
    return deduped.map_batches(
        lambda b: b.drop_columns(["pair_key"]), batch_format="pyarrow"
    )


def dup_clusters(pairs: pa.Table, max_rounds: int = 20) -> pa.Table:
    """Connected components over near-dup pairs → (doc_id, cluster_id).

    Iterative min-label propagation (the shuffle-friendly formulation the
    pair volume demands at scale; here vectorized rounds over the edge list
    until fixpoint). cluster_id = smallest doc_id in the component, so keeping
    doc_id == cluster_id implements keep-one-per-cluster dedup.
    """
    a = np.asarray(pairs.column("doc_a"), dtype=np.int64)
    b = np.asarray(pairs.column("doc_b"), dtype=np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    label = nodes.copy()
    pos = {int(n): i for i, n in enumerate(nodes.tolist())}
    ia = np.array([pos[int(x)] for x in a], dtype=np.int64)
    ib = np.array([pos[int(x)] for x in b], dtype=np.int64)
    for _ in range(max_rounds):
        new = label.copy()
        # propagate min label across each edge, both directions
        np.minimum.at(new, ia, label[ib])
        np.minimum.at(new, ib, label[ia])
        # pointer jumping: follow labels one hop (labels are doc ids → map)
        idx = np.array([pos.get(int(l), -1) for l in new.tolist()], dtype=np.int64)
        hop = np.where(idx >= 0, new[idx.clip(0)], new)
        new = np.minimum(new, hop)
        if (new == label).all():
            break
        label = new
    return pa.table(
        {"doc_id": pa.array(nodes), "cluster_id": pa.array(label)}
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash64(texts: pa.Array) -> pa.Array:
    """64-bit SimHash over word unigram hashes (sign of per-bit vote sums)."""
    shingles, offsets = word_shingle_hashes(texts, k=1)
    n = len(offsets) - 1
    bits = ((shingles[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32) * 2 - 1
    sums = np.zeros((n, 64), dtype=np.int64)
    if len(shingles):
        idx = offsets[:-1].clip(0, len(shingles) - 1)
        red = np.add.reduceat(bits, idx, axis=0)
        nonempty = np.diff(offsets) > 0
        sums[nonempty] = red[nonempty]
    sig = (sums > 0).astype(np.uint64)
    packed = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(64):
            packed |= sig[:, j] << np.uint64(j)
    return pa.array(packed.view(np.int64))


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard for verification of candidate pairs."""

    def grams(t):
        import re

        w = [x for x in re.split(r"[^a-zà-ÿ]+", t.lower()) if x]
        return {tuple(w[i : i + k]) for i in range(max(0, len(w) - k + 1))}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------


def embedding_dup_pairs(ds, id_col: str = "vec_id", emb_col: str = "embedding",
                        threshold: float = 0.95):
    """Pairs with cosine ≥ threshold via blockwise matmul against a broadcast
    normalized matrix (the all-pairs small-side variant; see similarity.py for
    the top-k search shapes)."""
    import ray

    mat, ids = _collect_normalized(ds, id_col, emb_col)
    ref = ray.put((mat, ids))

    class Score:
        def __init__(self):
            self.mat, self.ids = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            e = _normalize(_emb_matrix(batch, emb_col))
            bids = np.asarray(batch.column(id_col), dtype=np.int64)
            scores = e @ self.mat.T
            ii, jj = np.nonzero(scores >= threshold)
            keep = bids[ii] < self.ids[jj]
            return pa.table(
                {"doc_a": pa.array(bids[ii][keep]),
                 "doc_b": pa.array(self.ids[jj][keep]),
                 "cosine": pa.array(scores[ii, jj][keep].astype(np.float64))}
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=(1, 8))


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch.column(emb_col).combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    offsets = np.asarray(col.offsets, dtype=np.int64)
    dim = int(offsets[1] - offsets[0]) if len(offsets) > 1 else 0
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _collect_normalized(ds, id_col: str, emb_col: str):
    mats, ids = [], []
    for b in ds.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        mats.append(_emb_matrix(t, emb_col))
        ids.append(np.asarray(t.column(id_col), dtype=np.int64))
    mat = _normalize(np.concatenate(mats)) if mats else np.zeros((0, 0))
    return mat, (np.concatenate(ids) if ids else np.zeros(0, np.int64))
