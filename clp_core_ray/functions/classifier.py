"""Distributed-trained text quality classifier (fastText-style shape).

The model-based quality filter production curation stacks run after the
heuristic screens (CCNet / DCLM style: a linear classifier over hashed
bag-of-word features, trained on "good vs bad" exemplars, then applied as
a streaming score-and-filter stage). Everything here is the linear/hashed
variant — no external ML libraries, no embedding model:

* Features: FNV-hashed unigram (+ optional bigram) counts into a fixed
  2^bits space, L2-normalized per doc — one vectorized pass over the
  batch's string buffers, no Python per row.
* Training: full-batch logistic regression via streaming partial
  gradients — each iteration is ONE map_batches pass emitting a d-sized
  (grad, loss, count) partial per batch; the driver folds partials and
  takes the gradient step. Driver state = the weight vector (2^bits + 1
  floats). Full-batch GD (not SGD) keeps the result independent of batch
  order up to float-sum rounding — the property that makes
  distributed == local testable and reruns reproducible.
* Scoring: the final weights ride a plasma ref inside stateless task
  instances (fuses with the read); one sparse matvec per batch.

Same scale shape as functions/clustering.kmeans_fit: per-iteration
exchange is #batches × d floats, independent of corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from clp_core_ray.vec.tokenizer import _fnv1a64_tokens, _string_buffers


def _hashed_features(texts, bits: int, bigrams: bool):
    """texts → (row_idx, feat_idx, value) COO triples + per-row counts.

    Tokens are lowercase single-space words (the corpus-wide convention of
    functions/text._explode_terms); feature index = FNV-1a64 & (2^bits-1).
    """
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern(low, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    parent = parent[np.asarray(nonempty)]
    offs, data = _string_buffers(
        flat if isinstance(flat, pa.Array) else flat.combine_chunks())
    h = _fnv1a64_tokens(data, offs[:-1], np.diff(offs))
    mask = np.uint64((1 << bits) - 1)
    rows = [parent]
    feats = [(h & mask).astype(np.int64)]
    if bigrams and len(h) > 1:
        same_doc = parent[:-1] == parent[1:]
        with np.errstate(over="ignore"):
            bg = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:]
        rows.append(parent[:-1][same_doc])
        feats.append((bg[same_doc] & mask).astype(np.int64))
    row = np.concatenate(rows)
    feat = np.concatenate(feats)
    return row, feat


def _feature_matrix(texts, n_rows: int, bits: int, bigrams: bool):
    """Per-batch CSR-ish arrays: sorted (row, feat) with duplicate features
    summed, plus per-row L2 norms. Returns (row, feat, val)."""
    row, feat = _hashed_features(texts, bits, bigrams)
    if len(row) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.float64))
    order = np.lexsort((feat, row))
    row, feat = row[order], feat[order]
    new = np.ones(len(row), dtype=bool)
    new[1:] = (row[1:] != row[:-1]) | (feat[1:] != feat[:-1])
    idx = np.flatnonzero(new)
    cnt = np.diff(np.append(idx, len(row))).astype(np.float64)
    row, feat = row[idx], feat[idx]
    # L2 normalize per row
    sq = np.bincount(row, weights=cnt * cnt, minlength=n_rows)
    norm = np.sqrt(np.maximum(sq, 1e-12))
    val = cnt / norm[row]
    return row, feat, val


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


@dataclass
class QualityModel:
    w: np.ndarray        # (2^bits,) feature weights
    bias: float
    bits: int
    bigrams: bool


def train_quality_classifier(ds, *, label_col: str, text_col: str = "text",
                             bits: int = 16, bigrams: bool = True,
                             iters: int = 60, lr: float = 2.0,
                             l2: float = 1e-4) -> QualityModel:
    """Full-batch logistic regression over hashed text features.

    ``label_col``: 0/1 (or bool) column. Tokenize/hash ONCE into a
    materialized per-row sparse-feature dataset (list<feat>, list<val>,
    label — iterations must not re-read and re-tokenize the corpus), then
    each iteration is one streaming pass over the cached features:
    per-batch partial = (X^T (sigmoid(Xw) - y), Σ(s - y), n); the driver
    folds partials (d + 2 floats per batch) and steps
    ``w -= lr * (grad/n + l2 * w)``. Deterministic given the input
    (full-batch: partial sums commute up to float rounding)."""
    d = 1 << bits

    def featurize(batch: pa.Table) -> pa.Table:
        n = len(batch)
        row, feat, val = _feature_matrix(
            batch.column(text_col), n, bits, bigrams)
        counts = np.bincount(row, minlength=n) if len(row) else np.zeros(
            n, dtype=np.int64)
        off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        return pa.table({
            "feat": pa.LargeListArray.from_arrays(
                pa.array(off), pa.array(feat, type=pa.int64())),
            "val": pa.LargeListArray.from_arrays(
                pa.array(off), pa.array(val, type=pa.float64())),
            "y": batch.column(label_col).combine_chunks().cast(pa.float64()),
        })

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()

    w = np.zeros(d, dtype=np.float64)
    bias = 0.0
    for _ in range(iters):
        cur_w, cur_b = w, bias

        def partial(batch: pa.Table, _w=cur_w, _b=cur_b) -> pa.Table:
            n = len(batch)
            fl = batch.column("feat").combine_chunks()
            feat = np.asarray(fl.flatten(), dtype=np.int64)
            val = np.asarray(batch.column("val").combine_chunks().flatten(),
                             dtype=np.float64)
            nper = np.asarray(pc.list_value_length(fl), dtype=np.int64)
            row = np.repeat(np.arange(n, dtype=np.int64), nper)
            y = np.asarray(batch.column("y"), dtype=np.float64)
            z = np.bincount(row, weights=val * _w[feat], minlength=n) + _b
            err = _sigmoid(z) - y
            grad = np.zeros(d, dtype=np.float64)
            np.add.at(grad, feat, val * err[row])
            return pa.table({
                "grad": pa.array([grad], type=pa.list_(pa.float64())),
                "gbias": pa.array([float(err.sum())]),
                "n": pa.array([np.int64(n)]),
            })

        grad = np.zeros(d, dtype=np.float64)
        gbias = 0.0
        n_tot = 0
        for b in feats.map_batches(partial,
                                   batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            t = pa.table(b)
            for i in range(t.num_rows):
                grad += np.asarray(t.column("grad")[i].values,
                                   dtype=np.float64)
                gbias += float(t.column("gbias")[i].as_py())
                n_tot += int(t.column("n")[i].as_py())
        if n_tot == 0:
            break
        w = w - lr * (grad / n_tot + l2 * w)
        bias = bias - lr * (gbias / n_tot)
    return QualityModel(w=w, bias=bias, bits=bits, bigrams=bigrams)


class QualityScorer:
    """Stateless-task score stage: weights ride a plasma ref in the pickled
    instance (resolved lazily once per task — the Decontaminator idiom)."""

    def __init__(self, model_ref, text_col: str = "text",
                 score_col: str = "quality_score"):
        self.model_ref = model_ref
        self.model = model_ref if isinstance(model_ref, QualityModel) else None
        self.text_col = text_col
        self.score_col = score_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.model is None:
            import ray

            self.model = ray.get(self.model_ref)
        m = self.model
        n = len(batch)
        row, feat, val = _feature_matrix(
            batch.column(self.text_col), n, m.bits, m.bigrams)
        z = np.bincount(row, weights=val * m.w[feat], minlength=n) + m.bias
        return batch.append_column(self.score_col, pa.array(_sigmoid(z)))


def score_quality(ds, model: QualityModel, *, text_col: str = "text",
                  score_col: str = "quality_score", threshold: float | None = None):
    """Dataset → Dataset with ``score_col`` (P[label=1]); with ``threshold``
    set, rows scoring below it are dropped (the filter form)."""
    import ray

    ref = ray.put(model)
    out = ds.map_batches(QualityScorer(ref, text_col, score_col),
                         batch_format="pyarrow")
    if threshold is not None:
        thr = float(threshold)
        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column(score_col),
                                                pa.scalar(thr))),
            batch_format="pyarrow")
    return out
