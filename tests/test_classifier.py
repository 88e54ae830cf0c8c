"""Hashed-feature logistic quality classifier: distributed == local."""

import numpy as np
import pyarrow as pa

from clp_core_ray.functions.classifier import (
    QualityModel,
    _feature_matrix,
    _sigmoid,
    score_quality,
    train_quality_classifier,
)

GOOD = [
    "a well formed english sentence with normal punctuation and flow",
    "the committee published its findings after a careful two year review",
    "researchers observed consistent improvements across every benchmark",
    "she walked to the library and borrowed three books about astronomy",
    "clear writing with varied vocabulary tends to score highly here",
]
BAD = [
    "buy now click here buy now click here buy now click here",
    "zzzz qqqq xxxx zzzz qqqq xxxx zzzz qqqq xxxx",
    "win win win free free free casino casino casino jackpot",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "lorem lorem lorem lorem ipsum ipsum ipsum ipsum",
]


def _table(reps: int = 8):
    texts, labels = [], []
    for r in range(reps):
        for t in GOOD:
            texts.append(t + f" variant {r}")
            labels.append(1)
        for t in BAD:
            texts.append(t + f" variant {r}")
            labels.append(0)
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
        "label": pa.array(labels, type=pa.int64()),
    })


def _local_train(tbl, bits=12, bigrams=True, iters=40, lr=2.0, l2=1e-4):
    """Single-process full-batch reference using the same kernels."""
    d = 1 << bits
    n = len(tbl)
    row, feat, val = _feature_matrix(tbl.column("text"), n, bits, bigrams)
    y = np.asarray(tbl.column("label"), dtype=np.float64)
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = np.bincount(row, weights=val * w[feat], minlength=n) + b
        err = _sigmoid(z) - y
        grad = np.zeros(d)
        np.add.at(grad, feat, val * err[row])
        w = w - lr * (grad / n + l2 * w)
        b = b - lr * err.sum() / n
    return w, b


def test_distributed_training_matches_local(ray_session):
    import ray.data as rd

    tbl = _table()
    ds = rd.from_arrow(tbl).repartition(5)
    model = train_quality_classifier(ds, label_col="label", bits=12,
                                     iters=40)
    w_ref, b_ref = _local_train(tbl)
    # full-batch GD: partial sums commute; differences are float rounding
    assert np.allclose(model.w, w_ref, atol=1e-9)
    assert abs(model.bias - b_ref) < 1e-9


def test_classifier_separates_and_filters(ray_session):
    import ray.data as rd

    tbl = _table()
    ds = rd.from_arrow(tbl).repartition(4)
    model = train_quality_classifier(ds, label_col="label", bits=12,
                                     iters=60)
    scored = score_quality(ds, model)
    t = pa.concat_tables(
        [pa.table(b) for b in scored.iter_batches(batch_format="pyarrow")]
    ).sort_by("doc_id")
    s = np.asarray(t.column("quality_score"), dtype=np.float64)
    y = np.asarray(t.column("label"), dtype=np.float64)
    acc = ((s >= 0.5).astype(float) == y).mean()
    assert acc == 1.0  # linearly separable toy corpus
    # the filter form keeps exactly the >= threshold rows
    kept = score_quality(ds, model, threshold=0.5)
    n_kept = sum(len(b) for b in kept.iter_batches(batch_format="pyarrow"))
    assert n_kept == int((s >= 0.5).sum())


def test_feature_matrix_shapes_and_norms():
    tbl = pa.table({"text": pa.array(
        ["hello world hello", "", None, "one two three"],
        type=pa.large_string())})
    row, feat, val = _feature_matrix(tbl.column("text"), 4, 10, False)
    # row 0: two distinct features; rows 1-2 empty; row 3: three
    assert set(row.tolist()) == {0, 3}
    n0 = val[row == 0]
    assert np.isclose((n0 ** 2).sum(), 1.0)  # L2 normalized
    n3 = val[row == 3]
    assert np.isclose((n3 ** 2).sum(), 1.0)


def test_bigrams_do_not_cross_docs():
    tbl = pa.table({"text": pa.array(["alpha beta", "gamma delta"],
                                     type=pa.large_string())})
    r1, f1, v1 = _feature_matrix(tbl.column("text"), 2, 14, True)
    # per doc: 2 unigrams + 1 bigram = 3 features
    assert (r1 == 0).sum() == 3 and (r1 == 1).sum() == 3
