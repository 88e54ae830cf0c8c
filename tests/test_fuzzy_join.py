"""Cross-corpus LSH fuzzy join vs brute-force word-shingle Jaccard."""

import numpy as np
import pyarrow as pa
import pytest

from clp_core_ray.functions.dedup import fuzzy_join, ngram_jaccard


def _mk(texts, start_id=0):
    return pa.table({
        "doc_id": pa.array(range(start_id, start_id + len(texts)),
                           type=pa.int64()),
        "text": pa.array(texts, type=pa.large_string()),
    })


BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "distributed systems require careful attention to partial failure modes",
    "machine learning models trained on large corpora need deduplication",
    "a completely unrelated sentence about cooking pasta with fresh basil",
    "ray data pipelines stream arrow record batches through worker actors",
]


def _near(t):  # ~0.9 jaccard variant: change one word
    w = t.split()
    w[-1] = w[-1] + "x"
    return " ".join(w)


def test_fuzzy_join_matches_bruteforce(ray_session):
    import ray
    import ray.data as rd

    # left corpus: base docs + noise; right corpus: near-dups of docs 0,2,4
    left_texts = BASE + [f"left only filler document number {i} "
                         f"with distinct words alpha{i} beta{i} gamma{i}"
                         for i in range(20)]
    right_texts = [_near(BASE[0]), _near(BASE[2]), _near(BASE[4])] + [
        f"right only filler text {i} with tokens delta{i} epsilon{i} zeta{i}"
        for i in range(20)]
    left = rd.from_arrow(_mk(left_texts)).repartition(3)
    right = rd.from_arrow(_mk(right_texts, start_id=1000)).repartition(3)

    out = fuzzy_join(left, right, threshold=0.5)
    tabs = [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")]
    got = set()
    if tabs:
        t = pa.concat_tables(tabs)
        got = set(zip(t.column("doc_a").to_pylist(),
                      t.column("doc_b").to_pylist()))

    # brute force over the cross product with the same shingle size
    expect = set()
    for i, lt in enumerate(left_texts):
        for j, rt in enumerate(right_texts):
            if ngram_jaccard(lt, rt, k=3) >= 0.5:
                expect.add((i, 1000 + j))
    assert expect == {(0, 1000), (2, 1001), (4, 1002)}
    assert got == expect


def test_fuzzy_join_empty_sides(ray_session):
    import ray.data as rd

    left = rd.from_arrow(_mk(BASE))
    right = rd.from_arrow(_mk(["nothing in common here at all"], 500))
    out = fuzzy_join(left, right, threshold=0.5)
    rows = sum(len(b) for b in out.iter_batches(batch_format="pyarrow"))
    assert rows == 0


def test_cross_pairs_kernel_sides_and_cap():
    from clp_core_ray.functions.dedup import _bucket_cross_pairs

    # one LSH bucket: 2 left docs, 3 right docs → 6 cross pairs, no
    # left-left or right-right pairs
    g = pa.table({
        "band": pa.array([0] * 5, type=pa.int64()),
        "band_hash": pa.array(np.full(5, 7, dtype=np.uint64)),
        "doc": pa.array([1, 2, 10, 11, 12], type=pa.int64()),
        "side": pa.array([0, 0, 1, 1, 1], type=pa.int8()),
    })
    t = _bucket_cross_pairs(g)
    pairs = set(zip(t.column("doc_a").to_pylist(),
                    t.column("doc_b").to_pylist()))
    assert pairs == {(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)}
    # cap bounds per-left fan-out
    t2 = _bucket_cross_pairs(g, cap=2)
    assert len(t2) == 4
