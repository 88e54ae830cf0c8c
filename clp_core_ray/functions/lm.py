"""Corpus n-gram language model + per-document perplexity scoring.

The CCNet-style quality signal for training-data curation: train a small LM
on the corpus (here an add-alpha-smoothed bigram model), score every document
with its per-token log-probability, and filter the tails. Two scale-correct
stages:

1. **Count** (``bigram_counts`` / ``unigram_counts``): per-batch LOCAL
   aggregation (Arrow group_by inside the map) so the shuffle carries one row
   per distinct n-gram per batch, then a small global groupby-sum — the A4 /
   tf_df partial-aggregation pattern. Counts are integers → the SQL oracle
   reproduces them exactly (lag window over unnested tokens).
2. **Score** (``perplexity_score``): the count tables are the MODEL —
   broadcast once via ``ray.put`` (with a ``min_count`` prune knob so a
   100-TB vocabulary can be capped to the head that matters; pruned mass
   falls through to the smoothing floor), then one vectorized
   ``pc.index_in`` lookup pass per batch. Float log-probs are rows-only
   (pytest-verified against a pure-Python reference); the integer count core
   is the oracle-checkable part.

Tokenization matches the dedup/minhash oracle convention:
``regexp_split_to_array(lower(text), '[^a-zà-ÿ]+')`` with empties dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"  # joins w1/w2 into one lookup key; cannot appear in tokens


def _doc_words(batch: pa.Table, text_col: str):
    """(flat words, parent row index) with empty tokens dropped."""
    texts = pc.utf8_lower(
        pc.fill_null(batch.column(text_col).combine_chunks(), ""))
    toks = pc.split_pattern_regex(texts, r"[^a-zà-ÿ]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parent = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "")
    mask = keep.to_numpy(zero_copy_only=False)
    return flat.filter(keep), parent[mask]


def _batch_bigrams(batch: pa.Table, text_col: str):
    """(w1, w2) arrays of consecutive same-document word pairs."""
    flat, parent = _doc_words(batch, text_col)
    if len(flat) < 2:
        empty = pa.array([], type=pa.string())
        return empty, empty
    same = pa.array(parent[:-1] == parent[1:])
    return (flat.slice(0, len(flat) - 1).filter(same),
            flat.slice(1).filter(same))


def bigram_counts(ds, *, text_col: str = "text"):
    """Dataset[(w1, w2, cnt:int64)] — global bigram counts, partial-aggregated
    per batch before the (w1, w2) shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        w1, w2 = _batch_bigrams(batch, text_col)
        t = pa.table({"w1": w1, "w2": w2})
        return t.group_by(["w1", "w2"]).aggregate([([], "count_all")]) \
                .rename_columns(["w1", "w2", "cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def unigram_counts(ds, *, text_col: str = "text"):
    """Dataset[(w, cnt:int64)] — same partial-aggregation shape."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _doc_words(batch, text_col)
        t = pa.table({"w": flat})
        return t.group_by(["w"]).aggregate([([], "count_all")]) \
                .rename_columns(["w", "cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def _collect(ds) -> pa.Table:
    import ray

    blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    return pa.concat_tables(blocks)


def perplexity_score(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     alpha: float = 0.1, min_count: int = 1):
    """Dataset[(doc_id, n_bigrams:int64, logprob:float64)] where logprob is
    the mean log P(w_i | w_{i-1}) under the add-alpha bigram model trained on
    ``ds`` itself.

    P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V), V = unigram
    vocabulary size. ``min_count`` prunes the broadcast model (n-grams below
    it fall back to the smoothing floor) — the knob that bounds model size
    at corpus scale. Documents with no bigram score logprob = 0.
    """
    import ray

    bi = _collect(bigram_counts(ds, text_col=text_col))
    uni = _collect(unigram_counts(ds, text_col=text_col))
    vocab = len(uni)
    if min_count > 1:
        bi = bi.filter(pc.greater_equal(bi.column("cnt"), min_count))
        uni = uni.filter(pc.greater_equal(uni.column("cnt"), min_count))
    bi_keys = pc.binary_join_element_wise(
        bi.column("w1").cast(pa.string()),
        bi.column("w2").cast(pa.string()), SEP)
    model = ray.put({
        "bi_keys": bi_keys.combine_chunks(),
        "bi_cnt": bi.column("cnt").combine_chunks(),
        "uni_keys": uni.column("w").combine_chunks(),
        "uni_cnt": uni.column("cnt").combine_chunks(),
        "vocab": vocab,
    })

    def score(batch: pa.Table, _a=float(alpha)) -> pa.Table:
        m = ray.get(model)
        flat, parent = _doc_words(batch, text_col)
        ids = batch.column(id_col).combine_chunks().cast(pa.int64())
        n_rows = len(batch)
        if len(flat) < 2:
            return pa.table({
                id_col: ids,
                "n_bigrams": pa.array(np.zeros(n_rows, dtype=np.int64)),
                "logprob": pa.array(np.zeros(n_rows, dtype=np.float64)),
            })
        same = parent[:-1] == parent[1:]
        w1 = flat.slice(0, len(flat) - 1).filter(pa.array(same))
        w2 = flat.slice(1).filter(pa.array(same))
        rows = parent[:-1][same]
        keys = pc.binary_join_element_wise(w1, w2, SEP)
        bpos = pc.index_in(keys, m["bi_keys"])
        cb = np.asarray(pc.take(m["bi_cnt"], bpos).fill_null(0),
                        dtype=np.float64)
        upos = pc.index_in(w1, m["uni_keys"])
        cu = np.asarray(pc.take(m["uni_cnt"], upos).fill_null(0),
                        dtype=np.float64)
        lp = np.log(cb + _a) - np.log(cu + _a * m["vocab"])
        sums = np.zeros(n_rows, dtype=np.float64)
        np.add.at(sums, rows, lp)
        n_bi = np.bincount(rows, minlength=n_rows).astype(np.int64)
        with np.errstate(invalid="ignore"):
            mean = np.where(n_bi > 0, sums / np.maximum(n_bi, 1), 0.0)
        return pa.table({
            id_col: ids,
            "n_bigrams": pa.array(n_bi),
            "logprob": pa.array(mean),
        })

    return ds.map_batches(score, batch_format="pyarrow")
