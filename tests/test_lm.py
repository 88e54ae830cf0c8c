"""Bigram LM + perplexity scoring vs a pure-Python reference."""
import math
import re

import pyarrow as pa


DOCS = [
    "the cat sat on the mat",
    "the cat ran",
    "dogs bark loudly at night",
    "",
    "the the the",
]


def _ref_model():
    uni, bi = {}, {}
    for d in DOCS:
        ws = [w for w in re.split(r"[^a-zà-ÿ]+", d.lower()) if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi


def _docs_table():
    return pa.table({
        "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
        "text": pa.array(DOCS),
    })


def test_bigram_counts_exact(ray_session):
    import ray.data as rd

    from clp_core_ray.functions.lm import bigram_counts

    out = bigram_counts(rd.from_arrow(_docs_table()).repartition(3)).to_pandas()
    got = {(r.w1, r.w2): int(r.cnt) for r in out.itertuples()}
    _, bi = _ref_model()
    assert got == bi
    assert got[("the", "cat")] == 2 and got[("the", "the")] == 2


def test_perplexity_matches_reference(ray_session):
    import ray.data as rd

    from clp_core_ray.functions.lm import perplexity_score

    alpha = 0.1
    out = perplexity_score(
        rd.from_arrow(_docs_table()).repartition(2), alpha=alpha
    ).to_pandas().set_index("doc_id").sort_index()

    uni, bi = _ref_model()
    vocab = len(uni)
    for i, d in enumerate(DOCS):
        ws = [w for w in re.split(r"[^a-zà-ÿ]+", d.lower()) if w]
        pairs = list(zip(ws, ws[1:]))
        assert int(out.loc[i, "n_bigrams"]) == len(pairs)
        if not pairs:
            assert out.loc[i, "logprob"] == 0.0
            continue
        ref = sum(
            math.log((bi.get(p, 0) + alpha) / (uni[p[0]] + alpha * vocab))
            for p in pairs
        ) / len(pairs)
        assert abs(out.loc[i, "logprob"] - ref) < 1e-12


def test_perplexity_min_count_prunes_model(ray_session):
    """min_count prunes the broadcast model; pruned bigrams fall back to the
    smoothing floor, so scores drop for docs made of rare bigrams."""
    import ray.data as rd

    from clp_core_ray.functions.lm import perplexity_score

    ds = rd.from_arrow(_docs_table())
    full = perplexity_score(ds, alpha=0.1).to_pandas().set_index("doc_id")
    pruned = perplexity_score(ds, alpha=0.1, min_count=2).to_pandas() \
        .set_index("doc_id")
    # doc 2 is all singleton bigrams → strictly worse under the pruned model
    assert pruned.loc[2, "logprob"] < full.loc[2, "logprob"]
    # ("the","cat") has count 2 → survives pruning; doc 1 changes less
    assert pruned.loc[1, "logprob"] <= full.loc[1, "logprob"] + 1e-9
