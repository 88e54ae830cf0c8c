"""Curation operators: PII redaction, decontamination, stratified sampling."""

import numpy as np
import pyarrow as pa


def test_redact_batch_patterns():
    from clp_core_ray.functions.curation import redact_batch

    texts = pa.array([
        "contact bob.smith+x@example.co.uk now",
        "peer 192.168.1.254:8080 timed out",
        "call 555-867-5309 or 555 867 5309",
        "card 4111 1111 1111 1111 declined",
        "nothing here",
    ], type=pa.large_string())
    out = redact_batch(texts).to_pylist()
    assert out[0] == "contact <EMAIL> now"
    assert out[1] == "peer <IP>:8080 timed out"
    assert out[2] == "call <PHONE> or <PHONE>"
    assert out[3] == "card <CARD> declined"
    assert out[4] == "nothing here"


def test_decontaminate_flags_ngram_overlap(ray_session):
    import ray.data as rd

    from clp_core_ray.functions.curation import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            # shares the full 8-gram run
            "intro words then the quick brown fox jumps over the lazy dog and more",
            # shares only a 5-gram → clean at n=8
            "the quick brown fox jumps high",
            "completely unrelated content about databases",
        ]),
    })
    out = decontaminate(rd.from_arrow(docs), bench, n=8).to_pandas() \
        .sort_values("doc_id")
    assert out.contaminated.tolist() == [True, False, False]
    # drop mode removes flagged rows
    kept = decontaminate(rd.from_arrow(docs), bench, n=8, drop=True).to_pandas()
    assert sorted(kept.doc_id.tolist()) == [1, 2]
    assert "contaminated" not in kept.columns


def test_stratified_sample_rule(ray_session):
    import ray.data as rd

    from clp_core_ray.functions.curation import stratified_sample

    n = 1000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lang": pa.array(["en", "de", "zh", "fr"][:4] * (n // 4)),
    })
    out = stratified_sample(rd.from_arrow(tbl), "lang",
                            {"en": 50, "de": 25}, default_rate=10).to_pandas()
    df = tbl.to_pandas()
    rate = df.lang.map({"en": 50, "de": 25}).fillna(10)
    want = df[(df.doc_id % 100) < rate]
    assert sorted(out.doc_id.tolist()) == sorted(want.doc_id.tolist())


def test_pack_sequences_invariants(ray_session):
    """Global prefix-sum packing: contiguous token layout in id order, and
    chunk ranges consistent with seq_len, across many buckets/blocks."""
    import ray.data as rd

    from clp_core_ray.functions.curation import pack_sequences

    rng = np.random.default_rng(7)
    n = 500
    texts = [" ".join(["tok"] * int(rng.integers(1, 40))) for _ in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n) * 3, type=pa.int64()),  # sparse ids
        "text": pa.array(texts),
    })
    out = pack_sequences(rd.from_arrow(tbl).repartition(7), seq_len=64,
                         bucket_size=100).to_pandas().sort_values("doc_id")
    lens = np.array([len(t.split()) for t in texts])
    assert out.n_tokens.tolist() == lens.tolist()
    want_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    assert out.token_start.tolist() == want_start.tolist()
    assert (out.seq_first == out.token_start // 64).all()
    assert (out.seq_last == (out.token_start + lens - 1) // 64).all()


def test_mixture_sample(ray_session):
    import numpy as np
    import pytest
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.curation import mixture_sample

    rng = np.random.default_rng(17)
    langs = np.array(["en", "de", "fr", "xx"])
    lab = langs[rng.choice(4, p=[0.6, 0.15, 0.15, 0.1], size=20000)]
    t = pa.table({"doc_id": pa.array(np.arange(20000, dtype=np.int64)),
                  "lang": pa.array(lab)})
    ds = rd.from_arrow(t).repartition(4)
    out = mixture_sample(ds, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25})
    df = out.to_pandas()
    mix = df["lang"].value_counts(normalize=True)
    assert "xx" not in mix  # unweighted groups dropped
    assert abs(mix["en"] - 0.5) < 0.02
    assert abs(mix["de"] - 0.25) < 0.02
    assert abs(mix["fr"] - 0.25) < 0.02
    # binding group (fr or de, scarcer relative to weight) keeps ~all rows
    n_fr = (lab == "fr").sum()
    n_de = (lab == "de").sum()
    cap = min((lab == "en").sum() / 0.5, n_de / 0.25, n_fr / 0.25)
    assert len(df) == pytest.approx(cap, rel=0.03)
    # deterministic
    df2 = mixture_sample(ds, "lang", {"en": 0.5, "de": 0.25, "fr": 0.25}
                         ).to_pandas()
    assert sorted(df2["doc_id"]) == sorted(df["doc_id"])


def test_snapshot_diff(ray_session):
    """added/removed/changed delta; unchanged ids emit nothing; any byte
    change (even whitespace) counts as changed."""
    import ray.data as rd

    from clp_core_ray.functions.curation import snapshot_diff

    old = rd.from_items([
        {"doc_id": 1, "text": "alpha"},
        {"doc_id": 2, "text": "bravo"},
        {"doc_id": 3, "text": "charlie"},
        {"doc_id": 4, "text": "delta"},
    ])
    new = rd.from_items([
        {"doc_id": 2, "text": "bravo"},        # unchanged
        {"doc_id": 3, "text": "charlie "},     # whitespace-only → changed
        {"doc_id": 4, "text": "DELTA"},        # changed
        {"doc_id": 5, "text": "echo"},         # added
    ])
    got = snapshot_diff(old, new).to_pandas().sort_values("doc_id")
    assert list(zip(got["doc_id"], got["status"])) == [
        (1, "removed"), (3, "changed"), (4, "changed"), (5, "added")]

    # identical snapshots → empty delta with stable schema
    same = snapshot_diff(old, old)
    assert same.count() == 0
    assert set(same.schema().names) == {"doc_id", "status"}


def test_sample_per_user_deterministic(ray_session):
    """Hash-ordered per-key sampling returns the identical set on re-run."""
    from __ray_entry__ import queries

    q = queries()["events_sample_per_user"]
    a = q("/root/testdata/sf0.001").to_pandas()
    b = q("/root/testdata/sf0.001").to_pandas()
    key = ["user_id", "event_id"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))
    assert (a.groupby("user_id").size() <= 2).all()


def test_chunk_documents_windows(ray_session):
    """Overlap chunking: windows of C advancing by C-overlap, last chunk
    short but never empty; brute-force reference per doc."""
    import ray.data as rd

    from clp_core_ray.functions.curation import chunk_documents

    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{i}" for i in range(int(rng.integers(1, 90))))
             for _ in range(60)]
    texts.append("solo")                   # single-word doc -> one chunk
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    C, O = 16, 4
    out = chunk_documents(rd.from_arrow(tbl).repartition(5),
                          chunk_words=C, overlap=O).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"])
    stride = C - O
    for doc_id, g in out.groupby("doc_id"):
        words = texts[doc_id].split()
        n = len(words)
        want = []
        s = 0
        while True:
            want.append((s, words[s:s + C]))
            if s + C >= n:
                break
            s += stride
        assert g.chunk_idx.tolist() == list(range(len(want)))
        assert g.word_start.tolist() == [w[0] for w in want]
        assert g.chunk_text.tolist() == [" ".join(w[1]) for w in want]
        assert g.n_words.tolist() == [len(w[1]) for w in want]


def test_chunk_documents_rejects_bad_overlap():
    import pytest

    from clp_core_ray.functions.curation import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(None, chunk_words=8, overlap=8)


def test_length_bucket_batches_order(ray_session):
    """Batch ids follow ORDER BY n_tokens, id in fixed-size groups."""
    import ray.data as rd

    from clp_core_ray.functions.curation import length_bucket_batches

    rng = np.random.default_rng(11)
    n = 300
    lens = rng.integers(1, 50, size=n)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array([" ".join(["t"] * int(k)) for k in lens]),
    })
    B = 7
    out = length_bucket_batches(rd.from_arrow(tbl).repartition(6),
                                batch_rows=B).to_pandas()
    order = np.lexsort((np.arange(n), lens))
    want = {int(doc): rank // B for rank, doc in enumerate(order)}
    got = dict(zip(out.doc_id, out.batch_id))
    assert got == want
    # padding efficiency: token spread inside a batch <= spread overall
    spread = out.merge(
        pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                  "n": pa.array(lens)}).to_pandas(), on="doc_id") \
        .groupby("batch_id")["n"].agg(["min", "max"])
    assert ((spread["max"] - spread["min"]) <= (lens.max() - lens.min())).all()


def test_fuzzy_decontaminate_broadcast(ray_session):
    """Near-dup of a bench doc is flagged (no exact 8-gram needed); clean
    docs pass; drop mode removes flagged rows."""
    import ray.data as rd

    from clp_core_ray.functions.curation import fuzzy_decontaminate

    bench = ["the quick brown fox jumps over the lazy dog near the river "
             "bank today at dawn"]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            # paraphrased leak: one word changed -> high jaccard, flagged
            "the quick brown fox jumps over the lazy dog near the river "
            "bank tomorrow at dawn",
            "completely different words about database queries and "
            "vectorized execution plans today",
            # verbatim leak
            "the quick brown fox jumps over the lazy dog near the river "
            "bank today at dawn",
            # shares a few words only -> low jaccard, clean
            "the lazy dog sleeps all day near the house",
        ]),
    })
    out = fuzzy_decontaminate(rd.from_arrow(docs).repartition(2), bench) \
        .to_pandas().sort_values("doc_id")
    assert out.contaminated.tolist() == [True, False, True, False]
    kept = fuzzy_decontaminate(rd.from_arrow(docs), bench, drop=True) \
        .to_pandas()
    assert sorted(kept.doc_id.tolist()) == [1, 3]
    assert "contaminated" not in kept.columns


def test_char_entropy_values():
    import math

    from clp_core_ray.functions.text import char_entropy

    a = pa.array(["aaaa", "ab", "", None, "abab", "abcd"])
    out = char_entropy(a).to_pylist()
    assert out[0] == 0.0 and str(out[0]) == "0.0"   # no negative zero
    assert abs(out[1] - 1.0) < 1e-12
    assert out[2] == 0.0 and out[3] == 0.0
    assert abs(out[4] - 1.0) < 1e-12
    assert abs(out[5] - 2.0) < 1e-12
    # natural text sits well above single-char spam
    nat, spam = char_entropy(
        pa.array(["the quick brown fox jumps over the lazy dog",
                  "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"])).to_pylist()
    assert nat > 3.5 > spam + 3.0


def test_zscore_by_group_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from clp_core_ray.pipelines.aggregate import zscore_by_group

    rng = np.random.default_rng(5)
    n = 2000
    key = rng.choice(["a", "b", "c"], n)
    val = rng.normal(loc=10, scale=4, size=n)
    val[key == "c"] = 7.5  # zero-variance group scores 0
    t = pa.table({"id": pa.array(range(n), type=pa.int64()),
                  "k": pa.array(key), "v": pa.array(val)})
    out = (zscore_by_group(rd.from_arrow(t).repartition(6),
                           key_col="k", val_col="v")
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = np.empty(n)
    for g in "abc":
        m = key == g
        sd = val[m].std()  # population std
        want[m] = 0.0 if sd == 0 else (val[m] - val[m].mean()) / sd
    assert np.allclose(out["z"].to_numpy(), want, atol=1e-9)


def test_quantile_gate(ray_session):
    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.curation import quantile_gate

    rng = np.random.default_rng(11)
    n = 1500
    lang = rng.choice(["en", "fr", "de"], n)
    chars = rng.integers(1, 500, n)
    t = pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "lang": pa.array(lang),
                  "n_chars": pa.array(chars, type=pa.int64())})
    out = quantile_gate(rd.from_arrow(t).repartition(5), key_col="lang",
                        val_col="n_chars", q=0.5).to_pandas()
    df = t.to_pandas()
    # DuckDB quantile_disc(0.5): sorted value at ceil(n*0.5)-1
    med = {g: sorted(s)[-(-len(s) // 2) - 1]
           for g, s in df.groupby("lang")["n_chars"]}
    want = set(df[df.apply(lambda r: r.n_chars > med[r.lang], axis=1)].doc_id)
    assert set(out["doc_id"]) == want
    # at_or_above keeps a superset including the median rows
    out2 = quantile_gate(rd.from_arrow(t), key_col="lang",
                         val_col="n_chars", q=0.5,
                         keep="at_or_above").to_pandas()
    want2 = set(df[df.apply(lambda r: r.n_chars >= med[r.lang], axis=1)].doc_id)
    assert set(out2["doc_id"]) == want2


def test_weighted_sample_deterministic(ray_session):
    """weighted_sample: survival matches the hash-threshold rule exactly
    and is identical across repartitions; higher weights survive more."""
    import numpy as np
    import ray.data as rd

    from clp_core_ray.functions.curation import weighted_sample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = np.concatenate([np.full(n // 2, 10.0), np.full(n // 2, 100.0)])
    t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    kept1 = set(weighted_sample(rd.from_arrow(t), id_col="doc_id",
                                weight_col="w", max_weight=100.0)
                .to_pandas()["doc_id"])
    kept2 = set(weighted_sample(rd.from_arrow(t).repartition(9),
                                id_col="doc_id", weight_col="w",
                                max_weight=100.0).to_pandas()["doc_id"])
    assert kept1 == kept2  # retry/repartition stable
    h = (ids * np.int64(2654435761)) % np.int64(4294967296)
    want = set(ids[h < np.floor(w / 100.0 * 4294967296.0)])
    assert kept1 == want
    lo = sum(1 for i in kept1 if i < n // 2)
    hi = sum(1 for i in kept1 if i >= n // 2)
    assert hi == n // 2  # weight == max -> always kept
    assert 0.05 < lo / (n // 2) < 0.2  # ~10% survival at weight 10


def test_span_corrupt_invertible(ray_session):
    """Span-corruption pairs reconstruct the original token stream exactly
    (splice target spans over the sentinels), are deterministic across
    runs/partitionings, and mask a nontrivial token fraction."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.curation import span_corrupt

    rng = np.random.default_rng(13)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 120)))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                  "text": pa.array(texts)})
    out = (span_corrupt(rd.from_arrow(t).repartition(5))
           .to_pandas().set_index("doc_id").sort_index())
    masked_total = orig_total = 0
    for did, row in out.iterrows():
        spans = {}
        cur = None
        for tok in row["target"].split(" ") if row["target"] else []:
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in row["input"].split(" "):
            if tok.startswith("<extra_id_"):
                rebuilt.extend(spans[tok])
                masked_total += len(spans[tok])
            else:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == texts[did], did
        orig_total += len(texts[did].split(" "))
    assert 0.05 < masked_total / orig_total < 0.30, \
        masked_total / orig_total
    again = (span_corrupt(rd.from_arrow(t).repartition(2))
             .to_pandas().set_index("doc_id").sort_index())
    assert (again["input"] == out["input"]).all()
    assert (again["target"] == out["target"]).all()


def test_expectations_detect_planted_violations(ray_session):
    """Every rule kind counts exactly its planted violations, including
    null-as-violation semantics and cross-batch duplicate keys."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from clp_core_ray.functions.expect import run_expectations

    t = pa.table({
        "id": pa.array([1, 2, 3, 3, 4, 5, 1, 6], type=pa.int64()),
        "cat": pa.array(["a", "b", "zz", None, "a", "b", "a", "b"]),
        "x": pa.array([1.0, 2.0, None, 50.0, -7.0, 3.0, 4.0, 5.0]),
        "s": pa.array(["ok1", "ok2", "bad", "ok3", None, "ok4", "ok5",
                       "ok6"]),
    })
    out = run_expectations(rd.from_arrow(t).repartition(4), [
        {"rule": "cat_in_set", "kind": "in_set", "col": "cat",
         "values": ["a", "b"]},
        {"rule": "id_unique", "kind": "unique", "col": "id"},
        {"rule": "x_in_range", "kind": "in_range", "col": "x",
         "lo": 0.0, "hi": 10.0},
        {"rule": "x_not_null", "kind": "not_null", "col": "x"},
        {"rule": "s_matches", "kind": "matches", "col": "s",
         "pattern": r"^ok\d$"},
    ]).to_pandas().set_index("rule")
    assert out.loc["cat_in_set", "violations"] == 2      # 'zz' + null
    assert out.loc["id_unique", "violations"] == 2       # dup 3 and dup 1
    assert out.loc["x_in_range", "violations"] == 3      # null, 50, -7
    assert out.loc["x_not_null", "violations"] == 1
    assert out.loc["s_matches", "violations"] == 2       # 'bad' + null
    assert (out["total"] == 8).all()
