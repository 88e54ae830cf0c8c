"""Composed curation pipeline (functions/curation.py) vs brute force."""

from collections import Counter

import pandas as pd
import pytest

import ray.data as rd

from clp_core_ray.functions.curation import curation_pipeline, dedup_keep_min


def _docs():
    rows = []
    # quality-failing: too short / one dominant word
    rows.append((0, "too short doc", "en"))
    rows.append((1, " ".join(["spam"] * 30), "en"))
    # healthy docs, with exact duplicates (6 is the min-id survivor).
    # ids stay >= 5: doc_id < 5 is the benchmark set, and a duplicate
    # inside it would self-contaminate the whole group.
    body = " ".join(f"w{i % 11} t{i % 7}" for i in range(15))
    rows.append((6, body, "en"))
    rows.append((7, body, "de"))
    rows.append((52, body, "en"))
    # benchmark doc (doc_id < 5 in the query convention) + contaminated doc
    bench = " ".join(f"b{i}" for i in range(30))
    rows.append((3, bench, "en"))
    contaminated = "x y " + " ".join(f"b{i}" for i in range(10)) + " tail " + \
        " ".join(f"z{i}" for i in range(12))
    rows.append((4, contaminated, "en"))
    # survivors across strata: en kept iff id%100<50, de<25, else<10
    for i, lang in [(110, "en"), (160, "en"), (210, "de"), (230, "de"),
                    (305, "fr"), (355, "fr")]:
        rows.append((i, " ".join(f"u{i}w{j % 13}x{j % 5}" for j in range(25)),
                     lang))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _brute(df, bench_texts):
    def qual(t):
        ws = t.split(" ")
        return len(ws) >= 20 and max(Counter(ws).values()) * 5 <= len(ws)

    q = df[df.text.map(qual)]
    ded = q.loc[q.groupby("text").doc_id.idxmin()]
    grams = set()
    for t in bench_texts:
        ws = t.split()
        grams.update(" ".join(ws[i:i + 8]) for i in range(len(ws) - 7))

    def clean(t):
        padded = " " + " ".join(t.split()) + " "
        return not any(" " + g + " " in padded for g in grams)

    c = ded[ded.text.map(clean)]
    rate = {"en": 50, "de": 25}
    keep = c.apply(
        lambda r: (r.doc_id % 100) < rate.get(r.lang, 10), axis=1
    )
    return sorted(c[keep].doc_id.tolist())


@pytest.mark.usefixtures("ray_session")
def test_dedup_keep_min_keeps_payload():
    df = _docs()
    out = dedup_keep_min(rd.from_pandas(df).repartition(3)).to_pandas()
    assert set(out.columns) == {"doc_id", "text", "lang"}
    exp = df.loc[df.groupby("text").doc_id.idxmin()]
    assert sorted(out.doc_id) == sorted(exp.doc_id)
    # survivor rows carry their own payload
    m = out.set_index("doc_id")
    for _, r in exp.iterrows():
        assert m.loc[r.doc_id, "lang"] == r.lang


@pytest.mark.usefixtures("ray_session")
def test_curation_pipeline_matches_bruteforce():
    df = _docs()
    bench = df[df.doc_id < 5].text.tolist()
    got = sorted(
        curation_pipeline(rd.from_pandas(df).repartition(4), bench)
        .to_pandas()
        .doc_id.tolist()
    )
    exp = _brute(df, bench)
    assert got == exp
    assert 6 in got          # min-id duplicate survives
    assert 7 not in got and 52 not in got
    assert 1 not in got      # repetition-filtered
    assert 4 not in got      # contaminated
    assert 110 in got and 160 not in got  # en residue rule
