"""repetition_stats vs a per-row brute force, including degenerate docs."""

from collections import Counter

import pyarrow as pa

from clp_core_ray.functions.text import repetition_stats


def _brute(text):
    ws = text.split(" ")
    wc = Counter(ws)
    bg = Counter(zip(ws, ws[1:]))
    return (
        len(ws),
        len(wc),
        max(wc.values()),
        max(bg.values()) if bg else 0,
    )


def test_repetition_stats_bruteforce():
    texts = [
        "a b c a b c a b c",          # dominant bigram
        "x x x x x",                   # one repeated word
        "hello",                       # single word, no bigram
        "",                            # empty → one empty token
        "a  b",                        # double space → empty middle token
        "spam spam spam eggs spam spam",
        "w1 w2 w3 w4 w5 w6 w7",        # all distinct
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_stats(t)
    for i, text in enumerate(texts):
        exp = _brute(text)
        got = (
            out.column("n_words")[i].as_py(),
            out.column("n_distinct_words")[i].as_py(),
            out.column("top_word_cnt")[i].as_py(),
            out.column("top_bigram_cnt")[i].as_py(),
        )
        assert got == exp, f"row {i} ({text!r}): {got} != {exp}"
    assert "text" not in out.column_names


def test_repetition_stats_batch_vs_single():
    """Row results must not depend on neighbors in the batch."""
    texts = ["a a b", "c d c d c", "q"]
    whole = repetition_stats(pa.table({"text": texts}))
    for i, tx in enumerate(texts):
        one = repetition_stats(pa.table({"text": [tx]}))
        for col in whole.column_names:
            assert whole.column(col)[i].as_py() == one.column(col)[0].as_py()
