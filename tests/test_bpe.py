"""BPE trainer/encoder: distributed == pure-Python reference, lossless."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from clp_core_ray.functions.bpe import (
    BpeModel,
    bpe_encode,
    decode_ids,
    encode_texts,
    learn_merges,
    pretokenize_buffers,
    train_bpe,
)
from clp_core_ray.vec.tokenizer import _string_buffers

CORPUS = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "low lower lowest",
    "low low low low low",
    "newer newest new",
    "ERROR: connection timeout after 300 ms",
    "ERROR: connection refused by 10.0.0.1",
    "  indented   with   runs of spaces  ",
    "tabs\tand\nnewlines\r\n",
    "unicode: héllo wörld — naïve café ☃ 🎉",
    "numbers 12345 and 67890 mixed a1b2c3",
    "",
    "repeated aaaa aaaaaaaa aaaaaaaaaaaaaaaa",
]


def ref_pretokenize(text: str) -> list[bytes]:
    """Independent per-doc scalar reference for the byte pretokenizer."""
    data = text.encode("utf-8")
    if not data:
        return []

    def cls(b):
        if b == 0x20:
            return "s"
        if 0x30 <= b <= 0x39:
            return "d"
        if 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A or b >= 0x80:
            return "l"
        return "o"

    toks, cur = [], bytearray([data[0]])
    for i in range(1, len(data)):
        p, c = cls(data[i - 1]), cls(data[i])
        boundary = False
        if c != p and not (p == "s" and c != "s"):
            boundary = True
        if (c == "s" and p == "s" and i + 1 < len(data)
                and cls(data[i + 1]) != "s"):
            boundary = True
        if boundary:
            toks.append(bytes(cur))
            cur = bytearray()
        cur.append(data[i])
    toks.append(bytes(cur))
    return toks


def ref_learn(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    """Dict-and-loop reference BPE trainer (Sennrich-style)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for mi in range(n_merges):
        pair_counts = collections.Counter()
        for w, syms in seqs.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += c
        if not pair_counts:
            break
        best_cnt = max(pair_counts.values())
        if best_cnt < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_cnt)
        merges.append(best)
        new = 256 + mi
        a, b = best
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


def _word_counts(texts) -> dict:
    wc = collections.Counter()
    for t in texts:
        for tok in ref_pretokenize(t):
            wc[tok] += 1
    return dict(wc)


def test_pretokenizer_matches_scalar_reference_and_concats():
    arr = pa.array(CORPUS, type=pa.large_string())
    offsets, data = _string_buffers(arr)
    tok_off, tok_doc = pretokenize_buffers(offsets, data)
    got = [[] for _ in CORPUS]
    for i in range(len(tok_doc)):
        got[tok_doc[i]].append(data[tok_off[i]:tok_off[i + 1]].tobytes())
    for text, toks in zip(CORPUS, got):
        assert toks == ref_pretokenize(text)
        assert b"".join(toks).decode("utf-8") == text


def test_learn_merges_matches_reference():
    wc = _word_counts(CORPUS)
    words = sorted(wc)
    counts = np.array([wc[w] for w in words], dtype=np.int64)
    merges = learn_merges(words, counts, n_merges=60)
    ref_merges, ref_seqs = ref_learn(wc, 60)
    assert [tuple(m) for m in merges] == ref_merges
    # encoding a training word with the final model reproduces the
    # trainer's final symbol sequence for that word
    from clp_core_ray.functions.bpe import _encode_word

    model = BpeModel(merges=merges)
    for w in words:
        got = _encode_word(w, model.ranks, model.merges).tolist()
        assert got == ref_seqs[w], w


def pc_flat(ids):
    import pyarrow.compute as pc

    return pc.list_flatten(ids).to_numpy(zero_copy_only=False).tolist()


def test_encode_decode_roundtrip():
    wc = _word_counts(CORPUS)
    words = sorted(wc)
    counts = np.array([wc[w] for w in words], dtype=np.int64)
    model = BpeModel(merges=learn_merges(words, counts, n_merges=80))
    tricky = CORPUS + ["", "   ", "a", " ", "🎉🎉🎉", "x" * 1000,
                       "mix 🎉 of ascii and émoji\n\n\t"]
    ids, n_tok = encode_texts(pa.array(tricky, type=pa.large_string()), model)
    back = decode_ids(ids, model)
    assert back.to_pylist() == tricky
    n = n_tok.to_pylist()
    assert n[tricky.index("")] == 0
    assert all(isinstance(v, int) for v in n)


def test_merge_compression_reduces_token_count():
    wc = _word_counts(CORPUS)
    words = sorted(wc)
    counts = np.array([wc[w] for w in words], dtype=np.int64)
    m0 = BpeModel(merges=np.zeros((0, 2), dtype=np.int32))
    m80 = BpeModel(merges=learn_merges(words, counts, n_merges=80))
    arr = pa.array(CORPUS, type=pa.large_string())
    _, n0 = encode_texts(arr, m0)
    _, n80 = encode_texts(arr, m80)
    assert sum(n80.to_pylist()) < sum(n0.to_pylist())
    # zero merges == raw byte count of each pretokenized doc
    assert n0.to_pylist() == [len(t.encode("utf-8")) for t in CORPUS]


def test_distributed_train_and_encode_match_local(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(CORPUS)), type=pa.int64()),
        "text": pa.array(CORPUS, type=pa.large_string()),
    })).repartition(4)
    model = train_bpe(ds, n_merges=60, min_count=1)
    ref_merges, _ = ref_learn(_word_counts(CORPUS), 60)
    assert [tuple(m) for m in model.merges] == ref_merges

    out = bpe_encode(ds, model).to_arrow_refs()
    import ray

    tbl = pa.concat_tables([t for t in ray.get(out) if t.num_rows])
    tbl = tbl.sort_by("doc_id")
    local_ids, local_n = encode_texts(
        pa.array(CORPUS, type=pa.large_string()), model)
    assert tbl.column("n_tokens").to_pylist() == local_n.to_pylist()
    assert tbl.column("token_ids").to_pylist() == local_ids.to_pylist()
    back = decode_ids(tbl.column("token_ids").combine_chunks(), model)
    assert back.to_pylist() == CORPUS


def test_min_pair_count_stops_early():
    wc = {b"ab": 1, b"cd": 1}
    merges = learn_merges(sorted(wc), np.array([1, 1]), n_merges=10,
                          min_pair_count=2)
    assert len(merges) == 0


@pytest.mark.parametrize("text", ["aaa", "aaaa", "aaaaa", "aaaaaa"])
def test_same_symbol_overlap_leftmost(text):
    # pair (a,a): leftmost-first non-overlapping — matches the reference
    wc = {text.encode(): 5}
    merges = learn_merges(sorted(wc), np.array([5]), n_merges=3,
                          min_pair_count=1)
    ref_merges, ref_seqs = ref_learn(wc, 3, min_pair_count=1)
    assert [tuple(m) for m in merges] == ref_merges
    model = BpeModel(merges=merges)
    ids, _ = encode_texts(pa.array([text], type=pa.large_string()), model)
    assert pc_flat(ids) == ref_seqs[text.encode()]


def test_roundtrip_property_random_texts():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    wc = _word_counts(CORPUS)
    words = sorted(wc)
    counts = np.array([wc[w] for w in words], dtype=np.int64)
    model = BpeModel(merges=learn_merges(words, counts, n_merges=40))

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.text(max_size=40), max_size=8))
    def check(texts):
        ids, _ = encode_texts(pa.array(texts, type=pa.large_string()), model)
        assert decode_ids(ids, model).to_pylist() == texts

    check()
