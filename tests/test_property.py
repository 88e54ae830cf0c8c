"""Property-based conformance tests (hypothesis) — the reference's random
round-trip strategy (test-EncodedVariableInterpreter.cpp uses exhaustive
digit-pattern tables; these generalize them to arbitrary inputs).

Kernel-level properties run WITHOUT Ray (pure batch functions) so hypothesis
can afford hundreds of examples.
"""

import json

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clp_core_ray import encoding as E

# printable-ish text incl. the placeholder/escape bytes that must be escaped
_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=126),
        st.sampled_from("\x11\x12\x13\\ \t=.:-+0123456789abcdefABCDEFé中"),
    ),
    max_size=120,
)


@settings(max_examples=300, deadline=None)
@given(_text)
def test_encode_decode_roundtrip_scalar(msg):
    """Scalar oracle: encode_message → decode_message is the identity."""
    logtype, evs, vts, dvs = E.encode_message(msg)
    assert E.decode_message(logtype, evs, dict_vars=dvs) == msg


@settings(max_examples=100, deadline=None)
@given(st.lists(_text, min_size=1, max_size=40))
def test_encode_decode_roundtrip_vectorized(msgs):
    """Vectorized kernels agree with the scalar oracle AND round-trip."""
    from clp_core_ray.vec.decoder import decode_batch
    from clp_core_ray.vec.tokenizer import encode_batch

    arr = pa.array(msgs, type=pa.large_string())
    enc = encode_batch(arr)
    out = decode_batch(enc["logtype"], enc["encoded_vars"], enc["var_types"],
                       dict_vars=enc["dict_vars"])
    assert out.to_pylist() == msgs
    for i, m in enumerate(msgs):
        lt, evs, vts, dvs = E.encode_message(m)
        assert enc["logtype"][i].as_py() == lt, m
        assert enc["encoded_vars"][i].as_py() == list(evs), m


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=30),
       st.text(alphabet="abc*?\\x ", max_size=12))
def test_wildcard_regex_matches_reference_semantics(_, pattern):
    """wildcard_to_regex compiles for every pattern and agrees with a direct
    backtracking wildcard matcher on random subjects."""
    import re

    from clp_core_ray.pipelines.search import wildcard_to_regex

    rx = re.compile(wildcard_to_regex(pattern))

    def ref_match(p, s):
        # reference semantics: * = any run, ? = any char, \ escapes next
        # (dangling \ dropped)
        toks = []
        i = 0
        while i < len(p):
            c = p[i]
            if c == "\\":
                if i + 1 < len(p):
                    toks.append(("lit", p[i + 1]))
                i += 2
            elif c == "*":
                toks.append(("star", None))
                i += 1
            elif c == "?":
                toks.append(("any", None))
                i += 1
            else:
                toks.append(("lit", c))
                i += 1

        from functools import lru_cache

        @lru_cache(maxsize=None)
        def m(ti, si):
            if ti == len(toks):
                return si == len(s)
            k, v = toks[ti]
            if k == "star":
                return any(m(ti + 1, sj) for sj in range(si, len(s) + 1))
            if si >= len(s):
                return False
            if k == "any" or s[si] == v:
                return m(ti + 1, si + 1)
            return False

        return m(0, 0)

    subjects = ["", "abc", "axc", "ab", "abcabc", "a?c", "a*c", "x" * 5,
                "ab\\c", pattern.replace("\\", "")]
    for s in subjects:
        assert bool(rx.fullmatch(s)) == ref_match(pattern, s), (pattern, s)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=2**62),
    st.one_of(st.booleans(), st.integers(min_value=-(2**62), max_value=2**62),
              st.text(max_size=20), st.none(),
              st.lists(st.integers(min_value=-100, max_value=100), max_size=4)),
), min_size=0, max_size=8).map(lambda kvs: {f"k{k}": v for k, v in kvs}))
def test_kv_ir_roundtrip_property(record):
    """Any flat JSON-able record survives the KV-IR wire format."""
    from clp_core_ray.ir_kv import deserialize_kv_ir_stream, serialize_kv_ir_stream

    buf = serialize_kv_ir_stream([record])
    _, events = deserialize_kv_ir_stream(buf)
    assert events[0][1] == record


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=-(2**40), max_value=2**40),
                          _text), min_size=1, max_size=20))
def test_unstructured_ir_roundtrip_property(rows):
    """Random (ts, text) sequences survive both IR encodings."""
    from clp_core_ray import ir

    ts = [abs(t) for t, _ in rows]
    msgs = [m for _, m in rows]
    for four in (True, False):
        blob = ir.serialize_ir_stream(ts, msgs, four_byte=four)
        tbl = ir.decode_ir_stream_to_text(blob)
        assert tbl.column("text").to_pylist() == msgs
        assert tbl.column("ts").to_pylist() == ts
