"""DFA lexer (functions/dfa.py): parser subset, priority, and equivalence
with the regex rules engine (the semantics oracle)."""

import random
import re

import numpy as np
import pyarrow as pa
import pytest

from clp_core_ray.functions.dfa import DfaUnsupported, compile_rules
from clp_core_ray.functions.rules import DEFAULT_RULES, RuleSet, RuleEncodeStage


def _match_all(dfa, toks):
    buf = ("\n".join(toks) + "\n").encode()
    data = np.frombuffer(buf, dtype=np.uint8)
    starts, lens, pos = [], [], 0
    for t in toks:
        starts.append(pos)
        lens.append(len(t.encode()))
        pos += len(t.encode()) + 1
    return dfa.match_tokens(
        data, np.asarray(starts, dtype=np.int64), np.asarray(lens, dtype=np.int64)
    )


def _oracle(rules, toks):
    pats = [re.compile(f"(?:{r})\\Z") for r in rules]
    out = []
    for t in toks:
        for i, p in enumerate(pats):
            if p.match(t):
                out.append(i)
                break
        else:
            out.append(-1)
    return np.asarray(out)


def test_full_token_acceptance_and_priority():
    rules = [r"\-{0,1}[0-9]+\.[0-9]+", r"\-{0,1}[0-9]+", r"[a-fA-F]+",
             r".*\d.*", r".*=.*[a-zA-Z0-9].*"]
    dfa = compile_rules(rules)
    toks = ["-12.5", "-12", "deadBEEF", "a1b", "x=1", "=", "-", "1.",
            ".5", "-00.00", "abc", "A=z", "{", "1e5", "0", "face", "FaCe"]
    got = _match_all(dfa, toks)
    assert (got == _oracle(rules, toks)).all()


def test_priority_tie_lowest_rule_wins():
    dfa = compile_rules([r"[0-9]+", r"\d+"])
    assert _match_all(dfa, ["123"])[0] == 0
    dfa2 = compile_rules([r"\d+", r"[0-9]+"])
    assert _match_all(dfa2, ["123"])[0] == 0


def test_quantifiers_classes_groups():
    rules = [r"(ab){2,3}c?", r"x{3}", r"[^0-9ab]+", r"(?:q|r[st])+",
             r"a{,2}b"]
    dfa = compile_rules(rules)
    toks = ["ababc", "ababab", "abababc", "ab", "xxx", "xx", "xxxx",
            "cdef", "0a", "qrsrt", "rs", "b", "ab", "aab", "aaab",
            "ababcq"]
    got = _match_all(dfa, toks)
    exp = _oracle(rules, toks)
    assert (got == exp).all(), list(zip(toks, got, exp))


def test_lazy_quantifier_same_language():
    # full-token acceptance is greedy/lazy-agnostic
    dfa = compile_rules([r"a+?b", r".*?=.*"])
    toks = ["aab", "b", "x=1", "=", "aabq"]
    got = _match_all(dfa, toks)
    exp = _oracle([r"a+?b", r".*?=.*"], toks)
    assert (got == exp).all()


def test_escapes_and_non_ascii_literal():
    rules = [r"\x41+\.?", "café"]  # 'A'+ and a utf-8 literal
    dfa = compile_rules(rules)
    toks = ["AAA", "AA.", "café", "cafe", "A."]
    got = _match_all(dfa, toks)
    exp = _oracle(rules, toks)
    assert (got == exp).all()


@pytest.mark.parametrize("rx", [
    r"^abc", r"abc$", r"a\b", r"(?=x)a", r"(?!x)a", r"(?<=x)a",
    r"[é]", r"a{300}", r"a{1,999}", r"a**",
])
def test_unsupported_syntax_raises(rx):
    with pytest.raises(DfaUnsupported):
        compile_rules([rx])


def test_stage_dfa_equals_regex_engine():
    text = (
        "delimiters: \\t\\r\\n!\"#$%&'\\(\\)\\*,:;<>?@\\[\\]\\^_`\\{\\|\\}~\n"
        "timestamp:\\d{4}\\-\\d{2}\\-\\d{2} \\d{2}:\\d{2}:\\d{2}(\\.\\d{3}){0,1}\n"
        "int:\\-{0,1}[0-9]+\n"
        "float:\\-{0,1}[0-9]+\\.[0-9]+\n"
        "hex:[a-fA-F]+\n"
        "hasNumber:.*\\d.*\n"
        "equals:.*=.*[a-zA-Z0-9].*\n"
    )
    rs = RuleSet.from_schema_text(text)
    s_dfa = RuleEncodeStage(rs, keep_text=True, use_dfa=True)
    s_rx = RuleEncodeStage(rs, keep_text=True, use_dfa=False)
    assert s_dfa.dfa is not None
    rng = random.Random(11)
    words = ["ERROR", "disk", "node-7", "a=b", "x=12", "1.5GB", "99",
             "-3.25", "00", "id-12ab", "path/to/file.bin", "[tag]",
             "{json:1}", "café", "0x1f", "dead", "BEEF", "=", "-",
             "...", "1.2.3.4", "a\\b"]
    rows = []
    for _ in range(800):
        ts = "2015-01-31 15:50:45.392 " if rng.random() < 0.4 else ""
        rows.append(ts + " ".join(rng.choice(words)
                                  for _ in range(rng.randint(0, 12))))
    rows += ["", " ", "2015-01-31 15:50:45", "x" * 300]
    batch = pa.table({"text": pa.array(rows)})
    assert s_dfa(batch).equals(s_rx(batch))


def test_stage_falls_back_on_unsupported_rule():
    rs = RuleSet([("anch", r"^abc$")] + list(DEFAULT_RULES),
                 delimiters=r" \t\r\n")
    st = RuleEncodeStage(rs, use_dfa=True)
    assert st.dfa is None  # regex engine takes over, no crash
    out = st(pa.table({"text": pa.array(["x 12 y"])}))
    assert out["n_vars"][0].as_py() == 1


def test_empty_and_all_delim_rows():
    rs = RuleSet(list(DEFAULT_RULES), delimiters=r" \t\r\n")
    st = RuleEncodeStage(rs, keep_text=True, use_dfa=True)
    out = st(pa.table({"text": pa.array(["", "   ", "7", " 7 "])}))
    assert out["n_vars"].to_pylist() == [0, 0, 1, 1]
