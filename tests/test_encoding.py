"""Conformance tests for the scalar CLP encoding kernels.

Case tables ported from the reference's unit tests (citations relative to
/root/reference/components/core/tests/):
- test-EncodedVariableInterpreter.cpp:18-533 (int/float accept+reject tables,
  encode→decode message equality, placeholder handling)
- test-ir_parsing.cpp:12-116 (tokenizer bounds)
"""

import pytest

from clp_core_ray import encoding as E

INT64_MAX = 2**63 - 1
INT64_MIN = -(2**63)


# --- convert_string_to_representable_integer_var (test-EncodedVariableInterpreter.cpp:19-189)
INT_ACCEPT = [
    ("0", 0),
    ("-1", -1),
    ("1", 1),
    (str(INT64_MAX), INT64_MAX),
    (str(INT64_MIN), INT64_MIN),
]
INT_REJECT = [
    "", "a", "-", "+", "-a", "+a", "--", "++",
    " 1", "- 1", "1 ", "01", "+1", "1u", "1U", "1l", "1L", "1ll", "1LL",
    "0.0", "-0",
    # beyond the reference table: overflow edges
    str(INT64_MAX + 1), str(INT64_MIN - 1),
]


@pytest.mark.parametrize("s,expected", INT_ACCEPT)
def test_int_accept(s, expected):
    assert E.encode_int(s) == expected


@pytest.mark.parametrize("s", INT_REJECT)
def test_int_reject(s):
    assert E.encode_int(s) is None


# --- convert_string_to_representable_float_var (test-EncodedVariableInterpreter.cpp:191-377)
FLOAT_ROUNDTRIP = [
    "0.0", "-1.0", "1.0", ".1", "-00.00",
    "-999999999999999.9", "-.9999999999999999", ".9999999999999999",
]
FLOAT_REJECT = [
    "", "a", "-", "+", "-a", "+a", "--", "++",
    ".", "1.", " 1.0", "- 1.0", "1.0 ", "+1.0",
    "1.0f", "1.0F", "1.0l", "1.0L",
    str(2**64 - 1),
    # beyond the reference table
    "1..0", "1.2.3", "12345678901234567.0",
]


@pytest.mark.parametrize("s", FLOAT_ROUNDTRIP)
def test_float_roundtrip(s):
    enc = E.encode_float(s)
    assert enc is not None
    assert E.decode_float(enc) == s
    assert INT64_MIN <= enc <= INT64_MAX


@pytest.mark.parametrize("s", FLOAT_REJECT)
def test_float_reject(s):
    assert E.encode_float(s) is None


# --- tokenizer (test-ir_parsing.cpp:12-116)
def toks(s):
    return [s[b:e] for b, e in E.token_bounds(s)]


def test_tokenizer_corner_cases():
    assert toks("") == []
    assert toks("/") == []
    assert toks("xyz") == []
    assert toks("=") == []


def test_tokenizer_variables():
    assert toks("~=x!abc123;1.2%x:+394/-") == ["x", "abc123", "1.2", "+394"]


def test_tokenizer_hex():
    assert toks(" ad ff 95 24 0d ff ") == ["ad", "ff", "95", "24", "0d", "ff"]


def test_tokenizer_placeholder_in_input():
    s = " text " + E.PLACEHOLDER_INT + " var123 "
    assert toks(s) == ["var123"]


def test_is_var():
    assert E.is_var("abc123")
    assert E.is_var("1.2")
    assert E.is_var("abc")  # hex rule: [a-fA-F0-9]{2,}
    assert not E.is_var("xyz")
    assert not E.is_var("abc123 ")
    assert not E.is_var("")


# --- encode→decode message equality (test-EncodedVariableInterpreter.cpp:379-533)
def test_encode_decode_reference_message():
    large_val_str = str(2**62) + "0"  # very large int → dict var (doesn't fit int64)
    var_strs = ["4938", large_val_str, "-25.5196868642755", "-00.00", "python2.7.3"]
    msg = (
        "here is a string with a small int " + var_strs[0]
        + " and a very large int " + var_strs[1]
        + " and a double " + var_strs[2]
        + " and a weird double " + var_strs[3]
        + " and a str with numbers " + var_strs[4]
        + " and an escape " + E.PLACEHOLDER_ESCAPE
        + " and an int placeholder " + E.PLACEHOLDER_INT
        + " and a float placeholder " + E.PLACEHOLDER_FLOAT
        + " and a dictionary placeholder " + E.PLACEHOLDER_DICT
    )
    logtype, evs, vts, dvs = E.encode_message(msg)
    assert vts == [E.VT_INT, E.VT_DICT, E.VT_FLOAT, E.VT_FLOAT, E.VT_DICT]
    assert evs[0] == 4938
    assert dvs == [large_val_str, "python2.7.3"]
    # placeholders inside constants are escaped in the logtype
    assert E.PLACEHOLDER_ESCAPE + E.PLACEHOLDER_INT in logtype
    # round trip — inline dict vars
    assert E.decode_message(logtype, evs, dict_vars=dvs) == msg
    # round trip — broadcast dictionary by content-hash id
    table = {E.fnv1a64(v.encode()): v for v in dvs}
    assert E.decode_message(logtype, evs, dict_lookup=table.__getitem__) == msg


@pytest.mark.parametrize(
    "msg",
    [
        "",
        "no variables here",
        "only delims !@#$%^&*()",
        "MyDog123 ate APet4123\\test.txt at 1.9 GB and 123.123",
        "k=v key=value123 x=10",
        "a=b",  # '=' preceded token with alpha
        "\\ \x11 \x12 \x13 literal placeholders",
        "trailing int 42",
        "-0 +1 01 1. .5 0.0",  # canonical-form edges in context
        "hex deadbeef and AD0194 mixed Ad01x94z",
        "unicode héllo wörld 42 é=café2",
    ],
)
def test_roundtrip_misc(msg):
    logtype, evs, vts, dvs = E.encode_message(msg)
    assert E.decode_message(logtype, evs, dict_vars=dvs) == msg


def test_fixture_log_lines_roundtrip():
    # mirrors reference fixture tests/test_log_files/log.txt tricky cases
    lines = [
        "2016-05-08 07:34:05.251 INFO  main: Starting deletion of file /tmp/py192.txt",
        "2016-05-08 07:34:05.252 INFO  main: MyDog123 APet4123\\test.txt",
        "got 1.9 GB of space left on /dev/sda1",
        "value=123.123 other=abc123",
        "relative ts only +busy 250ms",
    ]
    for msg in lines:
        logtype, evs, vts, dvs = E.encode_message(msg)
        assert E.decode_message(logtype, evs, dict_vars=dvs) == msg
