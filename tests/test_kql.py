"""KQL grammar conformance — cases ported from the reference's test-kql.cpp
(components/core/tests/test-kql.cpp) against the grammar in
clp_s/search/kql/Kql.g4 and visitor kql/kql.cpp."""

import pyarrow as pa
import pytest

from clp_core_ray.functions.filters import (
    Bool,
    Pred,
    clean_up_wildcard_search_string,
    eval_dnf,
    parse_kql,
    to_dnf,
    tokenize_column_descriptor,
    unescape_kql_value,
)


# ---- basic filters (test-kql.cpp "Basic filter" / AND / OR sections) -------


@pytest.mark.parametrize("q", ["key: value", "key  :  value", '"key": "value"'])
def test_basic_filter(q):
    ast = parse_kql(q)
    assert ast == Pred("eq", "key", "value")


@pytest.mark.parametrize(
    "q",
    ["key1:value1 AND key2:value2", "key1  : value1 AND  key2  : value2",
     "key1:value1 and key2:value2"],
)
def test_basic_and(q):
    ast = parse_kql(q)
    assert isinstance(ast, Bool) and ast.op == "and" and len(ast.args) == 2


@pytest.mark.parametrize(
    "q",
    ["key1:value1 OR key2:value2", "key1  : value1 OR  key2  : value2",
     "key1:value1 or key2:value2"],
)
def test_basic_or(q):
    ast = parse_kql(q)
    assert isinstance(ast, Bool) and ast.op == "or" and len(ast.args) == 2


def test_basic_not():
    ast = parse_kql("NOT key: value")
    assert ast == Bool("not", [Pred("eq", "key", "value")])


@pytest.mark.parametrize(
    "q",
    ["NOT :", "NOT key: ", "a : a AND b :", " : a AND b :", ": a AND b :b",
     " AND b :b", "a: a AND", "a : a OR b :", " OR b :b", "a: a OR"],
)
def test_incorrect_queries_raise(q):
    with pytest.raises(ValueError):
        parse_kql(q)


# ---- precedence: ANTLR puts AND and OR on ONE level, left-assoc ------------


def test_and_or_equal_precedence_left_assoc():
    ast = parse_kql("a:1 AND b:2 OR c:3")
    assert ast.op == "or"
    assert ast.args[0].op == "and"


def test_not_binds_tighter_than_and():
    ast = parse_kql("NOT a:1 AND b:2")
    assert ast.op == "and"
    assert ast.args[0].op == "not"


# ---- nested queries (NestedQuery alternative) ------------------------------


def test_nested_query_prefixes_paths():
    assert parse_kql("a: {b: v}") == Pred("eq", "a.b", "v")
    ast = parse_kql("outer: {x: 1 OR y: 2}")
    assert ast == Bool("or", [Pred("eq", "outer.x", 1), Pred("eq", "outer.y", 2)])
    # two-level nesting
    assert parse_kql("a: {b: {c: *}}") == Pred("exists", "a.b.c")


# ---- list of values (list_of_values alternative) ---------------------------


def test_value_list_default_or():
    ast = parse_kql("status: (200 404)")
    assert ast == Bool("or", [Pred("eq", "status", 200), Pred("eq", "status", 404)])


def test_value_list_and_not():
    ast = parse_kql("tag: (and a* *b)")
    assert ast.op == "and"
    ast = parse_kql("tag: (not bad)")
    assert ast == Bool("not", [Pred("eq", "tag", "bad")])


# ---- value-only search (value_expression → pure-wildcard column) -----------


def test_value_only_search():
    assert parse_kql("needle") == Pred("eq", "*", "needle")
    assert parse_kql('"two words"') == Pred("eq", "*", "two words")


def test_value_only_eval_matches_any_column():
    t = pa.table({"a": ["x", "needle", "z"], "b.c": ["needle", "y", "z"]})
    m = eval_dnf(t, to_dnf(parse_kql("needle"))).to_pylist()
    assert m == [True, True, False]


# ---- escape sequences (test-kql.cpp "Escape sequences in value") -----------


@pytest.mark.parametrize(
    "src,expect",
    [
        ("\\\\", "\\\\"),
        ("\\??", "\\??"),
        ("\\**", "\\**"),
        ("\\u9999", "香"),
        ("\\r\\n\\t\\b\\f", "\r\n\t\b\f"),
        ('\\"', '"'),
        ("\\{\\}\\(\\)\\<\\>", "{}()<>"),
        ("\\u003F", "\\?"),
        ("\\u002A", "\\*"),
        ("\\u005C", "\\\\"),
    ],
)
def test_value_escapes(src, expect):
    assert unescape_kql_value(src) == expect
    # through the parser (pure-wildcard column form, as in the reference test)
    ast = parse_kql(f'*: "{src}"')
    assert ast.path == "*"
    assert ast.value == clean_up_wildcard_search_string(expect)


# ---- column descriptors (escape + empty-token sections) --------------------


@pytest.mark.parametrize("q", ["a\\.b.c: *", '"a\\.b.c": *'])
def test_escaped_column_tokens(q):
    ast = parse_kql(q)
    assert ast == Pred("exists", "a.b.c")  # tokens ["a.b", "c"] joined


def test_escaped_column_nested():
    assert parse_kql("a\\.b: {c: *}") == Pred("exists", "a.b.c")


@pytest.mark.parametrize("q", [".a:*", "a.:*", "a..c:*", "a.b.:*"])
def test_empty_column_token_raises(q):
    with pytest.raises(ValueError):
        parse_kql(q)


def test_tokenize_column_descriptor():
    assert tokenize_column_descriptor("a\\.b.c") == ["a.b", "c"]
    with pytest.raises(ValueError):
        tokenize_column_descriptor("a..b")


# ---- date literals ---------------------------------------------------------


def test_date_literal_range():
    ast = parse_kql('ts > date("2016-02-21 01:14:57")')
    assert ast.op == "gt" and ast.path == "ts"
    assert ast.value == 1456017297000  # epoch millis

    ast2 = parse_kql("ts >= date(1456017297000)")
    assert ast2.value == 1456017297000


# ---- typed literals --------------------------------------------------------


def test_literal_typing():
    assert parse_kql("x: 42").value == 42
    assert parse_kql("x: -3.5").value == -3.5
    assert parse_kql("x: true").value is True
    assert parse_kql("x: null").value is None
    assert parse_kql("x: 1a2b").value == "1a2b"


def test_null_eval():
    t = pa.table({"x": [1, None, 3]})
    m = eval_dnf(t, to_dnf(parse_kql("x: null"))).to_pylist()
    assert m == [False, True, False]
    m2 = eval_dnf(t, to_dnf(parse_kql("NOT x: null"))).to_pylist()
    assert m2 == [True, False, True]


# ---- wildcard column paths -------------------------------------------------


def test_wildcard_column_path():
    t = pa.table({"attrs.host": ["web1", "db1"], "attrs.rack": ["r1", "r2"],
                  "msg": ["a", "b"]})
    m = eval_dnf(t, to_dnf(parse_kql("attrs.*: r2"))).to_pylist()
    assert m == [False, True]
    # wildcard inside a token stays within one level
    m2 = eval_dnf(t, to_dnf(parse_kql("attrs.h*: web1"))).to_pylist()
    assert m2 == [True, False]


def test_escaped_wildcard_is_literal():
    t = pa.table({"x": ["a*b", "axb"]})
    m = eval_dnf(t, to_dnf(parse_kql('x: "a\\*b"'))).to_pylist()
    assert m == [True, False]
    m2 = eval_dnf(t, to_dnf(parse_kql('x: "a*b"'))).to_pylist()
    assert m2 == [True, True]
