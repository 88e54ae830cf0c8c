"""Wildcard matcher conformance (M10), case table ported from
/root/reference/components/core/tests/test-string_utils.cpp:55-230."""

import pyarrow as pa
import pytest

from clp_core_ray.pipelines.search import wildcard_match, wildcard_to_regex

CASES = [
    ("abcd", "a*", True),
    ("abcd", "*d", True),
    ("abcd", "*a*", True),
    ("abcd", "*b*", True),
    ("abcd", "*d*", True),
    ("abcd", "*", True),
    ("abcd", "a?cd", True),
    ("abcd", "?bcd", True),
    ("abcd", "abc?", True),
    ("abcd", "a??d", True),
    ("abcd", "??cd", True),
    ("abcd", "ab??", True),
    ("abcd", "?bc?", True),
    ("abcdef", "a?c?ef", False),  # ? is exactly one char: a b c d e f vs a?c?ef
    ("abcd", "????", True),
    ("abcd", "*?bcd", True),
    ("abcd", "?*bcd", False),  # ? consumes 'a', then 'bcd' must match 'bcd' → wait
    ("abcd", "*?cd", True),
    ("abcd", "abc*?", True),
    ("abcd", "ab*?", True),
    ("abcd", "ab?*", True),
    ("abcd", "*?", True),
    ("abcd", "?*", True),
    ("abcd", "ac*", False),
    ("abcd", "abc*de", False),
    ("abcd", "b**d", False),
    ("abcd", "a**c", False),
    ("abcd", "b*?d", False),
    ("abcd", "?cd", False),
    ("abcd", "ab?", False),
]


def ref_semantics_fixups():
    """The reference asserts some of these differently; align exactly."""
    fixed = dict()
    for tame, wild, want in CASES:
        fixed[(tame, wild)] = want
    # from the reference table: these are true there
    fixed[("abcdef", "a?c?ef")] = True
    fixed[("abcd", "?*bcd")] = True
    return fixed


@pytest.mark.parametrize("tame,wild", [(t, w) for t, w, _ in CASES])
def test_wildcard_case(tame, wild):
    want = ref_semantics_fixups()[(tame, wild)]
    got = wildcard_match(pa.array([tame]), wild)[0].as_py()
    assert got == want, f"{tame!r} vs {wild!r}: got {got}, want {want}"


def test_question_mark_exactly_one():
    # '?*bcd' on 'abcd': ? must consume exactly one char ('a'), '*' may be
    # empty → matches (reference semantics)
    assert wildcard_match(pa.array(["abcd"]), "?*bcd")[0].as_py() is True
    assert wildcard_match(pa.array(["bcd"]), "?*bcd")[0].as_py() is False


def test_regex_translation_anchoring():
    assert wildcard_to_regex("a*d") == "^a[\\s\\S]*d$"
    # special regex chars in the pattern are escaped
    assert wildcard_match(pa.array(["a.d"]), "a.d")[0].as_py() is True
    assert wildcard_match(pa.array(["axd"]), "a.d")[0].as_py() is False
