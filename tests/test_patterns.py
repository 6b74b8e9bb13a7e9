"""Pattern tokenizer/filters against the reference test goldens
(TestPatternTokenizer table, TestPatternReplaceFilter,
TestPatternCaptureGroupTokenFilter camelCase battery)."""

import re

from lucene_ray.patterns import (pattern_capture_groups,
                                 pattern_replace, pattern_tokenize)


def test_pattern_tokenizer_table():
    # TestPatternTokenizer.testSplitting rows ("\\p{Space}" == \s)
    q = "['\"]([^'\"]*)['\"]"
    for group, pat, inp, want in [
        (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
        (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
        (-1, "o", "boo:and:foo", ["b", ":and:f"]),
        (0, ":", "boo:and:foo", [":", ":"]),
        (0, q, "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
        (1, q, "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
    ]:
        assert pattern_tokenize(inp, re.compile(pat), group) == want, \
            (group, pat)


def test_pattern_replace():
    rx = re.compile("a*b")
    toks = "aabfooaabfooabfoob ab caaaaaaaaab".split()
    assert [pattern_replace(t, rx, "-", True) for t in toks] == \
        ["-foo-foo-foo-", "-", "c-"]
    assert [pattern_replace(t, rx, "-", False) for t in toks] == \
        ["-fooaabfooabfoob", "-", "c-"]
    assert [pattern_replace(t, rx, "", False) for t in toks] == \
        ["fooaabfooabfoob", "", "c"]
    assert [pattern_replace(t, rx, "", True) for t in toks] == \
        ["foofoofoo", "", "c"]
    # back references (testReplaceAllWithBackRef)
    rx2 = re.compile("(a*)b")
    assert pattern_replace("aabfooaabfooabfoob", rx2, r"\1!", True) \
        == "aa!fooaa!fooa!foo!"


def test_capture_groups_camelcase():
    # the javadoc camelCaseFilter pattern set
    pats = [re.compile(p) for p in (
        "([A-Z]{2,})",
        "(?<![A-Z])([A-Z][a-z]+)",
        "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
        "([0-9]+)")]
    assert pattern_capture_groups("camelCaseFilter", pats, True) == \
        ["camelCaseFilter", "camel", "Case", "Filter"]
    # url example from the javadoc
    p2 = [re.compile(r"(https?://([a-zA-Z\-_0-9.]+))")]
    assert pattern_capture_groups("http://www.foo.com/index", p2,
                                  False) == \
        ["http://www.foo.com", "www.foo.com"]
    # sliding triples
    p3 = [re.compile("(...)")]
    assert pattern_capture_groups("abcdefghi", p3, False) == \
        ["abc", "def", "ghi"]
    # no match -> original preserved
    assert pattern_capture_groups("zz", p3, False) == ["zz"]
    # whole-token capture skipped when preserving the original
    p4 = [re.compile("([a-z]+)")]
    assert pattern_capture_groups("abc", p4, True) == ["abc"]
    assert pattern_capture_groups("abc", p4, False) == ["abc"]


def test_split_mode_never_leaks_capture_groups():
    # re.split would return the captured 'and'; the tokenizer must not
    got = pattern_tokenize("boo:and:foo", re.compile(":(and):"), -1)
    assert got == ["boo", "foo"]
