"""Greek stemmer against the full TestGreekStemmer golden set (the
analyzer there is GreekAnalyzer: GreekLowerCaseFilter → stop →
GreekStemFilter, so goldens chain greek_lower before the stem)."""

import os
import re

import pytest

from lucene_ray.greekstem import greek_stem
from lucene_ray.langnorm import greek_lower

_TEST = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/el/TestGreekStemmer.java")


def test_greek_goldens():
    if not os.path.exists(_TEST):
        pytest.skip("reference tests unavailable")
    pairs = re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)',
                       open(_TEST, encoding="utf-8").read())
    assert len(pairs) > 300
    bad = [(w, greek_stem(greek_lower(w)), want) for w, want in pairs
           if greek_stem(greek_lower(w)) != want]
    assert not bad, f"{len(bad)}/{len(pairs)} mismatches: {bad[:8]}"


def test_quirks():
    # rule8 precedence quirk: a word equal to its unguarded suffix
    # stems to empty (el/GreekStemmer.java:368-382 operator mix)
    assert greek_stem("οντανε") == ""
    # short words bypass everything
    assert greek_stem("αβγ") == "αβγ"


def test_registered(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    f = get_token_filter("greek")
    assert f(["άνθρωπος"]) == ["ανθρωπ"]
    assert get_token_filter("greek_stem")(["ανθρωποσ"]) == ["ανθρωπ"]
