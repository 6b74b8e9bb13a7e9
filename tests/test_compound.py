"""Compound-word decomposition against TestCompoundWordTokenFilter
goldens (Danish hyphenation grammar + Swedish dictionary cases)."""

import os

import pytest

from lucene_ray.compound import (Hyphenator, dictionary_decompose,
                                 hyphenation_decompose)

_DA = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/compound/da_UTF8.xml")


@pytest.fixture(scope="module")
def hyph():
    if not os.path.exists(_DA):
        pytest.skip("reference hyphenation grammar unavailable")
    return Hyphenator(open(_DA, encoding="utf-8").read())


def test_hyphenation_da(hyph):
    dic = frozenset(["læse", "hest"])
    assert hyphenation_decompose("læsehest", hyph, dic) == \
        ["læsehest", "læse", "hest"]
    for w in ("min", "veninde", "som", "er", "lidt", "af", "en"):
        assert hyphenation_decompose(w, hyph, dic) == [w]


def test_hyphenation_longest_match(hyph):
    dic = frozenset(["basketball", "basket", "ball", "kurv"])
    assert hyphenation_decompose(
        "basketballkurv", hyph, dic, max_sub=40, only_longest=True
    ) == ["basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_only_size_windows(hyph):
    assert hyphenation_decompose(
        "basketballkurv", hyph, None, min_sub=2, max_sub=4
    ) == ["basketballkurv", "ba", "sket", "ball", "bal", "kurv"]
    assert hyphenation_decompose(
        "basketballkurv", hyph, None, min_sub=4, max_sub=6
    ) == ["basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]
    assert hyphenation_decompose(
        "basketballkurv", hyph, None, min_sub=4, max_sub=10
    ) == ["basketballkurv", "basketball", "basketbal", "basket",
          "sketball", "sketbal", "sket", "ballkurv", "ball", "lkurv",
          "kurv"]


_SE_DICT = frozenset(w.lower() for w in (
    "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
    "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll",
    "Sko", "Vind", "Rute", "Torkare", "Blad"))


def test_dictionary_se():
    cases = {
        "Bildörr": ["Bil", "dörr"],
        "Bilmotor": ["Bil", "motor"],
        "Biltak": ["Bil", "tak"],
        "Slagborr": ["Slag", "borr"],
        "Hammarborr": ["Hammar", "borr"],
        "Pelarborr": ["Pelar", "borr"],
        "Glasögonfodral": ["Glas", "ögon", "fodral"],
        "Basfiolsfodral": ["Bas", "fiol", "fodral"],
        "Basfiolsfodralmakaregesäll":
            ["Bas", "fiol", "fodral", "makare", "gesäll"],
        "Skomakare": ["Sko", "makare"],
        "Vindrutetorkare": ["Vind", "rute", "torkare"],
        "Vindrutetorkarblad": ["Vind", "rute", "blad"],
        "abba": [],
    }
    for w, subs in cases.items():
        assert dictionary_decompose(w, _SE_DICT) == [w] + subs, w


def test_dictionary_knobs():
    dic = frozenset(["basketball", "basket", "ball"])
    # only_longest keeps just the longest match per offset
    assert dictionary_decompose(
        "basketball", dic, max_sub=15, only_longest=True
    ) == ["basketball", "basketball", "ball"]
    # no_subwords also skips past the longest match
    assert dictionary_decompose(
        "basketball", dic, max_sub=15, no_subwords=True
    ) == ["basketball", "basketball"]
    # short tokens pass through
    assert dictionary_decompose("ball", dic) == ["ball"]


def test_hyphenator_exceptions():
    h = Hyphenator("""<hyphenation-info>
<classes>aA bB cC dD eE</classes>
<exceptions>ab-cde</exceptions>
<patterns>a1b b1c c1d d1e</patterns>
</hyphenation-info>""")
    # the exception overrides the patterns
    assert h.hyphenate("abcde") == [0, 2, 5]
    # pattern-driven word
    assert h.hyphenate("abcd") == [0, 1, 2, 3, 4]
    # remain/push trim the outermost points
    assert h.hyphenate("abcd", remain=2, push=2) == [0, 2, 4]
    # non-letters after letters -> not hyphenatable
    assert h.hyphenate("ab9cd") is None
