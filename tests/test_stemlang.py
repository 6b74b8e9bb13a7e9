"""Latvian / Indonesian / Arabic / Bengali stemmers against the
reference test goldens (extracted live from the read-only tree)."""

import os
import re

import pytest

from lucene_ray.langnorm import arabic_normalize
from lucene_ray.stemlang import (LANG_STEMMERS, arabic_stem,
                                 bengali_stem, indonesian_stem,
                                 latvian_stem)

_REF = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis")


def _src(path):
    p = os.path.join(_REF, path)
    if not os.path.exists(p):
        pytest.skip("reference tests unavailable")
    return open(p, encoding="utf-8").read()


def test_latvian_goldens():
    pairs = re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)',
                       _src("lv/TestLatvianStemmer.java"))
    assert len(pairs) > 150
    for w, want in pairs:
        # a few goldens carry a literal trailing space the tokenizer
        # would eat before the filter sees the term
        assert latvian_stem(w.strip()) == want.strip(), w


def test_indonesian_goldens_derivational():
    pairs = re.findall(r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)',
                       _src("id/TestIndonesianStemmer.java"))
    assert len(pairs) > 50
    for w, want in pairs:
        assert indonesian_stem(w) == want, w


def test_indonesian_goldens_inflectional():
    pairs = re.findall(r'checkOneTerm\(b, "([^"]*)", "([^"]*)"\)',
                       _src("id/TestIndonesianStemmer.java"))
    assert len(pairs) >= 4
    for w, want in pairs:
        assert indonesian_stem(w, derivational=False) == want, w


def test_arabic_goldens():
    """TestArabicStemFilter feeds raw terms to the stemmer alone."""
    pairs = re.findall(r'check\("([^"]*)", "([^"]*)"\)',
                       _src("ar/TestArabicStemFilter.java"))
    assert len(pairs) >= 20
    for w, want in pairs:
        assert arabic_stem(w) == want, w


def test_arabic_chain_with_normalizer():
    # ArabicAnalyzer order: normalize then stem
    # (ar/ArabicAnalyzer.java) — e.g. definite article after
    # alef-madda folding
    assert arabic_stem(arabic_normalize("الآجن")) == \
        arabic_normalize("آجن")


def test_bengali_goldens():
    pairs = re.findall(r'check\("([^"]*)", "([^"]*)"\)',
                       _src("bn/TestBengaliStemmer.java"))
    assert len(pairs) >= 15
    for w, want in pairs:
        assert bengali_stem(w) == want, w


def test_registered_as_analyzers(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    assert get_token_filter("latvian_stem")(["tēvs"]) == ["tēv"]
    assert get_token_filter("indonesian_stem")(["bukukah"]) == ["buku"]
    assert "arabic_stem" in LANG_STEMMERS and \
        "bengali_stem" in LANG_STEMMERS
