"""Second normalizer/stemmer batch (Persian stem, Bengali/Telugu/
Romanian/Serbian/Irish normalizers, Telugu stem) against reference
test goldens extracted live."""

import os
import re

import pytest

from lucene_ray.langnorm import (bengali_normalize, irish_lower,
                                 persian_normalize, romanian_normalize,
                                 serbian_normalize, telugu_normalize)
from lucene_ray.stemlang import persian_stem, telugu_stem

_T = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
      "lucene/analysis")


def _pairs(path, pattern):
    p = os.path.join(_T, path)
    if not os.path.exists(p):
        pytest.skip("reference tests unavailable")
    return re.findall(pattern, open(p, encoding="utf-8").read())


def test_persian_stem_goldens():
    pairs = _pairs("fa/TestPersianStemFilter.java",
                   r'checkOneTerm\(a, "([^"]+)", "([^"]*)"\)')
    # drop the analyzer-lowercase golden ("English"): not stemmer
    # behavior
    pairs = [(w, x) for w, x in pairs if not w.isascii()]
    assert len(pairs) >= 8
    for w, want in pairs:
        assert persian_stem(w) == want, w


def test_persian_chain():
    # PersianAnalyzer normalizes (farsi yeh -> arabic yeh) before the
    # stemmer, so the yeh suffixes fire on Farsi spellings too
    assert persian_stem(persian_normalize("کتابهای")) == \
        persian_normalize("کتاب")


def test_bengali_normalizer_goldens():
    pairs = _pairs("bn/TestBengaliNormalizer.java",
                   r'check\("([^"]+)", "([^"]*)"\)')
    assert len(pairs) >= 15
    for w, want in pairs:
        assert bengali_normalize(w) == want, w


def test_telugu_normalizer_goldens():
    pairs = _pairs("te/TestTeluguNormalizer.java",
                   r'check\("([^"]+)", "([^"]*)"\)')
    assert len(pairs) >= 4
    for w, want in pairs:
        assert telugu_normalize(w) == want, w


def test_telugu_stemmer_goldens():
    pairs = _pairs("te/TestTeluguStemmer.java",
                   r'check\("([^"]+)", "([^"]*)"\)')
    assert len(pairs) >= 4
    for w, want in pairs:
        assert telugu_stem(w) == want, w


def test_serbian_goldens():
    pairs = _pairs("sr/TestSerbianNormalizationFilter.java",
                   r'checkOneTerm\(\s*analyzer, "([^"]+)", '
                   r'"([^"]*)"\)')
    assert len(pairs) >= 2
    for w, want in pairs:
        assert serbian_normalize(w) == want, w


def test_irish_lower_goldens():
    # TestIrishLowerCaseFilter token stream
    assert irish_lower("nAthair") == "n-athair"
    assert irish_lower("tUISCE") == "t-uisce"
    assert irish_lower("hARD") == "hard"
    assert irish_lower("") == ""


def test_romanian_goldens():
    pairs = _pairs("ro/TestRomanianNormalizationFilter.java",
                   r'checkOneTerm\(a, "([^"]+)", "([^"]*)"\)')
    assert len(pairs) >= 4
    for w, want in pairs:
        assert romanian_normalize(w) == want, w


def test_registered(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    assert get_token_filter("serbian_normalize")(["џеп"]) == ["dzep"]
    assert get_token_filter("persian_stem") is not None
    assert get_token_filter("telugu_stem") is not None
    assert get_token_filter("irish_lower")(["nAthair"]) == ["n-athair"]
