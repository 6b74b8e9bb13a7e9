"""Minimal/misc stemmers against the reference vocabulary files and
test goldens (extracted live from the read-only reference tree)."""

import os
import re
import zipfile

import pytest

from lucene_ray.langnorm import sorani_normalize
from lucene_ray.stemmisc import (MISC_STEMMERS, bulgarian_stem,
                                 czech_stem, english_minimal_stem,
                                 french_minimal_stem,
                                 galician_minimal_stem,
                                 german_minimal_stem, hindi_stem,
                                 norwegian_minimal_stem,
                                 portuguese_minimal_stem, sorani_stem)

_REF = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis")


def _vocab_zip(lang, zname, txt):
    zpath = os.path.join(_REF, lang, zname)
    if not os.path.exists(zpath):
        pytest.skip("reference vectors unavailable")
    with zipfile.ZipFile(zpath) as z, z.open(txt) as f:
        for raw in f.read().decode("utf-8").splitlines():
            if raw and not raw.startswith("#") and "\t" in raw:
                yield raw.split("\t")


@pytest.mark.parametrize("lang,zname,txt,fn", [
    ("pt", "ptminimaltestdata.zip", "ptminimal.txt",
     portuguese_minimal_stem),
    ("de", "deminimaltestdata.zip", "deminimal.txt",
     german_minimal_stem),
    ("fr", "frminimaltestdata.zip", "frminimal.txt",
     french_minimal_stem),
], ids=["pt", "de", "fr"])
def test_minimal_vocabularies(lang, zname, txt, fn):
    bad = [(w, fn(w), want) for w, want in _vocab_zip(lang, zname, txt)
           if fn(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_norwegian_minimal_vocabulary():
    path = os.path.join(_REF, "no", "nb_minimal.txt")
    if not os.path.exists(path):
        pytest.skip("reference vectors unavailable")
    for raw in open(path, encoding="utf-8").read().splitlines():
        if not raw or raw.startswith("#"):
            continue
        w, want = raw.split("\t")
        assert norwegian_minimal_stem(w) == want, w


def _goldens(path, pattern):
    p = os.path.join(_REF, path)
    if not os.path.exists(p):
        pytest.skip("reference tests unavailable")
    return re.findall(pattern, open(p, encoding="utf-8").read())


def test_czech_stemmer_goldens():
    """TestCzechStemmer (the analyzer lowercases first)."""
    pairs = _goldens("cz/TestCzechStemmer.java",
                     r'assertAnalyzesTo\(cz, "([^"]*)", '
                     r'new String\[\] {"([^"]*)"}')
    assert len(pairs) > 100
    for w, want in pairs:
        assert czech_stem(w.lower()) == want, w


def test_bulgarian_stemmer_goldens():
    pairs = _goldens("bg/TestBulgarianStemmer.java",
                     r'assertAnalyzesTo\(a, "([^"]*)", '
                     r'new String\[\] {"([^"]*)"}')
    assert len(pairs) > 80
    for w, want in pairs:
        assert bulgarian_stem(w) == want, w


def test_hindi_stemmer_goldens():
    pairs = _goldens("hi/TestHindiStemmer.java",
                     r'check\("([^"]*)", "([^"]*)"\)')
    assert len(pairs) >= 20
    for w, want in pairs:
        assert hindi_stem(w) == want, w


def test_sorani_stemmer_goldens():
    """TestSoraniStemFilter: the analyzer chain normalizes first."""
    pairs = _goldens("ckb/TestSoraniStemFilter.java",
                     r'checkOneTerm\(a, "([^"]*)", "([^"]*)"\)')
    assert len(pairs) >= 20
    for w, want in pairs:
        assert sorani_stem(sorani_normalize(w)) == want, w


def test_english_minimal():
    for w, want in [("queries", "query"), ("phrases", "phrase"),
                    ("corpus", "corpus"), ("stress", "stress"),
                    ("kings", "king"), ("panels", "panel"),
                    ("aerodynamics", "aerodynamic"),
                    ("congress", "congress"), ("serious", "serious"),
                    ("", "")]:
        assert english_minimal_stem(w) == want, w


def test_galician_minimal():
    for w, want in [("elefantes", "elefante"), ("elefante", "elefante"),
                    ("kalóres", "kalór"), ("kalór", "kalór"),
                    ("mas", "mas"), ("barcelonês", "barcelonês")]:
        assert galician_minimal_stem(w) == want, w


def test_registered_as_analyzers(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    f = get_token_filter("english_minimal")
    assert f(["kings", "corpus"]) == ["king", "corpus"]
    assert get_token_filter("czech_stem")(["pánové"]) == ["pán"]
    assert "hindi_stem" in MISC_STEMMERS


def test_porter_reference_vocabulary():
    """The 23,531-pair porterTestData.zip vocabulary (en/
    TestPorterStemFilter.java gates the same data)."""
    import zipfile
    zpath = os.path.join(_REF, "en", "porterTestData.zip")
    if not os.path.exists(zpath):
        pytest.skip("reference vectors unavailable")
    from lucene_ray.analysis_en import porter_stem
    with zipfile.ZipFile(zpath) as z:
        voc = z.read("voc.txt").decode().splitlines()
        out = z.read("output.txt").decode().splitlines()
    assert len(voc) == len(out) > 20000
    bad = [(w, porter_stem(w), x) for w, x in zip(voc, out)
           if porter_stem(w) != x]
    assert not bad, f"{len(bad)} mismatches: {bad[:5]}"


def test_sorani_chain_reference_vocabulary():
    """ckbtestdata.zip: 8,272 frequent words through the
    normalize→stem chain (TestSoraniStemFilter.testVocabulary)."""
    pairs = list(_vocab_zip("ckb", "ckbtestdata.zip", "testdata.txt"))
    assert len(pairs) > 8000
    bad = []
    for w, want in pairs:
        got = sorani_stem(sorani_normalize(w.lower()))
        if got != want:
            bad.append((w, got, want))
    assert not bad, f"{len(bad)} mismatches: {bad[:5]}"


def test_swedish_minimal_vocabulary():
    from lucene_ray.stemmisc import swedish_minimal_stem
    path = os.path.join(_REF, "sv", "minimal.txt")
    if not os.path.exists(path):
        pytest.skip("reference vectors unavailable")
    n = 0
    for raw in open(path, encoding="utf-8").read().splitlines():
        if not raw or raw.startswith("#"):
            continue
        w, want = raw.split("\t")
        assert swedish_minimal_stem(w) == want, w
        n += 1
    assert n > 60
