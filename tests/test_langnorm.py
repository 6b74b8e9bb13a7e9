"""Language normalizers against the reference filter tests' goldens."""

import pytest

from lucene_ray.langnorm import (arabic_normalize, german_normalize,
                                 greek_lower, hindi_normalize,
                                 persian_normalize, scandinavian_fold,
                                 scandinavian_normalize, sorani_normalize,
                                 turkish_lower)


def test_german_normalization():
    """TestGermanNormalizationFilter."""
    assert german_normalize("Schaltflächen") == "Schaltflachen"
    assert german_normalize("Schaltflaechen") == "Schaltflachen"
    assert german_normalize("dauer") == "dauer"
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("") == ""


SCAND_NORM = [
    ("aeäaeeea", "æææeea"), ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"), ("bøen", "bøen"), ("bOEen", "bØen"),
    ("åene", "åene"), ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"), ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"), ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
    ("ae", "æ"), ("aE", "æ"), ("ä", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
    ("Ä", "Æ"), ("oe", "ø"), ("oE", "ø"), ("oo", "ø"), ("oO", "ø"),
    ("ö", "ø"), ("Oe", "Ø"), ("OE", "Ø"), ("Oo", "Ø"), ("OO", "Ø"),
    ("Ö", "Ø"),
]


@pytest.mark.parametrize("w,want", SCAND_NORM,
                         ids=[c[0] for c in SCAND_NORM])
def test_scandinavian_normalization(w, want):
    assert scandinavian_normalize(w) == want


SCAND_FOLD = [
    ("aeäaeeea", "aaaeea"), ("aeäaeeeae", "aaaeea"),
    ("aeaeeeae", "aaeea"), ("bøen", "boen"), ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"), ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"), ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"),
]


@pytest.mark.parametrize("w,want", SCAND_FOLD,
                         ids=[c[0] for c in SCAND_FOLD])
def test_scandinavian_folding(w, want):
    assert scandinavian_fold(w) == want


def test_turkish_lowercase():
    """TestTurkishLowerCaseFilter: İ -> i, bare I -> dotless ı,
    I + combining-dot -> i with the dot consumed, interleaved Mn."""
    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("İZMİR") == "izmir"
    assert turkish_lower("ISPARTA") == "ısparta"
    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("İ̖STANBUL") == \
        "i̖stanbul"
    assert turkish_lower("I̖SPARTA") == "ı̖sparta"
    assert turkish_lower("İ") == "i"
    assert turkish_lower("") == ""


def test_greek_lowercase():
    """GreekAnalyzer casing: final sigma and tonos/dialytika folds."""
    assert greek_lower("ΜΊΑ") == "μια"
    assert greek_lower("ΠΡΟΫΠΟΘΈΣΕΙΣ") == "προυποθεσεισ"
    assert greek_lower("καλός") == "καλοσ"[:-1] + "σ"
    assert greek_lower("ς") == "σ"
    assert greek_lower("ΆΈΉΊΌΎΏ") == "αεηιουω"
    assert greek_lower("ϊΐϋΰ") == "ιιυυ"


def test_arabic_normalization():
    """TestArabicNormalizationFilter."""
    cases = [("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"),
             ("بنى", "بني"), ("فاطمة", "فاطمه"),
             ("روبرـــــت", "روبرت"), ("مَبنا", "مبنا"),
             ("علِي", "علي"), ("بُوات", "بوات"), ("ولداً", "ولدا"),
             ("ولدٍ", "ولد"), ("ولدٌ", "ولد"), ("نلْسون", "نلسون"),
             ("هتميّ", "هتمي"), ("", "")]
    for w, want in cases:
        assert arabic_normalize(w) == want, w


def test_persian_normalization():
    """TestPersianNormalizationFilter."""
    cases = [("های", "هاي"), ("هاے", "هاي"), ("کشاندن", "كشاندن"),
             ("كتابۀ", "كتابه"), ("كتابهٔ", "كتابه"),
             ("زادہ", "زاده"), ("", "")]
    for w, want in cases:
        assert persian_normalize(w) == want, w


def test_hindi_normalization():
    """TestHindiNormalizer."""
    cases = [("अँगरेज़ी", "अंगरेजि"), ("अँग्रेज़ी", "अंगरेजि"),
             ("अंगरेजी", "अंगरेजि"), ("अंग्रेज़ी", "अंगरेजि"),
             ("क़िताब", "किताब"), ("फ़र्ज़", "फरज"),
             ("क़र्ज़", "करज"), ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
             ("शार्‍मा", "शारमा"), ("शार्‌मा", "शारमा"),
             ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
             ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"), ("", "")]
    for w, want in cases:
        assert hindi_normalize(w) == want, w


def test_sorani_normalization():
    """TestSoraniNormalizationFilter."""
    cases = [("ي", "ی"), ("ى", "ی"),
             ("ی", "ی"), ("ك", "ک"),
             ("ک", "ک"), ("ه‌", "ە"),
             ("ه‌ک", "ەک"),
             ("ھ", "ه"), ("ة", "ە"),
             ("ههه", "ههە"),
             ("ڒ", "ڕ"),
             ("ررر", "ڕرر"),
             ("ـ", ""), ("ً", ""), ("ٌ", ""),
             ("ٍ", ""), ("َ", ""), ("ُ", ""),
             ("ِ", ""), ("ّ", ""), ("ْ", ""),
             ("‌", ""), ("", "")]
    for w, want in cases:
        assert sorani_normalize(w) == want, repr(w)


def test_registered_as_analyzers():
    from lucene_ray.analysis_en import get_token_filter
    f = get_token_filter("turkish_lower")
    assert f(["ISPARTA"]) == ["ısparta"]
    assert get_token_filter("scandinavian_fold")(["räksmörgås"]) == \
        ["raksmorgas"]
