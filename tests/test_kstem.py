"""KStem gates: the reference's FULL kstemTestData.zip vocabulary
(12,130 pairs), data-table re-extraction equality, and never-throws
fuzz."""

import io
import random
import re
import zipfile

from lucene_ray.kstem import _DICT, kstem

_ZIP = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/en/kstemTestData.zip")


def test_full_reference_vocabulary():
    with zipfile.ZipFile(_ZIP) as z:
        name = z.namelist()[0]
        data = z.read(name).decode("utf-8")
    n = 0
    for line in io.StringIO(data):
        line = line.rstrip("\n")
        if not line:
            continue
        w, expect = line.split("\t")
        assert kstem(w) == expect, (w, expect, kstem(w))
        n += 1
    assert n == 12130


def _java_strings(text):
    out = []
    for m in re.finditer(r'"((?:[^"\\\\]|\\\\.)*)"', text):
        out.append(m.group(1).encode().decode("unicode_escape"))
    return out


def test_data_matches_reference():
    """kstem_data.py is GENERATED; re-extract KStemData1-8 + the inline
    arrays and compare."""
    import os

    from lucene_ray.kstem_data import (DICT_WORDS, EXCEPTION_WORDS,
                                       PROPER_NOUNS)

    base = ("/root/reference/lucene/analysis/common/src/java/org/"
            "apache/lucene/analysis/en")
    words = []
    for i in range(1, 9):
        t = open(os.path.join(base, f"KStemData{i}.java")).read()
        m = re.search(r"data\s*=\s*\{(.*)\};", t, re.S)
        words.extend(_java_strings(m.group(1)))
    assert words == DICT_WORDS
    ks = open(os.path.join(base, "KStemmer.java")).read()
    m = re.search(r"String\[\] exceptionWords\s*=\s*\{(.*?)\n  \};",
                  ks, re.S)
    assert _java_strings(m.group(1)) == EXCEPTION_WORDS
    assert len(PROPER_NOUNS) == 253


def test_behavior_pins():
    # dictionary hits with roots (direct conflations / nationalities)
    assert kstem("aging") == "age"
    assert kstem("italians") == "italy"
    # exception words stay themselves even under -s
    assert kstem("aides") == "aide"
    assert kstem("aided") == "aid"       # the plural()-comment case
    # rule-driven stems
    assert kstem("amplification") == "amplify"
    # "definition" is itself a dictionary word, so it stays
    assert kstem("definition") == "definition"
    assert kstem("backfilled") == "backfill"
    # too short / non-alpha pass through
    assert kstem("ab") == "ab"
    assert kstem("a1b") == "a1b"


def test_never_throws_fuzz():
    rng = random.Random(3)
    for _ in range(3000):
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(1, 20)))
        out = kstem(w)
        assert isinstance(out, str)
    assert isinstance(_DICT, dict) and len(_DICT) > 27000


def test_cjk_width_filter_reference_cases():
    """TestCJKWidthFilter.java:30-47 cases + the uncombinable voice
    mark fallback to combining marks 3099/309A."""
    from lucene_ray.analysis_en import cjk_width_one as f

    assert f("Ｔｅｓｔ １２３４") == "Test 1234"
    assert f("ｶﾀｶﾅ") == "カタカナ"
    assert f("ｳﾞｨｯﾂ") == "ヴィッツ"
    assert f("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"
    # voice mark with no preceding combinable kana: fallback mapping
    assert f("ﾞ") == "゙"
    assert f("ｱﾟ") == "ア゚"      # ア cannot take half-voicing
    from lucene_ray.analysis_en import upper_case_filter
    assert upper_case_filter(["abc"]) == ["ABC"]


def test_norwegian_normalization_subset():
    """NorwegianNormalizationFilter = ScandinavianNormalizer with
    {AE, OE, AA} only: 'ao'/'oo' digraphs do not fold (unlike the full
    ScandinavianNormalizationFilter)."""
    from lucene_ray.langnorm import (norwegian_normalize as no,
                                     scandinavian_normalize as sc)

    assert no("aepler") == "æpler"
    assert no("oere") == "øre"
    assert no("aakrene") == "åkrene"
    assert no("blaabaersyltetoey") == "blåbærsyltetøy"
    # the distinguishing cases
    assert no("hao") == "hao" and sc("hao") == "hå"
    assert no("ör") == "ør" and no("Äpel") == "Æpel"


def test_stream_filter_two_path_consistency():
    """Regression: rewriting stream filters must emit identical tokens
    and field lengths on the vectorized and positions paths (the
    no-core '_'-run pre-drop happens BEFORE the rewriter on both)."""
    from lucene_ray.analysis import STREAM_FILTERS, term_freq_batch

    for name, sf in STREAM_FILTERS.items():
        for txt in ["a __ b", "__ x", "a_b __ c d"]:
            a = term_freq_batch([txt], stream_filter=sf)
            b = term_freq_batch([txt], stream_filter=sf,
                                with_positions=True)
            assert sorted(a[0].to_pylist()) == sorted(b[0].to_pylist()), \
                (name, txt)
            assert a[3].tolist() == b[3].tolist(), (name, txt)
