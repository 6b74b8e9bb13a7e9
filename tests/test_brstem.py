"""Brazilian stemmer against TestBrazilianAnalyzer goldens, plus a
live re-extraction of the reference rule sequences asserting the
generated tables."""

import os
import re

import pytest

from lucene_ray.brstem import brazilian_stem, brazilian_stem_raw

_REF = "/root/reference/lucene/analysis/common/src"
_JAVA = f"{_REF}/java/org/apache/lucene/analysis/br/BrazilianStemmer.java"
_TEST = (f"{_REF}/test/org/apache/lucene/analysis/br/"
         "TestBrazilianAnalyzer.java")


def test_goldens():
    if not os.path.exists(_TEST):
        pytest.skip("reference tests unavailable")
    src = open(_TEST, encoding="utf-8").read()
    # testStemExclusionTable goldens use a keyword-marked analyzer —
    # not stemmer behavior
    src = src[:src.index("testStemExclusionTable")]
    pairs = re.findall(r'check(?:Reuse\(a, |\()"([^"]*)", "([^"]*)"\)',
                       src)
    assert len(pairs) > 85
    bad = [(w, brazilian_stem(w.lower()), want) for w, want in pairs
           if brazilian_stem(w.lower()) != want]
    assert not bad, f"{len(bad)}/{len(pairs)}: {bad[:8]}"


def test_tables_match_reference():
    if not os.path.exists(_JAVA):
        pytest.skip("reference unavailable")
    src = open(_JAVA, encoding="utf-8").read()
    s1 = src[src.index("private boolean step1"):
             src.index("private boolean step2")]
    s2 = src[src.index("private boolean step2"):
             src.index("private void step3")]
    pat1 = re.compile(
        r'if \(suffix\(CT, "([^"]+)"\) && suffix\((R1|R2|RV), "\1"\)'
        r'(?: && suffixPreceded\(CT, "\1", "([^"]+)"\))?\) \{\s*'
        r'(CT = )?(?:removeSuffix|replaceSuffix)\(CT, "\1"'
        r'(?:, "([^"]+)")?\);', re.S)
    rules1 = tuple((m.group(1), m.group(2), m.group(3) or "",
                    bool(m.group(4)), m.group(5) or "")
                   for m in pat1.finditer(s1))
    pat2 = re.compile(r'if \(suffix\(RV, "([^"]+)"\)\) \{\s*'
                      r'CT = removeSuffix\(CT, "([^"]+)"\);', re.S)
    rules2 = tuple((m.group(1), m.group(2))
                   for m in pat2.finditer(s2))
    from lucene_ray.brstem_data import BR_STEP1, BR_STEP2
    assert BR_STEP1 == rules1
    assert BR_STEP2 == rules2
    # the two reproduced reference quirks are present
    assert ("logias", "R2", "", False, "log") in BR_STEP1
    assert ("ira", "ava") in BR_STEP2


def test_contract_edges():
    # not indexable: too short / too long -> stem() None -> keep token
    assert brazilian_stem_raw("ab") is None
    assert brazilian_stem_raw("x" * 30) is None
    assert brazilian_stem("ab") == "ab"
    # non-letters: folded term returned as-is
    assert brazilian_stem_raw("bo4s") == "bo4s"


def test_registered(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    assert get_token_filter("brazilian_stem")(["boates"]) == ["boat"]
