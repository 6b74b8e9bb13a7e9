"""Hunspell core gates: every reference test dictionary with a
.good/.wrong battery passes it in FULL (53/53), and the
dictionaries whose reference tests use inline words (circumfix,
complexprefix, needaffix, twosuffixes, zeroaffix/2) are pinned with
those exact assertions."""

import os

import pytest

from lucene_ray.hunspell import HunspellDictionary, load_dictionary

BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/hunspell")

SUPPORTED = [
    "IJ", "allcaps", "base", "base_utf", "break", "breakdefault",
    "breakoff", "checkcompoundcase", "checkcompounddup",
    "checkcompoundpattern", "checkcompoundpattern2",
    "checkcompoundpattern3", "checkcompoundrep", "checkcompoundtriple",
    "checksharps", "compoundflag", "compoundforbid", "compoundrule",
    "compoundrule2", "compoundrule3", "compoundrule4", "compoundrule5",
    "compoundrule6", "compoundrule7", "compoundrule8", "dotless_i",
    "empty", "flagutf8", "forbiddenword", "forceucase",
    "germanManualCase", "germancompounding", "i53643", "i58202",
    "keepcase", "keyDefault", "longStrip", "map", "maxNGramSugsDefault",
    "needaffix5", "ngram", "nosuggest", "oconv", "onlyincompound2",
    "opentaal_forbiddenword1", "opentaal_forbiddenword2", "ph", "ph2",
    "rep", "simplifiedtriple", "sug", "sug2", "wordpair", "conv",
    "ignore", "morphalias", "compressed"]


@pytest.mark.parametrize("name", SUPPORTED)
def test_reference_battery(name):
    d = load_dictionary(f"{BASE}/{name}.aff", f"{BASE}/{name}.dic")
    n = 0
    for suffix, expect in ((".good", True), (".wrong", False)):
        p = f"{BASE}/{name}{suffix}"
        if not os.path.exists(p):
            continue
        for w in open(p, encoding="utf-8", errors="replace"):
            w = w.strip()
            if w:
                assert d.spell(w) == expect, (name, suffix, w)
                n += 1
    if name in ("base", "base_utf", "i53643"):
        assert n >= 10


# TestCircumfix/TestComplexPrefix/TestNeedAffix/TestTwoSuffixes/
# TestZeroAffix(2).java assert with inline words (no .good/.wrong
# files); (word, expected stem or None=misspelled) transcribed 1:1.
INLINE = {
    "circumfix": [
        ("nagy", "nagy"), ("nagyobb", "nagy"), ("legnagyobb", "nagy"),
        ("legeslegnagyobb", "nagy"), ("nagyobbobb", None),
        ("legnagy", None), ("legeslegnagy", None)],
    "complexprefix": [
        ("ptwofoo", "foo"), ("poneptwofoo", "foo"), ("foosuf", "foo"),
        ("ptwofoosuf", "foo"), ("poneptwofoosuf", "foo"),
        ("ponefoo", None), ("ponefoosuf", None), ("ptwoponefoo", None),
        ("ptwoponefoosuf", None)],
    "needaffix": [
        ("drink", "drink"), ("drinks", "drink"), ("walk", None),
        ("walks", "walk"), ("prewalk", "walk"), ("prewalks", "walk"),
        ("test", None), ("pretest", None), ("tests", None),
        ("pretests", None)],
    "twosuffixes": [
        ("drink", "drink"), ("drinkable", "drink"),
        ("drinks", "drink"), ("drinkableable", None),
        ("drinkss", None)],
    "zeroaffix": [("drink", "drinksierranevada")],
    "zeroaffix2": [("b", "beer")],
}


@pytest.mark.parametrize("name", sorted(INLINE))
def test_inline_java_battery(name):
    d = load_dictionary(f"{BASE}/{name}.aff", f"{BASE}/{name}.dic")
    for word, stem in INLINE[name]:
        assert d.spell(word) == (stem is not None), (name, word)
        if stem is not None:
            assert stem in d.stems(word), (name, word, d.stems(word))


def test_german_compounding_semantics():
    """The hardest battery: positional compound flags fed by affix
    continuation classes, decapitalizing circumfix-style prefixes, and
    the twofold rule that an outer suffix is authorized ONLY by the
    inner suffix's continuation class (Stemmer.java:564-571) — without
    that rule 'computerarbeit' (lowercase at compound begin) leaks."""
    d = load_dictionary(f"{BASE}/germancompounding.aff",
                        f"{BASE}/germancompounding.dic")
    assert d.spell("Computerarbeit") and d.spell("Arbeitscomputer")
    assert d.spell("Computerarbeits-Computerarbeit")
    assert not d.spell("computerarbeit")       # lowercase begin
    assert not d.spell("Arbeitcomputer")       # missing fogemorpheme s
    assert not d.spell("Computerarbeits")      # linking s word-final
    assert not d.spell("Arbeitsnehmer")        # FORBIDDENWORD entry


def test_turkic_sharps_and_force():
    d = load_dictionary(f"{BASE}/dotless_i.aff", f"{BASE}/dotless_i.dic")
    assert d.spell("DİYARBAKIR") and not d.spell("DIYARBAKIR")
    cs = load_dictionary(f"{BASE}/checksharps.aff",
                         f"{BASE}/checksharps.dic")
    assert cs.spell("MÜSSIG") and cs.spell("AUSSTOSS") \
        and not cs.spell("Müssig")
    fu = load_dictionary(f"{BASE}/forceucase.aff",
                         f"{BASE}/forceucase.dic")
    assert fu.spell("Foobaz") and not fu.spell("foobaz") \
        and fu.spell("foobazbar")


def test_compound_and_gates():
    d = load_dictionary(f"{BASE}/compoundflag.aff",
                        f"{BASE}/compoundflag.dic")
    assert d.spell("foobarfoo") and not d.spell("fooxybar")
    k = load_dictionary(f"{BASE}/keepcase.aff", f"{BASE}/keepcase.dic")
    assert k.spell("SCHOOLTVV") and not k.spell("UNITVV")
    fw = load_dictionary(f"{BASE}/forbiddenword.aff",
                         f"{BASE}/forbiddenword.dic")
    assert fw.spell("foo") and not fw.spell("foos")
    na = load_dictionary(f"{BASE}/needaffix5.aff",
                         f"{BASE}/needaffix5.dic")
    assert na.spell("prefoopseudosuf") \
        and not na.spell("foopseudosuf")
    wp = load_dictionary(f"{BASE}/wordpair.aff",
                         f"{BASE}/wordpair.dic")
    assert wp.spell("wordcompound") and not wp.spell("compoundword")


# every dictionary with a .sug expectation file: suggestions for each
# .wrong word must reproduce the file verbatim (TestSpellChecking
# checkSpellCheckerExpectations — join ", " per word, drop empties)
SUG_BATTERIES = [
    "IJ", "allcaps", "base_utf", "breakdefault", "checksharps",
    "forceucase", "germanManualCase", "i58202", "keepcase",
    "keyDefault", "longStrip", "map", "maxNGramSugsDefault", "ngram",
    "nosuggest", "oconv", "opentaal_forbiddenword1",
    "opentaal_forbiddenword2", "ph", "ph2", "rep", "sug", "sug2"]


@pytest.mark.parametrize("name", SUG_BATTERIES)
def test_sug_battery(name):
    from lucene_ray.hunspell_suggest import Suggester

    d = load_dictionary(f"{BASE}/{name}.aff", f"{BASE}/{name}.dic")
    sugg = Suggester(d)
    lines = []
    for w in open(f"{BASE}/{name}.wrong", encoding="utf-8"):
        w = w.strip()
        if w:
            s = sugg.suggest(w)
            if s:
                lines.append(", ".join(s))
    expect = open(f"{BASE}/{name}.sug", encoding="utf-8").read().strip()
    assert "\n".join(lines) == expect


def test_proceed_past_rep():
    """TestSpellChecking.testRepSuggestions: by default Hunspell stops
    at REP-produced hits; proceedPastRep keeps going and finds the
    removal suggestion too."""
    from lucene_ray.hunspell_suggest import Suggester

    d = load_dictionary(f"{BASE}/rep.aff", f"{BASE}/rep.dic")
    assert Suggester(d).suggest("autos") == ["auto's"]
    assert Suggester(d, proceed_past_rep=True).suggest("autos") \
        == ["auto's", "auto"]


def test_lenient_broken_counts():
    # common-errors.aff deliberately miscounts affix rules; loading
    # must survive (the reference's Dictionary is lenient there)
    d = load_dictionary(f"{BASE}/common-errors.aff",
                        f"{BASE}/common-errors.dic")
    assert isinstance(d, HunspellDictionary)


def test_stems_and_twofold():
    d = load_dictionary(f"{BASE}/flagutf8.aff", f"{BASE}/flagutf8.dic")
    assert d.spell("foosbar") and d.spell("unfoosbaz")
    assert not d.spell("foobar")          # outer without inner
    assert "foo" in d.stems("foos")
    b = load_dictionary(f"{BASE}/base.aff", f"{BASE}/base.dic")
    # dict has created/U, so the prefix strips to that entry
    assert "created" in b.stems("uncreated")
    assert b.stems("zzzz") == []
