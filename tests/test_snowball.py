"""Snowball stemmer family (lucene_ray.snowball).

Gates:
- the FULL TestDutchAnalyzer battery (77 pairs) parsed from the
  reference test source;
- the per-language analyzer goldens (TestDanishAnalyzer etc.);
- hand-traced branch batteries exercising each rule group;
- re-extraction equality for the generated stop-list data module.
"""

import pathlib
import re

import pytest

from lucene_ray.snowball import (
    SNOWBALL_STEMMERS, danish_stem, dutch_stem, norwegian_stem,
    russian_stem, swedish_stem)

REF = pathlib.Path("/root/reference/lucene/analysis/common/src")


def test_dutch_reference_battery():
    src = (REF / "test/org/apache/lucene/analysis/nl/"
           "TestDutchAnalyzer.java").read_text()
    pairs = re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    assert len(pairs) >= 70
    for word, want in pairs:
        assert dutch_stem(word) == want, (word, want, dutch_stem(word))


ANALYZER_GOLDENS = {
    danish_stem: [("undersøgelse", "undersøg"), ("undersøg", "undersøg"),
                  ("undersøgelser", "undersøg")],
    swedish_stem: [("jaktkarlarne", "jaktkarl"),
                   ("jaktkarlens", "jaktkarl")],
    norwegian_stem: [("havnedistriktene", "havnedistrikt"),
                     ("havnedistrikter", "havnedistrikt")],
    russian_stem: [("знание", "знан"), ("это", "эт"),
                   ("хранилось", "хран"), ("тайне", "тайн"),
                   ("электромагнитной", "электромагнитн"),
                   ("энергии", "энерг"), ("имели", "имел"),
                   ("представление", "представлен")],
}


def test_analyzer_goldens():
    for fn, pairs in ANALYZER_GOLDENS.items():
        for word, want in pairs:
            assert fn(word) == want, (fn.__name__, word, want, fn(word))


def test_danish_branches():
    # main suffix action 1 + undouble
    assert danish_stem("hallen") == "hal"
    assert danish_stem("huset") == "hus"
    assert danish_stem("husets") == "hus"
    # bare s: valid / invalid s-ending
    assert danish_stem("hunds") == "hund"
    assert danish_stem("krus") == "krus"
    # igst strip (unrestricted) then ig-family in R1
    assert danish_stem("venligst") == "ven"
    # løst -> løs only inside R1
    assert danish_stem("hjælpeløst") == "hjælpeløs"
    assert danish_stem("løst") == "løst"
    # consonant pair drops the final letter
    assert danish_stem("skarpt") == "skarpt"  # 'pt' not in the set
    assert danish_stem("markt") == "mark"     # 'kt' in R1
    # short words keep R1 empty (p1 >= 3)
    assert danish_stem("på") == "på"
    assert danish_stem("se") == "se"


def test_swedish_branches():
    assert swedish_stem("flickorna") == "flick"
    assert swedish_stem("klokhetens") == "klok"
    # bare s after valid / invalid ending
    assert swedish_stem("hunds") == "hund"
    assert swedish_stem("brus") == "brus"     # u not an s-ending
    # consonant pair
    assert swedish_stem("byggt") == "bygg"
    # öst after a valid ost-ending; fullt -> full
    assert swedish_stem("kallöst") == "kallös"
    assert swedish_stem("underfullt") == "underfull"
    assert swedish_stem("fullt") == "fullt"   # outside R1


def test_norwegian_branches():
    # erte/ert -> er
    assert norwegian_stem("forserte") == "forser"
    # s after k needs a preceding non-vowel
    assert norwegian_stem("fisks") == "fisk"
    assert norwegian_stem("boks") == "boks"
    # other-suffix family
    assert norwegian_stem("hemmelig") == "hemm"
    # among picks the longest entry that FITS R1: for the bare word
    # "hetslov" (p1=3) the 7-char entry sticks out, "slov" fires
    assert norwegian_stem("hetslov") == "het"
    assert norwegian_stem("kjærlighetslov") == "kjærlig"
    # consonant pair dt/vt
    assert norwegian_stem("liknende") == "likn"


def test_russian_branches():
    # perfective gerund group 1 only after а/я (which is kept)
    assert russian_stem("прочитавши") == "прочита"
    # adjective then optional participle
    assert russian_stem("важных") == "важн"
    assert russian_stem("красивее") == "красив"
    # verb group fallback to noun
    assert russian_stem("длинный") == "длин"   # tidy_up нн -> н
    # derivational ость in R2
    assert russian_stem("словесность") == "словесн"
    # ё folds to е before everything (and RV of "все" is empty)
    assert russian_stem("всё") == "все"
    assert russian_stem("печёный") == "печен"
    # soft sign tidy-up
    assert russian_stem("область") == "област"


def test_registered_and_chains():
    from lucene_ray.analysis_en import TOKEN_FILTERS
    for name in SNOWBALL_STEMMERS:
        assert name in TOKEN_FILTERS
        lang = name.removeprefix("snowball_")
        assert lang in TOKEN_FILTERS
    # the analyzer chain stops then stems
    da = TOKEN_FILTERS["danish"]
    assert da(["på", "undersøgelse"]) == [None, "undersøg"]
    ru = TOKEN_FILTERS["russian"]
    assert ru(["и", "знание"]) == [None, "знан"]


def test_stop_data_matches_reference():
    import lucene_ray.snowball_stop_data as mod
    base = pathlib.Path(
        "/root/reference/lucene/analysis/common/src/resources/org/"
        "apache/lucene/analysis/snowball")
    for lang in ("danish", "dutch", "norwegian", "russian", "swedish"):
        words = []
        for line in (base / f"{lang}_stop.txt").read_text(
                encoding="utf-8").splitlines():
            words.extend(line.split("|", 1)[0].split())
        assert getattr(mod, lang.upper() + "_STOP") == frozenset(words)
