"""Hunspell core gates: every reference test dictionary whose .aff uses
only the supported affix core must pass its FULL .good/.wrong battery;
dictionaries using compound/conversion machinery must raise
NotImplementedError at load (the honest fence)."""

import os

import pytest

from lucene_ray.hunspell import HunspellDictionary, load_dictionary

BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/hunspell")

SUPPORTED = ["allcaps", "base", "base_utf", "breakdefault", "flagutf8",
             "i53643", "i58202", "keyDefault", "longStrip", "map",
             "maxNGramSugsDefault", "ngram", "ph"]


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


def test_unsupported_fence():
    with pytest.raises(NotImplementedError):
        load_dictionary(f"{BASE}/compoundrule.aff",
                        f"{BASE}/compoundrule.dic")
    with pytest.raises(NotImplementedError):
        load_dictionary(f"{BASE}/circumfix.aff",
                        f"{BASE}/circumfix.dic")


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
