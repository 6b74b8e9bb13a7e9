"""German medium stemmer against the reference's de/data.txt."""

import os

import pytest

from lucene_ray.destem import german_stem

_DATA = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/de/data.txt")


def test_data_txt_vocabulary():
    if not os.path.exists(_DATA):
        pytest.skip("reference vectors unavailable")
    n = 0
    for line in open(_DATA, encoding="utf-8"):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        w, want = line.split("\t")
        assert german_stem(w) == want, w
        n += 1
    assert n > 25


def test_edges():
    # uppercase folded, non-letters pass through lowercased
    assert german_stem("Tische") == "tisch"
    assert german_stem("ab1c") == "ab1c"
    assert german_stem("") == ""
    # masked substitutions resubstitute (sch/ch/ei/ie/ig/st)
    assert german_stem("abschließen") == "abschliess"


def test_registered(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    assert get_token_filter("german_stem")(["Tischen"]) == ["tisch"]
