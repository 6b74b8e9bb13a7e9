"""Light stemmers validated against the reference's COMPLETE
vocabulary test files ({de,es,it,sv,ru,fr}light.txt, ~200k pairs) read
directly from the read-only reference tree, plus build integration."""

import os
import zipfile

import pytest

from lucene_ray.lightstem import (LIGHT_STEMMERS, french_light_stem,
                                  german_light_stem, russian_light_stem,
                                  spanish_light_stem)

_REF = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis")

_LANGS = {
    "de": ("german_light", "delighttestdata.zip", "delight.txt"),
    "es": ("spanish_light", "eslighttestdata.zip", "eslight.txt"),
    "it": ("italian_light", "itlighttestdata.zip", "itlight.txt"),
    "sv": ("swedish_light", "svlighttestdata.zip", "svlight.txt"),
    "ru": ("russian_light", "rulighttestdata.zip", "rulight.txt"),
    "fr": ("french_light", "frlighttestdata.zip", "frlight.txt"),
    "pt": ("portuguese_light", "ptlighttestdata.zip", "ptlight.txt"),
    "fi": ("finnish_light", "filighttestdata.zip", "filight.txt"),
    "hu": ("hungarian_light", "hulighttestdata.zip", "hulight.txt"),
}

_NO_TXT = {
    "nb": ("norwegian_light", "nb_light.txt"),
    "nn": ("norwegian_light_nn", "nn_light.txt"),
}


@pytest.mark.parametrize("variant", sorted(_NO_TXT))
def test_norwegian_vocabulary(variant):
    name, txt = _NO_TXT[variant]
    path = os.path.join(_REF, "no", txt)
    if not os.path.exists(path):
        pytest.skip("reference vectors unavailable")
    stem = LIGHT_STEMMERS[name]
    with open(path, encoding="utf-8") as f:
        for raw in f.read().splitlines():
            if not raw or raw.startswith("#"):
                continue
            w, want = raw.split("\t")
            assert stem(w) == want, (w, stem(w), want)


@pytest.mark.parametrize("lang", sorted(_LANGS))
def test_full_reference_vocabulary(lang):
    name, zname, txt = _LANGS[lang]
    zpath = os.path.join(_REF, lang, zname)
    if not os.path.exists(zpath):
        pytest.skip("reference vectors unavailable")
    stem = LIGHT_STEMMERS[name]
    bad = []
    with zipfile.ZipFile(zpath) as z, z.open(txt) as f:
        for raw in f.read().decode("utf-8").splitlines():
            if not raw or raw.startswith("#"):
                continue
            w, want = raw.split("\t")
            got = stem(w)
            if got != want:
                bad.append((w, got, want))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_spot_checks():
    # umlaut fold + suffix strips (GermanLightStemmer.java:40)
    assert german_light_stem("häuser") == "haus"
    assert german_light_stem("bücher") == "buch"
    # plural + ces->z mutation (SpanishLightStemmer.java:40)
    assert spanish_light_stem("torres") == "torr"
    assert spanish_light_stem("veces") == "vez"
    # French rewrites (FrenchLightStemmer.java:40): aux->al, and the
    # ation rule + norm tail strip
    assert french_light_stem("chevaux") == "cheval"
    assert french_light_stem("administration") == "administ"
    # Russian case removal
    assert russian_light_stem("книгами") == "книг"


def test_keyword_like_short_words_identity():
    assert spanish_light_stem("casa"[:3]) == "cas"  # len<5 identity
    assert LIGHT_STEMMERS["italian_light"]("corto") == "corto"


def test_build_integration(tmp_path, ray_session):
    """Index.build(analyzer='german_light'): stemmed vocabulary only;
    query-side analyze stems identically (the QueryBuilder symmetry)."""
    import pyarrow.parquet as pq

    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import termdict_scan

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(50, seed=13), str(c / "a.parquet"))
    idx = Index.build(str(c), str(tmp_path / "i"),
                      analyzer="german_light")
    r = idx.reader
    terms = set(t for t in termdict_scan(r).column("term").to_pylist()
                if ":" not in t)
    # the vocabulary is a fixpoint under the stemmer on the
    # already-folded side only for FOLDED input; check the filter was
    # applied at all: a word ending in 'en' cannot survive unstemmed
    # when its stem is in the vocab
    assert terms
    assert r.analyze("laufen") == [german_light_stem("laufen")]
