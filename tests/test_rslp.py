"""Full RSLP/RSLG stemmers + Spanish plural stemmer against the
reference vocabulary zips (32k/9.4k/28k pairs), plus a live re-parse of
the reference .rslp resources asserting the generated rule tables."""

import os
import re
import zipfile

import pytest

from lucene_ray.rslp import (RSLP_STEMMERS, galician_rslp_stem,
                             portuguese_rslp_stem, spanish_plural_stem)

_REF = "/root/reference/lucene/analysis/common/src"
_TEST = f"{_REF}/test/org/apache/lucene/analysis"


def _pairs(lang, zname, txt):
    zpath = os.path.join(_TEST, lang, zname)
    if not os.path.exists(zpath):
        pytest.skip("reference vectors unavailable")
    with zipfile.ZipFile(zpath) as z, z.open(txt) as f:
        for raw in f.read().decode("utf-8").splitlines():
            if raw and not raw.startswith("#") and "\t" in raw:
                yield raw.split("\t")


@pytest.mark.parametrize("lang,zname,txt,fn,lower", [
    ("pt", "ptrslptestdata.zip", "ptrslp.txt", portuguese_rslp_stem,
     True),
    ("gl", "gltestdata.zip", "gl.txt", galician_rslp_stem, False),
    ("es", "espluraltestdata.zip", "esplural.txt", spanish_plural_stem,
     False),
], ids=["pt-rslp", "gl-rslg", "es-plural"])
def test_vocabularies(lang, zname, txt, fn, lower):
    n = 0
    bad = []
    for w, want in _pairs(lang, zname, txt):
        if lower:
            w = w.lower()
        got = fn(w)
        if got != want:
            bad.append((w, got, want))
        n += 1
    assert n > 5000
    assert not bad, f"{len(bad)}/{n} mismatches, first: {bad[:5]}"


def _parse_rslp(path):
    """Independent re-parse of the reference resource (same grammar as
    the generator, reimplemented here so a generator bug can't hide)."""
    text = re.sub(r"#[^\n]*", "", open(path, encoding="utf-8").read())
    toks = re.findall(r'"([^"]*)"|(\d+)|([{};])', text)
    toks = [(("str", a) if a or not (b or c) else
             ("num", int(b)) if b else c) for a, b, c in toks]
    steps, pos = {}, 0

    def strlist(pos):
        assert toks[pos] == "{"
        pos += 1
        out = []
        while toks[pos] != "}":
            out.append(toks[pos][1])
            pos += 1
        return tuple(out), pos + 1

    while pos < len(toks):
        assert toks[pos] == "{"
        name = toks[pos + 1][1]
        mn = toks[pos + 2][1]
        whole = bool(toks[pos + 3][1])
        conds, pos = strlist(pos + 4)
        rules = []
        while toks[pos] == "{":
            pos += 1
            suf = toks[pos][1]; pos += 1
            rmin = toks[pos][1]; pos += 1
            rep, exc = "", ()
            if isinstance(toks[pos], tuple) and toks[pos][0] == "str":
                rep = toks[pos][1]; pos += 1
            if toks[pos] == "{":
                exc, pos = strlist(pos)
            assert toks[pos] == "}"
            pos += 1
            rules.append((suf, rmin, rep, exc))
        assert toks[pos:pos + 2] == ["}", ";"]
        pos += 2
        if mn == 0:
            mn = min(r[1] + len(r[0]) for r in rules)
        steps[name] = (mn, whole, conds, tuple(rules))
    return steps


@pytest.mark.parametrize("res,var", [
    ("pt/portuguese.rslp", "PT_STEPS"),
    ("gl/galician.rslp", "GL_STEPS"),
])
def test_generated_tables_match_reference_resources(res, var):
    path = f"{_REF}/resources/org/apache/lucene/analysis/{res}"
    if not os.path.exists(path):
        pytest.skip("reference resources unavailable")
    import lucene_ray.rslp_data as data
    assert getattr(data, var) == _parse_rslp(path)


def test_step_flow_goldens():
    # PortugueseStemFilter javadoc / RSLP paper examples
    assert portuguese_rslp_stem("balões") == "bal"
    assert portuguese_rslp_stem("felizmente") == "feliz"
    assert portuguese_rslp_stem("chilenas") == "chilen"
    # vowel step only runs when noun AND verb removed nothing
    assert portuguese_rslp_stem("menino") == "menin"
    # galician: vowel step runs unconditionally
    assert galician_rslp_stem("corresponderá") == "correspond"


def test_spanish_plural_cases():
    # TestSpanishPluralStemFilter.java examples
    for w, want in [("casas", "casa"), ("luces", "luz"),
                    ("reyes", "rey"), ("relojes", "reloj"),
                    ("crisis", "crisis"), ("jerseis", "jersey"),
                    ("abades", "abad"), ("parques", "parque")]:
        assert spanish_plural_stem(w) == want, w


def test_registered_as_analyzers(ray_session):
    from lucene_ray.analysis_en import get_token_filter
    f = get_token_filter("portuguese_rslp")
    assert f(["felizmente"]) == ["feliz"]
    assert get_token_filter("spanish_plural")(["casas"]) == ["casa"]
    assert "galician_rslp" in RSLP_STEMMERS
