"""RSLP-family stemmers: full Portuguese RSLP (Orengo & Huyck) and the
Galician RSLG adaptation, plus the Spanish plural stemmer.

Semantics follow the reference's step machinery
(``analysis/pt/RSLPStemmerBase.java:96-230``): a step is skipped when
the word is shorter than its min length or ends with none of its entry
conditions; otherwise the FIRST matching rule fires
(``len(word) - len(suffix) >= min_stem`` and suffix match and not an
exception); an exception sends the scan to the NEXT rule.  Exceptions
are whole words or suffixes per the step's flag.  Flows:

- Portuguese (``analysis/pt/PortugueseStemmer.java:46-68``): plural →
  adverb → feminine → augmentative → noun; verb only if noun removed
  nothing; vowel only if verb also removed nothing; then RSLP accent
  removal.
- Galician (``analysis/gl/GalicianStemmer.java:48-71``): plural →
  unification → adverb → augmentative-until-fixpoint → noun; verb only
  if noun removed nothing; vowel ALWAYS; then RSLG accent removal.

Rule tables live in ``rslp_data.py`` (generated from the reference's
published resource files; re-parsed and equality-asserted in
tests/test_rslp.py); the 32k-pair ``ptrslptestdata.zip`` and 9.4k-pair
``gltestdata.zip`` vocabularies gate both stemmers end-to-end.
"""

from __future__ import annotations

from .rslp_data import GL_STEPS, PT_STEPS


def _compile(steps: dict) -> dict:
    out = {}
    for name, (mn, whole, conds, rules) in steps.items():
        rs = []
        for suf, rmin, rep, exc in rules:
            rs.append((suf, rmin, rep,
                       frozenset(exc) if whole else tuple(exc)))
        out[name] = (mn, whole, conds or None, tuple(rs))
    return out


_PT = _compile(PT_STEPS)
_GL = _compile(GL_STEPS)


def _apply(w: str, step) -> str:
    mn, whole, conds, rules = step
    if len(w) < mn:
        return w
    if conds is not None and not w.endswith(conds):
        return w
    for suf, rmin, rep, exc in rules:
        if len(w) - len(suf) >= rmin and w.endswith(suf):
            if whole:
                if w in exc:
                    continue
            elif exc and w.endswith(exc):
                continue
            return w[:-len(suf)] + rep
    return w


_PT_ACCENTS = str.maketrans("àáâãäåçèéêëìíîïñòóôõöùúûüýÿ",
                            "aaaaaaceeeeiiiinooooouuuuyy")
_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")


def portuguese_rslp_stem(w: str) -> str:
    """Full RSLP (PortugueseStemFilter role)."""
    w = _apply(w, _PT["Plural"])
    w = _apply(w, _PT["Adverb"])
    w = _apply(w, _PT["Feminine"])
    w = _apply(w, _PT["Augmentative"])
    n = _apply(w, _PT["Noun"])
    if n == w:
        v = _apply(w, _PT["Verb"])
        n = _apply(v, _PT["Vowel"]) if v == w else v
    return n.translate(_PT_ACCENTS)


def galician_rslp_stem(w: str) -> str:
    """Full RSLG (GalicianStemFilter role)."""
    w = _apply(w, _GL["Plural"])
    w = _apply(w, _GL["Unification"])
    w = _apply(w, _GL["Adverb"])
    while True:
        n = _apply(w, _GL["Augmentative"])
        if n == w:
            break
        w = n
    n = _apply(w, _GL["Noun"])
    if n == w:
        n = _apply(w, _GL["Verb"])
    n = _apply(n, _GL["Vowel"])
    return n.translate(_GL_ACCENTS)


# ---------------------------------------------------------------------------
# Spanish plural stemmer (es/SpanishPluralStemmer.java:46-160) — the
# wikilengua plural-formation rules with invariant and special-case
# word sets.  The q/gu rule reproduces the reference's Java operator
# precedence exactly: 'q' at [-4] alone is sufficient (the 'u'/'ie'
# checks bind only to the 'g' arm).

_ES_INVARIANT = frozenset("""abrebotellas abrecartas abrelatas afueras
albatros albricias aledaños alexis alicates analisis andurriales
antitesis añicos apendicitis apocalipsis arcoiris aries bilis boletus
boris brindis cactus canutas caries cascanueces cascarrabias ciempies
cifosis cortaplumas corpus cosmos cosquillas creces crisis
cuatrocientas cuatrocientos cuelgacapas cuentacuentos cuentapasos
cumpleaños doscientas doscientos dosis enseres entonces esponsales
estatus exequias fauces forceps fotosintesis gafas gafotas gargaras
gris honorarios ictus jueves lapsus lavacoches lavaplatos limpiabotas
lunes maitines martes mondadientes novecientas novecientos nupcias
ochocientas ochocientos pais paris parabrisas paracaidas parachoques
paraguas pararrayos pisapapeles piscis portaaviones portamaletas
portamantas quinientas quinientos quitamanchas recogepelotas rictus
rompeolas sacacorchos sacapuntas saltamontes salvavidas seis
seiscientas seiscientos setecientas setecientos sintesis tenis tifus
trabalenguas vacaciones venus versus viacrucis virus viveres
volandas""".split())

_ES_SPECIAL = frozenset("""yoes noes sies clubes faralaes albalaes
itemes albumes sandwiches relojes bojes contrarreloj
carcajes""".split())

_ES_DEACCENT = str.maketrans("àáâäòóôöèéêëùúûüìíîï",
                             "aaaaooooeeeeuuuuiiii")

_ES_VOWELS = frozenset("aeiou")


def spanish_plural_stem(w: str) -> str:
    if len(w) < 4:
        return w
    w = w.translate(_ES_DEACCENT)
    if w in _ES_INVARIANT:
        return w
    if w in _ES_SPECIAL:
        return w[:-2]
    if w[-1] != "s":
        return w
    if w[-2] not in _ES_VOWELS:
        return w[:-1]
    if w[-4] == "q" or (w[-4] == "g" and w[-3] == "u"
                        and w[-2] in "ie"):
        return w[:-1]
    if w[-4] in _ES_VOWELS and w[-3] == "r" and w[-2] == "e":
        return w[:-2]
    if w[-4] in _ES_VOWELS and w[-3] in "dlnx" and w[-2] == "e":
        return w[:-2]
    if w[-3] in "yu" and w[-2] == "e":
        return w[:-2]
    if w[-4] in "ulrtn" and w[-3] == "i" and w[-2] == "e":
        return w[:-2]
    if w[-3] == "s" and w[-2] == "e":
        return w[:-2]
    if w[-3] in _ES_VOWELS and w[-2] == "i":
        return w[:-2] + "y"
    if w[-3] == "d" and w[-2] == "i":
        return w[:-2] + "y"
    if w[-2] == "e" and w[-3] == "c":
        return w[:-3] + "z"
    if w[-2] in _ES_VOWELS:
        return w[:-1]
    return w


RSLP_STEMMERS = {
    "portuguese_rslp": portuguese_rslp_stem,
    "galician_rslp": galician_rslp_stem,
    "spanish_plural": spanish_plural_stem,
}
