"""Brazilian Portuguese stemmer, a faithful port of the reference's
``br/BrazilianStemmer.java:41-1120`` flow:

- ``changeTerm``: lowercase + accent/cedilla folding; ``createCT``
  strips ONE leading and ONE trailing punctuation character.
- Regions R1 (after the first non-vowel following a vowel, scanning
  only up to the second-to-last char — the reference's ``j < i``
  bound), R2 = R1 of R1, and RV are computed ONCE from CT and go
  STALE as steps shrink CT; suffix checks against the stale regions
  while removals act on the current CT are part of the algorithm.
- step1 (standard suffixes, longest first) else step2 (verb
  suffixes); step3 if either fired else step4; step5 always.
- Reference quirks reproduced: the 'logias' row discards its result
  yet reports success; the step2 'ira' row removes 'ava'.

Rule tables live in ``brstem_data.py`` (generated; re-extracted and
equality-asserted in tests/test_brstem.py)."""

from __future__ import annotations

from .brstem_data import BR_STEP1, BR_STEP2

_VOW = frozenset("aeiou")
_FOLD = str.maketrans("áâãéêíóôõúüçñ", "aaaeeiooouucn")
_PUNCT = "\"'-,;.?!"


def _suffix(value, suf) -> bool:
    return value is not None and value.endswith(suf)


def _remove(value: str, suf: str) -> str:
    return value[:-len(suf)] if value.endswith(suf) else value


def _replace(value: str, torep: str, changeto: str) -> str:
    v = _remove(value, torep)
    return value if v == value else v + changeto


def _suffix_preceded(value, suf, prec) -> bool:
    return _suffix(value, suf) and _suffix(_remove(value, suf), prec)


def _get_r1(v):
    if v is None:
        return None
    i = len(v) - 1
    j = 0
    while j < i and v[j] not in _VOW:
        j += 1
    if not j < i:
        return None
    while j < i and v[j] in _VOW:
        j += 1
    if not j < i:
        return None
    return v[j + 1:]


def _get_rv(v):
    if v is None:
        return None
    i = len(v) - 1
    if i > 0 and v[1] not in _VOW:
        j = 2
        while j < i and v[j] not in _VOW:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 1 and v[0] in _VOW and v[1] in _VOW:
        j = 2
        while j < i and v[j] in _VOW:
            j += 1
        if j < i:
            return v[j + 1:]
    if i > 2:
        return v[3:]
    return None


def _create_ct(term: str) -> str:
    ct = term.lower().translate(_FOLD)
    if len(ct) < 2:
        return ct
    if ct[0] in _PUNCT:
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in _PUNCT:
        ct = ct[:-1]
    return ct


def brazilian_stem_raw(term: str):
    """stem(): None when not indexable (length outside (2, 30)), the
    folded term when not all-letters, else the stemmed CT."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not all(c.isalpha() for c in ct):
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)
    regions = {"R1": r1, "R2": r2, "RV": rv}

    altered = False
    for suf, region, prec, assign, rep in BR_STEP1:
        if (_suffix(ct, suf) and _suffix(regions[region], suf)
                and (not prec or _suffix_preceded(ct, suf, prec))):
            if assign:
                ct = _replace(ct, suf, rep)
            altered = True
            break
    if not altered and rv is not None:
        for chk, rem in BR_STEP2:
            if _suffix(rv, chk):
                ct = _remove(ct, rem)
                altered = True
                break

    if altered:
        # step3
        if rv is not None and _suffix(rv, "i") \
                and _suffix_preceded(rv, "i", "c"):
            ct = _remove(ct, "i")
    elif rv is not None:
        # step4
        for suf in ("os", "a", "i", "o"):
            if _suffix(rv, suf):
                ct = _remove(ct, suf)
                break

    # step5
    if rv is not None and _suffix(rv, "e"):
        if _suffix_preceded(rv, "e", "gu"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "u")
        elif _suffix_preceded(rv, "e", "ci"):
            ct = _remove(ct, "e")
            ct = _remove(ct, "i")
        else:
            ct = _remove(ct, "e")
    return ct


def brazilian_stem(w: str) -> str:
    """BrazilianStemFilter contract (br/BrazilianStemFilter.java:60):
    keep the original token when stem() returns null or the same."""
    s = brazilian_stem_raw(w)
    return s if s is not None and s != w else w
