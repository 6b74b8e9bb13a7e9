"""Snowball stemmers, second batch (org.tartarus.snowball.ext) — the
default stemmers of the remaining per-language analyzers (ca, et, eu,
fi, ga, hu, hy, lt, ne, ro, sr, ta, tr all compose SnowballFilter with
their language's stemmer by default).

Clean-room Python implementations of the PUBLISHED Snowball algorithms
(snowballstem.org), control flow verified against the reference's
generated programs (cited per stemmer).  The among TABLES are data,
generated into ``snowball2_data.py`` from the same programs
(re-extraction equality in tests/test_snowball2.py).

Shared semantics (see snowball.py): regions are indexes into the
original token (rules edit only at the end); an among resolves to the
longest listed suffix that both matches and fits the restricting
region; a failed post-condition does not fall back to a shorter entry.
"""

from __future__ import annotations

from .snowball import _longest, _sorted_amongs, _std_regions
from . import snowball2_data as _d


def _amongs(tables: dict, name: str) -> tuple:
    """(suffix, action) pairs of a generated table, longest first."""
    return _sorted_amongs([(r[0], r[1]) for r in tables[name]])


def _pv_after_first_vowel(w: str, vowels: frozenset) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    return i + 1 if i < n else n


# ---------------------------------------------------------------------------
# Armenian (snowball/ext/ArmenianStemmer.java:13)
#
# Regions: pV = after the first vowel (r_mark_regions golab1), p2 = the
# classic R2 scan continued from there (:246-288).  All four rules run
# once each, backwards, restricted to pV (stem() sets limit_backward =
# I_pV at :350); only the ending rule additionally requires R2 (:334).

_HY_VOWELS = frozenset("աեէըիուօ")
_HY_ADJ = _amongs(_d.ARMENIAN, "a_0")
_HY_VERB = _amongs(_d.ARMENIAN, "a_1")
_HY_NOUN = _amongs(_d.ARMENIAN, "a_2")
_HY_ENDING = _amongs(_d.ARMENIAN, "a_3")


def armenian_stem(w: str) -> str:
    pv = _pv_after_first_vowel(w, _HY_VOWELS)
    p2 = _std_regions(w, _HY_VOWELS)[1]
    m = _longest(w, pv, _HY_ENDING)
    if m is not None and len(w) - len(m[0]) >= p2:
        w = w[:-len(m[0])]
    for table in (_HY_VERB, _HY_ADJ, _HY_NOUN):
        m = _longest(w, pv, table)
        if m is not None:
            w = w[:-len(m[0])]
    return w


SNOWBALL2_STEMMERS = {
    "snowball_armenian": armenian_stem,
}
