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


# ---------------------------------------------------------------------------
# Irish (snowball/ext/IrishStemmer.java:13)
#
# r_initial_morph rewrites the mutated/eclipsed initial cluster as a
# PREFIX among (find_among, forward) before regions are marked; the
# three backward passes (noun/deriv/verb, :304-316) then each run once
# on the evolving word with limit_backward = 0, so the region checks
# are post-commit conditions (r_R1/r_R2/r_RV, :216-226).

_GA_VOWELS = frozenset("aeiouáéíóú")
_GA_INITIAL = _sorted_amongs([(r[0], r[1]) for r in _d.IRISH["a_0"]])
_GA_INIT_SUB = {1: "", 2: "f", 3: "s", 4: "b", 5: "c",
                6: "d", 7: "g", 8: "p", 9: "t", 10: "m"}
_GA_NOUN = _amongs(_d.IRISH, "a_1")
_GA_DERIV = _amongs(_d.IRISH, "a_2")
_GA_DERIV_SUB = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}
_GA_VERB = _amongs(_d.IRISH, "a_3")


def _longest_prefix(w: str, table) -> tuple[str, int] | None:
    for pfx, act in table:
        if w.startswith(pfx):
            return pfx, act
    return None


def irish_stem(w: str) -> str:
    m = _longest_prefix(w, _GA_INITIAL)
    if m is not None:
        pfx, act = m
        w = _GA_INIT_SUB[act] + w[len(pfx):]
    pv = _pv_after_first_vowel(w, _GA_VOWELS)
    p1, p2 = _std_regions(w, _GA_VOWELS)
    m = _longest(w, 0, _GA_NOUN)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if start >= (p1 if act == 1 else p2):
            w = w[:start]
    m = _longest(w, 0, _GA_DERIV)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1:
            if start >= p2:
                w = w[:start]
        else:
            w = w[:start] + _GA_DERIV_SUB[act]
    m = _longest(w, 0, _GA_VERB)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if start >= (pv if act == 1 else p1):
            w = w[:start]
    return w


# ---------------------------------------------------------------------------
# Basque (snowball/ext/BasqueStemmer.java:13)
#
# RV is the Spanish-style definition (r_mark_regions lab1..lab12);
# aditzak (verbs, a_0) and izenak (nouns, a_1) REPEAT until an
# iteration fails (a matched among whose region condition fails ends
# the loop — find_among_b committed); adjetiboak (a_2) runs once.

_EU_VOWELS = frozenset("aeiou")
_EU_ADITZAK = _amongs(_d.BASQUE, "a_0")
_EU_ADITZAK_SUB = {3: "atseden", 4: "arabera", 5: "baditu"}
_EU_IZENAK = _amongs(_d.BASQUE, "a_1")
_EU_IZENAK_SUB = {3: "jok", 5: "tra", 6: "minutu", 7: "zehar",
                  8: "geldi", 9: "igaro", 10: "aurka"}
_EU_ADJ = _amongs(_d.BASQUE, "a_2")


def _pv_spanish(w: str, vowels: frozenset) -> int:
    """RV per the Spanish/Basque definition (BasqueStemmer.java
    r_mark_regions lab1): vowel+nonvowel -> after the next vowel;
    vowel+vowel -> after the next non-vowel; nonvowel+nonvowel ->
    after the next vowel; nonvowel+vowel -> index 3."""
    n = len(w)
    if n < 2:
        return n
    if w[0] in vowels:
        if w[1] not in vowels:
            i = 2
            while i < n and w[i] not in vowels:
                i += 1
        else:
            i = 2
            while i < n and w[i] in vowels:
                i += 1
        return i + 1 if i < n else n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return i + 1 if i < n else n
    return 3 if n >= 3 else n


def basque_stem(w: str) -> str:
    pv = _pv_spanish(w, _EU_VOWELS)
    p1, p2 = _std_regions(w, _EU_VOWELS)

    def one(word: str, table, subs: dict,
            regions: dict) -> tuple[str, bool]:
        m = _longest(word, 0, table)
        if m is None:
            return word, False
        sfx, act = m
        start = len(word) - len(sfx)
        if act in subs:
            return word[:start] + subs[act], True
        if start >= regions[act]:
            return word[:start], True
        return word, False

    regions01 = {1: pv, 2: p2}
    while True:
        w, ok = one(w, _EU_ADITZAK, _EU_ADITZAK_SUB, regions01)
        if not ok:
            break
    regions1 = {1: pv, 2: p2, 4: p1}
    while True:
        w, ok = one(w, _EU_IZENAK, _EU_IZENAK_SUB, regions1)
        if not ok:
            break
    w, _ = one(w, _EU_ADJ, {2: "z"}, {1: pv})
    return w


# ---------------------------------------------------------------------------
# Nepali (snowball/ext/NepaliStemmer.java:13)
#
# No regions.  remove_category_1 once (postposition endings; the का/कि
# /की/कै/को class survives after ए or े); then a loop: optionally drop
# one nasal/ai mark (a_2, itself guarded by what precedes it), then a
# verb suffix from a_3 MUST come off for the loop to continue — a
# category-2 removal sticks even when the following a_3 match fails.

_NE_CAT1 = _amongs(_d.NEPALI, "a_0")
_NE_CAT2 = _amongs(_d.NEPALI, "a_2")
_NE_CAT3 = _amongs(_d.NEPALI, "a_3")


def nepali_stem(w: str) -> str:
    m = _longest(w, 0, _NE_CAT1)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1 or not (w[:start].endswith("ए")
                            or w[:start].endswith("े")):
            w = w[:start]
    while True:
        m = _longest(w, 0, _NE_CAT2)
        if m is not None:
            sfx, act = m
            head = w[:len(w) - len(sfx)]
            if act == 1:
                if (head.endswith("यौ")
                        or head.endswith("छौ")
                        or head.endswith("नौ")
                        or head.endswith("थे")):
                    w = head
            elif head.endswith("त्र"):
                w = head
        m = _longest(w, 0, _NE_CAT3)
        if m is None:
            break
        w = w[:len(w) - len(m[0])]
    return w


# ---------------------------------------------------------------------------
# Romanian (snowball/ext/RomanianStemmer.java:13, Snowball 2.2 with the
# cedilla->comma-below r_norm)
#
# norm folds ş/ţ to ș/ț; prelude protects u/i between vowels as U/I;
# RV is Spanish-style, R1/R2 standard.  step_0 and the combo loop are
# R1-gated post-commit; the a_4 pass is R2-gated; verb suffixes match
# INSIDE RV (limit_backward = I_pV restricts the match itself) and run
# only when no standard suffix was removed; the final vowel pass is
# RV-gated; postlude unprotects I/U.

_RO_VOWELS = frozenset("aeiouâîă")
_RO_STEP0 = _amongs(_d.ROMANIAN, "a_2")
_RO_STEP0_SUB = {2: "a", 3: "e", 4: "i", 5: "i", 6: "at", 7: "ați"}
_RO_COMBO = _amongs(_d.ROMANIAN, "a_3")
_RO_COMBO_SUB = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at",
                 6: "it"}
_RO_STD = _amongs(_d.ROMANIAN, "a_4")
_RO_VERB = _amongs(_d.ROMANIAN, "a_5")
_RO_VOWEL = _amongs(_d.ROMANIAN, "a_6")


def romanian_stem(w: str) -> str:
    w = w.replace("ş", "ș").replace("ţ", "ț")
    c = list(w)
    for i in range(len(c) - 2):
        if (c[i] in _RO_VOWELS and c[i + 1] in "ui"
                and c[i + 2] in _RO_VOWELS):
            c[i + 1] = c[i + 1].upper()
    w = "".join(c)
    pv = _pv_spanish(w, _RO_VOWELS)
    p1, p2 = _std_regions(w, _RO_VOWELS)

    # step 0
    m = _longest(w, 0, _RO_STEP0)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if start >= p1:
            if act == 1:
                w = w[:start]
            elif act != 5 or not w[:start].endswith("ab"):
                w = w[:start] + _RO_STEP0_SUB[act]
            elif act == 5:
                pass             # 'ab' exception: committed, no change
    # standard suffixes: combo loop then the R2 pass
    removed = False
    while True:
        m = _longest(w, 0, _RO_COMBO)
        if m is None:
            break
        sfx, act = m
        start = len(w) - len(sfx)
        if start < p1:
            break
        w = w[:start] + _RO_COMBO_SUB[act]
        removed = True
    m = _longest(w, 0, _RO_STD)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if start >= p2:
            if act == 1:
                w = w[:start]
                removed = True
            elif act == 2:
                if w[:start].endswith("ț"):
                    w = w[:start - 1] + "t"
                    removed = True
            else:
                w = w[:start] + "ist"
                removed = True
    # verb suffixes (only when nothing standard came off); the match
    # itself is restricted to RV
    if not removed:
        m = _longest(w, pv, _RO_VERB)
        if m is not None:
            sfx, act = m
            start = len(w) - len(sfx)
            if act == 2:
                w = w[:start]
            elif start - 1 >= pv and (w[start - 1] not in _RO_VOWELS
                                      or w[start - 1] == "u"):
                w = w[:start]
    # vowel suffix (RV post-commit)
    m = _longest(w, 0, _RO_VOWEL)
    if m is not None:
        sfx, act = m
        if len(w) - len(sfx) >= pv:
            w = w[:-len(sfx)]
    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Lithuanian (snowball/ext/LithuanianStemmer.java:13)
#
# R1 is the standard scan, except a word longer than 6 chars starting
# with "a" scans from index 1 (stem():318-340).  fix_conflicts runs
# unrestricted; step1 (case endings, once) and step2 (repeat) match
# INSIDE R1 (limit_backward = I_p1); fix_chdz (č->t, dž->d) after each
# step and fix_gd (gd->g) last, all unrestricted.

_LT_VOWELS = frozenset("aeiouyąėęįūų")
_LT_STEP1 = _amongs(_d.LITHUANIAN, "a_0")
_LT_STEP2 = _amongs(_d.LITHUANIAN, "a_1")
_LT_CONFLICTS = _amongs(_d.LITHUANIAN, "a_2")
_LT_CONFLICT_SUB = {1: "aitė", 2: "uotė", 3: "ėjimas", 4: "esys",
                    5: "asys", 6: "avimas", 7: "ojimas", 8: "okatė"}


def lithuanian_stem(w: str) -> str:
    n = len(w)
    start = 1 if (w.startswith("a") and n > 6) else 0
    i = start
    while i < n and w[i] not in _LT_VOWELS:
        i += 1
    while i < n and w[i] in _LT_VOWELS:
        i += 1
    p1 = i + 1 if i < n else n
    m = _longest(w, 0, _LT_CONFLICTS)
    if m is not None:
        sfx, act = m
        w = w[:len(w) - len(sfx)] + _LT_CONFLICT_SUB[act]
    m = _longest(w, p1, _LT_STEP1)
    if m is not None:
        w = w[:len(w) - len(m[0])]
    if w.endswith("č"):
        w = w[:-1] + "t"
    elif w.endswith("dž"):
        w = w[:-2] + "d"
    while True:
        m = _longest(w, p1, _LT_STEP2)
        if m is None:
            break
        w = w[:len(w) - len(m[0])]
    if w.endswith("č"):
        w = w[:-1] + "t"
    elif w.endswith("dž"):
        w = w[:-2] + "d"
    if w.endswith("gd"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Catalan (snowball/ext/CatalanStemmer.java:13)
#
# Standard R1/R2 only.  attached_pronoun (R1 delete), then ONE of
# standard_suffix / verb_suffix (verb only tried when standard fails,
# stem():576-594), then residual_suffix; r_cleaning deaccents at the
# end (middot -> '.').

_CA_VOWELS = frozenset("aeiouàáèéíïòóúü")
_CA_CLEAN = str.maketrans("àáèéìíïòóúü·", "aaeeiiioouu.")
_CA_PRONOUN = _amongs(_d.CATALAN, "a_1")
_CA_STD = _amongs(_d.CATALAN, "a_2")
_CA_VERB = _amongs(_d.CATALAN, "a_3")
_CA_RESIDUAL = _amongs(_d.CATALAN, "a_4")


def catalan_stem(w: str) -> str:
    p1, p2 = _std_regions(w, _CA_VOWELS)
    m = _longest(w, 0, _CA_PRONOUN)
    if m is not None and len(w) - len(m[0]) >= p1:
        w = w[:len(w) - len(m[0])]
    done = False
    m = _longest(w, 0, _CA_STD)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1 and start >= p1:
            w, done = w[:start], True
        elif act == 2 and start >= p2:
            w, done = w[:start], True
        elif act == 3 and start >= p2:
            w, done = w[:start] + "log", True
        elif act == 4 and start >= p2:
            w, done = w[:start] + "ic", True
        elif act == 5 and start >= p1:
            w, done = w[:start] + "c", True
    if not done:
        m = _longest(w, 0, _CA_VERB)
        if m is not None:
            sfx, act = m
            start = len(w) - len(sfx)
            if start >= (p1 if act == 1 else p2):
                w = w[:start]
    m = _longest(w, 0, _CA_RESIDUAL)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if start >= p1:
            w = w[:start] if act == 1 else w[:start] + "ic"
    return w.translate(_CA_CLEAN)


SNOWBALL2_STEMMERS = {
    "snowball_armenian": armenian_stem,
    "snowball_irish": irish_stem,
    "snowball_basque": basque_stem,
    "snowball_nepali": nepali_stem,
    "snowball_romanian": romanian_stem,
    "snowball_lithuanian": lithuanian_stem,
    "snowball_catalan": catalan_stem,
}
