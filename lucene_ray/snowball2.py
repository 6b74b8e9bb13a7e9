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
    # The repeat loops do NOT reset the cursor to the word end: after
    # each slice the next match ends where the previous suffix began
    # (stem():587-607 only restores cursor on a FAILED call), so a
    # substitution's replacement text is never rescanned and izenak /
    # adjetiboak continue from wherever aditzak stopped.  ``pos``
    # mirrors that cursor; indexes left of every edit stay absolute,
    # so the original-region comparison matches the runtime's fixed
    # I_pV/I_p1/I_p2.
    pv = _pv_spanish(w, _EU_VOWELS)
    p1, p2 = _std_regions(w, _EU_VOWELS)
    pos = len(w)

    def one(word: str, pos: int, table, subs: dict,
            regions: dict) -> tuple[str, int, bool]:
        m = _longest(word[:pos], 0, table)
        if m is None:
            return word, pos, False
        sfx, act = m
        start = pos - len(sfx)
        if act in subs:
            return word[:start] + subs[act] + word[pos:], start, True
        if start >= regions[act]:
            return word[:start] + word[pos:], start, True
        return word, pos, False

    regions01 = {1: pv, 2: p2}
    while True:
        w, pos, ok = one(w, pos, _EU_ADITZAK, _EU_ADITZAK_SUB,
                         regions01)
        if not ok:
            break
    regions1 = {1: pv, 2: p2, 4: p1}
    while True:
        w, pos, ok = one(w, pos, _EU_IZENAK, _EU_IZENAK_SUB, regions1)
        if not ok:
            break
    w, pos, _ = one(w, pos, _EU_ADJ, {2: "z"}, {1: pv})
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


# ---------------------------------------------------------------------------
# Hungarian (snowball/ext/HungarianStemmer.java:13, Snowball 2.2)
#
# R1 for a vowel-initial word starts after the first consonant — where
# "consonant" swallows a whole digraph from a_0 (cs/dzs/gy/...,
# r_mark_regions lab4); for a consonant-initial word it starts after
# the first vowel.  Nine suffix families run in a fixed order, each
# once, all R1-gated post-commit; instrum/factive additionally require
# a doubled consonant (a_2, checked BEFORE the suffix comes off) and
# undouble it by dropping the second-to-last char.

_HU_VOWELS = frozenset("aeiouáéíóöúüőű")
_HU_DIGRAPHS = tuple(sorted((r[0] for r in _d.HUNGARIAN["a_0"]),
                            key=len, reverse=True))
_HU_DOUBLES = tuple(sorted((r[0] for r in _d.HUNGARIAN["a_2"]),
                           key=len, reverse=True))
_HU_V_ENDING = _amongs(_d.HUNGARIAN, "a_1")
_HU_INSTRUM = _amongs(_d.HUNGARIAN, "a_3")
_HU_CASE = _amongs(_d.HUNGARIAN, "a_4")
_HU_CASE_SPECIAL = _amongs(_d.HUNGARIAN, "a_5")
_HU_CASE_OTHER = _amongs(_d.HUNGARIAN, "a_6")
_HU_FACTIVE = _amongs(_d.HUNGARIAN, "a_7")
_HU_PLURAL = _amongs(_d.HUNGARIAN, "a_8")
_HU_OWNED = _amongs(_d.HUNGARIAN, "a_9")
_HU_SING_OWNER = _amongs(_d.HUNGARIAN, "a_10")
_HU_PLUR_OWNER = _amongs(_d.HUNGARIAN, "a_11")


def _hu_p1(w: str) -> int:
    n = len(w)
    if n == 0:
        return 0
    if w[0] in _HU_VOWELS:
        i = 1
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for dg in _HU_DIGRAPHS:
            if w.startswith(dg, i):
                return i + len(dg)
        return i + 1
    i = 1
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return i + 1 if i < n else n


def hungarian_stem(w: str) -> str:
    p1 = _hu_p1(w)

    def sub(word: str, table, acts: dict) -> str:
        m = _longest(word, 0, table)
        if m is not None:
            sfx, act = m
            start = len(word) - len(sfx)
            if start >= p1:
                return word[:start] + acts[act]
        return word

    def doubled(word: str, table) -> str:
        m = _longest(word, 0, table)
        if m is not None:
            start = len(word) - len(m[0])
            if start >= p1 and any(
                    word[:start].endswith(dc) for dc in _HU_DOUBLES):
                word = word[:start]
                return word[:-2] + word[-1]     # undouble
        return word

    w = doubled(w, _HU_INSTRUM)
    m = _longest(w, 0, _HU_CASE)
    if m is not None:
        start = len(w) - len(m[0])
        if start >= p1:
            w = w[:start]
            # v_ending: trailing á/é (in R1) normalizes to a/e
            v = _longest(w, 0, _HU_V_ENDING)
            if v is not None and len(w) - 1 >= p1:
                w = w[:-1] + ("a" if v[1] == 1 else "e")
    w = sub(w, _HU_CASE_SPECIAL, {1: "e", 2: "a"})
    w = sub(w, _HU_CASE_OTHER, {1: "", 2: "a", 3: "e"})
    w = doubled(w, _HU_FACTIVE)
    w = sub(w, _HU_OWNED, {1: "", 2: "e", 3: "a"})
    w = sub(w, _HU_SING_OWNER, {1: "", 2: "a", 3: "e"})
    w = sub(w, _HU_PLUR_OWNER, {1: "", 2: "a", 3: "e"})
    w = sub(w, _HU_PLURAL, {1: "a", 2: "e", 3: ""})
    return w


# ---------------------------------------------------------------------------
# Estonian (snowball/ext/EstonianStemmer.java:13)
#
# verb_exceptions replaces a full-word match and STOPS (SnowballFilter
# ignores stem()'s false return, SnowballFilter.java:98).  R1 is
# standard; the suffix passes match INSIDE R1 (limit_backward = I_p1)
# but their guards (preceding-char groupings, the start>=4 length
# floor, LONGV) run with the limit restored, i.e. unrestricted.
# Order: emphasis; verb OR substantive (special nouns, case endings,
# first-three plural cases, degrees, i-plural, nu); undouble kk/pp/tt
# after a final V1 vowel.

_ET_V1 = frozenset("aeiouäõöü")
_ET_RV = frozenset("aeiou")
_ET_KI = frozenset("bdfghkpstzšž")
_ET_GI = frozenset("aceijlmnoqruvwxäõöü")
_ET_LONGV = tuple(r[0] for r in _d.ESTONIAN["a_2"])
_ET_EMPHASIS = _amongs(_d.ESTONIAN, "a_0")
_ET_VERB = _amongs(_d.ESTONIAN, "a_1")
_ET_IPLURAL = _amongs(_d.ESTONIAN, "a_3")
_ET_SPECIAL = _amongs(_d.ESTONIAN, "a_4")
_ET_SPECIAL_SUB = {1: "lase", 2: "mise", 3: "lise"}
_ET_CASE = _amongs(_d.ESTONIAN, "a_5")
_ET_A6 = _amongs(_d.ESTONIAN, "a_6")
_ET_PLUR3 = _amongs(_d.ESTONIAN, "a_7")
_ET_NU = _amongs(_d.ESTONIAN, "a_8")
_ET_KPT = _amongs(_d.ESTONIAN, "a_9")
_ET_DEGREES = _amongs(_d.ESTONIAN, "a_10")
_ET_EXC_SUB = {1: "joo", 2: "saa", 3: "viima", 4: "keesi", 5: "löö",
               6: "lõi", 7: "loo", 8: "käisi", 9: "söö", 10: "too",
               11: "võisi", 12: "jääma", 13: "müüsi", 14: "luge",
               15: "põde", 16: "ladu", 17: "tegi", 18: "nägi"}
_ET_EXC = {r[0]: _ET_EXC_SUB[r[1]] for r in _d.ESTONIAN["a_11"]}


def _et_longv(head: str) -> bool:
    return any(head.endswith(p) for p in _ET_LONGV)


def estonian_stem(w: str) -> str:
    exc = _ET_EXC.get(w)
    if exc is not None:
        return exc
    p1 = _std_regions(w, _ET_V1)[0]

    # emphasis: -gi / -ki (start >= 4; gi needs a GI char before and
    # no long vowel; ki needs a KI char before)
    m = _longest(w, p1, _ET_EMPHASIS)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        head = w[:start]
        if start >= 4 and start >= 1:
            if act == 1:
                if w[start - 1] in _ET_GI and not _et_longv(head):
                    w = head
            elif w[start - 1] in _ET_KI:
                w = head

    # verb, else the substantive chain
    verbed = False
    m = _longest(w, p1, _ET_VERB)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1:
            w, verbed = w[:start], True
        elif act == 2:
            w, verbed = w[:start] + "a", True
        elif start >= 1 and w[start - 1] in _ET_V1:
            w, verbed = w[:start], True
    if not verbed:
        m = _longest(w, p1, _ET_SPECIAL)
        if m is not None:
            sfx, act = m
            w = w[:len(w) - len(sfx)] + _ET_SPECIAL_SUB[act]
        m = _longest(w, p1, _ET_CASE)
        if m is not None:
            sfx, act = m
            start = len(w) - len(sfx)
            head = w[:start]
            if act == 1:
                if start >= 1 and (w[start - 1] in _ET_RV
                                   or _et_longv(head)):
                    w = head
            elif start >= 4:
                w = head
        m = _longest(w, p1, _ET_PLUR3)
        if m is not None:
            sfx, act = m
            start = len(w) - len(sfx)
            head = w[:start]
            if act == 1:
                w = head + "iku"
            elif act == 2:
                if not _et_longv(head):
                    w = head
            elif act == 3:
                if start >= 4:
                    a6 = _longest(head, 0, _ET_A6)
                    if a6 is not None:          # '' always matches
                        if a6[1] == 1:
                            w = head + "e"
                        elif a6[1] == 2:
                            w = head
                else:
                    w = head + "t"
            elif start >= 1 and (w[start - 1] in _ET_RV
                                 or _et_longv(head)):
                w = head
        m = _longest(w, p1, _ET_DEGREES)
        if m is not None:
            sfx, act = m
            start = len(w) - len(sfx)
            if act == 2:
                w = w[:start]
            elif start >= 1 and w[start - 1] in _ET_RV:
                w = w[:start]
        m = _longest(w, p1, _ET_IPLURAL)
        if m is not None:
            start = len(w) - len(m[0])
            if start >= 1 and w[start - 1] in _ET_RV:
                w = w[:start]
        m = _longest(w, p1, _ET_NU)
        if m is not None:
            w = w[:len(w) - len(m[0])]

    # undouble kk/pp/tt before a final V1 vowel, end inside R1
    if (len(w) >= 1 and w[-1] in _ET_V1 and len(w) - 1 >= p1
            and w[-3:-1] in ("kk", "pp", "tt")):
        w = w[:-2] + w[-1]
    return w


# ---------------------------------------------------------------------------
# Tamil (snowball/ext/TamilStemmer.java:13)
#
# No regions; instead a min-length floor (>4, re-checked per pass) and
# two global flags.  fix_ending normalizes one ending (a_5 with
# per-case lookbehind guards; a failed guard falls through to the
# pulli route) and fix_endings repeats it to a fixpoint; prefixes
# (question/pronoun) strip <head><consonant>் and re-fix a va- start;
# then question/um/common/vetrumai/plural/command suffix families run
# once each (most re-fixing endings), and tense suffixes repeat until
# no match.  B_found_vetrumai_urupu gates fix_ending's ம்-case.

_TA = {k: _amongs(_d.TAMIL, k) for k in _d.TAMIL}
_TA1_SET = frozenset(r[0] for r in _d.TAMIL["a_1"])
_TA10_SET = frozenset(r[0] for r in _d.TAMIL["a_10"])
_TA11_SET = frozenset(r[0] for r in _d.TAMIL["a_11"])


def _ta_ends(head: str, key: str) -> bool:
    return _longest(head, 0, _TA[key]) is not None


def _ta_fix_va_start(w: str) -> str:
    for pfx, rep in (("வோ", "ஓ"), ("வொ", "ஒ"), ("வு", "உ"),
                     ("வூ", "ஊ")):
        if w.startswith(pfx):
            return rep + w[2:]
    return w


def _ta_try_a5(w: str, found_vetrumai: bool) -> str | None:
    m = _longest(w, 0, _TA["a_5"])
    if m is None:
        return None
    sfx, act = m
    head = w[:len(w) - len(sfx)]
    if act == 1:
        return head
    if act == 2:
        return head if _ta_ends(head, "a_2") else None
    if act == 3:
        return head + "ள்"
    if act == 4:
        return head + "ல்"
    if act == 5:
        return head + "டு"
    if act == 6:
        if not found_vetrumai or head.endswith("ை"):
            return None
        return head + "ம்"
    if act == 7:
        return head + "்"
    if act == 8:
        return None if _ta_ends(head, "a_3") else head
    # act 9 (ங்): preceded by ை/் -> delete, else -> ம்
    c = _longest(head, 0, _TA["a_4"])
    return head if c[1] == 1 else head + "ம்"


def _ta_fix_ending(w: str, found_vetrumai: bool) -> str | None:
    """One r_fix_ending pass; None = rule failed (no change)."""
    if len(w) <= 3:
        return None
    r = _ta_try_a5(w, found_vetrumai)
    if r is not None:
        return r
    if not w.endswith("்"):
        return None
    head = w[:-1]
    m6 = _longest(head, 0, _TA["a_6"])
    if m6 is not None:
        h2 = head[:len(head) - len(m6[0])]
        if h2.endswith("்"):
            m7 = _longest(h2[:-1], 0, _TA["a_7"])
            if m7 is not None:
                h2 = h2[:-1 - len(m7[0])]
        return h2
    m8 = _longest(head, 0, _TA["a_8"])
    if m8 is not None:
        h2 = head[:len(head) - len(m8[0])]
        if h2.endswith("்"):
            return h2                   # the checked pulli survives
    if _ta_ends(head, "a_9"):
        return head                     # only the final pulli goes
    return None


def _ta_fix_endings(w: str, found_vetrumai: bool) -> str:
    while True:
        r = _ta_fix_ending(w, found_vetrumai)
        if r is None:
            return w
        w = r


def _ta_remove_vetrumai(w: str) -> tuple[str, bool]:
    if len(w) <= 4:
        return w, False
    new = None
    m = _longest(w, 0, _TA["a_20"])
    if m is not None:
        sfx, act = m
        head = w[:len(w) - len(sfx)]
        if act == 1:
            new = head
        elif act == 2:
            new = head + "்"
        elif act == 3 and not head.endswith("ம"):
            new = head + "்"
        elif act == 4 and len(w) >= 7:
            new = head + "்"
        elif act == 5 and not _ta_ends(head, "a_18"):
            new = head + "்"
        elif act == 6 and not _ta_ends(head, "a_19"):
            new = head
        elif act == 7:
            new = head + "ி"
    if new is None:
        if not w.endswith("ை"):
            return w, False
        head = w[:-1]
        if _ta_ends(head, "a_21"):
            m22 = _longest(head, 0, _TA["a_22"])
            if m22 is None or not head[:len(head)
                                       - len(m22[0])].endswith("்"):
                return w, False
        new = head + "்"
    w = new
    if w.endswith("ின்"):
        w = w[:-3] + "்"
    return _ta_fix_endings(w, True), True


def _ta_remove_tense_suffix(w: str,
                            found_vetrumai: bool) -> tuple[str, bool]:
    if len(w) <= 4:
        return w, False
    found = False
    m = _longest(w, 0, _TA["a_25"])
    if m is not None:
        sfx, act = m
        head = w[:len(w) - len(sfx)]
        if act == 1:
            w, found = head, True
        elif act == 2:
            if not _ta_ends(head, "a_23"):
                w, found = head, True
        elif act == 3:
            if not _ta_ends(head, "a_24"):
                w, found = head, True
        elif act == 4:
            if not head.endswith("ச"):
                w, found = head + "்", True
        elif act == 5:
            w, found = head + "்", True
        elif head.endswith("்"):        # act 6
            w, found = head, True
    m = _longest(w, 0, _TA["a_26"])
    if m is not None:
        w, found = w[:len(w) - len(m[0])], True
    return _ta_fix_endings(w, found_vetrumai), found


def tamil_stem(w: str) -> str:
    found_vetrumai = False
    r = _ta_fix_ending(w, found_vetrumai)
    if r is not None:
        w = r
    if len(w) <= 4:
        return w
    # question / pronoun prefixes: <marker><consonant>் comes off
    if len(w) >= 3 and w[0] == "எ" and w[1] in _TA1_SET and w[2] == "்":
        w = _ta_fix_va_start(w[3:])
    if (len(w) >= 3 and w[0] in _TA10_SET and w[1] in _TA11_SET
            and w[2] == "்"):
        w = _ta_fix_va_start(w[3:])
    # question suffixes
    if len(w) > 4:
        m = _longest(w, 0, _TA["a_14"])
        if m is not None:
            w = w[:len(w) - len(m[0])] + "்"
        w = _ta_fix_endings(w, found_vetrumai)
    # -um
    if len(w) > 4 and w.endswith("ும்"):
        w = w[:-3] + "்"
        r = _ta_fix_ending(w, found_vetrumai)
        if r is not None:
            w = r
    # common word endings
    if len(w) > 4:
        m = _longest(w, 0, _TA["a_17"])
        if m is not None:
            sfx, act = m
            head = w[:len(w) - len(sfx)]
            if act == 1:
                w = _ta_fix_endings(head + "்", found_vetrumai)
            elif act == 2:
                if not _ta_ends(head, "a_16"):
                    w = _ta_fix_endings(head + "்", found_vetrumai)
            else:
                w = _ta_fix_endings(head, found_vetrumai)
    # vetrumai urupukal (case markers); sets the global flag
    w, found_vetrumai = _ta_remove_vetrumai(w)
    # plural (no min-length recheck, TamilStemmer.java:584)
    m = _longest(w, 0, _TA["a_13"])
    if m is not None:
        sfx, act = m
        head = w[:len(w) - len(sfx)]
        if act == 1:
            w = head + ("ுங்" if _ta_ends(head, "a_12") else "்")
        elif act == 2:
            w = head + "ல்"
        elif act == 3:
            w = head + "ள்"
        else:
            w = head
    # command suffixes
    if len(w) > 4:
        m = _longest(w, 0, _TA["a_15"])
        if m is not None:
            w = w[:len(w) - len(m[0])]
    # tense suffixes, repeated until none matches
    found = True
    while found:
        w, found = _ta_remove_tense_suffix(w, found_vetrumai)
    return w


# ---------------------------------------------------------------------------
# Serbian (snowball/ext/SerbianStemmer.java:13)
#
# cyr_to_lat transliterates Cyrillic; prelude folds (C)ije(C)/(C)je(C)
# to e and dj to đ; R1 = after the first vowel (re-marked after a
# leading-vowel or syllabic-r adjustment); B_no_diacritics gates the
# ASCII-variant substitutions.  Step_1 runs without R1; Step_2 (R1,
# else Step_3: R1 delete) follows.  The huge case->replacement maps
# are GENERATED into snowball2_sub_data (re-extraction equality test).

from . import snowball2_sub_data as _sd

_SR_CYR_SUB = {1: "a", 2: "b", 3: "v", 4: "g", 5: "d", 6: "đ",
               7: "e", 8: "ž", 9: "z", 10: "i", 11: "j", 12: "k",
               13: "l", 14: "lj", 15: "m", 16: "n", 17: "nj",
               18: "o", 19: "p", 20: "r", 21: "s", 22: "t",
               23: "ć", 24: "u", 25: "f", 26: "h", 27: "c",
               28: "č", 29: "dž", 30: "š"}
_SR_CYR = {r[0]: _SR_CYR_SUB[r[1]] for r in _d.SERBIAN["a_0"]}
_SR_VOWELS = frozenset("aeiou")
_SR_SA = frozenset("ćčđšž")
_SR_CA = frozenset("bcdfghjklmnprstvzćčđšž")
_SR_STEP1 = _amongs(_d.SERBIAN, "a_1")
_SR_STEP2 = _amongs(_d.SERBIAN, "a_2")
_SR_STEP3 = _amongs(_d.SERBIAN, "a_3")


def _sr_fold_j(w: str, pat: str) -> str:
    i, k = 0, len(pat)
    while i + k + 1 < len(w):
        if (w[i] in _SR_CA and w.startswith(pat, i + 1)
                and w[i + 1 + k] in _SR_CA):
            w = w[:i + 1] + "e" + w[i + 1 + k:]
        else:
            i += 1
    return w


def serbian_stem(w: str) -> str:
    w = "".join(_SR_CYR.get(ch, ch) for ch in w)
    w = _sr_fold_j(w, "ije")
    w = _sr_fold_j(w, "je")
    w = w.replace("dj", "đ")
    n = len(w)
    no_diacritics = not any(ch in _SR_SA for ch in w)
    p1 = n
    i = 0
    while i < n and w[i] not in _SR_VOWELS:
        i += 1
    if i < n:
        p1 = i + 1
        if p1 < 2:
            j = p1
            while j < n and w[j] in _SR_VOWELS:
                j += 1
            if j < n:
                p1 = j + 1
    r_pos = w.find("r")
    if r_pos != -1:
        c = r_pos + 1
        ok = True
        if c < 2:
            j = c
            while j < n and w[j] == "r":
                j += 1
            if j < n:
                c = j + 1
            else:
                ok = False
        if ok and p1 - c > 1:
            p1 = c

    m = _longest(w, 0, _SR_STEP1)
    if m is not None:
        sfx, act = m
        rep, nd = _sd.SERBIAN_STEP1[act]
        if not nd or no_diacritics:
            w = w[:len(w) - len(sfx)] + rep
    done = False
    m = _longest(w, 0, _SR_STEP2)
    if m is not None:
        sfx, act = m
        if len(w) - len(sfx) >= p1:
            rep, nd = _sd.SERBIAN_STEP2[act]
            if not nd or no_diacritics:
                w = w[:len(w) - len(sfx)] + rep
                done = True
    if not done:
        m = _longest(w, 0, _SR_STEP3)
        if m is not None and len(w) - len(m[0]) >= p1:
            w = w[:len(w) - len(m[0])]
    return w


# ---------------------------------------------------------------------------
# Finnish (snowball/ext/FinnishStemmer.java:13)
#
# Standard R1/R2.  The suffix families match INSIDE R1 (or R2 for
# other_endings / the a_9 tail of t_plural); most guards run with the
# limit restored, but the a_6 among CONDITIONS (r_VI / r_LONG on
# den/seen/tten/siin) are evaluated during the restricted match, and a
# failed condition falls back along the among parent chain — for all
# four entries that parent is "n" (act 7).  tidy's first four rules
# are R1-restricted; the final undouble (last non-vowel doubled) is
# unrestricted.

_FI_V1 = frozenset("aeiouyäö")
_FI_V2 = frozenset("aeiouäö")
_FI_AEI = frozenset("aeiä")
_FI_C = frozenset("bcdfghjklmnpqrstvwxz")
_FI_PARTICLE_END = frozenset("aeinotuyäö")
_FI_LONGV = tuple(r[0] for r in _d.FINNISH["a_5"])
_FI_A0 = _amongs(_d.FINNISH, "a_0")
_FI_A1 = _amongs(_d.FINNISH, "a_1")
_FI_A2 = _amongs(_d.FINNISH, "a_2")
_FI_A3 = _amongs(_d.FINNISH, "a_3")
_FI_A4 = _amongs(_d.FINNISH, "a_4")
_FI_A6 = tuple(sorted(_d.FINNISH["a_6"], key=lambda t: -len(t[0])))
_FI_A7 = _amongs(_d.FINNISH, "a_7")
_FI_A8 = _amongs(_d.FINNISH, "a_8")
_FI_A9 = _amongs(_d.FINNISH, "a_9")
_FI_CASE_VOWEL = {1: "a", 2: "e", 3: "i", 4: "o", 5: "ä", 6: "ö"}


def _fi_case_match(w: str, p1: int) -> tuple[int, int] | None:
    n = len(w)
    for row in _FI_A6:
        sfx = row[0]
        start = n - len(sfx)
        if start < p1 or not w.endswith(sfx):
            continue
        if len(row) == 2:
            return start, row[1]
        if row[2] == "r_LONG":
            ok = start - 2 >= p1 and w[start - 2:start] in _FI_LONGV
        else:                           # r_VI: V2 vowel then i
            ok = (start - 2 >= p1 and w[start - 1] == "i"
                  and w[start - 2] in _FI_V2)
        if ok:
            return start, row[1]
        return n - 1, 7                 # parent chain: "n"
    return None


def finnish_stem(w: str) -> str:
    p1, p2 = _std_regions(w, _FI_V1)
    ending_removed = False

    # particle etc.
    m = _longest(w, p1, _FI_A0)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1:
            if start >= 1 and w[start - 1] in _FI_PARTICLE_END:
                w = w[:start]
        elif start >= p2:
            w = w[:start]
    # possessive
    m = _longest(w, p1, _FI_A4)
    if m is not None:
        sfx, act = m
        head = w[:len(w) - len(sfx)]
        if act == 1:
            if not head.endswith("k"):
                w = head
        elif act == 2:
            w = head
            if w.endswith("kse"):
                w = w[:-1] + "i"
        elif act == 3:
            w = head
        elif act == 4:
            if _longest(head, 0, _FI_A1) is not None:
                w = head
        elif act == 5:
            if _longest(head, 0, _FI_A2) is not None:
                w = head
        elif _longest(head, 0, _FI_A3) is not None:
            w = head
    # case ending
    r = _fi_case_match(w, p1)
    if r is not None:
        start, act = r
        head = w[:start]
        delete = False
        if act in _FI_CASE_VOWEL:
            delete = head.endswith(_FI_CASE_VOWEL[act])
        elif act == 7:
            if start >= 2 and (head[-2:] in _FI_LONGV
                               or head[-2:] == "ie"):
                start -= 1
                head = w[:start]
            delete = True
        elif act == 8:
            delete = (len(head) >= 2 and head[-1] in _FI_V1
                      and head[-2] in _FI_C)
        else:                           # unconditioned (-1) entries
            delete = True
        if delete:
            w = head
            ending_removed = True
    # other endings (comparatives), in R2
    m = _longest(w, p2, _FI_A7)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act != 1 or not w[:start].endswith("po"):
            w = w[:start]
    # i_plural when a case ending came off, else t_plural
    if ending_removed:
        m = _longest(w, p1, _FI_A8)
        if m is not None:
            w = w[:-1]
    else:
        if (len(w) >= 2 and w.endswith("t") and len(w) - 2 >= p1
                and w[-2] in _FI_V1):
            w = w[:-1]
            m = _longest(w, p2, _FI_A9)
            if m is not None:
                sfx, act = m
                start = len(w) - len(sfx)
                if act != 1 or not w[:start].endswith("po"):
                    w = w[:start]
    # tidy
    if len(w) - 2 >= p1 and w[-2:] in _FI_LONGV:
        w = w[:-1]
    if (len(w) - 2 >= p1 and w[-1] in _FI_AEI and w[-2] in _FI_C):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith(("oj", "uj")):
        w = w[:-1]
    if len(w) - 2 >= p1 and w.endswith("jo"):
        w = w[:-1]
    q = len(w)
    while q > 0 and w[q - 1] in _FI_V1:
        q -= 1
    if q >= 2 and w[q - 1] in _FI_C and w[q - 2] == w[q - 1]:
        w = w[:q - 1] + w[q:]
    return w


# ---------------------------------------------------------------------------
# Turkish (snowball/ext/TurkishStemmer.java:13)
#
# Unlike the other stemmers this is a backward CURSOR machine: mark_*
# rules move the cursor over composite suffix patterns (vowel-harmony
# check, amongs, optional buffer consonants/vowels) and the stem
# functions slice [cursor, ket).  _Tr mirrors the generated runtime:
# saves are offsets from the END (limit - cursor), so they survive
# slices exactly like the reference's v_n bookkeeping.  stem() =
# two-syllable gate, nominal-verb chain (its lAr alternative stops
# noun stemming AND the postlude), noun-suffix chain with the
# recursive ki chain, then postlude (reserved ad/soyad, append
# harmonized U after final d/g, devoice final b/c/d/ğ).

_TR_VOWEL = frozenset("aeiouöüı")
_TR_U = frozenset("iuüı")
_TR_HARMONY = {"a": frozenset("aouı"), "e": frozenset("eiöü"),
               "ı": frozenset("aı"), "i": frozenset("ei"),
               "o": frozenset("ou"), "u": frozenset("ou"),
               "ö": frozenset("öü"), "ü": frozenset("öü")}
_TR_AM = {k: tuple(sorted((r[0] for r in _d.TURKISH[k]),
                          key=len, reverse=True))
          for k in _d.TURKISH}
_TR_DEVOICE = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


class _Tr:
    __slots__ = ("w", "c", "ket", "bra")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.bra = 0

    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, sv: int) -> None:
        self.c = len(self.w) - sv

    def eq(self, s: str) -> bool:
        k = len(s)
        if self.c - k >= 0 and self.w[self.c - k:self.c] == s:
            self.c -= k
            return True
        return False

    def grp(self, g) -> bool:
        if self.c > 0 and self.w[self.c - 1] in g:
            self.c -= 1
            return True
        return False

    def outgrp(self, g) -> bool:
        if self.c > 0 and self.w[self.c - 1] not in g:
            self.c -= 1
            return True
        return False

    def among(self, key: str) -> bool:
        for sfx in _TR_AM[key]:
            k = len(sfx)
            if self.c - k >= 0 and self.w[self.c - k:self.c] == sfx:
                self.c -= k
                return True
        return False

    def del_(self) -> None:
        self.w = self.w[:self.bra] + self.w[self.ket:]
        self.c = self.bra
        self.ket = self.bra


def _tr_try(t: _Tr, fn) -> bool:
    sv = t.save()
    if fn(t):
        return True
    t.restore(sv)
    return False


def _tr_harmony(t: _Tr) -> bool:
    i = t.c - 1
    while i >= 0 and t.w[i] not in _TR_VOWEL:
        i -= 1
    if i < 0:
        return False
    cls = _TR_HARMONY[t.w[i]]
    j = i - 1
    while j >= 0 and t.w[j] not in cls:
        j -= 1
    return j >= 0


def _tr_opt_cons(t: _Tr, ch: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant: consume ch if a
    vowel precedes it; otherwise require not-ch here and a vowel one
    position further back (pure peek)."""
    sv = t.save()
    if t.eq(ch):
        sv2 = t.save()
        if t.grp(_TR_VOWEL):
            t.restore(sv2)
            return True
        t.restore(sv)
    if t.c > 0 and t.w[t.c - 1] == ch:
        return False
    if t.c <= 0 or t.c - 1 <= 0 or t.w[t.c - 2] not in _TR_VOWEL:
        return False
    return True


def _tr_opt_U(t: _Tr) -> bool:
    sv = t.save()
    if t.grp(_TR_U):
        sv2 = t.save()
        if t.outgrp(_TR_VOWEL):
            t.restore(sv2)
            return True
        t.restore(sv)
    if t.c > 0 and t.w[t.c - 1] in _TR_U:
        return False
    if t.c <= 0 or t.c - 1 <= 0 or t.w[t.c - 2] in _TR_VOWEL:
        return False
    return True


def _m_possessives(t):
    return t.among("a_0") and _tr_opt_U(t)


def _m_sU(t):
    return _tr_harmony(t) and t.grp(_TR_U) and _tr_opt_cons(t, "s")


def _m_lArI(t):
    return t.among("a_1")


def _m_yU(t):
    return _tr_harmony(t) and t.grp(_TR_U) and _tr_opt_cons(t, "y")


def _m_nU(t):
    return _tr_harmony(t) and t.among("a_2")


def _m_nUn(t):
    return (_tr_harmony(t) and t.among("a_3")
            and _tr_opt_cons(t, "n"))


def _m_yA(t):
    return (_tr_harmony(t) and t.among("a_4")
            and _tr_opt_cons(t, "y"))


def _m_nA(t):
    return _tr_harmony(t) and t.among("a_5")


def _m_DA(t):
    return _tr_harmony(t) and t.among("a_6")


def _m_ndA(t):
    return _tr_harmony(t) and t.among("a_7")


def _m_DAn(t):
    return _tr_harmony(t) and t.among("a_8")


def _m_ndAn(t):
    return _tr_harmony(t) and t.among("a_9")


def _m_ylA(t):
    return (_tr_harmony(t) and t.among("a_10")
            and _tr_opt_cons(t, "y"))


def _m_ki(t):
    return t.eq("ki")


def _m_ncA(t):
    return (_tr_harmony(t) and t.among("a_11")
            and _tr_opt_cons(t, "n"))


def _m_yUm(t):
    return (_tr_harmony(t) and t.among("a_12")
            and _tr_opt_cons(t, "y"))


def _m_sUn(t):
    return _tr_harmony(t) and t.among("a_13")


def _m_yUz(t):
    return (_tr_harmony(t) and t.among("a_14")
            and _tr_opt_cons(t, "y"))


def _m_sUnUz(t):
    return t.among("a_15")


def _m_lAr(t):
    return _tr_harmony(t) and t.among("a_16")


def _m_nUz(t):
    return _tr_harmony(t) and t.among("a_17")


def _m_DUr(t):
    return _tr_harmony(t) and t.among("a_18")


def _m_cAsInA(t):
    return t.among("a_19")


def _m_yDU(t):
    return (_tr_harmony(t) and t.among("a_20")
            and _tr_opt_cons(t, "y"))


def _m_ysA(t):
    return t.among("a_21") and _tr_opt_cons(t, "y")


def _m_ymUs(t):
    return (_tr_harmony(t) and t.among("a_22")
            and _tr_opt_cons(t, "y"))


def _m_yken(t):
    return t.eq("ken") and _tr_opt_cons(t, "y")


def _tr_nominal_verb(t: _Tr) -> bool:
    """r_stem_nominal_verb_suffixes (:891).  Returns the
    continue_stemming_noun_suffixes flag (the function's own success
    is ignored by stem())."""
    t.ket = t.c
    sv1 = t.save()
    # alt 1: ymUs_ | yDU | ysA | yken
    if (_tr_try(t, _m_ymUs) or _tr_try(t, _m_yDU)
            or _tr_try(t, _m_ysA) or _tr_try(t, _m_yken)):
        t.bra = t.c
        t.del_()
        return True
    t.restore(sv1)

    # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|)? ymUs_
    def alt2(t):
        if not _m_cAsInA(t):
            return False
        (_tr_try(t, _m_sUnUz) or _tr_try(t, _m_lAr)
         or _tr_try(t, _m_yUm) or _tr_try(t, _m_sUn)
         or _tr_try(t, _m_yUz))
        return _m_ymUs(t)

    if _tr_try(t, alt2):
        t.bra = t.c
        t.del_()
        return True
    t.restore(sv1)

    # alt 3: lAr, delete, optional (DUr|yDU|ysA|ymUs_); stops noun
    # stemming (and thereby the postlude)
    def alt3(t):
        if not _m_lAr(t):
            return False
        t.bra = t.c
        t.del_()
        sv4 = t.save()
        t.ket = t.c
        if not (_tr_try(t, _m_DUr) or _tr_try(t, _m_yDU)
                or _tr_try(t, _m_ysA) or _tr_try(t, _m_ymUs)):
            t.restore(sv4)
        return True

    if _tr_try(t, alt3):
        t.bra = t.c
        t.del_()
        return False                    # continue flag cleared
    t.restore(sv1)

    # alt 4: nUz (yDU | ysA)
    def alt4(t):
        return _m_nUz(t) and (_tr_try(t, _m_yDU)
                              or _m_ysA(t))

    if _tr_try(t, alt4):
        t.bra = t.c
        t.del_()
        return True
    t.restore(sv1)

    # alt 5: (sUnUz|yUz|sUn|yUm), delete, optional ymUs_
    def alt5(t):
        if not (_tr_try(t, _m_sUnUz) or _tr_try(t, _m_yUz)
                or _tr_try(t, _m_sUn) or _tr_try(t, _m_yUm)):
            return False
        t.bra = t.c
        t.del_()
        sv8 = t.save()
        t.ket = t.c
        if not _tr_try(t, _m_ymUs):
            t.restore(sv8)
        return True

    if _tr_try(t, alt5):
        t.bra = t.c
        t.del_()
        return True
    t.restore(sv1)

    # alt 6: DUr, delete, optional ((sUnUz|lAr|yUm|sUn|yUz|) ymUs_)
    if not _m_DUr(t):
        t.restore(sv1)
        return True                     # failed; flag stays true
    t.bra = t.c
    t.del_()
    sv9 = t.save()
    t.ket = t.c

    def tail6(t):
        (_tr_try(t, _m_sUnUz) or _tr_try(t, _m_lAr)
         or _tr_try(t, _m_yUm) or _tr_try(t, _m_sUn)
         or _tr_try(t, _m_yUz))
        return _m_ymUs(t)

    if not _tr_try(t, tail6):
        t.restore(sv9)
    t.bra = t.c
    t.del_()
    return True


def _tr_chain_ki(t: _Tr) -> bool:
    """r_stem_suffix_chain_before_ki (:1170), recursive."""
    t.ket = t.c
    if not _m_ki(t):
        return False
    sv1 = t.save()

    def alt_da(t):
        if not _m_DA(t):
            return False
        t.bra = t.c
        t.del_()
        sv2 = t.save()
        t.ket = t.c

        def da_lar(t):
            if not _m_lAr(t):
                return False
            t.bra = t.c
            t.del_()
            sv4 = t.save()
            if not _tr_chain_ki(t):
                t.restore(sv4)
            return True

        def da_poss(t):
            if not _m_possessives(t):
                return False
            t.bra = t.c
            t.del_()
            sv5 = t.save()
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                t.del_()
                if not _tr_chain_ki(t):
                    t.restore(sv5)
            else:
                t.restore(sv5)
            return True

        if not (_tr_try(t, da_lar) or _tr_try(t, da_poss)):
            t.restore(sv2)
        return True

    if _tr_try(t, alt_da):
        return True
    t.restore(sv1)

    def alt_nun(t):
        if not _m_nUn(t):
            return False
        t.bra = t.c
        t.del_()
        sv6 = t.save()
        t.ket = t.c

        def nun_lari(t):
            if not _m_lArI(t):
                return False
            t.bra = t.c
            t.del_()
            return True

        def nun_poss(t):
            t.ket = t.c
            if not (_tr_try(t, _m_possessives) or _m_sU(t)):
                return False
            t.bra = t.c
            t.del_()
            sv9 = t.save()
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                t.del_()
                if not _tr_chain_ki(t):
                    t.restore(sv9)
            else:
                t.restore(sv9)
            return True

        if not (_tr_try(t, nun_lari) or _tr_try(t, nun_poss)
                or _tr_chain_ki(t)):
            t.restore(sv6)
        return True

    if _tr_try(t, alt_nun):
        return True
    t.restore(sv1)

    if not _m_ndA(t):
        return False

    def nda_lari(t):
        if not _m_lArI(t):
            return False
        t.bra = t.c
        t.del_()
        return True

    def nda_su(t):
        if not _m_sU(t):
            return False
        t.bra = t.c
        t.del_()
        sv11 = t.save()
        t.ket = t.c
        if _m_lAr(t):
            t.bra = t.c
            t.del_()
            if not _tr_chain_ki(t):
                t.restore(sv11)
        else:
            t.restore(sv11)
        return True

    if _tr_try(t, nda_lari) or _tr_try(t, nda_su):
        return True
    return _tr_chain_ki(t)


def _tr_noun_suffixes(t: _Tr) -> None:
    """r_stem_noun_suffixes (:1356): ordered alternatives, each sets
    its own ket and slices."""
    sv1 = t.save()

    def a1(t):
        t.ket = t.c
        if not _m_lAr(t):
            return False
        t.bra = t.c
        t.del_()
        sv2 = t.save()
        if not _tr_chain_ki(t):
            t.restore(sv2)
        return True

    def poss_su_lar2(t):
        """shared tail: (possessives|sU) del (lAr del chain_ki)?"""
        t.ket = t.c
        if not (_tr_try(t, _m_possessives) or _m_sU(t)):
            return False
        t.bra = t.c
        t.del_()
        sv = t.save()
        t.ket = t.c
        if _m_lAr(t):
            t.bra = t.c
            t.del_()
            if not _tr_chain_ki(t):
                t.restore(sv)
        else:
            t.restore(sv)
        return True

    def a2(t):
        t.ket = t.c
        if not _m_ncA(t):
            return False
        t.bra = t.c
        t.del_()
        sv3 = t.save()

        def lari(t):
            t.ket = t.c
            if not _m_lArI(t):
                return False
            t.bra = t.c
            t.del_()
            return True

        def lar(t):
            t.ket = t.c
            if not _m_lAr(t):
                return False
            t.bra = t.c
            t.del_()
            return _tr_chain_ki(t)

        if not (_tr_try(t, lari) or _tr_try(t, poss_su_lar2)
                or _tr_try(t, lar)):
            t.restore(sv3)
        return True

    def a3(t):
        t.ket = t.c
        if not (_tr_try(t, _m_ndA) or _m_nA(t)):
            return False

        def lari(t):
            if not _m_lArI(t):
                return False
            t.bra = t.c
            t.del_()
            return True

        def su(t):
            if not _m_sU(t):
                return False
            t.bra = t.c
            t.del_()
            sv = t.save()
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                t.del_()
                if not _tr_chain_ki(t):
                    t.restore(sv)
            else:
                t.restore(sv)
            return True

        return (_tr_try(t, lari) or _tr_try(t, su)
                or _tr_chain_ki(t))

    def a4(t):
        t.ket = t.c
        if not (_tr_try(t, _m_ndAn) or _m_nU(t)):
            return False

        def su(t):
            if not _m_sU(t):
                return False
            t.bra = t.c
            t.del_()
            sv = t.save()
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                t.del_()
                if not _tr_chain_ki(t):
                    t.restore(sv)
            else:
                t.restore(sv)
            return True

        return _tr_try(t, su) or _m_lArI(t)

    def a5(t):
        t.ket = t.c
        if not _m_DAn(t):
            return False
        t.bra = t.c
        t.del_()
        sv13 = t.save()
        t.ket = t.c

        def poss(t):
            if not _m_possessives(t):
                return False
            t.bra = t.c
            t.del_()
            sv = t.save()
            t.ket = t.c
            if _m_lAr(t):
                t.bra = t.c
                t.del_()
                if not _tr_chain_ki(t):
                    t.restore(sv)
            else:
                t.restore(sv)
            return True

        def lar(t):
            if not _m_lAr(t):
                return False
            t.bra = t.c
            t.del_()
            sv = t.save()
            if not _tr_chain_ki(t):
                t.restore(sv)
            return True

        if not (_tr_try(t, poss) or _tr_try(t, lar)
                or _tr_chain_ki(t)):
            t.restore(sv13)
        return True

    def a6(t):
        t.ket = t.c
        if not (_tr_try(t, _m_nUn) or _m_ylA(t)):
            return False
        t.bra = t.c
        t.del_()
        sv18 = t.save()

        def lar_ki(t):
            t.ket = t.c
            if not _m_lAr(t):
                return False
            t.bra = t.c
            t.del_()
            return _tr_chain_ki(t)

        if not (_tr_try(t, lar_ki) or _tr_try(t, poss_su_lar2)
                or _tr_chain_ki(t)):
            t.restore(sv18)
        return True

    def a7(t):
        t.ket = t.c
        if not _m_lArI(t):
            return False
        t.bra = t.c
        t.del_()
        return True

    def a8(t):
        return _tr_chain_ki(t)

    def a9(t):
        t.ket = t.c
        if not (_tr_try(t, _m_DA) or _tr_try(t, _m_yU)
                or _m_yA(t)):
            return False
        t.bra = t.c
        t.del_()
        sv23 = t.save()
        t.ket = t.c

        def poss_lar(t):
            if not _m_possessives(t):
                return False
            t.bra = t.c
            t.del_()
            sv25 = t.save()
            t.ket = t.c
            if not _m_lAr(t):
                t.restore(sv25)
            return True

        if _tr_try(t, poss_lar) or _m_lAr(t):
            t.bra = t.c
            t.del_()
            t.ket = t.c
            if not _tr_chain_ki(t):
                t.restore(sv23)
        else:
            t.restore(sv23)
        return True

    def a10(t):
        t.ket = t.c
        if not (_tr_try(t, _m_possessives) or _m_sU(t)):
            return False
        t.bra = t.c
        t.del_()
        sv27 = t.save()
        t.ket = t.c
        if _m_lAr(t):
            t.bra = t.c
            t.del_()
            if not _tr_chain_ki(t):
                t.restore(sv27)
        else:
            t.restore(sv27)
        return True

    for alt in (a1, a2, a3, a4, a5, a6, a7, a8, a9, a10):
        if _tr_try(t, alt):
            return
        t.restore(sv1)


def turkish_stem(w: str) -> str:
    if sum(1 for ch in w if ch in _TR_VOWEL) < 2:
        return w
    t = _Tr(w)
    sv = t.save()
    cont = _tr_nominal_verb(t)
    t.restore(sv)
    if not cont:
        return t.w                      # postlude skipped (stem():2078)
    sv = t.save()
    _tr_noun_suffixes(t)
    t.restore(sv)
    # postlude
    if t.w in ("ad", "soyad"):          # r_is_reserved_word
        return t.w
    # append harmonized U after a final d/g
    if t.w.endswith(("d", "g")):
        i = len(t.w) - 2
        while i >= 0 and t.w[i] not in _TR_VOWEL:
            i -= 1
        if i >= 0:
            v = t.w[i]
            if v in "aı":
                t.w += "ı"
            elif v in "ei":
                t.w += "i"
            elif v in "ou":
                t.w += "u"
            elif v in "öü":
                t.w += "ü"
    # devoice the final consonant
    if t.w and t.w[-1] in _TR_DEVOICE:
        t.w = t.w[:-1] + _TR_DEVOICE[t.w[-1]]
    return t.w


SNOWBALL2_STEMMERS = {
    "snowball_armenian": armenian_stem,
    "snowball_irish": irish_stem,
    "snowball_basque": basque_stem,
    "snowball_nepali": nepali_stem,
    "snowball_romanian": romanian_stem,
    "snowball_lithuanian": lithuanian_stem,
    "snowball_catalan": catalan_stem,
    "snowball_hungarian": hungarian_stem,
    "snowball_estonian": estonian_stem,
    "snowball_tamil": tamil_stem,
    "snowball_serbian": serbian_stem,
    "snowball_finnish": finnish_stem,
    "snowball_turkish": turkish_stem,
}
