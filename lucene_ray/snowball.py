"""Snowball stemmers (org.tartarus.snowball.ext) — the default stemmer
family for most of the reference's per-language analyzers.

Each function is a clean-room Python implementation of the PUBLISHED
Snowball algorithm (snowballstem.org), with the suffix tables, letter
groupings, and control flow verified against the reference's generated
programs (cited per stemmer below).  The input is one lowercased token
(vocabulary level — the build applies these via ``tokenize_fn`` /
``TOKEN_FILTERS`` exactly like the Porter chain).

Shared machinery (Snowball semantics, NOT the generated-VM mechanics):

- Regions are character indexes into the ORIGINAL token and stay valid
  because every rule edits only at the current end of the string.
- An "among" is resolved as the longest listed suffix that BOTH matches
  and fits inside the restricting region (``limit_backward`` in the
  reference runtime restricts the match itself, so a longer suffix that
  sticks out of the region loses to a shorter one that fits).
- A failed condition AFTER an among match does not fall back to a
  shorter entry (find_among_b commits to the longest match).
"""

from __future__ import annotations


def _longest(w: str, p: int, table) -> tuple[str, int] | None:
    """Longest suffix of ``w`` from ``table`` (iterable of (suffix,
    action) sorted by length desc) whose start index is >= ``p``."""
    n = len(w)
    for sfx, act in table:
        if n - len(sfx) >= p and w.endswith(sfx):
            return sfx, act
    return None


def _sorted_amongs(pairs) -> tuple:
    return tuple(sorted(pairs, key=lambda t: -len(t[0])))


def _r1_min3(w: str, vowels: frozenset) -> int:
    """Scandinavian mark_regions (DanishStemmer.java:80): p1 = after the
    first non-vowel following a vowel, but never before index 3; a word
    shorter than 3 chars, or with no such pattern, has no region."""
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


def _std_regions(w: str, vowels: frozenset) -> tuple[int, int]:
    """Classic R1/R2 (DutchStemmer.java:163 r_mark_regions without the
    min-3 clamp — callers clamp when their algorithm does)."""
    n = len(w)

    def after_nonvowel_after_vowel(start: int) -> int:
        i = start
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return i + 1 if i < n else n

    p1 = after_nonvowel_after_vowel(0)
    p2 = after_nonvowel_after_vowel(p1) if p1 < n else n
    return p1, p2


# ---------------------------------------------------------------------------
# Danish (snowball/ext/DanishStemmer.java:13)

_DA_VOWELS = frozenset("aeiouyåæø")
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")

_DA_MAIN = _sorted_amongs(
    [(s, 1) for s in (
        "hed ethed ered e erede ende erende ene erne ere en heden eren "
        "er heder erer heds es endes erendes enes ernes eres ens hedens "
        "erens ers ets erets et eret").split()] + [("s", 2)])
_DA_OTHER = _sorted_amongs(
    [("ig", 1), ("lig", 1), ("elig", 1), ("els", 1), ("løst", 2)])


def _da_consonant_pair(w: str, p1: int) -> str:
    # r_consonant_pair: the pair must sit wholly inside R1; the final
    # letter is then dropped with the region restriction lifted.
    if len(w) - 2 >= p1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        return w[:-1]
    return w


def danish_stem(w: str) -> str:
    p1 = _r1_min3(w, _DA_VOWELS)
    m = _longest(w, p1, _DA_MAIN)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = w[:-len(sfx)]
        elif len(w) >= 2 and w[-2] in _DA_S_ENDING:
            w = w[:-1]
    w = _da_consonant_pair(w, p1)
    if w.endswith("igst"):          # unrestricted (r_other_suffix lab0)
        w = w[:-2]
    m = _longest(w, p1, _DA_OTHER)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = _da_consonant_pair(w[:-len(sfx)], p1)
        else:                        # løst -> løs
            w = w[:-1]
    # r_undouble: final consonant in R1 doubled (partner may precede R1)
    if (len(w) - 1 >= p1 and len(w) >= 2 and w[-1] in _DA_CONS
            and w[-2] == w[-1]):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Swedish (snowball/ext/SwedishStemmer.java:13, Snowball 2.2 revision)

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_OST_ENDING = frozenset("iklnprtuv")

_SV_MAIN = _sorted_amongs(
    [(s, 1) for s in (
        "a arna erna heterna orna ad e ade ande arne are aste en anden "
        "aren heten ern ar er heter or as arnas ernas ornas es ades "
        "andes ens arens hetens erns at andet het ast").split()]
    + [("s", 2)])
_SV_OTHER = _sorted_amongs(
    [("ig", 1), ("lig", 1), ("els", 1), ("öst", 2), ("fullt", 3)])


def swedish_stem(w: str) -> str:
    p1 = _r1_min3(w, _SV_VOWELS)
    m = _longest(w, p1, _SV_MAIN)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = w[:-len(sfx)]
        elif len(w) >= 2 and w[-2] in _SV_S_ENDING:
            w = w[:-1]
    if len(w) - 2 >= p1 and w[-2:] in ("dd", "gd", "nn", "dt", "gt",
                                       "kt", "tt"):
        w = w[:-1]
    m = _longest(w, p1, _SV_OTHER)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = w[:-len(sfx)]
        elif act == 2:               # öst -> ös after a valid ending
            if len(w) >= 4 and w[-4] in _SV_OST_ENDING:
                w = w[:-1]
        else:                        # fullt -> full
            w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (snowball/ext/NorwegianStemmer.java:13)

_NO_VOWELS = frozenset("aeiouyåæø")
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")   # k is conditional

_NO_MAIN = _sorted_amongs(
    [(s, 1) for s in (
        "a e ede ande ende ane ene hetene en heten ar er heter as es "
        "edes endes enes hetenes ens hetens ers ets et het ast").split()]
    + [("s", 2), ("erte", 3), ("ert", 3)])
_NO_OTHER = _sorted_amongs(
    [(s, 1) for s in
     "leg eleg ig eig lig elig els lov elov slov hetslov".split()])


def norwegian_stem(w: str) -> str:
    p1 = _r1_min3(w, _NO_VOWELS)
    m = _longest(w, p1, _NO_MAIN)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = w[:-len(sfx)]
        elif act == 2:
            # s after a plain s-ending, or after k preceded by a
            # non-vowel (both checks unrestricted by R1)
            if len(w) >= 2 and (
                    w[-2] in _NO_S_ENDING
                    or (w[-2] == "k" and len(w) >= 3
                        and w[-3] not in _NO_VOWELS)):
                w = w[:-1]
        else:                        # erte / ert -> er
            w = w[:-len(sfx)] + "er"
    if len(w) - 2 >= p1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]
    m = _longest(w, p1, _NO_OTHER)
    if m is not None:
        w = w[:-len(m[0])]
    return w


# ---------------------------------------------------------------------------
# Dutch (snowball/ext/DutchStemmer.java:13)

_NL_VOWELS = frozenset("aeiouyè")
_NL_ACCENT = str.maketrans("áäéëíïóöúü", "aaeeiioouu")

_NL_STEP1 = _sorted_amongs(
    [("heden", 1), ("ene", 2), ("en", 2), ("se", 3), ("s", 3)])
_NL_STEP4 = _sorted_amongs(
    [("end", 1), ("ing", 1), ("ig", 2), ("lijk", 3), ("baar", 4),
     ("bar", 5)])


def _nl_undouble(w: str) -> str:
    if w[-2:] in ("dd", "kk", "tt"):
        return w[:-1]
    return w


def dutch_stem(w: str) -> str:
    # prelude: fold accents, protect y and intervocalic i as Y/I
    w = w.translate(_NL_ACCENT)
    c = list(w)
    if c and c[0] == "y":
        c[0] = "Y"
    for i in range(len(c) - 1):
        if c[i] in _NL_VOWELS:
            if (c[i + 1] == "i" and i + 2 < len(c)
                    and c[i + 2] in _NL_VOWELS):
                c[i + 1] = "I"
            elif c[i + 1] == "y":
                c[i + 1] = "Y"
    w = "".join(c)
    p1, p2 = _std_regions(w, _NL_VOWELS)
    # the reference clamps p1 to >= 3 (DutchStemmer.java:204); when the
    # scan failed p1 = len(w) and the clamp can only shrink an already
    # empty region of a <3-char word — still empty, so clamp always
    p1 = max(p1, 3)

    e_found = False

    def en_ending(word: str, start: int) -> str | None:
        # r_en_ending: R1, preceded by a non-vowel, and not by "gem"
        if (start >= p1 and start >= 1
                and word[start - 1] not in _NL_VOWELS
                and not word[:start].endswith("gem")):
            return _nl_undouble(word[:start])
        return None

    def e_ending(word: str) -> tuple[str, bool]:
        # r_e_ending: final e in R1 after a non-vowel
        n = len(word)
        if (word.endswith("e") and n - 1 >= p1 and n >= 2
                and word[n - 2] not in _NL_VOWELS):
            return _nl_undouble(word[:-1]), True
        return word, False

    # step 1
    m = _longest(w, 0, _NL_STEP1)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1 and start >= p1:
            w = w[:start] + "heid"
        elif act == 2:
            r = en_ending(w, start)
            if r is not None:
                w = r
        elif act == 3 and start >= p1 and start >= 1 \
                and w[start - 1] not in _NL_VOWELS \
                and w[start - 1] != "j":
            w = w[:start]
    # step 2
    w, got = e_ending(w)
    e_found = e_found or got
    # step 3a: heid
    if w.endswith("heid") and len(w) - 4 >= p2 \
            and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            r = en_ending(w, len(w) - 2)
            if r is not None:
                w = r
    # step 3b
    m = _longest(w, 0, _NL_STEP4)
    if m is not None:
        sfx, act = m
        start = len(w) - len(sfx)
        if act == 1 and start >= p2:                  # end / ing
            w = w[:start]
            if (w.endswith("ig") and len(w) - 2 >= p2
                    and (len(w) < 3 or w[-3] != "e")):
                w = w[:-2]
            else:
                w = _nl_undouble(w)
        elif act == 2 and start >= p2 \
                and (start < 1 or w[start - 1] != "e"):   # ig
            w = w[:start]
        elif act == 3 and start >= p2:                # lijk
            w = w[:start]
            w, got = e_ending(w)
            e_found = e_found or got
        elif act == 4 and start >= p2:                # baar
            w = w[:start]
        elif act == 5 and start >= p2 and e_found:    # bar
            w = w[:start]
    # step 4: undouble vowel  CVvvC -> CvC (aa/ee/oo/uu)
    if (len(w) >= 4 and w[-1] not in _NL_VOWELS and w[-1] != "I"
            and w[-2] == w[-3] and w[-2] in "aeou"
            and w[-4] not in _NL_VOWELS):
        w = w[:-2] + w[-1]
    # postlude
    return w.replace("I", "i").replace("Y", "y")


# ---------------------------------------------------------------------------
# Russian (snowball/ext/RussianStemmer.java:13)

_RU_VOWELS = frozenset("аеиоуыэюя")

_RU_PERF_GERUND = _sorted_amongs(
    [("в", 1), ("вши", 1), ("вшись", 1),
     ("ив", 2), ("ыв", 2), ("ивши", 2), ("ывши", 2),
     ("ившись", 2), ("ывшись", 2)])
_RU_ADJECTIVE = _sorted_amongs(
    [(s, 1) for s in ("ее ие ое ые ими ыми ей ий ой ый ем им ом ым "
                      "его ого ему ому их ых ею ою ую юю ая яя").split()])
_RU_PARTICIPLE = _sorted_amongs(
    [("ем", 1), ("нн", 1), ("вш", 1), ("щ", 1), ("ющ", 1),
     ("ивш", 2), ("ывш", 2), ("ующ", 2)])
_RU_VERB = _sorted_amongs(
    [(s, 1) for s in ("ла на ете йте ли й л ем н ло но ет ют ны ть "
                      "ешь нно").split()]
    + [(s, 2) for s in ("ила ыла ена ите ейте уйте или ыли ей уй ил "
                        "ыл им ым ен ило ыло ено ует уют ит ыт ят "
                        "ены ить ыть ишь ю ую").split()])
_RU_REFLEXIVE = _sorted_amongs([("сь", 1), ("ся", 1)])
_RU_DERIVATIONAL = _sorted_amongs([("ост", 1), ("ость", 1)])
_RU_TIDY = _sorted_amongs(
    [("ейше", 1), ("ейш", 1), ("н", 2), ("ь", 3)])
_RU_NOUN = _sorted_amongs(
    [(s, 1) for s in ("а ев ов е ие ье и еи ии ами ями иями й ей ией "
                      "ий ой ам ем ием ом ям иям о у ах ях иях ы ь ю "
                      "ию ью я ия ья").split()])


def russian_stem(w: str) -> str:
    w = w.replace("ё", "е")
    n = len(w)
    # RV = after the first vowel; R2 per the standard definition
    i = 0
    while i < n and w[i] not in _RU_VOWELS:
        i += 1
    pv = i + 1 if i < n else n
    p2 = _std_regions(w, _RU_VOWELS)[1]

    def prec_a_ja(word: str, start: int) -> bool:
        # group-1 suffixes fire only after а/я, itself inside RV
        return start - 1 >= pv and word[start - 1] in "ая"

    # step 1
    m = _longest(w, pv, _RU_PERF_GERUND)
    done = False
    if m is not None:
        sfx, act = m
        if act == 2 or prec_a_ja(w, len(w) - len(sfx)):
            w = w[:-len(sfx)]
            done = True
    if not done:
        m = _longest(w, pv, _RU_REFLEXIVE)
        if m is not None:
            w = w[:-len(m[0])]
        handled = False
        m = _longest(w, pv, _RU_ADJECTIVE)
        if m is not None:
            w = w[:-len(m[0])]
            handled = True
            m = _longest(w, pv, _RU_PARTICIPLE)
            if m is not None:
                sfx, act = m
                if act == 2 or prec_a_ja(w, len(w) - len(sfx)):
                    w = w[:-len(sfx)]
        if not handled:
            m = _longest(w, pv, _RU_VERB)
            if m is not None:
                sfx, act = m
                if act == 2 or prec_a_ja(w, len(w) - len(sfx)):
                    w = w[:-len(sfx)]
                    handled = True
        if not handled:
            m = _longest(w, pv, _RU_NOUN)
            if m is not None:
                w = w[:-len(m[0])]
    # step 2
    if w.endswith("и") and len(w) - 1 >= pv:
        w = w[:-1]
    # step 3: derivational — must fit in RV and start inside R2
    m = _longest(w, max(pv, p2), _RU_DERIVATIONAL)
    if m is not None:
        w = w[:-len(m[0])]
    # step 4: tidy up
    m = _longest(w, pv, _RU_TIDY)
    if m is not None:
        sfx, act = m
        if act == 1:
            w = w[:-len(sfx)]
            if w.endswith("нн") and len(w) - 2 >= pv:
                w = w[:-1]
        elif act == 2:
            if len(w) >= 2 and w[-2] == "н" and len(w) - 2 >= pv:
                w = w[:-1]
        else:
            w = w[:-1]
    return w


SNOWBALL_STEMMERS = {
    "snowball_danish": danish_stem,
    "snowball_swedish": swedish_stem,
    "snowball_norwegian": norwegian_stem,
    "snowball_dutch": dutch_stem,
    "snowball_russian": russian_stem,
}
