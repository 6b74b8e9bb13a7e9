"""Snowball English stemmer (Porter2), ported from the reference's
generated program ``org/tartarus/snowball/ext/EnglishStemmer.java``
(the 2021-revision tables: a_0 prefixes arsen/commun/gener, the
Step-1b undoubling guard for a/e/o at word start, exception lists
a_9/a_10). The SnowballFilter role (snowball/SnowballFilter.java:61).

Flow (EnglishStemmer.stem():702-780): whole-word exception1; words
shorter than 3 chars pass through; prelude (leading-apostrophe strip,
consonant-y marking) → mark regions (R1 after arsen/commun/gener if
prefixed) → step 1a → exception2 stop-words → steps 1b, 1c, 2, 3, 4,
5 → postlude (Y→y)."""

from __future__ import annotations

_V = frozenset("aeiouy")
_WXY = frozenset("wxY")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_VALID_LI = frozenset("cdeghkmnrt")

_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXC2 = frozenset(("inning", "outing", "canning", "herring",
                   "earring", "proceed", "exceed", "succeed"))

_STEP2 = (
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"), ("biliti", "ble"),
    ("lessli", "less"), ("tional", "tion"), ("alism", "al"),
    ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("iviti", "ive"), ("ousli", "ous"),
    ("abli", "able"), ("alli", "al"), ("anci", "ance"),
    ("ator", "ate"), ("enci", "ence"), ("izer", "ize"),
    ("bli", "ble"), ("ogi", None), ("li", None),
)
_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
)
_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
          "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
          "al", "er", "ic")


def _has_vowel(s: str) -> bool:
    return any(c in _V for c in s)


def _shortv(w: str, n: int) -> bool:
    """Snowball r_shortv at position n (end of the candidate stem):
    either ...non-vowel vowel non-(vowel|wxY) or the whole stem is
    (non-vowel vowel)."""
    if n >= 3 and w[n - 1] not in _V and w[n - 1] not in _WXY \
            and w[n - 2] in _V and w[n - 3] not in _V:
        return True
    if n == 2 and w[0] in _V and w[1] not in _V:
        return True
    return False


def _mark(w: str) -> tuple[int, int]:
    n = len(w)

    def region_after(i: int) -> int:
        # first non-vowel following a vowel, from i
        j = i
        while j < n and w[j] not in _V:
            j += 1
        while j < n and w[j] in _V:
            j += 1
        if j < n:
            return j + 1
        return n

    p1 = n
    for pre in ("arsen", "commun", "gener"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        p1 = region_after(0)
    p2 = region_after(p1)
    return p1, p2


def porter2_stem(w: str) -> str:
    if w in _EXC1:
        return _EXC1[w]
    if len(w) < 3:
        return w
    y_found = False
    if w[0] == "'":
        w = w[1:]
    # consonant-y marking (scans the MARKED buffer: a y right after a
    # marked Y stays lowercase)
    out: list[str] = []
    for i, c in enumerate(w):
        if c == "y" and (i == 0 or out[i - 1] in _V):
            out.append("Y")
            y_found = True
        else:
            out.append(c)
    w = "".join(out)
    p1, p2 = _mark(w)

    def in_r1(n_stem: int) -> bool:
        return n_stem >= p1

    def in_r2(n_stem: int) -> bool:
        return n_stem >= p2

    # step 0 + 1a
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[:-len(suf)]
            break
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("ss", "us")):
        pass
    elif w.endswith("s"):
        if _has_vowel(w[:-2]):
            w = w[:-1]

    if w in _EXC2:
        return w

    # step 1b
    suf = next((s for s in ("eedly", "ingly", "edly", "eed", "ing",
                            "ed") if w.endswith(s)), None)
    if suf in ("eed", "eedly"):
        if in_r1(len(w) - len(suf)):
            w = w[:-len(suf)] + "ee"
    elif suf is not None:
        stem = w[:-len(suf)]
        if _has_vowel(stem):
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif w.endswith(_DOUBLES):
                # 2021 revision: keep the double when it is preceded
                # by a/e/o at the very start of the word
                if not (len(w) == 3 and w[0] in "aeo"):
                    w = w[:-1]
            elif len(w) == p1 and _shortv(w, len(w)):
                w = w + "e"

    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _V:
        w = w[:-1] + "i"

    # step 2 (longest suffix, must be in R1)
    for suf, rep in sorted(_STEP2, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _VALID_LI:
                        w = w[:-2]
                else:
                    w = w[:-len(suf)] + rep
            break

    # step 3 (longest suffix, in R1; 'ative' also needs R2)
    for suf, rep in sorted(_STEP3, key=lambda x: -len(x[0])):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                if suf == "ative":
                    if in_r2(len(w) - len(suf)):
                        w = w[:-len(suf)]
                else:
                    w = w[:-len(suf)] + rep
            break

    # step 4 (longest suffix, in R2; 'ion' needs preceding s/t)
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            if in_r2(len(w) - len(suf)):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[:-len(suf)]
            break

    # step 5
    if w.endswith("e"):
        n = len(w) - 1
        if in_r2(n) or (in_r1(n) and not _shortv(w, n)):
            w = w[:-1]
    elif w.endswith("l"):
        n = len(w) - 1
        if in_r2(n) and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    if y_found:
        w = w.replace("Y", "y")
    return w
