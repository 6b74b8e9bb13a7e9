"""Heavier per-language stemmers (analysis/common long tail, part 2),
each a faithful port of the published algorithm the reference ships:

- ``lv/LatvianStemmer.java:36`` — light Latvian (Kreslins) with
  un-palatalization; first matching affix fires when the word keeps at
  least one vowel and three characters.
- ``id/IndonesianStemmer.java:30`` — Tala's Bahasa Indonesia stemmer
  (particle → possessive → derivational prefix/suffix flow with
  removed-prefix exclusion flags).
- ``ar/ArabicStemmer.java:33`` — light Arabic: one definite-article /
  conjunction prefix, then every listed suffix in order.
- ``bn/BengaliStemmer.java:31`` — Savoy's light Bengali (suffix groups
  by strip length, longest first; table extracted from the published
  list, see tests/test_stemlang.py).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Latvian

_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True), ("e", 1, False),
    ("ā", 1, False), ("ē", 1, False), ("ī", 1, False),
    ("ū", 1, False), ("o", 1, False), ("s", 0, False),
    ("š", 0, False),
)

_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(stem: str, removed: str) -> str:
    # the char just removed decides the 2nd/5th/6th-declension rules
    if removed == "u":
        if stem.endswith("kš"):
            return stem[:-1] + "st"
        if stem.endswith("ņņ"):
            return stem[:-2] + "nn"
    if stem.endswith(("pj", "bj", "mj", "vj")):
        return stem[:-1]
    for src, dst in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if stem.endswith(src):
            return stem[:-2] + dst
    if stem and stem[-1] in "čļņ":
        return stem[:-1] + {"č": "c", "ļ": "l", "ņ": "n"}[stem[-1]]
    return stem


def latvian_stem(w: str) -> str:
    nv = sum(1 for c in w if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[:-len(affix)]
            return _lv_unpalatalize(stem, w[len(stem)]) if pal else stem
    return w


# --------------------------------------------------------------------------
# Indonesian

_ID_VOWELS = frozenset("aeiou")
_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = (1, 2, 4, 8, 16, 32, 64)


def indonesian_stem(w: str, derivational: bool = True) -> str:
    """Tala's algorithm; ``derivational=False`` is the filter's
    inflectional-only mode (id/IndonesianStemFilter.java:36)."""
    flags = 0
    ns = sum(1 for c in w if c in _ID_VOWELS)

    if ns > 2 and w.endswith(("kah", "lah", "pun")):
        ns -= 1
        w = w[:-3]
    if ns > 2:
        if w.endswith(("ku", "mu")):
            ns -= 1
            w = w[:-2]
        elif w.endswith("nya"):
            ns -= 1
            w = w[:-3]
    if not derivational:
        return w

    def first_order(w, ns, flags):
        if w.startswith("meng"):
            return w[4:], ns - 1, flags | _MENG
        if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], ns - 1, flags | _MENG
        if w.startswith(("men", "mem")):
            return w[3:], ns - 1, flags | _MENG
        if w.startswith("me"):
            return w[2:], ns - 1, flags | _MENG
        if w.startswith("peng"):
            return w[4:], ns - 1, flags | _PENG
        if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
            return "s" + w[4:], ns - 1, flags | _PENG
        if w.startswith("peny"):
            return w[4:], ns - 1, flags | _PENG
        if w.startswith("pen") and len(w) > 3 and w[3] in _ID_VOWELS:
            return "t" + w[3:], ns - 1, flags | _PENG
        if w.startswith(("pen", "pem")):
            return w[3:], ns - 1, flags | _PENG
        if w.startswith("di"):
            return w[2:], ns - 1, flags | _DI
        if w.startswith("ter"):
            return w[3:], ns - 1, flags | _TER
        if w.startswith("ke"):
            return w[2:], ns - 1, flags | _KE
        return w, ns, flags

    def second_order(w, ns, flags):
        if w.startswith("ber"):
            return w[3:], ns - 1, flags | _BER
        if w == "belajar":
            return w[3:], ns - 1, flags | _BER
        if (w.startswith("be") and len(w) > 4
                and w[2] not in _ID_VOWELS and w[3] == "e"
                and w[4] == "r"):
            return w[2:], ns - 1, flags | _BER
        if w.startswith("per"):
            return w[3:], ns - 1, flags
        if w == "pelajar":
            return w[3:], ns - 1, flags
        if w.startswith("pe"):
            return w[2:], ns - 1, flags | _PE
        return w, ns, flags

    def suffix(w, ns, flags):
        if (w.endswith("kan") and not flags & _KE
                and not flags & _PENG and not flags & _PE):
            return w[:-3], ns - 1
        if (w.endswith("an") and not flags & _DI
                and not flags & _MENG and not flags & _TER):
            return w[:-2], ns - 1
        if (w.endswith("i") and not w.endswith("si")
                and not flags & _BER and not flags & _KE
                and not flags & _PENG):
            return w[:-1], ns - 1
        return w, ns

    old = w
    if ns > 2:
        w, ns, flags = first_order(w, ns, flags)
    if w != old:                             # a rule fired
        old = w
        if ns > 2:
            w, ns = suffix(w, ns, flags)
        if w != old:                         # a rule fired
            if ns > 2:
                w, ns, flags = second_order(w, ns, flags)
    else:
        if ns > 2:
            w, ns, flags = second_order(w, ns, flags)
        if ns > 2:
            w, ns = suffix(w, ns, flags)
    return w


# --------------------------------------------------------------------------
# Arabic (light10 family): applied after arabic_normalize (langnorm)

_AR_PREFIXES = ("ال", "وال",
                "بال", "كال",
                "فال", "لل", "و")
_AR_SUFFIXES = ("ها", "ان", "ات",
                "ون", "ين", "يه",
                "ية", "ه", "ة", "ي")


def arabic_stem(w: str) -> str:
    for p in _AR_PREFIXES:
        # waw alone needs >=3 chars left; others need >=2
        need = 4 if len(p) == 1 else len(p) + 2
        if len(w) >= need and w.startswith(p):
            w = w[len(p):]
            break
    for s in _AR_SUFFIXES:
        if len(w) >= len(s) + 2 and w.endswith(s):
            w = w[:-len(s)]
    return w


# --------------------------------------------------------------------------
# Bengali (suffix groups: strip n when any group-n suffix matches and
# more than n+1 characters remain; longest group first)

_BN_GROUPS = (
    (8, ('িয়াছিলাম', 'িতেছিলাম', 'িতেছিলেন', 'ইতেছিলেন', 'িয়াছিলেন',
         'ইয়াছিলেন')),
    (7, ('িতেছিলি', 'িতেছিলে', 'িয়াছিলা', 'িয়াছিলে', 'িতেছিলা',
         'িয়াছিলি', 'য়েদেরকে')),
    (6, ('িতেছিস', 'িতেছেন', 'িয়াছিস', 'িয়াছেন', 'েছিলাম', 'েছিলেন',
         'েদেরকে')),
    (5, ('িতেছি', 'িতেছা', 'িতেছে', 'ছিলাম', 'ছিলেন', 'িয়াছি',
         'িয়াছা', 'িয়াছে', 'েছিলে', 'েছিলা', 'য়েদের', 'দেরকে')),
    (4, ('িলাম', 'িলেন', 'িতাম', 'িতেন', 'িবেন', 'ছিলি', 'ছিলে',
         'ছিলা', 'তেছে', 'িতেছ', 'খানা', 'খানি', 'গুলো', 'গুলি',
         'য়েরা', 'েদের')),
    (3, ('লাম', 'িলি', 'ইলি', 'িলে', 'ইলে', 'লেন', 'িলা', 'ইলা',
         'তাম', 'িতি', 'ইতি', 'িতে', 'ইতে', 'তেন', 'িতা', 'িবা',
         'ইবা', 'িবি', 'ইবি', 'বেন', 'িবে', 'ইবে', 'ছেন', 'য়োন',
         'য়ের', 'েরা', 'দের')),
    (2, ('িস', 'েন', 'লি', 'লে', 'লা', 'তি', 'তে', 'তা', 'বি', 'বে',
         'বা', 'ছি', 'ছা', 'ছে', 'ুন', 'ুক', 'টা', 'টি', 'নি', 'ের',
         'তে', 'রা', 'কে')),
    (1, ('ি', 'ী', 'া', 'ো', 'ে', 'ব', 'ত')),
)


# The reference uses PRECOMPOSED ya-ya (U+09DF); recompose any
# decomposed ya+nukta sequences the source encoding produced above so
# suffix lengths match the published table exactly.
_BN_GROUPS = tuple(
    (n, tuple(s.replace("\u09af\u09bc", "\u09df") for s in sufs))
    for n, sufs in _BN_GROUPS)


def bengali_stem(w: str) -> str:
    for n, sufs in _BN_GROUPS:
        if len(w) > n + 1 and w.endswith(sufs):
            return w[:-n]
    return w


# --------------------------------------------------------------------------
# Persian (fa/PersianStemmer.java:35): ordered suffix strips, each
# requiring >=2 chars to remain; applied after persian_normalize.

_FA_SUFFIXES = ("\u0627\u062a", "\u0627\u0646",
                "\u062a\u0631\u064a\u0646", "\u062a\u0631",
                "\u064a\u064a", "\u064a", "\u0647\u0627",
                "\u200c")


def persian_stem(w: str) -> str:
    for suf in _FA_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[:-len(suf)]
    return w


# --------------------------------------------------------------------------
# Telugu (te/TeluguStemmer.java:27): suffix groups by strip length.

_TE_GROUPS = (
    (4, ("\u0c33\u0c4d\u0c33\u0c41",
         "\u0c21\u0c4d\u0c32\u0c41")),
    (2, ("\u0c21\u0c41", "\u0c2e\u0c41", "\u0c35\u0c41",
         "\u0c32\u0c41", "\u0c28\u0c3f", "\u0c28\u0c41",
         "\u0c1a\u0c47", "\u0c15\u0c48", "\u0c32\u0c4b",
         "\u0c26\u0c3f", "\u0c15\u0c3f", "\u0c38\u0c41",
         "\u0c35\u0c48", "\u0c2a\u0c48")),
    (1, ("\u0c3f", "\u0c40", "\u0c41", "\u0c42", "\u0c46",
         "\u0c47", "\u0c4a", "\u0c4b", "\u0c3e")),
)


def telugu_stem(w: str) -> str:
    for n, sufs in _TE_GROUPS:
        if len(w) > n + 1 and w.endswith(sufs):
            return w[:-n]
    return w


LANG_STEMMERS = {
    "latvian_stem": latvian_stem,
    "indonesian_stem": indonesian_stem,
    "arabic_stem": arabic_stem,
    "bengali_stem": bengali_stem,
    "persian_stem": persian_stem,
    "telugu_stem": telugu_stem,
}
