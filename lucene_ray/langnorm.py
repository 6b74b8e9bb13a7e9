"""Language normalization filters.

Reference semantics (all vocabulary-level, applied per term):

- ``de/GermanNormalizationFilter.java:38`` — the snowball German2
  rewrite: fold ä/ö/ü, expand ß -> ss, and DELETE 'e' when the state
  machine says it belongs to a ue/oe/ae digraph ('U' state after a/o,
  or after a word-initial-ish 'u').
- ``miscellaneous/ScandinavianNormalizer.java:43`` (ALL_FOLDINGS) —
  ä->æ, ö->ø, and the digraph contractions aa/ao->å, ae->æ, oe/oo->ø
  (single left-to-right pass, follower deleted).
- ``miscellaneous/ScandinavianFoldingFilter.java:41`` — å/ä/æ->a,
  ö/ø->o, and digraph followers deleted (a[aeo], o[eo]).
- ``tr/TurkishLowerCaseFilter.java:43`` — Turkish casing: I -> ı
  (dotless) unless followed by combining-dot-above (then i, dot
  consumed); everything else Character.toLowerCase.
- ``el/GreekLowerCaseFilter.java:51`` — lowercase plus tonos/dialytika
  removal and final-sigma standardization (ς -> σ).
- ``ar/ArabicNormalizer.java:60`` — hamza'd alefs -> alef, dotless yeh
  -> yeh, teh marbuta -> heh, tatweel/harakat/shadda/sukun deleted.
- ``fa/PersianNormalizer.java:53`` — farsi yeh / yeh barree -> arabic
  yeh, keheh -> kaf, heh+yeh / heh goal -> heh, hamza above deleted.
- ``hi/HindiNormalizer.java:44`` — the Devanagari orthographic
  normalization (Ljiljana Dolamic and Jacques Savoy's rules): nukta
  forms, chandra vowels, long->short vowels, virama/ZWJ/ZWNJ deletion,
  dead n -> bindu.
- ``ckb/SoraniNormalizer.java:37`` — Kurdish Sorani: yeh forms ->
  farsi yeh, kaf -> keheh, heh variants, initial reh -> rreh, harakat
  deleted, Unicode FORMAT chars deleted.
"""

from __future__ import annotations

import unicodedata


def german_normalize(w: str) -> str:
    out: list[str] = []
    state = 0   # 0=N, 1=U, 2=V
    for c in w:
        if c in "ao":
            out.append(c)
            state = 1
        elif c == "u":
            out.append(c)
            state = 1 if state == 0 else 2
        elif c == "e":
            if state == 1:
                state = 2
                continue        # delete the digraph 'e'
            out.append(c)
            state = 2
        elif c in "iqy":
            out.append(c)
            state = 2
        elif c == "ä":
            out.append("a")
            state = 2
        elif c == "ö":
            out.append("o")
            state = 2
        elif c == "ü":
            out.append("u")
            state = 2
        elif c == "ß":
            out.append("ss")
            state = 0
        else:
            out.append(c)
            state = 0
    return "".join(out)


def scandinavian_normalize(w: str) -> str:
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else "\x00"
        if c == "ä":
            out.append("æ")
        elif c == "Ä":
            out.append("Æ")
        elif c == "ö":
            out.append("ø")
        elif c == "Ö":
            out.append("Ø")
        elif c == "a" and nxt in "aA":
            out.append("å")
            i += 1
        elif c == "A" and nxt in "aA":
            out.append("Å")
            i += 1
        elif c == "a" and nxt in "oO":
            out.append("å")
            i += 1
        elif c == "A" and nxt in "oO":
            out.append("Å")
            i += 1
        elif c == "a" and nxt in "eE":
            out.append("æ")
            i += 1
        elif c == "A" and nxt in "eE":
            out.append("Æ")
            i += 1
        elif c == "o" and nxt in "eEoO":
            out.append("ø")
            i += 1
        elif c == "O" and nxt in "eEoO":
            out.append("Ø")
            i += 1
        else:
            out.append(c)
        i += 1
    return "".join(out)


def norwegian_normalize(w: str) -> str:
    """NorwegianNormalizationFilter (no/NorwegianNormalizationFilter
    .java:33): ScandinavianNormalizer with foldings {AE, OE, AA} only —
    unlike the full filter, 'ao' and 'oo' digraphs do NOT fold
    (ScandinavianNormalizer.java:63-106); ä/ö single-char mappings are
    unconditional."""
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else "\x00"
        if c == "ä":
            out.append("æ")
        elif c == "Ä":
            out.append("Æ")
        elif c == "ö":
            out.append("ø")
        elif c == "Ö":
            out.append("Ø")
        elif c == "a" and nxt in "aA":
            out.append("å")
            i += 1
        elif c == "A" and nxt in "aA":
            out.append("Å")
            i += 1
        elif c == "a" and nxt in "eE":
            out.append("æ")
            i += 1
        elif c == "A" and nxt in "eE":
            out.append("Æ")
            i += 1
        elif c == "o" and nxt in "eE":
            out.append("ø")
            i += 1
        elif c == "O" and nxt in "eE":
            out.append("Ø")
            i += 1
        else:
            out.append(c)
        i += 1
    return "".join(out)


def scandinavian_fold(w: str) -> str:
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else "\x00"
        if c in "åäæ":
            out.append("a")
        elif c in "ÅÄÆ":
            out.append("A")
        elif c in "øö":
            out.append("o")
        elif c in "ØÖ":
            out.append("O")
        elif c in "aA" and nxt in "aAeEoO":
            out.append(c)
            i += 1
        elif c in "oO" and nxt in "eEoO":
            out.append(c)
            i += 1
        else:
            out.append(c)
        i += 1
    return "".join(out)


def turkish_lower(w: str) -> str:
    out: list[str] = []
    i, n = 0, len(w)
    i_or_after = False
    while i < n:
        c = w[i]
        i_or_after = (c == "I"
                      or (i_or_after
                          and unicodedata.category(c) == "Mn"))
        if i_or_after:
            if c == "̇":              # combining dot above: consume
                i += 1
                continue
            if c == "I":
                j = i + 1                   # isBeforeDot: skip other Mn
                while j < n and unicodedata.category(w[j]) == "Mn" \
                        and w[j] != "̇":
                    j += 1
                if j < n and w[j] == "̇":
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                i += 1
                continue
        lc = c.lower()
        out.append(lc if len(lc) == 1 else ("i" if c == "İ" else c))
        i += 1
    return "".join(out)


_GREEK_LOWER = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",
}


def greek_lower(w: str) -> str:
    out: list[str] = []
    for c in w:
        r = _GREEK_LOWER.get(c)
        if r is None:
            lc = c.lower()
            r = lc if len(lc) == 1 else c
        out.append(r)
    return "".join(out)


_AR_MAP = {"آ": "ا", "أ": "ا", "إ": "ا",
           "ى": "ي", "ة": "ه"}
_AR_DELETE = frozenset("ـًٌٍَُِ"
                       "ّْ")


def arabic_normalize(w: str) -> str:
    return "".join(_AR_MAP.get(c, c) for c in w if c not in _AR_DELETE)


_FA_MAP = {"ی": "ي", "ے": "ي", "ک": "ك",
           "ۀ": "ه", "ہ": "ه"}


def persian_normalize(w: str) -> str:
    return "".join(_FA_MAP.get(c, c) for c in w if c != "ٔ")


_HI_MAP = {
    "ँ": "ं",
    "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "क़": "क", "ख़": "ख", "ग़": "ग",
    "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
    "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े",
    "ॉ": "ो", "ॊ": "ो",
    "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ",
    "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ऐ": "ए", "औ": "ओ",
    "ी": "ि", "ू": "ु", "ॄ": "ृ",
    "ॣ": "ॢ", "ै": "े", "ौ": "ो",
}
_HI_DELETE = frozenset("़‍‌्")


def hindi_normalize(w: str) -> str:
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        c = w[i]
        if c == "न" and i + 1 < n and w[i + 1] == "्":
            out.append("ं")            # dead n -> bindu
            i += 2
            continue
        if c in _HI_DELETE:
            i += 1
            continue
        out.append(_HI_MAP.get(c, c))
        i += 1
    return "".join(out)


_CKB_MAP = {"ي": "ی", "ى": "ی",   # yeh -> farsi yeh
            "ك": "ک",                       # kaf -> keheh
            "ة": "ە",                       # teh marbuta -> ae
            "ھ": "ه",                       # doachashmee -> heh
            "ڒ": "ڕ"}                       # rreh above -> rreh
_CKB_DELETE = _AR_DELETE


def sorani_normalize(w: str) -> str:
    out: list[str] = []
    last = len(w) - 1
    for p, c in enumerate(w):
        if c == "‌":                   # ZWNJ: heh before it -> ae
            if out and out[-1] == "ه":
                out[-1] = "ە"
            continue
        if c in _CKB_DELETE or unicodedata.category(c) == "Cf":
            continue
        if c == "ر" and not out:       # reh at (surviving) index 0
            out.append("ڕ")
            continue
        if c == "ه" and p == last:     # heh visited at the final
            out.append("ە")            # position (live len == orig
            continue                   # last only when p is last)
        out.append(_CKB_MAP.get(c, c))
    return "".join(out)


def bengali_normalize(w: str) -> str:
    """BengaliNormalizer (bn/BengaliNormalizer.java:36): chandrabindu
    deletion, long->short kars, khio/ja-phala/ba-phalaa contractions,
    visarga handling, sh/na/ra folds — positional in-place edits ported
    with the reference's exact index rewinds."""
    s = list(w)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c == "\u0981":
            del s[i]
            n -= 1
            i -= 1
        elif c == "\u09c0":
            s[i] = "\u09bf"
        elif c == "\u09c2":
            s[i] = "\u09c1"
        elif c == "\u0995":
            if i + 2 < n and s[i + 1] == "\u09cd" \
                    and s[i + 2] == "\u09bf":
                if i == 0:
                    s[i] = "\u0996"
                    del s[i + 2]
                    del s[i + 1]
                    n -= 2
                else:
                    s[i + 1] = "\u0996"
                    del s[i + 2]
                    n -= 1
        elif c == "\u0999":
            s[i] = "\u0982"
        elif c == "\u09af":
            if i - 2 == 0 and s[i - 1] == "\u09cd":
                s[i - 1] = "\u09c7"
                if i + 1 < n and s[i + 1] == "\u09be":
                    del s[i + 1]
                    n -= 1
                del s[i]
                n -= 1
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == "\u09cd":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 2
        elif c == "\u09ac":
            if i == 0 or s[i - 1] != "\u09cd":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == "\u09cd":
                del s[i]
                del s[i - 1]
                n -= 2
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                n -= 1
                i -= 1
        elif c == "\u0983":
            if i == n - 1:
                if n <= 3:
                    s[i] = "\u09b9"
                else:
                    del s[i]
                    n -= 1
            else:
                s[i] = s[i + 1]
        elif c in ("\u09b6", "\u09b7"):
            s[i] = "\u09b8"
        elif c == "\u09a3":
            s[i] = "\u09a8"
        elif c in ("\u09dc", "\u09dd"):
            s[i] = "\u09b0"
        elif c == "\u09ce":
            s[i] = "\u09a4"
        i += 1
    return "".join(s)


_TE_MAP = {"\u0c00": "\u0c02", "\u0c01": "\u0c02",
           "\u0c14": "\u0c13", "\u0c10": "\u0c0f",
           "\u0c06": "\u0c05", "\u0c08": "\u0c07",
           "\u0c0a": "\u0c09", "\u0c40": "\u0c3f",
           "\u0c42": "\u0c41", "\u0c47": "\u0c46",
           "\u0c4b": "\u0c4a"}


def telugu_normalize(w: str) -> str:
    """TeluguNormalizer (te/TeluguNormalizer.java:37): candrabindu ->
    bindu, visarga/zwj/zwnj deletion, long->short vowels and matras,
    decomposed diphthong recomposition."""
    s = list(w)
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c in ("\u0c03", "\u200d", "\u200c"):
            del s[i]
            n -= 1
            continue
        if c == "\u0c46" and i + 1 < n and s[i + 1] == "\u0c56":
            s[i] = "\u0c48"
            del s[i + 1]
            n -= 1
        elif c == "\u0c12" and i + 1 < n and s[i + 1] == "\u0c55":
            s[i] = "\u0c13"
            del s[i + 1]
            n -= 1
        elif c == "\u0c12" and i + 1 < n and s[i + 1] == "\u0c4c":
            s[i] = "\u0c14"
            del s[i + 1]
            n -= 1
        elif c in _TE_MAP:
            s[i] = _TE_MAP[c]
        i += 1
    return "".join(s)


_RO_TRANS = str.maketrans("\u015e\u015f\u0162\u0163",
                          "\u0218\u0219\u021a\u021b")


def romanian_normalize(w: str) -> str:
    """RomanianNormalizer (ro/RomanianNormalizer.java:41): cedilla
    s/t forms -> comma-below forms."""
    return w.translate(_RO_TRANS)


_SR_ONE = {"а": "a", "б": "b", "в": "v", "г": "g", "д": "d",
           "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i",
           "ј": "j", "к": "k", "л": "l", "м": "m", "н": "n",
           "о": "o", "п": "p", "р": "r", "с": "s", "т": "t",
           "ћ": "c", "ц": "c", "ч": "c", "č": "c", "ć": "c",
           "у": "u", "ф": "f", "х": "h", "ш": "s", "š": "s"}
_SR_TWO = {"ђ": "dj", "đ": "dj", "љ": "lj", "њ": "nj", "џ": "dz"}


def serbian_normalize(w: str) -> str:
    """SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:
    51): Cyrillic and diacritic Latin -> "bald" Latin, with the
    dj/lj/nj/dz digraph expansions."""
    out = []
    for c in w:
        if c in _SR_TWO:
            out.append(_SR_TWO[c])
        else:
            out.append(_SR_ONE.get(c, c))
    return "".join(out)


_GA_UPPER_VOWELS = frozenset("AEIOU\u00c1\u00c9\u00cd\u00d3\u00da")


def irish_lower(w: str) -> str:
    """IrishLowerCaseFilter (ga/IrishLowerCaseFilter.java:37): inserts
    a hyphen between an eclipsis/t-prothesis prefix and an uppercase
    vowel before lowercasing the rest (nAthair -> n-athair)."""
    if len(w) > 1 and w[0] in "nt" and w[1] in _GA_UPPER_VOWELS:
        return w[0] + "-" + w[1:].lower()
    return w.lower()


NORMALIZERS = {
    "german_normalize": german_normalize,
    "scandinavian_normalize": scandinavian_normalize,
    "norwegian_normalize": norwegian_normalize,
    "scandinavian_fold": scandinavian_fold,
    "turkish_lower": turkish_lower,
    "greek_lower": greek_lower,
    "arabic_normalize": arabic_normalize,
    "persian_normalize": persian_normalize,
    "hindi_normalize": hindi_normalize,
    "sorani_normalize": sorani_normalize,
    "bengali_normalize": bengali_normalize,
    "telugu_normalize": telugu_normalize,
    "romanian_normalize": romanian_normalize,
    "serbian_normalize": serbian_normalize,
    "irish_lower": irish_lower,
}
