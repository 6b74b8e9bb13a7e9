"""English analysis chain — the EnglishAnalyzer role.

Reproduces the reference chain (analysis/common/.../en/EnglishAnalyzer.java:102-109):
StandardTokenizer -> EnglishPossessiveFilter -> LowerCaseFilter ->
StopFilter(ENGLISH_STOP_WORDS_SET) -> PorterStemFilter.  The tokenizer and
lowercasing already live in ``lucene_ray.analysis``; this module supplies the
rest as a TOKEN FILTER: a function mapping a list of (lowercased) tokens to
a same-length list where each element is the filtered term or ``None`` for a
dropped (stop) token.  Position numbering is preserved by the caller, so
stop removal leaves position gaps exactly like Lucene's StopFilter
(positionIncrement bookkeeping, analysis/core/StopFilter.java role).

The filter memoizes per UNIQUE surface form, so applying it to a
dictionary-encoded vocabulary (or a long token stream with Zipfian repeats)
costs one dict hit per token and one stem per new vocab entry — the
per-actor "compile once" pattern.

Porter stemming follows the reference implementation semantics
(analysis/common/.../en/PorterStemmer.java:222-492): the Porter 1980
algorithm at Release 3 with both published bug fixes (the k==k0 guards in
steps 3/5 and the j>=0 guard on "ion") and the "logi"->"log" rule.  This is
an independent transcription of the published algorithm
(https://tartarus.org/martin/PorterStemmer/), not a code port.
"""

from __future__ import annotations

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (EnglishAnalyzer.java:45-53) —
# the classic 33-word English stop list.
ENGLISH_STOP_WORDS = frozenset([
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
])

_VOWELS = frozenset("aeiou")
_POSSESSIVE_MARKS = ("'", "’", "＇")  # ' / ' / fullwidth '


def strip_possessive(word: str) -> str:
    """EnglishPossessiveFilter.java:34-49: drop a trailing
    <apostrophe-variant>s (input here is already lowercased)."""
    if len(word) >= 2 and word[-1] == "s" and word[-2] in _POSSESSIVE_MARKS:
        return word[:-2]
    return word


def porter_stem(word: str) -> str:
    """Porter stemmer (Porter 1980; PorterStemmer.java:222-492 semantics).

    Operates on an already-lowercased token.  Words of length <= 2 are
    returned unchanged (the ``k > k0 + 1`` guard, PorterStemmer.java:543).
    Non-ASCII letters are treated as consonants, matching the reference's
    default switch branch (PorterStemmer.java:110-123).
    """
    if len(word) <= 2:
        return word
    b = list(word)
    k = len(b) - 1
    j = 0

    def cons(i: int) -> bool:
        c = b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not cons(i - 1)
        return True

    def m() -> int:
        # number of consonant sequences in b[0..j]
        n = 0
        i = 0
        while True:
            if i > j:
                return n
            if not cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not cons(i):
                    break
                i += 1
            i += 1

    def vowelinstem() -> bool:
        return any(not cons(i) for i in range(j + 1))

    def doublec(at: int) -> bool:
        if at < 1 or b[at] != b[at - 1]:
            return False
        return cons(at)

    def cvc(i: int) -> bool:
        # consonant-vowel-consonant ending, second c not w/x/y
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in ("w", "x", "y")

    def ends(s: str) -> bool:
        nonlocal j
        o = k - len(s) + 1
        if o < 0:
            return False
        for i, ch in enumerate(s):
            if b[o + i] != ch:
                return False
        j = k - len(s)
        return True

    def setto(s: str) -> None:
        nonlocal k
        o = j + 1
        for i, ch in enumerate(s):
            p = o + i
            if p < len(b):
                b[p] = ch
            else:
                b.append(ch)
        k = j + len(s)

    def r(s: str) -> None:
        if m() > 0:
            setto(s)

    # step 1: plurals and -ed/-ing
    if b[k] == "s":
        if ends("sses"):
            k -= 2
        elif ends("ies"):
            setto("i")
        elif b[k - 1] != "s":
            k -= 1
    if ends("eed"):
        if m() > 0:
            k -= 1
    elif (ends("ed") or ends("ing")) and vowelinstem():
        k = j
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(k):
            ch = b[k]
            k -= 1
            if ch in ("l", "s", "z"):
                k += 1
        elif m() == 1 and cvc(k):
            setto("e")

    # step 2: terminal y -> i when the stem has a vowel
    if ends("y") and vowelinstem():
        b[k] = "i"

    # step 3: double suffixes -> single (condition m() > 0), keyed on b[k-1]
    if k > 0:
        c = b[k - 1]
        if c == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c == "e":
            if ends("izer"):
                r("ize")
        elif c == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c == "g":
            if ends("logi"):
                r("log")

    # step 4: -ic-, -full, -ness etc.
    c = b[k]
    if c == "e":
        if ends("icate"):
            r("ic")
        elif ends("ative"):
            r("")
        elif ends("alize"):
            r("al")
    elif c == "i":
        if ends("iciti"):
            r("ic")
    elif c == "l":
        if ends("ical"):
            r("ic")
        elif ends("ful"):
            r("")
    elif c == "s":
        if ends("ness"):
            r("")

    # step 5: -ant, -ence etc. in context <c>vcvc<v> (condition m() > 1)
    if k > 0:
        c = b[k - 1]
        matched = False
        if c == "a":
            matched = ends("al")
        elif c == "c":
            matched = ends("ance") or ends("ence")
        elif c == "e":
            matched = ends("er")
        elif c == "i":
            matched = ends("ic")
        elif c == "l":
            matched = ends("able") or ends("ible")
        elif c == "n":
            matched = (ends("ant") or ends("ement") or ends("ment")
                       or ends("ent"))
        elif c == "o":
            matched = ((ends("ion") and j >= 0 and b[j] in ("s", "t"))
                       or ends("ou"))
        elif c == "s":
            matched = ends("ism")
        elif c == "t":
            matched = ends("ate") or ends("iti")
        elif c == "u":
            matched = ends("ous")
        elif c == "v":
            matched = ends("ive")
        elif c == "z":
            matched = ends("ize")
        if matched and m() > 1:
            k = j

    # step 6: final -e / -ll cleanup (m() measured against the entry k)
    j = k
    if b[k] == "e":
        a = m()
        if a > 1 or (a == 1 and not cvc(k - 1)):
            k -= 1
    if b[k] == "l" and doublec(k) and m() > 1:
        k -= 1

    return "".join(b[: k + 1])


_MISSING = object()
_english_memo: dict[str, str | None] = {}


def english_token_filter(tokens: list[str]) -> list[str | None]:
    """possessive-strip -> stop-drop -> Porter stem for each token;
    ``None`` marks a dropped stop word.  Memoized per surface form."""
    memo = _english_memo
    out: list[str | None] = []
    for t in tokens:
        res = memo.get(t, _MISSING)
        if res is _MISSING:
            w = strip_possessive(t)
            res = None if w in ENGLISH_STOP_WORDS else porter_stem(w)
            memo[t] = res
        out.append(res)
    return out


# ASCIIFoldingFilter role (analysis/miscellaneous/ASCIIFoldingFilter.java):
# fold accented Latin to ASCII.  NFKD + combining-mark strip covers the
# diacritic block; the table below adds the non-decomposable cases the
# reference folds explicitly.
def ascii_fold(text: str) -> str:
    """ASCIIFoldingFilter (miscellaneous/ASCIIFoldingFilter.java:187):
    the EXACT generated 1242-entry table (accents, ligatures, small
    capitals, circled/fullwidth forms, folded punctuation); unmapped
    non-ASCII chars pass through unchanged, as the reference's default
    branch does."""
    if text.isascii():
        return text
    from .asciifold_data import ASCII_FOLD_MAP
    get = ASCII_FOLD_MAP.get
    return "".join(get(ch, ch) for ch in text)


_fold_memo: dict[str, str | None] = {}


def fold_token_filter(tokens: list[str]) -> list[str | None]:
    """ASCIIFoldingFilter as a chain entry (no stop/stem)."""
    memo = _fold_memo
    out: list[str | None] = []
    for t in tokens:
        res = memo.get(t, _MISSING)
        if res is _MISSING:
            res = ascii_fold(t)
            memo[t] = res
        out.append(res)
    return out


# KeepWordFilter (miscellaneous/KeepWordFilter.java:28): the inverse of
# a stop filter — only words in the keep set survive. The set is a ctor
# arg in the reference; this registered instance keeps the common
# source-code keywords of the corpus.
KEEP_WORDS = frozenset({
    "join", "hash", "row", "batch", "scan", "filter", "merge", "order",
    "data", "table", "key", "stream", "window", "sort", "query", "group"})


def keep_word_filter(tokens: list[str]) -> list[str | None]:
    return [t if t in KEEP_WORDS else None for t in tokens]


def decimal_digit_filter(tokens: list[str]) -> list[str | None]:
    """DecimalDigitFilter (core/DecimalDigitFilter.java:31): any
    non-Latin decimal digit (Character.isDigit above 0x7F) folds to its
    0-9 equivalent via its numeric value."""
    import unicodedata
    out: list[str | None] = []
    for t in tokens:
        if t.isascii():
            out.append(t)
            continue
        out.append("".join(
            chr(0x30 + unicodedata.digit(c))
            if ord(c) > 0x7F and unicodedata.category(c) == "Nd" else c
            for c in t))
    return out


def apostrophe_token_filter(tokens: list[str]) -> list[str | None]:
    """ApostropheFilter (tr/ApostropheFilter.java:33): truncate at the
    first apostrophe (' or U+2019) — Turkish suffix stripping
    (Türkiye'den -> Türkiye)."""
    out: list[str | None] = []
    for t in tokens:
        i = min((j for j in (t.find("'"), t.find("’")) if j >= 0),
                default=-1)
        out.append(t[:i] if i > 0 else (t if i < 0 else None))
    return out


# ElisionFilter with FrenchAnalyzer.DEFAULT_ARTICLES
# (util/ElisionFilter.java:33, fr/FrenchAnalyzer.java:56)
FRENCH_ARTICLES = ("l", "m", "t", "qu", "n", "s", "j", "d", "c",
                   "jusqu", "quoiqu", "lorsqu", "puisqu")
_ARTICLE_SET = frozenset(FRENCH_ARTICLES)


def elision_filter(tokens: list[str]) -> list[str | None]:
    """Strip a leading article + apostrophe: the prefix before the
    FIRST apostrophe is removed iff it is in the article set
    (case-insensitive in the reference; the vocabulary here is already
    lowercased by the standard chain)."""
    out: list[str | None] = []
    for t in tokens:
        i = t.find("'")
        j = t.find("’")
        if j >= 0 and (i < 0 or j < i):
            i = j
        if i >= 0 and t[:i] in _ARTICLE_SET:
            t = t[i + 1:]
        out.append(t if t else None)
    return out


def capitalization_filter(tokens: list[str]) -> list[str | None]:
    """CapitalizationFilter defaults (miscellaneous/
    CapitalizationFilter.java:56: onlyFirstWord=true,
    forceFirstLetter=true): sub-words split at chars <= ' ' or '.';
    the first sub-word gets Upper(first char) + lower(rest), later
    sub-words are lowercased entirely (simple per-char mappings)."""
    def up1(c: str) -> str:
        u = c.upper()
        return u if len(u) == 1 else c

    out: list[str | None] = []
    for t in tokens:
        parts: list[str] = []
        word_count = 0
        start = 0
        for i in range(len(t) + 1):
            boundary = i == len(t) or t[i] <= " " or t[i] == "."
            if not boundary:
                continue
            if i > start:
                w = t[start:i]
                if word_count == 0:
                    parts.append(up1(w[0]) + w[1:].lower())
                else:
                    parts.append(w.lower())
                word_count += 1
            if i < len(t):
                parts.append(t[i])
            start = i + 1
        out.append("".join(parts))
    return out


def stop_en_token_filter(tokens: list[str]) -> list[str | None]:
    """StopFilter(ENGLISH_STOP_WORDS_SET) alone — the stop step of
    StopAnalyzer (core/StopAnalyzer.java) and ClassicAnalyzer
    (classic/ClassicAnalyzer.java:42); no stemming."""
    return [None if t in ENGLISH_STOP_WORDS else t for t in tokens]


_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3,
    0x30E5, 0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8,
    0x30AA, 0x30AB, 0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7,
    0x30B9, 0x30BB, 0x30BD, 0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8,
    0x30CA, 0x30CB, 0x30CC, 0x30CD, 0x30CE, 0x30CF, 0x30D2, 0x30D5,
    0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0, 0x30E1, 0x30E2, 0x30E4,
    0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC, 0x30ED, 0x30EF,
    0x30F3, 0x3099, 0x309A]
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0,
    1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0,
    2, 0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]


def cjk_width_one(term: str) -> str:
    """CJKWidthFilter (analysis/cjk/CJKWidthFilter.java:36): fullwidth
    ASCII variants fold to basic latin; halfwidth katakana folds to
    kana, with FF9E/FF9F voice marks combined into the preceding kana
    when a composed form exists (KANA_COMBINE tables; otherwise they
    map to the combining marks 3099/309A)."""
    text = list(term)
    i = 0
    while i < len(text):
        ch = ord(text[i])
        if 0xFF01 <= ch <= 0xFF5E:
            text[i] = chr(ch - 0xFEE0)
        elif 0xFF65 <= ch <= 0xFF9F:
            if ch in (0xFF9E, 0xFF9F) and i > 0:
                prev = ord(text[i - 1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_COMBINE_HALF_VOICED if ch == 0xFF9F
                         else _KANA_COMBINE_VOICED)[prev - 0x30A6]
                    if d:
                        text[i - 1] = chr(prev + d)
                        del text[i]
                        continue
            text[i] = chr(_KANA_NORM[ch - 0xFF65])
        i += 1
    return "".join(text)


def upper_case_filter(tokens: "list[str]") -> "list[str]":
    """UpperCaseFilter (core/UpperCaseFilter.java:33)."""
    return [t.upper() for t in tokens]


def cjk_width_filter(tokens: "list[str]") -> "list[str]":
    return [cjk_width_one(t) for t in tokens]


def kstem_token_filter(tokens: "list[str]") -> "list[str]":
    from .kstem import kstem
    return [kstem(t) for t in tokens]


TOKEN_FILTERS = {
    "english": english_token_filter,
    "kstem": kstem_token_filter,
    "cjk_width": cjk_width_filter,
    "upper": upper_case_filter,
    "fold": fold_token_filter,
    # tokenizer-replacing analyzers whose chain includes the English
    # stop step (the tokenizer itself lives in lucene_ray.tokenizers)
    "classic": stop_en_token_filter,
    "stop_en": stop_en_token_filter,
    "classic_alpha": stop_en_token_filter,
    "keep_word": keep_word_filter,
    "decimal_digit": decimal_digit_filter,
    "apostrophe": apostrophe_token_filter,
    "elision": elision_filter,
    "capitalization": capitalization_filter,
}


def protected_filter(stem_fn, protected: frozenset):
    """SetKeywordMarkerFilter + stemmer composition
    (miscellaneous/SetKeywordMarkerFilter.java:28 and the stemmers'
    KeywordAttribute check): tokens in the protected set bypass the
    stemmer. The SnowballPorterFilterFactory "protected" resource
    mechanism (snowball/SnowballPorterFilterFactory.java:61)."""
    def fn(w: str) -> str:
        return w if w in protected else stem_fn(w)
    return fn


def override_filter(stem_fn, overrides: dict):
    """StemmerOverrideFilter + stemmer composition (miscellaneous/
    StemmerOverrideFilter.java:42): mapped tokens take the forced stem
    and are keyword-marked so the downstream stemmer skips them."""
    def fn(w: str) -> str:
        o = overrides.get(w)
        return o if o is not None else stem_fn(w)
    return fn


def trim_filter(w: str) -> str:
    """TrimFilter (miscellaneous/TrimFilter.java:27): strips leading/
    trailing whitespace (<= 0x20, Java String.trim) — pairs with the
    keyword tokenizer."""
    n = len(w)
    a = 0
    while a < n and w[a] <= " ":
        a += 1
    b = n
    while b > a and w[b - 1] <= " ":
        b -= 1
    return w[a:b]



def _register_light_stemmers() -> None:
    # Savoy light stemmers (lucene_ray.lightstem), vocabulary-level like
    # the Porter chain; validated against the reference's ~200k-pair
    # vocabulary files in tests/test_lightstem.py.
    from .lightstem import LIGHT_STEMMERS, _as_token_filter
    for name, fn in LIGHT_STEMMERS.items():
        TOKEN_FILTERS[name] = _as_token_filter(fn)
    # language normalizers (lucene_ray.langnorm), reference-test-golden
    # gated in tests/test_langnorm.py
    from .langnorm import NORMALIZERS
    for name, fn in NORMALIZERS.items():
        TOKEN_FILTERS[name] = _as_token_filter(fn)
    # minimal / misc stemmers (lucene_ray.stemmisc), vocabulary + golden
    # gated in tests/test_stemmisc.py
    from .stemmisc import MISC_STEMMERS
    for name, fn in MISC_STEMMERS.items():
        TOKEN_FILTERS[name] = _as_token_filter(fn)
    # full RSLP/RSLG + Spanish plural (lucene_ray.rslp), gated on the
    # 32k/9.4k/28k-pair reference vocabulary zips in tests/test_rslp.py
    from .rslp import RSLP_STEMMERS
    for name, fn in RSLP_STEMMERS.items():
        TOKEN_FILTERS[name] = _as_token_filter(fn)
    # Latvian/Indonesian/Arabic/Bengali (lucene_ray.stemlang),
    # reference-test-golden gated in tests/test_stemlang.py
    from .stemlang import LANG_STEMMERS
    for name, fn in LANG_STEMMERS.items():
        TOKEN_FILTERS[name] = _as_token_filter(fn)
    # Greek (lucene_ray.greekstem): 'greek_stem' expects folded input;
    # 'greek' is the GreekAnalyzer chain (greek_lower → stem), 343
    # reference goldens in tests/test_greekstem.py
    from .greekstem import greek_stem
    from .langnorm import greek_lower
    TOKEN_FILTERS["greek_stem"] = _as_token_filter(greek_stem)
    TOKEN_FILTERS["greek"] = _as_token_filter(
        lambda w: greek_stem(greek_lower(w)))
    # Brazilian Portuguese (lucene_ray.brstem), golden-gated in
    # tests/test_brstem.py
    from .brstem import brazilian_stem
    TOKEN_FILTERS["brazilian_stem"] = _as_token_filter(brazilian_stem)
    # Snowball English / Porter2 (lucene_ray.porter2), branch-pinned
    # in tests/test_porter2.py
    from .porter2 import porter2_stem
    TOKEN_FILTERS["porter2"] = _as_token_filter(porter2_stem)
    TOKEN_FILTERS["trim"] = _as_token_filter(trim_filter)
    # German medium stemmer (lucene_ray.destem), data.txt-gated in
    # tests/test_destem.py
    from .destem import german_stem
    TOKEN_FILTERS["german_stem"] = _as_token_filter(german_stem)
    # Snowball stemmer family (lucene_ray.snowball) — the default
    # stemmers of the per-language analyzers (e.g. da/DanishAnalyzer
    # .java:41 stop -> SnowballFilter).  '<lang>' names compose the
    # analyzer chain: snowball stop list (snowball_stop_data,
    # generated from the reference resources) then the stemmer.
    from .snowball import SNOWBALL_STEMMERS
    from . import snowball_stop_data as _sbstops
    from .snowball2 import SNOWBALL2_STEMMERS
    from . import snowball2_stop_data as _sbstops2
    for _stemmers, _stops in ((SNOWBALL_STEMMERS, _sbstops),
                              (SNOWBALL2_STEMMERS, _sbstops2)):
        for _name, _fn in _stemmers.items():
            TOKEN_FILTERS[_name] = _as_token_filter(_fn)
            _lang = _name.removeprefix("snowball_")
            _stop = getattr(_stops, _lang.upper() + "_STOP", None)
            if _stop is not None:
                TOKEN_FILTERS[_lang] = _as_token_filter(
                    lambda w, _s=_stop, _f=_fn: None if w in _s else _f(w))
    # sr/SerbianAnalyzer.java:133 runs SerbianNormalizationFilter AFTER
    # the stemmer; the 'serbian' chain mirrors that order
    from .langnorm import serbian_normalize
    from .snowball2 import serbian_stem
    _sr_stop = _sbstops2.SERBIAN_STOP
    TOKEN_FILTERS["serbian"] = _as_token_filter(
        lambda w: None if w in _sr_stop
        else serbian_normalize(serbian_stem(w)))


_register_light_stemmers()


def get_token_filter(name: str | None):
    """Analyzer name (manifest ``analyzer`` param) -> token filter or None
    for the plain StandardAnalyzer chain."""
    if not name or name == "standard":
        return None
    from .analysis import STREAM_FILTERS
    if name in STREAM_FILTERS:      # stream-level chain (cjk bigrams):
        return None                 # no vocabulary-level filter
    f = TOKEN_FILTERS.get(name)
    if f is not None:
        return f
    from .charfilter import CHAR_FILTERS
    from .tokenizers import TOKENIZER_ANALYZERS
    if name in TOKENIZER_ANALYZERS:  # tokenizer-only analyzer (whitespace,
        return None                  # keyword, simple, path_hierarchy, …)
    if name in CHAR_FILTERS:         # char-filter chain (html_strip, …)
        return None
    known = [*TOKEN_FILTERS, *STREAM_FILTERS, *TOKENIZER_ANALYZERS,
             *CHAR_FILTERS]
    raise ValueError(
        f"unknown analyzer {name!r}; known: standard, {', '.join(known)}")
