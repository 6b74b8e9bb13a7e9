"""Alternative tokenizers: the CharTokenizer family, PathHierarchy, and
the classic (pre-3.1 standard) grammar.

Reference semantics:

- ``analysis/util/CharTokenizer.java:44`` — runs of token chars; a token
  is emitted (chopped) once its UTF-16 length reaches ``maxTokenLen``
  (default 255) and scanning continues with the next char starting a new
  token, so a 256-char run yields a 255-char token plus a 1-char token.
- ``analysis/core/WhitespaceTokenizer.java:72`` — token char =
  ``!Character.isWhitespace`` (Java whitespace: Zs/Zl/Zp EXCEPT the
  non-breaking spaces U+00A0/U+2007/U+202F, plus TAB..CR and the
  FS/GS/RS/US controls 0x1C-0x1F).
- ``analysis/core/UnicodeWhitespaceTokenizer.java:60`` — token char =
  NOT Unicode ``White_Space`` (which, unlike Java's, INCLUDES NBSP,
  FIGURE SPACE, NNBSP and NEL and excludes the 0x1C-0x1F controls).
- ``analysis/core/LetterTokenizer.java:59`` — token char =
  ``Character.isLetter`` (categories Lu/Ll/Lt/Lm/Lo).
- ``analysis/core/KeywordTokenizer.java`` — the whole input is one token.
- ``analysis/core/SimpleAnalyzer.java`` = LetterTokenizer + LowerCase;
  ``analysis/core/StopAnalyzer.java`` adds StopFilter;
  ``analysis/core/WhitespaceAnalyzer.java`` / ``KeywordAnalyzer.java``
  apply NO case folding.
- ``analysis/path/PathHierarchyTokenizer.java:115`` — "/a/b/c" emits
  "/a", "/a/b", "/a/b/c"; a trailing delimiter emits one more token
  ("/a/" after "/a"); ``skip`` drops leading components by counting the
  first consumed char plus each delimiter while the count is <= skip
  (pinned by TestPathHierarchyTokenizer: skip=1 on "/a/b/c" -> "/b",
  "/b/c" and on "a/b/c" -> "/b", "/b/c").
- ``analysis/classic/ClassicTokenizerImpl.jflex`` — the classic (pre-3.1
  StandardTokenizer) grammar: ALPHANUM / APOSTROPHE / ACRONYM / COMPANY /
  EMAIL / HOST / NUM / CJ / ACRONYM_DEP with JFlex longest-match,
  earliest-rule tie-break; ``ClassicTokenizer.java:147`` retypes
  ACRONYM_DEP as <HOST> minus the trailing dot and SKIPS tokens longer
  than maxTokenLength (position gap); ``ClassicFilter.java:24`` strips
  trailing 's from APOSTROPHE tokens and dots from ACRONYM tokens;
  ``ClassicAnalyzer.java`` lowercases and applies the 33-word English
  stop set (the stop step lives in analysis_en.TOKEN_FILTERS so position
  gaps are preserved by the shared machinery).

Documented divergences (mirroring lucene_ray.analysis): a too-long
classic token is dropped WITHOUT a position-increment gap in the flat
stream; the classic LETTER class is Python's ``[^\\W\\d_]`` (Unicode
letters plus the handful of Nl/No codepoints JFlex's [:letter:]
excludes — unreachable for realistic corpora).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

MAX_TOKEN_LEN = 255  # CharTokenizer.DEFAULT_MAX_WORD_LEN

# ---------------------------------------------------------------------------
# whitespace predicates

# Java Character.isWhitespace: Zs minus non-breaking + Zl + Zp + the
# legacy controls.
_JAVA_WS = (frozenset({9, 10, 11, 12, 13, 28, 29, 30, 31,
                       0x20, 0x1680, 0x2028, 0x2029, 0x205F, 0x3000})
            | (frozenset(range(0x2000, 0x200B)) - {0x2007}))

# Unicode White_Space property (UnicodeProps.WHITESPACE).
_UNICODE_WS = (frozenset({9, 10, 11, 12, 13, 0x20, 0x85, 0xA0, 0x1680,
                          0x2028, 0x2029, 0x202F, 0x205F, 0x3000})
               | frozenset(range(0x2000, 0x200B)))


def _neg_class(cps) -> str:
    return "[^" + "".join(re.escape(chr(c)) for c in sorted(cps)) + "]+"


_WS_RUN = re.compile(_neg_class(_JAVA_WS))
_UWS_RUN = re.compile(_neg_class(_UNICODE_WS))


def _utf16_len(s: str) -> int:
    n = len(s)
    if not s.isascii():
        n += sum(1 for c in s if ord(c) > 0xFFFF)
    return n


def _chop_utf16(tok: str, max_len: int) -> list[str]:
    """CharTokenizer buffer break: emit once UTF-16 length reaches
    max_len; the remainder starts a new token (no chars skipped)."""
    out: list[str] = []
    cur: list[str] = []
    units = 0
    for ch in tok:
        cur.append(ch)
        units += 2 if ord(ch) > 0xFFFF else 1
        if units >= max_len:
            out.append("".join(cur))
            cur, units = [], 0
    if cur:
        out.append("".join(cur))
    return out


def _char_tokenize(text: str, run_re: "re.Pattern[str]",
                   max_len: int) -> list[str]:
    toks = run_re.findall(text)
    if max(map(len, toks), default=0) < max_len:
        return toks
    out: list[str] = []
    for t in toks:
        if len(t) < max_len and (t.isascii() or _utf16_len(t) < max_len):
            out.append(t)
        else:
            out.extend(_chop_utf16(t, max_len))
    return out


def _char_offsets(text: str, run_re: "re.Pattern[str]", max_len: int):
    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in run_re.finditer(text):
        t = m.group()
        if len(t) < max_len and (t.isascii() or _utf16_len(t) < max_len):
            toks.append(t)
            starts.append(m.start())
            ends.append(m.end())
        else:
            pos = m.start()
            for piece in _chop_utf16(t, max_len):
                toks.append(piece)
                starts.append(pos)
                pos += len(piece)
                ends.append(pos)
    return toks, starts, ends


def whitespace_tokenize(text: str,
                        max_len: int = MAX_TOKEN_LEN) -> list[str]:
    """WhitespaceTokenizer (case-preserving, Java whitespace)."""
    return _char_tokenize(text, _WS_RUN, max_len)


def unicode_whitespace_tokenize(text: str,
                                max_len: int = MAX_TOKEN_LEN) -> list[str]:
    """UnicodeWhitespaceTokenizer (Unicode White_Space property)."""
    return _char_tokenize(text, _UWS_RUN, max_len)


# LetterTokenizer: Character.isLetter == general category L*.  ASCII fast
# path; the general path takes regex candidate runs (\w minus digits and
# underscore = L* plus Nl/No) and splits out the non-L chars exactly.
_ASCII_LETTER_RUN = re.compile("[A-Za-z]+")
_LETTER_CAND = re.compile(r"[^\W\d_]+")
_letter_memo: dict[str, bool] = {}


def _is_letter(ch: str) -> bool:
    r = _letter_memo.get(ch)
    if r is None:
        r = unicodedata.category(ch).startswith("L")
        _letter_memo[ch] = r
    return r


def _letter_runs(text: str):
    """(token, start, end) spans of maximal Java-letter runs."""
    if text.isascii():
        for m in _ASCII_LETTER_RUN.finditer(text):
            yield m.group(), m.start(), m.end()
        return
    for m in _LETTER_CAND.finditer(text):
        run = m.group()
        if run.isascii() or all(map(_is_letter, run)):
            yield run, m.start(), m.end()
            continue
        s = None
        for i, ch in enumerate(run):
            if _is_letter(ch):
                if s is None:
                    s = i
            elif s is not None:
                yield run[s:i], m.start() + s, m.start() + i
                s = None
        if s is not None:
            yield run[s:], m.start() + s, m.end()


def letter_tokenize(text: str, max_len: int = MAX_TOKEN_LEN) -> list[str]:
    """LetterTokenizer (case-preserving)."""
    out: list[str] = []
    for t, _, _ in _letter_runs(text):
        if len(t) < max_len and (t.isascii() or _utf16_len(t) < max_len):
            out.append(t)
        else:
            out.extend(_chop_utf16(t, max_len))
    return out


def keyword_tokenize(text: str) -> list[str]:
    """KeywordTokenizer: the entire input as one token (no folding,
    no length cap — the buffer grows; IndexWriter's 32766-byte term
    limit is the only bound in the reference)."""
    return [text] if text else []


def java_lower(s: str) -> str:
    """LowerCaseFilter's per-codepoint simple mapping (see the analysis
    module's _LOWER_LUT): chars whose full lowercase is multi-char keep
    the original, except U+0130 which Java maps to 'i'."""
    lo = s.lower()
    if len(lo) == len(s):
        return lo
    return "".join(
        "i" if c == "İ" else (lc if len(lc := c.lower()) == 1 else c)
        for c in s)


# ---------------------------------------------------------------------------
# PathHierarchyTokenizer


def path_hierarchy_tokenize(text: str, delimiter: str = "/",
                            replacement: "str | None" = None,
                            skip: int = 0) -> list[str]:
    """Direct port of the incrementToken loop
    (analysis/path/PathHierarchyTokenizer.java:115): prefixes ending
    before each delimiter plus the full string; a trailing delimiter
    emits one final token; ``skip`` counts the first consumed char and
    then each delimiter while count <= skip, suppressing output until
    the count exceeds it."""
    repl = delimiter if replacement is None else replacement
    out: list[str] = []
    result = ""
    skipped = 0
    end_delim = False
    i, n = 0, len(text)
    while True:
        term = result
        added = end_delim
        if end_delim:
            term += repl
            end_delim = False
        broke = False
        while i < n:
            c = text[i]
            i += 1
            if not added:
                added = True
                skipped += 1
                if skipped > skip:
                    term += repl if c == delimiter else c
            elif c == delimiter:
                if skipped > skip:
                    end_delim = True
                    broke = True
                    break
                skipped += 1
                if skipped > skip:
                    term += repl
            elif skipped > skip:
                term += c
        if not broke:
            if skipped > skip and added:
                out.append(term)
            return out
        out.append(term)
        result = term


# ---------------------------------------------------------------------------
# Classic grammar (ClassicTokenizerImpl.jflex)

_CJ_CLASS = ("㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ"
             "㌀-㍿㐀-䶿一-鿿豈-﫿"
             "･-ﾟ")
_THAI = "฀-๙"
_L = rf"(?:(?![{_CJ_CLASS}])[^\W\d_])"          # [:letter:] minus CJ
_AL = rf"(?:{_L}|[{_THAI}]|\d)+"                # ALPHANUM
_ALPHA = rf"{_L}+"
_P = r"[_\-/.,]"
_HAS = rf"(?:{_L}|\d)*\d(?:{_L}|\d)*"           # HAS_DIGIT

ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ, \
    ACRONYM_DEP = ("<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
                   "<EMAIL>", "<HOST>", "<NUM>", "<CJ>", "<ACRONYM_DEP>")

# (pattern, type) in rule-priority order; JFlex picks the LONGEST match
# over the union with ties broken by rule order, so NUM's six
# alternatives are compiled separately (Python alternation is
# first-match, not longest-match).
_RULES: list[tuple["re.Pattern[str]", str]] = [
    (re.compile(p), t) for p, t in [
        (_AL, ALPHANUM),
        (rf"{_ALPHA}(?:'{_ALPHA})+", APOSTROPHE),
        (rf"{_L}\.(?:{_L}\.)+", ACRONYM),
        (rf"{_ALPHA}[&@]{_ALPHA}", COMPANY),
        (rf"{_AL}(?:[._-]{_AL})*@{_AL}(?:[.-]{_AL})+", EMAIL),
        (rf"{_AL}(?:\.{_AL})+", HOST),
        (rf"{_AL}{_P}{_HAS}", NUM),
        (rf"{_HAS}{_P}{_AL}", NUM),
        (rf"{_AL}(?:{_P}{_HAS}{_P}{_AL})+", NUM),
        (rf"{_HAS}(?:{_P}{_AL}{_P}{_HAS})+", NUM),
        (rf"{_AL}{_P}{_HAS}(?:{_P}{_AL}{_P}{_HAS})+", NUM),
        (rf"{_HAS}{_P}{_AL}(?:{_P}{_HAS}{_P}{_AL})+", NUM),
        (rf"[{_CJ_CLASS}]", CJ),
        (rf"{_AL}\.(?:{_AL}\.)+", ACRONYM_DEP),
    ]]

_TOK_START = re.compile(rf"{_L}|[{_THAI}]|\d|[{_CJ_CLASS}]")


def classic_scan(text: str) -> list[tuple[str, str, int, int]]:
    """(term, type, start, end) per the classic grammar.  ACRONYM_DEP is
    retyped <HOST> minus the trailing '.' (ClassicTokenizer.java:147)."""
    out: list[tuple[str, str, int, int]] = []
    pos = 0
    search = _TOK_START.search
    while True:
        m = search(text, pos)
        if m is None:
            return out
        pos = m.start()
        best_end, best_type = pos, None
        for rx, typ in _RULES:
            mm = rx.match(text, pos)
            if mm is not None and mm.end() > best_end:
                best_end, best_type = mm.end(), typ
        if best_type is None:       # unreachable: start chars match rules
            pos += 1
            continue
        if best_type is ACRONYM_DEP:
            out.append((text[pos:best_end - 1], HOST, pos, best_end - 1))
        else:
            out.append((text[pos:best_end], best_type, pos, best_end))
        pos = best_end


def classic_tokenize(text: str, max_token_length: int = MAX_TOKEN_LEN,
                     lower: bool = True) -> list[str]:
    """ClassicTokenizer + ClassicFilter + LowerCaseFilter — the
    ClassicAnalyzer chain minus the stop step (which runs as the
    vocabulary-level 'classic' token filter so gaps are preserved).
    Tokens longer than max_token_length are dropped (the reference also
    gaps the position; the flat stream here does not — same documented
    divergence as the standard chain)."""
    out: list[str] = []
    for term, typ, _, _ in classic_scan(text):
        if _utf16_len(term) > max_token_length:
            continue
        if typ is APOSTROPHE and term[-2:] in ("'s", "'S"):
            term = term[:-2]
        elif typ is ACRONYM:
            term = term.replace(".", "")
        out.append(java_lower(term) if lower else term)
    return out


def _classic_offsets(text: str, max_len: int = MAX_TOKEN_LEN):
    toks, starts, ends = [], [], []
    for term, typ, s, e in classic_scan(text):
        if _utf16_len(term) > max_len:
            continue
        if typ is APOSTROPHE and term[-2:] in ("'s", "'S"):
            term = term[:-2]
        elif typ is ACRONYM:
            term = term.replace(".", "")
        toks.append(java_lower(term))
        starts.append(s)
        ends.append(e)
    return toks, starts, ends


# ---------------------------------------------------------------------------
# Analyzer registry: name -> text->tokens pipeline (tokenizer plus its
# analyzer's canonical case step; stop/stem steps stay vocabulary-level
# in analysis_en.TOKEN_FILTERS so position gaps survive).

def _with_offsets(fn, off):
    fn.with_offsets = off
    return fn


def _simple_tokenize(text: str) -> list[str]:
    return [java_lower(t) for t in letter_tokenize(text)]


def _simple_offsets(text: str):
    toks, starts, ends = [], [], []
    for t, s, e in _letter_runs(text):
        if len(t) < MAX_TOKEN_LEN and (t.isascii()
                                       or _utf16_len(t) < MAX_TOKEN_LEN):
            toks.append(java_lower(t))
            starts.append(s)
            ends.append(e)
        else:
            pos = s
            for piece in _chop_utf16(t, MAX_TOKEN_LEN):
                toks.append(java_lower(piece))
                starts.append(pos)
                pos += len(piece)
                ends.append(pos)
    return toks, starts, ends


def _keyword_offsets(text: str):
    return ([text], [0], [len(text)]) if text else ([], [], [])


def _path_offsets(text: str):
    toks = path_hierarchy_tokenize(text)
    return toks, [0] * len(toks), [len(t) for t in toks]


def _classic_alpha_offsets(text: str, max_len: int = MAX_TOKEN_LEN):
    toks, starts, ends = [], [], []
    for term, typ, s, e in classic_scan(text):
        if typ is not ALPHANUM and typ is not APOSTROPHE:
            continue
        if _utf16_len(term) > max_len:
            continue
        if typ is APOSTROPHE and term[-2:] in ("'s", "'S"):
            term = term[:-2]
        toks.append(java_lower(term))
        starts.append(s)
        ends.append(e)
    return toks, starts, ends


def classic_alpha_tokenize(text: str,
                           max_token_length: int = MAX_TOKEN_LEN
                           ) -> list[str]:
    """TypeTokenFilter role (core/TypeTokenFilter.java:29, whitelist
    mode) over the classic chain: only <ALPHANUM> and <APOSTROPHE>
    typed tokens survive (NUM/HOST/EMAIL/COMPANY/ACRONYM/CJ dropped),
    then ClassicFilter + LowerCase as usual."""
    out: list[str] = []
    for term, typ, _, _ in classic_scan(text):
        if typ is not ALPHANUM and typ is not APOSTROPHE:
            continue
        if _utf16_len(term) > max_token_length:
            continue
        if typ is APOSTROPHE and term[-2:] in ("'s", "'S"):
            term = term[:-2]
        out.append(java_lower(term))
    return out


TOKENIZER_ANALYZERS = {
    "whitespace": _with_offsets(
        lambda t: whitespace_tokenize(t),
        lambda t: _char_offsets(t, _WS_RUN, MAX_TOKEN_LEN)),
    # HyphenatedWordsFilter pairs with the whitespace tokenizer (its
    # stream filter is registered in analysis.STREAM_FILTERS under the
    # same name; '-' never survives the standard grammar). No offsets
    # mode: a joined token spans disjoint source ranges.
    "hyphenated": lambda t: whitespace_tokenize(t),
    "classic_alpha": _with_offsets(
        classic_alpha_tokenize,
        lambda t: _classic_alpha_offsets(t)),
    "unicode_whitespace": _with_offsets(
        lambda t: unicode_whitespace_tokenize(t),
        lambda t: _char_offsets(t, _UWS_RUN, MAX_TOKEN_LEN)),
    "simple": _with_offsets(_simple_tokenize, _simple_offsets),
    "stop_en": _with_offsets(_simple_tokenize, _simple_offsets),
    "keyword": _with_offsets(keyword_tokenize, _keyword_offsets),
    "path_hierarchy": _with_offsets(
        lambda t: path_hierarchy_tokenize(t), _path_offsets),
    "classic": _with_offsets(
        lambda t: classic_tokenize(t), _classic_offsets),
}


def _urlemail_terms(text: str) -> list[str]:
    from .urlemail import tokenize_urlemail_terms
    return tokenize_urlemail_terms(text)


def _urlemail_offsets(text: str):
    from .urlemail import tokenize_urlemail
    toks, starts, ends = [], [], []
    for t, _typ, s, e in tokenize_urlemail(text):
        toks.append(t.lower())
        starts.append(s)
        ends.append(e)
    return toks, starts, ends


# UAX29URLEmailAnalyzer chain (email/UAX29URLEmailAnalyzer.java:36):
# URL/EMAIL-aware tokenizer + lowercase; gated on the reference's
# 643-URL / 265-email random-text extractions in tests/test_urlemail.py
TOKENIZER_ANALYZERS["url_email"] = _with_offsets(
    _urlemail_terms, _urlemail_offsets)


def get_tokenizer(name: "str | None"):
    """Analyzer names that replace the STANDARD tokenizer entirely."""
    return TOKENIZER_ANALYZERS.get(name or "")
