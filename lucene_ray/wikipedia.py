"""WikipediaTokenizer (analysis/wikipedia/WikipediaTokenizerImpl.
jflex:25-340): wiki-markup-aware tokenization emitting typed tokens
(category / internal & external link / citation / bold / italics /
headings beside the classic word types), ported state-for-state with
flex longest-match-then-rule-order disambiguation. TOKENS_ONLY mode
(the tokenizer's default)."""

from __future__ import annotations

import re

_LETTER = ("A-Za-zÀ-ÖØ-öø-ÿ"
           "Ā-῿ﾠ-ￜ")
_DIGIT = ("0-9٠-٩۰-۹०-९০-৯"
          "੦-੯૦-૯୦-୯௧-௯"
          "౦-౯೦-೯൦-൯๐-๙"
          "໐-໙၀-၉")
_KOREAN = "가-힯ᄀ-ᇿ"
_CJ = ("぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ"
       "㌀-㍿㐀-䶿一-鿿豈-﫿"
       "･-ﾟ")

_AN = rf"[{_LETTER}{_DIGIT}{_KOREAN}]+"
_ALPHA = rf"[{_LETTER}]+"
_P = r"[_\-/.,]"
_HASDIG = rf"[{_LETTER}{_DIGIT}]*[{_DIGIT}][{_LETTER}{_DIGIT}]*"
_NUM = (rf"(?:{_AN}{_P}{_HASDIG}"
        rf"|[{_DIGIT}]+{_P}[{_DIGIT}]+"
        rf"|{_HASDIG}{_P}{_AN}"
        rf"|{_AN}(?:{_P}{_HASDIG}{_P}{_AN})+"
        rf"|{_HASDIG}(?:{_P}{_AN}{_P}{_HASDIG})+"
        rf"|{_AN}{_P}{_HASDIG}(?:{_P}{_AN}{_P}{_HASDIG})+"
        rf"|{_HASDIG}{_P}{_AN}(?:{_P}{_HASDIG}{_P}{_AN})+)")
_EMAIL = rf"{_AN}(?:[.\-_]{_AN})*@{_AN}(?:[.\-]{_AN})+"
_HOST = rf"{_AN}(?:\.{_AN})+"
_APOS = rf"{_ALPHA}(?:'{_ALPHA})+"
_ACRO = rf"{_ALPHA}\.(?:{_ALPHA}\.)+"
_COMP = rf"{_ALPHA}[&@]{_ALPHA}"
_EXTURL = (rf"https?://{_HOST}"
           rf"(?:/?(?:{_AN}|{_P}|\?|&|=|#)*)*")
# TAGS skip (the unprefixed [^]|TAGS rule applies in every inclusive
# state): <tag attr="v"...> and </tag>
_WS = r"(?:\r\n|[ \r\n\t\f])"
_TAGS = rf"</?{_AN}(?:{_WS}*{_AN}=\"{_AN}\")*>"

_R = re.compile

# rule = (regex, token_type_or_None, handler). handler(sc) runs after
# a match; token_type "CUR" emits sc.cur_type.
ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ = (
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>")
INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"


class _Sc:
    def __init__(self) -> None:
        self.state = "Y"
        self.cur_type: str = ""
        self.num_balanced = 0
        self.pos_inc = 1
        self.num_link_toks = 0


def _goto(state, cur=None):
    def h(sc: _Sc) -> None:
        if cur is not None:
            sc.cur_type = cur
        sc.pos_inc = 1
        sc.state = state
    return h


def _quotes2(sc: _Sc) -> None:
    sc.pos_inc = 1
    if sc.num_balanced == 0:
        sc.num_balanced = 1
        sc.state = "Q2"
    else:
        sc.num_balanced = 0


def _str_end(sc: _Sc) -> None:
    sc.num_balanced = 0
    sc.cur_type = ALPHANUM
    sc.state = "Y"


def _el_an(sc: _Sc) -> None:
    sc.pos_inc = 0 if sc.num_link_toks == 0 else 1
    sc.cur_type = EXTERNAL_LINK
    sc.num_link_toks += 1


def _el_close(sc: _Sc) -> None:
    sc.num_link_toks = 0
    sc.pos_inc = 0
    sc.state = "Y"


def _il_close(sc: _Sc) -> None:
    # IL ]] resets the link-token counter WITHOUT touching posInc
    # (jflex INTERNAL_LINK_STATE close action)
    sc.num_link_toks = 0
    sc.state = "Y"


def _set1(sc: _Sc) -> None:
    sc.pos_inc = 1


_STATES: dict[str, list] = {
    "Y": [
        (_R(_AN), ALPHANUM, _set1),
        (_R(_APOS), APOSTROPHE, _set1),
        (_R(_ACRO), ACRONYM, _set1),
        (_R(_COMP), COMPANY, _set1),
        (_R(_EMAIL), EMAIL, _set1),
        (_R(_NUM), NUM, _set1),
        (_R(_HOST), HOST, _set1),
        (_R(rf"[{_CJ}]"), CJ, _set1),
        (_R(r"\[\[:?Category:"), None, _goto("CAT", CATEGORY)),
        (_R(r"\[\["), None, _goto("IL", INTERNAL_LINK)),
        (_R(r"\["), None, _goto("EL", EXTERNAL_LINK_URL)),
        (_R(r"''"), None, _quotes2),
        (_R(r"=="), None, _goto("EQ")),
        (_R(r"\{\{"), None, _goto("BR", CITATION)),
        (_R(r"<ref>"), None, _goto("BR", CITATION)),
        (_R(_TAGS), None, lambda sc: None),
    ],
    "IL": [
        (_R(_AN), "CUR", lambda sc: None),
        (_R(r"\]\]"), None, _il_close),
    ],
    "EL": [
        (_R(_EXTURL), "CUR", _set1),
        (_R(_AN), "CUR", _el_an),
        (_R(r"\]"), None, _el_close),
    ],
    "CAT": [
        (_R(_AN), "CUR", lambda sc: None),
        (_R(r"\]\]"), None, _goto("Y")),
    ],
    "Q2": [
        (_R(r"'''"), None, _goto("Q5", BOLD_ITALICS)),
        (_R(r"'"), None, _goto("Q3", BOLD)),
        (_R(_AN), "ITAL", None),
        (_R(r"\[\[:?Category:"), None, _goto("CAT", CATEGORY)),
        (_R(r"\[\["), None, _goto("IL", INTERNAL_LINK)),
        (_R(r"\["), None, _goto("EL", EXTERNAL_LINK)),
    ],
    "Q3": [
        (_R(_AN), "STR", None),
        (_R(r"\[\[:?Category:"), None, _goto("CAT", CATEGORY)),
        (_R(r"\[\["), None, _goto("IL", INTERNAL_LINK)),
        (_R(r"\["), None, _goto("EL", EXTERNAL_LINK)),
    ],
    "Q5": [
        (_R(_AN), "STR", None),
        (_R(r"\[\[:?Category:"), None, _goto("CAT", CATEGORY)),
        (_R(r"\[\["), None, _goto("IL", INTERNAL_LINK)),
        (_R(r"\["), None, _goto("EL", EXTERNAL_LINK)),
    ],
    "EQ": [
        (_R(r"=="), None, _goto("Y")),
        (_R(r"="), None, _goto("STRst", SUB_HEADING)),
        (_R(_AN), "HEAD", None),
    ],
    "BR": [
        (_R(_AN), "CUR", lambda sc: None),
        (_R(r"\}\}"), None, _goto("Y")),
        (_R(r"</ref>"), None, _goto("Y")),
    ],
    "STR": [
        (_R(r"'''''"), None, _str_end),
        (_R(r"'''"), None, _str_end),
        (_R(r"''"), None, _str_end),
        (_R(r"==="), None, _str_end),
        (_R(_AN), "CUR", lambda sc: None),
        (_R(r"\[\[:?Category:"), None, _goto("CAT", CATEGORY)),
        (_R(r"\[\["), None, _goto("IL", INTERNAL_LINK)),
        (_R(r"\["), None, _goto("EL", EXTERNAL_LINK)),
        (_R(r"\|"), "CUR", lambda sc: None),
    ],
}




def tokenize_wikipedia(text: str
                       ) -> list[tuple[str, str, int, int, int]]:
    """-> [(term, type, pos_inc, start, end)] in TOKENS_ONLY mode."""
    sc = _Sc()
    out = []
    n = len(text)
    i = 0
    while i < n:
        state = sc.state
        key = "STR" if state == "STRst" else state
        rules = _STATES[key]
        if state == "STRst":
            sc.state = "STR"
        best = None
        for ridx, (rx, typ, handler) in enumerate(rules):
            m = rx.match(text, i)
            if m and m.end() > i:
                k = (m.end() - i, -ridx)
                if best is None or k > best[0]:
                    best = (k, m, typ, handler)
        if best is None:
            # flex [^] skip: YYINITIAL resets counters; inner states
            # just skip
            if sc.state == "Y":
                sc.pos_inc = 1
            i += 1
            continue
        _, m, typ, handler = best
        if typ is None:
            handler(sc)
            i = m.end()
            continue
        if typ == "CUR":
            if handler is not None:
                handler(sc)
            emit_type = sc.cur_type
            pos = sc.pos_inc
        elif typ == "ITAL":
            sc.cur_type = ITALICS
            sc.state = "STR"
            emit_type = ITALICS
            pos = sc.pos_inc
        elif typ == "STR":
            sc.state = "STR"
            emit_type = sc.cur_type
            pos = sc.pos_inc
        elif typ == "HEAD":
            sc.cur_type = HEADING
            emit_type = HEADING
            pos = sc.pos_inc
        else:
            sc.pos_inc = 1
            emit_type = typ
            pos = 1
        out.append((m.group(), emit_type, pos, i, m.end()))
        i = m.end()
    return out
