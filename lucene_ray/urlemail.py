"""UAX29URLEmailTokenizer: UAX#29 word segmentation plus RFC-shaped
<URL> and <EMAIL> tokens, re-expressed from the reference grammar
(``analysis/email/UAX29URLEmailTokenizerImpl.jflex:100-260``).

Scanner semantics reproduced from JFlex:

- candidates at a position are compared by TOTAL match length
  INCLUDING trailing context (``r / c`` matches ``rc`` then pushes
  ``c`` back), ties broken by rule order — this is why ``mailto``
  followed by ``:email`` beats the plain word token;
- the host-only rules are guarded by the AVOID_BAD_URL state: a bare
  strict host followed by ``[-\\w]`` is pushed back and rescanned with
  the host-only rules disabled (LUCENE-8278), so ``foo.ac5`` stays one
  ALPHANUM token while ``foo.ac:80`` is a URL;
- everything that is not a URL/EMAIL candidate falls through to the
  UAX#29 word rules (delegated to the standard tokenizer), competing
  under the same longest-match rule — e.g. ``1.2.3.4.5`` is one
  <NUM>, not an IPv4 host plus residue.

TLD sets live in ``urlemail_data.py`` (generated from the reference's
IANA-derived list)."""

from __future__ import annotations

import re

from .urlemail_data import TLD_MAIN, TLD_PREFIX_1, TLD_PREFIX_2

_UNRES = r"[-._~A-Za-z0-9]"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUB = r"[!$&'()*+,;=]"
_LOGINSEG = rf"(?:{_UNRES}|{_PCT}|{_SUB})*"
_LOGIN = rf"{_LOGINSEG}(?::{_LOGINSEG})?@"
_QUERY = rf"\?(?:{_UNRES}|{_PCT}|{_SUB}|[:@/?])*"
_FRAG = rf"\#(?:{_UNRES}|{_PCT}|{_SUB}|[:@/?])*"
_PORT = r":[0-9]{1,5}"

_LABEL = r"[A-Za-z0-9](?:[-A-Za-z0-9]*[A-Za-z0-9])?"
_LABELSEQ = rf"{_LABEL}(?:\.{_LABEL})*"


def _tld_alt(tlds) -> str:
    # longest-first so the regex alternation prefers the longest TLD
    # at a given dot, like the DFA's longest match
    return "|".join(sorted(tlds, key=len, reverse=True))


_TLD_ALL = rf"\.(?i:{_tld_alt(TLD_MAIN | TLD_PREFIX_1 | TLD_PREFIX_2)})"
_DOMAIN_STRICT = rf"{_LABELSEQ}{_TLD_ALL}"
_DOMAIN_LOOSE = _LABELSEQ

_OCTET = (r"(?:2(?:5[0-5]|[0-4][0-9])|1[0-9][0-9]|0?[1-9][0-9]"
          r"|0{0,2}[0-9])"   )  # longest-first: flex longest-match
_IPV4 = rf"{_OCTET}(?:\.{_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = rf"(?:{_IPV4}|{_H16}:{_H16})"
_IPV6 = (
    rf"(?:(?:{_H16}:){{6}}{_LS32}"
    rf"|::(?:{_H16}:){{5}}{_LS32}"
    rf"|(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}"
    rf"|(?:(?:{_H16}:)?{_H16})?::(?:{_H16}:){{3}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}"
    rf"|(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(?:(?:{_H16}:){{0,6}}{_H16})?::)"
)

_HOST_STRICT = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_STRICT})"
_HOST_LOOSE = rf"(?:\[{_IPV6}\]|{_IPV4}|{_DOMAIN_LOOSE})"
_AUTH_LOOSE = rf"(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"

_HTTPSEG = rf"(?:{_UNRES}|{_PCT}|[;:@&=])*"
_HTTPPATH = rf"(?:/{_HTTPSEG})+"
_HTTP_FULL = (rf"(?i:https?)://(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"
              rf"(?:{_HTTPPATH})?(?:{_QUERY})?(?:{_FRAG})?")
_TAIL_PORT = rf"{_PORT}(?:{_HTTPPATH})?(?:{_QUERY})?(?:{_FRAG})?"
_TAIL_PATH = rf"(?:{_PORT})?{_HTTPPATH}(?:{_QUERY})?(?:{_FRAG})?"
_TAIL_QUERY = rf"(?:{_PORT})?(?:{_HTTPPATH})?{_QUERY}(?:{_FRAG})?"
_TAIL_FRAG = rf"(?:{_PORT})?(?:{_HTTPPATH})?(?:{_QUERY})?{_FRAG}"
_HTTP_NOSCHEME = (rf"{_HOST_STRICT}"
                  rf"(?:{_TAIL_PORT}|{_TAIL_PATH}|{_TAIL_QUERY}"
                  rf"|{_TAIL_FRAG})")

_FTPSEG = rf"(?:{_UNRES}|{_PCT}|[?:@&=])*"
_FTPPATH = rf"/{_FTPSEG}(?:/{_FTPSEG})*"
_FTPTYPE = r"(?i:;type=[aid])"
_FTP = (rf"(?i:ftp)://{_AUTH_LOOSE}{_FTPPATH}(?:{_FTPTYPE})?"
        rf"(?:{_FRAG})?")
_FILE = rf"(?i:file)://(?:{_HOST_LOOSE})?{_FTPPATH}(?:{_FRAG})?"

_URL = rf"(?:{_HTTP_FULL}|{_HTTP_NOSCHEME}|{_FTP}|{_FILE})"

_EMAIL_QS = ("\"(?:[\\x01-\\x08\\x0b\\x0c\\x0e-\\x21\\x23-\\x5b"
             "\\x5d-\\x7e]|\\\\[\\x00-\\x7f])*\"")
_EMAIL_ATOM = r"[A-Za-z0-9!#$%&'*+-/=?^_`{|}~]"  # +-/ IS a range
# (includes , - . /) exactly as the reference char class
# (jflex EMAILatomText) — ',personB@x.com' is one EMAIL
_EMAIL_LABEL = rf"(?:{_EMAIL_ATOM}+|{_EMAIL_QS})"
_EMAIL_LOCAL = rf"{_EMAIL_LABEL}(?:\.{_EMAIL_LABEL})*"
_EMAIL_DLIT = ("(?:[\\x01-\\x08\\x0b\\x0c\\x0e-\\x5a\\x5e-\\x7f]"
               "|\\\\[\\x00-\\x7f])")
_EMAIL_BRACKET = (rf"\[(?:{_EMAIL_DLIT}*|{_IPV4}"
                  rf"|(?i:ipv)6:{_IPV6})\]")
_EMAIL = rf"{_EMAIL_LOCAL}@(?:{_DOMAIN_STRICT}|{_EMAIL_BRACKET})"

# Rules: (compiled regex with group 1 = emitted text, token type,
# active-in-AVOID_BAD_URL). Order = flex priority. Total match length
# (incl. trailing context) is the disambiguation length.
_R = re.compile
_RULES = (
    (_R(rf"({_URL})"), "<URL>", True),
    (_R(rf"({_HOST_STRICT})[^-\w]"), "<URL>", True),
    # bare strict host followed by [-\w] -> pushback (AVOID_BAD_URL)
    (_R(rf"({_HOST_STRICT})(?=[-\w])"), None, False),
    (_R(rf"({_HOST_STRICT})"), "<URL>", False),
    (_R(rf"((?i:mailto))(?::{_EMAIL})"), "<ALPHANUM>", True),
    (_R(rf"({_EMAIL})"), "<EMAIL>", True),
)

# chars that can start any URL/EMAIL rule (labels/IP/bracket/quoted
# local part/atom specials); used only to skip scan positions fast
_START = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "[\"!#$%&'*+,-./=?^_`{|}~")


def tokenize_urlemail(text: str,
                      max_token_length: int = 255
                      ) -> list[tuple[str, str, int, int]]:
    """-> [(term, type, start, end)] with raw source text per token
    (tokenizer level); ``tokenize_urlemail_terms`` is the analyzer
    view (lowercased). The standard tokenizer's documented emoji
    divergence applies here too."""
    from .analysis import tokenize_with_offsets
    n = len(text)
    out: list[tuple[str, str, int, int]] = []
    # global standard segmentation; re-derived locally when a URL/
    # EMAIL consumption lands mid-span
    _wt, wstarts, wends = tokenize_with_offsets(
        text, max_token_length)
    wpos = 0
    i = 0
    avoid = False
    while i < n:
        best = None  # (total_len, -rule_idx, emit_len, type)
        if text[i] in _START:
            for ridx, (rx, typ, in_avoid) in enumerate(_RULES):
                if avoid and not in_avoid:
                    continue
                m = rx.match(text, i)
                if m and m.end(1) > i:
                    key = (m.end() - i, -ridx)
                    if best is None or key > best[0]:
                        best = (key, m.end(1) - i, typ, ridx)
        # word-rule candidate starting exactly at i
        while wpos < len(wstarts) and wends[wpos] <= i:
            wpos += 1
        wlen = 0
        if wpos < len(wstarts):
            if wstarts[wpos] == i:
                wlen = int(wends[wpos]) - i
            elif wstarts[wpos] < i:
                # mid-span: re-derive the token at i locally
                _lt, ls, le = tokenize_with_offsets(
                    text[i:i + max_token_length + 16],
                    max_token_length)
                if len(ls) and ls[0] == 0:
                    wlen = int(le[0])
        if best is not None and best[0][0] >= wlen:
            _, emit_len, typ, ridx = best
            if typ is None:
                # pushback: rescan this position with host rules off
                avoid = True
                continue
            out.append((text[i:i + emit_len], typ, i, i + emit_len))
            i += emit_len
            avoid = False
        elif wlen:
            # raw span text (tokenizer level); the analyzer wrapper
            # lowercases
            out.append((text[i:i + wlen], "<ALPHANUM>", i, i + wlen))
            i += wlen
            avoid = False
        else:
            i += 1     # flex [^] skip keeps the state
    return out


def tokenize_urlemail_terms(text: str) -> list[str]:
    """Analyzer view (UAX29URLEmailAnalyzer = tokenizer + lowercase):
    lowercased terms."""
    return [t.lower() for t, _, _, _ in tokenize_urlemail(text)]
