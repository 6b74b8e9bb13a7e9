"""Phonetic encoding — the analysis/phonetic module role.

Reference: ``analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilter.java:33`` (inject/replace tokens with their
phonetic encoding; the encoders themselves are delegated to
commons-codec). Implemented encoder: classic American Soundex with
commons-codec semantics (``Soundex.US_ENGLISH``, mapping
``01230120022455012623010202``): first letter kept; H and W are
transparent (letters they separate count as adjacent); vowels break
adjacency; adjacent duplicate codes collapse INCLUDING against the
first letter's own code; zeros drop; pad/truncate to 4.

Formulation (mirrored 1:1 by the SQL oracle, validated against the
commons-codec SoundexTest vectors in tests):
    body    = translate(remove_hw(letters), code_map)   # vowels → '0'
    d       = collapse_adjacent_duplicates(body)
    rest    = d          if first letter is h/w (its code never emitted)
              d[1:]      otherwise (d[0] is the first letter's own code)
    code    = first_letter + (rest without '0' + '000')[:3]
"""

from __future__ import annotations

import re

_SX_MAP = str.maketrans("abcdefgijklmnopqrstuvxyz",
                        "012301202245501262301202")
_LETTERS = re.compile(r"[^a-zA-Z]")


def soundex(term: str) -> str:
    u = _LETTERS.sub("", term).lower()
    if not u:
        return ""
    body = u.replace("h", "").replace("w", "").translate(_SX_MAP)
    d: list[str] = []
    for ch in body:
        if not d or d[-1] != ch:
            d.append(ch)
    s = "".join(d)
    rest = s if u[0] in "hw" else s[1:]
    digits = rest.replace("0", "")
    return u[0] + (digits + "000")[:3]
