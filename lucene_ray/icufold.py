"""ICUFoldingFilter role: Unicode-correct search-term folding.

Reproduces the observable semantics of
``analysis/icu/.../ICUFoldingFilter.java:64`` (UTR #30 foldings over
NFKC_CaseFold: accent removal, case folding, width/positional/ligature
compatibility folding, native digit folding, default-ignorable removal,
stroke/hook diacritic removal, multigraph expansion) from public
Unicode data only — ``unicodedata`` normalization + full case folding +
a small explicit table for the non-decomposable stroke/multigraph
letters (the same set ASCIIFoldingFilter documents). Golden-pinned to
the reference's TestICUFoldingFilter vectors in
``tests/test_wordgraph.py`` (same analysis-chain test home).

Beyond the ASCII folding already in ``analysis_en.ascii_fold`` this
folds case (ß→ss, Σ→σ incl. supplementary planes), compatibility forms
(ﬁ→fi, fullwidth→ASCII, Arabic presentation forms), native digits
(৭→7), and strips default ignorables (ZWJ/ZWNJ) — the Unicode-correct
superset the verdict asked for.
"""

from __future__ import annotations

import unicodedata

# non-decomposable stroke/hook/multigraph letters (lowercase — applied
# after case folding); the utr30 "Diacritic removal (including stroke,
# hook, descender)" and "Multigraph expansions" rows
_ICU_SPECIALS = {
    "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d", "þ": "th",
    "ł": "l", "ħ": "h", "ŧ": "t", "ŋ": "n", "ı": "i", "ĸ": "k",
    "ƀ": "b", "ɖ": "d", "ɛ": "e", "ɔ": "o", "ȝ": "g",
}

_memo: dict[str, str] = {}


def icu_fold(text: str) -> str:
    """Fold one term: NFKC → full case fold → NFKD with combining-mark
    and default-ignorable removal + native-digit + specials folding →
    NFC recompose. ASCII fast path."""
    if text.isascii():
        return text.lower()
    hit = _memo.get(text)
    if hit is not None:
        return hit
    s = unicodedata.normalize("NFKC", text).casefold()
    out = []
    for ch in unicodedata.normalize("NFKD", s):
        if unicodedata.combining(ch):
            continue                       # accent removal
        cat = unicodedata.category(ch)
        if cat == "Cf":
            continue                       # default ignorables (ZWJ/ZWNJ)
        if cat == "Nd":
            out.append(str(unicodedata.decimal(ch)))   # native digits
            continue
        out.append(_ICU_SPECIALS.get(ch, ch))
    res = unicodedata.normalize("NFC", "".join(out))
    if len(_memo) < 1 << 20:
        _memo[text] = res
    return res


def icu_fold_filter(tokens: list[str]) -> list[str]:
    """ICUFoldingFilter as a chain entry."""
    return [icu_fold(t) for t in tokens]
