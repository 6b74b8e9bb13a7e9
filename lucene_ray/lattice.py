"""Dictionary-lattice CJK segmentation (kuromoji role).

Reproduces the observable semantics of the reference's morphological
tokenizer stack — ``analysis/ja/JapaneseTokenizer.java:61`` driving the
shared Viterbi core ``analysis/common/.../morph/Viterbi.java:42`` — from
public knowledge only, over a *user-supplied* lexicon (no bundled
mecab-ipadic: the dictionary is an input, exactly as the reference's
``JapaneseTokenizer(userDictionary, ...)`` constructor allows):

* a position lattice where every offset collects dictionary candidates
  (all lexicon surfaces starting there, each with a word cost) plus
  unknown-word candidates from a character-class definition
  (``morph/CharacterDefinition.java:55``: per-class ``invoke`` — consider
  the unknown even when a dictionary word matched — and ``group`` —
  extend the unknown across the whole same-class run, capped at
  ``MAX_UNKNOWN_WORD_LENGTH`` 1024, ``morph/Viterbi.java:42,370``);
* forward Viterbi choosing the min total (word cost + connection cost)
  path, connection costs looked up by (left type, right type) as the
  reference looks up (rightID, leftID) in ``morph/ConnectionCosts.java``;
* search mode's compound-splitting penalty
  (``ja/ViterbiNBest.java:82-102``): kanji-only dictionary words longer
  than 2 chars pay ``(len-2)*3000``, other words longer than 7 pay
  ``(len-7)*1700`` — biasing the path toward decomposed morphemes.

Ties break toward the candidate enumerated first at its start position
(dictionary entries by ascending length, then unknowns), mirroring the
reference's strict ``leastCost <`` update order.
"""

from __future__ import annotations

import unicodedata

MAX_UNKNOWN_WORD_LENGTH = 1024   # morph/Viterbi.java:42

# character classes (mecab char.def roles; public ipadic defaults:
# KANJI invoke=0 group=0, HIRAGANA/KATAKANA/ALPHA/NUMERIC invoke=1
# group=1, DEFAULT invoke=0 group=1)
KANJI, HIRAGANA, KATAKANA, ALPHA, NUMERIC, DEFAULT = range(6)
_INVOKE = {HIRAGANA, KATAKANA, ALPHA, NUMERIC}
_GROUP = {HIRAGANA, KATAKANA, ALPHA, NUMERIC, DEFAULT}

# search-mode penalty constants (ja/ViterbiNBest.java:82-85)
_SEARCH_KANJI_LEN, _SEARCH_OTHER_LEN = 2, 7
_SEARCH_KANJI_PEN, _SEARCH_OTHER_PEN = 3000, 1700

_DICT, _UNK, _BOS = 0, 1, 2
# connection costs by (left token type, right token type); BOS/EOS use
# the _BOS row/column (cost 0, as the reference's id 0 boundary)
DEFAULT_CONN = {
    (_DICT, _DICT): 0, (_DICT, _UNK): 500, (_UNK, _DICT): 500,
    (_UNK, _UNK): 1000,
    (_BOS, _DICT): 0, (_BOS, _UNK): 0, (_DICT, _BOS): 0, (_UNK, _BOS): 0,
}
DEFAULT_UNK_COST = 10000          # per unknown token
DEFAULT_UNK_CHAR_COST = 1000      # plus per char beyond the first


def char_class(ch: str) -> int:
    """CharacterDefinition.getCharacterClass role
    (morph/CharacterDefinition.java:55) from public Unicode data."""
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return HIRAGANA
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
        return KATAKANA
    if (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0x20000 <= o <= 0x2A6DF or ch == "々"):
        return KANJI
    c = unicodedata.category(ch)
    if c.startswith("L"):
        return ALPHA
    if c == "Nd":
        return NUMERIC
    return DEFAULT


class LatticeTokenizer:
    """Viterbi lattice segmenter over a ``surface -> word cost`` lexicon.

    ``mode="search"`` applies the reference's compound-splitting penalty
    to dictionary candidates (ja/ViterbiNBest.java:88-102)."""

    def __init__(self, lexicon: dict[str, int], *, mode: str = "normal",
                 conn: dict | None = None,
                 unk_cost: int = DEFAULT_UNK_COST,
                 unk_char_cost: int = DEFAULT_UNK_CHAR_COST):
        if mode not in ("normal", "search"):
            raise ValueError(f"mode {mode!r}")
        self.mode = mode
        self.conn = DEFAULT_CONN if conn is None else conn
        self.unk_cost = unk_cost
        self.unk_char_cost = unk_char_cost
        # first-char index: ch -> [(surface, cost)] by ascending length,
        # built once (actor __init__ state when used in a pool)
        self._by_first: dict[str, list[tuple[str, int]]] = {}
        for surf, cost in lexicon.items():
            if surf:
                self._by_first.setdefault(surf[0], []).append((surf, cost))
        for cands in self._by_first.values():
            cands.sort(key=lambda sc: (len(sc[0]), sc[0]))

    def _penalty(self, surf: str) -> int:
        # ja/ViterbiNBest.java:88-102 (search mode only)
        if self.mode != "search":
            return 0
        n = len(surf)
        if n > _SEARCH_KANJI_LEN and all(
                char_class(c) == KANJI for c in surf):
            return (n - _SEARCH_KANJI_LEN) * _SEARCH_KANJI_PEN
        if n > _SEARCH_OTHER_LEN:
            return (n - _SEARCH_OTHER_LEN) * _SEARCH_OTHER_PEN
        return 0

    def segment(self, text: str) -> list[tuple[str, int, int, bool]]:
        """Min-cost segmentation → ``(surface, start, end, is_known)``.

        Mirrors morph/Viterbi.java's forward pass: dictionary candidates
        at every position; unknown candidates when no dictionary word
        starts there or the char class has invoke=1; grouped unknowns
        extend over the same-class run (group=1), else one char."""
        n = len(text)
        if not n:
            return []
        INF = float("inf")
        best = [INF] * (n + 1)       # min cost reaching position i
        back: list[tuple[int, str, bool] | None] = [None] * (n + 1)
        btype = [_BOS] * (n + 1)     # token type of the arc ending at i
        best[0] = 0
        conn = self.conn
        for pos in range(n):
            if best[pos] is INF:
                continue
            base, left = best[pos], btype[pos]
            any_match = False
            for surf, cost in self._by_first.get(text[pos], ()):
                if text.startswith(surf, pos):
                    any_match = True
                    tot = (base + conn[(left, _DICT)] + cost
                           + self._penalty(surf))
                    end = pos + len(surf)
                    if tot < best[end]:
                        best[end], btype[end] = tot, _DICT
                        back[end] = (pos, surf, True)
            cls = char_class(text[pos])
            if not any_match or cls in _INVOKE:
                # processUnknownWord (morph/Viterbi.java:370-372)
                ln = 1
                if cls in _GROUP:
                    while (pos + ln < n and ln < MAX_UNKNOWN_WORD_LENGTH
                           and char_class(text[pos + ln]) == cls):
                        ln += 1
                tot = (base + conn[(left, _UNK)] + self.unk_cost
                       + (ln - 1) * self.unk_char_cost)
                end = pos + ln
                if tot < best[end]:
                    best[end], btype[end] = tot, _UNK
                    back[end] = (pos, text[pos:end], False)
        if best[n] is INF:           # unreachable: unknowns always step
            raise AssertionError("lattice has no path")
        out: list[tuple[str, int, int, bool]] = []
        i = n
        while i > 0:
            pos, surf, known = back[i]          # type: ignore[misc]
            out.append((surf, pos, i, known))
            i = pos
        out.reverse()
        return out

    def tokenize(self, text: str) -> list[str]:
        return [s for s, _, _, _ in self.segment(text)]


def lattice_tokenize_fn(lexicon: dict[str, int], mode: str = "normal"):
    """``tokenize_fn`` hook factory for ``build_index`` — the tokenizer
    (and its first-char index) is built once per call site / actor."""
    tok = LatticeTokenizer(lexicon, mode=mode)
    return lambda text: tok.tokenize(text)
