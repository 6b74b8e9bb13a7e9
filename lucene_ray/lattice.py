"""Dictionary-lattice CJK segmentation (kuromoji + nori + smartcn roles).

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

The same Viterbi core serves all three of the reference's
morphological analyzers: Japanese (``analysis/ja``, above), Korean
(``analysis/ko`` — :class:`KoreanTokenizer` below adds nori's
decompound modes, POS stop filtering and reading form), and Chinese
(``analysis/cn/smart`` — a word-cost lexicon over
:class:`LatticeTokenizer` reproduces the dictionary-probability
segmentation path; see tests/test_lattice.py).
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
        # one O(n) pass: char classes + end of each same-class run, so
        # grouped-unknown candidates don't re-walk the run per position
        # (all-HANGUL/kana text would otherwise make this O(n^2))
        classes = [char_class(c) for c in text]
        run_end = [n] * n
        for i in range(n - 2, -1, -1):
            run_end[i] = run_end[i + 1] if classes[i] == classes[i + 1] \
                else i + 1
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
            cls = classes[pos]
            if not any_match or cls in _INVOKE:
                # processUnknownWord (morph/Viterbi.java:370-372)
                ln = 1
                if cls in _GROUP:
                    ln = min(run_end[pos] - pos, MAX_UNKNOWN_WORD_LENGTH)
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


# ---------------------------------------------------------------------------
# Korean (nori role)

# Hangul ranges for the character-class extension: the reference's
# ko/dict/CharacterDefinition maps Hangul syllables + jamo to HANGUL and
# Han ideographs used in Korean to HANJA.
HANGUL, HANJA = 6, 7


def korean_char_class(ch: str) -> int:
    o = ord(ch)
    if 0xAC00 <= o <= 0xD7A3 or 0x1100 <= o <= 0x11FF \
            or 0x3130 <= o <= 0x318F:
        return HANGUL
    if (0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF
            or 0xF900 <= o <= 0xFAFF):
        return HANJA
    return char_class(ch)


# KoreanPartOfSpeechStopFilter.DEFAULT_STOP_TAGS
# (analysis/ko/KoreanPartOfSpeechStopFilter.java:38): particles,
# endings, affixes and the other functional categories nori drops by
# default.
KOREAN_DEFAULT_STOP_TAGS = frozenset({
    "E", "IC", "J", "MAG", "MAJ", "MM", "SP", "SSC", "SSO", "SC", "SE",
    "XPN", "XSA", "XSN", "XSV", "UNA", "NA", "VSV",
})


class KoreanEntry:
    """One user-dictionary row (ko/dict/UserDictionary.java:42 shape):
    surface, word cost, POS tag, optional hanja→hangul ``reading``
    (ko/KoreanReadingFormFilter.java:30), optional ``parts`` for
    compounds (the user-dictionary "surface seg1 seg2 …" syntax)."""

    __slots__ = ("surface", "cost", "pos", "reading", "parts")

    def __init__(self, surface: str, cost: int = 100, pos: str = "NNG",
                 reading: "str | None" = None,
                 parts: "list[str] | None" = None):
        if parts is not None and "".join(parts) != surface:
            raise ValueError(
                f"compound parts {parts!r} don't spell {surface!r}")
        self.surface = surface
        self.cost = cost
        self.pos = pos
        self.reading = reading
        self.parts = parts


class KoreanTokenizer:
    """nori-role morphological tokenizer
    (analysis/ko/KoreanTokenizer.java:92): the shared Viterbi lattice
    core segments against the user lexicon; per-token metadata then
    applies the reference's Korean post-stages —

    * **decompound modes** (KoreanTokenizer.DecompoundMode): ``none``
      keeps compounds whole; ``discard`` replaces a compound with its
      parts; ``mixed`` emits the compound (posLength = #parts) AND its
      parts as a token graph.
    * **POS stop filtering** (KoreanPartOfSpeechStopFilter.java:38):
      tokens whose tag is in ``stop_tags`` are dropped (positions are
      preserved by the caller's graph machinery; for the flat
      ``tokenize`` view they simply vanish).
    * **reading form** (KoreanReadingFormFilter.java:30): with
      ``reading_form=True`` a token with a recorded reading (hanja →
      hangul) is emitted as that reading.

    Unknown runs fall out of the lattice exactly as in the Japanese
    path (char-class grouping); they carry the tag ``"UNKNOWN"``.
    """

    def __init__(self, entries: "list[KoreanEntry]", *,
                 decompound: str = "discard",
                 stop_tags: "frozenset[str] | None" = None,
                 reading_form: bool = False, mode: str = "normal"):
        if decompound not in ("none", "discard", "mixed"):
            raise ValueError(f"decompound {decompound!r}")
        self.decompound = decompound
        self.stop_tags = (KOREAN_DEFAULT_STOP_TAGS if stop_tags is None
                          else stop_tags)
        self.reading_form = reading_form
        self._meta: dict[str, KoreanEntry] = {}
        for e in entries:
            if e.surface in self._meta:
                raise ValueError(f"duplicate surface {e.surface!r}")
            self._meta[e.surface] = e
        self._lat = LatticeTokenizer(
            {e.surface: e.cost for e in entries}, mode=mode)

    def _stopped(self, pos_tag: str) -> bool:
        return (pos_tag.split("+", 1)[0] in self.stop_tags
                or pos_tag in self.stop_tags)

    def segment_graph(self, text: str):
        """→ ``(surface, pos_tag, start, end, pos_inc, pos_len)`` rows,
        the token-graph view. Mixed mode stacks the compound over its
        first part (compound posInc 1 / posLength = #parts, first part
        posInc 0) — the reference's graph shape. Stopped tokens donate
        their increment to the next emitted token, as
        StopFilter/enablePositionIncrements does."""
        out = []
        skipped = 0                              # accumulated stopped incs

        def emit(surface, tag, start, end, inherent_inc, pos_len):
            nonlocal skipped
            if self._stopped(tag):
                skipped += inherent_inc
                return
            e = self._meta.get(surface)
            if self.reading_form and e is not None and e.reading:
                surface = e.reading
            out.append((surface, tag, start, end,
                        inherent_inc + skipped, pos_len))
            skipped = 0

        for surf, start, end, known in self._lat.segment(text):
            e = self._meta.get(surf) if known else None
            tag = e.pos if e is not None else "UNKNOWN"
            parts = e.parts if e is not None else None
            if parts and self.decompound != "none":
                if self.decompound == "mixed":
                    emit(surf, tag, start, end, 1, len(parts))
                off = start
                for j, p in enumerate(parts):
                    pe = self._meta.get(p)
                    ptag = pe.pos if pe is not None else tag
                    first_inc = 0 if self.decompound == "mixed" else 1
                    emit(p, ptag, off, off + len(p),
                         first_inc if j == 0 else 1, 1)
                    off += len(p)
                continue
            emit(surf, tag, start, end, 1, 1)
        return out

    def tokenize(self, text: str) -> "list[str]":
        return [t[0] for t in self.segment_graph(text)]


def korean_tokenize_fn(entries: "list[KoreanEntry]", **kw):
    """``tokenize_fn`` hook factory (actor-once construction)."""
    tok = KoreanTokenizer(entries, **kw)
    return lambda text: tok.tokenize(text)
