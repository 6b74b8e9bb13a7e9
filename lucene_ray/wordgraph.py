"""WordDelimiterGraphFilter: subword splitting with a correct token graph.

Reproduces the reference semantics of
``analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java:88``
(buffering/emission/concatenation rules, PositionSorter order) and
``WordDelimiterIterator.java:31`` (char typing, break rules, bounds,
English-possessive stemming) as a pure per-token Python function — the
vocab-level slot of this engine's analysis chain (the same level as the
English chain and CJK bigrams): splits run inside ``map_batches`` over
the term stream, so the filter itself needs no distributed state.

Rules (WordDelimiterGraphFilter.java:44-88 javadoc):
- split on intra-word delimiters (non-alphanumeric), case transitions
  (lower->UPPER only; UPPER->lower does NOT split), letter<->number
  transitions; leading/trailing delimiters ignored; trailing "'s"
  stemmed per subword.
- GENERATE_* emit the parts; CATENATE_WORDS/NUMBERS emit maximal
  same-type runs at the run's last position; CATENATE_ALL smushes all
  parts; PRESERVE_ORIGINAL emits the unchanged token first with
  position length spanning the whole graph.
"""

from __future__ import annotations

import unicodedata

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

WDGF_ALL = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
            | CATENATE_NUMBERS | CATENATE_ALL | PRESERVE_ORIGINAL
            | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
            | STEM_ENGLISH_POSSESSIVE)

# char-type bit lattice (WordDelimiterIterator.java:29-36): ALPHA has
# BOTH case bits so Lt/Lm/Lo/marks count as "upper" for the
# UPPER->letter no-break rule
LOWER, UPPER, DIGIT, SUBWORD_DELIM = 0x01, 0x02, 0x04, 0x08
ALPHA = LOWER | UPPER

_DONE = -1


def _char_type(ch: str) -> int:
    """WordDelimiterIterator.getType (Character.getType switch)."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return UPPER
    if cat == "Ll":
        return LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return ALPHA
    if cat in ("Nd", "Nl", "No"):
        return DIGIT
    return SUBWORD_DELIM


class _Iter:
    """WordDelimiterIterator.java:148 next() state machine."""

    def __init__(self, text: str, split_case: bool, split_num: bool,
                 stem_poss: bool):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = False
        self.has_final_possessive = False
        # setBounds: strip leading/trailing delimiters; note (don't yet
        # remove) a final possessive
        while (self.start_bounds < self.length
               and _char_type(text[self.start_bounds]) == SUBWORD_DELIM):
            self.start_bounds += 1
        while (self.end_bounds > self.start_bounds
               and _char_type(text[self.end_bounds - 1]) == SUBWORD_DELIM):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def _ends_with_possessive(self, pos: int) -> bool:
        return (self.stem_poss and pos > 2
                and self.text[pos - 2] == "'"
                and self.text[pos - 1] in "sS"
                and bool(_char_type(self.text[pos - 3]) & ALPHA)
                and (pos == self.end_bounds
                     or _char_type(self.text[pos]) == SUBWORD_DELIM))

    def _is_break(self, last: int, t: int) -> bool:
        if t & last:
            return False
        if not self.split_case and (last & ALPHA) and (t & ALPHA):
            return False
        if (last & UPPER) and (t & ALPHA):
            return False            # UPPER->letter: don't split
        if not self.split_num and (((last & ALPHA) and (t & DIGIT))
                                   or ((last & DIGIT) and (t & ALPHA))):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last = 0
        while self.current < self.end_bounds:
            last = _char_type(self.text[self.current])
            if last != SUBWORD_DELIM:
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = _char_type(self.text[self.end])
            if self._is_break(last, t):
                break
            last = t
            self.end += 1
        if (self.end < self.end_bounds - 1
                and self._ends_with_possessive(self.end + 2)):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = _char_type(self.text[self.current])
        return ALPHA if t in (LOWER, UPPER) else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (self.current == self.start_bounds
                    and self.end == self.end_bounds - 2)
        return (self.current == self.start_bounds
                and self.end == self.end_bounds)


class _Concat:
    """WordDelimiterGraphFilter.WordDelimiterConcatenation role."""

    def __init__(self):
        self.clear()

    def add(self, term: str, s: int, e: int, wtype: int, word_pos: int):
        if not self.parts:
            self.type = wtype
            self.start_part = s
            self.start_pos = word_pos
        self.parts.append(term[s:e])
        self.end_part = e

    @property
    def count(self) -> int:
        return len(self.parts)

    def text(self) -> str:
        return "".join(self.parts)

    def clear(self):
        self.parts: list[str] = []
        self.type = 0
        self.start_part = self.end_part = self.start_pos = 0


def word_delimiter_graph(term: str, flags: int = WDGF_ALL,
                         prot_words: "set[str] | None" = None
                         ) -> list[tuple[str, int, int]]:
    """Split one token into its WDGF graph: list of
    ``(text, startPos, endPos)`` in the reference's emission order
    (PRESERVE_ORIGINAL first, then PositionSorter: startPart asc,
    endPart desc — WordDelimiterGraphFilter.java:444). Position length
    is ``endPos - startPos``; a token with no delimiters (or protected)
    passes through unchanged; an all-delimiter token is swallowed
    unless PRESERVE_ORIGINAL."""
    def has(f: int) -> bool:
        return bool(flags & f)

    def should_generate(wtype: int) -> bool:
        return ((has(GENERATE_WORD_PARTS) and bool(wtype & ALPHA))
                or (has(GENERATE_NUMBER_PARTS) and bool(wtype & DIGIT)))

    it = _Iter(term, has(SPLIT_ON_CASE_CHANGE), has(SPLIT_ON_NUMERICS),
               has(STEM_ENGLISH_POSSESSIVE))
    it.next()
    # word of no delimiters, or protected word: just return it
    if (it.current == 0 and it.end == len(term)) or \
            (prot_words is not None and term in prot_words):
        return [(term, 0, 1)]
    # word of simply delimiters: swallowed (a position hole) unless
    # PRESERVE_ORIGINAL
    if it.end == _DONE:
        return [(term, 0, 1)] if has(PRESERVE_ORIGINAL) else []

    # bufferWordParts (WordDelimiterGraphFilter.java:254)
    buffered: list[list] = []       # [text|None, sPos, ePos, sPart, ePart]
    word_pos = 0
    concat, concat_all = _Concat(), _Concat()
    last_concat_count = 0

    if has(PRESERVE_ORIGINAL):
        buffered.append([None, 0, 1, 0, len(term)])

    def flush(c: _Concat):
        nonlocal word_pos, last_concat_count
        if word_pos == c.start_pos:
            # not generating parts → advance the graph position now
            word_pos += 1
        last_concat_count = c.count
        if c.count != 1 or not should_generate(c.type):
            buffered.append([c.text(), c.start_pos, word_pos,
                             c.start_part, c.end_part])
        c.clear()

    if it.is_single_word():
        buffered.append([None, word_pos, word_pos + 1, it.current, it.end])
        word_pos += 1
        it.next()
    else:
        while it.end != _DONE:
            wtype = it.type()
            if concat.count and (concat.type & wtype) == 0:
                flush(concat)
            if ((has(CATENATE_WORDS) and (wtype & ALPHA))
                    or (has(CATENATE_NUMBERS) and (wtype & DIGIT))):
                concat.add(term, it.current, it.end, wtype, word_pos)
            if has(CATENATE_ALL):
                concat_all.add(term, it.current, it.end, wtype, word_pos)
            if should_generate(wtype):
                buffered.append([None, word_pos, word_pos + 1,
                                 it.current, it.end])
                word_pos += 1
            it.next()
        if concat.count:
            flush(concat)
        if concat_all.count:
            # only if the same combo wasn't just written (e.g. PowerShot
            # with CATENATE_WORDS)
            if concat_all.count > last_concat_count:
                if word_pos == concat_all.start_pos:
                    word_pos += 1
                buffered.append([concat_all.text(), concat_all.start_pos,
                                 word_pos, concat_all.start_part,
                                 concat_all.end_part])
            concat_all.clear()

    if has(PRESERVE_ORIGINAL):
        if word_pos == 0:           # strange flag combos
            word_pos = 1
        buffered[0][2] = word_pos   # original spans the whole graph

    head = buffered[:1] if has(PRESERVE_ORIGINAL) else []
    tail = buffered[1:] if has(PRESERVE_ORIGINAL) else buffered
    tail.sort(key=lambda b: (b[3], -b[4]))   # PositionSorter
    return [(b[0] if b[0] is not None else term[b[3]:b[4]], b[1], b[2])
            for b in head + tail]


def wdgf_stream(tokens: list[str], flags: int = WDGF_ALL,
                prot_words: "set[str] | None" = None) -> list[str]:
    """Flatten a whitespace token stream through the filter (term text
    only, graph order) — the analysis-chain hook shape used by the
    pipeline gates (positions carried separately where needed)."""
    out: list[str] = []
    for t in tokens:
        out.extend(p[0] for p in word_delimiter_graph(t, flags, prot_words))
    return out
