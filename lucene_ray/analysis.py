"""StandardAnalyzer semantics, vectorized for Ray Data batches.

Reproduces the reference analysis chain — StandardTokenizer (UAX#29 word
break, JFlex grammar at
``lucene/core/src/java/org/apache/lucene/analysis/standard/StandardTokenizerImpl.jflex``)
→ LowerCaseFilter (``analysis/LowerCaseFilter.java:23``) → StopFilter with the
**empty** default stop set (``analysis/standard/StandardAnalyzer.java:51-53``)
— as a single vectorized pass over all documents of a batch.

Semantics implemented (pinned by the reference's own
``TestStandardAnalyzer.java`` cases, mirrored in tests/test_analysis.py):

- WB5/8/9/10: letters and digits join: ``a1b2`` → one token.
- WB6/7:  ``X (MidLetter|MidNumLet|') X`` joins letters: ``A.B``/``A:B``/
  ``O'Reilly`` are single tokens; ``A..B``/``A.:B`` split.
- WB11/12: ``N (MidNum|MidNumLet|') N`` joins digits: ``3.14``, ``1,2``.
- WB13a/b: ExtendNumLet (``_`` etc.) joins on either side: ``foo_bar``,
  ``A:B_A:B``; a run with no letter/digit/katakana core (``"__"``) is
  dropped (the WORD/NUMERIC grammar rules require at least one core char).
- WB4: Extend/Format/ZWJ attach to the preceding char.
- WB13: Katakana joins only Katakana (plus ExtendNumLet).
- Han / Hiragana: one token per char (WB999); SE-Asian scripts: kept as runs
  (the grammar's LB:Complex_Context rule).
- Max token length 255 (UTF-16 units, ``StandardAnalyzer.java:37``): longer
  matches are chopped at the longest *accepted* prefix that fits in the
  scanner buffer and scanning resumes, per the JFlex ``%buffer 255``
  (behavior pinned by TestStandardAnalyzer.testMaxTokenLength*: ``toolong``
  at maxLen 5 → ``toolo``, ``ng``).
- LowerCaseFilter: per-codepoint Character.toLowerCase (simple mapping —
  U+0130 maps to 'i', unlike Python's full lowercase).

Deliberate simplifications (documented divergences, unreachable for the
source-code corpus): Hebrew-letter quote rules WB7a-c and the emoji grammar
are not implemented — those char classes get generic handling.

Field length = token count (position increment is always 1 ⇒ numOverlap = 0,
``index/FieldInvertState.java:34-43``); the norm byte is
SmallFloat.intToByte4(length) (``search/similarities/Similarity.java:152-163``).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .smallfloat import int_to_byte4

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH (":37")

# ---------------------------------------------------------------------------
# Word-break character classes (UAX#29 WordBreakProperty subset used by the
# JFlex grammar).
OTHER, LETTER, NUM, MIDLETTER, MIDNUM, MIDNUMLET, SQ, EXTNUMLET, EXTFMT, \
    KATAKANA, HAN, HIRAGANA, SEA = range(13)

_MIDS = (MIDLETTER, MIDNUM, MIDNUMLET, SQ)

# boolean property tables indexed by class id (fast replacement for np.isin)
_N_CLS = 13


def _prop(classes) -> np.ndarray:
    t = np.zeros(_N_CLS, dtype=bool)
    t[list(classes)] = True
    return t


P_CORE = _prop((LETTER, NUM, EXTNUMLET, KATAKANA, HAN, HIRAGANA, SEA))
P_AN = _prop((LETTER, NUM))
P_MID = _prop(_MIDS)
P_ENL_OK = _prop((LETTER, NUM, KATAKANA, EXTNUMLET))
P_HASCORE = _prop((LETTER, NUM, KATAKANA, HAN, HIRAGANA, SEA))

_MIDLETTER_CP = {0x3A, 0xB7, 0x387, 0x55F, 0x5F4, 0x2027, 0xFE13, 0xFE55,
                 0xFF1A, 0x2D7}
_MIDNUM_CP = {0x2C, 0x3B, 0x37E, 0x589, 0x60C, 0x60D, 0x66C, 0x7F8, 0x2044,
              0xFE10, 0xFE14, 0xFE50, 0xFE54, 0xFF0C, 0xFF1B}
_MIDNUMLET_CP = {0x2E, 0x2019, 0x2024, 0xFE52, 0xFF07, 0xFF0E}
_SQ_CP = {0x27}
_EXTNUMLET_EXTRA = {0x202F}  # NARROW NO-BREAK SPACE is WB:ExtendNumLet

# Script ranges (complete for the chars a realistic corpus hits)
_KATAKANA_RANGES = [(0x30A1, 0x30FA), (0x30FC, 0x30FF), (0x31F0, 0x31FF),
                    (0xFF66, 0xFF9D), (0x1B000, 0x1B000)]
_HIRAGANA_RANGES = [(0x3041, 0x3096), (0x309D, 0x309F), (0x1B001, 0x1B11E)]
_HAN_RANGES = [(0x3005, 0x3005), (0x3007, 0x3007), (0x3400, 0x4DBF),
               (0x4E00, 0x9FFF), (0xF900, 0xFA6D), (0x20000, 0x2A6DF),
               (0x2A700, 0x2EBEF)]
_SEA_RANGES = [(0x0E01, 0x0E3A), (0x0E40, 0x0E4E),         # Thai
               (0x0E81, 0x0EDF),                            # Lao
               (0x1000, 0x109F), (0xAA60, 0xAA7F),          # Myanmar
               (0x1780, 0x17DD), (0x17E0, 0x17E9)]          # Khmer


def _classify_cp(cp: int) -> int:
    if cp in _MIDNUMLET_CP:
        return MIDNUMLET
    if cp in _SQ_CP:
        return SQ
    if cp in _MIDLETTER_CP:
        return MIDLETTER
    if cp in _MIDNUM_CP:
        return MIDNUM
    ch = chr(cp)
    cat = unicodedata.category(ch)
    for lo, hi in _SEA_RANGES:
        if lo <= cp <= hi:
            return NUM if cat == "Nd" else SEA
    for lo, hi in _HAN_RANGES:
        if lo <= cp <= hi:
            return HAN
    for lo, hi in _HIRAGANA_RANGES:
        if lo <= cp <= hi:
            return HIRAGANA
    for lo, hi in _KATAKANA_RANGES:
        if lo <= cp <= hi:
            return KATAKANA
    if cat == "Nd":
        return NUM
    if cat == "Pc" or cp in _EXTNUMLET_EXTRA:
        return EXTNUMLET
    if cat in ("Mn", "Mc", "Me") or (cat == "Cf" and cp != 0x200B):
        return EXTFMT  # WB:Extend / WB:Format / ZWJ (WB4 attachment)
    if cat in ("Lu", "Ll", "Lt", "Lm", "Lo", "Nl"):
        return LETTER  # WB:ALetter (incl. Hebrew letters and Hangul)
    return OTHER


_BMP_LUT: np.ndarray | None = None
_LOWER_LUT: np.ndarray | None = None
_ASTRAL_CLS: dict[int, int] = {}


def _luts() -> tuple[np.ndarray, np.ndarray]:
    """(word-break class, simple-lowercase) LUTs for the BMP; built once per
    worker process (the tokenizer's only per-worker state)."""
    global _BMP_LUT, _LOWER_LUT
    if _BMP_LUT is None:
        cls = np.empty(0x10000, dtype=np.uint8)
        low = np.arange(0x10000, dtype=np.uint32)
        for cp in range(0x10000):
            cls[cp] = _classify_cp(cp)
            lc = chr(cp).lower()
            if len(lc) == 1:
                low[cp] = ord(lc)
            elif cp == 0x130:  # Java Character.toLowerCase(İ) == 'i'
                low[cp] = 0x69
            # other multi-char lowerings keep the original char (simple map)
        _BMP_LUT, _LOWER_LUT = cls, low
    return _BMP_LUT, _LOWER_LUT


def _classes(codes: np.ndarray) -> np.ndarray:
    lut, _ = _luts()
    cls = lut[np.minimum(codes, 0xFFFF)]
    astral = codes > 0xFFFF
    if astral.any():
        for i in np.flatnonzero(astral):
            cp = int(codes[i])
            c = _ASTRAL_CLS.get(cp)
            if c is None:
                c = _classify_cp(cp)
                _ASTRAL_CLS[cp] = c
            cls[i] = c
    return cls


def _lower_codes(codes: np.ndarray) -> np.ndarray:
    _, low = _luts()
    out = np.where(codes <= 0xFFFF, low[np.minimum(codes, 0xFFFF)], codes)
    astral = codes > 0xFFFF
    if astral.any():
        for i in np.flatnonzero(astral):
            lc = chr(int(codes[i])).lower()
            if len(lc) == 1:
                out[i] = ord(lc)
    return out.astype(np.uint32)


# ---------------------------------------------------------------------------
# Core word-break pass (one call per batch).

def _span_bounds(codes: np.ndarray, cls: np.ndarray
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Raw token spans [start, end) in codepoint indices (no max-length)."""
    n = len(codes)
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    is_ext = cls == EXTFMT
    has_ext = bool(is_ext.any())
    if has_ext:
        idx = np.arange(n, dtype=np.int32)
        src = np.maximum.accumulate(np.where(is_ext, np.int32(-1), idx))
        eff = np.where(src >= 0, cls[np.maximum(src, 0)], OTHER).astype(np.uint8)
    else:
        eff = cls

    core = P_CORE[eff]

    prv = np.empty(n, dtype=np.uint8)
    prv[0] = OTHER
    prv[1:] = eff[:-1]
    # raw class of the next non-Extend char (for mid-join lookahead)
    if has_ext:
        idx2 = np.arange(n, dtype=np.int32)
        nxt_src = np.minimum.accumulate(
            np.where(is_ext, np.int32(n), idx2)[::-1])[::-1]
        nxt = np.full(n, OTHER, dtype=np.uint8)
        nxt_from = np.empty(n, dtype=np.int32)
        nxt_from[:-1] = nxt_src[1:]
        nxt_from[-1] = n
        ok = nxt_from < n
        nxt[ok] = cls[nxt_from[ok]]
    else:
        nxt = np.empty(n, dtype=np.uint8)
        nxt[:-1] = cls[1:]
        nxt[-1] = OTHER

    is_mid = P_MID[eff]
    letters_both = (prv == LETTER) & (nxt == LETTER)
    nums_both = (prv == NUM) & (nxt == NUM)
    join = ((eff == MIDLETTER) & letters_both) \
        | ((eff == MIDNUM) & nums_both) \
        | (((eff == MIDNUMLET) | (eff == SQ)) & (letters_both | nums_both))
    member = core | (is_mid & join)
    if has_ext:
        member = np.where(is_ext & (src >= 0),
                          member[np.maximum(src, 0)], member)

    # joins between consecutive member chars
    both_an = P_AN[prv] & P_AN[eff]
    kk = (prv == KATAKANA) & (eff == KATAKANA)
    sea = (prv == SEA) & (eff == SEA)
    enl = ((prv == EXTNUMLET) & P_ENL_OK[eff]) \
        | ((eff == EXTNUMLET) & P_ENL_OK[prv])
    mid_l = P_MID[prv] | P_MID[eff]
    joinable = both_an | kk | sea | enl | mid_l
    if has_ext:
        joinable |= is_ext  # WB4: no break before Extend

    prev_member = np.empty(n, dtype=bool)
    prev_member[0] = False
    prev_member[1:] = member[:-1]
    starts = np.flatnonzero(member & (~prev_member | ~joinable))
    if len(starts) == 0:
        return starts.astype(np.int64), starts.astype(np.int64)
    bounds = np.zeros(n + 1, dtype=bool)
    bounds[starts] = True
    bounds[np.flatnonzero(~member)] = True
    bounds[n] = True
    all_b = np.flatnonzero(bounds)
    ends = all_b[np.searchsorted(all_b, starts + 1)]
    return starts.astype(np.int64), ends.astype(np.int64)


def _accept_end(cls: np.ndarray, start: int, end: int) -> int:
    """Longest accepted prefix end in [start, end): a match may not end on a
    dangling mid char (mirrors the grammar's accepting states)."""
    e = end
    while e > start:
        e2 = e
        while e2 > start and cls[e2 - 1] == EXTFMT:
            e2 -= 1
        if e2 == start:
            return start
        if cls[e2 - 1] in _MIDS:
            e = e2 - 1
            continue
        return e
    return start


_CORE_CLASSES = (LETTER, NUM, KATAKANA, HAN, HIRAGANA, SEA)


def _split_long_span(codes: np.ndarray, cls: np.ndarray, s: int, e: int,
                     max_len: int) -> list[tuple[int, int]]:
    """JFlex buffer emulation for a span longer than max_len UTF-16 units:
    repeatedly emit the longest accepted prefix that fits, resume after it."""
    out: list[tuple[int, int]] = []
    units = np.where(codes[s:e] > 0xFFFF, 2, 1).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(units)])  # utf-16 len of codes[s:s+i]
    pos = s
    while pos < e:
        while pos < e and (cls[pos] in _MIDS or cls[pos] == EXTFMT):
            pos += 1  # a match cannot start on a mid/extend char
        if pos >= e:
            break
        # furthest w with utf16len(codes[pos:w]) <= max_len
        w = s + int(np.searchsorted(cum, cum[pos - s] + max_len, side="right")) - 1
        if w >= e:
            if _has_core(cls, pos, e):
                out.append((pos, e))
            break
        acc = _accept_end(cls, pos, w)
        if acc <= pos:
            pos += 1
            continue
        if _has_core(cls, pos, acc):
            out.append((pos, acc))
        pos = acc
    return out


def _has_core(cls: np.ndarray, s: int, e: int) -> bool:
    return bool(P_HASCORE[cls[s:e]].any())


def _token_spans(codes: np.ndarray, cls: np.ndarray,
                 max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Final token spans: word-break pass + max-length splitting + the
    drop-if-no-core rule. Returns (starts, ends) codepoint indices."""
    starts, ends = _span_bounds(codes, cls)
    if len(starts) == 0:
        return starts, ends
    span_lens = ends - starts

    # no-core check: a span can only lack a core char if it starts with
    # ExtendNumLet (mids/extends cannot start a span) — check those few.
    has_core = np.ones(len(starts), dtype=bool)
    enl_start = np.flatnonzero(cls[starts] == EXTNUMLET)
    for i in enl_start:
        has_core[i] = _has_core(cls, int(starts[i]), int(ends[i]))

    # too-long check: utf-16 length == codepoint length unless the span
    # contains astral chars (rare) — avoid char-level cumsums on the fast
    # path.
    if codes.max(initial=0) > 0xFFFF:
        units = np.where(codes > 0xFFFF, 2, 1)
        cum_u = np.concatenate([[0], np.cumsum(units)])
        too_long = (cum_u[ends] - cum_u[starts]) > max_len
    else:
        too_long = span_lens > max_len

    keep = has_core & ~too_long
    if too_long.any():
        extra: list[tuple[int, int]] = []
        for s, e in zip(starts[too_long], ends[too_long]):
            extra.extend(_split_long_span(codes, cls, int(s), int(e), max_len))
        if extra:
            es = np.array([p for p, _ in extra], dtype=np.int64)
            ee = np.array([q for _, q in extra], dtype=np.int64)
            starts = np.concatenate([starts[keep], es])
            ends = np.concatenate([ends[keep], ee])
            order = np.argsort(starts, kind="stable")
            return starts[order], ends[order]
    return starts[keep], ends[keep]


# ---------------------------------------------------------------------------
# Public API

def tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """StandardAnalyzer on one string → list of lowercased tokens."""
    if not text:
        return []
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    cls = _classes(codes)
    starts, ends = _token_spans(codes, cls, max_token_length)
    low = _lower_codes(codes)
    return [
        low[s:e].tobytes().decode("utf-32-le") for s, e in zip(starts, ends)
    ]


def tokenize_with_offsets(text: str,
                          max_token_length: int = MAX_TOKEN_LENGTH
                          ) -> tuple[list[str], np.ndarray, np.ndarray]:
    """StandardAnalyzer with character offsets — the OffsetAttribute
    surface (analysis/tokenattributes/OffsetAttribute.java; the
    IndexOptions ..._AND_OFFSETS payload, index/IndexOptions.java:26).
    Returns (tokens, start_offsets, end_offsets) where offsets are
    codepoint indices into ``text`` (== Python string indices)."""
    if not text:
        return [], np.empty(0, np.int64), np.empty(0, np.int64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    cls = _classes(codes)
    starts, ends = _token_spans(codes, cls, max_token_length)
    low = _lower_codes(codes)
    toks = [low[s:e].tobytes().decode("utf-32-le")
            for s, e in zip(starts, ends)]
    return toks, starts.astype(np.int64), ends.astype(np.int64)


_CHUNK_CHARS = 2_000_000


def analyze_batch(texts: list[str],
                  max_token_length: int = MAX_TOKEN_LENGTH
                  ) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch of documents, vectorized.

    Internally processes ~2M chars at a time: this bounds the working set
    of the per-chunk temporaries so a worker's heap is touched once and
    reused (first-touch page faults are expensive in this sandbox), while
    still amortizing every numpy call over thousands of documents.

    Returns (tokens: pa.Array, owners: int64, lengths: int32, norms: uint8).
    """
    texts = ["" if t is None else t for t in texts]
    n_docs = len(texts)
    total_chars = sum(len(t) for t in texts)
    if n_docs == 0 or total_chars <= _CHUNK_CHARS:
        return _analyze_chunk(texts, max_token_length)
    tok_parts, own_parts, len_parts, norm_parts = [], [], [], []
    start = 0
    chars = 0
    for i, t in enumerate(texts):
        chars += len(t)
        if chars >= _CHUNK_CHARS or i == n_docs - 1:
            tk, ow, ln, nm = _analyze_chunk(texts[start:i + 1],
                                            max_token_length)
            tok_parts.append(tk)
            own_parts.append(ow + start)
            len_parts.append(ln)
            norm_parts.append(nm)
            start = i + 1
            chars = 0
    import pyarrow as _pa
    tokens = _pa.concat_arrays([_pa.array([], type=_pa.string())] +
                               [p.combine_chunks() if hasattr(p, "combine_chunks") else p
                                for p in tok_parts])
    return (tokens, np.concatenate(own_parts),
            np.concatenate(len_parts), np.concatenate(norm_parts))


def _analyze_chunk(texts: list[str],
                   max_token_length: int = MAX_TOKEN_LENGTH
                   ) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a whole batch in one vectorized pass.

    Returns ``(tokens, owners, lengths, norms)`` where ``tokens`` is a
    pyarrow string array of every token in the batch (lowercased),
    ``owners`` is the int64 doc index (within the batch) of each token,
    ``lengths`` the per-doc field length (int32) and ``norms`` the per-doc
    norm byte (uint8).

    The whole batch is concatenated with a NUL separator so the word-break
    pass runs once; token strings are materialized as a single Arrow string
    array built from offsets into one contiguous buffer (no per-token Python
    objects on the ASCII fast path).
    """
    texts = ["" if t is None else t for t in texts]
    n_docs = len(texts)
    if n_docs == 0:
        e = np.empty(0, np.int64)
        return pa.array([], type=pa.string()), e, e.astype(np.int32), \
            e.astype(np.uint8)
    joined = "\x00".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    cls = _classes(codes)
    starts, ends = _token_spans(codes, cls, max_token_length)

    doc_start = np.zeros(n_docs, dtype=np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n_docs)
    if n_docs > 1:
        doc_start[1:] = np.cumsum(lens[:-1] + 1)
    owners = np.searchsorted(doc_start, starts, side="right") - 1

    # materialize lowercased token strings as one Arrow array
    span_lens = ends - starts
    total = int(span_lens.sum())
    if total:
        # expand [s, e) ranges into one flat index array
        out_idx = np.repeat(starts - np.concatenate([[0], np.cumsum(span_lens)[:-1]]),
                            span_lens) + np.arange(total)
        tok_codes = _lower_codes(codes[out_idx])
    else:
        tok_codes = np.empty(0, dtype=np.uint32)
    offsets = np.concatenate([[0], np.cumsum(span_lens)]).astype(np.int64)
    if total == 0 or tok_codes.max(initial=0) < 128:
        values = tok_codes.astype(np.uint8).tobytes()
        tokens = pa.LargeStringArray.from_buffers(
            len(starts), pa.py_buffer(offsets.tobytes()), pa.py_buffer(values)
        ).cast(pa.string())
    else:
        # vectorized UTF-8: encode the whole concatenated token string once
        # (C speed), compute per-token byte offsets from per-char byte widths
        values = tok_codes.tobytes().decode("utf-32-le").encode("utf-8")
        blen = (1 + (tok_codes > 0x7F).astype(np.int64)
                + (tok_codes > 0x7FF) + (tok_codes > 0xFFFF))
        bcum = np.concatenate([[0], np.cumsum(blen)])
        boffsets = bcum[offsets]
        tokens = pa.LargeStringArray.from_buffers(
            len(starts), pa.py_buffer(boffsets.tobytes()),
            pa.py_buffer(values)).cast(pa.string())

    lengths = np.bincount(owners, minlength=n_docs).astype(np.int32)
    norms = int_to_byte4(lengths.astype(np.int64))
    return tokens, owners, lengths, norms


# ---------------------------------------------------------------------------
# Fast path: ASCII documents via one compiled regex (C loop, few allocations)

import re as _re
from collections import Counter as _Counter

# Exact ASCII projection of the JFlex WORD/NUMERIC rules: core chars
# [a-z0-9_]; ':' joins letter-letter (MidLetter), '.'/''' join letter-letter
# and digit-digit (MidNumLet/SingleQuote), ','/';' join digit-digit (MidNum).
# Tokenizing lowered text is equivalent for ASCII (case does not change
# word-break classes). Pure-underscore matches are dropped afterwards
# (no-core rule), and any match longer than MAX_TOKEN_LENGTH reroutes the
# document to the exact scanner-buffer emulation.
_ASCII_WORD = _re.compile(
    r"[a-z0-9_]+(?:(?:(?<=[a-z])['.:](?=[a-z])|(?<=[0-9])['.,;](?=[0-9]))"
    r"[a-z0-9_]+)*")


# A 256-run of token-interior chars means a token COULD exceed the max
# length → reroute that doc to the exact scanner (conservative; false
# positives only cost the slow path).
_OVERLONG_RE = _re.compile(r"[a-z0-9_'.:,;]{" + str(MAX_TOKEN_LENGTH + 1)
                           + r"}")
_overlong_res: dict[int, "_re.Pattern[str]"] = {MAX_TOKEN_LENGTH: _OVERLONG_RE}


def _overlong_re(max_token_length: int) -> "_re.Pattern[str]":
    """Overlong-run detector honouring the caller's token-length limit
    (compiled once per distinct limit)."""
    r = _overlong_res.get(max_token_length)
    if r is None:
        r = _re.compile(r"[a-z0-9_'.:,;]{" + str(max_token_length + 1) + r"}")
        _overlong_res[max_token_length] = r
    return r


def token_offsets_batch(texts: list[str],
                        max_token_length: int = MAX_TOKEN_LENGTH,
                        tokenizer=None,
                        char_filter=None
                        ) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-doc token character offsets — the stored OffsetAttribute
    payload of an ``..._AND_OFFSETS`` index (index/IndexOptions.java:26).
    Token stream (and therefore position numbering) is IDENTICAL to
    term_freq_batch's positional path: same ASCII fast path with the
    same pure-underscore drop, same exact-scanner fallback."""
    starts_out: list[np.ndarray] = []
    ends_out: list[np.ndarray] = []
    empty = np.empty(0, np.int32)
    if tokenizer is not None and not hasattr(tokenizer, "with_offsets"):
        raise ValueError("offsets index unsupported for this analyzer: "
                         "the tokenizer provides no offset mapping")
    for text in texts:
        if not text:
            starts_out.append(empty)
            ends_out.append(empty)
            continue
        omap = None
        if char_filter is not None:
            # tokenize the FILTERED text, store offsets corrected back
            # into the ORIGINAL (CharFilter.correctOffset contract)
            text, omap = char_filter(text)
            if not text:
                starts_out.append(empty)
                ends_out.append(empty)
                continue
        if tokenizer is not None:
            _, st, en = tokenizer.with_offsets(text)
            st = np.asarray(st, np.int64)
            en = np.asarray(en, np.int64)
            if omap is not None:
                st = omap.correct_array(st)
                en = omap.correct_array(en)
            starts_out.append(st.astype(np.int32))
            ends_out.append(en.astype(np.int32))
            continue
        if omap is not None:
            _, st, en = tokenize_with_offsets(text, max_token_length)
            starts_out.append(
                omap.correct_array(st.astype(np.int64)).astype(np.int32))
            ends_out.append(
                omap.correct_array(en.astype(np.int64)).astype(np.int32))
            continue
        if text.isascii():
            low = text.lower()
            if _overlong_re(max_token_length).search(low) is None:
                spans = [(m.start(), m.end())
                         for m in _ASCII_WORD.finditer(low)
                         if m.group().strip("_")]
                a = np.array(spans, np.int32).reshape(-1, 2)
                starts_out.append(a[:, 0].copy())
                ends_out.append(a[:, 1].copy())
                continue
        _, st, en = tokenize_with_offsets(text, max_token_length)
        starts_out.append(st.astype(np.int32))
        ends_out.append(en.astype(np.int32))
    return starts_out, ends_out


_HAN_RE = _re.compile(          # Han + ext-A + compat ideographs
    "^[一-鿿㐀-䶿豈-﫿]$")


def cjk_bigram_stream(toks: list[str]) -> list[str]:
    """CJKBigramFilter (analysis/cjk/CJKBigramFilter.java:63, default
    HAN flag): the UAX#29 tokenizer emits one token per Han ideograph;
    runs of >= 2 consecutive ideograph tokens are re-emitted as n-1
    overlapping bigrams (each at posIncrement 1), a lone ideograph stays
    a unigram, everything else passes through — CJKAnalyzer's chain."""
    out: list[str] = []
    i, n = 0, len(toks)
    match = _HAN_RE.match
    while i < n:
        t = toks[i]
        if match(t):
            j = i
            while j + 1 < n and match(toks[j + 1]):
                j += 1
            if j == i:
                out.append(t)
            else:
                out.extend(toks[k] + toks[k + 1] for k in range(i, j))
            i = j + 1
        else:
            out.append(t)
            i += 1
    return out


EDGE_NGRAM_MIN, EDGE_NGRAM_MAX = 2, 5
NGRAM_MIN, NGRAM_MAX = 2, 3


def edge_ngram_stream(toks: list[str]) -> list[str]:
    """EdgeNGramTokenFilter role (analysis/ngram/
    EdgeNGramTokenFilter.java:37): each token emits its front grams of
    sizes [min, min(max, len)]; tokens shorter than minGram emit nothing
    (preserveOriginal=False). Sizes 2..5 here (the autocomplete-useful
    range; the reference's 1/1 defaults are ctor params there too).
    Grams emit as a flat stream — phrase positions are gram-sequential,
    the pre-graph stream behavior."""
    return [t[:g] for t in toks
            for g in range(EDGE_NGRAM_MIN,
                           min(EDGE_NGRAM_MAX, len(t)) + 1)]


def ngram_stream(toks: list[str]) -> list[str]:
    """NGramTokenFilter role (analysis/ngram/NGramTokenFilter.java:33):
    ALL grams of sizes [min, max] at every offset (sizes 2..3 here; the
    reference defaults to 1..2)."""
    return [t[s:s + g] for t in toks
            for g in range(NGRAM_MIN, NGRAM_MAX + 1)
            for s in range(0, len(t) - g + 1)]


LENGTH_MIN, LENGTH_MAX = 3, 8
TRUNCATE_LEN = 5


def length_stream(toks: list[str]) -> list[str]:
    """LengthFilter role (analysis/miscellaneous/LengthFilter.java:29):
    keep tokens whose length is within [min, max] (3..8 here — the
    reference takes both as ctor params)."""
    return [t for t in toks if LENGTH_MIN <= len(t) <= LENGTH_MAX]


def truncate_stream(toks: list[str]) -> list[str]:
    """TruncateTokenFilter role (analysis/miscellaneous/
    TruncateTokenFilter.java:28): cap every token at prefixLength
    (5 here); shorter tokens pass unchanged."""
    return [t[:TRUNCATE_LEN] for t in toks]


def reverse_stream(toks: list[str]) -> list[str]:
    """ReverseStringFilter role (analysis/reverse/
    ReverseStringFilter.java:36): reverse every token (the leading-
    wildcard-query indexing trick)."""
    return [t[::-1] for t in toks]


_COMMON_WORDS: "frozenset[str] | None" = None


def _common_words() -> "frozenset[str]":
    # CommonGramsFilter's common-word set — the English stop set, the
    # reference's canonical pairing (commongrams/CommonGramsFilter.java
    # takes the set as a ctor arg; StopFilterFactory wiring uses the
    # same stop list). Lazy import avoids an analysis<->analysis_en
    # module cycle.
    global _COMMON_WORDS
    if _COMMON_WORDS is None:
        from .analysis_en import ENGLISH_STOP_WORDS
        _COMMON_WORDS = ENGLISH_STOP_WORDS
    return _COMMON_WORDS


def common_grams_stream(toks: list[str]) -> list[str]:
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:49): next
    to each common word, also emit the '_'-joined bigram — pinned by
    TestCommonGramsFilter: "the quick brown" -> the, the_quick, quick,
    brown (the reference emits the bigram at posIncrement 0; the flat
    stream here gives it its own position — same documented divergence
    as the shingle chain)."""
    common = _common_words()
    out: list[str] = []
    prev: "str | None" = None
    for t in toks:
        if prev is not None and (prev in common or t in common):
            out.append(prev + "_" + t)
        out.append(t)
        prev = t
    return out



def common_grams_query_stream(toks: list[str]) -> list[str]:
    """CommonGramsQueryFilter (commongrams/CommonGramsQueryFilter.java:
    85): the query-side view of the common-grams chain — emit bigrams
    whenever possible and a unigram only when it is not a member of a
    bigram (hold-one-back with the last-emitted-was-a-gram end rule).
    Pinned by the full TestCommonGramsFilter query battery."""
    common = _common_words()
    # (token, is_gram) exactly as CommonGramsFilter would emit
    pairs: list[tuple[str, bool]] = []
    prev: "str | None" = None
    for t in toks:
        if prev is not None and (prev in common or t in common):
            pairs.append((prev + "_" + t, True))
        pairs.append((t, False))
        prev = t
    out: list[str] = []
    held: "tuple[str, bool] | None" = None
    last_emitted_gram = False
    for cur in pairs:
        if held is not None and not cur[1]:
            out.append(held[0])
            last_emitted_gram = held[1]
        held = cur
    if held is not None and not last_emitted_gram:
        out.append(held[0])
    return out


def hyphenated_stream(toks: list[str]) -> list[str]:
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:
    73): tokens ending in '-' accumulate (hyphen dropped) and join the
    next non-hyphen-terminated token; a trailing accumulation gets its
    final hyphen restored. Pair with the whitespace tokenizer (the
    standard grammar never emits '-')."""
    out: list[str] = []
    acc: "str | None" = None
    for t in toks:
        if t.endswith("-") and len(t) > 0:
            acc = (acc or "") + t[:-1]
        elif acc is not None:
            out.append(acc + t)
            acc = None
        else:
            out.append(t)
    if acc is not None:
        out.append(acc + "-")
    return out


FINGERPRINT_MAX_OUTPUT = 1024   # FingerprintFilter.DEFAULT_MAX_OUTPUT_TOKEN_SIZE
FINGERPRINT_SEP = " "           # DEFAULT_SEPARATOR


def fingerprint_stream(toks: list[str]) -> list[str]:
    """FingerprintFilter (miscellaneous/FingerprintFilter.java:36): the
    whole stream collapses to ONE token — the de-duplicated terms
    sorted by UTF-16 char order and joined by ' '; if the result
    exceeds 1024 chars, no token is emitted."""
    if not toks:
        return []
    fp = FINGERPRINT_SEP.join(sorted(set(toks)))
    return [fp] if len(fp) <= FINGERPRINT_MAX_OUTPUT else []


LIMIT_TOKEN_COUNT = 20


def limit_count_stream(toks: list[str]) -> list[str]:
    """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java:
    33): index only the first maxTokenCount (20 here) tokens of each
    field — the classic very-long-document cap."""
    return toks[:LIMIT_TOKEN_COUNT]


# the CJK chain only rewrites Han tokens, so pure-ASCII docs pass it
# unchanged — term_freq_batch's ASCII fast path may skip it. The other
# filters rewrite/drop EVERY token and must run on the fast path too.
cjk_bigram_stream.ascii_transparent = True



def porter2_repeat_stream(toks: list[str]) -> list[str]:
    """KeywordRepeatFilter + SnowballFilter + RemoveDuplicates chain
    (miscellaneous/KeywordRepeatFilter.java:33 wiring in
    TestKeywordRepeatFilter): every token indexes BOTH its original
    form and its Porter2 stem, the duplicate dropped when stemming is
    a no-op. Flat-stream divergence as with the other graph chains:
    the stacked copy gets its own position."""
    from .porter2 import porter2_stem
    out: list[str] = []
    for t in toks:
        s = porter2_stem(t)
        out.append(t)
        if s != t:
            out.append(s)
    return out


def delimited_tf_stream(toks: list[str]) -> list[str]:
    """DelimitedTermFrequencyTokenFilter role (miscellaneous/
    DelimitedTermFrequencyTokenFilter.java:38): a trailing ``|N``
    sets the term frequency. Expressed here by repeating the term N
    times — identical df/ttf/BM25 statistics; the reference keeps one
    position where this emits N consecutive ones (documented
    divergence, irrelevant to non-positional scoring)."""
    out: list[str] = []
    for t in toks:
        base, sep, freq = t.rpartition("|")
        if sep and freq.isdigit() and base:
            out.extend([base] * int(freq))
        else:
            out.append(t)
    return out


def concatenate_graph_stream(tokens: "list[str]", preserve_sep: bool = True
                             ) -> "list[str]":
    """ConcatenateGraphFilter (miscellaneous/ConcatenateGraphFilter.java
    :58): concatenate the whole token stream into ONE token, separated
    by SEP_LABEL (U+001F) when ``preserve_sep`` (the default) — the
    SuggestField / completion-FST input surface.  An empty stream
    produces no token."""
    if not tokens:
        return []
    sep = "\u001f" if preserve_sep else ""
    return [sep.join(tokens)]


def fixed_shingle_stream(tokens: "list[str]", size: int = 2,
                         sep: str = " ") -> "list[str]":
    """FixedShingleFilter (shingle/FixedShingleFilter.java:44): emits
    ONLY shingles of exactly ``size`` adjacent tokens (no unigrams, no
    smaller tails), joined by the token separator."""
    if len(tokens) < size:
        return []
    return [sep.join(tokens[i:i + size])
            for i in range(len(tokens) - size + 1)]


def delimited_boost_stream(tokens: "list[str]", delimiter: str = "|"
                           ) -> "list[str]":
    """DelimitedBoostTokenFilter (boost/DelimitedBoostTokenFilter
    .java:35): a trailing ``|boost`` payload parses into the boost
    attribute and is stripped from the term; tokens without the
    delimiter pass through.  Registry divergence (same stance as
    delimited_tf): a malformed float passes through unchanged instead
    of raising — the repo's registered analyzers are never-throw."""
    out = []
    for t in tokens:
        i = t.rfind(delimiter)
        if i >= 0:
            try:
                float(t[i + 1:])
            except ValueError:
                out.append(t)
                continue
            out.append(t[:i])
        else:
            out.append(t)
    return out


STREAM_FILTERS = {"cjk": cjk_bigram_stream,
                  "edge_ngram": edge_ngram_stream,
                  "ngram": ngram_stream,
                  "length": length_stream,
                  "truncate": truncate_stream,
                  "reverse": reverse_stream,
                  "common_grams": common_grams_stream,
                  "common_grams_query": common_grams_query_stream,
                  "hyphenated": hyphenated_stream,
                  "fingerprint": fingerprint_stream,
                  "limit20": limit_count_stream,
                  "delimited_tf": delimited_tf_stream,
                  "porter2_repeat": porter2_repeat_stream,
                  "concatenate_graph": concatenate_graph_stream,
                  "fixed_shingle": fixed_shingle_stream,
                  "delimited_boost": delimited_boost_stream}


def get_stream_filter(name: "str | None"):
    """Analyzer names that transform the TOKEN STREAM (1:many, adjacency-
    aware) rather than the vocabulary — currently the CJK bigram chain."""
    return STREAM_FILTERS.get(name or "")


def term_freq_batch(texts: list[str],
                    max_token_length: int = MAX_TOKEN_LENGTH,
                    with_positions: bool = False,
                    token_filter=None,
                    synonyms: "dict[str, list[str]] | None" = None,
                    stream_filter=None,
                    tokenizer=None,
                    char_filter=None):
    """Per-doc (term, tf) pairs for a batch — the analyzer plus the local
    BytesRefHash-style dedup (util/BytesRefHash.java:335) in one pass.

    ASCII docs take the compiled-regex fast path; non-ASCII docs or docs
    with potentially over-long tokens take the exact vectorized UAX#29
    path. Both produce identical tokens (tested). Token post-processing
    (pure-underscore drop, dedup to (term, doc, tf)) runs VECTORIZED over
    the whole batch: one Arrow trim kernel + dictionary-encode + one
    np.unique over packed (doc, termID) keys — no per-token Python.

    ``token_filter`` (``lucene_ray.analysis_en.get_token_filter``) extends
    the chain TokenFilter-style: tokens map to filtered terms, ``None``
    drops the token (StopFilter role — positions keep their gaps, field
    length counts only emitted tokens). On the vectorized path it is
    applied to the dictionary-encoded VOCABULARY, not the token stream.

    ``synonyms`` enables index-time token graphs
    (analysis/synonym/SynonymGraphFilter.java:78 single-token rules):
    each occurrence of a source term ALSO emits its synonym terms at the
    SAME position (posIncrement == 0 stacked tokens). Stacked tokens are
    counted per doc as ``numOverlap`` (index/FieldInvertState.java:40);
    per-doc ``lengths`` stay the non-overlap token count, i.e. already
    the discounted ``state.getLength() - state.getNumOverlap()`` that
    BM25Similarity's computeNorm quantizes (Similarity.java:152-163 /
    BM25Similarity discountOverlaps=true), while ``overlaps`` lets the
    caller keep sumTotalTermFreq INCLUSIVE of stacked tokens (Lucene's
    collection stats count every posting occurrence). Synonyms match the
    POST-filter term stream and are applied at the vocabulary level on
    the vectorized path.

    Returns (terms: pa.Array, tfs: int64, owners: int64,
    lengths: int32, norms: uint8) where (owners, terms) is unique per
    doc; with ``with_positions`` a per-pair position-list is appended;
    with ``synonyms`` an ``overlaps: int32`` per-doc array is appended
    (always the LAST element).
    """
    n_docs = len(texts)
    if char_filter is not None:
        # CharFilter stage (charfilter/BaseCharFilter.java): rewrites
        # the raw text before tokenization; offsets are corrected in
        # token_offsets_batch, stored content stays the original.
        texts = [char_filter(t)[0] if t else t for t in texts]
    lengths = np.zeros(n_docs, dtype=np.int32)
    overlaps = np.zeros(n_docs, dtype=np.int32) if synonyms is not None \
        else None
    if with_positions:
        # positional path (phrase-enabled indexes): per-doc posmap — the
        # exact layout codec.encode_term needs; left as the simple loop
        # (positional builds are the oracle-parity path, not the 100 TB
        # bulk path).
        terms: list[str] = []
        tfs: list[int] = []
        owners: list[int] = []
        positions: list[list[int]] = []
        for d, text in enumerate(texts):
            if not text:
                continue
            toks = None
            if tokenizer is not None:
                # replacement tokenizer (CharTokenizer family / classic /
                # path hierarchy): owns case, truncation and the token
                # char set — no underscore drop, no overlong reroute
                toks = tokenizer(text)
                if stream_filter is not None:
                    toks = stream_filter(toks)
            elif text.isascii():
                low = text.lower()
                if _overlong_re(max_token_length).search(low) is None:
                    toks = [t for t in _ASCII_WORD.findall(low)
                            if t.strip("_")]
                    if stream_filter is not None and not getattr(
                            stream_filter, "ascii_transparent", False):
                        toks = stream_filter(toks)
            if toks is None:
                toks = tokenize(text, max_token_length)
                if stream_filter is not None:   # CJK etc. — needs adjacency
                    toks = stream_filter(toks)
            # post-filter no-core drop: a rewriting stream filter can
            # MINT pure-underscore grams (e.g. "a__b" → "__") that the
            # vectorized path drops at the vocabulary level — both paths
            # must emit identical tokens and field lengths
            if stream_filter is not None and tokenizer is None:
                toks = [t for t in toks if t.strip("_")]
            if not toks:
                continue
            posmap: dict[str, list[int]] = {}
            if token_filter is not None:
                n_kept = 0
                for i, m in enumerate(token_filter(toks)):
                    if m is None:
                        continue  # stop word: position gap preserved
                    n_kept += 1
                    posmap.setdefault(m, []).append(i)
                lengths[d] = n_kept
            else:
                lengths[d] = len(toks)
                for i, t in enumerate(toks):
                    posmap.setdefault(t, []).append(i)
            if synonyms:
                # stack synonym tokens at the source positions (posIncr=0)
                resort = set()
                for src, poss in list(posmap.items()):
                    reps = synonyms.get(src)
                    if not reps:
                        continue
                    for s in reps:
                        if s == src:
                            continue
                        tgt = posmap.setdefault(s, [])
                        if tgt:
                            resort.add(s)
                        tgt.extend(poss)
                        overlaps[d] += len(poss)
                for s in resort:        # natural + stacked: keep ascending
                    posmap[s] = sorted(posmap[s])
            terms.extend(posmap.keys())
            tfs.extend(len(v) for v in posmap.values())
            owners.extend([d] * len(posmap))
            positions.extend(posmap.values())
        norms = int_to_byte4(lengths.astype(np.int64))
        out = (pa.array(terms, type=pa.string()),
               np.array(tfs, dtype=np.int64),
               np.array(owners, dtype=np.int64), lengths, norms,
               positions)
        return out + (overlaps,) if overlaps is not None else out

    flat: list[str] = []
    counts = np.zeros(n_docs, dtype=np.int64)
    fast = np.zeros(n_docs, dtype=bool)
    for d, text in enumerate(texts):
        if not text:
            continue
        rewriter = stream_filter is not None and not getattr(
            stream_filter, "ascii_transparent", False)
        if tokenizer is not None:
            toks = tokenizer(text)
            if stream_filter is not None:
                toks = stream_filter(toks)
        elif text.isascii() and not (
                rewriter
                and _overlong_re(max_token_length).search(text.lower())):
            toks = _ASCII_WORD.findall(text.lower())  # may contain "_"-only
            fast[d] = True
            if rewriter:
                # pre-drop no-core runs BEFORE the rewriter — the
                # StandardTokenizer never emits them, and the positions
                # path filters them pre-rewrite too; only then can the
                # late vocabulary drop be reserved for FILTER-MINTED
                # grams (both paths must emit identical tokens)
                toks = [t for t in toks if t.strip("_")]
                # total rewriters (n-grams) run here too; the CJK chain
                # is ascii_transparent and keeps the fast path free.
                # Overlong ASCII docs took the exact branch instead: the
                # post-hoc overlong reroute can't detect an overlong
                # ORIGIN once only short grams remain, so split-then-
                # gram must be decided before gramming.
                toks = stream_filter(toks)
        else:
            toks = tokenize(text, max_token_length)
            if stream_filter is not None:       # CJK etc. — adjacency-aware
                toks = stream_filter(toks)
        counts[d] = len(toks)
        flat.extend(toks)
    if not flat:
        norms = int_to_byte4(lengths.astype(np.int64))
        out = (pa.array([], type=pa.string()),
               np.empty(0, np.int64), np.empty(0, np.int64),
               lengths, norms)
        return out + (overlaps,) if overlaps is not None else out
    arr = pa.array(flat, type=pa.string())
    owners_all = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    # overlong-token reroute, post-hoc and vectorized: the scanner SPLITS
    # tokens over max length rather than keeping them, so any fast-path
    # doc that produced one re-tokenizes through the exact path (one
    # utf8_length kernel; the common all-short case costs one max()).
    # Skipped for replacement tokenizers (they own truncation) AND for
    # rewriting stream filters: their fast-path docs were pre-checked
    # overlong-free, so any overlong token is FILTER-MINTED (a
    # fingerprint, a long shingle) — max_token_length binds the
    # TOKENIZER, not filter output, exactly as in the reference
    # (FingerprintFilter emits up to 1024 chars past a 255 tokenizer).
    rerouteable = (tokenizer is None
                   and (stream_filter is None
                        or getattr(stream_filter, "ascii_transparent",
                                   False)))
    bad = (pc.utf8_length(arr).to_numpy(zero_copy_only=False)
           > max_token_length if rerouteable
           else np.zeros(len(arr), dtype=bool))
    if bad.any():
        bad_docs = np.unique(owners_all[bad & fast[owners_all]])
        if len(bad_docs):
            keep_doc = ~np.isin(owners_all, bad_docs)
            arr = arr.filter(pa.array(keep_doc))
            owners_all = owners_all[keep_doc]
            redo_toks: list[str] = []
            redo_own: list[int] = []
            for d in bad_docs:
                tk = tokenize(texts[d], max_token_length)
                redo_toks.extend(tk)
                redo_own.extend([int(d)] * len(tk))
            if redo_toks:
                arr = pa.concat_arrays(
                    [arr.combine_chunks() if hasattr(arr, "combine_chunks")
                     else arr, pa.array(redo_toks, type=pa.string())])
                owners_all = np.concatenate(
                    [owners_all, np.array(redo_own, dtype=np.int64)])
    # no-core drop, vectorized: a token survives iff trimming '_' leaves
    # something (exact-path tokens never contain pure-underscore runs,
    # so re-applying the mask is a no-op for them)
    if tokenizer is None:
        keep = pc.not_equal(pc.utf8_trim(arr, "_"), "")
        if not pc.all(keep).as_py():
            arr = arr.filter(keep)
            owners_all = owners_all[keep.to_numpy(zero_copy_only=False)]
    dict_arr = pc.dictionary_encode(arr)
    idx = np.asarray(dict_arr.indices, dtype=np.int64)
    dictionary = dict_arr.dictionary
    if token_filter is not None:
        # vocab-level filtering: one filter call over unique surface forms,
        # then an id remap (stems collide, stops drop)
        mapped = token_filter(dictionary.to_pylist())
        keep_v = np.fromiter((m is not None for m in mapped), dtype=bool,
                             count=len(mapped))
        kept_names = np.array([m for m in mapped if m is not None],
                              dtype=object)
        uniq_names, inv = np.unique(kept_names, return_inverse=True)
        remap = np.full(len(mapped), -1, dtype=np.int64)
        remap[keep_v] = inv
        idx = remap[idx]
        tok_keep = idx >= 0
        if not tok_keep.all():
            idx = idx[tok_keep]
            owners_all = owners_all[tok_keep]
        dictionary = pa.array(uniq_names.tolist(), type=pa.string())
    lengths[:] = np.bincount(owners_all, minlength=n_docs).astype(np.int32)
    if synonyms:
        # vocabulary-level token-graph stacking: every occurrence of a
        # source term id also emits its synonym term ids for the same
        # owner; lengths above are already final (stacked tokens are
        # overlaps, excluded from the discounted field length)
        vocab_list = dictionary.to_pylist()
        name_to_id = {t: i for i, t in enumerate(vocab_list)}
        extra_terms: list[str] = []
        add_idx, add_own = [], []
        for src, reps in synonyms.items():
            sid = name_to_id.get(src)
            if sid is None:
                continue
            sel = idx == sid
            if not sel.any():
                continue
            own_src = owners_all[sel]
            for s in reps:
                if s == src:
                    continue
                tid = name_to_id.get(s)
                if tid is None:
                    tid = len(vocab_list)
                    vocab_list.append(s)
                    name_to_id[s] = tid
                    extra_terms.append(s)
                add_idx.append(np.full(own_src.shape, tid, np.int64))
                add_own.append(own_src)
        if add_idx:
            if extra_terms:
                d_arr = dictionary.combine_chunks() \
                    if hasattr(dictionary, "combine_chunks") else dictionary
                dictionary = pa.concat_arrays(
                    [d_arr, pa.array(extra_terms, type=pa.string())])
            added = np.concatenate(add_own)
            overlaps += np.bincount(added, minlength=n_docs
                                    ).astype(np.int32)
            idx = np.concatenate([idx, np.concatenate(add_idx)])
            owners_all = np.concatenate([owners_all, added])
    key = (owners_all << np.int64(32)) | idx
    uniq, tf = np.unique(key, return_counts=True)
    owners = (uniq >> np.int64(32)).astype(np.int64)
    tok_idx = (uniq & np.int64(0xFFFFFFFF)).astype(np.int64)
    terms_arr = dictionary.take(pa.array(tok_idx))
    norms = int_to_byte4(lengths.astype(np.int64))
    out = (terms_arr, tf.astype(np.int64), owners, lengths, norms)
    return out + (overlaps,) if overlaps is not None else out
