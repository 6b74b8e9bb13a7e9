"""CharFilter framework: HTMLStrip, Mapping, PatternReplace.

Reference semantics:

- ``analysis/charfilter/HTMLStripCharFilter.jflex`` — strip markup
  before tokenization: inline elements (a, b, span, …) vanish; block
  elements, <br> and whole <script>/<style> elements become '\\n';
  comments, DOCTYPE and processing instructions vanish; CDATA content
  is kept verbatim; character entities decode (HTML 4 named set with
  nbsp -> ' ' exactly as the reference's table, plus the accepted
  uppercase variants and numeric dec/hex refs); a bare '<' or '&' that
  forms no markup passes through.  ``escaped_tags`` are emitted
  verbatim (TestHTMLStripCharFilter.testReserved).
- ``analysis/charfilter/MappingCharFilter.java`` + NormalizeCharMap —
  greedy longest-match string rewrite rules.
- ``pattern/PatternReplaceCharFilter.java`` — one regex replace over
  the whole input.

Every filter returns ``(output_text, OffsetMap)``; the map reproduces
``CharFilter.correctOffset`` (BaseCharFilter.addOffCorrectMap): token
offsets in the filtered text map back to ORIGINAL positions, so stored
offsets and highlighting stay anchored to the source document.
"""

from __future__ import annotations

import html.entities
import re

import numpy as np

# --- offset correction -----------------------------------------------------


class OffsetMap:
    """correctOffset: for an offset in the FILTERED text, the original
    offset is ``off + delta`` where delta is the cumulative difference
    registered at the latest change-point <= off
    (charfilter/BaseCharFilter.java:36)."""

    __slots__ = ("positions", "deltas")

    def __init__(self, positions: list[int], deltas: list[int]):
        self.positions = np.asarray(positions, dtype=np.int64)
        self.deltas = np.asarray(deltas, dtype=np.int64)

    def correct(self, off: int) -> int:
        i = int(np.searchsorted(self.positions, off, side="right")) - 1
        return off + (int(self.deltas[i]) if i >= 0 else 0)

    def correct_array(self, offs: np.ndarray) -> np.ndarray:
        if len(self.positions) == 0:
            return offs
        i = np.searchsorted(self.positions, offs, side="right") - 1
        d = np.where(i >= 0, self.deltas[np.maximum(i, 0)], 0)
        return offs + d


class _Emitter:
    def __init__(self) -> None:
        self.parts: list[str] = []
        self.out_len = 0
        self.positions: list[int] = []
        self.deltas: list[int] = []
        self._delta = 0

    def verbatim(self, text: str, orig_start: int) -> None:
        # text copied unchanged from the original at orig_start
        d = orig_start - self.out_len
        if d != self._delta:
            self.positions.append(self.out_len)
            self.deltas.append(d)
            self._delta = d
        self.parts.append(text)
        self.out_len += len(text)

    def replaced(self, text: str, orig_start: int, orig_end: int) -> None:
        # text substitutes original[orig_start:orig_end]
        d = orig_start - self.out_len
        if text and d != self._delta:
            self.positions.append(self.out_len)
            self.deltas.append(d)
            self._delta = d
        self.parts.append(text)
        self.out_len += len(text)
        d = orig_end - self.out_len
        if d != self._delta:
            self.positions.append(self.out_len)
            self.deltas.append(d)
            self._delta = d

    def result(self) -> tuple[str, OffsetMap]:
        return "".join(self.parts), OffsetMap(self.positions, self.deltas)


# --- HTMLStrip ---------------------------------------------------------------

# InlineElment from the jflex grammar (HTMLStripCharFilter.jflex:117);
# br is handled separately (start AND end replace with '\n').
INLINE_ELEMENTS = frozenset(
    "a abbr acronym b basefont bdo big cite code dfn em font i img input "
    "kbd label q s samp select small span strike strong sub sup textarea "
    "tt u var".split())

# HTML 4 named entities (the reference's table is the same W3C set);
# nbsp maps to a plain space exactly as HTMLCharacterEntities.jflex:124.
_ENTITIES: dict[str, str] = dict(html.entities.entitydefs)
_ENTITIES["nbsp"] = " "
for _k in ("quot", "copy", "gt", "lt", "reg", "amp"):
    _ENTITIES[_k.upper()] = _ENTITIES[_k]

_HTML_RE = re.compile(
    r"""<!--.*?(?:-->|\Z)
      | <!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|\Z)
      | <(?P<sname>script|style)(?:\s[^>]*)?>.*?(?:</(?P=sname)\s*>|\Z)
      | <(?P<close>/?)(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)
            (?P<attrs>(?:"[^"]*"|'[^']*'|[^<>"'])*?)\s*/?>
      | <[!?][^>]*>
      | &\#(?P<dec>[0-9]{1,8});
      | &\#[xX](?P<hex>[0-9a-fA-F]{1,7});
      | &(?P<ent>[a-zA-Z][a-zA-Z0-9]{0,30});
    """, re.S | re.X | re.I)


def html_strip(text: str,
               escaped_tags: "frozenset[str] | None" = None
               ) -> tuple[str, OffsetMap]:
    em = _Emitter()
    pos = 0
    for m in _HTML_RE.finditer(text):
        if m.start() > pos:
            em.verbatim(text[pos:m.start()], pos)
        pos = m.end()
        g = m.groupdict()
        if g["name"] is not None:
            tag = g["name"].lower()
            if escaped_tags and tag in escaped_tags:
                em.verbatim(m.group(), m.start())
            elif tag == "br":
                em.replaced("\n", m.start(), m.end())
            elif tag in INLINE_ELEMENTS:
                em.replaced("", m.start(), m.end())
            else:
                em.replaced("\n", m.start(), m.end())
        elif g["sname"] is not None:
            em.replaced("\n", m.start(), m.end())
        elif g["cdata"] is not None:
            em.verbatim(g["cdata"], m.start("cdata"))
        elif g["dec"] is not None or g["hex"] is not None:
            cp = int(g["dec"]) if g["dec"] is not None else int(g["hex"],
                                                                16)
            ch = chr(cp) if 0 < cp <= 0x10FFFF and not \
                (0xD800 <= cp <= 0xDFFF) else "�"
            em.replaced(ch, m.start(), m.end())
        elif g["ent"] is not None:
            rep = _ENTITIES.get(g["ent"])
            if rep is not None:
                em.replaced(rep, m.start(), m.end())
            else:                       # unknown entity passes through
                em.verbatim(m.group(), m.start())
        else:                           # comment / CDATA-less / <!…> / <?…>
            em.replaced("", m.start(), m.end())
    if pos < len(text):
        em.verbatim(text[pos:], pos)
    return em.result()


# --- MappingCharFilter -------------------------------------------------------


def make_mapping_char_filter(rules: "dict[str, str]"):
    """NormalizeCharMap semantics: greedy longest-match over the rule
    keys at each position (MappingCharFilter.java:36)."""
    keys = sorted(rules, key=len, reverse=True)
    rx = re.compile("|".join(re.escape(k) for k in keys))

    def apply(text: str) -> tuple[str, OffsetMap]:
        em = _Emitter()
        pos = 0
        for m in rx.finditer(text):
            if m.start() > pos:
                em.verbatim(text[pos:m.start()], pos)
            em.replaced(rules[m.group()], m.start(), m.end())
            pos = m.end()
        if pos < len(text):
            em.verbatim(text[pos:], pos)
        return em.result()
    return apply


# --- PatternReplaceCharFilter ------------------------------------------------


def make_pattern_replace_char_filter(pattern: str, replacement: str):
    """pattern/PatternReplaceCharFilter.java:42 — one regex replace
    over the whole input, offsets corrected per match."""
    rx = re.compile(pattern)

    def apply(text: str) -> tuple[str, OffsetMap]:
        em = _Emitter()
        pos = 0
        for m in rx.finditer(text):
            if m.start() > pos:
                em.verbatim(text[pos:m.start()], pos)
            em.replaced(m.expand(replacement), m.start(), m.end())
            pos = m.end()
        if pos < len(text):
            em.verbatim(text[pos:], pos)
        return em.result()
    return apply


# --- registry ----------------------------------------------------------------

CHAR_FILTERS = {
    "html_strip": html_strip,
    # registered demo instances (rule sets are ctor args in the
    # reference factories)
    "mapping": make_mapping_char_filter({"qu": "k", "0": "o", "1": "l"}),
    "pattern_replace": make_pattern_replace_char_filter("[aeiou]+", "a"),
}


def get_char_filter(name: "str | None"):
    """Analyzer names whose chain starts with a char filter (applied to
    the raw text BEFORE tokenization; the rest of the chain is the
    standard analyzer)."""
    return CHAR_FILTERS.get(name or "")


def parse_mapping_rules(text: str) -> "dict[str, str]":
    """MappingCharFilterFactory rules-file parser (the Solr
    "mapping-ISOLatin1Accent.txt" format the reference's benchmark
    tasks consume): lines of ``"src" => "dst"`` with Java string
    escapes (\\uXXXX, \\t, \\n, ...); '#' comments and blank lines
    skip; a malformed mapping line raises ValueError."""
    import re

    rules: dict[str, str] = {}
    pat = re.compile(r'^\s*"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)"\s*$')

    def unescape(v: str) -> str:
        return v.encode().decode("unicode_escape")

    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        m = pat.match(line)
        if not m:
            raise ValueError(f"malformed mapping rule: {line!r}")
        rules[unescape(m.group(1))] = unescape(m.group(2))
    return rules


def mapping_char_filter_from_file(path: str):
    with open(path, encoding="utf-8") as f:
        return make_mapping_char_filter(parse_mapping_rules(f.read()))
