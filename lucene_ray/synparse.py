"""Synonym file-format parsers (analysis/synonym/SolrSynonymParser.
java:55 and WordnetSynonymParser.java:41): parse the two public
formats into the ``index_synonyms`` dict the build consumes
(source term -> additional terms stacked at the same position).

Solr format: ``a, b, c`` groups (expand=True: every member maps to
every OTHER member; expand=False: members map to the first),
``lhs1, lhs2 => rhs1, rhs2`` explicit mappings, ``\\,``/``\\=>``
escapes, # comments. WordNet format: ``s(synsetid, n, 'word', ...)``
rows grouped by synset id."""

from __future__ import annotations

import re


def _split_escaped(s: str, sep: str) -> list[str]:
    out = []
    cur = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            cur.append(s[i + 1])
            i += 2
        elif s.startswith(sep, i):
            out.append("".join(cur))
            cur = []
            i += len(sep)
        else:
            cur.append(s[i])
            i += 1
    out.append("".join(cur))
    return out


def _find_unescaped(s: str, needle: str) -> int:
    i = 0
    while i < len(s):
        if s[i] == "\\":
            i += 2
            continue
        if s.startswith(needle, i):
            return i
        i += 1
    return -1


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def parse_solr_synonyms(text: str, expand: bool = True
                        ) -> dict[str, list[str]]:
    syn: dict[str, list[str]] = {}

    def add(src: str, dst: str) -> None:
        if src == dst:
            return
        lst = syn.setdefault(src, [])
        if dst not in lst:
            lst.append(dst)

    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        arrow = _find_unescaped(line, "=>")
        if arrow >= 0:
            lhs = [
                _unescape(w.strip()) for w in
                _split_escaped(line[:arrow], ",") if w.strip()]
            rhs = [
                _unescape(w.strip()) for w in
                _split_escaped(line[arrow + 2:], ",") if w.strip()]
            # spaces inside an entry are MULTI-WORD synonyms (kept
            # verbatim; the single-token index path skips them)
            for a in lhs:
                for b in rhs:
                    add(a, b)
        else:
            group = [
                _unescape(w.strip()) for w in
                _split_escaped(line, ",") if w.strip()]
            if len(group) < 2:
                continue
            if expand:
                for a in group:
                    for b in group:
                        add(a, b)
            else:
                for a in group:
                    add(a, group[0])
    return syn


_WN_ROW = re.compile(r"s\(\s*(\d+)\s*,\s*\d+\s*,\s*'((?:[^']|'')*)'")


def parse_wordnet_synonyms(text: str, expand: bool = True
                           ) -> dict[str, list[str]]:
    synsets: dict[str, list[str]] = {}
    for line in text.splitlines():
        m = _WN_ROW.match(line.strip())
        if m:
            word = m.group(2).replace("''", "'")
            synsets.setdefault(m.group(1), []).append(word)
    syn: dict[str, list[str]] = {}
    for words in synsets.values():
        targets = words if expand else words[:1]
        for a in words:
            for b in targets:
                if a == b:
                    continue
                lst = syn.setdefault(a, [])
                if b not in lst:
                    lst.append(b)
    return syn
