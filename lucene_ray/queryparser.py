"""Classic QueryParser subset → Boolean clause structure.

Reproduces the practically-used surface of the reference's classic syntax
(``queryparser/classic/QueryParser.java:82``, ``QueryParserBase.java:84``,
default operator OR):

- bare terms → SHOULD TermQuery (analyzed; a token that analyzes to several
  terms contributes each as its own clause);
- ``"quoted words"`` → PhraseQuery clause (scored);
- ``+term`` → MUST, ``-term`` → MUST_NOT;
- ``a AND b`` → both MUST; ``a OR b`` → SHOULD; ``NOT a`` → MUST_NOT;
- ``term^2.5`` / ``"phrase"^2`` → clause boost;
- ``field:term`` → looked up literally as the keyword term
  ``"field:term"`` (StringField keyword fields live in the unified
  dictionary under that spelling; ``content:``/``contents:`` prefixes are
  stripped to address the default field).

Not implemented (documented): parentheses grouping, range/wildcard inside
the parser (use the termdict_scan operators), fuzzy ``~``.

Scoring semantics follow BooleanQuery (search/BooleanQuery.java:40):
score = Σ scores of matching MUST and SHOULD clauses; MUST clauses also
filter; MUST_NOT excludes; a query with MUST/MUST_NOT but no matching
SHOULD still scores its MUST clauses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analysis import tokenize

_TOKEN_RE = re.compile(r'"[^"]*"(?:\^[0-9.]+)?|\S+')


@dataclass
class Clause:
    kind: str          # "term" | "phrase"
    text: str          # raw analyzed source text
    occur: str         # "SHOULD" | "MUST" | "MUST_NOT"
    boost: float = 1.0


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)


def parse(query: str) -> ParsedQuery:
    out = ParsedQuery()
    pending_occur: str | None = None
    tokens = _TOKEN_RE.findall(query)
    i = 0
    while i < len(tokens):
        raw = tokens[i]
        i += 1
        if raw == "AND":
            # promote the previous and next clause to MUST
            if out.clauses and out.clauses[-1].occur == "SHOULD":
                out.clauses[-1].occur = "MUST"
            pending_occur = "MUST"
            continue
        if raw == "OR":
            pending_occur = "SHOULD"
            continue
        if raw == "NOT":
            pending_occur = "MUST_NOT"
            continue
        occur = pending_occur or "SHOULD"
        pending_occur = None
        if raw.startswith("+"):
            occur, raw = "MUST", raw[1:]
        elif raw.startswith("-"):
            occur, raw = "MUST_NOT", raw[1:]
        if not raw:
            continue
        boost = 1.0
        if raw.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:\^([0-9.]+))?', raw)
            if m:
                body, b = m.group(1), m.group(2)
                if b:
                    boost = float(b)
                out.clauses.append(Clause("phrase", body, occur, boost))
            continue
        # field:value stays literal — keyword fields live in the unified
        # dictionary as "field:value" terms (StringField mapping); the
        # analyzer's letter-colon-letter join produces exactly that token.
        # content:/contents: prefixes address the default field and are
        # stripped.
        if raw.startswith(("content:", "contents:")):
            raw = raw.partition(":")[2]
        if "^" in raw:
            base, _, b = raw.rpartition("^")
            try:
                boost = float(b)
                raw = base
            except ValueError:
                pass
        for t in tokenize(raw):
            out.clauses.append(Clause("term", t, occur, boost))
    return out
