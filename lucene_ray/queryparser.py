"""Classic QueryParser → Boolean clause structure.

Reproduces the practically-used surface of the reference's classic syntax
(``queryparser/classic/QueryParser.java:82``, ``QueryParserBase.java:84``,
default operator OR):

- bare terms → SHOULD TermQuery (analyzed; a token that analyzes to several
  terms contributes each as its own clause);
- ``"quoted words"`` → PhraseQuery clause (scored); ``"..."~N`` → sloppy
  phrase with slop N;
- ``+x`` → MUST, ``-x`` → MUST_NOT; ``a AND b`` → both MUST; ``a OR b`` →
  SHOULD; ``NOT a`` → MUST_NOT;
- ``x^2.5`` → clause boost (terms, phrases, groups);
- ``( ... )`` → nested BooleanQuery group clause (recursive);
- ``field:[a TO b]`` / ``field:{a TO b}`` → TermRangeQuery (inclusive /
  exclusive bounds; ``*`` bound = open). The pseudo-field ``content``
  ranges over the default field's terms;
- ``te?m* `` → WildcardQuery (``*`` any run, ``?`` one char);
- ``term~`` / ``term~1`` → FuzzyQuery (default max edits 2,
  FuzzyQuery.defaultMaxEdits);
- ``field:term`` → looked up literally as the keyword term
  ``"field:term"`` (StringField keyword fields live in the unified
  dictionary under that spelling; ``content:``/``contents:`` prefixes are
  stripped to address the default field).

Multi-term expansions (range/wildcard/fuzzy) execute with
CONSTANT_SCORE_REWRITE semantics (MultiTermQuery.java — matching docs
score boost·1f) unless the caller opts into the scoring Boolean rewrite
(search.expand_multiterm → search_terms_scored).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .analysis import tokenize

_TOKEN_RE = re.compile(
    r'\(|\)|"[^"]*"(?:[~^][0-9.]+|~)?'
    r'|[^\s()]*\[[^\]]*\](?:\^[0-9.]+)?'
    r'|[^\s()]*\{[^}]*\}(?:\^[0-9.]+)?'
    r'|[^\s()]+')
_RANGE_RE = re.compile(r'(?:([\w.]+):)?([\[{])\s*(\S+)\s+TO\s+(\S+)\s*'
                       r'([\]}])(?:\^([0-9.]+))?$')


@dataclass
class Clause:
    kind: str          # term | phrase | group | range | wildcard | fuzzy
    text: str          # raw analyzed source text (term/phrase/pattern)
    occur: str         # "SHOULD" | "MUST" | "MUST_NOT"
    boost: float = 1.0
    slop: int = 0                       # phrase slop
    sub: "ParsedQuery | None" = None    # group
    field_name: str = ""                # range field ("" = default field)
    lo: str = ""                        # range bounds ("" = open)
    hi: str = ""
    incl_lo: bool = True
    incl_hi: bool = True
    maxdist: int = 2                    # fuzzy max edits
    tie: float = 0.0                    # dismax tieBreakerMultiplier


@dataclass
class ParsedQuery:
    clauses: list[Clause] = field(default_factory=list)


def parse(query: str) -> ParsedQuery:
    tokens = _TOKEN_RE.findall(query)
    q, pos = _parse_tokens(tokens, 0, depth=0)
    return q


def _parse_tokens(tokens: list[str], i: int, depth: int
                  ) -> tuple[ParsedQuery, int]:
    out = ParsedQuery()
    pending_occur: str | None = None
    while i < len(tokens):
        raw = tokens[i]
        i += 1
        if raw == ")":
            if depth == 0:
                continue               # stray close paren: ignored
            return out, i
        if raw == "AND":
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
        if raw == "(":
            sub, i = _parse_tokens(tokens, i, depth + 1)
            boost = 1.0
            if i < len(tokens) and re.fullmatch(r"\^[0-9.]+", tokens[i]):
                boost = float(tokens[i][1:])
                i += 1
            if sub.clauses:
                out.clauses.append(Clause("group", "", occur, boost,
                                          sub=sub))
            continue
        if raw.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:(\^)([0-9.]+)|(~)([0-9.]*))?',
                             raw)
            if m:
                body = m.group(1)
                boost, slop = 1.0, 0
                if m.group(2):
                    boost = float(m.group(3))
                elif m.group(4):
                    slop = int(float(m.group(5))) if m.group(5) else 0
                out.clauses.append(Clause("phrase", body, occur, boost,
                                          slop=slop))
            continue
        rm = _RANGE_RE.match(raw)
        if rm:
            fld = rm.group(1) or ""
            if fld in ("content", "contents"):
                fld = ""
            lo, hi = rm.group(3), rm.group(4)
            out.clauses.append(Clause(
                "range", raw, occur,
                float(rm.group(6)) if rm.group(6) else 1.0,
                field_name=fld,
                lo="" if lo == "*" else lo.lower(),
                hi="" if hi == "*" else hi.lower(),
                incl_lo=rm.group(2) == "[", incl_hi=rm.group(5) == "]"))
            continue
        if raw.startswith(("content:", "contents:")):
            raw = raw.partition(":")[2]
        boost = 1.0
        if "^" in raw:
            base, _, b = raw.rpartition("^")
            try:
                boost = float(b)
                raw = base
            except ValueError:
                pass
        fm = re.fullmatch(r"([^~]+)~([0-9]*)$", raw)
        if fm and "*" not in raw and "?" not in raw:
            dist = int(fm.group(2)) if fm.group(2) else 2
            out.clauses.append(Clause("fuzzy", fm.group(1).lower(), occur,
                                      boost, maxdist=dist))
            continue
        if "*" in raw or "?" in raw:
            out.clauses.append(Clause("wildcard", raw.lower(), occur,
                                      boost))
            continue
        for t in tokenize(raw):
            out.clauses.append(Clause("term", t, occur, boost))
    return out, i


def wildcard_to_regex(pattern: str) -> str:
    """WildcardQuery pattern → anchored regex (WildcardQuery.java:38
    toAutomaton: * = any run, ? = one char, rest literal)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)
