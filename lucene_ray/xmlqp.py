"""XML query parser — the queryparser/xml CoreParser role
(queryparser/xml/CoreParser.java:60).

The reference registers one builder per element name and assembles the
query tree from a DOM; this module maps the same element vocabulary
onto the classic parser's ``ParsedQuery``/``Clause`` AST, so evaluation
flows through the one Boolean evaluator (`search._eval_parsed`) every
other parser uses.

Supported elements (the CoreParser default registry,
CoreParser.java:75-100, element and attribute spellings per the
reference's test queries):

- ``<TermQuery boost>text</TermQuery>`` (TermQueryBuilder) — analyzed;
- ``<TermsQuery>free text</TermsQuery>`` (TermsQueryBuilder:43 —
  analyzer tokens as nested SHOULD TermQueries);
- ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustnot|
  filter">`` children (BooleanQueryBuilder:36; FILTER = matches
  required, scores excluded — mapped to a MUST clause with boost 0,
  which is float-exactly the same sum);
- ``<UserQuery>classic syntax</UserQuery>`` (UserInputQueryBuilder —
  the classic parser as a subtree);
- ``<MatchAllDocsQuery/>``;
- ``<ConstantScoreQuery boost>`` wrapping any supported element
  (doc set only, constant boost·1f);
- ``<DisjunctionMaxQuery tieBreaker>`` with element children
  (DisjunctionMaxQueryBuilder);
- ``<RangeQuery fieldName lowerTerm upperTerm includeLower
  includeUpper/>`` (TermRange role) and ``<PointRangeQuery fieldName
  lowerTerm upperTerm/>`` — both map to the range clause (numeric
  point-index descent when the field has one, term expansion
  otherwise);
- ``<BoostQuery boost>`` wrapping one element (BoostQueryBuilder).

Span elements (SpanTerm/SpanNear/...) and the contrib module's
LikeThisQuery/FuzzyLikeThisQuery are NOT in this registry and raise
``ValueError`` — the honest unsupported-element behavior
(CoreParser.java throws ParserException for unknown elements too).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .analysis import tokenize
from .queryparser import Clause, ParsedQuery, parse as parse_classic


def parse_xml(xml_text: str) -> ParsedQuery:
    """Parse an XML query document into a ParsedQuery (one top-level
    SHOULD clause wrapping the root element's query)."""
    root = ET.fromstring(xml_text)
    return ParsedQuery(clauses=[_build(root, "SHOULD")])


def _attr_f(e, name: str, default: float) -> float:
    v = e.get(name)
    return float(v) if v is not None else default


def _build(e, occur: str, boost: float = 1.0) -> Clause:
    """One element → one Clause (boost attribute composes like the
    reference's DOMUtils.getAttribute(e, "boost", 1.0f))."""
    boost = boost * _attr_f(e, "boost", 1.0)
    tag = e.tag
    if tag == "TermQuery":
        toks = tokenize(e.text or "")
        if len(toks) == 1:
            return Clause("term", toks[0], occur, boost=boost)
        return Clause("group", "", occur, boost=boost, sub=ParsedQuery(
            [Clause("term", t, "SHOULD") for t in toks]))
    if tag == "TermsQuery":
        return Clause("group", "", occur, boost=boost, sub=ParsedQuery(
            [Clause("term", t, "SHOULD") for t in tokenize(e.text or "")]))
    if tag == "BooleanQuery":
        clauses = []
        for ch in e:
            if ch.tag != "Clause":
                raise ValueError(f"BooleanQuery child {ch.tag!r}")
            occ = (ch.get("occurs") or "should").lower()
            sub = list(ch)
            if len(sub) != 1:
                raise ValueError("Clause must hold exactly one query")
            if occ == "must":
                clauses.append(_build(sub[0], "MUST"))
            elif occ == "should":
                clauses.append(_build(sub[0], "SHOULD"))
            elif occ == "mustnot":
                clauses.append(_build(sub[0], "MUST_NOT"))
            elif occ == "filter":
                # FILTER occur (BooleanClause.Occur.FILTER): required,
                # unscored — a MUST clause whose weight boost is 0
                clauses.append(_build(sub[0], "MUST", boost=0.0))
            else:
                raise ValueError(f"unknown occurs {occ!r}")
        return Clause("group", "", occur, boost=boost,
                      sub=ParsedQuery(clauses))
    if tag == "UserQuery":
        return Clause("group", "", occur, boost=boost,
                      sub=parse_classic(e.text or ""))
    if tag == "MatchAllDocsQuery":
        return Clause("matchall", "", occur, boost=boost)
    if tag == "ConstantScoreQuery":
        sub = list(e)
        if len(sub) != 1:
            raise ValueError("ConstantScoreQuery needs one child")
        return Clause("const", "", occur, boost=boost,
                      sub=ParsedQuery([_build(sub[0], "SHOULD")]))
    if tag == "BoostQuery":
        sub = list(e)
        if len(sub) != 1:
            raise ValueError("BoostQuery needs one child")
        return _build(sub[0], occur, boost=boost)
    if tag == "DisjunctionMaxQuery":
        tie = _attr_f(e, "tieBreaker", 0.0)
        return Clause("dismax", "", occur, boost=boost, tie=tie,
                      sub=ParsedQuery([_build(ch, "SHOULD") for ch in e]))
    if tag in ("RangeQuery", "PointRangeQuery"):
        lo = e.get("lowerTerm") or ""
        hi = e.get("upperTerm") or ""
        incl_lo = (e.get("includeLower") or "true").lower() != "false"
        incl_hi = (e.get("includeUpper") or "true").lower() != "false"
        return Clause("range", "", occur, boost=boost,
                      field_name=e.get("fieldName") or "",
                      lo=lo, hi=hi, incl_lo=incl_lo, incl_hi=incl_hi)
    raise ValueError(f"unsupported element <{tag}>")
