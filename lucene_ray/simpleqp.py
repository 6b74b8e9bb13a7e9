"""SimpleQueryParser — the never-throws end-user query language.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java:103`` (parse loop :160-238, subquery
:240-296, phrase :297-366, token :368-436, buildQueryTree :449-490,
parseFuzziness :497-535, tokenFinished :538-552).

Operators: ``+`` AND, ``|`` OR, ``-`` NOT, ``"..."`` phrase (with
``~N`` near), ``term*`` prefix, ``term~N`` fuzzy, ``( )`` precedence,
``\\`` escape.  Any syntax error degrades gracefully instead of
throwing: unmatched ``(`` and ``"`` are re-parsed as plain text,
stray ``)`` is skipped, a dangling trailing operator is ignored,
``--`` double negation cancels.

The parse result is an occur-uniform AST of tuples:

- ``("term", text)`` / ``("prefix", text)`` / ``("fuzzy", text, n)``
- ``("phrase", [terms], slop)``
- ``("not", node)`` — the reference's ``BQ(MUST_NOT x, SHOULD *:*)``
  wrapper (SimpleQueryParser.java:453-458)
- ``("and", [nodes])`` / ``("or", [nodes])`` — BooleanQuery levels;
  a new level starts exactly when the combining operator changes
  (buildQueryTree :474-478), reproducing the documented
  "simple order" precedence (``a | b + c`` == ``(a OR b) AND c``)
- ``("all",)`` / ``("none",)``

Evaluation maps each leaf onto the engine's existing machinery
(postings, termdict expansion, exact/sloppy phrase matchers) and each
Boolean level onto sorted-set algebra.
"""

from __future__ import annotations

import numpy as np

_WS = {" ", "\t", "\n", "\r"}
_MAX_FUZZ = 2        # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    __slots__ = ("data", "index", "length", "top", "cur_op", "prev_op",
                 "notc")

    def __init__(self, data: str, start: int, length: int):
        self.data = data
        self.index = start
        self.length = length
        self.top = None
        self.cur_op: str | None = None     # "and" | "or"
        self.prev_op: str | None = None
        self.notc = 0


def _token_finished(st: _State) -> bool:
    c = st.data[st.index]
    return c in ('"', "|", "+", "(", ")") or c in _WS


def _parse_fuzziness(st: _State) -> int:
    """SimpleQueryParser.parseFuzziness:497 — digits after ``~`` up to
    the next delimiter; empty → 2 (AUTO), unparsable → 0, negative → 0."""
    if st.index >= st.length or st.data[st.index] != "~":
        return 0
    chars = []
    while st.index < st.length:
        st.index += 1
        if st.index < st.length:
            if _token_finished(st):
                break
            chars.append(st.data[st.index])
    s = "".join(chars)
    if not s:
        return 2
    try:
        n = int(s)
    except ValueError:
        return 0
    return max(n, 0)


def _build_tree(st: _State, branch) -> None:
    """buildQueryTree:449 — left fold with a new Boolean level on every
    operator CHANGE; default operator (whitespace) is OR."""
    if branch is None:
        return
    if st.notc % 2 == 1:
        branch = ("not", branch)
    if st.top is None:
        st.top = branch
    else:
        if st.cur_op is None:
            st.cur_op = "or"
        if st.prev_op != st.cur_op:
            st.top = (st.cur_op, [st.top])
        st.top[1].append(branch)
        st.prev_op = st.cur_op
    st.cur_op = None


def _consume_subquery(st: _State, analyze) -> None:
    start = st.index = st.index + 1
    depth, escaped = 1, False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
        escaped = False
        st.index += 1
    if st.index == st.length:
        st.index = start            # unmatched '(' is extraneous
    elif st.index == start:
        st.cur_op = None            # '()' resets the pending operator
        st.index += 1
    else:
        sub = _State(st.data, start, st.index)
        _parse_sub(sub, analyze)
        _build_tree(st, sub.top)
        st.index += 1


def _consume_phrase(st: _State, analyze) -> None:
    start = st.index = st.index + 1
    buf, escaped, has_slop = [], False, False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == '"':
                if (st.index + 1 < st.length
                        and st.data[st.index + 1] == "~"):
                    st.index += 1
                    if st.index + 1 < st.length:
                        has_slop = True
                    break
                break
        escaped = False
        buf.append(st.data[st.index])
        st.index += 1
    if st.index == st.length:
        st.index = start            # unmatched '"' is extraneous
    elif st.index == start:
        st.cur_op = None            # '""' resets the pending operator
        st.index += 1
    else:
        slop = _parse_fuzziness(st) if has_slop else 0
        terms = analyze("".join(buf))
        branch = None
        if len(terms) == 1:
            branch = ("term", terms[0])
        elif terms:
            branch = ("phrase", terms, slop)
        _build_tree(st, branch)
        st.index += 1


def _consume_token(st: _State, analyze) -> None:
    buf, escaped, prefix, fuzzy = [], False, False, False
    while st.index < st.length:
        if not escaped:
            c = st.data[st.index]
            if c == "\\":
                escaped = True
                prefix = False
                st.index += 1
                continue
            if _token_finished(st):
                break
            if buf and c == "~":
                fuzzy = True
                break
            prefix = bool(buf) and c == "*"
        escaped = False
        buf.append(st.data[st.index])
        st.index += 1
    if not buf:
        return
    branch = None
    if fuzzy:
        token = "".join(buf)
        n = min(_parse_fuzziness(st), _MAX_FUZZ)
        if n == 0:
            # fuzziness 0 degrades to the standard analyzed query
            # (SimpleQueryParser.java:414-416 newDefaultQuery)
            terms = analyze(token)
            if len(terms) == 1:
                branch = ("term", terms[0])
            elif terms:
                branch = ("phrase", terms, 0)
        else:
            # newFuzzyQuery NORMALIZES the whole token (analyzer
            # .normalize, SimpleQueryParser.java:571-576) — it is one
            # fuzzy term, never split by the full analysis chain
            branch = ("fuzzy", token.lower(), n)
    elif prefix:
        token = "".join(buf[:-1])
        branch = ("prefix", token.lower()) if token else None
    else:
        terms = analyze("".join(buf))
        if len(terms) == 1:
            branch = ("term", terms[0])
        elif terms:                  # analyzer split one token → phrase
            branch = ("phrase", terms, 0)
    _build_tree(st, branch)


def _parse_sub(st: _State, analyze) -> None:
    while st.index < st.length:
        c = st.data[st.index]
        if c == "(":
            _consume_subquery(st, analyze)
        elif c == ")":
            st.index += 1           # extraneous, skipped
        elif c == '"':
            _consume_phrase(st, analyze)
        elif c == "+":
            if st.cur_op is None and st.top is not None:
                st.cur_op = "and"
            st.index += 1
        elif c == "|":
            if st.cur_op is None and st.top is not None:
                st.cur_op = "or"
            st.index += 1
        elif c == "-":
            st.notc += 1
            st.index += 1
            continue                # keep notc across the next branch
        elif c in _WS:
            st.index += 1
        else:
            _consume_token(st, analyze)
        st.notc = 0


def parse(text: str, analyze=None):
    """Parse a SimpleQueryParser string into the tuple AST. ``analyze``
    maps raw token text → list of index terms (defaults to the engine
    tokenizer); it may return [] (token vanishes, like a stopword)."""
    if analyze is None:
        from .analysis import tokenize
        analyze = tokenize
    if text.strip() == "*":
        return ("all",)
    st = _State(text, 0, len(text))
    _parse_sub(st, analyze)
    return st.top if st.top is not None else ("none",)


# ---------------------------------------------------------------------------
# Evaluation to a (sorted, unique) doc-id set


def eval_docs(reader, node) -> np.ndarray:
    """Evaluate an AST to the matching LIVE doc-id set using the
    engine's primitives: postings for terms, termdict expansion for
    prefix/fuzzy (MultiTermQuery CONSTANT_SCORE rewrite role), the
    exact/sloppy positional matchers for phrases, and sorted-set
    algebra for the Boolean levels."""
    from .search import (phrase_freqs, sloppy_phrase_freqs, termdict_scan)

    kind = node[0]
    if kind == "none":
        return np.empty(0, np.int64)
    if kind == "all":
        # docmeta-derived universe (doc_count understates maxDoc after
        # an expunge; ids are never renumbered — search._all_live_docs)
        from .search import _all_live_docs
        return _all_live_docs(reader)
    if kind == "term":
        p = reader.postings(node[1])
        if p is None:
            return np.empty(0, np.int64)
        from .codec import decode_blocks
        d, _tf, _nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                       p.tfs_enc, p.norms_enc)
        lm = reader.live_mask(d)
        return d[lm] if lm is not None else d
    if kind in ("prefix", "fuzzy"):
        t = (termdict_scan(reader, prefix=node[1]) if kind == "prefix"
             else termdict_scan(reader, fuzzy=(node[1], node[2])))
        # default-field query language: keyword-field dictionary entries
        # ("field:value") are out of scope for the expansions
        kw = reader.manifest.config.get("keyword_fields") or []
        terms = [x for x in t.column("term").to_pylist()
                 if not any(x.startswith(f"{f}:") for f in kw)]
        parts = [eval_docs(reader, ("term", x)) for x in terms]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64))
    if kind == "phrase":
        terms, slop = node[1], node[2]
        fr = (phrase_freqs(reader, terms) if slop == 0
              else sloppy_phrase_freqs(reader, terms, slop))
        d = np.array(sorted(fr), dtype=np.int64)
        lm = reader.live_mask(d)
        return d[lm] if lm is not None else d
    if kind == "not":
        alld = eval_docs(reader, ("all",))
        ex = eval_docs(reader, node[1])
        return np.setdiff1d(alld, ex, assume_unique=True)
    if kind == "or":
        parts = [eval_docs(reader, c) for c in node[1]]
        return (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, np.int64))
    if kind == "and":
        parts = [eval_docs(reader, c) for c in node[1]]
        if not parts:
            return np.empty(0, np.int64)
        out = parts[0]
        for p in parts[1:]:
            out = np.intersect1d(out, p, assume_unique=True)
        return out
    raise ValueError(f"unknown node {node!r}")
