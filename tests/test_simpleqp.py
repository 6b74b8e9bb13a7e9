"""Parse-tree goldens for the SimpleQueryParser port — the reference's
TestSimpleQueryParser behaviors (never throws, graceful degradation).
Pure parser tests: no Ray, no index."""

import sys

sys.path.insert(0, "/root/repo")

from lucene_ray.simpleqp import parse  # noqa: E402


def an(s):
    # deterministic toy analyzer: lowercase whitespace split
    return [w.lower() for w in s.split() if w]


def test_default_or():
    assert parse("a b", an) == ("or", [("term", "a"), ("term", "b")])


def test_and_operator():
    assert parse("a + b", an) == ("and", [("term", "a"), ("term", "b")])


def test_operator_change_new_level():
    # documented precedence: a | b + c == (a OR b) AND c
    assert parse("a | b + c", an) == \
        ("and", [("or", [("term", "a"), ("term", "b")]), ("term", "c")])


def test_parens_precedence():
    assert parse("a + (b | c)", an) == \
        ("and", [("term", "a"), ("or", [("term", "b"), ("term", "c")])])


def test_not_and_double_not():
    assert parse("-a", an) == ("not", ("term", "a"))
    assert parse("--a", an) == ("term", "a")
    # whitespace between '-' and the term cancels the negation
    assert parse("- a", an) == ("term", "a")


def test_phrase_and_near():
    assert parse('"x y"', an) == ("phrase", ["x", "y"], 0)
    assert parse('"x y"~3', an) == ("phrase", ["x", "y"], 3)
    # single-term phrase simplifies to a term (QueryBuilder role)
    assert parse('"x"', an) == ("term", "x")
    # bare tilde after phrase = slop 0
    assert parse('"x y"~', an) == ("phrase", ["x", "y"], 0)


def test_prefix_and_fuzzy():
    assert parse("ab*", an) == ("prefix", "ab")
    assert parse("ab~1", an) == ("fuzzy", "ab", 1)
    assert parse("ab~", an) == ("fuzzy", "ab", 2)      # AUTO = 2
    assert parse("ab~9", an) == ("fuzzy", "ab", 2)     # capped at max 2
    assert parse("ab~0", an) == ("term", "ab")         # 0 edits = term
    assert parse("ab~x", an) == ("term", "ab")         # unparsable → 0
    # '*' not at the end is literal text
    assert parse("a*b", an) == ("term", "a*b")


def test_never_throws_degradations():
    assert parse("", an) == ("none",)
    assert parse("   ", an) == ("none",)
    assert parse("*", an) == ("all",)
    # stray ')' skipped; dangling operators ignored
    assert parse("a + ) b |", an) == ("and", [("term", "a"), ("term", "b")])
    # leading operator with no prior branch is ignored
    assert parse("+ a", an) == ("term", "a")
    # unmatched '(' is extraneous: contents parse as plain tokens
    assert parse("(a b", an) == ("or", [("term", "a"), ("term", "b")])
    # unmatched '"' likewise
    assert parse('"a b', an) == ("or", [("term", "a"), ("term", "b")])
    # empty '()' and '""' reset the pending operator: b combines with
    # the default OR, not the dangling '+'
    assert parse("a + () b", an) == ("or", [("term", "a"), ("term", "b")])
    assert parse('a + "" b', an) == ("or", [("term", "a"), ("term", "b")])


def test_escapes():
    assert parse(r"a\+b", an) == ("term", "a+b")
    assert parse(r"\-a", an) == ("term", "-a")
    assert parse(r"ab\*", an) == ("term", "ab*")
    assert parse(r'\"a b\"', an) == \
        ("or", [("term", '"a'), ("term", 'b"')])


def test_nested_parens():
    assert parse("a + (b | (c + d))", an) == \
        ("and", [("term", "a"),
                 ("or", [("term", "b"),
                         ("and", [("term", "c"), ("term", "d")])])])


def test_parse_never_throws_property():
    """The reference's core contract: ANY input parses without an
    exception (hypothesis fuzz over the operator alphabet and raw
    unicode)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list('ab c+|-"()*~\\09'))
    ops = st.text(alphabet, max_size=40)
    anything = st.text(max_size=40)

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(ops, anything))
    def run(q):
        node = parse(q, an)
        assert node is not None

    run()


def test_fuzzy_normalizes_whole_token():
    """newFuzzyQuery normalizes the raw token (one fuzzy term) rather
    than running the full analysis chain — a multi-token word stays a
    single fuzzy term, unlike the unfuzzied form which analyzes to a
    phrase."""
    def splitter(s):
        return [w.lower() for w in s.replace("-", " ").split() if w]

    assert parse("error-handling~1", splitter) == \
        ("fuzzy", "error-handling", 1)
    assert parse("error-handling", splitter) == \
        ("phrase", ["error", "handling"], 0)
    assert parse("Error~1", splitter) == ("fuzzy", "error", 1)
    # fuzziness 0 degrades to the standard analyzed query
    assert parse("error-handling~0", splitter) == \
        ("phrase", ["error", "handling"], 0)


def test_term_automaton_dp_matches_language_bruteforce(tmp_path):
    """Property: the position-set DP equals brute-force 'enumerate the
    automaton's accepted sequences and scan every doc' on random
    acyclic automatons over random tiny corpora (including ANY
    transitions and multi-accept)."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.build import build_index
    from lucene_ray.pipelines.fulltext import _ta_paths
    from lucene_ray.search import IndexReader, term_automaton_matches

    rng = np.random.default_rng(77)
    vocab = ["aa", "bb", "cc", "dd"]

    # one shared corpus/index, many random automatons
    texts = [" ".join(vocab[j] for j in rng.integers(0, 4, size=int(n)))
             for n in rng.integers(3, 12, size=40)]
    cdir = str(tmp_path / "c")
    os.makedirs(cdir)
    pq.write_table(pa.table({
        "repo": ["r"] * len(texts),
        "path": [f"p{i:04d}.txt" for i in range(len(texts))],
        "commit": ["c" * 40] * len(texts),
        "lang": ["x"] * len(texts),
        "content": pa.array(texts, pa.string()),
    }), os.path.join(cdir, "a.parquet"))
    idx = str(tmp_path / "i")
    build_index(cdir, idx, with_positions=True, term_parts=2,
                salt_group=1)
    r = IndexReader(idx)
    toks = [t.split() for t in texts]

    for trial in range(25):
        n_states = int(rng.integers(2, 6))
        n_trans = int(rng.integers(1, 7))
        transitions = []
        for _ in range(n_trans):
            a = int(rng.integers(0, n_states - 1))
            b = int(rng.integers(a + 1, n_states))   # acyclic by order
            t = ("*" if rng.random() < 0.25
                 else vocab[int(rng.integers(0, 4))])
            transitions.append((a, t, b))
        accepts = set(int(s) for s in
                      rng.choice(n_states, size=int(rng.integers(1, 3)),
                                 replace=False))
        got = term_automaton_matches(r, transitions, accepts)

        paths = _ta_paths(transitions, accepts)
        want: dict[int, set] = {}
        for d, words in enumerate(toks):
            ends = set()
            for path in paths:
                L = len(path)
                for s in range(len(words) - L + 1):
                    if all(p == "*" or words[s + i] == p
                           for i, p in enumerate(path)):
                        ends.add(s + L)
            if ends:
                want[d] = len(ends)
        assert got == want, (trial, transitions, sorted(accepts))
