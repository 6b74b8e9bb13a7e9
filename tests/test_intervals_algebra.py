"""Goldens for the minimal-interval algebra, transcribed from the
reference's own battery (queries/src/test/.../TestIntervals.java): the
same seven field1/field2 documents, the same sources, the same expected
(start, end) pair arrays per doc — plus its assertGaps expectations.
No Ray needed: the algebra is pure per-doc computation."""

import pytest

import lucene_ray.intervals as iv
from lucene_ray.analysis import tokenize

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine days old.  Some like it hot, some like it cold, some like it "
    "in the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot "
    "twelve days old.  Some like it cold, some like it hot, some like "
    "it in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
    "",
]
FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
    "the quick brown fox jumps over the lazy dog",
]

_DOCS = {"field1": [tokenize(t.lower()) for t in FIELD1],
         "field2": [tokenize(t.lower()) for t in FIELD2]}
_VOCAB1 = sorted({t for toks in _DOCS["field1"] for t in toks})


def _positions(field, doc_id):
    toks = _DOCS[field][doc_id]
    pos = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)

    def get(fld, term):
        f = fld if fld in _DOCS else field
        if f != field:
            tk = _DOCS[f][doc_id]
            pp = [i for i, t in enumerate(tk) if t == term]
            return pp
        return pos.get(term, [])

    return get


def check(source, field, expected, vocab=None):
    """checkIntervals analogue: expected[doc] = flat [s1,e1,s2,e2,...]"""
    if vocab is not None:
        source = iv.expand_multiterms(source, vocab)
    for doc_id, exp in enumerate(expected):
        got = iv.eval_doc(source, _positions(field, doc_id), field)
        flat = [x for s, e, _g, _w in got for x in (s, e)]
        assert flat == exp, (
            f"doc {doc_id}: got {flat}, expected {exp}")


def gaps(source, field, doc_id, expected, vocab=None):
    if vocab is not None:
        source = iv.expand_multiterms(source, vocab)
    got = iv.eval_doc(source, _positions(field, doc_id), field)
    assert [g for _s, _e, g, _w in got][: len(expected)] == expected


T = iv.term


def test_term_query_intervals():
    check(T("porridge"), "field1",
          [[], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [],
           [1, 1, 4, 4, 7, 7], [0, 0], []])


def test_extends():
    check(iv.extend(T("fox"), 1, 2), "field2",
          [[], [], [], [], [], [], [2, 5]])


def test_ordered_near_intervals():
    check(iv.ordered(T("pease"), T("hot")), "field1",
          [[], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], [], []])


def test_ordered_near_with_duplicates():
    src = iv.ordered(T("pease"), T("pease"), T("porridge"))
    check(src, "field1",
          [[], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], [], []])
    gaps(src, "field1", 1, [2, 2])


def test_phrase_intervals():
    check(iv.phrase("pease", "porridge"), "field1",
          [[], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [],
           [0, 1, 3, 4, 6, 7], [], []])


def test_unordered_near_intervals():
    src = iv.unordered(T("pease"), T("hot"))
    check(src, "field1",
          [[], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
           [0, 2, 2, 3, 6, 17], [], []])
    gaps(src, "field1", 1, [1, 0, 10])


def test_unordered_with_repeats():
    check(iv.unordered(T("pease"), T("pease"), T("hot")), "field1",
          [[], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [], [0, 3, 2, 6, 3, 17],
           [], []])


def test_unordered_with_repeats_and_maxgaps():
    src = iv.maxgaps(2, iv.unordered(T("pease"), T("pease"), T("hot")))
    check(src, "field1",
          [[], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], [], []])


def test_interval_disjunction():
    check(iv.or_(T("pease"), T("hot"), T("notmatching")), "field1",
          [[], [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
           [0, 0, 3, 3, 5, 5, 6, 6, 21, 21], [3, 3, 7, 7],
           [0, 0, 2, 2, 3, 3, 6, 6, 17, 17], [], []])


def test_combination_disjunction():
    check(iv.ordered(iv.or_(T("alph"), T("sacred")), T("measureless")),
          "field2", [[], [3, 8], [], [], [], [], []])


def test_nesting():
    src = iv.unordered(T("pease"), T("porridge"),
                       iv.or_(T("hot"), T("cold")))
    exp = [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17]
    check(src, "field1", [[], exp, exp, [], exp, [], []])
    gaps(src, "field1", 1, [0, 0, 0, 0, 0, 0, 9])


def test_offset_intervals():
    src = iv.unordered(T("pease"), T("porridge"),
                       iv.or_(T("hot"), T("cold")))
    before = iv.Src("offset", (src,), flag=True)
    expb = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    check(before, "field1", [[], expb, expb, [], expb, [], []])
    after = iv.Src("offset", (src,), flag=False)
    expa = [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 18, 18]
    check(after, "field1", [[], expa, expa, [], expa, [], []])


def test_nesting2():
    src = iv.unordered(
        iv.ordered(T("like"), T("it"), T("cold")), T("pease"))
    check(src, "field1", [[], [6, 21], [6, 17], [], [], [], []])


def test_interleaved_ordered():
    src = iv.ordered(T("a"), T("b"), T("c"))
    check(src, "field2", [[], [], [0, 3, 5, 7], [], [], [], []])
    gaps(src, "field2", 2, [1, 0])


def test_unordered_distinct():
    check(iv.unordered_no_overlaps(T("pease"), T("pease")), "field1",
          [[], [0, 3, 3, 6], [0, 3, 3, 6], [], [0, 3, 3, 6], [], []])
    check(iv.unordered_no_overlaps(
        iv.unordered(T("pease"), T("porridge"), T("hot")), T("porridge")),
        "field1",
        [[], [1, 4, 2, 7, 4, 17], [1, 5, 4, 7], [], [1, 4, 2, 7, 4, 17],
         [], []])
    check(iv.unordered_no_overlaps(
        iv.unordered(T("pease"), T("porridge"), T("hot")), T("porridge")),
        "field2", [[], [], [], [], [0, 3], [], []])
    check(iv.unordered_no_overlaps(
        T("porridge"), iv.unordered(T("pease"), T("porridge"))),
        "field1",
        [[], [1, 4, 4, 7], [1, 4, 4, 7], [], [1, 4, 4, 7], [], []])


def test_contained_by():
    src = iv.contained_by(T("porridge"),
                          iv.ordered(T("pease"), T("cold")))
    check(src, "field1",
          [[], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], [], []])


def test_containing():
    src = iv.containing(iv.ordered(T("pease"), T("cold")), T("porridge"))
    check(src, "field1",
          [[], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], [], []])


def test_not_containing():
    src = iv.not_containing(iv.ordered(T("porridge"), T("pease")),
                            T("hot"))
    check(src, "field1", [[], [4, 6], [1, 3], [], [4, 6], [], []])


def test_max_gaps():
    src = iv.maxgaps(1, iv.unordered(T("w1"), T("w3"), T("w4")))
    check(src, "field2", [[], [], [], [], [], [0, 3, 2, 4, 3, 6], []])


def test_max_gaps_with_repeats():
    src = iv.maxgaps(11, iv.ordered(T("pease"), T("pease"), T("hot")))
    check(src, "field1", [[], [], [0, 5], [], [], [], []])
    gaps(src, "field1", 2, [3])


def test_max_gaps_with_only_repeats():
    src = iv.maxgaps(1, iv.ordered(iv.or_(T("pease"), T("hot")),
                                   iv.or_(T("pease"), T("hot"))))
    check(src, "field1",
          [[], [0, 2, 2, 3], [3, 5, 5, 6], [], [0, 2, 2, 3], [], []])
    gaps(src, "field1", 1, [1, 0])


def test_nested_max_gaps():
    src = iv.maxgaps(1, iv.unordered(iv.ordered(T("w1"), T("w3")),
                                     T("w4")))
    check(src, "field2", [[], [], [], [], [], [0, 3, 3, 6, 4, 8], []])
    gaps(src, "field2", 5, [0, 0, 1])


def test_minimum_should_match():
    src = iv.at_least(3, T("porridge"), T("hot"), T("twelve"),
                      T("nine"), T("pease"))
    check(src, "field1",
          [[], [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
           [3, 5, 4, 6, 5, 7, 6, 11, 7, 21], [],
           [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21], [], []])
    gaps(src, "field1", 1, [0, 0, 0, 3, 8])


def test_min_should_match2():
    src = iv.at_least(2, iv.unordered(T("alph"), T("ran")), T("where"),
                      T("river"))
    got = iv.eval_doc(src, _positions("field2", 1), "field2")
    assert [(s, e) for s, e, _g, _w in got] == [(0, 4), (1, 5)]


def test_degenerate_min_should_match():
    src = iv.ordered(iv.at_least(1, T("interest")),
                     iv.at_least(1, T("anyone")))
    got = iv.eval_doc(src, _positions("field1", 0), "field1")
    assert [(s, e) for s, e, _g, _w in got] == [(2, 4)]


def test_defined_gaps():
    src = iv.phrase(T("pease"), iv.extend(T("cold"), 1, 1),
                    T("porridge"))
    check(src, "field1", [[], [3, 7], [0, 4], [], [3, 7], [], []])
    src2 = iv.extend(T("w1"), 5, iv.NO_MORE)
    m = iv.NO_MORE - 1
    check(src2, "field2",
          [[], [], [], [], [], [0, m, 0, m, 5, m], []])


def test_after():
    src = iv.after(T("porridge"), iv.ordered(T("pease"), T("cold")))
    check(src, "field1",
          [[], [7, 7], [4, 4, 7, 7], [], [7, 7], [], []])


def test_before():
    src = iv.before(T("cold"), T("twelve"))
    check(src, "field1", [[], [], [2, 2], [], [5, 5], [], []])


def test_within():
    src = iv.within(T("hot"), 6, iv.or_(T("porridge"), T("fraggle")))
    check(src, "field1",
          [[], [2, 2], [5, 5, 21, 21], [], [2, 2], [], []])


def test_overlapping():
    src = iv.overlapping(iv.unordered(T("hot"), T("porridge")),
                         iv.unordered(T("cold"), T("pease")))
    check(src, "field1",
          [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], [], []])
    gaps(src, "field1", 2, [1, 13])


def test_fixed_field():
    src = iv.phrase(T("alph"), iv.fixfield("field1", T("hot")))
    check(src, "field2", [[], [1, 2], [], [], [], [], []])


def test_prefix():
    check(iv.prefix("p"), "field1",
          [[], [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10, 27, 27],
           [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10], [7, 7],
           [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10], [0, 0], []],
          vocab=_VOCAB1)
    check(iv.prefix("qqq"), "field1", [[], [], [], [], [], [], []],
          vocab=_VOCAB1)
    with pytest.raises(RuntimeError, match="limit 1"):
        iv.expand_multiterms(iv.prefix("p", 1), _VOCAB1)


def test_wildcard():
    check(iv.wildcard("?ot"), "field1",
          [[], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
           [3, 3], [2, 2, 10, 10, 17, 17], [], []], vocab=_VOCAB1)
    with pytest.raises(RuntimeError, match="limit 1"):
        iv.expand_multiterms(iv.wildcard("?ot", 1), _VOCAB1)


def test_regexp():
    check(iv.regexp(".ot"), "field1",
          [[], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
           [3, 3], [2, 2, 10, 10, 17, 17], [], []], vocab=_VOCAB1)


def test_fuzzy_term():
    check(iv.fuzzy_term("kot", 1), "field1",
          [[], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
           [3, 3], [2, 2, 10, 10, 17, 17], [], []], vocab=_VOCAB1)


def test_range():
    check(iv.term_range("cold", "hot", True, True), "field1",
          [[5, 5], [2, 2, 5, 5, 12, 12, 17, 17, 21, 21, 29, 29],
           [2, 2, 5, 5, 12, 12, 17, 17, 21, 21, 27, 27],
           [1, 1, 3, 3, 4, 4], [2, 2, 5, 5, 17, 17], [2, 2], []],
          vocab=_VOCAB1)


def test_open_ended_range():
    check(iv.term_range("porridge", None, False, False), "field1",
          [[3, 3], [9, 9, 10, 10, 14, 14, 18, 18, 22, 22, 26, 26, 27, 27],
           [9, 9, 10, 10, 11, 11, 14, 14, 18, 18, 22, 22, 26, 26],
           [8, 8], [9, 9, 10, 10, 12, 12, 14, 14, 18, 18, 21, 21], [],
           []], vocab=_VOCAB1)
    check(iv.term_range(None, "anyone", False, True), "field1",
          [[4, 4], [], [], [], [], [], []], vocab=_VOCAB1)


def test_wrapped_filters():
    src = iv.or_(T("nine"),
                 iv.maxgaps(1, iv.or_(
                     iv.ordered(T("pease"), T("hot")),
                     iv.ordered(T("pease"), T("cold")))))
    check(src, "field1",
          [[], [0, 2, 3, 5, 11, 11, 28, 28], [0, 2, 3, 5], [],
           [0, 2, 3, 5, 11, 11], [], []])


def test_multiterm():
    check(iv.regexp("p.*e"), "field1",
          [[], [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7],
           [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7], [7, 7],
           [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7], [0, 0], []],
          vocab=_VOCAB1)


def test_no_match_msm():
    src = iv.at_least(4, T("a"), T("b"))
    assert iv.eval_doc(src, _positions("field2", 2), "field2") == []


def test_token_stream_to_term_automaton():
    """TokenStreamToTermAutomatonQuery conversion pins (the matcher
    itself is gated by the ft_term_automaton oracle entry)."""
    import pytest as _pytest

    from lucene_ray.search import token_stream_to_term_automaton

    # phrase "a b" with a stacked synonym x over b (posInc 0)
    tr, acc = token_stream_to_term_automaton(
        [("a", 1, 1), ("b", 1, 1), ("x", 0, 1)])
    assert (0, "a", 1) in tr and (1, "b", 2) in tr and (1, "x", 2) in tr
    assert acc == {2}
    # multi-position token: "wifi" spanning 2 positions
    tr2, acc2 = token_stream_to_term_automaton(
        [("wi", 1, 1), ("fi", 1, 1), ("wifi", 0, 2)])
    assert (1, "wifi", 3) in tr2 or (0, "wifi", 2) in tr2
    # '*' becomes ANY
    tr3, _ = token_stream_to_term_automaton([("a", 1, 1), ("*", 1, 1)])
    assert (1, "*", 2) in tr3
    # holes raise unless collapsed
    with _pytest.raises(ValueError):
        token_stream_to_term_automaton([("a", 1, 1), ("b", 2, 1)])
    tr4, acc4 = token_stream_to_term_automaton(
        [("a", 1, 1), ("b", 2, 1)], preserve_position_increments=False)
    assert (1, "b", 2) in tr4 and acc4 == {2}


def test_patience_knn_early_exit():
    """PatienceKnnVectorQuery (core/search/PatienceKnnVectorQuery.java:40
    — default patience max(7, 0.3k), saturation 0.995): the saturation
    early exit keeps high recall while visiting no more nodes than the
    unrestricted beam."""
    import numpy as np

    from lucene_ray.vectors import HnswGraph

    rng = np.random.default_rng(5)
    v = rng.normal(size=(800, 16)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    g = HnswGraph(v)
    q = v[123]
    exact = [n for _s, n in g.search(q, 10, ef=200)]
    patient = [n for _s, n in g.search(q, 10, ef=200,
                                       patience=max(7, 3))]
    # recall floor vs the unrestricted beam
    assert len(set(exact) & set(patient)) >= 8
    assert patient[0] == 123                 # self is always found
    # a zero-patience, always-saturating run terminates immediately
    # after the first candidate round but still returns entry results
    tiny = g.search(q, 5, ef=50, patience=0)
    assert len(tiny) >= 1


def _closure(cands):
    """Containment-minimal closure + dedup, sorted by (start, end)."""
    out = []
    cs = sorted(set(cands))
    for s, e in cs:
        if not any((s2 >= s and e2 <= e and (s2, e2) != (s, e))
                   for s2, e2 in cs):
            out.append((s, e))
    return out


def test_randomized_minimal_closure_differential():
    """The literal iterator transcriptions must emit exactly the
    containment-minimal closure of the naive candidate enumeration for
    ordered / unordered / or / phrase over term leaves (the equivalence
    the SQL oracles rely on). 400 random documents x random trees."""
    import itertools
    import random

    rng = random.Random(42)
    vocab = list("abcde")
    for trial in range(400):
        n = rng.randint(0, 14)
        doc = [rng.choice(vocab) for _ in range(n)]
        pos = {}
        for i, t in enumerate(doc):
            pos.setdefault(t, []).append(i)
        gp = lambda f, t: pos.get(t, [])
        k = rng.randint(2, 3)
        terms = rng.sample(vocab, k)
        kind = rng.choice(["ordered", "unordered", "or", "phrase"])
        if kind == "ordered":
            src = iv.ordered(*[T(t) for t in terms])
            cands = []
            lists = [pos.get(t, []) for t in terms]
            for combo in itertools.product(*lists):
                if all(combo[i + 1] > combo[i]
                       for i in range(len(combo) - 1)):
                    cands.append((combo[0], combo[-1]))
        elif kind == "unordered":
            src = iv.unordered(*[T(t) for t in terms])
            cands = []
            lists = [pos.get(t, []) for t in terms]
            for combo in itertools.product(*lists):
                cands.append((min(combo), max(combo)))
        elif kind == "phrase":
            src = iv.phrase(*terms)
            cands = []
            lists = [pos.get(t, []) for t in terms]
            for combo in itertools.product(*lists):
                if all(combo[i + 1] == combo[i] + 1
                       for i in range(len(combo) - 1)):
                    cands.append((combo[0], combo[-1]))
        else:
            src = iv.or_(*[T(t) for t in terms])
            cands = [(p, p) for t in terms for p in pos.get(t, [])]
        if any(not pos.get(t) for t in terms) and kind != "or":
            expected = []
        else:
            expected = _closure(cands)
        got = [(s, e) for s, e, _g, _w in iv.eval_doc(src, gp)]
        assert sorted(got) == expected, (
            f"trial {trial} kind {kind} doc {doc} terms {terms}: "
            f"{sorted(got)} != {expected}")


def test_randomized_repeats_closure_differential():
    """Repeated-term ordered/unordered trees (the RepeatingIntervals
    path) also emit the containment-minimal closure of all
    DISTINCT-position combinations."""
    import itertools
    import random

    rng = random.Random(17)
    vocab = list("abc")
    for trial in range(300):
        n = rng.randint(0, 12)
        doc = [rng.choice(vocab) for _ in range(n)]
        pos = {}
        for i, t in enumerate(doc):
            pos.setdefault(t, []).append(i)
        gp = lambda f, t: pos.get(t, [])
        terms = [rng.choice(vocab) for _ in range(rng.randint(2, 3))]
        kind = rng.choice(["ordered", "unordered"])
        lists = [pos.get(t, []) for t in terms]
        cands = []
        for combo in itertools.product(*lists):
            if len(set(combo)) != len(combo):
                continue                      # distinct positions
            if kind == "ordered":
                if all(combo[i + 1] > combo[i]
                       for i in range(len(combo) - 1)):
                    cands.append((combo[0], combo[-1]))
            else:
                cands.append((min(combo), max(combo)))
        src = (iv.ordered if kind == "ordered" else iv.unordered)(
            *[T(t) for t in terms])
        if any(not pos.get(t) for t in set(terms)):
            expected = []
        else:
            expected = _closure(cands)
        got = [(s, e) for s, e, _g, _w in iv.eval_doc(src, gp)]
        assert sorted(set(got)) == expected, (
            f"trial {trial} kind {kind} doc {doc} terms {terms}: "
            f"{sorted(set(got))} != {expected}")
