"""OSA distance + FuzzyLikeThisQuery expansion.
"""

def test_osa_distance_is_automaton_not_full_damerau():
    """FuzzyTermsEnum's transposition automata are OSA
    (LevenshteinAutomata.java:60): a transposed pair cannot be edited
    again, so ca->abc is 3, not full-Damerau 2 — the divergence class
    the FLT oracle's damerau_levenshtein stand-in must never meet."""
    from lucene_ray.search import _osa_distance
    assert _osa_distance("ca", "abc", 3) == 3
    assert _osa_distance("ab", "ba", 2) == 1        # plain transposition
    assert _osa_distance("abcd", "acbd", 2) == 1
    assert _osa_distance("abc", "abc", 2) == 0
    assert _osa_distance("abc", "axc", 2) == 1
    assert _osa_distance("abc", "xabcy", 2) == 2
    assert _osa_distance("abc", "zzzz", 2) == 3     # bounded early-out


def test_fuzzy_like_this_expansion_order():
    """Variant/global queues keep (score desc, term asc) — the
    reference PQ comparator (FuzzyLikeThisQuery.java:265-270) pops the
    lowest score and, on ties, the LARGER term first."""
    from lucene_ray.pipelines.fulltext import (_flt_expand, FLT_QUERIES,
                                               reader_for)
    r = reader_for("/root/testdata/sf0.001")
    out = _flt_expand(r, "valu", 1)
    assert out, "expected at least one variant for 'valu'"
    scores = [float(s) for _, _, s in out]
    assert scores == sorted(scores, reverse=True)
    terms = [t for _, t, _ in out]
    assert "value" in terms
