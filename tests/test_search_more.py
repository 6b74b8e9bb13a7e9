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


def test_quality_stats_reference_quirks(ray_session):
    """QualityStats' exact metric chain (QualityStats.java:28):
    MRR only counts a first relevant hit ranked <= 5 (:66-68), p@n
    beyond the result list extrapolates numPoints·pAt[numPoints]/n
    (:96-98), and average precision divides by the JUDGMENT size."""
    from lucene_ray.pipelines.fulltext import ft_quality_eval
    t = ft_quality_eval("/root/testdata/sf0.001").to_pandas()
    by = {(int(r.qid), r.metric): r.value for r in t.itertuples()}
    # qid 4 = zzmissing: empty result list -> everything 0
    for m in ("p_at_1", "p_at_10", "mrr", "avp", "recall", "num_good"):
        assert by[(4, m)] == 0.0, m
    # qid 2 = single common term: every hit contains the term, so the
    # judgment equals the matching set and precision@k is 1 while the
    # list is full
    assert by[(2, "p_at_1")] == 1.0
    assert by[(2, "p_at_20")] == 1.0
    assert by[(2, "mrr")] == 1.0
    # benchmark means (qid -1) average the per-query rows
    import numpy as np
    vals = [by[(q, "p_at_10")] for q, _ in
            [(1, 0), (2, 0), (3, 0), (4, 0)]]
    acc = 0.0
    for v in vals:
        acc += v
    assert by[(-1, "p_at_10")] == acc / 4


def test_field_exists_query(tmp_path_factory, ray_session):
    """FieldExistsQuery (core/search/FieldExistsQuery.java): docs
    carrying a value for the field; a NULL keyword value indexes no
    term (build.py skips None), so the union of the field's postings
    is exactly the existing set."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.build import build_index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.search import IndexReader, search_field_exists

    d = tmp_path_factory.mktemp("fex")
    corpus = str(d / "c")
    os.makedirs(corpus)
    t = generate_corpus(120, seed=9)
    tag = pa.array([None if i % 3 == 0 else f"t{i % 4}"
                    for i in range(120)], pa.string())
    t = t.append_column("tag", tag)
    pq.write_table(t, os.path.join(corpus, "a.parquet"))
    idx = str(d / "i")
    build_index(corpus, idx, term_parts=2, salt_group=1,
                keyword_fields=["tag", "lang"])
    r = IndexReader(idx)
    have = search_field_exists(r, "tag")
    assert len(have) == sum(1 for i in range(120) if i % 3 != 0)
    # every doc has a lang; content exists everywhere
    assert len(search_field_exists(r, "lang")) == 120
    assert len(search_field_exists(r, "content")) == 120
    assert len(search_field_exists(r, "nosuchfield")) == 0
    # deletes drop out of the existing set
    from lucene_ray.build import delete_docs
    delete_docs(idx, doc_ids=[int(have[0])])
    r2 = IndexReader(idx)
    assert int(have[0]) not in set(search_field_exists(r2, "tag"))
