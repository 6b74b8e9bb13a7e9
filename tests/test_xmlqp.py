"""XML query parser (queryparser/xml/CoreParser.java:60) tests, keyed to
the reference's TestCoreParser query documents: Boolean occurs incl.
filter, PointRangeQuery inside a Clause, nested DisjunctionMaxQuery
with tieBreaker, ConstantScore/BoostQuery/UserQuery/MatchAll, and the
ParserException analogue on unsupported elements."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.xmlqp import parse_xml


def test_parse_boolean_shapes():
    # the reference's BooleanQuery.xml shape (occurs spellings verbatim)
    q = parse_xml("""<BooleanQuery fieldName="contents">
      <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
      <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
      <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
    </BooleanQuery>""")
    g = q.clauses[0]
    assert g.kind == "group"
    occurs = [c.occur for c in g.sub.clauses]
    assert occurs == ["SHOULD", "MUST_NOT", "MUST"]
    # filter occur → MUST with zero weight (required, unscored)
    q2 = parse_xml("""<BooleanQuery>
      <Clause occurs="filter"><TermQuery>bank</TermQuery></Clause>
    </BooleanQuery>""")
    f = q2.clauses[0].sub.clauses[0]
    assert f.occur == "MUST" and f.boost == 0.0
    # PointRangeQuery attributes (the reference's PointRangeQuery.xml)
    q3 = parse_xml("""<BooleanQuery>
      <Clause occurs="must">
        <PointRangeQuery fieldName="date3" lowerTerm="19870409"
                         upperTerm="19870412"/>
      </Clause></BooleanQuery>""")
    r = q3.clauses[0].sub.clauses[0]
    assert (r.kind, r.field_name, r.lo, r.hi) == \
        ("range", "date3", "19870409", "19870412")
    # nested DisjunctionMaxQuery with tieBreaker
    q4 = parse_xml("""<DisjunctionMaxQuery>
      <TermQuery fieldName="a">merger</TermQuery>
      <DisjunctionMaxQuery tieBreaker="0.3">
        <TermQuery fieldName="b">verger</TermQuery>
      </DisjunctionMaxQuery>
    </DisjunctionMaxQuery>""")
    dm = q4.clauses[0]
    assert dm.kind == "dismax" and dm.tie == 0.0
    assert dm.sub.clauses[1].kind == "dismax"
    assert dm.sub.clauses[1].tie == 0.3
    with pytest.raises(ValueError):
        parse_xml("<SpanTerm fieldName='a'>x</SpanTerm>")
    with pytest.raises(ValueError):
        parse_xml("<BooleanQuery><Clause occurs='bogus'>"
                  "<TermQuery>x</TermQuery></Clause></BooleanQuery>")


def test_xml_search_end_to_end(tmp_path, ray_session):
    """Every element evaluates against the real index: results equal
    the equivalent classic-parser / primitive searches."""
    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus
    from lucene_ray.points import build_numeric_index
    from lucene_ray.search import (IndexReader, search_dismax,
                                   search_parsed, search_xml)

    c = tmp_path / "c"
    os.makedirs(c)
    pq.write_table(generate_corpus(250, seed=17), str(c / "a.parquet"))
    idx = Index.build(str(c), str(tmp_path / "i"), with_positions=True)
    r = idx.reader

    # pick the corpus's four most frequent content terms (the vocab is
    # seed-dependent) — top-df terms are guaranteed to co-occur
    from lucene_ray.search import termdict_scan
    td = termdict_scan(r)
    rows = sorted(zip(td.column("term").to_pylist(),
                      td.column("df").to_pylist()),
                  key=lambda x: (-x[1], x[0]))
    content = [(t, df) for t, df in rows if ":" not in t]
    t1, t2, t3 = [t for t, _ in content[:3]]      # co-occur everywhere
    # exclusion term: rare enough that the MUST_NOT keeps survivors
    t4 = next(t for t, df in content if 0 < df <= len(content) and
              df <= max(2, rows[0][1] // 10))

    # Boolean incl. filter == the raw evaluator with zero-boost MUST
    xml = f"""<BooleanQuery>
      <Clause occurs="should"><TermQuery>{t1}</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>{t2}</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>{t3}</TermQuery></Clause>
      <Clause occurs="mustnot"><TermQuery>{t4}</TermQuery></Clause>
    </BooleanQuery>"""
    a = search_xml(r, xml, 10)
    from lucene_ray.queryparser import Clause, ParsedQuery
    from lucene_ray.search import _eval_parsed, _topk
    ref = ParsedQuery([Clause("term", t1, "SHOULD"),
                       Clause("term", t2, "SHOULD"),
                       Clause("term", t3, "MUST", boost=0.0),
                       Clause("term", t4, "MUST_NOT")])
    d, s = _eval_parsed(r, ref)
    d, s = _topk(d, s, 10)
    np.testing.assert_array_equal(a.doc_ids, d)
    np.testing.assert_array_equal(a.scores, s)
    assert len(a.doc_ids) > 0

    # DisjunctionMaxQuery == search_dismax, incl. tieBreaker
    for tie in (0.0, 0.3):
        xm = (f'<DisjunctionMaxQuery tieBreaker="{tie}">'
              f"<TermQuery>{t1}</TermQuery><TermQuery>{t2}</TermQuery>"
              f"</DisjunctionMaxQuery>")
        got = search_xml(r, xm, 10)
        want = search_dismax(r, [t1, t2], 10, tie_breaker=tie)
        np.testing.assert_array_equal(got.doc_ids, want.doc_ids)
        np.testing.assert_array_equal(got.scores, want.scores)

    # ConstantScore(UserQuery) → classic doc set at constant boost
    cs = search_xml(r, f"""<ConstantScoreQuery boost="2.5">
        <UserQuery>+{t1} +{t2}</UserQuery>
      </ConstantScoreQuery>""", 10_000)
    cl = search_parsed(r, f"+{t1} +{t2}", 10_000)
    np.testing.assert_array_equal(np.sort(cs.doc_ids),
                                  np.sort(cl.doc_ids))
    assert set(cs.scores.tolist()) == {np.float32(2.5)}

    # MatchAll + filter → exactly the filter term's live doc set, 1.0f
    from lucene_ray.search import _term_docset
    ma = search_xml(r, f"""<BooleanQuery>
      <Clause occurs="must"><MatchAllDocsQuery/></Clause>
      <Clause occurs="filter"><TermQuery>{t3}</TermQuery></Clause>
    </BooleanQuery>""", 10_000)
    np.testing.assert_array_equal(np.sort(ma.doc_ids),
                                  _term_docset(r, t3))
    assert set(ma.scores.tolist()) == {np.float32(1.0)}

    # PointRangeQuery through a built numeric point index
    build_numeric_index(idx.index_dir, "field_len")
    pr = search_xml(r, """<BooleanQuery>
      <Clause occurs="must">
        <PointRangeQuery fieldName="field_len" lowerTerm="100"
                         upperTerm="300"/>
      </Clause></BooleanQuery>""", 10_000)
    dm = pq.read_table(os.path.join(idx.index_dir, "docmeta"),
                       columns=["doc_id", "field_len"])
    fl = dm.column("field_len").to_numpy()
    want = np.sort(dm.column("doc_id").to_numpy()[(fl >= 100)
                                                  & (fl <= 300)])
    np.testing.assert_array_equal(np.sort(pr.doc_ids), want)

    # api surface + unsupported element
    hits = idx.xml_search(f"<TermsQuery>{t1} {t2}</TermsQuery>", 5)
    assert len(hits) == 5
    with pytest.raises(ValueError):
        idx.xml_search("<LikeThisQuery>x</LikeThisQuery>")
