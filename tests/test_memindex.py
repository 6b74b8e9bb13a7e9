"""MemoryIndex unit pins (lucene_ray.memindex): reader surface,
multi-value gaps, freeze, phrase scoring, single-doc BM25 parity with
the engine's scorer. The end-to-end gate is the ft_memory_index oracle
entry."""

import numpy as np
import pytest

from lucene_ray.bm25 import scorer
from lucene_ray.memindex import MemoryIndex
from lucene_ray.smallfloat import int_to_byte4


def test_reader_surface():
    mi = MemoryIndex()
    mi.add_field("content", "the quick brown fox the")
    assert mi.fields() == ["content"]
    assert mi.terms("content") == ["brown", "fox", "quick", "the"]
    assert mi.term_freq("content", "the") == 2
    assert mi.positions("content", "the") == [0, 4]
    assert mi.offsets("content", "quick") == [(4, 9)]
    assert mi.doc_length("content") == 5
    assert mi.term_freq("content", "zz") == 0


def test_multi_value_gap():
    mi = MemoryIndex()
    mi.add_field("f", "a b")
    mi.add_field("f", "c d", pos_inc_gap=10)
    # positions continue after the gap (MemoryIndex.java:517)
    assert mi.positions("f", "c") == [12]
    assert mi.doc_length("f") == 4


def test_freeze():
    mi = MemoryIndex()
    mi.add_field("f", "a")
    mi.freeze()
    with pytest.raises(RuntimeError):
        mi.add_field("f", "b")
    mi.reset()
    mi.add_field("f", "b")          # reset unfreezes


def test_single_doc_bm25_score():
    mi = MemoryIndex()
    mi.add_field("content", "x y x z x")
    # df=1, N=1, sumTTF=5 — the scorer's own chain
    sc = scorer(1, 1, 5)
    norm = int(int_to_byte4(np.array([5], np.int64))[0])
    expected = sc.score(np.array([3]), np.array([norm], np.uint8))[0]
    got = mi.search([("term", "x")])
    assert got == expected
    assert mi.search([("term", "missing")]) == np.float32(0.0)


def test_phrase_and_must():
    mi = MemoryIndex()
    mi.add_field("content", "a b a b c")
    assert mi._phrase_freq("content", ["a", "b"]) == 2
    assert mi.search([("phrase", ["a", "c"])]) == np.float32(0.0)
    # MUST gate: absent must term kills the match entirely
    assert mi.search([("must", "zz"), ("term", "a")]) == np.float32(0.0)
    assert mi.search([("must", "a"), ("term", "c")]) > 0


def test_point_values_reference_battery():
    """TestMemoryIndex.testPointValues (:468-533): odd numbers 1..31
    multi-valued; exact/set/range single-doc counts."""
    mi = MemoryIndex()
    mi.add_point_field("number", *range(1, 32, 2))
    assert mi.point_exact("number", 5)
    assert not mi.point_exact("number", 4)
    assert mi.point_in_set("number", [3, 9, 19])
    assert mi.point_in_set("number", [2, 8, 13])
    assert not mi.point_in_set("number", [2, 8, 16])
    assert mi.point_range("number", 2, 16)
    assert mi.point_range("number", 24, 48)
    assert not mi.point_range("number", 48, 68)


def test_knn_vectors_reference_battery():
    """TestMemoryIndex.testKnnFloatVectors (:760-797) +
    OnlyOneVectorAllowed (:751)."""
    import pytest as _pytest

    mi = MemoryIndex()
    mi.add_vector("knnFloatA", [1.0, 2.0])
    mi.add_vector("knnFloatB", [3.0, 4.0, 5.0, 6.0])
    mi.add_vector("knnFloatC", [7.0, 8.0, 9.0],
                  similarity="dot_product")
    assert mi.vector_value("knnFloatA").tolist() == [1.0, 2.0]
    assert mi.vector_score("knnFloatA", [1.0, 1.0]) == np.float32(0.5)
    assert mi.vector_score(
        "knnFloatB", [3.0, 3.0, 3.0, 3.0]) == np.float32(0.06666667)
    assert mi.vector_score(
        "knnFloatC", [7.0, 7.0, 7.0]) == np.float32(84.5)
    assert mi.vector_value("knnFloatMissing") is None
    with _pytest.raises(ValueError):
        mi.add_vector("knnFloatA", [9.0, 9.0])


def test_typed_freeze_and_reset():
    import pytest as _pytest

    mi = MemoryIndex()
    mi.add_point_field("p", 1)
    mi.add_docvalue("dv", 42)
    mi.freeze()
    with _pytest.raises(RuntimeError):
        mi.add_point_field("p", 2)
    with _pytest.raises(RuntimeError):
        mi.add_vector("v", [1.0])
    mi.reset()
    assert not mi.point_exact("p", 1)
    assert mi.doc_value("dv") is None


def test_knn_byte_vectors_reference_battery():
    """TestMemoryIndex.testKnnByteVectors (:807-843)."""
    import pytest as _pytest

    mi = MemoryIndex()
    mi.add_byte_vector("knnByteA", [1, 2])
    mi.add_byte_vector("knnByteB", [3, 4, 5, 6])
    mi.add_byte_vector("knnByteC", [7, 8, 9], similarity="dot_product")
    assert mi.byte_vector_value("knnByteA").tolist() == [1, 2]
    assert mi.byte_vector_score("knnByteA", [1, 1]) == np.float32(0.5)
    assert mi.byte_vector_score(
        "knnByteB", [3, 3, 3, 3]) == np.float32(0.06666667)
    assert mi.byte_vector_score(
        "knnByteC", [7, 7, 7]) == np.float32(0.501709)
    assert mi.byte_vector_value("knnByteMissing") is None
    with _pytest.raises(ValueError):
        mi.add_byte_vector("knnByteA", [9])


def test_index_intervals_api(ray_session, tmp_path):
    """Index.intervals: the public minimal-interval surface over a
    built index, including multiterm expansion."""
    import pyarrow.parquet as pq

    import lucene_ray.intervals as iv
    from lucene_ray.api import Index
    from lucene_ray.corpus import generate_corpus

    c = tmp_path / "c"
    c.mkdir()
    pq.write_table(generate_corpus(60, seed=21), str(c / "a.parquet"))
    idx = Index.build(str(c), str(tmp_path / "i"), with_positions=True)
    # pick two terms that really co-occur in order in some doc
    from lucene_ray.analysis import tokenize
    corpus = pq.read_table(str(c / "a.parquet"))
    toks = tokenize(corpus.column("content")[0].as_py().lower())
    t1 = toks[0]
    t2 = next(t for t in toks[1:] if t != t1)
    src = iv.ordered(iv.term(t1), iv.term(t2))
    got = idx.intervals(src)
    assert got and all(
        all(s <= e for s, e, _g in lst) for lst in got.values())
    # restriction honors doc_ids
    some = sorted(got)[:2]
    got2 = idx.intervals(src, doc_ids=some)
    assert sorted(got2) == some
    assert {d: got[d] for d in some} == got2
    # multiterm expansion path
    pre = idx.intervals(iv.ordered(iv.prefix(t1[:2], max_expansions=512),
                                   iv.term(t2)))
    assert set(got) <= set(pre)
