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
