"""Solr and WordNet synonym-format parsers against the reference test
files (synonym/synonyms.txt, synonyms-wordnet.txt)."""

import os

import pytest

from lucene_ray.synparse import (parse_solr_synonyms,
                                 parse_wordnet_synonyms)

_BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
         "lucene/analysis/synonym/")


def _read(name):
    p = _BASE + name
    if not os.path.exists(p):
        pytest.skip("reference files unavailable")
    return open(p, encoding="utf-8").read()


def test_solr_reference_file():
    syn = parse_solr_synonyms(_read("synonyms.txt"))
    assert syn["aaa"] == ["aaaa"]
    assert syn["ccc"] == ["cccc1", "cccc2"]
    assert syn["bbb"] == ["bbbb1 bbbb2"]       # multi-word kept
    # escaped arrows and commas
    assert syn["a=>a"] == ["b=>b"]
    assert syn["a,a"] == ["b,b"]
    # expanded group: every member maps to every other
    assert sorted(syn["GB"]) == ["gib", "gigabyte", "gigabytes"]
    assert "GB" in syn["gib"]
    assert syn["pixima"] == ["pixma"]


def test_solr_no_expand():
    syn = parse_solr_synonyms("a, b, c", expand=False)
    assert syn == {"b": ["a"], "c": ["a"]}


def test_wordnet_reference_file():
    syn = parse_wordnet_synonyms(_read("synonyms-wordnet.txt"))
    assert "2nd" in syn["second"] and "two" in syn["second"]
    assert "second" in syn["2nd"]


def test_wordnet_quote_escape():
    syn = parse_wordnet_synonyms(
        "s(1,1,'it''s',n,1,0).\ns(1,2,'its',n,1,0).")
    assert syn == {"it's": ["its"], "its": ["it's"]}


def test_feeds_index_synonyms(ray_session):
    # the parsed dict is exactly the build's index_synonyms shape
    from lucene_ray.analysis import term_freq_batch
    syn = parse_solr_synonyms("fast => quick\nspeedy, fast")
    single = {k: [v for v in vs if " " not in v]
              for k, vs in syn.items()}
    out = term_freq_batch(["a fast car"], synonyms=single)
    terms = set(out[0].to_pylist())
    assert {"fast", "quick", "speedy"} <= terms
