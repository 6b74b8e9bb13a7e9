"""Stempel (Polish) gates: the reference PolishAnalyzer/factory test
expectations, regression pins over the bundled table, and never-throws
fuzz. (TestPolishAnalyzer.java:30-47,
TestStempelPolishStemFilterFactory.java:31-38.)"""

import random

from lucene_ray.stempel import (MultiTrie2, load_table, polish_analyze,
                                polish_stop_set, stem, stempel_filter)


def test_table_loads_as_multitrie2():
    t = load_table()
    assert isinstance(t, MultiTrie2)
    assert len(t.tries) == 8 and t.by == 1


def test_reference_analyzer_pairs():
    # TestPolishAnalyzer.testBasics + factory test
    assert stem("studenta") == "student"
    assert stem("studenci") == "student"
    # stopword removal: "był" is in the bundled stopwords.txt
    assert polish_analyze(["był"]) == []
    assert polish_analyze(["studenta"]) == ["student"]


def test_regression_pins():
    # pinned behaviors of the bundled table (loader regressions —
    # these reproduce well-known stempel outputs)
    assert stem("studentów") == "student"
    assert stem("polskiego") == "polski"
    assert stem("miastach") == "miasto"
    assert stem("programowanie") == "programować"


def test_filter_min_length_and_null_stem():
    # < 3 chars pass unchanged (StempelFilter.DEFAULT_MIN_LENGTH)
    assert stempel_filter(["ab"]) == ["ab"]
    # unknown-pattern words with an empty patch stem to themselves
    out = stempel_filter(["zzzz"])
    assert len(out) == 1 and isinstance(out[0], str)


def test_stop_set_parses():
    s = polish_stop_set()
    assert "był" in s and "i" in s and len(s) > 100


def test_never_throws_fuzz():
    rng = random.Random(7)
    alphabet = "aąbcćdeęfghijklłmnńoóprsśtuwyzźż"
    for _ in range(3000):
        w = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 15)))
        s = stem(w)
        assert s is None or isinstance(s, str)
    # mixed scripts / punctuation
    for w in ["日本語", "a-b", "ŁÓDŹ", "", "x", "żółć" * 20]:
        stempel_filter([w])


def test_monitor_query_serializer(tmp_path):
    """save/load of the percolator's query registrations
    (MonitorQuerySerializer role)."""
    import pytest as _pytest

    from lucene_ray.monitor import load_queries, save_queries

    qs = [(1, {"should": ["a", "b"], "msm": 1}),
          (2, {"phrase": ["x", "y"]}),
          (3, {"must": ["k"]})]
    p = str(tmp_path / "queries.jsonl")
    save_queries(p, qs)
    assert load_queries(p) == qs
    with open(p, "a") as f:
        f.write("{broken\n")
    with _pytest.raises(Exception):
        load_queries(p)
