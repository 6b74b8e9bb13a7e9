"""BM25 float32 parity + property tests.

Mirrors the reference's TestBM25Similarity / BaseSimilarityTestCase
(core/src/test/org/apache/lucene/search/similarities/TestBM25Similarity.java:22):
score finite and non-negative, monotone in freq, anti-monotone in length —
plus hand-computed float32 goldens following the exact op order of
BM25Similarity.java:100-108,177-184,219-233.
"""

import math
import struct

import numpy as np
import pytest

from lucene_ray import bm25
from lucene_ray.smallfloat import LENGTH_TABLE, int_to_byte4


def f32(x) -> np.float32:
    return np.float32(x)


def scalar_score(freq, norm_byte, df, doc_count, sum_ttf):
    """Independent scalar reimplementation with Java float semantics via
    struct-based float32 rounding at every step."""
    def F(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    idf = F(math.log(1 + (doc_count - df + 0.5) / (df + 0.5)))
    avgdl = F(sum_ttf / doc_count)
    table = float(LENGTH_TABLE[norm_byte])
    cache = F(1.0 / F(F(1.2) * F(F(0.25) + F(F(F(0.75) * table) / avgdl))))
    weight = idf  # boost = 1
    return F(weight - F(weight / F(1.0 + F(freq * cache))))


CASES = [
    # (freq, length, df, doc_count, sum_ttf)
    (1, 1, 1, 1, 1),
    (1, 10, 5, 100, 1000),
    (3, 25, 17, 1000, 54321),
    (7, 255, 999, 1000, 250000),
    (2, 100000, 3, 12345, 9876543),
    (100, 40, 1, 2, 80),
    (1, 0, 1, 10, 100),   # empty field (norm byte 0 → length 0)
    (42, 4096, 500000, 1000000, 123456789),
]


@pytest.mark.parametrize("freq,length,df,doc_count,sum_ttf", CASES)
def test_scalar_goldens(freq, length, df, doc_count, sum_ttf):
    norm = int(int_to_byte4(np.array([length]))[0])
    s = bm25.scorer(df, doc_count, sum_ttf)
    got = s.score(np.array([freq]), np.array([norm]))[0]
    expect = scalar_score(freq, norm, df, doc_count, sum_ttf)
    assert got == np.float32(expect), (got, expect)
    assert got.dtype == np.float32


def test_idf_float32_exact():
    # idf computed in float64, cast once — not log1p
    v = bm25.idf(5, 100)
    assert v == np.float32(math.log(1 + (100 - 5 + 0.5) / (5 + 0.5)))


def test_monotone_in_freq():
    s = bm25.scorer(10, 1000, 50000)
    freqs = np.arange(1, 1000)
    norms = np.full(len(freqs), 120)
    scores = s.score(freqs, norms)
    assert np.all(np.diff(scores) >= 0)
    assert np.all(scores >= 0)
    assert np.all(np.isfinite(scores))


def test_anti_monotone_in_length():
    s = bm25.scorer(10, 1000, 50000)
    norms = np.arange(256)
    scores = s.score(np.full(256, 5), norms)
    # LENGTH_TABLE is strictly increasing → score non-increasing in norm byte
    assert np.all(np.diff(scores) <= 0)


def test_max_score_bounds_all_pairs():
    s = bm25.scorer(3, 1000, 50000)
    freqs = np.array([1, 2, 5, 9])
    norms = np.array([200, 150, 90, 10], dtype=np.uint8)
    ub = s.max_score(freqs, norms)
    assert ub >= s.score(freqs, norms).max()
