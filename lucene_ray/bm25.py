"""BM25 scoring with Lucene's exact float32 semantics, vectorized.

Reproduces ``search/similarities/BM25Similarity.java`` from the reference:

- ``idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  — float64 inside, cast to float32 (BM25Similarity.java:100-103).
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)``
  (BM25Similarity.java:106-108).
- ``cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))`` — all
  float32 arithmetic (BM25Similarity.java:177-180).
- ``score = weight - weight / (1 + freq * cache[norm])`` with
  ``weight = boost * idf`` — float32 (BM25Similarity.java:219-233).

NumPy float32 arithmetic is IEEE-754 round-to-nearest like Java ``float``,
so keeping the same operation order yields bit-identical scores.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """BM25Similarity.idf (BM25Similarity.java:100-103)."""
    # NB: Java computes Math.log(1 + x) literally — double add then log —
    # not log1p. Use C libm log (math.log) rather than numpy's vectorized
    # log so the scalar matches other libm users (e.g. DuckDB ln) exactly.
    import math

    return np.float32(
        math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))
    )


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """BM25Similarity.avgFieldLength (BM25Similarity.java:106-108)."""
    return np.float32(np.float64(sum_total_term_freq) / np.float64(doc_count))


def norm_inverse_cache(avgdl: np.float32) -> np.ndarray:
    """Per-norm-byte 1/norm cache (BM25Similarity.java:177-180), float32[256].

    cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
    """
    one = np.float32(1.0)
    # (1 - b) is an exact float32 constant (0.25)
    inner = (one - B) + (B * LENGTH_TABLE) / np.float32(avgdl)
    return (one / (K1 * inner)).astype(np.float32)


@dataclass(frozen=True)
class SimScorer:
    """One scorer per query term, shared by all partitions — mirrors Lucene's
    single BM25Scorer per TermWeight built from *global* collection/term stats
    (search/IndexSearcher.java:1125,1140-1155)."""

    weight: np.float32           # boost * idf (boost = 1)
    cache: np.ndarray            # float32[256] norm inverses

    def score(self, freq: np.ndarray, norm: np.ndarray) -> np.ndarray:
        """score(freq, encodedNorm) — BM25Similarity.java:219-233, float32.

        freq: int array of term frequencies; norm: uint8 norm bytes.
        """
        one = np.float32(1.0)
        norm_inverse = self.cache[np.asarray(norm, dtype=np.uint8)]
        f = np.asarray(freq).astype(np.float32)
        return (self.weight - self.weight / (one + f * norm_inverse)).astype(
            np.float32
        )

    def max_score(self, freqs: np.ndarray, norms: np.ndarray) -> np.float32:
        """Upper score bound over a set of competitive (freq, norm) impacts —
        the role of MaxScoreCache.computeMaxScore over an impact frontier
        (search/MaxScoreCache.java:57)."""
        if len(freqs) == 0:
            return np.float32(0.0)
        return np.float32(np.max(self.score(freqs, norms)))


def scorer(doc_freq: int, doc_count: int, sum_total_term_freq: int,
           boost: float = 1.0) -> SimScorer:
    """Build the per-term scorer from global stats (BM25Similarity.scorer,
    BM25Similarity.java:171-184)."""
    w = np.float32(np.float32(boost) * idf(doc_freq, doc_count))
    avgdl = avg_field_length(sum_total_term_freq, doc_count)
    return SimScorer(weight=w, cache=norm_inverse_cache(avgdl))


def scorer_multi(doc_freqs: list[int], doc_count: int,
                 sum_total_term_freq: int, boost: float = 1.0) -> SimScorer:
    """Multi-term scorer: idf = sum of the per-term float32 idfs,
    accumulated in a double and cast to float (BM25Similarity.idfExplain
    over TermStatistics[], BM25Similarity.java:160-169) — the scorer
    PhraseQuery/MultiPhraseQuery builds (PhraseQuery.java:441-470).
    Terms with df == 0 are skipped (PhraseQuery.getStats termUpTo)."""
    total = np.float64(0.0)
    for df in doc_freqs:
        if df > 0:
            total += np.float64(idf(df, doc_count))
    w = np.float32(np.float32(boost) * np.float32(total))
    avgdl = avg_field_length(sum_total_term_freq, doc_count)
    return SimScorer(weight=w, cache=norm_inverse_cache(avgdl))
