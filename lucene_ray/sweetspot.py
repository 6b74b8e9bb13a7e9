"""SweetSpotSimilarity — the classic TF-IDF scorer with a flat
"sweet spot" length norm.

Reference: ``misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:36``
(lengthNorm ``1/sqrt(steepness*(|x-min|+|x-max|-(max-min))+1)``,
SweetSpotSimilarity.java:111-120; baselineTf with default base=0 min=0
degrades to ``(float) Math.sqrt(freq)``, SweetSpotSimilarity.java:142-146)
layered over the TFIDFSimilarity scorer mechanics
(``search/similarities/TFIDFSimilarity.java:436-477``: a 256-entry
norm table indexed by the stored norm byte, ``normTable[0] =
1/normTable[255]``, and ``score = tf(freq) * (boost*idf) * normTable[norm]``
in float32 op order) with ClassicSimilarity's idf
(``ClassicSimilarity.java:69``: ``(float)(log((docCount+1)/(double)
(docFreq+1)) + 1.0)``).

Float parity: every (float) cast in the Java is an explicit float32
rounding here; scalar logs/sqrts go through C libm (math.*, the bm25.py
rule) so DuckDB REAL-cast chains reproduce scores bit-exactly.
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import LENGTH_TABLE

LN_MIN = 3
LN_MAX = 8
LN_STEEP = 0.5


def idf_classic(doc_freq: int, doc_count: int) -> np.float32:
    """ClassicSimilarity.idf (ClassicSimilarity.java:69)."""
    return np.float32(
        math.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)


def length_norm(num_terms: int) -> np.float32:
    """SweetSpotSimilarity.lengthNorm (SweetSpotSimilarity.java:111-120),
    float32 op order: s * (float)(|x-l|+|x-h|-(h-l)), + 1.0f, then
    (float)(1.0f / Math.sqrt(double))."""
    x = np.float32(abs(num_terms - LN_MIN) + abs(num_terms - LN_MAX)
                   - (LN_MAX - LN_MIN))
    t = np.float32(LN_STEEP) * x + np.float32(1.0)
    return np.float32(1.0 / math.sqrt(float(t)))


def norm_table() -> np.ndarray:
    """TFIDFSimilarity.scorer's 256-entry decoded-norm table
    (TFIDFSimilarity.java:442-447)."""
    nt = np.zeros(256, dtype=np.float32)
    for i in range(1, 256):
        nt[i] = length_norm(int(LENGTH_TABLE[i]))
    nt[0] = np.float32(1.0) / nt[255]
    return nt


def score_terms(tf: np.ndarray, norm_bytes: np.ndarray,
                idf: np.float32, nt: np.ndarray) -> np.ndarray:
    """TFIDFScorer.score (TFIDFSimilarity.java:472-477):
    raw = tf(freq) * queryWeight; raw * normTable[norm] — f32 each."""
    tf_f = np.sqrt(tf.astype(np.float64)).astype(np.float32)
    raw = tf_f * idf
    return raw * nt[norm_bytes.astype(np.int64) & 0xFF]
