"""LMDirichletSimilarity — Bayesian-smoothed language-model ranking.

Reference: ``core/src/java/org/apache/lucene/search/similarities/
LMDirichletSimilarity.java:76-81`` (score = boost * (ln(1 + freq /
(mu * p_c)) + ln(mu / (docLen + mu))), clamped at 0, default mu=2000)
over ``LMSimilarity.DefaultCollectionModel.computeProbability``
(LMSimilarity.java:151-153: ``(totalTermFreq + 1) / (numberOfFieldTokens
+ 1)`` in doubles) and ``SimilarityBase`` length decoding
(SimilarityBase.java:153-189: docLen = LENGTH_TABLE[norm byte], the
whole score computed in DOUBLE and cast to float once).

Float parity: the interior is pure double math; the only float32
rounding is the final cast. Logs are evaluated once per UNIQUE
(tf) / (norm byte) value through C libm (``math.log``, the bm25.py
rule), so the DuckDB ``ln``-chain oracle is bit-exact.
"""

from __future__ import annotations

import math

import numpy as np

from .smallfloat import LENGTH_TABLE

MU = 2000.0


def score_terms_lm(tf: np.ndarray, norm_bytes: np.ndarray, ttf: int,
                   sum_ttf: int, mu: float = MU) -> np.ndarray:
    """Per-posting LMDirichlet scores, float32 (clamped at 0)."""
    p_c = (ttf + 1.0) / (sum_ttf + 1.0)
    nb = norm_bytes.astype(np.int64) & 0xFF
    # ln(mu / (docLen + mu)) per possible norm byte — 256 scalars
    ln_len = np.array([math.log(mu / (float(LENGTH_TABLE[i]) + mu))
                       for i in range(256)], np.float64)
    # ln(1 + freq / (mu * p_c)) per unique tf; freq passes through the
    # (float) SimScorer boundary first (exact for tf < 2^24)
    utf, inv = np.unique(tf.astype(np.int64), return_inverse=True)
    ln_tf = np.array(
        [math.log(1 + float(np.float32(x)) / (mu * p_c)) for x in utf],
        np.float64)
    s = ln_tf[inv] + ln_len[nb]
    return np.where(s > 0.0, s, 0.0).astype(np.float32)


LAMBDA = 0.1


def score_terms_lmjm(tf: np.ndarray, norm_bytes: np.ndarray, ttf: int,
                     sum_ttf: int, lam: float = LAMBDA) -> np.ndarray:
    """LMJelinekMercerSimilarity.score
    (similarities/LMJelinekMercerSimilarity.java:68-74):
    ``ln(1 + ((1-λ)·freq/docLen) / (λ·p_c))`` — float λ constants widened
    to double, interior all double, one float cast (SimilarityBase).
    Always positive (the argument exceeds 1), so no clamp."""
    p_c = (ttf + 1.0) / (sum_ttf + 1.0)
    one_minus = float(np.float32(1.0) - np.float32(lam))
    lam_d = float(np.float32(lam))
    nb = norm_bytes.astype(np.int64) & 0xFF
    key = tf.astype(np.int64) * 256 + nb
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.array(
        [math.log(1 + (one_minus * float(np.float32(k // 256))
                       / float(LENGTH_TABLE[k % 256]))
                  / (lam_d * p_c)) for k in uk], np.float64)
    return vals[inv].astype(np.float32)


def score_terms_dfr_inl2(tf: np.ndarray, norm_bytes: np.ndarray,
                         df: int, doc_count: int, sum_ttf: int,
                         c: float = 1.0) -> np.ndarray:
    """DFRSimilarity with BasicModelIn + AfterEffectL + NormalizationH2
    ("InL2", the classic DFR default; DFRSimilarity.java:127-131):
    tfn = freq · log2(1 + c·avgFieldLength/docLen)
    (NormalizationH2.java:57-59), after-effect L makes
    aeTimes1pTfn = 1 (AfterEffectL.java:32-34), and
    score = log2((N+1)/(n+0.5)) · (1 − 1/(1+tfn))
    (BasicModelIn.java:34-45). All double (log2 = ln/ln2,
    SimilarityBase.java:164-167), one float32 cast; avgFieldLength =
    sumTTF/docCount (SimilarityBase.java:88)."""
    ln2 = math.log(2.0)
    avg_fl = sum_ttf / float(doc_count)
    a = math.log((doc_count + 1) / (df + 0.5)) / ln2
    nb = norm_bytes.astype(np.int64) & 0xFF
    key = tf.astype(np.int64) * 256 + nb
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.empty(len(uk), np.float64)
    for i, k in enumerate(uk):
        tfn = (float(np.float32(k // 256))
               * (math.log(1 + c * avg_fl / float(LENGTH_TABLE[k % 256]))
                  / ln2))
        vals[i] = a * (1 - 1 / (1 + tfn))
    return vals[inv].astype(np.float32)


def score_terms_ib_spl(tf: np.ndarray, norm_bytes: np.ndarray,
                       df: int, doc_count: int, sum_ttf: int,
                       c: float = 1.0) -> np.ndarray:
    """IBSimilarity with DistributionSPL + LambdaDF + NormalizationH2
    ("SPL-D2"; IBSimilarity.java:115-118): tfn as in InL2,
    λ = (float)((df+1)/(N+1)) (LambdaDF.java:32-33 — a FLOAT, then
    widened), q = 1 − 1/(tfn+1), score = −ln((λ^q − λ)/(1 − λ))
    (DistributionSPL.java:35-59). The nextUp/nextDown degeneracy guards
    (λ==1 or pow rounding onto λ) are asserted not to fire — the SQL
    oracle cannot express them, so a query term hitting them fails
    loudly here instead of silently diverging."""
    lam = float(np.float32((df + 1.0) / (doc_count + 1.0)))
    if lam == 1.0:
        raise ValueError("LambdaDF == 1 (term in every doc): the SPL "
                         "degeneracy guard is outside oracle scope")
    ln2 = math.log(2.0)
    avg_fl = sum_ttf / float(doc_count)
    nb = norm_bytes.astype(np.int64) & 0xFF
    key = tf.astype(np.int64) * 256 + nb
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.empty(len(uk), np.float64)
    for i, k in enumerate(uk):
        tfn = (float(np.float32(k // 256))
               * (math.log(1 + c * avg_fl / float(LENGTH_TABLE[k % 256]))
                  / ln2))
        q = 1 - 1 / (tfn + 1)
        p = math.pow(lam, q)
        if p == lam:
            raise ValueError("SPL pow-rounding guard fired: outside "
                             "oracle scope")
        vals[i] = -math.log((p - lam) / (1 - lam))
    return vals[inv].astype(np.float32)


def score_terms_axiomatic_f2exp(tf: np.ndarray, norm_bytes: np.ndarray,
                                df: int, doc_count: int, sum_ttf: int,
                                s: float = 0.25, k: float = 0.35
                                ) -> np.ndarray:
    """AxiomaticF2EXP (similarities/Axiomatic.java:107-117 composition
    with AxiomaticF2EXP.java:59-85 components — tf and ln are 1, so
    score = tfln · idf): tfln = freq/(freq + s + s·docLen/avgFL)
    (:71-73), idf = ((N+1)/df)^k (:77-79); defaults s=0.25f k=0.35f
    (Axiomatic.java:103), float hyperparams widened to double, interior
    all double, Math.max(0, ·) then one float cast."""
    sd = float(np.float32(s))
    kd = float(np.float32(k))
    avg_fl = sum_ttf / float(doc_count)
    idf = math.pow((doc_count + 1.0) / df, kd)
    nb = norm_bytes.astype(np.int64) & 0xFF
    key = tf.astype(np.int64) * 256 + nb
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.empty(len(uk), np.float64)
    for i, kk in enumerate(uk):
        freq = float(np.float32(kk // 256))
        dl = float(LENGTH_TABLE[kk % 256])
        tfln = freq / (freq + sd + sd * dl / avg_fl)
        vals[i] = max(0.0, tfln * idf)
    return vals[inv].astype(np.float32)


def score_terms_dfi(tf: np.ndarray, norm_bytes: np.ndarray, ttf: int,
                    sum_ttf: int,
                    measure: str = "chisquared") -> np.ndarray:
    """DFISimilarity — divergence from independence
    (similarities/DFISimilarity.java:70-81): expected =
    (totalTermFreq + 1) · docLen / (numberOfFieldTokens + 1); freq <=
    expected scores 0 (the doc still ranks as a hit, SimilarityBase
    keeps it); otherwise score = log2(measure(freq, expected) + 1) with
    measure one of ChiSquared ((f-e)²/e, IndependenceChiSquared.java:34),
    Standardized ((f-e)/√e, IndependenceStandardized.java:34) or
    Saturated ((f-e)/e, IndependenceSaturated.java:33). All double,
    log2 = ln/ln2 (SimilarityBase.java:164-167), one float32 cast."""
    ln2 = math.log(2.0)
    nb = norm_bytes.astype(np.int64) & 0xFF
    key = tf.astype(np.int64) * 256 + nb
    uk, inv = np.unique(key, return_inverse=True)
    vals = np.empty(len(uk), np.float64)
    for i, k in enumerate(uk):
        freq = float(np.float32(k // 256))
        expected = ((ttf + 1.0) * float(LENGTH_TABLE[k % 256])
                    / (sum_ttf + 1.0))
        if freq <= expected:
            vals[i] = 0.0
            continue
        d = freq - expected
        if measure == "chisquared":
            m = d * d / expected
        elif measure == "standardized":
            m = d / math.sqrt(expected)
        elif measure == "saturated":
            m = d / expected
        else:
            raise ValueError(f"unknown independence measure {measure!r}")
        vals[i] = math.log(m + 1.0) / ln2
    return vals[inv].astype(np.float32)


INDRI_MU = 2000.0


def score_terms_indri(tf: np.ndarray, norm_bytes: np.ndarray, ttf: int,
                      sum_ttf: int, mu: float = INDRI_MU) -> np.ndarray:
    """Per-posting IndriDirichlet scores, float32 — UNclamped
    (similarities/IndriDirichletSimilarity.java:72-76: ln((freq +
    μ·P)/(docLen + μ)); the IndriCollectionModel divides ttf by the
    field token count with no add-one, :79-81; SimilarityBase applies
    no floor, so log-probabilities stay negative).  ``tf`` may contain
    zeros — that IS the smoothingScore path (TermScorer.java:103-109
    scores freq=0 with the doc's own norm)."""
    p_c = float(ttf) / float(sum_ttf)
    nb = norm_bytes.astype(np.int64) & 0xFF
    lens = LENGTH_TABLE[nb].astype(np.float64)
    f = tf.astype(np.float32).astype(np.float64)
    interior = (f + mu * p_c) / (lens + mu)
    # C libm log per UNIQUE interior value (np.log drifts a ulp on
    # ~20% of inputs vs DuckDB's libm ln — the repo float-parity rule)
    uniq, inv = np.unique(interior, return_inverse=True)
    logs = np.array([math.log(x) for x in uniq.tolist()], np.float64)
    return logs[inv].astype(np.float32)
