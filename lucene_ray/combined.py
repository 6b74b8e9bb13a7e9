"""CombinedFieldQuery — BM25F over fields stored as parallel indexes.

Reference: ``sandbox/search/CombinedFieldQuery.java:67-103`` (treat several
fields as one synthetic field: merged pseudo statistics, summed weighted
freqs, one similarity scorer) and ``sandbox/search/
MultiNormsLeafSimScorer.java:144-156`` (the combined norm: the weighted sum
of each field's DECODED norm lengths, re-quantized through
``SmallFloat.intToByte4(Math.round(...))``).

Fields here are parallel indexes over the same corpus keys (same docID
assignment), the moral equivalent of per-field postings + per-field norms
inside one Lucene segment. The exact reference semantics reproduced:

- pseudo term stats (CombinedFieldQuery.java:309-327): df = max over all
  (field, term) of docFreq; ttf = Java ``long += (double) w * ttf`` (the
  BM25 scorer ignores ttf, so only df feeds scoring);
- pseudo collection stats (CombinedFieldQuery.java:336-352): docCount and
  maxDoc and sumDocFreq take the max across fields; sumTotalTermFreq is
  the ``long += (double) w * sum`` weighted accumulation — this drives
  avgdl;
- freq (CombinedFieldQuery.java:469-480): Σ over matching (field, term)
  iterators of ``w_f * freq`` accumulated in float32;
- norm (MultiNormsLeafSimScorer.java:144-156): Σ_f ``w_f *
  LENGTH_TABLE[normByte_f]`` in float32, then
  ``intToByte4(Math.round(v))`` — note the RE-quantization;
- a single SimScorer scores ``(combined_freq, combined_norm_byte)`` —
  multi-term CombinedFieldQueries are ONE synthetic clause, not a sum of
  per-term scores.

Scoring is exhaustive over the union doc-set (the reference's own scorer
is a plain disjunction whose ``getMaxScore`` is the constant
``score(+inf, 1)`` — no block-max pruning exists to reproduce).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from . import bm25
from .codec import decode_blocks
from .search import IndexReader, TopDocs, _topk
from .smallfloat import LENGTH_TABLE, int_to_byte4
from .state.manifest import max_assigned_doc


def _norm_bytes(reader: IndexReader) -> np.ndarray:
    """Per-doc norm bytes of one field — the norms file role
    (codecs/lucene90/Lucene90NormsFormat.java): docmeta field lengths
    re-encoded through intToByte4, indexed by docID."""
    cached = getattr(reader, "_combined_norm_bytes", None)
    if cached is not None:
        return cached
    # sized by the docID ceiling, not doc_count (expunge lowers the
    # latter while docmeta keeps original docIDs)
    out = np.zeros(max_assigned_doc(reader.manifest), dtype=np.uint8)
    dm = os.path.join(reader.index_dir, "docmeta")
    for f in sorted(os.listdir(dm)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(dm, f),
                          columns=["doc_id", "field_len"])
        ids = t.column("doc_id").to_numpy()
        ln = t.column("field_len").to_numpy().astype(np.int64)
        out[ids] = int_to_byte4(ln).astype(np.uint8)
    reader._combined_norm_bytes = out
    return out


def _java_weighted_long_sum(pairs) -> int:
    """Java ``long acc = 0; acc += (double) floatWeight * longVal`` —
    double add, truncating long cast at each step."""
    acc = 0
    for w, v in pairs:
        acc = int(np.float64(acc) + np.float64(np.float32(w))
                  * np.float64(v))
    return acc


def combined_field_search(fields: "list[tuple[IndexReader, float]]",
                          query: str, k: int = 10,
                          boost: float = 1.0) -> TopDocs:
    """BM25F top-k: ``fields`` is [(reader, weight), ...] over parallel
    indexes with identical docID assignment; ``query`` analyzes with the
    first reader's chain. Ties break by docID ascending."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if not fields:
        raise ValueError("at least one (reader, weight) field required")
    for _, w in fields:
        if not (w > 0) or not np.isfinite(w):
            raise ValueError("field weights must be finite and > 0 "
                             "(CombinedFieldQuery.java:141)")
    terms = fields[0][0].analyze(query)
    if not terms:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)

    # pseudo collection statistics (max / weighted-sum merge)
    doc_count = max(r.doc_count for r, _ in fields)
    max_doc = max(max_assigned_doc(r.manifest) for r, _ in fields)
    sum_ttf = _java_weighted_long_sum(
        (w, r.sum_ttf) for r, w in fields)

    postings = []                      # (weight, TermPostings, reader)
    df = 0
    for r, w in fields:
        for t in terms:
            p = r.postings(t)
            if p is not None and p.df > 0:
                df = max(df, p.df)
                postings.append((w, p, r))
    if df == 0:
        return TopDocs(np.empty(0, np.int64), np.empty(0, np.float32), 0)
    sim = bm25.scorer(df, doc_count, sum_ttf, boost=boost)

    # combined norms: Σ w_f * decodedLen_f in float32, re-quantized
    nv = np.zeros(max_doc, dtype=np.float32)
    for r, w in fields:
        nb = _norm_bytes(r)
        nv = (nv + np.float32(w) * LENGTH_TABLE[
            np.pad(nb, (0, max_doc - len(nb)))]).astype(np.float32)
    # Java Math.round(float) = floor(x + 0.5)
    combined_byte = int_to_byte4(
        np.floor(nv.astype(np.float64) + 0.5).astype(np.int64)
    ).astype(np.uint8)

    # combined freq: Σ w_f * tf over every matching (field, term) iterator
    freq = np.zeros(max_doc, dtype=np.float32)
    matched = np.zeros(max_doc, dtype=bool)
    for w, p, r in postings:
        d, tf, _, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                    p.tfs_enc, p.norms_enc)
        np.add.at(freq, d, (np.float32(w)
                            * tf.astype(np.float32)).astype(np.float32))
        matched[d] = True

    docs = np.flatnonzero(matched).astype(np.int64)
    lm = fields[0][0].live_mask(docs)
    if lm is not None:
        docs = docs[lm]
    scores = sim.score(freq[docs], combined_byte[docs])
    d, s = _topk(docs, scores.astype(np.float32), k)
    return TopDocs(d, s, len(docs))
