"""Streaming percolator — the Lucene Monitor role.

Reference: ``lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:86``
(register queries once, then match a stream of documents against all of
them) with the QueryIndex presolve
(``monitor/QueryIndex.java`` / ``TermFilteredPresearcher.java:62``): the
registered queries' terms form a small vocabulary, and an incoming document
only evaluates the queries whose required terms it actually contains.

Ray-Data shape: the registered query set is compiled ONCE per actor (a
callable class handed to ``map_batches`` — constructor args are broadcast,
never re-shipped per batch); each batch is tokenized with the vectorized
analyzer, tokens are mapped into the query vocabulary with one Arrow
``index_in`` kernel, per-(doc, vocab-term) presence is one NumPy scatter,
and only candidate (doc, query) pairs whose presolve passes run the exact
(positional) matcher. The document side needs NO index — percolation is
the streaming dual of search, so it scales as a pure map over the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analysis import term_freq_batch, tokenize


class PercolatorStage:
    """``map_batches`` callable: batch of documents → (qid, doc) matches.

    ``queries``: list of ``(qid, spec)`` where spec is a dict with one of
      - ``{"must": [terms...]}`` — conjunction (BooleanQuery MUST),
      - ``{"should": [terms...], "msm": m}`` — disjunction with
        minimumNumberShouldMatch,
      - ``{"phrase": [terms...]}`` — exact positional phrase.

    ``id_column``: the identity column copied into the output;
    ``text_column``: the analyzed text column.
    """

    def __init__(self, queries, id_column: str = "doc_id",
                 text_column: str = "text"):
        self.queries = []
        vocab: set[str] = set()
        for qid, spec in queries:
            must = list(spec.get("must") or [])
            should = list(spec.get("should") or [])
            phrase = list(spec.get("phrase") or [])
            msm = int(spec.get("msm", 1 if should else 0))
            vocab.update(must)
            vocab.update(should)
            vocab.update(phrase)
            self.queries.append((qid, must, should, msm, phrase))
        self.vocab = sorted(vocab)
        self.vid = {t: i for i, t in enumerate(self.vocab)}
        self.vocab_arr = pa.array(self.vocab, type=pa.string())
        self.id_column = id_column
        self.text_column = text_column

    def _presence(self, texts: list[str]) -> np.ndarray:
        """(n_docs, n_vocab) bool presence matrix via the vectorized
        analyzer + one index_in + one scatter."""
        import pyarrow.compute as pc

        n = len(texts)
        pres = np.zeros((n, len(self.vocab)), dtype=bool)
        if n == 0 or not self.vocab:
            return pres
        terms, _tfs, owners, _lens, _norms = term_freq_batch(texts)
        if len(terms) == 0:
            return pres
        idx = pc.index_in(terms, value_set=self.vocab_arr)
        idx_np = idx.to_numpy(zero_copy_only=False)
        hit = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" else \
            ~idx.is_null().to_numpy(zero_copy_only=False)
        if not hit.any():
            return pres
        pres[owners[hit], idx_np[hit].astype(np.int64)] = True
        return pres

    @staticmethod
    def _phrase_in(toks: list[str], phrase: list[str]) -> bool:
        t0 = phrase[0]
        n = len(phrase)
        for i, t in enumerate(toks):
            if t == t0 and toks[i:i + n] == phrase:
                return True
        return False

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False)
        pres = self._presence(["" if t is None else t for t in texts])
        out_q: list[np.ndarray] = []
        out_i: list[np.ndarray] = []
        # per-doc exact tokens, computed lazily only for phrase candidates
        tok_cache: dict[int, list[str]] = {}
        for qid, must, should, msm, phrase in self.queries:
            need = must + phrase
            mask = np.ones(len(texts), dtype=bool)
            for t in need:
                mask &= pres[:, self.vid[t]]
            if should:
                cnt = np.zeros(len(texts), dtype=np.int64)
                for t in should:
                    cnt += pres[:, self.vid[t]]
                mask &= cnt >= msm
            if phrase and mask.any():
                for d in np.flatnonzero(mask):
                    toks = tok_cache.get(d)
                    if toks is None:
                        toks = tok_cache[d] = tokenize(texts[d] or "")
                    if not self._phrase_in(toks, phrase):
                        mask[d] = False
            sel = np.flatnonzero(mask)
            if len(sel):
                out_q.append(np.full(len(sel), qid, dtype=np.int64))
                out_i.append(ids[sel])
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()),
                             self.id_column: pa.array([], pa.int64())})
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         self.id_column: pa.array(
                             np.concatenate(out_i).astype(np.int64))})


def percolate(ds, queries, id_column: str = "doc_id",
              text_column: str = "text", concurrency=(1, 8)):
    """Match every registered query against every document of ``ds``.

    Returns a Dataset of (qid, id_column) match rows. Stateful actor-pool
    stage: query compilation happens once per actor, batches stream.
    """
    return ds.map_batches(
        PercolatorStage, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_args=(queries, id_column, text_column))


class ScoredPercolatorStage:
    """ScoringMatch percolation (monitor/ScoringMatch.java:27-47 with
    QueryDecomposer.java:34-80): each registered query reports the
    matched document's score under the percolator's single-doc searcher
    (the MemoryIndex model — docCount 1, df 1, exact avgdl, quantized
    length).

    Decomposition: a pure SHOULD disjunction (minimumNumberShouldMatch
    <= 1) splits into per-clause subqueries registered separately
    (QueryDecomposer.decomposeBoolean); each matching subquery emits
    its own ScoringMatch (score > 0 gate, ScoringMatch.java:37-39) and
    matches for the same query id resolve by FLOAT pairwise addition
    (:42-44) — deliberately different from BooleanQuery's double-sum
    accumulation, which still applies to non-decomposed (MUST) queries.

    ``queries``: list of (qid, spec) with spec {"should": [terms...]}
    (decomposed) or {"must": [terms...]} (kept whole)."""

    def __init__(self, queries, id_column: str = "doc_id",
                 text_column: str = "text"):
        from .analysis import tokenize
        self._tokenize = tokenize
        self.queries = []
        for qid, spec in queries:
            must = list(spec.get("must") or [])
            should = list(spec.get("should") or [])
            self.queries.append((qid, must, should))
        self.id_column = id_column
        self.text_column = text_column

    _scorer_cache: dict = {}

    @classmethod
    def _term_score(cls, freq: int, dl: int) -> np.float32:
        ent = cls._scorer_cache.get(dl)
        if ent is None:
            from .bm25 import scorer
            from .smallfloat import int_to_byte4
            sc = scorer(1, 1, dl)
            nb = int(int_to_byte4(np.array([dl], np.int64))[0])
            ent = cls._scorer_cache[dl] = (sc, nb)
            if len(cls._scorer_cache) > 65536:
                cls._scorer_cache.clear()
        sc, nb = ent
        return sc.score(np.array([freq], np.int64),
                        np.array([nb], np.uint8))[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores = [], [], []
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        for did, text in zip(ids, texts):
            toks = self._tokenize(text or "")
            dl = len(toks)
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for qid, must, should in self.queries:
                if must:
                    # whole query: BooleanQuery double-sum
                    if any(tf.get(t, 0) == 0 for t in must):
                        continue
                    acc = np.float64(0.0)
                    for t in must:
                        acc += np.float64(
                            self._term_score(tf[t], dl))
                    s = np.float32(acc)
                else:
                    # decomposed disjunction: float pairwise resolve
                    s = None
                    for t in should:
                        f = tf.get(t, 0)
                        if f == 0:
                            continue
                        sub = self._term_score(f, dl)
                        if sub > 0:
                            s = sub if s is None \
                                else np.float32(s + sub)
                    if s is None:
                        continue
                if s > 0:
                    qids.append(qid)
                    docs.append(did)
                    scores.append(s)
        return pa.table({
            "qid": pa.array(qids, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(np.array(scores, np.float32),
                              pa.float32())})


def percolate_scored(ds, queries, id_column: str = "doc_id",
                     text_column: str = "text", concurrency=(1, 8)):
    """ScoringMatch percolation over a document stream — (qid, doc,
    float32 score) rows; see ScoredPercolatorStage."""
    return ds.map_batches(
        ScoredPercolatorStage, batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(queries, id_column, text_column))


class HighlightsPercolatorStage:
    """HighlightsMatch percolation (monitor/HighlightsMatch.java:42-93):
    a matching query reports the SET of term hits — (position,
    endPosition, startOffset, endOffset) per matched clause term, phrase
    matches contributing every constituent term's hit (the Matches
    sub-iterator walk :74-91); hits dedup in a sorted set (:178-181).

    ``queries``: (qid, spec) with {"should": [...]} (any term present
    matches), {"must": [...]} (all required) or {"phrase": [...]}
    (consecutive positions)."""

    def __init__(self, queries, id_column: str = "doc_id",
                 text_column: str = "text"):
        from .analysis import tokenize_with_offsets
        self._tok = tokenize_with_offsets
        self.queries = [(qid, dict(spec)) for qid, spec in queries]
        self.id_column = id_column
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.text_column).to_pylist()
        for did, text in zip(ids, texts):
            toks, starts, ends = self._tok(text or "")
            pos_of: dict[str, list[int]] = {}
            for i, t in enumerate(toks):
                pos_of.setdefault(t, []).append(i)
            for qid, spec in self.queries:
                hits: set = set()
                if "phrase" in spec:
                    ph = spec["phrase"]
                    base = pos_of.get(ph[0], [])
                    for p in base:
                        if all(p + k < len(toks)
                               and toks[p + k] == ph[k]
                               for k in range(len(ph))):
                            for k in range(len(ph)):
                                hits.add((p + k, p + k + 1,
                                          int(starts[p + k]),
                                          int(ends[p + k])))
                else:
                    must = spec.get("must") or []
                    should = spec.get("should") or []
                    if must and any(t not in pos_of for t in must):
                        continue
                    matched = must + [t for t in should if t in pos_of]
                    if not matched:
                        continue
                    for t in matched:
                        for p in pos_of.get(t, ()):
                            hits.add((p, p + 1, int(starts[p]),
                                      int(ends[p])))
                for h in sorted(hits):
                    rows.append((qid, did) + h)
        cols = list(zip(*rows)) if rows else [[]] * 6
        return pa.table({
            "qid": pa.array(cols[0], pa.int64()),
            "doc_id": pa.array(cols[1], pa.int64()),
            "pos": pa.array(cols[2], pa.int64()),
            "endpos": pa.array(cols[3], pa.int64()),
            "soff": pa.array(cols[4], pa.int64()),
            "eoff": pa.array(cols[5], pa.int64())})


def percolate_highlights(ds, queries, id_column: str = "doc_id",
                         text_column: str = "text", concurrency=(1, 8)):
    """HighlightsMatch percolation — per-match term-hit rows."""
    return ds.map_batches(
        HighlightsPercolatorStage, batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_args=(queries, id_column, text_column))


def save_queries(path: str, queries) -> None:
    """MonitorQuerySerializer role (monitor/MonitorQuerySerializer.java:35
    + Monitor's persistent QueryIndex, Monitor.java:86): persist the
    registered query set so a restarted percolator resumes with the
    same registrations. JSON-lines of (qid, spec); atomic rename."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for qid, spec in queries:
            f.write(json.dumps({"qid": qid, "spec": spec},
                               sort_keys=True) + "\n")
    os.replace(tmp, path)


def load_queries(path: str) -> list:
    """Inverse of :func:`save_queries`; malformed lines raise (the
    serializer contract — a query that cannot be parsed must surface,
    MonitorQuerySerializer javadoc)."""
    import json

    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            out.append((d["qid"], d["spec"]))
    return out
