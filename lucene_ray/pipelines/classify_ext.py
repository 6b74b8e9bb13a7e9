"""Classification utilities over the ``documents`` table: confusion
matrix, the stratified dataset splitter, and the BM25 NB classifier
(:func:`classify_bm25nb` — see its docstring).

- :func:`classify_confusion` reproduces ConfusionMatrixGenerator
  (classification/utils/ConfusionMatrixGenerator.java:63-133): classify
  EVERY document with the NB model and count (actual, predicted) pairs.
  The class field is single-valued, so the reference's multi-valued
  correct-answer resolution (:116-121) degenerates to actual = lang.
- :func:`split_dataset` reproduces DatasetSplitter.split
  (classification/utils/DatasetSplitter.java:103-141): groups in
  first-document index order (GroupingSearch with Sort.INDEXORDER),
  docs within a group in index order, ONE global alternating counter b
  (it does NOT reset between groups), and per-group float quotas —
  a doc goes to test iff b is even and tc < n*testRatio, else to cv
  iff cvc < n*cvRatio, else to training.  The sequential counters have
  the closed form used here and in the SQL oracle (validated against a
  literal simulation of the reference loop in
  tests/test_classify_ext.py): the test docs are exactly the first
  ceil(n*testRatio) even-b docs of the group, and the cv docs the
  first ceil(n*cvRatio) remaining docs in order.

Scale shape: the confusion matrix is the NB scoring pass (model
broadcast once) with per-batch (actual, predicted) partials and a
#classes²-sized groupby; the splitter is metadata-only — one tiny
groupby for per-class counts/first-docs, one distributed sort by
(lang, doc_id) with the sorted-block-scan offset chain (the
doc_ppl_buckets pattern: per-block one-row-per-lang summaries, an
O(#blocks) driver accumulation, broadcast offsets), then a vectorized
map — no class's rows ever gather in one task.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa

TEST_RATIO = 0.2
CV_RATIO = 0.1


from .classify import _docs  # noqa: E402  (shared reader)


def classify_confusion(sf_dir: str) -> pa.Table:
    """(actual, predicted, n) — the confusion matrix of the NB
    classifier over the whole corpus.  One scoring pass with ``lang``
    carried through, per-batch pair-count partials, then a
    #classes²-row groupby."""
    from lucene_ray.pipelines.util import ensure_cols

    from .classify import classify_naive_bayes

    pred = classify_naive_bayes(sf_dir, _extra_cols=("lang",))

    def pair_partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"actual": pa.array([], pa.string()),
                          "predicted": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        act = np.asarray(b.column("lang").to_pylist(), dtype=object)
        prd = np.asarray(b.column("pred_lang").to_pylist(), dtype=object)
        ac, ai = np.unique(act, return_inverse=True)
        pc_, pi = np.unique(prd, return_inverse=True)
        key, cnt = np.unique(ai * len(pc_) + pi, return_counts=True)
        return pa.table({
            "actual": pa.array(ac[key // len(pc_)].astype(object),
                               pa.string()),
            "predicted": pa.array(pc_[key % len(pc_)].astype(object),
                                  pa.string()),
            "n": pa.array(cnt.astype(np.int64))})

    agg = ensure_cols(
        pred.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["actual", "predicted"]).sum("n").to_pandas(),
        ["actual", "predicted", "sum(n)"])
    agg = agg.rename(columns={"sum(n)": "n"})
    agg["n"] = agg["n"].astype("int64")
    agg = agg.sort_values(["actual", "predicted"]).reset_index(drop=True)
    return pa.Table.from_pandas(agg[["actual", "predicted", "n"]],
                                preserve_index=False)


def oracle_classify_confusion_sql() -> str:
    from .classify import oracle_classify_nb_sql

    nb = oracle_classify_nb_sql()
    return f"""WITH preds AS (
{nb}
)
SELECT d.lang AS actual, p.pred_lang AS predicted,
       CAST(count(*) AS BIGINT) AS n
FROM preds p JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.lang, p.pred_lang
ORDER BY actual, predicted"""


def _split_quota(n: int, ratio: float) -> int:
    """#{tc : tc < n*ratio} for the reference's int-vs-double compare."""
    return int(math.ceil(n * ratio))


def _split_closed_form(r: np.ndarray, base: int, k: int,
                       l_cv: int) -> np.ndarray:
    """Vectorized DatasetSplitter assignment for ranks ``r`` (0-based,
    within one group): 0 = test, 1 = cv, 2 = train."""
    b_even = (base + r) % 2 == 0
    e_before = (r + 1) // 2 if base % 2 == 0 else r // 2
    if isinstance(e_before, int):       # scalar guard (never hit)
        e_before = np.asarray(e_before)
    test = b_even & (e_before < k)
    c_before = r - np.minimum(e_before, k)
    cv = ~test & (c_before < l_cv)
    out = np.full(len(r), 2, dtype=np.int64)
    out[cv] = 1
    out[test] = 0
    return out


def split_dataset_sim(pairs) -> list[str]:
    """Literal simulation of DatasetSplitter.split's loop
    (:103-141) over (group sizes in group order) — the ground truth
    the closed form is tested against.  ``pairs`` = list of group
    sizes; returns the flat assignment sequence."""
    out = []
    b = 0
    for n in pairs:
        test_size = n * TEST_RATIO
        cv_size = n * CV_RATIO
        tc = cvc = 0
        for _ in range(n):
            if b % 2 == 0 and tc < test_size:
                out.append("test")
                tc += 1
            elif cvc < cv_size:
                out.append("cv")
                cvc += 1
            else:
                out.append("train")
            b += 1
    return out


def split_dataset(sf_dir: str):
    """(doc_id, part) — stratified train/test/cv assignment."""
    import ray
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    docs = _docs(sf_dir, ("doc_id", "lang"))
    g = ensure_cols(docs.groupby("lang").count().to_pandas(),
                    ["lang", "count()"])
    first = ensure_cols(docs.groupby("lang").min("doc_id").to_pandas(),
                        ["lang", "min(doc_id)"])
    stats = g.merge(first, on="lang").sort_values("min(doc_id)")
    params = {}
    base = 0
    for _, row in stats.iterrows():
        n = int(row["count()"])
        params[str(row["lang"])] = (
            base, _split_quota(n, TEST_RATIO), _split_quota(n, CV_RATIO))
        base += n

    u = docs.sort(["lang", "doc_id"]).materialize()

    _EMPTY_SUM = pa.table({
        "f_lang": pa.array([], pa.string()),
        "f_doc": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64())})

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_SUM
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        uniq, idx, cnts = np.unique(langs, return_index=True,
                                    return_counts=True)
        order = np.argsort(idx)
        return pa.table({
            "f_lang": pa.array([str(langs[0])] * len(uniq), pa.string()),
            "f_doc": pa.array([int(b.column("doc_id")[0].as_py())]
                              * len(uniq), pa.int64()),
            "lang": pa.array(uniq[order], pa.string()),
            "cnt": pa.array(cnts[order].astype(np.int64))})

    import ray

    summ = ensure_cols(
        u.map_batches(summarize, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        _EMPTY_SUM.column_names)
    summ = summ.sort_values(["f_lang", "f_doc", "lang"])
    offsets: dict = {}
    totals: dict = {}
    for row in summ.itertuples(index=False):
        bid = (str(row.f_lang), int(row.f_doc))
        offsets[(bid, str(row.lang))] = totals.get(str(row.lang), 0)
        totals[str(row.lang)] = totals.get(str(row.lang), 0) \
            + int(row.cnt)
    state = ray.put((offsets, params))

    _PARTS = np.array(["test", "cv", "train"], dtype=object)

    def resolve(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "part": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        offs, prm = ray.get(state)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        bid = (str(langs[0]), int(b.column("doc_id")[0].as_py()))
        n = b.num_rows
        idx = np.arange(n, dtype=np.int64)
        run_start = np.zeros(n, dtype=np.int64)
        new_run = np.flatnonzero(langs[1:] != langs[:-1]) + 1
        run_start[new_run] = new_run
        run_start = np.maximum.accumulate(run_start)
        within = idx - run_start
        out = np.empty(n, dtype=np.int64)
        for lg in np.unique(langs):
            m = langs == lg
            r = within[m] + offs[(bid, str(lg))]
            base, k, l_cv = prm[str(lg)]
            out[m] = _split_closed_form(r, base, k, l_cv)
        return pa.table({"doc_id": b.column("doc_id"),
                         "part": pa.array(_PARTS[out].astype(object),
                                          pa.string())})

    return u.map_batches(resolve, batch_size=None,
                         batch_format="pyarrow")


def oracle_split_dataset_sql() -> str:
    return f"""WITH g AS (
  SELECT lang, count(*) AS n, min(doc_id) AS first_doc
  FROM documents GROUP BY lang
), go AS (
  SELECT lang, n,
         coalesce(CAST(sum(n) OVER (ORDER BY first_doc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS base,
         ceil(n * {TEST_RATIO}) AS k, ceil(n * {CV_RATIO}) AS l
  FROM g
), r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) - 1 AS r
  FROM documents
)
SELECT r.doc_id,
  CASE WHEN (go.base + r.r) % 2 = 0
        AND (CASE WHEN go.base % 2 = 0 THEN (r.r + 1) // 2
                  ELSE r.r // 2 END) < go.k
       THEN 'test'
       WHEN (r.r - least(CAST(CASE WHEN go.base % 2 = 0
                    THEN (r.r + 1) // 2 ELSE r.r // 2 END AS DOUBLE),
                  go.k)) < go.l
       THEN 'cv'
       ELSE 'train' END AS part
FROM r JOIN go ON go.lang = r.lang"""


def classify_bm25nb(sf_dir: str):
    """(doc_id, pred_lang) per BM25NBClassifier
    (classification/BM25NBClassifier.java:44): prior(c) = ln of the
    top-1 BM25 score of the class keyword term; the per-token
    likelihood is ln of the top-1 score of MUST(lang:c) SHOULD(word) —
    the max over the class's docs of s_class + s_word·[word∈doc], which
    is greatest(word-conditioned max, class-only max) since a long
    word-bearing doc can score below a short wordless one; tokens
    absent from the index fall back to the class-only max (the MUST
    clause still matches, :169-171).  Keyword terms score with tf=1
    and the doc's CONTENT norm (build.py:352-357), so every score is
    the engine's own float32 BM25 chain.

    Scale shape: the (vocab × classes) log matrix is the one broadcast
    (the classify_nb trade); building it walks each term's postings
    once against the per-class keyword score maps."""
    import math

    import pyarrow.compute as pc
    import ray
    import ray.data

    from .. import bm25
    from ..codec import decode_block
    from ..search import _content_terms_only, termdict_scan
    from .fulltext import reader_for

    r = reader_for(sf_dir)
    n_docs, sttf = r.doc_count, r.sum_ttf

    def _postings_scores(term: str):
        p = r.postings(term)
        if p is None:
            return np.empty(0, np.int64), np.empty(0, np.float32)
        sim = bm25.scorer(p.df, n_docs, sttf)
        docs, scores = [], []
        for bi in range(len(p.n)):
            d, tf, nb = decode_block(
                int(p.first_doc[bi]), int(p.n[bi]), p.docs_enc[bi],
                p.tfs_enc[bi], p.norms_enc[bi])
            docs.append(d)
            scores.append(sim.score(tf, nb))
        return np.concatenate(docs), np.concatenate(scores)

    lt = termdict_scan(r, prefix="lang:")
    classes = np.sort(np.array(
        [t[5:] for t in lt.column("term").to_pylist()], dtype=object))
    cls_docs, cls_scores, prior, cls_only_log = {}, {}, {}, {}
    for lg in classes:
        d, s = _postings_scores(f"lang:{lg}")
        order = np.argsort(d)
        cls_docs[lg], cls_scores[lg] = d[order], s[order]
        top = float(np.float32(s.max())) if len(s) else None
        prior[lg] = math.log(top) if top is not None else 0.0
        cls_only_log[lg] = math.log(top) if top is not None else 0.0

    vt = _content_terms_only(r, termdict_scan(r))
    vocab = np.sort(np.array(vt.column("term").to_pylist(), dtype=object))
    w = np.empty((len(vocab), len(classes)), dtype=np.float64)
    for i, word in enumerate(vocab):
        wd, ws = _postings_scores(str(word))
        for j, lg in enumerate(classes):
            cd, cs = cls_docs[lg], cls_scores[lg]
            if len(cd) == 0:
                w[i, j] = 0.0           # totalHits 0 -> score 1, ln 1
                continue
            pos = np.searchsorted(cd, wd)
            hit = (pos < len(cd)) & (cd[np.minimum(pos, len(cd) - 1)]
                                     == wd)
            best = np.float32(cs.max())
            if hit.any():
                tot = (cs[pos[hit]].astype(np.float64)
                       + ws[hit].astype(np.float64)).astype(np.float32)
                best = max(best, np.float32(tot.max()))
            w[i, j] = math.log(float(best))
    fallback = np.array([cls_only_log[lg] for lg in classes])
    priors = np.array([prior[lg] for lg in classes])
    ref = ray.put((vocab, w, priors, fallback, classes))

    def score(batch: pa.Table) -> pa.Table:
        vocab, w, priors, fallback, classes = ray.get(ref)
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts),
                            dtype=np.int64)
        d = pc.dictionary_encode(flat)
        uniq = np.array(d.dictionary.to_pylist(), dtype=object)
        codes = np.asarray(d.indices, dtype=np.int64)
        pos = np.searchsorted(vocab, uniq)
        known = (pos < len(vocab)) & (vocab[np.minimum(
            pos, len(vocab) - 1)] == uniq)
        n = batch.num_rows
        ll = np.empty((n, len(classes)), dtype=np.float64)
        for j in range(len(classes)):
            per_uniq = np.where(known, w[np.minimum(pos, len(vocab) - 1),
                                         j], fallback[j])
            ll[:, j] = (np.bincount(owners, weights=per_uniq[codes],
                                    minlength=n) + priors[j])
        best = np.argmax(ll, axis=1)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(classes[best].astype(object),
                                  pa.string())})

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        score, batch_format="pyarrow")


def oracle_classify_bm25nb_sql() -> str:
    from .fulltext import _CORPUS_CTE, _QUANT_LEN, _SCORE_EXPR

    # keyword-term score: tf = 1, df = class size, content norm
    kw = """CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - c.nc + 0.5) / (c.nc + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - c.nc + 0.5) / (c.nc + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(1 AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL)"""
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
lmap AS (
  SELECT row_number() OVER (
           ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang
  FROM documents
),
cls AS (SELECT lang, count(*) AS nc FROM lmap GROUP BY lang),
kws AS (
  SELECT l.d, l.lang, {kw} AS s
  FROM lmap l JOIN cls c ON c.lang = l.lang
  JOIN quant q ON q.d = l.d
),
cls_only AS (
  SELECT lang, ln(CAST(max(s) AS DOUBLE)) AS lp FROM kws GROUP BY lang
),
wordcls AS (
  SELECT t.term, k.lang,
         ln(CAST(max(CAST(CAST(k.s AS DOUBLE)
                          + CAST({_SCORE_EXPR} AS DOUBLE) AS REAL))
                 AS DOUBLE)) AS raw
  FROM tf t
  JOIN df f ON f.term = t.term
  JOIN quant q ON q.d = t.d
  JOIN kws k ON k.d = t.d
  GROUP BY t.term, k.lang
),
probs AS (
  SELECT w.term, c.lang,
         greatest(coalesce(wc.raw, co.lp), co.lp) AS lp
  FROM (SELECT DISTINCT term FROM tok) w
  CROSS JOIN cls c
  LEFT JOIN wordcls wc ON wc.term = w.term AND wc.lang = c.lang
  JOIN cls_only co ON co.lang = c.lang
),
scores AS (
  SELECT o.d, p.lang, co.lp + sum(p.lp) AS s
  FROM tok o
  JOIN probs p ON p.term = o.term
  JOIN cls_only co ON co.lang = p.lang
  GROUP BY o.d, p.lang, co.lp
),
pred AS (
  SELECT d, lang, row_number() OVER (
           PARTITION BY d ORDER BY s DESC, lang) AS rn
  FROM scores
)
SELECT c.doc_id, p.lang AS pred_lang
FROM pred p
JOIN (SELECT row_number() OVER (
        ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
      doc_id FROM documents) c ON c.d = p.d
WHERE p.rn = 1"""


KNN_FUZZY_K = 3


def classify_knn_fuzzy(sf_dir: str) -> pa.Table:
    """(doc_id, pred_lang) per KNearestFuzzyClassifier
    (classification/KNearestFuzzyClassifier.java:41): each document's
    own text becomes a NearestFuzzyQuery (maxEdits 1, prefix 2,
    <=50 variants/term, <=300 terms — FuzzyLikeThis scoring with the
    df/ttf=1 override, NearestFuzzyQuery.java:47-53) MUST'd with the
    constant-score class-field wildcard (+1f per doc); the top-k hits
    vote with rank boosts normalized by the top score
    (buildListFromTopDocs :118-151: per-class count·avg(score/max)/k,
    rescaled by k/sumdoc when fewer than k docs matched).  Ties on the
    vote score break by class name (the reference iterates a HashMap;
    continuous BM25 sums never tie on real data).

    Scale shape: classification is per-document work against broadcast
    index state (vocab + per-term postings of the fuzzy variants) —
    here driver-side over the small corpus; the actor-pool form loads
    the reader once per actor like SearcherActor."""
    from .. import bm25
    from ..codec import decode_block
    from ..search import _content_terms_only, termdict_scan
    from .fulltext import _flt_expand, reader_for

    r = reader_for(sf_dir)
    vocab_tbl = _content_terms_only(r, termdict_scan(r))
    n_docs, sttf = r.doc_count, r.sum_ttf

    # docid -> lang from the keyword postings
    lt = termdict_scan(r, prefix="lang:")
    langs = sorted(t[5:] for t in lt.column("term").to_pylist())
    doc_lang: dict[int, str] = {}
    for lg in langs:
        p = r.postings(f"lang:{lg}")
        for bi in range(p.n.shape[0] if p is not None else 0):
            d, _, _ = decode_block(int(p.first_doc[bi]), int(p.n[bi]),
                                   p.docs_enc[bi], p.tfs_enc[bi],
                                   p.norms_enc[bi])
            for dd in d.tolist():
                doc_lang[dd] = lg

    docs = _docs(sf_dir, ("doc_id", "text")).to_pandas()
    term_scores: dict[str, tuple] = {}

    def postings_scores(term, boost):
        p = r.postings(term)
        sim = bm25.scorer(1, n_docs, sttf, boost=float(boost))
        ds, ss = [], []
        for bi in range(len(p.n)):
            d, tf, nb = decode_block(
                int(p.first_doc[bi]), int(p.n[bi]), p.docs_enc[bi],
                p.tfs_enc[bi], p.norms_enc[bi])
            ds.append(d)
            ss.append(sim.score(tf, nb))
        return np.concatenate(ds), np.concatenate(ss)

    out_ids, out_pred = [], []
    for row in docs.itertuples(index=False):
        acc: dict[int, float] = {}
        for _src, term, st in _flt_expand(r, row.text or "", 1,
                                          prefix_len=2, max_terms=300,
                                          vocab_tbl=vocab_tbl):
            d, s = postings_scores(term, st)
            for di, sv in zip(d.tolist(), s.tolist()):
                acc[di] = acc.get(di, 0.0) + sv
        if not acc:
            continue                     # MUST fuzzy matched nothing
        scored = sorted(
            ((np.float32(np.float64(np.float32(v)) + 1.0), d)
             for d, v in acc.items()),
            key=lambda t: (-float(t[0]), t[1]))[:KNN_FUZZY_K]
        maxscore = scored[0][0]
        counts: dict[str, int] = {}
        boosts: dict[str, float] = {}
        for s, d in scored:
            lg = doc_lang.get(d)
            if lg is None:
                continue
            counts[lg] = counts.get(lg, 0) + 1
            boosts[lg] = boosts.get(lg, 0.0) + float(
                np.float32(s / maxscore))
        sumdoc = sum(counts.values())
        best_lang, best_score = None, -float("inf")
        for lg in sorted(counts):
            norm = boosts[lg] / counts[lg]
            sc = (counts[lg] * norm) / float(KNN_FUZZY_K)
            if sumdoc < KNN_FUZZY_K:
                sc = sc * KNN_FUZZY_K / float(sumdoc)
            if sc > best_score:
                best_lang, best_score = lg, sc
        out_ids.append(int(row.doc_id))
        out_pred.append(best_lang)
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "pred_lang": pa.array(out_pred, pa.string())})


def oracle_classify_knn_fuzzy_sql() -> str:
    from .fulltext import _CORPUS_CTE, _QUANT_LEN, _SCORE_EXPR

    k = KNN_FUZZY_K
    idf1 = ("CAST(ln(1 + ((SELECT n_docs FROM stats) - 0.5) / 1.5) "
            "AS REAL)")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
lmap AS (
  SELECT row_number() OVER (
           ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang, doc_id AS orig
  FROM documents
),
srcs AS (
  SELECT DISTINCT d AS qd, term AS src FROM tok WHERE term <> ''
),
cand AS (
  SELECT s.qd, s.src, f.term, f.df,
         damerau_levenshtein(
           substr(s.src, least(2, length(s.src)) + 1),
           substr(f.term, least(2, length(s.src)) + 1)) AS ed
  FROM srcs s JOIN df f
    ON substr(f.term, 1, least(2, length(s.src)))
       = substr(s.src, 1, least(2, length(s.src)))
   AND damerau_levenshtein(
         substr(s.src, least(2, length(s.src)) + 1),
         substr(f.term, least(2, length(s.src)) + 1)) <= 1
),
grp AS (
  SELECT qd, src,
         max(CASE WHEN ed = 0 THEN df ELSE 0 END) AS df_exact,
         CAST(sum(df) AS BIGINT) // count(*) AS df_avg
  FROM cand GROUP BY qd, src
),
boosted AS (
  SELECT c.qd, c.src, c.term,
         CASE WHEN c.ed = 0 THEN CAST(1.0 AS REAL)
              ELSE CAST(1.0 AS REAL)
                   - CAST(c.ed AS REAL)
                     / CAST(least(length(c.term), length(c.src)) AS REAL)
         END AS boost,
         CAST(ln(((SELECT n_docs FROM stats) + 1)
                 / CAST((CASE WHEN g.df_exact > 0 THEN g.df_exact
                              ELSE g.df_avg END) + 1 AS DOUBLE))
              + 1.0 AS REAL) AS cls_idf,
         row_number() OVER (PARTITION BY c.qd, c.src
                            ORDER BY boost DESC, c.term) AS vr
  FROM cand c JOIN grp g ON g.qd = c.qd AND g.src = c.src
),
kept AS (
  SELECT qd, term,
         CAST(CAST(boost * boost AS REAL) * cls_idf AS REAL) AS st,
         row_number() OVER (PARTITION BY qd
           ORDER BY CAST(CAST(boost * boost AS REAL) * cls_idf AS REAL)
             DESC, term) AS gr
  FROM boosted WHERE vr <= 50
),
scored AS (
  SELECT kk.qd, t.d,
         CAST(CAST(kk.st * {idf1} AS REAL)
           - CAST(kk.st * {idf1} AS REAL)
             / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
                (CAST(1.0 AS REAL) /
                 (CAST(1.2 AS REAL) *
                  (CAST(0.25 AS REAL) +
                   CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
                   CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                        (SELECT n_docs FROM stats) AS REAL)))))
           AS REAL) AS s
  FROM kept kk
  JOIN tf t ON t.term = kk.term
  JOIN quant q ON q.d = t.d
  WHERE kk.gr <= 300
),
totals AS (
  SELECT qd, d,
         CAST(CAST(CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS DOUBLE)
              + 1.0 AS REAL) AS score
  FROM scored GROUP BY qd, d
),
topk AS (
  SELECT qd, d, score, row_number() OVER (
           PARTITION BY qd ORDER BY score DESC, d ASC) AS rank
  FROM totals
),
hits AS (
  SELECT t.qd, t.d, t.score, l.lang,
         first_value(t.score) OVER (
           PARTITION BY t.qd ORDER BY t.rank) AS maxscore
  FROM topk t JOIN lmap l ON l.d = t.d
  WHERE t.rank <= {k}
),
votes AS (
  SELECT qd, lang, count(*) AS cnt,
         sum(CAST(CAST(score / maxscore AS REAL) AS DOUBLE)) AS boost,
         sum(count(*)) OVER (PARTITION BY qd) AS sumdoc
  FROM hits GROUP BY qd, lang
),
vscore AS (
  SELECT qd, lang,
         CASE WHEN sumdoc < {k}
              THEN ((cnt * (boost / cnt)) / CAST({k} AS DOUBLE))
                   * {k} / CAST(sumdoc AS DOUBLE)
              ELSE (cnt * (boost / cnt)) / CAST({k} AS DOUBLE)
         END AS vs
  FROM votes
),
pred AS (
  SELECT qd, lang, row_number() OVER (
           PARTITION BY qd ORDER BY vs DESC, lang) AS rn
  FROM vscore
)
SELECT l.orig AS doc_id, p.lang AS pred_lang
FROM pred p JOIN lmap l ON l.d = p.qd
WHERE p.rn = 1"""


PERCEPTRON_BATCH = 32


def _perceptron_train(token_lists, labels, batch_size=PERCEPTRON_BATCH,
                      bias=None):
    """BooleanPerceptronClassifier's training loop
    (classification/BooleanPerceptronClassifier.java:74-135), exactly:
    weights initialize to each term's corpus ttf; docs stream in order;
    a misclassified doc adds signum(correct - assigned) · tf(term, doc)
    to its DISTINCT terms, flooring at 0 — reading the STALE snapshot
    ("FST") value, so several updates inside one batch overwrite
    rather than accumulate; the snapshot refreshes only when the
    misclassified doc's position satisfies batchCount % batchSize == 0
    (:116-122).  bias defaults to sum_ttf / n_docs; prediction is
    sum(snapshot[token]) >= bias over tokens WITH duplicates.
    Returns (final snapshot dict, bias)."""
    from collections import Counter

    ttf = Counter()
    for toks in token_lists:
        ttf.update(toks)
    if bias is None:
        n_docs = len(token_lists)
        bias = (sum(ttf.values()) / float(n_docs)) if n_docs else 0.0
    weights = {t: float(c) for t, c in ttf.items()}
    fst = {t: int(w) for t, w in weights.items()}
    batch_count = 0
    for toks, correct in zip(token_lists, labels):
        output = 0
        for t in toks:
            d = fst.get(t)
            if d is not None:
                output += d
        assigned = output >= bias
        modifier = (correct > assigned) - (correct < assigned)
        if modifier != 0:
            for term, tf in Counter(toks).items():
                prev = fst.get(term)
                weights[term] = (0.0 if prev is None
                                 else float(max(0, prev + modifier * tf)))
            if batch_count % batch_size == 0:
                fst = {t: int(w) for t, w in weights.items()}
        batch_count += 1
    return fst, bias


def classify_perceptron(sf_dir: str) -> pa.Table:
    """(doc_id, pred, output) — the boolean perceptron
    (classification/BooleanPerceptronClassifier.java:52) trained over
    the corpus in doc order with class = (lang == 'en'), then applied
    with the final weight snapshot.  Rows-only: the training loop is a
    sequential state machine over the whole corpus (stale-snapshot
    reads, modular rebuild points) with no SQL form; the loop is
    pytest-pinned on hand-traced cases in tests/test_classify_ext.py."""
    import pandas as pd

    df = _docs(sf_dir, ("doc_id", "text", "lang")).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    token_lists = [[w for w in (tx or "").split(" ") if w]
                   for tx in df["text"]]
    labels = (df["lang"] == "en").tolist()
    fst, bias = _perceptron_train(token_lists, labels)
    outputs = [sum(fst.get(t, 0) for t in toks) for toks in token_lists]
    return pa.table({
        "doc_id": pa.array(df["doc_id"].astype("int64")),
        "pred": pa.array([o >= bias for o in outputs], pa.bool_()),
        "output": pa.array(outputs, pa.int64())})
