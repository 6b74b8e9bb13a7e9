"""Classification utilities over the ``documents`` table: confusion
matrix and the stratified dataset splitter.

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


def _docs(sf_dir: str, cols):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=list(cols))


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
