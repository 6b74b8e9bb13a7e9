"""Naive-Bayes document classification over the ``documents`` table.

Reproduces the scoring of Lucene's SimpleNaiveBayesClassifier
(classification/SimpleNaiveBayesClassifier.java:145-229) with the
``lang`` column as the class field and whitespace tokens as the text
field:

- prior(c)           = ln(Nc) - ln(N)                       (:279-281)
- num(word, c)       = #docs of class c containing word + 1 (:209-228,
                       add-1 smoothing over DOC frequency, :263-276)
- den(c)             = (sumDocFreq/docCount) * Nc + N       (:240-251,
                       avg unique terms per doc times docs-with-class,
                       plus docsWithClassSize)
- score(c, d)        = prior(c) + sum over TOKENS of d (duplicates
                       included, :213) of ln(num(word, c) / den(c))
- assigned class     = argmax score, ties to the alphabetically first
                       class (classesEnum iterates term-sorted, :140)

Under the whitespace tokenizer every doc has >= 1 token (splitting ''
yields ['']), so docCount == N — both engines see the same counts.

Scale shape: ONE corpus pass emits per-batch (term, lang) doc-frequency
partials (unique (doc, term) pairs via dictionary codes — no per-token
Python), combined by a vocab-sized groupby; one column-pruned
groupby(lang).count() supplies the priors; sumDocFreq is the SUM of the
df table itself (each doc has exactly one class). The (vocab x classes)
log-ratio matrix is the only broadcast (Heaps-law small — the same
trade as doc_keywords / doc_lm_logprob); classification is map-only:
dictionary-encode the batch, searchsorted UNIQUE words once, bincount
per class.

Float parity: ln((df+1)/den) is ONE float64 division + C libm log per
(vocab word, class) — math.log, not np.log (see bm25.py); den is a
single IEEE multiply-add chain reproduced verbatim in the oracle. The
per-doc score sums those in engine-specific order; only the argmax is
emitted, so sub-ulp sum-order drift is invisible unless two classes tie
to ~1e-15 relative — the synthetic corpus' language vocabularies are
disjoint enough that margins are large.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _docs(sf_dir: str, cols=("doc_id", "text", "lang")):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=list(cols))


def classify_naive_bayes(sf_dir: str, _extra_cols=()):
    """(doc_id, pred_lang) — each document re-assigned to the class the
    NB model (trained on the full corpus) scores highest.
    ``_extra_cols`` are carried through the scoring pass unchanged (the
    doc_lm_logprob convention; classify_confusion threads ``lang``)."""
    import math

    import ray
    import ray.data
    import pyarrow.compute as pc

    from lucene_ray.pipelines.util import ensure_cols

    def _tokens(batch: pa.Table):
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        return owners, flat

    _DF_SCHEMA = pa.schema([("term", pa.string()), ("lang", pa.string()),
                            ("df", pa.int64())])

    def df_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _DF_SCHEMA.empty_table()
        owners, flat = _tokens(batch)
        d = pc.dictionary_encode(flat)
        codes = np.asarray(d.indices, dtype=np.int64)
        nv = max(1, len(d.dictionary))
        # unique (doc, term) pairs -> per-(term, lang) doc counts
        uk = np.unique(owners * nv + codes)
        uo, uc = uk // nv, uk % nv
        lang = np.asarray(batch.column("lang").to_pylist(), dtype=object)
        lcodes, linv = np.unique(lang[uo], return_inverse=True)
        key = linv * nv + uc
        k2, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "term": d.dictionary.take(pa.array(k2 % nv)).cast(pa.string()),
            "lang": pa.array(lcodes[k2 // nv].astype(object), pa.string()),
            "df": pa.array(cnt.astype(np.int64))})

    df_tbl = ensure_cols(
        _docs(sf_dir)
        .map_batches(df_partial, batch_format="pyarrow")
        .groupby(["term", "lang"]).sum("df").to_pandas(),
        ["term", "lang", "sum(df)"])
    lang_tbl = ensure_cols(
        _docs(sf_dir, ("lang",)).groupby("lang").count().to_pandas(),
        ["lang", "count()"])
    if len(df_tbl) == 0:
        cols = {"doc_id": pa.array([], pa.int64()),
                "pred_lang": pa.array([], pa.string())}
        for c in _extra_cols:
            cols[c] = pa.array([], pa.string())
        return ray.data.from_arrow(pa.table(cols))

    classes = np.sort(lang_tbl["lang"].to_numpy())
    nc = {r["lang"]: int(r["count()"]) for _, r in lang_tbl.iterrows()}
    n_total = int(sum(nc.values()))
    sum_df = int(df_tbl["sum(df)"].sum())     # total (term, doc) pairs
    avg_unique = sum_df / n_total             # docCount == N (see module doc)

    vocab = np.sort(df_tbl["term"].unique().astype(object))
    cidx = {c: j for j, c in enumerate(classes)}
    dfm = np.zeros((len(vocab), len(classes)), dtype=np.int64)
    pos = np.searchsorted(vocab, df_tbl["term"].to_numpy(dtype=object))
    for p, lg, v in zip(pos, df_tbl["lang"], df_tbl["sum(df)"]):
        dfm[p, cidx[lg]] = int(v)
    den = np.array([avg_unique * nc[c] + n_total for c in classes])
    w = np.empty((len(vocab), len(classes)), dtype=np.float64)
    for j in range(len(classes)):
        dj = den[j]
        w[:, j] = [math.log(x) for x in ((dfm[:, j] + 1) / dj).tolist()]
    prior = np.array([math.log(nc[c]) - math.log(n_total)
                      for c in classes])
    ref = ray.put((vocab, w, prior, classes))

    def score(batch: pa.Table) -> pa.Table:
        vocab, w, prior, classes = ray.get(ref)
        owners, flat = _tokens(batch)
        d = pc.dictionary_encode(flat)
        uniq = np.array(d.dictionary.to_pylist(), dtype=object)
        codes = np.asarray(d.indices, dtype=np.int64)
        pos = np.searchsorted(vocab, uniq)
        n = batch.num_rows
        ll = np.empty((n, len(classes)), dtype=np.float64)
        for j in range(len(classes)):
            ll[:, j] = (np.bincount(owners, weights=w[pos, j][codes],
                                    minlength=n) + prior[j])
        best = np.argmax(ll, axis=1)          # first max = alpha-first
        cols = {
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(classes[best].astype(object),
                                  pa.string())}
        for c in _extra_cols:
            cols[c] = batch.column(c)
        return pa.table(cols)

    return _docs(sf_dir, ("doc_id", "text", *_extra_cols)).map_batches(
        score, batch_format="pyarrow")


def oracle_classify_nb_sql() -> str:
    return """WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
),
u AS (SELECT DISTINCT doc_id, lang, term FROM w),
df AS (SELECT term, lang, count(*) AS df FROM u GROUP BY term, lang),
cls AS (SELECT lang, count(*) AS nc FROM documents GROUP BY lang),
tot AS (
  SELECT count(*) AS n, (SELECT count(*) FROM u) AS sum_df FROM documents
),
den AS (
  SELECT cls.lang,
         (CAST(tot.sum_df AS DOUBLE) / tot.n) * cls.nc + tot.n AS den,
         ln(CAST(cls.nc AS DOUBLE)) - ln(CAST(tot.n AS DOUBLE)) AS prior
  FROM cls CROSS JOIN tot
),
scores AS (
  SELECT w.doc_id, den.lang,
         any_value(den.prior)
           + SUM(ln((coalesce(df.df, 0) + 1) / den.den)) AS s
  FROM w CROSS JOIN den
  LEFT JOIN df ON df.term = w.term AND df.lang = den.lang
  GROUP BY w.doc_id, den.lang
)
SELECT doc_id, lang AS pred_lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, lang) AS rn
  FROM scores
) WHERE rn = 1"""
