"""Flagship full-text pipelines exposed to the driver contract.

Each ``ft_*`` function takes ``sf_dir`` and returns a small result table;
the matching ``oracle_*_sql`` builders return DuckDB SQL over the same
``documents`` view that reproduces the result exactly (token parity holds
because documents.text is single-spaced ``[a-z ]+``, where StandardAnalyzer
tokenization == split-on-space; verified in tests).

The corpus is the deterministic 1:1 derivation of ``documents``
(:func:`lucene_ray.corpus.corpus_from_documents`); index docIDs are the
global rank of ``(repo, path, commit)`` = SQL
``row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1``.

The BM25 oracle reproduces float32 score arithmetic via REAL-cast chains
(DuckDB FLOAT arithmetic rounds identically to Java float/np.float32) and
the SmallFloat norm quantization via integer bit math.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from ..build import build_index
from ..corpus import corpus_from_documents
from ..search import (IndexReader, search_blockmax, search_boolean,
                      search_bruteforce, search_phrase, search_query_batch,
                      phrase_freqs, termdict_scan, termdict_terms)

# ---------------------------------------------------------------------------
# Reference query set (fixed; vocabulary of the documents generator)

QUERY_SET: list[tuple[int, list[str], int]] = [
    (1, ["key"], 10),
    (2, ["the"], 10),
    (3, ["vector"], 10),
    (4, ["customer"], 10),
    (5, ["zzmissing"], 10),
    (6, ["key", "agg"], 10),
    (7, ["slow", "fast"], 10),
    (8, ["table", "value", "part"], 10),
    (9, ["hash", "join", "merge", "sort"], 10),
    (10, ["the", "a", "data"], 10),
    (11, ["spark", "spark"], 10),                 # duplicate clause
    (12, ["window", "order", "data", "column", "agg"], 10),
    (13, ["stream", "batch", "big", "small", "row", "scan"], 10),
    (14, ["query", "line", "filter"], 10),
    (15, ["group", "by", "zzmissing"], 10),
    (16, ["a"], 10),
    (17, ["customer", "the", "key", "value"], 100),
    (18, ["merge", "vector", "vector"], 100),
    (19, ["scan", "slow"], 100),
    (20, ["part", "hash", "value", "table", "a", "the"], 100),
]

AND_QUERIES = [(1, ["key", "agg"]), (2, ["slow", "fast", "table"]),
               (3, ["vector", "zzmissing"]), (4, ["customer", "the"])]
NOT_QUERIES = [(1, "key", "agg"), (2, "table", "the"), (3, "a", "zzmissing")]
PREFIXES = ["s", "val", "cust", "zz"]
RANGES = [("a", "c"), ("s", "t"), ("query", "scan")]
REGEXPS = ["s.*w", ".a.*", "val.e"]
INSET_TERMS = ["vector", "spark", "zzmissing", "window"]
PHRASES = [(1, ["key", "agg"]), (2, ["slow", "fast"]),
           (3, ["the", "a"]), (4, ["table", "value", "part"]),
           (5, ["zzmissing", "key"])]
SLOPPY_PHRASES = [(1, ["key", "agg"], 2), (2, ["slow", "fast"], 1),
                  (3, ["table", "part"], 3),
                  (4, ["hash", "join", "merge"], 2),
                  (5, ["zzmissing", "key"], 4)]
MULTI_PHRASES = [(1, [["key", "hash"], ["agg"]]),
                 (2, [["slow", "fast"], ["table", "value"]]),
                 (3, [["the"], ["a", "data"]]),
                 (4, [["zzmissing", "vector"], ["key"]])]
# (qid, terms, max interval width, ordered?)
INTERVALS = [(1, ["key", "agg"], 5, True),
             (2, ["slow", "fast"], 6, False),
             (3, ["hash", "join", "merge"], 9, True),
             (4, ["the", "data"], 4, False),
             (5, ["the", "a", "data"], 6, True),
             (6, ["zzmissing", "key"], 10, True)]

_INDEX_CACHE: dict[str, str] = {}


def _cached_index(sf_dir: str, tag: str, cache: dict, builder) -> str:
    """Shared build-once-per-(sf_dir, tag) index cache under /tmp: the
    cache key folds the documents file size so regenerated testdata
    rebuilds, and ``tag`` versions the index layout."""
    sf_dir = os.path.abspath(sf_dir)
    if sf_dir in cache:
        return cache[sf_dir]
    doc = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.sha256(
        f"{sf_dir}:{os.path.getsize(doc)}:{tag}".encode()).hexdigest()[:12]
    idx = os.path.join("/tmp", "lucene_ray_indexes", h)
    if not os.path.exists(os.path.join(idx, "manifest.json")):
        builder(sf_dir, idx)
    cache[sf_dir] = idx
    return idx


def index_dir_for(sf_dir: str) -> str:
    """Build (once, resumably) the index for a testdata sf dir under /tmp."""
    return _cached_index(
        sf_dir, "v6", _INDEX_CACHE,
        lambda sf, idx: build_index(
            corpus_from_documents(sf), idx, with_positions=True,
            keyword_fields=["repo", "lang"],
            with_term_vectors=True, with_offsets=True))


def reader_for(sf_dir: str) -> IndexReader:
    return IndexReader(index_dir_for(sf_dir))


# ---------------------------------------------------------------------------
# Engine-side query entries

def _content_only(r: IndexReader, t: pa.Table) -> pa.Table:
    """Scope a dictionary view to the content field: drop keyword-field
    terms ("field:value"), mirroring Lucene's per-field statistics
    (IndexSearcher.collectionStatistics(field))."""
    import pyarrow.compute as pc
    kw = r.manifest.config.get("keyword_fields") or []
    if not kw:
        return t
    mask = None
    for fld in kw:
        m = pc.invert(pc.starts_with(t.column("term"), f"{fld}:"))
        mask = m if mask is None else pc.and_(mask, m)
    return t.filter(mask)


def _kw_prefixes(r: IndexReader) -> list[str]:
    return [f"{f}:" for f in (r.manifest.config.get("keyword_fields") or [])]


def ft_collection_stats(sf_dir: str) -> pa.Table:
    """Collection statistics (IndexSearcher.collectionStatistics) as a
    distributed aggregate over the postings partitions — the dictionary
    never materializes on the driver."""
    from ray.data.aggregate import Count, Sum
    from ..search import termdict_stats_ds

    r = reader_for(sf_dir)
    dd = termdict_stats_ds(index_dir_for(sf_dir), _kw_prefixes(r))
    agg = dd.aggregate(Count(), Sum("df"))
    return pa.table({
        "doc_count": pa.array([r.doc_count], pa.int64()),
        "sum_ttf": pa.array([r.sum_ttf], pa.int64()),
        "n_terms": pa.array([int(agg["count()"])], pa.int64()),
        "sum_df": pa.array([int(agg["sum(df)"])], pa.int64()),
    })


def ft_term_stats(sf_dir: str):
    """Top 100 terms by (df desc, term asc) with global df/ttf — a
    distributed sort + limit over the dictionary Dataset."""
    from ..search import termdict_stats_ds

    r = reader_for(sf_dir)
    dd = termdict_stats_ds(index_dir_for(sf_dir), _kw_prefixes(r))

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({"term": t.column("term"),
                         "df": t.column("df").cast(pa.int64()),
                         "ttf": t.column("ttf").cast(pa.int64())})

    return (dd.sort(["df", "term"], descending=[True, False]).limit(100)
            .map_batches(fmt, batch_format="pyarrow"))


def ft_docmeta(sf_dir: str):
    """Per-doc metadata incl. deterministic index docID, field length and
    the end-to-end sha256 invariant (hex)."""
    import ray.data

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id", "path", "field_len",
                                        "sha256"])

    def fmt(batch: pa.Table) -> pa.Table:
        orig = [int(p[4:12]) for p in batch.column("path").to_pylist()]
        sha = [s.hex() for s in batch.column("sha256").to_pylist()]
        return pa.table({
            "orig_doc_id": pa.array(orig, pa.int64()),
            "index_doc_id": batch.column("doc_id"),
            "field_len": batch.column("field_len").cast(pa.int64()),
            "sha256": pa.array(sha, pa.string()),
        })

    return ds.map_batches(fmt, batch_format="pyarrow")


def ft_postings_sample(sf_dir: str) -> pa.Table:
    """Decoded postings round-trip for every 13th term of the sorted
    dictionary → (term, doc_id, tf)."""
    from ..codec import decode_block

    r = reader_for(sf_dir)
    terms = _content_only(r, termdict_terms(r)).column("term").to_pylist()
    sel = [t for i, t in enumerate(terms) if i % 13 == 0]
    out_t, out_d, out_f = [], [], []
    for term in sel:
        p = r.postings(term)
        for b in range(len(p.n)):
            d, tf, _ = decode_block(int(p.first_doc[b]), int(p.n[b]),
                                    p.docs_enc[b], p.tfs_enc[b],
                                    p.norms_enc[b])
            out_t.extend([term] * len(d))
            out_d.extend(d.tolist())
            out_f.extend(tf.tolist())
    return pa.table({"term": pa.array(out_t, pa.string()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "tf": pa.array(out_f, pa.int64())})


def ft_bm25_top10(sf_dir: str):
    """Reference query set → (qid, rank, doc_id) via the block-max engine
    running on a searcher actor pool."""
    from lucene_ray.pipelines.util import typed_table

    idx = index_dir_for(sf_dir)
    qs = [(qid, " ".join(terms), k) for qid, terms, k in QUERY_SET]
    ds = search_query_batch(idx, qs, concurrency=2)
    return typed_table(ds.select_columns(["qid", "rank", "doc_id"]),
                       pa.schema([("qid", pa.int64()),
                                  ("rank", pa.int32()),
                                  ("doc_id", pa.int64())]))


def ft_bm25_scores(sf_dir: str):
    """Same with float32 scores (rows-only driver check; exactness is
    enforced by the pytest oracle suite instead)."""
    from lucene_ray.pipelines.util import typed_table

    idx = index_dir_for(sf_dir)
    qs = [(qid, " ".join(terms), k) for qid, terms, k in QUERY_SET]
    return typed_table(search_query_batch(idx, qs, concurrency=2),
                       pa.schema([("qid", pa.int64()),
                                  ("rank", pa.int32()),
                                  ("doc_id", pa.int64()),
                                  ("score", pa.float32())]))


def ft_boolean_and(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, terms in AND_QUERIES:
        d = search_boolean(r, must=terms)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_boolean_and_not(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, a, b in NOT_QUERIES:
        d = search_boolean(r, must=[a], must_not=[b])
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_term_in_set(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    d = search_boolean(r, should=INSET_TERMS)
    return pa.table({"doc_id": pa.array(d, pa.int64())})


def ft_prefix_terms(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    out = []
    for p in PREFIXES:
        t = _content_only(r, termdict_scan(r, prefix=p))
        out.append(t.append_column(
            "prefix", pa.array([p] * t.num_rows, pa.string())))
    return pa.concat_tables(out).select(["prefix", "term", "df"])


SUGGEST_QUERIES = [("s", 5), ("val", 3), ("c", 8), ("a", 4), ("zz", 5)]


def ft_suggest(sf_dir: str) -> pa.Table:
    """Prefix suggester (suggest/.../analyzing/AnalyzingSuggester.java:100
    role): top-k completions of a prefix ranked by weight — here df desc,
    term asc — over the sorted term dictionary + df stats the index
    already maintains (the suggester's FST weight is replaced by the
    termdict scan + bounded top-k)."""
    r = reader_for(sf_dir)
    out = []
    for p, k in SUGGEST_QUERIES:
        t = _content_only(r, termdict_scan(r, prefix=p))
        df = t.column("df").to_numpy()
        terms = t.column("term").to_numpy(zero_copy_only=False)
        sel = np.lexsort((terms, -df))[:k]
        out.append(pa.table({
            "prefix": pa.array([p] * len(sel), pa.string()),
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "term": pa.array(terms[sel], pa.string()),
            "df": pa.array(df[sel].astype(np.int64)),
        }))
    return pa.concat_tables(out)


def oracle_suggest_sql() -> str:
    rows = []
    for p, k in SUGGEST_QUERIES:
        rows.append(f"""SELECT prefix, rank, term, df FROM (
  SELECT '{p}' AS prefix,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rank,
         term, df
  FROM df WHERE term LIKE '{p}%') WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def ft_term_range(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    out = []
    for i, (lo, hi) in enumerate(RANGES, 1):
        t = _content_only(r, termdict_scan(r, lo=lo, hi=hi))
        out.append(t.append_column("qid",
                                   pa.array([i] * t.num_rows, pa.int64())))
    return pa.concat_tables(out).select(["qid", "term", "df"])


def ft_regexp_terms(sf_dir: str) -> pa.Table:
    r = reader_for(sf_dir)
    out = []
    for i, rx in enumerate(REGEXPS, 1):
        t = _content_only(r, termdict_scan(r, regex=rx))
        out.append(t.append_column("qid",
                                   pa.array([i] * t.num_rows, pa.int64())))
    return pa.concat_tables(out).select(["qid", "term", "df"])


# ---------------------------------------------------------------------------
# Oracle SQL builders

_CORPUS_CTE = """
corpus AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         text
  FROM documents
),
tok AS (
  SELECT d, unnest(string_split(text, ' ')) AS term FROM corpus
),
tf AS (
  SELECT d, term, count(*) AS tf FROM tok GROUP BY d, term
),
dl AS (
  SELECT c.d, count(t.term) AS len
  FROM corpus c LEFT JOIN tok t ON c.d = t.d GROUP BY c.d
),
stats AS (
  SELECT count(*) AS n_docs, (SELECT count(*) FROM tok) AS sum_ttf FROM corpus
),
df AS (
  SELECT term, count(*) AS df, sum(tf) AS ttf FROM tf GROUP BY term
)"""

# SmallFloat.intToByte4 → byte4ToInt round-trip (the quantized length),
# NUM_FREE_VALUES = 24, expressed with integer bit math.
_QUANT_LEN = """
quant AS (
  SELECT d, len,
    CASE WHEN len < 24 THEN len
         ELSE 24 + (
           CASE WHEN (len - 24) < 8 THEN (len - 24)
                ELSE (((len - 24) >> (CAST(floor(log2(len - 24)) AS INT) - 3)) & 7 | 8)
                     << (CAST(floor(log2(len - 24)) AS INT) - 3)
           END)
    END AS qlen
  FROM dl
)"""


def oracle_collection_stats_sql() -> str:
    # CAST sums to BIGINT: DuckDB sum() yields HUGEINT, which value-hashes
    # differently from the engine's int64 even when values are equal.
    return f"""WITH {_CORPUS_CTE}
SELECT (SELECT n_docs FROM stats) AS doc_count,
       (SELECT sum_ttf FROM stats) AS sum_ttf,
       count(*) AS n_terms, CAST(sum(df) AS BIGINT) AS sum_df
FROM df"""


def oracle_term_stats_sql() -> str:
    return f"""WITH {_CORPUS_CTE}
SELECT term, df, CAST(ttf AS BIGINT) AS ttf FROM df
ORDER BY df DESC, term LIMIT 100"""


def oracle_docmeta_sql() -> str:
    return """WITH corpus AS (
  SELECT doc_id AS orig_doc_id,
         row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS index_doc_id,
         text
  FROM documents
)
SELECT orig_doc_id, index_doc_id,
       len(string_split(text, ' ')) AS field_len,
       sha256(text) AS sha256
FROM corpus"""


def oracle_postings_sample_sql() -> str:
    return f"""WITH {_CORPUS_CTE},
ranked AS (
  SELECT term, row_number() OVER (ORDER BY term) - 1 AS r FROM df
)
SELECT t.term, t.d AS doc_id, t.tf
FROM tf t JOIN ranked rk ON t.term = rk.term
WHERE rk.r % 13 = 0"""


def _query_clauses_values() -> str:
    rows = []
    for qid, terms, k in QUERY_SET:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', {k})")
    return ",\n    ".join(rows)


def _bm25_chain_cte(clause_values: str) -> str:
    """The float32 BM25 scoring chain (clauses → scored → totals →
    ranked) as CTE text over a caller-supplied ``clauses`` VALUES list —
    shared by :func:`oracle_bm25_sql` and the hybrid-RRF oracle. REAL
    casts at every arithmetic step reproduce Java float rounding."""
    return f"""clauses(qid, clause, term, k) AS (VALUES
    {clause_values}
),
scored AS (
  SELECT c.qid, c.clause, c.k, t.d,
    CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank, k
  FROM totals
)"""


def oracle_bm25_sql(with_scores: bool = False) -> str:
    """Float32 BM25 top-k, rank order (score desc, doc asc). With
    ``with_scores`` the REAL score column is emitted too (bit-equal to
    the engine's float32 — verified at sf0.01)."""
    cols = "qid, rank, d AS doc_id" + (", score" if with_scores else "")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
{_bm25_chain_cte(_query_clauses_values())}
SELECT {cols} FROM ranked WHERE rank <= k"""


def oracle_boolean_and_sql() -> str:
    rows = []
    for qid, terms in AND_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM tf "
                    f"WHERE term IN ({tl}) GROUP BY d "
                    f"HAVING count(DISTINCT term) = {len(terms)}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def oracle_boolean_and_not_sql() -> str:
    rows = []
    for qid, a, b in NOT_QUERIES:
        rows.append(
            f"SELECT {qid} AS qid, d AS doc_id FROM tf WHERE term = '{a}' "
            f"AND d NOT IN (SELECT d FROM tf WHERE term = '{b}')")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def oracle_term_in_set_sql() -> str:
    tl = ", ".join(f"'{t}'" for t in INSET_TERMS)
    return (f"WITH {_CORPUS_CTE}\n"
            f"SELECT DISTINCT d AS doc_id FROM tf WHERE term IN ({tl})")


def oracle_prefix_terms_sql() -> str:
    rows = []
    for p in PREFIXES:
        rows.append(f"SELECT '{p}' AS prefix, term, df FROM df "
                    f"WHERE term LIKE '{p}%'")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def oracle_term_range_sql() -> str:
    rows = []
    for i, (lo, hi) in enumerate(RANGES, 1):
        rows.append(f"SELECT {i} AS qid, term, df FROM df "
                    f"WHERE term >= '{lo}' AND term < '{hi}'")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def oracle_regexp_terms_sql() -> str:
    rows = []
    for i, rx in enumerate(REGEXPS, 1):
        rows.append(f"SELECT {i} AS qid, term, df FROM df "
                    f"WHERE regexp_full_match(term, '{rx}')")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def ft_phrase(sf_dir: str) -> pa.Table:
    """PhraseQuery: exact positional phrase matches → (qid, doc_id, freq)
    where freq counts (possibly overlapping) phrase occurrences."""
    r = reader_for(sf_dir)
    qids, docs, freqs = [], [], []
    for qid, terms in PHRASES:
        for doc, f in sorted(phrase_freqs(r, terms).items()):
            qids.append(qid)
            docs.append(doc)
            freqs.append(f)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_phrase_sql() -> str:
    parts = []
    for qid, terms in PHRASES:
        joins = ["FROM w w0"]
        conds = [f"w0.word = '{terms[0]}'"]
        for i in range(1, len(terms)):
            joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                         f"AND w{i}.pos = w0.pos + {i}")
            conds.append(f"w{i}.word = '{terms[i]}'")
        parts.append(
            f"SELECT {qid} AS qid, w0.d AS doc_id, count(*) AS freq\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds)
            + "\nGROUP BY w0.d")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


def ft_phrase_sloppy(sf_dir: str) -> pa.Table:
    """Sloppy PhraseQuery (slop > 0, SloppyPhraseMatcher.java:189):
    (qid, doc_id) of docs with at least one slop-valid match. Match
    EXISTENCE is greedy-order-independent (a doc matches iff some
    one-position-per-term assignment has offset-adjusted range <= slop),
    so it is SQL-expressible; the greedy float frequencies are covered by
    pytest goldens instead."""
    from ..search import sloppy_phrase_freqs

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, terms, slop in SLOPPY_PHRASES:
        fr = sloppy_phrase_freqs(r, terms, slop)
        for d in sorted(fr):
            qids.append(qid)
            docs.append(int(d))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_interval_near(sf_dir: str) -> pa.Table:
    """IntervalQuery (queries/intervals/IntervalQuery.java:59):
    ordered / unordered near with a max interval width over the stored
    positional payload → (qid, doc_id) existence rows."""
    from ..search import interval_near_docs

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, terms, width, ordered in INTERVALS:
        for d in interval_near_docs(r, terms, width, ordered).tolist():
            qids.append(qid)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_interval_near_sql() -> str:
    parts = []
    for qid, terms, width, ordered in INTERVALS:
        if ordered:
            joins = ["FROM w w0"]
            conds = [f"w0.word = '{terms[0]}'"]
            for i in range(1, len(terms)):
                joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                             f"AND w{i}.pos > w{i-1}.pos")
                conds.append(f"w{i}.word = '{terms[i]}'")
            conds.append(
                f"w{len(terms)-1}.pos - w0.pos + 1 <= {width}")
        else:
            joins = ["FROM w w0",
                     "JOIN w w1 ON w1.d = w0.d AND w1.pos != w0.pos"]
            conds = [f"w0.word = '{terms[0]}'",
                     f"w1.word = '{terms[1]}'",
                     f"abs(w1.pos - w0.pos) + 1 <= {width}"]
        parts.append(
            f"SELECT DISTINCT {qid} AS qid, w0.d AS doc_id\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds))
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


def ft_multi_phrase(sf_dir: str) -> pa.Table:
    """MultiPhraseQuery (search/MultiPhraseQuery.java:54): per-position
    alternative term sets, exact consecutive matching →
    (qid, doc_id, freq)."""
    from ..search import multi_phrase_freqs

    r = reader_for(sf_dir)
    qids, docs, freqs = [], [], []
    for qid, sets in MULTI_PHRASES:
        fr = multi_phrase_freqs(r, sets)
        for d in sorted(fr):
            qids.append(qid)
            docs.append(d)
            freqs.append(fr[d])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_multi_phrase_sql() -> str:
    parts = []
    for qid, sets in MULTI_PHRASES:
        joins = ["FROM w w0"]
        tl0 = ", ".join(f"'{t}'" for t in sets[0])
        conds = [f"w0.word IN ({tl0})"]
        for i in range(1, len(sets)):
            joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                         f"AND w{i}.pos = w0.pos + {i}")
            tl = ", ".join(f"'{t}'" for t in sets[i])
            conds.append(f"w{i}.word IN ({tl})")
        parts.append(
            f"SELECT {qid} AS qid, w0.d AS doc_id, count(*) AS freq\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds)
            + "\nGROUP BY w0.d")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


def oracle_phrase_sloppy_sql() -> str:
    parts = []
    for qid, terms, slop in SLOPPY_PHRASES:
        joins = ["FROM w w0"]
        conds = [f"w0.word = '{terms[0]}'"]
        for i in range(1, len(terms)):
            joins.append(f"JOIN w w{i} ON w{i}.d = w0.d")
            conds.append(f"w{i}.word = '{terms[i]}'")
        adj = ", ".join(f"(w{i}.pos - {i})" for i in range(len(terms)))
        conds.append(f"greatest({adj}) - least({adj}) <= {slop}")
        parts.append(
            f"SELECT DISTINCT {qid} AS qid, w0.d AS doc_id\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds))
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


BOOSTED_QUERY_SET: list[tuple[int, list[tuple[str, float]], int]] = [
    (1, [("key", 2.0), ("agg", 1.0)], 10),
    (2, [("slow", 1.0), ("fast", 3.0), ("table", 0.5)], 10),
    (3, [("the", 0.25), ("vector", 4.0)], 10),
    (4, [("customer", 2.5)], 10),
]


def ft_bm25_boosted(sf_dir: str) -> pa.Table:
    """Boosted BooleanQuery (QueryParser ^boost syntax): weight =
    float32(boost) * idf — (qid, rank, doc_id)."""
    from ..search import search_boosted

    r = reader_for(sf_dir)
    qids, ranks, docs = [], [], []
    for qid, clauses, k in BOOSTED_QUERY_SET:
        q = " ".join(f"{t}^{b}" for t, b in clauses)
        td = search_boosted(r, q, k)
        for rank, d in enumerate(td.doc_ids.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_bm25_boosted_sql() -> str:
    rows = []
    for qid, clauses, k in BOOSTED_QUERY_SET:
        for ci, (t, b) in enumerate(clauses):
            rows.append(f"({qid}, {ci}, '{t}', {k}, {b})")
    values = ",\n    ".join(rows)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, k, boost) AS (VALUES
    {values}
),
scored AS (
  SELECT c.qid, c.clause, c.k, t.d,
    CAST(
      CAST(CAST(c.boost AS REAL) *
           CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL) AS REAL)
      - CAST(CAST(c.boost AS REAL) *
             CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank, k
  FROM totals
)
SELECT qid, rank, d AS doc_id FROM ranked WHERE rank <= k"""


def ft_sort_by_field(sf_dir: str, k: int = 25) -> pa.Table:
    """TopFieldCollector role (search/TopFieldCollector.java:37): top-k
    docs by (field_len desc, doc_id asc) as per-partition top-k partials
    (`map_batches` lexsort, the per-leaf collector) + a bounded driver
    merge of ≤ k rows per partition — no global all-to-all sort of the
    docmeta (TopDocs.merge, search/TopDocs.java:216)."""
    import ray.data

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id", "field_len"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        fl = batch.column("field_len").to_numpy().astype(np.int64)
        sel = np.lexsort((d, -fl))[:k]
        return pa.table({"doc_id": pa.array(d[sel], pa.int64()),
                         "field_len": pa.array(fl[sel], pa.int64())})

    parts = pa.concat_tables(
        list(ds.map_batches(partial_topk, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")) or
        [pa.table({"doc_id": pa.array([], pa.int64()),
                   "field_len": pa.array([], pa.int64())})])
    d = parts.column("doc_id").to_numpy()
    fl = parts.column("field_len").to_numpy()
    sel = np.lexsort((d, -fl))[:k]
    return pa.table({"doc_id": pa.array(d[sel], pa.int64()),
                     "field_len": pa.array(fl[sel], pa.int64())})


_SORTED_IDX_CACHE: dict[str, str] = {}


def sorted_index_dir_for(sf_dir: str) -> str:
    """Build (once, cached) an INDEX-SORTED index: docs permuted by
    content length desc before docID assignment
    (index/IndexSorter.java + IndexWriterConfig.setIndexSort), so every
    docmeta bucket is stored sorted on the key."""
    return _cached_index(
        sf_dir, "sorted-v1", _SORTED_IDX_CACHE,
        lambda sf, idx: build_index(corpus_from_documents(sf), idx,
                                    index_sort="content_chars"))


def sorted_topk_nchars(index_dir: str, k: int
                       ) -> tuple[pa.Table, int]:
    """Early-terminated sorted-field top-k (TopFieldCollector.java:37
    over a sorted index): each docmeta bucket is scanned IN ORDER and
    the scan stops as soon as k rows are held and the last key read is
    strictly below the k-th largest (all remaining rows in the sorted
    bucket are smaller; boundary ties are kept). Returns the merged
    (path, sort_key) candidates plus total rows read — the early-
    termination evidence."""
    import pyarrow.parquet as pq_
    import ray.data

    dm_dir = os.path.join(index_dir, "docmeta")
    buckets = sorted(f for f in os.listdir(dm_dir)
                     if f.endswith(".parquet"))

    def scan(batch: pa.Table) -> pa.Table:
        out = []
        for fname in batch.column("file").to_pylist():
            pf = pq_.ParquetFile(os.path.join(dm_dir, fname))
            keys: list[int] = []
            paths: list[str] = []
            rows_read = 0
            for rb in pf.iter_batches(batch_size=256,
                                      columns=["path", "sort_key"]):
                kk = rb.column("sort_key").to_pylist()
                keys.extend(kk)
                paths.extend(rb.column("path").to_pylist())
                rows_read += len(kk)
                if len(keys) >= k:
                    kth = sorted(keys, reverse=True)[k - 1]
                    if keys[-1] < kth:
                        break
            if keys:
                kth = sorted(keys, reverse=True)[min(k, len(keys)) - 1]
                sel = [i for i, x in enumerate(keys) if x >= kth]
                out.append(pa.table({
                    "bucket": pa.array([fname] * len(sel)),
                    "path": pa.array([paths[i] for i in sel]),
                    "sort_key": pa.array([keys[i] for i in sel],
                                         pa.int64()),
                    "rows_read": pa.array([rows_read] * len(sel),
                                          pa.int64())}))
        return pa.concat_tables(out) if out else pa.table(
            {"bucket": pa.array([], pa.string()),
             "path": pa.array([], pa.string()),
             "sort_key": pa.array([], pa.int64()),
             "rows_read": pa.array([], pa.int64())})

    parts = (ray.data.from_items([{"file": f} for f in buckets])
             .map_batches(scan, batch_format="pyarrow", batch_size=1)
             .take_all())                     # ≤ k + ties rows per bucket
    if not parts:
        return pa.table({"path": pa.array([], pa.string()),
                         "sort_key": pa.array([], pa.int64())}), 0
    rows_read = sum({r["bucket"]: int(r["rows_read"])
                     for r in parts}.values())
    t = pa.table({
        "path": pa.array([r["path"] for r in parts], pa.string()),
        "sort_key": pa.array([r["sort_key"] for r in parts], pa.int64()),
    })
    return t, rows_read


def ft_sort_early_terminated(sf_dir: str, k: int = 25) -> pa.Table:
    """Sorted-index early-terminated top-k: (doc_id, n_chars) of the 25
    longest docs, reading only the head of each sorted docmeta bucket."""
    idx = sorted_index_dir_for(sf_dir)
    cands, _ = sorted_topk_nchars(idx, k)
    orig = np.array([int(p[4:12]) for p in
                     cands.column("path").to_pylist()], np.int64)
    key = cands.column("sort_key").to_numpy()
    sel = np.lexsort((orig, -key))[:k]
    return pa.table({"doc_id": pa.array(orig[sel], pa.int64()),
                     "n_chars": pa.array(key[sel], pa.int64())})


def oracle_sort_early_terminated_sql() -> str:
    return """SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 25"""


def oracle_sort_by_field_sql() -> str:
    return """WITH corpus AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         text FROM documents
)
SELECT d AS doc_id, len(string_split(text, ' ')) AS field_len
FROM corpus ORDER BY field_len DESC, d ASC LIMIT 25"""


FUZZY_QUERIES = [(1, "valu", 1), (2, "custmer", 2), (3, "sparc", 1),
                 (4, "zzz", 1)]


def ft_fuzzy_terms(sf_dir: str) -> pa.Table:
    """FuzzyQuery rewrite (search/FuzzyQuery.java:52): dictionary terms
    within Levenshtein distance → (qid, term, df)."""
    r = reader_for(sf_dir)
    out = []
    for qid, q, d in FUZZY_QUERIES:
        t = _content_only(r, termdict_scan(r, fuzzy=(q, d)))
        out.append(t.append_column("qid",
                                   pa.array([qid] * t.num_rows, pa.int64())))
    return pa.concat_tables(out).select(["qid", "term", "df"])


def oracle_fuzzy_terms_sql() -> str:
    rows = []
    for qid, q, d in FUZZY_QUERIES:
        rows.append(f"SELECT {qid} AS qid, term, df FROM df "
                    f"WHERE levenshtein(term, '{q}') <= {d}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


WILDCARD_DOC_QUERIES = [(1, "val*"), (2, "*tor"), (3, "s?ow"),
                        (4, "zz*rk")]
FUZZY_DOC_QUERIES = [(1, "valu", 1), (2, "custmer", 2), (3, "sparc", 1)]

_SCORE_EXPR = """CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL)"""


def _multiterm_scored_table(r: IndexReader, expansions) -> pa.Table:
    """SCORING_BOOLEAN_REWRITE execution: each expanded dictionary term
    becomes one scored SHOULD clause (MultiTermQuery.java
    SCORING_BOOLEAN_REWRITE) → (qid, rank, doc_id) top-10."""
    from ..search import search_terms_scored

    qids, ranks, docs = [], [], []
    for qid, terms in expansions:
        if terms:
            td = search_terms_scored(r, terms, 10)
            for rank, d in enumerate(td.doc_ids.tolist(), 1):
                qids.append(qid)
                ranks.append(rank)
                docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_wildcard_docs(sf_dir: str) -> pa.Table:
    """WildcardQuery → scored doc-level results: pattern expands against
    the dictionary (WildcardQuery.java:38 → AutomatonQuery.java:43), then
    scores as a Boolean SHOULD of the matched terms."""
    from ..queryparser import wildcard_to_regex
    from ..search import termdict_scan

    r = reader_for(sf_dir)
    exp = []
    for qid, patt in WILDCARD_DOC_QUERIES:
        t = _content_only(r, termdict_scan(
            r, regex=wildcard_to_regex(patt)))
        exp.append((qid, t.column("term").to_pylist()))
    return _multiterm_scored_table(r, exp)


def ft_fuzzy_docs(sf_dir: str) -> pa.Table:
    """FuzzyQuery → scored doc-level results (FuzzyQuery.java:52 rewrite
    to a Boolean of within-distance dictionary terms)."""
    from ..search import termdict_scan

    r = reader_for(sf_dir)
    exp = []
    for qid, q, d in FUZZY_DOC_QUERIES:
        t = _content_only(r, termdict_scan(r, fuzzy=(q, d)))
        exp.append((qid, t.column("term").to_pylist()))
    return _multiterm_scored_table(r, exp)


def _oracle_multiterm_scored_sql(preds: list[tuple[int, str]]) -> str:
    cl = "\n  UNION ALL ".join(
        f"SELECT {qid} AS qid, term FROM df WHERE {pred}"
        for qid, pred in preds)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
cl AS (
  {cl}
),
scored AS (
  SELECT c.qid, c.term, t.d, {_SCORE_EXPR} AS s
  FROM cl c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id FROM ranked WHERE rank <= 10"""


def oracle_wildcard_docs_sql() -> str:
    preds = []
    for qid, patt in WILDCARD_DOC_QUERIES:
        like = patt.replace("*", "%").replace("?", "_")
        preds.append((qid, f"term LIKE '{like}'"))
    return _oracle_multiterm_scored_sql(preds)


def oracle_fuzzy_docs_sql() -> str:
    preds = [(qid, f"levenshtein(term, '{q}') <= {d}")
             for qid, q, d in FUZZY_DOC_QUERIES]
    return _oracle_multiterm_scored_sql(preds)


SPELL_QUERIES = [(1, "valu"), (2, "custmer"), (3, "sorw"), (4, "tble"),
                 (5, "zzz")]
SPELL_TOP = 5
SPELL_MAX_EDITS = 2          # DirectSpellChecker.maxEdits default
SPELL_MIN_PREFIX = 1         # DirectSpellChecker.minPrefix default


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def ft_spell(sf_dir: str) -> pa.Table:
    """DirectSpellChecker "did you mean"
    (suggest/src/java/org/apache/lucene/search/spell/
    DirectSpellChecker.java:50): dictionary terms within edit distance
    ``maxEdits=2`` of the query term that share its first letter
    (``minPrefix=1``), excluding the term itself, ranked by
    (distance asc, df desc, term asc), top 5 per query. Candidate
    enumeration reuses the bounded-Levenshtein fuzzy termdict scan
    (vectorized masks inside each term-sorted partition; distributes
    over part files), so only the candidates — bounded by the edit-ball
    size, not the vocabulary — reach the driver ranker."""
    r = reader_for(sf_dir)
    cols = {"qid": [], "suggestion": [], "distance": [], "df": []}
    for qid, q in SPELL_QUERIES:
        t = _content_only(r, termdict_scan(r, fuzzy=(q, SPELL_MAX_EDITS)))
        cand = []
        for term, df in zip(t.column("term").to_pylist(),
                            t.column("df").to_pylist()):
            if term == q or term[:SPELL_MIN_PREFIX] != q[:SPELL_MIN_PREFIX]:
                continue
            cand.append((_levenshtein(term, q), -int(df), term))
        cand.sort()
        for dist, ndf, term in cand[:SPELL_TOP]:
            cols["qid"].append(qid)
            cols["suggestion"].append(term)
            cols["distance"].append(dist)
            cols["df"].append(-ndf)
    return pa.table({"qid": pa.array(cols["qid"], pa.int64()),
                     "suggestion": pa.array(cols["suggestion"], pa.string()),
                     "distance": pa.array(cols["distance"], pa.int64()),
                     "df": pa.array(cols["df"], pa.int64())})


def oracle_spell_sql() -> str:
    rows = []
    for qid, q in SPELL_QUERIES:
        rows.append(f"""SELECT * FROM (
  SELECT {qid} AS qid, term AS suggestion,
         CAST(levenshtein(term, '{q}') AS BIGINT) AS distance, df
  FROM df
  WHERE levenshtein(term, '{q}') <= {SPELL_MAX_EDITS}
    AND term <> '{q}'
    AND substr(term, 1, {SPELL_MIN_PREFIX}) =
        substr('{q}', 1, {SPELL_MIN_PREFIX})
  ORDER BY distance, df DESC, term LIMIT {SPELL_TOP})""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


def ft_facet_lang(sf_dir: str):
    """Facet counts over the index's docmeta (StringValueFacetCounts role,
    facet/.../StringValueFacetCounts.java) — doc counts per lang with
    per-batch pre-aggregation."""
    import ray.data
    from ray.data.aggregate import Sum

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").aggregate(Sum("n", alias_name="n")))


def oracle_facet_lang_sql() -> str:
    return "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


def ft_facet_lang_dv(sf_dir: str):
    """Same facet as :func:`ft_facet_lang` but through the ordinal
    docvalues path (SortedSetDocValuesWriter.java:43 + OrdinalMap):
    per-bucket int bincounts and a gord combiner groupby; strings
    resolved only on the final rows. The 100-TB facet shape."""
    from ..docvalues import facet_counts_dv

    return facet_counts_dv(index_dir_for(sf_dir), "lang")


# (label, lo, hi): LongRange(label, lo, minInclusive, hi, maxInclusive)
# with [lo, hi) bounds; 'all' overlaps the others (Lucene allows overlap —
# each doc counts in every containing range).
LEN_FACET_RANGES = [("short", 0, 40), ("mid", 40, 70), ("long", 70, 200),
                    ("all", 0, 1_000_000)]
FACET_RANGE_QUERIES = [(1, ["key"]), (2, ["the", "data"]), (3, ["zzmissing"])]


def ft_facet_len_ranges(sf_dir: str) -> pa.Table:
    """LongRangeFacetCounts (facet/range/LongRangeFacetCounts.java:41):
    per-range doc counts of the numeric field_len docvalue over the hits
    of a base query — counted distributed (per-batch vectorized range
    membership partials over docmeta, summed), every range reported even
    at count 0 (getTopChildren returns all ranges)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..search import search_boolean

    idx = index_dir_for(sf_dir)
    r = reader_for(sf_dir)
    los = np.array([lo for _, lo, _ in LEN_FACET_RANGES], dtype=np.int64)
    his = np.array([hi for _, _, hi in LEN_FACET_RANGES], dtype=np.int64)
    labels = [lb for lb, _, _ in LEN_FACET_RANGES]
    # ONE docmeta pass for every query: the per-query hit sets broadcast
    # together, each batch emits (qid, label, n) partials for all
    # (query, range) cells, one small groupby sums them
    qids = [qid for qid, _ in FACET_RANGE_QUERIES]
    hits_ref = ray.put({qid: search_boolean(r, should=terms)
                        for qid, terms in FACET_RANGE_QUERIES})
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id", "field_len"])

    def partial(batch: pa.Table) -> pa.Table:
        hmap = ray.get(hits_ref)
        docs = batch.column("doc_id").to_numpy()
        flens = batch.column("field_len").to_numpy()
        out_q, out_l, out_n = [], [], []
        for qid, h in hmap.items():
            if len(h):
                pos = np.minimum(np.searchsorted(h, docs), len(h) - 1)
                lens = flens[h[pos] == docs]
            else:
                lens = np.empty(0, np.int64)
            n = ((lens[:, None] >= los) & (lens[:, None] < his)).sum(axis=0)
            out_q.extend([qid] * len(labels))
            out_l.extend(labels)
            out_n.extend(n.astype(np.int64).tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "label": pa.array(out_l, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["qid", "label"]).aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    by = {(q, lb): int(n)
          for q, lb, n in zip(agg["qid"], agg["label"], agg["n"])}
    out = []
    for qid in qids:
        out.append(pa.table({
            "qid": pa.array([qid] * len(labels), pa.int64()),
            "label": pa.array(labels, pa.string()),
            "lo": pa.array(los),
            "hi": pa.array(his),
            "n": pa.array([by.get((qid, lb), 0) for lb in labels],
                          pa.int64()),
        }))
    return pa.concat_tables(out)


def oracle_facet_len_ranges_sql() -> str:
    qrows = []
    for qid, terms in FACET_RANGE_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        qrows.append(f"""SELECT {qid} AS qid, r.label, r.lo, r.hi,
       count(h.d) AS n
FROM (VALUES {', '.join(f"('{lb}', {lo}, {hi})"
                        for lb, lo, hi in LEN_FACET_RANGES)}) r(label, lo, hi)
LEFT JOIN (
  SELECT DISTINCT t.d, dl.len FROM tok t JOIN dl ON dl.d = t.d
  WHERE t.term IN ({tl})
) h ON h.len >= r.lo AND h.len < r.hi
GROUP BY r.label, r.lo, r.hi""")
    un = "\nUNION ALL\n".join(qrows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# (qid, base content term, drill-down lang value)
DRILL_QUERIES = [(1, "key", "en"), (2, "table", "zh"), (3, "value", "qq")]


def ft_drill_sideways(sf_dir: str) -> pa.Table:
    """DrillSideways (facet/DrillSideways.java:63): for a base query with
    a drill-down on lang=V, the lang dimension's counts are computed with
    its own constraint REMOVED (the sideways set — every lang the user
    could still pick), while other dimensions (repo) and the hit count
    use the full drill-down. One distributed docmeta pass per query with
    per-batch partial counts → (qid, dim, value, n)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..search import search_boolean

    idx = index_dir_for(sf_dir)
    r = reader_for(sf_dir)
    # ONE docmeta pass for all queries: every query's (sideways, drill)
    # doc sets broadcast together; each batch emits (qid, dim, value, n)
    # partials; one small groupby sums the cells
    sets = {}
    drill_sizes = {}
    for qid, term, lang in DRILL_QUERIES:
        base = search_boolean(r, must=[term])                  # sideways
        drill = search_boolean(r, must=[term, f"lang:{lang}"])  # full
        sets[qid] = (base, drill)
        drill_sizes[qid] = len(drill)
    sref = ray.put(sets)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id", "lang", "repo"])

    def partial(batch: pa.Table) -> pa.Table:
        smap = ray.get(sref)

        def member(docs, s):
            if len(s) == 0 or len(docs) == 0:
                return np.zeros(len(docs), bool)
            pos = np.minimum(np.searchsorted(s, docs), len(s) - 1)
            return s[pos] == docs

        docs = batch.column("doc_id").to_numpy()
        rows = []
        for qid, (base, drill) in smap.items():
            lf = batch.filter(pa.array(member(docs, base))) \
                      .group_by("lang").aggregate([([], "count_all")])
            for v, n in zip(lf.column("lang").to_pylist(),
                            lf.column("count_all").to_pylist()):
                rows.append((qid, "lang", v, n))
            rf = batch.filter(pa.array(member(docs, drill))) \
                      .group_by("repo").aggregate([([], "count_all")])
            for v, n in zip(rf.column("repo").to_pylist(),
                            rf.column("count_all").to_pylist()):
                rows.append((qid, "repo", v, n))
        return pa.table({
            "qid": pa.array([x[0] for x in rows], pa.int64()),
            "dim": pa.array([x[1] for x in rows], pa.string()),
            "value": pa.array([x[2] for x in rows], pa.string()),
            "n": pa.array([x[3] for x in rows], pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        (ds.map_batches(partial, batch_format="pyarrow")
         .groupby(["qid", "dim", "value"])
         .aggregate(Sum("n", alias_name="n")).to_pandas()),
        ["qid", "dim", "value", "n"])
    out = []
    for qid, _term, _lang in DRILL_QUERIES:
        sub = agg[agg["qid"] == qid]
        n = len(sub) + 1
        out.append(pa.table({
            "qid": pa.array([qid] * n, pa.int64()),
            "dim": pa.array(sub["dim"].tolist() + ["hits"], pa.string()),
            "value": pa.array(sub["value"].tolist() + [""], pa.string()),
            "n": pa.array([int(x) for x in sub["n"]] + [drill_sizes[qid]],
                          pa.int64()),
        }))
    return pa.concat_tables(out)


def oracle_drill_sideways_sql() -> str:
    parts = []
    for qid, term, lang in DRILL_QUERIES:
        base = (f"SELECT DISTINCT t.d FROM tok t WHERE t.term = '{term}'")
        parts.append(f"""SELECT {qid} AS qid, 'lang' AS dim, c.lang AS value,
       count(*) AS n
FROM ({base}) h JOIN par2 c ON c.d = h.d GROUP BY c.lang""")
        parts.append(f"""SELECT {qid} AS qid, 'repo' AS dim,
       c.source AS value, count(*) AS n
FROM ({base}) h JOIN par2 c ON c.d = h.d
WHERE c.lang = '{lang}' GROUP BY c.source""")
        parts.append(f"""SELECT {qid} AS qid, 'hits' AS dim, '' AS value,
       (SELECT count(*) FROM ({base}) h JOIN par2 c ON c.d = h.d
        WHERE c.lang = '{lang}') AS n""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
par2 AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         source, lang
  FROM documents
)
{un}"""


def ft_facet_sampled(sf_dir: str) -> pa.Table:
    """Sampled facet counts (RandomSamplingFacetsCollector.java:60 role):
    a deterministic 1/4 document sample — docs whose stored content
    sha256 has a first byte < 0x40, the binsize-style hash sample — facet
    lang counts over the sample only, one distributed pass with per-batch
    partials. Deterministic, so exactly reproducible by the oracle."""
    import ray.data
    from ray.data.aggregate import Sum

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["sha256", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        sha = batch.column("sha256").to_pylist()
        keep = np.array([len(s) > 0 and s[0] < 0x40 for s in sha], bool)
        g = batch.filter(pa.array(keep)).group_by("lang") \
                 .aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang").aggregate(Sum("n", alias_name="n")))


def oracle_facet_sampled_sql() -> str:
    return """SELECT lang, count(*) AS n FROM documents
WHERE substr(sha256(text), 1, 1) IN ('0', '1', '2', '3')
GROUP BY lang"""


KEYWORD_QUERIES = [(1, "lang:en", "key"), (2, "lang:zh", "table"),
                   (3, "repo:src0", "value"), (4, "lang:qq", "key")]


def ft_keyword_filter(sf_dir: str) -> pa.Table:
    """StringField keyword filter + scored content term:
    MUST field:value, MUST content term → (qid, doc_id)."""
    from ..search import search_boolean

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, kw, term in KEYWORD_QUERIES:
        d = search_boolean(r, must=[kw, term])
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_keyword_filter_sql() -> str:
    rows = []
    for qid, kw, term in KEYWORD_QUERIES:
        field, _, val = kw.partition(":")
        col = {"lang": "lang", "repo": "source"}[field]
        rows.append(
            f"SELECT {qid} AS qid, c.d AS doc_id FROM corpus c "
            f"JOIN tok t ON t.d = c.d "
            f"WHERE c.{col} = '{val}' AND t.term = '{term}' GROUP BY c.d")
    un = "\nUNION ALL\n".join(rows)
    # corpus CTE variant carrying lang/source
    return f"""WITH corpus AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         text, lang, source
  FROM documents
),
tok AS (
  SELECT d, unnest(string_split(text, ' ')) AS term FROM corpus
)
{un}"""


SYNONYM_SETS = [(1, ["key", "hash"], 10), (2, ["slow", "fast"], 10),
                (3, ["zzmissing", "vector"], 10)]
DISMAX_SETS = [(1, ["key", "agg", "row"], 10), (2, ["the", "vector"], 10)]
LEN_RANGES = [(1, 20, 40), (2, 60, 100), (3, 0, 10)]


def ft_synonym(sf_dir: str) -> pa.Table:
    """SynonymQuery → (qid, rank, doc_id)."""
    from ..search import search_synonym

    r = reader_for(sf_dir)
    qids, ranks, docs = [], [], []
    for qid, terms, k in SYNONYM_SETS:
        td = search_synonym(r, terms, k)
        for rank, d in enumerate(td.doc_ids.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_synonym_sql() -> str:
    parts = []
    for qid, terms, k in SYNONYM_SETS:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  WITH syn AS (
    SELECT d, sum(tf) AS freq FROM tf WHERE term IN ({tl}) GROUP BY d
  ),
  st AS (SELECT count(*) AS df FROM syn)
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY
           CAST(CAST(ln(1 + ((SELECT n_docs FROM stats) - (SELECT df FROM st) + 0.5)
                         / ((SELECT df FROM st) + 0.5)) AS REAL)
           - CAST(ln(1 + ((SELECT n_docs FROM stats) - (SELECT df FROM st) + 0.5)
                         / ((SELECT df FROM st) + 0.5)) AS REAL)
             / (CAST(1.0 AS REAL) + CAST(s.freq AS REAL) *
                (CAST(1.0 AS REAL) / (CAST(1.2 AS REAL) *
                 (CAST(0.25 AS REAL) + CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
                  CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                       (SELECT n_docs FROM stats) AS REAL)))))
           AS REAL) DESC, s.d ASC) AS rank,
         s.d AS doc_id
  FROM syn s JOIN quant q ON q.d = s.d
  ORDER BY rank LIMIT {k})""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# (qid, groups, k): each group = list of alternatives; an alternative is
# a token tuple (len 1 = TermQuery, len > 1 = exact PhraseQuery side path)
SYN_GRAPH = [
    (1, [[("query",), ("table", "scan")], [("merge",)]], 10),
    (2, [[("spark",)], [("window",), ("batch", "stream")]], 10),
    (3, [[("customer",), ("data", "row", "value")]], 10),
]


def ft_synonym_graph(sf_dir: str) -> pa.Table:
    """Multi-word query-time synonyms (SynonymGraphFilter.java:66 +
    QueryBuilder.analyzeGraphBoolean, util/QueryBuilder.java:682): each
    position-group is a SHOULD of term/phrase alternatives; group scores
    sum per doc."""
    from ..search import search_synonym_graph

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, groups, k in SYN_GRAPH:
        td = search_synonym_graph(r, [[list(a) for a in g]
                                      for g in groups], k)
        for rank, (d, s) in enumerate(
                zip(td.doc_ids.tolist(), td.scores.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(np.array(scores, np.float32),
                                       pa.float32())})


def oracle_synonym_graph_sql() -> str:
    def R(x: str) -> str:            # one float32-rounded step
        return f"CAST({x} AS REAL)"

    avgdl = R("CAST((SELECT sum_ttf FROM stats) AS DOUBLE) / "
              "(SELECT n_docs FROM stats)")
    num = R(f"{R('0.75')} * {R('q.qlen')}")
    inner = R(f"{R('0.25')} + {R(f'{num} / {avgdl}')}")
    k1_inner = R(f"{R('1.2')} * {inner}")
    ni = f"({R('1.0')} / {k1_inner})"

    def idf(df_expr: str) -> str:
        return (f"CAST(ln(1 + ((SELECT n_docs FROM stats) - {df_expr} "
                f"+ 0.5) / ({df_expr} + 0.5)) AS REAL)")

    def bm25_score(w: str, tf_expr: str) -> str:
        denom = R(f"{R('1.0')} + {R(f'{R(tf_expr)} * {ni}')}")
        return R(f"{w} - {R(f'{w} / {denom}')}")

    clause_sqls = []
    for qid, groups, _k in SYN_GRAPH:
        for group in groups:
            for alt in group:
                if len(alt) == 1:
                    w = idf("f.df")
                    clause_sqls.append(
                        f"SELECT {qid} AS qid, t.d AS d, "
                        f"{bm25_score(w, 't.tf')} AS s\n"
                        f"FROM tf t JOIN df f ON f.term = t.term "
                        f"JOIN quant q ON q.d = t.d "
                        f"WHERE t.term = '{alt[0]}'")
                else:
                    joins = ["w w0"]
                    conds = [f"w0.word = '{alt[0]}'"]
                    for i in range(1, len(alt)):
                        joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                                     f"AND w{i}.pos = w0.pos + {i}")
                        conds.append(f"w{i}.word = '{alt[i]}'")
                    ph = (f"SELECT w0.d, count(*) AS freq FROM "
                          f"{' '.join(joins)} WHERE "
                          f"{' AND '.join(conds)} GROUP BY w0.d")
                    # scorer_multi: double sum of per-term float32 idfs,
                    # one float32 cast (bm25.py:97-120)
                    parts = " + ".join(
                        f"CAST((SELECT {idf('df')} FROM df "
                        f"WHERE term = '{t}') AS DOUBLE)" for t in alt)
                    w = f"CAST({parts} AS REAL)"
                    clause_sqls.append(
                        f"SELECT {qid} AS qid, p.d AS d, "
                        f"{bm25_score(w, 'p.freq')} AS s\n"
                        f"FROM ({ph}) p JOIN quant q ON q.d = p.d")
    un = "\nUNION ALL\n".join(clause_sqls)
    ks = ", ".join(f"({qid}, {k})" for qid, _g, k in SYN_GRAPH)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
),
clauses AS (
{un}
),
ks(qid, k) AS (VALUES {ks}),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM clauses GROUP BY qid, d
),
ranked AS (
  SELECT qid, d AS doc_id, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT r.qid, r.rank, r.doc_id, r.score
FROM ranked r JOIN ks ON ks.qid = r.qid WHERE r.rank <= ks.k"""


def ft_dismax(sf_dir: str) -> pa.Table:
    """DisjunctionMaxQuery (tie_breaker=0) → (qid, rank, doc_id)."""
    from ..search import search_dismax

    r = reader_for(sf_dir)
    qids, ranks, docs = [], [], []
    for qid, terms, k in DISMAX_SETS:
        td = search_dismax(r, terms, k)
        for rank, d in enumerate(td.doc_ids.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_dismax_sql() -> str:
    score = """CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) / (CAST(1.2 AS REAL) *
            (CAST(0.25 AS REAL) + CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
             CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                  (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL)"""
    parts = []
    for qid, terms, k in DISMAX_SETS:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY mx DESC, d ASC) AS rank, d AS doc_id
  FROM (
    SELECT t.d AS d, CAST(max(CAST({score} AS DOUBLE)) AS REAL) AS mx
    FROM tf t JOIN df f ON f.term = t.term JOIN quant q ON q.d = t.d
    WHERE t.term IN ({tl}) GROUP BY t.d
  )
  ORDER BY rank LIMIT {k})""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


FEATURE_QUERIES = [(1, "key"), (2, "vector"), (3, "zzmissing")]
_FEATURE_BOOST, _FEATURE_PIVOT = 1.5, 64.0


def ft_feature_rank(sf_dir: str) -> pa.Table:
    """FeatureField + FeatureQuery (document/FeatureField.java:107): a
    static-rank feature freq-encoded into the index
    (floatToIntBits >>> 15), combined with a BM25 term clause as a
    Boolean SHOULD — score = bm25(term) + saturation(feature) with
    SaturationFunction's float32 ``boost * v / (v + pivot)``. The
    zzmissing query ranks purely by static rank (the feature clause
    matches every doc)."""
    from ..features import build_feature_index, feature_scores
    from ..search import _accumulate, _topk, search_terms_scored

    idx = index_dir_for(sf_dir)
    build_feature_index(idx, "rank")
    fd, fs = feature_scores(idx, "rank", "saturation",
                            boost=_FEATURE_BOOST, pivot=_FEATURE_PIVOT)
    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, term in FEATURE_QUERIES:
        td = search_terms_scored(r, [term], max(1, r.doc_count))
        cd = np.concatenate([td.doc_ids, fd])
        cs = np.concatenate([td.scores, fs])
        cc = np.concatenate([np.zeros(len(td.doc_ids), np.int32),
                             np.ones(len(fd), np.int32)])
        uniq, total = _accumulate(cd, cc, cs)
        d, s = _topk(uniq, total, 10)
        for rank, (di, si) in enumerate(zip(d.tolist(), s.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(di)
            scores.append(si)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_feature_rank_sql() -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in FEATURE_QUERIES)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
fq(qid, term) AS (VALUES {vals}),
termsc AS (
  SELECT c.qid, t.d, {_SCORE_EXPR} AS s
  FROM fq c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
feat AS (
  SELECT d, CAST(
    (CAST({_FEATURE_BOOST} AS REAL) * CAST(v AS REAL)) /
    (CAST(v AS REAL) + CAST({_FEATURE_PIVOT} AS REAL)) AS REAL) AS s
  FROM (SELECT d, (len % 255) + 1 AS v FROM dl)
),
clauses AS (
  SELECT qid, d, s FROM termsc
  UNION ALL
  SELECT c.qid, f.d, f.s FROM (SELECT DISTINCT qid FROM fq) c
  CROSS JOIN feat f
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM clauses GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= 10"""


# (qid, first-pass terms, rescore terms, first-pass N, weight)
RESCORE_QUERIES = [(1, ["key", "agg"], ["table"], 40, 2.0),
                   (2, ["vector"], ["the", "data"], 30, 0.5)]


def ft_rescore(sf_dir: str) -> pa.Table:
    """QueryRescorer (search/QueryRescorer.java:39): take the first-pass
    top-N of query A, re-run query B over just those docs and combine
    ``score = firstPass + weight * secondPass`` in float32 when B
    matches, then re-rank → (qid, rank, doc_id, score) top-10."""
    from ..search import search_terms_scored

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, ta, tb, n, w in RESCORE_QUERIES:
        first = search_terms_scored(r, ta, n)
        second = search_terms_scored(r, tb, max(1, r.doc_count))
        smap = dict(zip(second.doc_ids.tolist(), second.scores.tolist()))
        w32 = np.float32(w)
        comb = np.array([
            np.float32(s) + w32 * np.float32(smap[d])
            if d in smap else np.float32(s)
            for d, s in zip(first.doc_ids.tolist(), first.scores.tolist())],
            dtype=np.float32)
        order = np.lexsort((first.doc_ids, -comb.astype(np.float64)))[:10]
        for rank, i in enumerate(order.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(first.doc_ids[i]))
            scores.append(float(comb[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_rescore_sql() -> str:
    parts = []
    for qid, ta, tb, n, w in RESCORE_QUERIES:
        tla = ", ".join(f"'{t}'" for t in ta)
        tlb = ", ".join(f"'{t}'" for t in tb)
        parts.append(f"""(
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY score DESC, d ASC) AS rank,
         d AS doc_id, score
  FROM (
    SELECT fp.d,
           CASE WHEN sp.score IS NULL THEN fp.score
                ELSE CAST(fp.score +
                     CAST(CAST({w} AS REAL) * sp.score AS REAL) AS REAL)
           END AS score
    FROM (
      SELECT d, score, row_number() OVER (
               ORDER BY score DESC, d ASC) AS r
      FROM (
        SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
        FROM (
          SELECT t.d, {_SCORE_EXPR} AS s
          FROM tf t JOIN df f ON f.term = t.term
          JOIN quant q ON q.d = t.d
          WHERE t.term IN ({tla})
        ) GROUP BY d
      )
    ) fp
    LEFT JOIN (
      SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
      FROM (
        SELECT t.d, {_SCORE_EXPR} AS s
        FROM tf t JOIN df f ON f.term = t.term
        JOIN quant q ON q.d = t.d
        WHERE t.term IN ({tlb})
      ) GROUP BY d
    ) sp ON sp.d = fp.d
    WHERE fp.r <= {n}
  )
  ORDER BY rank LIMIT 10)""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# (qid, wrapped-query terms, scoring expression over score + len docvalue)
EXPR_QUERIES = [
    (1, ["value", "data"], "score + 0.25 * log(1 + len)"),
    (2, ["table", "key"], "2 * score + sqrt(len) / (1 + min(score, 1.5))"),
    (3, ["vector"], "max(score, 0.5) * (1 + abs(score - 0.4))"),
]


def _dense_field_len(idx: str, dtype=np.int64) -> np.ndarray:
    """field_len docvalue as a dense docID-indexed array (one pruned
    docmeta read; shared by the expression scorer and the infix
    suggester)."""
    import pyarrow.parquet as pq_

    dmdir = os.path.join(idx, "docmeta")
    dm = pa.concat_tables([
        pq_.read_table(os.path.join(dmdir, f),
                       columns=["doc_id", "field_len"])
        for f in sorted(os.listdir(dmdir)) if f.endswith(".parquet")])
    did = dm.column("doc_id").to_numpy()
    out = np.zeros(int(did.max()) + 1 if len(did) else 1, dtype)
    out[did] = dm.column("field_len").to_numpy().astype(dtype)
    return out


def ft_expr_score(sf_dir: str) -> pa.Table:
    """FunctionScoreQuery with a compiled arithmetic expression
    (queries/src/java/org/apache/lucene/queries/function/
    FunctionScoreQuery.java:44 wrapping expressions/Expression.java:68,
    JavascriptCompiler.java:120): every match of the wrapped query is
    re-scored with expr(score, len) where ``len`` is the doc-length
    numeric docvalue; top-10 by expression value.  Float parity: every
    AST node rounds a double-computed result to float32 and the oracle
    SQL is GENERATED from the same AST (``lucene_ray/expressions.py``),
    so engine and oracle cannot drift."""
    from ..expressions import compile_expr
    from ..search import search_terms_scored

    idx = index_dir_for(sf_dir)
    r = reader_for(sf_dir)
    lens = _dense_field_len(idx, np.float32)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, src in EXPR_QUERIES:
        ex = compile_expr(src)
        td = search_terms_scored(r, terms, max(1, r.doc_count))
        vals = ex.eval({"score": td.scores, "len": lens[td.doc_ids]})
        order = np.lexsort((td.doc_ids, -vals.astype(np.float64)))[:10]
        for rank, i in enumerate(order.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(td.doc_ids[i]))
            scores.append(float(vals[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_expr_score_sql() -> str:
    from ..expressions import compile_expr

    parts = []
    for qid, terms, src in EXPR_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        es = compile_expr(src).sql({"score": "fp.score",
                                    "len": "CAST(dl.len AS REAL)"})
        parts.append(f"""(
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM (
    SELECT fp.d AS doc_id, {es} AS score
    FROM (
      SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
      FROM (
        SELECT t.d, {_SCORE_EXPR} AS s
        FROM tf t JOIN df f ON f.term = t.term
        JOIN quant q ON q.d = t.d
        WHERE t.term IN ({tl})
      ) GROUP BY d
    ) fp JOIN dl ON dl.d = fp.d
  )
  ORDER BY rank LIMIT 10)""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# Index-time token graphs: single-token synonym rules stacked at index
# time (posIncr=0). "slow" also occurs naturally → exercises the
# natural+stacked postings merge; "quick"/"large" are pure stacked terms.
SYN_INDEX_RULES = {"fast": ["quick", "slow"], "big": ["large"]}
_SYN_IDX_CACHE: dict[str, str] = {}


def syn_index_dir_for(sf_dir: str) -> str:
    return _cached_index(
        sf_dir, "synidx-v1", _SYN_IDX_CACHE,
        lambda sf, idx: build_index(corpus_from_documents(sf), idx,
                                    with_positions=True,
                                    index_synonyms=SYN_INDEX_RULES))


def ft_index_synonyms(sf_dir: str) -> pa.Table:
    """Index-time token graphs + overlap-aware norms
    (analysis/synonym/SynonymGraphFilter.java:78,
    index/FieldInvertState.java:40, Similarity.java:152-163): synonyms
    are stacked as posIncr=0 tokens at build time, norms quantize the
    DISCOUNTED length (length - numOverlap) while sumTotalTermFreq keeps
    counting stacked tokens.  qid 1: BM25 top-10 for "quick" (a term
    that ONLY exists via stacking); qid 2: top-10 for "slow"
    (natural + stacked postings merged, tf added); qid 3: exact phrase
    "quick scan" — phrase matching across a stacked position
    (TestSynonymGraphFilter's index-time behavior)."""
    from ..search import phrase_freqs, search_terms_scored

    r = IndexReader(syn_index_dir_for(sf_dir))
    rows = {"qid": [], "rank": [], "doc_id": [], "score": []}
    for qid, term in ((1, "quick"), (2, "slow")):
        td = search_terms_scored(r, [term], 10)
        for rank, (d, s) in enumerate(zip(td.doc_ids.tolist(),
                                          td.scores.tolist()), 1):
            rows["qid"].append(qid)
            rows["rank"].append(rank)
            rows["doc_id"].append(d)
            rows["score"].append(s)
    for rank, (doc, f) in enumerate(
            sorted(phrase_freqs(r, ["quick", "scan"]).items()), 1):
        rows["qid"].append(3)
        rows["rank"].append(rank)
        rows["doc_id"].append(doc)
        rows["score"].append(float(np.float32(f)))
    return pa.table({"qid": pa.array(rows["qid"], pa.int64()),
                     "rank": pa.array(rows["rank"], pa.int32()),
                     "doc_id": pa.array(rows["doc_id"], pa.int64()),
                     "score": pa.array(rows["score"], pa.float32())})


def oracle_index_synonyms_sql() -> str:
    stacked = []
    for src, reps in SYN_INDEX_RULES.items():
        for s in reps:
            stacked.append(f"SELECT d, '{s}' AS term, tf FROM tf "
                           f"WHERE term = '{src}'")
    st = "\n    UNION ALL ".join(stacked)
    extra = " + ".join(
        f"(SELECT COALESCE(CAST(sum(tf) AS BIGINT), 0) FROM tf "
        f"WHERE term = '{src}') * {len(reps)}"
        for src, reps in SYN_INDEX_RULES.items())
    # collection stats COUNT stacked tokens; norms (quant over dl.len,
    # the pre-stacking length) stay discounted — exactly the engine's
    # length-minus-numOverlap norm
    score = _SCORE_EXPR.replace("(SELECT sum_ttf FROM stats)",
                                "(SELECT sum_ttf FROM stats2)")
    parts = []
    for qid, term in ((1, "quick"), (2, "slow")):
        parts.append(f"""(
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY score DESC, d ASC) AS rank,
         d AS doc_id, score
  FROM (
    SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
    FROM (
      SELECT t.d, {score} AS s
      FROM tf2 t JOIN df2 f ON f.term = t.term
      JOIN quant q ON q.d = t.d
      WHERE t.term = '{term}'
    ) GROUP BY d
  )
  ORDER BY rank LIMIT 10)""")
    parts.append("""(
  SELECT 3 AS qid,
         row_number() OVER (ORDER BY doc_id ASC) AS rank,
         doc_id, CAST(freq AS REAL) AS score
  FROM (
    SELECT w0.d AS doc_id, count(*) AS freq
    FROM w w0 JOIN w w1 ON w1.d = w0.d AND w1.pos = w0.pos + 1
    WHERE w0.word = 'fast' AND w1.word = 'scan'
    GROUP BY w0.d))""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
tf2 AS (
  SELECT d, term, CAST(sum(tf) AS BIGINT) AS tf FROM (
    SELECT d, term, tf FROM tf
    UNION ALL {st}
  ) GROUP BY d, term
),
df2 AS (
  SELECT term, count(*) AS df FROM tf2 GROUP BY term
),
stats2 AS (
  SELECT (SELECT sum_ttf FROM stats) + {extra} AS sum_ttf
),
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


FUZZY_SUGGEST_QUERIES = [("ke", 5), ("vql", 5), ("tabe", 5), ("zz", 5),
                         ("vlue", 5), ("tble", 5), ("qury", 5)]
_MIN_FUZZY_LENGTH = 3   # FuzzySuggester.DEFAULT_MIN_FUZZY_LENGTH


def ft_suggest_fuzzy(sf_dir: str) -> pa.Table:
    """FuzzySuggester (suggest/analyzing/FuzzySuggester.java:60 role):
    completions whose PREFIX is within edit distance 1 of the typed
    input, ranked by weight (df desc, term asc). The Levenshtein
    automaton ∩ FST walk becomes a vectorized dictionary scan: the
    accepted-prefix set for d=1 decomposes into concrete deletion
    prefixes (starts_with) plus one-wildcard substitution / insertion
    patterns (anchored RE2 kernels) — same Arrow scan shape as the
    wildcard rewrite. Inputs shorter than DEFAULT_MIN_FUZZY_LENGTH=3
    match their prefix exactly (the suggester's guard against a 1-edit
    2-char prefix matching half the dictionary); transpositions count as
    two edits (the transpositions=false suggester option), matching the
    classic-Levenshtein oracle."""
    import re as _re

    import pyarrow.compute as pc

    from ..search import termdict_terms

    r = reader_for(sf_dir)
    t = _content_only(r, termdict_terms(r))
    terms = t.column("term")
    out = []
    for p, k in FUZZY_SUGGEST_QUERIES:
        L = len(p)
        mask = pc.starts_with(terms, p)
        if L >= _MIN_FUZZY_LENGTH:
            for i in range(L):                  # deletion: |prefix| = L-1
                mask = pc.or_(mask,
                              pc.starts_with(terms, p[:i] + p[i + 1:]))
            pats = []
            for i in range(L):                  # substitution: |prefix| = L
                pats.append("^" + _re.escape(p[:i]) + "."
                            + _re.escape(p[i + 1:]))
            for i in range(L + 1):              # insertion: |prefix| = L+1
                pats.append("^" + _re.escape(p[:i]) + "." + _re.escape(p[i:]))
            for pat in pats:
                mask = pc.or_(mask, pc.match_substring_regex(terms, pat))
        sub = t.filter(mask)
        df = sub.column("df").to_numpy()
        tm = sub.column("term").to_numpy(zero_copy_only=False)
        sel = np.lexsort((tm, -df))[:k]
        out.append(pa.table({
            "prefix": pa.array([p] * len(sel), pa.string()),
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "term": pa.array(tm[sel], pa.string()),
            "df": pa.array(df[sel].astype(np.int64)),
        }))
    return pa.concat_tables(out)


def oracle_suggest_fuzzy_sql() -> str:
    rows = []
    for p, k in FUZZY_SUGGEST_QUERIES:
        L = len(p)
        if L >= _MIN_FUZZY_LENGTH:
            pred = f"""least(
      levenshtein(substr(term, 1, {L - 1}), '{p}'),
      levenshtein(substr(term, 1, {L}), '{p}'),
      levenshtein(substr(term, 1, {L + 1}), '{p}')) <= 1"""
        else:
            pred = f"term LIKE '{p}%'"
        rows.append(f"""SELECT prefix, rank, term, df FROM (
  SELECT '{p}' AS prefix,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rank,
         term, df
  FROM df WHERE {pred}
  ) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


INFIX_SUGGEST_QUERIES = [("va", 5), ("sc", 5), ("zz", 3), ("jo", 5)]


def ft_suggest_infix(sf_dir: str) -> pa.Table:
    """Infix suggester (suggest/src/java/org/apache/lucene/search/suggest/
    analyzing/AnalyzingInfixSuggester.java:97): each document is a
    suggestion with a static weight (its field length docvalue); a
    lookup matches the query as a PREFIX of any token ANYWHERE in the
    suggestion (the infix semantic — AnalyzingSuggester only completes
    from the start), top-k by (weight desc, doc asc). Uses the prefix
    termdict scan + the union of the matched terms' postings — the same
    index structures the reference's suggester builds its own Lucene
    index from."""
    from ..search import _term_docset

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    wt = _dense_field_len(idx)
    out = []
    for p, k in INFIX_SUGGEST_QUERIES:
        terms = _content_only(r, termdict_scan(r, prefix=p)) \
            .column("term").to_pylist()
        docs = (np.unique(np.concatenate(
            [_term_docset(r, t) for t in terms]))
            if terms else np.empty(0, np.int64))
        sel = np.lexsort((docs, -wt[docs]))[:k]
        d = docs[sel]
        out.append(pa.table({
            "prefix": pa.array([p] * len(d), pa.string()),
            "rank": pa.array(np.arange(1, len(d) + 1, dtype=np.int64)),
            "doc_id": pa.array(d, pa.int64()),
            "weight": pa.array(wt[d], pa.int64()),
        }))
    return pa.concat_tables(out)


def oracle_suggest_infix_sql() -> str:
    rows = []
    for p, k in INFIX_SUGGEST_QUERIES:
        rows.append(f"""SELECT prefix, rank, doc_id, weight FROM (
  SELECT '{p}' AS prefix,
         row_number() OVER (ORDER BY weight DESC, doc_id ASC) AS rank,
         doc_id, weight
  FROM (
    SELECT t.d AS doc_id, dl.len AS weight
    FROM (SELECT DISTINCT d FROM tok WHERE term LIKE '{p}%') t
    JOIN dl ON dl.d = t.d)
  ) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# (qid, SHOULD terms, minimumNumberShouldMatch, k)
MSM_QUERIES = [(1, ["key", "agg", "slow", "fast"], 2, 10),
               (2, ["table", "value", "part", "hash", "join"], 3, 10),
               (3, ["the", "zzmissing", "vector"], 2, 10),
               (4, ["spark", "spark", "window"], 2, 10),   # duplicate clause
               (5, ["scan", "merge", "sort", "query"], 4, 10)]


def ft_min_should_match(sf_dir: str) -> pa.Table:
    """BooleanQuery.setMinimumNumberShouldMatch
    (search/BooleanQuery.java:104, pruned in Lucene by WANDScorer.java:57):
    docs matching >= m of the SHOULD clauses, scored as the full
    disjunction sum → (qid, rank, doc_id, score) float32 top-k."""
    from ..search import search_min_should_match

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, m, k in MSM_QUERIES:
        td = search_min_should_match(r, terms, m, k)
        for rank, (d, s) in enumerate(
                zip(td.doc_ids.tolist(), td.scores.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_min_should_match_sql() -> str:
    rows = []
    for qid, terms, m, k in MSM_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', {m}, {k})")
    vals = ",\n    ".join(rows)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, m, k) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, c.m, c.k, t.d, {_SCORE_EXPR} AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, m, k, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score,
         count(*) AS nm
  FROM scored GROUP BY qid, m, k, d
),
ranked AS (
  SELECT qid, d, score, k, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals WHERE nm >= m
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= k"""


# ---------------------------------------------------------------------------
# CoveringQuery (per-document minimumNumberMatch)

COVERING_QUERIES = [(1, ["key", "agg", "slow", "fast"], 10),
                    (2, ["table", "value", "part", "hash", "join"], 10),
                    (3, ["scan", "merge", "sort", "query"], 10),
                    (4, ["the", "zzmissing", "vector"], 10)]
_COVERING_MOD, _COVERING_SUB = 4, 1


def ft_covering(sf_dir: str) -> pa.Table:
    """CoveringQuery (sandbox/search/CoveringQuery.java:51): SHOULD
    clauses with a PER-DOC required match count read from a numeric
    docvalue — here ``max(1, (field_len % 4) - 1)`` ∈ {1, 2}, so the
    same doc set needs different clause coverage depending on its own
    length. Score = sum of matching clause scores
    (CoveringScorer.java:208) → (qid, rank, doc_id, score) float32."""
    from ..search import search_covering

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, k in COVERING_QUERIES:
        td = search_covering(r, terms, k, mod=_COVERING_MOD,
                             sub=_COVERING_SUB)
        for rank, (d, s) in enumerate(
                zip(td.doc_ids.tolist(), td.scores.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_covering_sql() -> str:
    rows = []
    for qid, terms, k in COVERING_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', {k})")
    vals = ",\n    ".join(rows)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, k) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, c.k, t.d, q.len, {_SCORE_EXPR} AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score,
         count(*) AS nm, min(len) AS len
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, score, k, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
  WHERE nm >= greatest(1, (len % {_COVERING_MOD}) - {_COVERING_SUB})
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= k"""


# (qid, child-query terms, ScoreMode, k parents)
BLOCKJOIN_QUERIES = [(1, ["key", "agg"], "max", 5),
                     (2, ["vector"], "total", 5),
                     (3, ["slow", "fast"], "avg", 5),
                     (4, ["zzmissing"], "max", 5),
                     (5, ["table", "value", "part"], "total", 8)]


def ft_blockjoin_parent(sf_dir: str) -> pa.Table:
    """Index-time block join (join/ToParentBlockJoinQuery.java:68): the
    index orders docIDs by (repo, path), so each repo's files form one
    contiguous parent block; a child content query joins up to the repo
    parent with ScoreMode Max/Total/Avg child-score aggregation →
    (qid, rank, parent, score, n_children)."""
    from ..search import search_blockjoin_parent

    r = reader_for(sf_dir)
    out = []
    for qid, terms, mode, k in BLOCKJOIN_QUERIES:
        t = search_blockjoin_parent(r, terms, mode, k)
        n = t.num_rows
        out.append(pa.table({
            "qid": pa.array([qid] * n, pa.int64()),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            "parent": t.column("parent"),
            "score": t.column("score"),
            "n_children": t.column("n_children"),
        }))
    return pa.concat_tables(out)


def oracle_blockjoin_parent_sql() -> str:
    mode_expr = {
        "max": "max(cs)",
        "total": "CAST(sum(CAST(cs AS DOUBLE)) AS REAL)",
        "avg": "CAST(sum(CAST(cs AS DOUBLE)) / count(*) AS REAL)",
    }
    parts = []
    for qid, terms, mode, k in BLOCKJOIN_QUERIES:
        cl = "\n      UNION ALL ".join(
            f"SELECT {ci} AS clause, '{t}' AS term"
            for ci, t in enumerate(terms))
        parts.append(f"""(
  SELECT {qid} AS qid,
         row_number() OVER (ORDER BY score DESC, parent ASC) AS rank,
         parent, score, n_children
  FROM (
    SELECT p.source AS parent, {mode_expr[mode]} AS score,
           count(*) AS n_children
    FROM (
      SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS cs
      FROM (
        SELECT t.d AS d, {_SCORE_EXPR} AS s
        FROM (
          {cl}
        ) c
        JOIN tf t ON t.term = c.term
        JOIN df f ON f.term = c.term
        JOIN quant q ON q.d = t.d
      )
      GROUP BY d
    ) child
    JOIN par p ON p.d = child.d
    GROUP BY p.source
  )
  ORDER BY rank LIMIT {k})""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
par AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         source
  FROM documents
)
{un}"""


def ft_len_range(sf_dir: str) -> pa.Table:
    """PointRangeQuery (search/PointRangeQuery.java:54) over the numeric
    field_len docvalue, served by the BKD-role point index
    (lucene_ray.points): value-sorted parquet with file- and
    row-group-level range pruning — no full docmeta scan per range."""
    from ..points import ensure_numeric_index, numeric_range

    idx = index_dir_for(sf_dir)
    ensure_numeric_index(idx, "field_len")
    qids, docs = [], []
    for qid, lo, hi in LEN_RANGES:
        d, _metrics = numeric_range(idx, "field_len", lo, hi)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_len_range_sql() -> str:
    rows = []
    for qid, lo, hi in LEN_RANGES:
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM dl "
                    f"WHERE len >= {lo} AND len < {hi}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# (qid, origin, pivot, boost) over the field_len value
DIST_FEATURES = [(1, 40, 5, 1.0), (2, 70, 10, 2.0), (3, 0, 3, 1.0)]
_DIST_K = 25


def ft_distance_feature(sf_dir: str) -> pa.Table:
    """LongPoint.newDistanceFeatureQuery
    (document/LongDistanceFeatureQuery.java:40): top-k docs by
    float32(boost * pivot / (pivot + |field_len - origin|)), ties by
    doc_id — the recency/proximity boost primitive. Served by the point
    index's expanding-shell descent (lucene_ray.points
    distance_feature_topk): row groups far from the origin are pruned,
    never decoded."""
    from ..points import distance_feature_topk, ensure_numeric_index

    idx = index_dir_for(sf_dir)
    ensure_numeric_index(idx, "field_len")
    qids, ranks, docs, scores = [], [], [], []
    for qid, origin, pivot, boost in DIST_FEATURES:
        d, s, _metrics = distance_feature_topk(idx, "field_len", origin,
                                               pivot, _DIST_K, boost)
        qids.extend([qid] * len(d))
        ranks.extend(range(1, len(d) + 1))
        docs.extend(d.tolist())
        scores.extend(s.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(np.array(scores, np.float32),
                                       pa.float32())})


def oracle_distance_feature_sql() -> str:
    rows = []
    for qid, origin, pivot, boost in DIST_FEATURES:
        expr = (f"CAST({boost} * (CAST({pivot} AS DOUBLE) / "
                f"CAST({pivot} + abs(len - {origin}) AS DOUBLE)) AS REAL)")
        rows.append(f"""SELECT {qid} AS qid, rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY s DESC, d) AS rank,
         d AS doc_id, s AS score
  FROM (SELECT d, {expr} AS s FROM dl)
) WHERE rank <= {_DIST_K}""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# (qid, lat_lo, lat_hi, lon_lo, lon_hi) in micro-degrees, half-open
GEO_BOXES = [(1, 0, 20_000_000, -30_000_000, 10_000_000),
             (2, -90_000_000, -70_000_000, 100_000_000, 180_000_000),
             (3, 89_999_990, 90_000_000, -10, 10)]          # ~empty
# (qid, center_lat, center_lon, radius)
GEO_DISTANCES = [(1, 0, 0, 15_000_000),
                 (2, 45_000_000, 90_000_000, 8_000_000)]


def ft_geo_box(sf_dir: str) -> pa.Table:
    """LatLonPoint.newBoxQuery (document/LatLonPoint.java:193) over the
    2D banded point index (lucene_ray.geo): docIDs inside each box,
    found via band + row-group stat pruning, never a full scan."""
    from ..geo import build_geo_index, geo_box

    idx = index_dir_for(sf_dir)
    build_geo_index(idx)
    qids, docs = [], []
    for qid, a, b, c, d in GEO_BOXES:
        hits, _metrics = geo_box(idx, a, b, c, d)
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_geo_distance(sf_dir: str) -> pa.Table:
    """XYPoint.newDistanceQuery semantics (exact integer Euclidean on the
    synthesized grid; LatLonPoint.newDistanceQuery:231 is the same
    bounding-box-descend-then-verify with haversine): docIDs within
    radius of each center."""
    from ..geo import build_geo_index, geo_distance

    idx = index_dir_for(sf_dir)
    build_geo_index(idx)
    qids, docs = [], []
    for qid, la, lo, r in GEO_DISTANCES:
        hits, _metrics = geo_distance(idx, la, lo, r)
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


_GEO_CTE = """
geo AS (
  SELECT d, (d * 2654435761) % 180000000 - 90000000 AS lat,
         (d * 2246822519 + 123456789) % 360000000 - 180000000 AS lon
  FROM corpus
)"""

# ---------------------------------------------------------------------------
# CombinedFieldQuery / BM25F (sandbox/search/CombinedFieldQuery.java:67):
# body + synthetic title (first _TITLE_WORDS words) as parallel indexes.

_TITLE_WORDS = 5
CF_W_BODY, CF_W_TITLE = 1.0, 2.0     # integral weights: the Java float
# accumulation chains (freq sum, norm sum, weighted-long stats) are exact
# for them, so the SQL oracle can use plain integer arithmetic where the
# engine runs the general float chains (pytest covers fractional weights)
CF_QUERIES = [(1, "query merge"), (2, "spark window table"),
              (3, "customer data"), (4, "vector")]
_CF_K = 10

_TITLE_IDX_CACHE: dict[str, str] = {}


def title_index_dir_for(sf_dir: str) -> str:
    """Build (once) the parallel title-field index: content = first
    _TITLE_WORDS words of text, SAME dockeys as the body index (commit =
    sha of the FULL text) so docIDs align field-to-field."""
    import hashlib as _h

    import ray.data

    def build(sf: str, idx: str) -> None:
        doc = os.path.join(sf, "documents.parquet")
        ds = ray.data.read_parquet(
            doc, columns=["doc_id", "text", "lang", "source"])

        def to_corpus(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = batch.column("doc_id").to_pylist()
            commits = [_h.sha256(("" if t is None else t).encode())
                       .hexdigest()[:40] for t in texts]
            titles = [" ".join((t or "").split(" ")[:_TITLE_WORDS])
                      for t in texts]
            return pa.table({
                "repo": batch.column("source"),
                "path": pa.array([f"doc_{i:08d}.txt" for i in ids]),
                "commit": pa.array(commits),
                "lang": batch.column("lang"),
                "content": pa.array(titles, pa.string()),
            })

        build_index(ds.map_batches(to_corpus, batch_format="pyarrow"),
                    idx, with_positions=True)

    return _cached_index(sf_dir, "title-v2", _TITLE_IDX_CACHE, build)


def ft_combined_field(sf_dir: str) -> pa.Table:
    """BM25F top-k over (body w=1, title w=2) — CombinedFieldQuery
    semantics end-to-end: merged pseudo stats, float32 weighted-freq sum,
    MultiNormsLeafSimScorer's re-quantized combined norm, ONE synthetic
    clause per query."""
    from ..combined import combined_field_search

    rb = reader_for(sf_dir)
    rt = IndexReader(title_index_dir_for(sf_dir))
    qids, ranks, docs, scores = [], [], [], []
    for qid, q in CF_QUERIES:
        td = combined_field_search([(rb, CF_W_BODY), (rt, CF_W_TITLE)],
                                   q, k=_CF_K)
        for rank, (d, s) in enumerate(
                zip(td.doc_ids.tolist(), td.scores.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(np.array(scores, np.float32),
                                       pa.float32())})


def _quant_case(var: str) -> str:
    """SmallFloat.intToByte4 → byte4ToInt round-trip of an int expr."""
    return f"""CASE WHEN {var} < 24 THEN {var}
         ELSE 24 + (
           CASE WHEN ({var} - 24) < 8 THEN ({var} - 24)
                ELSE ((({var} - 24) >> (CAST(floor(log2({var} - 24)) AS INT) - 3)) & 7 | 8)
                     << (CAST(floor(log2({var} - 24)) AS INT) - 3)
           END)
    END"""


def oracle_combined_field_sql() -> str:
    wb, wt = int(CF_W_BODY), int(CF_W_TITLE)
    terms_rows = []
    for qid, q in CF_QUERIES:
        for t in q.split():
            terms_rows.append(f"({qid}, '{t}')")
    body = f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
qterms(qid, term) AS (VALUES {', '.join(terms_rows)}),
title AS (
  SELECT d, array_to_string(list_slice(string_split(text, ' '), 1,
                            {_TITLE_WORDS}), ' ') AS ttext
  FROM corpus
),
ttok AS (
  SELECT d, unnest(string_split(ttext, ' ')) AS term FROM title
),
ttf AS (
  SELECT d, term, count(*) AS tf FROM ttok GROUP BY d, term
),
tdl AS (
  SELECT t.d, count(k.term) AS len FROM title t
  LEFT JOIN ttok k ON k.d = t.d GROUP BY t.d
),
tquant AS (
  SELECT d, len, {_quant_case('len')} AS qlen FROM tdl
),
tdf AS (
  SELECT term, count(*) AS df FROM ttf GROUP BY term
),
-- pseudo stats: df = max over (field, term); avgdl from weighted sumTTF
pseudo AS (
  SELECT q.qid,
    max(greatest(coalesce(f.df, 0), coalesce(g.df, 0))) AS df
  FROM qterms q
  LEFT JOIN df f ON f.term = q.term
  LEFT JOIN tdf g ON g.term = q.term
  GROUP BY q.qid
),
consts AS (
  SELECT (SELECT n_docs FROM stats) AS n_docs,
         (SELECT sum_ttf FROM stats) * {wb}
           + (SELECT count(*) FROM ttok) * {wt} AS sum_ttf_pseudo
),
-- combined norm: w_b*qlen_b + w_t*qlen_t (exact ints), Math.round no-op,
-- re-quantized through intToByte4/byte4ToInt
norms AS (
  SELECT b.d, {_quant_case(f'(b.qlen * {wb} + t.qlen * {wt})')} AS rq
  FROM quant b JOIN tquant t USING (d)
),
-- combined freq per (qid, doc): w_b*Σtf_body + w_t*Σtf_title (exact ints)
fr AS (
  SELECT q.qid, x.d, CAST(sum(x.wtf) AS BIGINT) AS f
  FROM qterms q JOIN (
    SELECT term, d, tf * {wb} AS wtf FROM tf
    UNION ALL
    SELECT term, d, tf * {wt} AS wtf FROM ttf
  ) x ON x.term = q.term
  GROUP BY q.qid, x.d
),
idfw AS (
  SELECT qid, CAST(ln(1 + ((SELECT n_docs FROM stats) - df + 0.5)
                   / (df + 0.5)) AS REAL) AS w
  FROM pseudo WHERE df > 0
),
-- norm_inverse_cache ops, one float32 step per column (bm25.py:47-56)
s1 AS (
  SELECT fr.qid, fr.d, fr.f, n.rq,
         CAST(CAST(c.sum_ttf_pseudo AS DOUBLE) / c.n_docs AS REAL) AS avgdl
  FROM fr JOIN norms n ON n.d = fr.d CROSS JOIN consts c
),
s2 AS (
  SELECT qid, d, f,
    CAST(CAST(0.25 AS REAL) +
         CAST(CAST(CAST(0.75 AS REAL) * CAST(rq AS REAL) AS REAL)
              / avgdl AS REAL) AS REAL) AS inner_v
  FROM s1
),
s3 AS (
  SELECT qid, d, f,
    CAST(CAST(1.0 AS REAL) / CAST(CAST(1.2 AS REAL) * inner_v AS REAL)
         AS REAL) AS ni
  FROM s2
),
scored AS (
  SELECT s3.qid, s3.d,
    CAST(w.w - CAST(w.w / CAST(CAST(1.0 AS REAL) +
         CAST(CAST(s3.f AS REAL) * s3.ni AS REAL) AS REAL) AS REAL)
    AS REAL) AS score
  FROM s3 JOIN idfw w ON w.qid = s3.qid
),
ranked AS (
  SELECT qid, d AS doc_id, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM scored
)
SELECT qid, rank, doc_id, score FROM ranked WHERE rank <= {_CF_K}"""
    return body


# (qid, [(lat, lon), ...]) convex, CCW, micro-degrees
GEO_POLYGONS = [
    (1, [(-20_000_000, -40_000_000), (-20_000_000, 40_000_000),
         (30_000_000, 50_000_000), (45_000_000, 0),
         (30_000_000, -50_000_000)]),
    (2, [(60_000_000, 100_000_000), (55_000_000, 160_000_000),
         (85_000_000, 130_000_000)]),
]


def ft_geo_polygon(sf_dir: str) -> pa.Table:
    """LatLonPoint.newPolygonQuery (document/LatLonPoint.java:214) over
    the banded 2D point index: bbox descent + exact int64 half-plane
    containment verify (convex core of the Polygon2D edge tree)."""
    from ..geo import build_geo_index, geo_polygon

    idx = index_dir_for(sf_dir)
    build_geo_index(idx)
    qids, docs = [], []
    for qid, pts in GEO_POLYGONS:
        hits, _metrics = geo_polygon(idx, [p[0] for p in pts],
                                     [p[1] for p in pts])
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_geo_polygon_sql() -> str:
    rows = []
    for qid, pts in GEO_POLYGONS:
        n = len(pts)
        conds = []
        for i in range(n):
            (y1, x1), (y2, x2) = pts[i], pts[(i + 1) % n]
            conds.append(f"({x2} - {x1}) * (lat - {y1}) - "
                         f"({y2} - {y1}) * (lon - {x1}) >= 0")
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM geo "
                    f"WHERE {' AND '.join(conds)}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO_CTE}\n{un}"


def oracle_geo_box_sql() -> str:
    rows = []
    for qid, a, b, c, d in GEO_BOXES:
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM geo "
                    f"WHERE lat >= {a} AND lat < {b} "
                    f"AND lon >= {c} AND lon < {d}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO_CTE}\n{un}"


def oracle_geo_distance_sql() -> str:
    rows = []
    for qid, la, lo, r in GEO_DISTANCES:
        rows.append(
            f"SELECT {qid} AS qid, d AS doc_id FROM geo "
            f"WHERE (lat - {la}) * (lat - {la}) + "
            f"(lon - {lo}) * (lon - {lo}) <= {r * r}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO_CTE}\n{un}"


# ---------------------------------------------------------------------------
# 3D geodesic points (spatial3d/Geo3DPoint.java:44) — see lucene_ray.geo3d

_GEO3D_CTE = """
geo3d AS (
  SELECT d, (d * 2654435761) % 2097152 - 1048576 AS u,
         (d * 2246822519 + 123456789) % 2097152 - 1048576 AS v,
         (d * 3266489917 + 987654321) % 2097152 - 1048576 AS w
  FROM corpus
)"""

# (qid, center int vector, angular radius in radians)
GEO3D_CIRCLES = [(1, (800_000, 300_000, 500_000), 0.6),
                 (2, (-400_000, 900_000, -200_000), 0.35),
                 (3, (0, 0, 1_000_000), 0.25)]
# (qid, sin-lat band num lo, num hi, den, meridian normal 1, normal 2)
GEO3D_BBOXES = [(1, -300, 450, 1000, (0, 1, 0), (-1, 0, 0)),
                (2, -900, -100, 1000, (-3, 8, 0), (9, -2, 0))]
# (qid, CCW vertex int vectors)
GEO3D_POLYGONS = [
    (1, [(1_000_000, 0, 300_000), (0, 1_000_000, 300_000),
         (-300_000, -300_000, 1_000_000)]),
    (2, [(900_000, -400_000, -100_000), (800_000, 500_000, -100_000),
         (600_000, 400_000, 700_000), (700_000, -500_000, 700_000)]),
]
# (qid, endpoint a, endpoint b, angular width)
GEO3D_PATHS = [(1, (1_000_000, 100_000, 0), (0, 1_000_000, 200_000), 0.25),
               (2, (-800_000, -600_000, 400_000),
                (900_000, -200_000, -500_000), 0.15)]


def _g3d_collect(pairs) -> pa.Table:
    qids, docs = [], []
    for qid, hits in pairs:
        qids.extend([qid] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def ft_geo3d_distance(sf_dir: str) -> pa.Table:
    """Geo3DPoint.newDistanceQuery role (spatial3d/Geo3DPoint.java:44,
    geom/GeoStandardCircle.java): angular caps over the z-band-pruned
    3D point index; exact integer cap test (shared rational cos²r)."""
    from ..geo3d import build_geo3d_index, geo3d_distance

    idx = index_dir_for(sf_dir)
    build_geo3d_index(idx)
    return _g3d_collect(
        (qid, geo3d_distance(idx, *c, r)) for qid, c, r in GEO3D_CIRCLES)


def ft_geo3d_bbox(sf_dir: str) -> pa.Table:
    """GeoBBox role: sin-lat band ∧ meridian-plane wedge, both exact
    integer sidedness/squared compares."""
    from ..geo3d import build_geo3d_index, geo3d_bbox

    idx = index_dir_for(sf_dir)
    build_geo3d_index(idx)
    return _g3d_collect(
        (qid, geo3d_bbox(idx, s1, s2, den, m1, m2))
        for qid, s1, s2, den, m1, m2 in GEO3D_BBOXES)


def ft_geo3d_polygon(sf_dir: str) -> pa.Table:
    """GeoConvexPolygon role (geom/GeoConvexPolygon.java:63): integer
    cross-product edge planes, all-dots-nonnegative membership."""
    from ..geo3d import build_geo3d_index, geo3d_polygon

    idx = index_dir_for(sf_dir)
    build_geo3d_index(idx)
    return _g3d_collect(
        (qid, geo3d_polygon(idx, vs)) for qid, vs in GEO3D_POLYGONS)


def ft_geo3d_path(sf_dir: str) -> pa.Table:
    """GeoStandardPath role (geom/GeoStandardPath.java:66): slab within
    angular width of a great-circle segment, clipped by the endpoint
    planes, plus endpoint caps."""
    from ..geo3d import build_geo3d_index, geo3d_path

    idx = index_dir_for(sf_dir)
    build_geo3d_index(idx)
    return _g3d_collect(
        (qid, geo3d_path(idx, a, b, wd)) for qid, a, b, wd in GEO3D_PATHS)


def _g3d_cap_where(c, radians: float) -> str:
    from ..geo3d import B_SCALE, cos2_scaled
    cx, cy, cz = c
    a = cos2_scaled(radians)
    nc2 = cx * cx + cy * cy + cz * cz
    dot = f"(u*{cx} + v*{cy} + w*{cz})"
    return (f"({dot} >= 0 AND CAST({B_SCALE} AS HUGEINT)"
            f" * CAST({dot} AS HUGEINT) * CAST({dot} AS HUGEINT)"
            f" >= CAST({a} AS HUGEINT)"
            f" * CAST(u*u + v*v + w*w AS HUGEINT)"
            f" * CAST({nc2} AS HUGEINT))")


def _g3d_sin_ge_where(s_num: int, s_den: int) -> str:
    lhs = f"w*w*{s_den * s_den}"
    rhs = f"{s_num * s_num}*(u*u + v*v + w*w)"
    if s_num <= 0:
        return f"(w >= 0 OR {lhs} <= {rhs})"
    return f"(w >= 0 AND {lhs} >= {rhs})"


def oracle_geo3d_distance_sql() -> str:
    rows = [f"SELECT {qid} AS qid, d AS doc_id FROM geo3d "
            f"WHERE {_g3d_cap_where(c, r)}"
            for qid, c, r in GEO3D_CIRCLES]
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO3D_CTE}\n{un}"


def oracle_geo3d_bbox_sql() -> str:
    rows = []
    for qid, s1, s2, den, m1, m2 in GEO3D_BBOXES:
        rows.append(
            f"SELECT {qid} AS qid, d AS doc_id FROM geo3d "
            f"WHERE {_g3d_sin_ge_where(s1, den)} "
            f"AND NOT {_g3d_sin_ge_where(s2, den)} "
            f"AND u*{m1[0]} + v*{m1[1]} + w*{m1[2]} >= 0 "
            f"AND u*{m2[0]} + v*{m2[1]} + w*{m2[2]} <= 0")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO3D_CTE}\n{un}"


def oracle_geo3d_polygon_sql() -> str:
    rows = []
    for qid, vs in GEO3D_POLYGONS:
        conds = []
        for i in range(len(vs)):
            ax, ay, az = vs[i]
            bx, by, bz = vs[(i + 1) % len(vs)]
            nx, ny, nz = (ay * bz - az * by, az * bx - ax * bz,
                          ax * by - ay * bx)
            conds.append(f"u*({nx}) + v*({ny}) + w*({nz}) >= 0")
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM geo3d "
                    f"WHERE {' AND '.join(conds)}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO3D_CTE}\n{un}"


def oracle_geo3d_path_sql() -> str:
    from ..geo3d import B_SCALE, path_planes
    import math as _m
    rows = []
    for qid, va, vb, width in GEO3D_PATHS:
        n, c_a, c_b = path_planes(va, vb)
        s2_num = int(round(_m.sin(width) ** 2 * B_SCALE))
        nn2 = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
        dn = f"(u*({n[0]}) + v*({n[1]}) + w*({n[2]}))"
        slab = (f"(CAST({B_SCALE} AS HUGEINT)"
                f" * CAST({dn} AS HUGEINT) * CAST({dn} AS HUGEINT)"
                f" <= CAST({s2_num} AS HUGEINT)"
                f" * CAST(u*u + v*v + w*w AS HUGEINT)"
                f" * CAST({nn2} AS HUGEINT))")
        clips = " AND ".join(
            f"(CAST(u AS HUGEINT)*({c[0]}) + CAST(v AS HUGEINT)*({c[1]})"
            f" + CAST(w AS HUGEINT)*({c[2]})) >= 0"
            for c in (c_a, c_b))
        caps = " OR ".join(_g3d_cap_where(p, width) for p in (va, vb))
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM geo3d "
                    f"WHERE ({slab} AND {clips}) OR {caps}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_GEO3D_CTE}\n{un}"


# ---------------------------------------------------------------------------
# Indexed shapes (LatLonShape / ShapeField tessellated triangles)

# (qid, relation, lat_lo, lat_hi, lon_lo, lon_hi) — CLOSED boxes
SHAPE_BOXES = [
    (1, "intersects", 0, 30_000_000, -60_000_000, 20_000_000),
    (2, "within", -40_000_000, -10_000_000, 40_000_000, 90_000_000),
    # near-global box: the DISJOINT set is the handful of shapes tucked
    # entirely into the pole/dateline margins — bounded output
    (3, "disjoint", -89_000_000, 89_000_000, -179_000_000, 179_000_000),
    # tiny box, exercises band + row-group pruning (expected ~empty)
    (4, "intersects", 89_100_000, 89_200_000, 0, 100_000),
    # CONTAINS: a small box placed inside doc 0's quad (center
    # (-89 600 000, -56 143 211), radii 30 000 — pure arithmetic from
    # the synth formulas, so the constants are corpus-independent)
    (5, "contains", -89_602_000, -89_598_000, -56_145_211, -56_141_211),
]


def ft_shape_box(sf_dir: str) -> pa.Table:
    """LatLonShape.newBoxQuery (document/LatLonShape.java:79,
    LatLonShapeBoundingBoxQuery with QueryRelation INTERSECTS / WITHIN /
    DISJOINT) over the tessellated-triangle index
    (:mod:`lucene_ray.shapes`): each doc carries a deterministic convex
    quad, fan-tessellated (geo/Tessellator.java:75) into two CCW
    triangles indexed by their bounding boxes; box queries prune on the
    bbox stats and verify with the exact integer separating-axis test."""
    from ..shapes import build_shape_index, shape_box

    idx = index_dir_for(sf_dir)
    build_shape_index(idx)
    qids, rels, docs = [], [], []
    for qid, rel, a, b, c, d in SHAPE_BOXES:
        hits, _metrics = shape_box(idx, a, b, c, d, relation=rel)
        qids.extend([qid] * len(hits))
        rels.extend([rel] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "relation": pa.array(rels, pa.string()),
                     "doc_id": pa.array(docs, pa.int64())})


_SHAPE_CTE = """
shp AS (
  SELECT d,
         (d * 2654435761) % 179200000 - 89600000 AS cy,
         (d * 2246822519 + 123456789) % 359200000 - 179600000 AS cx,
         30000 + (d * 37) % 270000 AS ry,
         30000 + (d * 53) % 270000 AS rx
  FROM corpus
),
verts AS (
  SELECT d, 0 AS i, cy - ry AS y, cx AS x FROM shp
  UNION ALL SELECT d, 1, cy, cx + rx FROM shp
  UNION ALL SELECT d, 2, cy + ry, cx FROM shp
  UNION ALL SELECT d, 3, cy, cx - rx FROM shp
),
edges AS (
  SELECT a.d, a.y AS py, a.x AS px, b.y AS qy, b.x AS qx
  FROM verts a JOIN verts b ON b.d = a.d AND b.i = (a.i + 1) % 4
)"""


def _shape_intersects_where(a: int, b: int, c: int, d: int) -> str:
    """Separating-axis test for the convex quad vs the closed box
    [a,b]x[c,d]: bbox overlap (the box's own axes) AND no quad edge has
    all four box corners strictly outside — exactly the engine's
    per-triangle test lifted to the quad (union of the fan triangles ==
    the quad, so the doc-level results coincide)."""
    corners = ((a, c), (a, d), (b, d), (b, c))
    crosses = ", ".join(
        f"(e.qx - e.px) * ({gy} - e.py) - (e.qy - e.py) * ({gx} - e.px)"
        for gy, gx in corners)
    return (f"s.cy + s.ry >= {a} AND s.cy - s.ry <= {b} "
            f"AND s.cx + s.rx >= {c} AND s.cx - s.rx <= {d} "
            f"AND NOT EXISTS (SELECT 1 FROM edges e WHERE e.d = s.d "
            f"AND greatest({crosses}) < 0)")


def oracle_shape_box_sql() -> str:
    rows = []
    for qid, rel, a, b, c, d in SHAPE_BOXES:
        if rel == "within":
            rows.append(
                f"SELECT {qid} AS qid, 'within' AS relation, d AS doc_id "
                f"FROM verts GROUP BY d "
                f"HAVING bool_and(y >= {a} AND y <= {b} "
                f"AND x >= {c} AND x <= {d})")
        elif rel == "intersects":
            rows.append(
                f"SELECT {qid} AS qid, 'intersects' AS relation, "
                f"s.d AS doc_id FROM shp s "
                f"WHERE {_shape_intersects_where(a, b, c, d)}")
        elif rel == "contains":
            corners = ((a, c), (a, d), (b, d), (b, c))
            crosses = ", ".join(
                f"(e.qx - e.px) * ({gy} - e.py) - "
                f"(e.qy - e.py) * ({gx} - e.px)"
                for gy, gx in corners)
            rows.append(
                f"SELECT {qid} AS qid, 'contains' AS relation, "
                f"s.d AS doc_id FROM shp s "
                f"WHERE NOT EXISTS (SELECT 1 FROM edges e "
                f"WHERE e.d = s.d AND least({crosses}) < 0)")
        else:
            rows.append(
                f"SELECT {qid} AS qid, 'disjoint' AS relation, "
                f"s.d AS doc_id FROM shp s "
                f"WHERE NOT ({_shape_intersects_where(a, b, c, d)})")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_SHAPE_CTE}\n{un}"


HIGHLIGHT_QUERIES = [(1, ["key", "agg"], 10), (2, ["vector"], 10),
                     (3, ["slow", "fast", "table"], 10)]


def ft_deletes_filter(sf_dir: str) -> pa.Table:
    """Live-docs filtering (Lucene90LiveDocsFormat.java:49 role): a
    filtered-reader view with every lang:de doc tombstoned; Boolean doc
    sets then exclude deleted docs while stats stay delete-blind
    (Lucene's pre-merge semantics). → (qid, doc_id)."""
    from ..search import IndexReader as IR
    from ..search import _term_docset, search_boolean

    idx = index_dir_for(sf_dir)
    base = reader_for(sf_dir)
    dead = _term_docset(base, "lang:de")
    r = IR(idx, extra_deletes=dead)
    qids, docs = [], []
    for qid, kw in ((1, dict(must=["key"])),
                    (2, dict(must=["table", "value"])),
                    (3, dict(should=["vector", "spark"]))):
        d = search_boolean(r, **kw)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_deletes_filter_sql() -> str:
    return """WITH corpus AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         text, lang
  FROM documents
),
tok AS (
  SELECT d, unnest(string_split(text, ' ')) AS term FROM corpus
),
live AS (SELECT d FROM corpus WHERE lang != 'de')
SELECT 1 AS qid, t.d AS doc_id FROM tok t
WHERE t.term = 'key' AND t.d IN (SELECT d FROM live) GROUP BY t.d
UNION ALL
SELECT 2, d FROM (
  SELECT d FROM tok WHERE term IN ('table', 'value')
  GROUP BY d HAVING count(DISTINCT term) = 2
) WHERE d IN (SELECT d FROM live)
UNION ALL
SELECT 3, d FROM (
  SELECT DISTINCT d FROM tok WHERE term IN ('vector', 'spark')
) WHERE d IN (SELECT d FROM live)"""


def ft_highlight(sf_dir: str) -> pa.Table:
    """UnifiedHighlighter role (uhighlight/UnifiedHighlighter.java) in
    the POSTINGS/TERM_VECTORS offset mode (FieldOffsetStrategy): BM25
    top-k per query; match POSITIONS read from the positional postings,
    character offsets from the stored per-doc offset payload
    (tok_starts/tok_ends docmeta columns, the ``..._AND_OFFSETS`` role);
    stored text is only SLICED for the passage — nothing re-analyzes
    content at query time (round 2 used ANALYSIS-mode re-tokenize).
    → (qid, doc_id, n_matches, first_offset, snippet)."""
    import pyarrow.parquet as pq_

    from ..highlight import highlight_stored
    from ..search import _term_positions

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    qids, docs, nms, offs, snips = [], [], [], [], []
    for qid, terms, k in HIGHLIGHT_QUERIES:
        td = search_blockmax(r, " ".join(terms), k)
        hits = [int(d) for d in td.doc_ids]
        if not hits:
            continue
        pos_of = {t: (_term_positions(r, t) or {}) for t in set(terms)}
        dm = pq_.read_table(os.path.join(idx, "docmeta"),
                            columns=["doc_id", "path", "tok_starts",
                                     "tok_ends"],
                            filters=[("doc_id", "in", hits)])
        path_of = dict(zip(dm.column("doc_id").to_pylist(),
                           dm.column("path").to_pylist()))
        st_of = dict(zip(dm.column("doc_id").to_pylist(),
                         dm.column("tok_starts").to_pylist()))
        en_of = dict(zip(dm.column("doc_id").to_pylist(),
                         dm.column("tok_ends").to_pylist()))
        orig = {d: int(path_of[d][4:12]) for d in hits}
        dt = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"],
                            filters=[("doc_id", "in",
                                      sorted(set(orig.values())))])
        text_of = dict(zip(dt.column("doc_id").to_pylist(),
                           dt.column("text").to_pylist()))
        for d in hits:
            mp = np.unique(np.concatenate(
                [np.asarray(pos_of[t].get(d, []), np.int64)
                 for t in set(terms)]))
            snip, nm, off = highlight_stored(
                text_of[orig[d]] or "",
                np.asarray(st_of[d], np.int64),
                np.asarray(en_of[d], np.int64), mp)
            qids.append(qid)
            docs.append(d)
            nms.append(nm)
            offs.append(off)
            snips.append(snip)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n_matches": pa.array(nms, pa.int64()),
                     "first_offset": pa.array(offs, pa.int64()),
                     "snippet": pa.array(snips, pa.string())})


def oracle_highlight_sql() -> str:
    """Snippet reconstruction in SQL — valid because documents.text is
    single-spaced [a-z ]+ where analyzer tokens == split-on-space and
    character offsets == join-length arithmetic."""
    rows = []
    for qid, terms, k in HIGHLIGHT_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', {k})")
    values = ",\n    ".join(rows)
    parts = []
    for qid, terms, k in HIGHLIGHT_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        firsts = ", ".join(
            f"coalesce(list_position(toks, '{t}'), 999999)" for t in terms)
        parts.append(f"""(
  SELECT qid, d AS doc_id,
         len(list_filter(toks, t -> t IN ({tl}))) AS n_matches,
         CASE WHEN fi > 1
              THEN len(array_to_string(toks[1:fi - 1], ' ')) + 1
              ELSE 0 END AS first_offset,
         array_to_string(
           list_transform(toks[st:en],
             t -> CASE WHEN t IN ({tl})
                       THEN '<b>' || t || '</b>' ELSE t END), ' ')
           AS snippet
  FROM (
    SELECT h.qid, h.d, h.toks, h.fi,
           greatest(1, h.fi - 3) AS st,
           least(len(h.toks), greatest(1, h.fi - 3) + 7) AS en
    FROM (
      SELECT r.qid, r.d, string_split(c.text, ' ') AS toks,
             least({firsts.replace('toks', "string_split(c.text, ' ')")}) AS fi
      FROM ranked r JOIN corpus c ON c.d = r.d
      WHERE r.qid = {qid} AND r.rank <= {k}
    ) h
  )
)""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, k) AS (VALUES
    {values}
),
scored AS (
  SELECT c.qid, c.clause, c.k, t.d, {_SCORE_EXPR} AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank, k
  FROM totals
)
{un}"""


MLT_DOCS = [7, 42, 123]


def ft_more_like_this(sf_dir: str) -> pa.Table:
    """MoreLikeThis → (src_doc, rank, doc_id) top-10 similar docs.
    O(doc) via the term-vector forward index (no dictionary scan)."""
    from ..search import more_like_this

    r = reader_for(sf_dir)
    src, ranks, docs = [], [], []
    for d in MLT_DOCS:
        if d >= int(r.doc_count):
            continue                 # tiny corpus: source doc absent
        _, td = more_like_this(r, d, k=10, max_query_terms=5)
        for rank, doc in enumerate(td.doc_ids.tolist(), 1):
            src.append(d)
            ranks.append(rank)
            docs.append(doc)
    return pa.table({"src_doc": pa.array(src, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_more_like_this_sql() -> str:
    parts = []
    score = """CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) / (CAST(1.2 AS REAL) *
            (CAST(0.25 AS REAL) + CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
             CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                  (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL)"""
    for d in MLT_DOCS:
        parts.append(f"""(
  WITH sel AS (
    SELECT t.term
    FROM tf t JOIN df f USING (term)
    WHERE t.d = {d}
    ORDER BY t.tf * ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5)
                           / (f.df + 0.5)) DESC, t.term ASC
    LIMIT 5
  ),
  totals AS (
    SELECT t.d, CAST(sum(CAST({score} AS DOUBLE)) AS REAL) AS sc
    FROM tf t JOIN df f USING (term) JOIN quant q ON q.d = t.d
    WHERE t.term IN (SELECT term FROM sel) AND t.d != {d}
    GROUP BY t.d
  )
  SELECT {d} AS src_doc,
         row_number() OVER (ORDER BY sc DESC, d ASC) AS rank, d AS doc_id
  FROM totals ORDER BY rank LIMIT 10)""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# ---------------------------------------------------------------------------
# Percolator (Monitor role): registered queries match a document stream

PERCOLATE_QUERIES = [
    (1, {"must": ["key", "agg"]}),
    (2, {"phrase": ["slow", "fast"]}),
    (3, {"should": ["table", "value", "part"], "msm": 2}),
    (4, {"must": ["customer", "the"]}),
    (5, {"must": ["zzmissing"]}),
    (6, {"phrase": ["the", "a"]}),
]


def ft_percolate(sf_dir: str) -> pa.Table:
    """Monitor/percolator (monitor/Monitor.java:86): the registered query
    set streams over the raw documents table (no document index — the
    queries are the stored side) and emits (qid, doc_id) for every
    matching (query, document) pair. Term-presolve + exact phrase verify
    per candidate (TermFilteredPresearcher.java:62 role)."""
    import ray.data

    from ..monitor import percolate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    out = percolate(ds, PERCOLATE_QUERIES)
    batches = [pa.table(b)
               for b in out.iter_batches(batch_format="pyarrow")]
    if not batches:                     # no query matched any document
        batches = [pa.table({"qid": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})]
    t = pa.concat_tables(batches, promote_options="default")
    order = np.lexsort((t.column("doc_id").to_numpy(zero_copy_only=False),
                        t.column("qid").to_numpy(zero_copy_only=False)))
    return t.take(pa.array(order, pa.int64()))


def oracle_percolate_sql() -> str:
    parts = []
    for qid, spec in PERCOLATE_QUERIES:
        must = spec.get("must") or []
        should = spec.get("should") or []
        msm = spec.get("msm", 0)
        phrase = spec.get("phrase") or []
        if phrase:
            joins = ["FROM w w0"]
            conds = [f"w0.word = '{phrase[0]}'"]
            for i in range(1, len(phrase)):
                joins.append(f"JOIN w w{i} ON w{i}.doc_id = w0.doc_id "
                             f"AND w{i}.pos = w0.pos + {i}")
                conds.append(f"w{i}.word = '{phrase[i]}'")
            parts.append(
                f"SELECT DISTINCT {qid} AS qid, w0.doc_id AS doc_id\n"
                + "\n".join(joins) + "\nWHERE " + " AND ".join(conds))
        elif must:
            tl = ", ".join(f"'{t}'" for t in must)
            parts.append(
                f"SELECT {qid} AS qid, doc_id FROM tok\n"
                f"WHERE term IN ({tl})\n"
                f"GROUP BY doc_id HAVING count(DISTINCT term) = {len(must)}")
        else:
            tl = ", ".join(f"'{t}'" for t in should)
            parts.append(
                f"SELECT {qid} AS qid, doc_id FROM tok\n"
                f"WHERE term IN ({tl})\n"
                f"GROUP BY doc_id HAVING count(DISTINCT term) >= {msm}")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
{un}
ORDER BY qid, doc_id"""


# ---------------------------------------------------------------------------
# Field collapsing / grouping search (one head doc per group)

COLLAPSE_QUERIES = [(1, ["key", "agg"], 3), (2, ["the", "vector"], 4),
                    (3, ["table", "value", "part"], 5),
                    (4, ["zzmissing"], 3)]


def ft_collapse_lang(sf_dir: str) -> pa.Table:
    """Grouping search / field collapsing
    (grouping/GroupingSearch.java:52, FirstPassGroupingCollector.java:43):
    top-k groups ranked by their best-scoring document, ONE head doc per
    group value. Collector shape: the scored doc stream reduces into
    per-group argmax state (bounded by #groups), never a global sort —
    group membership comes from the keyword-field postings
    ("lang:x" docsets), scores from the standard BM25 clause sum."""
    from ..search import _term_docset, search_terms_scored

    r = reader_for(sf_dir)
    lt = termdict_scan(r, prefix="lang:")
    langs = sorted(t[5:] for t in lt.column("term").to_pylist())
    docsets = {lg: _term_docset(r, f"lang:{lg}") for lg in langs}
    qids, ranks, glangs, docs, scores = [], [], [], [], []
    for qid, terms, k in COLLAPSE_QUERIES:
        td = search_terms_scored(r, terms, max(1, r.doc_count))
        d, s = td.doc_ids, td.scores
        heads = []                       # (score, doc, lang) per group
        for lg in langs:
            m = np.isin(d, docsets[lg], assume_unique=False)
            if not m.any():
                continue
            dm, sm = d[m], s[m]
            i = int(np.lexsort((dm, -sm.astype(np.float64)))[0])
            heads.append((float(sm[i]), int(dm[i]), lg))
        heads.sort(key=lambda h: (-h[0], h[1]))
        for rank, (sc, doc, lg) in enumerate(heads[:k], 1):
            qids.append(qid)
            ranks.append(rank)
            glangs.append(lg)
            docs.append(doc)
            scores.append(sc)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "lang": pa.array(glangs, pa.string()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_collapse_lang_sql() -> str:
    parts = []
    for qid, terms, k in COLLAPSE_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  SELECT {qid} AS qid,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank,
         lang, doc_id, score
  FROM (
    SELECT lang, d AS doc_id, score, row_number() OVER (
             PARTITION BY lang ORDER BY score DESC, d ASC) AS rn
    FROM (
      SELECT l.lang, s.d, s.score
      FROM (
        SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
        FROM (
          SELECT t.d, {_SCORE_EXPR} AS s
          FROM tf t JOIN df f ON f.term = t.term
          JOIN quant q ON q.d = t.d
          WHERE t.term IN ({tl})
        ) GROUP BY d
      ) s
      JOIN lmap l ON l.d = s.d
    )
  ) WHERE rn = 1
  ORDER BY rank LIMIT {k})""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
lmap AS (
  SELECT row_number() OVER (
           ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang
  FROM documents
)
{un}"""


# ---------------------------------------------------------------------------
# Diversified top-k (at most M hits per key value)

DIVERSIFY_QUERIES = [(1, ["data", "value"], 8), (2, ["return", "key"], 10),
                     (3, ["the", "table", "part"], 6)]
DIVERSIFY_MAX_PER_KEY = 2


def ft_diversified_topk(sf_dir: str) -> pa.Table:
    """Diversified top-k
    (misc/src/java/org/apache/lucene/misc/search/
    DiversifiedTopDocsCollector.java:69): the global BM25 top-k subject
    to at most ``DIVERSIFY_MAX_PER_KEY`` hits per key value (lang) — the
    de-duplicated result page (one artist / source dominating the top is
    capped). Collector shape: the scored stream reduces into bounded
    per-key top-M state (M × #keys rows), then one global merge — same
    per-group argmax reduction as field collapsing, widened to M."""
    from ..search import _term_docset, search_terms_scored

    m = DIVERSIFY_MAX_PER_KEY
    r = reader_for(sf_dir)
    lt = termdict_scan(r, prefix="lang:")
    langs = sorted(t[5:] for t in lt.column("term").to_pylist())
    docsets = {lg: _term_docset(r, f"lang:{lg}") for lg in langs}
    qids, ranks, glangs, docs, scores = [], [], [], [], []
    for qid, terms, k in DIVERSIFY_QUERIES:
        td = search_terms_scored(r, terms, max(1, r.doc_count))
        d, s = td.doc_ids, td.scores
        kept = []                        # (score, doc, lang), ≤ m per key
        for lg in langs:
            msk = np.isin(d, docsets[lg], assume_unique=False)
            if not msk.any():
                continue
            dm, sm = d[msk], s[msk]
            order = np.lexsort((dm, -sm.astype(np.float64)))[:m]
            kept.extend((float(sm[i]), int(dm[i]), lg) for i in order)
        kept.sort(key=lambda h: (-h[0], h[1]))
        for rank, (sc, doc, lg) in enumerate(kept[:k], 1):
            qids.append(qid)
            ranks.append(rank)
            glangs.append(lg)
            docs.append(doc)
            scores.append(sc)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "lang": pa.array(glangs, pa.string()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_diversified_topk_sql() -> str:
    m = DIVERSIFY_MAX_PER_KEY
    parts = []
    for qid, terms, k in DIVERSIFY_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  SELECT {qid} AS qid,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank,
         lang, doc_id, score
  FROM (
    SELECT lang, d AS doc_id, score, row_number() OVER (
             PARTITION BY lang ORDER BY score DESC, d ASC) AS rn
    FROM (
      SELECT l.lang, s.d, s.score
      FROM (
        SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
        FROM (
          SELECT t.d, {_SCORE_EXPR} AS s
          FROM tf t JOIN df f ON f.term = t.term
          JOIN quant q ON q.d = t.d
          WHERE t.term IN ({tl})
        ) GROUP BY d
      ) s
      JOIN lmap l ON l.d = s.d
    )
  ) WHERE rn <= {m}
  ORDER BY rank LIMIT {k})""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
lmap AS (
  SELECT row_number() OVER (
           ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang
  FROM documents
)
{un}"""


# ---------------------------------------------------------------------------
# Scored query-time join (JoinUtil ScoreMode Max/Total/Avg)

JOIN_SCORED_FROM = ["value", "data"]     # from-side BM25 query
JOIN_SCORED_TO_TERM = "join"             # to-side membership term


def join_scored(sf_dir: str):
    """Scored query-time join (join/src/java/org/apache/lucene/search/
    join/JoinUtil.java:73-78 with ScoreMode Max/Total/Avg via
    TermsWithScoreCollector): the from-query's matching docs are BM25
    scored, aggregated per join value (the ``lang`` keyword field) into
    a small (value -> score) map that is broadcast ONCE (``ray.put``);
    to-side docs (those containing the to-term) are then scored by a
    vectorized lookup inside ``map_batches`` — score propagation without
    a shuffle, the 100-TB join shape.  Total/Avg use an exactly-rounded
    float64 sum (``math.fsum``) cast to float32, so the DuckDB
    DOUBLE-sum oracle reproduces them bit-exactly."""
    import math

    import ray
    import ray.data

    from ..search import _term_docset, search_terms_scored

    r = reader_for(sf_dir)
    td = search_terms_scored(r, JOIN_SCORED_FROM, max(1, r.doc_count))
    d, s = td.doc_ids, td.scores
    langs, mx, tot, av = [], [], [], []
    for term in termdict_scan(r, prefix="lang:").column("term").to_pylist():
        m = np.isin(d, _term_docset(r, term))
        if not m.any():
            continue
        sm = s[m].astype(np.float64)
        langs.append(term[5:])
        mx.append(np.float32(sm.max()))
        tot.append(np.float32(math.fsum(sm)))
        av.append(np.float32(math.fsum(sm) / len(sm)))
    amap_ref = ray.put((pa.array(langs, pa.string()),
                        np.asarray(mx, np.float32),
                        np.asarray(tot, np.float32),
                        np.asarray(av, np.float32)))
    to_ref = ray.put(_term_docset(r, JOIN_SCORED_TO_TERM))

    ds = ray.data.read_parquet(
        os.path.join(index_dir_for(sf_dir), "docmeta"),
        columns=["doc_id", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys, m_, t_, a_ = ray.get(amap_ref)
        tset = ray.get(to_ref)
        dk = batch.column("doc_id").to_numpy()
        if len(tset) == 0:
            return batch.slice(0, 0).append_column(
                "score_max", pa.array([], pa.float32())).append_column(
                "score_total", pa.array([], pa.float32())).append_column(
                "score_avg", pa.array([], pa.float32()))
        pos = np.minimum(np.searchsorted(tset, dk), len(tset) - 1)
        keep = tset[pos] == dk
        code = pc.index_in(batch.column("lang"), value_set=keys)
        keep &= pc.is_valid(code).to_numpy(zero_copy_only=False)
        ci = code.to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        out = batch.filter(pa.array(keep))
        return (out.append_column("score_max", pa.array(m_[ci]))
                .append_column("score_total", pa.array(t_[ci]))
                .append_column("score_avg", pa.array(a_[ci])))

    from lucene_ray.pipelines.util import typed_table

    return typed_table(
        ds.map_batches(score, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                   ("score_max", pa.float32()),
                   ("score_total", pa.float32()),
                   ("score_avg", pa.float32())]))


def oracle_join_scored_sql() -> str:
    tl = ", ".join(f"'{t}'" for t in JOIN_SCORED_FROM)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
lmap AS (
  SELECT row_number() OVER (
           ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang
  FROM documents
),
fromscore AS (
  SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM (
    SELECT t.d, {_SCORE_EXPR} AS s
    FROM tf t JOIN df f ON f.term = t.term
    JOIN quant q ON q.d = t.d
    WHERE t.term IN ({tl})
  ) GROUP BY d
),
aggmap AS (
  SELECT l.lang,
         max(s.score) AS score_max,
         CAST(sum(CAST(s.score AS DOUBLE)) AS REAL) AS score_total,
         CAST(sum(CAST(s.score AS DOUBLE)) / count(*) AS REAL) AS score_avg
  FROM fromscore s JOIN lmap l ON l.d = s.d
  GROUP BY l.lang
)
SELECT t.d AS doc_id, l.lang, a.score_max, a.score_total, a.score_avg
FROM (SELECT DISTINCT d FROM tf WHERE term = '{JOIN_SCORED_TO_TERM}') t
JOIN lmap l ON l.d = t.d
JOIN aggmap a ON a.lang = l.lang"""


# ---------------------------------------------------------------------------
# Interval containment (Intervals.containing / notContaining)

# (qid, [a, b] big ordered source, small term, max width, negate)
CONTAIN_QUERIES = [(1, ["key", "agg"], "value", 8, False),
                   (2, ["slow", "fast"], "the", 6, False),
                   (3, ["the", "data"], "a", 6, True),
                   (4, ["table", "part"], "value", 9, False),
                   (5, ["hash", "merge"], "join", 8, True),
                   (6, ["zzmissing", "key"], "a", 9, False)]


def ft_interval_contains(sf_dir: str) -> pa.Table:
    """Intervals.containing / notContaining
    (queries/intervals/Intervals.java, ContainingIntervalsSource): docs
    whose minimal ordered (a, b) interval within the width does / does
    not contain the small term → (qid, doc_id)."""
    from ..search import interval_contains_docs

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, big, small, width, negate in CONTAIN_QUERIES:
        for d in interval_contains_docs(r, big, small, width,
                                        negate).tolist():
            qids.append(qid)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_interval_contains_sql() -> str:
    parts = []
    for qid, (ta, tb), small, width, negate in CONTAIN_QUERIES:
        exists = "NOT EXISTS" if negate else "EXISTS"
        parts.append(f"""SELECT DISTINCT {qid} AS qid, d AS doc_id
FROM (
  SELECT wa.d, wa.pos AS p0, min(wb.pos) AS p1
  FROM w wa JOIN w wb ON wb.d = wa.d AND wb.pos > wa.pos
  WHERE wa.word = '{ta}' AND wb.word = '{tb}'
  GROUP BY wa.d, wa.pos
) p
WHERE p.p1 - p.p0 + 1 <= {width}
  AND NOT EXISTS (
    SELECT 1 FROM w x
    WHERE x.d = p.d AND x.word = '{ta}'
      AND x.pos > p.p0 AND x.pos < p.p1)
  AND {exists} (
    SELECT 1 FROM w c
    WHERE c.d = p.d AND c.word = '{small}'
      AND c.pos BETWEEN p.p0 AND p.p1)""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# English analysis chain (EnglishAnalyzer.java:102-109 role): possessive
# strip -> stop drop -> Porter stem at index AND query time.

_EN_IDX_CACHE: dict[str, str] = {}


def english_index_dir_for(sf_dir: str) -> str:
    """Build (once, cached) the english-analyzer index for an sf dir."""
    return _cached_index(
        sf_dir, "english-v1", _EN_IDX_CACHE,
        lambda sf, idx: build_index(corpus_from_documents(sf), idx,
                                    analyzer="english"))


def ft_english_doclen(sf_dir: str) -> pa.Table:
    """Per-doc field length of the english-analyzer index — verifies the
    StopFilter part of the chain end-to-end (stop words do not count
    toward field length; analysis/core/StopFilter.java role) with an
    exact SQL oracle (stop filtering is SQL-expressible, stemming is
    not: DuckDB's fts/stem() is unavailable offline)."""
    import ray.data

    idx = english_index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id", "field_len"])

    def fmt(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "field_len": batch.column("field_len").cast(pa.int64()),
        })

    return ds.map_batches(fmt, batch_format="pyarrow")


def oracle_english_doclen_sql() -> str:
    from ..analysis_en import ENGLISH_STOP_WORDS
    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return f"""WITH {_CORPUS_CTE}
SELECT c.d AS doc_id,
       count(t.term) FILTER (WHERE t.term NOT IN ({stops})) AS field_len
FROM corpus c LEFT JOIN tok t ON c.d = t.d
GROUP BY c.d"""


# (qid, free-text query) — inflected/possessive/stop-containing forms whose
# Porter stems hit the corpus vocabulary (query->queri<-queries, etc.)
STEMMED_QUERIES = [(1, "queries"), (2, "valuing customers"),
                   (3, "tables merged"), (4, "the sorted scans"),
                   (5, "grouping the rows"), (6, "hashes joined")]


def ft_stemmed_search(sf_dir: str) -> pa.Table:
    """BM25 top-10 over the english-analyzer index: query terms pass the
    same possessive->stop->Porter chain as the index, so inflected query
    forms match inflected document forms through their common stem
    (en/PorterStemFilter.java + QueryBuilder analyzer contract).

    Oracle-backed since the continuation session: the whole english
    chain (possessive -> stop -> Porter) is rebuilt in SQL
    (oracle_stemmed_search_sql; the Porter CTE chain agrees with
    porter_stem on all 23,531 reference vocabulary words)."""
    from ..search import search_blockmax

    r = IndexReader(english_index_dir_for(sf_dir))
    qids, ranks, docs = [], [], []
    for qid, q in STEMMED_QUERIES:
        td = search_blockmax(r, q, k=10)
        for rank, d in enumerate(td.doc_ids.tolist(), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


# ---------------------------------------------------------------------------
# Shingles (word n-grams) — analysis/shingle/ShingleFilter.java role

def ft_shingles(sf_dir: str, n_top: int = 50) -> pa.Table:
    """Top-``n_top`` word bigrams over the corpus — ShingleFilter token
    n-grams (analysis/shingle/ShingleFilter.java:46, ' ' separator)
    consumed as a distributed stats pipeline: per-batch vectorized
    bigram formation + partial counts (the combiner), ONE small
    groupby over the shingle key, exact top-n by (count desc, shingle).
    Scale shape: the shuffle moves only (shingle, partial_count) rows —
    bounded by distinct-bigram vocabulary per batch, not token count."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..analysis import analyze_batch
        empty = pa.table({"shingle": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        toks, owners, _, _ = analyze_batch(
            batch.column("text").to_pylist())
        t = toks.combine_chunks() if hasattr(toks, "combine_chunks") \
            else toks
        if len(t) < 2:
            return empty
        left = t.slice(0, len(t) - 1)
        right = t.slice(1)
        pairs = pc.binary_join_element_wise(left, right, " ")
        same_doc = owners[:-1] == owners[1:]
        vc = pairs.filter(pa.array(same_doc)).value_counts()
        return pa.table({"shingle": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("shingle").sum("cnt"))
    out = agg.to_pandas()  # aggregated: one row per distinct bigram
    out = out.rename(columns={"sum(cnt)": "cnt"})
    out = out.sort_values(["cnt", "shingle"],
                          ascending=[False, True]).head(n_top)
    return pa.table({"shingle": pa.array(out["shingle"], pa.string()),
                     "cnt": pa.array(out["cnt"], pa.int64())})


def oracle_shingles_sql(n_top: int = 50) -> str:
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
SELECT a.word || ' ' || b.word AS shingle, count(*) AS cnt
FROM w a JOIN w b ON b.d = a.d AND b.pos = a.pos + 1
GROUP BY shingle
ORDER BY cnt DESC, shingle
LIMIT {n_top}"""


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter (subword splitting for code/product tokens)

_WDGF_TOP = 60


def ft_word_delimiter(sf_dir: str) -> pa.Table:
    """WordDelimiterGraphFilter over a deterministically code-ified
    corpus (miscellaneous/WordDelimiterGraphFilter.java:88 — the
    reference's most-used filter for identifiers like ``fooBar-2x``).

    Each corpus word ``w`` (the testdata vocabulary is lowercase
    alpha) is mapped to the identifier-shaped token
    ``w + 'Xy' + len(w) + '-' + Cap(w) + "'s"`` — exercising case
    splits, numeric splits, a delimiter, and possessive stemming in one
    token — then run through the REAL filter (``lucene_ray.wordgraph``,
    golden-pinned against TestWordDelimiterGraphFilter) with ALL flags:
    parts + CATENATE_WORDS/NUMBERS/ALL + PRESERVE_ORIGINAL. Per-term
    (df, ttf) with per-batch partials, top-60 by (df desc, term asc);
    the SQL oracle reproduces the mapping and the filter's documented
    split/catenate output for this token shape."""
    import ray.data

    from ..wordgraph import WDGF_ALL, wdgf_stream

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        dfs: dict[str, int] = {}
        ttfs: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            toks = [f"{w}Xy{len(w)}-{w[0].upper()}{w[1:]}'s"
                    for w in (text or "").split(" ") if w]
            seen: dict[str, int] = {}
            for t in wdgf_stream(toks, WDGF_ALL):
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                dfs[t] = dfs.get(t, 0) + 1
                ttfs[t] = ttfs.get(t, 0) + c
        ks = sorted(dfs)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([dfs[k] for k in ks], pa.int64()),
                         "ttf": pa.array([ttfs[k] for k in ks], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("ttf", alias_name="ttf"))
           .to_pandas())
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_WDGF_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def oracle_word_delimiter_sql() -> str:
    """The WDGF output for the planted token shape
    ``wXy<n>-Cap`` + possessive: parts (w, Xy, n, Cap), CATENATE_WORDS run
    (w+Xy; the Cap run and the digit run are singletons and per
    flushConcatenation are not re-emitted), CATENATE_ALL
    (w+Xy+n+Cap), and the preserved original."""
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
t AS (
  SELECT d, word,
         upper(substr(word, 1, 1)) || substr(word, 2) AS cap,
         CAST(length(word) AS VARCHAR) AS n
  FROM w WHERE word <> ''
),
terms AS (
  SELECT d, word || 'Xy' || n || '-' || cap || '''s' AS term FROM t
  UNION ALL SELECT d, word || 'Xy' || n || cap FROM t
  UNION ALL SELECT d, word || 'Xy' FROM t
  UNION ALL SELECT d, word FROM t
  UNION ALL SELECT d, 'Xy' FROM t
  UNION ALL SELECT d, n FROM t
  UNION ALL SELECT d, cap FROM t
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM terms GROUP BY term
ORDER BY df DESC, term LIMIT {_WDGF_TOP}"""


_NGRAM_TOP = 60


def _gram_stats(sf_dir: str, vocab_grams) -> pa.Table:
    """Shared n-gram df/ttf aggregation: per batch, grams are derived at
    the VOCABULARY level (Heaps-small) and exploded back over the token
    stream with one offsets-gather; per-doc uniqueness via one np.unique
    over packed (doc, gramID) keys — no per-token Python in the counting
    path. Partials groupby-sum like the other term-stats entries."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        owners, words = [], []
        for di, tx in enumerate(texts):
            for w in (tx or "").split(" "):
                if w:
                    owners.append(di)
                    words.append(w)
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "ttf": pa.array([], pa.int64())})
        if not words:
            return empty
        import pyarrow.compute as pc
        d = pc.dictionary_encode(pa.array(words, pa.string()))
        codes = np.asarray(d.indices, dtype=np.int64)
        gdict: dict[str, int] = {}
        per_vocab: list[list[int]] = []
        for w in d.dictionary.to_pylist():
            per_vocab.append([gdict.setdefault(t, len(gdict))
                              for t in vocab_grams(w)])
        if not gdict:
            return empty
        counts = np.array([len(x) for x in per_vocab], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        flat = np.fromiter((g for ids in per_vocab for g in ids),
                           dtype=np.int64, count=int(counts.sum()))
        reps = counts[codes]
        total = int(reps.sum())
        gather = np.repeat(
            starts[codes] - np.concatenate([[0], np.cumsum(reps)[:-1]]),
            reps) + np.arange(total, dtype=np.int64)
        gid = flat[gather]
        own = np.repeat(np.array(owners, dtype=np.int64), reps)
        nv = len(gdict)
        pairs, tf = np.unique(own * nv + gid, return_counts=True)
        pg = pairs % nv
        df = np.bincount(pg, minlength=nv)
        ttf = np.zeros(nv, dtype=np.int64)
        np.add.at(ttf, pg, tf)
        names = list(gdict)                   # insertion order == id
        return pa.table({"term": pa.array(names, pa.string()),
                         "df": pa.array(df, pa.int64()),
                         "ttf": pa.array(ttf, pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("term")
         .aggregate(Sum("df", alias_name="df"),
                    Sum("ttf", alias_name="ttf"))
         .to_pandas()), ["term", "df", "ttf"])
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_NGRAM_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def ft_edge_ngram(sf_dir: str) -> pa.Table:
    """EdgeNGramTokenFilter (analysis/ngram/EdgeNGramTokenFilter.java:37,
    the autocomplete filter): per-gram (df, ttf) over the documents
    table for front grams of sizes 2..5, top-60 by (df desc, term)."""
    from ..analysis import EDGE_NGRAM_MAX, EDGE_NGRAM_MIN

    def grams(w: str) -> list[str]:
        return [w[:g] for g in range(EDGE_NGRAM_MIN,
                                     min(EDGE_NGRAM_MAX, len(w)) + 1)]
    return _gram_stats(sf_dir, grams)


def ft_ngram(sf_dir: str) -> pa.Table:
    """NGramTokenFilter (analysis/ngram/NGramTokenFilter.java:33): all
    grams of sizes 2..3 at every offset, per-gram (df, ttf), top-60."""
    from ..analysis import NGRAM_MAX, NGRAM_MIN

    def grams(w: str) -> list[str]:
        return [w[s:s + g] for g in range(NGRAM_MIN, NGRAM_MAX + 1)
                for s in range(0, len(w) - g + 1)]
    return _gram_stats(sf_dir, grams)


def oracle_edge_ngram_sql() -> str:
    from ..analysis import EDGE_NGRAM_MAX, EDGE_NGRAM_MIN
    sizes = ", ".join(f"({g})" for g in range(EDGE_NGRAM_MIN,
                                              EDGE_NGRAM_MAX + 1))
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
grams AS (
  SELECT d, substr(word, 1, g) AS term
  FROM w CROSS JOIN (VALUES {sizes}) gs(g)
  WHERE word <> '' AND length(word) >= g
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM grams GROUP BY term
ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_ngram_sql() -> str:
    from ..analysis import NGRAM_MAX, NGRAM_MIN
    sizes = ", ".join(f"({g})" for g in range(NGRAM_MIN, NGRAM_MAX + 1))
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
grams AS (
  SELECT d, substr(word, CAST(s AS INT), g) AS term
  FROM (
    SELECT d, word, g,
           unnest(generate_series(1, length(word) - g + 1)) AS s
    FROM w CROSS JOIN (VALUES {sizes}) gs(g)
    WHERE word <> '' AND length(word) >= g
  )
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM grams GROUP BY term
ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Common single-token filters (length / truncate / reverse), each a
# registered stream analyzer (lucene_ray.analysis.STREAM_FILTERS) plus
# a df/ttf stats gate through the same vocab-level machinery.

def ft_length_filter(sf_dir: str) -> pa.Table:
    """LengthFilter (analysis/miscellaneous/LengthFilter.java:29): only
    tokens of length 3..8 survive; per-term (df, ttf), top-60."""
    from ..analysis import LENGTH_MAX, LENGTH_MIN

    def keep(w: str) -> list[str]:
        return [w] if LENGTH_MIN <= len(w) <= LENGTH_MAX else []
    return _gram_stats(sf_dir, keep)


def ft_truncate(sf_dir: str) -> pa.Table:
    """TruncateTokenFilter (analysis/miscellaneous/
    TruncateTokenFilter.java:28): every token capped at 5 chars;
    per-term (df, ttf), top-60."""
    from ..analysis import TRUNCATE_LEN

    return _gram_stats(sf_dir, lambda w: [w[:TRUNCATE_LEN]])


def ft_reverse_token(sf_dir: str) -> pa.Table:
    """ReverseStringFilter (analysis/reverse/ReverseStringFilter.java:36):
    every token reversed (the leading-wildcard trick); per-term
    (df, ttf), top-60."""
    return _gram_stats(sf_dir, lambda w: [w[::-1]])


def oracle_length_filter_sql() -> str:
    from ..analysis import LENGTH_MAX, LENGTH_MIN
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE length(word) BETWEEN {LENGTH_MIN} AND {LENGTH_MAX}
GROUP BY word ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_truncate_sql() -> str:
    from ..analysis import TRUNCATE_LEN
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT substr(word, 1, {TRUNCATE_LEN}) AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_reverse_token_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT reverse(word) AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Tokenizer family (lucene_ray.tokenizers): whitespace / simple /
# keyword / path-hierarchy / classic.  Each entry runs the REAL
# replacement tokenizer over the raw document text (not the per-word
# vocabulary shortcut) so the gates exercise the exact engine path that
# Index.build(analyzer=...) uses; the oracles reproduce the token
# stream analytically in SQL over deterministic text transforms.

def _rawtok_stats(sf_dir: str, doc_tokens) -> pa.Table:
    """df/ttf over per-DOC token lists (``doc_tokens(text, doc_id) ->
    list[str]``), top-60 by (df desc, term). The counting tail matches
    _gram_stats: one dictionary-encode + one packed np.unique per
    batch, groupby-sum partials."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy()
        owners: list[int] = []
        toks: list[str] = []
        for di, tx in enumerate(texts):
            tt = doc_tokens(tx or "", int(ids[di]))
            toks.extend(tt)
            owners.extend([di] * len(tt))
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64()),
                          "ttf": pa.array([], pa.int64())})
        if not toks:
            return empty
        import pyarrow.compute as pc
        d = pc.dictionary_encode(pa.array(toks, pa.string()))
        codes = np.asarray(d.indices, dtype=np.int64)
        nv = len(d.dictionary)
        own = np.asarray(owners, dtype=np.int64)
        pairs, tf = np.unique(own * nv + codes, return_counts=True)
        pg = pairs % nv
        df = np.bincount(pg, minlength=nv)
        ttf = np.zeros(nv, dtype=np.int64)
        np.add.at(ttf, pg, tf)
        return pa.table({"term": d.dictionary,
                         "df": pa.array(df, pa.int64()),
                         "ttf": pa.array(ttf, pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("term")
         .aggregate(Sum("df", alias_name="df"),
                    Sum("ttf", alias_name="ttf"))
         .to_pandas()), ["term", "df", "ttf"])
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_NGRAM_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def ft_whitespace_tok(sf_dir: str) -> pa.Table:
    """WhitespaceTokenizer (core/WhitespaceTokenizer.java:72, via
    CharTokenizer.java:44): case-PRESERVING runs of non-whitespace.
    The text is passed through replace('a'→'A') first so the gate
    proves no case folding happens (the standard chain would fold the
    'A's back)."""
    from ..tokenizers import whitespace_tokenize  # noqa — module path
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: whitespace_tokenize(tx.replace("a", "A")))


def ft_simple_tok(sf_dir: str) -> pa.Table:
    """SimpleAnalyzer (core/SimpleAnalyzer.java = LetterTokenizer +
    LowerCaseFilter): digits split tokens. replace('r'→'9') plants
    letter-run breaks the standard grammar would NOT make (it keeps
    alphanumeric runs together)."""
    from ..tokenizers import TOKENIZER_ANALYZERS
    simple = TOKENIZER_ANALYZERS["simple"]
    return _rawtok_stats(
        sf_dir, lambda tx, d: simple(tx.replace("r", "9")))


def ft_keyword_tok(sf_dir: str) -> pa.Table:
    """KeywordAnalyzer (core/KeywordAnalyzer.java): the whole field is
    ONE case-preserved token. Gated over the 23-char text prefix so
    distinct docs collide into countable groups."""
    from ..tokenizers import keyword_tokenize
    return _rawtok_stats(
        sf_dir, lambda tx, d: keyword_tokenize(tx[:23]))


def ft_path_hierarchy(sf_dir: str) -> pa.Table:
    """PathHierarchyTokenizer (path/PathHierarchyTokenizer.java:115):
    '/src/lang/dNN' emits its 3 hierarchy prefixes; df counts every
    doc under each subtree — the faceted-drilldown use the reference
    documents."""
    from ..tokenizers import path_hierarchy_tokenize
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        srcs = batch.column("source").to_pylist()
        langs = batch.column("lang").to_pylist()
        owners: list[int] = []
        toks: list[str] = []
        for di in range(len(ids)):
            path = f"/{srcs[di]}/{langs[di]}/d{int(ids[di]) % 50}"
            tt = path_hierarchy_tokenize(path)
            toks.extend(tt)
            owners.extend([di] * len(tt))
        import pyarrow.compute as pc
        d = pc.dictionary_encode(pa.array(toks, pa.string()))
        codes = np.asarray(d.indices, dtype=np.int64)
        nv = len(d.dictionary)
        own = np.asarray(owners, dtype=np.int64)
        pairs, tf = np.unique(own * nv + codes, return_counts=True)
        pg = pairs % nv
        df = np.bincount(pg, minlength=nv)
        ttf = np.zeros(nv, dtype=np.int64)
        np.add.at(ttf, pg, tf)
        return pa.table({"term": d.dictionary,
                         "df": pa.array(df, pa.int64()),
                         "ttf": pa.array(ttf, pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("term")
         .aggregate(Sum("df", alias_name="df"),
                    Sum("ttf", alias_name="ttf"))
         .to_pandas()), ["term", "df", "ttf"])
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_NGRAM_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


_CLASSIC_WORD_RE = None


def _classic_corpus_doc(text: str, doc_id: int) -> str:
    """Deterministic classic-grammar exercise corpus: each pure-alpha
    word (>= 3 chars) of the document becomes one of five grammar
    shapes keyed on (len(word) + doc_id) % 5 — plain ALPHANUM,
    possessive APOSTROPHE, dotted ACRONYM, &-COMPANY, or a full
    EMAIL — so the ENGINE runs the real scanner over realistic mixed
    text while the oracle can predict every token analytically."""
    global _CLASSIC_WORD_RE
    if _CLASSIC_WORD_RE is None:
        import re
        _CLASSIC_WORD_RE = re.compile(r"[a-z]{3,}\Z")
    out: list[str] = []
    for w in text.split(" "):
        if not _CLASSIC_WORD_RE.match(w):
            continue
        v = (len(w) + doc_id) % 5
        if v == 0:
            out.append(w)
        elif v == 1:
            out.append(w + "'s")
        elif v == 2:
            out.append(f"{w[0]}.{w[1]}.{w[2]}.")
        elif v == 3:
            out.append(w + "&" + w)
        else:
            out.append(w + "@" + w + ".net")
    return " ".join(out)


def ft_classic(sf_dir: str) -> pa.Table:
    """ClassicAnalyzer (classic/ClassicTokenizerImpl.jflex grammar +
    ClassicFilter.java:24 's/dot stripping + LowerCase + English stop):
    df/ttf over the deterministic grammar-exercise corpus, scanned by
    the REAL longest-match scanner."""
    from ..tokenizers import classic_tokenize
    from ..analysis_en import ENGLISH_STOP_WORDS

    def toks(tx: str, d: int) -> list[str]:
        return [t for t in classic_tokenize(_classic_corpus_doc(tx, d))
                if t not in ENGLISH_STOP_WORDS]
    return _rawtok_stats(sf_dir, toks)


def ft_classic_types(sf_dir: str) -> pa.Table:
    """ClassicTokenizer token TYPES (ClassicTokenizer.java:120
    TOKEN_TYPES): per-type token counts over the same grammar-exercise
    corpus — gates the scanner's rule attribution (TypeAttribute), the
    input TypeTokenFilter consumes."""
    from ..tokenizers import classic_scan
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy()
        counts: dict[str, int] = {}
        for di, tx in enumerate(texts):
            for _, typ, _, _ in classic_scan(
                    _classic_corpus_doc(tx or "", int(ids[di]))):
                counts[typ] = counts.get(typ, 0) + 1
        return pa.table({"type": pa.array(list(counts), pa.string()),
                         "n": pa.array(list(counts.values()), pa.int64())})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("type")
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    agg = agg.sort_values("type")
    return pa.table({"type": pa.array(agg["type"], pa.string()),
                     "n": pa.array(agg["n"].astype(np.int64))})


_STOP_SQL = ("('a','an','and','are','as','at','be','but','by','for','if',"
             "'in','into','is','it','no','not','of','on','or','such',"
             "'that','the','their','then','there','these','they','this',"
             "'to','was','will','with')")


def oracle_whitespace_tok_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d,
         unnest(string_split_regex(replace(text, 'a', 'A'),
                                   '[ \\t\\n\\r]+')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_simple_tok_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d,
         unnest(regexp_extract_all(replace(text, 'r', '9'),
                                   '[\\p{{L}}]+')) AS word
  FROM documents
)
SELECT lower(word) AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_keyword_tok_sql() -> str:
    return f"""SELECT substr(text, 1, 23) AS term,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM documents WHERE text <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_path_hierarchy_sql() -> str:
    return f"""WITH p AS (
  SELECT doc_id AS d,
         '/' || source AS p1,
         '/' || source || '/' || lang AS p2,
         '/' || source || '/' || lang || '/d'
             || CAST(doc_id % 50 AS VARCHAR) AS p3
  FROM documents
), t AS (
  SELECT d, unnest([p1, p2, p3]) AS term FROM p
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM t GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_classic_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), v AS (
  SELECT d, word, (length(word) + d) % 5 AS variant
  FROM w WHERE regexp_matches(word, '^[a-z]{{3,}}$')
), tok AS (
  SELECT d, CASE variant
    WHEN 0 THEN word
    WHEN 1 THEN word
    WHEN 2 THEN substr(word, 1, 3)
    WHEN 3 THEN word || '&' || word
    ELSE word || '@' || word || '.net'
  END AS term
  FROM v
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM tok WHERE term NOT IN {_STOP_SQL}
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_classic_types_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), v AS (
  SELECT (length(word) + d) % 5 AS variant
  FROM w WHERE regexp_matches(word, '^[a-z]{{3,}}$')
)
SELECT CASE variant
    WHEN 0 THEN '<ALPHANUM>'
    WHEN 1 THEN '<APOSTROPHE>'
    WHEN 2 THEN '<ACRONYM>'
    WHEN 3 THEN '<COMPANY>'
    ELSE '<EMAIL>'
  END AS type, CAST(count(*) AS BIGINT) AS n
FROM v GROUP BY type ORDER BY type"""


# ---------------------------------------------------------------------------
# Token-filter batch: CommonGrams / KeepWord / Fingerprint /
# HyphenatedWords / LimitTokenCount / DecimalDigit / Apostrophe /
# Elision / Capitalization / TypeTokenFilter.  Engine side always runs
# the REGISTERED filter (the same function Index.build(analyzer=...)
# resolves); several oracles are identity word-stats — the gate is that
# the engine's plant-transform + real filter round-trips exactly.

def _words(tx: str) -> list[str]:
    return [w for w in tx.split(" ") if w]


def ft_common_grams(sf_dir: str) -> pa.Table:
    """CommonGramsFilter (commongrams/CommonGramsFilter.java:49):
    unigrams plus '_'-joined bigrams beside each common (English stop)
    word."""
    from ..analysis import common_grams_stream
    return _rawtok_stats(
        sf_dir, lambda tx, d: common_grams_stream(_words(tx)))


def ft_keep_word(sf_dir: str) -> pa.Table:
    """KeepWordFilter (miscellaneous/KeepWordFilter.java:28): only the
    keep-set words survive."""
    from ..analysis_en import keep_word_filter
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [m for m in keep_word_filter(_words(tx))
                       if m is not None])


def ft_fingerprint(sf_dir: str) -> pa.Table:
    """FingerprintFilter (miscellaneous/FingerprintFilter.java:36): one
    token per doc — sorted de-duplicated terms joined by ' ' (docs whose
    fingerprint exceeds 1024 chars emit nothing)."""
    from ..analysis import fingerprint_stream
    return _rawtok_stats(
        sf_dir, lambda tx, d: fingerprint_stream(_words(tx)))


_HYPH_RE = None


def ft_hyphenated(sf_dir: str) -> pa.Table:
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:
    73): the plant splits every third >=4-char word into 'xx- yyy' and
    the REAL filter must stitch the stream back to the original words
    (identity oracle)."""
    from ..analysis import hyphenated_stream

    def toks(tx: str, d: int) -> list[str]:
        global _HYPH_RE
        if _HYPH_RE is None:
            import re
            _HYPH_RE = re.compile(r"[a-z]{4,}\Z")
        parts: list[str] = []
        for w in _words(tx):
            if _HYPH_RE.match(w) and (len(w) + d) % 3 == 0:
                parts.append(w[:2] + "-")
                parts.append(w[2:])
            else:
                parts.append(w)
        return hyphenated_stream(parts)
    return _rawtok_stats(sf_dir, toks)


def ft_limit_count(sf_dir: str) -> pa.Table:
    """LimitTokenCountFilter (miscellaneous/LimitTokenCountFilter.java:
    33): only the first 20 tokens of each doc are indexed."""
    from ..analysis import limit_count_stream
    return _rawtok_stats(
        sf_dir, lambda tx, d: limit_count_stream(_words(tx)))


_AR_DIGITS = str.maketrans("0123456789", "٠١٢٣٤٥٦٧٨٩")


def ft_decimal_digit(sf_dir: str) -> pa.Table:
    """DecimalDigitFilter (core/DecimalDigitFilter.java:31): ASCII
    digits are planted as Arabic-Indic digits and the REAL filter must
    fold them back (identity oracle)."""
    from ..analysis_en import decimal_digit_filter

    def toks(tx: str, d: int) -> list[str]:
        return [m for m in decimal_digit_filter(
            [w.translate(_AR_DIGITS) for w in _words(tx)])
            if m is not None]
    return _rawtok_stats(sf_dir, toks)


def ft_apostrophe(sf_dir: str) -> pa.Table:
    """ApostropheFilter (tr/ApostropheFilter.java:33): every word gets
    a Turkish-style '(apostrophe)nin suffix; the REAL filter truncates
    at the apostrophe (identity oracle)."""
    from ..analysis_en import apostrophe_token_filter

    def toks(tx: str, d: int) -> list[str]:
        return [m for m in apostrophe_token_filter(
            [w + "'nin" for w in _words(tx)]) if m is not None]
    return _rawtok_stats(sf_dir, toks)


def ft_elision(sf_dir: str) -> pa.Table:
    """ElisionFilter (util/ElisionFilter.java:33 with FrenchAnalyzer
    DEFAULT_ARTICLES): every word gets a cycling article+' prefix; the
    REAL filter strips it (identity oracle)."""
    from ..analysis_en import FRENCH_ARTICLES, elision_filter

    def toks(tx: str, d: int) -> list[str]:
        arts = FRENCH_ARTICLES
        planted = [arts[(len(w) + d) % len(arts)] + "'" + w
                   for w in _words(tx)]
        return [m for m in elision_filter(planted) if m is not None]
    return _rawtok_stats(sf_dir, toks)


def ft_capitalization(sf_dir: str) -> pa.Table:
    """CapitalizationFilter defaults (miscellaneous/
    CapitalizationFilter.java:56): Upper(first char) + lower(rest)."""
    from ..analysis_en import capitalization_filter

    def toks(tx: str, d: int) -> list[str]:
        return [m for m in capitalization_filter(_words(tx))
                if m is not None]
    return _rawtok_stats(sf_dir, toks)


def ft_type_filter(sf_dir: str) -> pa.Table:
    """TypeTokenFilter (core/TypeTokenFilter.java:29, whitelist
    ALPHANUM+APOSTROPHE) over the classic grammar-exercise corpus:
    NUM/HOST/EMAIL/COMPANY/ACRONYM tokens are dropped by TYPE, then
    the usual ClassicFilter + lower + stop chain."""
    from ..analysis_en import ENGLISH_STOP_WORDS
    from ..tokenizers import classic_alpha_tokenize

    def toks(tx: str, d: int) -> list[str]:
        return [t for t in
                classic_alpha_tokenize(_classic_corpus_doc(tx, d))
                if t not in ENGLISH_STOP_WORDS]
    return _rawtok_stats(sf_dir, toks)


def ft_html_strip(sf_dir: str) -> pa.Table:
    """HTMLStripCharFilter (charfilter/HTMLStripCharFilter.jflex): each
    word is wrapped in cycling markup (inline tag / block tag / entity
    / bare) and the REAL strip + standard tokenizer must round-trip to
    the original words (identity oracle)."""
    from ..analysis import tokenize
    from ..charfilter import html_strip

    def toks(tx: str, d: int) -> list[str]:
        parts: list[str] = []
        for w in _words(tx):
            v = (len(w) + d) % 4
            if v == 0:
                parts.append(w)
            elif v == 1:
                parts.append(f"<b>{w}</b>")
            elif v == 2:
                parts.append(f"<div class='x'>{w}</div>")
            else:
                parts.append("&amp;" + w)
        return tokenize(html_strip(" ".join(parts))[0])
    return _rawtok_stats(sf_dir, toks)


def ft_mapping_char(sf_dir: str) -> pa.Table:
    """MappingCharFilter (charfilter/MappingCharFilter.java:36 with
    NormalizeCharMap rules qu->k, 0->o, 1->l): longest-match greedy
    rewrite before tokenization."""
    from ..charfilter import CHAR_FILTERS
    mp = CHAR_FILTERS["mapping"]
    return _rawtok_stats(sf_dir, lambda tx, d: _words(mp(tx)[0]))


def ft_pattern_replace_char(sf_dir: str) -> pa.Table:
    """PatternReplaceCharFilter (pattern/PatternReplaceCharFilter.java:
    42, [aeiou]+ -> 'a'): vowel-run collapse before tokenization."""
    from ..charfilter import CHAR_FILTERS
    pr = CHAR_FILTERS["pattern_replace"]
    return _rawtok_stats(sf_dir, lambda tx, d: _words(pr(tx)[0]))


def oracle_mapping_char_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d,
         unnest(string_split(
           replace(replace(replace(text, 'qu', 'k'), '0', 'o'),
                   '1', 'l'), ' ')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_pattern_replace_char_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d,
         unnest(string_split(
           regexp_replace(text, '[aeiou]+', 'a', 'g'), ' ')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Light stemmers (lucene_ray.lightstem — Savoy family). Engine side runs
# the REAL registered stemmer; oracles replay the published rule chains
# as ordered SQL CASE expressions (the if-chain order is the semantics).
# French is pytest-gated only (its norm step deletes duplicate-letter
# runs — a loop SQL cannot express); the full ~200k-pair reference
# vocabulary files gate all six in tests/test_lightstem.py.

def _light_stem_entry(sf_dir: str, name: str,
                      plant=None) -> pa.Table:
    from ..lightstem import LIGHT_STEMMERS
    stem = LIGHT_STEMMERS[name]

    def toks(tx: str, d: int) -> list[str]:
        ws = _words(tx)
        if plant is not None:
            ws = [plant(w) for w in ws]
        return [stem(w) for w in ws]
    return _rawtok_stats(sf_dir, toks)


def ft_german_light(sf_dir: str) -> pa.Table:
    """GermanLightStemmer (de/GermanLightStemmer.java:40)."""
    return _light_stem_entry(sf_dir, "german_light")


def ft_spanish_light(sf_dir: str) -> pa.Table:
    """SpanishLightStemmer (es/SpanishLightStemmer.java:40)."""
    return _light_stem_entry(sf_dir, "spanish_light")


def ft_italian_light(sf_dir: str) -> pa.Table:
    """ItalianLightStemmer (it/ItalianLightStemmer.java:40)."""
    return _light_stem_entry(sf_dir, "italian_light")


def ft_swedish_light(sf_dir: str) -> pa.Table:
    """SwedishLightStemmer (sv/SwedishLightStemmer.java:40)."""
    return _light_stem_entry(sf_dir, "swedish_light")


_RU_LATIN = "abcdefghijklmnopqrstuvwxyz"
_RU_CYR = "абцдефгхийклмнопщрстувшжыз"
_RU_TRANS = str.maketrans(_RU_LATIN, _RU_CYR)


def ft_russian_light(sf_dir: str) -> pa.Table:
    """RussianLightStemmer (ru/RussianLightStemmer.java:40): corpus
    words are deterministically transliterated to Cyrillic (vowels to
    vowels) so the case-suffix rules actually fire."""
    return _light_stem_entry(sf_dir, "russian_light",
                             plant=lambda w: w.translate(_RU_TRANS))


def ft_portuguese_light(sf_dir: str) -> pa.Table:
    """PortugueseLightStemmer (pt/PortugueseLightStemmer.java:40) —
    incl. the ona->ão / esa->ês rewrites whose accents the final fold
    then flattens."""
    return _light_stem_entry(sf_dir, "portuguese_light")


def ft_norwegian_light(sf_dir: str) -> pa.Table:
    """NorwegianLightStemmer, Bokmål flags (no/
    NorwegianLightStemmer.java:40)."""
    return _light_stem_entry(sf_dir, "norwegian_light")


def oracle_portuguese_light_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (
  SELECT d, CASE
    WHEN length(word) < 4 THEN word
    WHEN length(word) > 4 AND ends_with(word, 'es')
         AND substr(word, length(word)-2, 1) IN ('r','s','l','z')
      THEN substr(word, 1, length(word)-2)
    WHEN length(word) > 3 AND ends_with(word, 'ns')
      THEN substr(word, 1, length(word)-2) || 'm'
    WHEN length(word) > 4 AND ends_with(word, 'eis')
      THEN substr(word, 1, length(word)-3) || 'el'
    WHEN length(word) > 4 AND ends_with(word, 'ais')
      THEN substr(word, 1, length(word)-2) || 'l'
    WHEN length(word) > 4 AND ends_with(word, 'is')
      THEN substr(word, 1, length(word)-1) || 'l'
    WHEN length(word) > 6 AND ends_with(word, 'mente')
      THEN substr(word, 1, length(word)-5)
    WHEN length(word) > 3 AND ends_with(word, 's')
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS r, length(word) >= 4 AS big
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, big, CASE
    WHEN big AND length(r) > 3 AND ends_with(r, 'a') THEN CASE
      WHEN length(r) > 7 AND (ends_with(r,'inha') OR ends_with(r,'iaca')
                              OR ends_with(r,'eira'))
        THEN substr(r, 1, length(r)-1) || 'o'
      WHEN length(r) > 6 AND right(r, 3) IN
           ('osa','ica','ida','ada','iva','ama')
        THEN substr(r, 1, length(r)-1) || 'o'
      WHEN length(r) > 6 AND ends_with(r, 'ona')
        THEN substr(r, 1, length(r)-3) || 'ão'
      WHEN length(r) > 6 AND ends_with(r, 'ora')
        THEN substr(r, 1, length(r)-1)
      WHEN length(r) > 6 AND ends_with(r, 'esa')
        THEN substr(r, 1, length(r)-3) || 'ês'
      WHEN length(r) > 6 AND ends_with(r, 'na')
        THEN substr(r, 1, length(r)-1) || 'o'
      ELSE r END
    ELSE r END AS r
  FROM s1
), s3 AS (
  -- the engine's len<4 early return skips the END fold
  -- (lightstem.portuguese_light_stem returns w unfolded)
  SELECT d, CASE WHEN NOT big THEN r ELSE translate(
    CASE WHEN big AND length(r) > 4 AND right(r, 1) IN ('e','a','o')
         THEN substr(r, 1, length(r)-1) ELSE r END,
    'àáâäãòóôöõèéêëùúûüìíîïç', 'aaaaaoooooeeeeuuuuiiiic') END AS term
  FROM s2
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s3 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_norwegian_light_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (
  SELECT d, CASE WHEN length(word) > 4 AND ends_with(word, 's')
    THEN substr(word, 1, length(word)-1) ELSE word END AS r
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, CASE
    WHEN length(r) > 7 AND (ends_with(r,'heter') OR ends_with(r,'heten'))
      THEN substr(r, 1, length(r)-5)
    WHEN length(r) > 5 AND (ends_with(r,'dom') OR ends_with(r,'het'))
      THEN substr(r, 1, length(r)-3)
    WHEN length(r) > 7 AND (ends_with(r,'elser') OR ends_with(r,'elsen'))
      THEN substr(r, 1, length(r)-5)
    WHEN length(r) > 6 AND right(r, 4) IN ('ende','else','este','eren')
      THEN substr(r, 1, length(r)-4)
    WHEN length(r) > 5 AND right(r, 3) IN ('ere','est','ene')
      THEN substr(r, 1, length(r)-3)
    WHEN length(r) > 4 AND right(r, 2) IN ('er','en','et','st','te')
      THEN substr(r, 1, length(r)-2)
    WHEN length(r) > 3 AND right(r, 1) IN ('a','e','n')
      THEN substr(r, 1, length(r)-1)
    ELSE r END AS term
  FROM s1
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s2 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


_DE_ST_SQL = "('b','d','f','g','h','k','l','m','n','t')"


def oracle_german_light_sql() -> str:
    # the engine folds umlauts/accents FIRST (lightstem._DE_FOLD)
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), w AS (
  SELECT d, translate(word, 'äàáâöòóôïìíîüùúû', 'aaaaooooiiiiuuuu') AS word FROM w0
), s1 AS (
  SELECT d, CASE
    WHEN length(word) > 5 AND ends_with(word, 'ern')
      THEN substr(word, 1, length(word)-3)
    WHEN length(word) > 4 AND substr(word, length(word)-1, 1) = 'e'
         AND right(word, 1) IN ('m','n','r','s')
      THEN substr(word, 1, length(word)-2)
    WHEN length(word) > 3 AND ends_with(word, 'e')
      THEN substr(word, 1, length(word)-1)
    WHEN length(word) > 3 AND ends_with(word, 's')
         AND substr(word, length(word)-1, 1) IN {_DE_ST_SQL}
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS r
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, CASE
    WHEN length(r) > 5 AND ends_with(r, 'est')
      THEN substr(r, 1, length(r)-3)
    WHEN length(r) > 4 AND (ends_with(r, 'er') OR ends_with(r, 'en'))
      THEN substr(r, 1, length(r)-2)
    WHEN length(r) > 4 AND ends_with(r, 'st')
         AND substr(r, length(r)-2, 1) IN {_DE_ST_SQL}
      THEN substr(r, 1, length(r)-2)
    ELSE r END AS term
  FROM s1
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s2 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_spanish_light_sql() -> str:
    # the engine folds accents before the suffix checks (len guard is
    # length-invariant under the fold)
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), w AS (
  SELECT d, CASE WHEN length(word) < 5 THEN word
                 ELSE translate(word, 'àáâäòóôöèéêëùúûüìíîï', 'aaaaooooeeeeuuuuiiii') END AS word FROM w0
), s AS (
  SELECT d, CASE
    WHEN length(word) < 5 THEN word
    WHEN right(word, 1) IN ('o','a','e')
      THEN substr(word, 1, length(word)-1)
    WHEN ends_with(word, 'eses') THEN substr(word, 1, length(word)-2)
    WHEN ends_with(word, 'ces')
      THEN substr(word, 1, length(word)-3) || 'z'
    WHEN ends_with(word, 's')
         AND substr(word, length(word)-1, 1) IN ('o','a','e')
      THEN substr(word, 1, length(word)-2)
    ELSE word END AS term
  FROM w WHERE word <> ''
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_italian_light_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s AS (
  SELECT d, CASE
    WHEN length(word) < 6 THEN word
    WHEN ends_with(word, 'ie') OR ends_with(word, 'he')
      THEN substr(word, 1, length(word)-2)
    WHEN ends_with(word, 'e') THEN substr(word, 1, length(word)-1)
    WHEN ends_with(word, 'hi') OR ends_with(word, 'ii')
      THEN substr(word, 1, length(word)-2)
    WHEN ends_with(word, 'i') THEN substr(word, 1, length(word)-1)
    WHEN ends_with(word, 'ia') THEN substr(word, 1, length(word)-2)
    WHEN ends_with(word, 'a') THEN substr(word, 1, length(word)-1)
    WHEN ends_with(word, 'io') THEN substr(word, 1, length(word)-2)
    WHEN ends_with(word, 'o') THEN substr(word, 1, length(word)-1)
    ELSE word END AS term
  FROM w WHERE word <> ''
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_swedish_light_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (
  SELECT d, CASE WHEN length(word) > 4 AND ends_with(word, 's')
    THEN substr(word, 1, length(word)-1) ELSE word END AS r
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, CASE
    WHEN length(r) > 7 AND (ends_with(r,'elser') OR ends_with(r,'heten'))
      THEN substr(r, 1, length(r)-5)
    WHEN length(r) > 6 AND right(r, 4) IN
         ('arne','erna','ande','else','aste','orna','aren')
      THEN substr(r, 1, length(r)-4)
    WHEN length(r) > 5 AND right(r, 3) IN ('are','ast','het')
      THEN substr(r, 1, length(r)-3)
    WHEN length(r) > 4 AND right(r, 2) IN
         ('ar','er','or','en','at','te','et')
      THEN substr(r, 1, length(r)-2)
    WHEN length(r) > 3 AND right(r, 1) IN ('t','a','e','n')
      THEN substr(r, 1, length(r)-1)
    ELSE r END AS term
  FROM s1
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s2 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_russian_light_sql() -> str:
    from ..lightstem import _RU_1, _RU_2, _RU_3, _RU_4
    in4 = ", ".join(f"'{x}'" for x in _RU_4)
    in3 = ", ".join(f"'{x}'" for x in _RU_3)
    in2 = ", ".join(f"'{x}'" for x in _RU_2)
    in1 = ", ".join(f"'{x}'" for x in sorted(_RU_1))
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_RU_LATIN}', '{_RU_CYR}') AS word
  FROM documents
), rc AS (
  SELECT d, CASE
    WHEN length(word) > 6 AND right(word, 4) IN ({in4})
      THEN substr(word, 1, length(word)-4)
    WHEN length(word) > 5 AND right(word, 3) IN ({in3})
      THEN substr(word, 1, length(word)-3)
    WHEN length(word) > 4 AND right(word, 2) IN ({in2})
      THEN substr(word, 1, length(word)-2)
    WHEN length(word) > 3 AND right(word, 1) IN ({in1})
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS r
  FROM w WHERE word <> ''
), nz AS (
  SELECT d, CASE
    WHEN length(r) > 3 AND right(r, 1) IN ('ь','и')
      THEN substr(r, 1, length(r)-1)
    WHEN length(r) > 3 AND right(r, 2) = 'нн'
      THEN substr(r, 1, length(r)-1)
    ELSE r END AS term
  FROM rc
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM nz GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Minimal / misc stemmers (lucene_ray.stemmisc). Engine side runs the
# REAL registered stemmer over the raw corpus words; oracles replay the
# published rule chain as ordered SQL CASE stages (rule order IS the
# semantics — a CASE falls through to the next WHEN exactly like the
# reference's next-rule scan, including RSLP whole-word exceptions).
# Bulgarian/Hindi/Sorani are pytest-golden-gated only: their scripts
# never occur in the corpus so a driver entry would be identity.

def _misc_stem_entry(sf_dir: str, name: str,
                     pluralize: bool = False) -> pa.Table:
    """``pluralize`` plants a trailing 's' on every corpus word (the
    corpus vocabulary has no s-final words, so s-suffix rule chains
    would otherwise gate only the identity path); the oracle applies
    the same ``word || 's'``."""
    from ..stemmisc import MISC_STEMMERS
    stem = MISC_STEMMERS[name]
    if pluralize:
        return _rawtok_stats(
            sf_dir, lambda tx, d: [stem(w + "s") for w in _words(tx)])
    return _rawtok_stats(
        sf_dir, lambda tx, d: [stem(w) for w in _words(tx)])


def ft_english_minimal(sf_dir: str) -> pa.Table:
    """EnglishMinimalStemFilter (en/EnglishMinimalStemmer.java:27)."""
    return _misc_stem_entry(sf_dir, "english_minimal", pluralize=True)


def ft_german_minimal(sf_dir: str) -> pa.Table:
    """GermanMinimalStemFilter (de/GermanMinimalStemmer.java:40)."""
    return _misc_stem_entry(sf_dir, "german_minimal")


def ft_french_minimal(sf_dir: str) -> pa.Table:
    """FrenchMinimalStemFilter (fr/FrenchMinimalStemmer.java:40) —
    unlike the light stemmer, its duplicate-letter step fires at most
    once, so it IS SQL-expressible."""
    return _misc_stem_entry(sf_dir, "french_minimal")


def ft_norwegian_minimal(sf_dir: str) -> pa.Table:
    """NorwegianMinimalStemFilter, Bokmål flags (no/
    NorwegianMinimalStemmer.java:45)."""
    return _misc_stem_entry(sf_dir, "norwegian_minimal")


def ft_portuguese_minimal(sf_dir: str) -> pa.Table:
    """PortugueseMinimalStemFilter (pt/PortugueseMinimalStemmer.java:31)
    — the RSLP Plural step with whole-word exception sets."""
    return _misc_stem_entry(sf_dir, "portuguese_minimal",
                            pluralize=True)


def ft_czech_stem(sf_dir: str) -> pa.Table:
    """CzechStemFilter (cz/CzechStemmer.java:32): case removal +
    possessive removal + palatalization normalize."""
    return _misc_stem_entry(sf_dir, "czech_stem")


def oracle_english_minimal_sql() -> str:
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS raw
  FROM documents
), w AS (
  SELECT d, raw || 's' AS word FROM w0 WHERE raw <> ''
), s AS (
  SELECT d, CASE
    WHEN length(word) < 3 OR right(word, 1) <> 's' THEN word
    WHEN substr(word, length(word)-1, 1) IN ('u','s') THEN word
    WHEN substr(word, length(word)-1, 1) = 'e' AND length(word) > 3
         AND substr(word, length(word)-2, 1) = 'i'
         AND substr(word, length(word)-3, 1) NOT IN ('a','e')
      THEN substr(word, 1, length(word)-3) || 'y'
    WHEN substr(word, length(word)-1, 1) = 'e'
         AND substr(word, length(word)-2, 1) IN ('i','a','o','e')
      THEN word
    ELSE substr(word, 1, length(word)-1) END AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_german_minimal_sql() -> str:
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS raw
  FROM documents
), w AS (
  SELECT d, length(raw) >= 5 AS big,
         CASE WHEN length(raw) >= 5
              THEN translate(raw, 'äöü', 'aou') ELSE raw END AS word
  FROM w0 WHERE raw <> ''
), s AS (
  SELECT d, CASE
    WHEN NOT big THEN word
    WHEN length(word) > 6 AND ends_with(word, 'nen')
      THEN substr(word, 1, length(word)-3)
    WHEN length(word) > 5 AND right(word, 2) IN ('en','se','es','er')
      THEN substr(word, 1, length(word)-2)
    WHEN right(word, 1) IN ('n','e','s','r')
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_french_minimal_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (
  SELECT d, length(word) < 6 OR right(word, 1) = 'x' AS fin,
    CASE
      WHEN length(word) < 6 THEN word
      WHEN right(word, 1) = 'x' THEN CASE
        WHEN substr(word, length(word)-2, 2) = 'au'
          THEN substr(word, 1, length(word)-2) || 'l'
        ELSE substr(word, 1, length(word)-1) END
      ELSE word END AS r
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, fin, CASE WHEN NOT fin AND right(r,1) = 's'
    THEN substr(r, 1, length(r)-1) ELSE r END AS r FROM s1
), s3 AS (
  SELECT d, fin, CASE WHEN NOT fin AND right(r,1) = 'r'
    THEN substr(r, 1, length(r)-1) ELSE r END AS r FROM s2
), s4 AS (
  SELECT d, fin, CASE WHEN NOT fin AND right(r,1) = 'e'
    THEN substr(r, 1, length(r)-1) ELSE r END AS r FROM s3
), s5 AS (
  SELECT d, fin, CASE WHEN NOT fin AND right(r,1) = 'é'
    THEN substr(r, 1, length(r)-1) ELSE r END AS r FROM s4
), s6 AS (
  SELECT d, CASE WHEN NOT fin AND length(r) >= 2
                  AND right(r, 1) = substr(r, length(r)-1, 1)
                  AND regexp_matches(right(r, 1), '^[[:alpha:]]$')
    THEN substr(r, 1, length(r)-1) ELSE r END AS term FROM s5
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s6 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_norwegian_minimal_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (
  SELECT d, CASE WHEN length(word) > 4 AND ends_with(word, 's')
    THEN substr(word, 1, length(word)-1) ELSE word END AS r
  FROM w WHERE word <> ''
), s2 AS (
  SELECT d, CASE
    WHEN length(r) > 5 AND ends_with(r, 'ene')
      THEN substr(r, 1, length(r)-3)
    WHEN length(r) > 4 AND right(r, 2) IN ('er','en','et')
      THEN substr(r, 1, length(r)-2)
    WHEN length(r) > 3 AND right(r, 1) IN ('a','e')
      THEN substr(r, 1, length(r)-1)
    ELSE r END AS term
  FROM s1
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s2 GROUP BY term ORDER BY DF DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_portuguese_minimal_sql() -> str:
    from ..stemmisc import _PT_PLURAL
    whens = []
    for suf, mn, rep, exc in _PT_PLURAL:
        cond = (f"length(word) - {len(suf)} >= {mn} "
                f"AND ends_with(word, '{suf}')")
        if exc:
            lst = ", ".join(f"'{e}'" for e in exc)
            cond += f" AND word NOT IN ({lst})"
        out = f"substr(word, 1, length(word)-{len(suf)})"
        if rep:
            out += f" || '{rep}'"
        whens.append(f"    WHEN {cond}\n      THEN {out}")
    chain = "\n".join(whens)
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS raw
  FROM documents
), w AS (
  SELECT d, raw || 's' AS word FROM w0 WHERE raw <> ''
), s AS (
  SELECT d, CASE
    WHEN length(word) < 3 OR NOT ends_with(word, 's') THEN word
{chain}
    ELSE word END AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_czech_stem_sql() -> str:
    from ..stemmisc import _CZ_2, _CZ_3
    in3 = ", ".join(f"'{x}'" for x in _CZ_3)
    in2 = ", ".join(f"'{x}'" for x in _CZ_2)
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), rc AS (
  SELECT d, CASE
    WHEN length(word) > 7 AND ends_with(word, 'atech')
      THEN substr(word, 1, length(word)-5)
    WHEN length(word) > 6 AND right(word, 4) IN ('ětem','etem','atům')
      THEN substr(word, 1, length(word)-4)
    WHEN length(word) > 5 AND right(word, 3) IN ({in3})
      THEN substr(word, 1, length(word)-3)
    WHEN length(word) > 4 AND right(word, 2) IN ({in2})
      THEN substr(word, 1, length(word)-2)
    WHEN length(word) > 3 AND right(word, 1) IN
         ('a','e','i','o','u','ů','y','á','é','í','ý','ě')
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS r
  FROM w WHERE word <> ''
), rp AS (
  SELECT d, CASE WHEN length(r) > 5 AND right(r, 2) IN ('ov','in','ův')
    THEN substr(r, 1, length(r)-2) ELSE r END AS r FROM rc
), nz AS (
  SELECT d, CASE
    WHEN r = '' THEN r
    WHEN ends_with(r, 'čt') THEN substr(r, 1, length(r)-2) || 'ck'
    WHEN ends_with(r, 'št') THEN substr(r, 1, length(r)-2) || 'sk'
    WHEN right(r, 1) IN ('c','č') THEN substr(r, 1, length(r)-1) || 'k'
    WHEN right(r, 1) IN ('z','ž') THEN substr(r, 1, length(r)-1) || 'h'
    WHEN length(r) > 1 AND substr(r, length(r)-1, 1) = 'e'
      THEN substr(r, 1, length(r)-2) || right(r, 1)
    WHEN length(r) > 2 AND substr(r, length(r)-1, 1) = 'ů'
      THEN substr(r, 1, length(r)-2) || 'o' || right(r, 1)
    ELSE r END AS term
  FROM rp
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM nz GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Full RSLP/RSLG + Spanish plural stemmers (lucene_ray.rslp). The
# oracles are GENERATED from the same rule tables the engine compiles
# (rslp_data.py): each step becomes one ordered SQL CASE (first-match
# -fires; an exception falls through to the next WHEN exactly like the
# reference's next-rule scan); the conditional noun/verb/vowel flow is
# expressed by comparing stage columns; Galician's
# augmentative-until-fixpoint runs as a recursive CTE.

def _rslp_step_case(col: str, step) -> str:
    mn, whole, conds, rules = step
    whens = []
    for suf, rmin, rep, exc in rules:
        cond = (f"length({col}) - {len(suf)} >= {rmin} "
                f"AND ends_with({col}, '{suf}')")
        if exc:
            if whole:
                lst = ", ".join(f"'{e}'" for e in exc)
                cond += f" AND {col} NOT IN ({lst})"
            else:
                ors = " OR ".join(f"ends_with({col}, '{e}')"
                                  for e in exc)
                cond += f" AND NOT ({ors})"
        out = f"substr({col}, 1, length({col})-{len(suf)})"
        if rep:
            out += f" || '{rep}'"
        whens.append(f"WHEN {cond} THEN {out}")
    guard = f"length({col}) < {mn}"
    if conds:
        cs = " OR ".join(f"ends_with({col}, '{c}')" for c in conds)
        guard = f"{guard} OR NOT ({cs})"
    body = "\n    ".join(whens)
    return (f"CASE WHEN {guard} THEN {col}\n    {body}\n"
            f"    ELSE {col} END")


def ft_portuguese_rslp(sf_dir: str) -> pa.Table:
    """PortugueseStemFilter — full RSLP (pt/PortugueseStemmer.java:46),
    32k-pair vocabulary-gated in tests/test_rslp.py."""
    from ..rslp import RSLP_STEMMERS
    stem = RSLP_STEMMERS["portuguese_rslp"]
    return _rawtok_stats(
        sf_dir, lambda tx, d: [stem(w) for w in _words(tx)])


def ft_galician_rslp(sf_dir: str) -> pa.Table:
    """GalicianStemFilter — RSLG (gl/GalicianStemmer.java:48)."""
    from ..rslp import RSLP_STEMMERS
    stem = RSLP_STEMMERS["galician_rslp"]
    return _rawtok_stats(
        sf_dir, lambda tx, d: [stem(w) for w in _words(tx)])


def ft_spanish_plural(sf_dir: str) -> pa.Table:
    """SpanishPluralStemFilter (es/SpanishPluralStemmer.java:46).
    Corpus words are pluralized (``w + 's'``) so the rule chain fires
    — the corpus vocabulary has no s-final words."""
    from ..rslp import RSLP_STEMMERS
    stem = RSLP_STEMMERS["spanish_plural"]
    return _rawtok_stats(
        sf_dir, lambda tx, d: [stem(w + "s") for w in _words(tx)])


_RSLP_TAIL = f"""SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM fin GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_portuguese_rslp_sql() -> str:
    from ..rslp_data import PT_STEPS
    pl = _rslp_step_case("word", PT_STEPS["Plural"])
    ad = _rslp_step_case("r1", PT_STEPS["Adverb"])
    fe = _rslp_step_case("r2", PT_STEPS["Feminine"])
    au = _rslp_step_case("r3", PT_STEPS["Augmentative"])
    no = _rslp_step_case("r4", PT_STEPS["Noun"])
    ve = _rslp_step_case("r4", PT_STEPS["Verb"])
    vo = _rslp_step_case("r4", PT_STEPS["Vowel"])
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (SELECT d, {pl} AS r1 FROM w WHERE word <> ''),
s2 AS (SELECT d, {ad} AS r2 FROM s1),
s3 AS (SELECT d, {fe} AS r3 FROM s2),
s4 AS (SELECT d, {au} AS r4 FROM s3),
s5 AS (SELECT d, r4, {no} AS rn FROM s4),
s6 AS (SELECT d, r4, rn,
       CASE WHEN rn <> r4 THEN rn ELSE {ve} END AS rv FROM s5),
fin AS (SELECT d, translate(
  CASE WHEN rn <> r4 THEN rn WHEN rv <> r4 THEN rv ELSE {vo} END,
  'àáâãäåçèéêëìíîïñòóôõöùúûüýÿ',
  'aaaaaaceeeeiiiinooooouuuuyy') AS term FROM s6)
{_RSLP_TAIL}"""


def oracle_galician_rslp_sql() -> str:
    from ..rslp_data import GL_STEPS
    pl = _rslp_step_case("word", GL_STEPS["Plural"])
    un = _rslp_step_case("r1", GL_STEPS["Unification"])
    ad = _rslp_step_case("r2", GL_STEPS["Adverb"])
    au = _rslp_step_case("r", GL_STEPS["Augmentative"])
    no = _rslp_step_case("r4", GL_STEPS["Noun"])
    ve = _rslp_step_case("r4", GL_STEPS["Verb"])
    vo = _rslp_step_case("rnv", GL_STEPS["Vowel"])
    return f"""WITH RECURSIVE w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s1 AS (SELECT d, {pl} AS r1 FROM w WHERE word <> ''),
s2 AS (SELECT d, {un} AS r2 FROM s1),
s3 AS (SELECT d, {ad} AS r FROM s2),
aug AS (
  SELECT d, r FROM s3
  UNION ALL
  SELECT d, {au} AS r2 FROM aug WHERE {au} <> r
), s4 AS (
  SELECT d, r AS r4 FROM aug WHERE {au} = r
), s5 AS (SELECT d, r4, {no} AS rn FROM s4),
s6 AS (SELECT d,
       CASE WHEN rn <> r4 THEN rn ELSE {ve} END AS rnv FROM s5),
fin AS (SELECT d, translate({vo}, 'áéêíóú', 'aeeiou') AS term
        FROM s6)
{_RSLP_TAIL}"""


def oracle_spanish_plural_sql() -> str:
    from ..rslp import _ES_INVARIANT, _ES_SPECIAL
    inv = ", ".join(f"'{x}'" for x in sorted(_ES_INVARIANT))
    spc = ", ".join(f"'{x}'" for x in sorted(_ES_SPECIAL))
    return f"""WITH w1 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS raw
  FROM documents
), w0 AS (
  SELECT d, raw || 's' AS raw FROM w1 WHERE raw <> ''
), w AS (
  SELECT d, CASE WHEN length(raw) < 4 THEN raw
    ELSE translate(raw, 'àáâäòóôöèéêëùúûüìíîï',
                   'aaaaooooeeeeuuuuiiii') END AS word
  FROM w0
), fin AS (
  SELECT d, CASE
    WHEN length(word) < 4 THEN word
    WHEN word IN ({inv}) THEN word
    WHEN word IN ({spc}) THEN substr(word, 1, length(word)-2)
    WHEN right(word, 1) <> 's' THEN word
    WHEN substr(word, length(word)-1, 1) NOT IN ('a','e','i','o','u')
      THEN substr(word, 1, length(word)-1)
    WHEN substr(word, length(word)-3, 1) = 'q'
         OR (substr(word, length(word)-3, 1) = 'g'
             AND substr(word, length(word)-2, 1) = 'u'
             AND substr(word, length(word)-1, 1) IN ('i','e'))
      THEN substr(word, 1, length(word)-1)
    WHEN substr(word, length(word)-3, 1) IN ('a','e','i','o','u')
         AND substr(word, length(word)-2, 1) = 'r'
         AND substr(word, length(word)-1, 1) = 'e'
      THEN substr(word, 1, length(word)-2)
    WHEN substr(word, length(word)-3, 1) IN ('a','e','i','o','u')
         AND substr(word, length(word)-2, 1) IN ('d','l','n','x')
         AND substr(word, length(word)-1, 1) = 'e'
      THEN substr(word, 1, length(word)-2)
    WHEN substr(word, length(word)-2, 1) IN ('y','u')
         AND substr(word, length(word)-1, 1) = 'e'
      THEN substr(word, 1, length(word)-2)
    WHEN substr(word, length(word)-3, 1) IN ('u','l','r','t','n')
         AND substr(word, length(word)-2, 1) = 'i'
         AND substr(word, length(word)-1, 1) = 'e'
      THEN substr(word, 1, length(word)-2)
    WHEN substr(word, length(word)-2, 1) = 's'
         AND substr(word, length(word)-1, 1) = 'e'
      THEN substr(word, 1, length(word)-2)
    WHEN substr(word, length(word)-2, 1) IN ('a','e','i','o','u')
         AND substr(word, length(word)-1, 1) = 'i'
      THEN substr(word, 1, length(word)-2) || 'y'
    WHEN substr(word, length(word)-2, 1) = 'd'
         AND substr(word, length(word)-1, 1) = 'i'
      THEN substr(word, 1, length(word)-2) || 'y'
    WHEN substr(word, length(word)-1, 1) = 'e'
         AND substr(word, length(word)-2, 1) = 'c'
      THEN substr(word, 1, length(word)-3) || 'z'
    WHEN substr(word, length(word)-1, 1) IN ('a','e','i','o','u')
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS term
  FROM w
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Latvian / Indonesian / Arabic / Bengali stemmers (lucene_ray.
# stemlang). Latvian and Indonesian run raw (their ASCII-reachable
# rules fire on the corpus); Arabic and Bengali plant their scripts
# via per-char transliteration like the langnorm entries. Oracles are
# generated from the same tables the engine uses; rules needing
# letters the corpus can never contain (Latvian š/ņ/č/ļ/ž
# palatalization beyond the labial j-drop) are omitted from the SQL
# and covered by the reference-golden pytest gates instead.

def ft_latvian_stem(sf_dir: str) -> pa.Table:
    """LatvianStemFilter (lv/LatvianStemmer.java:36)."""
    from ..stemlang import latvian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [latvian_stem(w) for w in _words(tx)])


def ft_indonesian_stem(sf_dir: str) -> pa.Table:
    """IndonesianStemFilter (id/IndonesianStemmer.java:30),
    derivational mode. Corpus words are planted as ``me<w>kan`` (an
    applicative verb shape) so the prefix→suffix→second-order flow and
    the removed-prefix flags actually fire — unplanted corpus words
    have too few syllables or no affixes."""
    from ..stemlang import indonesian_stem
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [indonesian_stem("me" + w + "kan")
                       for w in _words(tx)])


_AR_STEM_FROM = "alwbkfheyntmsrdcgijopquvxz"
_AR_STEM_TO = ("الوبكفهةينتمسردشجعزمصقطظخث")


def ft_arabic_stem(sf_dir: str) -> pa.Table:
    """ArabicStemFilter (ar/ArabicStemmer.java:33): planted Arabic
    letters so article prefixes and the suffix chain fire."""
    from ..stemlang import arabic_stem
    plant = str.maketrans(_AR_STEM_FROM, _AR_STEM_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [arabic_stem(w.translate(plant))
                       for w in _words(tx)])


_BN_STEM_FROM = "aeioutnlrmkbcdsfghjpqvwxyz"
_BN_STEM_TO = ("ােিোুতনলরমকবছদসফগহজপখভওষযঝ")


def ft_bengali_stem(sf_dir: str) -> pa.Table:
    """BengaliStemFilter (bn/BengaliStemmer.java:31): planted Bengali
    matras/consonants so the suffix groups fire."""
    from ..stemlang import bengali_stem
    plant = str.maketrans(_BN_STEM_FROM, _BN_STEM_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [bengali_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_latvian_stem_sql() -> str:
    from ..stemlang import _LV_AFFIXES
    whens = []
    for affix, vc, pal in _LV_AFFIXES:
        cond = (f"nv > {vc} AND length(word) >= {len(affix) + 3} "
                f"AND ends_with(word, '{affix}')")
        stem = f"substr(word, 1, length(word)-{len(affix)})"
        if pal:
            out = (f"CASE WHEN right({stem}, 2) IN "
                   f"('pj','bj','mj','vj') THEN substr(word, 1, "
                   f"length(word)-{len(affix) + 1}) ELSE {stem} END")
        else:
            out = stem
        whens.append(f"    WHEN {cond}\n      THEN {out}")
    chain = "\n".join(whens)
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), w AS (
  SELECT d, word,
         length(word) - length(translate(word, 'aeiouāīēū', '')) AS nv
  FROM w0 WHERE word <> ''
), s AS (
  SELECT d, CASE
{chain}
    ELSE word END AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def _id_first_order_case(c: str) -> str:
    v = "('a','e','i','o','u')"
    return f"""CASE
    WHEN starts_with({c}, 'meng') THEN substr({c}, 5)
    WHEN starts_with({c}, 'meny') AND length({c}) > 4
         AND substr({c}, 5, 1) IN {v} THEN 's' || substr({c}, 5)
    WHEN starts_with({c}, 'men') OR starts_with({c}, 'mem')
      THEN substr({c}, 4)
    WHEN starts_with({c}, 'me') THEN substr({c}, 3)
    WHEN starts_with({c}, 'peng') THEN substr({c}, 5)
    WHEN starts_with({c}, 'peny') AND length({c}) > 4
         AND substr({c}, 5, 1) IN {v} THEN 's' || substr({c}, 5)
    WHEN starts_with({c}, 'peny') THEN substr({c}, 5)
    WHEN starts_with({c}, 'pen') AND length({c}) > 3
         AND substr({c}, 4, 1) IN {v} THEN 't' || substr({c}, 4)
    WHEN starts_with({c}, 'pen') OR starts_with({c}, 'pem')
      THEN substr({c}, 4)
    WHEN starts_with({c}, 'di') THEN substr({c}, 3)
    WHEN starts_with({c}, 'ter') THEN substr({c}, 4)
    WHEN starts_with({c}, 'ke') THEN substr({c}, 3)
    ELSE {c} END"""


def _id_first_flag_case(c: str) -> str:
    return f"""CASE
    WHEN starts_with({c}, 'meng') OR starts_with({c}, 'meny')
         OR starts_with({c}, 'men') OR starts_with({c}, 'mem')
         OR starts_with({c}, 'me') THEN 'MENG'
    WHEN starts_with({c}, 'peng') OR starts_with({c}, 'peny')
         OR starts_with({c}, 'pen') OR starts_with({c}, 'pem')
      THEN 'PENG'
    WHEN starts_with({c}, 'di') THEN 'DI'
    WHEN starts_with({c}, 'ter') THEN 'TER'
    WHEN starts_with({c}, 'ke') THEN 'KE'
    ELSE '' END"""


def _id_second_order_case(c: str) -> str:
    v = "('a','e','i','o','u')"
    return f"""CASE
    WHEN starts_with({c}, 'ber') THEN substr({c}, 4)
    WHEN {c} = 'belajar' THEN substr({c}, 4)
    WHEN starts_with({c}, 'be') AND length({c}) > 4
         AND substr({c}, 3, 1) NOT IN {v}
         AND substr({c}, 4, 1) = 'e' AND substr({c}, 5, 1) = 'r'
      THEN substr({c}, 3)
    WHEN starts_with({c}, 'per') THEN substr({c}, 4)
    WHEN {c} = 'pelajar' THEN substr({c}, 4)
    WHEN starts_with({c}, 'pe') THEN substr({c}, 3)
    ELSE {c} END"""


def _id_second_flag_case(c: str) -> str:
    v = "('a','e','i','o','u')"
    return f"""CASE
    WHEN starts_with({c}, 'ber') OR {c} = 'belajar'
         OR (starts_with({c}, 'be') AND length({c}) > 4
             AND substr({c}, 3, 1) NOT IN {v}
             AND substr({c}, 4, 1) = 'e'
             AND substr({c}, 5, 1) = 'r') THEN 'BER'
    WHEN starts_with({c}, 'per') OR {c} = 'pelajar' THEN ''
    WHEN starts_with({c}, 'pe') THEN 'PE'
    ELSE '' END"""


def _id_suffix_case(c: str, f: str) -> str:
    return f"""CASE
    WHEN ends_with({c}, 'kan') AND {f} NOT IN ('KE','PENG','PE')
      THEN substr({c}, 1, length({c})-3)
    WHEN ends_with({c}, 'an') AND {f} NOT IN ('DI','MENG','TER')
      THEN substr({c}, 1, length({c})-2)
    WHEN ends_with({c}, 'i') AND NOT ends_with({c}, 'si')
         AND {f} NOT IN ('BER','KE','PENG')
      THEN substr({c}, 1, length({c})-1)
    ELSE {c} END"""


def oracle_indonesian_stem_sql() -> str:
    """Replays IndonesianStemmer's staged flow: particle → possessive
    → first-order prefix; if it fired, suffix then (if suffix fired)
    second-order prefix; else second-order prefix then suffix. The
    removed-prefix flags gate the suffix rules."""
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), wp AS (
  SELECT d, 'me' || word || 'kan' AS word FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word,
         length(word) - length(translate(word, 'aeiou', '')) AS ns0
  FROM wp
), t1 AS (
  SELECT d, ns0, CASE WHEN ns0 > 2 AND (ends_with(word,'kah')
      OR ends_with(word,'lah') OR ends_with(word,'pun'))
    THEN substr(word, 1, length(word)-3) ELSE word END AS r1, word
  FROM w
), t1n AS (
  SELECT d, r1, ns0 - CASE WHEN r1 <> word THEN 1 ELSE 0 END AS ns1
  FROM t1
), t2 AS (
  SELECT d, CASE
    WHEN ns1 > 2 AND (ends_with(r1,'ku') OR ends_with(r1,'mu'))
      THEN substr(r1, 1, length(r1)-2)
    WHEN ns1 > 2 AND ends_with(r1,'nya')
      THEN substr(r1, 1, length(r1)-3)
    ELSE r1 END AS r2, ns1, r1
  FROM t1n
), t2n AS (
  SELECT d, r2, ns1 - CASE WHEN r2 <> r1 THEN 1 ELSE 0 END AS ns2
  FROM t2
), t3 AS (
  SELECT d, r2, ns2,
    CASE WHEN ns2 > 2 THEN {_id_first_order_case('r2')}
         ELSE r2 END AS r3,
    CASE WHEN ns2 > 2 THEN {_id_first_flag_case('r2')}
         ELSE '' END AS f3
  FROM t2n
), t3n AS (
  SELECT d, r3, f3, r3 <> r2 AS fired3,
         ns2 - CASE WHEN r3 <> r2 THEN 1 ELSE 0 END AS ns3
  FROM t3
), t4 AS (
  SELECT d, r3, f3, fired3, ns3,
    CASE WHEN fired3 AND ns3 > 2
         THEN {_id_suffix_case('r3', 'f3')} ELSE r3 END AS sa,
    CASE WHEN NOT fired3 AND ns3 > 2
         THEN {_id_second_order_case('r3')} ELSE r3 END AS sb,
    CASE WHEN NOT fired3 AND ns3 > 2
         THEN {_id_second_flag_case('r3')} ELSE '' END AS fb
  FROM t3n
), t5 AS (
  SELECT d, CASE
    WHEN fired3 THEN
      CASE WHEN sa <> r3
                AND ns3 - 1 > 2
           THEN {_id_second_order_case('sa')} ELSE sa END
    ELSE
      CASE WHEN ns3 - (CASE WHEN sb <> r3 THEN 1 ELSE 0 END) > 2
           THEN {_id_suffix_case('sb', 'fb')} ELSE sb END
    END AS term
  FROM t4
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM t5 GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_arabic_stem_sql() -> str:
    from ..stemlang import _AR_PREFIXES, _AR_SUFFIXES
    pw = []
    for p in _AR_PREFIXES:
        need = 4 if len(p) == 1 else len(p) + 2
        pw.append(f"    WHEN length(word) >= {need} AND "
                  f"starts_with(word, '{p}') THEN substr(word, "
                  f"{len(p) + 1})")
    pchain = "\n".join(pw)
    stages = []
    prev = "r0"
    for i, s in enumerate(_AR_SUFFIXES, 1):
        cur = f"r{i}"
        stages.append(
            f"s{i} AS (SELECT d, CASE WHEN length({prev}) >= "
            f"{len(s) + 2} AND ends_with({prev}, '{s}') THEN "
            f"substr({prev}, 1, length({prev})-{len(s)}) "
            f"ELSE {prev} END AS {cur} FROM s{i - 1})")
        prev = cur
    body = ",\n".join(stages)
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_AR_STEM_FROM}', '{_AR_STEM_TO}') AS word
  FROM documents
), s0 AS (
  SELECT d, CASE
{pchain}
    ELSE word END AS r0
  FROM w WHERE word <> ''
),
{body}
SELECT {prev} AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s{len(_AR_SUFFIXES)} GROUP BY term
ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_bengali_stem_sql() -> str:
    from ..stemlang import _BN_GROUPS
    whens = []
    for n, sufs in _BN_GROUPS:
        ors = " OR ".join(f"ends_with(word, '{s}')" for s in sufs)
        whens.append(f"    WHEN length(word) > {n + 1} AND ({ors})\n"
                     f"      THEN substr(word, 1, length(word)-{n})")
    chain = "\n".join(whens)
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_BN_STEM_FROM}', '{_BN_STEM_TO}') AS word
  FROM documents
), s AS (
  SELECT d, CASE
{chain}
    ELSE word END AS term
  FROM w WHERE word <> ''
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Greek stemmer (lucene_ray.greekstem). The corpus words are planted
# into lowercase folded Greek (the same 21-letter transliteration the
# ft_greek_lower entry uses, lowercase targets) and the oracle replays
# all 22 Ntais rules as staged CTEs, including the rule-8 precedence
# quirk and every add-back; rule 21 is gated on "rules 0-20 changed
# nothing" by comparing against the planted word, exactly like the
# reference's origLen check (length-change and content-change coincide
# because every add-back is strictly shorter than its removal).

def ft_greek_stem(sf_dir: str) -> pa.Table:
    """GreekStemFilter (el/GreekStemmer.java:42) over planted folded
    Greek; reference parity is the 343-golden pytest gate."""
    from ..greekstem import greek_stem
    plant = str.maketrans(_EL_FROM, _EL_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [greek_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_greek_stem_sql() -> str:
    from ..greekstem import (_EL_EXC4, _EL_EXC6, _EL_EXC7, _EL_EXC8A,
                             _EL_EXC8B, _EL_EXC9, _EL_EXC12A,
                             _EL_EXC12B, _EL_EXC13, _EL_EXC14,
                             _EL_EXC15A, _EL_EXC15B, _EL_EXC16,
                             _EL_EXC17, _EL_EXC18, _EL_EXC19,
                             _R21_GROUPS)

    def L(c):
        return f"length({c})"

    def SUB(c, k):
        return f"substr({c}, 1, length({c})-{k})"

    def EW(c, *sufs):
        return ("(" + " OR ".join(f"ends_with({c}, '{s}')"
                                  for s in sufs) + ")")

    def INS(c, words):
        lst = ", ".join(f"'{x}'" for x in sorted(words))
        return f"{c} IN ({lst})"

    def EV(c):
        return f"right({c}, 1) IN ('α','ε','η','ι','ο','υ','ω')"

    def EVNY(c):
        return f"right({c}, 1) IN ('α','ε','η','ι','ο','ω')"

    c = "w"
    r0_rows = [
        (9, ("καθεστωτοσ", "καθεστωτων"), 4),
        (8, ("γεγονοτοσ", "γεγονοτων"), 4), (8, ("καθεστωτα",), 3),
        (7, ("τατογιου", "τατογιων"), 4), (7, ("γεγονοτα",), 3),
        (7, ("καθεστωσ",), 2),
        (6, ("σκαγιου", "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ",
             "κρεατων", "περατοσ", "περατων", "τερατοσ", "τερατων"),
         4),
        (6, ("τατογια",), 3), (6, ("γεγονοσ",), 2),
        (5, ("φαγιου", "φαγιων", "σογιου", "σογιων"), 4),
        (5, ("σκαγια", "ολογια", "κρεατα", "περατα", "τερατα"), 3),
        (4, ("φαγια", "σογια", "φωτοσ", "φωτων"), 3),
        (4, ("κρεασ", "περασ", "τερασ"), 2),
        (3, ("φωτα",), 2), (2, ("φωσ",), 1),
    ]
    w0 = " ".join(
        f"WHEN {L(c)} > {g} AND {EW(c, *sufs)} THEN {SUB(c, k)}"
        for g, sufs, k in r0_rows)
    r0 = f"CASE {w0} ELSE {c} END"

    def keep_rule(c, sufs, strip, keep, exc_sufs, negate):
        s = SUB(c, strip)
        cond = EW(s, *exc_sufs)
        if negate:
            cond = f"NOT {cond}"
        return (f"CASE WHEN {L(c)} > {strip} AND {EW(c, *sufs)} THEN "
                f"CASE WHEN {cond} THEN {SUB(c, strip - keep)} "
                f"ELSE {s} END ELSE {c} END")

    r1 = keep_rule("c0", ("αδεσ", "αδων"), 4, 2,
                   ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                    "νταντ", "κυρ", "θει", "πεθερ"), True)
    r2 = keep_rule("c1", ("εδεσ", "εδων"), 4, 2,
                   ("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                    "μιλ"), False)
    r3 = keep_rule("c2", ("ουδεσ", "ουδων"), 5, 3,
                   ("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
                    "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ",
                    "τραγ", "φε"), False)
    c3, s3 = "c3", SUB("c3", 3)
    r4 = (f"CASE WHEN {L(c3)} > 3 AND {EW(c3, 'εωσ', 'εων')} THEN "
          f"CASE WHEN {INS(s3, _EL_EXC4)} THEN {s3} || 'ε' "
          f"ELSE {s3} END ELSE {c3} END")
    c4, s42, s43 = "c4", SUB("c4", 2), SUB("c4", 3)
    r5 = (f"CASE WHEN {L(c4)} > 2 AND ends_with({c4}, 'ια') THEN "
          f"CASE WHEN {EV(s42)} THEN {s42} || 'ι' ELSE {s42} END "
          f"WHEN {L(c4)} > 3 AND {EW(c4, 'ιου', 'ιων')} THEN "
          f"CASE WHEN {EV(s43)} THEN {s43} || 'ι' ELSE {s43} END "
          f"ELSE {c4} END")
    c5, s53, s54 = "c5", SUB("c5", 3), SUB("c5", 4)
    r6 = (f"CASE WHEN {L(c5)} > 3 AND {EW(c5, 'ικα', 'ικο')} THEN "
          f"CASE WHEN {EV(s53)} OR {INS(s53, _EL_EXC6)} "
          f"THEN {s53} || 'ικ' ELSE {s53} END "
          f"WHEN {L(c5)} > 4 AND {EW(c5, 'ικου', 'ικων')} THEN "
          f"CASE WHEN {EV(s54)} OR {INS(s54, _EL_EXC6)} "
          f"THEN {s54} || 'ικ' ELSE {s54} END ELSE {c5} END")
    c6 = "c6"
    p7 = (f"CASE WHEN {L(c6)} = 5 AND ends_with({c6}, 'αγαμε') "
          f"THEN {c6} "
          f"WHEN {L(c6)} > 7 AND ends_with({c6}, 'ηθηκαμε') "
          f"THEN {SUB(c6, 7)} "
          f"WHEN {L(c6)} > 6 AND ends_with({c6}, 'ουσαμε') "
          f"THEN {SUB(c6, 6)} "
          f"WHEN {L(c6)} > 5 AND {EW(c6, 'αγαμε', 'ησαμε', 'ηκαμε')} "
          f"THEN {SUB(c6, 5)} ELSE {c6} END")
    sp7 = f"({L(c6)} = 5 AND ends_with({c6}, 'αγαμε'))"
    s73 = SUB("p7", 3)
    r7 = (f"CASE WHEN sp7 THEN {SUB('p7', 1)} "
          f"WHEN {L('p7')} > 3 AND ends_with(p7, 'αμε') THEN "
          f"CASE WHEN {INS(s73, _EL_EXC7)} THEN {s73} || 'αμ' "
          f"ELSE {s73} END ELSE p7 END")
    c7 = "c7"
    a8 = (f"CASE WHEN {L(c7)} > 8 AND ends_with({c7}, 'ιουντανε') "
          f"THEN {SUB(c7, 8)} "
          f"WHEN ({L(c7)} > 7 AND ends_with({c7}, 'ιοντανε')) "
          f"OR {EW(c7, 'ουντανε', 'ηθηκανε')} THEN {SUB(c7, 7)} "
          f"WHEN ({L(c7)} > 6 AND ends_with({c7}, 'ιοτανε')) "
          f"OR {EW(c7, 'οντανε', 'ουσανε')} THEN {SUB(c7, 6)} "
          f"WHEN ({L(c7)} > 5 AND ends_with({c7}, 'αγανε')) "
          f"OR {EW(c7, 'ησανε', 'οτανε', 'ηκανε')} THEN {SUB(c7, 5)} "
          f"ELSE {c7} END")
    b8 = (f"CASE WHEN a8 <> {c7} AND {INS('a8', _EL_EXC8A)} "
          f"THEN a8 || 'αγαν' ELSE a8 END")
    s83 = SUB("b8", 3)
    r8 = (f"CASE WHEN {L('b8')} > 3 AND ends_with(b8, 'ανε') THEN "
          f"CASE WHEN {EVNY(s83)} OR {INS(s83, _EL_EXC8B)} "
          f"THEN {s83} || 'αν' ELSE {s83} END ELSE b8 END")
    c8 = "c8"
    p9 = (f"CASE WHEN {L(c8)} > 5 AND ends_with({c8}, 'ησετε') "
          f"THEN {SUB(c8, 5)} ELSE {c8} END")
    s93 = SUB("p9", 3)
    r9_backs = ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ",
                "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ",
                "πυρ", "αιν", "συνδ", "συν", "συνθ", "χωρ", "πον",
                "βρ", "καθ", "ευθ", "εκθ", "νετ", "ρον", "αρκ",
                "βαρ", "βολ", "ωφελ")
    r9 = (f"CASE WHEN {L('p9')} > 3 AND ends_with(p9, 'ετε') THEN "
          f"CASE WHEN {INS(s93, _EL_EXC9)} OR {EVNY(s93)} "
          f"OR {EW(s93, *r9_backs)} THEN {s93} || 'ετ' "
          f"ELSE {s93} END ELSE p9 END")
    c9 = "c9"
    m10 = f"({L(c9)} > 5 AND {EW(c9, 'οντασ', 'ωντασ')})"
    s10 = f"CASE WHEN m10 THEN {SUB(c9, 5)} ELSE {c9} END"
    t10 = (f"CASE WHEN m10 AND {L('s10')} = 3 "
           f"AND ends_with(s10, 'αρχ') THEN s10 || 'οντ' "
           f"ELSE s10 END")
    r10 = (f"CASE WHEN m10 AND ends_with(t10, 'κρε') "
           f"THEN t10 || 'ωντ' ELSE t10 END")
    c10 = "c10"
    r11 = (f"CASE WHEN {L(c10)} > 6 AND ends_with({c10}, 'ομαστε') "
           f"THEN CASE WHEN {L(c10)} = 8 AND starts_with({c10}, 'ον')"
           f" THEN {SUB(c10, 1)} ELSE {SUB(c10, 6)} END "
           f"WHEN {L(c10)} > 7 AND ends_with({c10}, 'ιομαστε') "
           f"THEN CASE WHEN {L(c10)} = 9 AND starts_with({c10}, 'ον')"
           f" THEN {SUB(c10, 7)} || 'ομαστ' ELSE {SUB(c10, 7)} END "
           f"ELSE {c10} END")
    c11, sA = "c11", SUB("c11", 5)
    p12 = (f"CASE WHEN {L(c11)} > 5 AND ends_with({c11}, 'ιεστε') "
           f"THEN CASE WHEN {INS(sA, _EL_EXC12A)} THEN {sA} || 'ιεστ'"
           f" ELSE {sA} END ELSE {c11} END")
    s124 = SUB("p12", 4)
    r12 = (f"CASE WHEN {L('p12')} > 4 AND ends_with(p12, 'εστε') "
           f"THEN CASE WHEN {INS(s124, _EL_EXC12B)} "
           f"THEN {s124} || 'εστ' ELSE {s124} END ELSE p12 END")
    c12 = "c12"
    p13 = (f"CASE WHEN {L(c12)} > 6 AND ends_with({c12}, 'ηθηκεσ') "
           f"THEN {SUB(c12, 6)} "
           f"WHEN {L(c12)} > 5 AND {EW(c12, 'ηθηκα', 'ηθηκε')} "
           f"THEN {SUB(c12, 5)} ELSE {c12} END")
    r13_backs = ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")

    def g13(s):
        return (f"CASE WHEN {INS(s, _EL_EXC13)} OR "
                f"{EW(s, *r13_backs)} THEN {s} || 'ηκ' ELSE {s} END")

    r13 = (f"CASE WHEN {L('p13')} > 4 AND ends_with(p13, 'ηκεσ') "
           f"THEN {g13(SUB('p13', 4))} "
           f"WHEN {L('p13')} > 3 AND {EW('p13', 'ηκα', 'ηκε')} "
           f"THEN {g13(SUB('p13', 3))} ELSE p13 END")
    c13 = "c13"
    r14_backs = ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
                 "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")

    def g14(s):
        return (f"CASE WHEN {INS(s, _EL_EXC14)} OR {EV(s)} OR "
                f"{EW(s, *r14_backs)} THEN {s} || 'ουσ' "
                f"ELSE {s} END")

    r14 = (f"CASE WHEN {L(c13)} > 5 AND ends_with({c13}, 'ουσεσ') "
           f"THEN {g14(SUB(c13, 5))} "
           f"WHEN {L(c13)} > 4 AND {EW(c13, 'ουσα', 'ουσε')} "
           f"THEN {g14(SUB(c13, 4))} ELSE {c13} END")
    c14 = "c14"
    r15_c1 = ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ",
              "λοχ", "σμην")

    def g15(s):
        cond1 = f"({INS(s, _EL_EXC15A)} OR {EW(s, *r15_c1)})"
        cond2 = f"({INS(s, _EL_EXC15B)} OR ends_with({s}, 'κολλ'))"
        return (f"CASE WHEN {cond1} AND NOT {cond2} THEN {s} || 'αγ' "
                f"ELSE {s} END")

    r15 = (f"CASE WHEN {L(c14)} > 4 AND ends_with({c14}, 'αγεσ') "
           f"THEN {g15(SUB(c14, 4))} "
           f"WHEN {L(c14)} > 3 AND {EW(c14, 'αγα', 'αγε')} "
           f"THEN {g15(SUB(c14, 3))} ELSE {c14} END")
    c15 = "c15"

    def g16(s):
        return (f"CASE WHEN {INS(s, _EL_EXC16)} THEN {s} || 'ησ' "
                f"ELSE {s} END")

    r16 = (f"CASE WHEN {L(c15)} > 4 AND ends_with({c15}, 'ησου') "
           f"THEN {g16(SUB(c15, 4))} "
           f"WHEN {L(c15)} > 3 AND {EW(c15, 'ησε', 'ησα')} "
           f"THEN {g16(SUB(c15, 3))} ELSE {c15} END")
    c16, s164 = "c16", SUB("c16", 4)
    r17 = (f"CASE WHEN {L(c16)} > 4 AND ends_with({c16}, 'ηστε') "
           f"THEN CASE WHEN {INS(s164, _EL_EXC17)} "
           f"THEN {s164} || 'ηστ' ELSE {s164} END ELSE {c16} END")
    c17 = "c17"

    def g1819(c, sufs6, back, exc):
        s6, s4 = SUB(c, 6), SUB(c, 4)
        return (f"CASE WHEN {L(c)} > 6 AND {EW(c, *sufs6)} THEN "
                f"CASE WHEN {INS(s6, exc)} THEN {s6} || '{back}' "
                f"ELSE {s6} END "
                f"WHEN {L(c)} > 4 AND ends_with({c}, 'ουνε') THEN "
                f"CASE WHEN {INS(s4, exc)} THEN {s4} || '{back}' "
                f"ELSE {s4} END ELSE {c} END")

    r18 = g1819(c17, ("ησουνε", "ηθουνε"), "ουν", _EL_EXC18)
    c18 = "c18"
    r19 = g1819(c18, ("ησουμε", "ηθουμε"), "ουμ", _EL_EXC19)
    c19 = "c19"
    r20 = (f"CASE WHEN {L(c19)} > 5 AND {EW(c19, 'ματων', 'ματοσ')} "
           f"THEN {SUB(c19, 3)} "
           f"WHEN {L(c19)} > 4 AND ends_with({c19}, 'ματα') "
           f"THEN {SUB(c19, 2)} ELSE {c19} END")
    c20 = "c20"
    w21 = " ".join(
        f"WHEN {L(c20)} > {g} AND {EW(c20, *sufs)} THEN {SUB(c20, k)}"
        for g, k, sufs in _R21_GROUPS)
    r21_inner = (f"CASE {w21} WHEN {L(c20)} > 1 AND {EV(c20)} "
                 f"THEN {SUB(c20, 1)} ELSE {c20} END")
    r21 = f"CASE WHEN {c20} <> w THEN {c20} ELSE {r21_inner} END"
    c21 = "c21"
    r22_sufs = EW(c21, "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ",
                  "ωτατ")
    r22 = (f"CASE WHEN {EW(c21, 'εστερ', 'εστατ')} THEN {SUB(c21, 5)}"
           f" WHEN {r22_sufs} THEN {SUB(c21, 4)} ELSE {c21} END")

    single = [r0, r1, r2, r3, r4, r5, r6]
    ctes = [f"t0 AS (SELECT d, w, {single[0]} AS c0 FROM w)"]
    for i, expr in enumerate(single[1:], 1):
        ctes.append(f"t{i} AS (SELECT d, w, {expr} AS c{i} "
                    f"FROM t{i - 1})")
    ctes.append(f"t7a AS (SELECT d, w, c6, {sp7} AS sp7, {p7} AS p7 "
                f"FROM t6)")
    ctes.append(f"t7 AS (SELECT d, w, {r7} AS c7 FROM t7a)")
    ctes.append(f"t8a AS (SELECT d, w, c7, {a8} AS a8 FROM t7)")
    ctes.append(f"t8b AS (SELECT d, w, {b8} AS b8 FROM t8a)")
    ctes.append(f"t8 AS (SELECT d, w, {r8} AS c8 FROM t8b)")
    ctes.append(f"t9a AS (SELECT d, w, {p9} AS p9 FROM t8)")
    ctes.append(f"t9 AS (SELECT d, w, {r9} AS c9 FROM t9a)")
    ctes.append(f"t10a AS (SELECT d, w, c9, {m10} AS m10, "
                f"{s10} AS s10 FROM t9)")
    ctes.append(f"t10b AS (SELECT d, w, m10, {t10} AS t10 FROM t10a)")
    ctes.append(f"t10 AS (SELECT d, w, {r10} AS c10 FROM t10b)")
    ctes.append(f"t11 AS (SELECT d, w, {r11} AS c11 FROM t10)")
    ctes.append(f"t12a AS (SELECT d, w, {p12} AS p12 FROM t11)")
    ctes.append(f"t12 AS (SELECT d, w, {r12} AS c12 FROM t12a)")
    ctes.append(f"t13a AS (SELECT d, w, {p13} AS p13 FROM t12)")
    ctes.append(f"t13 AS (SELECT d, w, {r13} AS c13 FROM t13a)")
    for i, expr in [(14, r14), (15, r15), (16, r16), (17, r17),
                    (18, r18), (19, r19), (20, r20), (21, r21),
                    (22, r22)]:
        ctes.append(f"t{i} AS (SELECT d, w, {expr} AS c{i} "
                    f"FROM t{i - 1})")
    body = ",\n".join(ctes)
    return f"""WITH w0 AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_EL_FROM}', '{_EL_TO}') AS w
  FROM documents
), w AS (SELECT d, w FROM w0 WHERE w <> ''),
{body},
fin AS (
  SELECT d, CASE WHEN length(w) < 4 THEN w ELSE c22 END AS term
  FROM t22
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Brazilian stemmer (lucene_ray.brstem). The oracle is generated from
# the same rule tables; regions R1/R2/RV are regex-expressible because
# the reference's "null region" and a computed empty region behave
# identically under non-empty suffix checks, and the interior-scan
# bound (j < len-1) maps to matching only within the char range that
# excludes the last character. RV stays stale across steps exactly as
# in the engine.

def ft_brazilian_stem(sf_dir: str) -> pa.Table:
    """BrazilianStemFilter (br/BrazilianStemmer.java:41)."""
    from ..brstem import brazilian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [brazilian_stem(w) for w in _words(tx)])


def oracle_brazilian_stem_sql() -> str:
    from ..brstem_data import BR_STEP1, BR_STEP2

    def rm(c, s):
        return (f"CASE WHEN ends_with({c}, '{s}') THEN "
                f"substr({c}, 1, length({c})-{len(s)}) ELSE {c} END")

    def step1_cond(suf, region, prec):
        cond = (f"ends_with(ct, '{suf}') AND "
                f"ends_with({region.lower()}, '{suf}')")
        if prec:
            cond += (f" AND ends_with(substr(ct, 1, "
                     f"length(ct)-{len(suf)}), '{prec}')")
        return cond

    w1 = []
    fired1 = []
    for suf, region, prec, assign, rep in BR_STEP1:
        cond = step1_cond(suf, region, prec)
        fired1.append(f"({cond})")
        out = (f"substr(ct, 1, length(ct)-{len(suf)})"
               + (f" || '{rep}'" if rep else "")) if assign else "ct"
        w1.append(f"    WHEN {cond} THEN {out}")
    s1_case = ("CASE\n" + "\n".join(w1) + "\n    ELSE ct END")
    fired1_expr = "(" + "\n OR ".join(fired1) + ")"

    w2 = []
    fired2 = []
    for chk, rem in BR_STEP2:
        fired2.append(f"ends_with(rv, '{chk}')")
        w2.append(f"    WHEN ends_with(rv, '{chk}') "
                  f"THEN {rm('c1', rem)}")
    s2_case = ("CASE\n" + "\n".join(w2) + "\n    ELSE c1 END")
    fired2_expr = "(" + " OR ".join(fired2) + ")"

    vow = "('a','e','i','o','u')"
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
  FROM documents
), wct AS (
  SELECT d, w,
         translate(lower(w), 'áâãéêíóôõúüçñ', 'aaaeeiooouucn') AS c
  FROM w0 WHERE w <> ''
), wp1 AS (
  SELECT d, w, CASE WHEN length(c) >= 2
    AND substr(c, 1, 1) IN ('"','''','-',',',';','.','?','!')
    THEN substr(c, 2) ELSE c END AS c
  FROM wct
), wp AS (
  SELECT d, w, CASE WHEN length(c) >= 2
    AND right(c, 1) IN ('-',',',';','.','?','!','''','"')
    THEN substr(c, 1, length(c)-1) ELSE c END AS ct
  FROM wp1
), reg AS (
  SELECT d, w, ct,
    length(ct) > 2 AND length(ct) < 30 AS idx,
    regexp_matches(ct, '^[\\p{{L}}]+$') AS stemmable,
    CASE WHEN regexp_matches(ct, '^[^aeiou]*[aeiou]+[^aeiou]')
         THEN regexp_replace(ct, '^[^aeiou]*[aeiou]+[^aeiou]', '')
         ELSE '' END AS r1,
    CASE
      WHEN length(ct) >= 2 AND substr(ct, 2, 1) NOT IN {vow}
           AND regexp_matches(
                 substr(ct, 3, greatest(length(ct)-3, 0)), '[aeiou]')
        THEN regexp_replace(substr(ct, 3), '^[^aeiou]*[aeiou]', '')
      WHEN length(ct) >= 3 AND substr(ct, 1, 1) IN {vow}
           AND substr(ct, 2, 1) IN {vow}
           AND regexp_matches(
                 substr(ct, 3, greatest(length(ct)-3, 0)), '[^aeiou]')
        THEN regexp_replace(substr(ct, 3), '^[aeiou]*[^aeiou]', '')
      WHEN length(ct) > 3 THEN substr(ct, 4)
      ELSE '' END AS rv
  FROM wp
), reg2 AS (
  SELECT d, w, ct, idx, stemmable, r1, rv,
    CASE WHEN regexp_matches(r1, '^[^aeiou]*[aeiou]+[^aeiou]')
         THEN regexp_replace(r1, '^[^aeiou]*[aeiou]+[^aeiou]', '')
         ELSE '' END AS r2
  FROM reg
), st1 AS (
  SELECT d, w, ct, idx, stemmable, rv,
    {s1_case} AS c1,
    {fired1_expr} AS f1
  FROM reg2
), st2 AS (
  SELECT d, w, ct, idx, stemmable, rv,
    CASE WHEN NOT f1 THEN {s2_case} ELSE c1 END AS c2,
    f1 OR (NOT f1 AND {fired2_expr}) AS altered
  FROM st1
), st34 AS (
  SELECT d, w, ct, idx, stemmable, rv,
    CASE
      WHEN altered THEN
        CASE WHEN ends_with(rv, 'ci') THEN {rm('c2', 'i')}
             ELSE c2 END
      ELSE
        CASE WHEN ends_with(rv, 'os') THEN {rm('c2', 'os')}
             WHEN ends_with(rv, 'a') THEN {rm('c2', 'a')}
             WHEN ends_with(rv, 'i') THEN {rm('c2', 'i')}
             WHEN ends_with(rv, 'o') THEN {rm('c2', 'o')}
             ELSE c2 END
      END AS c3
  FROM st2
), st5 AS (
  SELECT d, w, ct, idx, stemmable,
    CASE WHEN ends_with(rv, 'e') THEN
      CASE WHEN ends_with(rv, 'gue')
             THEN {rm(rm('c3', 'e'), 'u')}
           WHEN ends_with(rv, 'cie')
             THEN {rm(rm('c3', 'e'), 'i')}
           ELSE {rm('c3', 'e')} END
      ELSE c3 END AS c4
  FROM st34
), fin AS (
  SELECT d, CASE WHEN NOT idx THEN w
                 WHEN NOT stemmable THEN ct
                 ELSE c4 END AS term
  FROM st5
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Second normalizer/stemmer batch (langnorm additions + fa/te
# stemmers). Bengali and Telugu NORMALIZERS are pytest-golden-gated
# only: their positional in-place rewrites (index rewinds over
# conjuncts) have no direct SQL form and their scripts never occur in
# the corpus.

_SR_PLANT = str.maketrans("abvgdezijklmnoprstufhcqwxy",
                          "абвгдезијклмнопрстуфхцђљњџ")


def ft_serbian_norm(sf_dir: str) -> pa.Table:
    """SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:
    51): planted Cyrillic (q/w/x/y plant the digraph letters) folds
    back to bald Latin."""
    from ..langnorm import serbian_normalize
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [serbian_normalize(w.translate(_SR_PLANT))
                       for w in _words(tx)])


def ft_irish_lower(sf_dir: str) -> pa.Table:
    """IrishLowerCaseFilter (ga/IrishLowerCaseFilter.java:37): words
    planted as n<Upperfirst>… so the eclipsis hyphen fires on vowel
    initials."""
    from ..langnorm import irish_lower
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [irish_lower("n" + w[:1].upper() + w[1:])
                       for w in _words(tx)])


_RO_PLANT = str.maketrans("st", "şţ")


def ft_romanian_norm(sf_dir: str) -> pa.Table:
    """RomanianNormalizer (ro/RomanianNormalizer.java:41): planted
    cedilla s/t fold to the comma-below forms."""
    from ..langnorm import romanian_normalize
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [romanian_normalize(w.translate(_RO_PLANT))
                       for w in _words(tx)])


def ft_persian_stem(sf_dir: str) -> pa.Table:
    """PersianStemFilter (fa/PersianStemmer.java:35): the Arabic-
    letter plant (ft_arabic_stem's) makes the ordered suffix strips
    fire."""
    from ..stemlang import persian_stem
    plant = str.maketrans(_AR_STEM_FROM, _AR_STEM_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [persian_stem(w.translate(plant))
                       for w in _words(tx)])


_TE_STEM_FROM = "aeioudmvlnckspbgrthfjwxyzq"
_TE_STEM_TO = ("ాెిొుడమవలనచకసపబగరటహఫజయషఠఢఖ")


def ft_telugu_stem(sf_dir: str) -> pa.Table:
    """TeluguStemFilter (te/TeluguStemmer.java:27): planted Telugu
    matras/consonants so the suffix groups fire."""
    from ..stemlang import telugu_stem
    plant = str.maketrans(_TE_STEM_FROM, _TE_STEM_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [telugu_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_serbian_norm_sql() -> str:
    """Replays the FULL normalization on the corpus word too (the
    corpus itself may carry Cyrillic/diacritic letters): the digraph
    replaces (planted q/w/x/y plus the real sources) then the
    one-to-one table as translate."""
    from ..langnorm import _SR_ONE, _SR_TWO
    frm = "".join(_SR_ONE)
    to = "".join(_SR_ONE.values())
    expr = "unnest(string_split(text, ' '))"
    for s_, r_ in (("q", "dj"), ("w", "lj"), ("x", "nj"), ("y", "dz")):
        expr = f"replace({expr}, '{s_}', '{r_}')"
    for s_, r_ in _SR_TWO.items():
        expr = f"replace({expr}, '{s_}', '{r_}')"
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate({expr}, '{frm}', '{to}') AS term0
  FROM documents
), s AS (SELECT d, term0 AS term FROM w WHERE term0 <> '')
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_irish_lower_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), s AS (
  SELECT d, CASE WHEN upper(substr(word, 1, 1)) IN
      ('A','E','I','O','U','Á','É','Í','Ó','Ú')
    THEN 'n-' || lower(word) ELSE 'n' || lower(word) END AS term
  FROM w WHERE word <> ''
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_romanian_norm_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')), 'st',
                   'șț') AS term0
  FROM documents
), s AS (SELECT d, term0 AS term FROM w WHERE term0 <> '')
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_persian_stem_sql() -> str:
    from ..stemlang import _FA_SUFFIXES
    stages = []
    prev = "r0"
    for i, s in enumerate(_FA_SUFFIXES, 1):
        cur = f"r{i}"
        stages.append(
            f"s{i} AS (SELECT d, CASE WHEN length({prev}) >= "
            f"{len(s) + 2} AND ends_with({prev}, '{s}') THEN "
            f"substr({prev}, 1, length({prev})-{len(s)}) "
            f"ELSE {prev} END AS {cur} FROM s{i - 1})")
        prev = cur
    body = ",\n".join(stages)
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_AR_STEM_FROM}', '{_AR_STEM_TO}') AS word
  FROM documents
), s0 AS (SELECT d, word AS r0 FROM w WHERE word <> ''),
{body}
SELECT {prev} AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s{len(_FA_SUFFIXES)} GROUP BY term
ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_telugu_stem_sql() -> str:
    from ..stemlang import _TE_GROUPS
    whens = []
    for n, sufs in _TE_GROUPS:
        ors = " OR ".join(f"ends_with(word, '{s}')" for s in sufs)
        whens.append(f"    WHEN length(word) > {n + 1} AND ({ors})\n"
                     f"      THEN substr(word, 1, length(word)-{n})")
    chain = "\n".join(whens)
    return f"""WITH w AS (
  SELECT doc_id AS d,
         translate(unnest(string_split(text, ' ')),
                   '{_TE_STEM_FROM}', '{_TE_STEM_TO}') AS word
  FROM documents
), s AS (
  SELECT d, CASE
{chain}
    ELSE word END AS term
  FROM w WHERE word <> ''
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# UAX29URLEmail tokenizer (lucene_ray.urlemail). The grammar itself is
# gated by the reference's 643-URL / 265-email random-text extraction
# files in tests/test_urlemail.py; the driver entry gates the analyzer
# plumbing on planted URL/email shapes built from corpus words.

def ft_url_email(sf_dir: str) -> pa.Table:
    """UAX29URLEmailTokenizer (email/UAX29URLEmailTokenizerImpl.
    jflex:100): each corpus word is planted into "see http://<w>.com/
    <w> mail <w>@<w>.org end" and run through the REAL registered
    url_email analyzer (words sanitized to alnum so they are valid
    DNS labels)."""
    import re as _re
    from ..tokenizers import get_tokenizer
    tok = get_tokenizer("url_email")

    def doc_tokens(tx: str, d: int) -> list[str]:
        out: list[str] = []
        for w in _words(tx):
            w = _re.sub(r"[^A-Za-z0-9]", "", w)
            if not w:
                continue
            out.extend(tok(
                f"see http://{w}.com/{w} mail {w}@{w}.org end"))
        return out
    return _rawtok_stats(sf_dir, doc_tokens)


def oracle_url_email_sql() -> str:
    return f"""WITH w0 AS (
  SELECT doc_id AS d,
         regexp_replace(unnest(string_split(text, ' ')),
                        '[^a-zA-Z0-9]', '', 'g') AS w
  FROM documents
), w AS (SELECT d, w FROM w0 WHERE w <> ''),
toks AS (
  SELECT d, unnest([
    'see', 'http://' || w || '.com/' || w, 'mail',
    w || '@' || w || '.org', 'end']) AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Snowball English / Porter2 (lucene_ray.porter2). The oracle replays
# the full algorithm: consonant-y marking as two regexp_replace passes
# (global non-overlap == the scanner's restart-after-mark), R1/R2 as
# length arithmetic over regexp-stripped prefixes (with the gener/
# commun/arsen prefix override), and each step as an ordered CASE.

def ft_porter2(sf_dir: str) -> pa.Table:
    """SnowballFilter("English") (tartarus/snowball/ext/
    EnglishStemmer.java)."""
    from ..porter2 import porter2_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [porter2_stem(w) for w in _words(tx)])


def oracle_porter2_sql() -> str:
    from ..porter2 import (_EXC1, _EXC2, _STEP2, _STEP3, _STEP4,
                           _VALID_LI)

    V = "('a','e','i','o','u','y')"

    def sub(c, k):
        return f"substr({c}, 1, length({c})-{k})"

    def ch(c, back):                       # char back-from-end (1=last)
        return f"substr({c}, length({c})-{back - 1}, 1)"

    def shortv(c, off):
        """r_shortv on the prefix of c that excludes the last `off`
        chars."""
        e1, e2, e3 = ch(c, off + 1), ch(c, off + 2), ch(c, off + 3)
        return (f"((length({c}) - {off} >= 3 AND {e1} NOT IN {V} "
                f"AND {e1} NOT IN ('w','x','Y') AND {e2} IN {V} "
                f"AND {e3} NOT IN {V}) "
                f"OR (length({c}) - {off} = 2 AND {e2} IN {V} "
                f"AND {e1} NOT IN {V}))")

    exc1 = " ".join(f"WHEN w = '{k}' THEN '{v}'"
                    for k, v in sorted(_EXC1.items()))
    exc2 = ", ".join(f"'{x}'" for x in sorted(_EXC2))

    # step 2/3: ordered longest-first; matched suffix decides (no
    # retry), R1 checked inside
    def tail_case(c, rules, r1_expr, special):
        whens = []
        for suf, rep in sorted(rules, key=lambda x: -len(x[0])):
            inner = special(c, suf, rep)
            if inner is None:
                cond = f"length({c}) - {len(suf)} >= {r1_expr}"
                inner = (f"CASE WHEN {cond} THEN {sub(c, len(suf))} "
                         f"|| '{rep}' ELSE {c} END")
            whens.append(f"WHEN ends_with({c}, '{suf}') "
                         f"THEN {inner}")
        return "CASE " + "\n      ".join(whens) + f" ELSE {c} END"

    def s2_special(c, suf, rep):
        if suf == "ogi":
            return (f"CASE WHEN length({c}) - 3 >= p1 AND "
                    f"ends_with({c}, 'logi') THEN {sub(c, 1)} "
                    f"ELSE {c} END")
        if suf == "li":
            li = ", ".join(f"'{x}'" for x in sorted(_VALID_LI))
            return (f"CASE WHEN length({c}) - 2 >= p1 AND "
                    f"length({c}) > 2 AND {ch(c, 3)} IN ({li}) "
                    f"THEN {sub(c, 2)} ELSE {c} END")
        return None

    def s3_special(c, suf, rep):
        if suf == "ative":
            return (f"CASE WHEN length({c}) - 5 >= p1 AND "
                    f"length({c}) - 5 >= p2 THEN {sub(c, 5)} "
                    f"ELSE {c} END")
        return None

    s2 = tail_case("c3", _STEP2, "p1", s2_special)
    s3 = tail_case("c4", _STEP3, "p1", s3_special)

    s4_whens = []
    for suf in sorted(_STEP4, key=len, reverse=True):
        if suf == "ion":
            inner = (f"CASE WHEN length(c5) - 3 >= p2 AND "
                     f"length(c5) > 3 AND {ch('c5', 4)} IN ('s','t') "
                     f"THEN {sub('c5', 3)} ELSE c5 END")
        else:
            inner = (f"CASE WHEN length(c5) - {len(suf)} >= p2 "
                     f"THEN {sub('c5', len(suf))} ELSE c5 END")
        s4_whens.append(f"WHEN ends_with(c5, '{suf}') THEN {inner}")
    s4 = "CASE " + "\n      ".join(s4_whens) + " ELSE c5 END"

    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
  FROM documents
), wm AS (  -- prelude: leading-' strip + consonant-y marking
  SELECT d, w,
    regexp_replace(regexp_replace(
      CASE WHEN starts_with(w, '''') THEN substr(w, 2) ELSE w END,
      '^y', 'Y'), '([aeiouy])y', '\\1Y', 'g') AS ym
  FROM w0 WHERE w <> ''
), reg AS (
  SELECT d, w, ym,
    CASE
      WHEN starts_with(ym, 'arsen') THEN 5
      WHEN starts_with(ym, 'commun') THEN 6
      WHEN starts_with(ym, 'gener') THEN 5
      WHEN regexp_matches(ym, '^[^aeiouy]*[aeiouy]+[^aeiouy]')
        THEN length(ym) - length(regexp_replace(
               ym, '^[^aeiouy]*[aeiouy]+[^aeiouy]', ''))
      ELSE length(ym) END AS p1
  FROM wm
), reg2 AS (
  SELECT d, w, ym, p1,
    CASE WHEN regexp_matches(substr(ym, p1 + 1),
                             '^[^aeiouy]*[aeiouy]+[^aeiouy]')
      THEN p1 + length(substr(ym, p1 + 1)) - length(regexp_replace(
             substr(ym, p1 + 1), '^[^aeiouy]*[aeiouy]+[^aeiouy]', ''))
      ELSE length(ym) END AS p2
  FROM reg
), s0 AS (  -- step 0: apostrophe suffixes
  SELECT d, w, p1, p2, CASE
    WHEN ends_with(ym, '''s''') THEN {sub('ym', 3)}
    WHEN ends_with(ym, '''s') THEN {sub('ym', 2)}
    WHEN ends_with(ym, '''') THEN {sub('ym', 1)}
    ELSE ym END AS c0
  FROM reg2
), s1a AS (
  SELECT d, w, p1, p2, CASE
    WHEN ends_with(c0, 'sses') THEN {sub('c0', 2)}
    WHEN ends_with(c0, 'ied') OR ends_with(c0, 'ies') THEN
      CASE WHEN length(c0) > 4 THEN {sub('c0', 3)} || 'i'
           ELSE {sub('c0', 3)} || 'ie' END
    WHEN ends_with(c0, 'ss') OR ends_with(c0, 'us') THEN c0
    WHEN ends_with(c0, 's')
         AND regexp_matches({sub('c0', 2)}, '[aeiouy]')
      THEN {sub('c0', 1)}
    ELSE c0 END AS c1
  FROM s0
), s1b AS (
  SELECT d, w, p1, p2, c1 IN ({exc2}) AS stop2, CASE
    WHEN c1 IN ({exc2}) THEN c1
    WHEN ends_with(c1, 'eedly') THEN
      CASE WHEN length(c1) - 5 >= p1 THEN {sub('c1', 5)} || 'ee'
           ELSE c1 END
    WHEN ends_with(c1, 'ingly') OR ends_with(c1, 'edly')
         OR ends_with(c1, 'ing') OR ends_with(c1, 'eed')
         OR ends_with(c1, 'ed') THEN
      CASE
        WHEN ends_with(c1, 'eed') THEN
          CASE WHEN length(c1) - 3 >= p1 THEN {sub('c1', 3)} || 'ee'
               ELSE c1 END
        WHEN ends_with(c1, 'ingly') THEN
          CASE WHEN regexp_matches({sub('c1', 5)}, '[aeiouy]')
               THEN {sub('c1', 5)} ELSE c1 END
        WHEN ends_with(c1, 'edly') THEN
          CASE WHEN regexp_matches({sub('c1', 4)}, '[aeiouy]')
               THEN {sub('c1', 4)} ELSE c1 END
        WHEN ends_with(c1, 'ing') THEN
          CASE WHEN regexp_matches({sub('c1', 3)}, '[aeiouy]')
               THEN {sub('c1', 3)} ELSE c1 END
        ELSE
          CASE WHEN regexp_matches({sub('c1', 2)}, '[aeiouy]')
               THEN {sub('c1', 2)} ELSE c1 END
        END
    ELSE c1 END AS c2x, c1
  FROM s1a
), s1b2 AS (  -- 1b post-deletion fixups (only when a deletion fired)
  SELECT d, w, p1, p2, stop2, CASE
    WHEN stop2 OR c2x = c1 THEN c2x
    WHEN ends_with(c1, 'eedly') OR ends_with(c1, 'eed') THEN c2x
    WHEN ends_with(c2x, 'at') OR ends_with(c2x, 'bl')
         OR ends_with(c2x, 'iz') THEN c2x || 'e'
    WHEN ends_with(c2x, 'bb') OR ends_with(c2x, 'dd')
         OR ends_with(c2x, 'ff') OR ends_with(c2x, 'gg')
         OR ends_with(c2x, 'mm') OR ends_with(c2x, 'nn')
         OR ends_with(c2x, 'pp') OR ends_with(c2x, 'rr')
         OR ends_with(c2x, 'tt') THEN
      CASE WHEN length(c2x) = 3
                AND substr(c2x, 1, 1) IN ('a','e','o')
           THEN c2x ELSE {sub('c2x', 1)} END
    WHEN length(c2x) = p1 AND {shortv('c2x', 0)} THEN c2x || 'e'
    ELSE c2x END AS c2
  FROM s1b
), s1c AS (
  SELECT d, w, p1, p2, stop2, CASE
    WHEN NOT stop2 AND length(c2) > 2
         AND right(c2, 1) IN ('y','Y')
         AND {ch('c2', 2)} NOT IN {V}
      THEN {sub('c2', 1)} || 'i'
    ELSE c2 END AS c3
  FROM s1b2
), s2 AS (
  SELECT d, w, p1, p2, stop2,
    CASE WHEN stop2 THEN c3 ELSE {s2} END AS c4
  FROM s1c
), s3 AS (
  SELECT d, w, p1, p2, stop2,
    CASE WHEN stop2 THEN c4 ELSE {s3} END AS c5
  FROM s2
), s4 AS (
  SELECT d, w, p1, p2, stop2,
    CASE WHEN stop2 THEN c5 ELSE {s4} END AS c6
  FROM s3
), s5 AS (
  SELECT d, w, stop2, CASE
    WHEN stop2 THEN c6
    WHEN ends_with(c6, 'e')
         AND (length(c6) - 1 >= p2
              OR (length(c6) - 1 >= p1
                  AND NOT {shortv('c6', 1)}))
      THEN {sub('c6', 1)}
    WHEN ends_with(c6, 'll') AND length(c6) - 1 >= p2
      THEN {sub('c6', 1)}
    ELSE c6 END AS c7
  FROM s4
), fin AS (
  SELECT d, CASE
    {exc1}
    WHEN length(w) < 3 THEN w
    ELSE replace(c7, 'Y', 'y') END AS term
  FROM s5
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Compound-word decomposition (lucene_ray.compound). The entry builds
# a compound from each adjacent word pair and decomposes it against
# the pair's own two-word dictionary; the oracle re-finds every
# dictionary occurrence with a generate_series position scan. The
# hyphenation variant is pytest-golden-gated (Liang pattern tables
# have no SQL form).

def ft_dictionary_compound(sf_dir: str) -> pa.Table:
    """DictionaryCompoundWordTokenFilter (compound/
    DictionaryCompoundWordTokenFilter.java:73)."""
    from ..compound import dictionary_decompose

    def doc_tokens(tx: str, d: int) -> list[str]:
        ws = _words(tx)
        out: list[str] = []
        for a, b in zip(ws, ws[1:]):
            if a == b:
                continue
            out.extend(dictionary_decompose(a + b, frozenset((a, b))))
        return out
    return _rawtok_stats(sf_dir, doc_tokens)


def oracle_dictionary_compound_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, generate_subscripts(ws, 1) AS pos,
         unnest(ws) AS word
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents)
), pairs AS (
  SELECT a.d, a.word AS wa, b.word AS wb, a.word || b.word AS c
  FROM w a JOIN w b ON a.d = b.d AND b.pos = a.pos + 1
  WHERE a.word <> b.word
), compounds AS (
  SELECT d, c AS term FROM pairs
), subs AS (
  SELECT p.d, CASE WHEN length(p.wa) BETWEEN 2 AND 15
                    AND substr(p.c, i, length(p.wa)) = p.wa
                   THEN p.wa ELSE p.wb END AS term
  FROM pairs p CROSS JOIN generate_series(1, 128) AS g(i)  -- >= max compound len
  WHERE i <= length(p.c) AND length(p.c) >= 5
    AND ((length(p.wa) BETWEEN 2 AND 15
          AND substr(p.c, i, length(p.wa)) = p.wa)
      OR (length(p.wb) BETWEEN 2 AND 15
          AND substr(p.c, i, length(p.wb)) = p.wb))
), both_match AS (
  -- a position where BOTH wa and wb match must emit two tokens
  SELECT p.d, p.wb AS term
  FROM pairs p CROSS JOIN generate_series(1, 128) AS g(i)  -- >= max compound len
  WHERE i <= length(p.c) AND length(p.c) >= 5
    AND length(p.wa) BETWEEN 2 AND 15
    AND length(p.wb) BETWEEN 2 AND 15
    AND substr(p.c, i, length(p.wa)) = p.wa
    AND substr(p.c, i, length(p.wb)) = p.wb
), toks AS (
  SELECT d, term FROM compounds
  UNION ALL SELECT d, term FROM subs
  UNION ALL SELECT d, term FROM both_match
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Pattern tokenizer / capture-group filter (lucene_ray.patterns).

def ft_pattern_tokenize(sf_dir: str) -> pa.Table:
    """PatternTokenizer, split mode (pattern/PatternTokenizer.java:43)
    with the literal pattern 'o' over the raw document text (pieces
    may contain spaces — the tokenizer sees the whole reader)."""
    import re as _re
    from ..patterns import pattern_tokenize
    rx = _re.compile("o")
    return _rawtok_stats(
        sf_dir, lambda tx, d: pattern_tokenize(tx, rx, -1))


def ft_pattern_capture(sf_dir: str) -> pa.Table:
    """PatternCaptureGroupTokenFilter (pattern/
    PatternCaptureGroupTokenFilter.java:65): sliding triples '(...)'
    per word with preserveOriginal (whole-token captures skipped)."""
    import re as _re
    from ..patterns import pattern_capture_groups
    rx = [_re.compile("(...)")]

    def doc_tokens(tx: str, d: int) -> list[str]:
        out: list[str] = []
        for w in _words(tx):
            out.extend(pattern_capture_groups(w, rx, True))
        return out
    return _rawtok_stats(sf_dir, doc_tokens)


def oracle_pattern_tokenize_sql() -> str:
    return f"""WITH p AS (
  SELECT doc_id AS d, unnest(string_split(text, 'o')) AS term
  FROM documents
), s AS (SELECT d, term FROM p WHERE term <> '')
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_pattern_capture_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), ww AS (SELECT d, word FROM w WHERE word <> ''),
triples AS (
  SELECT d, substr(word, 3*k + 1, 3) AS term
  FROM ww CROSS JOIN generate_series(0, 42) AS g(k)
  WHERE 3*k + 3 <= length(word)
    AND NOT (k = 0 AND length(word) = 3)
), toks AS (
  SELECT d, word AS term FROM ww
  UNION ALL SELECT d, term FROM triples
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Delimited term frequency (lucene_ray.analysis.delimited_tf_stream).

def ft_delimited_tf(sf_dir: str) -> pa.Table:
    """DelimitedTermFrequencyTokenFilter (miscellaneous/
    DelimitedTermFrequencyTokenFilter.java:38): every corpus word is
    planted as ``w|3``, so ttf triples while df stays put."""
    from ..analysis import delimited_tf_stream
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: delimited_tf_stream(
            [w + "|3" for w in _words(tx)]))


def oracle_delimited_tf_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS term
  FROM documents
), s AS (SELECT d, term FROM w WHERE term <> '')
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(3 * count(*) AS BIGINT) AS ttf
FROM s GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# CommonGramsQueryFilter (lucene_ray.analysis.common_grams_query_
# stream). A unigram survives iff no bigram STARTS at it, plus the
# final word also needs no bigram ENDING at it (the filter's hold-one-
# back end rule) — both window-expressible.

def ft_common_grams_query(sf_dir: str) -> pa.Table:
    """CommonGramsQueryFilter (commongrams/CommonGramsQueryFilter.
    java:85) over the raw word stream per document."""
    from ..analysis import common_grams_query_stream
    return _rawtok_stats(
        sf_dir, lambda tx, d: common_grams_query_stream(_words(tx)))


def oracle_common_grams_query_sql() -> str:
    from ..analysis_en import ENGLISH_STOP_WORDS
    stop = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    return f"""WITH w AS (
  SELECT doc_id AS d, generate_subscripts(ws, 1) AS pos,
         unnest(ws) AS word,
         len(ws) AS n
  FROM (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents)
), ctx AS (
  SELECT d, pos, n, word,
         word IN ({stop}) AS c,
         lead(word) OVER (PARTITION BY d ORDER BY pos) AS nxt,
         lead(word IN ({stop})) OVER (PARTITION BY d ORDER BY pos)
           AS cnxt,
         lag(word IN ({stop})) OVER (PARTITION BY d ORDER BY pos)
           AS cprv
  FROM w
), grams AS (
  SELECT d, word || '_' || nxt AS term
  FROM ctx WHERE nxt IS NOT NULL AND (c OR cnxt)
), unis AS (
  SELECT d, word AS term
  FROM ctx
  WHERE NOT (pos < n AND (c OR cnxt))
    AND NOT (pos = n AND pos > 1 AND (cprv OR c))
), toks AS (
  SELECT d, term FROM grams UNION ALL SELECT d, term FROM unis
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# QueryAutoStopWordAnalyzer (Index.auto_stop_words): index-derived
# stop set — terms whose df exceeds 20%% of docs.

def ft_auto_stopwords(sf_dir: str) -> pa.Table:
    """QueryAutoStopWordAnalyzer (query/QueryAutoStopWordAnalyzer.
    java:79): terms with df > 0.2 * doc_count, from the distributed
    term-dictionary Dataset."""
    from ..api import Index
    r = reader_for(sf_dir)
    idx = Index(index_dir_for(sf_dir))
    words = sorted(idx.auto_stop_words(
        max_percent_docs=0.2, exclude_prefixes=_kw_prefixes(r)))
    return pa.table({"term": pa.array(words, pa.string())})


def oracle_auto_stopwords_sql() -> str:
    return f"""WITH {_CORPUS_CTE}
SELECT term FROM df
WHERE df > (SELECT 0.2 * count(*) FROM corpus)
ORDER BY term"""


# ---------------------------------------------------------------------------
# Exact ASCII folding (analysis_en.ascii_fold over asciifold_data).

def ft_ascii_fold(sf_dir: str) -> pa.Table:
    """ASCIIFoldingFilter (miscellaneous/ASCIIFoldingFilter.java:187):
    corpus words planted with table-only specials (ß ø Ǣ đ þ ﬆ) the
    NFKD approximation could not fold; the registered 'fold' filter
    does the work."""
    from ..analysis_en import TOKEN_FILTERS
    f = TOKEN_FILTERS["fold"]
    plant = "ß" + "ø" + "Ǣ"

    def doc_tokens(tx: str, d: int) -> list[str]:
        return [t for t in f([plant + w + "ﬆđþ" for w in _words(tx)])
                if t is not None]
    return _rawtok_stats(sf_dir, doc_tokens)


def oracle_ascii_fold_sql() -> str:
    """Replays the FULL fold table over plant + corpus word (the
    corpus may carry foldable letters itself — no ascii assumption)."""
    stages = _ascii_fold_sql_stages("'ßøǢ' || w0.w || 'ﬆđþ'")
    ctes = ["""w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
  FROM documents
)"""]
    prev = "w0"
    for i, expr in enumerate(stages):
        name = f"f{i}"
        where = " WHERE w <> ''" if i == 0 else ""
        ctes.append(f"{name} AS (SELECT d, {expr} AS t "
                    f"FROM {prev}{where})")
        prev = name
    body = ",\n".join(ctes)
    return f"""WITH {body}
SELECT t AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM {prev} GROUP BY t ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Wikipedia tokenizer (lucene_ray.wikipedia).

def ft_wikipedia(sf_dir: str) -> pa.Table:
    """WikipediaTokenizer (wikipedia/WikipediaTokenizerImpl.jflex:25):
    each corpus word planted into wiki markup exercising plain text,
    category, internal link, heading and citation states; tokens are
    emitted as term/type pairs so the typed surface is gated."""
    from ..wikipedia import tokenize_wikipedia

    def doc_tokens(tx: str, d: int) -> list[str]:
        out: list[str] = []
        for w in _words(tx):
            markup = (f"{w} [[Category:{w}]] [[{w} link]] "
                      f"=={w}== {{{{cite {w}}}}}")
            out.extend(f"{t}/{ty}" for t, ty, _p, _s, _e in
                       tokenize_wikipedia(markup))
        return out
    return _rawtok_stats(sf_dir, doc_tokens)


def oracle_wikipedia_sql() -> str:
    return f"""WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS w
  FROM documents
), w AS (SELECT d, w FROM w0 WHERE w <> ''),
toks AS (
  SELECT d, unnest([
    w || '/<ALPHANUM>', w || '/c', w || '/il', 'link/il',
    w || '/h', 'cite/ci', w || '/ci']) AS term
  FROM w
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM toks GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# Language normalizers (lucene_ray.langnorm). Engine side plants the
# relevant script deterministically (per-char transliteration of corpus
# words) and runs the REAL registered normalizer; oracles compute the
# expected output with one SQL translate()/replace() (delete-mapped
# chars ride DuckDB translate's shorter-to-list semantics).

def _norm_entry(sf_dir: str, name: str, plant) -> pa.Table:
    from ..langnorm import NORMALIZERS
    fn = NORMALIZERS[name]
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [fn(w.translate(plant) if plant else w)
                       for w in _words(tx)])


_TR_UP = str.maketrans("abcdefghijklmnopqrstuvwxyz",
                       "ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def ft_turkish_lower(sf_dir: str) -> pa.Table:
    """TurkishLowerCaseFilter (tr/TurkishLowerCaseFilter.java:43):
    corpus words are uppercased so every I comes back as dotless ı."""
    return _norm_entry(sf_dir, "turkish_lower", _TR_UP)


_EL_PLANT = str.maketrans("aehiowsybgdzklmnprtfx",
                          "ΆΈΉΊΌΏΣΎΒΓΔΖΚΛΜΝΠΡΤΦΞ")
_EL_FROM = "aehiowsybgdzklmnprtfx"
_EL_TO = "αεηιοωσυβγδζκλμνπρτφξ"


def ft_greek_lower(sf_dir: str) -> pa.Table:
    """GreekLowerCaseFilter (el/GreekLowerCaseFilter.java:51): planted
    tonos-capital and plain-capital Greek folds to the base lowercase
    forms."""
    return _norm_entry(sf_dir, "greek_lower", _EL_PLANT)


_AR_PLANT = str.maketrans("abcde" "fghijklmn",
                          "آأإىة"
                          "ـًٌٍَُِ"
                          "ّْ")
_AR_FROM = "abcdefghijklmn"
_AR_TO = "ااايه"      # f..n deleted


def ft_arabic_norm(sf_dir: str) -> pa.Table:
    """ArabicNormalizer (ar/ArabicNormalizer.java:60): hamza'd alefs,
    dotless yeh, teh marbuta, and full harakat deletion."""
    return _norm_entry(sf_dir, "arabic_normalize", _AR_PLANT)


_FA_PLANT = str.maketrans("yzkqxh",
                          "یےکۀۂ")
_FA_FROM = "yzkqxh"
_FA_TO = "ييكهه"      # h (hamza above) deleted


def ft_persian_norm(sf_dir: str) -> pa.Table:
    """PersianNormalizer (fa/PersianNormalizer.java:53)."""
    return _norm_entry(sf_dir, "persian_normalize", _FA_PLANT)


_HI_PLANT = str.maketrans("aeuoiqzfcvwj",
                          "आईऊऔऐक़ज़"
                          "फ़ँ़‌‍")
_HI_FROM = "aeuoiqzfcvwj"
_HI_TO = ("अइउओएकजफं")


def ft_hindi_norm(sf_dir: str) -> pa.Table:
    """HindiNormalizer (hi/HindiNormalizer.java:44): long vowels,
    nukta consonants, candrabindu, nukta/ZWJ/ZWNJ deletion (the
    context-free rule subset; dead-n and virama context rules are
    golden-gated in tests/test_langnorm.py)."""
    return _norm_entry(sf_dir, "hindi_normalize", _HI_PLANT)


def ft_scandinavian_fold(sf_dir: str) -> pa.Table:
    """ScandinavianFoldingFilter (miscellaneous/
    ScandinavianFoldingFilter.java:41): the aa/ae/ao/oe/oo digraph
    follower deletions fire directly on the corpus."""
    return _norm_entry(sf_dir, "scandinavian_fold", None)


def oracle_turkish_lower_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT replace(word, 'i', 'ı') AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def _translate_stats_sql(frm: str, to: str) -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT translate(word, '{frm}', '{to}') AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_greek_lower_sql() -> str:
    return _translate_stats_sql(_EL_FROM, _EL_TO)


def oracle_arabic_norm_sql() -> str:
    return _translate_stats_sql(_AR_FROM, _AR_TO)


def oracle_persian_norm_sql() -> str:
    return _translate_stats_sql(_FA_FROM, _FA_TO)


def oracle_hindi_norm_sql() -> str:
    return _translate_stats_sql(_HI_FROM, _HI_TO)


def oracle_scandinavian_fold_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT regexp_replace(word, '(a)[aeo]|(o)[eo]', '\\1\\2', 'g') AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def _identity_word_stats_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_common_grams_sql() -> str:
    return f"""WITH base AS (
  SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents
), idx AS (
  SELECT d, ws, unnest(generate_series(1, array_length(ws))) AS i
  FROM base
), tok AS (
  SELECT d, ws[i] AS cur,
         CASE WHEN i > 1 THEN ws[i-1] ELSE NULL END AS prv
  FROM idx WHERE ws[i] <> ''
), stream AS (
  SELECT d, cur AS term FROM tok
  UNION ALL
  SELECT d, prv || '_' || cur FROM tok
  WHERE prv IS NOT NULL AND (prv IN {_STOP_SQL} OR cur IN {_STOP_SQL})
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM stream GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_keep_word_sql() -> str:
    from ..analysis_en import KEEP_WORDS
    keep = ", ".join(f"'{w}'" for w in sorted(KEEP_WORDS))
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word IN ({keep})
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_fingerprint_sql() -> str:
    from ..analysis import FINGERPRINT_MAX_OUTPUT
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), fp AS (
  SELECT d, string_agg(DISTINCT word, ' ' ORDER BY word) AS term
  FROM w WHERE word <> '' GROUP BY d
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM fp WHERE length(term) <= {FINGERPRINT_MAX_OUTPUT}
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_limit_count_sql() -> str:
    from ..analysis import LIMIT_TOKEN_COUNT
    return f"""WITH w AS (
  SELECT doc_id AS d,
         unnest(list_slice(string_split(text, ' '), 1,
                           {LIMIT_TOKEN_COUNT})) AS word
  FROM documents
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_capitalization_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT upper(substr(word, 1, 1)) || substr(word, 2) AS term,
       CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM w WHERE word <> ''
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


def oracle_type_filter_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), v AS (
  SELECT d, word, (length(word) + d) % 5 AS variant
  FROM w WHERE regexp_matches(word, '^[a-z]{{3,}}$')
)
SELECT word AS term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM v WHERE variant IN (0, 1) AND word NOT IN {_STOP_SQL}
GROUP BY term ORDER BY df DESC, term LIMIT {_NGRAM_TOP}"""


# ---------------------------------------------------------------------------
# ICU folding (ICUFoldingFilter)


def ft_icu_fold(sf_dir: str) -> pa.Table:
    """ICU folding chain (analysis/icu/ICUFoldingFilter.java:64) over a
    deterministically decorated corpus: each word ``w`` becomes the
    token ``Ẃ-style cap + combining acute + rest + 'ß' + 'ﬁ' + '１'``
    — exercising case folding (incl. ß→ss), accent removal (composed
    via NFKC first, then stripped), ligature and width compatibility
    folding in one token. The REAL generic folder
    (:func:`lucene_ray.icufold.icu_fold`, golden-pinned to the
    reference's TestICUFoldingFilter vectors) runs inside map_batches;
    the oracle reproduces the documented folding of this token shape
    (``w || 'ssfi1'``). Per-term (df, ttf), ordered by term."""
    import ray.data

    from ..icufold import icu_fold

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        dfs: dict[str, int] = {}
        ttfs: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            toks = [icu_fold(f"{w[0].upper()}́{w[1:]}ß"
                             f"ﬁ１")
                    for w in (text or "").split(" ") if w]
            seen: dict[str, int] = {}
            for t in toks:
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                dfs[t] = dfs.get(t, 0) + 1
                ttfs[t] = ttfs.get(t, 0) + c
        ks = sorted(dfs)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([dfs[k] for k in ks], pa.int64()),
                         "ttf": pa.array([ttfs[k] for k in ks], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("ttf", alias_name="ttf"))
           .to_pandas())
    agg = agg.sort_values("term").reset_index(drop=True)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def oracle_icu_fold_sql() -> str:
    """The corpus word itself folds too: lower + ß→ss + accent strip
    covers the Latin-script corpus domain (compatibility/ligature/
    width folding beyond that is exercised by the PLANT — already
    folded in the literal — and by the ICU test-vector goldens)."""
    return """WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
terms AS (SELECT d,
                 strip_accents(lower(replace(word, 'ß', 'ss')))
                 || 'ssfi1' AS term
          FROM w WHERE word <> '')
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df, count(*) AS ttf
FROM terms GROUP BY term ORDER BY term"""


# ---------------------------------------------------------------------------
# CJK analysis chain (CJKAnalyzer / CJKBigramFilter)

_CJK_TOP = 50
_CJK_BASE = 0x4E00
_CJK_MOD = 20000      # keep derived chars inside the Han block


def _corpus_vocab(sf_dir: str) -> list[str]:
    """Sorted distinct corpus vocabulary (Heaps-law small — the same
    broadcast shape doc_keywords uses); '' dropped BEFORE ranking so
    dense ranks line up with the SQL oracles' ``row_number() OVER
    (ORDER BY term)`` over ``DISTINCT ... WHERE word <> ''``."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def batch_vocab(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(
            batch.column("text").cast(pa.string()), " "))
        return pa.table({"term": pc.unique(flat)})

    return [w for w in
            sorted(ds.map_batches(batch_vocab, batch_format="pyarrow")
                   .unique("term")) if w]


def _cjk_vocab_map(sf_dir: str) -> dict[str, str]:
    """Deterministic word → Han-ideograph map: rank in the corpus's
    sorted distinct vocabulary → chr(0x4E00 + rank % 20000). The SQL
    oracle derives the identical map with dense ranks over DISTINCT
    terms, so both sides tokenize the same synthetic CJK text (the
    testdata corpus itself carries no CJK — the map turns it into a
    deterministic CJK corpus without external data)."""
    return {w: chr(_CJK_BASE + i % _CJK_MOD)
            for i, w in enumerate(_corpus_vocab(sf_dir))}


def ft_cjk_bigrams(sf_dir: str) -> pa.Table:
    """CJK analysis chain (analysis/cjk/CJKAnalyzer.java:39 →
    CJKBigramFilter.java:63): the corpus is deterministically mapped to
    Han text (see :func:`_cjk_vocab_map`), run through the REAL UAX#29
    tokenizer (one token per ideograph, WB999) + the CJK bigram stream
    filter, and aggregated to per-term (df, ttf) with per-batch partials
    — top-50 by (df desc, term asc). The same ``cjk`` analyzer name is
    accepted by ``build_index(analyzer="cjk")`` for index-time bigrams
    (pytest-covered)."""
    import ray
    import ray.data

    from ..analysis import cjk_bigram_stream, tokenize

    vmap_ref = ray.put(_cjk_vocab_map(sf_dir))
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(vmap_ref)
        terms, dfs, ttfs = {}, {}, {}
        for text in batch.column("text").to_pylist():
            words = (text or "").split(" ")
            han = "".join(m.get(w, "") for w in words)
            toks = cjk_bigram_stream(tokenize(han)) if han else []
            if not toks:
                continue
            seen = {}
            for t in toks:
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                dfs[t] = dfs.get(t, 0) + 1
                ttfs[t] = ttfs.get(t, 0) + c
        ks = sorted(dfs)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([dfs[k] for k in ks], pa.int64()),
                         "ttf": pa.array([ttfs[k] for k in ks], pa.int64())})

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("ttf", alias_name="ttf"))
           .to_pandas())
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_CJK_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def oracle_cjk_bigrams_sql() -> str:
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
vmap AS (
  SELECT term,
         chr({_CJK_BASE} + (CAST(row_number() OVER (ORDER BY term) AS INT)
                            - 1) % {_CJK_MOD}) AS han
  FROM (SELECT DISTINCT word AS term FROM w WHERE word <> '')
),
ctext AS (
  SELECT d, string_agg(v.han, '' ORDER BY w.pos) AS text
  FROM w JOIN vmap v ON v.term = w.word
  GROUP BY d
),
grams AS (
  SELECT d, substr(text, CAST(i AS INT), 2) AS term
  FROM ctext, UNNEST(generate_series(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 2
  UNION ALL
  SELECT d, text AS term FROM ctext WHERE length(text) = 1
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM grams GROUP BY term
ORDER BY df DESC, term LIMIT {_CJK_TOP}"""


# ---------------------------------------------------------------------------
# Dictionary-lattice CJK segmentation (kuromoji role,
# ja/JapaneseTokenizer.java:61 over morph/Viterbi.java)

# lattice word-code alphabet: three DISJOINT blocks so each lexicon
# word is digit₁ (CJK ext A), digit₂ (CJK unified), terminator (late
# CJK unified) — every lexicon surface contains exactly one terminator
# char, at its end, which makes the code prefix-free: ANY
# dictionary-only lattice path must align on terminators, so the
# min-cost Viterbi parse provably recovers the original words and the
# SQL oracle can rank/encode them without simulating the lattice.
# (Ambiguous-lattice behavior is pinned separately by
# tests/test_lattice.py goldens.)
_LAT_D1, _LAT_D2, _LAT_TERM = 0x3400, 0x4E00, 0x9F00


def _lattice_code(r: int) -> str:
    return (chr(_LAT_D1 + r // 256) + chr(_LAT_D2 + r % 256)
            + chr(_LAT_TERM + r % 64))


class _LatticeStats:
    """Actor stage: Viterbi tokenizer built ONCE per actor from the
    broadcast lexicon; per-batch (term, df, ttf) partials."""

    def __init__(self, lex_ref, vmap_ref):
        import ray

        from ..lattice import LatticeTokenizer

        self._tok = LatticeTokenizer(ray.get(lex_ref))
        self._vmap = ray.get(vmap_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self._vmap
        dfs: dict[str, int] = {}
        ttfs: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            han = "".join(m.get(w, "") for w in (text or "").split(" "))
            if not han:
                continue
            seen: dict[str, int] = {}
            for t in self._tok.tokenize(han):
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                dfs[t] = dfs.get(t, 0) + 1
                ttfs[t] = ttfs.get(t, 0) + c
        ks = sorted(dfs)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([dfs[k] for k in ks], pa.int64()),
                         "ttf": pa.array([ttfs[k] for k in ks], pa.int64())})


def ft_cjk_lattice(sf_dir: str) -> pa.Table:
    """Morphological CJK segmentation (kuromoji role): the corpus is
    deterministically mapped to Han text via the prefix-free
    ``_lattice_code`` (one 3-ideograph "morpheme" per word), the REAL
    Viterbi lattice tokenizer (``lucene_ray.lattice``, golden-pinned to
    ja/ViterbiNBest.java semantics) re-segments the concatenated text
    against the corpus-derived lexicon, and per-term (df, ttf) partials
    aggregate to the top-50 by (df desc, term asc). Upgrades
    ``ft_cjk_bigrams``'s recall-shaped bigrams to morpheme-precision
    segmentation, per the round-4 verdict."""
    import ray
    import ray.data

    vocab = _corpus_vocab(sf_dir)
    codes = [_lattice_code(r) for r in range(len(vocab))]
    # word costs vary deterministically; correctness never depends on
    # them (prefix-free code ⇒ unique dictionary-only parse)
    lex_ref = ray.put({c: 100 + r % 7 for r, c in enumerate(codes)})
    vmap_ref = ray.put(dict(zip(vocab, codes)))
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(_LatticeStats, batch_format="pyarrow",
                          fn_constructor_args=(lex_ref, vmap_ref),
                          concurrency=(1, 8))
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("ttf", alias_name="ttf"))
           .to_pandas())
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_CJK_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def oracle_cjk_lattice_sql() -> str:
    """The lattice provably recovers the original words (prefix-free
    code — see ``_lattice_code``), so the oracle ranks the vocabulary,
    re-derives each word's 3-char code, and aggregates df/ttf."""
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
vmap AS (
  SELECT term,
         chr({_LAT_D1} + CAST((rn - 1) // 256 AS INT))
         || chr({_LAT_D2} + CAST((rn - 1) % 256 AS INT))
         || chr({_LAT_TERM} + CAST((rn - 1) % 64 AS INT)) AS code
  FROM (SELECT term, row_number() OVER (ORDER BY term) AS rn
        FROM (SELECT DISTINCT word AS term FROM w WHERE word <> ''))
),
terms AS (
  SELECT d, v.code AS term FROM w JOIN vmap v ON v.term = w.word
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM terms GROUP BY term
ORDER BY df DESC, term LIMIT {_CJK_TOP}"""


# ---------------------------------------------------------------------------
# Korean morphological segmentation (nori role,
# ko/KoreanTokenizer.java:92 + KoreanPartOfSpeechStopFilter.java:38)

# Hangul-syllable word-code alphabet (three DISJOINT blocks inside
# U+AC00..U+D7A3, same prefix-free construction as _lattice_code):
# each vocab word maps to syl₁ syl₂ term; the lexicon additionally
# carries the 2-syllable prefix and the 1-syllable terminator as
# standalone entries so the code word is a genuine COMPOUND the
# decompound stage must split. Terminators whose (rank % 64) % 5 == 0
# are tagged "J" (particle) — the default POS stop set drops them,
# exercising KoreanPartOfSpeechStopFilter against the SQL oracle.
_KO_D1, _KO_D2, _KO_TERM = 0xAC00, 0xB800, 0xD000


def _korean_code(r: int) -> str:
    return (chr(_KO_D1 + r // 256) + chr(_KO_D2 + r % 256)
            + chr(_KO_TERM + r % 64))


def _korean_entries(n_vocab: int):
    """(surface, cost, pos, parts) tuples for the broadcast lexicon.
    Compound cost 50 always beats prefix+terminator (80+80), so the
    Viterbi parse deterministically recovers the compounds."""
    rows = []
    for r in range(n_vocab):
        code = _korean_code(r)
        rows.append((code, 50, "NNG", [code[:2], code[2:]]))
        rows.append((code[:2], 80, "NNG", None))
    for t in range(min(64, n_vocab)):
        pos = "J" if t % 5 == 0 else "NNG"
        rows.append((chr(_KO_TERM + t), 80, pos, None))
    return rows


class _KoreanLatticeStats:
    """Actor stage: KoreanTokenizer (Viterbi + decompound + POS stop)
    built ONCE per actor from the broadcast lexicon; per-batch
    (term, df, ttf) partials."""

    def __init__(self, rows_ref, vmap_ref):
        import ray

        from ..lattice import KoreanEntry, KoreanTokenizer

        entries = [KoreanEntry(s, c, pos, parts=p)
                   for s, c, pos, p in ray.get(rows_ref)]
        self._tok = KoreanTokenizer(entries, decompound="discard")
        self._vmap = ray.get(vmap_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self._vmap
        dfs: dict[str, int] = {}
        ttfs: dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            han = "".join(m.get(w, "") for w in (text or "").split(" "))
            if not han:
                continue
            seen: dict[str, int] = {}
            for t in self._tok.tokenize(han):
                seen[t] = seen.get(t, 0) + 1
            for t, c in seen.items():
                dfs[t] = dfs.get(t, 0) + 1
                ttfs[t] = ttfs.get(t, 0) + c
        ks = sorted(dfs)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "df": pa.array([dfs[k] for k in ks], pa.int64()),
                         "ttf": pa.array([ttfs[k] for k in ks], pa.int64())})


def ft_korean_lattice(sf_dir: str) -> pa.Table:
    """Korean morphological analysis (nori role): the corpus maps to
    Hangul-syllable compounds (``_korean_code``), the REAL
    KoreanTokenizer (Viterbi lattice → decompound DISCARD → default POS
    stop set) re-segments it, and per-term (df, ttf) partials aggregate
    to the top-50 by (df desc, term asc). The decompound split and the
    "J"-tagged terminator drops are both SQL-checkable, so the oracle
    gates the full nori post-stage chain, not just the lattice."""
    import ray
    import ray.data

    vocab = _corpus_vocab(sf_dir)
    rows_ref = ray.put(_korean_entries(len(vocab)))
    vmap_ref = ray.put({w: _korean_code(r)
                        for r, w in enumerate(vocab)})
    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])

    from ray.data.aggregate import Sum

    agg = (ds.map_batches(_KoreanLatticeStats, batch_format="pyarrow",
                          fn_constructor_args=(rows_ref, vmap_ref),
                          concurrency=(1, 8))
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("ttf", alias_name="ttf"))
           .to_pandas())
    agg = agg.sort_values(["df", "term"],
                          ascending=[False, True]).head(_CJK_TOP)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "df": pa.array(agg["df"].astype(np.int64)),
                     "ttf": pa.array(agg["ttf"].astype(np.int64))})


def oracle_korean_lattice_sql() -> str:
    """The compound parse is deterministic (cost 50 < 80+80), so each
    word emits its 2-syllable prefix, plus its terminator unless the
    terminator rank hits the "J" particle rule ((rank%64)%5 == 0)."""
    return f"""WITH w AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
),
vmap AS (
  SELECT term, rn - 1 AS r
  FROM (SELECT term, row_number() OVER (ORDER BY term) AS rn
        FROM (SELECT DISTINCT word AS term FROM w WHERE word <> ''))
),
emitted AS (
  SELECT d, chr({_KO_D1} + CAST(r // 256 AS INT))
            || chr({_KO_D2} + CAST(r % 256 AS INT)) AS term
  FROM w JOIN vmap v ON v.term = w.word
  UNION ALL
  SELECT d, chr({_KO_TERM} + CAST(r % 64 AS INT)) AS term
  FROM w JOIN vmap v ON v.term = w.word
  WHERE (r % 64) % 5 <> 0
)
SELECT term, CAST(count(DISTINCT d) AS BIGINT) AS df,
       count(*) AS ttf
FROM emitted GROUP BY term
ORDER BY df DESC, term LIMIT {_CJK_TOP}"""


# ---------------------------------------------------------------------------
# Payload queries (PayloadScoreQuery over span term / span near)

# (qid, spec, payload_function, k) — spec is ("term", t) or
# ("span", (t1, t2)) for an ordered slop-0 two-term span
PAYLOAD_QUERIES = [
    (1, ("term", "vector"), "max", 10),
    (2, ("term", "key"), "sum", 10),
    (3, ("term", "table"), "avg", 10),
    (4, ("span", ("key", "agg")), "max", 10),
]


def _payload_starts(idx: str, docs: "list[int]") -> dict:
    """tok_starts for the matched docs only (predicate-pushdown read of
    the docmeta forward store — the term-vectors payload path,
    index/TermVectorsReader role)."""
    import pyarrow.parquet as pq_

    dm = pq_.read_table(os.path.join(idx, "docmeta"),
                        columns=["doc_id", "tok_starts"],
                        filters=[("doc_id", "in", docs)])
    return {d: np.asarray(s, np.int64)
            for d, s in zip(dm.column("doc_id").to_pylist(),
                            dm.column("tok_starts").to_pylist())}


def ft_payload_score(sf_dir: str) -> pa.Table:
    """PayloadScoreQuery (queries/payloads/PayloadScoreQuery.java:48,
    includeSpanScore=false) with MaxPayloadFunction / SumPayloadFunction
    / AveragePayloadFunction (payloads/PayloadFunction.java subclasses):
    the payload attached to every token is its START OFFSET
    (analysis/payloads/TokenOffsetPayloadTokenFilter.java:28 role),
    stored in the offsets forward store and read back per match
    position. Span specs: a single SpanTermQuery, or an ordered slop-0
    two-term SpanNearQuery (spans/SpanNearQuery.java:55) whose every
    matched span contributes BOTH positions' payloads, exactly the
    reference's per-span payload collection. Scores are float32 (the
    payload decoder's float path); top-k by (score desc, doc asc)."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    out = []
    for qid, (kind, spec), func, k in PAYLOAD_QUERIES:
        if kind == "term":
            pos_of = _term_positions(r, spec) or {}
            match_pos = {d: (np.asarray(p, np.int64),)
                         for d, p in pos_of.items()}
        else:
            t1, t2 = spec
            p1 = _term_positions(r, t1) or {}
            p2 = _term_positions(r, t2) or {}
            match_pos = {}
            for d, a in p1.items():
                b = p2.get(d)
                if b is None:
                    continue
                a = np.asarray(a, np.int64)
                starts = a[np.isin(a + 1, np.asarray(b, np.int64))]
                if len(starts):
                    match_pos[d] = (starts, starts + 1)
        docs = sorted(match_pos)
        if not docs:
            continue
        st_of = _payload_starts(idx, docs)
        scores = np.empty(len(docs), np.float32)
        for i, d in enumerate(docs):
            pay = np.concatenate([st_of[d][p] for p in match_pos[d]])
            if func == "max":
                scores[i] = np.float32(pay.max())
            elif func == "sum":
                scores[i] = np.float32(pay.sum())
            else:
                scores[i] = np.float32(pay.sum()) / np.float32(len(pay))
        darr = np.asarray(docs, np.int64)
        sel = np.lexsort((darr, -scores))[:k]
        out.append(pa.table({
            "qid": pa.array([qid] * len(sel), pa.int64()),
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64)),
            "doc_id": pa.array(darr[sel], pa.int64()),
            "score": pa.array(scores[sel], pa.float32()),
        }))
    return pa.concat_tables(out) if out else pa.table({
        "qid": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float32())})


_WOFF_CTE = """
wpos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM (SELECT d AS doc_id, text FROM corpus)
),
wo AS (
  SELECT doc_id AS d, pos, word,
         CAST(coalesce(sum(length(word)) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + pos - 1 AS BIGINT) AS off
  FROM wpos
)"""


def oracle_payload_score_sql() -> str:
    rows = []
    for qid, (kind, spec), func, k in PAYLOAD_QUERIES:
        if kind == "term":
            if func == "max":
                s = "CAST(max(off) AS REAL)"
            elif func == "sum":
                s = "CAST(sum(off) AS REAL)"
            else:
                s = ("CAST(CAST(sum(off) AS REAL) / "
                     "CAST(count(*) AS REAL) AS REAL)")
            base = (f"SELECT d, {s} AS s FROM wo "
                    f"WHERE word = '{spec}' GROUP BY d")
        else:
            t1, t2 = spec
            agg = {"max": "max(greatest(a.off, b.off))",
                   "sum": "sum(a.off + b.off)"}[func]
            base = (f"SELECT a.d, CAST({agg} AS REAL) AS s "
                    f"FROM wo a JOIN wo b ON b.d = a.d "
                    f"AND b.pos = a.pos + 1 "
                    f"WHERE a.word = '{t1}' AND b.word = '{t2}' "
                    f"GROUP BY a.d")
        rows.append(f"""SELECT {qid} AS qid, rank, doc_id, score FROM (
  SELECT row_number() OVER (ORDER BY s DESC, d ASC) AS rank,
         d AS doc_id, s AS score
  FROM ({base})
) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_WOFF_CTE}\n{un}"


# ---------------------------------------------------------------------------
# WordBreakSpellChecker (break one token into two / combine adjacent)

WORD_BREAKS = [(1, "keyagg"), (2, "tablevalue"), (3, "sparkwindow")]
WORD_COMBINES = [(4, ("vec", "tor")), (5, ("win", "dow")),
                 (6, ("spa", "rk"))]
_WB_TOP = 3
_WB_MIN_LEN = 1      # minBreakWordLength default


def ft_word_break(sf_dir: str) -> pa.Table:
    """WordBreakSpellChecker (spell/WordBreakSpellChecker.java:33),
    maxChanges=1, SuggestMode SUGGEST_WHEN_NOT_IN_INDEX:

    - ``suggestWordBreaks``: for a query term ABSENT from the index,
      every split point whose two halves both exist (df >= 1), ranked
      NUM_CHANGES_THEN_MAX_FREQUENCY (one change each, so by
      max(df_left, df_right) desc; suggestion asc tie-break), top 3.
    - ``suggestWordCombinations``: an adjacent term pair with at least
      one member absent (minFreq == 0 — the SUGGEST_WHEN_NOT_IN_INDEX
      branch at WordBreakSpellChecker.java:208) whose concatenation
      exists, reported with the combined term's df.

    All df lookups go through ONE exact-set termdict scan per query
    (the ``terms=`` predicate pushes `pc.is_in` into each term-sorted
    partition) — candidates, not the vocabulary, reach the driver."""
    r = reader_for(sf_dir)
    kinds, qids, sugg, freqs = [], [], [], []
    for qid, q in WORD_BREAKS:
        cands = {q} | {q[:i] for i in range(_WB_MIN_LEN,
                                            len(q) - _WB_MIN_LEN + 1)} \
            | {q[i:] for i in range(_WB_MIN_LEN, len(q) - _WB_MIN_LEN + 1)}
        t = _content_only(r, termdict_scan(r, terms=sorted(cands)))
        df = dict(zip(t.column("term").to_pylist(),
                      t.column("df").to_pylist()))
        if df.get(q, 0) > 0:            # SUGGEST_WHEN_NOT_IN_INDEX
            continue
        rows = []
        for i in range(_WB_MIN_LEN, len(q) - _WB_MIN_LEN + 1):
            dl, dr = df.get(q[:i], 0), df.get(q[i:], 0)
            if dl >= 1 and dr >= 1:
                rows.append((-max(dl, dr), f"{q[:i]} {q[i:]}"))
        rows.sort()
        for nf, s in rows[:_WB_TOP]:
            qids.append(qid)
            kinds.append("break")
            sugg.append(s)
            freqs.append(-nf)
    for qid, (a, b) in WORD_COMBINES:
        t = _content_only(r, termdict_scan(r, terms=[a, b, a + b]))
        df = dict(zip(t.column("term").to_pylist(),
                      t.column("df").to_pylist()))
        if min(df.get(a, 0), df.get(b, 0)) > 0:   # need one absent member
            continue
        if df.get(a + b, 0) >= 1:
            qids.append(qid)
            kinds.append("combine")
            sugg.append(a + b)
            freqs.append(df[a + b])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "kind": pa.array(kinds, pa.string()),
                     "suggestion": pa.array(sugg, pa.string()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_word_break_sql() -> str:
    rows = []
    for qid, q in WORD_BREAKS:
        rows.append(f"""SELECT * FROM (
  SELECT {qid} AS qid, 'break' AS kind,
         l.term || ' ' || r.term AS suggestion,
         CAST(greatest(l.df, r.df) AS BIGINT) AS freq
  FROM UNNEST(generate_series({_WB_MIN_LEN},
                              {len(q) - _WB_MIN_LEN})) AS s(i)
  JOIN df l ON l.term = substr('{q}', 1, CAST(i AS INT))
  JOIN df r ON r.term = substr('{q}', CAST(i AS INT) + 1)
  WHERE NOT EXISTS (SELECT 1 FROM df WHERE term = '{q}')
  ORDER BY freq DESC, suggestion LIMIT {_WB_TOP})""")
    for qid, (a, b) in WORD_COMBINES:
        rows.append(f"""SELECT {qid} AS qid, 'combine' AS kind,
       term AS suggestion, CAST(df AS BIGINT) AS freq
FROM df
WHERE term = '{a}{b}'
  AND (NOT EXISTS (SELECT 1 FROM df WHERE term = '{a}')
       OR NOT EXISTS (SELECT 1 FROM df WHERE term = '{b}'))""")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# ---------------------------------------------------------------------------
# BooleanQuery with non-scoring FILTER clauses

# (qid, scoring SHOULD terms, FILTER terms (non-scoring MUST),
#  non-scoring MUST_NOT terms, k)
FILTER_QUERIES = [
    (1, ["key", "agg"], ["table"], [], 10),
    (2, ["vector", "spark"], ["window"], ["slow"], 10),
    (3, ["value"], ["key", "agg"], [], 10),
]


def ft_boolean_filter(sf_dir: str) -> pa.Table:
    """BooleanQuery mixing scored SHOULD clauses with Occur.FILTER /
    MUST_NOT clauses (search/BooleanClause.java Occur.FILTER — "like
    MUST except it does not participate in scoring";
    BooleanWeight.java:318 wraps filter scorers in a score-less
    FilterScorer): the filter restricts matches, the score is the plain
    SHOULD-disjunction BM25 sum, bit-identical to the unfiltered scorer
    on the surviving docs."""
    from ..search import search_filtered

    r = reader_for(sf_dir)
    out = []
    for qid, should, fmust, fnot, k in FILTER_QUERIES:
        td = search_filtered(r, should, k, filter_must=fmust,
                             filter_must_not=fnot)
        out.append(pa.table({
            "qid": pa.array([qid] * len(td.doc_ids), pa.int64()),
            "rank": pa.array(np.arange(1, len(td.doc_ids) + 1,
                                       dtype=np.int64)),
            "doc_id": pa.array(td.doc_ids.astype(np.int64)),
            "score": pa.array(td.scores, pa.float32()),
        }))
    return pa.concat_tables(out)


def oracle_boolean_filter_sql() -> str:
    values = []
    for qid, should, _f, _n, _k in FILTER_QUERIES:
        for ci, t in enumerate(should):
            values.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(values)
    parts = []
    for qid, _s, fmust, fnot, k in FILTER_QUERIES:
        conds = []
        for t in fmust:
            conds.append(f"EXISTS (SELECT 1 FROM tf x "
                         f"WHERE x.d = tl.d AND x.term = '{t}')")
        for t in fnot:
            conds.append(f"NOT EXISTS (SELECT 1 FROM tf x "
                         f"WHERE x.d = tl.d AND x.term = '{t}')")
        where = " AND ".join(conds) if conds else "TRUE"
        parts.append(f"""SELECT qid, rank, doc_id, score FROM (
  SELECT {qid} AS qid, row_number() OVER (
           ORDER BY score DESC, d ASC) AS rank,
         d AS doc_id, score
  FROM totals tl WHERE tl.qid = {qid} AND {where}
) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d,
    CAST(
      CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
      - CAST(ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5) / (f.df + 0.5)) AS REAL)
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
)
{un}"""


# ---------------------------------------------------------------------------
# ToChildBlockJoinQuery (parent hits fan down to their children)

BLOCKJOIN_CHILD_QUERIES = [(1, ["key", "agg"], "max", 3),
                           (2, ["vector"], "total", 3)]


def ft_blockjoin_child(sf_dir: str) -> pa.Table:
    """ToChildBlockJoinQuery (join/ToChildBlockJoinQuery.java:40): the
    inverse of the parent join — every child doc of a matching parent is
    returned carrying its PARENT's score (the reference's childScorer
    exposes parentScore per child). Parent matches here are the top-k
    block-join parents (repo blocks, ScoreMode-aggregated child scores,
    exactly :func:`ft_blockjoin_parent`); children are enumerated from
    the ``repo:`` keyword postings, in doc order."""
    from ..search import _term_docset, search_blockjoin_parent

    r = reader_for(sf_dir)
    out = []
    for qid, terms, mode, k in BLOCKJOIN_CHILD_QUERIES:
        t = search_blockjoin_parent(r, terms, mode, k)
        for parent, score in zip(t.column("parent").to_pylist(),
                                 t.column("score").to_pylist()):
            kids = np.sort(_term_docset(r, f"repo:{parent}"))
            out.append(pa.table({
                "qid": pa.array([qid] * len(kids), pa.int64()),
                "parent": pa.array([parent] * len(kids), pa.string()),
                "doc_id": pa.array(kids.astype(np.int64)),
                "score": pa.array([score] * len(kids), pa.float32()),
            }))
    return pa.concat_tables(out) if out else pa.table({
        "qid": pa.array([], pa.int64()),
        "parent": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "score": pa.array([], pa.float32())})


def oracle_blockjoin_child_sql() -> str:
    mode_expr = {
        "max": "max(cs)",
        "total": "CAST(sum(CAST(cs AS DOUBLE)) AS REAL)",
        "avg": "CAST(sum(CAST(cs AS DOUBLE)) / count(*) AS REAL)",
    }
    parts = []
    for qid, terms, mode, k in BLOCKJOIN_CHILD_QUERIES:
        cl = "\n      UNION ALL ".join(
            f"SELECT {ci} AS clause, '{t}' AS term"
            for ci, t in enumerate(terms))
        parts.append(f"""(
  SELECT {qid} AS qid, tops.parent, kid.d AS doc_id, tops.score
  FROM (
    SELECT parent, score FROM (
      SELECT parent, score, row_number() OVER (
               ORDER BY score DESC, parent ASC) AS rank
      FROM (
        SELECT p.source AS parent, {mode_expr[mode]} AS score
        FROM (
          SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS cs
          FROM (
            SELECT t.d AS d, {_SCORE_EXPR} AS s
            FROM (
              {cl}
            ) c
            JOIN tf t ON t.term = c.term
            JOIN df f ON f.term = c.term
            JOIN quant q ON q.d = t.d
          )
          GROUP BY d
        ) child
        JOIN par p ON p.d = child.d
        GROUP BY p.source
      )
    ) WHERE rank <= {k}
  ) tops
  JOIN par kid ON kid.source = tops.parent)""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
par AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         source
  FROM documents
)
{un}"""


# ---------------------------------------------------------------------------
# Association facets (per-category aggregation of a per-doc value)

def ft_facet_assoc(sf_dir: str):
    """Association facets (facet/taxonomy/TaxonomyFacetIntAssociations
    .java:33 with AssociationAggregationFunction.SUM): each doc carries
    an integer association value — its field length docvalue — and the
    facet aggregates (count, sum) per category instead of just counting.
    Per-batch Arrow partials + one tiny combiner groupby, the
    ft_facet_lang shape."""
    import ray.data
    from ray.data.aggregate import Sum

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["lang", "field_len"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([("field_len", "count"),
                                              ("field_len", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n": g.column("field_len_count").cast(pa.int64()),
                         "sum_len": g.column("field_len_sum")
                         .cast(pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("lang")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_len", alias_name="sum_len")))


def oracle_facet_assoc_sql() -> str:
    return ("SELECT lang, count(*) AS n, "
            "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_len "
            "FROM documents GROUP BY lang")


# ---------------------------------------------------------------------------
# SpanFirstQuery (match only within the first N positions)

SPAN_FIRST_QUERIES = [(1, "key", 3), (2, "vector", 1), (3, "agg", 5)]


def ft_span_first(sf_dir: str) -> pa.Table:
    """SpanFirstQuery (spans/SpanFirstQuery.java:36 — a SpanPositionRange
    with start 0): docs where the term occurs with span END <= n, i.e.
    one of its first n positions (0-based position < n). Positions come
    straight from the positional postings; no document scan."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    qids, docs, firsts = [], [], []
    for qid, term, n in SPAN_FIRST_QUERIES:
        pos_of = _term_positions(r, term) or {}
        for d in sorted(pos_of):
            p = np.asarray(pos_of[d], np.int64)
            m = p[p < n]
            if len(m):
                qids.append(qid)
                docs.append(int(d))
                firsts.append(int(m.min()))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "first_pos": pa.array(firsts, pa.int64())})


def oracle_span_first_sql() -> str:
    rows = []
    for qid, term, n in SPAN_FIRST_QUERIES:
        rows.append(
            f"SELECT {qid} AS qid, d AS doc_id, "
            f"CAST(min(pos) - 1 AS BIGINT) AS first_pos "
            f"FROM wpos WHERE word = '{term}' AND pos <= {n} GROUP BY d")
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
wpos AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# SpanNotQuery (include spans with no exclude span within pre/post)

# (qid, include term, exclude term, pre, post)
SPAN_NOT_QUERIES = [(1, "key", "table", 2, 2),
                    (2, "scan", "merge", 0, 3),
                    (3, "window", "batch", 1, 0),
                    (4, "vector", "zzmissing", 5, 5)]


def ft_span_not(sf_dir: str) -> pa.Table:
    """SpanNotQuery (queries/spans/SpanNotQuery.java:37): include-term
    spans survive unless an exclude span sits within ``pre`` tokens
    before or ``post`` tokens after. For width-1 term spans the Java
    two-pointer rejection (:202 skip while excl.end <= cand.start - pre;
    :210 accept when excl.start - post >= cand.end) reduces to: reject
    include position p iff an exclude position q satisfies
    p - pre <= q <= p + post — evaluated here with two searchsorted
    probes per doc over the sorted exclude positions. Docs with >= 1
    surviving span are returned with the surviving-span count."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    qids, docs, counts = [], [], []
    for qid, inc, exc, pre, post in SPAN_NOT_QUERIES:
        pos_inc = _term_positions(r, inc) or {}
        pos_exc = _term_positions(r, exc) or {}
        for d in sorted(pos_inc):
            p = np.sort(np.asarray(pos_inc[d], np.int64))
            q = np.sort(np.asarray(pos_exc.get(d, ()), np.int64))
            if len(q):
                lo = np.searchsorted(q, p - pre, side="left")
                hi = np.searchsorted(q, p + post, side="right")
                surv = (hi - lo) == 0
            else:
                surv = np.ones(len(p), bool)
            n = int(surv.sum())
            if n:
                qids.append(qid)
                docs.append(int(d))
                counts.append(n)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n_spans": pa.array(counts, pa.int64())})


def oracle_span_not_sql() -> str:
    rows = []
    for qid, inc, exc, pre, post in SPAN_NOT_QUERIES:
        rows.append(f"""SELECT {qid} AS qid, p.d AS doc_id,
       count(*) AS n_spans
FROM wpos p WHERE p.word = '{inc}' AND NOT EXISTS (
  SELECT 1 FROM wpos q
  WHERE q.d = p.d AND q.word = '{exc}'
    AND q.pos BETWEEN p.pos - {pre} AND p.pos + {post})
GROUP BY p.d""")
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
wpos AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# SimpleQueryParser (never-throws end-user query language)

SIMPLE_QUERIES = [
    (1, "key agg"),                    # whitespace = default OR
    (2, "key + agg | slow"),           # op change → new level: (k∧a)∨s
    (3, "key + (agg | slow)"),         # explicit precedence
    (4, "-key vector"),                # NOT wrapper ∪ term
    (5, '"slow fast"~2 + window'),     # near phrase AND term
    (6, "ke* + -agg"),                 # prefix AND NOT
    (7, "key + ) agg |"),              # stray ')' + dangling '|' ignored
    (8, "--key"),                      # double negation cancels
    (9, "valu~1"),                     # fuzzy
    (10, "*"),                         # MatchAllDocsQuery
]


def ft_simple_query(sf_dir: str) -> pa.Table:
    """SimpleQueryParser (queryparser/simple/SimpleQueryParser.java:103):
    the fault-tolerant end-user language (+ | - \" * ~ parentheses,
    default OR, left-fold with a new Boolean level on operator change,
    malformed syntax degraded instead of thrown). Parsed by
    ``lucene_ray.simpleqp.parse`` and evaluated to LIVE doc sets on the
    engine's own postings / termdict-expansion / positional matchers →
    (qid, doc_id). Each oracle row below is the hand-derived SQL of the
    EXPECTED parse, so equality pins the parse tree, including the
    error-tolerance rows."""
    from ..simpleqp import eval_docs, parse

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, text in SIMPLE_QUERIES:
        d = eval_docs(r, parse(text))
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_simple_query_sql() -> str:
    t = "SELECT d FROM tf WHERE term = '{}'"
    sloppy = """SELECT DISTINCT w0.d AS d
FROM w w0 JOIN w w1 ON w1.d = w0.d
WHERE w0.word = 'slow' AND w1.word = 'fast'
  AND greatest(w0.pos, w1.pos - 1) - least(w0.pos, w1.pos - 1) <= 2"""
    per_q = {
        1: f"{t.format('key')} UNION {t.format('agg')}",
        2: f"(({t.format('key')} INTERSECT {t.format('agg')}) "
           f"UNION {t.format('slow')})",
        3: f"({t.format('key')} INTERSECT "
           f"({t.format('agg')} UNION {t.format('slow')}))",
        4: f"((SELECT d FROM corpus EXCEPT {t.format('key')}) "
           f"UNION {t.format('vector')})",
        5: f"(({sloppy}) INTERSECT {t.format('window')})",
        6: "((SELECT DISTINCT d FROM tf WHERE term LIKE 'ke%') "
           f"INTERSECT (SELECT d FROM corpus EXCEPT {t.format('agg')}))",
        7: f"({t.format('key')} INTERSECT {t.format('agg')})",
        8: t.format("key"),
        9: ("(SELECT DISTINCT t2.d FROM tf t2 JOIN df f2 "
            "ON t2.term = f2.term WHERE levenshtein(f2.term, 'valu') <= 1)"),
        10: "SELECT d FROM corpus",
    }
    rows = [f"SELECT {qid} AS qid, d AS doc_id FROM ({sql})"
            for qid, sql in per_q.items()]
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# Phrase-prefix query (search-as-you-type)

# (qid, fixed leading terms, last-position prefix)
PHRASE_PREFIX_QUERIES = [(1, ["key"], "ag"), (2, ["data"], "va"),
                         (3, ["spark"], "win")]
_PP_MAX_EXPANSIONS = 50


def ft_phrase_prefix(sf_dir: str) -> pa.Table:
    """Phrase-prefix matching (sandbox/search/PhraseWildcardQuery.java:60;
    the MatchPhrasePrefix shape): the last position accepts any term
    with the given prefix, capped at maxExpansions=50 in dictionary
    (term) order — the expansion feeds the exact MultiPhraseQuery
    matcher (search/MultiPhraseQuery.java:54), so freq = number of exact
    consecutive matches with ANY expanded alternative."""
    from ..search import multi_phrase_freqs

    r = reader_for(sf_dir)
    qids, docs, freqs = [], [], []
    for qid, fixed, prefix in PHRASE_PREFIX_QUERIES:
        exp = _content_only(r, termdict_scan(r, prefix=prefix)) \
            .column("term").to_pylist()[:_PP_MAX_EXPANSIONS]
        if not exp:
            continue
        fr = multi_phrase_freqs(r, [[t] for t in fixed] + [exp])
        for d in sorted(fr):
            qids.append(qid)
            docs.append(d)
            freqs.append(fr[d])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_phrase_prefix_sql() -> str:
    parts = []
    for qid, fixed, prefix in PHRASE_PREFIX_QUERIES:
        n = len(fixed)
        joins = ["FROM w w0"]
        conds = [f"w0.word = '{fixed[0]}'"]
        for i in range(1, n):
            joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                         f"AND w{i}.pos = w0.pos + {i}")
            conds.append(f"w{i}.word = '{fixed[i]}'")
        joins.append(f"JOIN w w{n} ON w{n}.d = w0.d "
                     f"AND w{n}.pos = w0.pos + {n}")
        conds.append(
            f"w{n}.word IN (SELECT word FROM "
            f"(SELECT DISTINCT word FROM w WHERE word LIKE '{prefix}%' "
            f"ORDER BY word LIMIT {_PP_MAX_EXPANSIONS}))")
        parts.append(
            f"SELECT {qid} AS qid, w0.d AS doc_id, "
            f"CAST(count(*) AS BIGINT) AS freq\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds)
            + "\nGROUP BY w0.d")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# Bloom-gated term existence (BloomFilteringPostingsFormat)

TERM_EXISTS_PROBES = ["data", "value", "table", "return", "key", "the",
                      "zzmissing", "qqqabsent", "xylophone17",
                      "zephyrqx", "blorptile", "quuxation"]


def ft_term_exists(sf_dir: str) -> pa.Table:
    """Term-existence lookups through the bloom gate
    (codecs/bloom/BloomFilteringPostingsFormat.java:62, FuzzySet.java:48):
    builds the per-postings-file bloom derived index (idempotent,
    manifest-versioned), then resolves each probe with the gated reader.
    A bloom NO short-circuits with ZERO partition IO; MAYBE falls through
    to the exact dictionary, so the answers stay exact — the miss-heavy
    primary-key lookup shape the reference format targets."""
    from ..bloom import build_bloom_index

    idx = index_dir_for(sf_dir)
    build_bloom_index(idx)
    r = IndexReader(idx)
    dfs = [int(r.df(t)) for t in TERM_EXISTS_PROBES]
    return pa.table({
        "term": pa.array(TERM_EXISTS_PROBES, pa.string()),
        "present": pa.array([d > 0 for d in dfs], pa.bool_()),
        "df": pa.array(dfs, pa.int64())})


def oracle_term_exists_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in TERM_EXISTS_PROBES)
    return f"""WITH {_CORPUS_CTE},
probes AS (SELECT * FROM (VALUES {vals}) p(term))
SELECT p.term,
       coalesce(d.df, 0) > 0 AS present,
       CAST(coalesce(d.df, 0) AS BIGINT) AS df
FROM probes p LEFT JOIN df d USING (term)"""


# ---------------------------------------------------------------------------
# SweetSpotSimilarity ranking (pluggable-similarity surface)

SWEETSPOT_QUERIES = [(1, ["data", "value", "table"]),
                     (2, ["return", "key"]),
                     (3, ["the", "part", "vector"])]
SWEETSPOT_K = 10


def ft_sweetspot(sf_dir: str) -> pa.Table:
    """Top-k under SweetSpotSimilarity (misc/SweetSpotSimilarity.java:36
    over the TFIDFSimilarity.java:436 scorer mechanics) — the pluggable
    Similarity surface exercised with a non-BM25 model: sqrt tf, classic
    idf, flat sweet-spot length norm from the SAME stored norm bytes.
    Clause scores sum in float64 and round once to float32, the engine's
    BM25 clause-sum discipline."""
    from ..codec import decode_blocks
    from ..sweetspot import idf_classic, norm_table, score_terms

    r = reader_for(sf_dir)
    nt = norm_table()
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms in SWEETSPOT_QUERIES:
        dl, sl = [], []
        for t in terms:
            p = r.postings(t)
            if p is None:
                continue
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            s = score_terms(tf, nm, idf_classic(p.df, r.doc_count), nt)
            lm = r.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            dl.append(d)
            sl.append(s)
        if not dl:
            continue
        alld = np.concatenate(dl)
        alls = np.concatenate(sl).astype(np.float64)
        uniq, inv = np.unique(alld, return_inverse=True)
        tot = np.bincount(inv, weights=alls).astype(np.float32)
        order = np.lexsort((uniq, -tot.astype(np.float64)))
        for rank, i in enumerate(order[:SWEETSPOT_K], 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uniq[i]))
            scores.append(float(tot[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_sweetspot_sql() -> str:
    from ..sweetspot import LN_MAX, LN_MIN, norm_table

    nt0 = float(norm_table()[0])
    span = LN_MAX - LN_MIN
    norm_expr = f"""CASE WHEN q.qlen = 0 THEN CAST({nt0!r} AS REAL)
      ELSE CAST(1.0 / sqrt(CAST(CAST(
        CAST(CAST(0.5 AS REAL) *
             CAST(abs(q.qlen - {LN_MIN}) + abs(q.qlen - {LN_MAX})
                  - {span} AS REAL) AS REAL)
        + CAST(1.0 AS REAL) AS REAL) AS DOUBLE)) AS REAL) END"""
    idf_expr = """CAST(ln(((SELECT n_docs FROM stats) + 1)
                   / CAST(f.df + 1 AS DOUBLE)) + 1.0 AS REAL)"""
    s_expr = f"""CAST(CAST(CAST(sqrt(CAST(t.tf AS DOUBLE)) AS REAL)
      * {idf_expr} AS REAL) * ({norm_expr}) AS REAL)"""
    parts = []
    for qid, terms in SWEETSPOT_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  SELECT {qid} AS qid,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank,
         doc_id, score
  FROM (
    SELECT d AS doc_id, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
    FROM (
      SELECT t.d, {s_expr} AS s
      FROM tf t JOIN df f ON f.term = t.term
      JOIN quant q ON q.d = t.d
      WHERE t.term IN ({tl})
    ) GROUP BY d
  ) ORDER BY score DESC, doc_id LIMIT {SWEETSPOT_K})""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# ---------------------------------------------------------------------------
# CommonTermsQuery (df-adaptive MUST/SHOULD split)

COMMON_TERMS_QUERIES = [(1, ["dup", "the", "data"]),
                        (2, ["dup", "value"]),
                        (3, ["the", "a"]),
                        (4, ["dup", "zzmissing"])]
COMMON_MAX_TF = 0.125          # exact binary fraction: no float hazard
COMMON_K = 10


def ft_common_terms(sf_dir: str) -> pa.Table:
    """CommonTermsQuery
    (queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java:80,
    buildQuery df split at ``docFreq > ceil(maxTermFrequency * maxDoc)``):
    low-frequency terms become scoring MUST clauses, high-frequency terms
    scoring SHOULD clauses — the stopword-free way to keep "the" from
    driving the match set while still letting it contribute score. A
    query term absent from the index is low-frequency (termStates ==
    null), so its MUST clause empties the result. Clause sums follow the
    engine's float64-accumulate / float32-round discipline."""
    import math

    from ..codec import decode_blocks
    from ..search import Scorers, search_boolean

    r = reader_for(sf_dir)
    cutoff = math.ceil(COMMON_MAX_TF * r.doc_count)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms in COMMON_TERMS_QUERIES:
        low = [t for t in terms if r.df(t) <= cutoff]
        must = search_boolean(r, must=low) if low else None
        if must is not None and len(must) == 0:
            continue                      # a MUST term matches nothing
        sc = Scorers(r, terms)
        dl, sl = [], []
        for t in terms:
            p = sc.postings.get(t)
            if p is None:
                continue
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            s = sc.sim[t].score(tf, nm)
            lm = r.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            dl.append(d)
            sl.append(s)
        if not dl:
            continue
        alld = np.concatenate(dl)
        alls = np.concatenate(sl).astype(np.float64)
        uniq, inv = np.unique(alld, return_inverse=True)
        tot = np.bincount(inv, weights=alls).astype(np.float32)
        if must is not None:
            keep = np.isin(uniq, must, assume_unique=True)
            uniq, tot = uniq[keep], tot[keep]
        order = np.lexsort((uniq, -tot.astype(np.float64)))
        for rank, i in enumerate(order[:COMMON_K], 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uniq[i]))
            scores.append(float(tot[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_common_terms_sql() -> str:
    parts = []
    for qid, terms in COMMON_TERMS_QUERIES:
        tl = ", ".join(f"('{t}')" for t in terms)
        parts.append(f"""(
  WITH qterms_{qid} AS (SELECT * FROM (VALUES {tl}) v(term)),
  low_{qid} AS (
    SELECT q.term FROM qterms_{qid} q LEFT JOIN df f USING (term)
    WHERE coalesce(f.df, 0) <=
          CAST(ceil({COMMON_MAX_TF} * (SELECT n_docs FROM stats))
               AS BIGINT)
  ),
  ok_{qid} AS (
    SELECT t.d FROM tf t JOIN low_{qid} l ON l.term = t.term
    GROUP BY t.d
    HAVING count(DISTINCT t.term) = (SELECT count(*) FROM low_{qid})
  )
  SELECT {qid} AS qid,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
           AS rank,
         doc_id, score
  FROM (
    SELECT s.d AS doc_id, CAST(sum(CAST(s.s AS DOUBLE)) AS REAL) AS score
    FROM (
      SELECT t.d, {_SCORE_EXPR} AS s
      FROM tf t JOIN df f ON f.term = t.term
      JOIN quant q ON q.d = t.d
      JOIN qterms_{qid} qt ON qt.term = t.term
    ) s
    WHERE (SELECT count(*) FROM low_{qid}) = 0
       OR s.d IN (SELECT d FROM ok_{qid})
    GROUP BY s.d
  ) ORDER BY score DESC, doc_id LIMIT {COMMON_K})""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_QUANT_LEN}\n{un}"


# ---------------------------------------------------------------------------
# Phonetic matching (analysis/phonetic PhoneticFilter + Soundex)

PHONETIC_PROBES = ["dupp", "vallue", "tabel", "ky", "dta", "agge",
                   "return"]


def _soundex_ctes(src: str, n: str) -> str:
    """CTE chain computing commons-codec Soundex for a (term) relation —
    the collapse step is a LAG window (RE2 has no backreferences)."""
    return f"""{n}0 AS (
  SELECT term, lower(regexp_replace(term, '[^a-zA-Z]', '', 'g')) AS u
  FROM {src}
),
{n}1 AS (
  SELECT term, u,
         translate(replace(replace(u, 'h', ''), 'w', ''),
                   'abcdefgijklmnopqrstuvxyz',
                   '012301202245501262301202') AS body
  FROM {n}0
),
{n}2 AS (
  SELECT term, u, i, substr(body, CAST(i AS INT), 1) AS c
  FROM {n}1, UNNEST(range(1, len(body) + 1)) r(i)
),
{n}3 AS (
  SELECT term, u, i, c,
         lag(c) OVER (PARTITION BY term ORDER BY i) AS p
  FROM {n}2
),
{n}4 AS (
  SELECT term, u, string_agg(c, '' ORDER BY i) AS d
  FROM {n}3 WHERE p IS NULL OR c <> p GROUP BY term, u
),
{n} AS (
  SELECT z.term,
         CASE WHEN z.u = '' THEN ''
              ELSE substr(z.u, 1, 1) || substr(
                replace(CASE WHEN substr(z.u, 1, 1) IN ('h', 'w')
                             THEN coalesce(g.d, '')
                             ELSE substr(coalesce(g.d, ''), 2) END,
                        '0', '') || '000', 1, 3)
         END AS sx
  FROM {n}0 z LEFT JOIN {n}4 g ON g.term = z.term
)"""


def ft_phonetic(sf_dir: str) -> pa.Table:
    """Phonetic term matching (analysis/phonetic/PhoneticFilter.java:33
    with commons-codec US Soundex semantics): for each misspelled probe,
    the dictionary terms sharing its Soundex code, with df — the
    name/typo-tolerant lookup the phonetic filters index for. Engine
    side encodes only the (Heaps-small) dictionary, vocab-level."""
    from ..phonetic import soundex

    r = reader_for(sf_dir)
    t = _content_only(r, termdict_terms(r))
    terms = t.column("term").to_pylist()
    dfs = t.column("df").to_pylist()
    by_code: dict[str, list[tuple[str, int]]] = {}
    for tm, df in zip(terms, dfs):
        by_code.setdefault(soundex(tm), []).append((tm, int(df)))
    probes, match, mdf = [], [], []
    for p in PHONETIC_PROBES:
        for tm, df in sorted(by_code.get(soundex(p), [])):
            probes.append(p)
            match.append(tm)
            mdf.append(df)
    return pa.table({"probe": pa.array(probes, pa.string()),
                     "term": pa.array(match, pa.string()),
                     "df": pa.array(mdf, pa.int64())})


def oracle_phonetic_sql() -> str:
    vals = ", ".join(f"('{p}')" for p in PHONETIC_PROBES)
    return f"""WITH {_CORPUS_CTE},
probes AS (SELECT * FROM (VALUES {vals}) v(term)),
{_soundex_ctes('probes', 'psx')},
{_soundex_ctes('df', 'dsx')}
SELECT p.term AS probe, d.term AS term, f.df
FROM psx p JOIN dsx d ON d.sx = p.sx
JOIN df f ON f.term = d.term"""


# ---------------------------------------------------------------------------
# MultiRangeQuery (OR of numeric ranges in one point-index pass)

MULTI_RANGES = [(1, [(5, 20), (15, 40), (80, 95)]),
                (2, [(0, 10), (60, 65), (64, 70)]),
                (3, [(100, 120), (30, 31)])]


def ft_multi_range(sf_dir: str) -> pa.Table:
    """MultiRangeQuery (sandbox/search/MultiRangeQuery.java:49; its
    rewrite at :172 sorts and coalesces overlapping ranges before one
    tree pass): docs whose field_len lies in ANY [lo, hi) range.
    Overlapping/adjacent ranges merge first, so each point-index file /
    row group is pruned and decoded at most once per disjunct — the
    IO-shape win the sandbox query exists for."""
    from ..points import ensure_numeric_index, numeric_range

    idx = index_dir_for(sf_dir)
    ensure_numeric_index(idx, "field_len")
    qids, docs = [], []
    for qid, ranges in MULTI_RANGES:
        merged: list[list[int]] = []
        for lo, hi in sorted(ranges):
            if merged and lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        parts = [numeric_range(idx, "field_len", lo, hi)[0]
                 for lo, hi in merged]
        d = np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, np.int64)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_multi_range_sql() -> str:
    rows = []
    for qid, ranges in MULTI_RANGES:
        # deliberately the UN-merged ranges: equality proves the
        # coalescing rewrite is semantics-preserving
        pred = " OR ".join(f"(len >= {lo} AND len < {hi})"
                           for lo, hi in ranges)
        rows.append(f"SELECT DISTINCT {qid} AS qid, d AS doc_id FROM dl "
                    f"WHERE {pred}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# ---------------------------------------------------------------------------
# SortedNumericDocValuesMultiRangeQuery (doc-major dv scan, inclusive)

# deliberately overlapping + out of order: resolveOverlaps must merge
DV_MULTI_RANGES = [(1, [(40, 60), (55, 80), (10, 20)]),
                   (2, [(0, 5), (5, 9), (200, 100000)]),
                   (3, [(33, 33), (77, 77), (30, 36)])]


def ft_dv_multi_range(sf_dir: str) -> ray.data.Dataset:
    """SortedNumericDocValuesMultiRangeQuery
    (sandbox/search/SortedNumericDocValuesMultiRangeQuery.java:48): a
    union of INCLUSIVE [lower, upper] ranges evaluated doc-major against
    the numeric docvalue — the execution dual of :func:`ft_multi_range`'s
    value-major point index, chosen when the query is a lead-restricted
    FILTER and a dv iteration is cheaper than a points tree walk.
    Overlapping clauses are merged up front (resolveOverlaps :91 edge
    sweep), the global [min, max] envelope is pushed into the parquet
    read (the DocValuesSkipper :218 segment-skip role → row-group
    pruning), and each batch tests membership with one searchsorted
    against the merged boundaries — map-only, no shuffle."""
    import pyarrow.dataset as pads
    import ray.data

    idx = index_dir_for(sf_dir)
    plans = []
    for qid, ranges in DV_MULTI_RANGES:
        merged: list[list[int]] = []
        for lo, hi in sorted(ranges):
            if merged and lo <= merged[-1][1] + 1:   # inclusive: adjacent merge
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
        plans.append((qid,
                      np.array([m[0] for m in merged], np.int64),
                      np.array([m[1] for m in merged], np.int64)))
    glo = int(min(p[1][0] for p in plans))
    ghi = int(max(p[2][-1] for p in plans))
    ds = ray.data.read_parquet(
        os.path.join(idx, "docmeta"), columns=["doc_id", "field_len"],
        filter=((pads.field("field_len") >= glo)
                & (pads.field("field_len") <= ghi)))

    def match(batch: pa.Table) -> pa.Table:
        v = batch.column("field_len").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d = [], []
        for qid, los, his in plans:
            i = np.searchsorted(los, v, side="right") - 1
            ok = (i >= 0) & (v <= his[np.maximum(i, 0)])
            out_q.append(np.full(int(ok.sum()), qid, np.int64))
            out_d.append(d[ok])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d))})

    return ds.map_batches(match, batch_format="pyarrow")


def oracle_dv_multi_range_sql() -> str:
    rows = []
    for qid, ranges in DV_MULTI_RANGES:
        # the UN-merged inclusive ranges: equality proves resolveOverlaps
        pred = " OR ".join(f"(len >= {lo} AND len <= {hi})"
                           for lo, hi in ranges)
        rows.append(f"SELECT DISTINCT {qid} AS qid, d AS doc_id FROM dl "
                    f"WHERE {pred}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# ---------------------------------------------------------------------------
# DocValuesStats (numeric docvalue statistics collector)

def ft_dv_stats(sf_dir: str) -> pa.Table:
    """Numeric docvalues statistics
    (misc/src/java/org/apache/lucene/misc/search/DocValuesStats.java:104,
    DocValuesStatsCollector.java:29) over field_len: count, missing,
    min, max, sum, mean, population variance. The reference accumulates
    mean/variance online (Welford); distributed here as exact integer
    moment partials (sum, sum of squares) per batch + one tiny combine —
    mean and variance become single divisions on exact integers, so the
    float result is engine-independent: mean = sum/n (one double div →
    REAL), var = (sumsq - sum²/n)/n in doubles from exact int64 moments
    (at 100-TB moment scale the partials widen to float128/hugeint —
    same shape, noted here)."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["field_len"])

    def moments(batch: pa.Table) -> pa.Table:
        v = batch.column("field_len").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "mn": pa.array([int(v.min()) if len(v) else 0], pa.int64()),
            "mx": pa.array([int(v.max()) if len(v) else 0], pa.int64()),
            "s": pa.array([int(v.sum())], pa.int64()),
            "sq": pa.array([int((v * v).sum())], pa.int64())})

    agg = (ds.map_batches(moments, batch_format="pyarrow")
           .aggregate(Sum("n"), Min("mn"), Max("mx"), Sum("s"),
                      Sum("sq")))
    n = int(agg["sum(n)"] or 0)
    s = int(agg["sum(s)"] or 0)
    sq = int(agg["sum(sq)"] or 0)
    mean = np.float32(s / n) if n else np.float32(0.0)
    var = np.float32((sq - s * s / n) / n) if n else np.float32(0.0)
    return pa.table({
        "count": pa.array([n], pa.int64()),
        "missing": pa.array([0], pa.int64()),
        "vmin": pa.array([int(agg["min(mn)"] or 0)], pa.int64()),
        "vmax": pa.array([int(agg["max(mx)"] or 0)], pa.int64()),
        "vsum": pa.array([s], pa.int64()),
        "mean": pa.array([mean], pa.float32()),
        "variance": pa.array([var], pa.float32())})


def oracle_dv_stats_sql() -> str:
    return f"""WITH {_CORPUS_CTE}
SELECT count(*) AS count,
       CAST(0 AS BIGINT) AS missing,
       min(len) AS vmin,
       max(len) AS vmax,
       CAST(sum(len) AS BIGINT) AS vsum,
       CAST(CAST(sum(len) AS DOUBLE) / count(*) AS REAL) AS mean,
       CAST((CAST(sum(len * len) AS DOUBLE)
             - CAST(sum(len) AS DOUBLE) * sum(len) / count(*))
            / count(*) AS REAL) AS variance
FROM dl"""


# ---------------------------------------------------------------------------
# FreeTextSuggester — n-gram "stupid backoff" LM suggester
# (suggest/analyzing/FreeTextSuggester.java:105)

_FT_ALPHA = 0.4  # FreeTextSuggester.java:126 ALPHA (Brants et al. 2007)

# (key, num); a trailing space is the reference's "lastTokenEnded"
# upgrade (FreeTextSuggester.java:505-521): the last full token becomes
# pure context and the unigram level is disabled.
FREETEXT_QUERIES: list[tuple[str, int]] = [
    ("hash j", 4),
    ("the ", 5),
    ("merge s", 4),
    ("key", 3),
    ("zzmissing q", 3),
]


def _freetext_parse(key: str) -> tuple[str | None, str, str | None]:
    """(bigram context word | None, bigram completion prefix, unigram
    prefix | None) — the lastTokens construction of
    FreeTextSuggester.lookup (FreeTextSuggester.java:478-521)."""
    ended = key.endswith(" ")
    toks = [t for t in key.split(" ") if t]
    if ended:
        return toks[-1], "", None
    if len(toks) >= 2:
        return toks[-2], toks[-1], toks[-1]
    return None, "", toks[-1]


def _context_bigram_counts(sf_dir: str, ctx_words: list[str]) -> pa.Table:
    """Bigram-model slice rooted at the query context words: per-batch
    vectorized bigram formation + partial counts with the first-word
    selection pushed BELOW the shuffle, then one small groupby — at
    100 TB only context-rooted (bigram, partial_count) rows move."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["text"])
    ctx = sorted(set(ctx_words))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..analysis import analyze_batch
        empty = pa.table({"bigram": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        toks, owners, _, _ = analyze_batch(batch.column("text").to_pylist())
        t = toks.combine_chunks() if hasattr(toks, "combine_chunks") \
            else toks
        if len(t) < 2:
            return empty
        left = t.slice(0, len(t) - 1)
        right = t.slice(1)
        keep = pc.and_(pc.is_in(left, value_set=pa.array(ctx, pa.string())),
                       pa.array(owners[:-1] == owners[1:]))
        pairs = pc.binary_join_element_wise(left, right, " ").filter(keep)
        if len(pairs) == 0:
            return empty
        vc = pairs.value_counts()
        return pa.table({"bigram": vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bigram").sum("cnt"))
    out = ensure_cols(agg.to_pandas(),  # bounded: few context roots
                      ["bigram", "sum(cnt)"])
    return pa.table({"bigram": pa.array(out["bigram"], pa.string()),
                     "cnt": pa.array(out["sum(cnt)"], pa.int64())})


def ft_suggest_freetext(sf_dir: str) -> pa.Table:
    """FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java:105):
    bigram stupid-backoff language model. The bigram model is the
    distributed shingle-count pipeline sliced to the query contexts; the
    unigram model is the index term dictionary (count = ttf, totTokens =
    sum_ttf). Per level: top-num completions by (count desc, token asc)
    with separator-free extension; a last token suggested by a
    higher-order model is skipped below it (the ``seen`` set,
    FreeTextSuggester.java:644-686); a missing OR attempted higher-order
    level multiplies backoff by ALPHA before the next level
    (FreeTextSuggester.java:569,702). Final order (score desc, key asc),
    score = backoff * count / contextCount — the reference's value before
    its Long.MAX_VALUE fixed-point scaling."""
    r = reader_for(sf_dir)
    tot = float(r.sum_ttf)
    parsed = {key: _freetext_parse(key) for key, _ in FREETEXT_QUERIES}
    ctx_words = sorted({p[0] for p in parsed.values() if p[0] is not None})
    bg: dict[tuple[str, str], int] = {}
    ctx_cnt: dict[str, int] = {}
    if ctx_words:
        t = _context_bigram_counts(sf_dir, ctx_words)
        for big, cnt in zip(t.column("bigram").to_pylist(),
                            t.column("cnt").to_pylist()):
            w1, w2 = big.split(" ")
            bg[(w1, w2)] = int(cnt)
        ut = _content_only(r, termdict_scan(r, terms=ctx_words))
        ctx_cnt = {tm: int(c) for tm, c in
                   zip(ut.column("term").to_pylist(),
                       ut.column("ttf").to_pylist())}
    out_q, out_rank, out_key, out_score = [], [], [], []
    for key, num in FREETEXT_QUERIES:
        ctx, pref, uni_pref = parsed[key]
        results: list[tuple[str, float]] = []
        seen: set[str] = set()
        backoff = 1.0
        if ctx is not None:
            cands = sorted(((w2, c) for (w1, w2), c in bg.items()
                            if w1 == ctx and w2.startswith(pref)),
                           key=lambda x: (-x[1], x[0]))[:num]
            for w2, c in cands:
                seen.add(w2)
                results.append((f"{ctx} {w2}",
                                backoff * float(c) / float(ctx_cnt[ctx])))
            backoff *= _FT_ALPHA
        if uni_pref is not None:
            ut = _content_only(r, termdict_scan(r, prefix=uni_pref))
            ucands = sorted(
                ((tm, int(c)) for tm, c in
                 zip(ut.column("term").to_pylist(),
                     ut.column("ttf").to_pylist()) if tm not in seen),
                key=lambda x: (-x[1], x[0]))[:num]
            for tm, c in ucands:
                results.append((tm, backoff * float(c) / tot))
        results.sort(key=lambda x: (-x[1], x[0]))
        for rank, (k_, s_) in enumerate(results[:num], 1):
            out_q.append(key)
            out_rank.append(rank)
            out_key.append(k_)
            out_score.append(s_)
    return pa.table({"q": pa.array(out_q, pa.string()),
                     "rank": pa.array(out_rank, pa.int64()),
                     "suggestion": pa.array(out_key, pa.string()),
                     "score": pa.array(out_score, pa.float64())})


def oracle_suggest_freetext_sql() -> str:
    parts = []
    for key, num in FREETEXT_QUERIES:
        ctx, pref, uni_pref = _freetext_parse(key)
        levels = []
        lvl2_sel = None
        if ctx is not None:
            lvl2_body = f"""SELECT w2,
             CAST(cnt AS DOUBLE)
               / (SELECT cnt FROM ug WHERE term = '{ctx}') AS score,
             row_number() OVER (ORDER BY cnt DESC, w2 ASC) AS rn
      FROM bg WHERE w1 = '{ctx}' AND w2 LIKE '{pref}%'"""
            levels.append(f"""    SELECT '{ctx} ' || w2 AS suggestion, score
    FROM ({lvl2_body}) WHERE rn <= {num}""")
            lvl2_sel = (f"SELECT w2 FROM ({lvl2_body}) WHERE rn <= {num}")
        if uni_pref is not None:
            # CAST: a bare 0.4 is DECIMAL in DuckDB, whose exact
            # product differs from the engine's double multiply by an
            # ulp for some counts (0.4*871 -> 348.4 exact vs
            # 348.40000000000003)
            num_expr = ("CAST(0.4 AS DOUBLE) * CAST(cnt AS DOUBLE)"
                        if ctx is not None else "CAST(cnt AS DOUBLE)")
            notin = f"\n        AND term NOT IN ({lvl2_sel})" if lvl2_sel \
                else ""
            levels.append(f"""    SELECT suggestion, score FROM (
      SELECT term AS suggestion,
             ({num_expr})
               / (SELECT CAST(sum_ttf AS DOUBLE) FROM stats) AS score,
             row_number() OVER (ORDER BY cnt DESC, term ASC) AS rn
      FROM ug WHERE term LIKE '{uni_pref}%'{notin}
    ) WHERE rn <= {num}""")
        un = "\n    UNION ALL\n".join(levels)
        parts.append(f"""SELECT q, rank, suggestion, score FROM (
  SELECT '{key}' AS q,
         row_number() OVER (ORDER BY score DESC, suggestion ASC) AS rank,
         suggestion, score
  FROM (
{un}
  )
) WHERE rank <= {num}""")
    un_all = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
),
bg AS (
  SELECT a.word AS w1, b.word AS w2, count(*) AS cnt
  FROM w a JOIN w b ON b.d = a.d AND b.pos = a.pos + 1
  GROUP BY w1, w2
),
ug AS (SELECT term, CAST(ttf AS BIGINT) AS cnt FROM df)
{un_all}"""


# ---------------------------------------------------------------------------
# Geo distance sort / nearest (LatLonDocValuesField.newDistanceSort,
# LatLonPoint.nearest)

# (qid, center_lat, center_lon, k)
GEO_NEAREST = [(1, 0, 0, 10),
               (2, 45_000_000, 90_000_000, 15),
               (3, -80_000_000, -170_000_000, 5)]


def ft_geo_sort(sf_dir: str) -> pa.Table:
    """Distance sort: k nearest docs per center by exact integer squared
    Euclidean (LatLonDocValuesField.newDistanceSort:158 semantics,
    executed with LatLonPoint.nearest's pruned point-index traversal,
    document/NearestNeighbor.java:40 — see lucene_ray.geo.geo_nearest),
    ordered (dist2 asc, doc_id asc)."""
    from ..geo import build_geo_index, geo_nearest

    idx = index_dir_for(sf_dir)
    build_geo_index(idx)
    out_q, out_r, out_d, out_s = [], [], [], []
    for qid, la, lo, k in GEO_NEAREST:
        docs, d2, _m = geo_nearest(idx, la, lo, k)
        out_q.extend([qid] * len(docs))
        out_r.extend(range(1, len(docs) + 1))
        out_d.extend(docs.tolist())
        out_s.extend(d2.tolist())
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "rank": pa.array(out_r, pa.int64()),
                     "doc_id": pa.array(out_d, pa.int64()),
                     "dist2": pa.array(out_s, pa.int64())})


def oracle_geo_sort_sql() -> str:
    parts = []
    for qid, la, lo, k in GEO_NEAREST:
        parts.append(f"""SELECT qid, rank, doc_id, dist2 FROM (
  SELECT {qid} AS qid, d AS doc_id, dist2,
         row_number() OVER (ORDER BY dist2 ASC, d ASC) AS rank
  FROM (SELECT d, (lat - {la}) * (lat - {la})
                 + (lon - {lo}) * (lon - {lo}) AS dist2 FROM geo)
) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},{_GEO_CTE}\n{un}"


# ---------------------------------------------------------------------------
# Dynamic range facets (facet/range/DynamicRangeUtil.java)

_DYN_TOPN = 6


def ft_facet_dynamic_range(sf_dir: str, topn: int = _DYN_TOPN) -> pa.Table:
    """Equi-weight dynamic ranges (facet/range/DynamicRangeUtil.java:204
    computeDynamicNumericRanges): items (value = token count, weight =
    n_chars, zero weights skipped:161) sorted by (value, weight), then a
    greedy scan emits a range each time the accumulated weight reaches
    totalWeight / min(topN, len); a final partial range captures the
    tail (:260). Output per range: (count, weight, min, max, centroid).

    Scale shape: the reference materializes every matching (value,
    weight) pair in RAM; here the corpus reduces to DISTINCT (value,
    weight) pairs with multiplicities via per-batch partial counts + one
    domain-bounded groupby (both are small-domain docvalues — the
    agg_quantity_quantiles assumption), and the greedy scan runs over
    that compressed stream with bulk arithmetic: identical boundaries,
    O(domain + topN) driver work. The comparison accuWeight >= target
    is done in float64 exactly as Java's long >= double promotion (and
    SQL's BIGINT >= DOUBLE)."""
    import math

    import ray.data

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ")
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        v = np.bincount(owners[nonempty],
                        minlength=batch.num_rows).astype(np.int64)
        w = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = w > 0
        v, w = v[keep], w[keep]
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        pairs = np.stack([v, w], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table({"v": pa.array(uniq[:, 0]),
                         "w": pa.array(uniq[:, 1]),
                         "m": pa.array(cnt.astype(np.int64))})

    agg = (ray.data.read_parquet(
               os.path.join(sf_dir, "documents.parquet"),
               columns=["text", "n_chars"])
           .map_batches(tag, batch_format="pyarrow")
           .groupby(["v", "w"]).sum("m").to_pandas())
    out_schema = {
        "range_id": pa.array([], pa.int64()),
        "count": pa.array([], pa.int64()),
        "weight": pa.array([], pa.int64()),
        "vmin": pa.array([], pa.int64()),
        "vmax": pa.array([], pa.int64()),
        "centroid": pa.array([], pa.float64())}
    if len(agg) == 0:
        return pa.table(out_schema)
    agg = agg.sort_values(["v", "w"]).reset_index(drop=True)
    vs = agg["v"].to_numpy(dtype=np.int64)
    ws = agg["w"].to_numpy(dtype=np.int64)
    ms = agg["sum(m)"].to_numpy(dtype=np.int64)
    n_items = int(ms.sum())
    totw = int((ws * ms).sum())
    target = float(totw) / min(topn, n_items)
    ranges = []
    accn = accw = accv = 0
    minv = lastv = None
    for v, w, m in zip(vs.tolist(), ws.tolist(), ms.tolist()):
        while m > 0:
            if accn == 0:
                minv = v
            lastv = v
            if float(accw + m * w) < target:
                accn += m
                accw += m * w
                accv += m * v
                break
            k = max(1, math.ceil((target - accw) / w))
            while k > 1 and float(accw + (k - 1) * w) >= target:
                k -= 1
            while float(accw + k * w) < target:
                k += 1
            accn += k
            accw += k * w
            accv += k * v
            ranges.append((accn, accw, minv, v, float(accv) / accn))
            accn = accw = accv = 0
            m -= k
    if accn > 0:
        ranges.append((accn, accw, minv, lastv, float(accv) / accn))
    return pa.table({
        "range_id": pa.array(range(1, len(ranges) + 1), pa.int64()),
        "count": pa.array([r[0] for r in ranges], pa.int64()),
        "weight": pa.array([r[1] for r in ranges], pa.int64()),
        "vmin": pa.array([r[2] for r in ranges], pa.int64()),
        "vmax": pa.array([r[3] for r in ranges], pa.int64()),
        "centroid": pa.array([r[4] for r in ranges], pa.float64())})


def oracle_facet_dynamic_range_sql(topn: int = _DYN_TOPN) -> str:
    # unrolled boundary chain (the kmeans Lloyd-chain oracle pattern):
    # b0 = 0; b_{k+1} = first rn whose weight since b_k reaches target
    chain = []
    prev = None
    for k in range(1, topn + 1):
        if prev is None:
            cond = "CAST(cumw AS DOUBLE) >= (SELECT t FROM params)"
            extra = ""
        else:
            cond = (f"CAST(cumw - (SELECT cumw FROM items WHERE rn = "
                    f"(SELECT rn FROM {prev})) AS DOUBLE) "
                    f">= (SELECT t FROM params)")
            extra = f"rn > (SELECT rn FROM {prev}) AND "
        chain.append(f"b{k} AS (SELECT min(rn) AS rn FROM items "
                     f"WHERE {extra}{cond})")
        prev = f"b{k}"
    blist = "\n  UNION ALL ".join(
        ["SELECT 0 AS k, CAST(0 AS BIGINT) AS rn"]
        + [f"SELECT {k}, (SELECT rn FROM b{k}) FROM (VALUES (1))"
           for k in range(1, topn + 1)])
    chain_sql = ",\n".join(chain)
    return f"""WITH src AS (
  SELECT len(list_filter(string_split(text, ' '), x -> x != '')) AS v,
         n_chars AS w
  FROM documents WHERE n_chars > 0
),
items AS (
  SELECT v, w, row_number() OVER (ORDER BY v, w) AS rn,
         SUM(w) OVER (ORDER BY v, w ROWS UNBOUNDED PRECEDING) AS cumw
  FROM src
),
params AS (
  SELECT CAST(SUM(w) AS DOUBLE) / LEAST({topn}, COUNT(*)) AS t,
         COUNT(*) AS len FROM src
),
{chain_sql},
blist AS (
  {blist}
),
rngs AS (
  SELECT k, rn AS lo, lead(rn) OVER (ORDER BY k) AS hi
  FROM blist WHERE rn IS NOT NULL
),
bounded AS (
  SELECT lo, COALESCE(hi, (SELECT len FROM params)) AS hi FROM rngs
  WHERE COALESCE(hi, (SELECT len FROM params)) > lo
)
SELECT row_number() OVER (ORDER BY lo) AS range_id,
       count(*) AS count,
       CAST(SUM(i.w) AS BIGINT) AS weight,
       min(i.v) AS vmin, max(i.v) AS vmax,
       CAST(SUM(i.v) AS DOUBLE) / count(*) AS centroid
FROM bounded b JOIN items i ON i.rn > b.lo AND i.rn <= b.hi
GROUP BY b.lo"""


# ---------------------------------------------------------------------------
# UnifiedHighlighter passage scoring (top passage per hit)

HL_PASSAGE_QUERIES = [(1, ["key", "agg"], 10),
                      (2, ["slow", "fast", "window"], 10),
                      (3, ["vector", "merge"], 10)]
_HP_W = 20                 # passage = fixed 20-token window (BreakIterator role)
_HP_K1, _HP_B, _HP_PIVOT = 1.2, 0.75, 87.0


def ft_highlight_passages(sf_dir: str) -> pa.Table:
    """UnifiedHighlighter passage SCORING
    (uhighlight/PassageScorer.java:26 — score = norm(start) * Σ_terms
    tf(freqInPassage, passageLen) * weight(contentLength, freqInDoc),
    defaults k1=1.2 b=0.75 pivot=87): BM25 top-k docs per query, then
    the best-scoring passage per hit. Passages are fixed 20-token
    windows (the corpus has no sentence bounds, so the BreakIterator
    boundary source is a fixed tokenizer window); char offsets/lengths
    come from the stored tok_starts/tok_ends payload, never a re-parse.
    Float op order is pinned to the Java: tf and the length norm in
    float32 (:94-96), weight = (k1+1) * (float)ln(...) with the
    numDocs float and double interior (:80-85), per-term contributions
    multiplied in float32 and summed in double (:132-136), one final
    double*norm multiply cast to float (:114,137).
    → (qid, doc_id, p_start, score)."""
    import math

    import pyarrow.parquet as pq_

    from ..search import _term_positions

    f32 = np.float32
    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    qids, docs, pstarts, scores = [], [], [], []
    for qid, terms, k in HL_PASSAGE_QUERIES:
        td = search_blockmax(r, " ".join(terms), k)
        hits = [int(d) for d in td.doc_ids]
        if not hits:
            continue
        pos_of = {t: (_term_positions(r, t) or {}) for t in set(terms)}
        dm = pq_.read_table(os.path.join(idx, "docmeta"),
                            columns=["doc_id", "tok_starts", "tok_ends"],
                            filters=[("doc_id", "in", hits)])
        st_of = dict(zip(dm.column("doc_id").to_pylist(),
                         dm.column("tok_starts").to_pylist()))
        en_of = dict(zip(dm.column("doc_id").to_pylist(),
                         dm.column("tok_ends").to_pylist()))
        for d in hits:
            starts = np.asarray(st_of[d], np.int64)
            ends = np.asarray(en_of[d], np.int64)
            n = len(starts)
            if n == 0:
                continue
            clen = int(ends[-1])
            nwin = (n + _HP_W - 1) // _HP_W
            wfirst = np.arange(nwin) * _HP_W
            wlast = np.minimum(wfirst + _HP_W - 1, n - 1)
            pstart = starts[wfirst]
            plen = ends[wlast] - pstart
            acc = np.zeros(nwin, np.float64)
            seen = np.zeros(nwin, bool)
            num_docs = f32(1.0) + f32(clen) / f32(_HP_PIVOT)
            for t in sorted(set(terms)):
                p = np.asarray(pos_of[t].get(d, ()), np.int64)
                if not len(p):
                    continue
                fd = len(p)          # totalTermFreq within the doc
                wt = f32(_HP_K1 + 1) * f32(math.log(
                    1 + (float(num_docs) + 0.5) / (fd + 0.5)))
                fp = np.bincount(p // _HP_W, minlength=nwin)
                wsel = np.flatnonzero(fp)
                ln_norm = (f32(_HP_K1)
                           * (f32(1 - _HP_B)
                              + f32(_HP_B) * (plen[wsel].astype(np.float32)
                                              / f32(_HP_PIVOT))))
                tfv = (fp[wsel].astype(np.float32)
                       / (fp[wsel].astype(np.float32) + ln_norm))
                acc[wsel] += (tfv * wt).astype(np.float64)
                seen[wsel] = True
            wsel = np.flatnonzero(seen)
            pn = np.array(
                [f32(1.0) + f32(1.0)
                 / f32(math.log(float(f32(_HP_PIVOT) + f32(pstart[i]))))
                 for i in wsel], np.float64)
            sc = (acc[wsel] * pn).astype(np.float32)
            best = np.lexsort((pstart[wsel], -sc.astype(np.float64)))[0]
            qids.append(qid)
            docs.append(d)
            pstarts.append(int(pstart[wsel][best]))
            scores.append(float(sc[best]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "p_start": pa.array(pstarts, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_highlight_passages_sql() -> str:
    rows = []
    for qid, terms, k in HL_PASSAGE_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', {k})")
    vals = ",\n    ".join(rows)
    tf_expr = """(CAST(m.fp AS REAL) / (CAST(m.fp AS REAL) +
      CAST(1.2 AS REAL) * (CAST(0.25 AS REAL) +
        CAST(0.75 AS REAL) * (CAST(g.pend - g.pstart AS REAL) / CAST(87.0 AS REAL)))))"""
    wt_expr = """(CAST(2.2 AS REAL) * CAST(ln(
      1 + (CAST(CAST(1 AS REAL) + CAST(cl.clen AS REAL) / CAST(87.0 AS REAL) AS DOUBLE)
           + 0.5) / (m.fd + 0.5)) AS REAL))"""
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
{_bm25_chain_cte(vals)},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
),
woff AS (
  SELECT d, word, pos,
         sum(len(word) + 1) OVER (PARTITION BY d ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - len(word) - 1 AS s
  FROM w
),
pgeo AS (
  SELECT d, CAST(floor((pos - 1) / {_HP_W}) AS INT) AS win,
         min(s) AS pstart, max(s + len(word)) AS pend
  FROM woff GROUP BY d, win
),
clens AS (
  SELECT d, max(s + len(word)) AS clen FROM woff GROUP BY d
),
pmatch AS (
  SELECT c.qid, r.d, CAST(floor((o.pos - 1) / {_HP_W}) AS INT) AS win,
         c.term, count(*) AS fp, min(t.tf) AS fd
  FROM (SELECT DISTINCT qid, term FROM clauses) c
  JOIN ranked r ON r.qid = c.qid AND r.rank <= r.k
  JOIN woff o ON o.d = r.d AND o.word = c.term
  JOIN tf t ON t.d = r.d AND t.term = c.term
  GROUP BY c.qid, r.d, win, c.term
),
pscored AS (
  SELECT m.qid, m.d, m.win, min(g.pstart) AS pstart,
         CAST(sum(CAST(CAST({tf_expr} * {wt_expr} AS REAL) AS DOUBLE))
              AS DOUBLE) AS sraw
  FROM pmatch m
  JOIN pgeo g ON g.d = m.d AND g.win = m.win
  JOIN clens cl ON cl.d = m.d
  GROUP BY m.qid, m.d, m.win
),
pfinal AS (
  SELECT qid, d, pstart,
         CAST(sraw * (CAST(1 AS REAL) + CAST(1 AS REAL) /
           CAST(ln(CAST(CAST(87.0 AS REAL) + CAST(pstart AS REAL) AS DOUBLE))
                AS REAL)) AS REAL) AS score,
         row_number() OVER (PARTITION BY qid, d
                            ORDER BY CAST(sraw * (CAST(1 AS REAL) +
                              CAST(1 AS REAL) / CAST(ln(CAST(CAST(87.0 AS REAL)
                              + CAST(pstart AS REAL) AS DOUBLE)) AS REAL))
                              AS REAL) DESC, pstart ASC) AS rn
  FROM pscored
)
SELECT CAST(qid AS BIGINT) AS qid, d AS doc_id,
       CAST(pstart AS BIGINT) AS p_start, score
FROM pfinal WHERE rn = 1"""


# ---------------------------------------------------------------------------
# IndexSortSortedNumericDocValuesRangeQuery (binary search on a sorted index)

SORTED_RANGE_QUERIES = [(1, 150, 260), (2, 0, 120), (3, 400, 1 << 30)]


def ft_sorted_range(sf_dir: str) -> pa.Table:
    """IndexSortSortedNumericDocValuesRangeQuery
    (search/IndexSortSortedNumericDocValuesRangeQuery.java:63): when the
    index sort matches the queried field, a numeric range is answered by
    BINARY SEARCH for the range endpoints instead of a tree walk or a
    full dv scan (:248 BoundedDocIdSetIterator over the located
    [firstDoc, lastDoc) window). Here every docmeta bucket of the
    index-sorted index is stored monotone on sort_key, so the endpoint
    search is two probes over parquet ROW-GROUP STATISTICS (only the
    contiguous overlapping groups are decoded) + one searchsorted inside
    them; per-bucket rows_read is returned by the helper and asserted
    ≪ bucket size in pytest. → (qid, doc_id)."""
    t, _ = sorted_range_scan(sorted_index_dir_for(sf_dir),
                             SORTED_RANGE_QUERIES)
    return t


def sorted_range_scan(index_dir: str, queries) -> tuple[pa.Table, int]:
    import pyarrow.parquet as pq_
    import ray.data

    dm_dir = os.path.join(index_dir, "docmeta")
    buckets = sorted(f for f in os.listdir(dm_dir)
                     if f.endswith(".parquet"))

    def scan(batch: pa.Table) -> pa.Table:
        out_q, out_d = [], []
        for fname in batch.column("file").to_pylist():
            pf = pq_.ParquetFile(os.path.join(dm_dir, fname))
            md = pf.metadata
            col = next(i for i in range(md.num_columns)
                       if md.row_group(0).column(i).path_in_schema
                       == "sort_key")
            stats = [(md.row_group(g).column(col).statistics.min,
                      md.row_group(g).column(col).statistics.max)
                     for g in range(md.num_row_groups)]
            rows_read = 0
            for qid, lo, hi in queries:
                # sort_key is monotone DESC across the bucket: the
                # overlapping row groups are contiguous
                gsel = [g for g, (mn, mx) in enumerate(stats)
                        if mx >= lo and mn <= hi]
                keys_parts, path_parts = [], []
                for g in gsel:
                    rb = pf.read_row_group(g, columns=["path",
                                                       "sort_key"])
                    rows_read += rb.num_rows
                    keys_parts.append(rb.column("sort_key").to_numpy())
                    path_parts.extend(rb.column("path").to_pylist())
                if not keys_parts:
                    continue
                keys = np.concatenate(keys_parts)
                orig = np.array([int(p[4:12]) for p in path_parts],
                                np.int64)
                asc = keys[::-1]                  # monotone asc view
                a = np.searchsorted(asc, lo, side="left")
                b = np.searchsorted(asc, hi, side="right")
                sel = orig[::-1][a:b]
                out_q.extend([qid] * len(sel))
                out_d.extend(sel.tolist())
            # one accounting row per bucket (qid == -1), so decoded
            # row groups that yield no hits still count
            out_q.append(-1)
            out_d.append(rows_read)
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64())})

    parts = (ray.data.from_items([{"file": f} for f in buckets])
             .map_batches(scan, batch_format="pyarrow", batch_size=1)
             .take_all())
    if not parts:
        return pa.table({"qid": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())}), 0
    qids = np.array([r["qid"] for r in parts], np.int64)
    docs = np.array([r["doc_id"] for r in parts], np.int64)
    acct = qids == -1
    rows_read = int(docs[acct].sum())
    qids, docs = qids[~acct], docs[~acct]
    order = np.lexsort((docs, qids))
    return pa.table({"qid": pa.array(qids[order]),
                     "doc_id": pa.array(docs[order])}), rows_read


def oracle_sorted_range_sql() -> str:
    rows = []
    for qid, lo, hi in SORTED_RANGE_QUERIES:
        rows.append(f"SELECT {qid} AS qid, doc_id FROM documents "
                    f"WHERE n_chars >= {lo} AND n_chars <= {hi}")
    return "\nUNION ALL\n".join(rows)


# ---------------------------------------------------------------------------
# LMDirichletSimilarity ranking (pluggable-Similarity surface, LM family)

LMD_QUERIES = [(1, ["key", "agg"]), (2, ["slow", "fast", "window"]),
               (3, ["the", "vector"]), (4, ["customer"])]
_LMD_K = 10


def _lm_ranked(sf_dir: str, queries, scorer_fn) -> pa.Table:
    """Shared SimilarityBase-family ranking: per-term scores from
    ``scorer_fn(postings, tf, norm_bytes, reader)``, clause sums in
    float64 in (doc, clause) order, one float32 round, (score desc,
    doc asc) top-k. Zero-scoring matches still rank (the reference
    counts them as hits)."""
    from ..codec import decode_blocks

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms in queries:
        dl, sl, cl = [], [], []
        for ci, t in enumerate(terms):
            p = r.postings(t)
            if p is None:
                continue
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            s = scorer_fn(p, tf, nm, r)
            lm = r.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            dl.append(d)
            sl.append(s)
            cl.append(np.full(len(d), ci, np.int32))
        if not dl:
            continue
        alld = np.concatenate(dl)
        allc = np.concatenate(cl)
        alls = np.concatenate(sl)
        order = np.lexsort((allc, alld))
        uniq, inv = np.unique(alld[order], return_inverse=True)
        tot = np.zeros(len(uniq), np.float64)
        np.add.at(tot, inv, alls[order].astype(np.float64))
        tot32 = tot.astype(np.float32)
        top = np.lexsort((uniq, -tot32.astype(np.float64)))[:_LMD_K]
        for rank, i in enumerate(top, 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uniq[i]))
            scores.append(float(tot32[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def ft_lmdirichlet(sf_dir: str) -> pa.Table:
    """Top-k under LMDirichletSimilarity
    (similarities/LMDirichletSimilarity.java:76-81, mu=2000; collection
    probability (ttf+1)/(sumTTF+1), LMSimilarity.java:151; docLen
    decoded from the SAME stored norm bytes, SimilarityBase.java:184):
    per-term double-interior scores clamped at 0 and cast to float32
    once."""
    from ..lmdirichlet import score_terms_lm

    return _lm_ranked(
        sf_dir, LMD_QUERIES,
        lambda p, tf, nm, r: score_terms_lm(tf, nm, p.ttf, r.sum_ttf))


def ft_lmjelinek(sf_dir: str) -> pa.Table:
    """Top-k under LMJelinekMercerSimilarity
    (similarities/LMJelinekMercerSimilarity.java:68-74, λ=0.1):
    linear collection-model interpolation over the same LM stats."""
    from ..lmdirichlet import score_terms_lmjm

    return _lm_ranked(
        sf_dir, LMD_QUERIES,
        lambda p, tf, nm, r: score_terms_lmjm(tf, nm, p.ttf, r.sum_ttf))


def oracle_lmdirichlet_sql() -> str:
    rows = []
    for qid, terms in LMD_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    raw = ("ln(1 + CAST(CAST(t.tf AS REAL) AS DOUBLE) / "
           "(2000.0 * ((f.ttf + 1.0) / "
           "(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) + 1.0)))) "
           "+ ln(2000.0 / (CAST(q.qlen AS DOUBLE) + 2000.0))")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d,
         CAST(CASE WHEN ({raw}) > 0.0 THEN ({raw}) ELSE 0.0 END
              AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


def oracle_lmjelinek_sql() -> str:
    rows = []
    for qid, terms in LMD_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    raw = ("ln(1 + ((CAST(CAST(0.9 AS REAL) AS DOUBLE) * "
           "CAST(CAST(t.tf AS REAL) AS DOUBLE) / CAST(q.qlen AS DOUBLE)) "
           "/ (CAST(CAST(0.1 AS REAL) AS DOUBLE) * ((f.ttf + 1.0) / "
           "(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) + 1.0)))))")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d, CAST({raw} AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


# ---------------------------------------------------------------------------
# TermAutomatonQuery (token-graph accept queries, with ANY transitions)

# (qid, transitions [(from, term|*, to)], accept states)
TA_QUERIES = [
    (1, [(0, "fast", 1), (1, "key", 2), (1, "order", 2), (2, "sort", 3)],
     (3,)),
    (2, [(0, "key", 1), (1, "*", 2), (2, "sort", 3)], (3,)),
    (3, [(0, "slow", 1), (1, "fast", 2), (1, "*", 3), (3, "fast", 2)],
     (2,)),
    (4, [(0, "window", 1), (1, "batch", 2)], (1, 2)),
]


def _ta_paths(transitions, accepts, max_len: int = 8):
    """Enumerate the (finite, acyclic) accepted term sequences — the
    oracle's language view of the automaton."""
    adj: dict[int, list] = {}
    for a, t, b in transitions:
        adj.setdefault(a, []).append((t, b))
    out: list[list[str]] = []

    def walk(s, path):
        if s in accepts and path:
            out.append(list(path))
        if len(path) >= max_len:
            return
        for t, b in adj.get(s, ()):
            path.append(t)
            walk(b, path)
            path.pop()

    walk(0, [])
    return out


def ft_term_automaton(sf_dir: str) -> pa.Table:
    """TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java:71,
    TermAutomatonScorer.java:37): docs whose token stream contains a
    path the automaton accepts — branches, ANY-token wildcards, and
    multiple accept states (variable-length matches). freq = distinct
    accepted end positions, deduped across paths like the reference's
    per-doc match counting. The oracle enumerates the automaton's
    finite language and re-derives the same end-position set with
    positional joins, so equality pins the DP against the language
    semantics. → (qid, doc_id, freq)."""
    from ..search import term_automaton_matches

    r = reader_for(sf_dir)
    qids, docs, freqs = [], [], []
    for qid, transitions, accepts in TA_QUERIES:
        m = term_automaton_matches(r, transitions, set(accepts))
        for d in sorted(m):
            qids.append(qid)
            docs.append(d)
            freqs.append(m[d])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_term_automaton_sql() -> str:
    qparts = []
    for qid, transitions, accepts in TA_QUERIES:
        paths = _ta_paths(transitions, set(accepts))
        pparts = []
        for path in paths:
            joins = ["FROM w w0"]
            conds = []
            for i, t in enumerate(path):
                if i:
                    joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                                 f"AND w{i}.pos = w0.pos + {i}")
                if t != "*":
                    conds.append(f"w{i}.word = '{t}'")
            if not conds:
                conds.append("TRUE")
            pparts.append(
                f"SELECT w0.d, w0.pos - 1 + {len(path)} AS e\n"
                + "\n".join(joins) + "\nWHERE " + " AND ".join(conds))
        un = "\nUNION ALL\n".join(pparts)
        qparts.append(f"""SELECT {qid} AS qid, d AS doc_id,
       count(DISTINCT e) AS freq
FROM (
{un}
) GROUP BY d""")
    allq = "\nUNION ALL\n".join(qparts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{allq}"""


# ---------------------------------------------------------------------------
# Query profiler (per-query execution counters)

PROFILE_QUERIES = [(1, "key agg", 10), (2, "the fast slow table", 10),
                   (3, "vector window merge", 5), (4, "zzmissing", 10)]


def ft_profile(sf_dir: str) -> pa.Table:
    """Query profiler role (sandbox/search/ProfilerCollector.java:33,
    QueryProfilerBreakdown.java — the reference reports per-node timing
    plus counters; timings are nondeterministic, so this surface emits
    the DETERMINISTIC execution counters of the block-max searcher):
    clause count, candidate docs touched, impact blocks total vs
    actually decoded (the skipping evidence), and hits returned.
    Rows-only entry (engine-internal numbers have no SQL form); the
    counter invariants are pytest-pinned. → (qid, metric, value)."""
    from ..search import parse_query

    r = reader_for(sf_dir)
    qids, metrics, values = [], [], []
    for qid, qs, k in PROFILE_QUERIES:
        td = search_blockmax(r, qs, k)
        for m, v in (("n_clauses", len(parse_query(qs))),
                     ("candidates", td.total_candidates),
                     ("blocks_total", td.blocks_total),
                     ("blocks_decoded", td.blocks_decoded),
                     ("hits", len(td.doc_ids))):
            qids.append(qid)
            metrics.append(m)
            values.append(int(v))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "metric": pa.array(metrics, pa.string()),
                     "value": pa.array(values, pa.int64())})


def ft_dfr_inl2(sf_dir: str) -> pa.Table:
    """Top-k under DFR InL2 (similarities/DFRSimilarity.java:127 with
    BasicModelIn/AfterEffectL/NormalizationH2) — the divergence-from-
    randomness branch of the pluggable-Similarity surface, over the same
    stored norm bytes and collection stats."""
    from ..lmdirichlet import score_terms_dfr_inl2

    return _lm_ranked(
        sf_dir, LMD_QUERIES,
        lambda p, tf, nm, r: score_terms_dfr_inl2(
            tf, nm, p.df, r.doc_count, r.sum_ttf))


def oracle_dfr_inl2_sql() -> str:
    rows = []
    for qid, terms in LMD_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    raw = ("(ln(((SELECT n_docs FROM stats) + 1) / (f.df + 0.5)) / ln(2.0))"
           " * (1 - 1 / (1 + CAST(CAST(t.tf AS REAL) AS DOUBLE)"
           " * (ln(1 + 1.0 * (CAST((SELECT sum_ttf FROM stats) AS DOUBLE)"
           " / (SELECT n_docs FROM stats)) / CAST(q.qlen AS DOUBLE))"
           " / ln(2.0))))")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d, CAST({raw} AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


def ft_dfi_chisq(sf_dir: str) -> pa.Table:
    """Top-k under DFISimilarity with IndependenceChiSquared
    (similarities/DFISimilarity.java:70-81, IndependenceChiSquared
    .java:34) — the SIXTH pluggable-similarity family: expected tf under
    independence = (ttf+1)·docLen/(sumTTF+1); freq <= expected scores 0
    but the doc still ranks; else log2((f−e)²/e + 1)."""
    from ..lmdirichlet import score_terms_dfi

    return _lm_ranked(
        sf_dir, LMD_QUERIES,
        lambda p, tf, nm, r: score_terms_dfi(tf, nm, p.ttf, r.sum_ttf))


def oracle_dfi_chisq_sql() -> str:
    rows = []
    for qid, terms in LMD_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    freq = "CAST(CAST(t.tf AS REAL) AS DOUBLE)"
    expected = ("((CAST(f.ttf AS DOUBLE) + 1) * CAST(q.qlen AS DOUBLE)"
                " / (CAST((SELECT sum_ttf FROM stats) AS DOUBLE) + 1))")
    raw = (f"CASE WHEN {freq} <= {expected} THEN 0.0 ELSE "
           f"ln(({freq} - {expected}) * ({freq} - {expected})"
           f" / {expected} + 1) / ln(2.0) END")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d, CAST({raw} AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


# ---------------------------------------------------------------------------
# XML query parser (queryparser/xml/CoreParser.java:60) — lucene_ray.xmlqp

XML_QUERIES = [
    (1, """<BooleanQuery>
  <Clause occurs="should"><TermQuery>query</TermQuery></Clause>
  <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
  <Clause occurs="filter"><TermQuery>table</TermQuery></Clause>
  <Clause occurs="mustnot"><TermQuery>window</TermQuery></Clause>
</BooleanQuery>"""),
    (2, """<DisjunctionMaxQuery>
  <TermQuery>spark</TermQuery>
  <TermQuery>index</TermQuery>
</DisjunctionMaxQuery>"""),
    (3, """<ConstantScoreQuery boost="1.5">
  <UserQuery>+customer +data</UserQuery>
</ConstantScoreQuery>"""),
    (4, """<BooleanQuery>
  <Clause occurs="must"><MatchAllDocsQuery/></Clause>
  <Clause occurs="filter"><TermQuery>vector</TermQuery></Clause>
</BooleanQuery>"""),
]
_XML_K = 10


def ft_xml_query(sf_dir: str) -> pa.Table:
    """CoreParser surface (queryparser/xml/CoreParser.java:60): XML
    query documents — Boolean with filter/mustnot occurs, dismax,
    constant-score over a UserQuery subtree, MatchAll + filter — parsed
    into the classic AST and ranked by the one Boolean evaluator."""
    from ..search import search_xml

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, xml in XML_QUERIES:
        td = search_xml(r, xml, _XML_K)
        for rank, (d, s) in enumerate(
                zip(td.doc_ids.tolist(), td.scores.tolist()), 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(s)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_xml_query_sql() -> str:
    ex = "EXISTS (SELECT 1 FROM tf x WHERE x.d = {src}.d AND x.term = '{t}')"
    # the FILTER occur defines the match universe: a doc matching only
    # the filter term is a HIT at score 0 (BooleanQuery with a required
    # unscored clause), so the oracle LEFT JOINs totals from the filter
    # set instead of selecting from totals
    q1 = f"""SELECT qid, rank, doc_id, score FROM (
  SELECT 1 AS qid, row_number() OVER (ORDER BY score DESC, d ASC) AS rank,
         d AS doc_id, score
  FROM (
    SELECT b.d, COALESCE(tl.score, CAST(0.0 AS REAL)) AS score
    FROM (SELECT d FROM corpus b
          WHERE {ex.format(src='b', t='table')}
            AND NOT {ex.format(src='b', t='window')}) b
    LEFT JOIN totals tl ON tl.qid = 1 AND tl.d = b.d
  )
) WHERE rank <= {_XML_K}"""
    # tieBreaker=0: score = float max of the clause scores
    q2 = f"""SELECT qid, rank, doc_id, score FROM (
  SELECT 2 AS qid, row_number() OVER (ORDER BY score DESC, d ASC) AS rank,
         d AS doc_id, score
  FROM (SELECT d, CAST(max(s) AS REAL) AS score
        FROM scored WHERE qid = 2 GROUP BY d)
) WHERE rank <= {_XML_K}"""
    q3 = f"""SELECT qid, rank, doc_id, score FROM (
  SELECT 3 AS qid, row_number() OVER (ORDER BY d ASC) AS rank,
         d AS doc_id, CAST(1.5 AS REAL) AS score
  FROM (SELECT d FROM corpus c
        WHERE {ex.format(src='c', t='customer')}
          AND {ex.format(src='c', t='data')})
) WHERE rank <= {_XML_K}"""
    q4 = f"""SELECT qid, rank, doc_id, score FROM (
  SELECT 4 AS qid, row_number() OVER (ORDER BY d ASC) AS rank,
         d AS doc_id, CAST(1.0 AS REAL) AS score
  FROM (SELECT d FROM corpus c WHERE {ex.format(src='c', t='vector')})
) WHERE rank <= {_XML_K}"""
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, term) AS (VALUES
    (1, 'query'), (1, 'merge'), (2, 'spark'), (2, 'index')
),
scored AS (
  SELECT c.qid, t.d, {_SCORE_EXPR} AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
)
{q1}
UNION ALL
{q2}
UNION ALL
{q3}
UNION ALL
{q4}"""


# ---------------------------------------------------------------------------
# Context-filtered infix suggestions + expression range filter

# (prefix, context lang, k)
CTX_SUGGEST_QUERIES = [("va", "en", 5), ("sc", "de", 5), ("jo", "fr", 5)]


def ft_suggest_context(sf_dir: str) -> pa.Table:
    """AnalyzingInfixSuggester CONTEXTS
    (suggest/analyzing/AnalyzingInfixSuggester.java:487 ``lookup(key,
    contexts, ...)``, BlendedInfixSuggester role): each suggestion
    carries a context set (here the doc's lang keyword); a lookup
    filters the infix matches to suggestions whose contexts intersect
    the query's. Context filtering is the existing keyword-field
    postings lookup intersected with the infix doc set — the same
    Boolean the reference builds internally."""
    from ..search import _term_docset

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    wt = _dense_field_len(idx)
    out = []
    for p, lang, k in CTX_SUGGEST_QUERIES:
        terms = _content_only(r, termdict_scan(r, prefix=p)) \
            .column("term").to_pylist()
        docs = (np.unique(np.concatenate(
            [_term_docset(r, t) for t in terms]))
            if terms else np.empty(0, np.int64))
        ctx = _term_docset(r, f"lang:{lang}")
        docs = np.intersect1d(docs, ctx, assume_unique=True)
        sel = np.lexsort((docs, -wt[docs]))[:k]
        d = docs[sel]
        out.append(pa.table({
            "prefix": pa.array([p] * len(d), pa.string()),
            "lang": pa.array([lang] * len(d), pa.string()),
            "rank": pa.array(np.arange(1, len(d) + 1, dtype=np.int64)),
            "doc_id": pa.array(d, pa.int64()),
            "weight": pa.array(wt[d], pa.int64()),
        }))
    return pa.concat_tables(out)


def oracle_suggest_context_sql() -> str:
    rows = []
    for p, lang, k in CTX_SUGGEST_QUERIES:
        rows.append(f"""SELECT prefix, lang, rank, doc_id, weight FROM (
  SELECT '{p}' AS prefix, '{lang}' AS lang,
         row_number() OVER (ORDER BY weight DESC, doc_id ASC) AS rank,
         doc_id, weight
  FROM (
    SELECT t.d AS doc_id, dl.len AS weight
    FROM (SELECT DISTINCT d FROM tok WHERE term LIKE '{p}%') t
    JOIN dl ON dl.d = t.d
    JOIN clang ON clang.d = t.d AND clang.lang = '{lang}')
  ) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
clang AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         lang
  FROM documents
)
{un}"""


# (qid, expression over len, lo, hi) — inclusive float32 bounds
EXPR_RANGE_QUERIES = [
    (1, "sqrt(len) + len / 10", 12.0, 20.0),
    (2, "log(1 + len) * 2", 0.0, 9.0),
    (3, "abs(len - 60)", 0.0, 15.0),
]


def ft_expr_range(sf_dir: str) -> ray.data.Dataset:
    """FunctionRangeQuery (queries/function/FunctionRangeQuery.java:38):
    docs whose computed ValueSource value lies in [lo, hi] — the filter
    dual of FunctionScoreQuery. The expression (compiled AST shared with
    ``ft_expr_score``; SQL generated from the SAME AST) is evaluated
    over the field_len docvalue in a DISTRIBUTED map over docmeta
    (the dv-iterator scan shape), inclusive float32 bounds.
    → (qid, doc_id, value)."""
    import ray.data

    from ..expressions import compile_expr

    idx = index_dir_for(sf_dir)
    plans = [(qid, compile_expr(src), np.float32(lo), np.float32(hi))
             for qid, src, lo, hi in EXPR_RANGE_QUERIES]

    def scan(batch: pa.Table) -> pa.Table:
        lens = batch.column("field_len").to_numpy(zero_copy_only=False) \
            .astype(np.float32)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_v = [], [], []
        for qid, ex, lo, hi in plans:
            v = ex.eval({"len": lens})
            ok = (v >= lo) & (v <= hi)
            out_q.append(np.full(int(ok.sum()), qid, np.int64))
            out_d.append(d[ok])
            out_v.append(v[ok])
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         "doc_id": pa.array(np.concatenate(out_d)),
                         "value": pa.array(
                             np.concatenate(out_v).astype(np.float32))})

    return (ray.data.read_parquet(os.path.join(idx, "docmeta"),
                                  columns=["doc_id", "field_len"])
            .map_batches(scan, batch_format="pyarrow"))


def oracle_expr_range_sql() -> str:
    from ..expressions import compile_expr

    parts = []
    for qid, src, lo, hi in EXPR_RANGE_QUERIES:
        es = compile_expr(src).sql({"len": "CAST(dl.len AS REAL)"})
        parts.append(f"""SELECT {qid} AS qid, dl.d AS doc_id,
       {es} AS value
FROM dl
WHERE {es} >= CAST({lo} AS REAL) AND {es} <= CAST({hi} AS REAL)""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE}\n{un}"


# ---------------------------------------------------------------------------
# Shape distance (circle) queries over the triangle index

# (qid, relation, cy, cx, r) — centers sit on docs 7/42/123's quads
SHAPE_CIRCLES = [(1, "intersects", 33850327, -133185578, 20_000_000),
                 (2, "within", -65698038, -159197413, 25_000_000),
                 (3, "disjoint", 0, 0, 30_000_000),
                 (4, "intersects", 82798603, 78226626, 600_000)]


def ft_shape_distance(sf_dir: str) -> pa.Table:
    """XYShape.newDistanceQuery role (document/XYShape.java distance
    queries over ShapeField triangles): docs whose indexed shape
    INTERSECTS / is WITHIN / is DISJOINT from a circle. The descent
    boxes the circle for bbox pruning; survivors get exact integer
    circle-vs-triangle tests (arbitrary-precision cross² comparisons),
    reproduced by the HUGEINT SQL oracle at quad level (the fan union
    equals the quad, and distance-to-union = min over parts)."""
    from ..shapes import build_shape_index, shape_distance

    idx = index_dir_for(sf_dir)
    build_shape_index(idx)
    qids, rels, docs = [], [], []
    for qid, rel, cy, cx, r in SHAPE_CIRCLES:
        hits, _metrics = shape_distance(idx, cy, cx, r, relation=rel)
        qids.extend([qid] * len(hits))
        rels.extend([rel] * len(hits))
        docs.extend(hits.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "relation": pa.array(rels, pa.string()),
                     "doc_id": pa.array(docs, pa.int64())})


def _circle_intersects_where(cy: int, cx: int, r: int) -> str:
    """Quad-vs-circle: center inside the CCW quad, OR some edge within
    r — point-segment distance² <= r² in exact HUGEINT arithmetic."""
    r2 = int(r) * int(r)
    h = "CAST({} AS HUGEINT)"
    dot = (f"(({cy} - e.py) * (e.qy - e.py) "
           f"+ ({cx} - e.px) * (e.qx - e.px))")
    l2 = "((e.qy - e.py) * (e.qy - e.py) + (e.qx - e.px) * (e.qx - e.px))"
    p2 = (f"({h.format(f'{cy} - e.py')} * {h.format(f'{cy} - e.py')} "
          f"+ {h.format(f'{cx} - e.px')} * {h.format(f'{cx} - e.px')})")
    q2 = (f"({h.format(f'{cy} - e.qy')} * {h.format(f'{cy} - e.qy')} "
          f"+ {h.format(f'{cx} - e.qx')} * {h.format(f'{cx} - e.qx')})")
    cross = (f"(({cx} - e.px) * (e.qy - e.py) "
             f"- ({cy} - e.py) * (e.qx - e.px))")
    seg = (f"CASE WHEN {dot} <= 0 THEN {p2} <= {r2} "
           f"WHEN {dot} >= {l2} THEN {q2} <= {r2} "
           f"ELSE {h.format(cross)} * {h.format(cross)} "
           f"<= CAST({r2} AS HUGEINT) * {l2} END")
    inside = (f"NOT EXISTS (SELECT 1 FROM edges e WHERE e.d = s.d AND "
              f"(e.qx - e.px) * ({cy} - e.py) "
              f"- (e.qy - e.py) * ({cx} - e.px) < 0)")
    near = f"EXISTS (SELECT 1 FROM edges e WHERE e.d = s.d AND ({seg}))"
    return f"({inside} OR {near})"


def oracle_shape_distance_sql() -> str:
    rows = []
    for qid, rel, cy, cx, r in SHAPE_CIRCLES:
        if rel == "within":
            r2 = int(r) * int(r)
            rows.append(
                f"SELECT {qid} AS qid, 'within' AS relation, d AS doc_id "
                f"FROM verts GROUP BY d HAVING bool_and("
                f"CAST(y - {cy} AS HUGEINT) * CAST(y - {cy} AS HUGEINT) "
                f"+ CAST(x - {cx} AS HUGEINT) * CAST(x - {cx} AS HUGEINT) "
                f"<= {r2})")
        elif rel == "intersects":
            rows.append(
                f"SELECT {qid} AS qid, 'intersects' AS relation, "
                f"s.d AS doc_id FROM shp s "
                f"WHERE {_circle_intersects_where(cy, cx, r)}")
        else:
            rows.append(
                f"SELECT {qid} AS qid, 'disjoint' AS relation, "
                f"s.d AS doc_id FROM shp s "
                f"WHERE NOT {_circle_intersects_where(cy, cx, r)}")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE},{_SHAPE_CTE}\n{un}"


# ---------------------------------------------------------------------------
# Surround query language (W/N proximity operators) + DisMax tie-breaker

SURROUND_QUERIES = [(1, "key 3w agg"), (2, "slow 5n fast"),
                    (3, "table 2w value"), (4, "scan 4n merge")]


def parse_surround(q: str) -> tuple[list[str], int, bool]:
    """Surround query language (queryparser/surround/query/
    package-info.java; ``a Nw b`` = ordered within N, ``a Nn b`` =
    unordered within N — the classic W/N proximity operators): parses
    the binary infix form onto the intervals machinery
    (Intervals.maxwidth over ordered/unordered — the modern surface the
    reference's SrndQuery tree rewrites to)."""
    toks = q.split()
    if len(toks) != 3:
        raise ValueError(f"expected 'term Nw|Nn term': {q!r}")
    op = toks[1].lower()
    if not op[:-1].isdigit() or op[-1] not in ("w", "n"):
        raise ValueError(f"bad surround operator {toks[1]!r}")
    return [toks[0], toks[2]], int(op[:-1]), op[-1] == "w"


def ft_surround(sf_dir: str) -> pa.Table:
    """Surround W/N proximity queries → (qid, doc_id) existence rows
    (same result contract as ``ft_interval_near``, which is exactly
    what the surround tree rewrites to)."""
    from ..search import interval_near_docs

    r = reader_for(sf_dir)
    qids, docs = [], []
    for qid, q in SURROUND_QUERIES:
        terms, width, ordered = parse_surround(q)
        for d in interval_near_docs(r, terms, width, ordered).tolist():
            qids.append(qid)
            docs.append(d)
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_surround_sql() -> str:
    parts = []
    for qid, q in SURROUND_QUERIES:
        (ta, tb), width, ordered = parse_surround(q)
        if ordered:
            cond = (f"w1.pos > w0.pos AND w1.pos - w0.pos + 1 <= {width}")
        else:
            cond = (f"w1.pos != w0.pos "
                    f"AND abs(w1.pos - w0.pos) + 1 <= {width}")
        parts.append(
            f"SELECT DISTINCT {qid} AS qid, w0.d AS doc_id\n"
            f"FROM w w0 JOIN w w1 ON w1.d = w0.d\n"
            f"WHERE w0.word = '{ta}' AND w1.word = '{tb}' AND {cond}")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# (qid, terms, tie_breaker, k) — <= 3 clauses keeps the double "other"
# sum exact, so the heap-order accumulation is order-independent
DISMAX_TIE_SETS = [(1, ["key", "agg", "slow"], 0.3, 10),
                   (2, ["table", "value"], 0.5, 10),
                   (3, ["vector", "window", "merge"], 0.1, 10)]


def ft_dismax_tie(sf_dir: str) -> pa.Table:
    """DisjunctionMaxQuery with tieBreakerMultiplier > 0
    (search/DisjunctionMaxScorer.java:60-72: running float max, the
    OTHER sub-scores summed in double, final
    (float)(max + otherSum * tie)). With <= 3 clauses the two-term
    double sum is exactly rounded regardless of heap order, so the
    score is deterministic and the REAL-cast oracle matches bit-for-
    bit. → (qid, rank, doc_id, score)."""
    from ..codec import decode_blocks
    from ..search import Scorers

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms, tie, k in DISMAX_TIE_SETS:
        sc = Scorers(r, terms)
        dl, sl = [], []
        for t in terms:
            p = sc.postings.get(t)
            if p is None:
                continue
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            s = sc.sim[t].score(tf, nm)
            lm = r.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            dl.append(d)
            sl.append(s)
        if not dl:
            continue
        alld = np.concatenate(dl)
        alls = np.concatenate(sl)
        uniq, inv = np.unique(alld, return_inverse=True)
        mx = np.zeros(len(uniq), np.float32)
        np.maximum.at(mx, inv, alls)
        tot = np.zeros(len(uniq), np.float64)
        np.add.at(tot, inv, alls.astype(np.float64))
        tiev = float(np.float32(tie))
        fin = (mx.astype(np.float64)
               + (tot - mx.astype(np.float64)) * tiev).astype(np.float32)
        top = np.lexsort((uniq, -fin.astype(np.float64)))[:k]
        for rank, i in enumerate(top, 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uniq[i]))
            scores.append(float(fin[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_dismax_tie_sql() -> str:
    rows = []
    for qid, terms, tie, k in DISMAX_TIE_SETS:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}', CAST({tie} AS REAL), {k})")
    vals = ",\n    ".join(rows)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, tie, k) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.tie, c.k, t.d, {_SCORE_EXPR} AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d,
         CAST(CAST(max(s) AS DOUBLE)
              + (sum(CAST(s AS DOUBLE)) - CAST(max(s) AS DOUBLE))
                * CAST(min(tie) AS DOUBLE) AS REAL) AS score
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, score, k, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= k"""


# ---------------------------------------------------------------------------
# BlendedInfixSuggester (position-linear weight blending)

BLENDED_SUGGEST_QUERIES = [("va", 5), ("sc", 5), ("jo", 5)]
_BLEND_LINEAR_COEF = 0.10


def ft_suggest_blended(sf_dir: str) -> pa.Table:
    """BlendedInfixSuggester POSITION_LINEAR
    (suggest/analyzing/BlendedInfixSuggester.java:76,357-363): infix
    matches re-weighted by WHERE the first matching token sits —
    coefficient = 1 − 0.10·min_position, weight 0 promoted to 1 and
    |weight| < 10 scaled ×10 (:265-270), final score =
    (long)(weight·coefficient) truncated toward zero (:271). The
    matched position comes from the positional postings' first
    occurrence, exactly the reference's term-vector walk (:325-343)."""
    from ..search import _term_docset, _term_positions

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    wt = _dense_field_len(idx)
    out = []
    for p, k in BLENDED_SUGGEST_QUERIES:
        terms = _content_only(r, termdict_scan(r, prefix=p)) \
            .column("term").to_pylist()
        minpos: dict[int, int] = {}
        for t in terms:
            for d, pos in (_term_positions(r, t) or {}).items():
                first = int(np.min(pos))
                if d not in minpos or first < minpos[d]:
                    minpos[d] = first
        docs = np.array(sorted(minpos), np.int64)
        if not len(docs):
            continue
        w = wt[docs].astype(np.float64)
        w[w == 0] = 1.0
        small = np.abs(w) < 1 / _BLEND_LINEAR_COEF
        w[small] *= 1 / _BLEND_LINEAR_COEF
        coef = 1.0 - _BLEND_LINEAR_COEF * np.array(
            [minpos[int(d)] for d in docs], np.float64)
        score = np.trunc(w * coef).astype(np.int64)
        sel = np.lexsort((docs, -score))[:k]
        d = docs[sel]
        out.append(pa.table({
            "prefix": pa.array([p] * len(d), pa.string()),
            "rank": pa.array(np.arange(1, len(d) + 1, dtype=np.int64)),
            "doc_id": pa.array(d, pa.int64()),
            "score": pa.array(score[sel], pa.int64())}))
    if not out:                         # no prefix matched any term
        return pa.table({"prefix": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64())})
    return pa.concat_tables(out)


def oracle_suggest_blended_sql() -> str:
    rows = []
    for p, k in BLENDED_SUGGEST_QUERIES:
        rows.append(f"""SELECT prefix, rank, doc_id, score FROM (
  SELECT '{p}' AS prefix,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         doc_id, score
  FROM (
    SELECT m.d AS doc_id,
           CAST(trunc(
             (CASE WHEN dl.len = 0 THEN CAST(10.0 AS DOUBLE)
                   WHEN abs(dl.len) < 10
                     THEN CAST(dl.len AS DOUBLE) * CAST(10.0 AS DOUBLE)
                   ELSE CAST(dl.len AS DOUBLE) END)
             * (CAST(1.0 AS DOUBLE)
                - CAST(0.10 AS DOUBLE) * CAST(m.minpos AS DOUBLE)))
             AS BIGINT) AS score
    FROM (SELECT d, min(pos) - 1 AS minpos FROM wpos
          WHERE word LIKE '{p}%' GROUP BY d) m
    JOIN dl ON dl.d = m.d)
  ) WHERE rank <= {k}""")
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
wpos AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser (wildcards at ANY phrase position)

COMPLEX_PHRASES = [(1, ["sl*", "fast"]), (2, ["key", "ag*"]),
                   (3, ["ta*", "va*"]), (4, ["zz*", "key"])]


def ft_complex_phrase(sf_dir: str) -> pa.Table:
    """ComplexPhraseQueryParser (queryparser/complexPhrase/
    ComplexPhraseQueryParser.java:57): phrases whose ANY position may be
    a wildcard — each starred position expands from the term dictionary
    and feeds the exact MultiPhraseQuery matcher (the reference rewrites
    to span queries; position-set semantics coincide for single-term
    spans). → (qid, doc_id, freq)."""
    from ..search import multi_phrase_freqs

    r = reader_for(sf_dir)
    qids, docs, freqs = [], [], []
    for qid, pattern in COMPLEX_PHRASES:
        sets = []
        for tok in pattern:
            if tok.endswith("*"):
                exp = _content_only(
                    r, termdict_scan(r, prefix=tok[:-1])) \
                    .column("term").to_pylist()
                sets.append(exp)
            else:
                sets.append([tok])
        if any(not s for s in sets):
            continue
        fr = multi_phrase_freqs(r, sets)
        for d in sorted(fr):
            qids.append(qid)
            docs.append(d)
            freqs.append(fr[d])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "freq": pa.array(freqs, pa.int64())})


def oracle_complex_phrase_sql() -> str:
    parts = []
    for qid, pattern in COMPLEX_PHRASES:
        joins = ["FROM w w0"]
        conds = []
        for i, tok in enumerate(pattern):
            if i:
                joins.append(f"JOIN w w{i} ON w{i}.d = w0.d "
                             f"AND w{i}.pos = w0.pos + {i}")
            cond = (f"w{i}.word LIKE '{tok[:-1]}%'" if tok.endswith("*")
                    else f"w{i}.word = '{tok}'")
            conds.append(cond)
        parts.append(
            f"SELECT {qid} AS qid, w0.d AS doc_id, count(*) AS freq\n"
            + "\n".join(joins) + "\nWHERE " + " AND ".join(conds)
            + "\nGROUP BY w0.d")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


# ---------------------------------------------------------------------------
# IB similarity (SPL-D2) — fourth SimilarityBase family

IB_QUERIES = [(1, ["key", "agg"]), (2, ["slow", "fast", "window"]),
              (3, ["customer"]), (4, ["scan", "merge"])]


def ft_ib_spl(sf_dir: str) -> pa.Table:
    """Top-k under IBSimilarity(DistributionSPL, LambdaDF,
    NormalizationH2) — the information-based family
    (IBSimilarity.java:115), completing the SimilarityBase coverage
    beside DFR and the two LM models."""
    from ..lmdirichlet import score_terms_ib_spl

    return _lm_ranked(
        sf_dir, IB_QUERIES,
        lambda p, tf, nm, r: score_terms_ib_spl(
            tf, nm, p.df, r.doc_count, r.sum_ttf))


def oracle_ib_spl_sql() -> str:
    rows = []
    for qid, terms in IB_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    lam = ("CAST(CAST((f.df + 1.0) / ((SELECT n_docs FROM stats) + 1.0) "
           "AS REAL) AS DOUBLE)")
    tfn = ("CAST(CAST(t.tf AS REAL) AS DOUBLE) * (ln(1 + 1.0 * "
           "(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) / "
           "(SELECT n_docs FROM stats)) / CAST(q.qlen AS DOUBLE)) "
           "/ ln(2.0))")
    raw = (f"-ln((pow({lam}, 1 - 1 / ({tfn} + 1)) - {lam}) "
           f"/ (1 - {lam}))")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d, CAST({raw} AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


# ---------------------------------------------------------------------------
# SpanPositionRangeQuery (match only within a position window)

SPAN_POS_RANGE_QUERIES = [(1, "key", 2, 8), (2, "vector", 0, 3),
                          (3, "agg", 5, 20), (4, "window", 1, 2)]


def ft_span_pos_range(sf_dir: str) -> pa.Table:
    """SpanPositionRangeQuery (queries/spans/SpanPositionRangeQuery.java:29
    — the generalization SpanFirstQuery specializes with start=0):
    term spans whose positions satisfy start <= pos AND span end <= end,
    i.e. 0-based position in [start, end) for width-1 term spans.
    Positions come straight from the positional postings.
    → (qid, doc_id, n_spans, first_pos)."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    qids, docs, counts, firsts = [], [], [], []
    for qid, term, start, end in SPAN_POS_RANGE_QUERIES:
        pos_of = _term_positions(r, term) or {}
        for d in sorted(pos_of):
            p = np.asarray(pos_of[d], np.int64)
            m = p[(p >= start) & (p < end)]
            if len(m):
                qids.append(qid)
                docs.append(int(d))
                counts.append(int(len(m)))
                firsts.append(int(m.min()))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n_spans": pa.array(counts, pa.int64()),
                     "first_pos": pa.array(firsts, pa.int64())})


def oracle_span_pos_range_sql() -> str:
    rows = []
    for qid, term, start, end in SPAN_POS_RANGE_QUERIES:
        rows.append(
            f"SELECT {qid} AS qid, d AS doc_id, count(*) AS n_spans, "
            f"CAST(min(pos) - 1 AS BIGINT) AS first_pos "
            f"FROM wpos WHERE word = '{term}' "
            f"AND pos - 1 >= {start} AND pos - 1 < {end} GROUP BY d")
    un = "\nUNION ALL\n".join(rows)
    return f"""WITH {_CORPUS_CTE},
wpos AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM corpus
)
{un}"""


def ft_axiomatic_f2exp(sf_dir: str) -> pa.Table:
    """Top-k under AxiomaticF2EXP (similarities/Axiomatic.java:107,
    AxiomaticF2EXP.java) — the axiomatic retrieval family, fifth
    pluggable-Similarity branch beside BM25/TFIDF, LM, DFR and IB."""
    from ..lmdirichlet import score_terms_axiomatic_f2exp

    return _lm_ranked(
        sf_dir, IB_QUERIES,
        lambda p, tf, nm, r: score_terms_axiomatic_f2exp(
            tf, nm, p.df, r.doc_count, r.sum_ttf))


def oracle_axiomatic_f2exp_sql() -> str:
    rows = []
    for qid, terms in IB_QUERIES:
        for ci, t in enumerate(terms):
            rows.append(f"({qid}, {ci}, '{t}')")
    vals = ",\n    ".join(rows)
    raw = ("(CAST(CAST(t.tf AS REAL) AS DOUBLE) / "
           "(CAST(CAST(t.tf AS REAL) AS DOUBLE) "
           "+ CAST(CAST(0.25 AS REAL) AS DOUBLE) "
           "+ CAST(CAST(0.25 AS REAL) AS DOUBLE) * CAST(q.qlen AS DOUBLE) "
           "/ (CAST((SELECT sum_ttf FROM stats) AS DOUBLE) "
           "/ (SELECT n_docs FROM stats)))) "
           "* pow(((SELECT n_docs FROM stats) + 1.0) / f.df, "
           "CAST(CAST(0.35 AS REAL) AS DOUBLE))")
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term) AS (VALUES
    {vals}
),
scored AS (
  SELECT c.qid, c.clause, t.d,
         CAST(greatest(0.0, {raw}) AS REAL) AS s
  FROM clauses c
  JOIN tf t ON t.term = c.term
  JOIN df f ON f.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked
WHERE rank <= {_LMD_K}"""


# ---------------------------------------------------------------------------
# Snowball stemmer family (lucene_ray.snowball; org.tartarus.snowball.
# ext) — the default stemmers of the reference's per-language
# analyzers.  Danish/Swedish/Norwegian run raw over the corpus.  Dutch
# plants y->j so the oracle's regex-based i-protection is exact
# (the Y-protection path is order-interleaved with it in the scanner
# and not regex-expressible; it is covered by the 77-pair reference
# battery in tests/test_snowball.py).  Russian plants Cyrillic via
# per-char transliteration like the other script entries.  Every
# oracle is GENERATED from the same among tables the engine uses and
# reproduces the find_among_b commit semantics (longest suffix that
# fits the region decides; a failed post-condition does not fall back).

def _sb_words_cte() -> str:
    return """WITH w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
)"""


def _sb_p1_min3(col: str, vowels: str) -> str:
    """Scandinavian R1 with the min-3 clamp.  For words the scan
    cannot mark (incl. len<3) both engine and SQL yield an empty
    region (see snowball._r1_min3)."""
    pat = f"^[^{vowels}]*[{vowels}]+[^{vowels}]"
    return (f"CASE WHEN regexp_matches({col}, '{pat}') THEN "
            f"greatest(length(regexp_extract({col}, '{pat}', 0)), 3) "
            f"ELSE length({col}) END")


def _sb_p_std(col: str, vowels: str, two: bool = False) -> str:
    """Unclamped R1 (two=False) / R2 (two=True) per _std_regions."""
    seg = f"[^{vowels}]*[{vowels}]+[^{vowels}]"
    pat = f"^{seg}{seg}" if two else f"^{seg}"
    return (f"CASE WHEN regexp_matches({col}, '{pat}') THEN "
            f"length(regexp_extract({col}, '{pat}', 0)) "
            f"ELSE length({col}) END")


def _sb_case(col: str, table, then_fn, default: str) -> str:
    """Among-as-CASE: WHENs ordered by suffix length desc, each
    condition = matches AND fits the region (column ``p1``);
    ``then_fn(sfx, act, start_expr)`` renders the committed action."""
    whens = []
    for sfx, act in table:
        k = len(sfx)
        cond = (f"length({col}) - {k} >= p1 "
                f"AND ends_with({col}, '{sfx}')")
        whens.append(f"    WHEN {cond}\n"
                     f"      THEN {then_fn(sfx, act, k)}")
    chain = "\n".join(whens)
    return f"CASE\n{chain}\n    ELSE {default} END"


def _sb_in(chars) -> str:
    return "(" + ", ".join(f"'{c}'" for c in sorted(chars)) + ")"


def ft_snowball_danish(sf_dir: str) -> pa.Table:
    """SnowballFilter(Danish) (snowball/ext/DanishStemmer.java:13, the
    da/DanishAnalyzer.java:41 default stemmer)."""
    from ..snowball import danish_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [danish_stem(w) for w in _words(tx)])


def oracle_snowball_danish_sql() -> str:
    from ..snowball import _DA_MAIN, _DA_OTHER, _DA_S_ENDING, _DA_CONS
    v = "aeiouyåæø"

    def main_then(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            return cut
        return (f"CASE WHEN length(word) >= 2 AND "
                f"substr(word, length(word)-1, 1) IN "
                f"{_sb_in(_DA_S_ENDING)} THEN {cut} ELSE word END")

    def pair(col: str) -> str:
        return (f"CASE WHEN length({col}) - 2 >= p1 AND right({col}, 2) "
                f"IN ('gd','dt','gt','kt') "
                f"THEN substr({col}, 1, length({col})-1) ELSE {col} END")

    def other_then(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            return pair(cut)
        return "substr(word, 1, length(word)-1)"   # løst -> løs

    main = _sb_case("word", _DA_MAIN, main_then, "word")
    other = _sb_case("word", _DA_OTHER, other_then, "word")
    return f"""{_sb_words_cte()}, w AS (
  SELECT d, word, {_sb_p1_min3('word', v)} AS p1
  FROM w0 WHERE word <> ''
), s1 AS (
  SELECT d, p1, {main} AS word FROM w
), s2 AS (
  SELECT d, p1, {pair('word')} AS word FROM s1
), s3 AS (
  SELECT d, p1, CASE WHEN ends_with(word, 'igst')
    THEN substr(word, 1, length(word)-2) ELSE word END AS word
  FROM s2
), s4 AS (
  SELECT d, p1, {other} AS word FROM s3
), fin AS (
  SELECT d, CASE WHEN length(word) - 1 >= p1 AND length(word) >= 2
    AND substr(word, length(word), 1) = substr(word, length(word)-1, 1)
    AND substr(word, length(word), 1) IN {_sb_in(_DA_CONS)}
    THEN substr(word, 1, length(word)-1) ELSE word END AS term
  FROM s4
)
{_RSLP_TAIL}"""


def ft_snowball_swedish(sf_dir: str) -> pa.Table:
    """SnowballFilter(Swedish) (snowball/ext/SwedishStemmer.java:13,
    the sv/SwedishAnalyzer.java:41 default stemmer)."""
    from ..snowball import swedish_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [swedish_stem(w) for w in _words(tx)])


def oracle_snowball_swedish_sql() -> str:
    from ..snowball import _SV_MAIN, _SV_OTHER, _SV_S_ENDING, \
        _SV_OST_ENDING
    v = "aeiouyäåö"

    def main_then(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            return cut
        return (f"CASE WHEN length(word) >= 2 AND "
                f"substr(word, length(word)-1, 1) IN "
                f"{_sb_in(_SV_S_ENDING)} THEN {cut} ELSE word END")

    def other_then(sfx, act, k):
        if act == 1:
            return f"substr(word, 1, length(word)-{k})"
        if act == 2:   # öst -> ös after a valid ost-ending
            return (f"CASE WHEN length(word) >= 4 AND "
                    f"substr(word, length(word)-3, 1) IN "
                    f"{_sb_in(_SV_OST_ENDING)} "
                    f"THEN substr(word, 1, length(word)-1) "
                    f"ELSE word END")
        return "substr(word, 1, length(word)-1)"   # fullt -> full

    main = _sb_case("word", _SV_MAIN, main_then, "word")
    other = _sb_case("word", _SV_OTHER, other_then, "word")
    return f"""{_sb_words_cte()}, w AS (
  SELECT d, word, {_sb_p1_min3('word', v)} AS p1
  FROM w0 WHERE word <> ''
), s1 AS (
  SELECT d, p1, {main} AS word FROM w
), s2 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1 AND right(word, 2)
    IN ('dd','gd','nn','dt','gt','kt','tt')
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM s1
), fin AS (
  SELECT d, {other} AS term FROM s2
)
{_RSLP_TAIL}"""


def ft_snowball_norwegian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Norwegian) (snowball/ext/NorwegianStemmer.java:13,
    the no/NorwegianAnalyzer.java:42 default stemmer)."""
    from ..snowball import norwegian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [norwegian_stem(w) for w in _words(tx)])


def oracle_snowball_norwegian_sql() -> str:
    from ..snowball import _NO_MAIN, _NO_OTHER, _NO_S_ENDING
    v = "aeiouyåæø"

    def main_then(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            return cut
        if act == 2:
            return (f"CASE WHEN length(word) >= 2 AND ("
                    f"substr(word, length(word)-1, 1) IN "
                    f"{_sb_in(_NO_S_ENDING)} OR ("
                    f"substr(word, length(word)-1, 1) = 'k' AND "
                    f"length(word) >= 3 AND "
                    f"substr(word, length(word)-2, 1) NOT IN "
                    f"{_sb_in(v)})) THEN {cut} ELSE word END")
        return f"{cut} || 'er'"                    # erte/ert -> er

    main = _sb_case("word", _NO_MAIN, main_then, "word")
    other = _sb_case(
        "word", _NO_OTHER,
        lambda s, a, k: f"substr(word, 1, length(word)-{k})", "word")
    return f"""{_sb_words_cte()}, w AS (
  SELECT d, word, {_sb_p1_min3('word', v)} AS p1
  FROM w0 WHERE word <> ''
), s1 AS (
  SELECT d, p1, {main} AS word FROM w
), s2 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1 AND right(word, 2)
    IN ('dt','vt') THEN substr(word, 1, length(word)-1)
    ELSE word END AS word
  FROM s1
), fin AS (
  SELECT d, {other} AS term FROM s2
)
{_RSLP_TAIL}"""


def ft_snowball_dutch(sf_dir: str) -> pa.Table:
    """SnowballFilter(Dutch) (snowball/ext/DutchStemmer.java:13).
    Corpus words are planted y->j: the scanner's interleaved Y/I
    vowel-protection order is not regex-expressible, and with no y in
    the input the oracle's two-pass I-protection regex is exact (the
    Y path is gated by the 77-pair reference battery in pytest)."""
    from ..snowball import dutch_stem
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [dutch_stem(w.replace("y", "j"))
                       for w in _words(tx)])


def oracle_snowball_dutch_sql() -> str:
    v = "aeiouyè"
    VIN = _sb_in(v)
    VJ = _sb_in(v + "j")

    def undouble(x: str) -> str:
        return (f"CASE WHEN right({x}, 2) IN ('dd','kk','tt') "
                f"THEN substr({x}, 1, length({x})-1) ELSE {x} END")

    def en_ending(col: str, k: int) -> str:
        cut = f"substr({col}, 1, length({col})-{k})"
        return (f"CASE WHEN length({col}) - {k} >= p1 "
                f"AND length({col}) - {k} >= 1 "
                f"AND substr({col}, length({col})-{k}, 1) NOT IN {VIN} "
                f"AND NOT ends_with({cut}, 'gem') "
                f"THEN {undouble(cut)} ELSE {col} END")

    def e_cond(col: str) -> str:
        return (f"(ends_with({col}, 'e') AND length({col}) - 1 >= p1 "
                f"AND length({col}) >= 2 "
                f"AND substr({col}, length({col})-1, 1) NOT IN {VIN})")

    def e_apply(col: str) -> str:
        cut = f"substr({col}, 1, length({col})-1)"
        return (f"CASE WHEN {e_cond(col)} THEN {undouble(cut)} "
                f"ELSE {col} END")

    # step 1 (match unrestricted, R1 conditions inside the action)
    s_cut = "substr(word, 1, length(word)-1)"
    se_cut = "substr(word, 1, length(word)-2)"
    step1 = f"""CASE
    WHEN ends_with(word, 'heden')
      THEN CASE WHEN length(word) - 5 >= p1
        THEN substr(word, 1, length(word)-5) || 'heid' ELSE word END
    WHEN ends_with(word, 'ene') THEN {en_ending('word', 3)}
    WHEN ends_with(word, 'en') THEN {en_ending('word', 2)}
    WHEN ends_with(word, 'se')
      THEN CASE WHEN length(word) - 2 >= p1 AND length(word) - 2 >= 1
        AND substr(word, length(word)-2, 1) NOT IN {VJ}
        THEN {se_cut} ELSE word END
    WHEN ends_with(word, 's')
      THEN CASE WHEN length(word) - 1 >= p1 AND length(word) - 1 >= 1
        AND substr(word, length(word)-1, 1) NOT IN {VJ}
        THEN {s_cut} ELSE word END
    ELSE word END"""

    cut3 = "substr(word, 1, length(word)-3)"
    cut4 = "substr(word, 1, length(word)-4)"
    cut2 = "substr(word, 1, length(word)-2)"
    ig_after = (f"CASE WHEN ends_with({cut3}, 'ig') "
                f"AND length({cut3}) - 2 >= p2 "
                f"AND (length({cut3}) < 3 OR "
                f"substr({cut3}, length({cut3})-2, 1) <> 'e') "
                f"THEN substr({cut3}, 1, length({cut3})-2) "
                f"ELSE {undouble(cut3)} END")
    step4 = f"""CASE
    WHEN ends_with(word, 'lijk')
      THEN CASE WHEN length(word) - 4 >= p2
        THEN {e_apply(cut4)} ELSE word END
    WHEN ends_with(word, 'baar')
      THEN CASE WHEN length(word) - 4 >= p2 THEN {cut4} ELSE word END
    WHEN ends_with(word, 'end') OR ends_with(word, 'ing')
      THEN CASE WHEN length(word) - 3 >= p2 THEN {ig_after}
        ELSE word END
    WHEN ends_with(word, 'bar')
      THEN CASE WHEN length(word) - 3 >= p2 AND e1 THEN {cut3}
        ELSE word END
    WHEN ends_with(word, 'ig')
      THEN CASE WHEN length(word) - 2 >= p2 AND (length(word) - 2 < 1
        OR substr(word, length(word)-2, 1) <> 'e') THEN {cut2}
        ELSE word END
    ELSE word END"""

    return f"""{_sb_words_cte()}, wp AS (
  SELECT d, regexp_replace(regexp_replace(
           translate(replace(word, 'y', 'j'),
                     'áäéëíïóöúü', 'aaeeiioouu'),
           '([aeiouè])i([aeiouè])', '\\1I\\2', 'g'),
           '([aeiouè])i([aeiouè])', '\\1I\\2', 'g') AS word
  FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, greatest({_sb_p_std('word', v)}, 3) AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM wp
), s1 AS (
  SELECT d, p1, p2, {step1} AS word FROM w
), s2 AS (
  SELECT d, p1, p2, {e_cond('word')} AS e1,
         {e_apply('word')} AS word
  FROM s1
), s3a AS (
  SELECT d, p1, p2, e1,
         (ends_with(word, 'heid') AND length(word) - 4 >= p2
          AND (length(word) < 5
               OR substr(word, length(word)-4, 1) <> 'c')) AS h,
         CASE WHEN ends_with(word, 'heid') AND length(word) - 4 >= p2
           AND (length(word) < 5
                OR substr(word, length(word)-4, 1) <> 'c')
           THEN substr(word, 1, length(word)-4) ELSE word END AS word
  FROM s2
), s3 AS (
  SELECT d, p1, p2, e1,
         CASE WHEN h AND ends_with(word, 'en')
           THEN {en_ending('word', 2)} ELSE word END AS word
  FROM s3a
), s4 AS (
  SELECT d, p1, p2, {step4} AS word FROM s3
), s5 AS (
  SELECT d, CASE WHEN length(word) >= 4
    AND substr(word, length(word), 1) NOT IN {VIN}
    AND substr(word, length(word), 1) <> 'I'
    AND substr(word, length(word)-1, 1) = substr(word, length(word)-2, 1)
    AND substr(word, length(word)-1, 1) IN ('a','e','o','u')
    AND substr(word, length(word)-3, 1) NOT IN {VIN}
    THEN substr(word, 1, length(word)-2) || right(word, 1)
    ELSE word END AS word
  FROM s4
), fin AS (
  SELECT d, replace(word, 'I', 'i') AS term FROM s5
)
{_RSLP_TAIL}"""


_RU_PLANT_FROM = "abcdefghijklmnopqrstuvwxyz"
_RU_PLANT_TO = "абцдефгхияклмнопьрстувюйыз"


def ft_snowball_russian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Russian) (snowball/ext/RussianStemmer.java:13,
    the ru/RussianAnalyzer.java:44 default stemmer): planted Cyrillic
    via per-char transliteration so the noun/verb/adjective suffix
    classes fire (vowels map to vowels; j->я exercises the group-1
    preceded-by-а/я rules, q->ь the soft-sign tidy-up)."""
    from ..snowball import russian_stem
    plant = str.maketrans(_RU_PLANT_FROM, _RU_PLANT_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [russian_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_snowball_russian_sql() -> str:
    from ..snowball import (_RU_ADJECTIVE, _RU_NOUN, _RU_PARTICIPLE,
                            _RU_PERF_GERUND, _RU_REFLEXIVE, _RU_VERB)
    v = "аеиоуыэюя"

    def del_case(col: str, table, grouped: bool, guard: str) -> str:
        """Among as a deletion-length CASE.  ``grouped``: action 1
        entries additionally require а/я just before the suffix
        (inside RV) — else the among commits with no deletion."""
        whens = []
        for sfx, act in table:
            k = len(sfx)
            cond = (f"length({col}) - {k} >= pv "
                    f"AND ends_with({col}, '{sfx}')")
            if grouped and act == 1:
                then = (f"CASE WHEN length({col}) - {k} - 1 >= pv AND "
                        f"substr({col}, length({col})-{k}, 1) "
                        f"IN ('а','я') THEN {k} ELSE 0 END")
            else:
                then = str(k)
            whens.append(f"    WHEN {cond} THEN {then}")
        chain = "\n".join(whens)
        return f"CASE WHEN {guard} THEN (CASE\n{chain}\n    ELSE 0 END) ELSE 0 END"

    perf = del_case("word", _RU_PERF_GERUND, True, "TRUE")
    refl = del_case("word", _RU_REFLEXIVE, False, "NOT fired")
    adjc = del_case("word", _RU_ADJECTIVE, False, "NOT fired")
    part = del_case("word", _RU_PARTICIPLE, True, "adj")
    verb = del_case("word", _RU_VERB, True, "NOT fired AND NOT adj")
    noun = del_case("word", _RU_NOUN, False,
                    "NOT fired AND NOT adj AND NOT vb")

    pv_pat = f"^[^{v}]*[{v}]"
    pv_expr = (f"CASE WHEN regexp_matches(word, '{pv_pat}') THEN "
               f"length(regexp_extract(word, '{pv_pat}', 0)) "
               f"ELSE length(word) END")

    tidy_cut4 = "substr(word, 1, length(word)-4)"
    tidy_cut3 = "substr(word, 1, length(word)-3)"

    def nn_fix(x: str) -> str:
        return (f"CASE WHEN ends_with({x}, 'нн') "
                f"AND length({x}) - 2 >= pv "
                f"THEN substr({x}, 1, length({x})-1) ELSE {x} END")

    tidy = f"""CASE
    WHEN length(word) - 4 >= pv AND ends_with(word, 'ейше')
      THEN {nn_fix(tidy_cut4)}
    WHEN length(word) - 3 >= pv AND ends_with(word, 'ейш')
      THEN {nn_fix(tidy_cut3)}
    WHEN length(word) - 1 >= pv AND ends_with(word, 'н')
      THEN CASE WHEN length(word) >= 2
        AND substr(word, length(word)-1, 1) = 'н'
        AND length(word) - 2 >= pv
        THEN substr(word, 1, length(word)-1) ELSE word END
    WHEN length(word) - 1 >= pv AND ends_with(word, 'ь')
      THEN substr(word, 1, length(word)-1)
    ELSE word END"""

    return f"""{_sb_words_cte()}, wp AS (
  SELECT d, translate(replace(word, 'ё', 'е'),
           '{_RU_PLANT_FROM}', '{_RU_PLANT_TO}') AS word
  FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, {pv_expr} AS pv,
         {_sb_p_std('word', v, True)} AS p2
  FROM wp
), g1 AS (
  SELECT d, pv, p2, {perf} AS dl, word FROM w
), s1 AS (
  SELECT d, pv, p2, dl > 0 AS fired,
         substr(word, 1, length(word) - dl) AS word
  FROM g1
), g2 AS (
  SELECT d, pv, p2, fired, {refl} AS dl, word FROM s1
), s2 AS (
  SELECT d, pv, p2, fired,
         substr(word, 1, length(word) - dl) AS word
  FROM g2
), g3 AS (
  SELECT d, pv, p2, fired, {adjc} AS dl, word FROM s2
), s3 AS (
  SELECT d, pv, p2, fired, dl > 0 AS adj,
         substr(word, 1, length(word) - dl) AS word
  FROM g3
), g4 AS (
  SELECT d, pv, p2, fired, adj, {part} AS dl, word FROM s3
), s4 AS (
  SELECT d, pv, p2, fired, adj,
         substr(word, 1, length(word) - dl) AS word
  FROM g4
), g5 AS (
  SELECT d, pv, p2, fired, adj, {verb} AS dl, word FROM s4
), s5 AS (
  SELECT d, pv, p2, fired, adj, dl > 0 AS vb,
         substr(word, 1, length(word) - dl) AS word
  FROM g5
), g6 AS (
  SELECT d, pv, p2, fired, adj, vb, {noun} AS dl, word FROM s5
), s6 AS (
  SELECT d, pv, p2, substr(word, 1, length(word) - dl) AS word
  FROM g6
), s7 AS (
  SELECT d, pv, p2, CASE WHEN ends_with(word, 'и')
    AND length(word) - 1 >= pv
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM s6
), s8 AS (
  SELECT d, pv, CASE
    WHEN length(word) - 4 >= greatest(pv, p2)
         AND ends_with(word, 'ость')
      THEN substr(word, 1, length(word)-4)
    WHEN length(word) - 3 >= greatest(pv, p2)
         AND ends_with(word, 'ост')
      THEN substr(word, 1, length(word)-3)
    ELSE word END AS word
  FROM s7
), fin AS (
  SELECT d, {tidy} AS term FROM s8
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Snowball stemmer family, second batch (lucene_ray.snowball2) — the
# default stemmers of the remaining per-language analyzers.  Non-Latin
# scripts plant via per-char transliteration (the Russian pattern);
# every oracle is GENERATED from the same among tables the engine uses
# (snowball2_data) with the find_among_b commit semantics.

def _sb_del_case(col: str, table, region: str, gate=None) -> str:
    """Among as a deletion-length CASE: WHENs ordered longest-first,
    condition = suffix matches AND fits ``region``; ``gate(sfx, act,
    k)`` may wrap the committed deletion in a post-condition (a failed
    gate deletes nothing — no fallback)."""
    whens = []
    for sfx, act in table:
        k = len(sfx)
        cond = (f"length({col}) - {k} >= {region} "
                f"AND ends_with({col}, '{sfx}')")
        then = str(k) if gate is None else gate(sfx, act, k)
        whens.append(f"    WHEN {cond} THEN {then}")
    chain = "\n".join(whens)
    return f"CASE\n{chain}\n    ELSE 0 END"


def _sb_pv_expr(col: str, v: str) -> str:
    """RV start = after the first vowel (no region when vowel-less)."""
    pat = f"^[^{v}]*[{v}]"
    return (f"CASE WHEN regexp_matches({col}, '{pat}') THEN "
            f"length(regexp_extract({col}, '{pat}', 0)) "
            f"ELSE length({col}) END")


_HY_PLANT_FROM = "abcdefghijklmnopqrstuvwxyz"
_HY_PLANT_TO = "աբցդեֆգհիջկլմնոպքրստւվշըյզ"


def ft_snowball_armenian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Armenian) (snowball/ext/ArmenianStemmer.java:13,
    the hy/ArmenianAnalyzer.java:119 default stemmer): planted Armenian
    via per-char transliteration (vowels a e i o u -> ա ե ի ո ւ plus
    x -> ը) so the noun/verb/adjective/ending classes fire (-er -> եր,
    -al -> ալ, -an -> ան, -ous -> ուս, ...)."""
    from ..snowball2 import armenian_stem
    plant = str.maketrans(_HY_PLANT_FROM, _HY_PLANT_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [armenian_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_snowball_armenian_sql() -> str:
    from ..snowball2 import _HY_ADJ, _HY_ENDING, _HY_NOUN, _HY_VERB
    v = "աեէըիուօ"

    def r2_gate(sfx, act, k):
        return (f"CASE WHEN length(word) - {k} >= p2 "
                f"THEN {k} ELSE 0 END")

    ending = _sb_del_case("word", _HY_ENDING, "pv", r2_gate)
    verb = _sb_del_case("word", _HY_VERB, "pv")
    adj = _sb_del_case("word", _HY_ADJ, "pv")
    noun = _sb_del_case("word", _HY_NOUN, "pv")
    return f"""{_sb_words_cte()}, wp AS (
  SELECT d, translate(word, '{_HY_PLANT_FROM}', '{_HY_PLANT_TO}') AS word
  FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, {_sb_pv_expr('word', v)} AS pv,
         {_sb_p_std('word', v, True)} AS p2
  FROM wp
), g1 AS (
  SELECT d, pv, p2, {ending} AS dl, word FROM w
), s1 AS (
  SELECT d, pv, p2, substr(word, 1, length(word) - dl) AS word FROM g1
), g2 AS (
  SELECT d, pv, p2, {verb} AS dl, word FROM s1
), s2 AS (
  SELECT d, pv, p2, substr(word, 1, length(word) - dl) AS word FROM g2
), g3 AS (
  SELECT d, pv, p2, {adj} AS dl, word FROM s2
), s3 AS (
  SELECT d, pv, p2, substr(word, 1, length(word) - dl) AS word FROM g3
), g4 AS (
  SELECT d, pv, {noun} AS dl, word FROM s3
), fin AS (
  SELECT d, substr(word, 1, length(word) - dl) AS term FROM g4
)
{_RSLP_TAIL}"""


# ---------------------------------------------------------------------------
# Snowball second batch (lucene_ray.snowball2) — the remaining
# per-language default stemmers.  Oracles are GENERATED from the same
# among tables the engine uses (the re-extraction equality test in
# tests/test_snowball2.py pins those to the reference programs); each
# replays the exact region gates and the find_among_b commit
# semantics.  Languages whose control flow is a cursor machine with
# loops/flags (Turkish, Tamil) or scan-order-sensitive preludes
# (Romanian u/i protection) are rows-only with pytest gates.

def _sb_del_acts(col: str, table, regions: dict) -> str:
    """Deletion-length CASE with a per-act region gate (matched
    longest-first, committed: a failed gate deletes nothing)."""
    whens = []
    for sfx, act in table:
        k = len(sfx)
        s = sfx.replace("'", "''")
        whens.append(
            f"    WHEN length({col}) >= {k} AND ends_with({col}, '{s}') "
            f"THEN CASE WHEN length({col}) - {k} >= {regions[act]} "
            f"THEN {k} ELSE 0 END")
    chain = "\n".join(whens)
    return f"CASE\n{chain}\n    ELSE 0 END"


def ft_snowball_irish(sf_dir: str) -> pa.Table:
    """SnowballFilter(Irish) (snowball/ext/IrishStemmer.java:13, the
    ga/IrishAnalyzer.java:125 default stemmer)."""
    from ..snowball2 import irish_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [irish_stem(w) for w in _words(tx)])


def oracle_snowball_irish_sql() -> str:
    from ..snowball2 import (_GA_DERIV, _GA_DERIV_SUB, _GA_INIT_SUB,
                             _GA_INITIAL, _GA_NOUN, _GA_VERB)
    v = "aeiouáéíóú"
    pre = []
    for pfx, act in _GA_INITIAL:
        p = pfx.replace("'", "''")
        rep = _GA_INIT_SUB[act]
        tail = f"substr(word, {len(pfx) + 1})"
        new = f"'{rep}' || {tail}" if rep else tail
        pre.append(f"    WHEN starts_with(word, '{p}') THEN {new}")
    morph = "CASE\n" + "\n".join(pre) + "\n    ELSE word END"
    noun = _sb_del_acts("word", _GA_NOUN, {1: "p1", 2: "p2"})
    dwhens = []
    for sfx, act in _GA_DERIV:
        k = len(sfx)
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            new = (f"CASE WHEN length(word) - {k} >= p2 "
                   f"THEN {cut} ELSE word END")
        else:
            new = f"{cut} || '{_GA_DERIV_SUB[act]}'"
        dwhens.append(f"    WHEN length(word) >= {k} AND "
                      f"ends_with(word, '{sfx}') THEN {new}")
    deriv = "CASE\n" + "\n".join(dwhens) + "\n    ELSE word END"
    verb = _sb_del_acts("word", _GA_VERB, {1: "pv", 2: "p1"})
    return f"""{_sb_words_cte()}, wm AS (
  SELECT d, {morph} AS word FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, {_sb_pv_expr('word', v)} AS pv,
         {_sb_p_std('word', v)} AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM wm
), g1 AS (
  SELECT d, pv, p1, p2, {noun} AS dl, word FROM w
), s1 AS (
  SELECT d, pv, p1, p2, substr(word, 1, length(word) - dl) AS word
  FROM g1
), s2 AS (
  SELECT d, pv, p1, {deriv} AS word FROM s1
), g3 AS (
  SELECT d, {verb} AS dl, word FROM s2
), fin AS (
  SELECT d, substr(word, 1, length(word) - dl) AS term FROM g3
)
{_RSLP_TAIL}"""


def ft_snowball_catalan(sf_dir: str) -> pa.Table:
    """SnowballFilter(Catalan) (snowball/ext/CatalanStemmer.java:13,
    the ca/CatalanAnalyzer.java:122 default stemmer)."""
    from ..snowball2 import catalan_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [catalan_stem(w) for w in _words(tx)])


def oracle_snowball_catalan_sql() -> str:
    from ..snowball2 import (_CA_PRONOUN, _CA_RESIDUAL, _CA_STD,
                             _CA_VERB)
    v = "aeiouàáèéíïòóúü"
    pron = _sb_del_acts(
        "word", [(s, 1) for s, _ in _CA_PRONOUN], {1: "p1"})
    std_acts = {1: ("p1", None), 2: ("p2", None), 3: ("p2", "log"),
                4: ("p2", "ic"), 5: ("p1", "c")}
    w_whens, f_whens = [], []
    for sfx, act in _CA_STD:
        k = len(sfx)
        s = sfx.replace("'", "''")
        region, rep = std_acts[act]
        cut = f"substr(word, 1, length(word)-{k})"
        new = f"{cut} || '{rep}'" if rep else cut
        base = f"length(word) >= {k} AND ends_with(word, '{s}')"
        gate = f"length(word) - {k} >= {region}"
        w_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                       f"THEN {new} ELSE word END")
        f_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                       f"THEN 1 ELSE 0 END")
    std = "CASE\n" + "\n".join(w_whens) + "\n    ELSE word END"
    std_done = "CASE\n" + "\n".join(f_whens) + "\n    ELSE 0 END"
    verb = _sb_del_acts("word", _CA_VERB, {1: "p1", 2: "p2"})
    res_whens = []
    for sfx, act in _CA_RESIDUAL:
        k = len(sfx)
        cut = f"substr(word, 1, length(word)-{k})"
        new = cut if act == 1 else f"{cut} || 'ic'"
        res_whens.append(
            f"    WHEN length(word) >= {k} AND ends_with(word, '{sfx}') "
            f"THEN CASE WHEN length(word) - {k} >= p1 "
            f"THEN {new} ELSE word END")
    residual = "CASE\n" + "\n".join(res_whens) + "\n    ELSE word END"
    return f"""{_sb_words_cte()}, w AS (
  SELECT d, word, {_sb_p_std('word', v)} AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM w0 WHERE word <> ''
), g1 AS (
  SELECT d, p1, p2, {pron} AS dl, word FROM w
), s1 AS (
  SELECT d, p1, p2, substr(word, 1, length(word) - dl) AS word FROM g1
), s2 AS (
  SELECT d, p1, p2, {std} AS w2, {std_done} AS done, word FROM s1
), s3 AS (
  SELECT d, p1,
         CASE WHEN done = 1 THEN w2
              ELSE substr(word, 1, length(word) - ({verb})) END AS word
  FROM s2
), fin AS (
  SELECT d, translate({residual}, 'àáèéìíïòóúü·', 'aaeeiiioouu.')
         AS term
  FROM s3
)
{_RSLP_TAIL}"""


def ft_snowball_lithuanian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Lithuanian) (snowball/ext/LithuanianStemmer
    .java:13, the lt/LithuanianAnalyzer.java:124 default stemmer)."""
    from ..snowball2 import lithuanian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [lithuanian_stem(w) for w in _words(tx)])


def oracle_snowball_lithuanian_sql() -> str:
    from ..snowball2 import (_LT_CONFLICT_SUB, _LT_CONFLICTS, _LT_STEP1,
                             _LT_STEP2)
    v = "aeiouyąėęįūų"
    pat = f"^[^{v}]*[{v}]+[^{v}]"
    conf_whens = []
    for sfx, act in _LT_CONFLICTS:
        k = len(sfx)
        conf_whens.append(
            f"    WHEN length(word) >= {k} AND ends_with(word, '{sfx}') "
            f"THEN substr(word, 1, length(word)-{k}) "
            f"|| '{_LT_CONFLICT_SUB[act]}'")
    conflicts = "CASE\n" + "\n".join(conf_whens) + "\n    ELSE word END"
    # limit-restricted matching (LithuanianStemmer.java:318-340 sets
    # limit_backward = I_p1 BEFORE find_among_b): the region sits in the
    # match condition itself, so a shorter nested suffix still fires
    # when a longer one crosses R1 — _sb_del_acts' post-commit gate
    # would wrongly delete nothing there
    step1 = _sb_del_case("word", [(s, 1) for s, _ in _LT_STEP1], "p1")
    step2 = _sb_del_case("word", [(s, 1) for s, _ in _LT_STEP2], "p1")
    chdz = ("CASE WHEN ends_with(word, 'dž') "
            "THEN substr(word, 1, length(word)-2) || 'd' "
            "WHEN ends_with(word, 'č') "
            "THEN substr(word, 1, length(word)-1) || 't' "
            "ELSE word END")
    return f"""WITH RECURSIVE w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), w AS (
  SELECT d, word,
         CASE WHEN substr(word, 1, 1) = 'a' AND length(word) > 6
              THEN CASE WHEN regexp_matches(substr(word, 2), '{pat}')
                   THEN 1 + length(regexp_extract(substr(word, 2),
                                                  '{pat}', 0))
                   ELSE length(word) END
              ELSE CASE WHEN regexp_matches(word, '{pat}')
                   THEN length(regexp_extract(word, '{pat}', 0))
                   ELSE length(word) END END AS p1
  FROM w0 WHERE word <> ''
), s1 AS (
  SELECT d, p1, {conflicts} AS word FROM w
), g1 AS (
  SELECT d, p1, {step1} AS dl, word FROM s1
), s2 AS (
  SELECT d, p1, substr(word, 1, length(word) - dl) AS word FROM g1
), s3 AS (
  SELECT d, p1, {chdz} AS word FROM s2
), rec AS (
  SELECT d, p1, word FROM s3
  UNION ALL
  SELECT d, p1, substr(word, 1, length(word) - ({step2})) AS word
  FROM rec WHERE ({step2}) > 0
), s4 AS (
  SELECT d, p1, word FROM rec WHERE ({step2}) = 0
), s5 AS (
  SELECT d, {chdz} AS word FROM s4
), fin AS (
  SELECT d, CASE WHEN ends_with(word, 'gd')
            THEN substr(word, 1, length(word)-1) ELSE word END AS term
  FROM s5
)
{_RSLP_TAIL}"""


def ft_snowball_hungarian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Hungarian) (snowball/ext/HungarianStemmer
    .java:13, the hu/HungarianAnalyzer.java:122 default stemmer)."""
    from ..snowball2 import hungarian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [hungarian_stem(w) for w in _words(tx)])


def oracle_snowball_hungarian_sql() -> str:
    from ..snowball2 import (_HU_CASE, _HU_CASE_OTHER, _HU_CASE_SPECIAL,
                             _HU_DIGRAPHS, _HU_DOUBLES, _HU_FACTIVE,
                             _HU_INSTRUM, _HU_OWNED, _HU_PLUR_OWNER,
                             _HU_PLURAL, _HU_SING_OWNER)
    v = "aeiouáéíóöúüőű"
    two = ", ".join(f"'{d}'" for d in sorted(_HU_DIGRAPHS) if len(d) == 2)

    def sub_case(table, acts: dict) -> str:
        whens = []
        for sfx, act in table:
            k = len(sfx)
            cut = f"substr(word, 1, length(word)-{k})"
            rep = acts[act]
            new = f"{cut} || '{rep}'" if rep else cut
            whens.append(
                f"    WHEN length(word) >= {k} AND "
                f"ends_with(word, '{sfx}') "
                f"THEN CASE WHEN length(word) - {k} >= p1 "
                f"THEN {new} ELSE word END")
        return "CASE\n" + "\n".join(whens) + "\n    ELSE word END"

    def doubled_case(table) -> str:
        # delete the suffix, then drop the second-to-last char of the
        # head (r_instrum / r_factive: r_double then r_undouble)
        whens = []
        for sfx, act in table:
            k = len(sfx)
            head = f"substr(word, 1, length(word)-{k})"
            dbl = " OR ".join(f"ends_with({head}, '{d}')"
                              for d in _HU_DOUBLES)
            new = (f"substr(word, 1, length(word)-{k + 2}) "
                   f"|| substr(word, length(word)-{k}, 1)")
            whens.append(
                f"    WHEN length(word) >= {k} AND "
                f"ends_with(word, '{sfx}') "
                f"THEN CASE WHEN length(word) - {k} >= p1 AND ({dbl}) "
                f"THEN {new} ELSE word END")
        return "CASE\n" + "\n".join(whens) + "\n    ELSE word END"

    def case_flag(table) -> tuple[str, str]:
        w_whens, f_whens = [], []
        for sfx, act in table:
            k = len(sfx)
            base = (f"length(word) >= {k} AND ends_with(word, '{sfx}')")
            gate = f"length(word) - {k} >= p1"
            cut = f"substr(word, 1, length(word)-{k})"
            w_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN {cut} ELSE word END")
            f_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN 1 ELSE 0 END")
        return ("CASE\n" + "\n".join(w_whens) + "\n    ELSE word END",
                "CASE\n" + "\n".join(f_whens) + "\n    ELSE 0 END")

    case_word, case_done = case_flag(_HU_CASE)
    instrum = doubled_case(_HU_INSTRUM)
    factive = doubled_case(_HU_FACTIVE)
    special = sub_case(_HU_CASE_SPECIAL, {1: "e", 2: "a"})
    other = sub_case(_HU_CASE_OTHER, {1: None, 2: "a", 3: "e"})
    owned = sub_case(_HU_OWNED, {1: None, 2: "e", 3: "a"})
    sing = sub_case(_HU_SING_OWNER, {1: None, 2: "a", 3: "e"})
    plur = sub_case(_HU_PLUR_OWNER, {1: None, 2: "a", 3: "e"})
    plural = sub_case(_HU_PLURAL, {1: "a", 2: "e", 3: None})
    return f"""{_sb_words_cte()}, wl AS (
  SELECT d, word, length(regexp_extract(word, '^[{v}]+', 0)) AS lv
  FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, CASE
    WHEN lv > 0 THEN
      CASE WHEN lv >= length(word) THEN length(word)
           WHEN substr(word, lv + 1, 3) = 'dzs' THEN lv + 3
           WHEN substr(word, lv + 1, 2) IN ({two}) THEN lv + 2
           ELSE lv + 1 END
    ELSE CASE WHEN regexp_matches(word, '^[^{v}]+[{v}]')
         THEN length(regexp_extract(word, '^[^{v}]+[{v}]', 0))
         ELSE length(word) END END AS p1
  FROM wl
), s1 AS (
  SELECT d, p1, {instrum} AS word FROM w
), s2 AS (
  SELECT d, p1, {case_word} AS w2, {case_done} AS done FROM s1
), s3 AS (
  SELECT d, p1, CASE WHEN done = 1 AND length(w2) - 1 >= p1
    AND right(w2, 1) IN ('á', 'é')
    THEN substr(w2, 1, length(w2)-1)
         || CASE WHEN right(w2, 1) = 'á' THEN 'a' ELSE 'e' END
    ELSE w2 END AS word
  FROM s2
), s4 AS (
  SELECT d, p1, {special} AS word FROM s3
), s5 AS (
  SELECT d, p1, {other} AS word FROM s4
), s6 AS (
  SELECT d, p1, {factive} AS word FROM s5
), s7 AS (
  SELECT d, p1, {owned} AS word FROM s6
), s8 AS (
  SELECT d, p1, {sing} AS word FROM s7
), s9 AS (
  SELECT d, p1, {plur} AS word FROM s8
), fin AS (
  SELECT d, {plural} AS term FROM s9
)
{_RSLP_TAIL}"""


def _sb_pv_spanish_expr(col: str, v: str) -> str:
    """Spanish-style RV (snowball2._pv_spanish) as SQL."""
    scan_vowel = (f"CASE WHEN regexp_matches(substr({col}, 3), "
                  f"'^[^{v}]*[{v}]') THEN 2 + length(regexp_extract("
                  f"substr({col}, 3), '^[^{v}]*[{v}]', 0)) "
                  f"ELSE length({col}) END")
    scan_nonvowel = (f"CASE WHEN regexp_matches(substr({col}, 3), "
                     f"'^[{v}]*[^{v}]') THEN 2 + length(regexp_extract("
                     f"substr({col}, 3), '^[{v}]*[^{v}]', 0)) "
                     f"ELSE length({col}) END")
    first = f"substr({col}, 1, 1)"
    second = f"substr({col}, 2, 1)"
    vs = ", ".join(f"'{c}'" for c in sorted(v))
    return (f"CASE WHEN length({col}) < 2 THEN length({col}) "
            f"WHEN {first} IN ({vs}) THEN "
            f"CASE WHEN {second} IN ({vs}) THEN {scan_nonvowel} "
            f"ELSE {scan_vowel} END "
            f"WHEN {second} NOT IN ({vs}) THEN {scan_vowel} "
            f"WHEN length({col}) >= 3 THEN 3 ELSE length({col}) END")


def ft_snowball_basque(sf_dir: str) -> pa.Table:
    """SnowballFilter(Basque) (snowball/ext/BasqueStemmer.java:13, the
    eu/BasqueAnalyzer.java:119 default stemmer)."""
    from ..snowball2 import basque_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [basque_stem(w) for w in _words(tx)])


def oracle_snowball_basque_sql() -> str:
    """Replays the inward-cursor repeat semantics: the recursive CTE
    threads (word, pos, phase) exactly like basque_stem's ``pos`` —
    aditzak repeats (phase 0), izenak repeats (phase 1), adjetiboak
    once (phase 2), done (phase 3)."""
    from ..snowball2 import (_EU_ADITZAK, _EU_ADITZAK_SUB, _EU_ADJ,
                             _EU_IZENAK, _EU_IZENAK_SUB)
    v = "aeiou"

    def phase_exprs(table, subs, regions):
        a_w, w_w, p_w = [], [], []
        for sfx, act in table:
            k = len(sfx)
            base = (f"pos >= {k} AND "
                    f"substr(word, pos-{k}+1, {k}) = '{sfx}'")
            if act in subs:
                rep = subs[act]
                a_w.append(f"    WHEN {base} THEN 1")
                w_w.append(f"    WHEN {base} THEN substr(word,1,pos-{k})"
                           f" || '{rep}' || substr(word,pos+1)")
                p_w.append(f"    WHEN {base} THEN pos-{k}")
            else:
                reg = regions[act]
                gate = f"pos-{k} >= {reg}"
                a_w.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN 1 ELSE 0 END")
                w_w.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN substr(word,1,pos-{k}) || "
                           f"substr(word,pos+1) ELSE word END")
                p_w.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN pos-{k} ELSE pos END")
        mk = lambda ws, dflt: "CASE\n" + "\n".join(ws) + f"\n    ELSE {dflt} END"
        return mk(a_w, "0"), mk(w_w, "word"), mk(p_w, "pos")

    a0, w0c, p0c = phase_exprs(_EU_ADITZAK, _EU_ADITZAK_SUB,
                               {1: "pv", 2: "p2"})
    a1, w1c, p1c = phase_exprs(_EU_IZENAK, _EU_IZENAK_SUB,
                               {1: "pv", 2: "p2", 4: "p1"})
    _, w2c, p2c = phase_exprs(_EU_ADJ, {2: "z"}, {1: "pv"})
    return f"""WITH RECURSIVE w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), w AS (
  SELECT d, word, length(word) AS pos, 0 AS ph,
         {_sb_pv_spanish_expr('word', v)} AS pv,
         {_sb_p_std('word', v)} AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM w0 WHERE word <> ''
), rec AS (
  SELECT d, word, pos, ph, pv, p1, p2 FROM w
  UNION ALL
  SELECT d,
    CASE ph WHEN 0 THEN {w0c} WHEN 1 THEN {w1c} ELSE {w2c} END,
    CASE ph WHEN 0 THEN {p0c} WHEN 1 THEN {p1c} ELSE {p2c} END,
    CASE WHEN ph = 0 AND ({a0}) = 1 THEN 0
         WHEN ph = 0 THEN 1
         WHEN ph = 1 AND ({a1}) = 1 THEN 1
         WHEN ph = 1 THEN 2
         ELSE 3 END,
    pv, p1, p2
  FROM rec WHERE ph < 3
), fin AS (
  SELECT d, word AS term FROM rec WHERE ph = 3
)
{_RSLP_TAIL}"""


def ft_snowball_romanian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Romanian) (snowball/ext/RomanianStemmer.java:13,
    the ro/RomanianAnalyzer.java:128 default stemmer)."""
    from ..snowball2 import romanian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [romanian_stem(w) for w in _words(tx)])


def oracle_snowball_romanian_sql() -> str:
    """The u/i-between-vowels protection replays the reference's
    left-to-right single-step scan as a per-position recursive CTE;
    the combo-suffix loop is a fixpoint CTE (every substitution
    strictly shrinks the word, so it terminates)."""
    from ..snowball2 import (_RO_COMBO, _RO_COMBO_SUB, _RO_STD,
                             _RO_STEP0, _RO_STEP0_SUB, _RO_VERB,
                             _RO_VOWEL)
    v = "aeiouâîă"
    vs = ", ".join(f"'{c}'" for c in sorted(v))

    # step 0: R1-gated substitutions, act 5 blocked after 'ab'
    s0_whens = []
    for sfx, act in _RO_STEP0:
        k = len(sfx)
        cut = f"substr(word, 1, length(word)-{k})"
        if act == 1:
            new = cut
        else:
            new = f"{cut} || '{_RO_STEP0_SUB[act]}'"
        gate = f"length(word) - {k} >= p1"
        if act == 5:
            gate += f" AND NOT ends_with({cut}, 'ab')"
            new = (f"CASE WHEN ends_with({cut}, 'ab') THEN word "
                   f"ELSE {new} END")
        s0_whens.append(
            f"    WHEN length(word) >= {k} AND ends_with(word, '{sfx}') "
            f"THEN CASE WHEN length(word) - {k} >= p1 "
            f"THEN {new} ELSE word END")
    step0 = "CASE\n" + "\n".join(s0_whens) + "\n    ELSE word END"

    # combo loop: applied flag + new word (substitutions, R1-gated)
    ca_whens, cw_whens = [], []
    for sfx, act in _RO_COMBO:
        k = len(sfx)
        base = f"length(word) >= {k} AND ends_with(word, '{sfx}')"
        gate = f"length(word) - {k} >= p1"
        new = (f"substr(word, 1, length(word)-{k}) "
               f"|| '{_RO_COMBO_SUB[act]}'")
        ca_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                        f"THEN 1 ELSE 0 END")
        cw_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                        f"THEN {new} ELSE word END")
    combo_a = "CASE\n" + "\n".join(ca_whens) + "\n    ELSE 0 END"
    combo_w = "CASE\n" + "\n".join(cw_whens) + "\n    ELSE word END"

    # standard a_4 pass: R2 post-gate; act 2 pulls the ț in
    sw_whens, sf_whens = [], []
    for sfx, act in _RO_STD:
        k = len(sfx)
        base = f"length(word) >= {k} AND ends_with(word, '{sfx}')"
        cut = f"substr(word, 1, length(word)-{k})"
        gate = f"length(word) - {k} >= p2"
        if act == 1:
            new, extra = cut, ""
        elif act == 2:
            new = f"substr(word, 1, length(word)-{k + 1}) || 't'"
            extra = f" AND ends_with({cut}, 'ț')"
        else:
            new, extra = f"{cut} || 'ist'", ""
        sw_whens.append(f"    WHEN {base} THEN CASE WHEN {gate}{extra} "
                        f"THEN {new} ELSE word END")
        sf_whens.append(f"    WHEN {base} THEN CASE WHEN {gate}{extra} "
                        f"THEN 1 ELSE 0 END")
    std_w = "CASE\n" + "\n".join(sw_whens) + "\n    ELSE word END"
    std_f = "CASE\n" + "\n".join(sf_whens) + "\n    ELSE 0 END"

    # verb: match RESTRICTED to RV; act 1 needs non-vowel-or-u before
    def verb_gate(sfx, act, k):
        if act == 2:
            return str(k)
        prev = f"substr(word, length(word)-{k}, 1)"
        return (f"CASE WHEN length(word) - {k + 1} >= pv AND "
                f"({prev} NOT IN ({vs}) OR {prev} = 'u') "
                f"THEN {k} ELSE 0 END")

    verb = _sb_del_case("word", _RO_VERB, "pv", verb_gate)
    vowel = _sb_del_acts("word", _RO_VOWEL, {act: "pv"
                                             for _, act in _RO_VOWEL})
    return f"""WITH RECURSIVE w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), wn AS (
  SELECT d, replace(replace(word, 'ş', 'ș'), 'ţ', 'ț') AS word
  FROM w0 WHERE word <> ''
), prec AS (
  SELECT d, word, 1 AS i FROM wn
  UNION ALL
  SELECT d,
    CASE WHEN substr(word, i, 1) IN ({vs})
          AND substr(word, i+1, 1) IN ('u', 'i')
          AND substr(word, i+2, 1) IN ({vs})
         THEN substr(word, 1, i) || upper(substr(word, i+1, 1))
              || substr(word, i+2)
         ELSE word END,
    i + 1
  FROM prec WHERE i <= length(word) - 2
), wp AS (
  SELECT d, word FROM prec
  WHERE i = CASE WHEN length(word) >= 3 THEN length(word) - 1
                 ELSE 1 END
), w AS (
  SELECT d, word, {_sb_pv_spanish_expr('word', v)} AS pv,
         {_sb_p_std('word', v)} AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM wp
), s0 AS (
  SELECT d, pv, p1, p2, {step0} AS word, 0 AS rm FROM w
), rec AS (
  SELECT d, pv, p1, p2, word, rm FROM s0
  UNION ALL
  SELECT d, pv, p1, p2, {combo_w} AS word, 1 AS rm
  FROM rec WHERE ({combo_a}) = 1
), s1 AS (
  SELECT d, pv, p1, p2, word, rm FROM rec WHERE ({combo_a}) = 0
), s2 AS (
  SELECT d, pv, {std_w} AS word,
         CASE WHEN rm = 1 OR ({std_f}) = 1 THEN 1 ELSE 0 END AS rm
  FROM s1
), s3 AS (
  SELECT d, pv, CASE WHEN rm = 1 THEN word
    ELSE substr(word, 1, length(word) - ({verb})) END AS word
  FROM s2
), g4 AS (
  SELECT d, {vowel} AS dl, word FROM s3
), fin AS (
  SELECT d, translate(substr(word, 1, length(word) - dl), 'IU', 'iu')
         AS term
  FROM g4
)
{_RSLP_TAIL}"""


def ft_snowball_serbian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Serbian) (snowball/ext/SerbianStemmer.java:13,
    the sr/SerbianAnalyzer.java:133 default stemmer, pre-normalize)."""
    from ..snowball2 import serbian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [serbian_stem(w) for w in _words(tx)])


def oracle_snowball_serbian_sql() -> str:
    """The ije/je folds replay the reference's never-revisit scan as
    per-position recursive CTEs (a global regexp_replace would both
    miss consonant-sharing chains and over-fold re-exposed ones)."""
    from ..snowball2 import _SR_CYR, _SR_STEP1, _SR_STEP2, _SR_STEP3
    from ..snowball2_sub_data import SERBIAN_STEP1, SERBIAN_STEP2
    ca = "bcdfghjklmnprstvzćčđšž"
    cas = ", ".join(f"'{c}'" for c in sorted(ca))
    translit = "word"
    for cy, la in _SR_CYR.items():
        translit = f"replace({translit}, '{cy}', '{la}')"

    def step_case(table, subs, gated: bool):
        w_whens, f_whens = [], []
        for sfx, act in table:
            k = len(sfx)
            rep, nd = subs[act]
            base = f"length(word) >= {k} AND ends_with(word, '{sfx}')"
            conds = []
            if gated:
                conds.append(f"length(word) - {k} >= p1")
            if nd:
                conds.append("nd = 1")
            gate = " AND ".join(conds) if conds else "TRUE"
            new = f"substr(word, 1, length(word)-{k})"
            if rep:
                new = f"{new} || '{rep}'"
            w_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN {new} ELSE word END")
            f_whens.append(f"    WHEN {base} THEN CASE WHEN {gate} "
                           f"THEN 1 ELSE 0 END")
        return ("CASE\n" + "\n".join(w_whens) + "\n    ELSE word END",
                "CASE\n" + "\n".join(f_whens) + "\n    ELSE 0 END")

    s1_w, _ = step_case(_SR_STEP1, SERBIAN_STEP1, gated=False)
    s2_w, s2_f = step_case(_SR_STEP2, SERBIAN_STEP2, gated=True)
    s3 = _sb_del_acts("word", _SR_STEP3, {1: "p1"})
    v = "aeiou"
    return f"""WITH RECURSIVE w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), wt AS (
  SELECT d, {translit} AS word FROM w0 WHERE word <> ''
), rije AS (
  SELECT d, word, 1 AS i FROM wt
  UNION ALL
  SELECT d,
    CASE WHEN substr(word, i, 1) IN ({cas})
          AND substr(word, i+1, 3) = 'ije'
          AND substr(word, i+4, 1) IN ({cas})
         THEN substr(word, 1, i) || 'e' || substr(word, i+4)
         ELSE word END,
    i + 1
  FROM rije WHERE i <= length(word) - 4
), wije AS (
  SELECT d, word FROM rije WHERE i > length(word) - 4
), rje AS (
  SELECT d, word, 1 AS i FROM wije
  UNION ALL
  SELECT d,
    CASE WHEN substr(word, i, 1) IN ({cas})
          AND substr(word, i+1, 2) = 'je'
          AND substr(word, i+3, 1) IN ({cas})
         THEN substr(word, 1, i) || 'e' || substr(word, i+3)
         ELSE word END,
    i + 1
  FROM rje WHERE i <= length(word) - 3
), wje AS (
  SELECT d, word FROM rje WHERE i > length(word) - 3
), wp AS (
  SELECT d, replace(word, 'dj', 'đ') AS word FROM wje
), w AS (
  SELECT d, word,
    CASE WHEN regexp_matches(word, '[ćčđšž]') THEN 0 ELSE 1 END AS nd,
    CASE WHEN NOT regexp_matches(word, '[{v}]') THEN length(word)
         WHEN length(regexp_extract(word, '^[^{v}]*[{v}]', 0)) >= 2
           THEN length(regexp_extract(word, '^[^{v}]*[{v}]', 0))
         WHEN regexp_matches(word, '^[{v}]+[^{v}]')
           THEN length(regexp_extract(word, '^[{v}]+[^{v}]', 0))
         ELSE 1 END AS p1v,
    CASE WHEN strpos(word, 'r') = 0 THEN NULL
         WHEN strpos(word, 'r') >= 2 THEN strpos(word, 'r')
         WHEN regexp_matches(word, '^r+[^r]')
           THEN length(regexp_extract(word, '^r+', 0)) + 1
         ELSE NULL END AS rc
  FROM wp
), wr AS (
  SELECT d, word, nd,
         CASE WHEN rc IS NOT NULL AND p1v - rc > 1 THEN rc
              ELSE p1v END AS p1
  FROM w
), s1 AS (
  SELECT d, nd, p1, {s1_w} AS word FROM wr
), s2 AS (
  SELECT d, nd, p1, {s2_w} AS w2, {s2_f} AS done, word FROM s1
), fin AS (
  SELECT d, CASE WHEN done = 1 THEN w2
    ELSE substr(word, 1, length(word) - ({s3})) END AS term
  FROM s2
)
{_RSLP_TAIL}"""


def ft_snowball_finnish(sf_dir: str) -> pa.Table:
    """SnowballFilter(Finnish) (snowball/ext/FinnishStemmer.java:13,
    the fi/FinnishAnalyzer.java:122 default stemmer)."""
    from ..snowball2 import finnish_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [finnish_stem(w) for w in _words(tx)])


def oracle_snowball_finnish_sql() -> str:
    from ..snowball2 import (_FI_A0, _FI_A1, _FI_A2, _FI_A3, _FI_A4,
                             _FI_A6, _FI_A7, _FI_A8, _FI_A9,
                             _FI_CASE_VOWEL, _FI_LONGV)
    v = "aeiouyäö"
    v2 = "aeiouäö"
    aei = "aeiä"
    cons = "bcdfghjklmnpqrstvwxz"
    cs = ", ".join(f"'{c}'" for c in sorted(cons))
    pend = ", ".join(f"'{c}'" for c in sorted("aeinotuyäö"))
    longv = ", ".join(f"'{x}'" for x in _FI_LONGV)

    def particle_gate(sfx, act, k):
        if act == 1:
            return (f"CASE WHEN length(word) >= {k + 1} AND "
                    f"substr(word, length(word)-{k}, 1) IN ({pend}) "
                    f"THEN {k} ELSE 0 END")
        return (f"CASE WHEN length(word) - {k} >= p2 "
                f"THEN {k} ELSE 0 END")

    particle = _sb_del_case("word", _FI_A0, "p1", particle_gate)

    def ends_any(cut, table):
        return " OR ".join(f"ends_with({cut}, '{s}')"
                           for s, _ in table)

    p_whens = []
    for sfx, act in _FI_A4:
        k = len(sfx)
        cut = f"substr(word, 1, length(word)-{k})"
        base = (f"length(word) - {k} >= p1 AND "
                f"ends_with(word, '{sfx}')")
        if act == 1:
            new = (f"CASE WHEN ends_with({cut}, 'k') THEN word "
                   f"ELSE {cut} END")
        elif act == 2:
            new = (f"CASE WHEN ends_with({cut}, 'kse') "
                   f"THEN substr(word, 1, length(word)-{k + 1}) || 'i' "
                   f"ELSE {cut} END")
        elif act == 3:
            new = cut
        else:
            table = {4: _FI_A1, 5: _FI_A2, 6: _FI_A3}[act]
            new = (f"CASE WHEN {ends_any(cut, table)} THEN {cut} "
                   f"ELSE word END")
        p_whens.append(f"    WHEN {base} THEN {new}")
    possessive = "CASE\n" + "\n".join(p_whens) + "\n    ELSE word END"

    def act7_expr(k):
        pair = f"substr(word, length(word)-{k + 1}, 2)"
        return (f"CASE WHEN length(word) - {k} >= 2 AND "
                f"({pair} IN ({longv}) OR {pair} = 'ie') "
                f"THEN {k + 1} ELSE {k} END")

    c_whens = []
    for row in _FI_A6:
        sfx, act = row[0], row[1]
        k = len(sfx)
        base = (f"length(word) - {k} >= p1 AND "
                f"ends_with(word, '{sfx}')")
        cut = f"substr(word, 1, length(word)-{k})"
        if len(row) > 2:
            pair = f"substr(word, length(word)-{k + 1}, 2)"
            if row[2] == "r_LONG":
                cond = (f"length(word) - {k} - 2 >= p1 AND "
                        f"{pair} IN ({longv})")
            else:
                cond = (f"length(word) - {k} - 2 >= p1 AND "
                        f"substr(word, length(word)-{k}, 1) = 'i' AND "
                        f"substr(word, length(word)-{k + 1}, 1) "
                        f"IN ({', '.join(repr(c) for c in sorted(v2))})")
            then = f"CASE WHEN {cond} THEN {k} ELSE {act7_expr(1)} END"
        elif act == -1:
            then = str(k)
        elif act in _FI_CASE_VOWEL:
            then = (f"CASE WHEN ends_with({cut}, "
                    f"'{_FI_CASE_VOWEL[act]}') THEN {k} ELSE 0 END")
        elif act == 7:
            then = act7_expr(k)
        else:                           # act 8: vowel after consonant
            then = (f"CASE WHEN length(word) - {k} >= 2 AND "
                    f"substr(word, length(word)-{k}, 1) IN "
                    f"({', '.join(repr(c) for c in sorted(v))}) AND "
                    f"substr(word, length(word)-{k + 1}, 1) IN ({cs}) "
                    f"THEN {k} ELSE 0 END")
        c_whens.append(f"    WHEN {base} THEN {then}")
    case_dl = "CASE\n" + "\n".join(c_whens) + "\n    ELSE 0 END"

    def po_gate(sfx, act, k):
        if act != 1:
            return str(k)
        return (f"CASE WHEN ends_with(substr(word, 1, "
                f"length(word)-{k}), 'po') THEN 0 ELSE {k} END")

    other = _sb_del_case("word", _FI_A7, "p2", po_gate)
    iplural = _sb_del_case("word", _FI_A8, "p1")
    a9 = _sb_del_case("word", _FI_A9, "p2", po_gate)
    vset = ", ".join(repr(c) for c in sorted(v))
    return f"""{_sb_words_cte()}, w AS (
  SELECT d, word, {_sb_p_std('word', v)} AS p1,
         {_sb_p_std('word', v, True)} AS p2
  FROM w0 WHERE word <> ''
), g1 AS (
  SELECT d, p1, p2, {particle} AS dl, word FROM w
), s1 AS (
  SELECT d, p1, p2, substr(word, 1, length(word) - dl) AS word FROM g1
), s2 AS (
  SELECT d, p1, p2, {possessive} AS word FROM s1
), g2 AS (
  SELECT d, p1, p2, {case_dl} AS dl, word FROM s2
), s3 AS (
  SELECT d, p1, p2, CASE WHEN dl > 0 THEN 1 ELSE 0 END AS rm,
         substr(word, 1, length(word) - dl) AS word
  FROM g2
), g3 AS (
  SELECT d, p1, p2, rm, {other} AS dl, word FROM s3
), s4 AS (
  SELECT d, p1, p2, rm, substr(word, 1, length(word) - dl) AS word
  FROM g3
), s5 AS (
  SELECT d, p1, p2, rm,
    CASE WHEN rm = 0 AND length(word) >= 2 AND ends_with(word, 't')
         AND length(word) - 2 >= p1
         AND substr(word, length(word)-1, 1) IN ({vset})
      THEN 1 ELSE 0 END AS tdel,
    CASE
    WHEN rm = 1 THEN
      substr(word, 1, length(word) - ({iplural}))
    WHEN length(word) >= 2 AND ends_with(word, 't')
         AND length(word) - 2 >= p1
         AND substr(word, length(word)-1, 1) IN ({vset})
      THEN substr(word, 1, length(word)-1)
    ELSE word END AS word
  FROM s4
), s6 AS (
  SELECT d, p1, CASE WHEN tdel = 1
    THEN substr(word, 1, length(word) - ({a9}))
    ELSE word END AS word
  FROM s5
), t1 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1
    AND right(word, 2) IN ({longv})
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM s6
), t2 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1
    AND right(word, 1) IN ({', '.join(repr(c) for c in sorted(aei))})
    AND substr(word, length(word)-1, 1) IN ({cs})
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM t1
), t3 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1
    AND (ends_with(word, 'oj') OR ends_with(word, 'uj'))
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM t2
), t4 AS (
  SELECT d, p1, CASE WHEN length(word) - 2 >= p1
    AND ends_with(word, 'jo')
    THEN substr(word, 1, length(word)-1) ELSE word END AS word
  FROM t3
), fin AS (
  SELECT d, CASE WHEN qq >= 2
    AND substr(word, qq, 1) IN ({cs})
    AND substr(word, qq-1, 1) = substr(word, qq, 1)
    THEN substr(word, 1, qq-1) || substr(word, qq+1)
    ELSE word END AS term
  FROM (SELECT d, word, length(word) -
               length(regexp_extract(word, '[{v}]*$', 0)) AS qq
        FROM t4) uu
)
{_RSLP_TAIL}"""


def ft_snowball_estonian(sf_dir: str) -> pa.Table:
    """SnowballFilter(Estonian) (snowball/ext/EstonianStemmer.java:13,
    the et/EstonianAnalyzer.java:136 default stemmer)."""
    from ..snowball2 import estonian_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [estonian_stem(w) for w in _words(tx)])


def oracle_snowball_estonian_sql() -> str:
    from ..snowball2 import (_ET_CASE, _ET_DEGREES, _ET_EMPHASIS,
                             _ET_EXC, _ET_GI, _ET_IPLURAL, _ET_KI,
                             _ET_LONGV, _ET_NU, _ET_PLUR3, _ET_SPECIAL,
                             _ET_SPECIAL_SUB, _ET_VERB)
    v1 = "aeiouäõöü"
    rv = "aeiou"
    rvs = ", ".join(repr(c) for c in sorted(rv))
    gis = ", ".join(repr(c) for c in sorted(_ET_GI))
    kis = ", ".join(repr(c) for c in sorted(_ET_KI))
    longv = ", ".join(f"'{x}'" for x in _ET_LONGV)
    exc_whens = "\n".join(
        f"    WHEN word = '{w}' THEN '{r}'"
        for w, r in sorted(_ET_EXC.items()))
    exc = f"CASE\n{exc_whens}\n    ELSE NULL END"

    def lv(cut):
        return f"right({cut}, 2) IN ({longv})"

    def emph_gate(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        prev = f"substr(word, length(word)-{k}, 1)"
        if act == 1:
            cond = (f"length(word) - {k} >= 4 AND {prev} IN ({gis}) "
                    f"AND NOT ({lv(cut)})")
        else:
            cond = f"length(word) - {k} >= 4 AND {prev} IN ({kis})"
        return f"CASE WHEN {cond} THEN {k} ELSE 0 END"

    emphasis = _sb_del_case("word", _ET_EMPHASIS, "p1", emph_gate)

    vb_w, vb_f = [], []
    for sfx, act in _ET_VERB:
        k = len(sfx)
        base = (f"length(word) - {k} >= p1 AND "
                f"ends_with(word, '{sfx}')")
        cut = f"substr(word, 1, length(word)-{k})"
        prev = f"substr(word, length(word)-{k}, 1)"
        if act == 1:
            new, flag = cut, "1"
        elif act == 2:
            new, flag = f"{cut} || 'a'", "1"
        else:
            g = f"{prev} IN ({', '.join(repr(c) for c in sorted(v1))})"
            new = f"CASE WHEN {g} THEN {cut} ELSE word END"
            flag = f"CASE WHEN {g} THEN 1 ELSE 0 END"
        vb_w.append(f"    WHEN {base} THEN {new}")
        vb_f.append(f"    WHEN {base} THEN {flag}")
    verb_w = "CASE\n" + "\n".join(vb_w) + "\n    ELSE word END"
    verb_f = "CASE\n" + "\n".join(vb_f) + "\n    ELSE 0 END"

    sp_whens = []
    for sfx, act in _ET_SPECIAL:
        k = len(sfx)
        sp_whens.append(
            f"    WHEN length(word) - {k} >= p1 AND "
            f"ends_with(word, '{sfx}') "
            f"THEN substr(word, 1, length(word)-{k}) "
            f"|| '{_ET_SPECIAL_SUB[act]}'")
    special = "CASE\n" + "\n".join(sp_whens) + "\n    ELSE word END"

    def case_gate(sfx, act, k):
        cut = f"substr(word, 1, length(word)-{k})"
        prev = f"substr(word, length(word)-{k}, 1)"
        if act == 1:
            cond = (f"length(word) >= {k + 1} AND "
                    f"({prev} IN ({rvs}) OR {lv(cut)})")
        else:
            cond = f"length(word) - {k} >= 4"
        return f"CASE WHEN {cond} THEN {k} ELSE 0 END"

    case_e = _sb_del_case("word", _ET_CASE, "p1", case_gate)

    p3_whens = []
    for sfx, act in _ET_PLUR3:
        k = len(sfx)
        base = (f"length(word) - {k} >= p1 AND "
                f"ends_with(word, '{sfx}')")
        cut = f"substr(word, 1, length(word)-{k})"
        prev = f"substr(word, length(word)-{k}, 1)"
        if act == 1:
            new = f"{cut} || 'iku'"
        elif act == 2:
            new = f"CASE WHEN {lv(cut)} THEN word ELSE {cut} END"
        elif act == 3:
            classify = (f"CASE WHEN ends_with({cut}, 'las') "
                        f"OR ends_with({cut}, 'lis') "
                        f"OR ends_with({cut}, 'mis') "
                        f"THEN {cut} || 'e' "
                        f"WHEN ends_with({cut}, 't') THEN word "
                        f"ELSE {cut} END")
            new = (f"CASE WHEN length(word) - {k} >= 4 "
                   f"THEN {classify} ELSE {cut} || 't' END")
        else:
            new = (f"CASE WHEN (length(word) >= {k + 1} AND "
                   f"{prev} IN ({rvs})) OR {lv(cut)} "
                   f"THEN {cut} ELSE word END")
        p3_whens.append(f"    WHEN {base} THEN {new}")
    plur3 = "CASE\n" + "\n".join(p3_whens) + "\n    ELSE word END"

    def deg_gate(sfx, act, k):
        if act == 2:
            return str(k)
        prev = f"substr(word, length(word)-{k}, 1)"
        return (f"CASE WHEN length(word) >= {k + 1} AND "
                f"{prev} IN ({rvs}) THEN {k} ELSE 0 END")

    degrees = _sb_del_case("word", _ET_DEGREES, "p1", deg_gate)

    def ipl_gate(sfx, act, k):
        prev = f"substr(word, length(word)-{k}, 1)"
        return (f"CASE WHEN length(word) >= {k + 1} AND "
                f"{prev} IN ({rvs}) THEN {k} ELSE 0 END")

    iplural = _sb_del_case("word", _ET_IPLURAL, "p1", ipl_gate)
    nu = _sb_del_case("word", _ET_NU, "p1")
    return f"""{_sb_words_cte()}, we AS (
  SELECT d, word, {exc} AS exc FROM w0 WHERE word <> ''
), w AS (
  SELECT d, word, exc, {_sb_p_std('word', v1)} AS p1 FROM we
), g1 AS (
  SELECT d, exc, p1, {emphasis} AS dl, word FROM w
), s1 AS (
  SELECT d, exc, p1, substr(word, 1, length(word) - dl) AS word FROM g1
), s2 AS (
  SELECT d, exc, p1, {verb_w} AS w2, {verb_f} AS vb, word FROM s1
), s3 AS (
  SELECT d, exc, p1, vb, CASE WHEN vb = 1 THEN w2 ELSE word END AS word
  FROM s2
), n1 AS (
  SELECT d, exc, p1, vb,
         CASE WHEN vb = 1 THEN word ELSE {special} END AS word FROM s3
), n2 AS (
  SELECT d, exc, p1, vb, CASE WHEN vb = 1 THEN word
    ELSE substr(word, 1, length(word) - ({case_e})) END AS word
  FROM n1
), n3 AS (
  SELECT d, exc, p1, vb,
         CASE WHEN vb = 1 THEN word ELSE {plur3} END AS word FROM n2
), n4 AS (
  SELECT d, exc, p1, vb, CASE WHEN vb = 1 THEN word
    ELSE substr(word, 1, length(word) - ({degrees})) END AS word
  FROM n3
), n5 AS (
  SELECT d, exc, p1, vb, CASE WHEN vb = 1 THEN word
    ELSE substr(word, 1, length(word) - ({iplural})) END AS word
  FROM n4
), n6 AS (
  SELECT d, exc, p1, CASE WHEN vb = 1 THEN word
    ELSE substr(word, 1, length(word) - ({nu})) END AS word
  FROM n5
), fin AS (
  SELECT d, CASE WHEN exc IS NOT NULL THEN exc
    WHEN length(word) >= 1
     AND right(word, 1) IN ({', '.join(repr(c) for c in sorted(v1))})
     AND length(word) - 1 >= p1
     AND substr(word, length(word)-2, 2) IN ('kk', 'pp', 'tt')
     AND length(word) >= 3
    THEN substr(word, 1, length(word)-2) || right(word, 1)
    ELSE word END AS term
  FROM n6
)
{_RSLP_TAIL}"""


_NE_PLANT_FROM = "abcdefghijklmnopqrstuvwxyz"
_NE_PLANT_TO = "ाबछदेफगहिजकलमनोपँरसथुवभैयश"


def ft_snowball_nepali(sf_dir: str) -> pa.Table:
    """SnowballFilter(Nepali) (snowball/ext/NepaliStemmer.java:13, the
    ne/NepaliAnalyzer.java:133 default stemmer): planted Devanagari via
    per-char transliteration so the postposition class (-ka/-le/-ma/-ko
    -> का/ले/मा/को), the verb class (-c/-ne/-da -> छ/ने/दा) and the
    repeat loop all fire on the corpus."""
    from ..snowball2 import nepali_stem
    plant = str.maketrans(_NE_PLANT_FROM, _NE_PLANT_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [nepali_stem(w.translate(plant))
                       for w in _words(tx)])


def oracle_snowball_nepali_sql() -> str:
    from ..snowball2 import _NE_CAT1, _NE_CAT2, _NE_CAT3

    def cat1_case() -> str:
        whens = []
        for sfx, act in _NE_CAT1:
            k = len(sfx)
            cut = f"substr(word, 1, length(word)-{k})"
            if act == 1:
                new = cut
            else:
                new = (f"CASE WHEN ends_with({cut}, 'ए') "
                       f"OR ends_with({cut}, 'े') THEN word "
                       f"ELSE {cut} END")
            whens.append(f"    WHEN length(word) >= {k} AND "
                         f"ends_with(word, '{sfx}') THEN {new}")
        return "CASE\n" + "\n".join(whens) + "\n    ELSE word END"

    def cat2_case(col: str) -> str:
        whens = []
        for sfx, act in _NE_CAT2:
            k = len(sfx)
            cut = f"substr({col}, 1, length({col})-{k})"
            if act == 1:
                g = (f"right({cut}, 2) IN ('यौ', 'छौ', 'नौ', 'थे')")
            else:
                g = f"ends_with({cut}, 'त्र')"
            whens.append(f"    WHEN length({col}) >= {k} AND "
                         f"ends_with({col}, '{sfx}') "
                         f"THEN CASE WHEN {g} THEN {cut} "
                         f"ELSE {col} END")
        return "CASE\n" + "\n".join(whens) + f"\n    ELSE {col} END"

    def cat3_dl(col: str) -> str:
        whens = []
        for sfx, _ in sorted(_NE_CAT3, key=lambda t: -len(t[0])):
            k = len(sfx)
            whens.append(f"    WHEN length({col}) >= {k} AND "
                         f"ends_with({col}, '{sfx}') THEN {k}")
        return "CASE\n" + "\n".join(whens) + "\n    ELSE 0 END"

    return f"""WITH RECURSIVE w0 AS (
  SELECT doc_id AS d, unnest(string_split(text, ' ')) AS word
  FROM documents
), wp AS (
  SELECT d, translate(word, '{_NE_PLANT_FROM}', '{_NE_PLANT_TO}')
         AS word
  FROM w0 WHERE word <> ''
), s1 AS (
  SELECT d, {cat1_case()} AS word FROM wp
), rec AS (
  SELECT d, word, 0 AS done FROM s1
  UNION ALL
  SELECT d,
    CASE WHEN dl3 > 0 THEN substr(w2, 1, length(w2) - dl3)
         ELSE w2 END,
    CASE WHEN dl3 > 0 THEN 0 ELSE 1 END
  FROM (
    SELECT d, w2, {cat3_dl('w2')} AS dl3
    FROM (SELECT d, {cat2_case('word')} AS w2
          FROM rec WHERE done = 0) i1
  ) i2
), fin AS (
  SELECT d, word AS term FROM rec WHERE done = 1
)
{_RSLP_TAIL}"""


_TA_PLANT_FROM = "abcdefghijklmnopqrstuvwxyz"
_TA_PLANT_TO = "ாப ச்ெறகஹிஜஙலமனோடஞரளதுவழஷைண".replace(" ", "")


def ft_snowball_tamil(sf_dir: str) -> pa.Table:
    """SnowballFilter(Tamil) (snowball/ext/TamilStemmer.java:13, the
    ta/TamilAnalyzer.java:133 default stemmer): planted Tamil via
    per-char transliteration — '-a' endings become the question
    suffix ா (-> pulli), '-ed' endings become a vowel-sign+pulli tail
    (fix_ending a_9 route), '-y' becomes the vetrumai ை — so the
    suffix families, the flags, and the fix_endings fixpoint all fire.
    Rows-only: the control flow is a multi-pass fixpoint with two
    cross-rule flags; gated on the reference goldens and the branch
    battery in tests/test_snowball2.py."""
    from ..snowball2 import tamil_stem
    plant = str.maketrans(_TA_PLANT_FROM, _TA_PLANT_TO)
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: [tamil_stem(w.translate(plant))
                       for w in _words(tx)])


def ft_snowball_turkish(sf_dir: str) -> pa.Table:
    """SnowballFilter(Turkish) (snowball/ext/TurkishStemmer.java:13,
    the tr/TurkishAnalyzer.java:129 default stemmer), raw over the
    corpus (Latin suffix chains like -in/-la/-i fire under the vowel
    harmony gates).  Rows-only: the stemmer is a backward cursor
    machine (composite marks, recursive ki chains) with no bounded
    SQL form; gated on the reference goldens and morphology battery
    in tests/test_snowball2.py."""
    from ..snowball2 import turkish_stem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [turkish_stem(w) for w in _words(tx)])


# ---------------------------------------------------------------------------
# FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java:47)

FLT_QUERIES = [(1, "valu tabl", 1), (2, "quary scann", 1),
               (3, "custmer merge", 2), (4, "zzzz", 1)]
FLT_MAX_VARIANTS = 50          # MAX_VARIANTS_PER_TERM (:55)
FLT_MAX_NUM_TERMS = 50


def _flt_expand(r, text: str, max_edits: int, prefix_len: int = 0,
                max_variants: int = FLT_MAX_VARIANTS,
                max_terms: int = FLT_MAX_NUM_TERMS, vocab_tbl=None):
    """(source_term, variant, st_score) triples per the reference's
    addTerms (:137-186): OSA variants with the FuzzyTermsEnum boost
    1 - ed/min(len), squared and scaled by the ClassicSimilarity idf
    of the source term's df (average variant df when the source is
    absent, INTEGER division :170-174); both priority queues order by
    (score asc, term desc) so the kept set is (score desc, term asc).
    ``prefix_len`` requires an exact shared prefix of
    min(prefix_len, len(term)) chars, with the distance computed on
    the SUFFIXES and the boost denominator on the FULL lengths
    (FuzzyTermsEnum's realPrefixLength automata)."""
    import math

    from ..search import _content_terms_only, _osa_distance, termdict_scan

    t = vocab_tbl if vocab_tbl is not None else _content_terms_only(
        r, termdict_scan(r))
    vocab = t.column("term").to_pylist()
    dfs = t.column("df").to_pylist()
    n_docs = r.doc_count
    out = []
    for term in dict.fromkeys(text.split()):
        plen = min(prefix_len, len(term))
        cands = []
        total_var_df, num_var = 0, 0
        df_exact = 0
        for cand, df in zip(vocab, dfs):
            if plen and not cand.startswith(term[:plen]):
                continue
            ed = _osa_distance(term[plen:], cand[plen:], max_edits)
            if ed > max_edits:
                continue
            num_var += 1
            total_var_df += int(df)
            if ed == 0:
                boost = np.float32(1.0)
                df_exact = int(df)
            else:
                boost = np.float32(1.0) - (
                    np.float32(ed) / np.float32(min(len(cand), len(term))))
            cands.append((cand, boost))
        if num_var == 0:
            continue
        df = df_exact if df_exact > 0 else total_var_df // num_var
        cls_idf = np.float32(
            math.log((n_docs + 1) / float(df + 1)) + 1.0)
        cands.sort(key=lambda c: (-float(c[1]), c[0]))
        for cand, boost in cands[:max_variants]:
            st = np.float32(np.float32(boost * boost) * cls_idf)
            out.append((term, cand, st))
    out.sort(key=lambda v: (-float(v[2]), v[1]))
    return out[:max_terms]


def ft_fuzzy_like_this(sf_dir: str) -> pa.Table:
    """FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java:47):
    per-term fuzzy expansion with idf-weighted variant boosts, rewritten
    to a Boolean SHOULD of boosted TermQueries whose df/ttf are
    OVERRIDDEN TO 1 (newTermQuery's TermStates hack, :190-205) — every
    variant scores as an ultra-rare term under the searcher's BM25."""
    from .. import bm25
    from ..codec import decode_block

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, text, max_edits in FLT_QUERIES:
        acc: dict[int, float] = {}
        for _src, term, st in _flt_expand(r, text, max_edits):
            p = r.postings(term)
            if p is None:
                continue
            sim = bm25.scorer(1, r.doc_count, r.sum_ttf,
                              boost=float(st))
            for bi in range(len(p.n)):
                d, tf, nb = decode_block(
                    int(p.first_doc[bi]), int(p.n[bi]), p.docs_enc[bi],
                    p.tfs_enc[bi], p.norms_enc[bi])
                s = sim.score(tf, nb)
                for di, sv in zip(d.tolist(), s.tolist()):
                    acc[di] = acc.get(di, 0.0) + sv
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rank, (d, s) in enumerate(top, 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(d)
            scores.append(np.float32(s))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_fuzzy_like_this_sql() -> str:
    """Replays the expansion in SQL: damerau_levenshtein stands in for
    the OSA automaton (equal for every pair at distance <= 2 that this
    corpus contains; the OSA-vs-DL divergence class is pytest-pinned on
    search._osa_distance)."""
    idf1 = ("CAST(ln(1 + ((SELECT n_docs FROM stats) - 0.5) / 1.5) "
            "AS REAL)")
    parts = []
    for qid, text, max_edits in FLT_QUERIES:
        for term in dict.fromkeys(text.split()):
            parts.append(
                f"SELECT {qid} AS qid, '{term}' AS src, "
                f"{max_edits} AS me")
    srcs = "\n  UNION ALL ".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
srcs AS (
  {srcs}
),
cand AS (
  SELECT s.qid, s.src, f.term, f.df,
         damerau_levenshtein(s.src, f.term) AS ed
  FROM srcs s JOIN df f
    ON damerau_levenshtein(s.src, f.term) <= s.me
),
grp AS (
  SELECT qid, src,
         max(CASE WHEN ed = 0 THEN df ELSE 0 END) AS df_exact,
         CAST(sum(df) AS BIGINT) // count(*) AS df_avg
  FROM cand GROUP BY qid, src
),
boosted AS (
  SELECT c.qid, c.src, c.term,
         CASE WHEN c.ed = 0 THEN CAST(1.0 AS REAL)
              ELSE CAST(1.0 AS REAL)
                   - CAST(c.ed AS REAL)
                     / CAST(least(length(c.term), length(c.src)) AS REAL)
         END AS boost,
         CAST(ln(((SELECT n_docs FROM stats) + 1)
                 / CAST((CASE WHEN g.df_exact > 0 THEN g.df_exact
                              ELSE g.df_avg END) + 1 AS DOUBLE))
              + 1.0 AS REAL) AS cls_idf,
         row_number() OVER (PARTITION BY c.qid, c.src
                            ORDER BY boost DESC, c.term) AS vr
  FROM cand c JOIN grp g ON g.qid = c.qid AND g.src = c.src
),
kept AS (
  SELECT qid, term,
         CAST(CAST(boost * boost AS REAL) * cls_idf AS REAL) AS st,
         row_number() OVER (PARTITION BY qid
           ORDER BY CAST(CAST(boost * boost AS REAL) * cls_idf AS REAL)
             DESC, term) AS gr
  FROM boosted WHERE vr <= {FLT_MAX_VARIANTS}
),
scored AS (
  SELECT k.qid, t.d,
         CAST(CAST(k.st * {idf1} AS REAL)
           - CAST(k.st * {idf1} AS REAL)
             / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
                (CAST(1.0 AS REAL) /
                 (CAST(1.2 AS REAL) *
                  (CAST(0.25 AS REAL) +
                   CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
                   CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                        (SELECT n_docs FROM stats) AS REAL)))))
           AS REAL) AS s
  FROM kept k
  JOIN tf t ON t.term = k.term
  JOIN quant q ON q.d = t.d
  WHERE k.gr <= {FLT_MAX_NUM_TERMS}
),
totals AS (
  SELECT qid, d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
  FROM scored GROUP BY qid, d
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= 10"""


# ---------------------------------------------------------------------------
# HalfFloatPoint (sandbox/document/HalfFloatPoint.java:31)

HALF_RANGE_QUERIES = [(1, 1000.0, 2000.0), (2, 50000.0, 65504.0),
                      (3, 65504.0, float("inf")), (4, 914.5, 915.0)]


def ft_half_float_range(sf_dir: str) -> pa.Table:
    """HalfFloatPoint range counting: l_extendedprice is cast to
    float32 then quantized through the half-float codec
    (HalfFloatPoint.java:110-155, round-half-even, float32 subnormals
    flush, overflow carries into infinity); inclusive range counts run
    on the QUANTIZED values.  n_distinct gates the codec's value set,
    not just the partition."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..halffloat import half_bits, half_value

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice"])

    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64()),
                         ("v", pa.float32())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        f = batch.column("l_extendedprice").to_numpy().astype(np.float32)
        q = half_value(half_bits(f))
        qids, ns, vs = [], [], []
        for qid, lo, hi in HALF_RANGE_QUERIES:
            m = (q >= np.float32(lo)) & (q <= np.float32(hi))
            uniq, cnt = np.unique(q[m], return_counts=True)
            qids.extend([qid] * len(uniq))
            ns.extend(cnt.astype(np.int64).tolist())
            vs.extend(uniq.tolist())
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64()),
                         "v": pa.array(np.array(vs, np.float32))})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qid", "v"]).sum("n").to_pandas(),
        ["qid", "v", "sum(n)"])
    out = (agg.groupby("qid")
           .agg(n_docs=("sum(n)", "sum"), n_distinct=("v", "size"))
           .reindex([q for q, _, _ in HALF_RANGE_QUERIES], fill_value=0)
           .reset_index())
    return pa.table({
        "qid": pa.array(out["qid"].astype("int64")),
        "n_docs": pa.array(out["n_docs"].astype("int64")),
        "n_distinct": pa.array(out["n_distinct"].astype("int64"))})


def oracle_half_float_range_sql() -> str:
    """Half-float quantization as exact SQL: within [2^e, 2^(e+1)) the
    half quantum is 2^(e-10); f/quantum is exact in DOUBLE (a 24-bit
    mantissa over a power of two), round_even reproduces roundShift's
    tie-to-even, and results >= 65536 are the overflow-to-infinity
    class (the exponent carry at HalfFloatPoint.java:121-133)."""
    whens = []
    for e in range(17, 5, -1):
        lo = float(2 ** e)
        qt = float(2 ** (e - 10))
        whens.append(f"    WHEN f >= {lo} THEN {qt}")
    quantum = "CASE\n" + "\n".join(whens) + "\n    ELSE 0 END"
    parts = []
    for qid, lo, hi in HALF_RANGE_QUERIES:
        hi_sql = "CAST('infinity' AS REAL)" if hi == float("inf") \
            else f"CAST({hi} AS REAL)"
        parts.append(f"""SELECT {qid} AS qid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
FROM halves WHERE h >= CAST({lo} AS REAL) AND h <= {hi_sql}""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH f32 AS (
  SELECT CAST(l_extendedprice AS REAL) AS f FROM lineitem
), halves AS (
  SELECT CASE
    WHEN q = 0 THEN f
    WHEN round_even(CAST(f AS DOUBLE) / q, 0) * q >= 65536
      THEN CAST('infinity' AS REAL)
    ELSE CAST(round_even(CAST(f AS DOUBLE) / q, 0) * q AS REAL)
  END AS h
  FROM (SELECT f, {quantum} AS q FROM f32)
)
{un}"""


# ---------------------------------------------------------------------------
# BigIntegerPoint (sandbox/document/BigIntegerPoint.java:33)

_BIGINT_SHIFT = 3 * 10 ** 21   # centers the derived value around zero

BIGINT_RANGE_QUERIES = [
    (1, -3 * 10 ** 21, -10 ** 21),
    (2, -10 ** 15, 10 ** 15),
    (3, 0, 4 * 10 ** 21),
    (4, 123456789, 123456789),          # exact-match form
]


def ft_bigint_range(sf_dir: str) -> pa.Table:
    """BigIntegerPoint range counting over a derived 128-bit value
    (l_orderkey·10¹⁵ + l_partkey·10⁶ + l_linenumber − 3·10²¹ — wider
    than int64 and signed on both sides): every row is ENCODED to the
    sortable 16-byte form and ranges compare RAW BYTES against encoded
    bounds, gating the sign-flip order isomorphism
    (NumericUtils.bigIntToSortableBytes)."""
    import ray.data

    from ..bigintpoint import bigint_to_sortable_bytes

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_linenumber"])
    bounds = [(qid, bigint_to_sortable_bytes(lo),
               bigint_to_sortable_bytes(hi))
              for qid, lo, hi in BIGINT_RANGE_QUERIES]

    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        ok = batch.column("l_orderkey").to_numpy()
        pk = batch.column("l_partkey").to_numpy()
        ln = batch.column("l_linenumber").to_numpy()
        enc = [bigint_to_sortable_bytes(
            int(o) * 10 ** 15 + int(p) * 10 ** 6 + int(l)
            - _BIGINT_SHIFT)
            for o, p, l in zip(ok.tolist(), pk.tolist(), ln.tolist())]
        qids, ns = [], []
        for qid, blo, bhi in bounds:
            qids.append(qid)
            ns.append(sum(1 for e in enc if blo <= e <= bhi))
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid").sum("n").to_pandas(), ["qid", "sum(n)"])
    agg = agg.sort_values("qid").reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_bigint_range_sql() -> str:
    parts = []
    for qid, lo, hi in BIGINT_RANGE_QUERIES:
        parts.append(f"""SELECT {qid} AS qid, CAST(count(*) AS BIGINT) AS n
FROM v WHERE x BETWEEN CAST('{lo}' AS HUGEINT)
                   AND CAST('{hi}' AS HUGEINT)""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH v AS (
  SELECT CAST(l_orderkey AS HUGEINT) * CAST('1000000000000000' AS HUGEINT)
         + CAST(l_partkey AS HUGEINT) * 1000000
         + l_linenumber
         - CAST('3000000000000000000000' AS HUGEINT) AS x
  FROM lineitem
)
{un}"""


# ---------------------------------------------------------------------------
# BlendedTermQuery (core/search/BlendedTermQuery.java:47)

BLENDED_TERM_SETS = [
    (1, [("value", 1.0), ("key", 1.0)], 10),
    (2, [("query", 2.0), ("scan", 1.0), ("sort", 1.0)], 10),
    (3, [("customer", 1.0), ("order", 0.5)], 8),
    (4, [("zzmissing", 1.0), ("table", 1.0)], 6),
]
_BLENDED_TIE = 0.01           # DISJUNCTION_MAX_REWRITE default (:163)


def ft_blended_term(sf_dir: str) -> pa.Table:
    """BlendedTermQuery (core/search/BlendedTermQuery.java:47): every
    term in the group scores with the BLENDED document frequency — the
    MAX df across the group (rewrite :283-291, adjustFrequencies) — so
    cross-field/cross-form synonyms rank comparably, combined with the
    default DisjunctionMax(tie=0.01) rewrite; per-term boosts apply as
    BoostQuery wrappers.  (ttf also blends to the sum, which BM25
    never reads.)"""
    from .. import bm25
    from ..codec import decode_blocks

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, group, k in BLENDED_TERM_SETS:
        posts = {t: r.postings(t) for t, _ in group}
        blended_df = max((p.df for p in posts.values()
                          if p is not None), default=0)
        if blended_df == 0:
            continue
        dl, sl = [], []
        for t, boost in group:
            p = posts[t]
            if p is None:
                continue
            sim = bm25.scorer(blended_df, r.doc_count, r.sum_ttf,
                              boost=boost)
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            s = sim.score(tf, nm)
            lm = r.live_mask(d)
            if lm is not None:
                d, s = d[lm], s[lm]
            dl.append(d)
            sl.append(s)
        alld = np.concatenate(dl)
        alls = np.concatenate(sl)
        uniq, inv = np.unique(alld, return_inverse=True)
        mx = np.zeros(len(uniq), np.float32)
        np.maximum.at(mx, inv, alls)
        tot = np.zeros(len(uniq), np.float64)
        np.add.at(tot, inv, alls.astype(np.float64))
        combined = (mx.astype(np.float64)
                    + (tot - mx.astype(np.float64))
                    * np.float64(np.float32(_BLENDED_TIE))
                    ).astype(np.float32)
        order = np.lexsort((uniq, -combined.astype(np.float64)))[:k]
        for rank, i in enumerate(order, 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uniq[i]))
            scores.append(np.float32(combined[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_blended_term_sql() -> str:
    rows = []
    for qid, group, k in BLENDED_TERM_SETS:
        for ci, (t, boost) in enumerate(group):
            rows.append(f"({qid}, {ci}, '{t}', CAST({boost} AS REAL), "
                        f"{k})")
    vals = ",\n    ".join(rows)
    # the boosted weight chain (oracle_bm25_boosted_sql) with f.df
    # replaced by the group's blended (max) df
    weight = ("CAST(CAST(c.boost AS REAL) * CAST(ln(1 + "
              "((SELECT n_docs FROM stats) - g.bdf + 0.5) / (g.bdf + 0.5)"
              ") AS REAL) AS REAL)")
    blended = f"""CAST(
      {weight}
      - {weight}
        / (CAST(1.0 AS REAL) + CAST(t.tf AS REAL) *
           (CAST(1.0 AS REAL) /
            (CAST(1.2 AS REAL) *
             (CAST(0.25 AS REAL) +
              CAST(0.75 AS REAL) * CAST(q.qlen AS REAL) /
              CAST(CAST((SELECT sum_ttf FROM stats) AS DOUBLE) /
                   (SELECT n_docs FROM stats) AS REAL)))))
    AS REAL)"""
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
clauses(qid, clause, term, boost, k) AS (VALUES
    {vals}
),
grpdf AS (
  SELECT c.qid, max(f.df) AS bdf
  FROM clauses c JOIN df f ON f.term = c.term
  GROUP BY c.qid
),
scored AS (
  SELECT c.qid, c.k, t.d, {blended} AS s
  FROM clauses c
  JOIN grpdf g ON g.qid = c.qid
  JOIN tf t ON t.term = c.term
  JOIN quant q ON q.d = t.d
),
totals AS (
  SELECT qid, k, d,
         CAST(CAST(max(s) AS DOUBLE)
              + (sum(CAST(s AS DOUBLE)) - CAST(max(s) AS DOUBLE))
                * CAST(CAST(0.01 AS REAL) AS DOUBLE) AS REAL) AS score
  FROM scored GROUP BY qid, k, d
),
ranked AS (
  SELECT qid, d, score, k, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= k"""


# ---------------------------------------------------------------------------
# IR quality evaluation (benchmark/quality/QualityStats.java:28)

QUALITY_QUERIES = [(1, ["value", "key"]), (2, ["query"]),
                   (3, ["customer", "order", "part"]),
                   (4, ["zzmissing"])]
QUALITY_MAX_POINTS = 20


def ft_quality_eval(sf_dir: str) -> pa.Table:
    """QualityBenchmark over the engine's own rankings
    (benchmark/quality/QualityBenchmark.java:86, QualityStats.java:28,
    TrecJudge.java:36): per query the BM25 top-20 is judged against a
    deterministic relevance set (docs matching ALL query terms — the
    TREC-judgment stand-in), producing the reference's exact metric
    chain: precision@n (with the short-result-list extrapolation
    numPoints·pAt[numPoints]/n, :96-98), MRR counted only when the
    first relevant hit ranks <= 5 (:66-68), average precision =
    Σ p@relevant-ranks / maxGood (:100-102), and recall.  One row per
    (qid, metric); qid -1 carries the benchmark means in qid order."""
    from ..search import search_boolean, search_terms_scored

    r = reader_for(sf_dir)
    rows: list[tuple[int, str, float]] = []
    per_query: dict[str, list[float]] = {}
    for qid, terms in QUALITY_QUERIES:
        relevant = set(search_boolean(r, must=terms).tolist())
        max_good = float(len(relevant))
        td = search_terms_scored(r, terms, QUALITY_MAX_POINTS)
        ranked = td.doc_ids.tolist()
        num_good = 0.0
        p_at = [0.0] * (QUALITY_MAX_POINTS + 1)
        prel_sum = 0.0
        mrr = 0.0
        recall = 0.0
        n = 0
        first_rel = None
        for n, d in enumerate(ranked, 1):
            rel = d in relevant
            if rel:
                num_good += 1.0
                if first_rel is None:
                    first_rel = n
                    if n <= 5:
                        mrr = 1.0 / n
            p = num_good / n
            if rel:
                prel_sum += p
            p_at[n] = p
            recall = p if max_good <= 0 else num_good / max_good

        def p_at_n(k: int) -> float:
            if k > n:
                return (n * p_at[n]) / k if n > 0 else 0.0
            return p_at[k]

        metrics = [("p_at_1", p_at_n(1)), ("p_at_5", p_at_n(5)),
                   ("p_at_10", p_at_n(10)), ("p_at_20", p_at_n(20)),
                   ("mrr", mrr),
                   ("avp", 0.0 if max_good == 0
                    else prel_sum / max_good),
                   ("recall", recall), ("num_good", num_good)]
        for mname, v in metrics:
            rows.append((qid, mname, float(v)))
            per_query.setdefault(mname, []).append(float(v))
    for mname, vals in per_query.items():
        acc = 0.0
        for v in vals:                   # qid-order left-to-right sum
            acc += v
        rows.append((-1, mname, acc / len(vals)))
    return pa.table({
        "qid": pa.array([x[0] for x in rows], pa.int64()),
        "metric": pa.array([x[1] for x in rows], pa.string()),
        "value": pa.array([x[2] for x in rows], pa.float64())})


def oracle_quality_eval_sql() -> str:
    parts = []
    for qid, terms in QUALITY_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        nt = len(terms)
        parts.append(f"""(
  SELECT {qid} AS qid, t.d,
         row_number() OVER (ORDER BY score DESC, t.d ASC) AS rank,
         CASE WHEN rel.d IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM (
    SELECT d, CAST(sum(CAST(s AS DOUBLE)) AS REAL) AS score
    FROM (SELECT t.d, {_SCORE_EXPR} AS s
          FROM tf t JOIN df f ON f.term = t.term
          JOIN quant q ON q.d = t.d
          WHERE t.term IN ({tl}))
    GROUP BY d
  ) t
  LEFT JOIN (
    SELECT d FROM tf WHERE term IN ({tl})
    GROUP BY d HAVING count(DISTINCT term) = {nt}
  ) rel ON rel.d = t.d
  ORDER BY rank LIMIT {QUALITY_MAX_POINTS})""")
    ranked = "\nUNION ALL\n".join(parts)
    goods = []
    for qid, terms in QUALITY_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        nt = len(terms)
        goods.append(f"""SELECT {qid} AS qid,
       CAST(count(*) AS DOUBLE) AS max_good
FROM (SELECT d FROM tf WHERE term IN ({tl})
      GROUP BY d HAVING count(DISTINCT term) = {nt})""")
    goodu = "\nUNION ALL\n".join(goods)
    qids = ", ".join(f"({q})" for q, _ in QUALITY_QUERIES)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
ranked AS (
{ranked}
),
maxg AS (
{goodu}
),
walk AS (
  SELECT qid, rank, rel,
         CAST(sum(rel) OVER w AS DOUBLE) AS ngood,
         CAST(sum(rel) OVER w AS DOUBLE) / rank AS p,
         min(CASE WHEN rel = 1 THEN rank END) OVER w AS firstrel
  FROM ranked
  WINDOW w AS (PARTITION BY qid ORDER BY rank
               ROWS UNBOUNDED PRECEDING)
),
lastp AS (
  SELECT qid, max(rank) AS n,
         max(ngood) AS ngood,
         sum(p ORDER BY rank) FILTER (rel = 1) AS prel_sum,
         min(CASE WHEN rel = 1 THEN rank END) AS firstrel
  FROM walk GROUP BY qid
),
qrows AS (SELECT q.qid, coalesce(l.n, 0) AS n,
                 coalesce(l.ngood, 0.0) AS ngood,
                 coalesce(l.prel_sum, 0.0) AS prel_sum,
                 l.firstrel, m.max_good
          FROM (VALUES {qids}) q(qid)
          LEFT JOIN lastp l ON l.qid = q.qid
          JOIN maxg m ON m.qid = q.qid),
pat AS (
  SELECT qid, k,
         CASE WHEN q.n = 0 THEN 0.0
              WHEN k > q.n THEN (q.n * (SELECT p FROM walk w
                                        WHERE w.qid = q.qid
                                          AND w.rank = q.n)) / k
              ELSE (SELECT p FROM walk w
                    WHERE w.qid = q.qid AND w.rank = k) END AS v
  FROM qrows q CROSS JOIN (VALUES (1), (5), (10), (20)) ks(k)
),
metrics AS (
  SELECT qid, 'p_at_' || k AS metric, v AS value FROM pat
  UNION ALL
  SELECT qid, 'mrr',
         CASE WHEN firstrel IS NOT NULL AND firstrel <= 5
              THEN 1.0 / firstrel ELSE 0.0 END
  FROM qrows
  UNION ALL
  SELECT qid, 'avp',
         CASE WHEN max_good = 0 THEN 0.0
              ELSE prel_sum / max_good END
  FROM qrows
  UNION ALL
  SELECT qid, 'recall',
         CASE WHEN n = 0 THEN 0.0
              WHEN max_good <= 0 THEN ngood / n
              ELSE ngood / max_good END
  FROM qrows
  UNION ALL
  SELECT qid, 'num_good', ngood FROM qrows
)
SELECT qid, metric, value FROM metrics
UNION ALL
SELECT -1 AS qid, metric,
       (SELECT sum(value ORDER BY qid) FROM metrics m2
        WHERE m2.metric = m.metric) / count(*) AS value
FROM metrics m GROUP BY metric"""


# ---------------------------------------------------------------------------
# Numeric range fields (document/LongRange.java:33 — one interval per
# doc, queried by interval relation)

RANGE_FIELD_QUERIES = [
    (1, "intersects", 50, 120), (2, "within", 0, 200),
    (3, "contains", 95, 96), (4, "crosses", 50, 120),
    (5, "intersects", 10_000, 20_000),
]


def ft_range_field(sf_dir: str) -> pa.Table:
    """LongRange field queries (document/LongRange.java:33,
    RangeFieldQuery.java relations): each lineitem row carries the
    interval [quantity, quantity + linenumber·7] and the four query
    relations count matching rows — INTERSECTS (overlap), WITHIN
    (doc ⊆ query), CONTAINS (doc ⊇ query), CROSSES (intersects but
    neither within nor contains, RangeFieldQuery.QueryType.CROSSES).

    Scale shape: map-only per-batch predicate counts + a tiny groupby
    (the BKD range-tree pruning becomes parquet row-group min/max
    pruning on the interval columns at scale)."""
    import ray.data
    from ray.data.aggregate import Sum

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_linenumber"])

    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        # DuckDB CAST(DOUBLE AS BIGINT) rounds half TO EVEN (18.5 ->
        # 18, 19.5 -> 20); the away-from-zero rule applies only to
        # DECIMAL casts — np.rint is the matching rule
        qv = batch.column("l_quantity").to_numpy()
        lo = np.rint(qv).astype(np.int64)
        hi = lo + batch.column("l_linenumber").to_numpy()\
            .astype(np.int64) * 7
        qids, ns = [], []
        for qid, rel, qlo, qhi in RANGE_FIELD_QUERIES:
            inter = (lo <= qhi) & (hi >= qlo)
            within = (lo >= qlo) & (hi <= qhi)
            contains = (lo <= qlo) & (hi >= qhi)
            m = {"intersects": inter, "within": within,
                 "contains": contains,
                 "crosses": inter & ~within & ~contains}[rel]
            qids.append(qid)
            ns.append(int(m.sum()))
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid").sum("n").to_pandas(), ["qid", "sum(n)"])
    agg = agg.sort_values("qid").reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_range_field_sql() -> str:
    parts = []
    for qid, rel, qlo, qhi in RANGE_FIELD_QUERIES:
        pred = {
            "intersects": f"lo <= {qhi} AND hi >= {qlo}",
            "within": f"lo >= {qlo} AND hi <= {qhi}",
            "contains": f"lo <= {qlo} AND hi >= {qhi}",
            "crosses": (f"(lo <= {qhi} AND hi >= {qlo}) "
                        f"AND NOT (lo >= {qlo} AND hi <= {qhi}) "
                        f"AND NOT (lo <= {qlo} AND hi >= {qhi})"),
        }[rel]
        parts.append(f"""SELECT {qid} AS qid,
       CAST(count(*) FILTER ({pred}) AS BIGINT) AS n FROM r""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH r AS (
  SELECT CAST(l_quantity AS BIGINT) AS lo,
         CAST(l_quantity AS BIGINT) + l_linenumber * 7 AS hi
  FROM lineitem
)
{un}"""


# ---------------------------------------------------------------------------
# Porter (1980) stemmer as SQL — upgrades ft_stemmed_search from
# rows-only to a full oracle.  The chain mirrors
# analysis_en.porter_stem stage by stage (PorterStemmer.java:222-492
# semantics incl. both published bug fixes and logi->log); the
# per-position recursive CTE classifies consonant-y exactly (y at 0 is
# a consonant, otherwise the complement of the previous class), and
# the measure m is the count of 'vc' adjacencies in the cv prefix.
# Gated by tests/test_porter1_sql.py: the SQL agrees with porter_stem
# on ALL 23,531 reference vocabulary words and on random fuzz.

def _porter1_sql(words_cte: str = "words(w)") -> str:
    """CTE chain: a relation ``words(w)`` of lowercased tokens ->
    ``stemmed(w, stem)``.  The returned text starts with WITH
    RECURSIVE; use :func:`_porter1_ctes` to splice into a larger
    query."""

    """SQL pipeline: a relation words(w) of lowercased tokens ->
    (w, stem).  Mirrors analysis_en.porter_stem stage by stage."""
    V = "('a','e','i','o','u')"

    def cv_cte(name, src, col, cvname):
        # per-position classification: y = consonant at 0, else the
        # complement of the previous classification
        return f"""{name}_r AS (
  SELECT w0, CAST(1 AS BIGINT) AS i,
         CASE WHEN substr(w0, 1, 1) IN {V} THEN 'v' ELSE 'c' END AS cv
  FROM (SELECT DISTINCT {col} AS w0 FROM {src})
  UNION ALL
  SELECT w0, i + 1,
         cv || CASE
           WHEN substr(w0, i + 1, 1) IN {V} THEN 'v'
           WHEN substr(w0, i + 1, 1) = 'y'
             THEN CASE WHEN substr(cv, i, 1) = 'c' THEN 'v' ELSE 'c' END
           ELSE 'c' END
  FROM {name}_r WHERE i < length(w0)
), {name} AS (
  SELECT w0, cv AS {cvname} FROM {name}_r WHERE i = length(w0)
)"""

    def m_expr(cvp):
        # number of 'vc' adjacencies in the cv prefix
        return (f"CAST((length({cvp}) - length(replace({cvp}, 'vc', '')))"
                f" // 2 AS BIGINT)")

    def pre(col, k):
        return f"substr({col}, 1, length({col}) - {k})"

    def cvpre(cvcol, col, k):
        return f"substr({cvcol}, 1, length({col}) - {k})"

    def vowelinstem(cvcol, col, k):
        return f"contains({cvpre(cvcol, col, k)}, 'v')"

    def doublec_at(cvcol, col, k):
        # doublec at position len-k (1-based end of prefix)
        e = f"length({col}) - {k}"
        return (f"({e} >= 2 AND substr({col}, {e}, 1) = "
                f"substr({col}, {e} - 1, 1) AND "
                f"substr({cvcol}, {e}, 1) = 'c')")

    def cvc_at(cvcol, col, k):
        # cvc ending at position len-k, final cons not w/x/y
        e = f"length({col}) - {k}"
        return (f"({e} >= 3 AND substr({cvcol}, {e} - 2, 3) = 'cvc' "
                f"AND substr({col}, {e}, 1) NOT IN ('w', 'x', 'y'))")

    # ---- step 1: plurals + ed/ing -------------------------------------
    # s-branch first (sses/ies/s), then eed / ed / ing on ITS result.
    s_branch = f"""CASE
      WHEN ends_with(w, 'sses') THEN {pre('w', 2)}
      WHEN ends_with(w, 'ies') THEN {pre('w', 2)}
      WHEN ends_with(w, 's') AND NOT ends_with(w, 'ss') THEN {pre('w', 1)}
      ELSE w END"""
    # note: ies -> i is setto('i') on j=len-3: b[0:len-3]+'i' == pre(w,2)

    # eed/ed/ing needs cv of s1
    step1b = f"""CASE
      WHEN ends_with(s1, 'eed') THEN
        CASE WHEN {m_expr(cvpre('cv1', 's1', 3))} > 0
             THEN {pre('s1', 1)} ELSE s1 END
      WHEN ends_with(s1, 'ed') AND {vowelinstem('cv1', 's1', 2)} THEN
        {pre('s1', 2)}
      WHEN ends_with(s1, 'ing') AND {vowelinstem('cv1', 's1', 3)} THEN
        {pre('s1', 3)}
      ELSE s1 END"""
    step1_fired = f"""((ends_with(s1, 'ed') AND NOT ends_with(s1, 'eed')
        AND {vowelinstem('cv1', 's1', 2)})
      OR (ends_with(s1, 'ing') AND {vowelinstem('cv1', 's1', 3)}))"""
    # cleanup after ed/ing removal (on s2, cv2)
    step1c = f"""CASE WHEN NOT fired THEN s2
      WHEN ends_with(s2, 'at') THEN s2 || 'e'
      WHEN ends_with(s2, 'bl') THEN s2 || 'e'
      WHEN ends_with(s2, 'iz') THEN s2 || 'e'
      WHEN {doublec_at('cv2', 's2', 0)}
           AND substr(s2, length(s2), 1) NOT IN ('l', 's', 'z')
        THEN {pre('s2', 1)}
      WHEN {m_expr(cvpre('cv2', 's2', 0))} = 1 AND {cvc_at('cv2', 's2', 0)}
        THEN s2 || 'e'
      ELSE s2 END"""

    # ---- step 2: y -> i ------------------------------------------------
    step2 = f"""CASE WHEN ends_with(s3, 'y')
        AND {vowelinstem('cv3', 's3', 1)}
      THEN {pre('s3', 1)} || 'i' ELSE s3 END"""

    # ---- steps 3/4/5 as ordered suffix tables --------------------------
    STEP3 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
             ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
             ("alli", "al"), ("entli", "ent"), ("eli", "e"),
             ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
             ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
             ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
             ("iviti", "ive"), ("biliti", "ble"), ("logi", "log")]
    STEP4 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
             ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
             ("ness", "")]
    STEP5 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
             "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
             "ive", "ize"]

    def keyed_case(col, cvcol, rules, mcond):
        # the reference dispatches on b[k-1] (second-to-last char) and
        # tries that key's suffixes in source order; the committed
        # match applies only when m(stem) passes. Emulate: ordered by
        # the ORIGINAL python if/elif per key — equivalent to checking
        # each suffix with its key guard, longest-first per key chain.
        whens = []
        for suf, rep in rules:
            k = len(suf)
            key = suf[-2] if len(suf) >= 2 else suf
            cond = (f"substr({col}, length({col}) - 1, 1) = '{key}' "
                    f"AND ends_with({col}, '{suf}')")
            stem_cv = cvpre(cvcol, col, k)
            act = (f"CASE WHEN {m_expr(stem_cv)} {mcond} "
                   f"THEN {pre(col, k)} || '{rep}' ELSE {col} END")
            whens.append(f"      WHEN {cond} THEN {act}")
        return "CASE\n" + "\n".join(whens) + f"\n      ELSE {col} END"

    step3 = keyed_case("s4", "cv4", STEP3, "> 0")

    def step4_case(col, cvcol):
        whens = []
        for suf, rep in STEP4:
            k = len(suf)
            key = suf[-1]
            cond = (f"substr({col}, length({col}), 1) = '{key}' "
                    f"AND ends_with({col}, '{suf}')")
            act = (f"CASE WHEN {m_expr(cvpre(cvcol, col, k))} > 0 "
                   f"THEN {pre(col, k)} || '{rep}' ELSE {col} END")
            whens.append(f"      WHEN {cond} THEN {act}")
        return "CASE\n" + "\n".join(whens) + f"\n      ELSE {col} END"

    step4 = step4_case("s5", "cv5")

    def step5_case(col, cvcol):
        whens = []
        for suf in STEP5:
            k = len(suf)
            key = suf[-2] if len(suf) >= 2 else suf
            cond = (f"substr({col}, length({col}) - 1, 1) = '{key}' "
                    f"AND ends_with({col}, '{suf}')")
            extra = ""
            if suf == "ion":
                pass
            act = (f"CASE WHEN {m_expr(cvpre(cvcol, col, k))} > 1 "
                   f"THEN {pre(col, k)} ELSE {col} END")
            whens.append(f"      WHEN {cond} THEN {act}")
        # special: 'ion' requires preceding s/t; insert before generic
        ion = (f"      WHEN substr({col}, length({col}) - 1, 1) = 'o' "
               f"AND ends_with({col}, 'ion') "
               f"AND substr({col}, length({col}) - 3, 1) IN ('s', 't') "
               f"THEN CASE WHEN {m_expr(cvpre(cvcol, col, 3))} > 1 "
               f"THEN {pre(col, 3)} ELSE {col} END")
        whens_all = []
        for wstr in whens:
            if "'ou'" in wstr:
                whens_all.append(ion)
            whens_all.append(wstr)
        return "CASE\n" + "\n".join(whens_all) + f"\n      ELSE {col} END"

    step5 = step5_case("s6", "cv6")

    # ---- step 6: final e / ll ------------------------------------------
    step6a = f"""CASE WHEN ends_with(s7, 'e') AND (
        {m_expr(cvpre('cv7', 's7', 1))} > 1
        OR ({m_expr(cvpre('cv7', 's7', 1))} = 1
            AND NOT {cvc_at('cv7', 's7', 1)})
      ) THEN {pre('s7', 1)} ELSE s7 END"""
    step6b = f"""CASE WHEN ends_with(s8, 'l')
        AND {doublec_at('cv8', 's8', 0)}
        AND {m_expr(cvpre('cv8', 's8', 0))} > 1
      THEN {pre('s8', 1)} ELSE s8 END"""

    return f"""WITH RECURSIVE src AS (
  SELECT w FROM {words_cte}
),
short AS (SELECT w FROM src WHERE length(w) <= 2),
longw AS (SELECT w FROM src WHERE length(w) > 2),
st1 AS (SELECT w, {s_branch} AS s1 FROM longw),
{cv_cte('c1', 'st1', 's1', 'cv1')},
st2 AS (SELECT st1.w, s1, {step1b} AS s2, {step1_fired} AS fired
        FROM st1 JOIN c1 ON c1.w0 = st1.s1),
{cv_cte('c2', 'st2', 's2', 'cv2')},
st3 AS (SELECT w, {step1c} AS s3
        FROM st2 JOIN c2 ON c2.w0 = st2.s2),
{cv_cte('c3', 'st3', 's3', 'cv3')},
st4 AS (SELECT w, {step2} AS s4
        FROM st3 JOIN c3 ON c3.w0 = st3.s3),
{cv_cte('c4', 'st4', 's4', 'cv4')},
st5 AS (SELECT w, {step3} AS s5
        FROM st4 JOIN c4 ON c4.w0 = st4.s4),
{cv_cte('c5', 'st5', 's5', 'cv5')},
st6 AS (SELECT w, {step4} AS s6
        FROM st5 JOIN c5 ON c5.w0 = st5.s5),
{cv_cte('c6', 'st6', 's6', 'cv6')},
st7 AS (SELECT w, {step5} AS s7
        FROM st6 JOIN c6 ON c6.w0 = st6.s6),
{cv_cte('c7', 'st7', 's7', 'cv7')},
st8 AS (SELECT w, {step6a} AS s8
        FROM st7 JOIN c7 ON c7.w0 = st7.s7),
{cv_cte('c8', 'st8', 's8', 'cv8')},
stemmed AS (
  SELECT w, {step6b} AS stem FROM st8 JOIN c8 ON c8.w0 = st8.s8
  UNION ALL
  SELECT w, w AS stem FROM short
)"""


def _porter1_ctes(words_rel: str) -> str:
    """The chain as a spliceable CTE list (caller supplies WITH
    RECURSIVE)."""
    full = _porter1_sql(words_rel)
    return full.split("WITH RECURSIVE ", 1)[1]


def oracle_stemmed_search_sql() -> str:
    """Full oracle for ft_stemmed_search: the english chain
    (possessive -> stop -> Porter) REBUILT IN SQL over the corpus —
    stemmed tf/df, stop-filtered quantized lengths, the Porter CTE
    chain gated on the full reference vocabulary — feeding the exact
    float32 BM25 ranking.  Query literals are the engine-stemmed
    terms (the queries are fixed entry constants; their stemming is
    part of the entry definition, and the SQL stemmer is separately
    differential-gated against the same function)."""
    from ..analysis_en import english_token_filter

    rows = []
    for qid, q in STEMMED_QUERIES:
        stems = [s for s in english_token_filter(q.split())
                 if s is not None]
        for ci, t in enumerate(stems):
            rows.append(f"({qid}, {ci}, '{t}', 10)")
    vals = ",\n    ".join(rows)
    stops = ", ".join(f"'{w}'" for w in
                      sorted(__import__("lucene_ray.analysis_en",
                                        fromlist=["x"])
                             .ENGLISH_STOP_WORDS))
    quant_body = _QUANT_LEN.split("quant AS (", 1)[1]
    return f"""WITH RECURSIVE corpus AS (
  SELECT row_number() OVER (ORDER BY source, printf('doc_%08d.txt', doc_id)) - 1 AS d,
         text
  FROM documents
),
tok0 AS (
  SELECT d, unnest(string_split(text, ' ')) AS term FROM corpus
),
kept AS (
  SELECT d, CASE WHEN length(term) >= 2
                  AND substr(term, length(term), 1) = 's'
                  AND substr(term, length(term) - 1, 1)
                      IN ('''', '’', '＇')
                 THEN substr(term, 1, length(term) - 2)
                 ELSE term END AS term
  FROM tok0
  WHERE CASE WHEN length(term) >= 2
              AND substr(term, length(term), 1) = 's'
              AND substr(term, length(term) - 1, 1)
                  IN ('''', '’', '＇')
             THEN substr(term, 1, length(term) - 2)
             ELSE term END NOT IN ({stops})
),
words AS (SELECT DISTINCT term AS w FROM kept),
{_porter1_ctes("words")},
stok AS (
  SELECT k.d, s.stem AS term FROM kept k JOIN stemmed s ON s.w = k.term
),
tf AS (
  SELECT d, term, count(*) AS tf FROM stok GROUP BY d, term
),
dl AS (
  SELECT c.d, count(k.term) AS len
  FROM corpus c LEFT JOIN kept k ON c.d = k.d GROUP BY c.d
),
stats AS (
  SELECT count(*) AS n_docs, (SELECT count(*) FROM kept) AS sum_ttf
  FROM corpus
),
df AS (
  SELECT term, count(*) AS df, sum(tf) AS ttf FROM tf GROUP BY term
),
quant AS ({quant_body},
{_bm25_chain_cte(vals)}
SELECT qid, rank, d AS doc_id FROM ranked WHERE rank <= k"""


def _ascii_fold_sql_stages(col: str, per_stage: int = 60) -> list:
    """The FULL 1242-entry ASCIIFolding table as SQL: replace() chains
    for the 170 multi-char outputs (distinct single-char sources, so
    order is irrelevant) SPLIT into stages below DuckDB's 128-call
    binder depth, then one translate() for the 1:1 rest.  Returns the
    list of stage expressions; stage i transforms the column named by
    stage i-1 (the first consumes ``col``)."""
    from ..asciifold_data import ASCII_FOLD_MAP

    def q(s: str) -> str:
        return s.replace("'", "''")

    multi = [(s, r) for s, r in sorted(ASCII_FOLD_MAP.items())
             if len(r) != 1]
    frm = "".join(s for s, r in sorted(ASCII_FOLD_MAP.items())
                  if len(r) == 1)
    to = "".join(r for s, r in sorted(ASCII_FOLD_MAP.items())
                 if len(r) == 1)
    stages = []
    cur = col
    for i in range(0, len(multi), per_stage):
        expr = cur
        for s, r in multi[i:i + per_stage]:
            expr = f"replace({expr}, '{q(s)}', '{q(r)}')"
        stages.append(expr)
        cur = "t"                        # next stage reads column t
    stages.append(f"translate({cur}, '{q(frm)}', '{q(to)}')")
    return stages


# ---------------------------------------------------------------------------
# IndriAndQuery (core/search/IndriAndQuery.java, IndriAndScorer.java)

INDRI_QUERIES = [(1, ["value", "key"]), (2, ["query", "scan", "sort"]),
                 (3, ["customer", "zzmissing"]), (4, ["the", "table"])]


def ft_indri_and(sf_dir: str) -> pa.Table:
    """IndriAndQuery (core/search/IndriAndQuery.java:33,
    IndriAndScorer.java:36-60): the Indri belief AND — every document
    in the clause UNION scores the boost-weighted MEAN of per-clause
    IndriDirichlet log-probs, where a clause absent from the doc
    contributes its smoothingScore (freq=0 against the doc's own
    norm).  Clauses whose term is missing from the index produce no
    scorer and drop out of the mean (IndriAndWeight.getScorer)."""
    from ..codec import decode_blocks
    from ..lmdirichlet import score_terms_indri

    r = reader_for(sf_dir)
    qids, ranks, docs, scores = [], [], [], []
    for qid, terms in INDRI_QUERIES:
        present = []
        union_docs: dict[int, int] = {}
        for t in terms:
            p = r.postings(t)
            if p is None:
                continue
            d, tf, nm, _ = decode_blocks(p.first_doc, p.n, p.docs_enc,
                                         p.tfs_enc, p.norms_enc)
            lm = r.live_mask(d)
            if lm is not None:
                d, tf, nm = d[lm], tf[lm], nm[lm]
            present.append((p, d, tf, nm))
            for dd, nb in zip(d.tolist(), nm.tolist()):
                union_docs.setdefault(dd, int(nb))
        if not present:
            continue
        uids = np.array(sorted(union_docs), np.int64)
        unb = np.array([union_docs[d] for d in uids.tolist()], np.int64)
        acc = np.zeros(len(uids), np.float64)
        for p, d, tf, nm in present:        # clause order
            full_tf = np.zeros(len(uids), np.int64)
            pos = np.searchsorted(uids, d)
            full_tf[pos] = tf
            s = score_terms_indri(full_tf, unb, p.ttf, r.sum_ttf)
            acc += s.astype(np.float64)
        score32 = (acc / float(len(present))).astype(np.float32)
        top = np.lexsort((uids, -score32.astype(np.float64)))[:10]
        for rank, i in enumerate(top, 1):
            qids.append(qid)
            ranks.append(rank)
            docs.append(int(uids[i]))
            scores.append(float(score32[i]))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "rank": pa.array(ranks, pa.int32()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "score": pa.array(scores, pa.float32())})


def oracle_indri_and_sql() -> str:
    parts = []
    for qid, terms in INDRI_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"""(
  SELECT {qid} AS qid, u.d,
         CAST(sum(CAST(
           CAST(ln((CAST(coalesce(t.tf, 0) AS REAL)
                    + 2000.0 * (CAST(f.ttf AS DOUBLE)
                                / (SELECT sum_ttf FROM stats)))
                   / (q.qlen + 2000.0)) AS REAL)
         AS DOUBLE)) / count(*) AS REAL) AS score
  FROM (SELECT DISTINCT d FROM tf WHERE term IN ({tl})) u
  CROSS JOIN (SELECT term, ttf FROM df WHERE term IN ({tl})) f
  LEFT JOIN tf t ON t.d = u.d AND t.term = f.term
  JOIN quant q ON q.d = u.d
  GROUP BY u.d)""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
totals AS (
{un}
),
ranked AS (
  SELECT qid, d, score, row_number() OVER (
           PARTITION BY qid ORDER BY score DESC, d ASC) AS rank
  FROM totals
)
SELECT qid, rank, d AS doc_id, score FROM ranked WHERE rank <= 10"""


# ---------------------------------------------------------------------------
# HighFreqTerms (misc module)

def ft_high_freq_terms(sf_dir: str):
    """Top-100 terms across ALL indexed fields ordered by totalTermFreq —
    misc/HighFreqTerms.java:99 (``getHighFreqTerms`` with the ``-t``
    TotalTermFreqComparator, :146-160): the queue drains highest-first,
    ties compare ``field.compareTo`` then ``termtext.compareTo``
    (:151-158), i.e. ttf desc, field desc, term desc.  Keyword fields
    (StringField terms, "field:value" rows of the unified dictionary)
    compete with content terms exactly as ``MultiTerms.getTerms`` over
    ``FieldInfos.getIndexedFields`` does (:113-124).  GetTermInfo.java:42
    (single-term df/ttf printout) is the df/ttf columns of one row.

    Distributed: sort + limit over the dictionary Dataset — the
    dictionary never materializes on the driver."""
    import pyarrow.compute as pc
    from ..search import termdict_stats_ds

    r = reader_for(sf_dir)
    kw = list(r.manifest.config.get("keyword_fields") or [])
    dd = termdict_stats_ds(index_dir_for(sf_dir), None)

    def fmt(t: pa.Table) -> pa.Table:
        terms = t.column("term").combine_chunks()
        n = len(terms)
        fields = pa.array(["content"] * n, pa.string())
        texts = terms
        seen = pa.array([False] * n, pa.bool_())
        for f in kw:
            m = pc.and_not(pc.starts_with(terms, f + ":"), seen)
            fields = pc.if_else(m, f, fields)
            texts = pc.if_else(
                m, pc.utf8_slice_codeunits(terms, len(f) + 1, 2**31 - 1),
                texts)
            seen = pc.or_(seen, m)
        return pa.table({"field": fields, "term": texts,
                         "ttf": t.column("ttf").cast(pa.int64()),
                         "df": t.column("df").cast(pa.int64())})

    return (dd.map_batches(fmt, batch_format="pyarrow")
            .sort(["ttf", "field", "term"], descending=[True, True, True])
            .limit(100))


def oracle_high_freq_terms_sql() -> str:
    # Keyword terms join the unified dictionary as 'field:value'; a
    # content token that literally spells a keyword prefix merges with
    # the keyword term (single-namespace dictionary), so the oracle
    # unifies BEFORE labeling, exactly as the engine's dictionary does.
    return f"""WITH {_CORPUS_CTE},
kwt AS (
  SELECT 'repo:' || source AS full_term, count(*) AS kdf
  FROM documents WHERE source IS NOT NULL GROUP BY source
  UNION ALL
  SELECT 'lang:' || lang, count(*)
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
),
unified AS (
  SELECT full_term, CAST(sum(u_df) AS BIGINT) AS df,
         CAST(sum(u_ttf) AS BIGINT) AS ttf
  FROM (
    SELECT term AS full_term, df AS u_df, ttf AS u_ttf FROM df
    UNION ALL
    SELECT full_term, kdf, kdf FROM kwt
  ) GROUP BY full_term
),
labeled AS (
  SELECT CASE WHEN full_term LIKE 'repo:%' THEN 'repo'
              WHEN full_term LIKE 'lang:%' THEN 'lang'
              ELSE 'content' END AS field,
         CASE WHEN full_term LIKE 'repo:%' OR full_term LIKE 'lang:%'
              THEN substr(full_term, 6) ELSE full_term END AS term,
         ttf, df
  FROM unified
)
SELECT field, term, ttf, df FROM labeled
ORDER BY ttf DESC, field DESC, term DESC LIMIT 100"""


# ---------------------------------------------------------------------------
# LatLonBoundingBox — 2D box range field (sandbox module)

# (qid, relation, qlat_lo, qlat_hi, qlon_lo, qlon_hi)
BOX_FIELD_QUERIES = [
    (1, "intersects", 10, 40, 100, 400),
    (2, "within", 0, 60, 0, 1200),
    (3, "contains", 25, 26, 520, 521),
    (4, "crosses", 10, 40, 100, 400),
    (5, "intersects", 55, 56, 990, 1010),
    (6, "within", 30, 35, 400, 500),
    (7, "contains", 18, 30, 200, 300),
]


def ft_box_range_field(sf_dir: str) -> pa.Table:
    """LatLonBoundingBox queries (sandbox/document/LatLonBoundingBox.java:63
    — 2D box-valued range field; newIntersectsQuery/newWithinQuery/
    newContainsQuery/newCrossesQuery :142-205 apply RangeFieldQuery's
    relation per dimension: a 2D relation holds iff the 1D relation
    holds on BOTH axes, CROSSES = intersects ∧ ¬within ∧ ¬contains).

    Each lineitem row carries the box
    lat ∈ [round(l_quantity), +l_linenumber·3],
    lon ∈ [round(l_extendedprice) % 1000, +(l_partkey % 17)];
    the queries count matching rows.  Scale shape identical to
    ft_range_field: map-only per-batch predicate counts + tiny groupby
    (row-group min/max pruning on the four box columns is the 2D
    range-tree analogue)."""
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_linenumber", "l_extendedprice",
                 "l_partkey"])

    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        # DuckDB CAST(DOUBLE AS BIGINT) rounds half TO EVEN (18.5 -> 18,
        # 19.5 -> 20; the away-from-zero rule applies only to DECIMAL) —
        # np.rint is the same rule. l_extendedprice has many .5 values.
        qv = batch.column("l_quantity").to_numpy()
        lat_lo = np.rint(qv).astype(np.int64)
        lat_hi = lat_lo + batch.column("l_linenumber").to_numpy()\
            .astype(np.int64) * 3
        ev = batch.column("l_extendedprice").to_numpy()
        lon_lo = np.rint(ev).astype(np.int64) % 1000
        lon_hi = lon_lo + batch.column("l_partkey").to_numpy()\
            .astype(np.int64) % 17
        qids, ns = [], []
        for qid, rel, a, b, c, d in BOX_FIELD_QUERIES:
            inter = ((lat_lo <= b) & (lat_hi >= a)
                     & (lon_lo <= d) & (lon_hi >= c))
            within = ((lat_lo >= a) & (lat_hi <= b)
                      & (lon_lo >= c) & (lon_hi <= d))
            contains = ((lat_lo <= a) & (lat_hi >= b)
                        & (lon_lo <= c) & (lon_hi >= d))
            m = {"intersects": inter, "within": within,
                 "contains": contains,
                 "crosses": inter & ~within & ~contains}[rel]
            qids.append(qid)
            ns.append(int(m.sum()))
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid").sum("n").to_pandas(), ["qid", "sum(n)"])
    agg = agg.sort_values("qid").reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_box_range_field_sql() -> str:
    parts = []
    for qid, rel, a, b, c, d in BOX_FIELD_QUERIES:
        inter = (f"lat_lo <= {b} AND lat_hi >= {a} "
                 f"AND lon_lo <= {d} AND lon_hi >= {c}")
        within = (f"lat_lo >= {a} AND lat_hi <= {b} "
                  f"AND lon_lo >= {c} AND lon_hi <= {d}")
        contains = (f"lat_lo <= {a} AND lat_hi >= {b} "
                    f"AND lon_lo <= {c} AND lon_hi >= {d}")
        pred = {"intersects": inter, "within": within,
                "contains": contains,
                "crosses": f"({inter}) AND NOT ({within}) "
                           f"AND NOT ({contains})"}[rel]
        parts.append(f"""SELECT {qid} AS qid,
       CAST(count(*) FILTER ({pred}) AS BIGINT) AS n FROM r""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH r AS (
  SELECT CAST(l_quantity AS BIGINT) AS lat_lo,
         CAST(l_quantity AS BIGINT) + l_linenumber * 3 AS lat_hi,
         CAST(l_extendedprice AS BIGINT) % 1000 AS lon_lo,
         CAST(l_extendedprice AS BIGINT) % 1000 + l_partkey % 17 AS lon_hi
  FROM lineitem
)
{un}"""


# ---------------------------------------------------------------------------
# Extended interval algebra battery (queries/intervals — full factory
# surface; see lucene_ray.intervals for the literal iterator
# transcriptions and tests/test_intervals_algebra.py for the reference
# TestIntervals goldens)

def _interval_battery():
    import lucene_ray.intervals as iv
    T = iv.term
    return [
        (1, iv.ordered(T("the"), T("data"))),
        (2, iv.unordered(T("key"), T("agg"))),
        (3, iv.or_(T("vector"), iv.phrase("the", "a"))),
        (4, iv.maxgaps(4, iv.ordered(T("table"), T("value"), T("part")))),
        (5, iv.containing(iv.ordered(T("hash"), T("merge")), T("join"))),
        (6, iv.contained_by(T("sort"),
                            iv.unordered(T("hash"), T("merge")))),
        (7, iv.before(T("query"), T("filter"))),
        (8, iv.after(T("line"), T("query"))),
        (9, iv.at_least(2, T("window"), T("order"), T("column"))),
        (10, iv.within(T("data"), 3, T("stream"))),
        (11, iv.not_within(T("data"), 2, T("the"))),
        (12, iv.unordered_no_overlaps(T("small"), T("big"))),
        (13, iv.ordered(T("key"), iv.fixfield("title", T("value")))),
        (14, iv.not_containing(iv.ordered(T("a"), T("data")), T("the"))),
    ]


def ft_intervals_algebra(sf_dir: str) -> pa.Table:
    """The extended minimal-interval algebra (queries/intervals,
    Intervals.java:69-645): ordered/unordered/or/phrase/maxgaps/
    containing/containedBy/before/after/atLeast/within/notWithin/
    unorderedNoOverlaps/fixField over the corpus, per-doc aggregated
    to (qid, doc_id, n intervals, Σstart, Σend, Σgaps).

    fixField routes into the parallel title-field index (first
    _TITLE_WORDS words, same docIDs), the reference's
    cross-field-intervals use case (FixedFieldIntervalsSource.java).

    Scale shape: candidate docs come from the tree's docID
    approximation over the posting lists (conjunction = intersect,
    disjunction = union, difference = minuend); per-doc evaluation is
    O(positions-in-doc) and runs per doc-range partition inside
    searcher actors at scale — here inline over the small candidate
    sets."""
    import lucene_ray.intervals as iv

    from ..search import _packed_positions, _POS_BITS, _POS_MASK

    r = reader_for(sf_dir)
    rt = IndexReader(title_index_dir_for(sf_dir))
    cache: dict = {}

    def packed(field: str, t: str) -> np.ndarray:
        key = (field, t)
        if key not in cache:
            rd = rt if field == "title" else r
            k = _packed_positions(rd, t, 0)
            cache[key] = k if k is not None and len(k) \
                else np.empty(0, np.uint64)
        return cache[key]

    def docs_of(src: iv.Src, field: str) -> np.ndarray:
        if src.kind == "term":
            return np.unique(
                (packed(field, src.term) >> _POS_BITS).astype(np.int64))
        if src.kind == "fixfield":
            return docs_of(src.subs[0], src.field)
        kind, subs = iv.doc_approx_kind(src)
        if kind == "none":
            return np.empty(0, np.int64)
        sets = [docs_of(s, field) for s in subs]
        if kind == "and":
            out = sets[0]
            for s in sets[1:]:
                out = np.intersect1d(out, s, assume_unique=True)
            return out
        if kind == "or":
            return np.unique(np.concatenate(sets)) if sets \
                else np.empty(0, np.int64)
        return sets[0]                       # 'first' / 'pass'

    out_rows: list[tuple] = []
    for qid, src in _interval_battery():
        cand = docs_of(src, "content")

        def gp(field: str, t: str, _d=[0]) -> list:
            k = packed(field, t)
            lo = np.searchsorted(k, np.uint64(_d[0]) << _POS_BITS)
            hi = np.searchsorted(k, np.uint64(_d[0] + 1) << _POS_BITS)
            return (k[lo:hi] & _POS_MASK).astype(np.int64).tolist()

        for d in cand.tolist():
            gp.__defaults__[0][0] = d
            ivs = iv.eval_doc(src, gp)
            if ivs:
                out_rows.append(
                    (qid, d, len(ivs), sum(x[0] for x in ivs),
                     sum(x[1] for x in ivs), sum(x[2] for x in ivs)))
    cols = list(zip(*out_rows)) if out_rows else [[]] * 6
    return pa.table({
        "qid": pa.array(cols[0], pa.int64()),
        "doc_id": pa.array(cols[1], pa.int64()),
        "n": pa.array(cols[2], pa.int64()),
        "s": pa.array(cols[3], pa.int64()),
        "e": pa.array(cols[4], pa.int64()),
        "g": pa.array(cols[5], pa.int64()),
    })


def oracle_intervals_algebra_sql() -> str:
    """Each battery query's minimal-interval set in closed SQL form:
    ordered pairs via per-end max-start + per-start min-end (proved
    equal to the greedy-minimal set), window/triple queries via reduced
    candidate sets + a containment-minimality NOT EXISTS, the
    derived forms (before/after/within/notWithin) via their
    exists-/not-exists-threshold equivalents (offset clamping at 0
    mirrored with greatest(pos-1, 0))."""
    # shared interval-set builders; every mN CTE is (d, s, e[, g])
    q = []

    def minpair(tag, t1, t2, extra_b=""):
        """Minimal ordered-pair intervals t1 ... t2 (s<e)."""
        return f"""c{tag} AS (
  SELECT b.d, b.pos AS e, max(a.pos) AS s
  FROM w a JOIN w b ON b.d = a.d AND b.pos > a.pos
  WHERE a.word = '{t1}' AND b.word = '{t2}'{extra_b}
  GROUP BY b.d, b.pos
),
m{tag} AS (
  SELECT d, s, min(e) AS e FROM c{tag} GROUP BY d, s
)"""

    # q1: ordered(the, data)
    q.append((1, minpair(1, "the", "data"),
              "SELECT 1 AS qid, d AS doc_id, count(*) AS n, sum(s) AS s, "
              "sum(e) AS e, sum(e - s - 1) AS g FROM m1 GROUP BY d"))
    # q2: unordered(key, agg) — reduced candidates: for each position x
    # of either word, the nearest other-word position below it
    q.append((2, """c2 AS (
  SELECT b.d, b.pos AS e, max(a.pos) AS s
  FROM w a JOIN w b ON b.d = a.d AND b.pos > a.pos
  WHERE (a.word = 'key' AND b.word = 'agg')
     OR (a.word = 'agg' AND b.word = 'key')
  GROUP BY b.d, b.pos
),
m2 AS (
  SELECT DISTINCT d, s, e FROM c2 x
  WHERE NOT EXISTS (SELECT 1 FROM c2 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
)""",
              "SELECT 2, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m2 GROUP BY d"))
    # q3: or(vector, phrase(the, a)) — points + adjacent pairs, closure
    q.append((3, """c3 AS (
  SELECT d, pos AS s, pos AS e FROM w WHERE word = 'vector'
  UNION ALL
  SELECT a.d, a.pos, b.pos FROM w a JOIN w b
    ON b.d = a.d AND b.pos = a.pos + 1
  WHERE a.word = 'the' AND b.word = 'a'
),
m3 AS (
  SELECT DISTINCT d, s, e FROM c3 x
  WHERE NOT EXISTS (SELECT 1 FROM c3 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
)""",
              "SELECT 3, d, count(*), sum(s), sum(e), 0 "
              "FROM m3 GROUP BY d"))
    # q4: maxgaps(4, ordered(table, value, part)) — greedy chain per
    # end, then closure, then the gaps filter
    q.append((4, """c4p AS (
  SELECT b.d, b.pos AS q, max(a.pos) AS p
  FROM w a JOIN w b ON b.d = a.d AND b.pos > a.pos
  WHERE a.word = 'table' AND b.word = 'value' GROUP BY b.d, b.pos
),
c4 AS (
  SELECT c.d, max(p.p) AS s, c.pos AS e
  FROM w c JOIN c4p p ON p.d = c.d AND p.q < c.pos
  WHERE c.word = 'part' GROUP BY c.d, c.pos
),
m4 AS (
  SELECT DISTINCT d, s, e FROM c4 x
  WHERE NOT EXISTS (SELECT 1 FROM c4 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
    AND (e - s + 1) - 3 <= 4
)""",
              "SELECT 4, d, count(*), sum(s), sum(e), sum(e - s - 2) "
              "FROM m4 GROUP BY d"))
    # q5: containing(ordered(hash, merge), join)
    q.append((5, minpair("5p", "hash", "merge") + """,
m5 AS (
  SELECT d, s, e FROM m5p x
  WHERE EXISTS (SELECT 1 FROM w j WHERE j.d = x.d AND j.word = 'join'
                AND j.pos BETWEEN x.s AND x.e)
)""",
              "SELECT 5, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m5 GROUP BY d"))
    # q6: containedBy(sort, unordered(hash, merge))
    q.append((6, """c6 AS (
  SELECT b.d, b.pos AS e, max(a.pos) AS s
  FROM w a JOIN w b ON b.d = a.d AND b.pos > a.pos
  WHERE (a.word = 'hash' AND b.word = 'merge')
     OR (a.word = 'merge' AND b.word = 'hash')
  GROUP BY b.d, b.pos
),
w6 AS (
  SELECT DISTINCT d, s, e FROM c6 x
  WHERE NOT EXISTS (SELECT 1 FROM c6 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
),
m6 AS (
  SELECT p.d, p.pos AS s, p.pos AS e FROM w p
  WHERE p.word = 'sort'
    AND EXISTS (SELECT 1 FROM w6 v WHERE v.d = p.d AND v.s <= p.pos
                AND v.e >= p.pos)
)""",
              "SELECT 6, d, count(*), sum(s), sum(e), 0 "
              "FROM m6 GROUP BY d"))
    # q7: before(query, filter): point <= max(greatest(pf-1, 0))
    q.append((7, """m7 AS (
  SELECT p.d, p.pos AS s, p.pos AS e FROM w p
  WHERE p.word = 'query'
    AND p.pos <= (SELECT max(greatest(f.pos - 1, 0)) FROM w f
                  WHERE f.d = p.d AND f.word = 'filter')
)""",
              "SELECT 7, d, count(*), sum(s), sum(e), 0 "
              "FROM m7 GROUP BY d"))
    # q8: after(line, query): point > min(query pos)
    q.append((8, """m8 AS (
  SELECT p.d, p.pos AS s, p.pos AS e FROM w p
  WHERE p.word = 'line'
    AND p.pos > (SELECT min(f.pos) FROM w f
                 WHERE f.d = p.d AND f.word = 'query')
)""",
              "SELECT 8, d, count(*), sum(s), sum(e), 0 "
              "FROM m8 GROUP BY d"))
    # q9: atLeast(2, window, order, column) — pair windows across
    # distinct sources, closure
    q.append((9, """c9 AS (
  SELECT a.d, least(a.pos, b.pos) AS s, greatest(a.pos, b.pos) AS e
  FROM w a JOIN w b ON b.d = a.d
  WHERE ((a.word = 'window' AND b.word IN ('order', 'column'))
      OR (a.word = 'order' AND b.word = 'column'))
),
m9 AS (
  SELECT DISTINCT d, s, e FROM c9 x
  WHERE NOT EXISTS (SELECT 1 FROM c9 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
)""",
              "SELECT 9, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m9 GROUP BY d"))
    # q10: within(data, 3, stream): exists |pd - ps| <= 3
    q.append((10, """m10 AS (
  SELECT p.d, p.pos AS s, p.pos AS e FROM w p
  WHERE p.word = 'data'
    AND EXISTS (SELECT 1 FROM w f WHERE f.d = p.d AND f.word = 'stream'
                AND abs(f.pos - p.pos) <= 3)
)""",
              "SELECT 10, d, count(*), sum(s), sum(e), 0 "
              "FROM m10 GROUP BY d"))
    # q11: notWithin(data, 2, the): no 'the' within 2 (minuend docs)
    q.append((11, """m11 AS (
  SELECT p.d, p.pos AS s, p.pos AS e FROM w p
  WHERE p.word = 'data'
    AND NOT EXISTS (SELECT 1 FROM w f WHERE f.d = p.d
                    AND f.word = 'the' AND abs(f.pos - p.pos) <= 2)
)""",
              "SELECT 11, d, count(*), sum(s), sum(e), 0 "
              "FROM m11 GROUP BY d"))
    # q12: unorderedNoOverlaps(small, big) — all mixed pairs, closure
    q.append((12, """c12 AS (
  SELECT b.d, b.pos AS e, max(a.pos) AS s
  FROM w a JOIN w b ON b.d = a.d AND b.pos > a.pos
  WHERE (a.word = 'small' AND b.word = 'big')
     OR (a.word = 'big' AND b.word = 'small')
  GROUP BY b.d, b.pos
),
m12 AS (
  SELECT DISTINCT d, s, e FROM c12 x
  WHERE NOT EXISTS (SELECT 1 FROM c12 y WHERE y.d = x.d AND y.s >= x.s
                    AND y.e <= x.e AND (y.s > x.s OR y.e < x.e))
)""",
              "SELECT 12, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m12 GROUP BY d"))
    # q13: ordered(key, fixField(title, value)) — title = first 5
    # words, positions coincide with body positions 0..4
    q.append((13, minpair(13, "key", "value",
                          " AND b.pos < 5"),
              "SELECT 13, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m13 GROUP BY d"))
    # q14: notContaining(ordered(a, data), the)
    q.append((14, minpair("14p", "a", "data") + """,
m14 AS (
  SELECT d, s, e FROM m14p x
  WHERE NOT EXISTS (SELECT 1 FROM w j WHERE j.d = x.d
                    AND j.word = 'the' AND j.pos BETWEEN x.s AND x.e)
)""",
              "SELECT 14, d, count(*), sum(s), sum(e), sum(e - s - 1) "
              "FROM m14 GROUP BY d"))

    ctes = ",\n".join(c for _qid, c, _sel in q)
    sels = "\nUNION ALL\n".join(s for _qid, _c, s in q)
    return f"""WITH {_CORPUS_CTE},
w AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM corpus
),
{ctes}
SELECT CAST(qid AS BIGINT) AS qid, doc_id,
       CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS s,
       CAST(e AS BIGINT) AS e, CAST(g AS BIGINT) AS g
FROM ({sels})"""


# ---------------------------------------------------------------------------
# FunctionQuery over the classic ValueSource family (queries/function)

_FQ_K = 30


def _function_query_source():
    from .. import valuesource as v
    return v.sumf(
        v.product(v.idf("data"), v.tf("data")),
        v.reciprocal(v.int_field(), 0.05, 2.0, 1.0),
        v.linear(v.norm(), 10.0, 0.5),
        v.scale(v.term_freq("the"), 0.0, 1.0),
        v.rangemap(v.tf("key"), 1.0, 2.0, v.const(5.0)),
        v.maxf(v.tf("vector"), v.const(0.3)),
        v.minf(v.term_freq("a"), v.const(4.0)),
        v.powf(v.tf("value"), v.const(1.5)),
        v.divf(v.total_term_freq("merge"), v.sum_total_term_freq()),
    )


_FQ_TERMS = ["data", "the", "key", "vector", "a", "value"]


class _FqCtx:
    """ValueSource evaluation context over the whole index: field_len /
    norm bytes from docmeta, per-term dense freq arrays from decoded
    postings, index stats from the reader.  At cluster scale this is
    per-doc-partition state inside a map_batches stage with the tiny
    stats broadcast; freq arrays come from the same postings partitions
    the searcher reads."""

    def __init__(self, r, sf_dir: str):
        import ray.data

        from ..codec import decode_block
        from ..smallfloat import int_to_byte4

        idx = index_dir_for(sf_dir)
        dm = ray.data.read_parquet(
            os.path.join(idx, "docmeta"),
            columns=["doc_id", "field_len"]).to_pandas()
        dm = dm.sort_values("doc_id")
        self.n_docs = int(r.doc_count)
        self.field_len = np.zeros(self.n_docs, dtype=np.int64)
        self.field_len[dm["doc_id"].to_numpy()] = \
            dm["field_len"].to_numpy().astype(np.int64)
        self.norm_bytes = int_to_byte4(self.field_len).astype(np.int64)
        self.sum_ttf = int(r.sum_ttf)
        self._r = r
        self._freqs: dict[str, np.ndarray] = {}
        self._decode = decode_block

    def freq(self, term: str) -> np.ndarray:
        if term not in self._freqs:
            f = np.zeros(self.n_docs, dtype=np.int64)
            p = self._r.postings(term)
            if p is not None:
                for b in range(len(p.n)):
                    d, tfv, _ = self._decode(
                        int(p.first_doc[b]), int(p.n[b]), p.docs_enc[b],
                        p.tfs_enc[b], p.norms_enc[b])
                    f[d] = tfv
            self._freqs[term] = f
        return self._freqs[term]

    def df(self, term: str) -> int:
        return int((self.freq(term) > 0).sum())

    def ttf(self, term: str) -> int:
        return int(self.freq(term).sum())


def ft_function_query(sf_dir: str) -> pa.Table:
    """FunctionQuery ranking by a composed classic ValueSource
    (queries/function/FunctionQuery.java:130 — boost·val, negatives and
    NaN clamped to 0; valuesource/* — see lucene_ray.valuesource for
    the per-class float32 semantics incl. the NormValueSource norm
    table and ScaleFloatFunction's global min/max pass): top-30 docs by
    (score desc, doc asc) with bit-exact float32 scores."""
    from .. import valuesource as v

    r = reader_for(sf_dir)
    ctx = _FqCtx(r, sf_dir)
    scores = v.function_query_scores(_function_query_source(), ctx)
    order = np.lexsort((np.arange(len(scores)), -scores.astype(np.float64)))
    top = order[:_FQ_K]
    return pa.table({
        "rank": pa.array(np.arange(1, len(top) + 1), pa.int64()),
        "doc_id": pa.array(top.astype(np.int64), pa.int64()),
        "score": pa.array(scores[top], pa.float32()),
    })


def oracle_function_query_sql() -> str:
    from .. import valuesource as v

    class _SqlCtx:
        table = "fvals"
        len_col = "len"
        qlen_col = "qlen"

        def freq_col(self, t):
            return f"f_{t}"

    # stat-constant nodes need the engine-side stats; reproduce them in
    # SQL instead: idf('data') = (float)(ln((N+1)/(df+1)) + 1) and the
    # ttf/sumttf ratio, via scalar subqueries over the corpus CTEs
    sqlctx = _SqlCtx()
    idf_sql = ("CAST(ln((CAST((SELECT n_docs FROM stats) + 1 AS DOUBLE))"
               " / (coalesce((SELECT df FROM df WHERE term = 'data'), 0)"
               " + 1)) + 1.0 AS REAL)")
    ttf_ratio = ("CAST(CAST(CAST(coalesce((SELECT ttf FROM df WHERE "
                 "term = 'merge'), 0) AS REAL) AS DOUBLE) / CAST(CAST("
                 "(SELECT sum_ttf FROM stats) AS REAL) AS DOUBLE) "
                 "AS REAL)")
    # build the chain with placeholder-free sub-SQL: compose manually
    # mirroring _function_query_source term by term
    t_data = v.tf("data").sql(sqlctx)
    p1 = f"CAST(({idf_sql}) * ({t_data}) AS REAL)"
    p2 = v.reciprocal(v.int_field(), 0.05, 2.0, 1.0).sql(sqlctx)
    p3 = v.linear(v.norm(), 10.0, 0.5).sql(sqlctx)
    p4 = v.scale(v.term_freq("the"), 0.0, 1.0).sql(sqlctx)
    p5 = v.rangemap(v.tf("key"), 1.0, 2.0, v.const(5.0)).sql(sqlctx)
    p6 = v.maxf(v.tf("vector"), v.const(0.3)).sql(sqlctx)
    p7 = v.minf(v.term_freq("a"), v.const(4.0)).sql(sqlctx)
    p8 = v.powf(v.tf("value"), v.const(1.5)).sql(sqlctx)
    expr = f"({p1})"
    for p in (p2, p3, p4, p5, p6, p7, p8, ttf_ratio):
        expr = f"CAST({expr} + ({p}) AS REAL)"
    score = (f"CAST(CASE WHEN NOT ({expr} >= 0.0) THEN 0.0 "
             f"ELSE {expr} END AS REAL)")
    fcols = ",\n         ".join(
        f"coalesce((SELECT t.tf FROM tf t WHERE t.d = c.d AND t.term = "
        f"'{t}'), 0) AS f_{t}" for t in _FQ_TERMS)
    return f"""WITH {_CORPUS_CTE},
{_QUANT_LEN},
fvals AS (
  SELECT c.d, dl.len, q.qlen,
         {fcols}
  FROM corpus c JOIN dl ON dl.d = c.d JOIN quant q ON q.d = c.d
),
scored AS (
  SELECT d, {score} AS score FROM fvals
),
ranked AS (
  SELECT d, score, row_number() OVER (ORDER BY score DESC, d) AS rank
  FROM scored
)
SELECT rank, d AS doc_id, score FROM ranked WHERE rank <= {_FQ_K}"""


# ---------------------------------------------------------------------------
# Span family completion: SpanOr, SpanContaining, SpanWithin,
# FieldMaskingSpanQuery, SpanMultiTermQueryWrapper, SpanPayloadCheck

_WPOS_CTE = """wpos AS (
  SELECT d, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM corpus
)"""

# (qid, or-term, phrase pair)
SPAN_OR_QUERIES = [(1, "vector", ("the", "a")),
                   (2, "key", ("slow", "fast"))]
# (qid, big pair, slop, little term)
SPAN_CONTAIN_QUERIES = [(1, ("the", "data"), 3, "a"),
                        (2, ("hash", "merge"), 5, "join")]
SPAN_MASK_QUERIES = [(1, "key", "value", 4)]     # (qid, t1, title t2, slop)
SPAN_MT_PREFIXES = [(1, "val"), (2, "cust")]
SPAN_PAYLOAD_CHECKS = [(1, "key", 120), (2, "table", 300)]  # offset >= C


def _span_pairs(p1: dict, p2: dict, slop: int):
    """NearSpansOrdered matches for two term clauses
    (spans/NearSpansOrdered.java:95-120 stretchToOrder): every first-
    clause position p chains to the FIRST second-clause start >= p+1
    (span ends are exclusive), matchWidth = q - (p+1) <= slop; ALL
    first positions enumerate — spans do not minimize."""
    for d in sorted(p1):
        b = p2.get(d)
        if b is None:
            continue
        a = np.sort(np.asarray(p1[d], np.int64))
        b = np.sort(np.asarray(b, np.int64))
        idx = np.searchsorted(b, a + 1, side="left")
        ok = idx < len(b)
        q = b[np.minimum(idx, len(b) - 1)]
        ok &= (q - (a + 1)) <= slop
        if ok.any():
            yield d, a[ok], q[ok]


def ft_span_or(sf_dir: str) -> pa.Table:
    """SpanOrQuery (queries/spans/SpanOrQuery.java:41): the union of
    sub-span streams merged by (start, end) with NO suppression —
    unlike interval or(), every clause's span is emitted. Clauses: a
    SpanTermQuery plus a slop-0 ordered SpanNearQuery (phrase role).
    Output: per-doc span count, Σstart, Σend (end exclusive,
    Spans.endPosition convention)."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    qids, docs, ns, ss, es = [], [], [], [], []
    for qid, t, (pa_, pb) in SPAN_OR_QUERIES:
        spans: dict[int, list] = {}
        pos_t = _term_positions(r, t) or {}
        for d, p in pos_t.items():
            p = np.asarray(p, np.int64)
            spans.setdefault(d, []).append((p, p + 1))
        for d, s, q in _span_pairs(_term_positions(r, pa_) or {},
                                   _term_positions(r, pb) or {}, 0):
            spans.setdefault(d, []).append((s, q + 1))
        for d in sorted(spans):
            st = np.concatenate([x[0] for x in spans[d]])
            en = np.concatenate([x[1] for x in spans[d]])
            qids.append(qid)
            docs.append(int(d))
            ns.append(len(st))
            ss.append(int(st.sum()))
            es.append(int(en.sum()))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "s": pa.array(ss, pa.int64()),
                     "e": pa.array(es, pa.int64())})


def oracle_span_or_sql() -> str:
    parts = []
    for qid, t, (a, b) in SPAN_OR_QUERIES:
        parts.append(f"""SELECT {qid} AS qid, d AS doc_id,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
       CAST(sum(e) AS BIGINT) AS e
FROM (
  SELECT d, pos AS s, pos + 1 AS e FROM wpos WHERE word = '{t}'
  UNION ALL
  SELECT x.d, x.pos, y.pos + 1 FROM wpos x JOIN wpos y
    ON y.d = x.d AND y.pos = x.pos + 1
  WHERE x.word = '{a}' AND y.word = '{b}'
) GROUP BY d""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_WPOS_CTE}\n{un}"


def ft_span_containing(sf_dir: str) -> pa.Table:
    """SpanContainingQuery + SpanWithinQuery
    (queries/spans/SpanContainingQuery.java:33, SpanWithinQuery.java:33,
    ContainSpans.java:25): big = two-term ordered SpanNearQuery, little
    = a term. 'containing' emits big spans enclosing >= 1 little span;
    'within' emits little spans enclosed by >= 1 big span. Both rows
    per query id with a mode column."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    rows = []
    for qid, (t1, t2), slop, little in SPAN_CONTAIN_QUERIES:
        pl = _term_positions(r, little) or {}
        for d, s, q in _span_pairs(_term_positions(r, t1) or {},
                                   _term_positions(r, t2) or {}, slop):
            lp = np.sort(np.asarray(pl.get(d, ()), np.int64))
            if len(lp):
                # little span [r, r+1) inside big [s, q+1): s<=r<=q
                lo = np.searchsorted(lp, s, side="left")
                hi = np.searchsorted(lp, q, side="right")
                big_keep = hi > lo
                if big_keep.any():
                    rows.append((qid, "containing", int(d),
                                 int(big_keep.sum()),
                                 int(s[big_keep].sum()),
                                 int((q[big_keep] + 1).sum())))
                # little within some big
                inside = np.zeros(len(lp), bool)
                for si, qi in zip(s.tolist(), q.tolist()):
                    inside |= (lp >= si) & (lp <= qi)
                if inside.any():
                    rows.append((qid, "within", int(d),
                                 int(inside.sum()),
                                 int(lp[inside].sum()),
                                 int((lp[inside] + 1).sum())))
    cols = list(zip(*rows)) if rows else [[]] * 6
    return pa.table({"qid": pa.array(cols[0], pa.int64()),
                     "mode": pa.array(cols[1], pa.string()),
                     "doc_id": pa.array(cols[2], pa.int64()),
                     "n": pa.array(cols[3], pa.int64()),
                     "s": pa.array(cols[4], pa.int64()),
                     "e": pa.array(cols[5], pa.int64())})


def oracle_span_containing_sql() -> str:
    parts = []
    for qid, (t1, t2), slop, little in SPAN_CONTAIN_QUERIES:
        big = f"""(
  SELECT x.d, x.pos AS s, y.pos AS q FROM wpos x
  JOIN LATERAL (SELECT min(pos) AS pos FROM wpos y2 WHERE y2.d = x.d
                AND y2.word = '{t2}' AND y2.pos >= x.pos + 1) y ON TRUE
  WHERE x.word = '{t1}' AND y.pos IS NOT NULL
    AND y.pos - (x.pos + 1) <= {slop}
)"""
        parts.append(f"""SELECT {qid} AS qid, 'containing' AS mode,
       d AS doc_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s) AS BIGINT) AS s, CAST(sum(q + 1) AS BIGINT) AS e
FROM {big} bg
WHERE EXISTS (SELECT 1 FROM wpos l WHERE l.d = bg.d
              AND l.word = '{little}'
              AND l.pos BETWEEN bg.s AND bg.q)
GROUP BY d""")
        parts.append(f"""SELECT {qid}, 'within', l.d,
       CAST(count(*) AS BIGINT), CAST(sum(l.pos) AS BIGINT),
       CAST(sum(l.pos + 1) AS BIGINT)
FROM wpos l
WHERE l.word = '{little}'
  AND EXISTS (SELECT 1 FROM {big} bg WHERE bg.d = l.d
              AND l.pos BETWEEN bg.s AND bg.q)
GROUP BY l.d""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_WPOS_CTE}\n{un}"


def ft_span_field_masking(sf_dir: str) -> pa.Table:
    """FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.java:55
    — lie about the field so SpanNearQuery accepts clauses from two
    fields): ordered SpanNear of a body term and a title-field term
    (the parallel title index, positions 0..4 coincide with body
    positions), matchWidth <= slop."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    rt = IndexReader(title_index_dir_for(sf_dir))
    qids, docs, ns, ss, es = [], [], [], [], []
    for qid, t1, t2, slop in SPAN_MASK_QUERIES:
        for d, s, q in _span_pairs(_term_positions(r, t1) or {},
                                   _term_positions(rt, t2) or {}, slop):
            qids.append(qid)
            docs.append(int(d))
            ns.append(len(s))
            ss.append(int(s.sum()))
            es.append(int((q + 1).sum()))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "s": pa.array(ss, pa.int64()),
                     "e": pa.array(es, pa.int64())})


def oracle_span_field_masking_sql() -> str:
    parts = []
    for qid, t1, t2, slop in SPAN_MASK_QUERIES:
        parts.append(f"""SELECT {qid} AS qid, d AS doc_id,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
       CAST(sum(q + 1) AS BIGINT) AS e
FROM (
  SELECT x.d, x.pos AS s, y.pos AS q FROM wpos x
  JOIN LATERAL (SELECT min(pos) AS pos FROM wpos y2 WHERE y2.d = x.d
                AND y2.word = '{t2}' AND y2.pos >= x.pos + 1
                AND y2.pos < 5) y ON TRUE
  WHERE x.word = '{t1}' AND y.pos IS NOT NULL
    AND y.pos - (x.pos + 1) <= {slop}
) GROUP BY d""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_WPOS_CTE}\n{un}"


def ft_span_multiterm(sf_dir: str) -> pa.Table:
    """SpanMultiTermQueryWrapper (queries/spans/
    SpanMultiTermQueryWrapper.java:49) with a PrefixQuery: rewrites to a
    SpanOrQuery over every matching term's spans
    (SpanOrTermsBuilder role) — per doc the span count and Σposition
    across ALL prefix-matched terms."""
    from ..search import _term_positions, termdict_scan

    r = reader_for(sf_dir)
    qids, docs, ns, ss = [], [], [], []
    for qid, p in SPAN_MT_PREFIXES:
        terms = _content_only(r, termdict_scan(r, prefix=p))\
            .column("term").to_pylist()
        agg: dict[int, tuple[int, int]] = {}
        for t in terms:
            for d, pos in (_term_positions(r, t) or {}).items():
                pos = np.asarray(pos, np.int64)
                n0, s0 = agg.get(d, (0, 0))
                agg[d] = (n0 + len(pos), s0 + int(pos.sum()))
        for d in sorted(agg):
            qids.append(qid)
            docs.append(int(d))
            ns.append(agg[d][0])
            ss.append(agg[d][1])
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "s": pa.array(ss, pa.int64())})


def oracle_span_multiterm_sql() -> str:
    parts = []
    for qid, p in SPAN_MT_PREFIXES:
        parts.append(
            f"SELECT {qid} AS qid, d AS doc_id, "
            f"CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(pos) AS BIGINT) AS s "
            f"FROM wpos WHERE word LIKE '{p}%' GROUP BY d")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_CORPUS_CTE},\n{_WPOS_CTE}\n{un}"


def ft_span_payload_check(sf_dir: str) -> pa.Table:
    """SpanPayloadCheckQuery (queries/payloads/
    SpanPayloadCheckQuery.java:54, MatchOperation.GTE over INT
    payloads): term spans whose payload — the token's start offset, the
    TokenOffsetPayloadTokenFilter payload convention this index stores
    — is >= the threshold."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    qids, docs, ns, ss = [], [], [], []
    for qid, term, thresh in SPAN_PAYLOAD_CHECKS:
        pos_of = _term_positions(r, term) or {}
        dl = sorted(pos_of)
        if not dl:
            continue
        starts = _payload_starts(idx, dl)
        for d in dl:
            p = np.asarray(pos_of[d], np.int64)
            st = starts[d][p]
            keep = st >= thresh
            if keep.any():
                qids.append(qid)
                docs.append(int(d))
                ns.append(int(keep.sum()))
                ss.append(int(p[keep].sum()))
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "s": pa.array(ss, pa.int64())})


def oracle_span_payload_check_sql() -> str:
    # start offset of token i = Σ_{j<i} (len(word_j) + 1)
    parts = []
    for qid, term, thresh in SPAN_PAYLOAD_CHECKS:
        parts.append(f"""SELECT {qid} AS qid, d AS doc_id,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS s
FROM woff WHERE word = '{term}' AND off >= {thresh} GROUP BY d""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},
{_WPOS_CTE},
woff AS (
  SELECT d, word, pos,
         CAST(coalesce(sum(len(word) + 1) OVER (
           PARTITION BY d ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS off
  FROM wpos
)
{un}"""


# ---------------------------------------------------------------------------
# MemoryIndex percolation scoring (memory module)

# qid -> clause list for MemoryIndex.search
MEMINDEX_QUERIES = [
    (1, [("term", "key"), ("term", "agg")]),
    (2, [("term", "vector"), ("phrase", ["the", "a"])]),
    (3, [("must", "key"), ("term", "scan")]),
]


class _MemIndexStage:
    """Actor-pool map_batches stage: the query battery compiles once per
    actor (__init__); each row builds a MemoryIndex from its text and
    scores every query — percolation's document side, a pure map."""

    def __init__(self):
        from ..memindex import MemoryIndex
        self._mk = MemoryIndex
        self.queries = MEMINDEX_QUERIES

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, docs, scores = [], [], []
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        mi = self._mk(store_offsets=False)
        for did, text in zip(ids, texts):
            mi.reset()
            mi.add_field("content", text or "")
            for qid, clauses in self.queries:
                s = mi.search(clauses)
                if s > 0:
                    qids.append(qid)
                    docs.append(did)
                    scores.append(s)
        return pa.table({
            "qid": pa.array(qids, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "score": pa.array(np.array(scores, np.float32),
                              pa.float32())})


def ft_memory_index(sf_dir: str):
    """MemoryIndex (memory/.../MemoryIndex.java:186): per document a
    single-doc in-RAM index; search(query) under default BM25 returns
    the doc's score with the SINGLE-DOC collection stats (docCount 1,
    df 1, avgdl = the doc's own exact length, dl quantized) or 0 on no
    match (:1081-1123). Battery: SHOULD sums, a phrase clause, a MUST
    gate. Emits (qid, doc_id, float32 score) for matches."""
    import ray.data

    from lucene_ray.pipelines.util import typed_table

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    out = ds.map_batches(_MemIndexStage, batch_format="pyarrow",
                         concurrency=2)
    return typed_table(out, pa.schema([("qid", pa.int64()),
                                       ("doc_id", pa.int64()),
                                       ("score", pa.float32())]))



# shared single-document BM25 SQL fragments (MemoryIndex / ScoringMatch
# oracles): per-doc token stats CTEs + the float32 clause chain
_SINGLE_DOC_CTES = """wpos AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents
),
tfd AS (
  SELECT doc_id, word, count(*) AS tf FROM wpos GROUP BY doc_id, word
),
dl1 AS (
  SELECT d.doc_id, count(w.word) AS len
  FROM documents d LEFT JOIN wpos w ON w.doc_id = d.doc_id
  GROUP BY d.doc_id
),
stats1 AS (
  SELECT doc_id, len,
    CASE WHEN len < 24 THEN len
         ELSE 24 + (
           CASE WHEN (len - 24) < 8 THEN (len - 24)
                ELSE (((len - 24) >> (CAST(floor(log2(len - 24)) AS INT) - 3)) & 7 | 8)
                     << (CAST(floor(log2(len - 24)) AS INT) - 3)
           END)
    END AS qlen
  FROM dl1
)"""

_SD_IDF = "CAST(ln(1 + 0.5 / 1.5) AS REAL)"


def _sd_clause(tf_expr: str) -> str:
    """Single-doc BM25 clause chain (df=1, N=1, avgdl=len)."""
    inv = ("(CAST(1.0 AS REAL) / (CAST(1.2 AS REAL) * "
           "(CAST(0.25 AS REAL) + CAST(0.75 AS REAL) * "
           "CAST(qlen AS REAL) / CAST(len AS REAL))))")
    return (f"CAST({_SD_IDF} - {_SD_IDF} / (CAST(1.0 AS REAL) + "
            f"CAST({tf_expr} AS REAL) * {inv}) AS REAL)")


def _sd_tf_term(t: str) -> str:
    return (f"coalesce((SELECT t.tf FROM tfd t WHERE t.doc_id = "
            f"s.doc_id AND t.word = '{t}'), 0)")


def oracle_memory_index_sql() -> str:
    def tf_phrase(a: str, b: str) -> str:
        return (f"(SELECT count(*) FROM wpos x JOIN wpos y ON "
                f"y.doc_id = x.doc_id AND y.pos = x.pos + 1 "
                f"WHERE x.doc_id = s.doc_id AND x.word = '{a}' "
                f"AND y.word = '{b}')")

    parts = []
    for qid, clauses in MEMINDEX_QUERIES:
        tf_exprs, gates = [], []
        for kind, spec in clauses:
            tfe = tf_phrase(*spec) if kind == "phrase" \
                else _sd_tf_term(spec)
            tf_exprs.append(tfe)
            if kind == "must":
                gates.append(f"({tfe}) > 0")
        score_terms = " + ".join(
            f"CASE WHEN ({t}) > 0 THEN "
            f"CAST({_sd_clause(f'({t})')} AS DOUBLE)"
            f" ELSE 0.0 END" for t in tf_exprs)
        matched = " OR ".join(f"({t}) > 0" for t in tf_exprs)
        where = f"({matched})"
        if gates:
            where += " AND " + " AND ".join(gates)
        parts.append(f"""SELECT {qid} AS qid, s.doc_id,
       CAST({score_terms} AS REAL) AS score
FROM stats1 s WHERE {where}""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_SINGLE_DOC_CTES}\n{un}"


# ---------------------------------------------------------------------------
# Classic Highlighter (highlighter/search/highlight/Highlighter.java)

# (qid, [terms], fragment_size, max_num_fragments)
CLASSIC_HL_QUERIES = [
    (1, ["key", "agg"], 60, 3),
    (2, ["slow", "fast", "table"], 80, 2),
]


def classic_highlight_fragments(ends: np.ndarray, terms: list[str],
                                weights: dict, query_terms: list[str],
                                fragment_size: int) -> list:
    """The classic Highlighter walk (Highlighter.java:161-270 with
    SimpleFragmenter + QueryTermScorer):

    - fragment assignment: token 1 opens fragment 1; at each LATER
      token's arrival (the previous one-token group flushes) the
      fragmenter checks ``endOffset >= fragmentSize * currentNumFrags``
      and increments AT MOST ONCE (SimpleFragmenter.java:56-62 — a
      token jumping several fragment widths still advances one);
    - fragment score: float32 sum of DISTINCT matched query-term
      weights in first-occurrence order
      (QueryTermScorer.java:89-101 uniqueTermsInFragment).

    Returns [(frag_num 1-based, float32 score)] for every fragment."""
    k = 1
    frag_of = np.empty(len(ends), np.int64)
    for i, e in enumerate(ends):
        if i > 0 and e >= fragment_size * k:
            k += 1
        frag_of[i] = k
    scores: dict[int, np.float32] = {}
    seen: dict[int, set] = {}
    qset = set(query_terms)
    for i, t in enumerate(terms):
        f = int(frag_of[i])
        scores.setdefault(f, np.float32(0.0))
        s = seen.setdefault(f, set())
        if t in qset and t not in s:
            scores[f] = scores[f] + weights[t]
            s.add(t)
    n_frags = int(frag_of[-1]) if len(frag_of) else 0
    return [(f, scores.get(f, np.float32(0.0)))
            for f in range(1, n_frags + 1)]


def _classic_hl_weights(r, terms: list[str]) -> dict:
    """QueryTermExtractor.getIdfWeightedTerms
    (highlight/QueryTermExtractor.java:71-88): weight = (float)(
    log(maxDoc / (double)(docFreq + 1)) + 1.0), ClassicSimilarity's
    idf."""
    import math
    out = {}
    n = int(r.doc_count)
    for t in terms:
        p = r.postings(t)
        df = int(p.df) if p is not None else 0
        out[t] = np.float32(math.log(n / float(df + 1)) + 1.0)
    return out


def ft_classic_highlight(sf_dir: str) -> pa.Table:
    """Classic Highlighter getBestFragments
    (Highlighter.java:117-136,399-411): per matching doc the top
    fragments by (score desc, fragNum asc), zero-score fragments
    dropped; QueryTermScorer idf weights from the index.  Output
    (qid, doc_id, rank, frag, score float32)."""
    from ..analysis import tokenize_with_offsets
    from ..search import _term_positions

    r = reader_for(sf_dir)
    import pyarrow.parquet as pq_
    rows = []
    # authoritative index docID -> original row mapping via docmeta's
    # stored path (the same source ft_sorted_numeric_selector uses),
    # read once for all queries
    dm = pq_.read_table(os.path.join(index_dir_for(sf_dir), "docmeta"),
                        columns=["doc_id", "path"])
    orig_of = {d: int(p[4:12]) for d, p in
               zip(dm.column("doc_id").to_pylist(),
                   dm.column("path").to_pylist())}
    docs_tbl = pq_.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"])
    text_of = dict(zip(docs_tbl.column("doc_id").to_pylist(),
                       docs_tbl.column("text").to_pylist()))
    for qid, qterms, fs, maxn in CLASSIC_HL_QUERIES:
        weights = _classic_hl_weights(r, qterms)
        cand = set()
        for t in qterms:
            cand.update((_term_positions(r, t) or {}).keys())
        cand = sorted(cand)
        if not cand:
            continue
        for d in cand:
            text = text_of.get(orig_of[d]) or ""
            toks, _starts, ends = tokenize_with_offsets(text)
            if not toks:
                continue
            frags = classic_highlight_fragments(
                ends, toks, weights, qterms, fs)
            best = sorted([x for x in frags if x[1] > 0],
                          key=lambda x: (-float(x[1]), x[0]))[:maxn]
            for rank, (f, s) in enumerate(best, 1):
                rows.append((qid, int(d), rank, f, s))
    cols = list(zip(*rows)) if rows else [[]] * 5
    return pa.table({
        "qid": pa.array(cols[0], pa.int64()),
        "doc_id": pa.array(cols[1], pa.int64()),
        "rank": pa.array(cols[2], pa.int64()),
        "frag": pa.array(cols[3], pa.int64()),
        "score": pa.array(np.array(cols[4], np.float32), pa.float32()),
    })


def oracle_classic_highlight_sql() -> str:
    import itertools
    import math

    import duckdb  # noqa: F401  (documents the dependency)

    parts = []
    for qid, qterms, fs, maxn in CLASSIC_HL_QUERIES:
        tl = ", ".join(f"'{t}'" for t in qterms)
        # weight literals are NOT precomputable (df comes from the
        # corpus); compute float32 idf per term in SQL, then map each
        # first-occurrence-ordered distinct-term sequence to its float32
        # running sum with nested REAL casts over the per-term weights
        w = {t: (f"CAST(ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) "
                 f"/ (coalesce((SELECT df FROM df WHERE term = '{t}'), 0)"
                 f" + 1)) + 1.0 AS REAL)") for t in qterms}
        seq_cases = []
        for r_ in range(1, len(qterms) + 1):
            for perm in itertools.permutations(qterms, r_):
                expr = w[perm[0]]
                for t in perm[1:]:
                    expr = f"CAST({expr} + {w[t]} AS REAL)"
                lst = ", ".join(f"'{t}'" for t in perm)
                seq_cases.append(f"WHEN seq = [{lst}] THEN {expr}")
        case = "CASE " + " ".join(seq_cases) + " ELSE 0.0 END"
        parts.append(f"""SELECT {qid} AS qid, doc_id, rank, frag, score
FROM (
  SELECT doc_id, frag, score, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, frag) AS rank
  FROM (
    SELECT doc_id, frag, CAST({case} AS REAL) AS score
    FROM (
      SELECT m.doc_id, m.frag, list(m.term ORDER BY m.fp) AS seq
      FROM (
        SELECT t.doc_id, f.k AS frag, t.word AS term, min(t.i) AS fp
        FROM toks{fs} t JOIN walk{fs} f
          ON f.doc_id = t.doc_id AND f.i = t.i
        WHERE t.word IN ({tl})
        GROUP BY t.doc_id, f.k, t.word
      ) m GROUP BY m.doc_id, m.frag
    )
  ) WHERE score > 0
) WHERE rank <= {maxn}""")
    un = "\nUNION ALL\n".join(parts)
    # per-fragment-size token tables + the stateful fragment walk
    tok_ctes = []
    for fs in sorted({fs for _q, _t, fs, _m in CLASSIC_HL_QUERIES}):
        tok_ctes.append(f"""toks{fs} AS (
  SELECT d AS doc_id, pos + 1 AS i, word,
         CAST(sum(len(word) + 1) OVER (
           PARTITION BY d ORDER BY pos) AS BIGINT) - 1 AS endoff
  FROM wpos
),
nmax{fs} AS (
  SELECT doc_id, max(i) AS n FROM toks{fs} GROUP BY doc_id
),
walk{fs} AS (
  SELECT doc_id, 1 AS i, 1 AS k FROM nmax{fs}
  UNION ALL
  SELECT w.doc_id, w.i + 1,
         w.k + CASE WHEN t.endoff >= {fs} * w.k THEN 1 ELSE 0 END
  FROM walk{fs} w JOIN toks{fs} t
    ON t.doc_id = w.doc_id AND t.i = w.i + 1
)""")
    ctes = ",\n".join(tok_ctes)
    return f"""WITH RECURSIVE {_CORPUS_CTE},
{_WPOS_CTE},
{ctes}
{un}"""


# ---------------------------------------------------------------------------
# FastVectorHighlighter (highlighter/vectorhighlight)

# (qid, [terms], fragCharSize, maxNumFragments)
FVH_QUERIES = [
    (1, ["key", "agg"], 50, 3),
    (2, ["slow", "fast", "table"], 60, 2),
]
_FVH_MARGIN = 6          # BaseFragListBuilder.MARGIN_DEFAULT


def fvh_fragments(occs: list, frag_char_size: int) -> list:
    """BaseFragListBuilder.createFieldFragList
    (vectorhighlight/BaseFragListBuilder.java:47-106) +
    WeightedFieldFragList.add (WeightedFieldFragList.java:42-81) for
    term-query phrase infos (one TermInfo per WeightedPhraseInfo,
    boost 1, always accepted by acceptPhrase :120).

    ``occs``: [(term, start_off, end_off, weight)] sorted by position.
    Returns [(frag_start, frag_end, float32 totalBoost)].

    Walk: the first info with start >= frontier opens a fragment;
    spanStart = max(start - margin, frontier), spanEnd = max(end,
    spanStart + fragCharSize); following infos with end <= spanEnd
    join (stop at the FIRST violator); then the span re-centers:
    matchLen = lastEnd - firstStart, newMargin = max(0,
    (fragCharSize - matchLen) int-div 2), spanStart' = max(firstStart
    - newMargin, frontier), spanEnd' = spanStart' + max(matchLen,
    fragCharSize) = the next frontier.

    Scoring: norm = (float)length * (1f / (float)sqrt(length)) over the
    TOTAL term count; each phrase contributes weight·boost once per
    DISTINCT term text (first occurrence), times norm; totalBoost is
    the float32 running sum."""
    import math

    out = []
    frontier = 0
    i = 0
    n = len(occs)
    while i < n:
        if occs[i][1] < frontier:
            i += 1
            continue
        j = i
        first_s = occs[j][1]
        span_start = max(first_s - _FVH_MARGIN, frontier)
        span_end = max(occs[j][2], span_start + frag_char_size)
        m = j
        k = j + 1
        while k < n and occs[k][2] <= span_end:
            m = k
            k += 1
        last_e = occs[m][2]
        match_len = last_e - first_s
        new_margin = max(0, int((frag_char_size - match_len) / 2))
        span_start2 = max(first_s - new_margin, frontier)
        span_end2 = span_start2 + max(match_len, frag_char_size)
        members = occs[j:m + 1]
        length = len(members)
        norm = np.float32(length) * (
            np.float32(1.0) / np.float32(math.sqrt(length)))
        seen: set = set()
        total = np.float32(0.0)
        for t, _s, _e, w in members:
            pb = np.float32(w) if t not in seen else np.float32(0.0)
            seen.add(t)
            total = total + pb * norm
        out.append((span_start2, span_end2, total))
        frontier = span_end2
        i = m + 1
    return out


def ft_fvh_highlight(sf_dir: str) -> pa.Table:
    """FastVectorHighlighter
    (vectorhighlight/FastVectorHighlighter.java:33: FieldTermStack →
    FieldPhraseList → WeightedFragListBuilder →
    ScoreOrderFragmentsBuilder): fragments scored by the
    distinct-term-weight · length-norm boost, ordered score desc then
    startOffset asc (ScoreOrderFragmentsBuilder.ScoreComparator:58-70),
    top maxNumFragments per doc.  Term weights are ClassicSimilarity
    idf over the index (FieldTermStack.java:88-92).  The term stack
    reads positions from the positional postings and char offsets from
    the offsets forward store — the term-vector role."""
    from ..search import _term_positions

    r = reader_for(sf_dir)
    idx = index_dir_for(sf_dir)
    rows = []
    for qid, qterms, fs, maxn in FVH_QUERIES:
        weights = _classic_hl_weights(r, qterms)
        pos_of = {t: (_term_positions(r, t) or {}) for t in qterms}
        cand = sorted(set().union(*[set(p) for p in pos_of.values()]))
        if not cand:
            continue
        starts = _payload_starts(idx, cand)
        for d in cand:
            occ = []
            for t in qterms:
                for p in np.asarray(pos_of[t].get(d, ()),
                                    np.int64).tolist():
                    so = int(starts[d][p])
                    occ.append((p, t, so, so + len(t)))
            occ.sort()
            occs = [(t, so, eo, weights[t]) for _p, t, so, eo in occ]
            frags = fvh_fragments(occs, fs)
            best = sorted(frags, key=lambda x: (-float(x[2]), x[0]))
            for rank, (s, e, b) in enumerate(best[:maxn], 1):
                rows.append((qid, int(d), rank, s, e, b))
    cols = list(zip(*rows)) if rows else [[]] * 6
    return pa.table({
        "qid": pa.array(cols[0], pa.int64()),
        "doc_id": pa.array(cols[1], pa.int64()),
        "rank": pa.array(cols[2], pa.int64()),
        "fstart": pa.array(cols[3], pa.int64()),
        "fend": pa.array(cols[4], pa.int64()),
        "boost": pa.array(np.array(cols[5], np.float32), pa.float32()),
    })


def oracle_fvh_highlight_sql() -> str:
    import itertools

    parts, ctes = [], []
    for qid, qterms, fs, maxn in FVH_QUERIES:
        tl = ", ".join(f"'{t}'" for t in qterms)
        tag = f"q{qid}"
        # occurrence stack: query-term occurrences in position order
        # with char offsets (start = running length sum) and idf weight
        ctes.append(f"""occs_{tag} AS (
  SELECT doc_id, row_number() OVER (
           PARTITION BY doc_id ORDER BY pos) AS idx, word AS term,
         soff AS s, soff + len(word) AS e
  FROM (
    SELECT d AS doc_id, pos, word,
           CAST(coalesce(sum(len(word) + 1) OVER (
             PARTITION BY d ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS soff
    FROM wpos
  ) WHERE word IN ({tl})
),
walk_{tag} AS (
  SELECT doc_id, 0 AS frag, 0 AS frontier, 1 AS next_i,
         0 AS fs_start, 0 AS fs_end, 0 AS jj, 0 AS mm
  FROM (SELECT DISTINCT doc_id FROM occs_{tag})
  UNION ALL
  SELECT doc_id, frag + 1,
         span_start2 + greatest(match_len, {fs}) AS frontier,
         mm + 1 AS next_i,
         span_start2 AS fs_start,
         span_start2 + greatest(match_len, {fs}) AS fs_end,
         jj, mm
  FROM (
    SELECT doc_id, frag, frontier, jj, mm,
           e_m - s_j AS match_len,
           greatest(s_j - greatest(0, ({fs} - (e_m - s_j)) // 2),
                    frontier) AS span_start2
    FROM (
      SELECT doc_id, frag, frontier, jj,
        (SELECT o.s FROM occs_{tag} o WHERE o.doc_id = q1.doc_id
          AND o.idx = q1.jj) AS s_j,
        (SELECT coalesce(
           (SELECT min(o2.idx) - 1 FROM occs_{tag} o2
             WHERE o2.doc_id = q1.doc_id AND o2.idx > q1.jj
             AND o2.e > greatest(
               (SELECT o3.e FROM occs_{tag} o3
                 WHERE o3.doc_id = q1.doc_id AND o3.idx = q1.jj),
               greatest((SELECT o4.s FROM occs_{tag} o4
                          WHERE o4.doc_id = q1.doc_id
                          AND o4.idx = q1.jj) - {_FVH_MARGIN},
                        q1.frontier) + {fs})),
           (SELECT max(o5.idx) FROM occs_{tag} o5
             WHERE o5.doc_id = q1.doc_id))) AS mm
      FROM (
        SELECT w0.doc_id, w0.frag, w0.frontier,
          (SELECT min(o.idx) FROM occs_{tag} o
            WHERE o.doc_id = w0.doc_id AND o.idx >= w0.next_i
            AND o.s >= w0.frontier) AS jj
        FROM walk_{tag} w0
      ) q1
      WHERE jj IS NOT NULL
    ) q2,
    LATERAL (SELECT (SELECT o.e FROM occs_{tag} o
                      WHERE o.doc_id = q2.doc_id
                      AND o.idx = q2.mm) AS e_m) q3
  )
)""")
        # float32 idf weight per term, norm, and the ordered distinct
        # first-occurrence sum as a permutation CASE
        w = {t: (f"CAST(ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) "
                 f"/ (coalesce((SELECT df FROM df WHERE term = '{t}'), "
                 f"0) + 1)) + 1.0 AS REAL)") for t in qterms}
        norm = ("CAST(CAST(length AS REAL) * CAST(1.0 / "
                "CAST(sqrt(CAST(length AS DOUBLE)) AS REAL) AS REAL) "
                "AS REAL)")
        seq_cases = []
        for r_ in range(1, len(qterms) + 1):
            for perm in itertools.permutations(qterms, r_):
                expr = f"CAST({w[perm[0]]} * {norm} AS REAL)"
                for t in perm[1:]:
                    expr = (f"CAST({expr} + CAST({w[t]} * {norm} "
                            f"AS REAL) AS REAL)")
                lst = ", ".join(f"'{t}'" for t in perm)
                seq_cases.append(f"WHEN seq = [{lst}] THEN {expr}")
        case = "CASE " + " ".join(seq_cases) + " ELSE 0.0 END"
        parts.append(f"""SELECT {qid} AS qid, doc_id, rank,
       fs_start AS fstart, fs_end AS fend, boost
FROM (
  SELECT doc_id, fs_start, fs_end, boost, row_number() OVER (
           PARTITION BY doc_id
           ORDER BY boost DESC, fs_start) AS rank
  FROM (
    SELECT f.doc_id, f.fs_start, f.fs_end,
           CAST({case} AS REAL) AS boost
    FROM (
      SELECT wk.doc_id, wk.fs_start, wk.fs_end,
             wk.mm - wk.jj + 1 AS length,
             (SELECT list(t.term ORDER BY t.fp) FROM (
                SELECT o.term, min(o.idx) AS fp FROM occs_{tag} o
                WHERE o.doc_id = wk.doc_id
                  AND o.idx BETWEEN wk.jj AND wk.mm
                GROUP BY o.term) t) AS seq
      FROM walk_{tag} wk WHERE wk.frag > 0
    ) f
  )
) WHERE rank <= {maxn}""")
    cte_sql = ",\n".join(ctes)
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH RECURSIVE {_CORPUS_CTE},
{_WPOS_CTE},
{cte_sql}
{un}"""


def ft_polish_stempel(sf_dir: str) -> pa.Table:
    """Stempel Polish stemming (analysis/stempel — StempelFilter.java:71
    over the bundled Egothor MultiTrie2 table, PolishAnalyzer.java:135
    chain: lowercase -> stop -> stempel): planted Polish via diacritic
    substitution + hash-chosen inflection endings (-a/-ami/-ów/-ach/
    -ego/-y) so the trie's suffix families fire.  Rows-only: the stem
    is a trie-of-diff-patches lookup (2.2 MB binary table) with no SQL
    form; the loader, walk and patch machinery are gated on the
    reference's PolishAnalyzer tests and pinned regressions in
    tests/test_stempel.py."""
    from ..stempel import load_table, polish_analyze

    table = load_table()
    plant = str.maketrans("xqv", "żłś")
    suf = ["a", "ami", "ów", "ach", "ego", "y"]

    def toks(tx: str, d: int) -> list[str]:
        ws = [w.translate(plant) for w in _words(tx)]
        return polish_analyze(
            [w + suf[len(w) % 6] for w in ws], table)

    return _rawtok_stats(sf_dir, toks)


# ---------------------------------------------------------------------------
# ScoringMatch percolation (monitor module)

PERC_SCORED_QUERIES = [
    (1, {"should": ["key", "agg"]}),
    (2, {"should": ["vector", "window"]}),
    (3, {"must": ["key", "scan"]}),
]


def ft_percolate_scored(sf_dir: str):
    """Monitor ScoringMatch (monitor/ScoringMatch.java:27-47 +
    QueryDecomposer.java:34): percolate the corpus against registered
    queries, reporting per-match scores under the single-doc searcher;
    decomposed disjunction matches resolve by FLOAT pairwise addition,
    whole MUST queries score with BooleanQuery's double sum — both
    reproduced bit-exactly (see monitor.ScoredPercolatorStage)."""
    import ray.data

    from lucene_ray.pipelines.util import typed_table

    from ..monitor import percolate_scored

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    out = percolate_scored(ds, PERC_SCORED_QUERIES, concurrency=2)
    return typed_table(out, pa.schema([("qid", pa.int64()),
                                       ("doc_id", pa.int64()),
                                       ("score", pa.float32())]))


def oracle_percolate_scored_sql() -> str:
    parts = []
    for qid, spec in PERC_SCORED_QUERIES:
        if "must" in spec:
            terms = spec["must"]
            gates = " AND ".join(f"({_sd_tf_term(t)}) > 0"
                                 for t in terms)
            total = " + ".join(
                f"CAST({_sd_clause(f'({_sd_tf_term(t)})')} AS DOUBLE)"
                for t in terms)
            parts.append(f"""SELECT {qid} AS qid, s.doc_id,
       CAST({total} AS REAL) AS score
FROM stats1 s WHERE {gates}""")
        else:
            a, b = spec["should"]
            ca = _sd_clause(f"({_sd_tf_term(a)})")
            cb = _sd_clause(f"({_sd_tf_term(b)})")
            # float pairwise resolve: one REAL add when both match
            score = (f"CASE WHEN ({_sd_tf_term(a)}) > 0 AND "
                     f"({_sd_tf_term(b)}) > 0 THEN CAST({ca} + {cb} "
                     f"AS REAL) "
                     f"WHEN ({_sd_tf_term(a)}) > 0 THEN {ca} "
                     f"ELSE {cb} END")
            parts.append(f"""SELECT {qid} AS qid, s.doc_id,
       CAST({score} AS REAL) AS score
FROM stats1 s
WHERE ({_sd_tf_term(a)}) > 0 OR ({_sd_tf_term(b)}) > 0""")
    un = "\nUNION ALL\n".join(parts)
    return f"WITH {_SINGLE_DOC_CTES}\n{un}"


# ---------------------------------------------------------------------------
# SortedSetDocValuesMultiRangeQuery (sandbox)

# (qid, [(lower, upper)]) — inclusive byte ranges over the doc's
# sorted-set of keyword values {source, lang}
SSDV_MULTI_RANGES = [
    (1, [("a", "m")]),
    (2, [("d", "f"), ("p", "pz")]),
    (3, [("s", "src1"), ("zz", "zzz")]),
]


def ft_ssdv_multi_range(sf_dir: str) -> pa.Table:
    """SortedSetDocValuesMultiRangeQuery (sandbox/search/
    SortedSetDocValuesMultiRangeQuery.java:50): a doc matches when AT
    LEAST ONE of its sorted-set values falls inside the union of
    inclusive byte ranges (ranges coalesce over ordinals; the scorer
    is a constant-score two-phase check). The doc's set here is
    {source, lang} — the two keyword fields as one sorted-set field.
    Map-only per-batch counts + a tiny groupby."""
    import ray.data

    import pyarrow.compute as pc

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])
    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        src = batch.column("source")
        lg = batch.column("lang")
        qids, ns = [], []
        for qid, ranges in SSDV_MULTI_RANGES:
            m = None
            for col in (src, lg):
                for lo, hi in ranges:
                    mm = pc.and_(pc.greater_equal(col, lo),
                                 pc.less_equal(col, hi))
                    mm = pc.fill_null(mm, False)
                    m = mm if m is None else pc.or_(m, mm)
            qids.append(qid)
            ns.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid").sum("n").to_pandas(), ["qid", "sum(n)"])
    agg = agg.sort_values("qid").reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_ssdv_multi_range_sql() -> str:
    parts = []
    for qid, ranges in SSDV_MULTI_RANGES:
        conds = []
        for col in ("source", "lang"):
            for lo, hi in ranges:
                conds.append(f"({col} >= '{lo}' AND {col} <= '{hi}')")
        pred = " OR ".join(conds)
        parts.append(f"SELECT {qid} AS qid, "
                     f"CAST(count(*) FILTER ({pred}) AS BIGINT) AS n "
                     f"FROM documents")
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# HighlightsMatch percolation (monitor module)

PERC_HL_QUERIES = [
    (1, {"should": ["key", "agg"]}),
    (2, {"phrase": ["the", "a"]}),
    (3, {"must": ["slow", "fast"]}),
]


def ft_percolate_highlights(sf_dir: str):
    """Monitor HighlightsMatch (monitor/HighlightsMatch.java:42): each
    query match reports the deduplicated sorted set of term hits
    (position, endPosition, startOffset, endOffset); phrase matches
    contribute every constituent term's hit."""
    import ray.data

    from lucene_ray.pipelines.util import typed_table

    from ..monitor import percolate_highlights

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    out = percolate_highlights(ds, PERC_HL_QUERIES, concurrency=2)
    return typed_table(out, pa.schema(
        [("qid", pa.int64()), ("doc_id", pa.int64()),
         ("pos", pa.int64()), ("endpos", pa.int64()),
         ("soff", pa.int64()), ("eoff", pa.int64())]))


def oracle_percolate_highlights_sql() -> str:
    parts = []
    for qid, spec in PERC_HL_QUERIES:
        if "phrase" in spec:
            a, b = spec["phrase"]
            parts.append(f"""SELECT DISTINCT {qid} AS qid, h.doc_id,
       h.pos, h.pos + 1 AS endpos, h.soff, h.eoff
FROM (
  SELECT x.doc_id, x.pos, x.soff, x.eoff FROM woff2 x JOIN woff2 y
    ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
  WHERE x.word = '{a}' AND y.word = '{b}'
  UNION ALL
  SELECT y.doc_id, y.pos, y.soff, y.eoff FROM woff2 x JOIN woff2 y
    ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
  WHERE x.word = '{a}' AND y.word = '{b}'
) h""")
        else:
            must = spec.get("must") or []
            should = spec.get("should") or []
            terms = must + should
            tl = ", ".join(f"'{t}'" for t in terms)
            gate = " AND ".join(
                f"EXISTS (SELECT 1 FROM woff2 g WHERE g.doc_id = "
                f"h.doc_id AND g.word = '{t}')" for t in must) or "TRUE"
            parts.append(f"""SELECT DISTINCT {qid} AS qid, h.doc_id,
       h.pos, h.pos + 1 AS endpos, h.soff, h.eoff
FROM woff2 h WHERE h.word IN ({tl}) AND {gate}""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH woff2 AS (
  SELECT doc_id, word, pos,
         CAST(coalesce(sum(len(word) + 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS soff,
         CAST(sum(len(word) + 1) OVER (
           PARTITION BY doc_id ORDER BY pos) AS BIGINT) - 1 AS eoff
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
    FROM documents
  )
)
{un}"""


# ---------------------------------------------------------------------------
# PointInSetQuery (core/search/PointInSetQuery.java)

POINT_IN_SETS = [(1, [24, 37, 81]), (2, [10, 100, 2000]),
                 (3, [0, 1, 55, 56, 57])]


def ft_point_in_set(sf_dir: str) -> pa.Table:
    """PointInSetQuery (search/PointInSetQuery.java:63 — the numeric
    TermInSetQuery; MergePointVisitor walks the sorted query values and
    the BKD tree in tandem): docs whose field_len equals one of the
    set's values. Served by the value-sorted point index with one
    pruned range probe per sorted unique value."""
    from ..points import ensure_numeric_index, numeric_range

    idx = index_dir_for(sf_dir)
    ensure_numeric_index(idx, "field_len")
    qids, docs = [], []
    for qid, values in POINT_IN_SETS:
        hits = []
        for v in sorted(set(values)):
            d, _m = numeric_range(idx, "field_len", v, v + 1)
            hits.append(d)
        d = np.unique(np.concatenate(hits)) if hits \
            else np.empty(0, np.int64)
        qids.extend([qid] * len(d))
        docs.extend(d.tolist())
    return pa.table({"qid": pa.array(qids, pa.int64()),
                     "doc_id": pa.array(docs, pa.int64())})


def oracle_point_in_set_sql() -> str:
    rows = []
    for qid, values in POINT_IN_SETS:
        vl = ", ".join(str(v) for v in sorted(set(values)))
        rows.append(f"SELECT {qid} AS qid, d AS doc_id FROM dl "
                    f"WHERE len IN ({vl})")
    un = "\nUNION ALL\n".join(rows)
    return f"WITH {_CORPUS_CTE}\n{un}"


# ---------------------------------------------------------------------------
# SortedNumericSortField selectors (core/search)

def ft_sorted_numeric_selector(sf_dir: str) -> pa.Table:
    """SortedNumericSortField with SortedNumericSelector.Type.MIN / MAX
    (search/SortedNumericSortField.java:40,
    SortedNumericSelector.java:33: a multi-valued numeric field sorts
    by the selected value per doc): the doc's multi-value set is its
    word lengths; top-20 by (MAX selector desc, doc asc) and by
    (MIN selector asc, doc asc).  Distributed: per-batch selector
    computation (map-only) + sort/limit."""
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text", "source"])

    def selectors(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        paths = [f"doc_{i:08d}.txt"
                 for i in batch.column("doc_id").to_pylist()]
        mins, maxs, ok = [], [], []
        for t in texts:
            ws = [w for w in (t or "").split(" ") if w]
            if ws:
                ls = [len(w) for w in ws]
                mins.append(min(ls))
                maxs.append(max(ls))
                ok.append(True)
            else:
                mins.append(0)
                maxs.append(0)
                ok.append(False)            # missing value: excluded
        return pa.table({
            "source": batch.column("source"),
            "path": pa.array(paths, pa.string()),
            "vmin": pa.array(mins, pa.int64()),
            "vmax": pa.array(maxs, pa.int64()),
        }).filter(pa.array(ok))

    sel = ds.map_batches(selectors, batch_format="pyarrow")

    # bounded partials: each batch keeps only its top-20 per mode
    # (ties break on the docID order key (source, path)), the driver
    # merges 20-row partials — nothing full-dataset materializes
    def partial_top(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = batch.to_pandas()
        a = df.sort_values(["vmax", "source", "path"],
                           ascending=[False, True, True]).head(20)
        b = df.sort_values(["vmin", "source", "path"],
                           ascending=[True, True, True]).head(20)
        a = a.assign(mode="max")
        b = b.assign(mode="min")
        return pa.Table.from_pandas(pd.concat([a, b]),
                                    preserve_index=False)

    parts = sel.map_batches(partial_top, batch_format="pyarrow")\
        .to_pandas()
    top_max = parts[parts["mode"] == "max"].sort_values(
        ["vmax", "source", "path"],
        ascending=[False, True, True]).head(20)
    top_min = parts[parts["mode"] == "min"].sort_values(
        ["vmin", "source", "path"],
        ascending=[True, True, True]).head(20)
    # resolve index docIDs for the 40 winners from docmeta
    import pyarrow.parquet as pq_
    want = sorted(set(top_max["path"]) | set(top_min["path"]))
    dm = pq_.read_table(os.path.join(index_dir_for(sf_dir), "docmeta"),
                        columns=["doc_id", "path"],
                        filters=[("path", "in", want)])
    d_of = dict(zip(dm.column("path").to_pylist(),
                    dm.column("doc_id").to_pylist()))
    out_rows = []
    for rank, (_, r) in enumerate(top_max.iterrows(), 1):
        out_rows.append(("max", rank, int(d_of[r["path"]]),
                         int(r["vmax"])))
    for rank, (_, r) in enumerate(top_min.iterrows(), 1):
        out_rows.append(("min", rank, int(d_of[r["path"]]),
                         int(r["vmin"])))
    cols = list(zip(*out_rows)) if out_rows else [[]] * 4
    return pa.table({
        "mode": pa.array(cols[0], pa.string()),
        "rank": pa.array(cols[1], pa.int64()),
        "doc_id": pa.array(cols[2], pa.int64()),
        "value": pa.array(cols[3], pa.int64()),
    })


def oracle_sorted_numeric_selector_sql() -> str:
    return f"""WITH {_CORPUS_CTE},
vals AS (
  SELECT d, min(len(term)) AS vmin, max(len(term)) AS vmax
  FROM tok GROUP BY d
)
SELECT 'max' AS mode, rank, d AS doc_id, vmax AS value FROM (
  SELECT d, vmax, row_number() OVER (ORDER BY vmax DESC, d) AS rank
  FROM vals
) WHERE rank <= 20
UNION ALL
SELECT 'min', rank, d, vmin FROM (
  SELECT d, vmin, row_number() OVER (ORDER BY vmin ASC, d) AS rank
  FROM vals
) WHERE rank <= 20"""


# ---------------------------------------------------------------------------
# Grouped faceting (grouping/TermGroupFacetCollector)

def ft_group_facets(sf_dir: str) -> pa.Table:
    """TermGroupFacetCollector (grouping/GroupFacetCollector.java role,
    TermGroupFacetCollector.java:43): facet counts where each GROUP
    counts once per facet value regardless of how many of its docs
    carry it — facet = lang, group = source.  Scale shape: per-batch
    distinct (group, facet) pairs, one groupby over the tiny pair set,
    then a facet-level count; only distinct pairs cross the wire."""
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])

    def pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        # docs missing either field do not facet (the collector skips
        # docs without the group/facet ordinal)
        m = pc.and_(batch.column("source").is_valid(),
                    batch.column("lang").is_valid())
        return batch.filter(m).group_by(["source", "lang"]).aggregate([])

    agg = ensure_cols(
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["source", "lang"]).count().to_pandas(),
        ["source", "lang", "count()"])
    out = agg.groupby("lang").size().reset_index(name="n_groups")
    out = out.sort_values("lang").reset_index(drop=True)
    return pa.table({
        "lang": pa.array(out["lang"].astype(str)),
        "n_groups": pa.array(out["n_groups"].astype("int64")),
    })


def oracle_group_facets_sql() -> str:
    return """SELECT lang, CAST(count(DISTINCT source) AS BIGINT)
       AS n_groups
FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
GROUP BY lang"""


# ---------------------------------------------------------------------------
# ToParentBlockJoinSortField (join module)

def ft_blockjoin_sort(sf_dir: str) -> pa.Table:
    """ToParentBlockJoinSortField (join/ToParentBlockJoinSortField.java
    :35 over BlockJoinSelector.java:37 — sort PARENT docs by the
    min/max of a child numeric docvalue): parents are the contiguous
    repo blocks of the (repo, path)-ordered index; the child value is
    the doc token length.  Emits parents ranked by MIN child length
    asc and MAX child length desc, ties by repo.  Scale: one tiny
    groupby over per-batch (repo, min, max) partials."""
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column("source").to_pylist()
        texts = batch.column("text").to_pylist()
        lens = [len([w for w in (t or "").split(" ") if w])
                for t in texts]
        return pa.table({"source": pa.array(srcs),
                         "lo": pa.array(lens, pa.int64()),
                         "hi": pa.array(lens, pa.int64())})

    from ray.data.aggregate import Max, Min
    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source").aggregate(Min("lo", alias_name="vmin"),
                                     Max("hi", alias_name="vmax"))
        .to_pandas(), ["source", "vmin", "vmax"])
    rows = []
    by_min = agg.sort_values(["vmin", "source"]).reset_index(drop=True)
    for rank, (_, r) in enumerate(by_min.iterrows(), 1):
        rows.append(("min_asc", rank, str(r["source"]), int(r["vmin"])))
    by_max = agg.sort_values(["vmax", "source"],
                             ascending=[False, True]).reset_index(drop=True)
    for rank, (_, r) in enumerate(by_max.iterrows(), 1):
        rows.append(("max_desc", rank, str(r["source"]), int(r["vmax"])))
    cols = list(zip(*rows)) if rows else [[]] * 4
    return pa.table({"mode": pa.array(cols[0], pa.string()),
                     "rank": pa.array(cols[1], pa.int64()),
                     "repo": pa.array(cols[2], pa.string()),
                     "value": pa.array(cols[3], pa.int64())})


def oracle_blockjoin_sort_sql() -> str:
    return """WITH v AS (
  SELECT source,
         min(len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x <> ''))) AS vmin,
         max(len(list_filter(string_split(coalesce(text, ''), ' '),
                             x -> x <> ''))) AS vmax
  FROM documents GROUP BY source
)
SELECT 'min_asc' AS mode,
       CAST(row_number() OVER (ORDER BY vmin, source) AS BIGINT)
         AS rank,
       source AS repo, CAST(vmin AS BIGINT) AS value FROM v
UNION ALL
SELECT 'max_desc',
       CAST(row_number() OVER (ORDER BY vmax DESC, source) AS BIGINT),
       source, CAST(vmax AS BIGINT) FROM v"""


def ft_concatenate_graph(sf_dir: str) -> pa.Table:
    """ConcatenateGraphFilter (miscellaneous/ConcatenateGraphFilter.java
    :58, the SuggestField completion-input surface): the whole token
    stream concatenates into one U+001F-separated token — df counts
    docs sharing an identical token stream. Top-60 by (df desc, term)
    like the other vocab gates."""
    from ..analysis import concatenate_graph_stream
    return _rawtok_stats(
        sf_dir,
        lambda tx, d: concatenate_graph_stream(_words(tx)))


def oracle_concatenate_graph_sql() -> str:
    # one token per nonempty doc: the space-joined stream with U+001F
    return """WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     x -> x <> '') AS ws
  FROM documents
),
terms AS (
  SELECT array_to_string(ws, chr(31)) AS term FROM toks
  WHERE len(ws) > 0
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS ttf
FROM terms GROUP BY term
ORDER BY df DESC, term LIMIT 60"""


DV_TERMS_QUERIES = [(1, "lang", ["de", "fr"]),
                    (2, "source", ["src1"]),
                    (3, "lang", ["zz"])]


def ft_dv_terms(sf_dir: str) -> pa.Table:
    """DocValuesTermsQuery (queries/src/java/org/apache/lucene/queries/
    DocValuesTermsQuery.java:74): docs whose sorted docvalue is one of
    the query terms — the docvalue-side dual of TermInSetQuery (used
    when the filter field is docvalues-only). Map-only per-batch
    membership counts."""
    import ray.data

    import pyarrow.compute as pc

    from lucene_ray.pipelines.util import ensure_cols

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["source", "lang"])
    _SCHEMA = pa.schema([("qid", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        qids, ns = [], []
        for qid, field, terms in DV_TERMS_QUERIES:
            m = pc.is_in(batch.column(field),
                         value_set=pa.array(terms, pa.string()))
            m = pc.fill_null(m, False)
            qids.append(qid)
            ns.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid").sum("n").to_pandas(), ["qid", "sum(n)"])
    agg = agg.sort_values("qid").reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_dv_terms_sql() -> str:
    parts = []
    for qid, field, terms in DV_TERMS_QUERIES:
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(f"SELECT {qid} AS qid, "
                     f"CAST(count(*) FILTER ({field} IN ({tl})) "
                     f"AS BIGINT) AS n FROM documents")
    return "\nUNION ALL\n".join(parts)


def ft_kstem(sf_dir: str) -> pa.Table:
    """KStem stemming (analysis/en/KStemFilter.java:44 over
    KStemmer.java:72 — the dictionary-gated Krovetz stemmer): df/ttf of
    the kstem-stemmed corpus vocabulary. Rows-only: the stem is gated
    by a 27k-word built-in lexicon at every rule step (no SQL form);
    exactness is enforced by the FULL 12,130-pair reference
    kstemTestData vocabulary in tests/test_kstem.py."""
    from ..kstem import kstem
    return _rawtok_stats(
        sf_dir, lambda tx, d: [kstem(w) for w in _words(tx)])


# ---------------------------------------------------------------------------
# Media probe (ffprobe role) over the deterministic probe lake

class _MediaProbeStage:
    """Actor-pool stage: synthesize each doc's container payload
    (deterministic from doc_id — the probe-format side of the media
    lake) and PROBE it back; the probe is what's under test, the
    synthesis parameters are what the SQL oracle recomputes."""

    def __init__(self):
        from ..mediaprobe import media_probe
        self._probe = media_probe

    @staticmethod
    def _payload(d: int) -> bytes:
        import struct as st

        def box(typ, payload):
            return st.pack(">I4s", 8 + len(payload), typ) + payload

        kind = d % 4
        if kind == 0:                       # mp4, ts 1000
            dur = d * 37 + 500
            mvhd = box(b"mvhd", b"\x00" * 4 + b"\x00" * 8
                       + st.pack(">II", 1000, dur) + b"\x00" * 80)
            hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 14)
            stsd = box(b"stsd", b"\x00" * 8 + box(b"avc1", b"\x00" * 70))
            mdia = box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsd)))
            moov = box(b"moov", mvhd + box(b"trak", mdia))
            return box(b"ftyp", b"isom" + b"\x00" * 8) + moov
        if kind == 1:                       # flac 44100/2/16
            total = d * 441 + 441
            bits = (44100 << 44) | (1 << 41) | (15 << 36) | total
            si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
            return b"fLaC" + bytes([0x80]) \
                + len(si).to_bytes(3, "big") + si
        if kind == 2:                       # mp3 with Xing frame count
            frames = d % 50 + 10
            hdr = st.pack(">I", (0x7FF << 21) | (3 << 19) | (1 << 17)
                          | (1 << 16) | (9 << 12))
            body = bytearray(b"\x00" * 200)
            body[32:36] = b"Xing"
            body[36:40] = st.pack(">I", 1)
            body[40:44] = st.pack(">I", frames)
            return hdr + bytes(body)
        gran = d * 4410 + 4410              # ogg vorbis
        packet = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) \
            + st.pack("<I", 44100) + b"\x00" * 12
        page0 = b"OggS" + b"\x00\x02" + st.pack("<q", 0) \
            + b"\x00" * 12 + bytes([1]) + bytes([len(packet)]) + packet
        page1 = b"OggS" + b"\x00\x04" + st.pack("<q", gran) \
            + b"\x00" * 12 + bytes([1]) + bytes([0])
        return page0 + page1

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        fmts, rates, durs = [], [], []
        for d in ids:
            info = self._probe(self._payload(int(d)))
            fmts.append(info["format"])
            rates.append(int(info.get("sample_rate",
                                      info.get("timescale", 0))))
            durs.append(float(info["duration_s"]))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "format": pa.array(fmts, pa.string()),
            "rate": pa.array(rates, pa.int64()),
            "duration_s": pa.array(durs, pa.float64())})


def media_probe_lake(sf_dir: str):
    """ffprobe-role probe sweep (lucene_ray.mediaprobe — MP4 box walk,
    FLAC STREAMINFO, MP3 headers + Xing, Ogg granule): metadata rows
    for every payload of the deterministic probe lake, no codec
    decode. Oracle recomputes the synthesis arithmetic."""
    import ray.data

    from lucene_ray.pipelines.util import typed_table

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id"])
    out = ds.map_batches(_MediaProbeStage, batch_format="pyarrow",
                         concurrency=2)
    return typed_table(out, pa.schema(
        [("doc_id", pa.int64()), ("format", pa.string()),
         ("rate", pa.int64()), ("duration_s", pa.float64())]))


def oracle_media_probe_sql() -> str:
    return """SELECT doc_id,
  CASE doc_id % 4 WHEN 0 THEN 'mp4' WHEN 1 THEN 'flac'
       WHEN 2 THEN 'mp3' ELSE 'ogg' END AS format,
  CASE doc_id % 4 WHEN 0 THEN 1000 ELSE 44100 END AS rate,
  CASE doc_id % 4
       WHEN 0 THEN CAST(doc_id * 37 + 500 AS DOUBLE) / 1000
       WHEN 1 THEN CAST(doc_id * 441 + 441 AS DOUBLE) / 44100
       WHEN 2 THEN CAST((doc_id % 50 + 10) * 1152 AS DOUBLE) / 44100
       ELSE CAST(doc_id * 4410 + 4410 AS DOUBLE) / 44100 END
    AS duration_s
FROM documents"""


# ---------------------------------------------------------------------------
# Heatmap facet (spatial-extras/prefix/HeatmapFacetCounter.java)

# (qid, lat_lo, lat_hi, lon_lo, lon_hi, n_lat_cells, n_lon_cells)
# micro-degree bounds, half-open cells
HEATMAP_QUERIES = [
    (1, -90_000_000, 90_000_000, -180_000_000, 180_000_000, 6, 6),
    (2, 0, 45_000_000, 0, 90_000_000, 3, 5),
]


def ft_geo_heatmap(sf_dir: str) -> pa.Table:
    """HeatmapFacetCounter (spatial-extras/prefix/
    HeatmapFacetCounter.java:40: per-grid-cell point counts over a
    query region — the map-tile faceting op): the region divides into
    n_lat x n_lon half-open cells; each synthesized point increments
    its cell.  Scale shape: per-batch 2D bincount partials over the
    geo coordinates (one tiny n_lat*n_lon array per batch crosses the
    wire), summed in one groupby — never a per-point exchange."""
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    from ..geo import synth_coords

    idx = index_dir_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(idx, "docmeta"),
                               columns=["doc_id"])
    _SCHEMA = pa.schema([("qid", pa.int64()), ("cell", pa.int64()),
                         ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SCHEMA.empty_table()
        d = batch.column("doc_id").to_numpy()
        lat, lon = synth_coords(d)
        qids, cells, ns = [], [], []
        for qid, la0, la1, lo0, lo1, nla, nlo in HEATMAP_QUERIES:
            m = (lat >= la0) & (lat < la1) & (lon >= lo0) & (lon < lo1)
            if not m.any():
                continue
            ci = ((lat[m] - la0) * nla // (la1 - la0)).astype(np.int64)
            cj = ((lon[m] - lo0) * nlo // (lo1 - lo0)).astype(np.int64)
            cell = ci * nlo + cj
            u, c = np.unique(cell, return_counts=True)
            qids.extend([qid] * len(u))
            cells.extend(u.tolist())
            ns.extend(c.tolist())
        return pa.table({"qid": pa.array(qids, pa.int64()),
                         "cell": pa.array(cells, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    agg = ensure_cols(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["qid", "cell"]).sum("n").to_pandas(),
        ["qid", "cell", "sum(n)"])
    agg = agg.sort_values(["qid", "cell"]).reset_index(drop=True)
    return pa.table({"qid": pa.array(agg["qid"].astype("int64")),
                     "cell": pa.array(agg["cell"].astype("int64")),
                     "n": pa.array(agg["sum(n)"].astype("int64"))})


def oracle_geo_heatmap_sql() -> str:
    parts = []
    for qid, la0, la1, lo0, lo1, nla, nlo in HEATMAP_QUERIES:
        parts.append(f"""SELECT {qid} AS qid,
       ((lat - {la0}) * {nla} // ({la1} - {la0})) * {nlo}
         + ((lon - {lo0}) * {nlo} // ({lo1} - {lo0})) AS cell,
       CAST(count(*) AS BIGINT) AS n
FROM geo
WHERE lat >= {la0} AND lat < {la1} AND lon >= {lo0} AND lon < {lo1}
GROUP BY cell""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH {_CORPUS_CTE},{_GEO_CTE}
{un}"""


# ---------------------------------------------------------------------------
# BBox overlap-ratio scoring (spatial-extras/bbox)

# (qid, qlat_lo, qlat_hi, qlon_lo, qlon_hi, queryTargetProportion)
BBOX_OVERLAP_QUERIES = [
    (1, 10, 40, 100, 400, 0.25),
    (2, 20, 26, 500, 530, 0.5),
]
_BBOX_K = 20


def ft_bbox_overlap(sf_dir: str) -> pa.Table:
    """BBoxOverlapRatioValueSource (spatial-extras/bbox/
    BBoxOverlapRatioValueSource.java:75, score() :129-210): score =
    queryRatio·p + targetRatio·(1-p) with ratios =
    intersectionArea/area, degenerate zero-area boxes falling back to
    the line ratios (intersection height/width over the box's own).
    Boxes are the lineitem-derived 2D boxes of ft_box_range_field;
    top-20 by (score desc, row key asc). Per-batch bounded top-k
    partials + driver merge."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_linenumber",
                 "l_extendedprice", "l_partkey"])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "rowid": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        rowid = batch.column("l_orderkey").to_numpy() * 10 \
            + batch.column("l_linenumber").to_numpy().astype(np.int64)
        qv = batch.column("l_quantity").to_numpy()
        lat_lo = np.rint(qv).astype(np.int64).astype(np.float64)
        lat_hi = lat_lo + batch.column("l_linenumber").to_numpy()\
            .astype(np.int64) * 3
        ev = batch.column("l_extendedprice").to_numpy()
        lon_lo = (np.rint(ev).astype(np.int64) % 1000)\
            .astype(np.float64)
        lon_hi = lon_lo + batch.column("l_partkey").to_numpy()\
            .astype(np.int64) % 17
        out_q, out_r, out_s = [], [], []
        for qid, a, b, c, d, p in BBOX_OVERLAP_QUERIES:
            h = np.minimum(float(b), lat_hi) - np.maximum(float(a),
                                                          lat_lo)
            w = np.minimum(float(d), lon_hi) - np.maximum(float(c),
                                                          lon_lo)
            ok = (h >= 0) & (w >= 0)
            ia = w * h
            q_area = float((b - a) * (d - c))
            qr = ia / q_area
            t_area = (lat_hi - lat_lo) * (lon_hi - lon_lo)
            th = lat_hi - lat_lo
            tw = lon_hi - lon_lo
            with np.errstate(divide="ignore", invalid="ignore"):
                tr = np.where(
                    t_area > 0, ia / t_area,
                    np.where(th > 0, h / np.where(th > 0, th, 1),
                             np.where(tw > 0, w / np.where(tw > 0,
                                                           tw, 1),
                                      1.0)))
            score = qr * p + tr * (1.0 - p)
            score = np.where(ok, score, 0.0)
            sel = np.flatnonzero(score > 0)
            if len(sel) == 0:
                continue
            order = np.lexsort((rowid[sel], -score[sel]))[:_BBOX_K]
            pick = sel[order]
            out_q.extend([qid] * len(pick))
            out_r.extend(rowid[pick].tolist())
            out_s.extend(score[pick].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "rowid": pa.array(out_r, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for qid, *_rest in BBOX_OVERLAP_QUERIES:
        sub = parts[parts["qid"] == qid].sort_values(
            ["score", "rowid"], ascending=[False, True]).head(_BBOX_K)
        for rank, (_, r) in enumerate(sub.iterrows(), 1):
            rows.append((qid, rank, int(r["rowid"]),
                         float(r["score"])))
    cols = list(zip(*rows)) if rows else [[]] * 4
    return pa.table({"qid": pa.array(cols[0], pa.int64()),
                     "rank": pa.array(cols[1], pa.int64()),
                     "rowid": pa.array(cols[2], pa.int64()),
                     "score": pa.array(cols[3], pa.float64())})


def oracle_bbox_overlap_sql() -> str:
    parts = []
    for qid, a, b, c, d, p in BBOX_OVERLAP_QUERIES:
        q_area = float((b - a) * (d - c))
        parts.append(f"""SELECT {qid} AS qid, rank, rowid, score FROM (
  SELECT rowid, score, row_number() OVER (
           ORDER BY score DESC, rowid) AS rank
  FROM (
    SELECT rowid,
      CASE WHEN h >= 0 AND w >= 0 THEN
        (w * h / {q_area!r}) * {p!r}
        + (CASE WHEN t_area > 0 THEN w * h / t_area
                WHEN th > 0 THEN h / th
                WHEN tw > 0 THEN w / tw
                ELSE 1.0 END) * (1.0 - {p!r})
      ELSE 0.0 END AS score
    FROM (
      SELECT rowid,
        least(CAST({b} AS DOUBLE), lat_hi)
          - greatest(CAST({a} AS DOUBLE), lat_lo) AS h,
        least(CAST({d} AS DOUBLE), lon_hi)
          - greatest(CAST({c} AS DOUBLE), lon_lo) AS w,
        (lat_hi - lat_lo) * (lon_hi - lon_lo) AS t_area,
        lat_hi - lat_lo AS th, lon_hi - lon_lo AS tw
      FROM r
    )
  ) WHERE score > 0
) WHERE rank <= {_BBOX_K}""")
    un = "\nUNION ALL\n".join(parts)
    return f"""WITH r AS (
  SELECT l_orderkey * 10 + l_linenumber AS rowid,
         CAST(CAST(l_quantity AS BIGINT) AS DOUBLE) AS lat_lo,
         CAST(CAST(l_quantity AS BIGINT) + l_linenumber * 3 AS DOUBLE)
           AS lat_hi,
         CAST(CAST(l_extendedprice AS BIGINT) % 1000 AS DOUBLE)
           AS lon_lo,
         CAST(CAST(l_extendedprice AS BIGINT) % 1000
              + l_partkey % 17 AS DOUBLE) AS lon_hi
  FROM lineitem
)
{un}"""


# ---------------------------------------------------------------------------
# IntervalQuery scoring (queries/intervals/IntervalQuery.java:75 with
# IntervalScorer + IntervalScoreFunction)

def ft_interval_scores(sf_dir: str) -> pa.Table:
    """IntervalQuery scoring (IntervalScorer.java:60-68: sloppy freq
    accumulates ``freq += 1.0 / max(length - minExtent + 1, 1)`` into a
    FLOAT — each step rounds float32 after a double add;
    IntervalScoreFunction.java:56-108 saturation ``w·(1 - k/(k+f))`` in
    float32 steps, :110-131 sigmoid ``(float)(w·(1 - k^a/(f^a + k^a)))``
    in double with libm pow).  Battery: phrase/term sources (every
    interval at minExtent ⇒ exact integer freqs), one ordered pair with
    fractional increments (the float32 fold is replayed by a recursive
    CTE), one sigmoid.  Emits (qid, doc_id, float32 score)."""
    import math

    import lucene_ray.intervals as iv

    from ..search import _packed_positions, _POS_BITS, _POS_MASK

    r = reader_for(sf_dir)
    battery = [
        (1, iv.phrase("the", "a"), 2, ("sat", 1.0)),
        (2, iv.term("data"), 1, ("sat", 0.5)),
        (3, iv.ordered(iv.term("the"), iv.term("data")), 2,
         ("sat", 2.0)),
        (4, iv.phrase("key", "agg"), 2, ("sig", 2.0, 0.75)),
    ]
    cache: dict = {}

    def packed(t: str) -> np.ndarray:
        if t not in cache:
            k = _packed_positions(r, t, 0)
            cache[t] = k if k is not None and len(k) \
                else np.empty(0, np.uint64)
        return cache[t]

    rows = []
    for qid, src, min_extent, fn in battery:
        terms = [t for _f, t in iv.leaf_terms(src)]
        cand = None
        for t in terms:
            d = np.unique((packed(t) >> _POS_BITS).astype(np.int64))
            cand = d if cand is None else np.intersect1d(cand, d)
        if cand is None or len(cand) == 0:
            continue
        for d in cand.tolist():
            def gp(field, t, _d=d):
                k = packed(t)
                lo = np.searchsorted(k, np.uint64(_d) << _POS_BITS)
                hi = np.searchsorted(k, np.uint64(_d + 1) << _POS_BITS)
                return (k[lo:hi] & _POS_MASK).astype(np.int64).tolist()
            ivs = iv.eval_doc(src, gp)
            if not ivs:
                continue
            freq = np.float32(0.0)
            for s, e, _g, _w in ivs:
                inc = 1.0 / max((e - s + 1) - min_extent + 1, 1)
                freq = np.float32(np.float64(freq) + inc)
            if fn[0] == "sat":
                pivot = np.float32(fn[1])
                score = np.float32(1.0) * (
                    np.float32(1.0) - pivot / (pivot + freq))
            else:
                _k, a = np.float32(fn[1]), float(fn[2])
                ppa = math.pow(float(_k), a)
                score = np.float32(
                    1.0 * (np.float64(np.float32(1.0))
                           - ppa / (math.pow(float(freq), a) + ppa)))
            rows.append((qid, d, float(score)))
    cols = list(zip(*rows)) if rows else [[]] * 3
    return pa.table({"qid": pa.array(cols[0], pa.int64()),
                     "doc_id": pa.array(cols[1], pa.int64()),
                     "score": pa.array(np.array(cols[2], np.float32),
                                       pa.float32())})


def oracle_interval_scores_sql() -> str:
    # q1/q2/q4: every interval is at minExtent so freq = interval count
    # (exact in float32); q3: the float32 fold over fractional
    # increments replays as a recursive CTE in start order
    sat = (lambda pivot, freq:
           f"CAST(CAST(1.0 AS REAL) - CAST(CAST({pivot} AS REAL) / "
           f"CAST(CAST({pivot} AS REAL) + {freq} AS REAL) AS REAL) "
           f"AS REAL)")
    q1 = f"""SELECT 1 AS qid, d AS doc_id,
       {sat('1.0', 'CAST(n AS REAL)')} AS score
FROM (
  SELECT x.d, CAST(count(*) AS BIGINT) AS n
  FROM wpos x JOIN wpos y ON y.d = x.d AND y.pos = x.pos + 1
  WHERE x.word = 'the' AND y.word = 'a' GROUP BY x.d
)"""
    q2 = f"""SELECT 2, d, {sat('0.5', 'CAST(n AS REAL)')}
FROM (SELECT d, CAST(count(*) AS BIGINT) AS n FROM wpos
      WHERE word = 'data' GROUP BY d)"""
    # q3: minimal ordered pairs (per-end max-start, per-start min-end),
    # then the stepwise float32 freq fold
    q3 = f"""SELECT 3, f.d, {sat('2.0', 'f.freq')}
FROM (
  SELECT w.d, w.freq FROM fold3 w
  JOIN (SELECT d, max(i) AS n FROM m3i GROUP BY d) mx
    ON mx.d = w.d AND w.i = mx.n
) f"""
    q4 = """SELECT 4, d,
       CAST(1.0 * (1.0 - pow(2.0, 0.75)
            / (pow(CAST(CAST(n AS REAL) AS DOUBLE), 0.75)
               + pow(2.0, 0.75))) AS REAL)
FROM (
  SELECT x.d, CAST(count(*) AS BIGINT) AS n
  FROM wpos x JOIN wpos y ON y.d = x.d AND y.pos = x.pos + 1
  WHERE x.word = 'key' AND y.word = 'agg' GROUP BY x.d
)"""
    return f"""WITH RECURSIVE {_CORPUS_CTE},
{_WPOS_CTE},
c3 AS (
  SELECT b.d, b.pos AS e, max(a.pos) AS s
  FROM wpos a JOIN wpos b ON b.d = a.d AND b.pos > a.pos
  WHERE a.word = 'the' AND b.word = 'data'
  GROUP BY b.d, b.pos
),
m3 AS (
  SELECT d, s, min(e) AS e FROM c3 GROUP BY d, s
),
m3i AS (
  SELECT d, s, e, row_number() OVER (
           PARTITION BY d ORDER BY s) AS i
  FROM m3
),
fold3 AS (
  SELECT d, i, CAST(1.0 / greatest(e - s + 1 - 2 + 1, 1) AS REAL)
         AS freq
  FROM m3i WHERE i = 1
  UNION ALL
  SELECT m.d, m.i,
         CAST(CAST(w.freq AS DOUBLE)
              + 1.0 / greatest(m.e - m.s + 1 - 2 + 1, 1) AS REAL)
  FROM fold3 w JOIN m3i m ON m.d = w.d AND m.i = w.i + 1
)
{q1}
UNION ALL
{q2}
UNION ALL
{q3}
UNION ALL
{q4}"""


# ---------------------------------------------------------------------------
# TREC quality-benchmark input parsers (benchmark/quality/trec)

def parse_trec_topics(text: str) -> "list[dict]":
    """TrecTopicsReader (benchmark/quality/trec/TrecTopicsReader.java:39):
    <top> blocks with <num> Number: N, <title> (same line), <desc>/
    <narr> bodies running to the next tag.  Returns [{qid, title,
    description, narrative}] in file order."""
    import re

    out = []
    for block in re.findall(r"<top>(.*?)</top>", text, re.S):
        num = re.search(r"<num>\s*Number:\s*(\S+)", block)
        title = re.search(r"<title>\s*(.*)", block)
        desc = re.search(r"<desc>[^\n]*\n(.*?)(?=<narr>|$)", block, re.S)
        narr = re.search(r"<narr>[^\n]*\n(.*?)$", block, re.S)
        if num is None or title is None:
            raise ValueError("malformed TREC topic block")
        out.append({
            "qid": num.group(1),
            "title": title.group(1).strip(),
            "description": (desc.group(1).strip() if desc else ""),
            "narrative": (narr.group(1).strip() if narr else ""),
        })
    return out


def parse_trec_qrels(text: str) -> "dict[str, dict[str, int]]":
    """TrecJudge (benchmark/quality/trec/TrecJudge.java:36 — format
    ``qnum 0 doc-name is-relevant``): {qid: {doc: rel}}; malformed
    lines raise like the reference's StringTokenizer path."""
    out: dict[str, dict[str, int]] = {}
    for line in text.splitlines():
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        parts = s.split()
        if len(parts) != 4:
            raise ValueError(f"malformed qrels line: {line!r}")
        qid, _zero, doc, rel = parts
        out.setdefault(qid, {})[doc] = int(rel)
    return out


# ---------------------------------------------------------------------------
# Hunspell vocabulary spellcheck (hunspell/Hunspell.java:63)

_HUNSPELL_ROOTS = [
    "row", "batch", "scan", "filter", "merge", "order", "value", "key",
    "stream", "window", "group", "sort", "query", "data", "join",
    "column"]

_HUNSPELL_AFF = """SET UTF-8
PFX U Y 1
PFX U 0 un .
SFX S Y 2
SFX S 0 s [^sy]
SFX S y ies [^aeiou]y
SFX D Y 2
SFX D 0 ed [^e]
SFX D e ed e
"""

import re as _re_hs
_HUNSPELL_ALPHA = _re_hs.compile(r"[A-Za-z]+")


def _hunspell_variants(w: str) -> list:
    """Deterministic planted derivations per corpus token: the bare
    word, the three suffix shapes, the cross-product prefix, the
    title/upper case folds and one genuinely mixed-case form."""
    ies = w[:-1] + "ies" if w.endswith("y") else w + "ies"
    return [w, w + "s", "un" + w, w + "ed", ies,
            w[:1].upper() + w[1:], w.upper(), w + "X"]


def ft_hunspell_spellcheck(sf_dir: str) -> pa.Table:
    """Distributed Hunspell spellcheck of the corpus vocabulary
    (hunspell/Hunspell.java:74 ``spell``): every alpha token is
    expanded into its planted derivations and checked against a fixed
    .aff/.dic (16 roots, all carrying the S/D suffix and U prefix
    flags) — exercising dictionary lookup, suffix rules with
    [^sy]/[^aeiou]y/[^e]/e conditions, the cross-product 'un' prefix
    (Stemmer.java's prefix+suffix enumeration), and the UPPER/TITLE
    case-variant fold (Stemmer.varyCase).  Terms are annotated
    ``word|ok`` / ``word|miss``; df/ttf stats over the annotations.

    Scale shape: the dictionary is tiny and closure-captured (one copy
    per task, the broadcast-small-side pattern); checking is a pure
    per-batch map."""
    from ..hunspell import HunspellDictionary

    dic_text = str(len(_HUNSPELL_ROOTS)) + "\n" + "\n".join(
        r + "/SDU" for r in _HUNSPELL_ROOTS)
    d = HunspellDictionary(_HUNSPELL_AFF, dic_text)

    def toks(tx: str, _doc: int) -> list:
        out = []
        for w in _words(tx):
            if not _HUNSPELL_ALPHA.fullmatch(w):
                continue
            for v in _hunspell_variants(w):
                out.append(v + ("|ok" if d.spell(v) else "|miss"))
        return out

    return _rawtok_stats(sf_dir, toks)


def oracle_hunspell_spellcheck_sql() -> str:
    roots = ", ".join(f"'{r}'" for r in _HUNSPELL_ROOTS)
    # sufok(z): dictionary word, or one suffix rule applied to a root
    # (two-suffix chains are unreachable: no rule carries continuation
    # flags, and the outer suffix of a chain is authorized only by the
    # inner's continuation class)
    sufok = f"""(z IN ({roots})
     OR (length(z) >= 2 AND z LIKE '%s'
         AND substr(z, 1, length(z)-1) IN ({roots})
         AND substr(z, length(z)-1, 1) NOT IN ('s', 'y'))
     OR (length(z) >= 4 AND z LIKE '%ies'
         AND substr(z, 1, length(z)-3) || 'y' IN ({roots})
         AND substr(z, length(z)-3, 1) NOT IN
             ('a', 'e', 'i', 'o', 'u'))
     OR (length(z) >= 3 AND z LIKE '%ed'
         AND substr(z, 1, length(z)-2) IN ({roots})
         AND substr(z, length(z)-2, 1) <> 'e')
     OR (length(z) >= 3 AND z LIKE '%ed'
         AND substr(z, 1, length(z)-2) || 'e' IN ({roots})))"""
    return f"""WITH words AS (
  SELECT doc_id AS d, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
  WHERE regexp_full_match(w, '[A-Za-z]+')
), v0 AS (
  SELECT d, v FROM words, UNNEST([
    w, w || 's', 'un' || w,  w || 'ed',
    CASE WHEN w LIKE '%y'
         THEN substr(w, 1, length(w)-1) || 'ies'
         ELSE w || 'ies' END,
    upper(substr(w, 1, 1)) || substr(w, 2), upper(w),
    w || 'X']) AS t(v)
), cased AS (
  -- Stemmer.varyCase: UPPER and TITLE fold to lowercase; MIXED never
  -- matches a lowercase dictionary
  SELECT d, v,
         CASE WHEN v = lower(v) THEN v
              WHEN v = upper(v) THEN lower(v)
              WHEN substr(v, 2) = lower(substr(v, 2)) THEN lower(v)
              ELSE NULL END AS z
  FROM v0
), ok AS (
  SELECT d, v,
         z IS NOT NULL AND ({sufok}
           OR (z LIKE 'un%' AND length(z) >= 3 AND (SELECT {sufok}
               FROM (SELECT substr(cased.z, 3) AS z)))) AS good
  FROM cased
), fin AS (
  SELECT d, v || CASE WHEN good THEN '|ok' ELSE '|miss' END AS term
  FROM ok
)
{_RSLP_TAIL}"""
