"""Text-analysis operators over the ``documents`` table.

Each is a vectorized ``map_batches`` stage (regexes compiled at module
import; no per-row Python in the hot loop beyond C-speed regex/str calls):

- :func:`text_quality` — per-doc quality features (lengths, distinct ratio,
  stopword stats) used for corpus filtering.
- :func:`lang_id` — n-gram/stopword-profile language ID heuristic.
- :func:`token_count_bpe` — BPE-ish regex token count (the pre-tokenizer
  count used for training-data budgeting).
- :func:`doc_fingerprint` — Karp-Rabin rolling-hash winnowing fingerprints
  (document-level near-dup/plagiarism signatures).
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa

# BPE-ish pre-tokenizer — RE2-compatible so the DuckDB oracle can run the
# *same* pattern (no backrefs/lookahead).
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"
_BPE = re.compile(BPE_RE)

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]

# fixed per-language stopword profiles for the lang-id heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["zh1", "zh2", "zh3", "zh4", "zh5"],
}
_LANG_ORDER = ["de", "en", "es", "fr", "zh"]   # tie-break: alphabetical


def _docs(sf_dir: str, cols=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=list(cols))


def quality_batch(batch: pa.Table) -> pa.Table:
    """Per-batch quality features (module-level so composed pipelines —
    corpus_clean — can fuse this with other per-doc signals in one map
    stage)."""
    stop = set(STOPWORDS)
    n_chars, n_words, n_distinct, max_len, n_stop = [], [], [], [], []
    for text in batch.column("text").to_pylist():
        words = (text or "").split()
        n_chars.append(len(text or ""))
        n_words.append(len(words))
        n_distinct.append(len(set(words)))
        max_len.append(max((len(w) for w in words), default=0))
        n_stop.append(sum(1 for w in words if w in stop))
    nw = np.array(n_words, dtype=np.float64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_words": pa.array(n_words, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "max_word_len": pa.array(max_len, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        # single IEEE divisions — bit-identical to the SQL oracle
        "distinct_ratio": pa.array(
            np.array(n_distinct, dtype=np.float64) / np.maximum(nw, 1.0),
            pa.float64()),
        "stop_ratio": pa.array(
            np.array(n_stop, dtype=np.float64) / np.maximum(nw, 1.0),
            pa.float64()),
    })


def text_quality(sf_dir: str):
    """Integer/ratio quality features per doc (all exactly reproducible)."""
    return _docs(sf_dir).map_batches(quality_batch, batch_format="pyarrow")


def oracle_text_quality_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct,
         max(len(word)) AS max_word_len,
         count(*) FILTER (word IN ({stop})) AS n_stopwords
  FROM w GROUP BY doc_id
)
SELECT d.doc_id, len(d.text) AS n_chars, a.n_words, a.n_distinct,
       a.max_word_len, a.n_stopwords,
       CAST(a.n_distinct AS DOUBLE) / greatest(a.n_words, 1) AS distinct_ratio,
       CAST(a.n_stopwords AS DOUBLE) / greatest(a.n_words, 1) AS stop_ratio
FROM documents d JOIN agg a USING (doc_id)"""


def lang_id(sf_dir: str):
    """Predict language as argmax of stopword-profile hits (deterministic
    tie-break: alphabetical language code)."""
    profiles = {lang: set(ws) for lang, ws in LANG_PROFILES.items()}

    def pred(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            words = (text or "").split()
            best_lang, best = "und", 0
            for lang in _LANG_ORDER:
                c = sum(1 for w in words if w in profiles[lang])
                if c > best:
                    best, best_lang = c, lang
            out.append(best_lang)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "pred_lang": pa.array(out, pa.string())})

    return _docs(sf_dir).map_batches(pred, batch_format="pyarrow")


def oracle_lang_id_sql() -> str:
    score_cols = []
    for lang in _LANG_ORDER:
        ws = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        score_cols.append(
            f"count(*) FILTER (word IN ({ws})) AS s_{lang}")
    cols = ",\n         ".join(score_cols)
    # argmax with: score > best-so-far in _LANG_ORDER sequence == pick the
    # first lang (alphabetical) among maxima with score > 0
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
s AS (
  SELECT doc_id,
         {cols}
  FROM w GROUP BY doc_id
)
SELECT doc_id,
  CASE
    WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
    WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
    WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
    WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
    WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
    ELSE 'zh'
  END AS pred_lang
FROM s"""


def token_count_bpe(sf_dir: str):
    """Token count under the BPE-ish pre-tokenizer regex."""

    def cnt(batch: pa.Table) -> pa.Table:
        out = [len(_BPE.findall(t or ""))
               for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bpe_tokens": pa.array(out, pa.int64())})

    return _docs(sf_dir).map_batches(cnt, batch_format="pyarrow")


def oracle_token_count_sql() -> str:
    return (f"SELECT doc_id, len(regexp_extract_all(text, '{BPE_RE}')) "
            f"AS n_bpe_tokens FROM documents")


def text_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", table A1 repetition filters) adapted to
    word units: the fraction of characters covered by the most frequent
    word unigram / bigram, and the fraction of word-trigram occurrences
    that are duplicates, plus the keep/drop verdict at the published
    thresholds.  Map-only (no shuffle); the whole batch is processed with
    Arrow split/dictionary-encode + np.unique over packed (doc, gramID)
    keys — no per-row Python loop.
    """
    return _docs(sf_dir).map_batches(repetition_batch,
                                     batch_format="pyarrow")


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-batch Gopher repetition signals (module-level for fusion)."""
    import pyarrow.compute as pc

    n_docs = batch.num_rows
    parts = pc.split_pattern(
        pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
    flat = pc.list_flatten(parts)
    owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
    wlen = np.asarray(pc.utf8_length(flat), dtype=np.int64)
    n_chars = np.zeros(n_docs, dtype=np.int64)
    np.add.at(n_chars, owners, wlen)
    denom = np.maximum(n_chars, 1).astype(np.float64)

    def top_frac(keys: pa.Array, own: np.ndarray,
                 charlen: np.ndarray) -> np.ndarray:
        """max over distinct grams of count*charlen, per doc."""
        out = np.zeros(n_docs, dtype=np.int64)
        if len(keys) == 0:
            return out.astype(np.float64)
        d = pc.dictionary_encode(keys)
        idx = np.asarray(d.indices, dtype=np.int64)
        packed = (own << np.int64(32)) | idx
        uniq, first, cnt = np.unique(packed, return_index=True,
                                     return_counts=True)
        np.maximum.at(out, (uniq >> np.int64(32)).astype(np.int64),
                      cnt * charlen[first])
        return out.astype(np.float64)

    top_uni = top_frac(flat, owners, wlen) / denom

    if len(flat) >= 2:
        same = owners[:-1] == owners[1:]
        l_, r_ = flat.slice(0, len(flat) - 1), flat.slice(1)
        bi = pc.binary_join_element_wise(l_, r_, " ").filter(
            pa.array(same))
        bi_len = (wlen[:-1] + wlen[1:])[same]
        top_bi = top_frac(bi, owners[:-1][same], bi_len) / denom
    else:
        top_bi = np.zeros(n_docs, dtype=np.float64)

    n_tri = np.zeros(n_docs, dtype=np.int64)
    n_tri_distinct = np.zeros(n_docs, dtype=np.int64)
    if len(flat) >= 3:
        same3 = (owners[:-2] == owners[1:-1]) & \
            (owners[1:-1] == owners[2:])
        tri = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 2), flat.slice(1, len(flat) - 2),
            flat.slice(2), " ").filter(pa.array(same3))
        town = owners[:-2][same3]
        np.add.at(n_tri, town, 1)
        d = pc.dictionary_encode(tri)
        packed = (town << np.int64(32)) | \
            np.asarray(d.indices, dtype=np.int64)
        uniq = np.unique(packed)
        np.add.at(n_tri_distinct,
                  (uniq >> np.int64(32)).astype(np.int64), 1)
    dup_tri = (n_tri - n_tri_distinct) / np.maximum(n_tri, 1)

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_word_chars": pa.array(n_chars, pa.int64()),
        "top_unigram_char_frac": pa.array(top_uni, pa.float64()),
        "top_bigram_char_frac": pa.array(top_bi, pa.float64()),
        "dup_trigram_frac": pa.array(dup_tri, pa.float64()),
        # Gopher table A1 thresholds (2-gram 0.18; dup-fraction 0.30;
        # unigram threshold from the top-1-gram 0.20 line)
        "keep_gopher": pa.array((top_uni <= 0.20) & (top_bi <= 0.18)
                                & (dup_tri <= 0.30)),
    })


def oracle_text_repetition_sql() -> str:
    return """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
chars AS (
  SELECT doc_id, CAST(sum(len(word)) AS BIGINT) AS n_word_chars
  FROM w GROUP BY doc_id
),
uni AS (
  SELECT doc_id, max(cnt * wl) AS best FROM (
    SELECT doc_id, word, count(*) AS cnt, len(word) AS wl
    FROM w GROUP BY doc_id, word, len(word)) GROUP BY doc_id
),
bi AS (
  SELECT doc_id, max(cnt * wl) AS best FROM (
    SELECT a.doc_id, count(*) AS cnt, len(a.word) + len(b.word) AS wl
    FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    GROUP BY a.doc_id, a.word, b.word, len(a.word) + len(b.word))
  GROUP BY doc_id
),
tri AS (
  SELECT a.doc_id, count(*) AS n_tri,
         count(DISTINCT a.word || ' ' || b.word || ' ' || c.word)
           AS n_distinct
  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  GROUP BY a.doc_id
)
SELECT d.doc_id, c.n_word_chars,
  CAST(coalesce(u.best, 0) AS DOUBLE)
    / greatest(c.n_word_chars, 1) AS top_unigram_char_frac,
  CAST(coalesce(b.best, 0) AS DOUBLE)
    / greatest(c.n_word_chars, 1) AS top_bigram_char_frac,
  CAST(coalesce(t.n_tri, 0) - coalesce(t.n_distinct, 0) AS DOUBLE)
    / greatest(coalesce(t.n_tri, 0), 1) AS dup_trigram_frac,
  (CAST(coalesce(u.best, 0) AS DOUBLE)
     / greatest(c.n_word_chars, 1) <= 0.20
   AND CAST(coalesce(b.best, 0) AS DOUBLE)
     / greatest(c.n_word_chars, 1) <= 0.18
   AND CAST(coalesce(t.n_tri, 0) - coalesce(t.n_distinct, 0) AS DOUBLE)
     / greatest(coalesce(t.n_tri, 0), 1) <= 0.30) AS keep_gopher
FROM documents d
JOIN chars c USING (doc_id)
LEFT JOIN uni u USING (doc_id)
LEFT JOIN bi b USING (doc_id)
LEFT JOIN tri t USING (doc_id)"""


_KEYWORDS_K = 5


def doc_keywords(sf_dir: str, k: int = _KEYWORDS_K):
    """Per-doc top-k keyword extraction by tf/df — the MoreLikeThis
    "interesting terms" role (queries/mlt/MoreLikeThis.java:60
    retrieveInterestingTerms) as a corpus-tagging stage. Scored with the
    linear-idf variant (score = tf/df, one IEEE float64 division) so the
    ordering is bit-reproducible in SQL; the reference's tf·idf log
    weighting orders differently only through the log's curvature.

    Scale shape: pass 1 computes global df with per-batch partial counts
    (tf rows are unique per (doc, term), so counting them per term IS the
    distinct-doc count) and ONE small groupby over the vocabulary; the
    (term, df) map is broadcast once via ray.put — vocabulary grows
    sublinearly in corpus size (Heaps' law); for vocabularies beyond
    driver memory the dedup-style term-shuffle join is the documented
    alternative. Pass 2 is map-only: vectorized tf + searchsorted df
    lookup + per-doc segmented top-k, no Python over rows."""
    import ray
    import ray.data
    import pyarrow.compute as pc

    def tf_pairs(batch: pa.Table
                 ) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        """(owners, terms, tfs) unique per (doc, term), vectorized."""
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        d = pc.dictionary_encode(flat)
        idx = np.asarray(d.indices, dtype=np.int64)
        key = (owners << np.int64(32)) | idx
        uniq, tf = np.unique(key, return_counts=True)
        own = (uniq >> np.int64(32)).astype(np.int64)
        terms = d.dictionary.take(
            pa.array((uniq & np.int64(0xFFFFFFFF)).astype(np.int64)))
        return own, terms, tf.astype(np.int64)

    def partial_df(batch: pa.Table) -> pa.Table:
        _, terms, _ = tf_pairs(batch)
        vc = pc.value_counts(terms)
        return pa.table({"term": vc.field("values"),
                         "df": vc.field("counts").cast(pa.int64())})

    df_tbl = (_docs(sf_dir, ("text",))
              .map_batches(partial_df, batch_format="pyarrow")
              .groupby("term").sum("df")).to_pandas()
    vocab = np.array(df_tbl["term"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    dfs = np.asarray(df_tbl["sum(df)"], dtype=np.int64)[order]
    ref = ray.put((vocab, dfs))

    def topk(batch: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(ref)
        own, terms, tf = tf_pairs(batch)
        t_np = np.array(terms.to_pylist(), dtype=object)
        pos = np.searchsorted(vocab, t_np)
        df = dfs[pos]
        score = tf.astype(np.float64) / df
        # per-doc top-k: sort by (doc, -score, term), keep first k per doc
        o = np.lexsort((t_np, -score, own))
        own, t_np, tf, df, score = (own[o], t_np[o], tf[o], df[o],
                                    score[o])
        starts = np.concatenate([[0], np.flatnonzero(
            own[1:] != own[:-1]) + 1])
        rank = np.arange(len(own)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(own)]])))
        keep = rank < k
        doc_ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": pa.array(doc_ids[own[keep]], pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
            "term": pa.array(t_np[keep].tolist(), pa.string()),
            "tf": pa.array(tf[keep], pa.int64()),
            "df": pa.array(df[keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64()),
        })

    return _docs(sf_dir).map_batches(topk, batch_format="pyarrow")


def oracle_doc_keywords_sql(k: int = _KEYWORDS_K) -> str:
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
         ) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, rank, term, tf, df, score FROM s WHERE rank <= {k}"""


# HyperLogLog vocabulary-cardinality sketch (Flajolet et al. 2007).
_HLL_HEX = 13            # rank bits come from 13 hex chars after the bucket


def _hll_rank_from_hex(suffix: str) -> int:
    """Leading-zero-bit rank of a hex string + 1 (the HLL rho)."""
    zeros = 0
    for ch in suffix:
        if ch == "0":
            zeros += 4
            continue
        zeros += {"1": 3, "2": 2, "3": 2}.get(ch, 1 if ch in "4567" else 0)
        break
    else:
        return 4 * len(suffix) + 1
    return zeros + 1


def vocab_hll(sf_dir: str):
    """Distributed HyperLogLog sketch of the corpus vocabulary size: 256
    registers keyed by the first md5 hex byte, register value = max
    leading-zero rank of the next 13 hex chars. The shuffle moves only
    per-batch partial registers (≤256 rows/batch, max-combined) — the
    canonical count-distinct shape for 100 TB. Registers are integers,
    so the driver gate checks them exactly (md5 is identical in DuckDB);
    the float estimate derives from them in pytest."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        vocab = pc.unique(pc.list_flatten(parts))
        regs: dict[str, int] = {}
        for w in vocab.to_pylist():
            h = hashlib.md5(w.encode()).hexdigest()
            b = h[:2]
            r = _hll_rank_from_hex(h[2:2 + _HLL_HEX])
            if r > regs.get(b, 0):
                regs[b] = r
        return pa.table({"bucket": pa.array(sorted(regs), pa.string()),
                         "r": pa.array([regs[b] for b in sorted(regs)],
                                       pa.int64())})

    return (_docs(sf_dir, ("text",))
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket").max("r"))


def hll_estimate(buckets: "list[str]", ranks: "list[int]",
                 m: int = 256) -> float:
    """Flajolet et al. 2007 estimator with the small-range correction."""
    import math

    regs = dict(zip(buckets, ranks))
    s = sum(2.0 ** -regs.get(f"{i:02x}", 0) for i in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / s
    zeros = m - len(regs)
    if e <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return e


def oracle_vocab_hll_sql() -> str:
    return f"""WITH v AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS term FROM documents
),
h AS (
  SELECT substr(md5(term), 1, 2) AS bucket,
         substr(md5(term), 3, {_HLL_HEX}) AS suffix
  FROM v
),
ranked AS (
  SELECT bucket,
    CASE WHEN suffix = repeat('0', {_HLL_HEX})
         THEN {4 * _HLL_HEX + 1}
         ELSE 4 * length(regexp_extract(suffix, '^0*')) +
           CASE substr(ltrim(suffix, '0'), 1, 1)
             WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
             WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
             WHEN '7' THEN 1 ELSE 0
           END + 1
    END AS r
  FROM h
)
SELECT bucket, CAST(max(r) AS BIGINT) AS "max(r)"
FROM ranked GROUP BY bucket"""


# Benchmark decontamination (Brown et al. 2020 "Language Models are
# Few-Shot Learners", appendix C: drop training docs sharing an n-gram
# with the eval set). Eval stand-in: the first _DECON_EVAL_DOCS docs.
_DECON_N = 5
_DECON_EVAL_DOCS = 20


def _decon_grams(batch: pa.Table, n: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(owners, ngram hashes) via Arrow split + join + hash."""
    import pyarrow.compute as pc

    parts = pc.split_pattern(
        pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
    flat = pc.list_flatten(parts)
    owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
    if len(flat) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    cols = [flat.slice(i, len(flat) - n + 1) for i in range(n)]
    joined = pc.binary_join_element_wise(*cols, " ")
    own = owners[:len(flat) - n + 1]
    same = np.ones(len(own), dtype=bool)
    for i in range(1, n):
        same &= own == owners[i:len(flat) - n + 1 + i]
    joined = joined.filter(pa.array(same))
    own = own[same]
    h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8)
                        .digest(), "little") for g in
         joined.to_pylist()),
        dtype=np.uint64, count=len(joined))
    return own, h


def decon_eval_hashes(sf_dir: str, n: int = _DECON_N,
                      eval_docs: int = _DECON_EVAL_DOCS) -> np.ndarray:
    """Sorted unique n-gram hashes of the eval set — the small broadcast
    side (one bounded read of the eval rows)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                       columns=["doc_id", "text"])
    ev = ev.filter(pc.less(ev.column("doc_id"), eval_docs))
    _, eh = _decon_grams(ev, n)
    return np.unique(eh)


def contamination_batch(batch: pa.Table, ehs: np.ndarray,
                        eval_docs: int = _DECON_EVAL_DOCS,
                        n: int = _DECON_N) -> np.ndarray:
    """Per-row contaminated flags against the broadcast eval hash set."""
    own, h = _decon_grams(batch, n)
    hit = np.zeros(batch.num_rows, dtype=bool)
    if len(h) and len(ehs):
        pos = np.minimum(np.searchsorted(ehs, h), len(ehs) - 1)
        np.logical_or.at(hit, own[ehs[pos] == h], True)
    ids = batch.column("doc_id").to_numpy()
    return hit & (ids >= eval_docs)


def decontaminate(sf_dir: str, n: int = _DECON_N,
                  eval_docs: int = _DECON_EVAL_DOCS):
    """Per-doc contamination verdict against an eval set: a training doc
    is contaminated if it shares any word n-gram with any eval document
    (and is not itself in the eval set). Scale shape: eval sets are
    small and fixed, so their n-gram hash set broadcasts once
    (ray.put) and the check is a map-only vectorized membership test —
    no shuffle, no join, flat per-doc cost at any corpus size."""
    import ray
    import ray.data

    ref = ray.put(decon_eval_hashes(sf_dir, n, eval_docs))

    def check(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "contaminated": pa.array(contamination_batch(
                batch, ray.get(ref), eval_docs, n)),
        })

    return _docs(sf_dir).map_batches(check, batch_format="pyarrow")


def oracle_decontaminate_sql(n: int = _DECON_N,
                             eval_docs: int = _DECON_EVAL_DOCS) -> str:
    gram = " || ' ' || ".join(
        f"w{i}.word" for i in range(n))
    joins = " ".join(
        f"JOIN w w{i} ON w{i}.doc_id = w0.doc_id "
        f"AND w{i}.pos = w0.pos + {i}" for i in range(1, n))
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
g AS (
  SELECT w0.doc_id, {gram} AS gram FROM w w0 {joins}
),
ev AS (
  SELECT DISTINCT gram FROM g WHERE doc_id < {eval_docs}
)
SELECT d.doc_id,
  (d.doc_id >= {eval_docs} AND EXISTS (
     SELECT 1 FROM g JOIN ev USING (gram)
     WHERE g.doc_id = d.doc_id)) AS contaminated
FROM documents d"""


# Karp-Rabin winnowing (window 4 over word-trigram hashes)
_W = 4


def doc_fingerprint(sf_dir: str):
    """Winnowing fingerprints: min 32-bit trigram hash per window of 4 →
    per-doc (n_fingerprints, min/max fingerprint, fingerprint set hash)."""

    def fp(batch: pa.Table) -> pa.Table:
        n_fp, fmin, fmax, fset = [], [], [], []
        for text in batch.column("text").to_pylist():
            words = (text or "").split()
            if len(words) < 3:
                n_fp.append(0)
                fmin.append(0)
                fmax.append(0)
                fset.append("")
                continue
            tri = [" ".join(words[i:i + 3]) for i in range(len(words) - 2)]
            h = np.fromiter(
                (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4)
                                .digest(), "little") for t in tri),
                dtype=np.int64, count=len(tri))
            if len(h) <= _W:
                sel = np.array([int(h.min())])
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, _W)
                sel = np.unique(win.min(axis=1))
            n_fp.append(len(sel))
            fmin.append(int(sel.min()))
            fmax.append(int(sel.max()))
            fset.append(hashlib.blake2b(sel.tobytes(),
                                        digest_size=8).hexdigest())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_fingerprints": pa.array(n_fp, pa.int64()),
                         "fp_min": pa.array(fmin, pa.int64()),
                         "fp_max": pa.array(fmax, pa.int64()),
                         "fp_set": pa.array(fset, pa.string())})

    return _docs(sf_dir).map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Composed corpus-cleaning pipeline (the C4-style end-to-end verdict)

_CLEAN_MIN_WORDS = 25        # C4-role length floor (Raffel et al. 2020 §2.2)
_CLEAN_MIN_DISTINCT = 0.35   # lexical-diversity floor
_CLEAN_MAX_WORD_LEN = 20     # garbage-token ceiling
_CLEAN_PARTS = 16


def corpus_clean(sf_dir: str):
    """End-to-end training-corpus cleaning verdict, one row per doc:

    - ``q_ok``      — quality thresholds over the text_quality features
      (the C4 heuristic-filter role, Raffel et al. 2020 appendix);
    - ``keep_gopher`` — Gopher repetition filters (Rae et al. 2021);
    - ``contaminated`` — eval-set n-gram collision (Brown et al. 2020);
    - ``canonical`` — exact-dup canonicalization: the MIN doc_id of each
      identical text keeps the corpus slot;
    - ``keep``      — the conjunction.

    Scale shape: the three per-doc signals FUSE into one map pass (one
    corpus read, eval hashes broadcast once); the only exchange is one
    hash-partitioned groupby on the text hash for the canonical flag
    (coarse pkey buckets, vectorized run-length first-in-run marking —
    never a per-text group)."""
    import ray
    import ray.data

    ref = ray.put(decon_eval_hashes(sf_dir))

    def fused(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch)
        rep = repetition_batch(batch)
        cont = contamination_batch(batch, ray.get(ref))
        q_ok = ((q.column("n_words").to_numpy() >= _CLEAN_MIN_WORDS)
                & (q.column("distinct_ratio").to_numpy()
                   >= _CLEAN_MIN_DISTINCT)
                & (q.column("max_word_len").to_numpy()
                   <= _CLEAN_MAX_WORD_LEN))
        h = np.fromiter(
            (int.from_bytes(hashlib.blake2b((t or "").encode(),
                                            digest_size=8).digest(),
                            "little") for t in
             batch.column("text").to_pylist()),
            dtype=np.uint64, count=batch.num_rows)
        return pa.table({
            "pkey": pa.array((h % np.uint64(_CLEAN_PARTS))
                             .astype(np.int32)),
            "h": pa.array(h),
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "q_ok": pa.array(q_ok),
            "keep_gopher": rep.column("keep_gopher"),
            "contaminated": pa.array(cont),
        })

    def canon(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "q_ok": pa.array([], pa.bool_()),
                "keep_gopher": pa.array([], pa.bool_()),
                "contaminated": pa.array([], pa.bool_()),
                "canonical": pa.array([], pa.bool_()),
                "keep": pa.array([], pa.bool_())})
        h = g.column("h").to_numpy()
        d = g.column("doc_id").to_numpy()
        order = np.lexsort((d, h))
        first = np.r_[True, h[order][1:] != h[order][:-1]]
        canonical = np.zeros(len(d), dtype=bool)
        canonical[order] = first
        q_ok = g.column("q_ok").to_numpy(zero_copy_only=False)
        gop = g.column("keep_gopher").to_numpy(zero_copy_only=False)
        cont = g.column("contaminated").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(d),
            "q_ok": pa.array(q_ok),
            "keep_gopher": pa.array(gop),
            "contaminated": pa.array(cont),
            "canonical": pa.array(canonical),
            "keep": pa.array(q_ok & gop & ~cont & canonical)})

    return (_docs(sf_dir)
            .map_batches(fused, batch_format="pyarrow")
            .groupby("pkey")
            .map_groups(canon, batch_format="pyarrow"))


def oracle_corpus_clean_sql() -> str:
    q_ok = (f"(q.n_words >= {_CLEAN_MIN_WORDS} AND "
            f"q.distinct_ratio >= {_CLEAN_MIN_DISTINCT} AND "
            f"q.max_word_len <= {_CLEAN_MAX_WORD_LEN})")
    return f"""SELECT q.doc_id,
       {q_ok} AS q_ok,
       r.keep_gopher,
       c.contaminated,
       (dd.rn = 1) AS canonical,
       ({q_ok} AND r.keep_gopher AND NOT c.contaminated AND dd.rn = 1)
         AS keep
FROM ({oracle_text_quality_sql()}) q
JOIN ({oracle_text_repetition_sql()}) r USING (doc_id)
JOIN ({oracle_decontaminate_sql()}) c USING (doc_id)
JOIN (SELECT doc_id, row_number() OVER (
        PARTITION BY text ORDER BY doc_id) AS rn FROM documents) dd
  USING (doc_id)"""


_CLEAN_SHARD_DOCS = 4096


def corpus_clean_write(sf_dir: str, out_dir: str) -> dict:
    """Materialize the cleaned corpus as RESUMABLE partitioned parquet:
    one output file per FIXED doc_id range (shard = doc_id //
    _CLEAN_SHARD_DOCS — deterministic names independent of Ray block
    boundaries), written atomically (tmp + rename) inside the tasks — a
    re-run after a crash skips shards whose file already exists, the
    same recovery unit the index build uses. Returns {"kept": n,
    "dropped": m, "files": k}."""
    import pyarrow.parquet as pq_

    os.makedirs(out_dir, exist_ok=True)
    # total from parquet metadata — no second pipeline execution
    total = pq_.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows

    def kept_shards(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch.column("keep"))       # vectorized, no
        ids = t.column("doc_id").to_numpy()          # per-row Python
        return pa.table({
            "doc_id": t.column("doc_id"),
            "shard": pa.array(ids // _CLEAN_SHARD_DOCS, pa.int64())})

    def write_shard(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("doc_id").to_numpy())
        if len(ids) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "kept": pa.array([], pa.int64())})
        shard = int(g.column("shard")[0].as_py())
        name = f"part_{shard:08d}.parquet"
        path = os.path.join(out_dir, name)
        if not os.path.exists(path):
            lo = shard * _CLEAN_SHARD_DOCS
            # range filter prunes row groups deterministically; the
            # kept-id subset is applied in memory (a 4096-element isin
            # pushdown would force a full-file scan instead)
            src = pq_.read_table(
                os.path.join(sf_dir, "documents.parquet"),
                filters=[("doc_id", ">=", lo),
                         ("doc_id", "<", lo + _CLEAN_SHARD_DOCS)])
            import pyarrow.compute as pc
            src = src.filter(pc.is_in(
                src.column("doc_id"), value_set=pa.array(ids)))
            pq_.write_table(src, path + ".tmp")
            os.replace(path + ".tmp", path)
        return pa.table({"file": pa.array([name], pa.string()),
                         "kept": pa.array([len(ids)], pa.int64())})

    rows = (corpus_clean(sf_dir)
            .map_batches(kept_shards, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())
    n_kept = int(sum(r["kept"] for r in rows))
    return {"kept": n_kept, "dropped": int(total - n_kept),
            "files": len([r for r in rows if r["kept"]])}


# ---------------------------------------------------------------------------
# Token-budget packing (distributed prefix sum)

_PACK_BUDGET = 4096          # tokens per training bin
_PACK_SHARD = 2048           # docs per prefix-sum shard


def pack_token_budget(sf_dir: str, budget: int = _PACK_BUDGET):
    """Sequence-packing bin assignment: docs in doc_id order are packed
    into fixed token-budget bins; bin_id = floor(exclusive-prefix-sum of
    token counts / budget) — the deterministic budget-sharding spec a
    training loader can consume (each bin holds ~budget tokens; a doc
    spanning a boundary starts the next bin's range).

    Scale shape — a DISTRIBUTED PREFIX SUM: (1) map-only token counts;
    (2) per-shard sums over FIXED doc_id ranges (one tiny groupby —
    O(N/shard) rows); (3) the driver turns shard sums into shard prefix
    offsets (broadcast); (4) one coarse per-shard pass computes local
    cumulative sums + offset. No global sort, nothing row-sized on the
    driver."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def counts(batch: pa.Table) -> pa.Table:
        n = [len((t or "").split(" "))
             for t in batch.column("text").to_pylist()]
        ids = batch.column("doc_id").to_numpy()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(np.asarray(n, np.int64)),
            "shard": pa.array(ids // _PACK_SHARD, pa.int64())})

    from lucene_ray.pipelines.util import ensure_cols

    toks = _docs(sf_dir).map_batches(counts, batch_format="pyarrow") \
        .materialize()                      # two consumers
    shard_sums = ensure_cols(
        toks.groupby("shard").aggregate(Sum("n_tokens", alias_name="s"))
        .to_pandas(), ["shard", "s"]).sort_values("shard")
    if len(shard_sums) == 0:                # empty corpus
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_prev": pa.array([], pa.int64()),
            "bin_id": pa.array([], pa.int64())}))
    offs = {}
    run = 0
    for sh, s in zip(shard_sums["shard"], shard_sums["s"]):
        offs[int(sh)] = run
        run += int(s)
    oref = ray.put(offs)

    def local(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "cum_prev": pa.array([], pa.int64()),
                             "bin_id": pa.array([], pa.int64())})
        off = ray.get(oref)[int(g.column("shard")[0].as_py())]
        d = g.column("doc_id").to_numpy()
        n = g.column("n_tokens").to_numpy()
        order = np.argsort(d)
        d, n = d[order], n[order]
        cum_prev = off + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table({
            "doc_id": pa.array(d), "n_tokens": pa.array(n),
            "cum_prev": pa.array(cum_prev.astype(np.int64)),
            "bin_id": pa.array((cum_prev // budget).astype(np.int64))})

    return toks.groupby("shard").map_groups(local, batch_format="pyarrow")


def oracle_pack_token_budget_sql(budget: int = _PACK_BUDGET) -> str:
    return f"""WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(coalesce(SUM(n_tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS cum_prev,
       CAST(coalesce(SUM(n_tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {budget} AS BIGINT) AS bin_id
FROM t"""


_SAMPLE_PER_LANG = 20


def corpus_sample_balanced(sf_dir: str, per_lang: int = _SAMPLE_PER_LANG
                           ) -> pa.Table:
    """Balanced (stratified) deterministic sample: the per_lang docs with
    the smallest md5(doc_id) per language — the reproducible eval-set
    draw (same deterministic-hash trick as ft_facet_sampled, so the SQL
    oracle selects the identical rows). Scale shape: per-batch partial
    top-n per stratum (bounded: strata x n rows leave each task), one
    tiny combiner — never a per-stratum shuffle of raw rows."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch.column("doc_id").to_pylist()
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        df = pd.DataFrame({"lang": batch.column("lang").to_pylist(),
                           "doc_id": ids, "h": h})
        top = (df.sort_values(["lang", "h", "doc_id"])
               .groupby("lang", sort=False).head(per_lang))
        return pa.Table.from_pandas(top, preserve_index=False)

    from lucene_ray.pipelines.util import ensure_cols

    parts = ensure_cols(
        _docs(sf_dir, cols=("doc_id", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas(), ["lang", "doc_id", "h"])
    top = (parts.sort_values(["lang", "h", "doc_id"])
           .groupby("lang", sort=False).head(per_lang)
           .sort_values(["lang", "h"]).reset_index(drop=True))
    return pa.table({"lang": pa.array(top.lang, pa.string()),
                     "doc_id": pa.array(top.doc_id, pa.int64()),
                     "h": pa.array(top.h, pa.string())})


def oracle_sample_balanced_sql(per_lang: int = _SAMPLE_PER_LANG) -> str:
    return f"""SELECT lang, doc_id, h FROM (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rn
  FROM documents
) WHERE rn <= {per_lang}"""


def doc_lm_logprob(sf_dir: str, _extra_cols: tuple = ()):
    """Unigram-LM document scoring — the CCNet quality-filter role
    (Wenzek et al. 2019 rank documents by LM perplexity; a corpus-level
    unigram model is its deterministic, SQL-reproducible form): train
    p(w) = count(w)/total on the WHOLE corpus, score each doc by the
    mean token log-probability (higher = more typical text; boilerplate
    and garbage score low).

    Float parity: ln(count/total) is ONE float64 division + C libm log
    per vocab word (math.log, not np.log — see bm25.py); the per-doc
    mean sums those in engine-specific order, so it is emitted as REAL
    (float32) in both engines, like every accumulated float here.

    Scale shape: pass 1 = per-batch token value_counts + one vocab-sized
    groupby (Heaps-law small), broadcast (vocab, logp) once; pass 2 =
    map-only searchsorted lookup + bincount segment sums. Nothing
    row-sized leaves a task."""
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

    def partial_tf(batch: pa.Table) -> pa.Table:
        _, flat = _tokens(batch)
        vc = pc.value_counts(flat)
        return pa.table({"term": vc.field("values"),
                         "c": vc.field("counts").cast(pa.int64())})

    tf_tbl = ensure_cols(
        _docs(sf_dir, ("text",))
        .map_batches(partial_tf, batch_format="pyarrow")
        .groupby("term").sum("c").to_pandas(), ["term", "sum(c)"])
    if len(tf_tbl) == 0:
        cols = {"doc_id": pa.array([], pa.int64())}
        for c in _extra_cols:
            cols[c] = pa.array([], pa.string())
        cols["n_tokens"] = pa.array([], pa.int64())
        cols["mean_logprob"] = pa.array([], pa.float32())
        return ray.data.from_arrow(pa.table(cols))
    vocab = np.array(tf_tbl["term"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    cnt = np.asarray(tf_tbl["sum(c)"], dtype=np.int64)[order]
    total = int(cnt.sum())
    logp = np.array([math.log(c / total) for c in cnt.tolist()],
                    dtype=np.float64)
    ref = ray.put((vocab, logp))

    def score(batch: pa.Table) -> pa.Table:
        vocab, logp = ray.get(ref)
        owners, flat = _tokens(batch)
        # vocab-level lookup: searchsorted only the batch's UNIQUE words
        # (dictionary), then fan out by code — no per-token Python
        d = pc.dictionary_encode(flat)
        uniq = np.array(d.dictionary.to_pylist(), dtype=object)
        codes = np.asarray(d.indices, dtype=np.int64)
        pos = np.searchsorted(vocab, uniq)
        n = batch.num_rows
        ll = np.bincount(owners, weights=logp[pos][codes], minlength=n)
        ntok = np.bincount(owners, minlength=n).astype(np.int64)
        cols = {"doc_id": batch.column("doc_id")}
        for c in _extra_cols:
            cols[c] = batch.column(c)
        cols["n_tokens"] = pa.array(ntok)
        cols["mean_logprob"] = pa.array((ll / ntok).astype(np.float32))
        return pa.table(cols)

    return _docs(sf_dir, ("doc_id", "text") + tuple(_extra_cols)) \
        .map_batches(score, batch_format="pyarrow")


def oracle_doc_lm_logprob_sql() -> str:
    return """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (SELECT term, count(*) AS c FROM w GROUP BY term),
tot AS (SELECT count(*) AS t FROM w)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(ln(CAST(cnt.c AS DOUBLE) / tot.t)) / count(*) AS REAL)
         AS mean_logprob
FROM w JOIN cnt USING (term) CROSS JOIN tot
GROUP BY w.doc_id"""


_BLOCKLIST = ("slow", "broken", "error", "legacy", "deadlock")


def doc_blocklist(sf_dir: str, words: tuple = _BLOCKLIST):
    """Blocklist screening — the C4 "bad words" filter role (Raffel et
    al. 2020 §2.2 drop pages containing listed words): per doc, the
    number of blocklisted token occurrences and the keep verdict
    (keep = zero hits).

    Scale shape: the list is a broadcast-constant closure (tiny);
    map-only vectorized pc.is_in over flattened tokens + bincount per
    owner — flat per-doc cost, no shuffle, the same screen shape as
    ``decontaminate``."""
    import pyarrow.compute as pc

    wset = pa.array(sorted(words), pa.string())

    def screen(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        hit = np.asarray(pc.is_in(flat, value_set=wset), dtype=bool)
        n = batch.num_rows
        hits = np.bincount(owners[hit], minlength=n).astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_hits": pa.array(hits),
                         "keep": pa.array(hits == 0)})

    return _docs(sf_dir).map_batches(screen, batch_format="pyarrow")


def oracle_doc_blocklist_sql(words: tuple = _BLOCKLIST) -> str:
    lst = ", ".join(f"'{w}'" for w in sorted(words))
    return f"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
h AS (
  SELECT doc_id, count(*) AS n FROM w WHERE term IN ({lst})
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       coalesce(h.n, 0) = 0 AS keep
FROM documents d LEFT JOIN h USING (doc_id)"""


_MIX_ALPHA = 0.3


def source_mix_weights(sf_dir: str, alpha: float = _MIX_ALPHA) -> pa.Table:
    """Temperature-based language mixing weights — the multilingual
    resampling rule (exponentiated-share sampling, alpha=0.3 as in
    XLM-R/mBERT training mixes): share_s = n_s/N, q_s proportional to
    share_s^alpha, and the per-doc upsampling factor q_s/share_s a
    loader multiplies into its sampling rate.

    Scale shape: ONE tiny groupby(lang).count() (strata-sized) does all
    the distributed work; the power/normalize arithmetic runs on the
    strata table. Accumulated floats are emitted as REAL (see
    ``doc_lm_logprob``); pow and division are single IEEE ops."""
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    cnt = ensure_cols(
        _docs(sf_dir, ("lang",)).groupby("lang").count().to_pandas(),
        ["lang", "count()"]).sort_values("lang")
    if len(cnt) == 0:
        return pa.table({"lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "share": pa.array([], pa.float64()),
                         "weight": pa.array([], pa.float32()),
                         "upsample": pa.array([], pa.float32())})
    n = cnt["count()"].to_numpy().astype(np.int64)
    total = int(n.sum())
    share = n / total                       # one IEEE division each
    q = share ** alpha                      # libm pow, both engines
    z = float(q.sum())                      # strata-sized sum -> REAL out
    w32 = (q / z).astype(np.float32)
    # upsample derives from the REAL-rounded weight (as the oracle's
    # CAST chain does), not the double intermediate — 1-ULP parity
    up = (w32.astype(np.float64) / share).astype(np.float32)
    return pa.table({
        "lang": pa.array(cnt["lang"].tolist(), pa.string()),
        "n_docs": pa.array(n),
        "share": pa.array(share, pa.float64()),
        "weight": pa.array(w32),
        "upsample": pa.array(up)})


def oracle_source_mix_sql(alpha: float = _MIX_ALPHA) -> str:
    return f"""WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY lang
),
t AS (SELECT SUM(n_docs) AS total FROM c),
s AS (
  SELECT lang, n_docs,
         CAST(n_docs AS DOUBLE) / total AS share,
         pow(CAST(n_docs AS DOUBLE) / total, {alpha}) AS q
  FROM c CROSS JOIN t
),
z AS (SELECT SUM(q) AS z FROM s)
SELECT lang, n_docs, share,
       CAST(q / z AS REAL) AS weight,
       CAST(CAST(CAST(q / z AS REAL) AS DOUBLE) / share AS REAL)
         AS upsample
FROM s CROSS JOIN z"""


# email-ish plus long digit runs (account/phone-number shapes) — RE2
# syntax so Arrow's replace_substring_regex and DuckDB's regexp_replace
# run the IDENTICAL pattern (the BPE_RE trick)
PII_RE = r"[a-z0-9.]+@[a-z0-9.]+|[0-9]{3,}"
PII_TOKEN = "<PII>"


def redact_pii(sf_dir: str, pattern: str = PII_RE,
               token: str = PII_TOKEN):
    """PII redaction — the standard pre-training scrub stage (mask
    emails / long digit runs before anything downstream sees the text).
    Returns (doc_id, n_redactions, text) with every match replaced by
    ``token``.

    Scale shape: pure map — ONE pass of two Arrow RE2 kernels
    (replace_substring_regex + count_substring_regex), zero Python in
    the loop, no shuffle. The oracle runs the same pattern through
    DuckDB's RE2."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column("text"), "")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_redactions": pc.count_substring_regex(
                txt, pattern=pattern).cast(pa.int64()),
            "text": pc.replace_substring_regex(
                txt, pattern=pattern, replacement=token)})

    return _docs(sf_dir).map_batches(scrub, batch_format="pyarrow")


def oracle_redact_pii_sql(pattern: str = PII_RE,
                          token: str = PII_TOKEN) -> str:
    return f"""SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT)
         AS n_redactions,
       regexp_replace(text, '{pattern}', '{token}', 'g') AS text
FROM documents"""


CHUNK_W = 64        # tokens per chunk
CHUNK_STRIDE = 48   # overlap = W - stride


def chunk_documents(sf_dir: str, width: int = CHUNK_W,
                    stride: int = CHUNK_STRIDE):
    """Overlapping token-window chunking — the RAG / context-window
    loader stage: doc tokens [i*stride, i*stride+width) per chunk, last
    chunk starts at the final stride boundary below n_tokens (every doc
    emits >= 1 chunk; whitespace tokens, like every text op here).
    Returns (doc_id, chunk_id, n_tokens_chunk, chunk_text).

    Scale shape: pure map — chunk fan-out happens inside the task and
    output rows reference only that task's rows; no shuffle, no state.
    The per-chunk join is C-speed (str.join over a pre-split list)."""

    def chunks(batch: pa.Table) -> pa.Table:
        out_d, out_c, out_n, out_t = [], [], [], []
        ids = batch.column("doc_id").to_pylist()
        for did, txt in zip(ids, batch.column("text").to_pylist()):
            words = (txt or "").split(" ")
            n = len(words)
            starts = range(0, max(n - width, 0) + stride, stride) \
                if n > width else (0,)
            for ci, s in enumerate(starts):
                if s >= n:
                    break
                piece = words[s:s + width]
                out_d.append(did)
                out_c.append(ci)
                out_n.append(len(piece))
                out_t.append(" ".join(piece))
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "chunk_id": pa.array(out_c, pa.int32()),
            "n_tokens_chunk": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_t, pa.string())})

    return _docs(sf_dir).map_batches(chunks, batch_format="pyarrow")


def oracle_chunk_documents_sql(width: int = CHUNK_W,
                               stride: int = CHUNK_STRIDE) -> str:
    return f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n FROM documents
),
starts AS (
  SELECT doc_id, words, n,
         unnest(range(0, greatest(n - {width}, 0) + {stride},
                      {stride})) AS s
  FROM t
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
            AS INT) AS chunk_id,
       CAST(len(list_slice(words, s + 1, s + {width})) AS BIGINT)
         AS n_tokens_chunk,
       array_to_string(list_slice(words, s + 1, s + {width}), ' ')
         AS chunk_text
FROM starts WHERE s < n"""


_DSIR_TARGET = "en"


def dsir_importance(sf_dir: str, target_lang: str = _DSIR_TARGET):
    """DSIR importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how much more likely its bag of words is under a
    TARGET domain's unigram model than under the raw-corpus model,

        log w(x) = sum_f c_f(x) * (ln p_tgt(f) - ln p_raw(f)),

    with Laplace(+1) smoothing over the shared corpus vocabulary. DSIR
    hashes n-grams into buckets; the deterministic SQL-reproducible form
    here uses the exact word features (the hash is an estimator of this
    quantity). Target domain = documents with lang == target_lang.

    Float parity: each per-word log ratio is two float64 divisions +
    two C-libm logs (math.log, not np.log — bm25.py rule); the per-doc
    sum accumulates in engine-specific order so it is emitted as REAL,
    the ``doc_lm_logprob`` discipline.

    Scale shape: pass 1 = per-batch (term, c_all, c_tgt) partials + ONE
    vocab-sized groupby (Heaps-law small); the (vocab, log-ratio) pair
    is broadcast once via ray.put; pass 2 = map-only dictionary-encode
    lookup + bincount segment sums. Nothing row-sized on the driver."""
    import math

    import ray
    import ray.data
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from lucene_ray.pipelines.util import ensure_cols

    def _tokens(batch: pa.Table):
        parts = pc.split_pattern(
            pc.fill_null(batch.column("text"), ""), " ").combine_chunks()
        flat = pc.list_flatten(parts)
        owners = np.asarray(pc.list_parent_indices(parts), dtype=np.int64)
        return owners, flat

    def partial(batch: pa.Table) -> pa.Table:
        owners, flat = _tokens(batch)
        is_tgt = np.asarray(
            pc.equal(pc.fill_null(batch.column("lang"), ""), target_lang),
            dtype=bool)
        t = pa.table({
            "term": flat,
            "one": pa.array(np.ones(len(flat), np.int64)),
            "tgt": pa.array(is_tgt[owners].astype(np.int64))})
        g = t.group_by("term").aggregate([("one", "sum"), ("tgt", "sum")])
        return g.rename_columns(["term", "c_all", "c_tgt"])

    tf = ensure_cols(
        _docs(sf_dir, ("text", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c_all", alias_name="c_all"),
                   Sum("c_tgt", alias_name="c_tgt"))
        .to_pandas(), ["term", "c_all", "c_tgt"])
    if len(tf) == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "log_ratio": pa.array([], pa.float32())}))
    vocab = np.array(tf["term"], dtype=object)
    order = np.argsort(vocab)
    vocab = vocab[order]
    c_all = np.asarray(tf["c_all"], dtype=np.int64)[order]
    c_tgt = np.asarray(tf["c_tgt"], dtype=np.int64)[order]
    v = len(vocab)
    d_all = float(int(c_all.sum()) + v)
    d_tgt = float(int(c_tgt.sum()) + v)
    lr = np.array(
        [math.log((t + 1) / d_tgt) - math.log((a + 1) / d_all)
         for t, a in zip(c_tgt.tolist(), c_all.tolist())],
        dtype=np.float64)
    ref = ray.put((vocab, lr))

    def score(batch: pa.Table) -> pa.Table:
        vocab, lr = ray.get(ref)
        owners, flat = _tokens(batch)
        d = pc.dictionary_encode(flat)
        uniq = np.array(d.dictionary.to_pylist(), dtype=object)
        codes = np.asarray(d.indices, dtype=np.int64)
        pos = np.searchsorted(vocab, uniq)
        n = batch.num_rows
        lw = np.bincount(owners, weights=lr[pos][codes], minlength=n)
        ntok = np.bincount(owners, minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(ntok),
            "log_ratio": pa.array(lw.astype(np.float32))})

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        score, batch_format="pyarrow")


def oracle_dsir_importance_sql(target_lang: str = _DSIR_TARGET) -> str:
    return f"""WITH w AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
),
cnt AS (
  SELECT term, count(*) AS c_all,
         sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS c_tgt
  FROM w GROUP BY term
),
tot AS (
  SELECT sum(c_all) AS n_all, sum(c_tgt) AS n_tgt,
         count(*) AS v
  FROM cnt
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(ln((cnt.c_tgt + 1) / CAST(tot.n_tgt + tot.v AS DOUBLE))
              - ln((cnt.c_all + 1) / CAST(tot.n_all + tot.v AS DOUBLE)))
            AS REAL) AS log_ratio
FROM w JOIN cnt USING (term) CROSS JOIN tot
GROUP BY w.doc_id"""


def doc_ppl_buckets(sf_dir: str):
    """CCNet perplexity buckets (Wenzek et al. 2019 §4.3): per language,
    rank documents by LM quality (mean_logprob desc = perplexity asc) and
    split into head / middle / tail terciles — the standard quality
    stratification of a crawl corpus before sampling.

    Scale shape: scores are the map-only :func:`doc_lm_logprob` pass with
    ``lang`` passed through; ranking within language is ONE distributed
    sort by (lang, score desc, doc_id) followed by the sorted-block-scan
    offset chain (per-block (lang, count) one-row summaries, an
    O(#blocks) driver accumulation, broadcast offsets) — no language's
    rows ever gather in a single task, so a lang holding 80% of 100 TB
    still streams. Bucket boundaries replicate SQL NTILE(3) exactly:
    the first n%3 buckets get ceil(n/3) rows."""
    import ray

    from lucene_ray.pipelines.util import ensure_cols

    scored = doc_lm_logprob(sf_dir, _extra_cols=("lang",))
    u = scored.sort(["lang", "mean_logprob", "doc_id"],
                    descending=[False, True, False]).materialize()

    _EMPTY_SUM = pa.table({
        "f_lang": pa.array([], pa.string()),
        "f_score": pa.array([], pa.float32()),
        "f_doc": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64())})

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_SUM
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        # within-block lang runs (block is sorted, langs are grouped)
        uniq, idx, cnts = np.unique(langs, return_index=True,
                                    return_counts=True)
        order = np.argsort(idx)
        f_lang = str(langs[0])
        f_score = float(b.column("mean_logprob")[0].as_py())
        f_doc = int(b.column("doc_id")[0].as_py())
        return pa.table({
            "f_lang": pa.array([f_lang] * len(uniq), pa.string()),
            "f_score": pa.array([f_score] * len(uniq), pa.float32()),
            "f_doc": pa.array([f_doc] * len(uniq), pa.int64()),
            "lang": pa.array(uniq[order], pa.string()),
            "cnt": pa.array(cnts[order].astype(np.int64))})

    summ = ensure_cols(
        u.map_batches(summarize, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        _EMPTY_SUM.column_names)
    # blocks in global sort order; (block, lang) rows keep within-block
    # lang order via the stable f_* prefix + lang sort
    summ = summ.sort_values(["f_lang", "f_score", "f_doc", "lang"],
                            ascending=[True, False, True, True])
    offsets: dict = {}     # (block id, lang) -> rank offset before block
    totals: dict = {}      # lang -> n
    for r in summ.itertuples(index=False):
        bid = (str(r.f_lang), float(r.f_score), int(r.f_doc))
        offsets[(bid, str(r.lang))] = totals.get(str(r.lang), 0)
        totals[str(r.lang)] = totals.get(str(r.lang), 0) + int(r.cnt)
    state = ray.put((offsets, totals))

    def resolve(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "mean_logprob": pa.array([], pa.float32()),
            "bucket": pa.array([], pa.int64()),
            "label": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        offs, tots = ray.get(state)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        bid = (str(langs[0]),
               float(b.column("mean_logprob")[0].as_py()),
               int(b.column("doc_id")[0].as_py()))
        n = b.num_rows
        # within-block rank per lang run (vectorized cumcount)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.zeros(n, dtype=np.int64)
        new_run = np.flatnonzero(langs[1:] != langs[:-1]) + 1
        run_start[new_run] = new_run
        np.maximum.accumulate(run_start, out=run_start)
        within = idx - run_start
        start_off = np.array(
            [offs[(bid, str(langs[i]))] for i in
             np.concatenate(([0], new_run))], dtype=np.int64)
        off_per_row = np.repeat(
            start_off,
            np.diff(np.concatenate(([0], new_run, [n]))).astype(np.int64))
        rank = off_per_row + within + 1
        nlang = np.array([tots[str(x)] for x in langs], dtype=np.int64)
        q, rm = nlang // 3, nlang % 3
        b1 = q + (rm >= 1)
        b2 = 2 * q + (rm >= 1) + (rm >= 2)
        bucket = 1 + (rank > b1).astype(np.int64) \
            + (rank > b2).astype(np.int64)
        lab = np.array(["head", "middle", "tail"], dtype=object)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "mean_logprob": b.column("mean_logprob"),
            "bucket": pa.array(bucket),
            "label": pa.array(lab[bucket - 1], pa.string())})

    return u.map_batches(resolve, batch_size=None, batch_format="pyarrow")


def oracle_doc_ppl_buckets_sql() -> str:
    return """WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
cnt AS (SELECT term, count(*) AS c FROM w GROUP BY term),
tot AS (SELECT count(*) AS t FROM w),
scores AS (
  SELECT w.doc_id,
         CAST(SUM(ln(CAST(cnt.c AS DOUBLE) / tot.t)) / count(*) AS REAL)
           AS mean_logprob
  FROM w JOIN cnt USING (term) CROSS JOIN tot
  GROUP BY w.doc_id
),
bucketed AS (
  SELECT d.doc_id, d.lang, s.mean_logprob,
         CAST(ntile(3) OVER (PARTITION BY d.lang
           ORDER BY s.mean_logprob DESC, d.doc_id ASC) AS BIGINT) AS bucket
  FROM documents d JOIN scores s USING (doc_id)
)
SELECT doc_id, lang, mean_logprob, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS label
FROM bucketed"""


# ---------------------------------------------------------------------------
# Quota-based source mixing (the "data recipe" sampling step)

# per-lang token-budget fraction as EXACT rationals (num, den) — the
# configured mixing ratios of a Pile-style recipe; exact integers keep
# the quota boundary engine-independent
MIX_RATIOS = {"en": (1, 2), "de": (2, 3), "es": (1, 3),
              "fr": (1, 4), "zh": (3, 4)}


def corpus_sample_quota(sf_dir: str) -> pa.Table:
    """Token-quota sampling per source (the data-recipe step that turns
    mixing weights into an actual training subset — The Pile / Gopher
    practice: each source contributes a configured token budget, filled
    by a deterministic document order): per lang, documents ranked by
    md5(doc_id) (the reproducible-draw trick of
    :func:`corpus_sample_balanced`) are taken while the CUMULATIVE token
    count stays within quota = total_lang_tokens * num // den
    (exact integer rationals in ``MIX_RATIOS`` — no float boundary).

    Scale shape: ONE distributed sort by (lang, h, doc_id) + the
    sorted-block-scan offset chain (per-block one-row-per-lang token
    summaries, O(#blocks) driver accumulation, broadcast offsets +
    quotas) — the :func:`doc_ppl_buckets` machinery with token sums as
    the monoid; no lang ever gathers in one task."""
    import ray
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    return _quota_select(
        _docs(sf_dir, cols=("doc_id", "lang", "text"))
        .map_batches(_quota_keyed_batch, batch_format="pyarrow"))


def _quota_keyed_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, tokens, md5 draw key) rows for the quota chain —
    shared by :func:`corpus_sample_quota` and :func:`curation_recipe`
    so the tokenization and the deterministic draw can never drift
    between the standalone stage and the composed recipe."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").to_pylist()
    toks = pc.list_value_length(
        pc.split_pattern(batch.column("text"), " ")).to_numpy() \
        .astype(np.int64)
    h = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "lang": batch.column("lang"),
                     "tokens": pa.array(toks),
                     "h": pa.array(h, pa.string())})


def _quota_select(keyed_ds) -> pa.Table:
    """The sorted-block token-quota chain over a (doc_id, lang, tokens,
    h) dataset — shared by :func:`corpus_sample_quota` (whole corpus)
    and :func:`curation_recipe` (survivors of the cleaning stages)."""
    import ray
    import ray.data

    from lucene_ray.pipelines.util import ensure_cols

    u = keyed_ds.sort(["lang", "h", "doc_id"]).materialize()

    _EMPTY = pa.table({"f_lang": pa.array([], pa.string()),
                       "f_h": pa.array([], pa.string()),
                       "f_doc": pa.array([], pa.int64()),
                       "lang": pa.array([], pa.string()),
                       "tok": pa.array([], pa.int64())})

    def summarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        toks = b.column("tokens").to_numpy()
        uniq, idx = np.unique(langs, return_index=True)
        order = np.argsort(idx)
        sums = [int(toks[langs == u_].sum()) for u_ in uniq[order]]
        return pa.table({
            "f_lang": pa.array([str(langs[0])] * len(uniq)),
            "f_h": pa.array([str(b.column("h")[0].as_py())] * len(uniq)),
            "f_doc": pa.array([int(b.column("doc_id")[0].as_py())]
                              * len(uniq), pa.int64()),
            "lang": pa.array(uniq[order]),
            "tok": pa.array(sums, pa.int64())})

    summ = ensure_cols(
        u.map_batches(summarize, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        _EMPTY.column_names)
    summ = summ.sort_values(["f_lang", "f_h", "f_doc", "lang"])
    offsets: dict = {}
    totals: dict = {}
    for r_ in summ.itertuples(index=False):
        bid = (str(r_.f_lang), str(r_.f_h), int(r_.f_doc))
        offsets[(bid, str(r_.lang))] = totals.get(str(r_.lang), 0)
        totals[str(r_.lang)] = totals.get(str(r_.lang), 0) + int(r_.tok)
    quotas = {lg: totals.get(lg, 0) * n // d
              for lg, (n, d) in MIX_RATIOS.items()}
    state = ray.put((offsets, quotas))

    def resolve(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "lang": pa.array([], pa.string()),
                          "tokens": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        offs, qts = ray.get(state)
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        toks = b.column("tokens").to_numpy()
        ids = b.column("doc_id").to_numpy()
        bid = (str(langs[0]), str(b.column("h")[0].as_py()), int(ids[0]))
        keep = np.zeros(len(ids), bool)
        for lg in np.unique(langs):
            m = langs == lg
            cum = np.cumsum(toks[m]) + offs.get((bid, str(lg)), 0)
            keep[m] = cum <= qts.get(str(lg), 0)
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "lang": pa.array(langs[keep]),
                         "tokens": pa.array(toks[keep], pa.int64())})

    t = ensure_cols(
        u.map_batches(resolve, batch_size=None,
                      batch_format="pyarrow").to_pandas(),
        ["doc_id", "lang", "tokens"])
    t = t.sort_values("doc_id").reset_index(drop=True)
    return pa.table({"doc_id": pa.array(t.doc_id, pa.int64()),
                     "lang": pa.array(t.lang, pa.string()),
                     "tokens": pa.array(t.tokens, pa.int64())})


def oracle_sample_quota_sql() -> str:
    cases = " ".join(
        f"WHEN '{lg}' THEN CAST(tot AS BIGINT) * {n} // {d}"
        for lg, (n, d) in MIX_RATIOS.items())
    return f"""WITH toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
quota AS (
  SELECT lang, CASE lang {cases} ELSE 0 END AS q
  FROM (SELECT lang, sum(tokens) AS tot FROM toks GROUP BY lang)
),
cum AS (
  SELECT doc_id, lang, tokens,
         sum(tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
)
SELECT cum.doc_id, cum.lang, cum.tokens
FROM cum JOIN quota ON quota.lang = cum.lang
WHERE cum.c <= quota.q"""


def curation_recipe(sf_dir: str) -> pa.Table:
    """The END-TO-END curation recipe — the composition a 100-TB
    pre-training pipeline actually runs, chaining three individually
    verified stages over Datasets (nothing doc-sized on the driver):

    1. :func:`corpus_clean` — C4 quality + Gopher repetition +
       decontamination + exact-dup canonicalization (keep flag);
    2. prefix-cluster keep-longest dedup (:func:`dedup_exact_best`'s
       rule) applied to the SURVIVORS of stage 1;
    3. token-quota source mixing (:func:`corpus_sample_quota`'s exact
       rational budgets) over the dedup winners.

    Returns the final training subset (doc_id, lang, tokens). The
    oracle is the three stages' verified SQL chained as CTEs, so the
    composition — not just the parts — is hash-checked."""
    import ray.data
    from ray.data.aggregate import Max

    from lucene_ray.pipelines.dedup import _join_parts

    P = _join_parts(sf_dir)
    flags = (corpus_clean(sf_dir)
             .map_batches(lambda t: t.select(["doc_id", "keep"]),
                          batch_format="pyarrow"))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "n_chars"])
    kept = (docs.join(flags, "inner", P, on=("doc_id",),
                      right_on=("doc_id",))
            .map_batches(lambda t: t.filter(t.column("keep")),
                         batch_format="pyarrow")
            .materialize())

    from lucene_ray.pipelines.dedup import prefix_pack_batch

    winners = (kept.map_batches(prefix_pack_batch,
                                batch_format="pyarrow")
               .groupby("h")
               .aggregate(Max("packed", alias_name="packed"))
               .map_batches(lambda t: pa.table({
                   "doc_id": pa.array(
                       (1 << 31) - (t.column("packed").to_numpy()
                                    .astype(np.int64) & 0xFFFFFFFF),
                       pa.int64())}), batch_format="pyarrow"))

    w = (kept.join(winners, "inner", P, on=("doc_id",),
                   right_on=("doc_id",))
         .map_batches(_quota_keyed_batch, batch_format="pyarrow"))
    return _quota_select(w)


def oracle_curation_recipe_sql() -> str:
    from lucene_ray.pipelines.dedup import PREFIX_DEDUP_WORDS as pw

    cases = " ".join(
        f"WHEN '{lg}' THEN CAST(tot AS BIGINT) * {n} // {d}"
        for lg, (n, d) in MIX_RATIOS.items())
    return f"""WITH cleanq AS (
{oracle_corpus_clean_sql()}
),
kept AS (
  SELECT d.doc_id, d.text, d.lang, d.n_chars
  FROM documents d JOIN cleanq c ON c.doc_id = d.doc_id
  WHERE c.keep
),
win AS (
  SELECT doc_id, text, lang FROM (
    SELECT k.doc_id, k.text, k.lang,
           row_number() OVER (PARTITION BY k.pfx
             ORDER BY k.n_chars DESC, k.doc_id ASC) AS rn
    FROM (SELECT *, array_to_string(
            list_slice(string_split(text, ' '), 1, {pw}), ' ') AS pfx
          FROM kept) k
  ) WHERE rn = 1
),
toks AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM win
),
quota AS (
  SELECT lang, CASE lang {cases} ELSE 0 END AS q
  FROM (SELECT lang, sum(tokens) AS tot FROM toks GROUP BY lang)
),
cum AS (
  SELECT doc_id, lang, tokens,
         sum(tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM toks
)
SELECT cum.doc_id, cum.lang, cum.tokens
FROM cum JOIN quota ON quota.lang = cum.lang
WHERE cum.c <= quota.q"""
