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


def text_quality(sf_dir: str):
    """Integer/ratio quality features per doc (all exactly reproducible)."""
    stop = set(STOPWORDS)

    def feats(batch: pa.Table) -> pa.Table:
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

    return _docs(sf_dir).map_batches(feats, batch_format="pyarrow")


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
