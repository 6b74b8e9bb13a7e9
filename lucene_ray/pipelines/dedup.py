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

    from ray.data.aggregate import Count, Min

    return (ds.map_batches(add_hash, batch_format="pyarrow")
            .groupby("h")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups"))
            .select_columns(["doc_id", "n_dups"]))


def _shingle_rows(sf_dir: str):
    """Exploded (doc_id, sh, sz) rows — the distributed inverted index on
    shingle hashes. ``sz`` is the doc's shingle-set size, carried on every
    row so downstream pair aggregation never needs a side lookup."""
    import ray.data

    def explode(batch: pa.Table) -> pa.Table:
        out_d, out_h, out_s = [], [], []
        for doc, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sh = _shingle_hashes(text or "")
            if len(sh) == 0:
                continue
            out_d.append(np.full(len(sh), doc, dtype=np.int64))
            out_h.append(sh)
            out_s.append(np.full(len(sh), len(sh), dtype=np.int32))
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.uint64()),
                             "sz": pa.array([], pa.int32())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_d)),
                         "sh": pa.array(np.concatenate(out_h)),
                         "sz": pa.array(np.concatenate(out_s))})

    return _docs(sf_dir).map_batches(explode, batch_format="pyarrow")


_COARSE_PARTS = 64      # coarse hash buckets for run-vectorized grouping


def _run_pairs(keys: np.ndarray, docs: np.ndarray,
               sizes: np.ndarray | None, max_df: int | None,
               extra: np.ndarray | None = None
               ) -> tuple[np.ndarray, ...]:
    """All co-occurrence doc pairs (a < b) of equal-key runs, fully
    vectorized: rows are lexsorted by (key, doc); runs of each length L
    are batched through one triu_indices broadcast (no per-group Python —
    the reason groupby(key).map_groups is NOT used: a 100 TB corpus has
    billions of tiny key groups). ``sizes``/``extra`` are optional per-row
    payloads carried to both sides of each pair (dtype preserved)."""
    payload = sizes if sizes is not None else extra
    if payload is None:
        payload = np.zeros(len(docs), dtype=np.int32)
    order = np.lexsort((docs, keys))
    k, d, s = keys[order], docs[order], payload[order]
    bnd = np.concatenate([[0], np.flatnonzero(k[1:] != k[:-1]) + 1,
                          [len(k)]])
    lens = np.diff(bnd)
    starts = bnd[:-1]
    out_a, out_b, out_na, out_nb = [], [], [], []
    for length in np.unique(lens):
        length = int(length)
        if length < 2 or (max_df is not None and length > max_df):
            continue
        st = starts[lens == length]
        iu, ju = np.triu_indices(length, 1)
        ia = (st[:, None] + iu[None, :]).ravel()
        ib = (st[:, None] + ju[None, :]).ravel()
        out_a.append(d[ia])
        out_b.append(d[ib])
        out_na.append(s[ia])
        out_nb.append(s[ib])
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, payload.dtype), np.empty(0, payload.dtype)
    return (np.concatenate(out_a), np.concatenate(out_b),
            np.concatenate(out_na), np.concatenate(out_nb))


def _jaccard_pairs_ds(shingles, threshold: float, max_df: int | None = None):
    """Distributed exact word-shingle Jaccard over an inverted index:

    groupby(coarse shingle bucket) → run-vectorized co-occurring doc
    pairs (a<b, set sizes carried) → groupby(a, b) → intersection = pair
    count → jaccard filter.

    Exact and complete for any threshold > 0 (a qualifying pair shares at
    least one shingle). Cost is Σ_sh df(sh)² — at 100 TB set ``max_df`` to
    skip stop-shingles (documented recall loss near the threshold); left
    None here for oracle exactness. Nothing materializes on the driver.
    """
    from ray.data.aggregate import Count, Min

    def bucket(t: pa.Table) -> pa.Table:
        sh = t.column("sh").to_numpy()
        return t.append_column(
            "shp", pa.array((sh % _COARSE_PARTS).astype(np.int32)))

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, na, nb = _run_pairs(g["sh"].to_numpy(),
                                  g["doc_id"].to_numpy(),
                                  g["sz"].to_numpy(), max_df)
        return pd.DataFrame({"a": a, "b": b, "na": na, "nb": nb})

    agg = (shingles.map_batches(bucket, batch_format="pyarrow")
           .groupby("shp").map_groups(co_pairs, batch_format="pandas")
           .groupby(["a", "b"])
           .aggregate(Count(alias_name="inter"),
                      Min("na", alias_name="na"),
                      Min("nb", alias_name="nb")))

    def jac(batch: pa.Table) -> pa.Table:
        inter = batch.column("inter").to_numpy().astype(np.float64)
        na = batch.column("na").to_numpy().astype(np.float64)
        nb = batch.column("nb").to_numpy().astype(np.float64)
        j = inter / (na + nb - inter)
        keep = j >= threshold
        return pa.table({
            "a": batch.column("a").cast(pa.int64()).filter(pa.array(keep)),
            "b": batch.column("b").cast(pa.int64()).filter(pa.array(keep)),
            "jaccard": pa.array(j[keep], pa.float64()),
        })

    return agg.map_batches(jac, batch_format="pyarrow")


def dedup_minhash_lsh(sf_dir: str):
    """Near-dup pairs (a < b) with exact-Jaccard verification ≥ 0.5.

    Fully distributed (no driver-side corpus reads or take_all):
    shingle → minhash (per batch) → explode (band, band_hash, doc) →
    groupby(band, band_hash) → candidate pairs → semi-join the shingle
    inverted index down to candidate docs → distributed exact Jaccard →
    inner-join back to the candidate pair set.
    """
    import ray.data

    ds = _docs(sf_dir)

    _GOLD = np.uint64(0x9E3779B97F4A7C15)

    def mh(batch: pa.Table) -> pa.Table:
        out_doc, out_key = [], []
        for doc, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sh = _shingle_hashes(text or "")
            if len(sh) == 0:      # shingle-less docs never pair (oracle)
                continue
            sig = _minhash(sh)
            for b in range(_N_BANDS):
                band = sig[b * _ROWS_PER_BAND:(b + 1) * _ROWS_PER_BAND]
                bh = np.uint64(int.from_bytes(
                    hashlib.blake2b(band.tobytes(), digest_size=8).digest(),
                    "little"))
                # mix the band index into the 64-bit bucket key: a
                # cross-band collision only adds a candidate pair, which
                # exact-Jaccard verification filters — safe
                out_doc.append(doc)
                out_key.append(np.uint64(bh ^ (np.uint64(b + 1) * _GOLD)))
        return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                         "key": pa.array(np.array(out_key, np.uint64))})

    def bucket(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy()
        return t.append_column(
            "kp", pa.array((k % _COARSE_PARTS).astype(np.int32)))

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, _, _ = _run_pairs(g["key"].to_numpy(),
                                g["doc_id"].to_numpy(), None, None)
        return pd.DataFrame({"a": a, "b": b})

    from ray.data.aggregate import Count

    # join/shuffle partition count scaled to the corpus (tiny sf inputs
    # don't need 8 aggregator actors; large corpora can raise this)
    P = _join_parts(sf_dir)
    cand_pairs = (ds.map_batches(mh, batch_format="pyarrow")
                  .map_batches(bucket, batch_format="pyarrow")
                  .groupby("kp")
                  .map_groups(band_pairs, batch_format="pandas")
                  .groupby(["a", "b"])
                  .aggregate(Count(alias_name="n_bands")))

    def pair_docs(batch: pa.Table) -> pa.Table:
        ids = np.unique(np.concatenate(
            [batch.column("a").to_numpy(), batch.column("b").to_numpy()]))
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    cand_docs = (cand_pairs.map_batches(pair_docs, batch_format="pyarrow")
                 .groupby("doc_id").aggregate(Count(alias_name="c")))

    # distributed semi-join: shingle rows of candidate docs only
    cand_shingles = (_shingle_rows(sf_dir)
                     .join(cand_docs, "inner", P, on=("doc_id",))
                     .select_columns(["doc_id", "sh", "sz"]))
    jac = _jaccard_pairs_ds(cand_shingles, _JACCARD_THRESHOLD)
    # keep LSH semantics: only pairs that banded together qualify
    verified = jac.join(cand_pairs, "inner", P, on=("a", "b"))
    return verified.select_columns(["a", "b", "jaccard"])


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


SIMHASH_MAX_HAMMING = 3


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING):
    """SimHash near-dup pairs (a < b, hamming(sig_a, sig_b) <= k).

    The standard Charikar/Manku pigeonhole scheme: split the 64-bit
    signature into k+1 bands — any pair within Hamming distance k agrees
    EXACTLY on at least one band — so banding is a complete candidate
    generator; candidates verify with one vectorized popcount of the XOR.
    groupby on coarse band buckets + run-vectorized pairing (same shape
    as the MinHash path); rows-only at the driver (the signature uses
    blake2b word hashes, not SQL-expressible) — covered by pytest with
    planted near-identical docs."""
    import ray.data
    from ray.data.aggregate import Count, Min

    nb = max_hamming + 1                 # bands; 64/nb bits each
    bits = 64 // nb

    sigs = dedup_simhash(sf_dir)         # (doc_id, simhash hex)

    def explode(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy()
        sig = np.array([int(s, 16) for s in
                        t.column("simhash").to_pylist()], dtype=np.uint64)
        out_d, out_k, out_s = [], [], []
        for b in range(nb):
            band = (sig >> np.uint64(b * bits)) & np.uint64((1 << bits) - 1)
            key = band | (np.uint64(b) << np.uint64(56))
            out_d.append(doc)
            out_k.append(key)
            out_s.append(sig)
        return pa.table({"doc_id": pa.array(np.concatenate(out_d)),
                         "key": pa.array(np.concatenate(out_k)),
                         "sig": pa.array(np.concatenate(out_s))})

    def bucket(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy()
        return t.append_column(
            "kp", pa.array((k % _COARSE_PARTS).astype(np.int32)))

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, sa, sb = _run_pairs(g["key"].to_numpy(),
                                  g["doc_id"].to_numpy(), None, None,
                                  extra=g["sig"].to_numpy())
        if len(a) == 0:
            return pd.DataFrame({"a": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "hd": np.empty(0, np.int32)})
        x = sa.astype(np.uint64) ^ sb.astype(np.uint64)
        hd = np.zeros(len(x), dtype=np.int32)
        while x.any():                   # vectorized popcount
            hd += (x & np.uint64(1)).astype(np.int32)
            x >>= np.uint64(1)
        keep = hd <= max_hamming
        return pd.DataFrame({"a": a[keep], "b": b[keep], "hd": hd[keep]})

    return (sigs.map_batches(explode, batch_format="pyarrow")
            .map_batches(bucket, batch_format="pyarrow")
            .groupby("kp").map_groups(band_pairs, batch_format="pandas")
            .groupby(["a", "b"])
            .aggregate(Min("hd", alias_name="hamming"), Count(alias_name="_n"))
            .select_columns(["a", "b", "hamming"]))


def oracle_dedup_exact_sql() -> str:
    return ("SELECT min(doc_id) AS doc_id, count(*) AS n_dups "
            "FROM documents GROUP BY text")


JACCARD_NGRAM_THRESHOLD = 0.4


def ngram_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs (a < b, jaccard >= 0.4).

    Distributed shingle inverted index (no all-pairs, no driver-side
    corpus read): a qualifying pair shares at least one 3-gram, so the
    groupby(shingle) co-occurrence pairs are a complete candidate set and
    the per-(a, b) count IS the intersection size — see
    :func:`_jaccard_pairs_ds`.
    """
    return _jaccard_pairs_ds(_shingle_rows(sf_dir), JACCARD_NGRAM_THRESHOLD)


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


def _join_parts(sf_dir: str) -> int:
    """Hash-join/shuffle partition count sized by corpus bytes: 2 for
    sf-test inputs, up to 16 beyond a GB — actor startup dominates tiny
    joins."""
    try:
        size = os.path.getsize(os.path.join(sf_dir, "documents.parquet"))
    except OSError:
        size = 0
        p = os.path.join(sf_dir, "documents.parquet")
        if os.path.isdir(p):
            size = sum(os.path.getsize(os.path.join(p, f))
                       for f in os.listdir(p))
    if size < 64 * 1024 * 1024:
        return 2
    if size < 1024 * 1024 * 1024:
        return 8
    return 16


def dedup_clusters(sf_dir: str):
    """Near-duplicate clusters: connected components over the exact-Jaccard
    pair graph (threshold as ngram_jaccard_pairs), labels = min doc_id of
    the component. Docs in no pair form singleton clusters.

    Distributed min-label propagation: the label table is a Dataset, each
    round joins edge endpoints to current labels plus a label-of-label
    pointer-jumping join (doubling, so chain diameter converges in
    O(log n) rounds), then a groupby(node).min(label). Convergence is
    detected with a scalar Sum aggregate (labels only decrease). The label
    table is materialized once per round — the Pregel-superstep pattern —
    never collected to the driver.
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    P = _join_parts(sf_dir)
    edges = (ngram_jaccard_pairs(sf_dir)
             .select_columns(["a", "b"]).materialize())

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").cast(pa.int64())
        return pa.table({"node": ids, "label": ids})

    labels = (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .map_batches(init_labels, batch_format="pyarrow").materialize())

    if edges.count() > 0:
        prev_sum = None
        while True:
            m1 = (edges.join(labels, "inner", P, on=("b",),
                             right_on=("node",))
                  .map_batches(lambda t: pa.table(
                      {"node": t.column("a"), "label": t.column("label")}),
                      batch_format="pyarrow"))
            m2 = (edges.join(labels, "inner", P, on=("a",),
                             right_on=("node",))
                  .map_batches(lambda t: pa.table(
                      {"node": t.column("b"), "label": t.column("label")}),
                      batch_format="pyarrow"))
            m3 = (labels.join(labels, "inner", P, on=("label",),
                              right_on=("node",),
                              left_suffix="_l", right_suffix="_r")
                  .map_batches(lambda t: pa.table(
                      {"node": t.column("node"),
                       "label": t.column("label_r")}),
                      batch_format="pyarrow"))
            labels = (labels.union(m1, m2, m3)
                      .groupby("node")
                      .aggregate(Min("label", alias_name="label"))
                      .materialize())
            s = labels.aggregate(Sum("label"))["sum(label)"]
            if prev_sum is not None and s == prev_sum:
                break
            prev_sum = s

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "cluster": t.column("label").cast(pa.int64())}),
        batch_format="pyarrow")


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
