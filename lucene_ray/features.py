"""FeatureField / FeatureQuery — static-rank features stored in the index.

Lucene stores a per-document feature as a pseudo-term whose *term
frequency* carries the float value (document/FeatureField.java:107): the
freq is ``floatToIntBits(v) >>> 15`` and scorers decode it back with
``intBitsToFloat(freq << 15)`` — a lossy 9-bit-mantissa float. Query-time
the feature contributes via a similarity function (FeatureField.java
newSaturationQuery / newLogQuery): Saturation = ``boost * v / (v + pivot)``
evaluated in float32 left-to-right, exactly as Java evaluates the float
expression.

Here the feature "postings" are per-docmeta-bucket parquet files
``features/<name>/bucket=N.parquet`` (doc_id, freq) written in one
distributed docmeta pass — dense, docID-sorted, mergeable like any other
generation. Scoring reads the buckets (columnar, zero-copy) and decodes
freqs vectorized.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def encode_feature(values: np.ndarray) -> np.ndarray:
    """``Float.floatToIntBits(v) >>> 15`` (FeatureField.java:134 role).
    Requires finite positive values (FeatureField rejects <= 0 / NaN)."""
    v = np.asarray(values, dtype=np.float32)
    if (~np.isfinite(v)).any() or (v <= 0).any():
        raise ValueError("feature values must be finite and > 0")
    return (v.view(np.int32).astype(np.int64) >> 15).astype(np.int32)


def decode_feature(freqs: np.ndarray) -> np.ndarray:
    """``Float.intBitsToFloat(freq << 15)`` — the scorer-side decode."""
    f = np.asarray(freqs, dtype=np.int64)
    return (f << 15).astype(np.int32).view(np.float32)


def saturation_score(values: np.ndarray, boost: float, pivot: float
                     ) -> np.ndarray:
    """SaturationFunction.SaturationScorer (FeatureField.java:318):
    ``boost * v / (v + pivot)``, float32 left-to-right."""
    v = np.asarray(values, dtype=np.float32)
    b = np.float32(boost)
    p = np.float32(pivot)
    return (b * v) / (v + p)


def log_score(values: np.ndarray, boost: float, scaling: float
              ) -> np.ndarray:
    """LogFunction.LogScorer (FeatureField.java:218):
    ``boost * (float) Math.log(scaling + v)`` — the log runs in double,
    one float cast after."""
    import math

    v = np.asarray(values, dtype=np.float32)
    uniq, inv = np.unique(v, return_inverse=True)   # few distinct values
    logs = np.array([math.log(float(scaling) + float(x)) for x in uniq],
                    dtype=np.float64)               # C libm, like bm25.py
    return np.float32(boost) * logs.astype(np.float32)[inv]


def build_feature_index(index_dir: str, name: str,
                        source_column: str = "field_len",
                        mod: int = 255) -> str:
    """Derive + store a feature for every doc in one distributed docmeta
    pass: v = (source_column % mod) + 1 ∈ [1, mod] — integer-valued
    features below 256 round-trip the freq encoding losslessly (their
    float32 mantissa fits the surviving 8 bits), which the oracle SQL
    relies on. Written per docmeta bucket for partition-parallel reads."""
    import ray
    import ray.data

    out_dir = os.path.join(index_dir, "features", name)
    if os.path.isdir(out_dir) and any(
            f.endswith(".parquet") for f in os.listdir(out_dir)):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    dm_dir = os.path.join(index_dir, "docmeta")
    buckets = sorted(f for f in os.listdir(dm_dir) if f.endswith(".parquet"))

    @ray.remote
    def one(fname: str) -> None:
        t = pq.read_table(os.path.join(dm_dir, fname),
                          columns=["doc_id", source_column])
        src = t.column(source_column).to_numpy().astype(np.int64)
        v = (src % mod + 1).astype(np.float32)
        out = pa.table({"doc_id": t.column("doc_id"),
                        "freq": pa.array(encode_feature(v))})
        dst = os.path.join(out_dir, fname)
        pq.write_table(out, dst + ".tmp")
        os.replace(dst + ".tmp", dst)

    ray.get([one.remote(f) for f in buckets])
    return out_dir


def update_feature_values(index_dir: str, name: str, doc_ids,
                          values) -> int:
    """In-place numeric docvalue updates —
    ``IndexWriter.updateNumericDocValue`` (index/IndexWriter.java:1911)
    semantics: Lucene rewrites a new docvalues *generation* file next to
    the immutable segment (index/ReadersAndUpdates.java:63 role) rather
    than re-indexing the doc. Here: an append-only overlay generation
    under ``features/<name>/updates/``; readers apply latest-wins at
    lookup. Only docs already carrying the feature are affected (the
    reference likewise requires the field to exist for the doc)."""
    ids = np.asarray(list(doc_ids), dtype=np.int64)
    freqs = encode_feature(np.asarray(list(values), dtype=np.float32))
    if len(ids) != len(freqs):
        raise ValueError("doc_ids and values must align")
    order = np.argsort(ids, kind="stable")
    udir = os.path.join(index_dir, "features", name, "updates")
    os.makedirs(udir, exist_ok=True)
    gen = len([f for f in os.listdir(udir) if f.endswith(".parquet")])
    path = os.path.join(udir, f"gen_{gen:05d}.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                             "freq": pa.array(freqs[order], pa.int32())}),
                   path + ".tmp")
    os.replace(path + ".tmp", path)
    return len(ids)


def _load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted deleted docIDs (union of tombstone generations) — result
    doc sets must honor liveDocs like every query path."""
    ddir = os.path.join(index_dir, "deletes")
    parts = []
    if os.path.isdir(ddir):
        for f in sorted(os.listdir(ddir)):
            if f.endswith(".parquet"):
                parts.append(pq.read_table(
                    os.path.join(ddir, f),
                    columns=["doc_id"]).column("doc_id").to_numpy())
    return (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.int64))


def _load_feature_updates(fdir: str
                          ) -> "tuple[np.ndarray, np.ndarray] | None":
    """Fold all update generations latest-wins → (sorted docs, freqs)."""
    udir = os.path.join(fdir, "updates")
    if not os.path.isdir(udir):
        return None
    gens = sorted(f for f in os.listdir(udir) if f.endswith(".parquet"))
    if not gens:
        return None
    docs_parts, freq_parts = [], []
    for f in gens:
        t = pq.read_table(os.path.join(udir, f))
        docs_parts.append(t.column("doc_id").to_numpy())
        freq_parts.append(t.column("freq").to_numpy())
    docs = np.concatenate(docs_parts)
    freqs = np.concatenate(freq_parts)
    # latest generation wins: reverse, keep first occurrence per doc
    rdocs = docs[::-1]
    uniq, first = np.unique(rdocs, return_index=True)
    return uniq.astype(np.int64), freqs[::-1][first].astype(np.int64)


def feature_scores(index_dir: str, name: str, function: str = "saturation",
                   boost: float = 1.0, pivot: float = 64.0,
                   scaling: float = 1.0
                   ) -> tuple[np.ndarray, np.ndarray]:
    """All (doc_id, score) pairs of the feature clause — a FeatureQuery
    matches every doc carrying the feature (FeatureQuery.java scorer
    iterates the feature term's postings)."""
    fdir = os.path.join(index_dir, "features", name)
    tabs = [pq.read_table(os.path.join(fdir, f))
            for f in sorted(os.listdir(fdir)) if f.endswith(".parquet")]
    t = pa.concat_tables(tabs)
    docs = t.column("doc_id").to_numpy()
    freqs = t.column("freq").to_numpy().astype(np.int64)
    up = _load_feature_updates(fdir)
    if up is not None:                 # docvalues update generations
        udocs, ufreqs = up
        pos = np.minimum(np.searchsorted(udocs, docs), len(udocs) - 1)
        hit = udocs[pos] == docs
        freqs = freqs.copy()
        freqs[hit] = ufreqs[pos[hit]]
    dead = _load_tombstones(index_dir)
    if len(dead):                      # FeatureQuery honors liveDocs
        pos = np.minimum(np.searchsorted(dead, docs), len(dead) - 1)
        live = dead[pos] != docs
        docs, freqs = docs[live], freqs[live]
    v = decode_feature(freqs)
    if function == "saturation":
        s = saturation_score(v, boost, pivot)
    elif function == "log":
        s = log_score(v, boost, scaling)
    else:
        raise ValueError(f"unknown feature function {function!r}")
    return docs.astype(np.int64), s.astype(np.float32)
