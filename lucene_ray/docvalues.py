"""Sorted-set docvalues: ordinal columns for keyword fields.

The reference stores keyword fields as per-segment ORDINALS — a sorted
per-segment value dictionary plus an int ord per doc
(``lucene/core/src/java/org/apache/lucene/index/SortedSetDocValuesWriter.java:43``,
format ``codecs/lucene90/Lucene90DocValuesFormat.java:139``) — and maps
per-segment ords to global ords at search time with an OrdinalMap
(``index/OrdinalMap.java``). Faceting/sorting then touch only small ints;
strings are resolved once for the final k rows. That is what makes
100-TB facets cheap.

Ray-Data-first layout under ``<index_dir>/docvalues/<field>/``:

- ``ords_bucket=N.parquet`` — (doc_id int64, ord int32) per docmeta
  bucket, ords into the bucket's own sorted dictionary (one build task
  per bucket; only the tiny per-bucket dictionaries reach the driver —
  the standard docvalues assumption that keyword cardinality ≪ corpus).
- ``map_bucket=N.parquet`` — local ord → global ord (the OrdinalMap).
- ``dict.parquet`` — (gord int32, value) global sorted dictionary.

The facet pipeline (:func:`facet_counts_dv`) bincounts LOCAL ords per
bucket, gathers through the bucket's OrdinalMap row, merges the tiny
(gord, n) partials, and joins value strings only on the final rows.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _dv_dir(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, "docvalues", field)


def build_docvalues(index_dir: str, field: str) -> str:
    """Build the ordinal docvalues for one keyword field (idempotent:
    returns immediately when ``dict.parquet`` exists). One Ray task per
    docmeta bucket writes the ord column; the driver unions the
    per-bucket dictionaries (small) into the global dict + OrdinalMap."""
    import ray
    import ray.data

    out = _dv_dir(index_dir, field)
    if os.path.exists(os.path.join(out, "dict.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    dm_dir = os.path.join(index_dir, "docmeta")
    buckets = sorted(f for f in os.listdir(dm_dir) if f.endswith(".parquet"))

    def encode_bucket(batch: pa.Table) -> pa.Table:
        rows = []
        for fname in batch.column("file").to_pylist():
            t = pq.read_table(os.path.join(dm_dir, fname),
                              columns=["doc_id", field])
            col = t.column(field)
            vals = col.to_pylist()
            uniq = sorted({v for v in vals if v is not None})
            pos = {v: i for i, v in enumerate(uniq)}
            ords = np.array([pos.get(v, -1) for v in vals], np.int32)
            n = fname.split("=")[1].split(".")[0]
            pq.write_table(pa.table({
                "doc_id": t.column("doc_id"),
                "ord": pa.array(ords, pa.int32())}),
                os.path.join(out, f"ords_bucket={n}.parquet"))
            rows.append((n, uniq))
        return pa.table({
            "bucket": pa.array([r[0] for r in rows], pa.string()),
            "values": pa.array([r[1] for r in rows],
                               pa.list_(pa.string()))})

    parts = (ray.data.from_items([{"file": f} for f in buckets])
             .map_batches(encode_bucket, batch_format="pyarrow",
                          batch_size=1)
             .take_all())                      # tiny: per-bucket dicts
    all_vals = sorted({v for r in parts for v in r["values"]})
    gpos = {v: i for i, v in enumerate(all_vals)}
    for r in parts:
        gmap = np.array([gpos[v] for v in r["values"]], np.int32)
        pq.write_table(
            pa.table({"gord": pa.array(gmap, pa.int32())}),
            os.path.join(out, f"map_bucket={r['bucket']}.parquet"))
    tmp = os.path.join(out, "dict.parquet.tmp")
    pq.write_table(pa.table({
        "gord": pa.array(np.arange(len(all_vals), dtype=np.int32)),
        "value": pa.array(all_vals, pa.string())}), tmp)
    os.replace(tmp, os.path.join(out, "dict.parquet"))
    return out


def facet_counts_dv(index_dir: str, field: str, value_col: str | None = None):
    """Facet doc counts per field value via ordinals
    (StringValueFacetCounts over SortedSetDocValues,
    facet/.../StringValueFacetCounts.java:60 + OrdinalMap): per-bucket
    int bincount → OrdinalMap gather → small (gord, n) combiner groupby
    → string resolution on the final rows only. Returns a Dataset with
    columns (``value_col`` or ``field``, n)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    dv = build_docvalues(index_dir, field)
    buckets = sorted(f.split("=")[1].split(".")[0]
                     for f in os.listdir(dv) if f.startswith("ords_bucket="))
    from .features import _load_tombstones
    dead = _load_tombstones(index_dir)
    dead_ref = ray.put(dead)

    def bucket_counts(batch: pa.Table) -> pa.Table:
        deleted = ray.get(dead_ref)
        out_g, out_n = [], []
        for b in batch.column("bucket").to_pylist():
            ot = pq.read_table(
                os.path.join(dv, f"ords_bucket={b}.parquet"),
                columns=["doc_id", "ord"])
            ords = ot.column("ord").to_numpy()
            if len(deleted):           # facets honor liveDocs
                ids = ot.column("doc_id").to_numpy()
                pos = np.minimum(np.searchsorted(deleted, ids),
                                 len(deleted) - 1)
                ords = ords[deleted[pos] != ids]
            gmap = pq.read_table(
                os.path.join(dv, f"map_bucket={b}.parquet"),
                columns=["gord"]).column("gord").to_numpy()
            live = ords[ords >= 0]
            if len(live) == 0:
                continue
            cnt = np.bincount(live, minlength=len(gmap))
            nz = np.flatnonzero(cnt)
            out_g.append(gmap[nz].astype(np.int32))
            out_n.append(cnt[nz].astype(np.int64))
        if not out_g:
            return pa.table({"gord": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"gord": pa.array(np.concatenate(out_g)),
                         "n": pa.array(np.concatenate(out_n))})

    agg = (ray.data.from_items([{"bucket": b} for b in buckets])
           .map_batches(bucket_counts, batch_format="pyarrow")
           .groupby("gord").aggregate(Sum("n", alias_name="n")))

    dict_t = pq.read_table(os.path.join(dv, "dict.parquet"))
    values = dict_t.column("value").to_pylist()
    vref = ray.put(values)
    name = value_col or field

    def resolve(batch: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        g = batch.column("gord").to_numpy()
        return pa.table({
            name: pa.array([vs[int(i)] for i in g], pa.string()),
            "n": batch.column("n").cast(pa.int64())})

    return agg.map_batches(resolve, batch_format="pyarrow")
