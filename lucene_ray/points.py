"""Numeric point index — the BKD-tree role, Ray-Data-first.

Reference: ``codecs/lucene90/Lucene90PointsFormat.java:48`` (BKD tree over
packed numeric values), ``document/IntPoint.java:47``,
``search/PointRangeQuery.java:54``. Lucene organizes values into a
balanced k-d tree whose inner nodes carry value ranges so a range query
descends only into overlapping leaves.

Re-expressed on Parquet: one distributed sort by ``(value, doc_id)`` →
value-ordered files with small row groups. File-level [min, max] lineage
plays the role of the upper tree levels, Parquet row-group statistics the
leaf level; :func:`numeric_range` prunes files by lineage, then row
groups by their stats, and decodes only overlapping groups (the BKD
``intersect()`` descent). Pruning counts are returned and persisted so
the effect is observable.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.manifest import atomic_write_json

ROW_GROUP_SIZE = 4096


def build_numeric_index(index_dir: str, field: str,
                        row_group_size: int = ROW_GROUP_SIZE) -> dict:
    """Build the point index for a docmeta numeric field.

    ``ds.sort((field, doc_id))`` is the one wide operation (range
    shuffle); each sorted block becomes one value-ordered file written by
    the task that holds it. Lineage (per-file value range, row counts,
    row-group count) lands next to the files; the build is idempotent
    (existing lineage short-circuits)."""
    import ray.data

    out_dir = os.path.join(index_dir, "points", field)
    lineage_path = os.path.join(out_dir, "_lineage.json")
    mv = _manifest_version(index_dir)
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            lineage = json.load(f)
        if lineage.get("manifest_version") == mv:
            return lineage
        _wipe_derived(out_dir)        # stale: docmeta moved on (append/
    os.makedirs(out_dir, exist_ok=True)  # addIndexes bumped the manifest)

    ds = ray.data.read_parquet(os.path.join(index_dir, "docmeta"),
                               columns=["doc_id", field])

    def write_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "vmin": pa.array([], pa.int64()),
                             "vmax": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "n_row_groups": pa.array([], pa.int64())})
        vals = batch.column(field).to_numpy()
        first_doc = int(batch.column("doc_id")[0].as_py())
        name = f"part_{int(vals[0]):012d}_{first_doc:012d}.parquet"
        path = os.path.join(out_dir, name)
        pq.write_table(batch, path + ".tmp", row_group_size=row_group_size)
        os.replace(path + ".tmp", path)
        n_rg = pq.ParquetFile(path).metadata.num_row_groups
        return pa.table({"file": pa.array([name], pa.string()),
                         "vmin": pa.array([int(vals[0])], pa.int64()),
                         "vmax": pa.array([int(vals[-1])], pa.int64()),
                         "n": pa.array([batch.num_rows], pa.int64()),
                         "n_row_groups": pa.array([n_rg], pa.int64())})

    rows = (ds.sort([field, "doc_id"])
            .map_batches(write_part, batch_format="pyarrow")
            .take_all())
    lineage = {"field": field, "row_group_size": row_group_size,
               "manifest_version": mv,
               "files": sorted(rows, key=lambda r: (r["vmin"], r["file"]))}
    atomic_write_json(lineage_path, lineage)
    return lineage


def _manifest_version(index_dir: str) -> "int | None":
    """Index manifest version (None for bare docmeta dirs without a
    manifest, e.g. standalone point-index tests)."""
    try:
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return int(json.load(f)["version"])
    except (FileNotFoundError, KeyError, ValueError):
        return None


def _wipe_derived(out_dir: str) -> None:
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") or f.endswith(".json"):
            os.remove(os.path.join(out_dir, f))


def ensure_numeric_index(index_dir: str, field: str) -> dict:
    return build_numeric_index(index_dir, field)


def _scan_values(out_dir: str, lineage: dict, field: str, lo: int, hi: int
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """Pruned scan: (doc_ids, values) with lo <= value < hi and the number
    of row groups actually decoded. Files prune on lineage [vmin, vmax],
    row groups on Parquet column statistics."""
    read_rg = 0
    hit_d: list[np.ndarray] = []
    hit_v: list[np.ndarray] = []
    if lo < hi:
        for rec in lineage["files"]:
            if rec["vmax"] < lo or rec["vmin"] >= hi:
                continue                               # file pruned
            pf = pq.ParquetFile(os.path.join(out_dir, rec["file"]))
            fidx = pf.schema_arrow.get_field_index(field)
            groups = []
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(fidx).statistics
                if st is not None and (st.max < lo or st.min >= hi):
                    continue                           # row group pruned
                groups.append(g)
            if not groups:
                continue
            read_rg += len(groups)
            t = pf.read_row_groups(groups, columns=["doc_id", field])
            v = t.column(field).to_numpy()
            d = t.column("doc_id").to_numpy()
            m = (v >= lo) & (v < hi)
            hit_d.append(d[m])
            hit_v.append(v[m])
    if hit_d:
        docs = np.concatenate(hit_d).astype(np.int64)
        vals = np.concatenate(hit_v).astype(np.int64)
    else:
        docs = np.empty(0, np.int64)
        vals = np.empty(0, np.int64)
    return docs, vals, read_rg


def numeric_range(index_dir: str, field: str, lo: int, hi: int
                  ) -> tuple[np.ndarray, dict]:
    """PointRangeQuery: sorted doc_ids with lo <= field < hi, plus pruning
    metrics. Files prune on lineage [vmin, vmax], row groups on Parquet
    column statistics — only overlapping groups are decoded."""
    out_dir = os.path.join(index_dir, "points", field)
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    total_rg = int(sum(r["n_row_groups"] for r in lineage["files"]))
    docs, _vals, read_rg = _scan_values(out_dir, lineage, field, lo, hi)
    metrics = {"row_groups_total": total_rg, "row_groups_read": read_rg,
               "files_total": len(lineage["files"])}
    return np.sort(docs), metrics


def distance_feature_topk(index_dir: str, field: str, origin: int,
                          pivot: int, k: int, boost: float = 1.0
                          ) -> tuple[np.ndarray, np.ndarray, dict]:
    """Distance feature query — ``LongPoint.newDistanceFeatureQuery``
    (document/LongDistanceFeatureQuery.java:40): top-k docs by
    ``(float)(boost * (pivot / (pivot + |value - origin|)))``, ties by
    doc_id. The reference iterates docs in an ever-narrowing window
    around the origin, skipping values whose best possible score cannot
    beat the current k-th (``maxDistance`` updates in its scorer); here
    the dual: expand shells [origin±w] outward, doubling w, and stop as
    soon as the k-th collected score strictly beats the best score any
    value outside the shell could have — distant row groups are never
    decoded.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out_dir = os.path.join(index_dir, "points", field)
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    files = lineage["files"]
    total_rg = int(sum(r["n_row_groups"] for r in files))
    gmin = min((r["vmin"] for r in files), default=origin)
    gmax = max((r["vmax"] for r in files), default=origin)
    docs = np.empty(0, np.int64)
    vals = np.empty(0, np.int64)
    read_rg = 0
    w = max(int(pivot), 1)
    prev_lo, prev_hi = origin, origin      # empty window so far
    while True:
        lo, hi = origin - w, origin + w + 1
        # scan only the two new shells, not the already-read core
        for slo, shi in ((lo, prev_lo), (prev_hi, hi)):
            d, v, rg = _scan_values(out_dir, lineage, field,
                                    max(slo, lo), min(shi, hi))
            read_rg += rg
            if len(d):
                docs = np.concatenate([docs, d])
                vals = np.concatenate([vals, v])
        prev_lo, prev_hi = lo, hi
        covered = lo <= gmin and hi > gmax
        if len(docs) >= k or covered:
            dist = np.abs(vals - origin).astype(np.float64)
            score = (boost * (float(pivot) / (pivot + dist))) \
                .astype(np.float32)
            order = np.lexsort((docs, -score))[:k]
            # best score achievable outside the shell (distance > w)
            bound = np.float32(boost * (float(pivot) / (pivot + w + 1)))
            if covered or (len(order) >= k and score[order[-1]] > bound):
                metrics = {"row_groups_total": total_rg,
                           "row_groups_read": read_rg,
                           "files_total": len(files)}
                return docs[order], score[order], metrics
        w *= 2
