"""Indexed shapes — the LatLonShape / ShapeField tessellated-triangle
role, Ray-Data-first.

Reference: ``document/LatLonShape.java:79`` (polygons are tessellated
into triangles and each triangle is indexed as one multi-dimensional BKD
entry), ``geo/Tessellator.java:75`` (ear-clipping triangulation; convex
polygons reduce to a fan), ``document/ShapeField.java:34`` (the per-
triangle encoding carries the triangle's bounding box as the index
dimensions plus the three vertices for the exact per-hit check) and
``document/SpatialQuery.java`` / ``LatLonShapeBoundingBoxQuery``
(QueryRelation INTERSECTS / WITHIN / DISJOINT: the tree descent prunes
on the bbox dims, then each surviving triangle is tested exactly
against the query geometry).

Re-expressed on Parquet: each document's polygon is tessellated into a
triangle FAN (``tessellate_quads``) and the triangle rows — doc_id,
vertex coordinates, bbox — are distributed-sorted by
``(lat_band(min_lat), min_lon, doc_id)``; band + file lineage play the
outer BKD levels and Parquet row-group statistics over all four bbox
columns the leaf cells, exactly like :mod:`lucene_ray.geo`. A box query
prunes files/row-groups on the bbox stats and verifies survivors with an
exact integer separating-axis test (convex triangle vs axis-aligned box
— the box's own axes are the bbox-overlap test, the triangle's three
edge normals the ``NOT EXISTS separating edge`` test), so the verify is
bit-reproducible by the SQL oracle.

The corpus has no real shapes, so each doc gets a deterministic convex
quad (a diamond) from int64 arithmetic on its docID — reproducible in
SQL, clamped away from the poles/dateline so no edge wraps.

Query boxes are CLOSED ([lat_lo, lat_hi] x [lon_lo, lon_hi]) — the
reference's encoded boxes are inclusive on both ends too
(``LatLonShapeBoundingBoxQuery`` operates on encoded inclusive bounds).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .geo import LAT_MOD, LAT_MULT, LON_MOD, LON_MULT, LON_OFF, N_BANDS
from .state.manifest import atomic_write_json

MARGIN = 400_000          # keep every vertex >= this far from the bounds
RY_BASE, RY_MOD = 30_000, 270_000
RX_BASE, RX_MOD = 30_000, 270_000
ROW_GROUP_SIZE = 4096


def synth_quads(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic CCW diamond per doc: (4, 2) int64 vertices
    [(lat, lon), ...] stacked as shape (n, 4, 2). Centers use the same
    multiplicative-hash grid as :func:`lucene_ray.geo.synth_coords` but
    remapped into a MARGIN-inset interior so vertices never leave the
    valid range (clipping a diamond vertex would break convexity)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    cy = (d * LAT_MULT) % (LAT_MOD - 2 * MARGIN) - (LAT_MOD // 2 - MARGIN)
    cx = (d * LON_MULT + LON_OFF) % (LON_MOD - 2 * MARGIN) \
        - (LON_MOD // 2 - MARGIN)
    ry = RY_BASE + (d * 37) % RY_MOD
    rx = RX_BASE + (d * 53) % RX_MOD
    v = np.empty((len(d), 4, 2), dtype=np.int64)
    v[:, 0, 0], v[:, 0, 1] = cy - ry, cx          # bottom
    v[:, 1, 0], v[:, 1, 1] = cy, cx + rx          # right
    v[:, 2, 0], v[:, 2, 1] = cy + ry, cx          # top
    v[:, 3, 0], v[:, 3, 1] = cy, cx - rx          # left
    return v


def tessellate_quads(doc_ids: np.ndarray, quads: np.ndarray) -> pa.Table:
    """Fan triangulation (Tessellator.java:75 — for a convex polygon the
    ear-clip degenerates to the fan (v0, v_i, v_{i+1})): two CCW
    triangles per quad, one row each, with the per-triangle bbox the BKD
    entry indexes (ShapeField.java:34 encodes exactly these 4 bbox dims
    + the 3 vertices)."""
    n = len(doc_ids)
    tris = np.empty((2 * n, 3, 2), dtype=np.int64)
    tris[0::2, 0], tris[0::2, 1], tris[0::2, 2] = \
        quads[:, 0], quads[:, 1], quads[:, 2]
    tris[1::2, 0], tris[1::2, 1], tris[1::2, 2] = \
        quads[:, 0], quads[:, 2], quads[:, 3]
    docs = np.repeat(np.asarray(doc_ids, dtype=np.int64), 2)
    tri_no = np.tile(np.array([0, 1], dtype=np.int64), n)
    lat = tris[:, :, 0]
    lon = tris[:, :, 1]
    return pa.table({
        "doc_id": pa.array(docs), "tri": pa.array(tri_no),
        "ay": pa.array(tris[:, 0, 0]), "ax": pa.array(tris[:, 0, 1]),
        "by": pa.array(tris[:, 1, 0]), "bx": pa.array(tris[:, 1, 1]),
        "cy": pa.array(tris[:, 2, 0]), "cx": pa.array(tris[:, 2, 1]),
        "min_lat": pa.array(lat.min(axis=1)),
        "max_lat": pa.array(lat.max(axis=1)),
        "min_lon": pa.array(lon.min(axis=1)),
        "max_lon": pa.array(lon.max(axis=1)),
    })


def build_shape_index(index_dir: str, bands: int = N_BANDS,
                      row_group_size: int = ROW_GROUP_SIZE) -> dict:
    """One distributed sort of the triangle rows by
    (band(min_lat), min_lon, doc_id); idempotent + manifest-invalidated
    like the other derived indexes (points/geo)."""
    import ray.data

    from .geo import _band
    from .points import _manifest_version, _wipe_derived

    out_dir = os.path.join(index_dir, "points", "_shapes")
    lineage_path = os.path.join(out_dir, "_lineage.json")
    mv = _manifest_version(index_dir)
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            lineage = json.load(f)
        if lineage.get("manifest_version") == mv:
            return lineage
        _wipe_derived(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_parquet(os.path.join(index_dir, "docmeta"),
                               columns=["doc_id"])

    def to_triangles(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        t = tessellate_quads(docs, synth_quads(docs))
        return t.append_column(
            "band", pa.array(_band(t.column("min_lat").to_numpy(), bands)))

    def write_part(batch: pa.Table) -> pa.Table:
        empty = {"file": pa.array([], pa.string()),
                 "band_min": pa.array([], pa.int64()),
                 "band_max": pa.array([], pa.int64()),
                 "lat_min": pa.array([], pa.int64()),
                 "lat_max": pa.array([], pa.int64()),
                 "lon_min": pa.array([], pa.int64()),
                 "lon_max": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "n_row_groups": pa.array([], pa.int64())}
        if batch.num_rows == 0:
            return pa.table(empty)
        b = batch.column("band").to_numpy()
        mlo = batch.column("min_lon").to_numpy()
        first_doc = int(batch.column("doc_id")[0].as_py())
        name = f"part_{int(b[0]):04d}_{int(mlo[0]) + LON_MOD:012d}_" \
               f"{first_doc:012d}.parquet"
        path = os.path.join(out_dir, name)
        pq.write_table(batch, path + ".tmp", row_group_size=row_group_size)
        os.replace(path + ".tmp", path)
        n_rg = pq.ParquetFile(path).metadata.num_row_groups
        return pa.table({
            "file": pa.array([name], pa.string()),
            "band_min": pa.array([int(b.min())], pa.int64()),
            "band_max": pa.array([int(b.max())], pa.int64()),
            "lat_min": pa.array([int(batch.column("min_lat").to_numpy()
                                     .min())], pa.int64()),
            "lat_max": pa.array([int(batch.column("max_lat").to_numpy()
                                     .max())], pa.int64()),
            "lon_min": pa.array([int(mlo.min())], pa.int64()),
            "lon_max": pa.array([int(batch.column("max_lon").to_numpy()
                                     .max())], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
            "n_row_groups": pa.array([n_rg], pa.int64())})

    rows = (ds.map_batches(to_triangles, batch_format="pyarrow")
            .sort(["band", "min_lon", "doc_id"])
            .map_batches(write_part, batch_format="pyarrow")
            .take_all())
    lineage = {"bands": bands, "row_group_size": row_group_size,
               "manifest_version": mv,
               "files": sorted(rows, key=lambda r: r["file"])}
    atomic_write_json(lineage_path, lineage)
    return lineage


_TRI_COLS = ["doc_id", "ay", "ax", "by", "bx", "cy", "cx",
             "min_lat", "max_lat", "min_lon", "max_lon"]


def _tri_box_flags(t: pa.Table, lat_lo: int, lat_hi: int,
                   lon_lo: int, lon_hi: int
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact (intersects, within, corner_bits) flags for each triangle
    row vs the CLOSED box — integer separating-axis test. The box's two
    axes are the bbox-overlap check; a CCW triangle edge separates iff
    all four box corners lie STRICTLY on its outside (cross < 0), so
    touching counts as intersecting, matching the reference's inclusive
    encoded boxes. Within = all three vertices inside (box is convex).
    corner_bits: bit k set iff the triangle CONTAINS box corner k (all
    three edge crosses >= 0) — the per-triangle evidence the CONTAINS
    relation aggregates per doc."""
    ay = t.column("ay").to_numpy(); ax = t.column("ax").to_numpy()
    by = t.column("by").to_numpy(); bx = t.column("bx").to_numpy()
    cy = t.column("cy").to_numpy(); cx = t.column("cx").to_numpy()
    overlap = ((t.column("max_lat").to_numpy() >= lat_lo)
               & (t.column("min_lat").to_numpy() <= lat_hi)
               & (t.column("max_lon").to_numpy() >= lon_lo)
               & (t.column("min_lon").to_numpy() <= lon_hi))
    corners = ((lat_lo, lon_lo), (lat_lo, lon_hi),
               (lat_hi, lon_hi), (lat_hi, lon_lo))
    separated = np.zeros(t.num_rows, dtype=bool)
    corner_in = [np.ones(t.num_rows, dtype=bool) for _ in corners]
    for (py_, px_, qy_, qx_) in ((ay, ax, by, bx), (by, bx, cy, cx),
                                 (cy, cx, ay, ax)):
        ey, ex = qy_ - py_, qx_ - px_
        out_all = np.ones(t.num_rows, dtype=bool)
        for k, (gy, gx) in enumerate(corners):
            cr = ex * (gy - py_) - ey * (gx - px_)
            out_all &= cr < 0
            corner_in[k] &= cr >= 0
        separated |= out_all
    intersects = overlap & ~separated
    within = ((ay >= lat_lo) & (ay <= lat_hi) & (ax >= lon_lo)
              & (ax <= lon_hi) & (by >= lat_lo) & (by <= lat_hi)
              & (bx >= lon_lo) & (bx <= lon_hi) & (cy >= lat_lo)
              & (cy <= lat_hi) & (cx >= lon_lo) & (cx <= lon_hi))
    corner_bits = np.zeros(t.num_rows, dtype=np.uint8)
    for k in range(4):
        corner_bits |= corner_in[k].astype(np.uint8) << np.uint8(k)
    return intersects, within, corner_bits


def shape_box(index_dir: str, lat_lo: int, lat_hi: int,
              lon_lo: int, lon_hi: int, relation: str = "intersects"
              ) -> tuple[np.ndarray, dict]:
    """LatLonShape.newBoxQuery (LatLonShapeBoundingBoxQuery role) over
    the triangle index: sorted docIDs whose shape INTERSECTS / is WITHIN
    / is DISJOINT from / CONTAINS the closed box.

    INTERSECTS/WITHIN/CONTAINS prune files on (band, lon) lineage and
    row groups on all four bbox-column statistics, then run the exact
    test on survivors (a triangle contributing corner coverage to
    CONTAINS necessarily bbox-overlaps the box, so the same descent is
    complete). DISJOINT must visit every doc (the reference's DISJOINT
    descent likewise walks everything the query bbox doesn't wholly
    contain) — it reads doc_id everywhere but runs the exact test only
    on bbox-overlapping row groups.

    CONTAINS: every box corner is inside SOME triangle of the doc —
    exact for the convex shapes this index stores (the reference's
    CONTAINS tracks original-edge membership per triangle to handle
    concave unions, ShapeField.java:34 encodes those flags).
    """
    if relation not in ("intersects", "within", "disjoint", "contains"):
        raise ValueError(f"unknown relation {relation!r}")
    out_dir = os.path.join(index_dir, "points", "_shapes")
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    total_rg = int(sum(r["n_row_groups"] for r in lineage["files"]))
    read_rg = 0
    hit_docs: list[np.ndarray] = []     # triangles that intersect
    within_ok: list[np.ndarray] = []    # (doc, within?) per triangle
    all_docs: list[np.ndarray] = []     # disjoint only: the doc universe
    corner_rows: list = []              # contains only: (docs, bits)
    for rec in lineage["files"]:
        file_overlap = not (rec["lat_min"] > lat_hi
                            or rec["lat_max"] < lat_lo
                            or rec["lon_min"] > lon_hi
                            or rec["lon_max"] < lon_lo)
        if not file_overlap and relation != "disjoint":
            continue
        pf = pq.ParquetFile(os.path.join(out_dir, rec["file"]))
        idx = {c: pf.schema_arrow.get_field_index(c)
               for c in ("min_lat", "max_lat", "min_lon", "max_lon")}
        groups = []
        if file_overlap:
            for g in range(pf.metadata.num_row_groups):
                rg = pf.metadata.row_group(g)
                st = {c: rg.column(i).statistics for c, i in idx.items()}
                if any(s is None for s in st.values()):
                    groups.append(g)
                    continue
                if (st["min_lat"].min > lat_hi or st["max_lat"].max < lat_lo
                        or st["min_lon"].min > lon_hi
                        or st["max_lon"].max < lon_lo):
                    continue
                groups.append(g)
        if relation == "disjoint":
            # the complement needs every doc_id; exact tests only where
            # the bbox says a triangle COULD intersect
            skipped = [g for g in range(pf.metadata.num_row_groups)
                       if g not in set(groups)]
            if skipped:
                all_docs.append(pf.read_row_groups(
                    skipped, columns=["doc_id"]).column("doc_id")
                    .to_numpy())
        if not groups:
            continue
        read_rg += len(groups)
        t = pf.read_row_groups(groups, columns=_TRI_COLS)
        inter, within, cbits = _tri_box_flags(t, lat_lo, lat_hi,
                                              lon_lo, lon_hi)
        docs = t.column("doc_id").to_numpy()
        if relation == "disjoint":
            all_docs.append(docs)
        hit_docs.append(docs[inter])
        if relation == "within":
            within_ok.append(docs[within])
        if relation == "contains":
            m = cbits > 0
            corner_rows.append((docs[m], cbits[m]))

    inter_docs = (np.unique(np.concatenate(hit_docs)) if hit_docs
                  else np.empty(0, np.int64))
    metrics = {"row_groups_total": total_rg, "row_groups_read": read_rg,
               "files_total": len(lineage["files"])}
    if relation == "intersects":
        return inter_docs.astype(np.int64), metrics
    if relation == "within":
        # a doc is within iff ALL its triangles are within; every doc has
        # exactly 2 fan triangles in this index
        w = (np.concatenate(within_ok) if within_ok
             else np.empty(0, np.int64))
        docs, counts = np.unique(w, return_counts=True)
        return docs[counts == 2].astype(np.int64), metrics
    if relation == "contains":
        if not corner_rows:
            return np.empty(0, np.int64), metrics
        d = np.concatenate([r[0] for r in corner_rows])
        b = np.concatenate([r[1] for r in corner_rows])
        if len(d) == 0:
            return np.empty(0, np.int64), metrics
        order = np.argsort(d, kind="stable")
        d, b = d[order], b[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        agg = np.bitwise_or.reduceat(b, starts)
        return d[starts][agg == 0b1111].astype(np.int64), metrics
    universe = (np.unique(np.concatenate(all_docs)) if all_docs
                else np.empty(0, np.int64))
    return np.setdiff1d(universe, inter_docs).astype(np.int64), metrics


def _seg_dist_le(py: int, px: int, ay: int, ax: int, by: int, bx: int,
                 r2: int) -> bool:
    """Exact integer test: point-to-segment distance² <= r2 (Python
    ints — cross² exceeds int64 at candidate magnitudes)."""
    aby, abx = by - ay, bx - ax
    apy, apx = py - ay, px - ax
    dot = apy * aby + apx * abx
    l2 = aby * aby + abx * abx
    if dot <= 0 or l2 == 0:
        return apy * apy + apx * apx <= r2
    if dot >= l2:
        bpy, bpx = py - by, px - bx
        return bpy * bpy + bpx * bpx <= r2
    cross = apx * aby - apy * abx
    return cross * cross <= r2 * l2


def _tri_circle_intersects(row, cy: int, cx: int, r2: int) -> bool:
    ay, ax, by, bx, ty, tx = row
    # CCW triangle: center inside iff no edge has it strictly outside
    e1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    e2 = (tx - bx) * (cy - by) - (ty - by) * (cx - bx)
    e3 = (ax - tx) * (cy - ty) - (ay - ty) * (cx - tx)
    if e1 >= 0 and e2 >= 0 and e3 >= 0:
        return True
    return (_seg_dist_le(cy, cx, ay, ax, by, bx, r2)
            or _seg_dist_le(cy, cx, by, bx, ty, tx, r2)
            or _seg_dist_le(cy, cx, ty, tx, ay, ax, r2))


def shape_distance(index_dir: str, cy: int, cx: int, r: int,
                   relation: str = "intersects"
                   ) -> tuple[np.ndarray, dict]:
    """Distance (circle) query over the triangle index — the
    ``XYShape.newDistanceQuery`` role (document/XYShape.java,
    ShapeField triangle encoding; the planar circle-vs-triangle
    relation of XYShapeDistanceQuery): docIDs whose shape INTERSECTS /
    is WITHIN / is DISJOINT from the circle (cy, cx, r).

    Descent: the circle is boxed by the square [c−r, c+r]² for
    file-lineage and row-group-statistics pruning (a triangle meeting
    the circle must meet the square); survivors get the EXACT integer
    test — center-in-triangle sign checks plus point-to-segment
    cross²<=r²·|AB|² comparisons in arbitrary-precision ints, so the
    HUGEINT SQL oracle reproduces every boundary case bit-for-bit.
    WITHIN (shape inside circle) = every vertex of both fan triangles
    inside (convexity), via the count==2 rule; DISJOINT reads the doc
    universe like the box query."""
    if relation not in ("intersects", "within", "disjoint"):
        raise ValueError(f"unknown relation {relation!r}")
    lat_lo, lat_hi = cy - r, cy + r
    lon_lo, lon_hi = cx - r, cx + r
    r2 = int(r) * int(r)
    out_dir = os.path.join(index_dir, "points", "_shapes")
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    total_rg = int(sum(rec["n_row_groups"] for rec in lineage["files"]))
    read_rg = 0
    hit_docs: list[np.ndarray] = []
    within_ok: list[np.ndarray] = []
    all_docs: list[np.ndarray] = []
    for rec in lineage["files"]:
        file_overlap = not (rec["lat_min"] > lat_hi
                            or rec["lat_max"] < lat_lo
                            or rec["lon_min"] > lon_hi
                            or rec["lon_max"] < lon_lo)
        if not file_overlap and relation != "disjoint":
            continue
        pf = pq.ParquetFile(os.path.join(out_dir, rec["file"]))
        idx = {c: pf.schema_arrow.get_field_index(c)
               for c in ("min_lat", "max_lat", "min_lon", "max_lon")}
        groups = []
        if file_overlap:
            for g in range(pf.metadata.num_row_groups):
                rg = pf.metadata.row_group(g)
                st = {c: rg.column(i).statistics for c, i in idx.items()}
                if any(s is None for s in st.values()):
                    groups.append(g)
                    continue
                if (st["min_lat"].min > lat_hi or st["max_lat"].max < lat_lo
                        or st["min_lon"].min > lon_hi
                        or st["max_lon"].max < lon_lo):
                    continue
                groups.append(g)
        if relation == "disjoint":
            skipped = [g for g in range(pf.metadata.num_row_groups)
                       if g not in set(groups)]
            if skipped:
                all_docs.append(pf.read_row_groups(
                    skipped, columns=["doc_id"]).column("doc_id")
                    .to_numpy())
        if not groups:
            continue
        read_rg += len(groups)
        t = pf.read_row_groups(groups, columns=_TRI_COLS)
        docs = t.column("doc_id").to_numpy()
        if relation == "disjoint":
            all_docs.append(docs)
        vy = [t.column(c).to_numpy() for c in ("ay", "by", "cy")]
        vx = [t.column(c).to_numpy() for c in ("ax", "bx", "cx")]
        # bbox-vs-square precheck keeps the exact loop tiny
        pre = ~((t.column("min_lat").to_numpy() > lat_hi)
                | (t.column("max_lat").to_numpy() < lat_lo)
                | (t.column("min_lon").to_numpy() > lon_hi)
                | (t.column("max_lon").to_numpy() < lon_lo))
        rows = np.column_stack([vy[0], vx[0], vy[1], vx[1],
                                vy[2], vx[2]])
        inter = np.zeros(len(docs), bool)
        for i in np.flatnonzero(pre):
            inter[i] = _tri_circle_intersects(
                [int(v) for v in rows[i]], cy, cx, r2)
        hit_docs.append(docs[inter])
        if relation == "within":
            ok = np.ones(len(docs), bool)
            for y, x in zip(vy, vx):
                dy = y.astype(object) - cy       # exact ints (dy² > int64)
                dx = x.astype(object) - cx
                ok &= np.array([int(a) * int(a) + int(b) * int(b) <= r2
                                for a, b in zip(dy, dx)])
            within_ok.append(docs[ok])
    inter_docs = (np.unique(np.concatenate(hit_docs)) if hit_docs
                  else np.empty(0, np.int64))
    metrics = {"row_groups_total": total_rg, "row_groups_read": read_rg,
               "files_total": len(lineage["files"])}
    if relation == "intersects":
        return inter_docs.astype(np.int64), metrics
    if relation == "within":
        w = (np.concatenate(within_ok) if within_ok
             else np.empty(0, np.int64))
        docs, counts = np.unique(w, return_counts=True)
        return docs[counts == 2].astype(np.int64), metrics
    universe = (np.unique(np.concatenate(all_docs)) if all_docs
                else np.empty(0, np.int64))
    return np.setdiff1d(universe, inter_docs).astype(np.int64), metrics
