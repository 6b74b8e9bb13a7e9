"""2D point index — the LatLonPoint / XYPoint BKD role, Ray-Data-first.

Reference: ``document/LatLonPoint.java:63`` (2D lat/lon points quantized
to int32, indexed in a 2D BKD tree, queried with newBoxQuery /
newDistanceQuery) and ``document/XYPointField.java`` (cartesian points
with Euclidean distance). Lucene's 2D BKD splits alternately on the two
dims; a box/distance query descends only into overlapping cells, and the
distance query is a bounding-box descent plus an exact per-hit distance
check.

Re-expressed on Parquet: coordinates are integer micro-degrees; the one
wide operation is a distributed sort by ``(lat_band, lon, doc_id)`` —
lat bands play the first BKD split level, lon order within a band the
second, Parquet row-group column statistics (over BOTH dims) the leaf
cells. :func:`geo_box` prunes files on band/lon lineage and row groups on
both dims' statistics; :func:`geo_distance` prunes with the radius
bounding box then applies the exact integer squared-Euclidean check
(XYPoint.newDistanceQuery semantics; LatLonPoint's haversine variant has
the identical prune shape with a trig verify).

The corpus has no real coordinates, so they are synthesized
deterministically from the index docID (int64 arithmetic reproducible in
the SQL oracle): lat = (d*2654435761) % 180e6 - 90e6 micro-degrees,
lon = (d*2246822519 + 123456789) % 360e6 - 180e6.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.manifest import atomic_write_json

LAT_MOD = 180_000_000
LON_MOD = 360_000_000
LAT_MULT = 2_654_435_761
LON_MULT = 2_246_822_519
LON_OFF = 123_456_789
N_BANDS = 64
ROW_GROUP_SIZE = 4096


def synth_coords(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    d = np.asarray(doc_ids, dtype=np.int64)
    lat = (d * LAT_MULT) % LAT_MOD - LAT_MOD // 2
    lon = (d * LON_MULT + LON_OFF) % LON_MOD - LON_MOD // 2
    return lat, lon


def _band(lat: np.ndarray, bands: int = N_BANDS) -> np.ndarray:
    b = (lat + LAT_MOD // 2) * bands // LAT_MOD
    return np.clip(b, 0, bands - 1).astype(np.int64)


def build_geo_index(index_dir: str, bands: int = N_BANDS,
                    row_group_size: int = ROW_GROUP_SIZE) -> dict:
    """One distributed sort by (band, lon, doc_id) → band/lon-ordered
    files with two-dim lineage; idempotent like the 1D point index."""
    import ray.data

    from .points import _manifest_version, _wipe_derived

    out_dir = os.path.join(index_dir, "points", "_geo")
    lineage_path = os.path.join(out_dir, "_lineage.json")
    mv = _manifest_version(index_dir)
    if os.path.exists(lineage_path):
        with open(lineage_path) as f:
            lineage = json.load(f)
        if lineage.get("manifest_version") == mv:
            return lineage
        _wipe_derived(out_dir)            # stale after append/addIndexes
    os.makedirs(out_dir, exist_ok=True)

    ds = ray.data.read_parquet(os.path.join(index_dir, "docmeta"),
                               columns=["doc_id"])

    def add_coords(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        lat, lon = synth_coords(docs)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lat": pa.array(lat), "lon": pa.array(lon),
                         "band": pa.array(_band(lat, bands))})

    def write_part(batch: pa.Table) -> pa.Table:
        empty = {"file": pa.array([], pa.string()),
                 "band_min": pa.array([], pa.int64()),
                 "band_max": pa.array([], pa.int64()),
                 "lon_min": pa.array([], pa.int64()),
                 "lon_max": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()),
                 "n_row_groups": pa.array([], pa.int64())}
        if batch.num_rows == 0:
            return pa.table(empty)
        b = batch.column("band").to_numpy()
        lo = batch.column("lon").to_numpy()
        first_doc = int(batch.column("doc_id")[0].as_py())
        name = f"part_{int(b[0]):04d}_{int(lo[0]) + LON_MOD:012d}_" \
               f"{first_doc:012d}.parquet"
        path = os.path.join(out_dir, name)
        pq.write_table(batch, path + ".tmp", row_group_size=row_group_size)
        os.replace(path + ".tmp", path)
        n_rg = pq.ParquetFile(path).metadata.num_row_groups
        return pa.table({"file": pa.array([name], pa.string()),
                         "band_min": pa.array([int(b.min())], pa.int64()),
                         "band_max": pa.array([int(b.max())], pa.int64()),
                         "lon_min": pa.array([int(lo.min())], pa.int64()),
                         "lon_max": pa.array([int(lo.max())], pa.int64()),
                         "n": pa.array([batch.num_rows], pa.int64()),
                         "n_row_groups": pa.array([n_rg], pa.int64())})

    rows = (ds.map_batches(add_coords, batch_format="pyarrow")
            .sort(["band", "lon", "doc_id"])
            .map_batches(write_part, batch_format="pyarrow")
            .take_all())
    lineage = {"bands": bands, "row_group_size": row_group_size,
               "lat_mod": LAT_MOD, "lon_mod": LON_MOD,
               "manifest_version": mv,
               "files": sorted(rows, key=lambda r: r["file"])}
    atomic_write_json(lineage_path, lineage)
    return lineage


def _scan_box(index_dir: str, lat_lo: int, lat_hi: int,
              lon_lo: int, lon_hi: int
              ) -> tuple[pa.Table, dict]:
    """Shared BKD-intersect descent: rows inside [lat_lo,lat_hi) x
    [lon_lo,lon_hi) with pruning metrics."""
    out_dir = os.path.join(index_dir, "points", "_geo")
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    bands = lineage["bands"]
    blo = int(np.clip((lat_lo + LAT_MOD // 2) * bands // LAT_MOD,
                      0, bands - 1))
    bhi = int(np.clip((lat_hi - 1 + LAT_MOD // 2) * bands // LAT_MOD,
                      0, bands - 1))
    total_rg = int(sum(r["n_row_groups"] for r in lineage["files"]))
    read_rg = 0
    hits: list[pa.Table] = []
    for rec in lineage["files"]:
        if rec["band_max"] < blo or rec["band_min"] > bhi:
            continue                                   # lat-band pruned
        if rec["band_min"] == rec["band_max"] and \
                (rec["lon_max"] < lon_lo or rec["lon_min"] >= lon_hi):
            continue                                   # lon-range pruned
        pf = pq.ParquetFile(os.path.join(out_dir, rec["file"]))
        la = pf.schema_arrow.get_field_index("lat")
        lo_i = pf.schema_arrow.get_field_index("lon")
        groups = []
        for g in range(pf.metadata.num_row_groups):
            sl = pf.metadata.row_group(g).column(la).statistics
            sn = pf.metadata.row_group(g).column(lo_i).statistics
            if sl is not None and (sl.max < lat_lo or sl.min >= lat_hi):
                continue
            if sn is not None and (sn.max < lon_lo or sn.min >= lon_hi):
                continue
            groups.append(g)
        if not groups:
            continue
        read_rg += len(groups)
        t = pf.read_row_groups(groups, columns=["doc_id", "lat", "lon"])
        lat = t.column("lat").to_numpy()
        lon = t.column("lon").to_numpy()
        m = (lat >= lat_lo) & (lat < lat_hi) & \
            (lon >= lon_lo) & (lon < lon_hi)
        if m.any():
            hits.append(t.filter(pa.array(m)))
    table = (pa.concat_tables(hits) if hits else
             pa.table({"doc_id": pa.array([], pa.int64()),
                       "lat": pa.array([], pa.int64()),
                       "lon": pa.array([], pa.int64())}))
    metrics = {"row_groups_total": total_rg, "row_groups_read": read_rg,
               "files_total": len(lineage["files"])}
    return table, metrics


def geo_box(index_dir: str, lat_lo: int, lat_hi: int,
            lon_lo: int, lon_hi: int) -> tuple[np.ndarray, dict]:
    """LatLonPoint.newBoxQuery (document/LatLonPoint.java:193 role):
    sorted docIDs inside the half-open box."""
    t, metrics = _scan_box(index_dir, lat_lo, lat_hi, lon_lo, lon_hi)
    return np.sort(t.column("doc_id").to_numpy()).astype(np.int64), metrics


def geo_distance(index_dir: str, lat: int, lon: int, radius: int
                 ) -> tuple[np.ndarray, dict]:
    """XYPoint.newDistanceQuery semantics on the integer grid: bounding
    box descent + exact integer squared-Euclidean verify
    (dx*dx + dy*dy <= r*r) — the LatLonPoint distance query's
    box-prune-then-verify shape (search/IndexOrDocValuesQuery users;
    LatLonPoint.newDistanceQuery:231 uses haversine as the verify)."""
    t, metrics = _scan_box(index_dir, lat - radius, lat + radius + 1,
                           lon - radius, lon + radius + 1)
    la = t.column("lat").to_numpy().astype(np.int64)
    lo = t.column("lon").to_numpy().astype(np.int64)
    d = t.column("doc_id").to_numpy()
    dx = la - int(lat)
    dy = lo - int(lon)
    m = dx * dx + dy * dy <= int(radius) * int(radius)
    return np.sort(d[m]).astype(np.int64), metrics


def geo_polygon(index_dir: str, lats: "list[int]", lons: "list[int]"
                ) -> tuple[np.ndarray, dict]:
    """LatLonPoint.newPolygonQuery role (document/LatLonPoint.java:214,
    geo/Polygon2D.java:40): bounding-box BKD descent, then the exact
    per-hit containment verify. The reference handles arbitrary polygons
    through a Polygon2D edge tree; here the convex core with exact
    int64 half-plane tests (boundary inclusive, CCW vertex order) — the
    identical prune-then-verify shape with an integer-exact verify the
    SQL oracle can reproduce."""
    lats = [int(x) for x in lats]
    lons = [int(x) for x in lons]
    if len(lats) != len(lons) or len(lats) < 3:
        raise ValueError("polygon needs >= 3 (lat, lon) vertices")
    t, metrics = _scan_box(index_dir, min(lats), max(lats) + 1,
                           min(lons), max(lons) + 1)
    la = t.column("lat").to_numpy().astype(np.int64)
    lo = t.column("lon").to_numpy().astype(np.int64)
    d = t.column("doc_id").to_numpy()
    inside = np.ones(len(d), dtype=bool)
    n = len(lats)
    for i in range(n):
        y1, x1 = lats[i], lons[i]
        y2, x2 = lats[(i + 1) % n], lons[(i + 1) % n]
        # CCW edge: interior is the non-negative cross-product side
        inside &= (x2 - x1) * (la - y1) - (y2 - y1) * (lo - x1) >= 0
    return np.sort(d[inside]).astype(np.int64), metrics


def geo_nearest(index_dir: str, lat: int, lon: int, k: int
                ) -> tuple[np.ndarray, np.ndarray, dict]:
    """k nearest points by exact integer squared Euclidean — the
    LatLonPoint.nearest role (document/LatLonPoint.java:406,
    document/NearestNeighbor.java:40: best-first BKD traversal;
    LatLonDocValuesField.newDistanceSort:158 is the sort-all variant).

    Expressed as an expanding-radius box descent over the banded index:
    each iteration reads only row groups intersecting the current box,
    and a hit set with >= k points inside the CIRCLE of radius r is
    complete — any unread point lies outside the box, hence farther
    than r. Radius doubles until enough hits (or the whole space is
    covered), so near-dense centers touch only nearby bands — the
    best-first cell-visit order of the reference with the same
    prune-then-verify exactness.

    Returns (doc_ids, dist2, metrics) ordered (dist2 asc, doc_id asc).
    """
    lat, lon, k = int(lat), int(lon), int(k)
    if k <= 0:
        raise ValueError("k must be positive")
    r = LAT_MOD // N_BANDS          # one band's height
    max_r = LAT_MOD + LON_MOD       # box covers the whole grid
    iters = 0
    while True:
        iters += 1
        t, m = _scan_box(index_dir, lat - r, lat + r + 1,
                         lon - r, lon + r + 1)
        la = t.column("lat").to_numpy().astype(np.int64)
        lo = t.column("lon").to_numpy().astype(np.int64)
        d2 = (la - lat) ** 2 + (lo - lon) ** 2
        complete = r >= max_r
        within = np.ones(len(d2), dtype=bool) if complete \
            else d2 <= np.int64(r) * np.int64(r)
        if int(within.sum()) >= k or complete:
            docs = t.column("doc_id").to_numpy().astype(np.int64)
            sel_d, sel_d2 = docs[within], d2[within]
            order = np.lexsort((sel_d, sel_d2))[:k]
            m = dict(m)
            m["iterations"] = iters
            return sel_d[order], sel_d2[order], m
        r *= 2
