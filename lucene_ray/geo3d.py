"""3D geodesic points — the spatial3d module's role
(spatial3d/Geo3DPoint.java:44, geom/GeoStandardCircle.java,
geom/GeoConvexPolygon.java, geom/GeoStandardPath.java).

The reference indexes points as quantized (x, y, z) on the planet
surface in a 3D BKD tree; shapes are compositions of PLANES and
membership is plane-sidedness plus bounds — never lat/lon trig at query
time. This module reproduces that geometry Ray-Data-first over the
SPHERE planet model (geom/PlanetModel.java SPHERE; WGS84 only rescales
the axes before the same plane tests):

* Coordinates: the corpus has no real positions, so each doc gets a
  deterministic INTEGER vector p = (u, v, w) ∈ [−2^20, 2^20)^3 from
  multiplicative hashing of its docID (the direction IS the position on
  the sphere; the magnitude cancels in every angular predicate). Pure
  int64 arithmetic — reproducible exactly in the DuckDB oracle, no trig
  on either side.
* Membership predicates are EXACT INTEGER tests, the analogue of the
  reference's `isWithin` plane evaluations:
  - circle cap, angular radius r (GeoStandardCircle.java:60):
    dot(p,C) >= 0  AND  2^40·dot(p,C)^2 >= A·|p|^2·|C|^2 with
    A = round(cos^2(r)·2^40) — the one rational constant both the
    engine and the SQL oracle share (caps are < 90°);
  - bbox = z-band ∧ lon wedge (GeoBBoxFactory role): sin-lat bounds as
    signed squared compares on w, wedge as two meridian-plane
    sidedness dots (plane normals are integer constants);
  - convex polygon (GeoConvexPolygon.java:63): edge-plane normals are
    EXACT integer cross products of adjacent vertex vectors; membership
    = every dot(p, n_i) >= 0 (all magnitudes bounded < 2^63);
  - path (GeoStandardPath.java:66 PathSegment + SegmentEndpoint): a
    great-circle slab |angle to segment plane| <= width, clipped by the
    two endpoint planes, OR an endpoint cap — squared compares in
    >64-bit integers (python ints / DuckDB HUGEINT).
* Scale shape: the derived index is one distributed sort by
  (z_band, u, doc_id) into banded parquet parts with per-part lineage
  and row-group stats (the 3D-BKD pruning role); a query prunes parts
  by the shape's z-band interval (computed with float slack, exactness
  never depends on it), scans survivors as a Ray Dataset, and decides
  membership VECTORIZED in float64 with an ε-margin — only docs inside
  the margin fall through to the exact big-int test (O(margin) per
  batch, not O(n)).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.manifest import atomic_write_json

K = 1 << 21                    # coordinate grid: components in [-2^20, 2^20)
U_MULT = 2_654_435_761
V_MULT = 2_246_822_519
V_OFF = 123_456_789
W_MULT = 3_266_489_917
W_OFF = 987_654_321
B_SCALE = 1 << 40              # cos^2 rational denominator
N_BANDS = 32
ROW_GROUP_SIZE = 4096
_EPS = 1e-9                    # float prefilter margin (relative)


def synth_coords3d(doc_ids: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    d = np.asarray(doc_ids, dtype=np.int64)
    u = (d * U_MULT) % K - K // 2
    v = (d * V_MULT + V_OFF) % K - K // 2
    w = (d * W_MULT + W_OFF) % K - K // 2
    return u, v, w


def cos2_scaled(radians: float) -> int:
    """A = round(cos^2 r · 2^40) — the shared rational cap constant."""
    c = math.cos(radians)
    return int(round(c * c * B_SCALE))


def _zband(u: np.ndarray, v: np.ndarray, w: np.ndarray,
           bands: int = N_BANDS) -> np.ndarray:
    """Pruning band from sin(latitude) = w/|p| (float is fine: bands
    only PRUNE, queries widen their band interval by one)."""
    norm = np.sqrt(u * u + v * v + w * w).astype(np.float64)
    s = np.divide(w, norm, out=np.zeros_like(norm), where=norm > 0)
    b = ((s + 1.0) * 0.5 * bands).astype(np.int64)
    return np.clip(b, 0, bands - 1)


def build_geo3d_index(index_dir: str, bands: int = N_BANDS,
                      row_group_size: int = ROW_GROUP_SIZE) -> dict:
    """One distributed sort by (zband, u, doc_id) → banded parquet parts
    with lineage; idempotent, manifest-version invalidated (same
    contract as the 2D geo index)."""
    import ray.data

    from .points import _manifest_version, _wipe_derived

    out_dir = os.path.join(index_dir, "points", "_geo3d")
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

    def add_coords(batch: pa.Table) -> pa.Table:
        docs = batch.column("doc_id").to_numpy()
        u, v, w = synth_coords3d(docs)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "u": pa.array(u), "v": pa.array(v),
                         "w": pa.array(w),
                         "zband": pa.array(_zband(u, v, w, bands))})

    def write_part(batch: pa.Table) -> pa.Table:
        empty = {"file": pa.array([], pa.string()),
                 "zband_min": pa.array([], pa.int64()),
                 "zband_max": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
        if batch.num_rows == 0:
            return pa.table(empty)
        zb = batch.column("zband").to_numpy()
        first_doc = int(batch.column("doc_id")[0].as_py())
        name = (f"part_{int(zb[0]):04d}_"
                f"{int(batch.column('u')[0].as_py()) + K:09d}_"
                f"{first_doc:012d}.parquet")
        path = os.path.join(out_dir, name)
        pq.write_table(batch, path + ".tmp", row_group_size=row_group_size)
        os.replace(path + ".tmp", path)
        return pa.table({"file": pa.array([name], pa.string()),
                         "zband_min": pa.array([int(zb.min())], pa.int64()),
                         "zband_max": pa.array([int(zb.max())], pa.int64()),
                         "n": pa.array([batch.num_rows], pa.int64())})

    rows = (ds.map_batches(add_coords, batch_format="pyarrow")
            .sort(["zband", "u", "doc_id"])
            .map_batches(write_part, batch_format="pyarrow")
            .take_all())
    lineage = {"bands": bands, "k": K, "manifest_version": mv,
               "files": sorted(rows, key=lambda r: r["file"])}
    atomic_write_json(lineage_path, lineage)
    return lineage


def _scan(index_dir: str, zlo_f: float, zhi_f: float, verify_fn
          ) -> np.ndarray:
    """Prune parts to the shape's sin-lat interval (float bounds widened
    by one band), scan survivors as a Dataset, decide per batch with
    ``verify_fn(u, v, w) -> bool mask``. Returns sorted doc_ids."""
    import ray.data

    out_dir = os.path.join(index_dir, "points", "_geo3d")
    with open(os.path.join(out_dir, "_lineage.json")) as f:
        lineage = json.load(f)
    bands = lineage["bands"]
    blo = max(0, int((max(zlo_f, -1.0) + 1.0) * 0.5 * bands) - 1)
    bhi = min(bands - 1, int((min(zhi_f, 1.0) + 1.0) * 0.5 * bands) + 1)
    files = [os.path.join(out_dir, r["file"]) for r in lineage["files"]
             if r["zband_max"] >= blo and r["zband_min"] <= bhi]
    if not files:
        return np.empty(0, np.int64)

    def check(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy()
        v = batch.column("v").to_numpy()
        w = batch.column("w").to_numpy()
        mask = verify_fn(u, v, w)
        return pa.table(
            {"doc_id": batch.column("doc_id").filter(pa.array(mask))})

    ds = (ray.data.read_parquet(files, columns=["doc_id", "u", "v", "w"])
          .map_batches(check, batch_format="pyarrow"))
    out = [r["doc_id"] for r in ds.take_all()]   # bounded: hits only
    return np.sort(np.asarray(out, dtype=np.int64))


def _cap_mask(u, v, w, cx: int, cy: int, cz: int, a_scaled: int
              ) -> np.ndarray:
    """Vectorized float cap test with ε-margin; margin rows re-decided
    with exact python-int arithmetic (the HUGEINT compare)."""
    nc2 = cx * cx + cy * cy + cz * cz
    dot = u * cx + v * cy + w * cz                      # int64-exact
    np2 = u * u + v * v + w * w                         # int64-exact
    lhs = float(B_SCALE) * dot.astype(np.float64) ** 2
    rhs = float(a_scaled) * np2.astype(np.float64) * float(nc2)
    scale = np.maximum(np.maximum(lhs, rhs), 1.0)
    inside = (dot >= 0) & (lhs >= rhs + _EPS * scale)
    margin = np.flatnonzero((dot >= 0)
                            & (np.abs(lhs - rhs) <= _EPS * scale))
    for i in margin:
        d_i, n_i = int(dot[i]), int(np2[i])
        inside[i] = B_SCALE * d_i * d_i >= a_scaled * n_i * nc2
    return inside


def geo3d_distance(index_dir: str, cx: int, cy: int, cz: int,
                   radians: float) -> np.ndarray:
    """Geo3DPoint.newDistanceQuery role (GeoStandardCircle cap around
    integer direction C, angular radius < π/2)."""
    a = cos2_scaled(radians)
    nc = math.sqrt(cx * cx + cy * cy + cz * cz)
    s_lat = cz / nc
    half = math.sin(min(radians, math.pi / 2))
    zlo = s_lat * math.cos(radians) - half  # conservative cap z-extent
    zhi = s_lat * math.cos(radians) + half
    return _scan(index_dir, zlo, zhi,
                 lambda u, v, w: _cap_mask(u, v, w, cx, cy, cz, a))


def _sin_ge(wi: int, np2_i: int, s_num: int, s_den: int) -> bool:
    """Exact w/|p| >= s_num/s_den via sign-aware squaring (python ints)."""
    lhs2 = wi * wi * s_den * s_den
    rhs2 = s_num * s_num * np2_i
    if s_num <= 0:
        return wi >= 0 or lhs2 <= rhs2
    return wi >= 0 and lhs2 >= rhs2


def _sin_ge_vec(w: np.ndarray, np2: np.ndarray, s_num: int, s_den: int
                ) -> np.ndarray:
    """Vectorized float version of :func:`_sin_ge` with exact fallback
    inside the ε-margin."""
    lhs = w.astype(np.float64) ** 2 * float(s_den * s_den)
    rhs = float(s_num * s_num) * np2.astype(np.float64)
    if s_num <= 0:
        out = (w >= 0) | (lhs <= rhs)
    else:
        out = (w >= 0) & (lhs >= rhs)
    scale = np.maximum(np.maximum(lhs, rhs), 1.0)
    for i in np.flatnonzero(np.abs(lhs - rhs) <= _EPS * scale):
        out[i] = _sin_ge(int(w[i]), int(np2[i]), s_num, s_den)
    return out


def geo3d_bbox(index_dir: str, s1_num: int, s2_num: int, s_den: int,
               m1: tuple, m2: tuple) -> np.ndarray:
    """GeoBBox role: sin-lat band s1_num/s_den <= w/|p| < s2_num/s_den
    (signed squared compares, exact) ∧ longitude wedge between meridian
    planes with integer normals m1, m2 (sidedness: dot(p,m1) >= 0 AND
    dot(p,m2) <= 0; wedge < π; meridian dots are int64-exact)."""
    def verify(u, v, w):
        np2 = u * u + v * v + w * w
        band = _sin_ge_vec(w, np2, s1_num, s_den) \
            & ~_sin_ge_vec(w, np2, s2_num, s_den)
        d1 = u * m1[0] + v * m1[1] + w * m1[2]
        d2 = u * m2[0] + v * m2[1] + w * m2[2]
        return band & (d1 >= 0) & (d2 <= 0)
    # prune interval straight from the rational sin bounds
    return _scan(index_dir, s1_num / s_den, s2_num / s_den, verify)


def _dot_ge0(u, v, w, c: tuple) -> np.ndarray:
    """Exact sign of an integer dot product whose true magnitude may
    exceed 2^63: float64 evaluation with an error-bound margin, exact
    python-int re-decision only inside the margin."""
    f = (u.astype(np.float64) * float(c[0])
         + v.astype(np.float64) * float(c[1])
         + w.astype(np.float64) * float(c[2]))
    bound = (np.abs(u).astype(np.float64) * float(abs(c[0]))
             + np.abs(v).astype(np.float64) * float(abs(c[1]))
             + np.abs(w).astype(np.float64) * float(abs(c[2])))
    out = f >= 0
    for i in np.flatnonzero(np.abs(f) <= 1e-12 * np.maximum(bound, 1.0)):
        out[i] = (int(u[i]) * c[0] + int(v[i]) * c[1]
                  + int(w[i]) * c[2]) >= 0
    return out


def _circle_zmax(n: tuple) -> float:
    """Max |sin latitude| reached by the great circle with normal n."""
    nn = float(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
    return math.sqrt((n[0] * n[0] + n[1] * n[1]) / nn) if nn else 1.0


def geo3d_polygon(index_dir: str, vertices: list) -> np.ndarray:
    """GeoConvexPolygon role (geom/GeoConvexPolygon.java:63): CCW
    integer vertex vectors; edge planes are EXACT integer cross
    products; membership = dot(p, n_i) >= 0 for every edge (all values
    < 2^63, pure vectorized int64)."""
    normals = []
    nvert = len(vertices)
    for i in range(nvert):
        ax, ay, az = vertices[i]
        bx, by, bz = vertices[(i + 1) % nvert]
        normals.append((ay * bz - az * by, az * bx - ax * bz,
                        ax * by - ay * bx))

    def verify(u, v, w):
        mask = np.ones(len(u), dtype=bool)
        for nx, ny, nz in normals:
            mask &= (u * nx + v * ny + w * nz) >= 0
        return mask
    # conservative z-prune: the region's sin-lat extent is bounded by
    # its boundary arcs' full-circle extrema — unless it contains a
    # pole (pole inside <=> every edge dot at (0,0,+-1) is >= 0)
    arc = max(_circle_zmax(n) for n in normals)
    zhi = 1.0 if all(n[2] >= 0 for n in normals) else arc
    zlo = -1.0 if all(n[2] <= 0 for n in normals) else -arc
    return _scan(index_dir, zlo, zhi, verify)


def path_planes(va: tuple, vb: tuple) -> tuple:
    """Shared plane constants for a path segment: the segment plane
    normal n = cross(va, vb) REDUCED to ~2^20 scale (floor-shift both
    components — the identical literals feed the engine and the SQL
    oracle, so the slab stays exact against ITSELF; the reduction only
    tilts the plane by ~2^-20 rad, i.e. defines which exact great
    circle the path uses), and the two endpoint clip-plane normals
    cross(n, va) / cross(vb, n). Keeps every squared compare inside
    DuckDB's INT128."""
    ax, ay, az = va
    bx, by, bz = vb
    n0 = (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)
    shift = max(0, max(abs(x) for x in n0).bit_length() - 21)
    n = tuple(x >> shift for x in n0)
    c_a = (n[1] * az - n[2] * ay, n[2] * ax - n[0] * az,
           n[0] * ay - n[1] * ax)
    c_b = (by * n[2] - bz * n[1], bz * n[0] - bx * n[2],
           bx * n[1] - by * n[0])
    return n, c_a, c_b


def geo3d_path(index_dir: str, va: tuple, vb: tuple, width: float
               ) -> np.ndarray:
    """GeoStandardPath role (geom/GeoStandardPath.java:66): within
    angular ``width`` of the great-circle segment va->vb. Segment slab
    = |sin(angle to segment plane)| <= sin(width) clipped by the two
    endpoint planes, OR an endpoint cap at either end (PathSegment +
    SegmentEndpoint decomposition). The slab compare is the squared
    rational test (python-int / DuckDB HUGEINT exact, float-first with
    eps-margin fallback); clip-plane sidedness via :func:`_dot_ge0`."""
    ax, ay, az = va
    bx, by, bz = vb
    # clip planes: cross(n, va) faces the segment interior from va;
    # cross(vb, n) faces it from vb (cross of ~2^21 with ~2^20 gives
    # ~2^42 components; dots with p can pass 2^63, hence _dot_ge0)
    n, c_a, c_b = path_planes(va, vb)
    s2_num = int(round(math.sin(width) ** 2 * B_SCALE))  # shared rational
    nn2 = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    a_cap = cos2_scaled(width)

    def verify(u, v, w):
        np2 = u * u + v * v + w * w
        dnf = (u.astype(np.float64) * float(n[0])
               + v.astype(np.float64) * float(n[1])
               + w.astype(np.float64) * float(n[2]))
        lhs = float(B_SCALE) * dnf * dnf
        rhs = float(s2_num) * np2.astype(np.float64) * float(nn2)
        scale = np.maximum(np.maximum(lhs, rhs), 1.0)
        slab = lhs <= rhs - _EPS * scale
        for i in np.flatnonzero(np.abs(lhs - rhs) <= _EPS * scale):
            d_i = int(u[i]) * n[0] + int(v[i]) * n[1] + int(w[i]) * n[2]
            slab[i] = B_SCALE * d_i * d_i <= s2_num * int(np2[i]) * nn2
        seg = slab & _dot_ge0(u, v, w, c_a) & _dot_ge0(u, v, w, c_b)
        capa = _cap_mask(u, v, w, ax, ay, az, a_cap)
        capb = _cap_mask(u, v, w, bx, by, bz, a_cap)
        return seg | capa | capb

    zmax = min(1.0, _circle_zmax(n) + math.sin(min(width, math.pi / 2)))
    return _scan(index_dir, -zmax, zmax, verify)
