"""Geo3D (spatial3d role) tests: exact-boundary cap decisions, and each
query shape against an independent all-docs python-int oracle (proves
the z-band pruning never loses a hit and the float margin machinery
always falls back correctly)."""

import math
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_ray.geo3d import (B_SCALE, _cap_mask, build_geo3d_index,
                              cos2_scaled, geo3d_bbox, geo3d_distance,
                              geo3d_path, geo3d_polygon, path_planes,
                              synth_coords3d)


def test_cap_boundary_exact():
    """A point EXACTLY on the cap boundary (planted rational equality)
    must be decided by the exact big-int path, inclusively."""
    u = np.array([1, 1, 5], dtype=np.int64)
    v = np.array([1, -1, 0], dtype=np.int64)
    w = np.array([0, 0, 0], dtype=np.int64)
    # C=(1,0,0), A=B/2: B*dot^2 >= A*np2*nc2  <=>  2*dot^2 >= np2
    a = B_SCALE // 2
    m = _cap_mask(u, v, w, 1, 0, 0, a)
    assert m.tolist() == [True, True, True]
    # flip strictly outside: dot=1, np2=3 -> 2 < 3
    m2 = _cap_mask(np.array([1]), np.array([1]), np.array([1]), 1, 0, 0, a)
    assert m2.tolist() == [False]


@pytest.fixture(scope="module")
def g3d_index(tmp_path_factory, ray_session):
    from lucene_ray.build import build_index
    from lucene_ray.corpus import generate_corpus

    base = tmp_path_factory.mktemp("g3d")
    c = str(base / "c")
    os.makedirs(c)
    pq.write_table(generate_corpus(400, seed=13), f"{c}/a.parquet")
    idx = str(base / "i")
    build_index(c, idx, num_buckets=2, term_parts=4, salt_group=1)
    build_geo3d_index(idx, bands=8)
    docs = pq.read_table(os.path.join(idx, "docmeta"),
                         columns=["doc_id"]).column("doc_id").to_numpy()
    return idx, np.sort(docs)


def _brute(docs, pred):
    u, v, w = synth_coords3d(docs)
    return np.array([d for d, ui, vi, wi in
                     zip(docs, u.tolist(), v.tolist(), w.tolist())
                     if pred(ui, vi, wi)], dtype=np.int64)


def test_geo3d_distance_vs_bruteforce(g3d_index):
    idx, docs = g3d_index
    cx, cy, cz, r = 800_000, 300_000, 500_000, 0.7
    a = cos2_scaled(r)
    nc2 = cx * cx + cy * cy + cz * cz

    def pred(ui, vi, wi):
        dot = ui * cx + vi * cy + wi * cz
        np2 = ui * ui + vi * vi + wi * wi
        return dot >= 0 and B_SCALE * dot * dot >= a * np2 * nc2
    got = geo3d_distance(idx, cx, cy, cz, r)
    want = _brute(docs, pred)
    assert np.array_equal(got, want) and len(want) > 0


def test_geo3d_bbox_vs_bruteforce(g3d_index):
    idx, docs = g3d_index
    s1, s2, den = -400, 500, 1000
    m1, m2 = (0, 1, 0), (-1, 0, 0)

    def sin_ge(wi, np2, s):
        lhs, rhs = wi * wi * den * den, s * s * np2
        return (wi >= 0 or lhs <= rhs) if s <= 0 else \
            (wi >= 0 and lhs >= rhs)

    def pred(ui, vi, wi):
        np2 = ui * ui + vi * vi + wi * wi
        return (sin_ge(wi, np2, s1) and not sin_ge(wi, np2, s2)
                and ui * m1[0] + vi * m1[1] + wi * m1[2] >= 0
                and ui * m2[0] + vi * m2[1] + wi * m2[2] <= 0)
    got = geo3d_bbox(idx, s1, s2, den, m1, m2)
    want = _brute(docs, pred)
    assert np.array_equal(got, want) and len(want) > 0


def test_geo3d_polygon_vs_bruteforce(g3d_index):
    idx, docs = g3d_index
    vs = [(1_000_000, 0, 300_000), (0, 1_000_000, 300_000),
          (-300_000, -300_000, 1_000_000)]
    normals = []
    for i in range(len(vs)):
        (ax, ay, az), (bx, by, bz) = vs[i], vs[(i + 1) % len(vs)]
        normals.append((ay * bz - az * by, az * bx - ax * bz,
                        ax * by - ay * bx))

    def pred(ui, vi, wi):
        return all(ui * nx + vi * ny + wi * nz >= 0
                   for nx, ny, nz in normals)
    got = geo3d_polygon(idx, vs)
    want = _brute(docs, pred)
    assert np.array_equal(got, want) and len(want) > 0


def test_geo3d_path_vs_bruteforce(g3d_index):
    idx, docs = g3d_index
    va, vb, width = (1_000_000, 100_000, 0), (0, 1_000_000, 200_000), 0.3
    n, c_a, c_b = path_planes(va, vb)
    s2_num = int(round(math.sin(width) ** 2 * B_SCALE))
    nn2 = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    a_cap = cos2_scaled(width)

    def cap(ui, vi, wi, c):
        dot = ui * c[0] + vi * c[1] + wi * c[2]
        np2 = ui * ui + vi * vi + wi * wi
        nc2 = c[0] ** 2 + c[1] ** 2 + c[2] ** 2
        return dot >= 0 and B_SCALE * dot * dot >= a_cap * np2 * nc2

    def pred(ui, vi, wi):
        np2 = ui * ui + vi * vi + wi * wi
        dn = ui * n[0] + vi * n[1] + wi * n[2]
        slab = B_SCALE * dn * dn <= s2_num * np2 * nn2
        da = ui * c_a[0] + vi * c_a[1] + wi * c_a[2]
        db = ui * c_b[0] + vi * c_b[1] + wi * c_b[2]
        return (slab and da >= 0 and db >= 0) or cap(ui, vi, wi, va) \
            or cap(ui, vi, wi, vb)
    got = geo3d_path(idx, va, vb, width)
    want = _brute(docs, pred)
    assert np.array_equal(got, want) and len(want) > 0


def test_geo3d_index_idempotent_and_pruned(g3d_index):
    """Rebuild is a no-op at the same manifest version; a polar cap scan
    reads only a subset of parts (the BKD-prune role)."""
    import json
    idx, _docs = g3d_index
    lin1 = build_geo3d_index(idx, bands=8)
    with open(os.path.join(idx, "points", "_geo3d", "_lineage.json")) as f:
        lin2 = json.load(f)
    assert lin1 == lin2
    # polar cap: z-band prune must exclude low bands entirely
    from lucene_ray import geo3d as g
    seen = []
    orig = g._scan

    def spy(index_dir, zlo, zhi, fn):
        bands = lin1["bands"]
        blo = max(0, int((max(zlo, -1.0) + 1.0) * 0.5 * bands) - 1)
        seen.append(blo)
        return orig(index_dir, zlo, zhi, fn)
    g._scan = spy
    try:
        g.geo3d_distance(idx, 0, 0, 1_000_000, 0.3)
    finally:
        g._scan = orig
    assert seen and seen[0] > 0          # low bands pruned
