"""Indexed-shape (LatLonShape / ShapeField role) tests — exact
separating-axis geometry plus the end-to-end triangle index vs an
independent QUAD-level brute force (the engine works per fan triangle;
the brute force, like the SQL oracle, per whole quad — agreement
exercises the tessellation equivalence)."""

import numpy as np
import pyarrow as pa


def _diamond_tris(cy, cx, ry, rx):
    from lucene_ray.shapes import synth_quads, tessellate_quads

    q = np.array([[[cy - ry, cx], [cy, cx + rx],
                   [cy + ry, cx], [cy, cx - rx]]], dtype=np.int64)
    return tessellate_quads(np.array([0], dtype=np.int64), q)


def test_tri_box_flags_geometry():
    """Hand cases for the exact triangle-vs-closed-box SAT: a slab that
    crosses the diamond with NO vertex containment either way must
    intersect; a bbox-overlapping corner box must be separated by the
    diagonal edge; a box through the waist picks up exactly the
    triangles it touches; inclusive boundary counts as within."""
    from lucene_ray.shapes import _tri_box_flags

    t = _diamond_tris(0, 0, 100, 100)

    # slab y in [40, 60], x in [-300, 300]: no diamond vertex in the box,
    # no box corner in the diamond, yet they overlap (pure edge crossing)
    inter, within, _ = _tri_box_flags(t, 40, 60, -300, 300)
    assert inter.tolist() == [True, True]       # both fan tris cross it
    assert within.tolist() == [False, False]

    # corner box [80,100]x[80,100]: bboxes overlap but the v1->v2 edge
    # (y + x = 100) separates — MUST be excluded by the SAT edge test
    inter, _, _ = _tri_box_flags(t, 80, 100, 80, 100)
    assert inter.tolist() == [False, False]

    # touching exactly at the vertex (0, 100): closed box semantics —
    # only the first fan triangle (v0,v1,v2) carries that vertex; the
    # second one's bbox (x <= 0) never reaches the box
    inter, _, _ = _tri_box_flags(t, -50, 50, 100, 200)
    assert inter.tolist() == [True, False]

    # whole diamond within the closed bbox (vertices ON the boundary)
    inter, within, _ = _tri_box_flags(t, -100, 100, -100, 100)
    assert inter.tolist() == [True, True]
    assert within.tolist() == [True, True]

    # below the waist only: fan tris are (v0,v1,v2) and (v0,v2,v3) — both
    # contain the bottom vertex, so both intersect a bottom slab
    inter, _, _ = _tri_box_flags(t, -100, -90, -5, 5)
    assert inter.tolist() == [True, True]

    # CONTAINS corner bits: a tiny box straddling the vertical diagonal
    # near the center — the right corners (x=5) land in T1 (v0,v1,v2),
    # the left corners (x=-5) in T2 (v0,v2,v3); union covers all 4
    _, _, cb = _tri_box_flags(t, -5, 5, -5, 5)
    assert (int(cb[0]) | int(cb[1])) == 0b1111
    assert int(cb[0]) != 0b1111 and int(cb[1]) != 0b1111
    # box sticking out of the diamond: no triangle holds the far corners
    _, _, cb = _tri_box_flags(t, -5, 5, 90, 120)
    assert (int(cb[0]) | int(cb[1])) != 0b1111


def _quad_brute(quads, lat_lo, lat_hi, lon_lo, lon_hi):
    """Independent quad-level SAT (mirrors the SQL oracle, not the
    engine's triangle path): (intersects, within) per quad."""
    y = quads[:, :, 0]
    x = quads[:, :, 1]
    overlap = ((y.max(axis=1) >= lat_lo) & (y.min(axis=1) <= lat_hi)
               & (x.max(axis=1) >= lon_lo) & (x.min(axis=1) <= lon_hi))
    corners = ((lat_lo, lon_lo), (lat_lo, lon_hi),
               (lat_hi, lon_hi), (lat_hi, lon_lo))
    separated = np.zeros(len(quads), dtype=bool)
    for i in range(4):
        py, px = y[:, i], x[:, i]
        qy, qx = y[:, (i + 1) % 4], x[:, (i + 1) % 4]
        ey, ex = qy - py, qx - px
        out_all = np.ones(len(quads), dtype=bool)
        for gy, gx in corners:
            out_all &= ex * (gy - py) - ey * (gx - px) < 0
        separated |= out_all
    inter = overlap & ~separated
    within = ((y >= lat_lo) & (y <= lat_hi)
              & (x >= lon_lo) & (x <= lon_hi)).all(axis=1)
    contains = np.ones(len(quads), dtype=bool)
    for i in range(4):
        py, px = y[:, i], x[:, i]
        qy, qx = y[:, (i + 1) % 4], x[:, (i + 1) % 4]
        ey, ex = qy - py, qx - px
        for gy, gx in corners:
            contains &= ex * (gy - py) - ey * (gx - px) >= 0
    return inter, within, contains


def test_shape_index_matches_bruteforce(ray_session, tmp_path):
    """Triangle index == quad brute force for all three relations, on a
    thin global slab (forces many pure edge-crossing shapes) and a
    moderate box; selective boxes prune row groups."""
    import os

    import pyarrow.parquet as pq

    from lucene_ray.shapes import (build_shape_index, shape_box,
                                   synth_quads)

    idx = str(tmp_path / "sidx")
    os.makedirs(os.path.join(idx, "docmeta"))
    docs = np.arange(20_000, dtype=np.int64)
    pq.write_table(pa.table({"doc_id": pa.array(docs)}),
                   os.path.join(idx, "docmeta", "bucket=00000.parquet"))
    build_shape_index(idx, bands=16, row_group_size=512)
    quads = synth_quads(docs)

    boxes = [(0, 40_000, -180_000_000, 180_000_000),      # thin slab
             (-10_000_000, 25_000_000, 40_000_000, 90_000_000),
             (88_000_000, 90_000_000, -180_000_000, 180_000_000),
             # tiny box inside doc 0's quad (synth constants) — the
             # CONTAINS relation must find it via OR-ed corner bits
             (-89_602_000, -89_598_000, -56_145_211, -56_141_211)]
    for box in boxes:
        binter, bwithin, bcont = _quad_brute(quads, *box)
        gi, _ = shape_box(idx, *box, relation="intersects")
        np.testing.assert_array_equal(gi, docs[binter])
        gw, _ = shape_box(idx, *box, relation="within")
        np.testing.assert_array_equal(gw, docs[bwithin])
        gd, _ = shape_box(idx, *box, relation="disjoint")
        np.testing.assert_array_equal(gd, docs[~binter])
        gc, _ = shape_box(idx, *box, relation="contains")
        np.testing.assert_array_equal(gc, docs[bcont])

    # the 40k-µdeg slab is thinner than any quad (min height 60k), so
    # every hit is a pure crossing — the SAT edge branch is genuinely on
    # this path, and `within` is structurally empty
    slab_inter, slab_within, _ = _quad_brute(quads, *boxes[0])
    assert slab_inter.sum() > 20 and slab_within.sum() == 0
    # ... and the contains box really contains at least doc 0
    assert 0 in shape_box(idx, *boxes[3], relation="contains")[0]

    _, metrics = shape_box(idx, -10_000_000, 25_000_000,
                           40_000_000, 90_000_000, relation="intersects")
    assert metrics["row_groups_read"] < metrics["row_groups_total"]


def test_shape_distance_pruning_and_brute_force(ray_session):
    """Circle query: bbox descent reads a fraction of the row groups for
    a small radius, and the exact test agrees with an all-triangles
    brute force at several radii (boundary cases included)."""
    import numpy as np

    from lucene_ray.pipelines.fulltext import index_dir_for
    from lucene_ray.shapes import (_tri_circle_intersects,
                                   build_shape_index, shape_distance,
                                   synth_quads, tessellate_quads)

    sf = "/root/testdata/sf0.001"
    idx = index_dir_for(sf)
    build_shape_index(idx)
    cy, cx = 82798603, 78226626          # doc 123's center
    hits, metrics = shape_distance(idx, cy, cx, 600_000)
    assert metrics["row_groups_read"] < metrics["row_groups_total"]
    assert len(hits) >= 1

    docs = np.arange(500, dtype=np.int64)
    tris = tessellate_quads(docs, synth_quads(docs))
    rows = np.column_stack([tris.column(c).to_numpy()
                            for c in ("ay", "ax", "by", "bx", "cy", "cx")])
    owners = tris.column("doc_id").to_numpy()
    for r in (600_000, 5_000_000, 20_000_000):
        got, _ = shape_distance(idx, cy, cx, r)
        r2 = r * r
        brute = np.unique(owners[[
            _tri_circle_intersects([int(v) for v in row], cy, cx, r2)
            for row in rows]])
        assert np.array_equal(got, brute), r
