"""Constructive + overlay kernel tests (pure numpy)."""

import numpy as np
import pytest

from mundipy_spark.kernels import constructive, measure, overlay, predicates, wkb

SQ = lambda x0, y0, s: np.array(
    [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], dtype=float
)


def test_centroid_square():
    g = ("Polygon", [SQ(0, 0, 10)])
    c = constructive.centroid(g)
    assert np.allclose(c[1], [5, 5])


def test_centroid_with_hole():
    g = ("Polygon", [SQ(0, 0, 10), SQ(0, 0, 5)[::-1]])  # hole in SW corner
    c = constructive.centroid(g)
    assert c[1][0] > 5 and c[1][1] > 5  # pulled away from the hole


def test_convex_hull():
    pts = ("MultiPoint", np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]], dtype=float))
    h = constructive.convex_hull(pts)
    assert h[0] == "Polygon"
    assert measure.geom_area_planar(h) == pytest.approx(16.0)


def test_simplify_collinear():
    line = ("LineString", np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], dtype=float))
    s = constructive.simplify(line, 0.01)
    assert len(s[1]) == 2
    s2 = constructive.simplify(line, 0.0001)
    assert len(s2[1]) == 5


def test_buffer_point_is_circle():
    g = ("Point", np.array([2.0, 3.0]))
    b = constructive.buffer_planar(g, 1.0)
    assert b[0] == "Polygon"
    a = measure.geom_area_planar(b)
    assert a == pytest.approx(np.pi, rel=0.01)  # 32-gon ~ pi
    # all ring points at distance 1
    d = np.hypot(b[1][0][:, 0] - 2.0, b[1][0][:, 1] - 3.0)
    assert np.allclose(d, 1.0)


def test_buffer_polygon_grows_area():
    g = ("Polygon", [SQ(0, 0, 10)])
    b = constructive.buffer_planar(g, 1.0)
    a = measure.geom_area_planar(b)
    # exact: 100 + 4*10*1 + pi*1^2
    assert a == pytest.approx(100 + 40 + np.pi, rel=0.01)
    # contains the original corners' neighborhoods
    assert predicates.points_in_geom([-0.5, 10.5], [5.0, 5.0], b).all()


def test_buffer_line_capsules():
    g = ("LineString", np.array([[0, 0], [10, 0]], dtype=float))
    b = constructive.buffer_planar(g, 1.0)
    assert predicates.points_in_geom([5.0, 0.0, -0.9], [0.9, -0.9, 0.0], b).all()
    assert not predicates.points_in_geom([5.0], [1.5], b).any()


def test_buffer_m_meters():
    g = ("Point", np.array([-118.24, 34.05]))
    b = constructive.buffer_m(g, 1000.0)
    a = measure.geom_area_m2(b)
    assert a == pytest.approx(np.pi * 1e6, rel=0.02)


def test_make_valid_orientation_and_closure():
    open_ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)[::-1]  # CW, open
    g = constructive.make_valid(("Polygon", [open_ring]))
    r = g[1][0]
    assert np.allclose(r[0], r[-1])
    assert measure.ring_area_planar(r) > 0  # exterior CCW


def test_is_valid():
    assert constructive.is_valid(("Polygon", [SQ(0, 0, 10)]))
    bow = ("Polygon", [np.array([[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]], dtype=float)])
    assert not constructive.is_valid(bow)


# --- overlay ----------------------------------------------------------------


def test_sh_clip_square_overlap():
    out = overlay.sutherland_hodgman(SQ(0, 0, 10), SQ(5, 5, 10))
    a = abs(measure.ring_area_planar(np.vstack([out, out[:1]])))
    assert a == pytest.approx(25.0)


def test_intersection_area_concave_exact():
    # L-shaped (concave) polygon vs square — exact expected value
    L = (
        "Polygon",
        [np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]], dtype=float)],
    )
    sq = ("Polygon", [SQ(2, 2, 6)])  # [2,8]x[2,8]
    # overlap: ([2,8]x[2,4]) + ([2,4]x[4,8]) = 12 + 8
    a = overlay.intersection_area_planar(L, sq)
    assert a == pytest.approx(20.0, abs=1e-9)
    assert overlay.union_area_planar(L, sq) == pytest.approx(
        measure.geom_area_planar(L) + 36 - 20
    )
    assert overlay.difference_area_planar(L, sq) == pytest.approx(
        measure.geom_area_planar(L) - 20
    )


def test_intersection_area_with_hole():
    donut = ("Polygon", [SQ(0, 0, 10), SQ(4, 4, 2)[::-1]])
    sq = ("Polygon", [SQ(3, 3, 4)])  # [3,7]^2, contains the whole hole
    a = overlay.intersection_area_planar(donut, sq)
    assert a == pytest.approx(16.0 - 4.0, abs=1e-9)


def test_intersection_area_disjoint_and_contained():
    a = ("Polygon", [SQ(0, 0, 2)])
    b = ("Polygon", [SQ(5, 5, 2)])
    assert overlay.intersection_area_planar(a, b) == 0.0
    inner = ("Polygon", [SQ(0.5, 0.5, 1)])
    assert overlay.intersection_area_planar(a, inner) == pytest.approx(1.0)


def test_clip_convex_polygon_geometry():
    g = ("Polygon", [SQ(0, 0, 10)])
    c = overlay.clip_convex(g, SQ(5, 5, 10)[:-1])
    assert c[0] == "Polygon"
    assert measure.geom_area_planar(c) == pytest.approx(25.0)


def test_clip_line_convex():
    line = ("LineString", np.array([[-5, 5], [15, 5]], dtype=float))
    c = overlay.clip_convex(line, SQ(0, 0, 10)[:-1])
    assert c[0] == "LineString"
    assert measure.geom_length_planar(c) == pytest.approx(10.0)


def test_clip_points():
    pts = ("MultiPoint", np.array([[1, 1], [11, 11], [5, 5]], dtype=float))
    c = overlay.clip_convex(pts, SQ(0, 0, 10)[:-1])
    assert c[0] == "MultiPoint" and len(c[1]) == 2


def test_intersection_geometry_convex_path():
    a = ("Polygon", [SQ(0, 0, 10)])
    tri = ("Polygon", [np.array([[5, 5], [13, 5], [5, 13], [5, 5]], dtype=float)])
    g = overlay.intersection(a, tri)
    # [5,10]^2 cut by x+y<=18: 25 - 0.5*2^2 = 23
    assert measure.geom_area_planar(g) == pytest.approx(23.0)
    assert overlay.intersection_area_planar(a, tri) == pytest.approx(23.0)


def test_clip_to_rect_matches_tile_use():
    tri = ("Polygon", [np.array([[0, 0], [10, 0], [0, 10], [0, 0]], dtype=float)])
    c = overlay.clip_to_rect(tri, 0, 0, 5, 5)
    assert measure.geom_area_planar(c) == pytest.approx(25.0 - 0.0, abs=1e-9) or True
    # exact: the rect [0,5]^2 cut by x+y<=10 keeps the whole 25 sq area
    assert measure.geom_area_planar(c) == pytest.approx(25.0)


# ---------------------------------------------------------------------------
# Greiner–Hormann overlay geometry ops + remaining dispatch-table surface
# ---------------------------------------------------------------------------

import numpy as np
from pyspark.sql import functions as F

from mundipy_spark.kernels import constructive, measure, overlay, predicates, wkb


SQ4 = ("Polygon", [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)])
TRI4 = ("Polygon", [np.array([[2, 2], [6, 2], [6, 6], [2, 2]], float)])
LSH = ("Polygon", [np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float)])
S24 = ("Polygon", [np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5], [0.5, 0.5]], float)])


def test_overlay_ops_golden_areas():
    cases = [
        (SQ4, TRI4, {"intersection": 2.0, "union": 22.0,
                     "difference": 14.0, "symmetric_difference": 20.0}),
        (LSH, S24, {"intersection": 1.75, "union": 7.25,
                    "difference": 3.25, "symmetric_difference": 5.5}),
    ]
    for a, b, wants in cases:
        for op, want in wants.items():
            g = overlay.overlay_op(a, b, op)
            assert abs(measure.geom_area_planar(g) - want) < 1e-6, (op, want)


def test_overlay_difference_makes_hole():
    big = ("Polygon", [np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)])
    small = ("Polygon", [np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)])
    d = overlay.difference(big, small)
    assert d[0] == "Polygon" and len(d[1]) == 2  # outer + hole
    assert abs(measure.geom_area_planar(d) - 96.0) < 1e-9
    assert not predicates.points_in_geom(np.array([5.0]), np.array([5.0]), d)[0]
    assert predicates.points_in_geom(np.array([1.0]), np.array([1.0]), d)[0]


def test_overlay_random_crosscheck_area_kernel():
    rng = np.random.default_rng(7)
    for _ in range(40):
        def star():
            n = int(rng.integers(4, 10))
            ang = 2 * np.pi * (np.arange(n) + rng.uniform(0.1, 0.9, n)) / n
            rad = rng.uniform(0.5, 2.5, n)
            c = rng.uniform(-2, 2, 2)
            pts = np.c_[c[0] + rad * np.cos(ang), c[1] + rad * np.sin(ang)]
            return ("Polygon", [np.vstack([pts, pts[:1]])])

        a, b = star(), star()
        ia = overlay.intersection_area_planar(a, b)
        g = overlay.overlay_op(a, b, "intersection")
        ga = measure.geom_area_planar(g) if g else 0.0
        assert abs(ia - ga) < 1e-6 * max(1.0, ia), (ia, ga)


def test_new_constructive_kernels():
    line = ("LineString", np.array([[0, 0], [10, 0]], float))
    assert np.allclose(constructive.interpolate(line, 3.0)[1], [3, 0])
    assert np.allclose(constructive.interpolate(line, -2.0)[1], [8, 0])
    assert constructive.line_project(line, (3, 5)) == 3.0
    b = constructive.boundary(SQ4)
    assert b[0] == "LineString"
    rp = constructive.representative_point(SQ4)
    assert predicates.points_in_geom(np.array([rp[1][0]]), np.array([rp[1][1]]), SQ4)[0]
    # concave: centroid of a C-shape can fall outside; rp must not
    cshape = ("Polygon", [np.array(
        [[0, 0], [5, 0], [5, 1], [1, 1], [1, 4], [5, 4], [5, 5], [0, 5], [0, 0]], float)])
    rp2 = constructive.representative_point(cshape)
    assert predicates.points_in_geom(np.array([rp2[1][0]]), np.array([rp2[1][1]]), cshape)[0]
    mrr = constructive.minimum_rotated_rectangle(
        ("Polygon", [np.array([[0, 0], [2, 2], [1, 3], [-1, 1], [0, 0]], float)])
    )
    assert abs(measure.geom_area_planar(mrr) - 4.0) < 1e-9  # tilted unit-ish rect
    assert constructive.minimum_clearance(SQ4) == 4.0


def test_unary_and_equality_predicates():
    bow = ("LineString", np.array([[0, 0], [2, 2], [2, 0], [0, 2]], float))
    assert predicates.is_simple(SQ4)
    assert not predicates.is_simple(bow)
    rotated = ("Polygon", [np.array([[4, 4], [0, 4], [0, 0], [4, 0], [4, 4]], float)])
    assert predicates.equals(SQ4, rotated)
    assert not predicates.equals_exact(SQ4, rotated)
    assert predicates.equals_exact(SQ4, SQ4)
    ring = ("LineString", np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float))
    assert predicates.is_closed(ring) and predicates.is_ring(ring)


def test_st_overlay_and_dissolve(spark):
    from mundipy_spark.functions import st
    from mundipy_spark.operators.dissolve import dissolve
    import pandas as pd

    rows = pd.DataFrame(
        {
            "grp": ["a", "a", "b"],
            "geometry": [
                wkb.dumps(("Polygon", [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float)])),
                wkb.dumps(("Polygon", [np.array([[1, 0], [3, 0], [3, 2], [1, 2], [1, 0]], float)])),
                wkb.dumps(("Polygon", [np.array([[9, 9], [10, 9], [10, 10], [9, 10], [9, 9]], float)])),
            ],
        }
    )
    df = spark.createDataFrame(rows)
    out = {r.grp: wkb.loads(bytes(r.geometry)) for r in dissolve(df, "grp").collect()}
    assert abs(measure.geom_area_planar(out["a"]) - 6.0) < 1e-6  # 4+4-2 overlap
    assert abs(measure.geom_area_planar(out["b"]) - 1.0) < 1e-6

    two = df.limit(2).agg(
        F.min("geometry").alias("a"), F.max("geometry").alias("b")
    )
    inter = two.select(st.st_intersection(F.col("a"), F.col("b")).alias("g")).collect()[0].g
    assert abs(measure.geom_area_planar(wkb.loads(bytes(inter))) - 2.0) < 1e-6


# --- even-odd overlay (holed inputs) ---------------------------------------


def _rect_ring(x0, y0, x1, y1):
    import numpy as np

    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def test_overlay_holed_inputs_exact_areas():
    """overlay_op on inputs WITH interior rings must honor the holes
    (r01 silently discarded them). Areas cross-checked against the
    exact fan-triangle oracle, which is hole-aware by construction."""
    import numpy as np

    from mundipy_spark.kernels import measure, overlay

    A = ("Polygon", [_rect_ring(0, 0, 10, 10), _rect_ring(3, 3, 7, 7)[::-1]])
    cases = [
        ("Polygon", [_rect_ring(5, -1, 15, 11)]),           # crosses hole
        ("Polygon", [_rect_ring(1, 1, 2, 2)]),              # inside solid part
        ("Polygon", [_rect_ring(4, 4, 6, 6)]),              # inside the hole
        ("Polygon", [_rect_ring(2, 2, 8, 8), _rect_ring(4, 4, 6, 6)[::-1]]),  # both holed
    ]
    for B in cases:
        ia = overlay.intersection_area_planar(A, B)
        aa = measure.geom_area_planar(A)
        ab = measure.geom_area_planar(B)
        for op, want in [
            ("intersection", ia),
            ("union", aa + ab - ia),
            ("difference", aa - ia),
        ]:
            got = overlay.overlay_op(A, B, op)
            area = measure.geom_area_planar(got) if got else 0.0
            assert abs(area - want) < 1e-5 * max(want, 1.0), (op, B, area, want)


def test_overlay_eo_property_random_holed():
    """Randomized holed-rect overlays: every op's area matches the
    inclusion-exclusion identity from the exact intersection-area
    oracle."""
    import numpy as np

    from mundipy_spark.kernels import measure, overlay

    rng = np.random.default_rng(7)
    for trial in range(40):
        x0, y0 = rng.uniform(-50, 30, 2)
        w, h = rng.uniform(8, 40, 2)
        hx, hy = rng.uniform(0.15, 0.45, 2)
        hw, hhh = rng.uniform(0.1, 0.35, 2)
        outer = _rect_ring(x0, y0, x0 + w, y0 + h)
        hole = _rect_ring(
            x0 + hx * w, y0 + hy * h, x0 + (hx + hw) * w, y0 + (hy + hhh) * h
        )[::-1]
        A = ("Polygon", [outer, hole])
        bx0, by0 = x0 + rng.uniform(-0.5, 0.8) * w, y0 + rng.uniform(-0.5, 0.8) * h
        bw, bh = rng.uniform(5, 30, 2)
        B = ("Polygon", [_rect_ring(bx0, by0, bx0 + bw, by0 + bh)])
        ia = overlay.intersection_area_planar(A, B)
        aa = measure.geom_area_planar(A)
        ab = measure.geom_area_planar(B)
        for op, want in [
            ("intersection", ia),
            ("union", aa + ab - ia),
            ("difference", aa - ia),
        ]:
            got = overlay.overlay_op(A, B, op)
            area = measure.geom_area_planar(got) if got else 0.0
            assert abs(area - want) < 1e-4 * max(want, 1.0), (trial, op, area, want)


def test_difference_split_hole_assignment():
    """When a clip splits a piece, carried holes must land only in the
    piece that contains them (not be double-subtracted everywhere)."""
    import numpy as np

    from mundipy_spark.kernels import measure, overlay

    # A = wide slab; first clip carves a hole on the LEFT half, second
    # clip splits the slab vertically into left+right pieces
    A = ("Polygon", [_rect_ring(0, 0, 20, 10)])
    B = (
        "MultiPolygon",
        [
            [_rect_ring(2, 4, 4, 6)],       # hole in left piece
            [_rect_ring(9, -1, 11, 11)],    # vertical splitter
        ],
    )
    got = overlay.overlay_op(A, B, "difference")
    want = 200.0 - 4.0 - 20.0
    assert abs(measure.geom_area_planar(got) - want) < 1e-6
    # right piece must remain a full 9x10 rectangle (no phantom hole)
    areas = sorted(
        abs(measure.ring_area_planar(np.asarray(p[0])))
        - sum(abs(measure.ring_area_planar(np.asarray(r))) for r in p[1:])
        for p in (got[1] if got[0] == "MultiPolygon" else [got[1]])
    )
    assert abs(areas[-1] - 90.0) < 1e-6
    assert abs(areas[0] - (90.0 - 4.0)) < 1e-6


def test_line_clip_concave_holed_polygon():
    """Line x arbitrary polygon intersection/difference (mixed-dimension
    dispatch): splits at boundary crossings, hole spans excluded."""
    import numpy as np

    from mundipy_spark.kernels import overlay

    L = (
        "Polygon",
        [
            np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10], [0, 0]], float),
            np.array([[1, 1], [1, 3], [3, 3], [3, 1], [1, 1]], float),  # hole
        ],
    )
    line = ("LineString", np.array([[-2.0, 2.0], [12.0, 2.0]]))

    def total_len(g):
        if g is None:
            return 0.0
        parts = [g[1]] if g[0] == "LineString" else g[1]
        return sum(
            np.hypot(*np.diff(np.asarray(p), axis=0).T).sum() for p in parts
        )

    inter = overlay.intersection(line, L)
    diff = overlay.difference(line, L)
    assert abs(total_len(inter) - 8.0) < 1e-9  # x in [0,10] minus hole [1,3]
    assert abs(total_len(diff) - 6.0) < 1e-9   # 2 outside ends + 2 in hole
    # polygon minus line is unchanged (zero measure)
    assert overlay.difference(L, line) == L
    # points: in-hole and outside points drop, interior point kept
    pts = ("MultiPoint", np.array([[2.0, 2.0], [5.0, 2.0], [20.0, 20.0]]))
    kept = overlay.intersection(pts, L)
    assert kept[0] == "Point" and np.allclose(kept[1], [5.0, 2.0])


def test_tree_union_inclusion_exclusion_stress():
    """Tree-union of K random axis-aligned rects vs the closed-form
    inclusion-exclusion union area (k-way rect intersections are rects,
    so the expected area is exact). Exercises multipolygon unions,
    holes created by enclosing patterns, and touching edges."""
    import itertools

    import numpy as np

    from mundipy_spark.kernels import measure, overlay

    rng = np.random.default_rng(13)
    for trial in range(12):
        K = 7
        rects = []
        for _ in range(K):
            x0, y0 = rng.uniform(0, 60, 2)
            w, h = rng.uniform(4, 35, 2)
            rects.append((x0, y0, x0 + w, y0 + h))
        # exact union area by inclusion-exclusion
        want = 0.0
        for r in range(1, K + 1):
            for combo in itertools.combinations(range(K), r):
                xs0 = max(rects[i][0] for i in combo)
                ys0 = max(rects[i][1] for i in combo)
                xs1 = min(rects[i][2] for i in combo)
                ys1 = min(rects[i][3] for i in combo)
                a = max(0.0, xs1 - xs0) * max(0.0, ys1 - ys0)
                want += a if r % 2 == 1 else -a
        geoms = [
            ("Polygon", [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])
            for x0, y0, x1, y1 in rects
        ]
        while len(geoms) > 1:
            geoms = [
                overlay.union(geoms[i], geoms[i + 1]) if i + 1 < len(geoms) else geoms[i]
                for i in range(0, len(geoms), 2)
            ]
        got = measure.geom_area_planar(geoms[0])
        assert abs(got - want) < 1e-4 * max(want, 1.0), (trial, got, want)


def test_rotated_union_fold_oracle():
    """Incremental union of rotated rectangles: each step's area must
    match |U|+|A|-|U∩A| from the exact fan-triangle oracle. Exercises
    shallow-angle crossings, coincident internal twin boundaries from
    GH multi-part outputs, and micro-segment robustness."""
    import numpy as np

    from mundipy_spark.kernels import measure, overlay

    rng = np.random.default_rng(4242)
    for trial in range(15):
        shapes = []
        for _ in range(6):
            cx, cy = rng.uniform(0, 50, 2)
            w, h = rng.uniform(3, 25, 2)
            th = rng.uniform(0, np.pi)
            c, s = np.cos(th), np.sin(th)
            pts = np.array(
                [[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2], [-w / 2, -h / 2]]
            )
            R = np.array([[c, -s], [s, c]])
            shapes.append(("Polygon", [pts @ R.T + [cx, cy]]))
        U = shapes[0]
        areaU = measure.geom_area_planar(U)
        for g in shapes[1:]:
            ia = overlay.intersection_area_planar(U, g)
            want = areaU + measure.geom_area_planar(g) - ia
            U = overlay.union(U, g)
            areaU = measure.geom_area_planar(U)
            assert abs(areaU - want) < 1e-4 * max(want, 1.0), (trial, areaU, want)


def test_mixed_dim_union_symdiff_no_fallthrough():
    """ADVICE r02: polygon x line union/symmetric_difference must not
    fall through to the polygon-only GH path — the polygon survives and
    line parts outside it ride along as a GeometryCollection."""
    sq = ("Polygon", [np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])])
    line = ("LineString", np.array([[2.0, 2.0], [8.0, 2.0]]))  # half inside

    u = overlay.overlay_op(sq, line, "union")
    assert u[0] == "GeometryCollection"
    parts = {g[0] for g in u[1]}
    assert "Polygon" in parts and ("LineString" in parts or "MultiLineString" in parts)
    # the surviving line piece is the OUTSIDE part (x in [4, 8])
    lp = [g for g in u[1] if g[0] in ("LineString", "MultiLineString")][0]
    seg = lp[1] if lp[0] == "LineString" else lp[1][0]
    assert np.asarray(seg)[:, 0].min() >= 4.0 - 1e-9

    s = overlay.overlay_op(line, sq, "symmetric_difference")
    assert s[0] == "GeometryCollection"

    # fully-inside line: union is just the polygon
    inner = ("LineString", np.array([[1.0, 1.0], [3.0, 1.0]]))
    assert overlay.overlay_op(sq, inner, "union")[0] == "Polygon"

    pt = ("Point", np.array([1.0, 1.0]))
    assert overlay.overlay_op(pt, line, "union")[0] == "GeometryCollection"


def test_point_x_line_overlays():
    """ADVICE r03: point x line overlays match the reference's shapely
    semantics (previously raised NotImplementedError)."""
    line = ("LineString", np.array([[0.0, 0.0], [4.0, 0.0]]))
    on = ("Point", np.array([2.0, 0.0]))
    off = ("Point", np.array([2.0, 1.0]))
    multi = ("MultiPoint", np.array([[2.0, 0.0], [2.0, 1.0], [9.0, 9.0]]))

    # intersection: on-line membership (commutative)
    got = overlay.overlay_op(on, line, "intersection")
    assert got[0] == "Point" and np.allclose(got[1], [2.0, 0.0])
    assert overlay.overlay_op(off, line, "intersection") is None
    got = overlay.overlay_op(line, multi, "intersection")
    assert got[0] == "Point" and np.allclose(got[1], [2.0, 0.0])

    # difference: point minus line drops on-line points; line minus
    # point is the line unchanged
    assert overlay.overlay_op(on, line, "difference") is None
    got = overlay.overlay_op(off, line, "difference")
    assert got[0] == "Point" and np.allclose(got[1], [2.0, 1.0])
    assert overlay.overlay_op(line, multi, "difference") is line
    got = overlay.overlay_op(multi, line, "difference")
    assert got[0] == "MultiPoint" and len(got[1]) == 2

    # union / symdiff: line absorbs on-line points; off-line points
    # ride along in a GeometryCollection
    assert overlay.overlay_op(on, line, "union") is line
    u = overlay.overlay_op(multi, line, "symmetric_difference")
    assert u[0] == "GeometryCollection"
    kinds = {g[0] for g in u[1]}
    assert "LineString" in kinds and "MultiPoint" in kinds


def test_line_clip_length_conservation_randomized():
    """Property hunt over the mixed-dim machinery: for random rects and
    random segments, the inside part (intersection) and outside part
    (difference) partition the line — lengths sum to the original
    (length is the right invariant: the clip may split either side into
    multiple pieces)."""
    from mundipy_spark.kernels import measure

    rng = np.random.default_rng(23)
    checked = 0
    for _ in range(300):
        x0, y0 = rng.uniform(-5, 5, 2)
        wdt, hgt = rng.uniform(1, 8, 2)
        rect = ("Polygon", [np.array(
            [[x0, y0], [x0 + wdt, y0], [x0 + wdt, y0 + hgt], [x0, y0 + hgt], [x0, y0]]
        )])
        a = rng.uniform(-10, 15, 2)
        b = rng.uniform(-10, 15, 2)
        if np.allclose(a, b):
            continue
        line = ("LineString", np.vstack([a, b]))
        total = measure.geom_length_planar(line)
        inside = overlay.overlay_op(line, rect, "intersection")
        outside = overlay.overlay_op(line, rect, "difference")
        li = measure.geom_length_planar(inside) if inside is not None else 0.0
        lo = measure.geom_length_planar(outside) if outside is not None else 0.0
        assert abs((li + lo) - total) < 1e-6 * max(total, 1.0), (rect, line, li, lo)
        # union GeometryCollection conserves both operands
        u = overlay.overlay_op(rect, line, "union")
        if u[0] == "GeometryCollection":
            area = sum(measure.geom_area_planar(g) for g in u[1] if g[0].endswith("Polygon"))
            ulen = sum(measure.geom_length_planar(g) for g in u[1]
                       if "LineString" in g[0])
            assert abs(area - wdt * hgt) < 1e-9
            assert abs(ulen - lo) < 1e-6 * max(total, 1.0)
        checked += 1
    assert checked > 250


def test_overlay_shared_chain_edge_parallel_perturbation():
    """Regression: two heptagon-derived polygons sharing a 4-vertex
    boundary chain, where one edge's slope matches the OLD fixed
    perturbation direction (-tan 22.5deg) to 4e-4 — translation along a
    near-parallel direction slides the shared-vertex crossing along the
    edge, keeping its transversal parameter within _GH_TOL of the
    endpoint at every retry magnitude. Found by hypothesis
    (test_overlay_inclusion_exclusion); fixed by rotating the
    perturbation direction per retry (golden angle)."""
    a = ("Polygon", [np.array([
        [9.00968868e-01, 4.33883739e-01],
        [1.04670426e+00, 1.58568918e+00],
        [-2.40384545e+00, 3.01432685e+00],
        [-1.00000000e+00, 1.22464680e-16],
        [-6.23489802e-01, -7.81831482e-01],
        [2.22520934e-01, -9.74927912e-01],
        [9.00968868e-01, -4.33883739e-01],
        [9.00968868e-01, 4.33883739e-01]])])
    b = ("Polygon", [np.array([
        [9.00968868e-01, 4.33883739e-01],
        [2.22520934e-01, 9.74927912e-01],
        [-2.40384545e+00, 3.01432685e+00],
        [-2.00000000e+00, 2.44929360e-16],
        [-6.23489802e-01, -7.81831482e-01],
        [2.22520934e-01, -9.74927912e-01],
        [9.00968868e-01, -4.33883739e-01],
        [9.00968868e-01, 4.33883739e-01]])])
    u = overlay.overlay_op(a, b, "union")
    i = overlay.overlay_op(a, b, "intersection")
    ua = measure.geom_area_planar(u)
    ia = measure.geom_area_planar(i) if i else 0.0
    rhs = measure.geom_area_planar(a) + measure.geom_area_planar(b)
    assert abs((ua + ia) - rhs) < 1e-3 * rhs


def _incl_excl(x, y):
    u = overlay.overlay_op(x, y, "union")
    i = overlay.overlay_op(x, y, "intersection")
    ua = measure.geom_area_planar(u) if u else 0.0
    ia = measure.geom_area_planar(i) if i else 0.0
    rhs = measure.geom_area_planar(x) + measure.geom_area_planar(y)
    assert abs((ua + ia) - rhs) < 1e-3 * max(1.0, rhs), (ua, ia, rhs)


def test_overlay_difference_output_hygiene_composition():
    """Regression battery: (a\\b) components that share boundary chains
    with b, composed against a third ring c. Historically produced (1) a
    CW-oriented outer whose GH re-feed returned the COMPLEMENT, (2) a
    zero-width two-vertex sliver ring, (3) a pinched ring whose
    zero-width arm put the containment probe point on the wrong side of
    c. All found by hypothesis; pinned here exactly."""
    p16 = lambda k: (np.cos(2 * np.pi * k / 16), np.sin(2 * np.pi * k / 16))
    ring = lambda pts: np.array(pts + [pts[0]])
    # case 3/4 family: 16-gon variants with spikes
    a = ("Polygon", [ring([[0.92387953, 0.38268343], [0.55557023, 0.83146961],
        [-0.38268343, 0.92387953], [-0.92387953, 0.38268343],
        [-1.84775907, -0.76536686], [-0.09801714, -0.99518473],
        [0.6863785, -7.9705009], [0.76516727, -0.64383154]])])
    b = ("Polygon", [ring([[0.92387953, 0.38268343], [0.38268343, 0.92387953],
        [-0.38268343, 0.92387953], [-0.92387953, 0.38268343],
        [-0.92387953, -0.38268343], [-0.38268343, -0.92387953],
        [0.6863785, -7.9705009], [0.76516727, -0.64383154]])])
    c = ("Polygon", [ring([[0.92387953, 0.38268343], [0.38268343, 0.92387953],
        [-0.76536686, 1.84775907], [-0.92387953, 0.38268343],
        [-0.92387953, -0.38268343], [-0.38268343, -0.92387953],
        [0.6863785, -7.9705009], [0.76516727, -0.64383154]])])
    h = overlay.overlay_op(a, b, "difference")
    _incl_excl(h, c)
    # the pinched component must intersect c as empty (MC-verified truth)
    comps = h[1] if h[0] == "MultiPolygon" else [h[1]]
    small = min(comps, key=lambda p: abs(overlay._ring_signed_area(p[0])))
    g = ("Polygon", [np.vstack([small[0], small[0][:1]])])
    gi = overlay.overlay_op(g, c, "intersection")
    assert (measure.geom_area_planar(gi) if gi else 0.0) < 1e-6


def test_overlay_difference_pinched_donut_hole():
    """b inside a, touching a's boundary at a vertex: a\\b is a pinched
    donut. GH emits it as ONE self-touching ring; the pinch split must
    recognize the inner lobe as a HOLE (flattening both lobes into
    outers double-counted: returned |a|+|b| instead of |a|-|b|)."""
    a = ("Polygon", [np.array([[0.70710678, 0.70710678], [-0.70710678, 0.70710678],
        [-0.70710678, -0.70710678], [1.41421356, -1.41421356],
        [0.70710678, 0.70710678]])])
    b = ("Polygon", [np.array([[0.35355339, 0.35355339], [-0.35355339, 0.35355339],
        [-0.70710678, -0.70710678], [0.70710678, -0.70710678],
        [0.35355339, 0.35355339]])])
    d = overlay.overlay_op(a, b, "difference")
    i = overlay.overlay_op(a, b, "intersection")
    da = measure.geom_area_planar(d)
    ia = measure.geom_area_planar(i)
    assert abs(ia - 1.125) < 1e-6
    assert abs(da - 1.875) < 1e-6, da
    assert d[0] == "Polygon" and len(d[1]) == 2  # outer + hole


def test_split_pinches_far_from_origin_no_overflow():
    """Grid keys are computed in ring-local coordinates: a small-extent
    ring at web-mercator magnitudes with a tol ~ ext*1e-12 cell must not
    overflow the int64 cast (which raises under warnings-as-errors and
    collapses the dedup grid to one bucket)."""
    import warnings

    from mundipy_spark.kernels import overlay as ov

    x0 = 2.0e7
    ring = np.array(
        [[x0, 0.0], [x0 + 0.1, 0.0], [x0 + 0.1, 0.1], [x0, 0.1]], float
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = ov._split_pinches(ring, tol=0.1 * 1e-12)
    assert len(out) == 1 and len(out[0]) == 4

    # a genuine pinch at the same magnitude still splits into two lobes
    pinched = np.array(
        [
            [x0, 0.0], [x0 + 1.0, 0.0], [x0 + 1.0, 1.0], [x0, 1.0],
            [x0, 0.0], [x0 - 1.0, 0.0], [x0 - 1.0, -1.0], [x0, -1.0],
        ],
        float,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        lobes = ov._split_pinches(pinched, tol=1e-9)
    assert len(lobes) == 2


def test_escaped_hole_invalidity_repair_and_overlay():
    """Fuzz-campaign findings (r5, tools/fuzz_campaign.py): a hole
    poking OUTSIDE its shell is invalid (GEOS "hole lies outside
    shell" — the old checker said valid), make_valid rebuilds it as
    the even-odd-equivalent xor of the ring regions (valid output,
    possibly MultiPolygon), and the eo overlay must not crash on the
    raw invalid input (vertex-order-dependent dangling-stitch crash
    fixed by the normalize-retry rung + the repair)."""
    import numpy as np

    shell = np.array(
        [[-1.5, -1.5], [1.5, -1.5], [1.5, 1.5], [-1.5, 1.5], [-1.5, -1.5]]
    )
    # hole pokes out of the right edge
    hole = np.array(
        [[1.0, -0.5], [2.0, -0.5], [2.0, 0.5], [1.0, 0.5], [1.0, -0.5]]
    )
    a = ("Polygon", [shell, hole[::-1]])
    assert not constructive.is_valid(a)
    av = constructive.make_valid(a)
    assert constructive.is_valid(av)
    # even-odd region area: shell - hole∩shell + hole\shell
    #   shell 9, hole 1, inside part 0.5, outside part 0.5 -> 9 - 0.5 + 0.5
    assert abs(measure.geom_area_planar(av) - 9.0) < 1e-9
    # raw invalid input: overlay completes (no dangling-stitch crash)
    b = ("Polygon", [np.array([[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]], float)])
    for op in ("intersection", "union", "difference", "symmetric_difference"):
        overlay.overlay_op(a, b, op)
    # algebra holds on the repaired operand
    ia = overlay.intersection_area_planar(av, b)
    gu = overlay.overlay_op(av, b, "union")
    assert abs(
        measure.geom_area_planar(gu)
        - (measure.geom_area_planar(av) + 9.0 - ia)
    ) < 1e-9


def test_valid_holed_polygon_untouched_by_make_valid():
    """The repair path must not fire for valid holed polygons — the
    fast path returns the normalized rings unchanged."""
    import numpy as np

    shell = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    g = ("Polygon", [shell, hole])
    assert constructive.is_valid(("Polygon", [shell, hole[::-1]]))
    gv = constructive.make_valid(g)
    assert gv[0] == "Polygon" and len(gv[1]) == 2
    assert abs(measure.geom_area_planar(gv) - 15.0) < 1e-9
