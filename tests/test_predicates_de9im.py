"""DE-9IM predicate semantics on boundary-contact configurations.

The reference exposes shapely/GEOS predicates on every geometry
(mundipy/geometry.py:92-99); these pin the configurations a
proper-crossing + vertex-containment test family misreports — interiors
meeting across collinear shared edges, corner-threading lines,
hole-spanning covers, point/line boundary rules — against hand-derived
GEOS truth. Pure numpy, no SparkSession.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import Phase, given, settings
from hypothesis import strategies as st

from mundipy_spark.kernels import measure, overlay
from mundipy_spark.kernels import predicates as P

settings.register_profile("de9im", max_examples=60, deadline=None)
settings.load_profile("de9im")


def rect(x0, y0, x1, y1):
    return (
        "Polygon",
        [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)],
    )


def line(*pts):
    return ("LineString", np.array(pts, float))


def point(x, y):
    return ("Point", np.array([x, y], float))


SQ = rect(0, 0, 1, 1)
HSEG = line((0, 0), (1, 0))


# --- interiors meeting across collinear shared edges -----------------------


def test_touches_vs_overlaps_collinear_edge_rects():
    """[0,2]x[0,1] and [1,3]x[0,1]: interiors overlap on [1,2]x[0,1] but
    no vertex of either is strictly inside the other and no edge crossing
    is proper — GEOS: overlaps, NOT touches."""
    a, b = rect(0, 0, 2, 1), rect(1, 0, 3, 1)
    assert not P.touches(a, b)
    assert P.overlaps(a, b)


def test_identical_polygons_do_not_touch_or_overlap():
    a = rect(0, 0, 2, 1)
    assert not P.touches(a, a)
    assert not P.overlaps(a, a)  # covers both ways
    assert P.equals(a, a) and P.covers(a, a) and P.contains(a, a)


def test_edge_adjacent_rects_touch_only():
    a, c = rect(0, 0, 2, 1), rect(2, 0, 3, 1)
    assert P.touches(a, c)
    assert not P.overlaps(a, c)
    assert P.intersects(a, c)


# --- point boundary rules ----------------------------------------------------


def test_point_point_never_touches():
    assert not P.touches(point(0.5, 0), point(0.5, 0))
    assert P.intersects(point(0.5, 0), point(0.5, 0))


def test_point_on_line_interior_vs_endpoint():
    assert not P.touches(point(0.5, 0), HSEG)  # interior: within, not touch
    assert P.touches(point(0, 0), HSEG)  # endpoint = line boundary
    assert P.contains(HSEG, point(0.5, 0))
    assert not P.contains(HSEG, point(0, 0))
    assert P.covers(HSEG, point(0, 0))


def test_point_on_polygon_boundary_vs_interior():
    assert P.touches(point(0, 0.5), SQ)
    assert not P.touches(point(0.5, 0.5), SQ)
    assert P.contains(SQ, point(0.5, 0.5))
    assert not P.contains(SQ, point(0, 0.5))


def test_multipoint_crosses_needs_strict_interior_and_exterior():
    inside_out = ("MultiPoint", np.array([[0.5, 0.5], [5.0, 5.0]]))
    boundary_out = ("MultiPoint", np.array([[0.0, 0.5], [5.0, 5.0]]))
    assert P.crosses(inside_out, SQ)
    assert not P.crosses(boundary_out, SQ)  # II empty: only boundary contact
    assert P.touches(boundary_out, SQ)


# --- line/line interior kinds -------------------------------------------------


def test_collinear_overlapping_lines_overlap_not_touch():
    l2 = line((0.5, 0), (2, 0))
    assert not P.touches(HSEG, l2)
    assert P.overlaps(HSEG, l2)
    assert not P.crosses(HSEG, l2)  # dim(II)=1, not a point crossing


def test_endpoint_meeting_lines_touch():
    l3 = line((1, 0), (2, 0))
    assert P.touches(HSEG, l3)
    assert not P.overlaps(HSEG, l3)


def test_x_crossing_is_crosses_not_overlaps():
    v = line((0, -1), (0, 1))
    h = line((-1, 0), (1, 0))
    assert P.crosses(v, h)
    assert not P.touches(v, h)
    assert not P.overlaps(v, h)  # dim(II)=0 for lines is crosses


def test_t_junction_touches():
    stem = line((-1, 0.5), (0, 0.5))
    bar = line((0, 0), (0, 1))
    assert P.touches(stem, bar)
    assert not P.crosses(stem, bar)


def test_v_apex_on_line_interior_crosses():
    """An interior VERTEX of one line touching the other's interior is a
    dim-0 interior intersection (crosses) even with no proper segment
    crossing."""
    v = line((-1, 1), (0, 0), (1, 1))
    h = line((-2, 0), (2, 0))
    assert P.crosses(v, h)
    assert not P.touches(v, h)


def test_shallow_angle_crossing_is_point_not_run():
    """Near-parallel proper crossings must not be misread as collinear
    runs (the micro-interval-midpoint trap)."""
    l1 = line((1.22070312e-04, -59.0), (3.10093467, -51.0))
    l2 = line((3.10093467, -59.0), (3.10086364, -51.0))
    assert P._line_line_ii_kind(l1, l2) == "point"
    assert P._line_line_ii_kind(l2, l1) == "point"
    assert P.crosses(l1, l2) and P.crosses(l2, l1)


def test_closed_ring_has_empty_boundary():
    ring = line((0, 0), (1, 0), (1, 1), (0, 0))
    probe = line((-1, 0), (0, 0))  # its endpoint hits the ring's interior
    assert P.touches(probe, ring)  # the contact IS probe's boundary point
    assert len(P._line_boundary_points(ring)) == 0


# --- corner-threading lines ----------------------------------------------------


def test_corner_threading_diagonal_crosses_square():
    diag = line((-0.5, -0.5), (2, 2))
    assert P.crosses(diag, SQ)
    assert not P.touches(diag, SQ)


def test_chord_is_within_not_crosses():
    chord = line((0, 0.5), (1, 0.5))
    assert P.within(chord, SQ)
    assert P.contains(SQ, chord)
    assert not P.crosses(chord, SQ)


def test_boundary_lying_line_covered_not_contained():
    assert P.covers(SQ, HSEG)
    assert not P.contains(SQ, HSEG)
    assert P.touches(SQ, HSEG)


# --- covers exactness ----------------------------------------------------------


def test_covers_rejects_hole_spanning_polygon():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    a = ("Polygon", [outer, hole])
    assert not P.covers(a, rect(3, 3, 7, 7))  # b includes the hole
    assert not P.covers(a, rect(4.4, 4.4, 5.6, 5.6))  # b inside the hole
    assert P.covers(a, rect(1, 1, 3, 3))
    assert P.contains(a, rect(1, 1, 3, 3))


def test_line_covers_line():
    assert P.covers(HSEG, HSEG)
    sub = line((0.2, 0), (0.7, 0))
    assert P.covers(HSEG, sub) and P.contains(HSEG, sub)
    assert not P.covers(sub, HSEG)
    assert not P.covers(HSEG, line((0.2, 0), (0.7, 0.1)))
    assert P.equals(HSEG, HSEG)


# --- coherence properties (compact; the full campaign ran at 2000 examples) ----


coord = st.floats(-150.0, 150.0, allow_nan=False, width=64)


@st.composite
def star_polygon_c(draw):
    n = draw(st.integers(4, 10))
    cx = draw(coord)
    cy = draw(st.floats(-60.0, 60.0))
    jit = [draw(st.floats(0.1, 0.9)) for _ in range(n)]
    rad = [draw(st.floats(0.5, 8.0)) for _ in range(n)]
    ang = 2 * np.pi * (np.arange(n) + np.array(jit)) / n
    pts = np.c_[
        cx + np.array(rad) * np.cos(ang), cy + np.array(rad) * np.sin(ang)
    ]
    return ("Polygon", [np.vstack([pts, pts[:1]])]), np.array([cx, cy])


@st.composite
def nearby_pair(draw):
    a, c = draw(star_polygon_c())
    dx = draw(st.floats(-4.0, 4.0))
    dy = draw(st.floats(-4.0, 4.0))
    s = draw(st.floats(0.3, 1.5))
    b = ("Polygon", [(a[1][0] - c) * s + c + [dx, dy]])
    return a, b


def _coherent(a, b):
    it, to, ov = P.intersects(a, b), P.touches(a, b), P.overlaps(a, b)
    ct, cr = P.contains(a, b), P.crosses(a, b)
    assert it == P.intersects(b, a)
    assert to == P.touches(b, a)
    assert ov == P.overlaps(b, a)
    assert P.covers(a, b) == P.covered_by(b, a)
    assert ct == P.within(b, a)
    assert not (to and ov) and not (to and ct) and not (to and cr)
    assert it == (to or P._interiors_meet(a, b))


@given(nearby_pair())
@settings(max_examples=60, deadline=None, phases=[Phase.generate])
def test_poly_pair_coherence(ab):
    a, b = ab
    _coherent(a, b)
    area = overlay.intersection_area_planar(a, b)
    amin = 1e-6 * max(measure.geom_area_planar(a), measure.geom_area_planar(b))
    if area > amin:
        assert P._interiors_meet(a, b)
    if P.covers(a, b):
        ab_area = measure.geom_area_planar(b)
        assert abs(area - ab_area) <= max(1e-6, 1e-5 * ab_area)


@given(star_polygon_c())
@settings(max_examples=60, deadline=None, phases=[Phase.generate])
def test_shrunken_copy_contained(ac):
    a, c = ac
    small = ("Polygon", [(a[1][0] - c) * 0.4 + c])
    assert P.within(small, a)
    assert P.contains(a, small)
    assert not P.touches(a, small)


# --- relate: pinned GEOS matrices --------------------------------------------


RELATE_GOLDENS = [
    # (a, b, GEOS relate(a,b))
    (rect(0, 0, 2, 1), rect(2, 0, 3, 1), "FF2F11212"),  # edge-adjacent
    (rect(0, 0, 2, 1), rect(1, 0, 3, 1), "212111212"),  # collinear-edge overlap
    (rect(0, 0, 2, 1), rect(0, 0, 2, 1), "2FFF1FFF2"),  # identical
    (point(0.5, 0.5), SQ, "0FFFFF212"),  # point in interior
    (point(0, 0.5), SQ, "F0FFFF212"),  # point on boundary
    (line((-1, 0.5), (3, 0.5)), rect(0, 0, 1, 1), "101FF0212"),  # through-cross
    (line((0, 0.5), (1, 0.5)), SQ, "1FFF0F212"),  # chord, endpoints on boundary
    (HSEG, SQ, "F1FF0F212"),  # line lying on the boundary
    (line((0, -1), (0, 1)), line((-1, 0), (1, 0)), "0F1FF0102"),  # X cross
    (HSEG, line((0.5, 0), (2, 0)), "1010F0102"),  # collinear line overlap
    (HSEG, line((1, 0), (2, 0)), "FF1F00102"),  # endpoint-to-endpoint touch
    (point(0.5, 0), HSEG, "0FFFFF102"),  # point in line interior
    (point(0, 0), HSEG, "F0FFFF102"),  # point at line endpoint
    (rect(1, 1, 3, 3), rect(0, 0, 10, 10), "2FF1FF212"),  # strictly inside
]


@pytest.mark.parametrize("a,b,want", RELATE_GOLDENS)
def test_relate_goldens(a, b, want):
    assert P.relate(a, b) == want
    # symmetry: relate(b,a) is the transpose
    m = P.relate(a, b)
    t = "".join(m[3 * c + r] for r in range(3) for c in range(3))
    assert P.relate(b, a) == t


def test_relate_hole_spanning():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)
    a = ("Polygon", [outer, hole])
    m = P.relate(a, rect(3, 3, 7, 7))
    assert m[0] == "2"  # interiors meet (the annulus part)
    assert m[6] == "2"  # b's interior spills into a's exterior (the hole)
    assert not P.relate_pattern(a, rect(3, 3, 7, 7), "T*****FF*")  # not covers


def test_relate_pattern_semantics():
    assert P.relate_pattern(point(0.5, 0.5), SQ, "T*F**F***")  # within
    assert P.relate_pattern(rect(0, 0, 2, 1), rect(2, 0, 3, 1), "F***T****")
    assert not P.relate_pattern(rect(0, 0, 2, 1), rect(1, 0, 3, 1), "F***T****")
    assert P.relate_pattern(HSEG, line((0.5, 0), (2, 0)), "1*T***T**")  # overlaps
    with pytest.raises(ValueError):
        P.relate_pattern(SQ, SQ, "T*F")
    with pytest.raises(ValueError):
        P.relate_pattern(SQ, SQ, "T*F**F**X")
    with pytest.raises(ValueError):
        P.relate(("GeometryCollection", [SQ]), SQ)


def _named_from_relate(a, b):
    """The OGC pattern definitions of every named predicate."""
    da, db = P._dim(a), P._dim(b)
    inter = not P.relate_pattern(a, b, "FF*FF****")
    touch = any(
        P.relate_pattern(a, b, p) for p in ("FT*******", "F**T*****", "F***T****")
    )
    if da == db == 1:
        crosses = P.relate_pattern(a, b, "0********")
    elif da < db:
        crosses = P.relate_pattern(a, b, "T*T******")
    elif da > db:
        crosses = P.relate_pattern(a, b, "T*****T**")
    else:
        crosses = False
    if da != db:
        over = False
    elif da == 1:
        over = P.relate_pattern(a, b, "1*T***T**")
    else:
        over = P.relate_pattern(a, b, "T*T***T**")
    covers = any(
        P.relate_pattern(a, b, p)
        for p in ("T*****FF*", "*T****FF*", "***T**FF*", "****T*FF*")
    )
    within = P.relate_pattern(a, b, "T*F**F***")
    return inter, touch, crosses, over, covers, within


def _relate_coherent(a, b):
    inter, touch, crosses, over, covers, within = _named_from_relate(a, b)
    assert inter == P.intersects(a, b)
    assert touch == P.touches(a, b)
    assert crosses == P.crosses(a, b)
    assert over == P.overlaps(a, b)
    assert covers == P.covers(a, b)
    assert within == P.within(a, b)


@pytest.mark.parametrize("a,b,want", RELATE_GOLDENS)
def test_named_predicates_match_relate_patterns(a, b, want):
    _relate_coherent(a, b)
    _relate_coherent(b, a)


@given(nearby_pair())
@settings(max_examples=40, deadline=None, phases=[Phase.generate])
def test_poly_pair_relate_coherence(ab):
    a, b = ab
    _relate_coherent(a, b)
    m = P.relate(a, b)
    t = "".join(m[3 * c + r] for r in range(3) for c in range(3))
    assert P.relate(b, a) == t


# --- review-pass regressions ---------------------------------------------------


def test_point_point_covers_contains_relate():
    """_points_hit_geom must match point-geometry targets: identical
    points cover/contain each other and relate as '0FFFFFFF2'."""
    p = point(1, 1)
    assert P.covers(p, p) and P.contains(p, p) and P.covered_by(p, p)
    assert P.relate(p, p) == "0FFFFFFF2"
    q = point(2, 2)
    assert P.relate(p, q) == "FF0FFF0F2"
    mp = ("MultiPoint", np.array([[1.0, 1.0], [2.0, 2.0]]))
    assert P.covers(mp, p) and not P.covers(p, mp)
    assert P.relate(mp, p) == "0F0FFFFF2"
    assert P.contains(mp, p) and P.within(p, mp)


def test_covers_rejects_multipolygon_hole_coincident_member():
    """The coincident-ring degeneracy probe must test EVERY component
    of a MultiPolygon b, not one representative point."""
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    hole = np.array([[6, 6], [7, 6], [7, 7], [6, 7], [6, 6]], float)
    a = ("Polygon", [outer, hole])
    solid = rect(1, 1, 5, 5)[1][0]
    b = ("MultiPolygon", [[solid], [hole.copy()]])
    assert not P.covers(a, b)  # the hole-shaped member's interior is outside a
    assert P.relate(a, b)[6] == "2"  # EI: b spills into a's exterior
    good = ("MultiPolygon", [[solid], [rect(8, 8, 9, 9)[1][0]]])
    assert P.covers(a, good)


def test_relate_open_ring_polygon_matches_closed():
    """_rings_of must emit the implicit closing edge of open-form rings;
    the crossing on that edge is a BI contact."""
    a_open = ("Polygon", [np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)])
    a_closed = rect(0, 0, 4, 4)
    l = line((-1, 2), (1, 2))  # crosses the LEFT (closing) edge, ends inside
    assert P.relate(a_open, l) == P.relate(a_closed, l) == "1020F1102"


def test_float_noise_closed_seam_has_empty_boundary():
    """Endpoint dedup must use the 1e-9 tolerance, not decimal rounding:
    a seam closed to 3e-16 straddling a 9th-decimal rounding boundary is
    still closed (empty mod-2 boundary)."""
    e1 = 0.1234567894999999
    e2 = 0.1234567895000002
    assert round(e1, 9) != round(e2, 9)  # the construction is on the boundary
    ring = line((e1, 0.0), (1.0, 0.0), (1.0, 1.0), (e2, 0.0))
    assert len(P._line_boundary_points(ring)) == 0
    probe = line((e1, 0.0), (e1 - 1.0, 0.0))
    assert P.touches(probe, ring)  # probe's endpoint hits ring INTERIOR


# --- mixed-dimension + hole-bearing coherence campaigns ------------------------


@st.composite
def polyline_c(draw):
    n = draw(st.integers(2, 6))
    cx = draw(coord)
    cy = draw(st.floats(-60.0, 60.0))
    pts = np.c_[
        [cx + draw(st.floats(-6.0, 6.0)) for _ in range(n)],
        [cy + draw(st.floats(-6.0, 6.0)) for _ in range(n)],
    ]
    return ("LineString", pts)


@st.composite
def holed_polygon_c(draw):
    a, c = draw(star_polygon_c())
    ring = a[1][0]
    hole = (ring - c) * draw(st.floats(0.15, 0.45)) + c
    return ("Polygon", [ring, hole[::-1].copy()]), c


@given(star_polygon_c(), polyline_c())
@settings(max_examples=50, deadline=None, phases=[Phase.generate])
def test_line_poly_relate_coherence(ac, l):
    a, c = ac
    # anchor the line near the polygon so contact configurations occur
    l = ("LineString", l[1] - l[1][:1] + c + [1.0, 0.5])
    _relate_coherent(a, l)
    _relate_coherent(l, a)
    m = P.relate(a, l)
    t = "".join(m[3 * cc + r] for r in range(3) for cc in range(3))
    assert P.relate(l, a) == t


@given(holed_polygon_c(), st.floats(-3.0, 3.0), st.floats(-3.0, 3.0), st.floats(0.2, 1.2))
@settings(max_examples=50, deadline=None, phases=[Phase.generate])
def test_holed_poly_pair_relate_coherence(ac, dx, dy, s):
    a, c = ac
    b = ("Polygon", [(a[1][0] - c) * s + c + [dx, dy]])
    _relate_coherent(a, b)
    _relate_coherent(b, a)


@given(holed_polygon_c(), polyline_c())
@settings(max_examples=50, deadline=None, phases=[Phase.generate])
def test_holed_poly_line_relate_coherence(ac, l):
    a, c = ac
    l = ("LineString", l[1] - l[1][:1] + c)  # start at the centroid (in the hole)
    _relate_coherent(a, l)
    _relate_coherent(l, a)


def test_degenerate_zero_length_lines_are_point_like():
    """A (Multi)LineString whose every component has zero extent is
    topologically a point set (GEOS: the collapsed edge's point labels
    as line INTERIOR; the mod-2 rule leaves the boundary empty).
    Hypothesis found the pre-fix divergence: the segment-based
    primitives saw no segments, so relate reported an empty interior
    (FF2FF1FF2) while intersects said True — contains/touches/relate
    all disagreed with GEOS. Pinned goldens below."""
    poly = ("Polygon", [np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float
    )])
    zl = ("LineString", np.array([[5.0, 5.0], [5.0, 5.0]]))
    zl_edge = ("LineString", np.array([[5.0, 0.0], [5.0, 0.0]]))
    zl_out = ("LineString", np.array([[50.0, 5.0], [50.0, 5.0]]))
    pt = ("Point", np.array([5.0, 5.0]))

    assert P.intersects(poly, zl) and P.intersects(zl, poly)
    assert P.contains(poly, zl) and P.within(zl, poly)
    assert not P.touches(poly, zl)  # interior contact, not touch
    assert P.touches(poly, zl_edge)  # boundary-only contact IS touch
    assert P.covers(poly, zl_edge) and not P.contains(poly, zl_edge)
    assert P.disjoint(poly, zl_out)
    assert P.equals(zl, pt)  # topological equality with the point
    assert P.relate(poly, zl) == P.relate(poly, pt) == "0F2FF1FF2"
    assert P.relate(zl, poly) == "0FFFFF212"
    assert P.relate(zl, zl) == "0FFFFFFF2"

    # a MultiLineString with ANY real-extent component keeps line
    # semantics: only the all-collapsed case normalizes
    ml = ("MultiLineString",
          [np.array([[1.0, 1.0], [2.0, 2.0]]),
           np.array([[3.0, 3.0], [3.0, 3.0]])])
    assert P.relate(poly, ml) == "102FF1FF2"
    mzl = ("MultiLineString",
           [np.array([[5.0, 5.0], [5.0, 5.0]]),
            np.array([[6.0, 6.0], [6.0, 6.0]])])
    assert P.contains(poly, mzl)
    assert P.relate(mzl, poly) == "0FFFFF212"


def test_degenerate_multiline_with_empty_component():
    """GEOS ignores empty components: a MultiLineString of collapsed
    parts plus an empty part still normalizes to the point set."""
    poly = ("Polygon", [np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float
    )])
    g = ("MultiLineString",
         [np.array([[5.0, 5.0], [5.0, 5.0]]),
          np.empty((0, 2), dtype=float)])
    assert P.intersects(poly, g)
    assert P.contains(poly, g)
    assert P.relate(g, poly) == "0FFFFF212"
