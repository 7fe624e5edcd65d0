"""Property-based kernel tests (hypothesis) — the invariants the tile
join's correctness rests on, plus codec round-trips. Pure numpy, no
SparkSession."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from mundipy_spark.kernels import constructive, measure, overlay, predicates, tiling, wkb

settings.register_profile("kernels", max_examples=60, deadline=None)
settings.load_profile("kernels")

coord = st.floats(-179.0, 179.0, allow_nan=False, width=64)
lat = st.floats(-85.0, 85.0, allow_nan=False, width=64)


@st.composite
def star_polygon(draw):
    """A guaranteed-simple polygon: jittered angles around a center."""
    n = draw(st.integers(4, 10))
    cx = draw(st.floats(-150.0, 150.0))
    cy = draw(st.floats(-60.0, 60.0))
    jit = [draw(st.floats(0.1, 0.9)) for _ in range(n)]
    rad = [draw(st.floats(0.5, 8.0)) for _ in range(n)]
    ang = 2 * np.pi * (np.arange(n) + np.array(jit)) / n
    pts = np.c_[cx + np.array(rad) * np.cos(ang), cy + np.array(rad) * np.sin(ang)]
    return ("Polygon", [np.vstack([pts, pts[:1]])])


@st.composite
def linestring(draw):
    n = draw(st.integers(2, 12))
    xs = [draw(coord) for _ in range(n)]
    ys = [draw(lat) for _ in range(n)]
    return ("LineString", np.c_[xs, ys])


@given(star_polygon())
def test_wkb_roundtrip_polygon(g):
    g2 = wkb.loads(wkb.dumps(g))
    assert g2[0] == g[0]
    assert np.allclose(g2[1][0], g[1][0])


@given(linestring())
def test_wkb_wkt_roundtrip_linestring(g):
    g2 = wkb.loads(wkb.dumps(g))
    assert np.allclose(g2[1], g[1])
    g3 = wkb.from_wkt(wkb.to_wkt(g))
    assert np.allclose(g3[1], g[1], atol=1e-6)


@given(star_polygon(), st.integers(4, 9))
def test_cover_contains_all_interior_point_cells(poly, res):
    """THE join invariant: any point inside the polygon maps (via the
    pure-JVM cell arithmetic) to a cell present in the polygon's
    covering — otherwise the equi-join would silently drop matches."""
    minx, miny, maxx, maxy = wkb.bounds(poly)
    cells, full = tiling.cover_geometry_classified(poly, res)
    cellset = set(cells.tolist())
    rng = np.random.default_rng(42)
    xs = rng.uniform(minx, maxx, 200)
    ys = rng.uniform(miny, maxy, 200)
    inside = predicates.points_in_geom(xs, ys, poly)
    pcells = tiling.point_cell(xs, ys, res)
    for x, y, c, inn in zip(xs, ys, pcells, inside):
        if inn:
            assert int(c) in cellset, (x, y)
    # interior flag soundness: a point in a FULL cell is inside the poly
    fullset = set(cells[full].tolist())
    for x, y, c, inn in zip(xs, ys, pcells, inside):
        if int(c) in fullset:
            assert inn, (x, y)


@given(star_polygon(), star_polygon())
def test_intersects_symmetric_and_consistent(a, b):
    ab = predicates.intersects(a, b)
    ba = predicates.intersects(b, a)
    assert ab == ba
    ia = overlay.intersection_area_planar(a, b)
    if ia > 1e-9:
        assert ab


@given(star_polygon())
def test_buffer_grows_and_contains(poly):
    buf = constructive.buffer_planar(poly, 0.5)
    assert measure.geom_area_planar(buf) > measure.geom_area_planar(poly)
    v = predicates.geom_vertices(poly)
    assert predicates.points_in_geom(v[:, 0], v[:, 1], buf).all()


@given(star_polygon())
def test_convex_hull_contains_and_convex(poly):
    hull = constructive.convex_hull(poly)
    v = predicates.geom_vertices(poly)
    assert predicates.points_in_geom(v[:, 0], v[:, 1], hull).all()
    assert overlay.is_convex(hull[1][0])


def _ar(g):
    return measure.geom_area_planar(g) if g else 0.0


@given(star_polygon(), star_polygon())
def test_overlay_inclusion_exclusion(a, b):
    """|A∪B| + |A∩B| == |A| + |B|, |A\\B| + |A∩B| == |A|, and
    |AΔB| == |A∪B| - |A∩B| via the GEOMETRY outputs."""
    ua = _ar(overlay.overlay_op(a, b, "union"))
    ia = _ar(overlay.overlay_op(a, b, "intersection"))
    da = _ar(overlay.overlay_op(a, b, "difference"))
    sa = _ar(overlay.overlay_op(a, b, "symmetric_difference"))
    ra = measure.geom_area_planar(a)
    rhs = ra + measure.geom_area_planar(b)
    # tolerance covers the worst-case degeneracy-perturbation shift
    # (extent * 1e-9 * 3^4 * perimeter ≈ 1e-4 absolute on these sizes);
    # a traversal/marking bug would be O(component area), 1000x larger
    tol = 1e-3 * max(1.0, rhs)
    assert abs((ua + ia) - rhs) < tol
    assert abs((da + ia) - ra) < tol
    assert abs(sa - (ua - ia)) < tol


@given(star_polygon(), star_polygon(), star_polygon())
@example(
    a=('Polygon', [np.array([[ 2.95342712,  2.82842712],
             [-0.26518064,  1.96157056],
             [-0.58210678, -0.70710678],
             [ 1.97275907, -0.76536686],
             [ 2.95342712,  2.82842712]])]),
    b=('Polygon', [np.array([[ 0.70710678,  0.70710678],
             [-0.35355339,  0.35355339],
             [-0.35355339, -0.35355339],
             [ 0.70710678, -0.70710678],
             [ 0.70710678,  0.70710678]])]),
    c=('Polygon', [np.array([[ 2.95342712,  2.82842712],
             [-0.26518064,  1.96157056],
             [-0.58210678, -0.70710678],
             [ 1.97275907, -0.76536686],
             [ 2.95342712,  2.82842712]])]),
).via('discovered failure')
def test_overlay_multipart_composition(a, b, c):
    """(A\\B) is often a MULTI-polygon whose components share boundary
    chains with B — overlaying it with a third layer exercises the GH
    output-hygiene path (orientation normalization, perturbation-sliver
    culling, pinched-ring splitting: each historically broke this)."""
    h = overlay.overlay_op(a, b, "difference")
    if h is None:
        return
    ha, ca = _ar(h), measure.geom_area_planar(c)
    u = _ar(overlay.overlay_op(h, c, "union"))
    i = _ar(overlay.overlay_op(h, c, "intersection"))
    assert abs((u + i) - (ha + ca)) < 1e-3 * max(1.0, ha + ca)


@given(
    lats=st.lists(st.floats(min_value=55.0, max_value=89.5), min_size=2, max_size=12),
    lons=st.lists(st.floats(min_value=-179.0, max_value=179.0), min_size=12, max_size=12),
    plat=st.floats(min_value=55.0, max_value=89.5),
    plon=st.floats(min_value=-179.0, max_value=179.0),
)
@settings(max_examples=60, deadline=None)
def test_nearest_exact_at_high_latitude(lats, lons, plat, plon):
    """LocalIndex.nearest must equal the argmin of exact distances even
    at high latitude, where meters-per-degree-longitude collapses (the
    r01 85 km/deg pruning bound broke above ~40 deg)."""
    from mundipy_spark.feature import LocalIndex

    pts = [(lons[i], lats[i % len(lats)]) for i in range(len(lons))]
    rows = [
        (wkb.dumps(("Point", np.array([x, y]))), {"i": i})
        for i, (x, y) in enumerate(pts)
    ]
    ix = LocalIndex(rows)
    probe = ("Point", np.array([plon, plat]))
    got = ix.nearest(probe)
    dists = [measure.geom_distance_m(("Point", np.array([x, y])), probe) for x, y in pts]
    best = int(np.argmin(dists))
    assert got is not None
    # accept exact argmin or an equidistant twin (float ties)
    assert abs(dists[got["i"]] - dists[best]) <= 1e-6 * max(dists[best], 1.0)
