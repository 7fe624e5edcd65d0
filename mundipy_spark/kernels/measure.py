"""Measures: area / length / distance with meters semantics (no GEOS).

The reference computes every measure after reprojecting operands to an
auto-chosen local PCS (the TRANSFORM_INPUT flag in the dispatch table,
mundipy/geometry.py:14-18,77,105,131). We mirror that: `*_m` functions do
a local-projection sandwich (kernels.proj.local_projection) and measure
planar; `*_planar` variants measure in the input coordinates.
"""

from __future__ import annotations

import numpy as np

from mundipy_spark.kernels import predicates, proj, wkb


# --- planar ----------------------------------------------------------------


def ring_area_planar(ring: np.ndarray) -> float:
    """Signed shoelace area (positive CCW)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    return float(0.5 * np.sum(x * y2 - x2 * y))


def geom_area_planar(geom) -> float:
    """Unsigned polygon area; holes subtract (|exterior| - sum|holes|)."""
    total = 0.0
    for rings in predicates._polygons_of(geom):
        if not rings:
            continue
        total += abs(ring_area_planar(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area_planar(hole))
    return total


def geom_length_planar(geom) -> float:
    segs = predicates.geom_segments(geom)
    if len(segs) == 0:
        return 0.0
    dx = segs[:, 2] - segs[:, 0]
    dy = segs[:, 3] - segs[:, 1]
    return float(np.sqrt(dx * dx + dy * dy).sum())


def geom_distance_planar(a, b) -> float:
    """Min planar distance between two geometries (0 if they intersect)."""
    if predicates.intersects(a, b):
        return 0.0
    best = np.inf
    va = predicates.geom_vertices(a)
    vb = predicates.geom_vertices(b)
    sa = predicates.geom_segments(a)
    sb = predicates.geom_segments(b)
    if len(va) and len(sb):
        best = min(best, float(predicates.point_segs_min_dist(va[:, 0], va[:, 1], sb).min()))
    if len(vb) and len(sa):
        best = min(best, float(predicates.point_segs_min_dist(vb[:, 0], vb[:, 1], sa).min()))
    if len(sa) == 0 and len(sb) == 0:  # point sets
        d = np.sqrt(((va[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2))
        best = min(best, float(d.min()))
    return best


# --- meters (local-PCS sandwich) --------------------------------------------


def _projected(geom, *others, purpose: str = "area"):
    """Project geom (and optionally companions) into a local PCS chosen
    from the union of all operands' bounds (reference
    mundipy/geometry.py:277-292: op-scoped projection choice)."""
    bs = [wkb.bounds(g) for g in (geom, *others)]
    minx = min(b[0] for b in bs)
    miny = min(b[1] for b in bs)
    maxx = max(b[2] for b in bs)
    maxy = max(b[3] for b in bs)
    name, fwd, inv = proj.local_projection(minx, miny, maxx, maxy, purpose=purpose)
    return [proj.transform_geom(g, fwd) for g in (geom, *others)], name, fwd, inv


def geom_area_m2(geom) -> float:
    (g,), _, _, _ = _projected(geom)
    return geom_area_planar(g)


def geom_length_m(geom) -> float:
    (g,), _, _, _ = _projected(geom, purpose="distance")
    return geom_length_planar(g)


def geom_distance_m(a, b) -> float:
    (ga, gb), _, _, _ = _projected(a, b, purpose="distance")
    return geom_distance_planar(ga, gb)


def interpolate_m(geom, dist_m: float):
    """Point at dist_m METERS along a LineString: project into the local
    PCS (distance-purposed), interpolate planar, inverse-project back to
    lon/lat (reference TRANSFORM_INPUT semantics, geometry.py:137)."""
    from mundipy_spark.kernels import constructive

    (g,), _, _, inv = _projected(geom, purpose="distance")
    return proj.transform_geom(constructive.interpolate(g, dist_m), inv)


def line_project_m(geom, other) -> float:
    """Distance in METERS along `geom` of the point nearest `other`
    (shapely `project` through the local-PCS sandwich,
    reference geometry.py:139). For a non-Point `other` the probe is
    the VERTEX of `other` nearest `geom` (vertex-sampled, matching the
    discrete Hausdorff convention) — not the vertex mean, which is an
    arbitrary interior point nowhere near the closest approach."""
    from mundipy_spark.kernels import constructive

    (g, o), _, _, _ = _projected(geom, other, purpose="distance")
    if o[0] == "Point":
        pt = o[1]
    else:
        vo = np.asarray(predicates.geom_vertices(o), dtype=np.float64)
        sg = predicates.geom_segments(g)
        if len(sg):
            d = predicates.point_segs_min_dist(vo[:, 0], vo[:, 1], sg)
        else:
            vg = np.asarray(predicates.geom_vertices(g), dtype=np.float64)
            d = np.sqrt(((vo[:, None, :] - vg[None, :, :]) ** 2).sum(axis=2)).min(axis=1)
        pt = vo[int(np.argmin(d))]
    return constructive.line_project(g, pt)


def minimum_clearance_m(geom) -> float:
    """Minimum clearance in METERS (projected sandwich — the raw-degree
    form silently mixed lat/lon scales, ~1e5x off for callers porting
    reference code)."""
    from mundipy_spark.kernels import constructive

    (g,), _, _, _ = _projected(geom, purpose="distance")
    return constructive.minimum_clearance(g)


def hausdorff_distance_m(a, b) -> float:
    """Discrete (vertex-sampled) Hausdorff distance in meters — matches
    the reference surface (mundipy/geometry.py:117) to vertex precision."""
    (ga, gb), _, _, _ = _projected(a, b, purpose="distance")
    va, vb = predicates.geom_vertices(ga), predicates.geom_vertices(gb)
    sa, sb = predicates.geom_segments(ga), predicates.geom_segments(gb)
    d_ab = (
        predicates.point_segs_min_dist(va[:, 0], va[:, 1], sb)
        if len(sb)
        else np.sqrt(((va[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2)).min(axis=1)
    )
    d_ba = (
        predicates.point_segs_min_dist(vb[:, 0], vb[:, 1], sa)
        if len(sa)
        else np.sqrt(((vb[:, None, :] - va[None, :, :]) ** 2).sum(axis=2)).min(axis=1)
    )
    return float(max(d_ab.max(initial=0.0), d_ba.max(initial=0.0)))
