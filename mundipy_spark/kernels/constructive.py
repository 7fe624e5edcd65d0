"""Constructive geometry ops: buffer, centroid, hulls, simplify, envelope.

Mirrors the reference's constructive surface (TRANSFORM_INPUT|RETURN_GEO
group, mundipy/geometry.py:83-87,109,121,135,146): each `*_m` op projects
to a deterministic local PCS, constructs in meters, and projects back —
the same sandwich the reference does through pyproj.

Buffer strategy (no GEOS): exact round buffers for points (regular
polygon approximating the circle, default 8 segments per quadrant like
shapely); capsule-union outlines for lines; ring offset with round joins
for polygons. Offsets of concave rings can self-intersect — downstream
point-in-polygon uses the even-odd rule, which is tolerant of that by
construction (see kernels.predicates docstring).
"""

from __future__ import annotations

import numpy as np

from mundipy_spark.kernels import measure, predicates, proj, wkb

QUAD_SEGS = 8  # shapely's default resolution


# --- centroid ---------------------------------------------------------------


def centroid_planar(geom) -> np.ndarray:
    """Area-weighted centroid for polygons; length-weighted for lines;
    mean for points."""
    t = geom[0]
    if predicates.has_area(geom):
        cx = cy = a_sum = 0.0
        for rings in predicates._polygons_of(geom):
            for i, ring in enumerate(rings):
                r = np.asarray(ring, dtype=np.float64)
                x, y = r[:, 0], r[:, 1]
                x2, y2 = np.roll(x, -1), np.roll(y, -1)
                cross = x * y2 - x2 * y
                a = cross.sum() / 2.0
                sign = 1.0 if i == 0 else -1.0
                a = abs(a) * sign
                if abs(cross.sum()) < 1e-300:
                    continue
                # use the signed formula but normalize orientation
                ca = cross.sum() / 2.0
                gx = ((x + x2) * cross).sum() / (6.0 * ca)
                gy = ((y + y2) * cross).sum() / (6.0 * ca)
                cx += gx * a
                cy += gy * a
                a_sum += a
        if a_sum != 0:
            return np.array([cx / a_sum, cy / a_sum])
    segs = predicates.geom_segments(geom)
    if len(segs):
        mx = (segs[:, 0] + segs[:, 2]) / 2.0
        my = (segs[:, 1] + segs[:, 3]) / 2.0
        w = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1])
        if w.sum() > 0:
            return np.array([(mx * w).sum() / w.sum(), (my * w).sum() / w.sum()])
    v = predicates.geom_vertices(geom)
    return v.mean(axis=0)


def centroid(geom):
    return ("Point", centroid_planar(geom))


# --- envelope / hulls ---------------------------------------------------------


def envelope(geom):
    minx, miny, maxx, maxy = wkb.bounds(geom)
    ring = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
    return ("Polygon", [ring])


def convex_hull(geom):
    """Andrew's monotone chain over all vertices."""
    pts = predicates.geom_vertices(geom)
    pts = np.unique(pts, axis=0)
    if len(pts) == 1:
        return ("Point", pts[0])
    if len(pts) == 2:
        return ("LineString", pts)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out = []
        for p in points:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.asarray(lower[:-1] + upper[:-1] + [lower[0]], dtype=np.float64)
    if len(hull) < 4:
        return ("LineString", hull[:-1])
    return ("Polygon", [hull])


# --- simplify (Douglas-Peucker) ------------------------------------------------


def _dp_mask(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas-Peucker keep-mask."""
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = coords[[i, j]].reshape(1, 4)
        seg = np.array([[coords[i, 0], coords[i, 1], coords[j, 0], coords[j, 1]]])
        mid = coords[i + 1 : j]
        d = predicates.point_segs_min_dist(mid[:, 0], mid[:, 1], seg)
        kmax = int(np.argmax(d))
        if d[kmax] > tol:
            k = i + 1 + kmax
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify(geom, tol: float):
    """Douglas-Peucker (reference: shapely .simplify,
    docs/manual/geometric-operations.mdx:61-65). Tolerance in input units."""
    t, data = geom
    if t in ("Point", "MultiPoint"):
        return geom
    if t == "LineString":
        c = np.asarray(data, dtype=np.float64)
        return (t, c[_dp_mask(c, tol)])
    if t == "MultiLineString":
        return (t, [np.asarray(l)[_dp_mask(np.asarray(l), tol)] for l in data])
    if t == "Polygon":
        return (t, [_simplify_ring(r, tol) for r in data])
    if t == "MultiPolygon":
        return (t, [[_simplify_ring(r, tol) for r in poly] for poly in data])
    if t == "GeometryCollection":
        return (t, [simplify(g, tol) for g in data])
    raise ValueError(t)


def _simplify_ring(ring, tol: float) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    out = r[_dp_mask(r, tol)]
    if len(out) < 4:  # keep the ring valid
        return r
    return out


# --- buffer ---------------------------------------------------------------------


def _circle(cx: float, cy: float, r: float, quad_segs: int = QUAD_SEGS) -> np.ndarray:
    n = 4 * quad_segs
    ang = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def _offset_ring(ring: np.ndarray, dist: float, quad_segs: int = QUAD_SEGS) -> np.ndarray:
    """Offset a closed ring outward by dist with round joins at convex
    corners. Output may self-intersect for concave rings — tolerated by
    even-odd fill downstream."""
    r = np.asarray(ring, dtype=np.float64)
    if np.allclose(r[0], r[-1]):
        r = r[:-1]
    # ensure CCW so 'outward' = left normal flipped consistently
    area = measure.ring_area_planar(np.vstack([r, r[:1]]))
    if area < 0:
        r = r[::-1]
    n = len(r)
    nxt = np.roll(r, -1, axis=0)
    d = nxt - r
    ln = np.hypot(d[:, 0], d[:, 1])
    ln = np.where(ln == 0, 1.0, ln)
    # outward normal of a CCW ring is the right normal (dy, -dx)
    nxv = d[:, 1] / ln
    nyv = -d[:, 0] / ln
    out_pts = []
    for i in range(n):
        j = (i - 1) % n
        # offset edge i start, with a round join from edge j's normal
        a0 = np.arctan2(nyv[j], nxv[j])
        a1 = np.arctan2(nyv[i], nxv[i])
        sweep = (a1 - a0) % (2.0 * np.pi)
        if sweep > 1e-9 and sweep < np.pi:  # convex corner: arc
            steps = max(1, int(np.ceil(sweep / (np.pi / 2.0 / quad_segs))))
            angs = a0 + sweep * np.arange(steps + 1) / steps
            for a in angs:
                out_pts.append(r[i] + dist * np.array([np.cos(a), np.sin(a)]))
        else:  # concave or straight: miter via both offsets
            out_pts.append(r[i] + dist * np.array([nxv[j], nyv[j]]))
            out_pts.append(r[i] + dist * np.array([nxv[i], nyv[i]]))
        out_pts.append(nxt[i] + dist * np.array([nxv[i], nyv[i]]))
    out = np.asarray(out_pts, dtype=np.float64)
    return np.vstack([out, out[:1]])


def buffer_planar(geom, dist: float, quad_segs: int = QUAD_SEGS):
    """Planar buffer. dist==0 returns a normalized copy (the reference's
    `.buffer(0)` hygiene trick, mundipy/mundi.py:68-69)."""
    t, data = geom
    if dist == 0:
        return make_valid(geom)
    if dist < 0:
        if t in ("Polygon", "MultiPolygon"):
            # inward offset: offset rings by -d (coarse; adequate for small d)
            return _map_polys(geom, lambda rings: [_offset_ring(rings[0], dist)] + rings[1:])
        return geom
    if t == "Point":
        return ("Polygon", [_circle(data[0], data[1], dist, quad_segs)])
    if t == "MultiPoint":
        pts = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        return ("MultiPolygon", [[_circle(p[0], p[1], dist, quad_segs)] for p in pts])
    if t in ("LineString", "MultiLineString"):
        lines = [data] if t == "LineString" else list(data)
        polys = []
        for line in lines:
            l = np.asarray(line, dtype=np.float64)
            # capsule chain: one hull per segment (round caps via circles)
            for i in range(len(l) - 1):
                seg_hull = convex_hull(
                    (
                        "MultiPoint",
                        np.vstack(
                            [
                                _circle(l[i, 0], l[i, 1], dist, quad_segs)[:-1],
                                _circle(l[i + 1, 0], l[i + 1, 1], dist, quad_segs)[:-1],
                            ]
                        ),
                    )
                )
                polys.append(seg_hull[1])
        return ("MultiPolygon", polys)
    if t == "Polygon":
        return ("Polygon", [_offset_ring(data[0], dist, quad_segs)] + [
            _offset_ring(h, -dist, quad_segs) for h in data[1:]
        ])
    if t == "MultiPolygon":
        return (
            "MultiPolygon",
            [buffer_planar(("Polygon", poly), dist, quad_segs)[1] for poly in data],
        )
    if t == "GeometryCollection":
        return (t, [buffer_planar(g, dist, quad_segs) for g in data])
    raise ValueError(t)


def _map_polys(geom, fn):
    t, data = geom
    if t == "Polygon":
        return (t, fn(data))
    return (t, [fn(poly) for poly in data])


def buffer_m(geom, dist_m: float, quad_segs: int = QUAD_SEGS):
    """Meters buffer via the local-PCS sandwich (reference semantics:
    buffer is TRANSFORM_INPUT|RETURN_GEO, mundipy/geometry.py:83-87)."""
    minx, miny, maxx, maxy = wkb.bounds(geom)
    pad = max(dist_m / 111_000.0, 1e-9)  # expand bounds so PCS fits result
    name, fwd, inv = proj.local_projection(minx - pad, miny - pad, maxx + pad, maxy + pad)
    g = proj.transform_geom(geom, fwd)
    buffered = buffer_planar(g, dist_m, quad_segs)
    return proj.transform_geom(buffered, inv)


# --- validity ---------------------------------------------------------------------


def is_valid(geom) -> bool:
    """Rings closed, >=4 points, no self-intersections within a ring."""
    for rings in predicates._polygons_of(geom):
        for ring in rings:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) < 4 or not np.allclose(r[0], r[-1]):
                return False
            segs = predicates._ring_segments(r)
            # check non-adjacent segment pairs for intersections
            n = len(segs)
            for i in range(n):
                a = segs[i : i + 1]
                nonadj = [j for j in range(i + 2, n) if not (i == 0 and j == n - 1)]
                if nonadj and predicates.segments_intersect_any(a, segs[nonadj]):
                    return False
    return True


def make_valid(geom):
    """Normalization: close rings, drop degenerate (<3 distinct pts) rings,
    enforce CCW exterior / CW holes. Self-intersections remain (the
    even-odd predicates tolerate them), matching the *effect* of the
    reference's lazy make_valid retry (mundipy/geometry.py:296-320)."""
    t, data = geom
    if t == "Polygon":
        return ("Polygon", _fix_rings(data))
    if t == "MultiPolygon":
        fixed = [_fix_rings(poly) for poly in data]
        fixed = [p for p in fixed if p]
        return ("MultiPolygon", fixed)
    if t == "GeometryCollection":
        return (t, [make_valid(g) for g in data])
    return geom


def _fix_rings(rings):
    out = []
    for i, ring in enumerate(rings):
        r = np.asarray(ring, dtype=np.float64)
        if len(r) and not np.allclose(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        if len(np.unique(r[:-1], axis=0)) < 3:
            continue
        a = measure.ring_area_planar(r)
        want_ccw = i == 0
        if (a < 0) == want_ccw:
            r = r[::-1]
        out.append(r)
    return out
