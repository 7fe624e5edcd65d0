"""Overlay ops: intersection / union / difference (no GEOS).

Reference surface: difference, intersection, symmetric_difference, union
(TRANSFORM_INPUT|RETURN_GEO, mundipy/geometry.py:103,123,150,154).

Two tiers:

1. **Geometry output** — Sutherland–Hodgman clipping when the clip
   operand is convex (covers rect/tile clips, envelope clips, and the
   catchment-style zip-square overlays the tests exercise). The general
   concave-x-concave geometry output is a known round-2 item
   (Greiner–Hormann); callers that only need *measures* use tier 2.

2. **Exact intersection AREA for arbitrary simple polygons** via signed
   fan-triangle decomposition: |A∩B| = Σᵢⱼ sᵢsⱼ·|Tᵢ∩Tⱼ| where Tᵢ,Tⱼ are
   signed fan triangles of A and B — each Tᵢ∩Tⱼ is convex∩convex,
   computed exactly by Sutherland–Hodgman. This powers the
   overlap-weighted aggregation join (reference
   docs/tutorials/catchment-area.mdx:152-160) with no convexity
   assumption. Union/difference areas derive by inclusion–exclusion.
"""

from __future__ import annotations

import numpy as np

from mundipy_spark.kernels import measure, predicates, wkb


def _close(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0:
        return r
    if not np.allclose(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.allclose(r[0], r[-1]):
        return r[:-1]
    return r


def is_convex(ring: np.ndarray) -> bool:
    r = _open(ring)
    if len(r) < 3:
        return False
    nxt = np.roll(r, -1, axis=0)
    nxt2 = np.roll(r, -2, axis=0)
    cross = (nxt[:, 0] - r[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - r[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    return bool((cross >= -1e-12).all() or (cross <= 1e-12).all())


def sutherland_hodgman(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Clip an arbitrary ring against a CONVEX clip ring. Returns the
    clipped ring (open, possibly empty)."""
    clip = _open(clip)
    if measure.ring_area_planar(np.vstack([clip, clip[:1]])) < 0:
        clip = clip[::-1]  # need CCW for inside = left of edge
    out = _open(subject)
    n = len(clip)
    for i in range(n):
        if len(out) == 0:
            break
        a = clip[i]
        b = clip[(i + 1) % n]
        ex, ey = b[0] - a[0], b[1] - a[1]
        inp = out
        m = len(inp)
        prev = np.roll(inp, 1, axis=0)
        side = ex * (inp[:, 1] - a[1]) - ey * (inp[:, 0] - a[0])
        pside = ex * (prev[:, 1] - a[1]) - ey * (prev[:, 0] - a[0])
        new_pts = []
        for k in range(m):
            cur_in = side[k] >= -1e-12
            prev_in = pside[k] >= -1e-12
            if cur_in:
                if not prev_in:
                    new_pts.append(_isect(prev[k], inp[k], a, b))
                new_pts.append(inp[k])
            elif prev_in:
                new_pts.append(_isect(prev[k], inp[k], a, b))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    return out


def _isect(p, q, a, b) -> np.ndarray:
    """Intersection of segment pq with infinite line ab."""
    r = q - p
    s = b - a
    denom = r[0] * s[1] - r[1] * s[0]
    if abs(denom) < 1e-300:
        return p
    t = ((a[0] - p[0]) * s[1] - (a[1] - p[1]) * s[0]) / denom
    return p + t * r


# --- exact intersection area for arbitrary simple polygons -------------------


def _fan_triangles(geom):
    """Signed fan triangles (t0, t1, t2, signed_area) for all rings of a
    (Multi)Polygon. Exterior/hole orientation is whatever the data has —
    the signed shoelace of each triangle carries the sign through, as
    long as holes are wound opposite the exterior (make_valid enforces)."""
    tris = []
    for rings in predicates._polygons_of(geom):
        for ring in rings:
            r = _open(ring)
            if len(r) < 3:
                continue
            v0 = r[0]
            for i in range(1, len(r) - 1):
                t = np.asarray([v0, r[i], r[i + 1]], dtype=np.float64)
                a = 0.5 * (
                    (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                    - (t[1, 1] - t[0, 1]) * (t[2, 0] - t[0, 0])
                )
                if abs(a) > 1e-300:
                    tris.append((t, a))
    return tris


def _tri_tri_area(t1: np.ndarray, t2: np.ndarray) -> float:
    """Unsigned area of the intersection of two triangles (convex∩convex)."""
    # orient both CCW for S-H
    def ccw(t):
        a = (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1]) - (t[1, 1] - t[0, 1]) * (
            t[2, 0] - t[0, 0]
        )
        return t if a >= 0 else t[::-1]

    clipped = sutherland_hodgman(ccw(t1), ccw(t2))
    if len(clipped) < 3:
        return 0.0
    return abs(measure.ring_area_planar(np.vstack([clipped, clipped[:1]])))


def intersection_area_planar(a, b) -> float:
    """Exact |A ∩ B| for arbitrary simple (Multi)Polygons with holes."""
    if predicates.bbox_disjoint(a, b):
        return 0.0
    ta = _fan_triangles(a)
    tb = _fan_triangles(b)
    if not ta or not tb:
        return 0.0
    # vectorized bbox pre-rejection of triangle pairs
    ba = np.array([[t[:, 0].min(), t[:, 1].min(), t[:, 0].max(), t[:, 1].max()] for t, _ in ta])
    bb = np.array([[t[:, 0].min(), t[:, 1].min(), t[:, 0].max(), t[:, 1].max()] for t, _ in tb])
    ok = (
        (ba[:, None, 2] >= bb[None, :, 0])
        & (ba[:, None, 0] <= bb[None, :, 2])
        & (ba[:, None, 3] >= bb[None, :, 1])
        & (ba[:, None, 1] <= bb[None, :, 3])
    )
    total = 0.0
    idx_i, idx_j = np.nonzero(ok)
    for i, j in zip(idx_i.tolist(), idx_j.tolist()):
        t1, s1 = ta[i]
        t2, s2 = tb[j]
        area = _tri_tri_area(t1, t2)
        if area:
            total += np.sign(s1) * np.sign(s2) * area
    return max(total, 0.0)


def union_area_planar(a, b) -> float:
    return (
        measure.geom_area_planar(a)
        + measure.geom_area_planar(b)
        - intersection_area_planar(a, b)
    )


def difference_area_planar(a, b) -> float:
    return max(measure.geom_area_planar(a) - intersection_area_planar(a, b), 0.0)


# --- geometry-output clips ----------------------------------------------------


def clip_convex(geom, clip_ring: np.ndarray):
    """Clip any geometry against a convex ring; polygon rings are clipped
    with Sutherland–Hodgman, lines with per-segment parametric clipping,
    points with PIP. Returns a geometry or None if empty."""
    clip_ring = _open(np.asarray(clip_ring, dtype=np.float64))
    clip_poly = ("Polygon", [_close(clip_ring)])
    t, data = geom
    if t in ("Point", "MultiPoint"):
        pts = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        keep = predicates.points_in_geom(pts[:, 0], pts[:, 1], clip_poly)
        pts = pts[keep]
        if len(pts) == 0:
            return None
        return ("Point", pts[0]) if len(pts) == 1 else ("MultiPoint", pts)
    if t in ("LineString", "MultiLineString"):
        lines = [data] if t == "LineString" else list(data)
        out = []
        for line in lines:
            pieces = _clip_line_convex(np.asarray(line, dtype=np.float64), clip_ring)
            out.extend(pieces)
        if not out:
            return None
        return ("LineString", out[0]) if len(out) == 1 else ("MultiLineString", out)
    if t == "Polygon":
        rings = [sutherland_hodgman(r, clip_ring) for r in data]
        rings = [_close(r) for r in rings if len(r) >= 3]
        if not rings:
            return None
        return ("Polygon", rings)
    if t == "MultiPolygon":
        polys = []
        for poly in data:
            c = clip_convex(("Polygon", poly), clip_ring)
            if c is not None:
                polys.append(c[1])
        if not polys:
            return None
        return ("MultiPolygon", polys)
    if t == "GeometryCollection":
        parts = [clip_convex(g, clip_ring) for g in data]
        parts = [p for p in parts if p is not None]
        return (t, parts) if parts else None
    raise ValueError(t)


def _clip_line_convex(line: np.ndarray, clip_ring: np.ndarray) -> list[np.ndarray]:
    """Clip a polyline to a convex region; returns the kept pieces."""
    clip = _open(clip_ring)
    if measure.ring_area_planar(np.vstack([clip, clip[:1]])) < 0:
        clip = clip[::-1]
    n = len(clip)
    pieces: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(line) - 1):
        p, q = line[i], line[i + 1]
        t0, t1 = 0.0, 1.0
        d = q - p
        ok = True
        for k in range(n):
            a, b = clip[k], clip[(k + 1) % n]
            ex, ey = b[0] - a[0], b[1] - a[1]
            # inside = left of edge: cross >= 0
            fp = ex * (p[1] - a[1]) - ey * (p[0] - a[0])
            fd = ex * d[1] - ey * d[0]
            if abs(fd) < 1e-300:
                if fp < -1e-12:
                    ok = False
                    break
                continue
            t = -fp / fd
            if fd < 0:
                t1 = min(t1, t)
            else:
                t0 = max(t0, t)
            if t0 > t1:
                ok = False
                break
        if not ok:
            if cur:
                pieces.append(cur)
                cur = []
            continue
        s, e = p + t0 * d, p + t1 * d
        if cur and np.allclose(cur[-1], s):
            cur.append(e)
        else:
            if cur:
                pieces.append(cur)
            cur = [s, e]
        if t1 < 1.0:
            pieces.append(cur)
            cur = []
    if cur:
        pieces.append(cur)
    return [np.asarray(p) for p in pieces if len(p) >= 2]


def clip_to_rect(geom, minx: float, miny: float, maxx: float, maxy: float):
    rect = np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]])
    return clip_convex(geom, rect)


def intersection(a, b):
    """Geometry intersection. Exact when either operand's polygons are all
    convex (S-H); general concave×concave geometry output raises — use
    intersection_area_planar for measures (it is exact for all cases)."""
    if predicates.bbox_disjoint(a, b):
        return None
    for clip_src, subject in ((b, a), (a, b)):
        rings = [rings[0] for rings in predicates._polygons_of(clip_src)]
        if (
            rings
            and all(is_convex(r) for r in rings)
            and all(len(rs) == 1 for rs in predicates._polygons_of(clip_src))
        ):
            pieces = []
            for ring in rings:
                c = clip_convex(subject, ring)
                if c is not None:
                    pieces.append(c)
            if not pieces:
                return None
            if len(pieces) == 1:
                return pieces[0]
            return ("GeometryCollection", pieces)
    raise NotImplementedError(
        "concave x concave geometry intersection lands with Greiner-Hormann; "
        "intersection_area_planar is exact for all polygon pairs"
    )
