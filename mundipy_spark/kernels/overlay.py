"""Overlay ops: intersection / union / difference (no GEOS).

Reference surface: difference, intersection, symmetric_difference, union
(TRANSFORM_INPUT|RETURN_GEO, mundipy/geometry.py:103,123,150,154).

Two tiers:

1. **Geometry output** — Sutherland–Hodgman clipping when the clip
   operand is convex (rect/tile clips, envelope clips); Greiner–Hormann
   with degeneracy-perturbation retries for general concave×concave
   pairs without holes (overlay_op below); an even-odd
   segment-arrangement overlay (overlay_eo) for inputs carrying
   interior rings — midpoint parity classification makes holes exact
   with no special cases.

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

from mundipy_spark.kernels import measure, predicates


def _ends_coincide(r: np.ndarray) -> bool:
    # inlined np.allclose(r[0], r[-1]) — allclose dominates kernel
    # profiles when called per-ring in tree unions (it builds ufunc
    # machinery for a 2-element comparison)
    ax, ay = r[0, 0], r[0, 1]
    bx, by = r[-1, 0], r[-1, 1]
    return (
        abs(ax - bx) <= 1e-8 + 1e-5 * abs(bx)
        and abs(ay - by) <= 1e-8 + 1e-5 * abs(by)
    )


def _close(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) == 0:
        return r
    if not _ends_coincide(r):
        r = np.vstack([r, r[:1]])
    return r


def _open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and _ends_coincide(r):
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
    (Multi)Polygon, normalized so that Σ sign(aᵢ)·1_{Tᵢ}(x) equals the
    polygon indicator (+1 inside, holes subtract) REGARDLESS of how each
    ring happens to be wound: the fan's natural winding sum is
    sign(ring_area), so triangles are flipped by desired/natural where
    desired is +1 for exteriors and -1 for holes."""
    tris = []
    for rings in predicates._polygons_of(geom):
        for ridx, ring in enumerate(rings):
            r = _open(ring)
            if len(r) < 3:
                continue
            ring_sign = 1.0 if measure.ring_area_planar(ring) >= 0 else -1.0
            desired = 1.0 if ridx == 0 else -1.0
            factor = desired * ring_sign
            v0 = r[0]
            for i in range(1, len(r) - 1):
                t = np.asarray([v0, r[i], r[i + 1]], dtype=np.float64)
                a = 0.5 * (
                    (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                    - (t[1, 1] - t[0, 1]) * (t[2, 0] - t[0, 0])
                )
                if abs(a) > 1e-300:
                    tris.append((t, factor * a))
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
    """Geometry intersection. Convex clip operands use Sutherland–Hodgman
    directly; the general concave×concave case goes through
    Greiner–Hormann (below)."""
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
    return overlay_op(a, b, "intersection")


# ---------------------------------------------------------------------------
# Greiner–Hormann clipping: boolean ops on arbitrary simple polygons
# ---------------------------------------------------------------------------
#
# Reference surface: difference / intersection / symmetric_difference /
# union return geometries (mundipy/geometry.py:103,123,150,154). The
# classic degenerate cases (vertex-on-edge, collinear overlap) are
# handled by epsilon-perturbation retries — results move by <1e-9 deg
# (~0.1 µm), far below the engine's coordinate fidelity.


class _Degenerate(Exception):
    pass


class _GHNode:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "inter", "entry", "visited")

    def __init__(self, x: float, y: float, inter: bool = False):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.inter = inter
        self.entry = False
        self.visited = False


def _ring_signed_area(ring: np.ndarray) -> float:
    r = _open(ring)
    x, y = r[:, 0], r[:, 1]
    # shoelace on views (no np.roll: two allocations per call dominate
    # tree-union profiles)
    wrap = x[-1] * y[0] - y[-1] * x[0]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(y[:-1], x[1:]) + wrap)


def _ccw(ring: np.ndarray) -> np.ndarray:
    r = _open(np.asarray(ring, dtype=np.float64))
    return r if _ring_signed_area(r) >= 0 else r[::-1]


def _cw(ring: np.ndarray) -> np.ndarray:
    r = _open(np.asarray(ring, dtype=np.float64))
    return r if _ring_signed_area(r) <= 0 else r[::-1]


def _mklist(ring: np.ndarray) -> list[_GHNode]:
    nodes = [_GHNode(float(p[0]), float(p[1])) for p in ring]
    for i, nd in enumerate(nodes):
        nd.nxt = nodes[(i + 1) % len(nodes)]
        nd.prv = nodes[i - 1]
    return nodes

_GH_TOL = 1e-11


def _seg_inter(p1, p2, q1, q2):
    """Proper intersection params (t, u) in (0,1)x(0,1), or None;
    raises _Degenerate on touching/collinear configurations."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    denom = rx * sy - ry * sx
    qpx, qpy = q1[0] - p1[0], q1[1] - p1[1]
    if abs(denom) < 1e-18:
        # parallel: degenerate only if collinear AND overlapping
        cross = qpx * ry - qpy * rx
        if abs(cross) < 1e-15:
            t0 = (qpx * rx + qpy * ry) / max(rx * rx + ry * ry, 1e-30)
            t1 = t0 + (sx * rx + sy * ry) / max(rx * rx + ry * ry, 1e-30)
            lo, hi = min(t0, t1), max(t0, t1)
            if hi > _GH_TOL and lo < 1 - _GH_TOL:
                raise _Degenerate("collinear overlap")
        return None
    t = (qpx * sy - qpy * sx) / denom
    u = (qpx * ry - qpy * rx) / denom
    if -_GH_TOL <= t <= 1 + _GH_TOL and -_GH_TOL <= u <= 1 + _GH_TOL:
        near_end = (
            t < _GH_TOL or t > 1 - _GH_TOL or u < _GH_TOL or u > 1 - _GH_TOL
        )
        if near_end:
            raise _Degenerate("endpoint touch")
        return t, u
    return None


def _point_in_ring(x: float, y: float, ring: np.ndarray) -> bool:
    return bool(predicates.crossings_in_ring(np.array([x]), np.array([y]), ring)[0])


def _gh_rings(subj: np.ndarray, clip: np.ndarray, op: str) -> list[np.ndarray] | None:
    """Core GH on two CCW simple rings. Returns result rings, or None
    when the rings don't cross (caller handles containment cases)."""
    s_nodes = _mklist(subj)
    c_nodes = _mklist(clip)

    # find crossings per (subject edge, clip edge); insert sorted by t
    s_ins: dict[int, list] = {}
    c_ins: dict[int, list] = {}
    found = False
    for i in range(len(subj)):
        p1, p2 = subj[i], subj[(i + 1) % len(subj)]
        for j in range(len(clip)):
            q1, q2 = clip[j], clip[(j + 1) % len(clip)]
            r = _seg_inter(p1, p2, q1, q2)
            if r is None:
                continue
            t, u = r
            x = p1[0] + t * (p2[0] - p1[0])
            y = p1[1] + t * (p2[1] - p1[1])
            a = _GHNode(x, y, inter=True)
            b = _GHNode(x, y, inter=True)
            a.neighbor, b.neighbor = b, a
            s_ins.setdefault(i, []).append((t, a))
            c_ins.setdefault(j, []).append((u, b))
            found = True
    if not found:
        return None

    def insert(nodes, ins):
        for i, lst in ins.items():
            lst.sort(key=lambda p: p[0])
            cur = nodes[i]
            for _, nd in lst:
                nd.nxt = cur.nxt
                nd.prv = cur
                cur.nxt.prv = nd
                cur.nxt = nd
                cur = nd

    insert(s_nodes, s_ins)
    insert(c_nodes, c_ins)

    # entry/exit marking; op controls inversion (GH variants):
    #   intersection: neither inverted; union: both; A\B: subject only
    inv_s = op in ("union", "difference")
    inv_c = op == "union"

    def mark(nodes, other_ring, invert):
        entry = not _point_in_ring(nodes[0].x, nodes[0].y, other_ring)
        if invert:
            entry = not entry
        cur = nodes[0]
        while True:
            if cur.inter:
                cur.entry = entry
                entry = not entry
            cur = cur.nxt
            if cur is nodes[0]:
                break

    mark(s_nodes, clip, inv_s)
    mark(c_nodes, subj, inv_c)

    # traversal
    results = []
    def next_unvisited():
        cur = s_nodes[0]
        while True:
            if cur.inter and not cur.visited:
                return cur
            cur = cur.nxt
            if cur is s_nodes[0]:
                return None

    start = next_unvisited()
    guard = 0
    while start is not None:
        pts = [(start.x, start.y)]
        cur = start
        cur.visited = True
        cur.neighbor.visited = True
        while True:
            guard += 1
            if guard > 100000:
                raise _Degenerate("traversal did not close")
            if cur.entry:
                while True:
                    cur = cur.nxt
                    if cur.inter:
                        break
                    pts.append((cur.x, cur.y))
            else:
                while True:
                    cur = cur.prv
                    if cur.inter:
                        break
                    pts.append((cur.x, cur.y))
            cur.visited = True
            cur.neighbor.visited = True
            cur = cur.neighbor
            if cur is start or cur.neighbor is start:
                break
            pts.append((cur.x, cur.y))
        if len(pts) >= 3:
            results.append(np.asarray(pts, dtype=np.float64))
        start = next_unvisited()
    return results


def _outer_rings(geom) -> list[np.ndarray]:
    return [_ccw(rings[0]) for rings in predicates._polygons_of(geom) if rings]


def _ring_interior_point(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside a simple ring (midpoint of the widest
    interior interval of a scanline through a vertex band) — ring
    VERTICES can lie on other rings' boundaries (shared GH intersection
    nodes), so nesting tests must not use them.

    Tries several scanlines: a single mid-extent line can run through a
    zero-width part of a self-touching ring (GH difference output can
    pinch to a point), where the interval test degenerates. The vertex
    mean is a LAST resort only — for a two-lobe pinched ring it can lie
    outside the ring entirely (observed flipping a containment probe)."""
    ys = ring[:, 1]
    ymin, ymax = float(ys.min()), float(ys.max())
    span = ymax - ymin
    x1, y1 = ring[:, 0], ring[:, 1]
    x2 = np.concatenate((x1[1:], x1[:1]))
    y2 = np.concatenate((y1[1:], y1[:1]))
    best = None  # (width, x, y) — keep the GLOBALLY widest interval: a
    # pinched ring's zero-width arm yields a technically-interior point
    # whose side against another ring is arbitrary; the fattest lobe's
    # midpoint is the representative one. Early-exit once an interval is
    # far above perturbation-arm scale (arms are <= ~1e-6 * extent): the
    # single-scanline cost is what tree unions pay per nesting probe.
    xspan = float(ring[:, 0].max() - ring[:, 0].min())
    fat = 1e-4 * max(xspan, span)
    for frac in (0.5, 0.381966, 0.618034, 0.145898, 0.854102, 0.271286):
        y = ymin + span * frac
        if np.any(ys == y):  # avoid scanning exactly through a vertex
            y += span * 1e-7 + 1e-12
        hit = (y1 > y) != (y2 > y)
        if not hit.any():
            continue
        xs = np.sort(
            (x2[hit] - x1[hit]) * (y - y1[hit]) / (y2[hit] - y1[hit]) + x1[hit]
        )
        if len(xs) >= 2 and len(xs) % 2 == 0:
            widths = xs[1::2] - xs[0::2]  # inside intervals by even-odd
            i = int(np.argmax(widths))
            if widths[i] > 0 and (best is None or widths[i] > best[0]):
                best = (
                    float(widths[i]),
                    float((xs[2 * i] + xs[2 * i + 1]) / 2.0),
                    float(y),
                )
                if best[0] >= fat:
                    return best[1], best[2]
    if best is not None:
        return best[1], best[2]
    return float(ring[:, 0].mean()), float(ring[:, 1].mean())


def _nest_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Group loose rings into [outer, *holes] polygons by containment
    nesting (one level). GH traversal emits rings in whatever direction
    the entry/exit walk took — orientation is NOT semantic in its output
    (a CW "outer" of a perturbed difference is a real area piece; a
    pinched-donut difference splits into an outer lobe plus a HOLE lobe,
    both as plain rings). Role is decided purely by containment;
    orientation is then NORMALIZED to the interior-left convention
    (outers CCW, holes CW) every downstream consumer assumes."""
    order = sorted(range(len(rings)), key=lambda i: -abs(_ring_signed_area(rings[i])))
    polys: list[list[np.ndarray]] = []
    for i in order:
        r = rings[i]
        px, py = _ring_interior_point(r)
        for p in polys:
            if _point_in_ring(px, py, p[0]):
                p.append(_cw(r))  # hole of that outer (one-level nesting)
                break
        else:
            polys.append([_ccw(r)])
    return polys


def _rings_to_geom(rings: list[np.ndarray]):
    """Assemble GH output rings into (Multi)Polygons with hole NESTING:
    union (and some concave intersections) legitimately emit rings that
    lie INSIDE another result ring — those are holes (an enclosed void
    between two interlocking shapes), not extra area."""
    rings = [r for r in rings if len(r) >= 3 and abs(_ring_signed_area(r)) > 1e-18]
    if not rings:
        return None
    if len(rings) == 1:
        return ("Polygon", [_close(_ccw(rings[0]))])
    polys = _nest_rings(rings)
    polys = [[_close(x) for x in p] for p in polys]
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _perturb(ring: np.ndarray, k: int) -> np.ndarray:
    if k == 0:
        return ring
    # scale-aware shift; BOTH the direction and the magnitude change per
    # retry. A fixed direction is defeated by any input edge that happens
    # to be near-parallel to it (the translation then slides a shared-
    # vertex crossing ALONG the edge, leaving its transversal parameter
    # within _GH_TOL of the endpoint forever — found by hypothesis on a
    # heptagon whose edge slope matched the old fixed -tan(22.5°) shift
    # to 4e-4). Golden-angle rotation guarantees the retries are spread
    # so no single edge direction can stay near-parallel to all of them.
    ext = max(float(ring.max() - ring.min()), 1.0)
    eps = ext * 1e-9 * (3 ** (k - 1))
    theta = 0.5604870951 + k * 2.399963229728653  # golden angle (rad)
    return ring + np.array([[eps * np.cos(theta), eps * np.sin(theta)]])


def _ring_ext(ring: np.ndarray) -> float:
    return max(
        float(ring[:, 0].max() - ring[:, 0].min()),
        float(ring[:, 1].max() - ring[:, 1].min()),
        1e-30,
    )


def _clean_ring(r: np.ndarray, tol: float) -> np.ndarray:
    """Collapse consecutive near-duplicate vertices and zero-width
    backtrack spikes (prev == next) from a GH output ring. Traversal
    over a perturbed shared-edge chain emits both: repeated intersection
    nodes and pinched spikes a sliver wide, which (a) create zero-length
    segments that destabilize later _seg_inter calls and (b) make the
    interior-point probe meaningless. Area is preserved to O(tol * perimeter)."""
    r = _open(np.asarray(r, dtype=np.float64))
    changed = True
    while changed and len(r) >= 3:
        changed = False
        prv = np.concatenate((r[-1:], r[:-1]))
        d = np.hypot(r[:, 0] - prv[:, 0], r[:, 1] - prv[:, 1])
        keep = d > tol
        if not keep.all():
            r = r[keep]
            changed = True
            continue
        nxt = np.concatenate((r[1:], r[:1]))
        spike = np.hypot(nxt[:, 0] - prv[:, 0], nxt[:, 1] - prv[:, 1]) <= tol
        if spike.any():
            r = r[~spike]
            changed = True
    return r


def _split_pinches(ring: np.ndarray, tol: float) -> list[np.ndarray]:
    """Split a self-touching ring at near-duplicate vertex REVISITS into
    separate lobes. GH traversal over a perturbed shared-edge chain can
    emit one ring that runs out along a sliver arm and back (two real
    lobes joined by a zero-width arm, or a lobe plus a sliver): the arm
    width is eps/sin(theta), unbounded for chains oblique to the shift,
    so no consecutive-vertex tolerance can despike it reliably. Splitting
    at the revisit is area-exact regardless of arm width: signed areas of
    the lobes sum to the original ring's. Candidate revisits are found by
    4 shifted tol-grids (guaranteeing any pair within tol shares a cell in
    one of them), so the common no-pinch case stays near-linear."""
    if tol <= 0.0 or len(ring) < 6:
        return [ring]
    out: list[np.ndarray] = []
    stack = [ring]
    cell = 4.0 * tol
    while stack:
        r = stack.pop()
        n = len(r)
        pair = None
        if n >= 6:
            # grid in ring-local coordinates: r/cell for a small-extent
            # ring far from the origin (web-mercator magnitudes with a
            # tol ~ ext*1e-12 cell) overflows the int64 cast; r - min is
            # bounded by extent/cell, and cell equality is translation-
            # invariant so the detection is unchanged
            rl = r - r.min(axis=0)
            for ox, oy in ((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5)):
                q = np.floor(rl / cell + (ox, oy)).astype(np.int64)
                # vectorized duplicate-cell detection (the common
                # no-pinch case must stay numpy-only: this runs on every
                # pair op of a tree union)
                key = (q[:, 0] << np.int64(32)) ^ (q[:, 1] & np.int64(0xFFFFFFFF))
                _, inv, counts = np.unique(
                    key, return_inverse=True, return_counts=True
                )
                if (counts > 1).any():
                    for ci in np.where(counts > 1)[0]:
                        idxs = np.where(inv == ci)[0]
                        for u in range(len(idxs)):
                            for v in range(u + 1, len(idxs)):
                                j, idx = int(idxs[u]), int(idxs[v])
                                if (
                                    np.hypot(
                                        r[idx, 0] - r[j, 0], r[idx, 1] - r[j, 1]
                                    )
                                    <= tol
                                ):
                                    pair = (j, idx)
                                    break
                            if pair:
                                break
                        if pair:
                            break
                if pair:
                    break
        if pair is None:
            out.append(r)
            continue
        p, qi = pair
        for sub in (r[p:qi], np.vstack([r[qi:], r[:p]])):
            if len(sub) >= 3:
                stack.append(sub)
    return out


def _pair_op(a_ring: np.ndarray, b_ring: np.ndarray, op: str) -> list[np.ndarray]:
    """GH with degeneracy-perturbation retries; containment/disjoint
    fast paths when the rings don't cross.

    Degenerate-input guard: a ring whose area is at the float-noise /
    collinear level relative to its own extent is treated as EMPTY —
    GH's entry/exit marking assumes a ring with an interior, and feeding
    it a zero-width ring returns the COMPLEMENT (observed: difference of
    a two-vertex sliver minus C returned all of C, doubling unions).

    Perturbation-noise culling: when a retry k>=1 resolved the pair, any
    output ring with area below the noise floor of THAT perturbation
    (sliver width ~ ext*1e-9*3^(k-1) times perimeter-scale length) is an
    artifact of the shift, not geometry — emitting it poisons downstream
    stages that feed pieces back through GH (the multi-part union /
    difference piece loops)."""
    area_a, area_b = abs(_ring_signed_area(a_ring)), abs(_ring_signed_area(b_ring))
    a_empty = area_a < _ring_ext(a_ring) ** 2 * 1e-13 or len(a_ring) < 3
    b_empty = area_b < _ring_ext(b_ring) ** 2 * 1e-13 or len(b_ring) < 3
    if a_empty or b_empty:
        if op == "intersection":
            return []
        if op == "difference":
            return [] if a_empty else [a_ring]
        if op == "union":
            out = []
            if not a_empty:
                out.append(a_ring)
            if not b_empty:
                out.append(b_ring)
            return out
        raise ValueError(op)
    res = None
    for k in range(5):
        try:
            res = _gh_rings(a_ring, _perturb(b_ring, k), op)
            break
        except _Degenerate:
            continue
    else:
        raise _Degenerate("unresolvable degeneracy after perturbation")
    if res is not None:
        if res:
            ext = max(_ring_ext(a_ring), _ring_ext(b_ring))
            # dedupe/despike at the perturbation scale of the retry that
            # resolved the pair (float-noise scale when k == 0); 8x the
            # shift magnitude because a pinch across a chain OBLIQUE to
            # the shift direction is eps/sin(theta) wide, not eps
            tol = ext * (1e-12 if k == 0 else 8e-9 * (3 ** (k - 1)))
            floor = 0.0 if k == 0 else 8.0 * ext * ext * 1e-9 * (3 ** (k - 1))
            cleaned = []
            for r in res:
                r = _clean_ring(r, tol)
                if len(r) < 3:
                    continue
                for sub in _split_pinches(r, tol):
                    sub = _clean_ring(sub, tol)
                    if len(sub) >= 3 and abs(_ring_signed_area(sub)) > floor:
                        cleaned.append(sub)
            res = cleaned
        return res
    # no crossings: disjoint, touching, or one ring contains the other.
    # Bbox-disjoint pairs (the common case in tree unions over sparse
    # layers) resolve without any probes; otherwise probe with STRICT
    # interior points (a boundary vertex of a touching ring gives
    # arbitrary parity and misreads edge-adjacency as containment),
    # guarded by area: only the smaller ring can be the contained one.
    if (
        a_ring[:, 0].min() > b_ring[:, 0].max()
        or a_ring[:, 0].max() < b_ring[:, 0].min()
        or a_ring[:, 1].min() > b_ring[:, 1].max()
        or a_ring[:, 1].max() < b_ring[:, 1].min()
    ):
        a_in_b = b_in_a = False
    else:
        area_a = abs(_ring_signed_area(a_ring))
        area_b = abs(_ring_signed_area(b_ring))
        a_in_b = area_a <= area_b and _point_in_ring(
            *_ring_interior_point(a_ring), b_ring
        )
        b_in_a = (not a_in_b) and area_b <= area_a and _point_in_ring(
            *_ring_interior_point(b_ring), a_ring
        )
    if op == "intersection":
        if a_in_b:
            return [a_ring]
        if b_in_a:
            return [b_ring]
        return []
    if op == "union":
        if a_in_b:
            return [b_ring]
        if b_in_a:
            return [a_ring]
        return [a_ring, b_ring]
    if op == "difference":
        if a_in_b:
            return []
        if b_in_a:
            # a with hole b: encode hole as CW ring appended to a's poly
            return [("HOLE", a_ring, b_ring)]  # handled by caller
        return [a_ring]
    raise ValueError(op)


# ---------------------------------------------------------------------------
# even-odd segment-arrangement overlay: the general path for inputs WITH
# interior rings (holes). Rings are oriented interior-left (outers CCW,
# holes CW); every boundary sub-segment is classified by even-odd parity
# of its midpoint against the OTHER operand's full ring set, so holes
# need no special cases anywhere. Degeneracies (shared edges, vertex
# touches) go through the same perturbation-retry hammer as GH.
# ---------------------------------------------------------------------------


def _rings_interior_left(geom) -> list[np.ndarray]:
    """All rings of a (Multi)Polygon, open, oriented interior-left:
    outer rings CCW, hole rings CW."""
    out = []
    for rings in predicates._polygons_of(geom):
        for i, r in enumerate(rings):
            rr = _open(np.asarray(r, dtype=np.float64))
            if len(rr) < 3 or abs(_ring_signed_area(rr)) <= 1e-18:
                continue
            ccw = _ring_signed_area(rr) > 0
            want_ccw = i == 0
            out.append(rr if ccw == want_ccw else rr[::-1])
    return out


def _ring_segs(rings: list[np.ndarray]) -> np.ndarray:
    """(n, 4) directed segments [x1 y1 x2 y2] of all rings."""
    parts = []
    for r in rings:
        nxt = np.roll(r, -1, axis=0)
        parts.append(np.hstack([r, nxt]))
    return np.vstack(parts) if parts else np.empty((0, 4))


def _split_at_crossings(sa: np.ndarray, sb: np.ndarray, tol: float):
    """Split every segment of sa (resp. sb) at its proper crossings with
    sb (resp. sa). Near-degenerate contact (endpoint-on-segment,
    collinear overlap) raises _Degenerate for the perturb-retry loop.
    Both sides of a crossing reuse the SAME computed point coordinates,
    so the stitcher's quantized keys match bit-for-bit even for
    near-parallel (ill-conditioned) crossings.
    Returns (sub_a, sub_b) arrays of (n, 4)."""
    p = sa[:, None, 0:2]
    r = (sa[:, 2:4] - sa[:, 0:2])[:, None, :]
    q = sb[None, :, 0:2]
    s = (sb[:, 2:4] - sb[:, 0:2])[None, :, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q - p
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]) / denom
        u = (qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]) / denom
    ok = (np.abs(denom) > 1e-300) & (t > -tol) & (t < 1 + tol) & (u > -tol) & (u < 1 + tol)
    # a crossing EXACTLY at a segment endpoint is regular geometry, not
    # degeneracy: vertex-vertex contact (identical/shared rings meeting
    # at their common vertices) needs no cut at all, and a T-contact
    # (one operand's vertex ON the other's edge interior) cuts only the
    # crossed side — at the toucher's EXACT endpoint coordinate, so the
    # stitcher's keys and the coincident-chunk dedup match bit-for-bit.
    # Perturb-retrying these never converges for coincident boundary
    # chains: every retry offsets the twin rings by eps and re-creates
    # the contact eps away from the endpoint.
    # All endpoint-contact classification below touches only the `ok`
    # entries, so it runs on the SPARSE crossing set — dense n*m mask
    # algebra here tripled the kernel's hot-path cost (measured ~+25%
    # end-to-end on the overlay bench trio after the session-8
    # hardening; this sparse rewrite restores it, bit-identically).
    e_at = 1e-13
    t_end = 3e-9
    cuts_a: dict[int, list] = {}
    cuts_b: dict[int, list] = {}
    oi, oj = np.nonzero(ok)
    if oi.size:
        tv, uv = t[oi, oj], u[oi, oj]
        at_t0, at_t1 = np.abs(tv) <= e_at, np.abs(1 - tv) <= e_at
        at_u0, at_u1 = np.abs(uv) <= e_at, np.abs(1 - uv) <= e_at
        at_t, at_u = at_t0 | at_t1, at_u0 | at_u1
        # endpoint-contact threshold is WIDER than the inclusion window:
        # crossings NEAR (not at) an endpoint spawn micro sub-segments
        # whose quantized stitch keys and side probes are unreliable —
        # degenerate, resolved by the perturbation retry
        t_near = (np.abs(tv) < t_end) | (np.abs(1 - tv) < t_end)
        u_near = (np.abs(uv) < t_end) | (np.abs(1 - uv) < t_end)
        if (~(at_t | at_u) & (t_near | u_near)).any():
            raise _Degenerate("crossing at segment endpoint")
        # ... and a crossing AT one side's endpoint but NEAR
        # (micro-offset from) the other's is the classic almost-T
        # degeneracy: still retry
        if (at_t & ~at_u & u_near).any():
            raise _Degenerate(
                "T-contact within micro tolerance of an endpoint"
            )
        if (at_u & ~at_t & t_near).any():
            raise _Degenerate(
                "T-contact within micro tolerance of an endpoint"
            )

        # vertex-vertex contacts (at_t & at_u): no cut on either side
        cut_both = ~at_t & ~at_u
        ii, jj = oi[cut_both], oj[cut_both]
        tt, uu = tv[cut_both], uv[cut_both]
        cx = sa[ii, 0] + tt * (sa[ii, 2] - sa[ii, 0])
        cy = sa[ii, 1] + tt * (sa[ii, 3] - sa[ii, 1])
        for m in range(len(ii)):
            cuts_a.setdefault(int(ii[m]), []).append((tt[m], cx[m], cy[m]))
            cuts_b.setdefault(int(jj[m]), []).append((uu[m], cx[m], cy[m]))
        # T-contacts: cut the crossed side at the toucher's exact
        # endpoint
        for m in np.nonzero(at_t & ~at_u)[0]:
            i, j = int(oi[m]), int(oj[m])
            ex, ey = (
                (sa[i, 0], sa[i, 1]) if at_t0[m] else (sa[i, 2], sa[i, 3])
            )
            cuts_b.setdefault(j, []).append(
                (float(uv[m]), float(ex), float(ey))
            )
        for m in np.nonzero(at_u & ~at_t)[0]:
            i, j = int(oi[m]), int(oj[m])
            ex, ey = (
                (sb[j, 0], sb[j, 1]) if at_u0[m] else (sb[j, 2], sb[j, 3])
            )
            cuts_a.setdefault(i, []).append(
                (float(tv[m]), float(ex), float(ey))
            )

    # COINCIDENT (collinear, overlapping) pairs: identical outer rings,
    # or a piece of a previous overlay re-composed against an operand it
    # shares boundary chains with. These are exactly parallel (denom=0),
    # so the crossing machinery above never sees them and no degeneracy
    # is raised — yet BOTH copies of the shared chain would pass the
    # side-probe keep test and emit the result boundary twice (observed:
    # union(holed-A, A) returned 2x|A|). Split each segment at the
    # other's endpoint projections (reusing the other's EXACT endpoint
    # coords, so the overlap chunks match bit-for-bit 1:1) and report
    # the pairs; the caller drops the b-side twin of every matched chunk.
    ra_v = sa[:, 2:4] - sa[:, 0:2]
    sb_v = sb[:, 2:4] - sb[:, 0:2]
    la1 = np.hypot(ra_v[:, 0], ra_v[:, 1])
    lb1 = np.hypot(sb_v[:, 0], sb_v[:, 1])
    # `par` is the ONLY remaining dense mask (one compare over the
    # n*m denominators already in hand); everything past it gathers
    # the parallel index set — empty for generic orientations, ~half
    # the matrix for rectilinear layers, never more dense work than
    # the pre-hardening kernel did.
    par = np.abs(denom) <= la1[:, None] * lb1[None, :] * 1e-12
    pi, pj = np.nonzero(par)
    if pi.size:
        qp_s = qp[pi, pj]
        r_s = ra_v[pi]
        s_s = sb_v[pj]
        qp2_s = qp_s + s_s  # sb end relative to sa start
        cross0 = qp_s[:, 0] * r_s[:, 1] - qp_s[:, 1] * r_s[:, 0]
        cross1 = qp2_s[:, 0] * r_s[:, 1] - qp2_s[:, 1] * r_s[:, 0]
        la_s = la1[pi]
        ctol = np.maximum(la_s, lb1[pj]) * 1e-12
        coll = (np.abs(cross0) <= la_s * ctol) & (
            np.abs(cross1) <= la_s * ctol
        )
        if coll.any():
            rr = np.maximum((r_s * r_s).sum(1), 1e-300)
            t0 = (qp_s * r_s).sum(-1) / rr
            t1 = (qp2_s * r_s).sum(-1) / rr
            lo = np.minimum(t0, t1)
            hi = np.maximum(t0, t1)
            ovl = coll & (np.minimum(hi, 1.0) - np.maximum(lo, 0.0) > 1e-9)
            for m in np.nonzero(ovl)[0]:
                i, j = int(pi[m]), int(pj[m])
                for tv_, ex, ey in (
                    (t0[m], sb[j, 0], sb[j, 1]),
                    (t1[m], sb[j, 2], sb[j, 3]),
                ):
                    if 1e-9 < tv_ < 1 - 1e-9:
                        cuts_a.setdefault(i, []).append(
                            (float(tv_), float(ex), float(ey))
                        )
                bb = max(float((sb_v[j] * sb_v[j]).sum()), 1e-300)
                for px_, py_ in ((sa[i, 0], sa[i, 1]), (sa[i, 2], sa[i, 3])):
                    uv_ = (
                        (px_ - sb[j, 0]) * sb_v[j, 0]
                        + (py_ - sb[j, 1]) * sb_v[j, 1]
                    ) / bb
                    if 1e-9 < uv_ < 1 - 1e-9:
                        cuts_b.setdefault(j, []).append(
                            (float(uv_), float(px_), float(py_))
                        )

    def split(segs, cuts):
        out = []
        for i in range(len(segs)):
            x1, y1, x2, y2 = segs[i]
            cs = cuts.get(i)
            if not cs:
                out.append((x1, y1, x2, y2))
                continue
            pts = [(x1, y1)] + [(x, y) for _, x, y in sorted(cs)] + [(x2, y2)]
            for j in range(len(pts) - 1):
                out.append((*pts[j], *pts[j + 1]))
        return np.asarray(out)

    return split(sa, cuts_a), split(sb, cuts_b)


def _inside_even_odd(xs: np.ndarray, ys: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    inside = np.zeros(len(xs), dtype=bool)
    for r in rings:
        inside ^= predicates.crossings_in_ring(xs, ys, r)
    return inside


def _stitch(segs: list[tuple], join_tol: float) -> list[np.ndarray]:
    """Chain directed segments end-to-start into closed rings by
    NEAREST-start matching within join_tol. In exact arithmetic the
    kept set forms closed loops; in floats the same junction point gets
    several renditions (computed from different segment pairs, or from
    near-coincident twin boundaries), so exact-key matching is too
    brittle — the nearest unused start within join_tol is the right
    continuation, and a miss is a degeneracy -> perturb-retry."""
    from collections import defaultdict

    cell = join_tol

    def key(x, y):
        return (int(np.floor(x / cell)), int(np.floor(y / cell)))

    buckets: dict = defaultdict(list)
    for i, (x1, y1, x2, y2) in enumerate(segs):
        buckets[key(x1, y1)].append(i)
    used = [False] * len(segs)

    def next_from(x, y, exclude=-1):
        kx, ky = key(x, y)
        best, best_d = -1, join_tol
        for ddx in (-1, 0, 1):
            for ddy in (-1, 0, 1):
                for j in buckets.get((kx + ddx, ky + ddy), ()):
                    if used[j] or j == exclude:
                        continue
                    d = float(np.hypot(segs[j][0] - x, segs[j][1] - y))
                    if d < best_d:
                        best, best_d = j, d
        return best

    rings = []
    for start in range(len(segs)):
        if used[start]:
            continue
        pts = []
        cur = start
        x0, y0 = segs[start][0], segs[start][1]
        guard = 0
        while True:
            guard += 1
            if guard > len(segs) + 1:
                raise _Degenerate("stitch did not close")
            used[cur] = True
            x1, y1, x2, y2 = segs[cur]
            pts.append((x1, y1))
            if np.hypot(x2 - x0, y2 - y0) < join_tol:
                break
            nxt = next_from(x2, y2)
            if nxt < 0:
                raise _Degenerate("dangling segment end at stitch")
            cur = nxt
        if len(pts) >= 3:
            rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def _nest_signed_rings(rings: list[np.ndarray]):
    """Assemble interior-left rings (CCW outer / CW hole, as produced by
    the stitcher) into a (Multi)Polygon, assigning each hole to the
    smallest containing outer."""
    outers = [r for r in rings if _ring_signed_area(r) > 0]
    holes = [r for r in rings if _ring_signed_area(r) < 0]
    if not outers:
        return None
    order = sorted(range(len(outers)), key=lambda i: abs(_ring_signed_area(outers[i])))
    polys = [[o] for o in outers]
    for h in holes:
        px, py = _ring_interior_point(h)
        for i in order:  # smallest containing outer wins
            if _point_in_ring(px, py, outers[i]):
                polys[i].append(h)
                break
        # a hole outside every outer is a degenerate sliver: drop it
    polys = [[_close(r) for r in p] for p in polys]
    if len(polys) == 1:
        return ("Polygon", polys[0])
    return ("MultiPolygon", polys)


def _overlay_eo_once(a, b, op: str, k: int):
    ra = _rings_interior_left(a)
    # _perturb is a pure translation — winding preserved
    rb = [_perturb(r, k) for r in _rings_interior_left(b)]
    if not ra and not rb:
        return None
    ext = 1.0
    for r in (*ra, *rb):
        ext = max(ext, float(np.abs(r).max()))
    sa, sb = _split_at_crossings(_ring_segs(ra), _ring_segs(rb), 1e-12)
    # drop the b-side copy of every coincident chunk (split 1:1 with
    # exact coordinate reuse above, so unordered-endpoint keys match
    # bit-for-bit): a shared boundary chain must appear in the
    # arrangement ONCE or the kept result boundary is emitted twice.
    # Parity probes are ring-based, so removing the duplicate segment
    # changes nothing about classification.
    if len(sa) and len(sb):
        akeys = {
            tuple(sorted(((s_[0], s_[1]), (s_[2], s_[3])))) for s_ in sa
        }
        keep_b = [
            tuple(sorted(((s_[0], s_[1]), (s_[2], s_[3])))) not in akeys
            for s_ in sb
        ]
        sb = sb[np.asarray(keep_b, dtype=bool)]
    subs = np.vstack([s for s in (sa, sb) if len(s)])
    if len(subs) == 0:
        return None

    # SIDE-PROBE classification: a sub-segment belongs to the result
    # boundary iff exactly one of its two side-neighborhoods is inside
    # the result region. This needs no per-operand keep rules, makes
    # orientation explicit (inside on the left), and — crucially —
    # erases coincident internal boundaries (e.g. the shared cut edges
    # a GH multi-part union carries between its pieces): both sides
    # inside -> dropped.
    mx = (subs[:, 0] + subs[:, 2]) / 2.0
    my = (subs[:, 1] + subs[:, 3]) / 2.0
    dx = subs[:, 2] - subs[:, 0]
    dy = subs[:, 3] - subs[:, 1]
    ln = np.hypot(dx, dy)
    ok = ln > ext * 1e-13
    subs, mx, my, dx, dy, ln = subs[ok], mx[ok], my[ok], dx[ok], dy[ok], ln[ok]
    # probe offset: shrinks with each retry (shallow-angle slivers
    # thinner than the first delta become classifiable) and is bounded
    # per segment by the segment's own length (micro-segments from
    # near-endpoint crossings otherwise probe into their neighbors)
    delta = np.minimum(
        max(ext * 3e-7 / (4.0**k), ext * 5e-11), ln * 0.25
    )
    nxv, nyv = -dy / ln, dx / ln  # left normal
    px = np.concatenate([mx + nxv * delta, mx - nxv * delta])
    py = np.concatenate([my + nyv * delta, my - nyv * delta])
    # probe points must be clear of every boundary for parity to equal
    # the side-neighborhood limit (own segment sits at exactly delta)
    all_segs = np.vstack([s for s in (_ring_segs(ra), _ring_segs(rb)) if len(s)])
    dmin = predicates.point_segs_min_dist(px, py, all_segs)
    dd = np.concatenate([delta, delta])
    if k < 4 and (dmin < dd * 0.35).any():
        # near-boundary probes usually mean a genuine degeneracy worth a
        # perturb-retry; at deep retry levels the remaining offenders are
        # near-PARALLEL twin boundaries (coincident internal edges of a
        # GH multi-part union, offset by float noise) whose parity past
        # the twin is exactly the regularized classification we want —
        # proceed, and let the stitcher catch any real inconsistency
        raise _Degenerate("side probe too close to a boundary")
    in_a = _inside_even_odd(px, py, ra)
    in_b = _inside_even_odd(px, py, rb)
    if op == "intersection":
        in_res = in_a & in_b
    elif op == "union":
        in_res = in_a | in_b
    elif op == "difference":
        in_res = in_a & ~in_b
    else:
        raise ValueError(op)
    n = len(subs)
    left_in, right_in = in_res[:n], in_res[n:]
    keep = left_in != right_in
    kept = []
    for i in np.nonzero(keep)[0]:
        x1, y1, x2, y2 = subs[i]
        # interior on the left
        kept.append((x1, y1, x2, y2) if left_in[i] else (x2, y2, x1, y1))
    if not kept:
        return None
    rings = _stitch(kept, join_tol=ext * 1e-7)
    rings = [
        r for r in rings if abs(_ring_signed_area(r)) > (ext * 1e-10) ** 2
    ]
    return _nest_signed_rings(rings)


def _geom_dim(geom) -> int:
    t = geom[0]
    if t in ("Polygon", "MultiPolygon"):
        return 2
    if t in ("LineString", "MultiLineString"):
        return 1
    if t in ("Point", "MultiPoint"):
        return 0
    if t == "GeometryCollection":
        return max((_geom_dim(g) for g in geom[1]), default=-1)
    return -1


def _clip_lines_to_polygon(geom_line, geom_poly, keep_inside: bool):
    """LineString/MultiLineString clipped against an arbitrary (holed,
    multi-part) polygon: segments split at boundary crossings, midpoint
    even-odd classification, contiguous kept pieces re-chained. The
    line×concave case the convex Sutherland–Hodgman path can't express."""
    rings = _rings_interior_left(geom_poly)
    if not rings:
        return geom_line if not keep_inside else None
    segs_poly = _ring_segs(rings)
    lines = [geom_line[1]] if geom_line[0] == "LineString" else list(geom_line[1])
    for k in range(6):
        try:
            rk = [_perturb(r, k) for r in rings]
            sp = _ring_segs(rk)
            pieces = []
            for line in lines:
                pts = np.asarray(line, dtype=np.float64)
                cur: list[np.ndarray] = []
                for i in range(len(pts) - 1):
                    p, q = pts[i], pts[i + 1]
                    d = q - p
                    # crossing params vs all polygon edges
                    a0 = sp[:, 0:2]
                    e = sp[:, 2:4] - sp[:, 0:2]
                    denom = d[0] * e[:, 1] - d[1] * e[:, 0]
                    qp = a0 - p
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t = (qp[:, 0] * e[:, 1] - qp[:, 1] * e[:, 0]) / denom
                        u = (qp[:, 0] * d[1] - qp[:, 1] * d[0]) / denom
                    ok = (np.abs(denom) > 1e-300) & (t > 1e-12) & (t < 1 - 1e-12) & (
                        u >= 0.0
                    ) & (u <= 1.0)
                    cut = np.sort(t[ok])
                    knots = np.concatenate([[0.0], cut, [1.0]])
                    for j in range(len(knots) - 1):
                        t0, t1 = knots[j], knots[j + 1]
                        if t1 - t0 < 1e-12:
                            continue
                        mid = p + (t0 + t1) / 2.0 * d
                        dmin = predicates.point_segs_min_dist(
                            np.array([mid[0]]), np.array([mid[1]]), sp
                        )[0]
                        ext = max(1.0, float(np.abs(pts).max()))
                        if dmin < ext * 1e-12:
                            raise _Degenerate("line midpoint on boundary")
                        inside = bool(_inside_even_odd(
                            np.array([mid[0]]), np.array([mid[1]]), rk
                        )[0])
                        if inside == keep_inside:
                            s0, s1 = p + t0 * d, p + t1 * d
                            if cur and np.allclose(cur[-1], s0):
                                cur.append(s1)
                            else:
                                if len(cur) >= 2:
                                    pieces.append(np.asarray(cur))
                                cur = [s0, s1]
                        else:
                            if len(cur) >= 2:
                                pieces.append(np.asarray(cur))
                            cur = []
                if len(cur) >= 2:
                    pieces.append(np.asarray(cur))
            if not pieces:
                return None
            if len(pieces) == 1:
                return ("LineString", pieces[0])
            return ("MultiLineString", pieces)
        except _Degenerate:
            continue
    raise _Degenerate("line clip degeneracy unresolved")


def _clip_points_to_polygon(geom_pt, geom_poly, keep_inside: bool):
    pts = np.asarray(geom_pt[1], dtype=np.float64).reshape(-1, 2)
    keep = predicates.points_in_geom(pts[:, 0], pts[:, 1], geom_poly)
    pts = pts[keep if keep_inside else ~keep]
    if len(pts) == 0:
        return None
    return ("Point", pts[0]) if len(pts) == 1 else ("MultiPoint", pts)


def _mixed_dim_op(a, b, op: str):
    """intersection/difference when operand dimensions differ: the
    lower-dimensional operand is clipped by the polygon one (matching
    the reference's shapely dispatch for line x polygon)."""
    da, db = _geom_dim(a), _geom_dim(b)
    if op == "intersection":
        lo, poly = (a, b) if da < db else (b, a)
        if _geom_dim(lo) == 1:
            return _clip_lines_to_polygon(lo, poly, keep_inside=True)
        return _clip_points_to_polygon(lo, poly, keep_inside=True)
    if op == "difference":
        if da < db:  # line/point minus polygon: keep the outside part
            if da == 1:
                return _clip_lines_to_polygon(a, b, keep_inside=False)
            return _clip_points_to_polygon(a, b, keep_inside=False)
        return a  # polygon minus line/point: zero-measure, unchanged
    raise ValueError(f"mixed-dimension {op} not supported")


def _point_line_op(a, b, op: str, da: int):
    """point x line overlays (the reference's shapely engine supports
    these): membership = within 1e-9 of a segment, matching
    predicates.intersects. Zero-measure algebra: a point ON the line
    is absorbed by union, removed by point-minus-line difference, and
    contributes nothing to line-minus-point."""
    pt, line = (a, b) if da == 0 else (b, a)
    pts = np.asarray(pt[1], dtype=np.float64).reshape(-1, 2)
    segs = predicates.geom_segments(line)
    on = (
        predicates.points_on_segments(pts[:, 0], pts[:, 1], segs, 1e-9)
        if len(segs)
        else np.zeros(len(pts), dtype=bool)
    )

    def mk(sel):
        p = pts[sel]
        if len(p) == 0:
            return None
        return ("Point", p[0]) if len(p) == 1 else ("MultiPoint", p)

    if op == "intersection":
        return mk(on)
    if op == "difference":
        # points minus line: survivors off the line; line minus points:
        # removing zero-measure points leaves the line unchanged
        return mk(~on) if da == 0 else a
    # union == symmetric_difference for a zero-measure pair: the line
    # plus whatever points fall outside it (on-line points absorbed /
    # cancelled into the line's interior)
    off = mk(~on)
    if off is None:
        return line
    return ("GeometryCollection", [line, off])


def overlay_eo(a, b, op: str):
    """Boolean overlay via even-odd segment arrangement — the hole-aware
    general path (inputs may be MultiPolygons with interior rings).
    Degeneracies retry with scale-aware perturbation of b, like GH;
    if the whole ladder fails, the operands are ring-normalized
    (closure + CCW-shell/CW-hole orientation — point-set identical
    under even-odd interpretation) and the ladder retried: the
    arrangement's stitch order depends on vertex order, and
    normalization resolves inputs the perturbation alone cannot —
    found by tools/fuzz_campaign.py on an INVALID hole-crossing-shell
    polygon whose original vertex order left a dangling stitch end on
    every perturbation rung."""
    last = None
    for k in range(6):
        try:
            return _overlay_eo_once(a, b, op, k)
        except _Degenerate as e:
            last = e
            continue
    from mundipy_spark.kernels import constructive

    a2, b2 = constructive.make_valid(a), constructive.make_valid(b)
    for k in range(6):
        try:
            return _overlay_eo_once(a2, b2, op, k)
        except _Degenerate as e:
            last = e
            continue
    raise _Degenerate(f"unresolvable degeneracy in eo overlay: {last}")


def _has_holes(geom) -> bool:
    return any(len(rings) > 1 for rings in predicates._polygons_of(geom))


def overlay_op(a, b, op: str):
    """Boolean overlay of two (Multi)Polygons. op: intersection | union
    | difference | symmetric_difference.

    Hole-free inputs take the Greiner–Hormann machinery below; inputs
    with interior rings route through overlay_eo, whose even-odd
    classification subtracts holes exactly (r01 silently discarded
    them). Pieces from distinct input components are emitted side by
    side (their interiors are disjoint, so the MultiPolygon is
    area-correct; shared boundaries between touching pieces are
    tolerated)."""
    da, db = _geom_dim(a), _geom_dim(b)
    if da != db:
        if 2 not in (da, db):
            return _point_line_op(a, b, op, da)
        if op in ("intersection", "difference"):
            return _mixed_dim_op(a, b, op)
        # union / symmetric_difference with a zero-measure operand: the
        # areal result is the polygon unchanged; the parts of the lower-
        # dimensional operand OUTSIDE the polygon survive alongside it —
        # shapely (the reference's engine) returns a GeometryCollection.
        # (Silently routing through the polygon-only GH path treated the
        # line as a ring and returned empty/wrong geometry.)
        poly, lo = (a, b) if da == 2 else (b, a)
        outside = _mixed_dim_op(lo, poly, "difference")
        if outside is None:
            return poly
        return ("GeometryCollection", [poly, outside])
    if op != "symmetric_difference" and (_has_holes(a) or _has_holes(b)):
        return overlay_eo(a, b, op)
    if op == "symmetric_difference":
        pa = overlay_op(a, b, "difference")
        pb = overlay_op(b, a, "difference")
        parts = []
        for g in (pa, pb):
            if g is None:
                continue
            if g[0] == "Polygon":
                parts.append(g[1])
            else:
                parts.extend(g[1])
        return ("MultiPolygon", parts) if parts else None

    ra, rb = _outer_rings(a), _outer_rings(b)
    if not ra and not rb:
        return None
    if op == "intersection":
        out: list[np.ndarray] = []
        for x in ra:
            for y in rb:
                out.extend(_pair_op(x, y, "intersection"))
        return _rings_to_geom(out)
    if op == "difference":
        polys: list[list[np.ndarray]] = []  # each: [outer, *holes]
        for x in ra:
            pieces: list[list[np.ndarray]] = [[x]]
            for y in rb:
                nxt: list[list[np.ndarray]] = []
                for piece in pieces:
                    outer, holes = piece[0], piece[1:]
                    res = _pair_op(outer, y, "difference")
                    # nest plain result rings by containment: a pinched
                    # donut (b inside a, touching the boundary) comes back
                    # as outer + hole LOBES — flattening each into its own
                    # piece double-counts the hole's area (see _nest_rings)
                    nested = _nest_rings(
                        [np.asarray(r) for r in res if not isinstance(r, tuple)]
                    ) + [
                        [_ccw(r[1]), _cw(r[2])]
                        for r in res
                        if isinstance(r, tuple) and r[0] == "HOLE"
                    ]
                    for ring_set in nested:
                        new_outer, carved = ring_set[0], list(ring_set[1:])
                        # when the clip SPLITS the outer, each carried
                        # hole belongs only to the piece containing it
                        if len(nested) > 1 and holes:
                            mine = [
                                h
                                for h in holes
                                if _point_in_ring(
                                    *_ring_interior_point(np.asarray(h)), new_outer
                                )
                            ]
                        else:
                            mine = list(holes)
                        nxt.append([new_outer, *mine, *carved])
                pieces = nxt
            polys.extend(pieces)
        polys = [
            [_close(r) for r in p]
            for p in polys
            if len(p[0]) >= 3 and abs(_ring_signed_area(p[0])) > 1e-18
        ]
        if not polys:
            return None
        if len(polys) == 1:
            return ("Polygon", polys[0])
        return ("MultiPolygon", polys)
    if op == "union":
        if len(ra) == 1 and len(rb) == 1:
            return _rings_to_geom(_pair_op(ra[0], rb[0], "union"))
        # multi-part union: A∪B = (A\B) ⊎ (B\A) ⊎ (A∩B) — the three have
        # pairwise disjoint interiors, so emitting pieces side by side is
        # area-exact (touching boundaries tolerated)
        parts = []
        for g in (
            overlay_op(a, b, "difference"),
            overlay_op(b, a, "difference"),
            overlay_op(a, b, "intersection"),
        ):
            if g is None:
                continue
            if g[0] == "Polygon":
                parts.append(g[1])
            else:
                parts.extend(g[1])
        return ("MultiPolygon", parts) if parts else None
    raise ValueError(op)


def union(a, b):
    return overlay_op(a, b, "union")


def difference(a, b):
    return overlay_op(a, b, "difference")


def symmetric_difference(a, b):
    return overlay_op(a, b, "symmetric_difference")
