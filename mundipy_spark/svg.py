"""SVG rendering of a layer sample — the reference's notebook repr
(`Dataset._repr_svg_`, mundipy/dataset.py:208-248: 4%-padded canvas,
per-feature paths). Driver-side only: renders `df.limit(n)` — an
engine-core non-goal at 10^12 rows, but part of the API surface.
"""

from __future__ import annotations

import numpy as np

from mundipy_spark.kernels import predicates, wkb

_PAD = 0.04  # 4% canvas padding, dataset.py:213-215


def _path_of(geom, pr: float = 1.0) -> list[str]:
    t, data = geom
    if t == "Point":
        # marker radius `pr` is in DATA units: it must scale with the
        # layer extent or a city-scale point covers the whole canvas
        return [
            f"M {data[0]} {data[1]} m -{pr} 0 "
            f"a {pr} {pr} 0 1 0 {2 * pr} 0 a {pr} {pr} 0 1 0 -{2 * pr} 0"
        ]
    if t == "MultiPoint":
        return [p for pt in np.asarray(data).reshape(-1, 2) for p in _path_of(("Point", pt), pr)]
    if t == "LineString":
        c = np.asarray(data)
        return ["M " + " L ".join(f"{x} {y}" for x, y in c)]
    if t == "MultiLineString":
        return [p for l in data for p in _path_of(("LineString", l), pr)]
    if t == "Polygon":
        out = []
        for ring in data:
            c = np.asarray(ring)
            out.append("M " + " L ".join(f"{x} {y}" for x, y in c) + " Z")
        return [" ".join(out)]  # one path: even-odd fill renders holes
    if t == "MultiPolygon":
        return [p for poly in data for p in _path_of(("Polygon", poly), pr)]
    if t == "GeometryCollection":
        return [p for g in data for p in _path_of(g, pr)]
    return []


def render_svg(geoms: list, width: int = 300, height: int = 300) -> str:
    """Geometries (internal tuples) -> one SVG document, y-flipped into
    screen coordinates with the reference's padded viewport."""
    if not geoms:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"/>'
    bs = np.asarray([wkb.bounds(g) for g in geoms], dtype=np.float64)
    minx, miny = bs[:, 0].min(), bs[:, 1].min()
    maxx, maxy = bs[:, 2].max(), bs[:, 3].max()
    w = max(maxx - minx, 1e-9)
    h = max(maxy - miny, 1e-9)
    vb = (minx - w * _PAD, miny - h * _PAD, w * (1 + 2 * _PAD), h * (1 + 2 * _PAD))
    paths = []
    # non-scaling-stroke makes stroke-width SCREEN-space (px): keep it a
    # fixed pixel constant — scaling it by the data-unit extent rendered
    # sub-pixel (invisible) strokes for any small-extent layer
    pr = max(w, h) * 0.01  # point marker radius, data units
    for g in geoms:
        fill = "#66c2a5" if predicates.has_area(g) else "none"
        for d in _path_of(g, pr):
            paths.append(
                f'<path d="{d}" fill="{fill}" fill-rule="evenodd" '
                f'stroke="#333" stroke-width="1" vector-effect="non-scaling-stroke"/>'
            )
    # flip y: svg y grows downward
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="{vb[0]} {-(vb[1] + vb[3])} {vb[2]} {vb[3]}">'
        f'<g transform="scale(1,-1)">' + "".join(paths) + "</g></svg>"
    )
