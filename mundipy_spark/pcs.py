"""Projected-coordinate-system auto-selection (reference mundipy/pcs).

The reference scans a packaged EPSG-region polygon dataset and returns
the smallest region containing the query bbox whose axis unit matches
(pcs/__init__.py:26-62); that dataset is absent from the reference repo
(.MISSING_LARGE_BLOBS), so this engine SYNTHESIZES a small region table
with the same algorithm shape: all 120 WGS84 UTM zones (meters) plus a
hand-curated set of national/state grids with unit tags (public EPSG
codes, approximate coverage bboxes — own goldens). Scan order is
smallest-area-first; feet queries that no regional feet grid covers
raise NoProjectionFoundError exactly like the reference
(pcs/__init__.py:58-62); meters queries with no containing region fall
back to World Mollweide (reference test_global_pcs).

The table is deliberately tiny (<150 rows) — on the Spark side it is a
driver-side constant, broadcast implicitly inside closures.
"""

from __future__ import annotations

FT_PER_M = 3.28083333333333  # US survey-ish foot used for unit scaling


class NoProjectionFoundError(Exception):
    """Parity with the reference error type (pcs/__init__.py:23)."""


def _region(name, epsg, crs, units, bbox, poly=None, transformable=True):
    """poly: optional [(lon, lat), ...] boundary ring — containment then
    tests the query bbox against the POLYGON (the reference scans real
    EPSG region polygons); bbox is the coarse prefilter. transformable:
    whether kernels/proj.crs_transforms implements this code (all
    shipped regions are now transformable — Laborde, the last gap,
    landed in round 4)."""
    minx, miny, maxx, maxy = bbox
    if poly is not None:
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        area = 0.0
        for i in range(len(poly)):
            j = (i + 1) % len(poly)
            area += xs[i] * ys[j] - xs[j] * ys[i]
        area = abs(area) / 2.0
    else:
        area = (maxx - minx) * (maxy - miny)
    return {
        "name": name,
        "epsg": epsg,
        "crs": crs,
        "units": units,
        "bbox": bbox,
        "poly": poly,
        "transformable": transformable,
        "area_deg2": area,
    }


# coarse Netherlands-onshore boundary (RD New area of use — the bbox
# alone would wrongly swallow queries spilling into Belgium/Germany,
# which the reference resolves to the wider SPBA LCC instead)
_NL_POLY = [
    (3.36, 51.0), (4.1, 50.75), (6.2, 50.74), (7.22, 52.0), (7.22, 53.35),
    (6.4, 53.7), (4.6, 53.5), (3.36, 51.9),
]

# coarse Madagascar island outline (Tananarive / Laborde area of use)
_MADAGASCAR_POLY = [
    (49.6, -11.8), (50.55, -15.4), (47.4, -25.2), (45.0, -25.75),
    (43.1, -22.3), (43.1, -16.0), (46.2, -12.7),
]


def _build_regions() -> list[dict]:
    regs = []
    # regional unit-tagged grids (public EPSG codes; synthesized
    # approximate coverage — the reference's exact region polygon file is
    # unavailable, so these are own goldens, smallest entries first by
    # construction of their bboxes). The row set reproduces every
    # reference tests/test_pcs.py golden: NH ftUS -> 3445, Madagascar ->
    # 29701, Beijing -> 4796, southern-North-Sea -> 5643, LA -> 32611.
    regs += [
        _region("NAD83(HARN) / New Hampshire (ftUS)", 3445, "EPSG:3445", "feet",
                (-72.6, 42.69, -70.57, 45.31)),
        _region("NAD83 / Texas Central (ftUS)", 2277, "EPSG:2277", "feet",
                (-104.05, 29.78, -93.5, 32.27)),
        _region("NAD83 / California zone 5 (ftUS)", 2229, "EPSG:2229", "feet",
                (-121.42, 32.76, -114.12, 35.81)),
        _region("NAD83 / New York Long Island (ftUS)", 2263, "EPSG:2263", "feet",
                (-74.26, 40.47, -71.8, 41.3)),
        _region("Amersfoort / RD New", 28992, "EPSG:28992", "meters",
                (3.2, 50.74, 7.22, 53.7), poly=_NL_POLY),
        _region("OSGB36 / British National Grid", 27700, "EPSG:27700", "meters",
                (-9.0, 49.75, 2.01, 61.01)),
        _region("ETRS89 / UTM zone 32N (Germany-ish)", 25832, "EPSG:25832", "meters",
                (5.05, 46.8, 12.0, 55.09)),
        _region("ED50 / SPBA LCC", 5643, "EPSG:5643", "meters",
                (1.0, 50.2, 12.0, 56.1)),
        _region("Tananarive (Paris) / Laborde Grid", 29701, "EPSG:29701",
                "meters", (43.1, -25.75, 50.55, -11.8),
                poly=_MADAGASCAR_POLY),
        _region("New Beijing / 3-degree Gauss-Kruger CM 117E", 4796,
                "EPSG:4796", "meters", (115.5, 18.0, 118.5, 53.6)),
    ]
    # all WGS84 UTM zones, meters (6 deg x hemisphere)
    for zone in range(1, 61):
        w = zone * 6.0 - 186.0
        regs.append(
            _region(f"WGS 84 / UTM zone {zone}N", 32600 + zone,
                    f"EPSG:{32600 + zone}", "meters", (w, 0.0, w + 6.0, 84.0))
        )
        regs.append(
            _region(f"WGS 84 / UTM zone {zone}S", 32700 + zone,
                    f"EPSG:{32700 + zone}", "meters", (w, -80.0, w + 6.0, 0.0))
        )
    regs.sort(key=lambda r: r["area_deg2"])
    return regs


PCS_REGIONS = _build_regions()


def _bbox_in_poly(bbox, ring) -> bool:
    """Exact polygon containment of the query rectangle (the reference
    tests shapely geo.contains(box), pcs/__init__.py:49-53)."""
    import numpy as np

    from mundipy_spark.kernels import predicates

    minx, miny, maxx, maxy = bbox
    poly = ("Polygon", [np.asarray([*ring, ring[0]], dtype=np.float64)])
    rect = (
        "Polygon",
        [np.asarray(
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]],
            dtype=np.float64,
        )],
    )
    return predicates.contains(poly, rect)


def _containing(bbox, units):
    minx, miny, maxx, maxy = bbox
    for r in PCS_REGIONS:
        if r["units"] != units:
            continue
        rx0, ry0, rx1, ry1 = r["bbox"]
        if not (rx0 <= minx and ry0 <= miny and rx1 >= maxx and ry1 >= maxy):
            continue
        if r["poly"] is not None and not _bbox_in_poly(bbox, r["poly"]):
            continue
        yield r


def _strip(r: dict) -> dict:
    return {k: r[k] for k in ("name", "epsg", "crs", "units")}


def choose_pcs(bbox: tuple[float, float, float, float], units: str = "meters") -> dict:
    """Smallest containing region with matching unit (the reference's
    algorithm, pcs/__init__.py:26-62, over the synthesized table);
    meters with no containing region falls back to World Mollweide."""
    if units not in ("meters", "feet"):
        raise TypeError(f"units must be meters or feet, got {units!r}")
    for r in _containing(bbox, units):
        return _strip(r)
    if units == "feet":
        raise NoProjectionFoundError(
            "no foot-unit projection region contains the query bbox"
        )
    # no containing region (e.g. a bbox straddling a UTM zone boundary):
    # world fallback, exactly like the reference's test_global_pcs (its
    # Mollweide dict carries no epsg key)
    return {"name": "World Mollweide", "crs": "ESRI:54009", "units": "meters"}


def suggest_pcs(
    bbox: tuple[float, float, float, float], units: str = "meters", n: int = 3
) -> list[dict]:
    """Top-n candidates smallest-first: every containing unit-matched
    region, then the meters fallbacks."""
    out = [_strip(r) for r in _containing(bbox, units)]
    if units == "meters":
        try:
            fb = choose_pcs(bbox, units)
            if all(fb["crs"] != o["crs"] for o in out):
                out.append(fb)
        except NoProjectionFoundError:
            pass
        if all(o["crs"] != "ESRI:54009" for o in out):
            out.append(
                {"name": "World Mollweide", "crs": "ESRI:54009", "units": "meters"}
            )
    return out[:n]


def unit_scale(units: str) -> float:
    """Multiplier from meters to the session's measurement units
    (reference Mundi(units=...) semantics, mundi.py:75-82)."""
    if units == "meters":
        return 1.0
    if units == "feet":
        return FT_PER_M
    raise TypeError(f"unsupported units {units!r}")
