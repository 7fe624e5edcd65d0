"""Projected-coordinate-system auto-selection (reference mundipy/pcs).

The reference scans a packaged EPSG-region polygon dataset and returns
the smallest region containing the query bbox (pcs/__init__.py:26-62);
that dataset is absent from the repo (.MISSING_LARGE_BLOBS). This engine
uses the deterministic subset stated in SURVEY §2.6 C1: UTM zone by
formula when the bbox fits a zone, ESRI:54009 World Mollweide as the
meters fallback, NoProjectionFoundError for feet at global extent
(pcs/__init__.py:58-62 raises exactly there).

`suggest_pcs` returns the top-n candidates in the same smallest-first
spirit: containing UTM zone(s), then Mollweide.
"""

from __future__ import annotations

from mundipy_spark.kernels import proj

FT_PER_M = 3.28083333333333  # US survey-ish foot used for unit scaling


class NoProjectionFoundError(Exception):
    """Parity with the reference error type (pcs/__init__.py:23)."""


def choose_pcs(bbox: tuple[float, float, float, float], units: str = "meters") -> dict:
    """bbox = (minx, miny, maxx, maxy) in WGS84 degrees."""
    if units not in ("meters", "feet"):
        raise TypeError(f"units must be meters or feet, got {units!r}")
    minx, miny, maxx, maxy = bbox
    cx, cy = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    fits_zone = (maxx - minx) <= 6.0 and (maxy - miny) <= 40.0 and -80.0 <= cy <= 84.0
    if fits_zone:
        zone = int(proj.utm_zone([cx], [cy])[0])
        epsg = (32700 if cy < 0 else 32600) + zone
        return {
            "name": f"WGS 84 / UTM zone {zone}{'S' if cy < 0 else 'N'}",
            "epsg": epsg,
            "crs": f"EPSG:{epsg}",
            "units": units,
        }
    if units == "feet":
        raise NoProjectionFoundError(
            "no foot-unit projection covers a bbox wider than one UTM zone"
        )
    return {
        "name": "World Mollweide",
        "epsg": 54009,
        "crs": "ESRI:54009",
        "units": "meters",
    }


def suggest_pcs(
    bbox: tuple[float, float, float, float], units: str = "meters", n: int = 3
) -> list[dict]:
    out = []
    try:
        out.append(choose_pcs(bbox, units))
    except NoProjectionFoundError:
        pass
    if units == "meters" and (not out or out[0]["crs"] != "ESRI:54009"):
        out.append(
            {"name": "World Mollweide", "epsg": 54009, "crs": "ESRI:54009", "units": "meters"}
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
