"""From-scratch map projections over numpy arrays (no pyproj).

Replaces the reference's pyproj transformer path
(mundipy/cache/__init__.py:10-14, mundipy/geometry.py:190-201) with
public-formula implementations:

- WGS84 <-> UTM via the Krüger series (Karney 2011, "Transverse Mercator
  with an accuracy of a few nanometers" — 3rd-order coefficients, ~mm
  accuracy within a zone);
- Web Mercator (EPSG:3857), Mollweide (ESRI:54009 — the reference's
  meters fallback, mundipy/pcs/__init__.py:58-60), and spherical
  azimuthal equidistant (local tangent-plane for distance sandwiches).

All functions take/return numpy float64 arrays in degrees/meters and are
called from inside Arrow batch kernels — one numpy pass per batch.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = np.sqrt(WGS84_E2)
UTM_K0 = 0.9996
UTM_E0 = 500_000.0
UTM_N0_SOUTH = 10_000_000.0
SPHERE_R = 6371008.8  # mean radius for spherical projections

_N = WGS84_F / (2.0 - WGS84_F)
_A_CAP = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)
_DELTA = (
    2.0 * _N - 2.0 * _N**2 / 3.0 - 2.0 * _N**3,
    7.0 * _N**2 / 3.0 - 8.0 * _N**3 / 5.0,
    56.0 * _N**3 / 15.0,
)


def utm_zone(lon, lat) -> np.ndarray:
    """Standard 6-degree zone number (1..60)."""
    lon = np.asarray(lon, dtype=np.float64)
    z = np.floor((lon + 180.0) / 6.0).astype(np.int64) + 1
    return np.clip(z, 1, 60)


def utm_epsg(lon: float, lat: float) -> str:
    """EPSG code of the UTM zone containing a point — the deterministic
    stand-in for the reference's EPSG-region-scan `choose_pcs`
    (mundipy/pcs/__init__.py:26-62; the LA golden EPSG:32611 in
    tests/test_pcs.py:16-21 falls out of this rule)."""
    z = int(utm_zone(lon, lat)[()] if np.isscalar(lon) else utm_zone([lon], [lat])[0])
    return f"EPSG:{32600 + z}" if lat >= 0 else f"EPSG:{32700 + z}"


def utm_forward(lon, lat, zone: int, south: bool = False):
    """WGS84 deg -> UTM meters (Krüger 3rd-order series)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon0 = np.deg2rad(zone * 6.0 - 183.0)
    lam = np.deg2rad(lon) - lon0
    phi = np.deg2rad(lat)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - WGS84_E * np.arctanh(WGS84_E * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    e = UTM_E0 + UTM_K0 * _A_CAP * eta
    n = (UTM_N0_SOUTH if south else 0.0) + UTM_K0 * _A_CAP * xi
    return e, n


def utm_inverse(e, n, zone: int, south: bool = False):
    """UTM meters -> WGS84 deg."""
    e = np.asarray(e, dtype=np.float64)
    n = np.asarray(n, dtype=np.float64)
    xi = (n - (UTM_N0_SOUTH if south else 0.0)) / (UTM_K0 * _A_CAP)
    eta = (e - UTM_E0) / (UTM_K0 * _A_CAP)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lon0 = zone * 6.0 - 183.0
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.rad2deg(lam), np.rad2deg(phi)


def web_mercator_forward(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    x = WGS84_A * np.deg2rad(lon)
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def web_mercator_inverse(x, y):
    lon = np.rad2deg(np.asarray(x, dtype=np.float64) / WGS84_A)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WGS84_A)) - np.pi / 2.0)
    return lon, lat


# authalic latitude series (Snyder 3-12/3-18) + authalic sphere radius:
# mapping geodetic latitude to the equal-area sphere before Mollweide
# makes the projection ellipsoidally equal-area (the reference's
# pyproj ESRI:54009 behavior) — continental-area goldens agree to ~1e-6
# instead of the ~0.2% a geodetic-latitude spherical Mollweide shows.
_E2, _E4, _E6 = WGS84_E2, WGS84_E2**2, WGS84_E2**3
_AUTH_FWD = (
    _E2 / 3.0 + 31.0 * _E4 / 180.0 + 59.0 * _E6 / 560.0,
    17.0 * _E4 / 360.0 + 61.0 * _E6 / 1260.0,
    383.0 * _E6 / 45360.0,
)
_AUTH_INV = (
    _E2 / 3.0 + 31.0 * _E4 / 180.0 + 517.0 * _E6 / 5040.0,
    23.0 * _E4 / 360.0 + 251.0 * _E6 / 3780.0,
    761.0 * _E6 / 45360.0,
)
_QP = (1.0 - _E2) * (
    1.0 / (1.0 - _E2) - (1.0 / (2.0 * WGS84_E)) * np.log((1.0 - WGS84_E) / (1.0 + WGS84_E))
)
AUTHALIC_R = WGS84_A * np.sqrt(_QP / 2.0)


def _authalic_lat(phi):
    return (
        phi
        - _AUTH_FWD[0] * np.sin(2.0 * phi)
        + _AUTH_FWD[1] * np.sin(4.0 * phi)
        - _AUTH_FWD[2] * np.sin(6.0 * phi)
    )


def _authalic_lat_inv(beta):
    return (
        beta
        + _AUTH_INV[0] * np.sin(2.0 * beta)
        + _AUTH_INV[1] * np.sin(4.0 * beta)
        + _AUTH_INV[2] * np.sin(6.0 * beta)
    )


def mollweide_forward(lon, lat, iters: int = 12):
    """Ellipsoidal Mollweide (equal-area; the ESRI:54009 fallback role):
    authalic latitude + authalic sphere radius."""
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = _authalic_lat(np.deg2rad(np.asarray(lat, dtype=np.float64)))
    theta = phi.copy()
    target = np.pi * np.sin(phi)
    for _ in range(iters):
        f = 2.0 * theta + np.sin(2.0 * theta) - target
        fp = 2.0 + 2.0 * np.cos(2.0 * theta)
        fp = np.where(np.abs(fp) < 1e-12, 1e-12, fp)
        theta = theta - f / fp
    x = AUTHALIC_R * np.sqrt(8.0) / np.pi * lam * np.cos(theta)
    y = AUTHALIC_R * np.sqrt(2.0) * np.sin(theta)
    return x, y


def mollweide_inverse(x, y):
    theta = np.arcsin(np.clip(np.asarray(y, dtype=np.float64) / (AUTHALIC_R * np.sqrt(2.0)), -1, 1))
    beta = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / np.pi, -1, 1))
    phi = _authalic_lat_inv(beta)
    lam = np.pi * np.asarray(x, dtype=np.float64) / (AUTHALIC_R * np.sqrt(8.0) * np.cos(theta))
    return np.rad2deg(lam), np.rad2deg(phi)


def aeqd_forward(lon, lat, lon0: float, lat0: float):
    """Spherical azimuthal equidistant centered at (lon0, lat0) — the
    local tangent plane used for distance sandwiches on batches whose
    extent doesn't fit one UTM zone."""
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64) - lon0)
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    phi0 = np.deg2rad(lat0)
    cosc = np.clip(
        np.sin(phi0) * np.sin(phi) + np.cos(phi0) * np.cos(phi) * np.cos(lam), -1.0, 1.0
    )
    c = np.arccos(cosc)
    k = np.where(c < 1e-12, 1.0, c / np.where(np.sin(c) == 0, 1.0, np.sin(c)))
    x = SPHERE_R * k * np.cos(phi) * np.sin(lam)
    y = SPHERE_R * k * (np.cos(phi0) * np.sin(phi) - np.sin(phi0) * np.cos(phi) * np.cos(lam))
    return x, y


def aeqd_inverse(x, y, lon0: float, lat0: float):
    x = np.asarray(x, dtype=np.float64) / SPHERE_R
    y = np.asarray(y, dtype=np.float64) / SPHERE_R
    c = np.sqrt(x * x + y * y)
    phi0 = np.deg2rad(lat0)
    safe_c = np.where(c < 1e-12, 1e-12, c)
    phi = np.arcsin(
        np.clip(np.cos(c) * np.sin(phi0) + y * np.sin(safe_c) / safe_c * np.cos(phi0), -1, 1)
    )
    lam = np.arctan2(
        x * np.sin(safe_c),
        safe_c * np.cos(phi0) * np.cos(c) - y * np.sin(phi0) * np.sin(safe_c),
    )
    lam = np.where(c < 1e-12, 0.0, lam)
    phi = np.where(c < 1e-12, phi0, phi)
    return lon0 + np.rad2deg(lam), np.rad2deg(phi)


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters, vectorized. Also JVM-expressible
    (see functions.st.haversine_expr) so kNN refinement can stay in
    whole-stage codegen."""
    lon1, lat1, lon2, lat2 = (np.deg2rad(np.asarray(v, dtype=np.float64)) for v in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * SPHERE_R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def lcc2sp_forward(lon, lat, lat1: float, lat2: float, lat0: float, lon0: float,
                   x0: float, y0: float):
    """Ellipsoidal Lambert Conformal Conic, 2 standard parallels
    (Snyder, Map Projections — A Working Manual, pp. 107-109). GRS80/
    WGS84 ellipsoid (NAD83's GRS80 differs from WGS84 by <1e-9 in
    flattening)."""
    e = WGS84_E
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    p1, p2, p0 = np.deg2rad(lat1), np.deg2rad(lat2), np.deg2rad(lat0)

    def m(p):
        return np.cos(p) / np.sqrt(1.0 - WGS84_E2 * np.sin(p) ** 2)

    def t(p):
        return np.tan(np.pi / 4.0 - p / 2.0) / (
            (1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p))
        ) ** (e / 2.0)

    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho = WGS84_A * F * t(phi) ** n
    rho0 = WGS84_A * F * t(p0) ** n
    th = n * (lam - np.deg2rad(lon0))
    return rho * np.sin(th) + x0, rho0 - rho * np.cos(th) + y0


def lcc2sp_inverse(x, y, lat1: float, lat2: float, lat0: float, lon0: float,
                   x0: float, y0: float, iters: int = 8):
    e = WGS84_E
    xs = np.asarray(x, dtype=np.float64) - x0
    ys = np.asarray(y, dtype=np.float64) - y0
    p1, p2, p0 = np.deg2rad(lat1), np.deg2rad(lat2), np.deg2rad(lat0)

    def m(p):
        return np.cos(p) / np.sqrt(1.0 - WGS84_E2 * np.sin(p) ** 2)

    def t(p):
        return np.tan(np.pi / 4.0 - p / 2.0) / (
            (1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p))
        ) ** (e / 2.0)

    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = WGS84_A * F * t(p0) ** n
    rho = np.sign(n) * np.hypot(xs, rho0 - ys)
    tp = (rho / (WGS84_A * F)) ** (1.0 / n)
    th = np.arctan2(xs, rho0 - ys)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(iters):
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
        )
    return np.rad2deg(th / n) + lon0, np.rad2deg(phi)


# Public EPSG LCC-2SP definitions this engine ships (parameters from the
# EPSG registry — public facts): lat1, lat2, lat0, lon0, x0_m, y0_m, unit.
# EPSG:2844 = NAD83(HARN) / Texas North (meters) — the CRS of the
# reference's CRS-mixed test fixture (tests/fixtures/texas_epsg_2844
# .geojson: points near Amarillo, x~220 km e., y~1,106 km n.).
# EPSG:2277 = NAD83 / Texas Central (ftUS) — the PCS-table feet entry.
LCC_2SP_CODES: dict[int, tuple] = {
    2844: (34.65, 36.18333333333333, 34.0, -101.5,
           200_000.0, 1_000_000.0, "m"),
    2277: (31.883333333333333, 30.116666666666667, 29.666666666666668,
           -100.33333333333333, 699999.9998983998, 3000000.0000101604, "us-ft"),
}


_FT_PER_M = 3.28083333333333  # matches pcs.FT_PER_M


def crs_transforms(crs: str, units: str = "meters"):
    """(forward, inverse) lon/lat-degrees <-> projected-coords transforms
    for the CRS strings this engine implements from public formulas:

      EPSG:4326            identity
      EPSG:3857            spherical Web Mercator
      EPSG:326NN / 327NN   WGS84 UTM zone NN north / south (Krüger)
      ESRI:54009           World Mollweide

    units='feet' wraps the projected axis in international feet — the
    role the reference's state-plane feet CRSs (e.g. EPSG:2844 in
    tests/test_mundi_q.py:75-88) play; the projection math is the UTM /
    Mercator formula, the unit conversion is exact.

    The reference normalizes ANY input CRS to WGS84 at ingest
    (mundipy/dataset.py:85-88); Dataset(crs=...) uses the inverse here.
    """
    scale = _FT_PER_M if units == "feet" else 1.0
    if units not in ("meters", "feet"):
        raise ValueError(f"unsupported crs units {units!r}")

    def scaled(fwd, inv):
        if scale == 1.0:
            return fwd, inv
        return (
            lambda lon, lat: tuple(np.asarray(v) * scale for v in fwd(lon, lat)),
            lambda x, y: inv(np.asarray(x, np.float64) / scale, np.asarray(y, np.float64) / scale),
        )

    c = crs.upper()
    if c == "EPSG:4326":
        ident = lambda a, b: (np.asarray(a, np.float64), np.asarray(b, np.float64))  # noqa: E731
        return ident, ident
    if c == "EPSG:3857":
        return scaled(web_mercator_forward, web_mercator_inverse)
    if c == "ESRI:54009":
        return scaled(mollweide_forward, mollweide_inverse)
    if c.startswith("EPSG:326") or c.startswith("EPSG:327"):
        code = int(c.split(":")[1])
        zone = code % 100
        south = code // 100 == 327
        if not 1 <= zone <= 60:
            raise ValueError(f"bad UTM zone in {crs}")
        return scaled(
            lambda lon, lat, z=zone, s=south: utm_forward(lon, lat, z, s),
            lambda x, y, z=zone, s=south: utm_inverse(x, y, z, s),
        )
    if c.startswith(("EPSG:", "ESRI:")):
        code_s = c.split(":")[1]
        if code_s.isdigit() and int(code_s) in LCC_2SP_CODES:
            lat1, lat2, lat0, lon0, x0, y0, unit = LCC_2SP_CODES[int(code_s)]
            # the registry unit is authoritative for these codes (the
            # EPSG definition fixes the axis unit; us-ft == the
            # FT_PER_M survey foot used engine-wide)
            scale2 = _FT_PER_M if unit == "us-ft" else 1.0
            fwd0 = lambda lon, lat: lcc2sp_forward(lon, lat, lat1, lat2, lat0, lon0, x0, y0)  # noqa: E731
            inv0 = lambda x, y: lcc2sp_inverse(x, y, lat1, lat2, lat0, lon0, x0, y0)  # noqa: E731
            if scale2 == 1.0:
                return fwd0, inv0
            return (
                lambda lon, lat: tuple(np.asarray(v) * scale2 for v in fwd0(lon, lat)),
                lambda x, y: inv0(np.asarray(x, np.float64) / scale2, np.asarray(y, np.float64) / scale2),
            )
    raise ValueError(f"unsupported crs {crs!r} (implemented: EPSG:4326, "
                     "EPSG:3857, EPSG:326xx/327xx UTM, ESRI:54009, "
                     f"LCC-2SP codes {sorted(LCC_2SP_CODES)})")


# --- geometry-level transforms -------------------------------------------


def transform_geom(geom, fwd):
    """Apply a coordinate transform fn (x_arr, y_arr) -> (x', y') to every
    vertex of a geometry, preserving structure."""
    t, data = geom
    if t == "Point":
        x, y = fwd(np.asarray([data[0]]), np.asarray([data[1]]))
        return (t, np.asarray([x[0], y[0]], dtype=np.float64))
    if t in ("LineString", "MultiPoint"):
        arr = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        x, y = fwd(arr[:, 0], arr[:, 1])
        return (t, np.column_stack([x, y]))
    if t in ("Polygon", "MultiLineString"):
        out = []
        for part in data:
            arr = np.asarray(part, dtype=np.float64).reshape(-1, 2)
            x, y = fwd(arr[:, 0], arr[:, 1])
            out.append(np.column_stack([x, y]))
        return (t, out)
    if t == "MultiPolygon":
        return (t, [transform_geom(("Polygon", poly), fwd)[1] for poly in data])
    if t == "GeometryCollection":
        return (t, [transform_geom(g, fwd) for g in data])
    raise ValueError(t)


def local_projection(minx: float, miny: float, maxx: float, maxy: float,
                     purpose: str = "area"):
    """Pick a deterministic local PCS for a bbox, mirroring the
    reference's choose-smallest-containing-region rule
    (mundipy/pcs/__init__.py:26-62) with a UTM-zone formula:

    - extent fits one UTM zone (<= ~6 deg of lon, same hemisphere-ish)
      -> that zone's transverse Mercator;
    - polar-cap small extents (UPS territory) -> azimuthal equidistant
      about the bbox center;
    - else: Mollweide (ESRI:54009, equal-area — the right fallback for
      AREA) for purpose="area"; AEQD about the bbox center for
      purpose="distance" (Mollweide compresses N-S distances without
      bound near the poles, while AEQD's metric scales are >= 1
      everywhere, so planar AEQD distance never under-estimates the
      geodesic — the property `nearest` pruning relies on).

    Returns (name, forward_fn, inverse_fn).
    """
    cx = (minx + maxx) / 2.0
    cy = (miny + maxy) / 2.0
    fits_zone = (maxx - minx) <= 6.0 and (maxy - miny) <= 40.0
    if fits_zone and -80.0 <= cy <= 84.0:
        zone = int(utm_zone([cx], [cy])[0])
        south = cy < 0
        name = f"EPSG:{(32700 if south else 32600) + zone}"
        return (
            name,
            lambda x, y, z=zone, s=south: utm_forward(x, y, z, s),
            lambda x, y, z=zone, s=south: utm_inverse(x, y, z, s),
        )
    if fits_zone or purpose == "distance":
        return (
            f"AEQD({cx:.3f},{cy:.3f})",
            lambda x, y, a=cx, b=cy: aeqd_forward(x, y, a, b),
            lambda x, y, a=cx, b=cy: aeqd_inverse(x, y, a, b),
        )
    return ("ESRI:54009", mollweide_forward, mollweide_inverse)
