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


# --- generalized ellipsoids + datum shifts ---------------------------------
# Public ellipsoid constants (a, 1/f) and published Helmert parameters
# (local datum -> WGS84, position-vector convention: tx ty tz meters,
# rx ry rz arc-seconds, s ppm). NAD83/ETRS89's GRS80 is within 1e-9 of
# WGS84 flattening, so those codes carry no shift.

ELLIPSOIDS: dict[str, tuple[float, float]] = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy1830": (6377563.396, 1.0 / 299.3249646),
    "bessel1841": (6377397.155, 1.0 / 299.1528128),
    "intl1924": (6378388.0, 1.0 / 297.0),
    "krassowsky1940": (6378245.0, 1.0 / 298.3),
}

# datum -> WGS84 (position vector). OSGB36 is the OS national set (~5 m
# nationwide); Amersfoort is the NL standard; ED50 mean-European; the
# Beijing 1954 set is the widely-cited approximate mainland mean.
DATUM_TO_WGS84: dict[str, tuple] = {
    "WGS84": (0, 0, 0, 0, 0, 0, 0),
    "OSGB36": (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894),
    "Amersfoort": (565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.87740, 4.0725),
    "ED50": (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0),
    "Beijing1954": (15.8, -154.4, -82.3, 0.0, 0.0, 0.0, 0.0),
    # EPSG:1227 Tananarive 1925 -> WGS84 (translation-only, Madagascar)
    "Tananarive1925": (-189.0, -242.0, -91.0, 0.0, 0.0, 0.0, 0.0),
}


def _geodetic_to_geocentric(lon, lat, a: float, f: float):
    e2 = f * (2.0 - f)
    lam = np.deg2rad(np.asarray(lon, np.float64))
    phi = np.deg2rad(np.asarray(lat, np.float64))
    sphi, cphi = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1.0 - e2 * sphi * sphi)
    return N * cphi * np.cos(lam), N * cphi * np.sin(lam), N * (1.0 - e2) * sphi


def _geocentric_to_geodetic(X, Y, Z, a: float, f: float, iters: int = 6):
    e2 = f * (2.0 - f)
    X, Y, Z = (np.asarray(v, np.float64) for v in (X, Y, Z))
    lam = np.arctan2(Y, X)
    p = np.hypot(X, Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(iters):
        sphi = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi = np.arctan2(Z + e2 * N * sphi, p)
    return np.rad2deg(lam), np.rad2deg(phi)


def _helmert(X, Y, Z, params, inverse: bool = False):
    tx, ty, tz, rx, ry, rz, s = params
    rx, ry, rz = (np.deg2rad(v / 3600.0) for v in (rx, ry, rz))
    m = 1.0 + s * 1e-6
    if not inverse:
        Xo = tx + m * (X - rz * Y + ry * Z)
        Yo = ty + m * (rz * X + Y - rx * Z)
        Zo = tz + m * (-ry * X + rx * Y + Z)
        return Xo, Yo, Zo
    # exact-enough reverse for small rotations/scale (iterated once)
    Xs, Ys, Zs = (X - tx) / m, (Y - ty) / m, (Z - tz) / m
    Xo = Xs + rz * Ys - ry * Zs
    Yo = -rz * Xs + Ys + rx * Zs
    Zo = ry * Xs - rx * Ys + Zs
    return Xo, Yo, Zo


def _datum_from_wgs84(lon, lat, datum: str, a: float, f: float):
    """WGS84 lon/lat -> local-datum lon/lat (via geocentric Helmert)."""
    if datum == "WGS84" or datum == "GRS80":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    aw, fw = ELLIPSOIDS["WGS84"]
    X, Y, Z = _geodetic_to_geocentric(lon, lat, aw, fw)
    X, Y, Z = _helmert(X, Y, Z, DATUM_TO_WGS84[datum], inverse=True)
    return _geocentric_to_geodetic(X, Y, Z, a, f)


def _datum_to_wgs84(lon, lat, datum: str, a: float, f: float):
    if datum == "WGS84" or datum == "GRS80":
        return np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    X, Y, Z = _geodetic_to_geocentric(lon, lat, a, f)
    X, Y, Z = _helmert(X, Y, Z, DATUM_TO_WGS84[datum])
    aw, fw = ELLIPSOIDS["WGS84"]
    return _geocentric_to_geodetic(X, Y, Z, aw, fw)


def _kruger_coeffs(f: float):
    n = f / (2.0 - f)
    A = 1.0 / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0,
        n**2 / 48.0 + n**3 / 15.0,
        17.0 * n**3 / 480.0,
    )
    delta = (
        2.0 * n - 2.0 * n**2 / 3.0 - 2.0 * n**3,
        7.0 * n**2 / 3.0 - 8.0 * n**3 / 5.0,
        56.0 * n**3 / 15.0,
    )
    return A, alpha, beta, delta


def _tm_xi_eta(lon, lat, lon0: float, a: float, f: float):
    e = np.sqrt(f * (2.0 - f))
    lam = np.deg2rad(np.asarray(lon, np.float64)) - np.deg2rad(lon0)
    phi = np.deg2rad(np.asarray(lat, np.float64))
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    A, alpha, _, _ = _kruger_coeffs(f)
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, c in enumerate(alpha, start=1):
        xi += c * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += c * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    return xi, eta, A * a


def tm_forward(lon, lat, lon0: float, lat0: float, k0: float,
               x0: float, y0: float, ellipsoid: str = "GRS80"):
    """General ellipsoidal Transverse Mercator (Krüger series) with
    arbitrary natural origin / scale / false coords — national TM grids
    (EPSG method 9807): British National Grid, NH state plane, UTM."""
    a, f = ELLIPSOIDS[ellipsoid]
    xi, eta, Acap = _tm_xi_eta(lon, lat, lon0, a, f)
    if lat0 != 0.0:
        xi0, _, _ = _tm_xi_eta(np.asarray([lon0]), np.asarray([lat0]), lon0, a, f)
        xi = xi - xi0[0]
    return x0 + k0 * Acap * eta, y0 + k0 * Acap * xi


def tm_inverse(x, y, lon0: float, lat0: float, k0: float,
               x0: float, y0: float, ellipsoid: str = "GRS80"):
    a, f = ELLIPSOIDS[ellipsoid]
    A, _, beta, delta = _kruger_coeffs(f)
    Acap = A * a
    xi = (np.asarray(y, np.float64) - y0) / (k0 * Acap)
    if lat0 != 0.0:
        xi0, _, _ = _tm_xi_eta(np.asarray([lon0]), np.asarray([lat0]), lon0, a, f)
        xi = xi + xi0[0]
    eta = (np.asarray(x, np.float64) - x0) / (k0 * Acap)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(delta, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + np.rad2deg(lam), np.rad2deg(phi)


def oblique_stereo_forward(lon, lat, lon0: float, lat0: float, k0: float,
                           x0: float, y0: float, ellipsoid: str = "bessel1841"):
    """Ellipsoidal Oblique Stereographic (EPSG method 9809, via the
    conformal sphere — the RD New / Amersfoort projection).

    Domain: |lon - lon0| < 180/n degrees (n = conformal-sphere ratio,
    <= ~1.0034): the conformal longitude is n*(lon-lon0), so beyond that
    the seam wraps and the mapping is non-injective — inverse(forward(p))
    then returns the alias on the other side of the antimeridian. This
    is inherent to method 9809 (a national-grid projection), not an
    implementation artifact."""
    a, f = ELLIPSOIDS[ellipsoid]
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    phi0 = np.deg2rad(lat0)
    lam0 = np.deg2rad(lon0)
    s0, c0 = np.sin(phi0), np.cos(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + (e2 * c0**4) / (1.0 - e2))

    def to_conformal(phi, lam):
        S1 = (1.0 + np.sin(phi)) / (1.0 - np.sin(phi))
        S2 = (1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))
        w = (S1 * S2**e) ** n
        # solve c so that chi0 corresponds at origin
        return w

    w0 = to_conformal(phi0, lam0)
    sin_chi0 = (w0 - 1.0) / (w0 + 1.0)
    c = (n + s0) * (1.0 - sin_chi0) / ((n - s0) * (1.0 + sin_chi0))
    w0c = c * w0
    chi0 = np.arcsin((w0c - 1.0) / (w0c + 1.0))

    phi = np.deg2rad(np.asarray(lat, np.float64))
    lam = np.deg2rad(np.asarray(lon, np.float64))
    w = c * to_conformal(phi, lam)
    chi = np.arcsin((w - 1.0) / (w + 1.0))
    Lam = n * (lam - lam0) + lam0
    B = 1.0 + np.sin(chi) * np.sin(chi0) + np.cos(chi) * np.cos(chi0) * np.cos(Lam - lam0)
    x = x0 + 2.0 * R * k0 * np.cos(chi) * np.sin(Lam - lam0) / B
    y = y0 + 2.0 * R * k0 * (np.sin(chi) * np.cos(chi0) - np.cos(chi) * np.sin(chi0) * np.cos(Lam - lam0)) / B
    return x, y


def oblique_stereo_inverse(x, y, lon0: float, lat0: float, k0: float,
                           x0: float, y0: float, ellipsoid: str = "bessel1841",
                           iters: int = 10):
    a, f = ELLIPSOIDS[ellipsoid]
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    phi0 = np.deg2rad(lat0)
    lam0 = np.deg2rad(lon0)
    s0, c0 = np.sin(phi0), np.cos(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / np.sqrt(1.0 - e2 * s0 * s0)
    R = np.sqrt(rho0 * nu0)
    n = np.sqrt(1.0 + (e2 * c0**4) / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w0 = (S1 * S2**e) ** n
    sin_chi0 = (w0 - 1.0) / (w0 + 1.0)
    c = (n + s0) * (1.0 - sin_chi0) / ((n - s0) * (1.0 + sin_chi0))
    w0c = c * w0
    chi0 = np.arcsin((w0c - 1.0) / (w0c + 1.0))

    dx = (np.asarray(x, np.float64) - x0) / (2.0 * R * k0)
    dy = (np.asarray(y, np.float64) - y0) / (2.0 * R * k0)
    rho = np.hypot(dx, dy)
    cc = 2.0 * np.arctan(rho)
    chi = np.where(
        rho < 1e-12,
        chi0,
        np.arcsin(np.clip(np.cos(cc) * np.sin(chi0) + dy * np.sin(cc) / np.where(rho == 0, 1, rho) * np.cos(chi0), -1, 1)),
    )
    Lam = np.where(
        rho < 1e-12,
        lam0,
        lam0 + np.arctan2(dx * np.sin(cc), rho * np.cos(chi0) * np.cos(cc) - dy * np.sin(chi0) * np.sin(cc)),
    )
    lam = lam0 + (Lam - lam0) / n
    # iterate geodetic latitude from conformal latitude
    psi = 0.5 * np.log((1.0 + np.sin(chi)) / (c * (1.0 - np.sin(chi)))) / n
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(iters):
        psi_i = np.log(
            np.tan(phi / 2.0 + np.pi / 4.0)
            * ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
        )
        phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * np.sin(phi) ** 2) / (1.0 - e2)
    return np.rad2deg(lam), np.rad2deg(phi)


def _laborde_consts(lat_c: float, lon_c: float, azimuth: float, k0: float,
                    ellipsoid: str):
    a, f = ELLIPSOIDS[ellipsoid]
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    phic = np.deg2rad(lat_c)
    B = np.sqrt(1.0 + e2 * np.cos(phic) ** 4 / (1.0 - e2))
    phis = np.arcsin(np.sin(phic) / B)
    R = a * k0 * np.sqrt(1.0 - e2) / (1.0 - e2 * np.sin(phic) ** 2)
    C = np.log(np.tan(np.pi / 4.0 + phis / 2.0)) - B * np.log(
        np.tan(np.pi / 4.0 + phic / 2.0)
        * ((1.0 - e * np.sin(phic)) / (1.0 + e * np.sin(phic))) ** (e / 2.0)
    )
    G = (1.0 - np.cos(2.0 * np.deg2rad(azimuth))
         + 1j * np.sin(2.0 * np.deg2rad(azimuth))) / 12.0
    return e, B, phis, R, C, G, np.deg2rad(lon_c)


def laborde_forward(lon, lat, lat_c: float, lon_c: float, azimuth: float,
                    k0: float, x0: float, y0: float,
                    ellipsoid: str = "intl1924"):
    """Laborde oblique Mercator (EPSG method 9813 — the Madagascar
    grid), from the published formulas (EPSG Guidance Note 7-2 §3.2.3:
    conformal sphere + oblique rotation + the cubic-in-H Laborde
    correction for the azimuth rotation)."""
    e, B, phis, R, C, G, lamc = _laborde_consts(lat_c, lon_c, azimuth, k0, ellipsoid)
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    L = B * (lam - lamc)
    q = C + B * np.log(
        np.tan(np.pi / 4.0 + phi / 2.0)
        * ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
    )
    P = 2.0 * np.arctan(np.exp(q)) - np.pi / 2.0
    U = np.cos(P) * np.cos(L) * np.cos(phis) + np.sin(P) * np.sin(phis)
    V = np.cos(P) * np.cos(L) * np.sin(phis) - np.sin(P) * np.cos(phis)
    W = np.cos(P) * np.sin(L)
    d = np.hypot(U, V)
    Lp = np.where(d > 0, 2.0 * np.arctan2(V, U + d), 0.0)
    Pp = np.where(d > 0, np.arctan2(W, d), np.sign(W) * np.pi / 2.0)
    H = -Lp + 1j * np.log(np.tan(np.pi / 4.0 + Pp / 2.0))
    HG = H + G * H**3
    return x0 + R * HG.imag, y0 + R * HG.real


def laborde_inverse(x, y, lat_c: float, lon_c: float, azimuth: float,
                    k0: float, x0: float, y0: float,
                    ellipsoid: str = "intl1924", iters: int = 8):
    e, B, phis, R, C, G, lamc = _laborde_consts(lat_c, lon_c, azimuth, k0, ellipsoid)
    T = (np.asarray(y, np.float64) - y0) / R + 1j * (
        np.asarray(x, np.float64) - x0
    ) / R
    H = T  # Newton for H + G H^3 = T
    for _ in range(iters):
        H = (2.0 * G * H**3 + T) / (3.0 * G * H**2 + 1.0)
    Lp = -H.real
    Pp = 2.0 * np.arctan(np.exp(H.imag)) - np.pi / 2.0
    U = np.cos(Pp) * np.cos(Lp)
    V = np.cos(Pp) * np.sin(Lp)
    W = np.sin(Pp)
    # reverse the phis rotation
    nx = U * np.cos(phis) + V * np.sin(phis)
    nz = U * np.sin(phis) - V * np.cos(phis)
    ny = W
    P = np.arcsin(np.clip(nz, -1.0, 1.0))
    L = np.arctan2(ny, nx)
    lam = lamc + L / B
    psi = (np.log(np.tan(np.pi / 4.0 + P / 2.0)) - C) / B
    phi = 2.0 * np.arctan(np.exp(psi)) - np.pi / 2.0
    for _ in range(iters):
        phi = 2.0 * np.arctan(
            ((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))) ** (e / 2.0)
            * np.exp(psi)
        ) - np.pi / 2.0
    return np.rad2deg(lam), np.rad2deg(phi)


def lcc2sp_forward(lon, lat, lat1: float, lat2: float, lat0: float, lon0: float,
                   x0: float, y0: float, ellipsoid: str = "GRS80"):
    """Ellipsoidal Lambert Conformal Conic, 2 standard parallels
    (Snyder, Map Projections — A Working Manual, pp. 107-109), on any
    shipped ellipsoid (NAD83's GRS80 differs from WGS84 by <1e-9 in
    flattening; ED50-based grids use International 1924)."""
    a, f = ELLIPSOIDS[ellipsoid]
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    lam = np.deg2rad(np.asarray(lon, dtype=np.float64))
    phi = np.deg2rad(np.asarray(lat, dtype=np.float64))
    p1, p2, p0 = np.deg2rad(lat1), np.deg2rad(lat2), np.deg2rad(lat0)

    def m(p):
        return np.cos(p) / np.sqrt(1.0 - e2 * np.sin(p) ** 2)

    def t(p):
        return np.tan(np.pi / 4.0 - p / 2.0) / (
            (1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p))
        ) ** (e / 2.0)

    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho = a * F * t(phi) ** n
    rho0 = a * F * t(p0) ** n
    th = n * (lam - np.deg2rad(lon0))
    return rho * np.sin(th) + x0, rho0 - rho * np.cos(th) + y0


def lcc2sp_inverse(x, y, lat1: float, lat2: float, lat0: float, lon0: float,
                   x0: float, y0: float, ellipsoid: str = "GRS80",
                   iters: int = 8):
    a, f = ELLIPSOIDS[ellipsoid]
    e2 = f * (2.0 - f)
    e = np.sqrt(e2)
    xs = np.asarray(x, dtype=np.float64) - x0
    ys = np.asarray(y, dtype=np.float64) - y0
    p1, p2, p0 = np.deg2rad(lat1), np.deg2rad(lat2), np.deg2rad(lat0)

    def m(p):
        return np.cos(p) / np.sqrt(1.0 - e2 * np.sin(p) ** 2)

    def t(p):
        return np.tan(np.pi / 4.0 - p / 2.0) / (
            (1.0 - e * np.sin(p)) / (1.0 + e * np.sin(p))
        ) ** (e / 2.0)

    n = (np.log(m(p1)) - np.log(m(p2))) / (np.log(t(p1)) - np.log(t(p2)))
    F = m(p1) / (n * t(p1) ** n)
    rho0 = a * F * t(p0) ** n
    rho = np.sign(n) * np.hypot(xs, rho0 - ys)
    tp = (rho / (a * F)) ** (1.0 / n)
    th = np.arctan2(xs, rho0 - ys)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(iters):
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - e * np.sin(phi)) / (1.0 + e * np.sin(phi))) ** (e / 2.0)
        )
    return np.rad2deg(th / n) + lon0, np.rad2deg(phi)


# Public EPSG projected-CRS definitions this engine ships (parameters
# from the EPSG registry — public facts). x0/y0 are METERS (unit
# scaling applied on the projected axes per `unit`); datum shifts run
# through the Helmert sets above. Notable rows:
#  2844  NAD83(HARN) / Texas North (m) — the reference's CRS-mixed
#        fixture CRS (tests/fixtures/texas_epsg_2844.geojson)
#  2277  NAD83 / Texas Central (ftUS)
#  2229  NAD83 / California zone 5 (ftUS)
#  2263  NAD83 / New York Long Island (ftUS)
#  3445  NAD83(HARN) / New Hampshire (ftUS) — TM
#  27700 OSGB36 / British National Grid — TM + OSGB36 Helmert (~5 m)
#  25832 ETRS89 / UTM 32N — TM
#  4796  New Beijing / 3-deg Gauss-Kruger CM 117E — TM + approx shift
#  28992 Amersfoort / RD New — oblique stereographic + Helmert
#  5643  ED50 / SPBA LCC — LCC-2SP on International 1924 + ED50 shift
PROJECTED_CODES: dict[int, dict] = {
    2844: dict(method="lcc2sp", lat1=34.65, lat2=36.18333333333333,
               lat0=34.0, lon0=-101.5, x0=200_000.0, y0=1_000_000.0,
               unit="m", ellipsoid="GRS80", datum="GRS80"),
    2277: dict(method="lcc2sp", lat1=31.883333333333333,
               lat2=30.116666666666667, lat0=29.666666666666668,
               lon0=-100.33333333333333, x0=699999.9998983998,
               y0=3000000.0000101604, unit="us-ft", ellipsoid="GRS80",
               datum="GRS80"),
    2229: dict(method="lcc2sp", lat1=35.46666666666667,
               lat2=34.03333333333333, lat0=33.5, lon0=-118.0,
               x0=2000000.0001016, y0=500000.0001016, unit="us-ft",
               ellipsoid="GRS80", datum="GRS80"),
    2263: dict(method="lcc2sp", lat1=41.03333333333333,
               lat2=40.666666666666664, lat0=40.166666666666664,
               lon0=-74.0, x0=300000.0000000001, y0=0.0, unit="us-ft",
               ellipsoid="GRS80", datum="GRS80"),
    5643: dict(method="lcc2sp", lat1=52.666666666666664,
               lat2=54.333333333333336, lat0=48.0, lon0=10.0,
               x0=815_000.0, y0=0.0, unit="m", ellipsoid="intl1924",
               datum="ED50"),
    3445: dict(method="tm", lat0=42.5, lon0=-71.66666666666667,
               k0=0.999966667, x0=300_000.0, y0=0.0, unit="us-ft",
               ellipsoid="GRS80", datum="GRS80"),
    27700: dict(method="tm", lat0=49.0, lon0=-2.0, k0=0.9996012717,
                x0=400_000.0, y0=-100_000.0, unit="m",
                ellipsoid="airy1830", datum="OSGB36"),
    25832: dict(method="tm", lat0=0.0, lon0=9.0, k0=0.9996,
                x0=500_000.0, y0=0.0, unit="m", ellipsoid="GRS80",
                datum="GRS80"),
    4796: dict(method="tm", lat0=0.0, lon0=117.0, k0=1.0,
               x0=500_000.0, y0=0.0, unit="m",
               ellipsoid="krassowsky1940", datum="Beijing1954"),
    28992: dict(method="stereo", lat0=52.15616055555555,
                lon0=5.38763888888889, k0=0.9999079, x0=155_000.0,
                y0=463_000.0, unit="m", ellipsoid="bessel1841",
                datum="Amersfoort"),
    # Tananarive (Paris) / Laborde Grid: projection-centre 21 grads S,
    # 49 grads E of Paris (Paris meridian 2.33722917 deg E), azimuth
    # 21 grads, k0 0.9995 (EPSG registry, Paris-grad values converted)
    29701: dict(method="laborde", lat0=-18.9,
                lon0=46.43722916666667, azimuth=18.9, k0=0.9995,
                x0=400_000.0, y0=800_000.0, unit="m",
                ellipsoid="intl1924", datum="Tananarive1925"),
}


def _projected_code_transforms(code: int):
    """(forward, inverse) WGS84 deg <-> projected coords (in the code's
    native axis unit) for a PROJECTED_CODES entry."""
    spec = PROJECTED_CODES[code]
    ell, datum = spec["ellipsoid"], spec["datum"]
    a, f = ELLIPSOIDS[ell]
    unit_scale = _FT_PER_M if spec["unit"] == "us-ft" else 1.0
    if spec["method"] == "lcc2sp":
        prj = lambda lo, la: lcc2sp_forward(  # noqa: E731
            lo, la, spec["lat1"], spec["lat2"], spec["lat0"], spec["lon0"],
            spec["x0"], spec["y0"], ell)
        unprj = lambda x, y: lcc2sp_inverse(  # noqa: E731
            x, y, spec["lat1"], spec["lat2"], spec["lat0"], spec["lon0"],
            spec["x0"], spec["y0"], ell)
    elif spec["method"] == "tm":
        prj = lambda lo, la: tm_forward(  # noqa: E731
            lo, la, spec["lon0"], spec["lat0"], spec["k0"], spec["x0"],
            spec["y0"], ell)
        unprj = lambda x, y: tm_inverse(  # noqa: E731
            x, y, spec["lon0"], spec["lat0"], spec["k0"], spec["x0"],
            spec["y0"], ell)
    elif spec["method"] == "laborde":
        prj = lambda lo, la: laborde_forward(  # noqa: E731
            lo, la, spec["lat0"], spec["lon0"], spec["azimuth"],
            spec["k0"], spec["x0"], spec["y0"], ell)
        unprj = lambda x, y: laborde_inverse(  # noqa: E731
            x, y, spec["lat0"], spec["lon0"], spec["azimuth"],
            spec["k0"], spec["x0"], spec["y0"], ell)
    else:
        prj = lambda lo, la: oblique_stereo_forward(  # noqa: E731
            lo, la, spec["lon0"], spec["lat0"], spec["k0"], spec["x0"],
            spec["y0"], ell)
        unprj = lambda x, y: oblique_stereo_inverse(  # noqa: E731
            x, y, spec["lon0"], spec["lat0"], spec["k0"], spec["x0"],
            spec["y0"], ell)

    def fwd(lon, lat):
        lo, la = _datum_from_wgs84(lon, lat, datum, a, f)
        x, y = prj(lo, la)
        return np.asarray(x) * unit_scale, np.asarray(y) * unit_scale

    def inv(x, y):
        lo, la = unprj(
            np.asarray(x, np.float64) / unit_scale,
            np.asarray(y, np.float64) / unit_scale,
        )
        return _datum_to_wgs84(lo, la, datum, a, f)

    return fwd, inv


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
        if code_s.isdigit() and int(code_s) in PROJECTED_CODES:
            # the registry unit is authoritative for these codes (the
            # EPSG definition fixes the axis unit; us-ft == the
            # FT_PER_M survey foot used engine-wide)
            return _projected_code_transforms(int(code_s))
    raise ValueError(f"unsupported crs {crs!r} (implemented: EPSG:4326, "
                     "EPSG:3857, EPSG:326xx/327xx UTM, ESRI:54009, "
                     f"national grids {sorted(PROJECTED_CODES)})")


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
