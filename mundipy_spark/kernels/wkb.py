"""WKB / WKT / GeoJSON codecs over numpy (no shapely).

Internal geometry representation used by every kernel in this package —
chosen for cheap numpy vectorization, mirroring the seven OGC
simple-feature types the reference supports (reference
mundipy/geometry.py:326-373):

    ("Point",              ndarray shape (2,))
    ("MultiPoint",         ndarray shape (n, 2))
    ("LineString",         ndarray shape (n, 2))
    ("MultiLineString",    [ndarray (n, 2), ...])
    ("Polygon",            [ring ndarray (n, 2), ...])   # ring[0] exterior
    ("MultiPolygon",       [[ring, ...], ...])
    ("GeometryCollection", [geom, ...])

Encoding is always little-endian ISO WKB; decoding accepts either byte
order and silently drops Z/M ordinates (the reference observes but never
uses Z — geometry.py:115).

Point columns get allocation-free bulk codecs (`encode_points` /
`decode_points`): a single (n, 21) uint8 matrix instead of n parses.
"""

from __future__ import annotations

import json
import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

_TYPE_NAMES = {
    WKB_POINT: "Point",
    WKB_LINESTRING: "LineString",
    WKB_POLYGON: "Polygon",
    WKB_MULTIPOINT: "MultiPoint",
    WKB_MULTILINESTRING: "MultiLineString",
    WKB_MULTIPOLYGON: "MultiPolygon",
    WKB_GEOMETRYCOLLECTION: "GeometryCollection",
}
_TYPE_CODES = {v: k for k, v in _TYPE_NAMES.items()}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0


def _read_header(r: _Reader) -> tuple[str, int, int]:
    """Returns (endian_char, base_type, ndim)."""
    little = r.buf[r.pos]
    r.pos += 1
    e = "<" if little else ">"
    (code,) = struct.unpack_from(e + "I", r.buf, r.pos)
    r.pos += 4
    ndim = 2
    if code & 0x80000000:  # old-style (EWKB) Z flag
        ndim += 1
        code &= 0x7FFFFFFF
    if code & 0x40000000:  # EWKB M flag
        ndim += 1
        code &= 0xBFFFFFFF
    if code & 0x20000000:  # EWKB SRID flag: the 4-byte SRID payload
        r.pos += 4  # follows the type code and must be consumed
        code &= 0xDFFFFFFF
    code &= 0x1FFFFFFF  # strip any remaining EWKB flag bits
    if code >= 3000:
        code -= 3000
        ndim = 4
    elif code >= 2000:
        code -= 2000
        ndim = 3
    elif code >= 1000:
        code -= 1000
        ndim = 3
    return e, code, ndim


def _read_coords(r: _Reader, n: int, e: str, ndim: int) -> np.ndarray:
    dt = np.dtype("<f8" if e == "<" else ">f8")
    raw = np.frombuffer(r.buf, dtype=dt, count=n * ndim, offset=r.pos)
    r.pos += 8 * n * ndim
    pts = raw.reshape(n, ndim)[:, :2]
    return np.ascontiguousarray(pts, dtype=np.float64)


def _read_uint(r: _Reader, e: str) -> int:
    (v,) = struct.unpack_from(e + "I", r.buf, r.pos)
    r.pos += 4
    return v


def _read_geom(r: _Reader):
    e, code, ndim = _read_header(r)
    if code == WKB_POINT:
        pts = _read_coords(r, 1, e, ndim)
        return ("Point", pts[0])
    if code == WKB_LINESTRING:
        n = _read_uint(r, e)
        return ("LineString", _read_coords(r, n, e, ndim))
    if code == WKB_POLYGON:
        nrings = _read_uint(r, e)
        rings = []
        for _ in range(nrings):
            n = _read_uint(r, e)
            rings.append(_read_coords(r, n, e, ndim))
        return ("Polygon", rings)
    if code == WKB_MULTIPOINT:
        n = _read_uint(r, e)
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            g = _read_geom(r)
            pts[i] = g[1]
        return ("MultiPoint", pts)
    if code == WKB_MULTILINESTRING:
        n = _read_uint(r, e)
        return ("MultiLineString", [_read_geom(r)[1] for _ in range(n)])
    if code == WKB_MULTIPOLYGON:
        n = _read_uint(r, e)
        return ("MultiPolygon", [_read_geom(r)[1] for _ in range(n)])
    if code == WKB_GEOMETRYCOLLECTION:
        n = _read_uint(r, e)
        return ("GeometryCollection", [_read_geom(r) for _ in range(n)])
    raise ValueError(f"unsupported WKB geometry type code {code}")


def loads(buf: bytes):
    """Parse one WKB buffer into the internal representation."""
    if buf is None:
        return None
    return _read_geom(_Reader(bytes(buf)))


def wkb_has_z(buf) -> bool:
    """True if the WKB declares a Z ordinate (EWKB 0x80000000 flag or
    ISO 1000/3000-range type codes). The decoder still DROPS Z values
    (module docstring) — this observes only the flag, closing the
    reference's `has_z` passthrough (mundipy/geometry.py:115) without
    changing engine semantics (the reference never *uses* Z either).

    Containers whose top-level header is 2D get their first child
    peeked (the GEOSHasZ first-coordinate convention)."""
    if buf is None:
        return False
    return _has_z_at(bytes(buf), 0)


def _has_z_at(buf: bytes, pos: int) -> bool:
    e = "<" if buf[pos] else ">"
    (code,) = struct.unpack_from(e + "I", buf, pos + 1)
    pos += 5
    if code & 0x80000000:  # EWKB Z
        return True
    if code & 0x20000000:  # SRID payload precedes any child
        pos += 4
    c = code & 0x1FFFFFFF
    if c >= 3000 or (1000 <= c < 2000):  # ISO Z / ZM ranges
        return True
    if c >= 2000:  # ISO M-only
        c -= 2000
    if c in (
        WKB_MULTIPOINT,
        WKB_MULTILINESTRING,
        WKB_MULTIPOLYGON,
        WKB_GEOMETRYCOLLECTION,
    ):
        (n,) = struct.unpack_from(e + "I", buf, pos)
        if n > 0:
            return _has_z_at(buf, pos + 4)
    return False


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _w_header(out: list[bytes], code: int) -> None:
    out.append(b"\x01")
    out.append(struct.pack("<I", code))


def _w_coords(out: list[bytes], pts: np.ndarray) -> None:
    a = np.ascontiguousarray(pts, dtype="<f8")
    out.append(struct.pack("<I", len(a)))
    out.append(a.tobytes())


def _w_geom(out: list[bytes], geom) -> None:
    t, data = geom
    code = _TYPE_CODES[t]
    _w_header(out, code)
    if t == "Point":
        out.append(np.asarray(data, dtype="<f8").tobytes())
    elif t == "LineString":
        _w_coords(out, data)
    elif t == "Polygon":
        out.append(struct.pack("<I", len(data)))
        for ring in data:
            _w_coords(out, ring)
    elif t == "MultiPoint":
        pts = np.asarray(data, dtype=np.float64).reshape(-1, 2)
        out.append(struct.pack("<I", len(pts)))
        for p in pts:
            _w_geom(out, ("Point", p))
    elif t == "MultiLineString":
        out.append(struct.pack("<I", len(data)))
        for line in data:
            _w_geom(out, ("LineString", line))
    elif t == "MultiPolygon":
        out.append(struct.pack("<I", len(data)))
        for poly in data:
            _w_geom(out, ("Polygon", poly))
    elif t == "GeometryCollection":
        out.append(struct.pack("<I", len(data)))
        for g in data:
            _w_geom(out, g)
    else:
        raise ValueError(f"unsupported geometry type {t}")


def dumps(geom) -> bytes:
    """Encode the internal representation as little-endian ISO WKB."""
    out: list[bytes] = []
    _w_geom(out, geom)
    return b"".join(out)


# ---------------------------------------------------------------------------
# bulk point fast paths (the hot side of every web-scale join)
# ---------------------------------------------------------------------------

_POINT_LEN = 21  # 1 endian + 4 type + 16 coords


def encode_points(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    """Vectorized WKB encode of n points: one (n, 21) uint8 matrix."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    m = np.empty((n, _POINT_LEN), dtype=np.uint8)
    m[:, 0] = 1
    m[:, 1:5] = np.frombuffer(struct.pack("<I", WKB_POINT), dtype=np.uint8)
    m[:, 5:13] = x.astype("<f8").view(np.uint8).reshape(n, 8)
    m[:, 13:21] = y.astype("<f8").view(np.uint8).reshape(n, 8)
    return [row.tobytes() for row in m]


def decode_points(bufs) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of a column that is all little-endian 2-D points.

    Raises ValueError if any buffer is not a 21-byte LE point; callers
    fall back to the generic parser.
    """
    blob = b"".join(bufs)
    n = len(bufs)
    if len(blob) != n * _POINT_LEN:
        raise ValueError("not all plain 2-D points")
    m = np.frombuffer(blob, dtype=np.uint8).reshape(n, _POINT_LEN)
    hdr_ok = (m[:, 0] == 1) & (m[:, 1] == WKB_POINT) & (m[:, 2:5] == 0).all(axis=1)
    if not hdr_ok.all():
        raise ValueError("not all little-endian points")
    x = m[:, 5:13].copy().view("<f8").ravel()
    y = m[:, 13:21].copy().view("<f8").ravel()
    return x, y


# ---------------------------------------------------------------------------
# bounds
# ---------------------------------------------------------------------------


def _coord_arrays(geom):
    """Yield every coordinate array in a geometry."""
    t, data = geom
    if t == "Point":
        yield np.asarray(data, dtype=np.float64).reshape(1, 2)
    elif t in ("LineString", "MultiPoint"):
        yield np.asarray(data, dtype=np.float64).reshape(-1, 2)
    elif t in ("Polygon", "MultiLineString"):
        for part in data:
            yield np.asarray(part, dtype=np.float64).reshape(-1, 2)
    elif t == "MultiPolygon":
        for poly in data:
            for ring in poly:
                yield np.asarray(ring, dtype=np.float64).reshape(-1, 2)
    elif t == "GeometryCollection":
        for g in data:
            yield from _coord_arrays(g)


def bounds(geom) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy); matches the reference's `.bounds` accessor
    (reference mundipy/geometry.py:80)."""
    minx = miny = np.inf
    maxx = maxy = -np.inf
    for arr in _coord_arrays(geom):
        if len(arr) == 0:
            continue
        minx = min(minx, float(arr[:, 0].min()))
        miny = min(miny, float(arr[:, 1].min()))
        maxx = max(maxx, float(arr[:, 0].max()))
        maxy = max(maxy, float(arr[:, 1].max()))
    return (minx, miny, maxx, maxy)


def geom_type(geom) -> str:
    return geom[0]


# ---------------------------------------------------------------------------
# WKT
# ---------------------------------------------------------------------------


def _fmt_num(x) -> str:
    # shortest round-trip decimal (Python repr): WKT stays lossless —
    # %.10g truncated to 10 significant digits, so astext->fromtext
    # round-trips moved coordinates by up to ~1e-8 deg (cm on Earth)
    s = repr(float(x))
    return s[:-2] if s.endswith(".0") else s


def _fmt_xy(p) -> str:
    return f"{_fmt_num(p[0])} {_fmt_num(p[1])}"


def _fmt_seq(pts) -> str:
    return "(" + ", ".join(_fmt_xy(p) for p in np.asarray(pts).reshape(-1, 2)) + ")"


def to_wkt(geom) -> str:
    t, data = geom
    if t == "Point":
        return f"POINT ({_fmt_xy(data)})"
    if t == "LineString":
        return "LINESTRING " + _fmt_seq(data)
    if t == "Polygon":
        return "POLYGON (" + ", ".join(_fmt_seq(r) for r in data) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT " + _fmt_seq(data)
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(_fmt_seq(l) for l in data) + ")"
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_fmt_seq(r) for r in rings) + ")" for rings in data)
            + ")"
        )
    if t == "GeometryCollection":
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(g) for g in data) + ")"
    raise ValueError(t)


def _parse_parens(s: str, pos: int):
    """Parse a balanced paren group starting at s[pos]=='(' into nested lists
    of float pairs."""
    assert s[pos] == "("
    depth = 0
    start = pos
    for i in range(pos, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i], i + 1
    raise ValueError("unbalanced WKT parens")


def _coords_of(body: str) -> np.ndarray:
    pts = []
    for tok in body.split(","):
        parts = tok.split()
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _split_top(body: str) -> list[str]:
    """Split a paren-group body on top-level commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return [s.strip() for s in out]


def _strip1(s: str) -> str:
    s = s.strip()
    assert s[0] == "(" and s[-1] == ")", s
    return s[1:-1]


def from_wkt(wkt: str):
    s = wkt.strip()
    u = s.upper()
    if u.startswith("GEOMETRYCOLLECTION"):
        body, _ = _parse_parens(s, s.index("("))
        return ("GeometryCollection", [from_wkt(p) for p in _split_top(body)])
    head, rest = s.split("(", 1)
    head = head.strip().upper()
    if head.endswith(" EMPTY"):
        raise ValueError("EMPTY WKT not supported")
    body = "(" + rest
    inner, _ = _parse_parens(body, 0)
    if head == "POINT":
        return ("Point", _coords_of(inner)[0])
    if head == "LINESTRING":
        return ("LineString", _coords_of(inner))
    if head == "POLYGON":
        return ("Polygon", [_coords_of(_strip1(r)) for r in _split_top(inner)])
    if head == "MULTIPOINT":
        if "(" in inner:
            pts = [_coords_of(_strip1(p))[0] for p in _split_top(inner)]
        else:
            pts = _coords_of(inner)
        return ("MultiPoint", np.asarray(pts, dtype=np.float64).reshape(-1, 2))
    if head == "MULTILINESTRING":
        return ("MultiLineString", [_coords_of(_strip1(l)) for l in _split_top(inner)])
    if head == "MULTIPOLYGON":
        polys = []
        for poly in _split_top(inner):
            pbody = _strip1(poly)
            polys.append([_coords_of(_strip1(r)) for r in _split_top(pbody)])
        return ("MultiPolygon", polys)
    raise ValueError(f"unsupported WKT type {head}")


# ---------------------------------------------------------------------------
# GeoJSON (reference mundipy/geometry.py:394-410 loads/dumps)
# ---------------------------------------------------------------------------


def from_geojson(obj):
    """GeoJSON geometry dict (or JSON string) -> internal representation."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    t = obj["type"]
    c = obj["coordinates"] if t != "GeometryCollection" else None
    if t == "Point":
        return ("Point", np.asarray(c, dtype=np.float64)[:2])
    if t in ("LineString", "MultiPoint"):
        return (t, np.asarray(c, dtype=np.float64)[:, :2])
    if t in ("Polygon", "MultiLineString"):
        return (t, [np.asarray(r, dtype=np.float64)[:, :2] for r in c])
    if t == "MultiPolygon":
        return (t, [[np.asarray(r, dtype=np.float64)[:, :2] for r in poly] for poly in c])
    if t == "GeometryCollection":
        return (t, [from_geojson(g) for g in obj["geometries"]])
    raise ValueError(f"unsupported GeoJSON type {t}")


def _jsonable(x):
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x


def to_geojson(geom) -> dict:
    t, data = geom
    if t == "Point":
        return {"type": t, "coordinates": _jsonable(np.asarray(data))}
    if t in ("LineString", "MultiPoint"):
        return {"type": t, "coordinates": _jsonable(np.asarray(data).reshape(-1, 2))}
    if t in ("Polygon", "MultiLineString"):
        return {"type": t, "coordinates": [_jsonable(np.asarray(r)) for r in data]}
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [[_jsonable(np.asarray(r)) for r in poly] for poly in data],
        }
    if t == "GeometryCollection":
        return {"type": t, "geometries": [to_geojson(g) for g in data]}
    raise ValueError(t)
