"""External HTTP APIs (S9, reference mundipy/api/__init__.py): the
Mapbox isochrone call, with the reference's exact argument/error
semantics, plus a set-scale Spark variant.

The HTTP transport is an injectable seam (`opener=`) so the request
construction and response parsing are fully unit-tested offline (the
sandbox has no network); the default opener is urllib, identical to the
reference."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from mundipy_spark.feature import Feature
from mundipy_spark.kernels import wkb


def _build_isochrone_request(pt, radius: float, units: str, accessToken):
    """URL + params for the Mapbox Isochrone API — the reference's exact
    request shape and error types (api/__init__.py:7-27)."""
    if accessToken is None:
        raise ValueError("mundipy.api.isochrone called without Mapbox accessToken")
    geom = pt.geom if isinstance(pt, Feature) else pt
    if not (isinstance(geom, tuple) and geom[0] == "Point"):
        raise TypeError(
            "mundipy.api.isochrone expects pt to be a Point, got %s" % type(pt)
        )
    x, y = float(geom[1][0]), float(geom[1][1])
    url = "https://api.mapbox.com/isochrone/v1/mapbox/driving/%f%%2C%f" % (x, y)
    params = {"polygons": "true", "denoise": 1, "access_token": accessToken}
    if units == "minutes":
        params["contours_minutes"] = radius
    elif units == "meters":
        params["contours_meters"] = radius
    else:
        raise TypeError(
            'unknown unit "%s" passed to mundipy.api.isochrone '
            "(need minutes or meters)" % units
        )
    return url, params


def isochrone(pt, radius: float, units: str, accessToken=None, opener=None):
    """Driving isochrone polygon around `pt` (reference
    api/__init__.py:7-33): returns the first FeatureCollection feature
    as a Feature. `opener(url) -> bytes` defaults to urllib."""
    url, params = _build_isochrone_request(pt, radius, units, accessToken)
    full = url + "?" + urllib.parse.urlencode(params)
    if opener is None:
        opener = lambda u: urllib.request.urlopen(u).read()  # noqa: E731
    raw = opener(full)
    data = json.loads(raw.decode("utf-8") if isinstance(raw, bytes) else raw)
    feats = data["features"]
    if not feats:
        return None
    f0 = feats[0]
    return Feature(wkb.from_geojson(f0["geometry"]), f0.get("properties") or {})


def isochrones_df(df, radius: float, units: str, accessToken=None, opener=None,
                  lon: str = "lon", lat: str = "lat", id_col: str | None = None):
    """Set-scale variant: one isochrone per input point row, fetched
    from executors via mapInPandas (each partition keeps an HTTP
    connection's worth of requests; payloads never shuffle). Returns
    (id?, geometry binary, props json)."""
    import pandas as pd

    url_params = _build_isochrone_request(
        ("Point", (0.0, 0.0)), radius, units, accessToken
    )  # validate args driver-side before shipping the job
    del url_params

    cols = [c for c in ([id_col] if id_col else []) if c]
    # carry the id column through with ITS OWN type (url strings, uuids,
    # longs all work) — hard-coding long would crash int() on any
    # non-integer id
    schema = (
        ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols)
        + ", " if cols else ""
    ) + "geometry binary, props string"

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                feat = isochrone(
                    ("Point", (float(r[lon]), float(r[lat]))),
                    radius, units, accessToken, opener=opener,
                )
                if feat is None:
                    continue
                out = {c: r[c] for c in cols}
                out["geometry"] = wkb.dumps(feat.geom)
                out["props"] = json.dumps(feat.features)
                rows.append(out)
            yield pd.DataFrame(rows, columns=[*cols, "geometry", "props"])

    return df.mapInPandas(run, schema)
