"""KML source (S1 formats breadth — the reference reads KML through
fiona/GDAL, docs/manual/datasets.mdx:29-41): stdlib-XML parse of
Placemark Point / LineString / Polygon (+ MultiGeometry), ExtendedData
and name/description as properties. Driver-parsed like the reference's
single-handle fiona scan; layers become DataFrames via createDataFrame.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np

from mundipy_spark.kernels import wkb as wkb_mod

_NS = re.compile(r"\{.*?\}")


def _tag(e) -> str:
    return _NS.sub("", e.tag)


def _coords(text: str) -> np.ndarray:
    pts = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            pts.append((float(parts[0]), float(parts[1])))  # lon,lat[,alt]
    return np.asarray(pts, dtype=np.float64)


def _parse_geom(el):
    t = _tag(el)
    if t == "Point":
        c = _coords(el.findtext(".//{*}coordinates", ""))
        return ("Point", c[0]) if len(c) else None
    if t == "LineString":
        c = _coords(el.findtext(".//{*}coordinates", ""))
        return ("LineString", c) if len(c) >= 2 else None
    if t == "Polygon":
        rings = []
        outer = el.find(".//{*}outerBoundaryIs/{*}LinearRing/{*}coordinates")
        if outer is not None:
            rings.append(_coords(outer.text))
        for inner in el.findall(".//{*}innerBoundaryIs/{*}LinearRing/{*}coordinates"):
            rings.append(_coords(inner.text))
        return ("Polygon", rings) if rings else None
    if t == "MultiGeometry":
        gs = [g for g in (_parse_geom(ch) for ch in el) if g is not None]
        if not gs:
            return None
        if len(gs) == 1:
            return gs[0]
        if all(g[0] == "Point" for g in gs):
            return ("MultiPoint", np.vstack([g[1] for g in gs]))
        if all(g[0] == "Polygon" for g in gs):
            return ("MultiPolygon", [g[1] for g in gs])
        if all(g[0] == "LineString" for g in gs):
            return ("MultiLineString", [g[1] for g in gs])
        return ("GeometryCollection", gs)
    return None


def parse_kml(text: str) -> list[tuple]:
    """[(geometry tuple, props dict)] for every Placemark."""
    root = ET.fromstring(text)
    out = []
    for pm in root.iter():
        if _tag(pm) != "Placemark":
            continue
        props = {}
        for ch in pm:
            t = _tag(ch)
            if t in ("name", "description") and ch.text:
                props[t] = ch.text.strip()
            elif t == "ExtendedData":
                for d in ch.findall(".//{*}Data"):
                    k = d.get("name")
                    v = d.findtext("{*}value")
                    if k is not None:
                        props[k] = v.strip() if v else None
                for d in ch.findall(".//{*}SimpleData"):
                    k = d.get("name")
                    if k is not None:
                        props[k] = (d.text or "").strip()
        geom = None
        for ch in pm:
            g = _parse_geom(ch)
            if g is not None:
                geom = g
                break
        if geom is not None:
            out.append((geom, props))
    return out


def read_kml(spark, path: str, geom_col: str = "geometry"):
    """KML file -> DataFrame(geometry binary, <props>)."""
    import pandas as pd

    feats = parse_kml(open(path, encoding="utf-8").read())
    rows = []
    for g, p in feats:
        row = {geom_col: wkb_mod.dumps(g)}
        for k, v in p.items():
            # ExtendedData named like the geometry column must not
            # clobber the encoded WKB
            row[k if k != geom_col else f"{k}_prop"] = v
        rows.append(row)
    return spark.createDataFrame(pd.DataFrame(rows))
