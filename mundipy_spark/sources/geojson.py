"""GeoJSON source/sink (reference S6/S7: mundipy/geometry.py:394-410).

Small files (fixtures, admin layers) parse driver-side into an Arrow
DataFrame; large line-delimited GeoJSON scales out via spark.read.text +
from_json + the WKB-encode UDF (read_geojson_lines). Export always
emits EPSG:4326 coordinates, matching the reference's __geo_interface__
invariant (mundipy/geometry.py:231-238).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mundipy_spark.functions import st
from mundipy_spark.kernels import wkb


def read_geojson(
    spark: SparkSession, path: str, geom_col: str = "geometry"
) -> DataFrame:
    """FeatureCollection file -> DataFrame(geometry binary, <props...>).

    Property keys are unioned across features (the reference's dynamic
    dict schema, mundipy/geometry.py:173-175, becomes a fixed StructType
    once per layer — SURVEY §1.3)."""
    with open(path) as f:
        fc = json.load(f)
    feats = fc["features"] if fc.get("type") == "FeatureCollection" else [fc]
    keys: list[str] = []
    for ft in feats:
        for k in (ft.get("properties") or {}):
            if k not in keys:
                keys.append(k)
    rows = []
    for ft in feats:
        props = ft.get("properties") or {}
        geom = wkb.dumps(wkb.from_geojson(ft["geometry"])) if ft.get("geometry") else None
        rows.append({geom_col: geom, **{k: props.get(k) for k in keys}})
    pdf = pd.DataFrame(rows, columns=[geom_col, *keys])
    # object columns with mixed None -> let Spark infer per column
    return spark.createDataFrame(pdf)


def read_geojson_lines(
    spark: SparkSession, path: str, geom_col: str = "geometry"
) -> DataFrame:
    """Line-delimited GeoJSON features at scale: distributed text scan ->
    JSON decode -> WKB encode, never collecting to the driver."""
    raw = spark.read.text(path)
    parsed = raw.select(
        F.get_json_object("value", "$.geometry").alias("_gj"),
        F.get_json_object("value", "$.properties").alias("props_json"),
    )
    return parsed.withColumn(geom_col, st.st_geomfromgeojson(F.col("_gj"))).drop("_gj")


def to_feature_collection(
    df: DataFrame, geom_col: str = "geometry", limit: int | None = None
) -> dict:
    """Driver-side export to a FeatureCollection dict (the Mundi.q output
    shape, mundipy/mundi.py:168-171). Use only on small results."""
    if limit is not None:
        df = df.limit(limit)
    pdf = df.toPandas()
    feats = []
    for _, row in pdf.iterrows():
        geom = row[geom_col]
        props = {k: _py(v) for k, v in row.items() if k != geom_col}
        feats.append(
            {
                "type": "Feature",
                "geometry": wkb.to_geojson(wkb.loads(geom)) if geom is not None else None,
                "properties": props,
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def _py(v):
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
    except ImportError:
        pass
    return v


def write_geojson(df: DataFrame, path: str, geom_col: str = "geometry") -> None:
    """Distributed sink: one JSON feature per line.

    The geometry member is spliced in as raw JSON text (st_asgeojson
    already returns a serialized object) — wrapping it in to_json would
    re-escape it into a JSON *string*, which external GeoJSON consumers
    reject."""
    cols = [c for c in df.columns if c != geom_col]
    props = (
        F.to_json(F.struct(*[F.col(c) for c in cols])) if cols else F.lit("{}")
    )
    out = df.select(
        F.concat(
            F.lit('{"type":"Feature","geometry":'),
            F.coalesce(st.st_asgeojson(F.col(geom_col)), F.lit("null")),
            F.lit(',"properties":'),
            F.coalesce(props, F.lit("{}")),
            F.lit("}"),
        ).alias("value")
    )
    out.write.mode("overwrite").text(path)
