"""Synthetic Common-Crawl-style pages table + admin-region polygon layer.

The driver's input hint calls for an Iceberg table
(url string, warc_ts timestamp, html binary, text string, lang string).
No Iceberg runtime jars exist in the sandbox, so the table materializes
as partitioned parquet with the same schema — swapping to Iceberg is the
one-liner `spark.read.format("iceberg").load(...)` on a cluster that has
the runtime (SURVEY §7.0).

Synthesis is deterministic ARITHMETIC over the driver's `documents`
table (seeded by the driver, TESTDATA.md) — every derivation below is
reproducible in plain SQL, so the DuckDB oracle can re-derive the exact
same pages and the driver's value-hash comparison is meaningful.

Geo mentions are embedded as `geo:<lat_centideg>,<lon_centideg>` integer
tokens appended to the text (integer formatting is engine-identical;
float printf is not). The ORIGINAL document text is preserved
byte-identically as the page text prefix — the pipeline's per-url
invariant (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mundipy_spark.kernels import wkb

# arithmetic constants shared with the SQL derivations below
LAT_MUL = 104729
LON_MUL = 7919


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang,
    doc_id). One page per document; ~1/8 of pages carry NO geo mention
    (geoparse must pass them through un-geocoded)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    latc = (F.col("doc_id") * LAT_MUL) % 18000 - 9000  # centidegrees
    lonc = (F.col("doc_id") * LON_MUL) % 36000 - 18000
    has_geo = (F.col("doc_id") % 8) != 0
    text = F.when(
        has_geo,
        F.concat(
            F.col("text"), F.lit(" geo:"), latc.cast("string"), F.lit(","), lonc.cast("string")
        ),
    ).otherwise(F.col("text"))
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("https://example.org/"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id") * 3600)).alias("warc_ts"),
        F.encode(text, "UTF-8").alias("html"),
        text.alias("text"),
        F.col("lang"),
    )


PAGES_SQL_CTE = f"""
pages AS (
  SELECT
    doc_id,
    'https://example.org/' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
    CASE WHEN doc_id % 8 <> 0
         THEN text || ' geo:' || CAST((doc_id * {LAT_MUL}) % 18000 - 9000 AS VARCHAR)
                   || ',' || CAST((doc_id * {LON_MUL}) % 36000 - 18000 AS VARCHAR)
         ELSE text END AS text,
    lang
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# admin-region polygon layer (the OSM-extract stand-in)
# ---------------------------------------------------------------------------


def synth_regions(
    spark: SparkSession, step_deg: float = 10.0, triangles: bool = False
) -> DataFrame:
    """Deterministic world admin layer: a step_deg x step_deg grid of
    rectangle polygons (648 regions at 10 deg), each with a name and a
    deterministic population. `triangles=True` splits each rectangle
    into SW/NE triangles — non-rectangular polygons whose membership is
    STILL closed-form in SQL (a half-plane sign test), so the generic
    tile-join machinery gets exercised against an independent oracle.

    Real OSM admin layers plug in through read_geojson / parquet with
    the same (geometry, name, ...) shape.
    """
    nx = int(round(360.0 / step_deg))
    ny = int(round(180.0 / step_deg))
    rows = []
    for gx in range(nx):
        for gy in range(ny):
            x0 = -180.0 + gx * step_deg
            y0 = -90.0 + gy * step_deg
            x1, y1 = x0 + step_deg, y0 + step_deg
            pop = float((gx * 31 + gy * 17) % 1000 + 1)
            if triangles:
                sw = np.array([[x0, y0], [x1, y0], [x0, y1], [x0, y0]])
                ne = np.array([[x1, y0], [x1, y1], [x0, y1], [x1, y0]])
                rows.append(
                    {"region": f"T_{gx}_{gy}_sw", "geometry": wkb.dumps(("Polygon", [sw])), "pop": pop}
                )
                rows.append(
                    {"region": f"T_{gx}_{gy}_ne", "geometry": wkb.dumps(("Polygon", [ne])), "pop": pop}
                )
            else:
                ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
                rows.append(
                    {"region": f"R_{gx}_{gy}", "geometry": wkb.dumps(("Polygon", [ring])), "pop": pop}
                )
    pdf = pd.DataFrame(rows, columns=["region", "geometry", "pop"])
    return spark.createDataFrame(pdf)


def synth_zones(spark: SparkSession, step_deg: float = 20.0, offset_deg: float = 5.0) -> DataFrame:
    """A second polygon layer OFFSET from the region grid so zone/region
    overlaps are PARTIAL — the catchment-style weighted-join workload
    (reference docs/tutorials/catchment-area.mdx). Closed-form in SQL:
    rectangle intersections are least/greatest arithmetic."""
    rows = []
    nx = int((360.0 - 2 * offset_deg) // step_deg)
    ny = int((180.0 - 2 * offset_deg) // step_deg)
    for gx in range(nx):
        for gy in range(ny):
            x0 = -180.0 + offset_deg + gx * step_deg
            y0 = -90.0 + offset_deg + gy * step_deg
            ring = np.array(
                [[x0, y0], [x0 + step_deg, y0], [x0 + step_deg, y0 + step_deg],
                 [x0, y0 + step_deg], [x0, y0]]
            )
            rows.append({"zone": f"Z_{gx}_{gy}", "geometry": wkb.dumps(("Polygon", [ring]))})
    return spark.createDataFrame(pd.DataFrame(rows, columns=["zone", "geometry"]))


def region_name_sql(lon_expr: str, lat_expr: str, step_deg: float = 10.0) -> str:
    """Closed-form region name of a point — the oracle twin of the
    generic tile join against synth_regions(triangles=False).

    Boundary convention: rectangles are closed on all edges, so a point
    exactly on a shared edge matches BOTH adjacent rectangles (the tile
    join emits both pairs) while the floor form picks one. Synth pages
    avoid the ambiguity BY CONSTRUCTION: an edge coordinate requires
    centideg % 1000 == 0, i.e. doc_id % 1000 == 0 (both multipliers are
    coprime to 1000), and every multiple of 1000 is a multiple of 8 —
    exactly the doc_ids synth_pages leaves WITHOUT a geo mention. So no
    geoparsed point ever sits on a region edge."""
    nx = int(round(360.0 / step_deg))
    ny = int(round(180.0 / step_deg))
    gx = f"least(greatest(CAST(floor(({lon_expr} + 180.0) / {step_deg}) AS BIGINT), 0), {nx - 1})"
    gy = f"least(greatest(CAST(floor(({lat_expr} + 90.0) / {step_deg}) AS BIGINT), 0), {ny - 1})"
    return f"('R_' || CAST({gx} AS VARCHAR) || '_' || CAST({gy} AS VARCHAR))"
