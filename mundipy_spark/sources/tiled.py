"""Tile-partitioned layer layout: the S4 bbox-scan scale path.

`write_tiled` lands every feature in the parquet partition directory of
the coarse cell containing its bbox CENTER, and records the layer's
maximum feature half-extent in a `_mundipy_tiled.json` sidecar (files
starting with `_` are invisible to Spark's reader). `tiled_bbox_scan`
then turns a bbox query into a partition-pruned scan: candidate tiles =
the cells covering the query box EXPANDED by that half-extent (sound —
a feature can only live in a cell within half-extent of anything it
touches), compiled to `tile IN (...)` which Catalyst resolves at
PLANNING time against the directory listing. A 10-degree query against
a world layer reads ~dozens of directories instead of the whole table —
the partition-pruning story that makes bbox scans O(result) at 100 TB.
Exact bbox predicates still refine rows inside the surviving tiles.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mundipy_spark.functions import st
from mundipy_spark.kernels import tiling

SIDEPATH = "_mundipy_tiled.json"


def write_tiled(
    df: DataFrame,
    path: str,
    res: int = 4,
    mode: str = "overwrite",
) -> dict:
    """df must carry minx/miny/maxx/maxy (Dataset layers do). Returns
    the sidecar metadata."""
    from pyspark.sql import Observation

    cx = (F.col("minx") + F.col("maxx")) / 2.0
    cy = (F.col("miny") + F.col("maxy")) / 2.0
    # piggyback the half-extent aggregate on the write job via observe()
    # instead of a second full scan of the input
    obs = Observation("tiled_meta")
    out = df.withColumn("tile", st.cell_expr(cx, cy, res)).observe(
        obs,
        F.max(
            F.greatest(F.col("maxx") - F.col("minx"), F.col("maxy") - F.col("miny"))
            / 2.0
        ).alias("he"),
    )
    out.write.partitionBy("tile").mode(mode).parquet(path)
    he = obs.get["he"]
    meta = {"res": res, "max_half_extent_deg": float(he or 0.0)}
    with open(os.path.join(path, SIDEPATH), "w") as f:
        json.dump(meta, f)
    return meta


def read_tiled(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def tiled_bbox_scan(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float],
    max_tiles: int = 4096,
) -> DataFrame:
    """Partition-pruned bbox scan over a write_tiled layer. Falls back
    to a plain filtered scan when the candidate tile list outgrows
    max_tiles (a near-global query prunes nothing anyway)."""
    with open(os.path.join(path, SIDEPATH)) as f:
        meta = json.load(f)
    minx, miny, maxx, maxy = bbox
    pad = meta["max_half_extent_deg"]
    cells = tiling.cover_bbox(
        minx - pad, miny - pad, maxx + pad, maxy + pad, meta["res"]
    )
    df = spark.read.parquet(path)
    if len(cells) <= max_tiles:
        df = df.filter(F.col("tile").isin([int(c) for c in cells]))
    return df.filter(
        (F.col("maxx") >= minx)
        & (F.col("minx") <= maxx)
        & (F.col("maxy") >= miny)
        & (F.col("miny") <= maxy)
    )
