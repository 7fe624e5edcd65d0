"""Z-order layout: cross-engine Morton parity + row-group locality."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from mundipy_spark.sources import zorder as Z


def test_morton_cross_engine_parity(spark):
    rng = np.random.default_rng(5)
    rows = [
        (i, float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200))
        )
    ]
    df = spark.createDataFrame(rows, "i long, lon double, lat double")
    srows = {
        r.i: r.z
        for r in df.select(
            "i", Z.morton_expr(F.col("lon"), F.col("lat")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(i bigint, lon double, lat double)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", rows)
    drows = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {Z.morton_sql('lon', 'lat')} FROM p"
        ).fetchall()
    }
    assert srows == drows


def test_zordered_row_groups_are_tight(spark, tmp_path):
    """After write_zordered, each parquet row group's lat/lon stats
    span a small rectangle — the min/max pruning surface a bbox scan
    uses to skip row groups. Compare against a round-robin layout of
    the SAME data."""
    import pyarrow.parquet as pq
    import glob
    import os

    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % 36000 / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729) % 18000 / 100.0 - 90.0).alias("lat"),
    )
    zpath = str(tmp_path / "zordered")
    upath = str(tmp_path / "unsorted")
    Z.write_zordered(df, zpath, n_files=64)
    df.repartition(4).write.parquet(upath)

    def mean_lat_span(path):
        spans = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema == "lat":
                        st = col.statistics
                        spans.append(st.max - st.min)
        return sum(spans) / len(spans)

    z_span = mean_lat_span(zpath)
    u_span = mean_lat_span(upath)
    # unsorted row groups span essentially the whole globe; with 64
    # contiguous Z-ranges (3 fixed quadtree levels per axis) each
    # z-ordered group covers a small band (~30 deg here; range-
    # partition boundary sampling jitters the exact figure)
    assert u_span > 100
    assert z_span * 4 < u_span, (z_span, u_span)
