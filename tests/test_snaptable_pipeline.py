"""Composition: the geocode pipeline consuming an Iceberg-role table
incrementally — the north rule's end-to-end shape ("URLs from a
trillion-document Iceberg table", "resumable from checkpoint").

A recrawl APPENDS pages as a new snapshot; the consumer geocodes ONLY
the delta (read_incremental) and the union of per-snapshot results
must equal geocoding the whole head — incremental consumption may
never change results, only how many files each run scans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mundipy_spark.plans import pipeline
from mundipy_spark.sources import pages as pages_src
from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("snaptable-pipeline-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _geocode(pages, regions):
    out = pipeline.geocode_pages(pages, regions, broadcast_index=True)
    return out.select("url", "text", "lat", "lon", "region")


def _canon(df):
    return sorted(map(tuple, ((r["url"], r["text"], r["lat"], r["lon"], r["region"]) for r in df.collect())))


def test_incremental_geocode_equals_full_head(spark, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    path = str(tmp_path / "pages_table")
    pages = pages_src.synth_pages(spark, sf_dir).select("doc_id", "url", "text")
    regions = pages_src.synth_regions(spark, step_deg=10.0)

    # crawl 1 commits snapshot 1; the recrawl appends shifted urls
    snaptable.create(spark, path, pages, stats_cols=["doc_id"])
    recrawl = pages.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.lit("re/"), F.col("url")).alias("url"),
        "text",
    )
    snaptable.append(spark, path, recrawl)

    # consumer 1 processed snapshot 1; consumer 2 takes only the delta
    batch1 = _geocode(snaptable.read(spark, path, snapshot_id=1), regions)
    delta = _geocode(
        snaptable.read_incremental(spark, path, since=1), regions
    )
    full = _geocode(snaptable.read(spark, path), regions)

    assert delta.count() == batch1.count() == full.count() / 2
    assert _canon(batch1.unionByName(delta)) == _canon(full)
    # the delta really is only the recrawl batch
    assert delta.filter(~F.col("url").startswith("re/")).count() == 0


def test_zorder_snaptable_spatial_file_skipping(spark, tmp_path):
    """Spatial file skipping at the TABLE-FORMAT level: points written
    z-ordered (sources/zorder.py), manifest stats on the Morton code;
    a bbox query becomes a z-range predicate (corner codes bound every
    code inside the box — interleave is monotone per coordinate) that
    prunes files from the manifest, with the exact bbox re-applied as
    the row filter. Partition pruning (tiled.py) picks directories,
    row-group stats skip inside files — this is the layer between."""
    from mundipy_spark.sources import zorder

    path = str(tmp_path / "pts")
    pts = spark.range(0, 20000).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 7919) % 3600 / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729) % 1800 / 10.0 - 90.0).alias("lat"),
    )
    z = zorder.morton_expr(F.col("lon"), F.col("lat"))
    zed = pts.withColumn("z", z).repartitionByRange(16, "z")
    snaptable.create(spark, path, zed, stats_cols=["z"])

    corners = spark.range(1).select(
        zorder.morton_expr(F.lit(10.0), F.lit(40.0)).alias("zlo"),
        zorder.morton_expr(F.lit(30.0), F.lit(60.0)).alias("zhi"),
    ).first()
    plan = snaptable.plan_scan(
        path, [("z", ">=", corners.zlo), ("z", "<=", corners.zhi)]
    )
    assert 0 < plan["files_kept"] < plan["files_total"]

    got = (
        snaptable.scan(
            path=path,
            spark=spark,
            predicates=[("z", ">=", corners.zlo), ("z", "<=", corners.zhi)],
        )
        .filter(
            (F.col("lon") >= 10.0) & (F.col("lon") <= 30.0)
            & (F.col("lat") >= 40.0) & (F.col("lat") <= 60.0)
        )
    )
    want = pts.filter(
        (F.col("lon") >= 10.0) & (F.col("lon") <= 30.0)
        & (F.col("lat") >= 40.0) & (F.col("lat") <= 60.0)
    )
    assert got.count() == want.count() > 0
    assert (
        got.agg(F.sum("pid")).first()[0] == want.agg(F.sum("pid")).first()[0]
    )


def test_cdc_maintained_region_counts_equal_full_recompute(spark, tmp_path):
    """Downstream-index maintenance via the changelog: a per-region
    page-count aggregate maintained by applying read_changes deltas
    (+1 per insert, -1 per delete) must equal recomputing the
    aggregate from each snapshot's full state — including across a
    takedown (eq-delete) that read_incremental would fence on, and a
    compaction that contributes nothing. At 10^12 docs the maintained
    aggregate touches only the delta's rows; the full recompute is the
    O(table) job this composition exists to avoid."""
    sf_dir = "/root/testdata/sf0.001"
    path = str(tmp_path / "pages_table")
    pages = pages_src.synth_pages(spark, sf_dir).select("doc_id", "url", "text")
    regions = pages_src.synth_regions(spark, step_deg=10.0)

    snaptable.create(spark, path, pages, stats_cols=["doc_id"])  # v1
    recrawl = pages.select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat(F.lit("re/"), F.col("url")).alias("url"),
        "text",
    )
    snaptable.append(spark, path, recrawl)  # v2
    takedown = pages.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    snaptable.delete_keys(spark, path, takedown)  # v3
    snaptable.compact(spark, path, target_files=2)  # v4: nothing

    changes = snaptable.read_changes(spark, path, since=0)
    # geocode_pages passes non-page columns through, so the change tag
    # rides along with each geocoded row
    tagged = pipeline.geocode_pages(
        changes.select("url", "text", "_change_type"), regions,
        broadcast_index=True,
    ).select("url", "region", "_change_type")
    maintained = (
        tagged.groupBy("region")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n_pages")
        )
        .filter(F.col("n_pages") > 0)
    )
    full = (
        _geocode(snaptable.read(spark, path), regions)
        .groupBy("region")
        .count()
        .withColumnRenamed("count", "n_pages")
    )
    m = {r["region"]: r["n_pages"] for r in maintained.collect()}
    f = {r["region"]: r["n_pages"] for r in full.collect()}
    assert m == f
