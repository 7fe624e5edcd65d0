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
