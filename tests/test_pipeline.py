"""Web-scale pipeline: geoparse -> tile -> join, text invariant, resume."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mundipy_spark.operators import geoparse
from mundipy_spark.plans import pipeline
from mundipy_spark.sources import pages as pages_src

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages(spark):
    return pages_src.synth_pages(spark, SF).cache()


def test_geoparse_tokens(spark, pages):
    parsed = geoparse.parse_geo_tokens(pages)
    n = pages.count()
    n_geo = parsed.filter(F.col("lat").isNotNull()).count()
    # 1/8 of doc_ids carry no geo mention
    assert n_geo == pages.filter(F.col("doc_id") % 8 != 0).count()
    assert 0 < n_geo < n
    bad = parsed.filter(
        F.col("lat").isNotNull() & ((F.abs("lat") > 90) | (F.abs("lon") > 180))
    ).count()
    assert bad == 0


def test_geoparse_decimal_pairs(spark):
    df = spark.createDataFrame(
        [
            ("a", "meet me at 34.05, -118.24 ok"),
            ("b", "no coords here"),
            ("c", "bogus 99.99, 500.1 pair"),
        ],
        "url string, text string",
    )
    out = {r.url: (r.lat, r.lon) for r in geoparse.parse_decimal_pairs(df).collect()}
    assert out["a"] == (34.05, -118.24)
    assert out["b"] == (None, None)
    assert out["c"] == (None, None)


def test_geocode_matches_closed_form(spark, pages):
    """Generic tile-join machinery must equal the closed-form floor
    region for every geoparsed page (rect regions, no edge cases by
    construction — see sources/pages.py)."""
    regions = pages_src.synth_regions(spark, step_deg=10.0)
    out = pipeline.geocode_pages(pages, regions)
    geo = out.filter(F.col("lat").isNotNull())
    nx = 36
    gx = F.least(F.greatest(F.floor((F.col("lon") + 180.0) / 10.0), F.lit(0)), F.lit(35)).cast("long")
    gy = F.least(F.greatest(F.floor((F.col("lat") + 90.0) / 10.0), F.lit(0)), F.lit(17)).cast("long")
    expect = F.concat(F.lit("R_"), gx.cast("string"), F.lit("_"), gy.cast("string"))
    mismatch = geo.filter(F.col("region") != expect).count()
    assert mismatch == 0
    assert geo.filter(F.col("region").isNull()).count() == 0


def test_text_byte_identity(spark, pages):
    """The per-url invariant: pipeline output text is byte-identical to
    input text (BASELINE.json input_hint)."""
    regions = pages_src.synth_regions(spark)
    out = pipeline.geocode_pages(pages, regions).select("url", "text")
    diff = (
        pages.select("url", F.col("text").alias("t_in"))
        .join(out, "url")
        .filter(F.col("text") != F.col("t_in"))
        .count()
    )
    assert diff == 0
    assert out.count() == pages.count()  # nothing dropped or duplicated


def test_pipeline_resume(spark):
    tmp = tempfile.mkdtemp(prefix="mundipy_pipeline_")
    try:
        r1 = pipeline.run_pipeline(spark, SF, tmp)
        assert r1["keys_processed"] > 0
        assert r1["keys_skipped_resume"] == 0
        n1 = spark.read.parquet(r1["out"]).count()

        r2 = pipeline.run_pipeline(spark, SF, tmp)
        assert r2["keys_processed"] == 0
        assert r2["keys_skipped_resume"] == r1["keys_processed"]
        n2 = spark.read.parquet(r1["out"]).count()
        assert n2 == n1  # resume wrote nothing new

        ck = spark.read.parquet(r1["checkpoint"])
        assert ck.filter(F.col("rows_in") != F.col("rows_out")).count() == 0
        assert set(ck.columns) >= {"part_key", "rows_in", "rows_out", "fingerprint", "run_id"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_gazetteer_join(spark):
    df = spark.createDataFrame(
        [
            ("u1", "I love Paris in the spring"),
            ("u2", "Berlin and Paris are far"),
            ("u3", "nothing to see"),
        ],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [("paris", 48.85, 2.35), ("berlin", 52.52, 13.40)],
        "place string, lat double, lon double",
    )
    out = {r.url: r.place for r in geoparse.parse_gazetteer(df, gaz).collect()}
    assert out == {"u1": "paris", "u2": "berlin"}  # first alphabetically
