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


def test_gazetteer_prefilter_equivalence(spark):
    """The page-level regexp prefilter must be a pure optimization:
    identical hits with and without it, including tokenizer-separator
    characters that are regex word chars ('_': \\b would wrongly drop
    'paris_x'), case variance, and substring non-matches."""
    df = spark.createDataFrame(
        [
            ("u1", "I love Paris in the spring"),
            ("u2", "paris_adjacent underscore case"),
            ("u3", "comparisons with parisian flair only"),
            ("u4", "PARIS uppercase"),
            ("u5", "nothing to see"),
            ("u6", "berlin,comma-bound"),
        ],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [("paris", 48.85, 2.35), ("berlin", 52.52, 13.40)],
        "place string, lat double, lon double",
    )
    with_pf = {(r.url, r.place) for r in geoparse.parse_gazetteer(df, gaz).collect()}
    without = {
        (r.url, r.place)
        for r in geoparse.parse_gazetteer(df, gaz, prefilter=False).collect()
    }
    assert with_pf == without
    assert with_pf == {
        ("u1", "paris"), ("u2", "paris"), ("u4", "paris"), ("u6", "berlin")
    }


def test_geocode_pages_single_scan_left_semantics(spark):
    """geocode_pages must read the pages source exactly ONCE (the r01
    plan evaluated the geoparse subtree 3x), keep every input row (left
    semantics), and never shuffle the probe side."""
    pages = pages_src.synth_pages(spark, SF)
    regions = pages_src.synth_regions(spark, step_deg=10.0)
    out = pipeline.geocode_pages(pages, regions)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    n_in = pages.count()
    rows = out.select("url", "lat", "region").collect()
    assert len(rows) == n_in  # every page survives
    geo = [r for r in rows if r.lat is not None]
    assert all(r.region is not None for r in geo)  # regions tile the world
    assert all(r.region is None for r in rows if r.lat is None)


def test_tile_join_left_multi_match_and_nulls(spark):
    """Left tile join: overlapping polygons yield one row per match;
    unmatched and null-coordinate probes yield exactly one null row."""
    import numpy as np

    from mundipy_spark.kernels import wkb as wkb_mod
    from mundipy_spark.operators import joins

    def rect(x0, y0, x1, y1):
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        return wkb_mod.dumps(("Polygon", [ring]))

    polys = spark.createDataFrame(
        [(rect(0, 0, 10, 10), "a"), (rect(5, 5, 15, 15), "b")],
        "geometry binary, name string",
    )
    pts = spark.createDataFrame(
        [(1, 7.0, 7.0), (2, 1.0, 1.0), (3, 40.0, 40.0), (4, None, None)],
        "pid long, lon double, lat double",
    )
    out = joins.tile_join_points(pts, polys, res=6, how="left")
    got = {}
    for r in out.collect():
        got.setdefault(r.pid, set()).add(r.name)
    assert got[1] == {"a", "b"}  # overlap -> two rows
    assert got[2] == {"a"}
    assert got[3] == {None}  # unmatched -> single null row
    assert got[4] == {None}  # null coords pass through
