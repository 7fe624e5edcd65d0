"""Web-scale pipeline: geoparse -> tile -> join, text invariant, resume."""

import json
import os
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


_KILL_PHASE_A = """
import json, sys
sys.path.insert(0, "/root/repo")
from mundipy_spark.session import get_spark
from mundipy_spark.plans import pipeline
spark = get_spark("kill-a", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
r = pipeline.run_pipeline(spark, "{sf}", sys.argv[1], max_keys=int(sys.argv[2]))
print("RESULT " + json.dumps(r))
spark.stop()
"""

_KILL_PHASE_B = """
import os, signal, sys, threading, time
sys.path.insert(0, "/root/repo")
from mundipy_spark.session import get_spark
from mundipy_spark.plans import pipeline
out_dir = sys.argv[1]
data_dir = out_dir + "/geocoded"

def mid_write():
    # dynamic partition overwrite stages into .spark-staging-<jobId>
    # under the output dir (static mode uses _temporary); either
    # appearing means the write job is IN FLIGHT
    try:
        names = os.listdir(data_dir)
    except FileNotFoundError:
        return False
    return any(n == "_temporary" or n.startswith(".spark-staging") for n in names)

def watcher():
    while not mid_write():
        time.sleep(0.004)
    time.sleep(0.05)
    os.kill(os.getpid(), signal.SIGKILL)

threading.Thread(target=watcher, daemon=True).start()
spark = get_spark("kill-b", cpus=4)
spark.sparkContext.setLogLevel("ERROR")
pipeline.run_pipeline(spark, "{sf}", out_dir)
print("SHOULD_NOT_REACH")
"""


def _run_sub(code, *args, expect_kill=False):
    import subprocess
    import sys as _sys

    env = dict(os.environ, PYTHONPATH="/root/repo")
    p = subprocess.run(
        [_sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    if expect_kill:
        assert p.returncode == -9, (p.returncode, p.stderr[-1500:])
        assert "SHOULD_NOT_REACH" not in p.stdout
        return None
    assert p.returncode == 0, p.stderr[-1500:]
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line:\n{p.stdout[-1500:]}")


def test_pipeline_hard_kill_resume(spark):
    """VERDICT r03 item 8 — resume survives a HARD stop, not just a
    cooperative one: phase A checkpoints half the keys; phase B (fresh
    JVM) is SIGKILLed while its parquet write job is in flight (the
    _temporary marker proves mid-write); phase C resumes and the final
    table is row-identical to a clean single-shot run. Dynamic
    partition overwrite makes every kill point idempotent."""
    import time as _time

    tmp = tempfile.mkdtemp(prefix="mundipy_kill_")
    clean = tempfile.mkdtemp(prefix="mundipy_clean_")
    try:
        a = _run_sub(_KILL_PHASE_A.format(sf=SF), tmp, "8")
        assert a["keys_processed"] == 8 and a["keys_deferred"] > 0

        _run_sub(_KILL_PHASE_B.format(sf=SF), tmp, expect_kill=True)
        _time.sleep(3)  # let the orphaned local-mode JVM die off

        c = pipeline.run_pipeline(spark, SF, tmp)
        # phase-A keys are never redone; B's kill landed mid-write so
        # at least one key was left for C
        assert c["keys_skipped_resume"] >= 8
        assert c["keys_processed"] == c["keys_total"] - c["keys_skipped_resume"]
        assert c["keys_deferred"] == 0

        ref = pipeline.run_pipeline(spark, SF, clean)
        got = sorted(
            map(tuple, spark.read.parquet(c["out"]).collect())
        )
        want = sorted(
            map(tuple, spark.read.parquet(ref["out"]).collect())
        )
        assert got == want

        ck = spark.read.parquet(c["checkpoint"])
        assert ck.filter(F.col("rows_in") != F.col("rows_out")).count() == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(clean, ignore_errors=True)


def test_lineage_fingerprint_sees_duplicate_pairs(spark):
    """bit_xor alone cancels duplicate row PAIRS (two identical rows
    xor to zero), so a slice gaining two copies of the same row would
    keep its old fingerprint and resume would skip changed input. The
    fingerprint now folds in count and an exact decimal sum."""
    from mundipy_spark.sources import checkpoint as ckpt

    base = spark.createDataFrame(
        [(1, "u1", "t1"), (1, "u2", "t2")], "part_key long, url string, text string"
    )
    plus_pair = base.unionByName(
        spark.createDataFrame(
            [(1, "u1", "t1"), (1, "u1", "t1")],
            "part_key long, url string, text string",
        )
    )
    fp = {
        r.part_key: r.fingerprint
        for r in ckpt.lineage_metrics(base, "part_key", ["url", "text"]).collect()
    }
    fp2 = {
        r.part_key: r.fingerprint
        for r in ckpt.lineage_metrics(
            plus_pair, "part_key", ["url", "text"]
        ).collect()
    }
    assert fp[1] != fp2[1]
    # and stays order/partitioning-invariant
    fp3 = {
        r.part_key: r.fingerprint
        for r in ckpt.lineage_metrics(
            plus_pair.repartition(7), "part_key", ["url", "text"]
        ).collect()
    }
    assert fp2 == fp3


def test_geoparse_decimal_pairs_boundaries_and_first_plausible(spark):
    """Digit boundaries: a pair embedded inside longer numbers must not
    geocode; a valid pair AFTER an invalid one must still be found."""
    df = spark.createDataFrame(
        [
            ("d", "order #1234.56, 78.9 units"),          # mid-number: no match
            ("e", "99.99, 199.9 then real 34.05, -118.24"),  # later valid pair
            ("f", "pi 3.14159265, e 2.71828182"),          # >6 decimals: no match
            ("g", "at 34.05, -118.24."),                   # sentence-final period ok
        ],
        "url string, text string",
    )
    out = {r.url: (r.lat, r.lon) for r in geoparse.parse_decimal_pairs(df).collect()}
    assert out["d"] == (None, None)
    assert out["e"] == (34.05, -118.24)
    assert out["f"] == (None, None)
    assert out["g"] == (34.05, -118.24)


def test_gazetteer_short_places_matchable(spark):
    """The token-length prefilter adapts to the shortest place name, so
    2-character gazetteer entries are matchable (fixed floor 3 made
    them silently unmatchable)."""
    pages = spark.createDataFrame(
        [("u1", "moving to la next year"), ("u2", "nothing here")],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [("la", 34.05, -118.24)], "place string, lat double, lon double"
    )
    out = geoparse.parse_gazetteer(pages, gaz)
    assert [r.url for r in out.collect()] == ["u1"]


def test_gazetteer_multiword_places(spark):
    """Multi-word place names (r5): both sides normalize through the
    tokenizer, so 'New York' matches 'new-york', 'new  york', and
    'NEW YORK!' in page text; single tokens of a multi-word name
    ('york' alone) never match; the first-hit tie-break stays min by
    original place string."""
    df = spark.createDataFrame(
        [
            ("u1", "moving to New-York next year"),
            ("u2", "flight to new  york city"),
            ("u3", "YORK alone should not match"),
            ("u4", "the port of los angeles is busy"),
            ("u5", "angeles without los"),
            ("u6", "NEW YORK! exclaimed"),
            ("u7", "nothing to see"),
        ],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [
            ("New York", 40.71, -74.00),
            ("Los Angeles", 34.05, -118.24),
        ],
        "place string, glat double, glon double",
    )
    out = {r.url: r.place for r in geoparse.parse_gazetteer(df, gaz).collect()}
    assert out == {
        "u1": "New York",
        "u2": "New York",
        "u4": "Los Angeles",
        "u6": "New York",
    }
    # prefilter equivalence holds for multi-word alternations too
    without = {
        (r.url, r.place)
        for r in geoparse.parse_gazetteer(df, gaz, prefilter=False).collect()
    }
    assert {(u, p) for u, p in out.items()} == without


def test_gazetteer_mixed_lengths_and_overlap(spark):
    """Mixed 1/2/3-token gazetteers: every length L present generates
    its gram stream; overlapping matches resolve to min(place); a
    too-long place raises loudly instead of silently never matching."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [
            ("u1", "visit new york city today"),
            ("u2", "just york here"),
        ],
        "url string, text string",
    )
    gaz = spark.createDataFrame(
        [
            ("new york city", 40.71, -74.00),
            ("new york", 40.71, -74.00),
            ("york", 53.96, -1.08),
        ],
        "place string, glat double, glon double",
    )
    out = {r.url: r.place for r in geoparse.parse_gazetteer(df, gaz).collect()}
    # u1 matches all three; min by place string -> "new york"
    assert out == {"u1": "new york", "u2": "york"}
    big = spark.createDataFrame(
        [("a b c d e f g h i", 0.0, 0.0)],
        "place string, glat double, glon double",
    )
    with _pytest.raises(ValueError, match="max_ngram"):
        geoparse.parse_gazetteer(df, big)


# ---------------------------------------------------------------- property

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_gz_tok = st.sampled_from(["aa", "b", "c0", "dd", "e"])
_gz_sep = st.sampled_from([" ", "-", "  ", ". "])
_gz_place = st.lists(_gz_tok, min_size=1, max_size=3).map(" ".join)
_gz_text = st.lists(
    st.tuples(_gz_tok, _gz_sep), min_size=0, max_size=10
).map(lambda ps: "".join(t + s for t, s in ps))


def _gz_ref(pages, places):
    """Pure-Python reference: first (min) place whose token sequence
    appears as a contiguous window of the page's token stream."""
    import re as _re

    out = {}
    for url, text in pages:
        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
        hits = set()
        for place in places:
            ptoks = [t for t in _re.split(r"[^a-z0-9]+", place.lower()) if t]
            L = len(ptoks)
            if not L:
                continue
            if any(
                toks[i : i + L] == ptoks for i in range(len(toks) - L + 1)
            ):
                hits.add(place)
        if hits:
            out[url] = min(hits)
    return out


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(_gz_text, min_size=1, max_size=5),
    places=st.lists(_gz_place, min_size=1, max_size=4, unique=True),
    use_prefilter=st.booleans(),
)
def test_gazetteer_matches_python_reference_property(
    spark, texts, places, use_prefilter
):
    pages = [(f"u{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(pages, "url string, text string")
    gaz = spark.createDataFrame(
        [(p, 0.0, 0.0) for p in places],
        "place string, glat double, glon double",
    )
    got = {
        r.url: r.place
        for r in geoparse.parse_gazetteer(
            df, gaz, prefilter=use_prefilter
        ).collect()
    }
    assert got == _gz_ref(pages, places)
