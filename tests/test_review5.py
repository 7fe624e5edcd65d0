"""Regression tests for adversarial review pass 5 (sources, st UDF
edge cases, WKB/WKT fidelity, line buffers, tokenizer twin parity)."""

import json
import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# --- _pairwise_predicate decode cache eviction ------------------------------


def test_predicate_udf_cache_eviction_no_crash(spark):
    """>4096 distinct left-side geometries in ONE Arrow batch used to
    KeyError: the memo cleared itself right after inserting the current
    key, then read it back."""
    from mundipy_spark.functions import st
    from mundipy_spark.kernels import wkb

    n = 4200
    rows = []
    for i in range(n):
        x = float(i)
        sq = ("Polygon", [np.array(
            [[x, 0], [x + 1, 0], [x + 1, 1], [x, 1], [x, 0]], float
        )])
        pt = ("Point", np.array([x + 0.5, 0.5]))
        rows.append((wkb.dumps(sq), wkb.dumps(pt)))
    df = spark.createDataFrame(rows, "a binary, b binary").coalesce(1)
    got = df.select(st.st_intersects("a", "b").alias("hit")).collect()
    assert len(got) == n and all(r.hit for r in got)


# --- EWKB SRID payload ------------------------------------------------------


def test_ewkb_srid_payload_consumed():
    from mundipy_spark.kernels import wkb

    # PostGIS-style EWKB: little endian, POINT with SRID flag + payload
    ewkb = (
        bytes([1])
        + struct.pack("<I", 0x20000001)
        + struct.pack("<I", 4326)
        + struct.pack("<dd", 3.5, 7.25)
    )
    g = wkb.loads(ewkb)
    assert g[0] == "Point" and g[1][0] == 3.5 and g[1][1] == 7.25

    # polygon variant: SRID + one ring
    ring = np.array([[0.0, 0], [4, 0], [4, 4], [0, 4], [0, 0]])
    body = struct.pack("<I", 1) + struct.pack("<I", len(ring)) + ring.tobytes()
    epoly = bytes([1]) + struct.pack("<I", 0x20000003) + struct.pack("<I", 3857) + body
    g2 = wkb.loads(epoly)
    assert g2[0] == "Polygon" and np.allclose(g2[1][0], ring)

    # SRID+Z combination: Z flag adds a third ordinate per point
    zpt = (
        bytes([1])
        + struct.pack("<I", 0x20000001 | 0x80000000)
        + struct.pack("<I", 4326)
        + struct.pack("<ddd", 1.0, 2.0, 9.0)
    )
    g3 = wkb.loads(zpt)
    assert g3[0] == "Point" and g3[1][0] == 1.0 and g3[1][1] == 2.0


# --- WKT shortest-round-trip formatting --------------------------------------


def test_wkt_round_trip_lossless():
    from mundipy_spark.kernels import wkb

    rng = np.random.default_rng(5)
    pts = rng.uniform(-180, 180, size=(64, 2))
    pts[0] = (-122.41941550123456, 37.77492950123457)  # >10 sig digits
    for x, y in pts:
        g = ("Point", np.array([x, y]))
        g2 = wkb.from_wkt(wkb.to_wkt(g))
        assert g2[1][0] == x and g2[1][1] == y  # bit-exact, not approx


# --- GeoJSON sink emits real JSON objects ------------------------------------


def test_write_geojson_geometry_is_object(spark, tmp_path):
    import glob

    from mundipy_spark.kernels import wkb
    from mundipy_spark.sources import geojson as gj

    sq = wkb.dumps(("Polygon", [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]))
    df = spark.createDataFrame([(sq, "a", 1), (None, "b", 2)], "geometry binary, name string, k int")
    out = str(tmp_path / "sink")
    gj.write_geojson(df, out)
    feats = []
    for p in glob.glob(out + "/part-*"):
        for line in open(p):
            if line.strip():
                feats.append(json.loads(line))
    assert len(feats) == 2
    by_name = {f["properties"]["name"]: f for f in feats}
    assert isinstance(by_name["a"]["geometry"], dict)  # was an escaped string
    assert by_name["a"]["geometry"]["type"] == "Polygon"
    assert by_name["b"]["geometry"] is None
    # and the FeatureCollection stays externally consumable end-to-end
    fc = {"type": "FeatureCollection", "features": feats}
    rt = json.loads(json.dumps(fc))
    rt_a = [f for f in rt["features"] if f["properties"]["name"] == "a"][0]
    assert rt_a["geometry"]["coordinates"]


# --- line buffer: capsules union instead of overlapping parts ----------------


def test_line_buffer_area_not_double_counted():
    from mundipy_spark.kernels import constructive as C
    from mundipy_spark.kernels import measure as M

    line = ("LineString", np.array([[0, 0], [1, 0], [2, 0], [2, 1]], float))
    r = 0.25
    b = C.buffer_planar(line, r)
    assert b[0] in ("Polygon", "MultiPolygon")
    area = M.geom_area_planar(b)
    # exact swept area = L*2r + pi r^2 (round caps merge with corner
    # arcs) = 3*0.5 + pi/16 ~ 1.696; arc discretization keeps it a bit
    # under. The old overlapping-capsule MultiPolygon summed ~2.09.
    exact = 3 * 2 * r + np.pi * r * r
    assert 0.95 * exact <= area <= exact + 1e-9

    # disjoint MultiLineString parts stay disjoint parts
    ml = ("MultiLineString", [np.array([[0, 0], [1, 0]], float), np.array([[10, 10], [11, 10]], float)])
    bm = C.buffer_planar(ml, r)
    am = M.geom_area_planar(bm)
    exact1 = 2 * r + np.pi * r * r
    assert 2 * 0.95 * exact1 <= am <= 2 * exact1 + 1e-9


# --- null scalar arguments return NULL ---------------------------------------


def test_null_scalar_args_yield_null(spark):
    from mundipy_spark.functions import st
    from mundipy_spark.kernels import wkb

    sq = wkb.dumps(("Polygon", [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)]))
    ln = wkb.dumps(("LineString", np.array([[0, 0], [10, 0]], float)))
    df = spark.createDataFrame(
        [(sq, ln, None)], "g binary, l binary, d double"
    )
    row = df.select(
        st.st_buffer("g", "d").alias("buf"),
        st.st_simplify("g", "d").alias("simp"),
        st.st_dwithin("g", "l", "d").alias("dw"),
        st.st_interpolate("l", "d").alias("interp"),
        st.st_line_locate_point("l", "d", "d").alias("loc"),
        st.st_equals_exact("g", "g", "d").alias("eq"),
        st.st_cells("g", F.col("d").cast("int")).alias("cells"),
    ).collect()[0]
    assert row.buf is None and row.simp is None and row.dw is None
    assert row.interp is None and row.loc is None and row.eq is None
    assert row.cells is None


def test_cell_of_geom_per_row_resolution(spark):
    from mundipy_spark.functions import st
    from mundipy_spark.kernels import tiling, wkb

    pts = [(2.35, 48.86, 4), (2.35, 48.86, 8), (-73.99, 40.73, 8)]
    rows = [(wkb.dumps(("Point", np.array([x, y]))), r) for x, y, r in pts]
    df = spark.createDataFrame(rows, "g binary, res int")
    got = [r.c for r in df.select(st.st_cell_of_geom("g", "res").alias("c")).collect()]
    want = [
        int(tiling.point_cell(np.array([x]), np.array([y]), r)[0])
        for x, y, r in pts
    ]
    assert got == want  # res used to be frozen at the batch's first row


# --- shapefile: deleted dbf records stay aligned -----------------------------


def test_shapefile_deleted_record_alignment(spark, tmp_path):
    from mundipy_spark.sources import shapefile as shp

    rows = [
        {"geometry": ("Point", np.array([float(i), float(i)])), "name": f"r{i}"}
        for i in range(4)
    ]
    path = str(tmp_path / "del.shp")
    shp.write_shapefile(rows, path)
    # soft-delete record #1 the dBASE way: flag byte -> '*'
    dbf = bytearray(open(path[:-4] + ".dbf", "rb").read())
    nrec, hdr_sz, rec_sz = struct.unpack("<IHH", dbf[4:12])
    dbf[hdr_sz + 1 * rec_sz] = ord("*")
    open(path[:-4] + ".dbf", "wb").write(bytes(dbf))

    df = shp.read_shapefile(spark, path)
    got = {r.name: r for r in df.collect()}
    # deleted row dropped entirely; every survivor keeps ITS geometry
    assert set(got) == {"r0", "r2", "r3"}
    from mundipy_spark.kernels import wkb

    for i in (0, 2, 3):
        g = wkb.loads(bytes(got[f"r{i}"].geometry))
        assert g[1][0] == float(i)  # pre-fix: r2/r3 shifted one slot


def test_shapefile_attr_named_geometry_does_not_clobber(spark, tmp_path):
    from mundipy_spark.sources import shapefile as shp
    from mundipy_spark.kernels import wkb

    rows = [{"geometry": ("Point", np.array([1.0, 2.0])), "tag": "x"}]
    path = str(tmp_path / "clash.shp")
    shp.write_shapefile(rows, path)
    # rename the dbf's only field to 'geometry' to force the collision
    dbf = bytearray(open(path[:-4] + ".dbf", "rb").read())
    dbf[32 : 32 + 11] = b"geometry\x00\x00\x00"
    open(path[:-4] + ".dbf", "wb").write(bytes(dbf))
    df = shp.read_shapefile(spark, path)
    r = df.collect()[0]
    g = wkb.loads(bytes(r.geometry))  # still WKB, not the attr string
    assert g[0] == "Point" and g[1][0] == 1.0
    assert r.geometry_prop == "x"


# --- simhash tokenizer matches the twins on unicode whitespace ---------------


def test_simhash_unicode_whitespace_matches_duckdb_twin():
    import duckdb

    from mundipy_spark.functions import text as tx

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "café bar baz",  # U+00A0 must NOT split (twin: RE2 \s)
                "a b\tc d",  # thin space must not split; tab/space do
                "  edge  \x0b case ",  # \x0b splits on both sides
            ],
        }
    )
    got = tx._simhash_batch(docs["text"]).tolist()

    con = duckdb.connect()
    con.register("documents", docs)
    sql = "WITH " + tx.simhash_sig_sql() + " SELECT doc_id, sig FROM sig ORDER BY doc_id"
    want = [int(r[1]) for r in con.execute(sql).fetchall()]
    assert got == want


def test_lang_id_uses_ascii_tokenizer():
    from mundipy_spark.functions import text as tx

    # 'the'+NBSP+'of' is ONE token under Java/RE2 \s (no marker hits);
    # Python str.split() used to break it into two stopword hits -> 'en'
    s = pd.Series(["the of"])
    assert tx.lang_id.func(s).tolist() == ["und"]


# --- tiled sidecar metadata unchanged by the observe() rewrite ---------------


def test_write_tiled_meta_half_extent(spark, tmp_path):
    from mundipy_spark.sources import tiled

    df = spark.createDataFrame(
        [(0.0, 0.0, 2.0, 1.0), (10.0, 10.0, 11.0, 14.0)],
        "minx double, miny double, maxx double, maxy double",
    )
    meta = tiled.write_tiled(df, str(tmp_path / "t"), res=3)
    assert meta["res"] == 3
    assert abs(meta["max_half_extent_deg"] - 2.0) < 1e-9  # max(2,4)/2
