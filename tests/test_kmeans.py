"""Exact-integer k-means: separable blobs, determinism, truncated-mean
parity."""

import duckdb
import numpy as np

from mundipy_spark.operators import kmeans


def _blobs(rng, centers, n_per, spread=0.05):
    rows = []
    i = 0
    for cx in centers:
        for _ in range(n_per):
            rows.append((i, (cx + rng.normal(0, spread, 8)).tolist()))
            i += 1
    return rows


def test_kmeans_separates_blobs(spark):
    rng = np.random.default_rng(3)
    centers = [np.full(8, -2.0), np.zeros(8), np.full(8, 2.0)]
    rows = _blobs(rng, centers, 30)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r.cluster for r in kmeans.kmeans_assign(df, k=3, iterations=4).collect()}
    groups = [set(out[i] for i in range(b * 30, (b + 1) * 30)) for b in range(3)]
    # every blob lands in exactly one cluster, and blobs get distinct clusters
    assert all(len(g) == 1 for g in groups)
    assert len(set.union(*groups)) == 3


def test_kmeans_matches_duckdb_with_negatives(spark):
    """Cross-engine parity on data forcing negative centroid sums —
    the truncated-vs-floor division trap."""
    rng = np.random.default_rng(9)
    rows = [(i, (rng.normal(-1.5, 1.0, 6)).tolist()) for i in range(40)]
    rows += [(100 + i, (rng.normal(1.5, 1.0, 6)).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cluster for r in kmeans.kmeans_assign(df, k=2, iterations=3).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id bigint, embedding double[])")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    q = kmeans.kmeans_assign_sql("SELECT vec_id, embedding FROM e", k=2, iterations=3)
    want = {r[0]: r[1] for r in con.execute(q).fetchall()}
    assert got == want


def test_kmeans_is_partition_invariant(spark):
    rng = np.random.default_rng(17)
    rows = [(i, rng.normal(0, 3, 8).tolist()) for i in range(60)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = a.repartition(13)
    ra = sorted((r.vec_id, r.cluster) for r in kmeans.kmeans_assign(a, k=3, iterations=2).collect())
    rb = sorted((r.vec_id, r.cluster) for r in kmeans.kmeans_assign(b, k=3, iterations=2).collect())
    assert ra == rb

def test_kmeans_nprobe_matches_duckdb(spark):
    """n_probe=2 assignment (id, cluster, probe) is value-exact vs the
    unrolled twin, and probe=0 rows equal the single-assign result."""
    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(0, 2, 6).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(
        (r.vec_id, r.cluster, r.probe)
        for r in kmeans.kmeans_assign(df, k=3, iterations=2, n_probe=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id bigint, embedding double[])")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    q = kmeans.kmeans_assign_sql(
        "SELECT vec_id, embedding FROM e", k=3, iterations=2, n_probe=2
    )
    want = sorted(tuple(r) for r in con.execute(q).fetchall())
    assert got == want
    single = {
        r.vec_id: r.cluster
        for r in kmeans.kmeans_assign(df, k=3, iterations=2).collect()
    }
    assert {(v, c) for v, c, p in got if p == 0} == set(single.items())


def test_semdedup_probe2_recovers_cross_cluster_twin(spark):
    """VERDICT r03 item 5: probe=1 misses the one planted twin pair
    that straddles a cluster boundary (47 pairs); probe=2 recovers it
    (48 = the all-pairs yardstick), and BOTH are value-exact vs the
    DuckDB twin."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    counts = {}
    for n_probe in (1, 2):
        sdf = e._semdedup(spark, sf, n_probe=n_probe)
        got = sorted(tuple(r) for r in sdf.collect())
        sql = e._semdedup_sql(n_probe=n_probe)
        want = sorted(tuple(r) for r in con.execute(sql).fetchall())
        assert got == want, f"n_probe={n_probe} twin mismatch"
        counts[n_probe] = len(got)
    assert counts[1] == 47 and counts[2] == 48
