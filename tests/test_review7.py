"""Regression tests for review pass 7 (snaptable hidden-partitioning +
MOR-delete findings): partition values recomputed from the source
column instead of hive directory-name inference, tz-aware predicate
transforms, merge_into candidate-prune type guard, and legacy
(pre-seq) manifest entries surviving rewrite commits.
"""

from __future__ import annotations

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("review7-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_merge_prune_numeric_looking_truncate_keys(spark, tmp_path):
    """truncate(4, k) partitions whose prefixes look numeric must not
    be re-typed out of the merge candidate set — a wrongly-pruned file
    keeps its old row and the merge creates a permanent duplicate."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024abc", 1), ("2025xyz", 2)], "k string, v long"
    )
    snaptable.create(
        spark, path, base, stats_cols=[], partition_by=["truncate(4, k)"]
    )
    delta = spark.createDataFrame([("2024abc", 100)], "k string, v long")
    snaptable.merge_into(spark, path, delta, key_cols=["k"])
    rows = {r["k"]: r["v"] for r in snaptable.read(spark, path).collect()}
    got = snaptable.read(spark, path)
    assert got.count() == 2  # no duplicate key
    assert rows == {"2024abc": 100, "2025xyz": 2}


def test_identity_partition_timestamp_shaped_strings(spark, tmp_path):
    """Timestamp-shaped string partition values must stay strings in
    the manifest (hive inference would re-type them as datetimes and
    the pruner would silently drop live files)."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 2)],
        "k string, v long",
    )
    snaptable.create(spark, path, df, stats_cols=[], partition_by=["k"])
    got = snaptable.scan(spark, path, [("k", "=", "2024-01-01 00:00:00")])
    assert [r["v"] for r in got.collect()] == [1]
    # range predicate too (lexicographic on the true strings)
    got = snaptable.scan(spark, path, [("k", ">=", "2024-01-02")])
    assert [r["v"] for r in got.collect()] == [2]


def test_identity_partition_empty_string_not_conflated_with_null(spark, tmp_path):
    """'' lands in hive's default partition directory alongside NULL;
    the manifest must record '' (recomputed from the data), so the
    all-NULL prune rule cannot drop the empty-string rows."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("", 1), ("abc", 2), (None, 3)], "k string, v long"
    )
    snaptable.create(spark, path, df, stats_cols=[], partition_by=["k"])
    got = snaptable.scan(spark, path, [("k", "<=", "zzz")])
    assert sorted(r["v"] for r in got.collect()) == [1, 2]
    got = snaptable.scan(spark, path, [("k", "=", "")])
    assert [r["v"] for r in got.collect()] == [1]


def test_days_prune_with_tz_aware_predicate(spark, tmp_path):
    """A tz-aware predicate datetime must be CONVERTED to the UTC
    instant (astimezone), not wall-clock-reinterpreted: +05:00
    midnight is 19:00Z the previous day, which lives in the previous
    day partition."""
    path = str(tmp_path / "t")
    base = datetime.datetime(2024, 1, 24, 12, 0, 0)
    rows = [(base + datetime.timedelta(hours=h), h) for h in range(24)]
    df = spark.createDataFrame(rows, "ts timestamp, h long")
    snaptable.create(spark, path, df, stats_cols=[], partition_by=["days(ts)"])
    cut = datetime.datetime(
        2024, 1, 25, 0, 0, 0,
        tzinfo=datetime.timezone(datetime.timedelta(hours=5)),
    )
    got = snaptable.scan(spark, path, [("ts", ">=", cut)])
    direct = df.filter(F.col("ts") >= F.lit(cut)).count()
    assert got.count() == direct == 17


def test_legacy_entries_without_seq_survive_rewrites(spark, tmp_path):
    """Manifest entries written before sequence numbers existed carry
    no 'seq'; a rewrite commit (delete_where/merge_into) must treat
    carried untouched entries as seq 0, not restamp them as its own
    new data — a restamp detaches outstanding equality deletes."""
    path = str(tmp_path / "t")
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    snaptable.create(
        spark, path, docs.repartitionByRange(4, "doc_id"), stats_cols=["doc_id"]
    )
    # simulate a legacy table: strip seq from every manifest entry
    snap = snaptable._load_snapshot(path, 1)
    mpath = os.path.join(path, snap["manifest"])
    m = json.load(open(mpath))
    for e in m["files"]:
        e.pop("seq", None)
    json.dump(m, open(mpath, "w"))
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(7,), (90,)], "doc_id long")
    )
    snaptable.delete_where(spark, path, [("doc_id", "<", 2)])
    ids = sorted(r["doc_id"] for r in snaptable.read(spark, path).collect())
    assert 7 not in ids and 90 not in ids and 0 not in ids and 1 not in ids
    assert len(ids) == 96
    # merge path: untouched carried entries keep their deletes too
    delta = spark.createDataFrame([(50, 999)], "doc_id long, v long")
    snaptable.merge_into(spark, path, delta, key_cols=["doc_id"])
    ids = sorted(r["doc_id"] for r in snaptable.read(spark, path).collect())
    assert 7 not in ids and 90 not in ids
