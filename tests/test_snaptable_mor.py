"""Merge-on-read equality deletes (sources/snaptable.py delete_keys):
the O(delta) takedown path, plus rollback and the snapshots metadata
table.

Reference role: Iceberg v2 equality-delete files + sequence-number
semantics, re-expressed — a takedown commits in O(keys) without
rewriting any data file; readers anti-join against the broadcast key
set; compaction applies deletes physically and clears the list.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("snaptable-mor-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def docs(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url-"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("bucket"),
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_delete_keys_basic_and_time_travel(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    keys = spark.range(0, 1000, 10).select(F.col("id").alias("doc_id"))
    v = snaptable.delete_keys(spark, path, keys)
    assert v == 2
    got = snaptable.read(spark, path)
    assert _ids(got) == [i for i in range(1000) if i % 10 != 0]
    # no data file was rewritten: manifest identical to snapshot 1
    m1 = {e["path"] for e in snaptable._load_manifest(path, 1)}
    m2 = {e["path"] for e in snaptable._load_manifest(path, 2)}
    assert m1 == m2
    # time travel to the pre-delete snapshot sees every row
    assert snaptable.read(spark, path, snapshot_id=1).count() == 1000


def test_delete_then_reappend_sequence_semantics(spark, docs, tmp_path):
    """A row re-appended AFTER a delete is visible (Iceberg sequence
    rule: a delete applies only to data files with a smaller seq)."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    dels = spark.createDataFrame([(3,), (4,), (5,)], "doc_id long")
    snaptable.delete_keys(spark, path, dels)
    recrawl = spark.createDataFrame(
        [(4, "url-4-re", 0)], "doc_id long, url string, bucket long"
    )
    snaptable.append(spark, path, recrawl)
    got = snaptable.read(spark, path)
    ids = _ids(got)
    assert 3 not in ids and 5 not in ids
    assert ids.count(4) == 1  # the re-appended row, not the original
    assert (
        got.filter(F.col("doc_id") == 4).select("url").first()["url"]
        == "url-4-re"
    )


def test_stacked_deletes_and_composite_keys(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], "doc_id long")
    )
    # composite key delete: (bucket, url) — kills exactly doc 10
    snaptable.delete_keys(
        spark,
        path,
        spark.createDataFrame([(3, "url-10")], "bucket long, url string"),
    )
    ids = _ids(snaptable.read(spark, path))
    assert 1 not in ids and 2 not in ids and 10 not in ids
    assert len(ids) == 997


def test_delete_keys_null_and_empty(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    v1 = snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    nulls = spark.createDataFrame([(None,)], "doc_id long")
    assert snaptable.delete_keys(spark, path, nulls) == v1  # no-op
    assert snaptable.read(spark, path).count() == 1000
    with pytest.raises(ValueError, match="not in table schema"):
        snaptable.delete_keys(
            spark, path, spark.createDataFrame([(1,)], "nope long")
        )


def test_compact_applies_deletes_and_clears_list(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.range(0, 100).select(F.col("id").alias("doc_id"))
    )
    v = snaptable.compact(spark, path, target_files=2)
    snap = snaptable._load_snapshot(path, v)
    assert not (snap.get("delete_files") or [])
    assert _ids(snaptable.read(spark, path)) == list(range(100, 1000))
    # pre-compact snapshot still applies its deletes (time travel)
    assert snaptable.read(spark, path, snapshot_id=2).count() == 900


def test_cow_rewrites_do_not_resurrect_mor_deleted_rows(spark, docs, tmp_path):
    """delete_where/merge_into rewrite files with a fresh seq; the
    rewrite must APPLY outstanding equality deletes or the rewritten
    rows escape them."""
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, docs.repartitionByRange(4, "doc_id"), stats_cols=["doc_id"]
    )
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(7,), (500,)], "doc_id long")
    )
    # COW delete over a range containing MOR-deleted doc 7
    snaptable.delete_where(spark, path, [("doc_id", "<", 5)])
    ids = _ids(snaptable.read(spark, path))
    assert 7 not in ids and 500 not in ids and 0 not in ids
    assert len(ids) == 1000 - 5 - 2
    # merge over a file containing MOR-deleted doc 500
    delta = spark.createDataFrame(
        [(501, "u", 0)], "doc_id long, url string, bucket long"
    )
    snaptable.merge_into(spark, path, delta, key_cols=["doc_id"])
    ids = _ids(snaptable.read(spark, path))
    assert 500 not in ids and ids.count(501) == 1


def test_scan_predicates_compose_with_deletes(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, docs.repartitionByRange(4, "doc_id"), stats_cols=["doc_id"]
    )
    snaptable.delete_keys(
        spark, path, spark.range(200, 300).select(F.col("id").alias("doc_id"))
    )
    got = snaptable.scan(spark, path, [("doc_id", ">=", 250)])
    assert _ids(got) == list(range(300, 1000))
    plan = snaptable.plan_scan(path, [("doc_id", ">=", 250)])
    assert plan["files_kept"] < plan["files_total"]  # pruning intact
    assert plan["delete_rows"] == 100


def test_expire_reclaims_delete_files_after_compact(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1,)], "doc_id long")
    )
    snap = snaptable._load_snapshot(path, 2)
    del_paths = [os.path.join(path, d["path"]) for d in snap["delete_files"]]
    assert all(os.path.exists(p) for p in del_paths)
    # while snapshot 2 is live, expire must keep the delete file
    snaptable.compact(spark, path, target_files=1)
    snaptable.expire(path, keep_from=2)
    assert all(os.path.exists(p) for p in del_paths)
    assert snaptable.read(spark, path, snapshot_id=2).count() == 999
    # once no live snapshot references it, it is reclaimed
    snaptable.expire(path, keep_from=3)
    assert not any(os.path.exists(p) for p in del_paths)
    assert snaptable.read(spark, path).count() == 999


def test_incremental_read_fenced_by_eq_delete(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1,)], "doc_id long")
    )
    with pytest.raises(ValueError, match="eq-delete"):
        snaptable.read_incremental(spark, path, since=1)


def test_rollback(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.append(
        spark,
        path,
        spark.createDataFrame([(5000, "u", 0)], "doc_id long, url string, bucket long"),
    )
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(0,)], "doc_id long")
    )
    assert snaptable.read(spark, path).count() == 1000  # +1 append -1 delete
    v = snaptable.rollback(path, 1)
    assert v == 4
    got = snaptable.read(spark, path)
    assert got.count() == 1000
    assert 5000 not in _ids(got) and 0 in _ids(got)
    # history preserved: the rolled-past snapshots still time-travel
    assert snaptable.read(spark, path, snapshot_id=2).count() == 1001
    with pytest.raises(ValueError, match="does not exist"):
        snaptable.rollback(path, 99)


def test_rollback_preserves_delete_list_and_seq(spark, docs, tmp_path):
    """Rolling back TO a snapshot with outstanding deletes must keep
    them applying to the SAME files (seq carried, not restamped)."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(9,)], "doc_id long")
    )
    snaptable.append(
        spark,
        path,
        spark.createDataFrame([(6000, "u", 0)], "doc_id long, url string, bucket long"),
    )
    v = snaptable.rollback(path, 2)  # back to post-delete, pre-append
    got = snaptable.read(spark, path)
    assert got.count() == 999
    assert 9 not in _ids(got) and 6000 not in _ids(got)
    snap = snaptable._load_snapshot(path, v)
    assert len(snap["delete_files"]) == 1


def test_snapshots_df(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], "doc_id long")
    )
    sdf = snaptable.snapshots_df(spark, path)
    rows = {r["version"]: r for r in sdf.collect()}
    assert rows[1]["operation"] == "create" or rows[1]["operation"] == "append"
    assert rows[2]["operation"] == "eq-delete"
    assert rows[2]["delete_files"] == 1 and rows[2]["delete_rows"] == 2
    assert rows[2]["parent"] == 1


def test_delete_keys_on_partitioned_table(spark, tmp_path):
    """Hidden partitioning + MOR deletes compose: partition pruning on
    the data side, broadcast anti-join on the delete side."""
    path = str(tmp_path / "t")
    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    snaptable.create(
        spark, path, docs, stats_cols=["doc_id"],
        partition_by=["bucket(4, doc_id)"],
    )
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([("u5",), ("u6",)], "url string")
    )
    got = snaptable.scan(spark, path, [("doc_id", "<", 10)])
    assert _ids(got) == [0, 1, 2, 3, 4, 7, 8, 9]


def test_takedown_sink_streaming(spark, docs, tmp_path):
    """A stream of removal requests lands as eq-delete snapshots, one
    per micro-batch, replay-idempotent — the continuous-takedown path."""
    from mundipy_spark.streaming import stream_ops

    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    src_dir = str(tmp_path / "req")
    reqs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    reqs.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_ops.takedown_sink(
        stream, path, checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    got = snaptable.read(spark, path)
    assert got.count() == 970
    assert sorted(r["doc_id"] for r in got.limit(5).collect())[0] >= 0
    assert _ids(got) == list(range(30, 1000))
    hist = snaptable.snapshots(path)
    assert all(s["operation"] == "eq-delete" for s in hist[1:])
    # no data file was rewritten by any takedown batch
    m1 = {e["path"] for e in snaptable._load_manifest(path, 1)}
    mN = {e["path"] for e in snaptable._load_manifest(path, hist[-1]["version"])}
    assert m1 == mN


def test_takedown_handler_replay_idempotent(spark, docs, tmp_path):
    from mundipy_spark.streaming import stream_ops

    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    handle = stream_ops.takedown_batch_handler(path, "ckpt-T")
    batch = spark.createDataFrame([(1,), (2,)], "doc_id long")
    handle(batch, 0)
    v_after = snaptable.current_version(path)
    handle(batch, 0)  # replay of the same epoch: must not re-commit
    assert snaptable.current_version(path) == v_after
    assert snaptable.read(spark, path).count() == 998
    # a NEW epoch with different keys commits
    handle(spark.createDataFrame([(3,)], "doc_id long"), 1)
    assert snaptable.read(spark, path).count() == 997


def test_read_changes_cdc(spark, docs, tmp_path):
    """Changelog scan: inserts from appends, full retracted rows from
    eq-deletes, compaction-transparent, COW rewrites fenced."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])  # v1
    snaptable.append(
        spark,
        path,
        spark.createDataFrame(
            [(2000, "u2000", 0)], "doc_id long, url string, bucket long"
        ),
    )  # v2
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(3,), (2000,)], "doc_id long")
    )  # v3
    snaptable.compact(spark, path, target_files=1)  # v4: no logical change

    ch = snaptable.read_changes(spark, path, since=0)
    assert set(ch.columns) == {
        "doc_id", "url", "bucket", "_change_type", "_commit_version"
    }
    by = {
        (r["_change_type"], r["_commit_version"]): 1
        for r in ch.select("_change_type", "_commit_version").distinct().collect()
    }
    assert ("insert", 1) in by and ("insert", 2) in by and ("delete", 3) in by
    assert ch.filter(F.col("_change_type") == "insert").count() == 1001
    dels = ch.filter(F.col("_change_type") == "delete").collect()
    # full rows, not just keys
    assert sorted((r["doc_id"], r["url"]) for r in dels) == [
        (3, "url-3"), (2000, "u2000"),
    ]
    # consumer replay: inserts minus deletes == the head state
    applied = ch.filter(F.col("_change_type") == "insert").join(
        ch.filter(F.col("_change_type") == "delete").select("doc_id"),
        on="doc_id",
        how="left_anti",
    )
    assert applied.count() == snaptable.read(spark, path).count() == 999

    # window starting after the delete: only the nothing-burger compact
    assert snaptable.read_changes(spark, path, since=3).count() == 0
    # windows crossing a COW rewrite are fenced
    snaptable.delete_where(spark, path, [("doc_id", "<", 1)])  # v5
    with pytest.raises(ValueError, match="pre/post-image"):
        snaptable.read_changes(spark, path, since=4)


def test_read_changes_delete_of_rededup_key_scoped_to_prestate(spark, tmp_path):
    """A key deleted at v3 that was ALREADY deleted at v2 must not be
    re-emitted (the pre-state read applies earlier deletes)."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, txt string"
    )
    snaptable.create(spark, path, base, stats_cols=["doc_id"])
    snaptable.delete_keys(spark, path, spark.createDataFrame([(1,)], "doc_id long"))
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1,), (2,)], "doc_id long")
    )
    ch = snaptable.read_changes(spark, path, since=1).collect()
    assert sorted((r["doc_id"], r["_commit_version"]) for r in ch) == [
        (1, 2), (2, 3),
    ]
    assert all(r["_change_type"] == "delete" for r in ch)


def test_mor_scan_plan_shape(spark, docs, tmp_path):
    """The scale guarantee of merge-on-read: the data side scans
    straight into a BROADCAST anti-join (never SortMergeJoin, never a
    shuffle of the table); the only exchange in the plan is the
    delta-sized delete-key dedup + broadcast."""
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, docs.repartitionByRange(4, "doc_id"), stats_cols=["doc_id"]
    )
    snaptable.delete_keys(
        spark, path, spark.range(0, 100).select(F.col("id").alias("doc_id"))
    )
    plan = (
        snaptable.read(spark, path)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # one hash exchange max: the delete-key distinct (table side: none)
    assert plan.count("Exchange hashpartitioning") <= 1
