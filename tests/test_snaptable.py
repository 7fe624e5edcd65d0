"""Snapshot-manifest table (sources/snaptable.py): atomic commits,
file-level stats pruning, snapshot isolation / time travel.

Reference role: the north rule's "Iceberg table" input — commit
atomicity + manifest-based scan planning are the two properties the
10^12-doc pipeline needs from the table format.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("snaptable-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def docs(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url-"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("bucket"),
    )


def test_create_read_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    v = snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    assert v == 1
    got = snaptable.read(spark, path)
    assert got.count() == 1000
    assert sorted(got.columns) == ["bucket", "doc_id", "url"]
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(1000))


def test_append_snapshot_isolation_and_time_travel(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    more = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "url", "bucket"
    )
    v2 = snaptable.append(spark, path, more)
    assert v2 == 2
    # head sees both; snapshot 1 is frozen
    assert snaptable.read(spark, path).count() == 2000
    assert snaptable.read(spark, path, snapshot_id=1).count() == 1000
    hist = snaptable.snapshots(path)
    assert [s["version"] for s in hist] == [1, 2]
    assert hist[1]["parent"] == 1 and hist[0]["parent"] is None
    assert hist[1]["total_rows"] == 2000


def test_scan_prunes_files_and_matches_full_filter(spark, tmp_path):
    path = str(tmp_path / "t")
    # range-partitioned write -> tight per-file doc_id bounds
    df = (
        spark.range(0, 10000)
        .select(F.col("id").alias("doc_id"))
        .repartitionByRange(10, "doc_id")
    )
    snaptable.create(spark, path, df, stats_cols=["doc_id"])
    plan_all = snaptable.plan_scan(path)
    plan = snaptable.plan_scan(path, [("doc_id", ">=", 9000)])
    assert plan["files_total"] == plan_all["files_kept"] == plan_all["files_total"]
    assert 0 < plan["files_kept"] < plan["files_total"]
    got = snaptable.scan(spark, path, [("doc_id", ">=", 9000)])
    assert got.count() == 1000
    assert got.agg(F.min("doc_id")).first()[0] == 9000
    # equality predicate prunes to ~1 file
    plan_eq = snaptable.plan_scan(path, [("doc_id", "=", 123)])
    assert plan_eq["files_kept"] <= 2
    assert snaptable.scan(spark, path, [("doc_id", "=", 123)]).count() == 1


def test_missing_stats_never_pruned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("long").alias("score")
    )
    snaptable.create(spark, path, df, stats_cols=["score"])
    # all-null stats column: file must survive any predicate on it
    plan = snaptable.plan_scan(path, [("score", ">=", 5)])
    assert plan["files_kept"] == plan["files_total"]
    # ...while the row filter still applies
    assert snaptable.scan(spark, path, [("score", ">=", 5)]).count() == 0


def test_commit_is_atomic_uncommitted_files_invisible(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    # simulate a crash: data + manifest written, snapshot never created
    orphan = os.path.join(path, "data", "orphaned")
    docs.limit(5).write.parquet(orphan)
    with open(os.path.join(path, "metadata", "manifest-99.json"), "w") as f:
        json.dump({"files": [{"path": "data/orphaned/x", "rows": 5, "stats": {}}]}, f)
    assert snaptable.current_version(path) == 1
    assert snaptable.read(spark, path).count() == 1000


def test_concurrent_commit_retries_past_taken_version(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    # another writer wins version 2 between our head read and commit:
    # O_EXCL forces the retry loop to land on 3 with version-2 lineage
    import shutil

    snap1 = json.load(open(os.path.join(path, "metadata", "snap-1.json")))
    shutil.copy(
        os.path.join(path, snap1["manifest"]),
        os.path.join(path, "metadata", "manifest-2-other.json"),
    )
    snap2 = dict(
        snap1, version=2, parent=1, manifest="metadata/manifest-2-other.json"
    )
    with open(os.path.join(path, "metadata", "snap-2.json"), "w") as f:
        json.dump(snap2, f)
    v = snaptable.append(spark, path, docs.limit(10))
    assert v == 3
    # head = snap-2's files (1000) + the 10 appended
    assert snaptable.read(spark, path).count() == 1010


def test_incremental_read_returns_only_the_delta(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    b2 = docs.select((F.col("doc_id") + 1000).alias("doc_id"), "url", "bucket")
    b3 = docs.select((F.col("doc_id") + 2000).alias("doc_id"), "url", "bucket")
    snaptable.append(spark, path, b2)
    snaptable.append(spark, path, b3)
    inc = snaptable.read_incremental(spark, path, since=1)
    assert inc.count() == 2000
    assert inc.agg(F.min("doc_id")).first()[0] == 1000
    only3 = snaptable.read_incremental(spark, path, since=2)
    assert only3.count() == 1000 and only3.agg(F.min("doc_id")).first()[0] == 2000
    mid = snaptable.read_incremental(spark, path, since=1, until=2)
    assert mid.count() == 1000 and mid.agg(F.max("doc_id")).first()[0] == 1999
    assert snaptable.read_incremental(spark, path, since=3).count() == 0


def test_compact_preserves_rows_reduces_files_keeps_time_travel(
    spark, docs, tmp_path
):
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, docs.repartition(6), stats_cols=["doc_id"]
    )
    snaptable.append(spark, path, docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "url", "bucket"
    ).repartition(6))
    before = snaptable.plan_scan(path)
    v = snaptable.compact(spark, path, target_files=2)
    after = snaptable.plan_scan(path)
    assert snaptable._load_snapshot(path, v)["operation"] == "replace"
    assert after["files_total"] < before["files_total"]
    assert after["files_total"] <= 2
    got = snaptable.read(spark, path)
    assert got.count() == 2000
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(2000))
    # pre-compaction snapshots still readable (files not deleted)
    assert snaptable.read(spark, path, snapshot_id=2).count() == 2000
    # compacted files still carry prune-able stats
    pruned = snaptable.plan_scan(path, [("doc_id", ">=", 1990)])
    assert pruned["files_kept"] <= after["files_total"]
    # incremental read refuses to cross the replace
    with pytest.raises(ValueError, match="replace"):
        snaptable.read_incremental(spark, path, since=1)


def test_expire_drops_old_snapshots_keeps_recent(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.append(spark, path, docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "url", "bucket"
    ))
    snaptable.compact(spark, path, target_files=1)  # snap 3 (replace)
    acct = snaptable.expire(path, keep_from=3)
    assert acct["removed_data_files"] > 0
    assert [s["version"] for s in snaptable.snapshots(path)] == [3]
    assert snaptable.read(spark, path).count() == 2000
    with pytest.raises(FileNotFoundError):
        snaptable.read(spark, path, snapshot_id=1)


def test_empty_prune_returns_typed_empty_frame(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    got = snaptable.scan(spark, path, [("doc_id", ">", 10_000_000)])
    assert got.count() == 0
    assert sorted(got.columns) == ["bucket", "doc_id", "url"]


def test_streaming_sink_commits_one_snapshot_per_batch(spark, tmp_path):
    """snaptable as a Structured Streaming sink: each micro-batch is an
    atomic append snapshot; the table equals the streamed input."""
    from mundipy_spark.streaming import stream_ops

    src_dir = str(tmp_path / "src")
    path = str(tmp_path / "t")
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u-"), F.col("id")).alias("url"),
    )
    docs.repartition(3).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_ops.snaptable_sink(
        stream,
        path,
        stats_cols=["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)
    hist = snaptable.snapshots(path)
    assert len(hist) >= 1
    assert hist[0]["operation"] == "create"
    assert all(s["operation"] == "append" for s in hist[1:])
    got = snaptable.read(spark, path)
    assert got.count() == 300
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(300))


def test_ingest_stream_lands_in_snaptable(spark, tmp_path):
    """Full crawl arrival path: html pages stream in, ingest_stream
    extracts + filters + collapses recrawls, snaptable_sink commits
    each micro-batch atomically — batch consumers then read committed
    snapshots of (url, text, ...) with no half-written batches."""
    from mundipy_spark.sources import pages as pages_src
    from mundipy_spark.streaming import stream_ops

    base = pages_src.synth_pages(spark, "/root/testdata/sf0.001").limit(60).select(
        "doc_id", "url", "warc_ts", "text"
    )
    wrapped = base.withColumn(
        "html",
        F.encode(
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")),
            "UTF-8",
        ),
    ).drop("text")
    src = str(tmp_path / "in")
    path = str(tmp_path / "t")
    wrapped.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(wrapped.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream_ops.snaptable_sink(
        stream_ops.ingest_stream(stream),
        path,
        stats_cols=["doc_id"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(180)
    got = snaptable.read(spark, path)
    assert got.count() == 60
    # extracted text round-trips byte-identically through the stream+table
    want = {(r.doc_id, r.text) for r in base.collect()}
    have = {(r.doc_id, r.text) for r in got.collect()}
    assert have == want


def test_delete_where_rewrites_only_affected_files(spark, tmp_path):
    """Copy-on-write takedown: matching rows vanish at the head, files
    whose stats exclude the predicate keep their exact paths (rewrite
    cost ~ affected fraction), pre-delete snapshots still serve the
    rows until expire()."""
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 10000)
        .select(F.col("id").alias("doc_id"),
                F.concat(F.lit("u-"), F.col("id")).alias("url"))
        .repartitionByRange(10, "doc_id")
    )
    snaptable.create(spark, path, df, stats_cols=["doc_id"])
    before = {e["path"] for e in snaptable._load_manifest(path, 1)}
    v = snaptable.delete_where(
        spark, path, [("doc_id", ">=", 9000), ("doc_id", "<", 9100)]
    )
    assert snaptable._load_snapshot(path, v)["operation"] == "delete"
    got = snaptable.read(spark, path)
    assert got.count() == 9900
    assert got.filter((F.col("doc_id") >= 9000) & (F.col("doc_id") < 9100)).count() == 0
    # untouched files kept their paths
    after = {e["path"] for e in snaptable._load_manifest(path, v)}
    assert len(before & after) >= 8
    # time travel still serves the deleted rows until expiry
    assert snaptable.read(spark, path, snapshot_id=1).count() == 10000
    # incremental read refuses to cross the delete
    with pytest.raises(ValueError, match="delete"):
        snaptable.read_incremental(spark, path, since=1)
    # deleting everything leaves a valid empty head
    snaptable.delete_where(spark, path, [("doc_id", ">=", 0)])
    assert snaptable.read(spark, path).count() == 0
    # no-op delete commits nothing
    head = snaptable.current_version(path)
    assert snaptable.delete_where(spark, path, [("doc_id", ">=", 10**9)]) == head
    assert snaptable.current_version(path) == head


def test_additive_schema_evolution(spark, docs, tmp_path):
    """A new column appears mid-corpus: head reads null-fill the old
    files, time travel to the pre-evolution snapshot keeps the old
    schema; drops/retypes are rejected."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    evolved = docs.select(
        (F.col("doc_id") + 1000).alias("doc_id"), "url", "bucket",
        (F.col("doc_id") % 100).cast("double").alias("quality"),
    )
    snaptable.append(spark, path, evolved)
    head = snaptable.read(spark, path)
    assert "quality" in head.columns
    assert head.count() == 2000
    assert head.filter(F.col("quality").isNull()).count() == 1000
    assert head.filter(F.col("quality").isNotNull()).count() == 1000
    # pre-evolution snapshot keeps its own schema
    assert "quality" not in snaptable.read(spark, path, snapshot_id=1).columns
    # destructive evolution rejected
    with pytest.raises(ValueError, match="drops column"):
        snaptable.append(spark, path, docs.drop("bucket"))
    with pytest.raises(ValueError, match="retypes column"):
        snaptable.append(
            spark, path, docs.withColumn("bucket", F.col("bucket").cast("string"))
        )
    # stats pruning still works across the evolution boundary
    plan = snaptable.plan_scan(path, [("doc_id", ">=", 1000)])
    assert plan["files_kept"] < plan["files_total"]


def test_rewrite_commit_conflicts_instead_of_dropping_concurrent_append(
    spark, docs, tmp_path
):
    """compact/delete plan against a specific head; if another commit
    lands first, blindly retrying would publish a file set WITHOUT the
    newcomer's files. The commit must fail with ConflictError instead
    (Iceberg's replace validation)."""
    import shutil

    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    # simulate a concurrent append winning version 2 mid-compact
    snap1 = json.load(open(os.path.join(path, "metadata", "snap-1.json")))
    shutil.copy(
        os.path.join(path, snap1["manifest"]),
        os.path.join(path, "metadata", "manifest-2.json"),
    )
    real_compact_commit = snaptable._commit

    def racing_commit(p, entries, op, stats, schema, carry, **kw):
        if not os.path.exists(snaptable._snap_path(p, 2)):
            snap2 = dict(
                snap1, version=2, parent=1, manifest="metadata/manifest-2.json"
            )
            with open(snaptable._snap_path(p, 2), "w") as f:
                json.dump(snap2, f)
        return real_compact_commit(p, entries, op, stats, schema, carry, **kw)

    snaptable._commit = racing_commit
    try:
        with pytest.raises(snaptable.ConflictError, match="re-plan"):
            snaptable.compact(spark, path, target_files=1)
    finally:
        snaptable._commit = real_compact_commit
    # table is undamaged: the racer's snapshot is head, rows intact
    assert snaptable.current_version(path) == 2
    assert snaptable.read(spark, path).count() == 1000
    # a fresh compact against the NEW head succeeds
    v = snaptable.compact(spark, path, target_files=1)
    assert v == 3 and snaptable.read(spark, path).count() == 1000


def test_lost_race_cannot_clobber_winners_manifest(spark, docs, tmp_path):
    """Manifest names are unique per commit ATTEMPT: a losing committer
    writes its manifest before the O_EXCL snap create decides the race,
    so a deterministic manifest-{v}.json would let the loser truncate
    the winner's already-committed manifest. 8 threads racing appends
    must leave every snapshot's manifest self-consistent."""
    import threading

    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs.limit(100), stats_cols=["doc_id"])
    errs = []

    def add(i):
        try:
            snaptable.append(
                spark,
                path,
                docs.filter(F.col("doc_id") == i).limit(1),
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=add, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    snaps = snaptable.snapshots(path)
    assert len(snaps) == 9
    # every snapshot's manifest exists, is unique, and its row total
    # matches the snapshot metadata written atomically with it
    seen = set()
    for s in snaps:
        assert s["manifest"] not in seen
        seen.add(s["manifest"])
        files = json.load(open(os.path.join(path, s["manifest"])))["files"]
        assert sum(e["rows"] for e in files) == s["total_rows"]
    # no append lost: head carries the create's 100 + one row per thread
    assert snaptable.read(spark, path).count() == 108


def test_table_rooted_under_a_data_directory(spark, docs, tmp_path):
    """Path relativization must key on the table's OWN data dir (the
    last /data/ segment), not the first one in the absolute path."""
    path = str(tmp_path / "data" / "tbl")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    assert snaptable.read(spark, path).count() == 1000
    plan = snaptable.plan_scan(path, [("doc_id", "<", 10)])
    assert all(os.path.exists(f) for f in plan["files"])


def test_timestamp_stats_prune_and_scan(spark, tmp_path):
    """Timestamp stats columns: stats are stored as ISO strings; a
    datetime predicate must neither crash nor misprune (the coercion
    mirrors _json_safe on both sides)."""
    import datetime

    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(days=F.col("id").cast("int"))
        ).alias("warc_ts"),
    ).repartition(4, "doc_id")
    snaptable.create(spark, path, df, stats_cols=["warc_ts"])
    cut = datetime.datetime(2026, 3, 1)
    got = snaptable.scan(spark, path, [("warc_ts", ">=", cut)])
    want = df.filter(F.col("warc_ts") >= F.lit(cut))
    assert got.count() == want.count() > 0


def test_delete_all_rows_leaves_readable_empty_head(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    v = snaptable.delete_where(spark, path, [("doc_id", ">=", 0)])
    assert v == 2
    assert snaptable.read(spark, path).count() == 0
    # time travel still sees the pre-delete rows
    assert snaptable.read(spark, path, snapshot_id=1).count() == 1000


def test_expire_reclaims_orphaned_manifests(spark, docs, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    snaptable.append(spark, path, docs.limit(10))
    # a lost race / crashed committer leaves an unreferenced manifest
    orphan = os.path.join(path, "metadata", "manifest-9-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump({"files": []}, f)
    snaptable.expire(path, keep_from=2)
    assert not os.path.exists(orphan)
    live = {s["manifest"] for s in snaptable.snapshots(path)}
    on_disk = {
        os.path.join("metadata", n)
        for n in os.listdir(os.path.join(path, "metadata"))
        if n.startswith("manifest-")
    }
    assert on_disk == live
    assert snaptable.read(spark, path).count() == 1010


def test_streaming_sink_replayed_epoch_commits_once(spark, tmp_path):
    """foreachBatch replays a batch when the driver dies between the
    table commit and the streaming checkpoint; the handler must skip an
    epoch some committed snapshot already carries."""
    from mundipy_spark.streaming import stream_ops

    path = str(tmp_path / "t")
    handle = stream_ops.snaptable_batch_handler(path, ["doc_id"], "ckpt-A")
    batch = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    handle(batch, 0)
    handle(batch, 0)  # replay after simulated crash
    assert snaptable.current_version(path) == 1
    assert snaptable.read(spark, path).count() == 50
    handle(batch, 1)  # a genuinely new epoch appends
    assert snaptable.current_version(path) == 2
    assert snaptable.read(spark, path).count() == 100
    # a DIFFERENT query (own checkpoint) writing the same table is not
    # deduped against query A's epoch numbering
    other = stream_ops.snaptable_batch_handler(path, ["doc_id"], "ckpt-B")
    other(batch, 0)
    assert snaptable.read(spark, path).count() == 150


def test_commit_storm_never_exposes_torn_snapshot(tmp_path):
    """A snapshot file must never be visible with incomplete content.

    The old publish path O_EXCL-created snap-{v}.json and wrote the
    JSON afterwards: in that window snapshots()/a retrying committer
    read an empty file and died on JSONDecodeError (reproduced under
    CPU contention), and a crash inside it corrupted the head forever.
    The link-publish path writes a tmp fully, then os.link()s it onto
    the snap name — atomic, exclusive, content-complete. Pin it with a
    metadata-only commit storm: 8 committers x 20 appends racing 4
    continuous readers, no Spark involved."""
    import threading

    path = str(tmp_path / "t")
    snaptable._commit(
        path, [{"path": "data/x0.parquet", "rows": 1}], "create", [], "{}", False
    )
    errs: list = []
    stop = False

    def committer(i):
        try:
            for j in range(20):
                snaptable._commit(
                    path,
                    [{"path": f"data/x{i}_{j}.parquet", "rows": 1}],
                    "append", [], "{}", True, max_retries=500,
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def reader():
        try:
            while not stop:
                snaptable.snapshots(path)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    rs = [threading.Thread(target=reader) for _ in range(4)]
    cs = [threading.Thread(target=committer, args=(i,)) for i in range(8)]
    [t.start() for t in rs + cs]
    [t.join() for t in cs]
    stop = True
    [t.join() for t in rs]
    assert not errs, errs
    snaps = snaptable.snapshots(path)
    assert len(snaps) == 161  # create + 160 appends, none lost
    assert snaps[-1]["total_rows"] == 161
    # no tmp leaks from won or lost attempts
    assert not [
        n for n in os.listdir(os.path.join(path, "metadata"))
        if n.endswith(".tmp")
    ]


def test_crashed_commit_attempt_is_invisible_and_reclaimed(
    spark, docs, tmp_path
):
    """A committer that dies after writing its snap tmp (before the
    link publish) must not perturb the head, reads, or later commits;
    expire() reclaims the orphaned tmp."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, docs, stats_cols=["doc_id"])
    meta = os.path.join(path, "metadata")
    orphan = os.path.join(meta, "snap-2.json.deadbeef.tmp")
    with open(orphan, "w") as f:
        f.write("")  # even torn content is fine: nothing reads tmps
    assert snaptable.current_version(path) == 1
    assert snaptable.read(spark, path).count() == 1000
    v = snaptable.append(spark, path, docs.limit(5))
    assert v == 2  # the crashed attempt never claimed version 2
    # a FRESH tmp may belong to an in-flight commit: expire must keep it
    snaptable.expire(path, keep_from=2)
    assert os.path.exists(orphan)
    # ...and reap it once it is older than the min-age guard
    old = time.time() - 3600
    os.utime(orphan, (old, old))
    snaptable.expire(path, keep_from=2)
    assert not os.path.exists(orphan)


def test_merge_upsert_rewrites_only_touched_files(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("v1-"), F.col("id")).alias("text"),
        )
        .repartitionByRange(10, "doc_id")
    )
    snaptable.create(spark, path, df, stats_cols=["doc_id"])
    before = set(snaptable.plan_scan(path)["files"])
    # recrawl delta: 50 updated docs in one id slice + 10 brand-new ids
    src = spark.range(0, 60).select(
        F.when(F.col("id") < 50, F.col("id") + 100)
        .otherwise(F.col("id") - 50 + 5000)
        .alias("doc_id"),
        F.lit("v2").alias("text"),
    )
    v = snaptable.merge_into(spark, path, src, key_cols=["doc_id"])
    assert v == 2
    head = snaptable.read(spark, path)
    assert head.count() == 1010  # 1000 - 50 replaced + 60 source
    assert head.filter(F.col("text") == "v2").count() == 60
    # updated ids carry the new text, untouched ids the old
    assert (
        head.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
        .filter(F.col("text") != "v2")
        .count()
        == 0
    )
    assert head.filter(F.col("doc_id") == 99).first()["text"] == "v1-99"
    # only the file(s) whose range covers 100..149 were rewritten:
    # untouched manifest entries keep their original paths
    after = set(snaptable.plan_scan(path)["files"])
    assert len(before & after) >= 8  # >= 8 of 10 original files survive
    # time travel still sees v1
    assert (
        snaptable.read(spark, path, snapshot_id=1)
        .filter(F.col("text") == "v2")
        .count()
        == 0
    )


def test_merge_schema_evolution_and_null_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("old").alias("text")
    )
    snaptable.create(spark, path, df, stats_cols=["doc_id"])
    # source adds a column AND carries two null-key rows (pure inserts)
    src = spark.createDataFrame(
        [(5, "new", 0.9), (None, "nk1", 0.1), (None, "nk2", 0.2)],
        "doc_id long, text string, quality double",
    )
    snaptable.merge_into(spark, path, src, key_cols=["doc_id"])
    head = snaptable.read(spark, path)
    assert head.count() == 102
    assert head.filter(F.col("doc_id") == 5).first()["text"] == "new"
    # survivors null-fill the evolved column
    assert head.filter(F.col("doc_id") == 6).first()["quality"] is None
    assert head.filter(F.col("doc_id").isNull()).count() == 2


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(
        spark,
        path,
        spark.range(0, 10).select(F.col("id").alias("doc_id")),
        stats_cols=["doc_id"],
    )
    dup = spark.createDataFrame([(1,), (1,)], "doc_id long")
    with pytest.raises(ValueError, match="duplicate keys"):
        snaptable.merge_into(spark, path, dup, key_cols=["doc_id"])
    # but duplicate NULL keys are plain inserts, not a violation
    nulls = spark.createDataFrame([(None,), (None,)], "doc_id long")
    snaptable.merge_into(spark, path, nulls, key_cols=["doc_id"])
    assert snaptable.read(spark, path).count() == 12


def test_merge_fences_incremental_read(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(
        spark,
        path,
        spark.range(0, 10).select(F.col("id").alias("doc_id")),
        stats_cols=["doc_id"],
    )
    snaptable.merge_into(
        spark,
        path,
        spark.createDataFrame([(3,)], "doc_id long"),
        key_cols=["doc_id"],
    )
    with pytest.raises(ValueError, match="incremental read cannot cross"):
        snaptable.read_incremental(spark, path, since=1)


def test_merge_no_matches_appends_without_rewrites(spark, tmp_path):
    path = str(tmp_path / "t")
    df = (
        spark.range(0, 1000)
        .select(F.col("id").alias("doc_id"))
        .repartitionByRange(4, "doc_id")
    )
    snaptable.create(spark, path, df, stats_cols=["doc_id"])
    before = set(snaptable.plan_scan(path)["files"])
    src = spark.range(5000, 5020).select(F.col("id").alias("doc_id"))
    snaptable.merge_into(spark, path, src, key_cols=["doc_id"])
    after = set(snaptable.plan_scan(path)["files"])
    assert before <= after  # nothing rewritten, only new files
    assert snaptable.read(spark, path).count() == 1020


def test_merge_empty_source_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(
        spark,
        path,
        spark.range(0, 10).select(F.col("id").alias("doc_id")),
        stats_cols=["doc_id"],
    )
    empty = spark.range(0, 0).select(F.col("id").alias("doc_id"))
    v = snaptable.merge_into(spark, path, empty, key_cols=["doc_id"])
    assert v == 1  # no new snapshot
    assert snaptable.read(spark, path).count() == 10


def test_zorder_compact_prunes_2d_box(spark, tmp_path):
    """compact(zorder_by=[x,y]) clusters files into tight 2-D rectangles:
    a conjunctive box predicate prunes far more files than the linear
    clustering a plain sort would give, and the row set is unchanged."""
    path = str(tmp_path / "t")
    # 64x64 grid, written in row-major order (linear in x)
    grid = spark.range(0, 4096).select(
        (F.col("id") % 64).cast("double").alias("x"),
        (F.col("id") / 64).cast("long").cast("double").alias("y"),
    )
    snaptable.create(
        spark, path, grid.repartitionByRange(64, "y"), stats_cols=["x", "y"]
    )
    box = [("x", ">=", 10.0), ("x", "<=", 20.0), ("y", ">=", 10.0), ("y", "<=", 20.0)]
    before = snaptable.plan_scan(path, box)
    # y-range-partitioned layout: x spans the full range in every file,
    # so every file whose y slice touches [10, 20] survives (~11 of 64)
    assert before["files_kept"] >= 10
    v = snaptable.compact(spark, path, target_files=64, zorder_by=["x", "y"])
    after = snaptable.plan_scan(path, box)
    assert after["files_kept"] < before["files_kept"]
    # ~8x8 Morton quadrants: the 11x11 box touches 2x2 of them (+ slack
    # for range-sampler boundaries not landing exactly on quadrant edges)
    assert after["files_kept"] <= 8
    got = snaptable.scan(spark, path, box)
    assert got.count() == 11 * 11
    # full table unchanged by the rewrite
    assert snaptable.read(spark, path).count() == 4096
    assert snaptable._load_snapshot(path, v)["operation"] == "replace"


def test_streaming_merge_sink_upserts_by_key(spark, tmp_path):
    """snaptable_sink(key_cols=...): first batch creates, later batches
    UPSERT — a re-crawled url replaces its stored row; replayed epochs
    commit once."""
    from mundipy_spark.streaming import stream_ops

    path = str(tmp_path / "t")
    handle = stream_ops.snaptable_batch_handler(
        path, ["doc_id"], "ckpt-M", key_cols=["url"]
    )
    b0 = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u-"), F.col("id") % 30).alias("url"),
        F.lit("v1").alias("body"),
    ).dropDuplicates(["url"])
    handle(b0, 0)
    assert snaptable.read(spark, path).count() == 30
    # batch 1 re-fetches 5 urls (u-25..u-29) + 10 new (u-30..u-39)
    b1 = spark.range(0, 15).select(
        (F.col("id") + 100).alias("doc_id"),
        F.concat(F.lit("u-"), F.col("id") + 25).alias("url"),
        F.lit("v2").alias("body"),
    )
    handle(b1, 1)
    head = snaptable.read(spark, path)
    assert head.count() == 40  # 30 stored - 5 replaced (u-25..29) + 15
    assert head.filter(F.col("body") == "v2").count() == 15
    # replay of epoch 1 must not double-apply
    handle(b1, 1)
    assert snaptable.read(spark, path).count() == 40
    assert snaptable._load_snapshot(
        path, snaptable.current_version(path)
    )["operation"] == "merge"


def test_compact_small_binpacks_only_the_small_tail(spark, tmp_path):
    """Bin-pack maintenance: one well-sized file plus a tail of
    micro-batch files; compact_small merges ONLY the tail (the big
    file's manifest entry — path and seq — survives verbatim), the
    row set is unchanged, and sub-threshold no-ops don't commit."""
    import os as _os

    path = str(tmp_path / "t")
    big = spark.range(0, 200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-" * 40), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("bucket"),
    )
    snaptable.create(spark, path, big.coalesce(1), stats_cols=["doc_id"])
    for i in range(4):  # the micro-batch tail
        snaptable.append(
            spark,
            path,
            spark.range(200_000 + i * 10, 200_000 + i * 10 + 10).select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("u"), F.col("id")).alias("url"),
                (F.col("id") % 7).alias("bucket"),
            ).coalesce(1),
        )
    before = snaptable._load_manifest(path, snaptable.current_version(path))
    big_entry = max(
        before, key=lambda e: _os.path.getsize(_os.path.join(path, e["path"]))
    )
    v = snaptable.compact_small(spark, path, small_mb=1.0, target_mb=64.0)
    after = snaptable._load_manifest(path, v)
    assert len(after) < len(before)
    kept = [e for e in after if e["path"] == big_entry["path"]]
    assert kept and kept[0].get("seq") == big_entry.get("seq")
    got = snaptable.read(spark, path)
    assert got.count() == 200_040
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(200_000)) + sum(
        range(200_000, 200_040)
    )
    # nothing small left to merge: no-op, no new snapshot
    assert snaptable.compact_small(spark, path, small_mb=1.0) == v


def test_compact_small_applies_deletes_to_rewritten_rows_only(spark, tmp_path):
    """Outstanding eq-deletes are absorbed by the rewritten tail (fresh
    seq) but stay on the snapshot to keep masking the untouched big
    file; total visibility is unchanged and a later re-append of a
    deleted key still wins."""
    path = str(tmp_path / "t")
    big = spark.range(0, 100_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("pay-" * 50), F.col("id")).alias("url"),
    )
    snaptable.create(spark, path, big.coalesce(1), stats_cols=["doc_id"])
    snaptable.append(
        spark,
        path,
        spark.range(100_000, 100_020).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("u"), F.col("id")).alias("url"),
        ).coalesce(1),
    )
    # delete keys hitting BOTH the big file (5) and the tail (100_005)
    snaptable.delete_keys(
        spark,
        path,
        spark.createDataFrame([(5,), (100_005,)], "doc_id long"),
    )
    visible_before = snaptable.read(spark, path).agg(
        F.count("*"), F.sum("doc_id")
    ).first()
    v = snaptable.compact_small(spark, path, small_mb=0.5)
    snap = snaptable._load_snapshot(path, v)
    assert snap["delete_files"], "delete list must stay outstanding"
    visible_after = snaptable.read(spark, path).agg(
        F.count("*"), F.sum("doc_id")
    ).first()
    assert tuple(visible_before) == tuple(visible_after)
    # the rewritten tail dropped 100_005 physically: re-append wins
    snaptable.append(
        spark,
        path,
        spark.createDataFrame([(100_005, "re")], "doc_id long, url string"),
    )
    assert (
        snaptable.read(spark, path).filter(F.col("doc_id") == 100_005).count()
        == 1
    )
