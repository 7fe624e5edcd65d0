"""Named refs (tags) + write-audit-publish staging on the snapshot
table (sources/snaptable.py): tag retention through expire, read by
ref (library + format("snaptable")), staged-snapshot invisibility,
audit view, cherry-pick publish over concurrent commits, and the
publish fences (partition-spec / schema evolution since staging).

Reference role: the north rule's Iceberg input table — tags and WAP
are Iceberg's ref-retention and wap.id workflows, the collaboration
surface a shared 10^12-doc crawl table needs.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("snaptable-refs-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url-"), F.col("id")).alias("url"),
    )


def test_tag_pins_snapshot_through_expire(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    snaptable.append(spark, path, _docs(spark, 100, 200))  # v2
    snaptable.append(spark, path, _docs(spark, 200, 300))  # v3
    assert snaptable.tag(path, "release-1") == 3  # default: head
    snaptable.tag(path, "genesis", snapshot_id=1)
    snaptable.append(spark, path, _docs(spark, 300, 400))  # v4
    assert snaptable.tags(path) == {"release-1": 3, "genesis": 1}

    # expire everything below head: tagged v1 and v3 must survive,
    # untagged v2 must be gone
    snaptable.expire(path, keep_from=4)
    assert snaptable.read(spark, path, ref="genesis").count() == 100
    assert snaptable.read(spark, path, ref="release-1").count() == 300
    with pytest.raises(Exception):
        snaptable.read(spark, path, snapshot_id=2).count()
    assert snaptable.read(spark, path).count() == 400

    # drop the tag -> the pin is gone and expire reclaims it
    snaptable.drop_tag(path, "genesis")
    snaptable.expire(path, keep_from=4)
    with pytest.raises(Exception):
        snaptable.read(spark, path, snapshot_id=1).count()
    # release-1 still pinned
    assert snaptable.read(spark, path, ref="release-1").count() == 300


def test_tag_is_immutable_and_validated(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 10), stats_cols=["doc_id"])
    snaptable.tag(path, "r1")
    with pytest.raises(ValueError, match="immutable"):
        snaptable.tag(path, "r1")
    with pytest.raises(ValueError, match="cannot tag"):
        snaptable.tag(path, "r2", snapshot_id=99)
    with pytest.raises(ValueError, match="ref name"):
        snaptable.tag(path, "bad/name")
    with pytest.raises(ValueError, match="unknown ref"):
        snaptable.resolve_ref(path, "nope")
    with pytest.raises(ValueError, match="no tag"):
        snaptable.drop_tag(path, "nope")


def test_format_reads_by_ref(spark, tmp_path):
    from mundipy_spark.sources import spark_datasource

    spark_datasource.register(spark)
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    snaptable.tag(path, "small")
    snaptable.append(spark, path, _docs(spark, 50, 500))
    got = (
        spark.read.format("snaptable")
        .option("path", path)
        .option("ref", "small")
        .load()
    )
    assert got.count() == 50
    with pytest.raises(Exception, match="not both"):
        (
            spark.read.format("snaptable")
            .option("path", path)
            .option("ref", "small")
            .option("snapshot_id", "1")
            .load()
            .count()
        )


def test_wap_stage_audit_publish(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    sid = snaptable.stage_append(
        spark, path, _docs(spark, 100, 160), wap_id="wave-7"
    )
    assert sid == "wave-7"
    # invisible to every committed read path
    assert snaptable.current_version(path) == 1
    assert snaptable.read(spark, path).count() == 100
    assert snaptable.read_incremental(spark, path, since=0).count() == 100
    st = snaptable.staged(path)
    assert [s["id"] for s in st] == ["wave-7"] and st[0]["rows"] == 60
    # audit view = head + stage, exactly what publish would produce
    audit = snaptable.read_staged(spark, path, "wave-7")
    assert audit.count() == 160
    assert audit.agg(F.sum("doc_id")).first()[0] == sum(range(160))
    v = snaptable.publish_staged(spark, path, "wave-7")
    assert v == 2
    assert snaptable.read(spark, path).count() == 160
    assert snaptable._load_snapshot(path, v)["wap_id"] == "wave-7"
    assert snaptable.staged(path) == []  # consumed
    with pytest.raises(ValueError, match="no staged"):
        snaptable.publish_staged(spark, path, "wave-7")
    # duplicate wap_id is rejected at stage time
    snaptable.stage_append(spark, path, _docs(spark, 160, 170), wap_id="w8")
    with pytest.raises(ValueError, match="already exists"):
        snaptable.stage_append(spark, path, _docs(spark, 170, 180), wap_id="w8")


def test_wap_publish_cherry_picks_over_concurrent_commits(spark, tmp_path):
    """Commits landing between stage and publish are preserved — the
    staged entries re-apply on the new head (Iceberg cherrypick), and
    an eq-delete landing meanwhile does NOT mask the staged rows
    (their seq is the publish version, newer than the delete)."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    sid = snaptable.stage_append(spark, path, _docs(spark, 100, 150))
    snaptable.append(spark, path, _docs(spark, 150, 200))  # v2, concurrent
    # a takedown for a key that ALSO exists in the staged wave
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(120,), (5,)], "doc_id long")
    )  # v3: deletes 5 from v1; 120 not yet visible
    v = snaptable.publish_staged(spark, path, sid)
    got = snaptable.read(spark, path)
    # 100 base - 1 deleted (5) + 50 concurrent + 50 staged (120 kept:
    # staged seq > delete seq)
    assert got.count() == 199
    assert got.filter(F.col("doc_id") == 120).count() == 1
    assert got.filter(F.col("doc_id") == 5).count() == 0
    assert snaptable._load_snapshot(path, v)["operation"] == "append"


def test_wap_publish_fences_schema_and_spec_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    sid = snaptable.stage_append(spark, path, _docs(spark, 50, 60))
    # additive evolution lands after staging: head gains a column the
    # staged files lack -> publish must refuse (stale stage)
    snaptable.append(
        spark,
        path,
        _docs(spark, 60, 70).withColumn("lang", F.lit("en")),
    )
    with pytest.raises(snaptable.ConflictError, match="evolved past"):
        snaptable.publish_staged(spark, path, sid)
    snaptable.drop_staged(path, sid)

    # partition-spec evolution after staging -> publish must refuse
    sid2 = snaptable.stage_append(
        spark, path, _docs(spark, 70, 80).withColumn("lang", F.lit("fr"))
    )
    snaptable.evolve_partition_by(path, ["bucket(4, doc_id)"])
    with pytest.raises(snaptable.ConflictError, match="partition spec"):
        snaptable.publish_staged(spark, path, sid2)


def test_drop_staged_reclaims_files(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    sid = snaptable.stage_append(spark, path, _docs(spark, 50, 90).coalesce(2))
    entries = snaptable._load_staged(path, sid)["entries"]
    assert all(os.path.exists(os.path.join(path, e["path"])) for e in entries)
    removed = snaptable.drop_staged(path, sid)
    assert removed == len(entries) >= 2
    assert not any(
        os.path.exists(os.path.join(path, e["path"])) for e in entries
    )
    with pytest.raises(ValueError, match="no staged"):
        snaptable.publish_staged(spark, path, sid)
    # table untouched
    assert snaptable.read(spark, path).count() == 50


def test_expire_leaves_staged_files_alone(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    sid = snaptable.stage_append(spark, path, _docs(spark, 50, 70))
    snaptable.append(spark, path, _docs(spark, 70, 90))
    snaptable.expire(path, keep_from=2)
    # the stage is still fully publishable after the expire
    v = snaptable.publish_staged(spark, path, sid)
    assert snaptable.read(spark, path, snapshot_id=v).count() == 90


def test_partitions_df_accounting(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    snaptable.create(
        spark, path, df, stats_cols=["doc_id"],
        partition_by=["bucket(4, doc_id)"],
    )
    parts = snaptable.partitions_df(spark, path).collect()
    assert len(parts) == 4
    assert sum(r["row_count"] for r in parts) == 400
    assert all(r["file_count"] >= 1 and r["bytes"] > 0 for r in parts)

    # unpartitioned: one '{}' row
    path2 = str(tmp_path / "t2")
    snaptable.create(spark, path2, df, stats_cols=["doc_id"])
    parts2 = snaptable.partitions_df(spark, path2).collect()
    assert len(parts2) == 1 and parts2[0]["partition"] == "{}"
    assert parts2[0]["row_count"] == 400


def test_add_files_adopts_in_place(spark, tmp_path):
    """External parquet joins the table with no rewrite: manifest
    entries point at the original absolute paths, stats pruning works
    on them, MOR deletes apply to them, and re-adoption is rejected."""
    ext = str(tmp_path / "external")
    _docs(spark, 1000, 1400).repartitionByRange(4, "doc_id").write.parquet(ext)
    path = str(tmp_path / "t")
    snaptable.create(
        spark,
        path,
        _docs(spark, 0, 100).repartitionByRange(2, "doc_id"),
        stats_cols=["doc_id"],
    )
    v = snaptable.add_files(spark, path, ext)
    got = snaptable.read(spark, path)
    assert got.count() == 500
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(100)) + sum(
        range(1000, 1400)
    )
    # files were NOT copied: entries reference the external dir
    adopted = [
        e
        for e in snaptable._load_manifest(path, v)
        if e["path"].startswith(ext)
    ]
    assert len(adopted) == 4
    assert snaptable._load_snapshot(path, v)["adopted_files"] == 4
    # stats pruning drops range-disjoint adopted files
    plan = snaptable.plan_scan(path, [("doc_id", ">=", 1300)])
    assert plan["files_kept"] < plan["files_total"]
    assert (
        snaptable.scan(spark, path, [("doc_id", ">=", 1300)]).count() == 100
    )
    # MOR delete reaches adopted rows
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(1005,)], "doc_id long")
    )
    assert snaptable.read(spark, path).count() == 499
    # double adoption would double-count: rejected
    with pytest.raises(ValueError, match="already in the table"):
        snaptable.add_files(spark, path, ext)


def test_add_files_schema_must_match_exactly(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    extra = str(tmp_path / "extra")
    _docs(spark, 100, 150).withColumn("lang", F.lit("en")).write.parquet(extra)
    with pytest.raises(ValueError, match="does not match table schema"):
        snaptable.add_files(spark, path, extra)
    missing = str(tmp_path / "missing")
    _docs(spark, 100, 150).drop("url").write.parquet(missing)
    with pytest.raises(ValueError, match="does not match table schema"):
        snaptable.add_files(spark, path, missing)
    retyped = str(tmp_path / "retyped")
    _docs(spark, 100, 150).withColumn(
        "doc_id", F.col("doc_id").cast("int")
    ).write.parquet(retyped)
    with pytest.raises(ValueError, match="does not match table schema"):
        snaptable.add_files(spark, path, retyped)
    with pytest.raises(ValueError, match="no parquet"):
        snaptable.add_files(spark, path, str(tmp_path / "empty-nowhere"))


def test_remove_orphans_reclaims_uncommitted_only(spark, tmp_path):
    """Simulated crashed writer (data written, never committed): the
    orphan sweep deletes exactly those files — committed data, the
    outstanding delete file, and staged (WAP) files all survive, and
    the table reads identically afterward."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    snaptable.delete_keys(
        spark, path, spark.createDataFrame([(7,)], "doc_id long")
    )
    sid = snaptable.stage_append(spark, path, _docs(spark, 100, 120))
    # crashed writer: _write_data without a commit
    orphan_dir = snaptable._write_data(_docs(spark, 500, 600), path)
    orphans = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(orphan_dir)
        for n in ns
        if n.endswith(".parquet")
    ]
    assert orphans
    before = snaptable.read(spark, path).agg(
        F.count("*"), F.sum("doc_id")
    ).first()

    # min-age guard: a fresh sweep removes nothing
    res = snaptable.remove_orphans(path)  # default 24h
    assert res["removed_orphans"] == 0
    res = snaptable.remove_orphans(path, older_than_s=0.0)
    assert res["removed_orphans"] >= len(orphans)
    assert not any(os.path.exists(f) for f in orphans)
    assert not os.path.exists(orphan_dir)  # emptied dir reaped

    after = snaptable.read(spark, path).agg(
        F.count("*"), F.sum("doc_id")
    ).first()
    assert tuple(before) == tuple(after)
    # the staged wave is still intact and publishable
    v = snaptable.publish_staged(spark, path, sid)
    assert snaptable.read(spark, path, snapshot_id=v).count() == 119


def test_add_files_rejects_table_owned_paths(spark, tmp_path):
    """Adopting files under the table's own root would double-count
    committed rows (manifest paths are relative; an absolute alias
    dodges any path-equality guard) or hand remove_orphans a live file
    it would later delete — both rejected outright."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    own = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(os.path.join(path, "data"))
        for n in ns
        if n.endswith(".parquet")
    ]
    assert own
    with pytest.raises(ValueError, match="inside the table"):
        snaptable.add_files(spark, path, own)
    with pytest.raises(ValueError, match="inside the table"):
        snaptable.add_files(spark, path, os.path.join(path, "data"))


def test_add_files_rejects_mixed_file_schemas(spark, tmp_path):
    """One mis-typed file among many must fail the adoption even when
    whole-set inference would sample a well-typed footer."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 10), stats_cols=["doc_id"])
    good = str(tmp_path / "good")
    _docs(spark, 100, 120).coalesce(1).write.parquet(good)
    bad = str(tmp_path / "bad")
    _docs(spark, 200, 220).withColumn(
        "doc_id", F.col("doc_id").cast("int")
    ).coalesce(1).write.parquet(bad)
    mixed = sorted(
        os.path.join(dp, n)
        for d in (good, bad)
        for dp, _, ns in os.walk(d)
        for n in ns
        if n.endswith(".parquet")
    )
    with pytest.raises(ValueError, match="schema differs"):
        snaptable.add_files(spark, path, mixed)


def test_publish_staged_retry_after_crash_is_idempotent(spark, tmp_path):
    """Crash between the cherry-pick commit and the staged-metadata
    unlink: the retry must find the recorded wap_id and return the
    already-published version instead of appending the wave twice."""
    import shutil

    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    sid = snaptable.stage_append(spark, path, _docs(spark, 100, 150))
    staged_file = snaptable._staged_path(path, sid)
    crash_copy = staged_file + ".crashcopy"
    shutil.copy(staged_file, crash_copy)
    v = snaptable.publish_staged(spark, path, sid)
    # simulate the crash: the staged metadata survived the commit
    os.link(crash_copy, staged_file)
    v2 = snaptable.publish_staged(spark, path, sid)
    assert v2 == v
    assert snaptable.current_version(path) == v
    assert snaptable.read(spark, path).count() == 150  # not 200
    assert snaptable.staged(path) == []  # retry finished the cleanup


def test_compact_small_partitioned_converges(spark, tmp_path):
    """On a hidden-partitioned table the rewrite must merge the tail
    toward one file per partition tuple (not fan out to n_out x tuples)
    and must NO-OP once the tail is at the per-tuple floor — otherwise
    nightly maintenance rewrites the same bytes forever."""
    path = str(tmp_path / "t")
    snaptable.create(
        spark,
        path,
        _docs(spark, 0, 100).coalesce(1),
        stats_cols=["doc_id"],
        partition_by=["bucket(4, doc_id)"],
    )
    for i in range(3):  # micro-batch tail: 3 commits x 4 buckets
        snaptable.append(
            spark,
            path,
            _docs(spark, 100 + i * 20, 120 + i * 20).coalesce(1),
        )
    before = snaptable._load_manifest(path, snaptable.current_version(path))
    v = snaptable.compact_small(spark, path, small_mb=1.0, target_mb=64.0)
    after = snaptable._load_manifest(path, v)
    assert len(after) == 4  # one file per bucket
    assert len(after) < len(before)
    got = snaptable.read(spark, path)
    assert got.count() == 160
    assert got.agg(F.sum("doc_id")).first()[0] == sum(range(160))
    # at the per-tuple floor: no-op, no churn
    assert snaptable.compact_small(spark, path, small_mb=1.0) == v


def test_add_files_on_partitioned_table_scans_conservatively(spark, tmp_path):
    """Adopted entries carry no partition tuple, so hidden-partition
    pruning keeps them (conservative) while table-written files still
    prune; results stay exact either way."""
    ext = str(tmp_path / "ext")
    _docs(spark, 1000, 1100).coalesce(1).write.parquet(ext)
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, _docs(spark, 0, 400), stats_cols=["doc_id"],
        partition_by=["bucket(4, doc_id)"],
    )
    snaptable.add_files(spark, path, ext)
    got = snaptable.scan(spark, path, [("doc_id", "=", 1050)])
    assert got.count() == 1
    plan = snaptable.plan_scan(path, [("doc_id", "=", 3)])
    # bucket pruning drops 3 of 4 table files; the adopted file is kept
    # by the partition check but dropped by its doc_id stats (1000+)
    assert plan["files_kept"] < plan["files_total"]
    assert snaptable.read(spark, path).count() == 500


def test_partitions_df_across_spec_evolution(spark, tmp_path):
    """Entries written under different specs report their own tuples;
    the JSON partition column keeps the schema stable."""
    path = str(tmp_path / "t")
    snaptable.create(
        spark, path, _docs(spark, 0, 100).coalesce(1),
        stats_cols=["doc_id"], partition_by=["bucket(2, doc_id)"],
    )
    snaptable.evolve_partition_by(path, ["bucket(4, doc_id)"])
    snaptable.append(spark, path, _docs(spark, 100, 200).coalesce(1))
    parts = snaptable.partitions_df(spark, path).collect()
    assert sum(r["row_count"] for r in parts) == 200
    keys = {r["partition"] for r in parts}
    assert len(keys) == len(parts)  # distinct tuples, old + new spec


def test_compact_small_folds_adopted_files_into_table(spark, tmp_path):
    """Small ADOPTED files bin-pack into table-owned files; the
    external originals stay in place (ownership boundary) but leave
    the manifest."""
    ext = str(tmp_path / "ext")
    _docs(spark, 1000, 1040).repartition(4).write.parquet(ext)
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    snaptable.add_files(spark, path, ext)
    v = snaptable.compact_small(spark, path, small_mb=64.0)
    man = snaptable._load_manifest(path, v)
    assert not any(e["path"].startswith(ext) for e in man)
    assert snaptable.read(spark, path).count() == 90
    # originals untouched
    assert any(
        n.endswith(".parquet") for _, _, ns in os.walk(ext) for n in ns
    )
