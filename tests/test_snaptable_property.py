"""Stateful property test (hypothesis): a random interleaving of
snaptable appends and compactions must always agree with a pure-Python
model — total rows, id-sum, per-snapshot time travel, and incremental
deltas (which must refuse to cross a compaction).

Examples are kept small (each op runs a distributed stats job), but the
OPERATION INTERLEAVINGS are the thing unit tests under-cover: compact
between appends, compact-first, double compacts, incremental windows
straddling arbitrary boundaries.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable

# an op is ("append", start, n) or ("compact",)
appends = st.tuples(
    st.just("append"),
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=1, max_value=40),
)
compacts = st.tuples(st.just("compact"))
op_seqs = st.lists(st.one_of(appends, compacts), min_size=1, max_size=5)


def _batch(spark, start, n):
    return spark.range(start, start + n).select(F.col("id").alias("doc_id"))


@settings(max_examples=6, deadline=None)
@given(ops=op_seqs)
def test_random_interleavings_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("snapprop") / "t")
    # model: per committed snapshot -> (kind, list of all ids at that point)
    ids: list[int] = []
    history: list[tuple[str, list[int]]] = []
    for op in ops:
        if op[0] == "append":
            _, start, n = op
            batch = _batch(spark, start, n)
            if snaptable.current_version(path) == 0:
                snaptable.create(spark, path, batch, stats_cols=["doc_id"])
            elif (start + n) % 2:
                # half the appends land through the FORMAT writer —
                # model-identical to the library path by contract
                from mundipy_spark.sources import spark_datasource

                spark_datasource.register(spark)
                batch.write.format("snaptable").mode("append").save(path)
            else:
                snaptable.append(spark, path, batch)
            ids = ids + list(range(start, start + n))
            history.append(("append", list(ids)))
        else:
            if snaptable.current_version(path) == 0:
                continue  # nothing to compact yet
            snaptable.compact(spark, path, target_files=1)
            history.append(("replace", list(ids)))

    assert len(snaptable.snapshots(path)) == len(history)
    if not history:
        assert snaptable.current_version(path) == 0
        return

    # head equals the model
    head = snaptable.read(spark, path)
    assert head.count() == len(ids)
    if ids:
        assert head.agg(F.sum("doc_id")).first()[0] == sum(ids)

    # time travel: every snapshot equals the model at that point
    for v, (kind, snap_ids) in enumerate(history, start=1):
        df = snaptable.read(spark, path, snapshot_id=v)
        assert df.count() == len(snap_ids)
        if snap_ids:
            assert df.agg(F.sum("doc_id")).first()[0] == sum(snap_ids)

    # incremental windows: every (since, until) pair either matches the
    # model delta or raises on a crossed replace
    for since in range(0, len(history) + 1):
        for until in range(max(since, 1), len(history) + 1):
            crossed = any(
                history[v - 1][0] == "replace"
                for v in range(since + 1, until + 1)
            )
            if crossed:
                with pytest.raises(ValueError, match="replace"):
                    snaptable.read_incremental(spark, path, since, until)
                continue
            want = (
                history[until - 1][1][len(history[since - 1][1]) if since else 0 :]
                if until >= 1
                else []
            )
            got = snaptable.read_incremental(spark, path, since, until)
            assert got.count() == len(want)
            if want:
                assert got.agg(F.sum("doc_id")).first()[0] == sum(want)


# ---------------------------------------------------------------------------
# Richer model: appends + keyed MERGEs + (z-order) compactions over
# (doc_id, val) rows. Merge semantics under arbitrary interleavings are
# the thing the unit tests under-cover: merge after duplicate-key
# appends (ALL stored rows with a matched key are replaced by the one
# source row), merge-then-compact-then-merge, z-order rewrites between
# merges, and incremental windows that must refuse to cross any rewrite
# (replace OR merge) but still work on append-only suffixes after one.

append2 = st.tuples(
    st.just("append"),
    st.integers(min_value=0, max_value=300),
    st.integers(min_value=1, max_value=30),
)
merge2 = st.tuples(
    st.just("merge"),
    st.integers(min_value=0, max_value=300),
    st.integers(min_value=1, max_value=30),
)
compact2 = st.tuples(st.just("compact"))
zcompact2 = st.tuples(st.just("zcompact"))
op_seqs2 = st.lists(
    st.one_of(append2, merge2, compact2, zcompact2), min_size=1, max_size=5
)


def _batch2(spark, start, n, gen):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"), F.lit(gen).cast("long").alias("val")
    )


@settings(max_examples=6, deadline=None)
@given(ops=op_seqs2)
def test_merge_zorder_interleavings_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("snapprop2") / "t")
    rows: list[tuple[int, int]] = []  # (doc_id, val) multiset, model
    history: list[tuple[str, list[tuple[int, int]]]] = []
    for gen, op in enumerate(ops, start=1):
        if op[0] in ("append", "merge") and snaptable.current_version(path) == 0:
            _, start, n = op
            snaptable.create(
                spark, path, _batch2(spark, start, n, gen), stats_cols=["doc_id"]
            )
            rows = rows + [(i, gen) for i in range(start, start + n)]
            history.append(("append", list(rows)))
        elif op[0] == "append":
            _, start, n = op
            snaptable.append(spark, path, _batch2(spark, start, n, gen))
            rows = rows + [(i, gen) for i in range(start, start + n)]
            history.append(("append", list(rows)))
        elif op[0] == "merge":
            _, start, n = op
            snaptable.merge_into(
                spark, path, _batch2(spark, start, n, gen), key_cols=["doc_id"]
            )
            keys = set(range(start, start + n))
            rows = [r for r in rows if r[0] not in keys] + [
                (i, gen) for i in range(start, start + n)
            ]
            history.append(("merge", list(rows)))
        else:
            if snaptable.current_version(path) == 0:
                continue
            if op[0] == "zcompact":
                snaptable.compact(
                    spark, path, target_files=2, zorder_by=["doc_id", "val"]
                )
            else:
                snaptable.compact(spark, path, target_files=1)
            history.append(("replace", list(rows)))

    assert len(snaptable.snapshots(path)) == len(history)
    if not history:
        assert snaptable.current_version(path) == 0
        return

    def check(df, want):
        assert df.count() == len(want)
        if want:
            got = df.agg(
                F.sum("doc_id").alias("sid"), F.sum("val").alias("sval")
            ).first()
            assert got["sid"] == sum(r[0] for r in want)
            assert got["sval"] == sum(r[1] for r in want)

    # head + time travel agree with the model at every point
    check(snaptable.read(spark, path), rows)
    for v, (kind, snap_rows) in enumerate(history, start=1):
        check(snaptable.read(spark, path, snapshot_id=v), snap_rows)

    # manifest-pruned scan == model filter on the final state
    if rows:
        distinct = sorted({r[0] for r in rows})
        lo = distinct[len(distinct) // 3]
        want = [r for r in rows if r[0] >= lo]
        check(snaptable.scan(spark, path, [("doc_id", ">=", lo)]), want)

    # incremental windows: append-only windows deliver exactly the
    # suffix; any window crossing a rewrite (replace OR merge) raises
    for since in range(0, len(history) + 1):
        for until in range(max(since, 1), len(history) + 1):
            crossed = any(
                history[v - 1][0] in ("replace", "merge")
                for v in range(since + 1, until + 1)
            )
            if crossed:
                with pytest.raises(ValueError, match="rewrite"):
                    snaptable.read_incremental(spark, path, since, until)
                continue
            want = history[until - 1][1][
                len(history[since - 1][1]) if since else 0 :
            ]
            check(snaptable.read_incremental(spark, path, since, until), want)


# ---------------------------------------------------------------------------
# Full-lifecycle model: appends + merges + MOR equality deletes +
# compactions + rollbacks. The sequence-number semantics are the thing
# to stress: a delete erases exactly the rows present at delete time
# (later re-appends/merges of the same key survive), compaction applies
# deletes physically without changing the visible row set, and rollback
# republishes an arbitrary earlier state whose own deletes keep
# applying to the same files.

append3 = st.tuples(
    st.just("append"),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=25),
)
merge3 = st.tuples(
    st.just("merge"),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=25),
)
delete3 = st.tuples(
    st.just("delete"),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=25),
)
compact3 = st.tuples(st.just("compact"))
rollback3 = st.tuples(st.just("rollback"), st.integers(min_value=0, max_value=10))
op_seqs3 = st.lists(
    st.one_of(append3, merge3, delete3, compact3, rollback3),
    min_size=2,
    max_size=6,
)


@settings(max_examples=6, deadline=None)
@given(ops=op_seqs3)
def test_mor_delete_rollback_interleavings_match_model(
    spark, tmp_path_factory, ops
):
    path = str(tmp_path_factory.mktemp("snapprop3") / "t")
    rows: list[tuple[int, int]] = []  # (doc_id, val) multiset, model
    history: list[tuple[str, list[tuple[int, int]]]] = []
    for gen, op in enumerate(ops, start=1):
        if op[0] in ("delete", "compact", "rollback") and (
            snaptable.current_version(path) == 0
        ):
            continue  # nothing committed yet
        if op[0] in ("append", "merge") and snaptable.current_version(path) == 0:
            _, start, n = op
            snaptable.create(
                spark, path, _batch2(spark, start, n, gen), stats_cols=["doc_id"]
            )
            rows = rows + [(i, gen) for i in range(start, start + n)]
            history.append(("append", list(rows)))
        elif op[0] == "append":
            _, start, n = op
            snaptable.append(spark, path, _batch2(spark, start, n, gen))
            rows = rows + [(i, gen) for i in range(start, start + n)]
            history.append(("append", list(rows)))
        elif op[0] == "merge":
            _, start, n = op
            snaptable.merge_into(
                spark, path, _batch2(spark, start, n, gen), key_cols=["doc_id"]
            )
            keys = set(range(start, start + n))
            rows = [r for r in rows if r[0] not in keys] + [
                (i, gen) for i in range(start, start + n)
            ]
            history.append(("merge", list(rows)))
        elif op[0] == "delete":
            _, start, n = op
            keys_df = spark.range(start, start + n).select(
                F.col("id").alias("doc_id")
            )
            snaptable.delete_keys(spark, path, keys_df)
            keys = set(range(start, start + n))
            # erases exactly the rows PRESENT NOW; later writes survive
            rows = [r for r in rows if r[0] not in keys]
            history.append(("eq-delete", list(rows)))
        elif op[0] == "rollback":
            _, pick = op
            target = (pick % len(history)) + 1
            snaptable.rollback(path, target)
            rows = list(history[target - 1][1])
            history.append(("rollback", list(rows)))
        else:
            snaptable.compact(spark, path, target_files=1)
            history.append(("replace", list(rows)))

    assert len(snaptable.snapshots(path)) == len(history)
    if not history:
        assert snaptable.current_version(path) == 0
        return

    def check(df, want):
        assert df.count() == len(want)
        if want:
            got = df.agg(
                F.sum("doc_id").alias("sid"), F.sum("val").alias("sval")
            ).first()
            assert got["sid"] == sum(r[0] for r in want)
            assert got["sval"] == sum(r[1] for r in want)

    # head + time travel agree with the model at every point
    check(snaptable.read(spark, path), rows)
    for v, (kind, snap_rows) in enumerate(history, start=1):
        check(snaptable.read(spark, path, snapshot_id=v), snap_rows)

    # pruned scan (applies deletes) == model filter on the final state
    if rows:
        distinct = sorted({r[0] for r in rows})
        lo = distinct[len(distinct) // 3]
        check(
            snaptable.scan(spark, path, [("doc_id", ">=", lo)]),
            [r for r in rows if r[0] >= lo],
        )

    # incremental windows refuse to cross any rewrite/retraction
    for since in range(0, len(history) + 1):
        for until in range(max(since, 1), len(history) + 1):
            crossed = any(
                history[v - 1][0] in ("replace", "merge", "eq-delete", "rollback")
                for v in range(since + 1, until + 1)
            )
            if not crossed:
                want = history[until - 1][1][
                    len(history[since - 1][1]) if since else 0 :
                ]
                got = snaptable.read_incremental(spark, path, since, until)
                assert got.count() == len(want)
            else:
                with pytest.raises(ValueError, match="rewrite"):
                    snaptable.read_incremental(spark, path, since, until)


# ---------------------------------------------------------------------------
# Session-11 lifecycle model: appends + WAP staging (stage / publish /
# drop) + MOR deletes + bin-pack maintenance + tags + expire. The
# interleavings to stress: a delete committed BETWEEN stage and publish
# must not mask the staged rows (publish seq > delete seq); publish
# must cherry-pick over appends that landed after staging; bin-pack
# must never change the visible row set and must NO-OP (no commit)
# when it cannot reduce the file count; tags must pin their snapshot's
# exact contents through an expire that reclaims everything else.

append4 = st.tuples(
    st.just("append"),
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=25),
)
stage4 = st.tuples(
    st.just("stage"),
    st.integers(min_value=300, max_value=500),
    st.integers(min_value=1, max_value=25),
)
publish4 = st.tuples(st.just("publish"))
drop4 = st.tuples(st.just("drop"))
delete4 = st.tuples(
    st.just("delete"),
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=1, max_value=40),
)
binpack4 = st.tuples(st.just("binpack"))
tag4 = st.tuples(st.just("tag"), st.integers(min_value=0, max_value=10))
op_seqs4 = st.lists(
    st.one_of(append4, stage4, publish4, drop4, delete4, binpack4, tag4),
    min_size=3,
    max_size=7,
)


@settings(max_examples=6, deadline=None)
@given(ops=op_seqs4)
def test_wap_tag_binpack_interleavings_match_model(
    spark, tmp_path_factory, ops
):
    path = str(tmp_path_factory.mktemp("snapprop4") / "t")
    rows: list[tuple[int, int]] = []  # committed (doc_id, val) multiset
    pending: dict[str, list[tuple[int, int]]] = {}  # staged, FIFO
    history: list[list[tuple[int, int]]] = []  # committed state per v
    tagged: dict[str, int] = {}
    for gen, op in enumerate(ops, start=1):
        committed = snaptable.current_version(path) > 0
        if op[0] == "append":
            _, start, n = op
            if not committed:
                snaptable.create(
                    spark, path, _batch2(spark, start, n, gen),
                    stats_cols=["doc_id"],
                )
            else:
                snaptable.append(spark, path, _batch2(spark, start, n, gen))
            rows = rows + [(i, gen) for i in range(start, start + n)]
            history.append(list(rows))
        elif op[0] == "stage":
            if not committed:
                continue
            _, start, n = op
            sid = snaptable.stage_append(
                spark, path, _batch2(spark, start, n, gen), wap_id=f"w{gen}"
            )
            pending[sid] = [(i, gen) for i in range(start, start + n)]
        elif op[0] == "publish":
            if not pending:
                continue
            sid = next(iter(pending))
            snaptable.publish_staged(spark, path, sid)
            # staged rows survive deletes committed after staging:
            # their sequence number is the publish version
            rows = rows + pending.pop(sid)
            history.append(list(rows))
        elif op[0] == "drop":
            if not pending:
                continue
            sid = next(iter(pending))
            snaptable.drop_staged(path, sid)
            pending.pop(sid)
        elif op[0] == "delete":
            if not committed:
                continue
            _, start, n = op
            snaptable.delete_keys(
                spark,
                path,
                spark.range(start, start + n).select(
                    F.col("id").alias("doc_id")
                ),
            )
            keys = set(range(start, start + n))
            # erases only rows present NOW; staged rows are untouched
            rows = [r for r in rows if r[0] not in keys]
            history.append(list(rows))
        elif op[0] == "binpack":
            if not committed:
                continue
            before_v = snaptable.current_version(path)
            after_v = snaptable.compact_small(
                spark, path, small_mb=1024.0, target_mb=4096.0
            )
            if after_v != before_v:  # real commit; no-ops add no history
                history.append(list(rows))
        else:  # tag
            if not committed:
                continue
            _, pick = op
            v = (pick % len(history)) + 1
            name = f"t{gen}"
            snaptable.tag(path, name, snapshot_id=v)
            tagged[name] = v

    assert len(snaptable.snapshots(path)) == len(history)
    if not history:
        return

    def check(df, want):
        assert df.count() == len(want)
        if want:
            got = df.agg(
                F.sum("doc_id").alias("sid"), F.sum("val").alias("sval")
            ).first()
            assert got["sid"] == sum(r[0] for r in want)
            assert got["sval"] == sum(r[1] for r in want)

    # head, every snapshot, and every pending stage's audit view
    check(snaptable.read(spark, path), rows)
    for v, snap_rows in enumerate(history, start=1):
        check(snaptable.read(spark, path, snapshot_id=v), snap_rows)
    for sid, srows in pending.items():
        check(snaptable.read_staged(spark, path, sid), rows + srows)

    # expire to head: tags pin exactly their snapshot, everything else
    # below head is gone, pending stages stay publishable
    head_v = snaptable.current_version(path)
    snaptable.expire(path, keep_from=head_v)
    check(snaptable.read(spark, path), rows)
    for name, v in tagged.items():
        check(snaptable.read(spark, path, ref=name), history[v - 1])
    for v in range(1, head_v):
        if v not in tagged.values():
            with pytest.raises(Exception):
                snaptable.read(spark, path, snapshot_id=v).count()
    if pending:
        sid = next(iter(pending))
        snaptable.publish_staged(spark, path, sid)
        check(snaptable.read(spark, path), rows + pending[sid])


# ---------------------------------------------------------------------------
# Format-writer model (VERDICT r4 #8): random interleavings of
# format("snaptable") APPEND and OVERWRITE commits, library appends,
# and concurrent-evolution races against a pre-planned format writer.
# The writer path joined the stateful model for appends in r4; this
# extends it to INSERT OVERWRITE (replace snapshot: resets the head,
# history stays) and to the ConflictError fence: a SnaptableBatchWriter
# planned against schema S must refuse to commit after the table gained
# a column, and the failed commit must leave the table byte-identical
# to the model (no partial snapshot, no reverted evolution).

fmt_append = st.tuples(
    st.just("append"),
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=1, max_value=25),
    st.booleans(),  # True -> format writer, False -> library append
)
fmt_overwrite = st.tuples(
    st.just("overwrite"),
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=1, max_value=25),
)
evolve_race = st.tuples(st.just("evolve_race"))
fmt_ops = st.lists(
    st.one_of(fmt_append, fmt_overwrite, evolve_race), min_size=1, max_size=5
)


@settings(max_examples=6, deadline=None)
@given(ops=fmt_ops)
def test_format_writer_interleavings_match_model(spark, tmp_path_factory, ops):
    from pyspark.sql.types import StructType

    from mundipy_spark.sources import snaptable, spark_datasource

    spark_datasource.register(spark)
    path = str(tmp_path_factory.mktemp("fmtprop") / "t")

    # model state
    extra_cols: list[str] = []          # evolution-added columns
    rows: list[tuple[int, dict]] = []   # (doc_id, {col: 7 or None})
    history: list[list] = []            # committed snapshots' row sets

    def batch_df(start, n):
        df = spark.range(start, start + n).select(F.col("id").alias("doc_id"))
        for c in extra_cols:
            df = df.withColumn(c, F.lit(7).cast("long"))
        return df

    def model_rows(start, n):
        return [
            (i, {c: 7 for c in extra_cols}) for i in range(start, start + n)
        ]

    for op in ops:
        exists = snaptable.current_version(path) > 0
        if op[0] == "append":
            _, start, n, via_fmt = op
            if not exists:
                # mode("append") on a missing table is a loud error by
                # contract; the model creates via the library instead
                snaptable.create(
                    spark, path, batch_df(start, n), stats_cols=["doc_id"]
                )
            elif via_fmt:
                batch_df(start, n).write.format("snaptable").mode(
                    "append"
                ).save(path)
            else:
                snaptable.append(spark, path, batch_df(start, n))
            rows = rows + model_rows(start, n)
            history.append(list(rows))
        elif op[0] == "overwrite":
            _, start, n = op
            batch_df(start, n).write.format("snaptable").mode(
                "overwrite"
            ).option("stats_cols", '["doc_id"]').save(path)
            rows = model_rows(start, n)
            history.append(list(rows))
        else:  # evolve_race
            if not exists:
                continue
            import pyarrow as pa

            stale_schema = StructType.fromJson(
                __import__("json").loads(
                    snaptable._load_snapshot(
                        path, snaptable.current_version(path)
                    )["schema"]
                )
            )
            w = spark_datasource.SnaptableBatchWriter(
                {"path": path}, stale_schema, overwrite=False
            )
            arrow_cols = {"doc_id": pa.array([999_999], pa.int64())}
            for c in extra_cols:
                arrow_cols[c] = pa.array([7], pa.int64())
            m = w.write(iter([pa.record_batch(arrow_cols)]))
            # concurrent evolution: the table gains a column AND rows
            new_col = f"ev{len(extra_cols)}"
            evolved = batch_df(0, 1).withColumn(
                new_col, F.lit(7).cast("long")
            )
            snaptable.append(spark, path, evolved)
            extra_cols.append(new_col)
            rows = rows + [(0, {c: 7 for c in extra_cols})]
            history.append(list(rows))
            with pytest.raises(snaptable.ConflictError, match="gained"):
                w.commit([m])
            # the fenced commit must not have landed a snapshot

    assert len(snaptable.snapshots(path)) == len(history)
    if not history:
        assert snaptable.current_version(path) == 0
        return

    def check(df, want):
        assert df.count() == len(want)
        if want:
            assert df.agg(F.sum("doc_id")).first()[0] == sum(
                r[0] for r in want
            )
            for c in extra_cols:
                if c in df.columns:
                    got = df.agg(F.sum(c)).first()[0]
                    exp = sum(r[1].get(c) or 0 for r in want)
                    assert (got or 0) == exp, c

    check(snaptable.read(spark, path), rows)
    for v, snap_rows in enumerate(history, start=1):
        check(snaptable.read(spark, path, snapshot_id=v), snap_rows)
    # the routed format read agrees with the library head read
    fmt_df = spark.read.format("snaptable").load(path)
    check(fmt_df, rows)
