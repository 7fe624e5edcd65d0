"""Writable branches + fast-forward on the snapshot table
(sources/snaptable.py): a branch is a child table sharing the fork's
data files by absolute path with its version counter seeded at the
fork, so the whole surface (append, MOR deletes, merge, compact, WAP,
time travel) works on it unmodified and sequence semantics carry
across the fork boundary; fast-forward adopts the branch's commits
into main one-to-one.

Reference role: Iceberg branch refs + fast-forward publish — the
multi-commit staging workflow a shared crawl table needs (the
single-commit variant is WAP, tests/test_snaptable_refs.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import snaptable


@pytest.fixture(scope="module")
def spark():
    from mundipy_spark.session import get_spark

    s = get_spark("snaptable-branch-tests", cpus=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _docs(spark, lo, hi, gen=0):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.lit(gen).cast("long").alias("val"),
    )


def test_branch_isolated_writes_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    snaptable.append(spark, path, _docs(spark, 100, 200))  # main v2
    root = snaptable.branch_create(path, "dev")
    assert snaptable.branches(path) == {"dev": {"fork": 2, "head": 2}}
    # branch sees the fork state without copying any data
    assert snaptable.read(spark, root).count() == 200
    # writes on the branch do not touch main
    snaptable.append(spark, root, _docs(spark, 200, 250, gen=1))
    snaptable.append(spark, root, _docs(spark, 250, 260, gen=1))
    assert snaptable.read(spark, root).count() == 260
    assert snaptable.read(spark, path).count() == 200
    assert snaptable.current_version(path) == 2
    # branch versions continue above the fork; fork is time-travelable
    assert snaptable.current_version(root) == 4
    assert snaptable.read(spark, root, snapshot_id=2).count() == 200
    # main writes do not leak into the branch
    snaptable_v = snaptable.append(spark, path, _docs(spark, 900, 910))
    assert snaptable.read(spark, root).count() == 260
    assert snaptable_v == 3


def test_branch_delete_sequences_across_fork(spark, tmp_path):
    """An equality delete committed ON THE BRANCH must erase fork-era
    rows (branch delete seq > fork file seqs because the branch
    counter is seeded at the fork) while main keeps them."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "takedowns")
    snaptable.delete_keys(
        spark, root, spark.createDataFrame([(5,), (6,)], "doc_id long")
    )
    assert snaptable.read(spark, root).count() == 98
    assert snaptable.read(spark, path).count() == 100
    # re-append one deleted key on the branch: survives (seq rule)
    snaptable.append(spark, root, _docs(spark, 5, 6, gen=9))
    got = snaptable.read(spark, root).filter(F.col("doc_id") == 5)
    assert [r["val"] for r in got.collect()] == [9]


def test_fast_forward_adopts_commits_one_to_one(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "wave")
    snaptable.append(spark, root, _docs(spark, 100, 150, gen=1))
    snaptable.delete_keys(
        spark, root, spark.createDataFrame([(7,)], "doc_id long")
    )
    bhead = snaptable.fast_forward(path, "wave")
    assert bhead == 3 == snaptable.current_version(path)
    got = snaptable.read(spark, path)
    assert got.count() == 149  # 100 + 50 - 1 deleted
    assert got.filter(F.col("doc_id") == 7).count() == 0
    # history adopted 1:1 — incremental consumers see the append
    delta = snaptable.read_incremental(spark, path, since=1, until=2)
    assert delta.count() == 50
    # idempotent: forwarding an already-forwarded branch is a no-op
    assert snaptable.fast_forward(path, "wave") == 3
    # dropping the forwarded branch keeps its data (main references it)
    res = snaptable.drop_branch(path, "wave")
    assert res["data_kept"] is True
    assert snaptable.read(spark, path).count() == 149
    # compact folds branch-dir files into main's own layout
    snaptable.compact(spark, path, target_files=1)
    assert snaptable.read(spark, path).count() == 149


def test_fast_forward_conflicts_when_main_moved(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    snaptable.branch_create(path, "b1")
    snaptable.append(
        spark, snaptable.branch_root(path, "b1"), _docs(spark, 50, 60, gen=1)
    )
    snaptable.append(spark, path, _docs(spark, 900, 905))  # main moved
    with pytest.raises(snaptable.ConflictError, match="moved past the fork"):
        snaptable.fast_forward(path, "b1")
    # dropping the unforwarded branch reclaims its data dir entirely
    root = snaptable.branch_root(path, "b1")
    assert snaptable.drop_branch(path, "b1") == {"data_kept": False}
    assert not os.path.exists(root)
    with pytest.raises(ValueError, match="no branch"):
        snaptable.branch_root(path, "b1")


def test_branch_expire_never_touches_parent_files(spark, tmp_path):
    """compact on the branch makes the shared fork files dead IN THE
    BRANCH; the branch's expire must not delete them — main still
    reads them (the expire ownership guard)."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "exp")
    snaptable.append(spark, root, _docs(spark, 100, 120, gen=1))
    snaptable.compact(spark, root, target_files=1)  # fork files dead in branch
    snaptable.expire(root, keep_from=snaptable.current_version(root))
    assert snaptable.read(spark, root).count() == 120
    assert snaptable.read(spark, path).count() == 100  # main intact


def test_expire_never_deletes_adopted_external_files(spark, tmp_path):
    """Same ownership guard on main: compacting after an adoption makes
    the external files dead, but expire leaves them in place — they
    belong to their original owner."""
    ext = str(tmp_path / "ext")
    _docs(spark, 0, 50).coalesce(1).write.parquet(ext)
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 100, 120), stats_cols=["doc_id"])
    snaptable.add_files(spark, path, ext)
    snaptable.compact(spark, path, target_files=1)
    snaptable.expire(path, keep_from=snaptable.current_version(path))
    ext_files = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(ext)
        for n in ns
        if n.endswith(".parquet")
    ]
    assert ext_files  # originals untouched
    assert snaptable.read(spark, path).count() == 70


def test_branch_supports_wap_and_tags(spark, tmp_path):
    """The branch is a full table: WAP staging and tags work on it."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "full")
    sid = snaptable.stage_append(spark, root, _docs(spark, 50, 70, gen=1))
    assert snaptable.read(spark, root).count() == 50
    snaptable.publish_staged(spark, root, sid)
    snaptable.tag(root, "b-rel")
    assert snaptable.read(spark, root, ref="b-rel").count() == 70
    assert snaptable.read(spark, path).count() == 50


def test_main_expire_protects_branch_referenced_fork_files(spark, tmp_path):
    """main compact + expire must NOT reclaim fork files a live branch
    still reads — cross-root liveness (Iceberg's branch-aware
    expire_snapshots)."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 100), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "dev")
    snaptable.compact(spark, path, target_files=1)  # fork files dead in main
    snaptable.expire(path, keep_from=snaptable.current_version(path))
    # the branch still reads the fork's file set
    assert snaptable.read(spark, root).count() == 100
    assert snaptable.read(spark, path).count() == 100


def test_branch_expire_protects_fast_forwarded_files(spark, tmp_path):
    """After a fast-forward MAIN references files under the branch
    directory; a later branch compact + expire must not reclaim them."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "w")
    snaptable.append(spark, root, _docs(spark, 50, 80, gen=1))
    snaptable.fast_forward(path, "w")
    # branch keeps evolving, rewrites its own history, expires it
    snaptable.compact(spark, root, target_files=1)
    snaptable.expire(root, keep_from=snaptable.current_version(root))
    snaptable.remove_orphans(root, older_than_s=0.0)
    # main still reads the fast-forwarded (pre-compact) branch files
    assert snaptable.read(spark, path).count() == 80


def test_branch_name_reuse_after_forwarded_drop_is_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "wave")
    snaptable.append(spark, root, _docs(spark, 50, 60, gen=1))
    snaptable.fast_forward(path, "wave")
    assert snaptable.drop_branch(path, "wave") == {"data_kept": True}
    # the data directory main references is still there: a recreated
    # branch would inherit files none of its snapshots reference
    with pytest.raises(ValueError, match="pick a new name"):
        snaptable.branch_create(path, "wave")
    assert snaptable.read(spark, path).count() == 60


def test_fast_forward_resume_tolerates_expired_adopted_snaps(spark, tmp_path):
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    snaptable.branch_create(path, "w")
    root = snaptable.branch_root(path, "w")
    snaptable.append(spark, root, _docs(spark, 50, 60, gen=1))
    snaptable.append(spark, root, _docs(spark, 60, 70, gen=1))
    snaptable.fast_forward(path, "w")  # main at v3
    snaptable.append(spark, path, _docs(spark, 900, 910))  # v4
    snaptable.expire(path, keep_from=4)  # adopted v2/v3 metadata gone
    # a retried forward must be a clean no-op, not FileNotFoundError
    assert snaptable.fast_forward(path, "w") == 3
    assert snaptable.read(spark, path).count() == 80


def test_branch_fork_survives_branch_expire(spark, tmp_path):
    """The fork version is durable metadata: a branch that expired its
    own early snapshots (including the fork snapshot) still reports
    and forwards from the true fork."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    root = snaptable.branch_create(path, "w")  # fork = 1
    snaptable.append(spark, root, _docs(spark, 50, 60, gen=1))  # v2
    snaptable.append(spark, root, _docs(spark, 60, 70, gen=1))  # v3
    snaptable.expire(root, keep_from=3)  # branch snap 1..2 gone
    assert snaptable.branches(path)["w"]["fork"] == 1
    # forwarding now must fail loudly (v2 history is gone), not adopt
    # a gapped history silently
    with pytest.raises(ValueError, match="expired before it was fast-forwarded"):
        snaptable.fast_forward(path, "w")


def test_nested_branch_of_branch(spark, tmp_path):
    """A branch root is a full table, so branching FROM a branch works
    naturally; cross-root liveness protects the whole family chain."""
    path = str(tmp_path / "t")
    snaptable.create(spark, path, _docs(spark, 0, 50), stats_cols=["doc_id"])
    r1 = snaptable.branch_create(path, "b1")
    snaptable.append(spark, r1, _docs(spark, 50, 70, gen=1))
    r2 = snaptable.branch_create(r1, "b2")  # branch OF the branch
    snaptable.append(spark, r2, _docs(spark, 70, 80, gen=2))
    assert snaptable.read(spark, r2).count() == 80
    assert snaptable.read(spark, r1).count() == 70
    assert snaptable.read(spark, path).count() == 50
    # ff the inner branch into its parent, then parent into main
    snaptable.fast_forward(r1, "b2")
    assert snaptable.read(spark, r1).count() == 80
    snaptable.fast_forward(path, "b1")
    assert snaptable.read(spark, path).count() == 80
    # grandparent expire must not break the grandchild's files
    snaptable.compact(spark, path, target_files=1)
    snaptable.expire(path, keep_from=snaptable.current_version(path))
    assert snaptable.read(spark, r2).count() == 80
