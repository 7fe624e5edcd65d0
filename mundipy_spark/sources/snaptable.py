"""Snapshot-manifest parquet table: the Iceberg role, from scratch.

The north rule reads web pages "over Iceberg tables" at 10^12-document
scale. No Iceberg runtime exists in this sandbox, so this module
implements the three properties that actually matter for the pipeline,
directly over parquet + JSON metadata (public Iceberg spec concepts,
re-expressed — not a port):

1. **Atomic snapshot commits.** A commit publishes a fully-written
   tmp file onto `metadata/snap-{v}.json` via os.link — atomic AND
   exclusive: whoever links the name wins version v, a concurrent
   writer's link fails and it retries against the new head (optimistic
   concurrency, Iceberg's commit protocol), and a snapshot file is
   never visible with incomplete content. Data and manifest files
   written by a crashed job that never snapshotted are invisible to
   every reader — no torn tables at any kill point.
2. **Scan planning from file-level stats, not file listing.** Each
   snapshot points at a manifest recording every data file's row count
   and per-column min/max. `scan()` prunes files whose [min,max]
   cannot intersect the predicate BEFORE Spark ever opens a footer —
   at 10^12 docs / ~10^6 data files, query planning touches one
   manifest instead of listing and footer-reading the whole table
   (the problem Iceberg exists to solve). The predicate is ALSO
   applied as a row filter, so pruning is a pure optimization and can
   never change results (files with missing stats are kept).
3. **Snapshot isolation + time travel.** Readers resolve a snapshot id
   once and see exactly its file set; `read(snapshot_id=1)` is stable
   under concurrent appends. Snapshots chain via `parent` for audit.

Scale notes: the manifest is one JSON file here; at ~10^6 entries real
Iceberg shards manifests and plans against a manifest LIST — the seam
is `manifest_df()`, which exposes the manifest as a DataFrame so
pruning can run cluster-side; like Iceberg, the surviving file list
itself materializes on the driver (it is O(files), not O(rows)).
Per-file stats are collected in ONE distributed Spark job over the
freshly written files (groupBy input_file_name), never row-by-row on
the driver.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "metadata"
_DATA = "data"
_TMP_MIN_AGE_S = 300.0  # expire() won't reap tmps younger than this


def _unlink_quiet(p: str) -> None:
    try:
        os.unlink(p)
    except FileNotFoundError:
        pass


class ConflictError(RuntimeError):
    """A rewrite commit (compact/delete) found a different head than the
    one it planned against; the caller must re-plan and retry."""


# ---------------------------------------------------------------------------
# metadata plumbing


def _meta_dir(path: str) -> str:
    return os.path.join(path, _META)


def _snap_path(path: str, version: int) -> str:
    return os.path.join(_meta_dir(path), f"snap-{version}.json")


def current_version(path: str) -> int:
    """Head = the highest committed snapshot (0 = empty table). Derived
    from the snap files themselves so there is no pointer file to tear."""
    meta = _meta_dir(path)
    if not os.path.isdir(meta):
        return 0
    best = 0
    for name in os.listdir(meta):
        if name.startswith("snap-") and name.endswith(".json"):
            try:
                best = max(best, int(name[5:-5]))
            except ValueError:
                continue
    return best


def earliest_version(path: str) -> int:
    """The OLDEST live snapshot (0 = empty table): where history
    actually starts after expire() (or at a branch's fork) — the
    anchor for 'earliest' streaming reads and full-history scans."""
    meta = _meta_dir(path)
    if not os.path.isdir(meta):
        return 0
    best = 0
    for name in os.listdir(meta):
        if name.startswith("snap-") and name.endswith(".json"):
            try:
                v = int(name[5:-5])
            except ValueError:
                continue
            best = v if best == 0 else min(best, v)
    return best


def snapshots(path: str) -> list[dict]:
    """Commit history, oldest first."""
    out = []
    for v in range(1, current_version(path) + 1):
        p = _snap_path(path, v)
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def _load_snapshot(path: str, version: int) -> dict:
    with open(_snap_path(path, version)) as f:
        return json.load(f)


def _load_manifest(path: str, version: int) -> list[dict]:
    snap = _load_snapshot(path, version)
    with open(os.path.join(path, snap["manifest"])) as f:
        return json.load(f)["files"]


# ---------------------------------------------------------------------------
# write path


def _collect_file_stats(
    spark: SparkSession,
    data_dir: str | list[str],
    stats_cols: list[str],
    spec: list[dict] | None = None,
) -> list[dict]:
    """Per-file (rows, min/max, null_count per stats col; partition
    tuple when a spec is set) in ONE distributed job — the writer-side
    stats pass an Iceberg writer does inline. Missing/all-null columns
    record null bounds (never pruned). `data_dir` may be an explicit
    file list (the add_files adoption path: files live OUTSIDE the
    table directory and their entry paths stay absolute)."""
    if isinstance(data_dir, (list, tuple)):
        if not data_dir:
            return []
        df = spark.read.parquet(*data_dir)
        return _stats_rows_to_entries(df, stats_cols, spec, relativize=False)
    # a partitionBy write of ZERO rows creates no part files at all
    # (unlike a plain write's empty part) — nothing to record, and the
    # schema-inferring read below would fail on the bare directory
    if not any(
        name.endswith(".parquet")
        for _, _, names in os.walk(data_dir)
        for name in names
    ):
        return []
    df = spark.read.parquet(data_dir)
    return _stats_rows_to_entries(df, stats_cols, spec, relativize=True)


def _stats_rows_to_entries(
    df: DataFrame,
    stats_cols: list[str],
    spec: list[dict] | None,
    relativize: bool,
) -> list[dict]:
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols:
        aggs += [
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"),
        ]
    # partition values are RECOMPUTED from the source column with the
    # same writer expression — never read back through hive directory-
    # name inference, which re-types timestamp-shaped strings as
    # datetimes and collapses empty strings into the null default
    # partition (both would make _part_survives prune live files).
    # Hive layout keeps one partition tuple per file, so min() over the
    # transform is exact; it is NULL iff every row's transform is NULL.
    types = {fld.name: fld.dataType.simpleString() for fld in df.schema.fields}
    for f in spec or []:
        aggs.append(
            F.min(_transform_expr(f, types[f["source"]])).alias(
                f"_part_{f['name']}"
            )
        )
    rows = (
        df.groupBy(F.input_file_name().alias("_file")).agg(*aggs).collect()
    )
    entries = []
    for r in rows:
        d = r.asDict()
        stats = {}
        for c in stats_cols:
            mn, mx = d[f"_min_{c}"], d[f"_max_{c}"]
            stats[c] = {
                "min": _json_safe(mn),
                "max": _json_safe(mx),
                "nulls": int(d[f"_nulls_{c}"] or 0),
            }
        # input_file_name() returns a URI: percent-encoded, so a hive
        # partition directory with special characters (space, the %3A
        # hive itself escapes ':' into) round-trips wrong unless
        # decoded back to the on-disk name exactly once
        fname = urllib.parse.unquote(d["_file"])
        if relativize:
            # store table-relative paths so the table directory is
            # movable; rfind: the table's own data dir is always the
            # LAST /data/ segment (subdirs under it are uuid hex), so a
            # table rooted at e.g. /home/user/data/tbl relativizes right
            idx = fname.rfind(f"/{_DATA}/")
            rel = fname[idx + 1 :] if idx >= 0 else fname
        else:
            # adopted external file: stays absolute (os.path.join with
            # an absolute second arg returns it verbatim, so every read
            # path resolves it unchanged); strip the file: scheme and
            # normalize the URI's slash run to a single root slash
            rel = fname
            if rel.startswith("file:"):
                rel = "/" + rel[5:].lstrip("/")
        entry = {
            "path": rel,
            "rows": int(d["_rows"]),
            "stats": stats,
        }
        if spec:
            entry["partition"] = {
                f["name"]: _json_safe(d[f"_part_{f['name']}"]) for f in spec
            }
        entries.append(entry)
    return entries


def _json_safe(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


# ---------------------------------------------------------------------------
# hidden partitioning (Iceberg partition transforms, re-expressed)
#
# A partition spec is declared ONCE at create() from source-column
# TRANSFORMS — "days(warc_ts)", "bucket(16, url)", "truncate(4, url)",
# "identity(lang)" — and is invisible to every reader: queries predicate
# on the SOURCE column (warc_ts, url) and plan_scan() derives the
# partition predicate itself, so nobody ever writes `WHERE _p_day = ...`
# by hand (the misuse hidden partitioning exists to prevent). Data files
# are physically split per partition tuple (hive layout under each
# commit's uuid dir), the manifest records each file's tuple, and
# pruning composes with min/max stats pruning. The derived _p_* columns
# live only in directory names — never in the data files, never in the
# table schema.
#
# Transform semantics (and why each may prune what it prunes):
# - identity/days/months/years/truncate are MONOTONIC non-decreasing
#   maps t: for a predicate `col >= v`, any row with col >= v has
#   t(col) >= t(v), so files whose partition value < t(v) cannot hold a
#   match. `>` relaxes to `>= t(v)` (rows inside partition t(v) can
#   still exceed v); same mirrored for </<=; `=` keeps only t(v).
# - bucket(n) is a hash: only `=` predicates prune (to bucket(v)).
# - a NULL partition value means every row's source is NULL in that
#   file; no comparison predicate matches NULL, so the file prunes for
#   any op.
# The same predicate is always re-applied as a row filter, so partition
# pruning (like stats pruning) can change IO only, never results.
#
# Timestamps: transforms operate on UTC epoch seconds (timestamp cast
# to double — Spark's internal UTC micros, session-tz independent,
# matching Iceberg's UTC-micros definition); the driver-side twin
# interprets naive predicate datetimes as UTC, which is exact under the
# session's pinned spark.sql.session.timeZone=UTC (session.py).

_EPOCH_DAY = 86400.0
_MONOTONIC_TRANSFORMS = ("identity", "days", "months", "years", "truncate")


def _parse_partition_by(exprs: list[str], schema) -> list[dict]:
    """Parse ["days(warc_ts)", "bucket(16, url)", ...] into spec fields
    {name, transform, source, param}; bare column names mean identity."""
    import re

    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    spec = []
    for raw in exprs:
        s = raw.strip()
        m = re.fullmatch(r"(\w+)\(([^()]*)\)", s)
        if not m:
            t, args = "identity", [s]
        else:
            t, args = m.group(1), [a.strip() for a in m.group(2).split(",")]
        param = None
        if t in ("identity", "days", "months", "years"):
            if len(args) != 1:
                raise ValueError(f"snaptable partition_by: {raw!r} takes one column")
            src = args[0]
        elif t in ("bucket", "truncate"):
            if len(args) != 2:
                raise ValueError(
                    f"snaptable partition_by: {raw!r} takes (N, column)"
                )
            param, src = int(args[0]), args[1]
            if param <= 0:
                raise ValueError(f"snaptable partition_by: {raw!r} needs N > 0")
        else:
            raise ValueError(
                f"snaptable partition_by: unknown transform {t!r} "
                "(identity|days|months|years|bucket|truncate)"
            )
        if src not in names:
            raise ValueError(f"snaptable partition_by: no column {src!r}")
        dt = names[src]
        if t in ("days", "months", "years") and dt not in (
            "timestamp", "timestamp_ntz", "date"
        ):
            raise ValueError(f"snaptable partition_by: {t}({src}) needs ts/date, got {dt}")
        if t == "bucket" and not (dt == "string" or dt.startswith(("int", "bigint", "smallint", "tinyint"))):
            # bucket hashing casts to string; float/ts string forms differ
            # between Spark and the driver-side pruner, so reject them
            raise ValueError(f"snaptable partition_by: bucket({src}) needs string/int, got {dt}")
        if t == "truncate" and not (dt == "string" or dt.startswith(("int", "bigint", "smallint", "tinyint"))):
            raise ValueError(f"snaptable partition_by: truncate({src}) needs string/int, got {dt}")
        name = f"_p_{src}_{t}" + (str(param) if param is not None else "")
        if name in names:
            raise ValueError(f"snaptable partition_by: column {name!r} already exists")
        spec.append({"name": name, "transform": t, "source": src, "param": param})
    return spec


def _transform_expr(field: dict, dtype: str):
    """The Spark column expression computing a spec field's partition
    value — the writer-side half; _transform_py is its driver twin."""
    t, src, param = field["transform"], field["source"], field["param"]
    c = F.col(src)
    if t == "identity":
        return c
    if t == "days":
        if dtype == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("long")
        if dtype == "timestamp_ntz":
            # NTZ wall-clock == UTC under the session's pinned UTC tz
            c = c.cast("timestamp")
        return F.floor(c.cast("double") / _EPOCH_DAY).cast("long")
    if t == "months":
        return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("long")
    if t == "years":
        return (F.year(c) - 1970).cast("long")
    if t == "bucket":
        h = F.conv(F.substring(F.md5(c.cast("string")), 1, 14), 16, 10).cast("long")
        return F.pmod(h, F.lit(param)).cast("long")
    if t == "truncate":
        if dtype == "string":
            return F.substring(c, 1, param)
        return (c - F.pmod(c, F.lit(param))).cast("long")
    raise ValueError(f"snaptable: unknown transform {t!r}")


def _transform_py(field: dict, v):
    """Apply a spec field's transform to a driver-side predicate value.
    Returns None when the value's type can't be transformed faithfully
    (caller then skips pruning on this field — correctness over IO)."""
    import datetime
    import hashlib
    import math

    t, param = field["transform"], field["param"]
    if v is None:
        return None
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        # transforms operate on the UTC instant: a tz-AWARE value is
        # CONVERTED (astimezone) to naive-UTC wall clock; replace()
        # would reinterpret its wall clock as UTC and compute the
        # wrong partition day/month/year. A naive value is already UTC
        # wall clock (the session pins spark.sql.session.timeZone=UTC).
        v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    if t == "identity":
        return v
    if t == "days":
        if isinstance(v, datetime.datetime):
            return math.floor(
                v.replace(tzinfo=datetime.timezone.utc).timestamp() / _EPOCH_DAY
            )
        if isinstance(v, datetime.date):
            return (v - datetime.date(1970, 1, 1)).days
        return None
    if t == "months":
        if isinstance(v, (datetime.datetime, datetime.date)):
            return (v.year - 1970) * 12 + v.month - 1
        return None
    if t == "years":
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.year - 1970
        return None
    if t == "bucket":
        if isinstance(v, bool) or not isinstance(v, (str, int)):
            return None
        s = v if isinstance(v, str) else str(v)
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16) % param
    if t == "truncate":
        if isinstance(v, str):
            return v[:param]
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return v - (v % param)  # Python % == pmod for param > 0
    raise ValueError(f"snaptable: unknown transform {t!r}")


def _all_specs(snap: dict) -> list[dict]:
    """Active spec fields + every historical spec's (partition
    evolution): a file entry carries the tuple of whichever spec wrote
    it, and _part_survives skips fields absent from an entry, so
    pruning against the union is exact for old and new files alike.
    Duplicate field names collapse (same name == same transform by
    construction — the name encodes transform+source+param)."""
    seen: dict[str, dict] = {}
    for spec in [snap.get("partition_spec") or []] + list(
        snap.get("partition_spec_history") or []
    ):
        for f in spec or []:
            seen.setdefault(f["name"], f)
    return list(seen.values())


def evolve_partition_by(path: str, partition_by: list[str] | None) -> int:
    """Change the table's partition spec WITHOUT rewriting any data —
    Iceberg's partition evolution: existing files keep the tuple (and
    the pruning) of the spec that wrote them; files written after this
    commit lay out and prune under the new spec. plan_scan prunes with
    the union of all specs ever active, so a warc_ts-days predicate
    keeps pruning day-partitioned history even after the table moves
    to, say, bucket(64, url). `partition_by=None` drops partitioning
    for future writes. Metadata-only commit (operation 'evolve')."""
    from pyspark.sql.types import StructType

    head = current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: evolve on missing table")
    snap = _load_snapshot(path, head)
    schema = StructType.fromJson(json.loads(snap["schema"]))
    new_spec = _parse_partition_by(partition_by, schema) if partition_by else None
    old = snap.get("partition_spec")
    hist = list(snap.get("partition_spec_history") or [])
    if old:
        hist.append(old)
    return _commit(
        path,
        [],
        "evolve",
        snap["stats_cols"],
        snap["schema"],
        True,
        partition_spec=new_spec,
        partition_spec_history=hist,
    )


def _part_survives(entry: dict, spec: list[dict] | None, col: str, op: str, value) -> bool:
    """Can any row in `entry`'s file satisfy (col op value), judged by
    the file's partition tuple? Conservative: unknown/missing always
    survives; only provably-impossible files prune."""
    for f in spec or []:
        if f["source"] != col:
            continue
        part = entry.get("partition") or {}
        if f["name"] not in part:
            continue  # file written under a different spec: this field
            # can't judge it (others from its own spec still can)
        p = part[f["name"]]
        if p is None:
            # whole file's source column is NULL; no comparison matches
            return False
        # stored partition values went through _json_safe (datetime ->
        # ISO string); coerce the predicate's transform identically so
        # identity/truncate on timestamp sources compare like-typed
        tv = _json_safe(_transform_py(f, value))
        if tv is None:
            continue
        if isinstance(p, str) != isinstance(tv, str) or (
            isinstance(p, bool) != isinstance(tv, bool)
        ):
            continue  # incomparable (e.g. inference re-typed): keep
        if f["transform"] == "bucket":
            if op == "=" and p != tv:
                return False
            continue
        if op == "=" and p != tv:
            return False
        if op in (">=", ">") and p < tv:
            return False
        if op in ("<=", "<") and p > tv:
            return False
    return True


def _commit(
    path: str,
    new_entries: list[dict],
    operation: str,
    stats_cols: list[str],
    schema_json: str,
    carry_parent_files: bool,
    max_retries: int = 20,
    require_parent: int | None = None,
    extra: dict | None = None,
    partition_spec: list[dict] | None = None,
    partition_spec_history: list[list[dict]] | None = None,
    delete_files: list[dict] | None = None,
    add_delete_files: list[dict] | None = None,
) -> int:
    """Optimistic commit: build metadata against the current head, then
    O_EXCL-create the snapshot file. A concurrent winner makes the
    create fail -> re-read head and retry (Iceberg's loop). The data
    files were already written and are version-independent.

    `require_parent` is the REPLACE-operation validation: compact and
    delete compute their output from a specific head's file set, so if
    any other commit (e.g. an append) landed since, retrying blindly
    would publish a file set that silently drops the newcomer's files.
    Iceberg fails such commits; so do we — the caller re-plans against
    the new head and tries again.

    Sequence numbers: every NEW manifest entry is stamped seq=version
    (Iceberg's data sequence number); carried/kept entries keep the seq
    of the commit that added them. Equality-delete files (merge-on-read
    takedowns) apply to data files with a STRICTLY SMALLER seq, so a
    row re-appended after a delete is visible. `delete_files` replaces
    the snapshot's delete-file list outright (compact: deletes applied,
    list cleared); `add_delete_files` appends to the parent's list,
    re-read on every retry; both None inherits the parent's list."""
    os.makedirs(_meta_dir(path), exist_ok=True)
    # entries arriving WITHOUT a seq are new data from this commit and
    # take the version that finally wins (re-stamped on every retry —
    # a lost race means the real commit version is higher); entries
    # carrying one (rollback republishing an old manifest) keep it
    unstamped = [e for e in new_entries if "seq" not in e]
    for _ in range(max_retries):
        head = current_version(path)
        if require_parent is not None and head != require_parent:
            raise ConflictError(
                f"snaptable {path}: {operation} planned against snapshot "
                f"{require_parent} but head is now {head} — re-plan and retry"
            )
        version = head + 1
        for e in unstamped:
            e["seq"] = version
        if delete_files is not None:
            dels = list(delete_files)
        else:
            dels = list(
                (_load_snapshot(path, head).get("delete_files") or [])
                if head
                else []
            )
            for d in add_delete_files or []:
                dels.append({**d, "seq": d.get("seq", version)})
        files = list(_load_manifest(path, head)) if (head and carry_parent_files) else []
        files += new_entries
        # UNIQUE manifest name per attempt: a deterministic
        # manifest-{version}.json would let a LOSING committer truncate
        # the winner's already-committed manifest (it writes before the
        # O_EXCL snap create decides the race). Losing attempts leave an
        # orphaned manifest no snapshot references — invisible, and
        # reclaimed by expire() like any other dead metadata.
        manifest_rel = os.path.join(
            _META, f"manifest-{version}-{uuid.uuid4().hex[:8]}.json"
        )
        with open(os.path.join(path, manifest_rel), "w") as f:
            json.dump({"files": files}, f)
        snap = {
            "version": version,
            "parent": head or None,
            "operation": operation,
            "manifest": manifest_rel,
            "stats_cols": stats_cols,
            "partition_spec": partition_spec or None,
            "partition_spec_history": partition_spec_history or None,
            "delete_files": dels or None,
            "schema": schema_json,
            "added_files": len(new_entries),
            "total_files": len(files),
            "total_rows": sum(e["rows"] for e in files),
            "committed_at": time.time(),
            **(extra or {}),
        }
        # Publish = hard-link a fully-written tmp file onto the snap
        # name: link() is atomic AND exclusive (fails if a winner got
        # there first), and the content is COMPLETE before the file is
        # visible. A bare O_EXCL create + write-after is torn: between
        # the create and the json.dump, snapshots()/a retrying
        # committer reads an empty snap-{v}.json and dies on
        # JSONDecodeError — and a crash in that window corrupts the
        # head permanently. The .tmp never matches current_version's
        # snap-*.json filter, so half-written attempts are invisible;
        # expire() reclaims orphaned tmps like orphaned manifests.
        tmp = _snap_path(path, version) + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        try:
            os.link(tmp, _snap_path(path, version))
        except FileExistsError:
            # lost the race; our manifest + tmp attempts are orphaned
            # (no snapshot points at them) — retry against the new head
            _unlink_quiet(tmp)
            continue
        except FileNotFoundError:
            # a concurrent expire() reaped our tmp before the link —
            # same outcome as a lost race: rewrite and retry
            continue
        _unlink_quiet(tmp)
        return version
    raise RuntimeError(f"snaptable commit to {path}: lost {max_retries} races")


def _write_data(df: DataFrame, path: str, spec: list[dict] | None = None) -> str:
    sub = os.path.join(path, _DATA, uuid.uuid4().hex[:12])
    if spec:
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for f in spec:
            if f["name"] in types:
                raise ValueError(
                    f"snaptable: column {f['name']!r} collides with the "
                    "table's partition spec"
                )
            df = df.withColumn(f["name"], _transform_expr(f, types[f["source"]]))
        # hive layout strips the _p_* columns into directory names:
        # the data files carry ONLY the table schema, so direct file
        # reads (scan/merge/delete) stay layout-agnostic
        df.write.partitionBy(*[f["name"] for f in spec]).parquet(sub)
    else:
        df.write.parquet(sub)
    return sub


def create(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    stats_cols: list[str] | None = None,
    extra: dict | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Create the table with snapshot 1. `stats_cols` are the columns
    whose per-file min/max the manifest records (the prune keys —
    e.g. warc_ts for time-sliced recrawl scans, doc_id for backfills).
    `extra` keys merge into the snapshot record (e.g. a streaming
    sink's epoch tag for replay idempotence).

    `partition_by` declares HIDDEN partitioning from source-column
    transforms — ["days(warc_ts)", "bucket(16, url)", "lang"] — honored
    by every writer (append, compact, delete_where, merge_into, the
    streaming sink) and changeable later WITHOUT rewrites via
    evolve_partition_by (Iceberg partition evolution). Readers
    keep predicating on the SOURCE columns; scan planning derives the
    partition predicate itself. See the transform section above."""
    stats_cols = list(stats_cols or [])
    spec = _parse_partition_by(partition_by, df.schema) if partition_by else None
    sub = _write_data(df, path, spec)
    entries = _collect_file_stats(spark, sub, stats_cols, spec)
    return _commit(
        path, entries, "create", stats_cols, df.schema.json(), False,
        extra=extra, partition_spec=spec,
    )


def _check_additive(path: str, snap: dict, df: DataFrame, op: str) -> None:
    """Additive-only schema evolution guard shared by append and merge:
    df may grow columns beyond the table schema, but every existing
    column must keep its name and type (dropping or retyping would
    silently corrupt reads of pre-evolution files)."""
    _check_additive_schema(path, snap, df.schema, op)


def _check_additive_schema(path: str, snap: dict, schema, op: str) -> None:
    """Schema-typed variant (used by the format("snaptable") writer,
    which holds a StructType rather than a DataFrame)."""
    from pyspark.sql.types import StructType

    old = StructType.fromJson(json.loads(snap["schema"]))
    new_fields = {f.name: f.dataType for f in schema.fields}
    for f in old.fields:
        if f.name not in new_fields:
            raise ValueError(
                f"snaptable {path}: {op} drops column {f.name!r} — "
                "schema evolution is additive only"
            )
        if new_fields[f.name] != f.dataType:
            raise ValueError(
                f"snaptable {path}: {op} retypes column {f.name!r} "
                f"({f.dataType.simpleString()} -> "
                f"{new_fields[f.name].simpleString()})"
            )


def append(
    spark: SparkSession, path: str, df: DataFrame, extra: dict | None = None
) -> int:
    """Append df as a new snapshot (parent's files + the new ones).

    ADDITIVE schema evolution is allowed — crawl tables grow columns
    (a new extraction field, a quality score) mid-corpus: df may carry
    extra columns beyond the table schema; every existing column must
    keep its name and type. The snapshot stores the WIDENED schema and
    every read path applies it explicitly, so Spark's parquet reader
    null-fills the new columns in pre-evolution files (no rewrite).
    Dropping or retyping a column is rejected — that would silently
    corrupt old snapshots' reads."""
    head = current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: append to missing table")
    snap = _load_snapshot(path, head)
    stats_cols = snap["stats_cols"]
    spec = snap.get("partition_spec")
    hist = snap.get("partition_spec_history")
    _check_additive(path, snap, df, "append")
    sub = _write_data(df, path, spec)
    entries = _collect_file_stats(spark, sub, stats_cols, spec)
    return _commit(
        path, entries, "append", stats_cols, df.schema.json(), True,
        extra=extra, partition_spec=spec, partition_spec_history=hist,
    )


# ---------------------------------------------------------------------------
# read path


def _files_for(path: str, snapshot_id: int | None) -> tuple[list[dict], dict]:
    head = snapshot_id if snapshot_id is not None else current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: no committed snapshot")
    return _load_manifest(path, head), _load_snapshot(path, head)


def _read_with_deletes(
    spark: SparkSession,
    path: str,
    entries: list[dict],
    schema,
    dels: list[dict],
) -> DataFrame:
    """Read data-file entries applying equality-delete files
    (merge-on-read). A delete file with sequence s erases rows whose
    key tuple it contains from data files with seq < s ONLY — rows
    re-appended after the takedown stay visible (Iceberg's sequence
    rule). Data files are grouped by which suffix of the seq-sorted
    delete list applies to them (#groups <= #delete commits + 1, not
    #files); each group anti-joins against the BROADCAST union of its
    applicable delete keys, so the table side never shuffles and the
    delete side is delta-sized by construction."""
    import bisect

    if not entries:
        return spark.createDataFrame([], schema)

    def _read(ents: list[dict]) -> DataFrame:
        return (
            spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(*[os.path.join(path, e["path"]) for e in ents])
        )

    if not dels:
        return _read(entries)
    dels = sorted(dels, key=lambda d: d.get("seq", 0))
    seqs = [d.get("seq", 0) for d in dels]
    groups: dict[int, list[dict]] = {}
    for e in entries:
        # deletes with seq > entry seq apply; suffix start index
        groups.setdefault(bisect.bisect_right(seqs, e.get("seq", 0)), []).append(e)
    parts = []
    for idx, ents in sorted(groups.items()):
        df = _read(ents)
        by_key: dict[tuple, list[dict]] = {}
        for d in dels[idx:]:
            by_key.setdefault(tuple(d["key_cols"]), []).append(d)
        for key_cols, dfiles in by_key.items():
            keys = (
                spark.read.parquet(
                    *[os.path.join(path, d["path"]) for d in dfiles]
                )
                .select(*key_cols)
                .distinct()
            )
            df = df.join(F.broadcast(keys), on=list(key_cols), how="left_anti")
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delete_keys(
    spark: SparkSession, path: str, keys: DataFrame, extra: dict | None = None
) -> int:
    """MERGE-ON-READ equality deletes — the O(delta) takedown path.
    `keys` is a DataFrame whose columns name the key (e.g. `url`, or
    a composite); its rows are written as a small parquet delete file
    and committed as an 'eq-delete' snapshot that REWRITES NOTHING:
    readers anti-join data files against the broadcast key set at scan
    time (see _read_with_deletes). Where delete_where() rewrites every
    affected file (cost ∝ affected data), this commits in O(keys) —
    the right shape when a takedown touches a thin slice of 10^12 docs
    spread across every file. compact() later applies outstanding
    deletes physically and clears the list; expire() then reclaims the
    pre-delete snapshots, finalizing the takedown exactly like the COW
    path.

    Key columns must exist in the table schema (values are cast to the
    table's types so the anti-join is like-typed). Rows with ANY NULL
    key are dropped — equality deletes match by equi-join semantics,
    so a NULL key could never match a row anyway. An empty key set is
    a no-op (no commit)."""
    from pyspark.sql.types import StructType

    files, snap = _files_for(path, None)
    schema = StructType.fromJson(json.loads(snap["schema"]))
    names = {f.name: f.dataType for f in schema.fields}
    key_cols = list(keys.columns)
    if not key_cols:
        raise ValueError("snaptable delete_keys: keys has no columns")
    for k in key_cols:
        if k not in names:
            raise ValueError(
                f"snaptable delete_keys: key column {k!r} not in table schema"
            )
    clean = (
        keys.na.drop(subset=key_cols)
        .select(*[F.col(k).cast(names[k]).alias(k) for k in key_cols])
        .distinct()
    )
    sub = os.path.join(path, _DATA, uuid.uuid4().hex[:12])
    clean.write.parquet(sub)
    entries = _collect_file_stats(spark, sub, [], None)
    new_dels = [
        {"path": e["path"], "rows": e["rows"], "key_cols": key_cols}
        for e in entries
        if e["rows"] > 0
    ]
    if not new_dels:
        return snap["version"]  # nothing to delete: no-op, no commit
    return _commit(
        path,
        [],
        "eq-delete",
        snap["stats_cols"],
        snap["schema"],
        True,
        extra=extra,
        partition_spec=snap.get("partition_spec"),
        partition_spec_history=snap.get("partition_spec_history"),
        add_delete_files=new_dels,
    )


def _survives(entry: dict, col: str, op: str, value) -> bool:
    st = entry.get("stats", {}).get(col)
    if not st or st["min"] is None or st["max"] is None:
        return True  # missing stats: never prune (correctness over IO)
    mn, mx = st["min"], st["max"]
    # stats were stored through _json_safe (datetime -> ISO string,
    # Decimal -> float); coerce the predicate value identically so the
    # comparison is like-typed. ISO-8601 strings order lexicographically
    # == chronologically for the (naive, fixed-offset-free) timestamps
    # Spark hands back, so pruning stays exact for timestamp stats cols.
    value = _json_safe(value)
    if isinstance(mn, str) != isinstance(value, str) or (
        isinstance(mn, bool) != isinstance(value, bool)
    ):
        return True  # incomparable types: never prune
    if op == "=":
        return mn <= value <= mx
    if op == ">=":
        return mx >= value
    if op == ">":
        return mx > value
    if op == "<=":
        return mn <= value
    if op == "<":
        return mn < value
    raise ValueError(f"snaptable scan: unsupported op {op!r}")


def plan_scan(
    path: str,
    predicates: list[tuple] | None = None,
    snapshot_id: int | None = None,
) -> dict:
    """Driver-side scan planning: returns the surviving file list plus
    prune accounting (what the judge of a 100 TB bill looks at).
    Composes min/max-stats pruning with hidden-partition pruning (the
    predicate stays on the SOURCE column; the transform is derived)."""
    files, snap = _files_for(path, snapshot_id)
    spec = _all_specs(snap)
    kept = [
        e
        for e in files
        if all(
            _survives(e, c, op, v) and _part_survives(e, spec, c, op, v)
            for (c, op, v) in (predicates or [])
        )
    ]
    dels = snap.get("delete_files") or []
    return {
        "snapshot": snap["version"],
        "files_total": len(files),
        "files_kept": len(kept),
        # upper bound: equality deletes subtract an unknown (<= their
        # row count) number of rows at read time
        "rows_upper_bound": sum(e["rows"] for e in kept),
        "files": [os.path.join(path, e["path"]) for e in kept],
        "entries": kept,
        "delete_files": dels,
        "delete_rows": sum(d["rows"] for d in dels),
        "schema": snap["schema"],
    }


def read(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Full snapshot read (time travel via snapshot_id or a tag name)."""
    return scan(spark, path, None, snapshot_id, ref)


def scan(
    spark: SparkSession,
    path: str,
    predicates: list[tuple] | None = None,
    snapshot_id: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Predicate scan with manifest pruning. `predicates` is a list of
    (col, op, value) with op in {=, <, <=, >, >=}, ANDed. The same
    predicate is re-applied as a row filter, so pruning never changes
    results — only how many files Spark opens."""
    from pyspark.sql.types import StructType

    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("snaptable scan: pass snapshot_id OR ref, not both")
        snapshot_id = resolve_ref(path, ref)
    plan = plan_scan(path, predicates, snapshot_id)
    schema = StructType.fromJson(json.loads(plan["schema"]))
    df = _read_with_deletes(
        spark, path, plan["entries"], schema, plan["delete_files"]
    )
    for col, op, v in predicates or []:
        c = F.col(col)
        df = df.filter(
            {"=": c == v, ">=": c >= v, ">": c > v, "<=": c <= v, "<": c < v}[op]
        )
    return df


def compact(
    spark: SparkSession,
    path: str,
    target_files: int = 8,
    snapshot_id: int | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Rewrite the current file set into `target_files` files and
    commit the result as a REPLACE snapshot (same rows, new files) —
    the small-files maintenance an append-heavy crawl table needs:
    10^5 micro-batch commits/day otherwise leave footers dominating
    scan time. Readers pinned to older snapshots keep working (their
    files are not deleted — see expire()); the swap is atomic like any
    other commit, and a concurrent append simply wins or loses the
    O_EXCL race as usual.

    `zorder_by=[c1, c2]` makes the rewrite a clustering one (Iceberg/
    Delta OPTIMIZE ZORDER): rows are range-partitioned AND sorted on
    the Morton interleave of the two columns (quantized into their
    observed global bounds, one tiny agg job), so every output file
    covers a tight rectangle in (c1, c2) — a conjunctive range
    predicate on BOTH columns then manifest-prunes to ~the overlap,
    where a linear sort on c1 alone leaves every file spanning the
    full c2 range. Ordering changes rows' file placement only, never
    the row set, so value-exactness is untouched."""
    files, snap = _files_for(path, snapshot_id)
    stats_cols = snap["stats_cols"]
    df = read(spark, path, snap["version"])
    if zorder_by:
        if len(zorder_by) != 2:
            raise ValueError(
                "snaptable compact: zorder_by takes exactly two columns "
                f"(got {zorder_by!r})"
            )
        from mundipy_spark.sources.zorder import _quant, _spread

        c1, c2 = zorder_by
        b = df.agg(
            F.min(c1).cast("double").alias("mn1"),
            F.max(c1).cast("double").alias("mx1"),
            F.min(c2).cast("double").alias("mn2"),
            F.max(c2).cast("double").alias("mx2"),
        ).head()
        # degenerate (constant / all-null) axes quantize to bucket 0
        lo1, hi1 = b["mn1"] or 0.0, b["mx1"] or 0.0
        lo2, hi2 = b["mn2"] or 0.0, b["mx2"] or 0.0
        if hi1 <= lo1:
            hi1 = lo1 + 1.0
        if hi2 <= lo2:
            hi2 = lo2 + 1.0
        x = _spread(_quant(F.col(c1).cast("double"), lo1, hi1))
        y = _spread(_quant(F.col(c2).cast("double"), lo2, hi2))
        zkey = x.bitwiseOR(F.shiftleft(y, 1)).cast("long")
        kc = "__zkey__"
        while kc in df.columns:
            kc += "_"
        df = (
            df.withColumn(kc, zkey)
            .repartitionByRange(target_files, kc)
            .sortWithinPartitions(kc)
            .drop(kc)
        )
    else:
        df = df.repartition(target_files)
    spec = snap.get("partition_spec")
    sub = _write_data(df, path, spec)
    entries = _collect_file_stats(spark, sub, stats_cols, spec)
    return _commit(
        path,
        entries,
        "replace",
        stats_cols,
        snap["schema"],
        False,
        require_parent=snap["version"],
        partition_spec=spec,
        partition_spec_history=snap.get("partition_spec_history"),
        # the rewrite read through read() and thus APPLIED every
        # outstanding equality delete; the new snapshot owes none
        delete_files=[],
    )


def compact_small(
    spark: SparkSession,
    path: str,
    small_mb: float = 32.0,
    target_mb: float = 128.0,
) -> int:
    """BIN-PACK compaction (Iceberg's binpack rewrite): merge only the
    files smaller than `small_mb` into ~`target_mb` outputs, leaving
    every already-well-sized file untouched. compact() rewrites the
    WHOLE table — O(table), prohibitive as routine maintenance at
    10^12 docs — while an append-heavy crawl table's problem is the
    micro-batch TAIL: 10^5 small commits/day. This rewrite costs
    O(small tail) and runs nightly at any table size.

    Semantics: rewritten rows read through the MOR delete path, so
    outstanding equality deletes are APPLIED to them (their new files
    get a fresh seq > every delete's seq, so the deletes never re-apply)
    while untouched files keep their original seq AND the snapshot
    keeps the delete list — deletes continue to mask those files at
    read until a full compact() clears them. Kept entries carry their
    seq through the commit; a concurrent commit fails the
    require_parent fence like any rewrite (re-plan and retry). Returns
    the new version, or the current one (no commit) when fewer than
    two small files exist."""
    files, snap = _files_for(path, None)
    small_bytes = int(small_mb * 1024 * 1024)
    small, kept, total = [], [], 0
    for e in files:
        try:
            sz = os.path.getsize(os.path.join(path, e["path"]))
        except OSError:
            sz = small_bytes  # unstatable: treat as big, never rewrite
        if sz < small_bytes:
            small.append(e)
            total += sz
        else:
            kept.append(e)
    spec = snap.get("partition_spec")
    n_out = max(1, -(-total // int(target_mb * 1024 * 1024)))
    # CONVERGENCE floor: hive layout writes >= one file per partition
    # tuple, so the best possible output count is the number of
    # distinct tuples among the small files (or n_out when
    # unpartitioned). If the rewrite cannot strictly reduce the file
    # count — e.g. a bucket(16) tail already at one tiny file per
    # bucket — committing would churn the same bytes every night
    # without progress: no-op instead.
    if spec:
        floor = len(
            {
                json.dumps(e.get("partition") or {}, sort_keys=True)
                for e in small
            }
        )
    else:
        floor = n_out
    if len(small) <= max(floor, 1):
        return snap["version"]  # nothing worth merging: no-op
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(snap["schema"]))
    dels = snap.get("delete_files") or []
    df = _read_with_deletes(spark, path, small, schema, dels)
    if spec:
        # co-locate each partition tuple in one task: a round-robin
        # repartition before partitionBy writes ~n_out files PER tuple
        # (re-fragmenting the tail it is merging); hashing on the
        # transform expressions writes one file per tuple per task
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        exprs = [_transform_expr(f, types[f["source"]]) for f in spec]
        df = df.repartition(n_out, *exprs)
    else:
        df = df.repartition(n_out)
    sub = _write_data(df, path, spec)
    new_entries = _collect_file_stats(spark, sub, snap["stats_cols"], spec)
    for e in kept:
        # see delete_where: carried legacy (pre-seq) entries keep seq 0,
        # not this commit's version — restamping would stop outstanding
        # deletes from applying to them
        e.setdefault("seq", 0)
    return _commit(
        path,
        kept + new_entries,  # kept carry their seq; new stamp version
        "replace",
        snap["stats_cols"],
        snap["schema"],
        False,
        require_parent=snap["version"],
        partition_spec=spec,
        partition_spec_history=snap.get("partition_spec_history"),
        # deletes stay outstanding: they still mask the KEPT files
        # (smaller seq); the rewritten rows already absorbed them
        delete_files=dels or None,
    )


def delete_where(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
) -> int:
    """Copy-on-write row deletes — the takedown path a crawl corpus
    needs (URL removal requests, retroactive robots compliance): rows
    matching ALL predicates are removed by rewriting ONLY the files
    whose stats admit a match (manifest-pruned, same machinery as
    scan); untouched files keep their paths, so the rewrite cost is
    proportional to the affected fraction, not the table. Commits as a
    'delete' snapshot; time travel to earlier snapshots still sees the
    deleted rows until expire() reclaims them (takedown finalizes at
    expiry, exactly like Iceberg COW deletes + snapshot expiration)."""
    from pyspark.sql.types import StructType

    files, snap = _files_for(path, None)
    stats_cols = snap["stats_cols"]
    spec = snap.get("partition_spec")
    prune_spec = _all_specs(snap)
    affected = [
        e
        for e in files
        if all(
            _survives(e, c, op, v) and _part_survives(e, prune_spec, c, op, v)
            for (c, op, v) in predicates
        )
    ]
    affected_paths = {e["path"] for e in affected}
    keep_entries = [e for e in files if e["path"] not in affected_paths]
    for e in keep_entries:
        # pre-seq (legacy) entries carried through a rewrite commit must
        # keep seq 0, not be restamped as this commit's new data — a
        # restamp would detach outstanding equality deletes from files
        # the rewrite never touched (rollback() makes the same call)
        e.setdefault("seq", 0)
    if not affected:
        return snap["version"]  # nothing can match: no-op, no commit
    schema = StructType.fromJson(json.loads(snap["schema"]))
    # the rewrite must also APPLY outstanding equality deletes to the
    # rows it rewrites: the new files take a fresh (higher) seq, so
    # older delete files stop applying to them — a raw read would
    # resurrect MOR-deleted rows
    df = _read_with_deletes(
        spark, path, affected, schema, snap.get("delete_files") or []
    )
    # a row is deleted only if EVERY predicate holds; survivors are the
    # complement (NULL predicate columns never match -> never deleted)
    delete_cond = F.lit(True)
    for col, op, v in predicates:
        c = F.col(col)
        delete_cond = delete_cond & (
            {"=": c == v, ">=": c >= v, ">": c > v, "<=": c <= v, "<": c < v}[op]
        )
    keep = df.filter(~F.coalesce(delete_cond, F.lit(False)))
    # write unconditionally — probing emptiness first (limit(1).count())
    # would read+filter every affected file TWICE. Zero survivors yield
    # zero-row part files, which the stats job (groupBy input_file_name)
    # maps to zero manifest entries; the empty files are unreferenced
    # and harmless.
    sub = _write_data(keep, path, spec)
    new_entries = [
        e for e in _collect_file_stats(spark, sub, stats_cols, spec) if e["rows"] > 0
    ]
    return _commit(
        path,
        keep_entries + new_entries,
        "delete",
        stats_cols,
        snap["schema"],
        False,
        require_parent=snap["version"],
        partition_spec=spec,
        partition_spec_history=snap.get("partition_spec_history"),
    )


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    validate_source_keys: bool = True,
    extra: dict | None = None,
) -> int:
    """Copy-on-write MERGE (upsert by key) — the recrawl write path:
    a re-fetched URL's new row REPLACES the stored row with the same
    key; unseen keys are appended. Iceberg's MERGE INTO, re-expressed:

    - **Touch detection is two-stage.** Manifest stats first (files
      whose [min,max] on a stats key column cannot contain ANY source
      key are never opened — at 10^12 docs a nightly recrawl delta
      touches a tiny time/id slice of ~10^6 files), then an EXACT
      probe: candidates read once with input_file_name(), left-semi
      joined against the broadcast source keys, distinct file names
      collected (O(files), not O(rows)). Files with no true key match
      keep their manifest entries untouched — the rewrite cost is
      proportional to the matched fraction, not the table.
    - **Rewrite = anti-join survivors + the whole source.** Only the
      truly-touched files are read a second time; rows whose key
      appears in the source are dropped (every-key-NULL rows never
      match, like SQL MERGE), the source union-by-names on top, and
      the result lands as new data files. Commit carries the untouched
      entries + the new ones under `require_parent`, so a concurrent
      append forces a re-plan instead of being silently dropped.
    - **Source keys must be unique** (SQL MERGE's cardinality rule:
      two source rows matching one target row is nondeterministic).
      Validated with one small agg over the (persisted) source;
      disable via validate_source_keys=False when the caller already
      dedup'd (e.g. recrawl_dedup output).
    - Schema evolution matches append(): source may ADD columns
      (survivors null-fill), never drop or retype.

    Like compact/delete this is a rewrite snapshot: read_incremental
    cannot cross it (operation "merge" is fenced there)."""
    from pyspark.sql.types import StructType

    if not key_cols:
        raise ValueError("snaptable merge_into: key_cols must be non-empty")
    files, snap = _files_for(path, None)
    stats_cols = snap["stats_cols"]
    _check_additive(path, snap, source, "merge")
    for k in key_cols:
        if k not in {f.name for f in source.schema.fields}:
            raise ValueError(f"snaptable merge_into: source lacks key {k!r}")
    source = source.persist()
    try:
        if validate_source_keys:
            # a row with ANY NULL key can never match (equi-join
            # semantics) — duplicates among those are plain inserts,
            # only matchable keys are held to the cardinality rule
            dup = (
                source.na.drop(subset=key_cols)
                .groupBy(*key_cols)
                .count()
                .filter(F.col("count") > 1)
                .head(1)
            )
            if dup:
                raise ValueError(
                    "snaptable merge_into: source has duplicate keys "
                    f"(e.g. {tuple(dup[0][k] for k in key_cols)}); "
                    "dedup the source first (SQL MERGE cardinality rule)"
                )
        if not source.head(1):
            return snap["version"]  # empty delta: no-op, no commit
        # stage 1: manifest prune — bounds of every stats-covered key col,
        # plus hidden-partition pruning: a file can only hold a source key
        # if its partition value is among the source keys' own transform
        # values (e.g. bucket(16, url): a url-keyed recrawl delta touches
        # only the buckets its urls hash to — 15/16 of the table never
        # opens, with no url stats needed). The value set is computed
        # cluster-side with the SAME writer expression, so it can never
        # diverge from what the writer laid down; skipped if unexpectedly
        # unbounded (cap 4096 — a bucket spec is <= its n by construction).
        spec = snap.get("partition_spec") or None
        candidates = files
        src_types = {f.name: f.dataType.simpleString() for f in source.schema.fields}
        for pf in _all_specs(snap):
            if pf["source"] not in key_cols:
                continue
            vals = (
                source.select(_transform_expr(pf, src_types[pf["source"]]).alias("v"))
                .distinct()
                .limit(4097)
                .collect()
            )
            if len(vals) > 4096:
                continue
            # same _json_safe coercion as the manifest side, and the
            # same incomparable-type escape as _part_survives: a stored
            # value whose type drifted (e.g. a legacy hive-inferred
            # manifest re-typed '2024abc''s truncate prefix as int)
            # must KEEP the file, not prune a true key match into a
            # permanent duplicate. A None partition value means every
            # row's key column is NULL — no source key can equi-match
            # those rows, so pruning is exact.
            allowed = {_json_safe(r["v"]) for r in vals}
            allowed_types = {type(a) for a in allowed}

            def _may_hold(e, pf=pf, allowed=allowed, allowed_types=allowed_types):
                part = e.get("partition") or {}
                if pf["name"] not in part:
                    return True
                p = part[pf["name"]]
                if p is None:
                    return False
                if type(p) not in allowed_types:
                    return True  # incomparable: correctness over IO
                return p in allowed

            candidates = [e for e in candidates if _may_hold(e)]
        bound_keys = [k for k in key_cols if k in stats_cols]
        if bound_keys:
            bounds = source.agg(
                *[F.min(k).alias(f"_mn_{k}") for k in bound_keys],
                *[F.max(k).alias(f"_mx_{k}") for k in bound_keys],
            ).head()
            for k in bound_keys:
                mn, mx = bounds[f"_mn_{k}"], bounds[f"_mx_{k}"]
                if mn is None:
                    candidates = []
                    break
                candidates = [
                    e
                    for e in candidates
                    if _survives(e, k, ">=", mn) and _survives(e, k, "<=", mx)
                ]
        schema = StructType.fromJson(json.loads(snap["schema"]))
        touched_paths: set[str] = set()
        if candidates:
            # stage 2: exact probe — which candidate files really hold a
            # source key. Broadcast the (delta-sized) key set; only file
            # NAMES come back to the driver.
            cand = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(
                *[os.path.join(path, e["path"]) for e in candidates]
            )
            src_keys = F.broadcast(source.select(*key_cols).distinct())
            # input_file_name() must be projected BEFORE the join (it
            # is ambiguous once two file sources are in the plan); the
            # pre-join select keeps only the keys + file name, so no
            # user column can collide with the probe alias
            fcol = "__snap_probe_file__"
            while fcol in key_cols:
                fcol += "_"
            cand_keys = cand.select(
                *key_cols, F.input_file_name().alias(fcol)
            )
            hit_files = (
                cand_keys.join(src_keys, on=key_cols, how="left_semi")
                .select(fcol)
                .distinct()
                .collect()
            )
            for r in hit_files:
                # same once-decode as _collect_file_stats: the manifest
                # stores on-disk names, the probe returns URIs
                fname = urllib.parse.unquote(r[fcol])
                idx = fname.rfind(f"/{_DATA}/")
                touched_paths.add(fname[idx + 1 :] if idx >= 0 else fname)
        keep_entries = [e for e in files if e["path"] not in touched_paths]
        for e in keep_entries:
            # see delete_where: carried legacy entries keep seq 0
            e.setdefault("seq", 0)
        # widened output schema = the source's (append()'s evolution rule)
        out_cols = [f.name for f in source.schema.fields]
        old_names = {f.name for f in schema.fields}
        if touched_paths:
            # like delete_where's rewrite: survivors get a fresh seq,
            # so outstanding equality deletes must be applied NOW or
            # they would stop covering the rewritten rows
            survivors = _read_with_deletes(
                spark,
                path,
                [e for e in files if e["path"] in touched_paths],
                schema,
                snap.get("delete_files") or [],
            )
            src_keys = F.broadcast(source.select(*key_cols).distinct())
            survivors = survivors.join(src_keys, on=key_cols, how="left_anti")
            survivors = survivors.select(
                *[
                    F.col(c) if c in old_names
                    else F.lit(None).cast(source.schema[c].dataType).alias(c)
                    for c in out_cols
                ]
            )
            out = survivors.unionByName(source.select(*out_cols))
        else:
            out = source.select(*out_cols)
        sub = _write_data(out, path, spec)
        new_entries = [
            e for e in _collect_file_stats(spark, sub, stats_cols, spec) if e["rows"] > 0
        ]
        return _commit(
            path,
            keep_entries + new_entries,
            "merge",
            stats_cols,
            source.schema.json(),
            False,
            require_parent=snap["version"],
            extra=extra,
            partition_spec=spec,
            partition_spec_history=snap.get("partition_spec_history"),
        )
    finally:
        source.unpersist()


def expire(path: str, keep_from: int) -> dict:
    """Delete data/manifest files referenced ONLY by snapshots older
    than `keep_from`, then the old metadata itself — Iceberg's
    expire_snapshots. Time travel to >= keep_from keeps working;
    anything older is gone — EXCEPT tagged snapshots (see tag()):
    a tag pins its snapshot's metadata, manifest, and data files
    through any expire, Iceberg's ref-retention rule. Staged (WAP)
    snapshots' files are likewise never touched: they belong to no
    committed snapshot, and drop_staged()/publish_staged() own their
    lifecycle. Returns deletion accounting."""
    head = current_version(path)
    keep_from = max(1, min(keep_from, head))
    keep_versions = set(range(keep_from, head + 1))
    keep_versions |= {v for v in tags(path).values() if 1 <= v <= head}
    live: set[str] = set()
    for s in _staged_full(path):
        live |= {e["path"] for e in s["entries"]}
    # cross-root liveness: files under this root that the parent chain,
    # sibling branches, or this root's own branches still reference
    # must survive even when dead HERE (a branch shares the fork's
    # files by absolute path; main shares fast-forwarded branch files)
    live |= _external_referenced(path)
    for v in sorted(keep_versions):
        if os.path.exists(_snap_path(path, v)):
            live |= {e["path"] for e in _load_manifest(path, v)}
            live |= {
                d["path"]
                for d in _load_snapshot(path, v).get("delete_files") or []
            }
    removed_data = 0
    live_manifests = {
        _load_snapshot(path, v)["manifest"]
        for v in sorted(keep_versions)
        if os.path.exists(_snap_path(path, v))
    }
    for v in range(1, keep_from):
        if v in keep_versions or not os.path.exists(_snap_path(path, v)):
            continue
        old_snap = _load_snapshot(path, v)
        dead = [e["path"] for e in _load_manifest(path, v)]
        dead += [d["path"] for d in old_snap.get("delete_files") or []]
        table_root = os.path.abspath(path) + os.sep
        for rel in dead:
            p = os.path.join(path, rel)
            # ownership guard: never delete files OUTSIDE the table
            # root — a branch's expire must not reclaim fork files the
            # parent still references, and adopted external files
            # (add_files) belong to their original owner
            if not os.path.abspath(p).startswith(table_root):
                continue
            if rel not in live and os.path.exists(p):
                os.remove(p)
                removed_data += 1
        os.remove(os.path.join(path, old_snap["manifest"]))
        os.remove(_snap_path(path, v))
    # orphaned manifests and snap tmps (lost commit races, crashed
    # attempts, expired snapshots) are referenced by no surviving
    # snapshot; reclaim them
    meta = _meta_dir(path)
    now = time.time()
    for name in os.listdir(meta):
        rel = os.path.join(_META, name)
        full = os.path.join(meta, name)
        if name.startswith("manifest-") and rel not in live_manifests:
            os.remove(full)
        elif name.endswith(".tmp"):
            # min-age guard (the Iceberg orphan-file rule): a FRESH tmp
            # may belong to a commit in flight between its write and
            # os.link — reaping it would turn that commit's publish into
            # a spurious retry; _commit also tolerates the race
            try:
                if now - os.path.getmtime(full) > _TMP_MIN_AGE_S:
                    os.remove(full)
            except FileNotFoundError:
                pass
    return {"removed_data_files": removed_data, "oldest_kept": keep_from}


def read_incremental(
    spark: SparkSession,
    path: str,
    since: int,
    until: int | None = None,
) -> DataFrame:
    """Rows in files ADDED after snapshot `since` (exclusive) up to
    `until` (inclusive; default head) — Iceberg's incremental-read
    pattern. A recrawl consumer checkpoints the last snapshot it
    processed and each run reads only the delta's files: at 10^12 docs
    the nightly job scans the night's appends, never the table. Append
    lineage is derived from the manifests themselves (set difference of
    file paths), so it is correct even across concurrent committers."""
    from pyspark.sql.types import StructType

    head = until if until is not None else current_version(path)
    if since > head:
        raise ValueError(f"snaptable {path}: since={since} > until={head}")
    for v in range(since + 1, head + 1):
        if (
            os.path.exists(_snap_path(path, v))
            and _load_snapshot(path, v)["operation"]
            in ("replace", "delete", "merge", "eq-delete", "rollback")
        ):
            # a compaction/delete rewrote files (or an eq-delete
            # retracted rows without touching files): "files added
            # since" would re-deliver already-consumed rows or miss
            # retractions. Same constraint as Iceberg's incremental
            # APPEND scan.
            raise ValueError(
                f"snaptable {path}: snapshot {v} is a "
                f"{_load_snapshot(path, v)['operation']} (rewrite/retraction); "
                f"incremental read cannot cross it — restart from {v}"
            )
    new_files, snap = _files_for(path, head)
    old_paths = (
        {e["path"] for e in _load_manifest(path, since)} if since > 0 else set()
    )
    delta = [
        os.path.join(path, e["path"])
        for e in new_files
        if e["path"] not in old_paths
    ]
    schema = StructType.fromJson(json.loads(snap["schema"]))
    if not delta:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(*delta)


def read_changes(
    spark: SparkSession,
    path: str,
    since: int,
    until: int | None = None,
) -> DataFrame:
    """CDC changelog scan — Iceberg's changelog/CDC read, re-expressed:
    every logical row change between snapshot `since` (exclusive) and
    `until` (inclusive, default head) as table rows plus
    `_change_type` ('insert' | 'delete') and `_commit_version`. The
    downstream-index-maintenance path: a consumer (search index, ANN
    shards, dedup ledger) checkpoints its last snapshot and applies
    exactly the delta, including retractions that read_incremental
    must fence on.

    Per-snapshot semantics:
    - append/create: the added files' rows as inserts (new files carry
      this commit's seq, so no existing delete can apply to them).
    - eq-delete: the rows the delete RETRACTED, read from the previous
      snapshot's visible state (earlier deletes already applied there;
      every pre-state file has seq < this commit, so the new keys
      apply to all of it) semi-joined against the new delete keys —
      full deleted rows, not just keys, like Iceberg's changelog.
    - replace (compact): no logical change — emitted as nothing, so a
      changelog consumer CROSSES compactions that fence
      read_incremental.
    - evolve: metadata-only, nothing.
    - merge/delete (COW rewrites) and rollback change rows in ways
      that need pre/post-image diffing: fenced with ValueError, like
      Iceberg's changelog scan on overwrite snapshots.

    Rows are emitted under `until`'s schema (additive evolution
    null-fills older files)."""
    from pyspark.sql.types import StructType

    head = until if until is not None else current_version(path)
    if since > head:
        raise ValueError(f"snaptable {path}: since={since} > until={head}")
    out_schema = StructType.fromJson(
        json.loads(_load_snapshot(path, head)["schema"])
    )
    cols = [f.name for f in out_schema.fields]

    def _project(df: DataFrame, change: str, v: int) -> DataFrame:
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have
                else F.lit(None).cast(out_schema[c].dataType).alias(c)
                for c in cols
            ],
            F.lit(change).alias("_change_type"),
            F.lit(v).cast("long").alias("_commit_version"),
        )

    parts: list[DataFrame] = []
    for v in range(since + 1, head + 1):
        if not os.path.exists(_snap_path(path, v)):
            raise ValueError(
                f"snaptable {path}: snapshot {v} expired; changelog "
                f"cannot reconstruct changes — restart from {v}"
            )
        snap = _load_snapshot(path, v)
        op = snap["operation"]
        if op in ("replace", "evolve"):
            continue  # row set unchanged
        if op in ("merge", "delete", "rollback"):
            raise ValueError(
                f"snaptable {path}: snapshot {v} is a {op}; changelog "
                f"needs pre/post-image diffing there — restart from {v}"
            )
        schema_v = StructType.fromJson(json.loads(snap["schema"]))
        if op in ("create", "append"):
            prev = (
                {e["path"] for e in _load_manifest(path, v - 1)}
                if v > 1
                else set()
            )
            added = [
                e for e in _load_manifest(path, v) if e["path"] not in prev
            ]
            if added:
                rows = (
                    spark.read.schema(schema_v)
                    .option("recursiveFileLookup", "true")
                    .parquet(*[os.path.join(path, e["path"]) for e in added])
                )
                parts.append(_project(rows, "insert", v))
        elif op == "eq-delete":
            prev_dels = {
                d["path"]
                for d in (_load_snapshot(path, v - 1).get("delete_files") or [])
            } if v > 1 else set()
            new_dels = [
                d
                for d in snap.get("delete_files") or []
                if d["path"] not in prev_dels
            ]
            if not new_dels:
                continue
            prev_state = read(spark, path, v - 1)
            by_key: dict[tuple, list[dict]] = {}
            for d in new_dels:
                by_key.setdefault(tuple(d["key_cols"]), []).append(d)
            for key_cols, dfiles in by_key.items():
                keys = (
                    spark.read.parquet(
                        *[os.path.join(path, d["path"]) for d in dfiles]
                    )
                    .select(*key_cols)
                    .distinct()
                )
                retracted = prev_state.join(
                    F.broadcast(keys), on=list(key_cols), how="left_semi"
                )
                parts.append(_project(retracted, "delete", v))
        else:
            raise ValueError(
                f"snaptable {path}: unknown operation {op!r} at snapshot {v}"
            )
    if not parts:
        empty = StructType.fromJson(json.loads(_load_snapshot(path, head)["schema"]))
        return _project(spark.createDataFrame([], empty), "insert", 0).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rollback(path: str, snapshot_id: int) -> int:
    """Roll the table back to `snapshot_id`'s state by committing a NEW
    snapshot that republishes its manifest, schema, partition spec, and
    delete-file list — Iceberg's rollback: history is never rewritten
    (the bad snapshots stay time-travelable until expire()), the head
    simply moves past them. The bad commits' data files stay on disk
    but unreferenced by the new head, so a later expire() reclaims
    them. Fails with ConflictError if anything commits concurrently
    (require_parent): rolling back over an unseen commit would silently
    drop it."""
    head = current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: rollback on missing table")
    if not os.path.exists(_snap_path(path, snapshot_id)):
        raise ValueError(
            f"snaptable {path}: snapshot {snapshot_id} does not exist "
            "(expired or never committed)"
        )
    snap = _load_snapshot(path, snapshot_id)
    entries = [dict(e) for e in _load_manifest(path, snapshot_id)]
    for e in entries:
        # legacy entries (pre-seq tables) must NOT be stamped with the
        # rollback's own version — that would detach them from any
        # delete files the target snapshot still owes
        e.setdefault("seq", 0)
    return _commit(
        path,
        entries,
        "rollback",
        snap["stats_cols"],
        snap["schema"],
        False,
        require_parent=head,
        partition_spec=snap.get("partition_spec"),
        partition_spec_history=snap.get("partition_spec_history"),
        delete_files=list(snap.get("delete_files") or []),
        extra={"rolled_back_to": snapshot_id},
    )


def snapshots_df(spark: SparkSession, path: str):
    """The snapshot log as a DataFrame — Iceberg's `table.snapshots`
    metadata table: one row per live snapshot with its operation,
    lineage, and size accounting (plus outstanding equality-delete
    files). The audit surface for 'who committed what, when' on a
    shared crawl table."""
    rows = [
        (
            s["version"],
            s.get("parent"),
            s["operation"],
            s.get("added_files", 0),
            s.get("total_files", 0),
            s.get("total_rows", 0),
            len(s.get("delete_files") or []),
            sum(d["rows"] for d in s.get("delete_files") or []),
            float(s.get("committed_at", 0.0)),
        )
        for s in snapshots(path)
    ]
    return spark.createDataFrame(
        rows,
        "version long, parent long, operation string, added_files long, "
        "total_files long, total_rows long, delete_files long, "
        "delete_rows long, committed_at double",
    )


def manifest_df(spark: SparkSession, path: str, snapshot_id: int | None = None):
    """The manifest as a DataFrame — the cluster-side planning seam for
    manifests too large to prune on the driver."""
    files, _ = _files_for(path, snapshot_id)
    return spark.createDataFrame(
        [(e["path"], e["rows"], json.dumps(e["stats"])) for e in files],
        "path string, rows long, stats string",
    )


# ---------------------------------------------------------------------------
# named refs (tags) + write-audit-publish staging
#
# Iceberg's two collaboration features this table was still missing:
# TAGS (immutable named refs with retention protection — pin "the
# corpus release we trained on" so expire() can never reap it) and
# WAP (write-audit-publish: land a crawl wave as a STAGED snapshot
# outside the main lineage, run quality gates against head+stage, then
# publish atomically via cherry-pick — Iceberg's wap.id workflow).


_REF_NAME_OK = None  # compiled lazily (re import kept out of module scope)


def _check_ref_name(name: str) -> None:
    global _REF_NAME_OK
    if _REF_NAME_OK is None:
        import re

        _REF_NAME_OK = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")
    if not _REF_NAME_OK.match(name):
        raise ValueError(f"snaptable ref name {name!r}: use [A-Za-z0-9._-]")


def _tag_path(path: str, name: str) -> str:
    return os.path.join(_meta_dir(path), f"tag-{name}.json")


def tag(path: str, name: str, snapshot_id: int | None = None) -> int:
    """Create an IMMUTABLE named ref to a snapshot (default: head).
    Published via the same tmp+link pattern as snapshots, so creation
    is atomic and exclusive — two racers for the same name get exactly
    one winner. A tagged snapshot (its metadata, manifest, and data
    files) survives expire() regardless of `keep_from`; reads address
    it as `read(..., ref=name)`. Re-tagging an existing name raises:
    tags never move (Iceberg tag semantics) — drop_tag() first."""
    _check_ref_name(name)
    v = snapshot_id if snapshot_id is not None else current_version(path)
    if v < 1 or not os.path.exists(_snap_path(path, v)):
        raise ValueError(f"snaptable {path}: cannot tag snapshot {v}")
    dst = _tag_path(path, name)
    tmp = dst + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump({"name": name, "at": v, "created_at": time.time()}, f)
    try:
        os.link(tmp, dst)
    except FileExistsError:
        raise ValueError(
            f"snaptable {path}: tag {name!r} already exists "
            f"(at snapshot {tags(path)[name]}) — tags are immutable"
        )
    finally:
        _unlink_quiet(tmp)
    return v


def drop_tag(path: str, name: str) -> None:
    """Remove a tag; the snapshot it pinned becomes expirable again."""
    p = _tag_path(path, name)
    if not os.path.exists(p):
        raise ValueError(f"snaptable {path}: no tag {name!r}")
    os.unlink(p)


def tags(path: str) -> dict[str, int]:
    """All tags as {name: snapshot version}."""
    meta = _meta_dir(path)
    out = {}
    if not os.path.isdir(meta):
        return out
    for fname in os.listdir(meta):
        if fname.startswith("tag-") and fname.endswith(".json"):
            try:
                with open(os.path.join(meta, fname)) as f:
                    t = json.load(f)
            except FileNotFoundError:
                continue  # concurrently dropped between listdir and open
            out[t["name"]] = t["at"]
    return out


def resolve_ref(path: str, ref: str) -> int:
    """Tag name -> snapshot version."""
    t = tags(path)
    if ref not in t:
        raise ValueError(f"snaptable {path}: unknown ref {ref!r}")
    return t[ref]


# --- write-audit-publish ---------------------------------------------------


def _staged_path(path: str, staged_id: str) -> str:
    return os.path.join(_meta_dir(path), f"staged-{staged_id}.json")


def _load_staged(path: str, staged_id: str) -> dict:
    p = _staged_path(path, staged_id)
    if not os.path.exists(p):
        raise ValueError(
            f"snaptable {path}: no staged snapshot {staged_id!r} "
            "(published, dropped, or never staged)"
        )
    with open(p) as f:
        return json.load(f)


def stage_append(
    spark: SparkSession, path: str, df: DataFrame, wap_id: str | None = None
) -> str:
    """Write `df`'s data files and stats like append(), but commit
    NOTHING to the table lineage: the result is a STAGED snapshot
    (metadata/staged-{id}.json) invisible to every read path — head,
    time travel, incremental, changelog, and the streaming source all
    ignore it. Audit it with read_staged(); make it real with
    publish_staged(); discard it with drop_staged(). This is Iceberg's
    write-audit-publish: the crawl wave lands at full write throughput,
    quality gates run against exactly what the table WOULD become, and
    the publish is a pure metadata commit. Returns the staged id
    (`wap_id` if given — O_EXCL-exclusive, so a duplicate id raises)."""
    head = current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: stage_append to missing table")
    snap = _load_snapshot(path, head)
    _check_additive(path, snap, df, "stage_append")
    staged_id = wap_id if wap_id is not None else uuid.uuid4().hex[:12]
    _check_ref_name(staged_id)
    spec = snap.get("partition_spec")
    sub = _write_data(df, path, spec)
    entries = _collect_file_stats(spark, sub, snap["stats_cols"], spec)
    dst = _staged_path(path, staged_id)
    tmp = dst + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "id": staged_id,
                "operation": "stage-append",
                "entries": entries,
                "schema": df.schema.json(),
                "partition_spec": spec,
                "based_on": head,
                "created_at": time.time(),
            },
            f,
        )
    try:
        os.link(tmp, dst)
    except FileExistsError:
        raise ValueError(
            f"snaptable {path}: staged id {staged_id!r} already exists"
        )
    finally:
        _unlink_quiet(tmp)
    return staged_id


def _staged_full(path: str) -> list[dict]:
    """Every staged snapshot's FULL metadata (entries included), read
    once per file; a stage published or dropped between listdir and
    open is simply skipped."""
    meta = _meta_dir(path)
    out = []
    if not os.path.isdir(meta):
        return out
    for fname in sorted(os.listdir(meta)):
        if fname.startswith("staged-") and fname.endswith(".json"):
            try:
                with open(os.path.join(meta, fname)) as f:
                    out.append(json.load(f))
            except FileNotFoundError:
                continue
    return out


def staged(path: str) -> list[dict]:
    """All staged (unpublished) snapshots, metadata only."""
    return [
        {
            "id": s["id"],
            "based_on": s["based_on"],
            "files": len(s["entries"]),
            "rows": sum(e["rows"] for e in s["entries"]),
            "created_at": s["created_at"],
        }
        for s in _staged_full(path)
    ]


def read_staged(
    spark: SparkSession, path: str, staged_id: str
) -> DataFrame:
    """The AUDIT view: current head PLUS the staged rows — exactly what
    the table becomes if publish_staged() runs now. Outstanding
    equality deletes apply to the head side only (staged rows publish
    with a fresh sequence number, so deletes never mask them). Quality
    gates (row counts, dedup rates, language mix) run against this
    frame before anything is committed."""
    st = _load_staged(path, staged_id)
    from pyspark.sql.types import StructType

    head_df = read(spark, path)
    schema = StructType.fromJson(json.loads(st["schema"]))
    stage_df = _read_with_deletes(spark, path, st["entries"], schema, [])
    return head_df.unionByName(stage_df, allowMissingColumns=True)


def publish_staged(spark: SparkSession, path: str, staged_id: str) -> int:
    """CHERRY-PICK the staged snapshot onto the CURRENT head as a
    normal append commit — a pure metadata operation (the data files
    were written at stage time; no rows move). Commits that landed
    after staging are preserved: the staged entries are re-applied on
    whatever the head is now, exactly like Iceberg's cherrypick of a
    wap.id snapshot. Fences: the table's partition spec must be
    unchanged since staging (the staged files' layout followed it),
    and the head schema must still be satisfied by the staged schema
    (additive evolution that landed meanwhile makes the stage stale —
    re-stage). The staged metadata is consumed on success; do not race
    publish_staged and drop_staged for the same id.

    Crash-safe and retryable: every publish records its wap_id in the
    snapshot, so a retry after a crash between the commit and the
    metadata unlink finds the already-published snapshot, finishes the
    cleanup, and returns its version instead of appending the wave a
    second time (Iceberg refuses a second cherrypick of one wap.id).
    A commit landing DURING the publish fails the require_parent fence
    (the spec/schema fences were judged against the pre-commit head;
    retrying blindly could publish under a reverted spec/schema) —
    re-run publish_staged and it re-fences against the new head."""
    st = _load_staged(path, staged_id)
    head = current_version(path)
    for s in snapshots(path):
        if s.get("wap_id") == staged_id:
            _unlink_quiet(_staged_path(path, staged_id))
            return s["version"]
    snap = _load_snapshot(path, head)
    if (snap.get("partition_spec") or None) != (st.get("partition_spec") or None):
        raise ConflictError(
            f"snaptable {path}: partition spec changed since "
            f"{staged_id!r} was staged — the staged files follow the "
            "old layout; drop and re-stage"
        )
    from pyspark.sql.types import StructType

    old = StructType.fromJson(json.loads(snap["schema"]))
    staged_fields = {
        f.name: f.dataType
        for f in StructType.fromJson(json.loads(st["schema"])).fields
    }
    for f in old.fields:
        if f.name not in staged_fields or staged_fields[f.name] != f.dataType:
            raise ConflictError(
                f"snaptable {path}: head schema evolved past staged "
                f"{staged_id!r} (column {f.name!r}) — drop and re-stage"
            )
    entries = [dict(e) for e in st["entries"]]  # unstamped: seq = commit v
    v = _commit(
        path,
        entries,
        "append",
        snap["stats_cols"],
        st["schema"],
        True,
        require_parent=head,
        extra={"wap_id": staged_id},
        partition_spec=snap.get("partition_spec"),
        partition_spec_history=snap.get("partition_spec_history"),
    )
    _unlink_quiet(_staged_path(path, staged_id))
    return v


def drop_staged(path: str, staged_id: str) -> int:
    """Discard a staged snapshot: unlink its metadata FIRST (so a later
    publish_staged finds nothing), then delete its data files — they
    are referenced by no committed snapshot by construction. Returns
    the number of data files removed."""
    st = _load_staged(path, staged_id)
    os.unlink(_staged_path(path, staged_id))
    removed = 0
    for e in st["entries"]:
        p = os.path.join(path, e["path"])
        if os.path.exists(p):
            os.remove(p)
            removed += 1
    return removed


def partitions_df(spark: SparkSession, path: str, snapshot_id: int | None = None):
    """Per-partition file/row accounting — Iceberg's `table.partitions`
    metadata table, the skew dashboard for a hidden-partitioned crawl
    table (which buckets are hot, which day directories need
    compact_small). Unpartitioned tables return one row with
    partition='{}'. The partition tuple is emitted as a JSON string so
    the schema is stable across specs and spec evolution."""
    files, _ = _files_for(path, snapshot_id)
    agg: dict[str, list[int]] = {}
    for e in files:
        key = json.dumps(e.get("partition") or {}, sort_keys=True)
        a = agg.setdefault(key, [0, 0, 0])
        a[0] += 1
        a[1] += e["rows"]
        try:
            a[2] += os.path.getsize(os.path.join(path, e["path"]))
        except OSError:
            pass
    return spark.createDataFrame(
        [(k, v[0], v[1], v[2]) for k, v in sorted(agg.items())],
        "partition string, file_count long, row_count long, bytes long",
    )


# ---------------------------------------------------------------------------
# table maintenance: in-place adoption + orphan-file GC


def add_files(
    spark: SparkSession,
    path: str,
    files: str | list[str],
    extra: dict | None = None,
) -> int:
    """Adopt EXISTING parquet files into the table IN PLACE — Iceberg's
    add_files / migrate. A 100 TB corpus already sitting in parquet
    must not be rewritten to become a table: this registers the files
    where they are (absolute paths in the manifest), paying ONE
    distributed stats job and a metadata commit. `files` is a list of
    parquet file paths or a directory (recursed). Semantics:

    - The files' schema must match the table schema EXACTLY by name and
      type (extra or missing columns raise — adopting mis-shaped files
      would corrupt every read; evolve the table first, or fix the
      files).
    - Adopted entries carry no partition tuple, so hidden-partition
      pruning never drops them (conservative; stats pruning still
      applies). A later compact() rewrites them into the table's own
      layout.
    - Adopted files stay OUTSIDE the table's ownership boundary:
      expire() and remove_orphans() never delete files outside the
      table root, so retiring the originals is the external owner's
      job (run compact() first to rewrite their rows into table-owned
      files).
    - Re-adopting a path already in the current manifest raises —
      double-counted rows forever would be silent corruption."""
    head = current_version(path)
    if head == 0:
        raise ValueError(f"snaptable {path}: add_files to missing table")
    if isinstance(files, str):
        root = files
        files = sorted(
            os.path.join(dirpath, n)
            for dirpath, _, names in os.walk(root)
            for n in names
            if n.endswith(".parquet")
        )
        if not files:
            raise ValueError(f"snaptable add_files: no parquet under {root}")
    files = [os.path.abspath(f) for f in files]
    table_root = os.path.abspath(path) + os.sep
    for f in files:
        if not os.path.isfile(f):
            raise ValueError(f"snaptable add_files: {f} is not a file")
        if f.startswith(table_root):
            # the table already OWNS everything under its root: either
            # the file is committed (adopting it would double-count —
            # manifest paths are table-relative, so a path check alone
            # cannot prove otherwise) or it is an orphan that
            # remove_orphans() would later delete out from under the
            # manifest's absolute alias
            raise ValueError(
                f"snaptable add_files: {f} is inside the table "
                "directory — adopt only external files"
            )
    snap = _load_snapshot(path, head)
    from pyspark.sql.types import StructType

    # per-file footer check: spark.read.parquet infers from a sampled
    # footer, so one mis-typed file in the set could slip past a
    # whole-set comparison and corrupt reads later. O(files) driver-side
    # footer reads — the cost Iceberg's add_files pays too.
    import pyarrow.parquet as pq

    first = pq.read_schema(files[0])
    for f in files[1:]:
        if not pq.read_schema(f).equals(first):
            raise ValueError(
                f"snaptable add_files: {f} schema differs from "
                f"{files[0]} — all adopted files must be identically "
                "typed"
            )
    table_schema = StructType.fromJson(json.loads(snap["schema"]))
    incoming = {
        f.name: f.dataType
        for f in spark.read.parquet(files[0]).schema.fields
    }
    want = {f.name: f.dataType for f in table_schema.fields}
    if set(incoming) != set(want) or any(
        incoming[n] != want[n] for n in want
    ):
        raise ValueError(
            f"snaptable add_files: file schema {sorted(incoming)} does "
            f"not match table schema {sorted(want)} exactly (by name "
            "and type) — adopt-in-place cannot reshape files"
        )
    existing = {
        os.path.abspath(os.path.join(path, e["path"]))
        for e in _load_manifest(path, head)
    }
    dup = [f for f in files if f in existing]
    if dup:
        raise ValueError(
            f"snaptable add_files: already in the table: {dup[:3]}"
            + ("..." if len(dup) > 3 else "")
        )
    entries = _collect_file_stats(spark, files, snap["stats_cols"])
    return _commit(
        path,
        entries,
        "append",
        snap["stats_cols"],
        snap["schema"],
        True,
        # require_parent: the duplicate check above judged THIS head's
        # manifest; racing adopters of the same files would otherwise
        # both pass it and double-count every row (re-plan and retry,
        # like every other plan-validated commit)
        require_parent=head,
        extra={**(extra or {}), "adopted_files": len(entries)},
        partition_spec=snap.get("partition_spec"),
        partition_spec_history=snap.get("partition_spec_history"),
    )


def remove_orphans(path: str, older_than_s: float = 86400.0) -> dict:
    """Delete files under the table's own data directory that NO live
    snapshot, delete list, or staged (WAP) snapshot references —
    Iceberg's remove_orphan_files. Crashed or race-losing writers leave
    data files that were never committed: invisible to every reader,
    but never reclaimed by expire() (which only follows manifests).
    The min-age guard (default 24 h) protects in-flight writers that
    have written data but not yet committed — the same rule Iceberg
    applies. Returns deletion accounting."""
    head = current_version(path)
    referenced: set[str] = set()
    for v in range(1, head + 1):
        if not os.path.exists(_snap_path(path, v)):
            continue
        referenced |= {e["path"] for e in _load_manifest(path, v)}
        referenced |= {
            d["path"]
            for d in _load_snapshot(path, v).get("delete_files") or []
        }
    for s in _staged_full(path):
        referenced |= {e["path"] for e in s["entries"]}
    referenced |= _external_referenced(path)
    data_root = os.path.join(path, _DATA)
    removed = 0
    now = time.time()
    if os.path.isdir(data_root):
        for dirpath, _, names in os.walk(data_root, topdown=False):
            for n in names:
                full = os.path.join(dirpath, n)
                rel = os.path.relpath(full, path)
                if rel in referenced:
                    continue
                try:
                    if now - os.path.getmtime(full) > older_than_s:
                        os.remove(full)
                        removed += 1
                except FileNotFoundError:
                    pass
            try:  # reap directories the removals emptied
                if dirpath != data_root and not os.listdir(dirpath):
                    os.rmdir(dirpath)
            except OSError:
                pass
    return {"removed_orphans": removed, "referenced": len(referenced)}


# ---------------------------------------------------------------------------
# writable branches + fast-forward (the last Iceberg ref feature)
#
# A branch is a CHILD TABLE rooted at {path}/metadata/branches/{name}:
# its first snapshot replicates the fork's manifest with data paths
# made ABSOLUTE (shared with the parent, zero copies), and its version
# counter is SEEDED AT THE FORK VERSION, so sequence numbers continue
# above the fork and every sequence comparison (equality deletes vs
# fork-era files) stays correct across the fork boundary. Because the
# branch is a real table directory, the ENTIRE surface works on it
# unmodified — append, delete_keys, merge_into, compact, WAP staging,
# tags, time travel, metadata tables — via branch_root(). Publishing
# is fast-forward only (the Iceberg rule): main must still be at the
# fork; the branch's commits are adopted into main ONE-TO-ONE at the
# same version numbers (history, CDC, and incremental consumers see
# the branch's commits exactly as if they had happened on main).


def _branch_root(path: str, name: str) -> str:
    _check_ref_name(name)
    return os.path.join(path, _META, "branches", name)


def branch_root(path: str, name: str) -> str:
    """The branch's table root — pass it to any snaptable function to
    operate on the branch."""
    root = _branch_root(path, name)
    if not os.path.isdir(os.path.join(root, _META)):
        raise ValueError(f"snaptable {path}: no branch {name!r}")
    return root


def branch_create(
    path: str, name: str, from_snapshot: int | None = None
) -> str:
    """Create branch `name` forked at `from_snapshot` (default: head).
    Pure metadata — the fork manifest is replicated with absolutized
    shared paths; no data moves. Returns the branch root."""
    fork = (
        from_snapshot
        if from_snapshot is not None
        else current_version(path)
    )
    if fork < 1 or not os.path.exists(_snap_path(path, fork)):
        raise ValueError(f"snaptable {path}: cannot branch at {fork}")
    snap = _load_snapshot(path, fork)

    def _absolutize(p: str) -> str:
        return p if os.path.isabs(p) else os.path.abspath(os.path.join(path, p))

    entries = [
        {**e, "path": _absolutize(e["path"])}
        for e in _load_manifest(path, fork)
    ]
    dels = [
        {**d, "path": _absolutize(d["path"])}
        for d in snap.get("delete_files") or []
    ]
    root = _branch_root(path, name)
    if os.path.isdir(root) and not os.path.isdir(os.path.join(root, _META)):
        # a dropped-but-fast-forwarded branch left its data directory
        # behind because MAIN references it; a recreated branch would
        # inherit files none of its snapshots reference and its
        # remove_orphans could reclaim them out from under main
        raise ValueError(
            f"snaptable {path}: branch name {name!r} was dropped after "
            "a fast-forward and main still references its files — "
            "pick a new name (or compact main first, then expire)"
        )
    os.makedirs(os.path.join(root, _META), exist_ok=True)
    bmeta = os.path.join(root, _META, "branchmeta.json")
    btmp = bmeta + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(btmp, "w") as f:
        json.dump({"name": name, "fork": fork, "created_at": time.time()}, f)
    try:
        os.link(btmp, bmeta)  # O_EXCL existence gate: one creator wins
    except FileExistsError:
        raise ValueError(f"snaptable {path}: branch {name!r} already exists")
    finally:
        _unlink_quiet(btmp)
    manifest_rel = os.path.join(
        _META, f"manifest-{fork}-{uuid.uuid4().hex[:8]}.json"
    )
    with open(os.path.join(root, manifest_rel), "w") as f:
        json.dump({"files": entries}, f)
    bsnap = {
        "version": fork,  # seeds the branch counter: seqs continue
        "parent": None,   # above the fork, so cross-fork delete
        "operation": "branch-fork",  # sequencing stays correct
        "manifest": manifest_rel,
        "stats_cols": snap["stats_cols"],
        "partition_spec": snap.get("partition_spec"),
        "partition_spec_history": snap.get("partition_spec_history"),
        "delete_files": dels or None,
        "schema": snap["schema"],
        "added_files": 0,
        "total_files": len(entries),
        "total_rows": sum(e["rows"] for e in entries),
        "committed_at": time.time(),
        "fork": fork,
    }
    dst = _snap_path(root, fork)
    tmp = dst + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump(bsnap, f)
    try:
        os.link(tmp, dst)
    except FileExistsError:
        raise ValueError(f"snaptable {path}: branch {name!r} already exists")
    finally:
        _unlink_quiet(tmp)
    return root


def _branch_fork(root: str) -> int:
    """The branch's fork version — from the durable branchmeta record;
    legacy branches (pre-branchmeta) fall back to the first surviving
    snapshot's fork field."""
    try:
        with open(os.path.join(root, _META, "branchmeta.json")) as f:
            return int(json.load(f)["fork"])
    except FileNotFoundError:
        pass
    for v in range(1, current_version(root) + 1):
        if os.path.exists(_snap_path(root, v)):
            return _load_snapshot(root, v).get("fork", v)
    raise ValueError(f"snaptable branch at {root}: no snapshots")


def branches(path: str) -> dict[str, dict]:
    """All branches as {name: {fork, head}}."""
    bdir = os.path.join(path, _META, "branches")
    out = {}
    if not os.path.isdir(bdir):
        return out
    for name in sorted(os.listdir(bdir)):
        root = os.path.join(bdir, name)
        if not os.path.isdir(os.path.join(root, _META)):
            continue
        out[name] = {"fork": _branch_fork(root), "head": current_version(root)}
    return out


def fast_forward(path: str, name: str) -> int:
    """Publish branch `name` into main by ADOPTING its commits
    one-to-one at the same version numbers — Iceberg's fast-forward:
    main must not have moved past the fork (ConflictError otherwise;
    rebase by re-branching). Pure metadata; entry paths re-relativize
    against the main root (branch-written files stay under the branch
    directory and main references them there — a later compact folds
    them into main's own layout). Idempotent/resumable: a main
    snapshot already adopted from this branch at the same version is
    skipped, so a crash or a lost race mid-forward finishes on
    retry."""
    root = branch_root(path, name)
    bhead = current_version(root)
    fork = _branch_fork(root)
    main_head = current_version(path)
    for v in range(fork + 1, bhead + 1):
        if v <= main_head:
            try:
                adopted = _load_snapshot(path, v)
            except FileNotFoundError:
                continue  # adopted then expired: already committed
            if adopted.get("fast_forwarded_from") != name:
                raise ConflictError(
                    f"snaptable {path}: cannot fast-forward branch "
                    f"{name!r} — main moved past the fork (snapshot {v} "
                    f"is a {adopted['operation']} not adopted from this "
                    "branch); re-branch from the new head and re-apply"
                )
            continue  # already adopted (resume after crash/race)
        try:
            bsnap = _load_snapshot(root, v)
        except FileNotFoundError:
            raise ValueError(
                f"snaptable {path}: branch {name!r} snapshot {v} was "
                "expired before it was fast-forwarded — the branch "
                "history is no longer adoptable"
            ) from None

        def _rerel(p: str) -> str:
            ap = p if os.path.isabs(p) else os.path.abspath(
                os.path.join(root, p)
            )
            table_root = os.path.abspath(path) + os.sep
            return os.path.relpath(ap, path) if ap.startswith(table_root) else ap

        entries = [
            {**e, "path": _rerel(e["path"])} for e in _load_manifest(root, v)
        ]
        dels = [
            {**d, "path": _rerel(d["path"])}
            for d in bsnap.get("delete_files") or []
        ]
        manifest_rel = os.path.join(
            _META, f"manifest-{v}-{uuid.uuid4().hex[:8]}.json"
        )
        with open(os.path.join(path, manifest_rel), "w") as f:
            json.dump({"files": entries}, f)
        snap2 = {
            **bsnap,
            "parent": v - 1,
            "manifest": manifest_rel,
            "delete_files": dels or None,
            "fast_forwarded_from": name,
        }
        snap2.pop("fork", None)
        dst = _snap_path(path, v)
        tmp = dst + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump(snap2, f)
        try:
            os.link(tmp, dst)
        except FileExistsError:
            # a concurrent commit took this version: if it is our own
            # adoption (racing forwarders), continue; else conflict
            try:
                adopted = _load_snapshot(path, v)
            except FileNotFoundError:
                continue  # racing forwarder committed it, then expired
            if adopted.get("fast_forwarded_from") != name:
                raise ConflictError(
                    f"snaptable {path}: fast-forward of {name!r} lost "
                    f"version {v} to a concurrent {adopted['operation']} "
                    "commit — re-branch and re-apply"
                )
        finally:
            _unlink_quiet(tmp)
    return bhead


def drop_branch(path: str, name: str) -> dict:
    """Delete a branch. Branch-written data files are removed ONLY if
    no live main snapshot references them (i.e. the branch was never
    fast-forwarded); after a fast-forward the metadata goes but the
    data stays — main owns it now."""
    import shutil

    root = branch_root(path, name)
    absroot = os.path.abspath(root) + os.sep
    referenced = any(
        p.startswith(absroot)
        for p in _family_referenced_abs(_top_root(path), skip_subtree=root)
    )
    if referenced:
        shutil.rmtree(os.path.join(root, _META), ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
    return {"data_kept": referenced}


# ---------------------------------------------------------------------------
# cross-root liveness (branches share files across table roots)


def _top_root(path: str) -> str:
    """Outermost table root of the branch family: walk up across
    metadata/branches/{name} layers."""
    root = os.path.abspath(path)
    while True:
        up = os.path.dirname(root)
        up2 = os.path.dirname(up)
        up3 = os.path.dirname(up2)
        if (
            os.path.basename(up) == "branches"
            and os.path.basename(up2) == _META
            and os.path.isdir(os.path.join(up3, _META))
        ):
            root = up3
        else:
            return root


def _family_referenced_abs(root: str, skip_subtree: str | None = None) -> set[str]:
    """Every data/delete/staged path referenced by this root and ALL of
    its branches recursively, as absolute paths. `skip_subtree` omits
    one root's own references AND its descendants (the caller's own
    contributions, or a branch being dropped)."""
    absroot = os.path.abspath(root)
    if skip_subtree is not None and absroot == os.path.abspath(skip_subtree):
        return set()
    out: set[str] = set()

    def _abs(p: str) -> str:
        return p if os.path.isabs(p) else os.path.join(absroot, p)

    for v in range(1, current_version(root) + 1):
        if not os.path.exists(_snap_path(root, v)):
            continue
        try:
            snap = _load_snapshot(root, v)
            out |= {_abs(e["path"]) for e in _load_manifest(root, v)}
        except FileNotFoundError:
            continue  # concurrently expired
        out |= {_abs(d["path"]) for d in snap.get("delete_files") or []}
    for s in _staged_full(root):
        out |= {_abs(e["path"]) for e in s["entries"]}
    bdir = os.path.join(root, _META, "branches")
    if os.path.isdir(bdir):
        for name in sorted(os.listdir(bdir)):
            sub = os.path.join(bdir, name)
            if os.path.isdir(os.path.join(sub, _META)):
                out |= _family_referenced_abs(sub, skip_subtree)
    return out


def _external_referenced(path: str) -> set[str]:
    """Paths that OTHER roots of this table family (the parent chain,
    sibling branches, this root's own branches) still reference,
    re-addressed for THIS root: relative when under it, absolute
    otherwise. expire()/remove_orphans() treat these as live so no
    root can reclaim a file another root still reads — the cross-root
    twin of Iceberg's branch-aware expire_snapshots."""
    absroot = os.path.abspath(path)
    fam = _family_referenced_abs(_top_root(path), skip_subtree=absroot)
    # ...but this root's own BRANCHES must still protect (skip_subtree
    # removed them together with the root itself): add them back
    bdir = os.path.join(path, _META, "branches")
    if os.path.isdir(bdir):
        for name in sorted(os.listdir(bdir)):
            sub = os.path.join(bdir, name)
            if os.path.isdir(os.path.join(sub, _META)):
                fam |= _family_referenced_abs(sub)
    out = set()
    for ap in fam:
        if ap.startswith(absroot + os.sep):
            out.add(os.path.relpath(ap, absroot))
        else:
            out.add(ap)
    return out
