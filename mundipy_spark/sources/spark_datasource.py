"""`spark.read.format("snaptable")` — the snapshot-manifest table
(sources/snaptable.py) exposed through Spark 4's Python Data Source
API, so the engine's Iceberg-role table plugs into the PLANNER the way
a real catalog format does: schema comes from the table, scan-option
predicates prune at the manifest before a single byte is opened, every
surviving data file becomes one InputPartition (scan parallelism =
file count, no driver-side collect of row data), and
`spark.readStream.format("snaptable")` turns committed snapshots into
exactly-once micro-batches (offset = snapshot version, the Iceberg
streaming-read shape).

Why a Data Source and not just `snaptable.scan()`: scan() is a library
call — callers must know this repo. The registered format makes the
table reachable from any DataFrame/stream surface (`.load()`,
`readStream`, and SQL via `df.createOrReplaceTempView`) including code
that never imports mundipy_spark, which is what "a user of the
reference could switch" means for the storage layer. (Catalog
`CREATE TABLE ... USING snaptable` is NOT supported: Spark 4.1 hands a
Python data source EMPTY options when scanning a catalog table — the
path arrives at schema() time but not reader() time — so only
path-addressed reads work; register a temp view for SQL.)

Scale shape (10^12 docs):
- planning is driver-side metadata only (`plan_scan`): the
  `predicates` option prunes via per-file min/max stats +
  hidden-partition transforms; the executor never sees pruned files;
- one file = one InputPartition; reads are Arrow-native
  (`pyarrow.parquet` -> RecordBatch pass-through, zero row-at-a-time
  Python);
- merge-on-read equality deletes apply per partition: each task
  anti-joins its file against the (delta-sized by contract) delete
  key set, so the table side never shuffles — the executor-local twin
  of `_read_with_deletes`'s broadcast anti-join;
- streaming offsets are snapshot versions: `latestOffset` is one
  directory stat, micro-batch planning is a manifest set-difference,
  and replay after a crash re-reads exactly the committed range
  (offsets live in Spark's checkpoint, snapshots are immutable).

Predicate pruning is an EXPLICIT option (`predicates`), not automatic
`pushFilters`, after a measured dead end: Spark 4.1's Python-source
filter pushdown caches the planned scan (read function + partitions)
on the shared relation, so `df.filter(doc_id == 5).count()` followed
by `df.collect()` on the SAME DataFrame reuses the '=5'-pruned
partition list for the filterless collect — silent row loss (repro:
100-row 4-file table returned 25 rows; returning every filter as
unsupported does not help because the cached partitions, not the
filters, are the poison). Until the scan is re-planned per query,
pruning must key off state that is CONSTANT for the relation — the
`predicates` option is exactly that, and `read()` re-applies it
row-wise so results equal `snaptable.scan()` with the same predicates
regardless of stats quality.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# snapshot operations a streaming read cannot express as pure appends
# (same fence as snaptable.read_incremental): files-rewritten ops would
# re-deliver already-consumed rows, eq-delete retracts rows a pure
# append stream cannot retract.
_REWRITE_OPS = ("replace", "delete", "merge", "rollback")
_RETRACT_OPS = ("eq-delete",)


def _table_path(options) -> str:
    path = options.get("path")
    if not path:
        raise ValueError(
            "snaptable data source: pass the table path via .load(path) "
            "or .option('path', ...)"
        )
    # Spark normalizes .load() paths to URIs (file:/tmp/x); snaptable
    # metadata IO is plain-path (os.path / open), so unwrap local URIs
    if path.startswith("file:"):
        from urllib.parse import unquote, urlparse

        path = unquote(urlparse(path).path)
    return path


def _arrow_batches(abs_path: str, schema: StructType, deletes: Sequence[dict]):
    """Read one data file as Arrow batches in the TABLE schema: missing
    columns (additive evolution) null-fill, merge-on-read delete keys
    anti-join out, and every batch casts to the exact Arrow schema
    Spark expects for `schema` (parquet physical types vary by writer).

    Scale shape: the file STREAMS through as row-group-sized batches
    (`iter_batches`) — peak task memory is one batch plus the
    delta-sized delete key tables, never the whole (cluster-sized)
    data file. Deletes apply per batch with pyarrow's vectorized
    left-anti hash join, the executor-local twin of the JVM reader's
    broadcast anti-join (`snaptable._read_with_deletes`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    target_types = {f.name: f.type for f in target}

    # delete key tables load once per task (delta-sized by the
    # delete_keys contract), cast to the table's key types so the
    # anti-join is like-typed
    key_tables: list[tuple[list[str], pa.Table]] = []
    for d in deletes:
        key_cols = list(d["key_cols"])
        parts = [pq.read_table(p, columns=key_cols) for p in d["abs_paths"]]
        kt = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        kt = kt.cast(pa.schema([(c, target_types[c]) for c in key_cols]))
        if kt.num_rows:
            key_tables.append((key_cols, kt))

    pf = pq.ParquetFile(abs_path)
    present = set(pf.schema_arrow.names)
    read_cols = [f.name for f in target if f.name in present]
    for batch in pf.iter_batches(columns=read_cols):
        n = batch.num_rows
        cols = {}
        for field in target:
            if field.name in present:
                cols[field.name] = batch.column(field.name)
            else:  # column added after this file was written: null-fill
                cols[field.name] = pa.nulls(n, type=field.type)
        tbl = pa.table(cols).cast(target)
        for key_cols, kt in key_tables:
            if tbl.num_rows == 0:
                break
            # left-anti hash join; delete files never hold null keys
            # (dropped at delete_keys), so data rows with a null key
            # survive — the JVM anti-join's semantics exactly
            tbl = tbl.join(kt, keys=key_cols, join_type="left anti")
        if tbl.num_rows:
            # join can reorder columns; re-project to the target order
            yield from tbl.select([f.name for f in target]).cast(target).to_batches()


def _delete_specs(path: str, dels: list[dict], file_seq: int) -> list[dict]:
    """Deletes applicable to a data-file entry (seq > file seq), grouped
    by key columns, with absolute paths — the per-partition payload."""
    by_key: dict[tuple, list[str]] = {}
    for d in dels:
        if d.get("seq", 0) > file_seq:
            by_key.setdefault(tuple(d["key_cols"]), []).append(
                os.path.join(path, d["path"])
            )
    return [
        {"key_cols": list(k), "abs_paths": v} for k, v in sorted(by_key.items())
    ]


def _parse_predicates(options) -> list[tuple]:
    """`predicates` option: a JSON list of [col, op, value] triples
    (op in =, <, <=, >, >=), ANDed — the option-string twin of
    snaptable.scan(predicates=...). Constant for the relation, so the
    cached-scan reuse that poisons pushFilters (module docstring) is
    harmless: every query on this DataFrame means the same scan."""
    raw = options.get("predicates")
    if not raw:
        return []
    preds = json.loads(raw)
    out = []
    for p in preds:
        if not (isinstance(p, (list, tuple)) and len(p) == 3):
            raise ValueError(
                f"snaptable predicates option: expected [col, op, value], got {p!r}"
            )
        out.append((str(p[0]), str(p[1]), p[2]))
    return out


def _apply_predicates(tbl, predicates: list[tuple]):
    """Row-level re-application of the pruning predicates (Arrow
    compute, SQL comparison semantics: null never matches), so option
    results match snaptable.scan exactly even if stats mis-prune."""
    import pyarrow.compute as pc

    for col, op, v in predicates:
        c = tbl.column(col)
        mask = {
            "=": pc.equal,
            ">=": pc.greater_equal,
            ">": pc.greater,
            "<=": pc.less_equal,
            "<": pc.less,
        }[op](c, v)
        tbl = tbl.filter(pc.fill_null(mask, False))
    return tbl


def _snapshot_opt(options, path: str) -> int | None:
    """Resolve the batch snapshot address: `snapshot_id` (int) or
    `ref` (tag name, resolved ONCE here on the driver so the whole
    read is pinned to one version even if the tag is dropped and
    recreated mid-query)."""
    snap = options.get("snapshot_id")
    ref = options.get("ref")
    if snap is not None and ref is not None:
        raise ValueError("snaptable: pass snapshot_id OR ref, not both")
    if ref is not None:
        from mundipy_spark.sources import snaptable

        return snaptable.resolve_ref(path, ref)
    return int(snap) if snap is not None else None


class SnaptableBatchReader(DataSourceReader):
    def __init__(self, options, schema: StructType, snapshot_id=None):
        self._path = _table_path(options)
        self._schema = schema
        # a tag-addressed read is resolved ONCE (in schema(), which
        # Spark calls before reader()) and the pinned version passed
        # down — re-resolving here could read a different snapshot
        # than the schema came from if the tag moved in between
        self._snapshot_id = (
            snapshot_id
            if snapshot_id is not None
            else _snapshot_opt(options, self._path)
        )
        self._predicates = _parse_predicates(options)
        # the FULL table schema backs aux columns a pruned read still
        # needs to EVALUATE (predicate columns, MOR delete keys) but
        # not to return — see read()
        from mundipy_spark.sources import snaptable

        head = (
            self._snapshot_id
            if self._snapshot_id is not None
            else snaptable.current_version(self._path)
        )
        self._full_schema = StructType.fromJson(
            json.loads(snaptable._load_snapshot(self._path, head)["schema"])
        )

    def partitions(self) -> list[InputPartition]:
        from mundipy_spark.sources import snaptable

        plan = snaptable.plan_scan(
            self._path, self._predicates or None, self._snapshot_id
        )
        dels = plan["delete_files"]
        return [
            InputPartition(
                {
                    "abs_path": os.path.join(self._path, e["path"]),
                    "deletes": _delete_specs(self._path, dels, e.get("seq", 0)),
                    "predicates": self._predicates,
                }
            )
            for e in plan["entries"]
        ]

    def read(self, partition: InputPartition):
        v = partition.value
        # under a `columns` projection, predicate columns and MOR
        # delete keys may be pruned from the OUTPUT schema yet still
        # needed to evaluate: read target+aux, evaluate, project back
        target_names = [f.name for f in self._schema.fields]
        have = set(target_names)
        aux = []
        for col, _, _ in v["predicates"] or []:
            if col not in have:
                aux.append(col)
                have.add(col)
        for d in v["deletes"]:
            for col in d["key_cols"]:
                if col not in have:
                    aux.append(col)
                    have.add(col)
        if aux:
            full = {f.name: f for f in self._full_schema.fields}
            read_schema = StructType(
                list(self._schema.fields)
                + [
                    type(full[c])(c, full[c].dataType, True, full[c].metadata)
                    for c in aux
                ]
            )
        else:
            read_schema = self._schema
        if not (v["predicates"] or aux):
            # fast path (the snapread regime): batches pass through
            yield from _arrow_batches(v["abs_path"], read_schema, v["deletes"])
            return
        for batch in _arrow_batches(v["abs_path"], read_schema, v["deletes"]):
            import pyarrow as pa

            tbl = pa.table(batch)
            if v["predicates"]:
                tbl = _apply_predicates(tbl, v["predicates"])
            if aux:
                tbl = tbl.select(target_names)
            if tbl.num_rows:
                yield from tbl.to_batches()


class SnaptableStreamReader(DataSourceStreamReader):
    """Micro-batch source over snapshot versions. Offset = the last
    snapshot version fully delivered; batch (start, end] delivers the
    files each append snapshot in the range added (manifest set
    difference, concurrent-committer safe — same derivation as
    read_incremental).

    Non-append snapshots fence the stream by default (the
    read_incremental rule). Opt-outs mirror Iceberg's streaming reader:
    `skip_rewrites=true` crosses compactions/COW-rewrites/rollbacks
    WITHOUT delivering their files (a compaction re-adds rows the
    stream already emitted; skipping is exact for pure compactions,
    and for merge/delete_where it skips the rewritten rows — Iceberg's
    documented streaming-skip-overwrite-snapshots semantics);
    `skip_deletes=true` crosses eq-delete snapshots (retractions are
    not expressible in an append stream; downstream sees rows that
    were later taken down, exactly like Iceberg).

    `max_versions_per_batch=N` rate-limits micro-batches (Iceberg's
    streaming max-files admission control): a backfill from
    'earliest' on a 10^6-snapshot table must not plan ONE batch
    containing the whole table. The Python source API has no
    admission-control hook — latestOffset never sees the committed
    offset, and the JVM calls it BEFORE initialOffset even on a fresh
    query (measured) — so the cap needs a durable base: pass
    `stream_id` (unique per checkpoint, the sink_id twin) and the
    reader persists its planning high-water mark in the table's
    metadata (streamhw-{id}.json, atomic replace, written on every
    partitions() call including WAL replays). latestOffset then
    returns min(head, hw + N). Fresh query: no hw file, base =
    initial_snapshot — the very first backfill batch is capped.
    Restart: base = the persisted mark (== the last planned end), so
    the cap can never regress the offset behind the checkpoint and
    re-deliver rows. Deleting a live stream's hw file re-bases the
    cap at initial_snapshot and CAN regress — leave them alone
    (expire()/remove_orphans never touch them). Trigger.AvailableNow
    latches latestOffset ONCE, so with the cap each invocation
    advances at most N versions then stops — loop availableNow runs
    until drained, or use a processingTime trigger (which drains in
    capped batches)."""

    def __init__(self, options, schema: StructType):
        self._path = _table_path(options)
        self._schema = schema
        self._skip_rewrites = str(options.get("skip_rewrites", "false")).lower() == "true"
        self._skip_deletes = str(options.get("skip_deletes", "false")).lower() == "true"
        mvb = options.get("max_versions_per_batch")
        self._max_versions = int(mvb) if mvb is not None else None
        if self._max_versions is not None and self._max_versions < 1:
            raise ValueError("snaptable stream: max_versions_per_batch >= 1")
        self._stream_id = options.get("stream_id")
        if self._max_versions is not None and not self._stream_id:
            raise ValueError(
                "snaptable stream: max_versions_per_batch needs a "
                "stream_id option (unique per checkpoint) — the rate "
                "limit's high-water mark must survive restarts or the "
                "capped offset could regress behind the checkpoint"
            )
        if self._stream_id:
            from mundipy_spark.sources import snaptable

            snaptable._check_ref_name(self._stream_id)  # fail at setup
        initial = str(options.get("initial_snapshot", "earliest"))
        if initial == "earliest":
            from mundipy_spark.sources import snaptable

            # the oldest LIVE snapshot, not version 0: a table whose
            # early history was expired (or a branch, whose versions
            # start at the fork) has no snapshots below it to deliver,
            # and planning across the gap would error as "expired"
            self._initial = max(
                0, snaptable.earliest_version(self._path) - 1
            )
        elif initial == "latest":
            from mundipy_spark.sources import snaptable

            self._initial = snaptable.current_version(self._path)
        else:
            self._initial = int(initial)

    def _hw_path(self) -> str:
        from mundipy_spark.sources import snaptable

        snaptable._check_ref_name(self._stream_id)
        return os.path.join(
            self._path, "metadata", f"streamhw-{self._stream_id}.json"
        )

    def _hw_load(self) -> int:
        try:
            with open(self._hw_path()) as f:
                return int(json.load(f)["seen"])
        except FileNotFoundError:
            return self._initial  # fresh query: cap from initial
        except (ValueError, KeyError) as e:
            # a corrupt mark must NOT silently re-base the cap at
            # initial — that regresses the offset behind the committed
            # checkpoint and re-delivers rows; fail loudly instead
            raise RuntimeError(
                f"snaptable stream: high-water file {self._hw_path()} "
                "is corrupt — remove the rate limit (or repair the "
                "file with the last committed snapshot version) before "
                "restarting"
            ) from e

    def _hw_store(self, v: int) -> None:
        import uuid as _uuid

        p = self._hw_path()
        tmp = p + f".{_uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump({"seen": v}, f)
        os.replace(tmp, p)  # atomic; single planner process per stream

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        from mundipy_spark.sources import snaptable

        head = snaptable.current_version(self._path)
        if self._max_versions is not None:
            return {"version": min(head, self._hw_load() + self._max_versions)}
        return {"version": head}

    def _added_files(self, start: int, end: int) -> list[str]:
        from mundipy_spark.sources import snaptable

        added: list[str] = []
        try:
            prev = (
                {e["path"] for e in snaptable._load_manifest(self._path, start)}
                if start > 0
                else set()
            )
        except FileNotFoundError:
            if start == snaptable.earliest_version(self._path) - 1:
                # start sits exactly one before where live history
                # begins (an 'earliest' read on an expired-history
                # table, or a branch whose versions start at the
                # fork): the first live snapshot's full state IS the
                # first batch
                prev = set()
            else:
                raise ValueError(
                    f"snaptable stream {self._path}: checkpointed "
                    f"snapshot {start} was expired; the stream cannot "
                    "resume from a reclaimed snapshot — restart with a "
                    "fresh checkpoint (and a retention window longer "
                    "than consumer downtime)"
                ) from None
        for v in range(start + 1, end + 1):
            try:
                snap = snaptable._load_snapshot(self._path, v)
            except FileNotFoundError:
                raise ValueError(
                    f"snaptable stream {self._path}: snapshot {v} in the "
                    f"batch range ({start}, {end}] was expired before the "
                    "stream consumed it — restart with a fresh checkpoint"
                ) from None
            cur = {e["path"] for e in snaptable._load_manifest(self._path, v)}
            op = snap["operation"]
            if op in _REWRITE_OPS and not self._skip_rewrites:
                raise ValueError(
                    f"snaptable stream {self._path}: snapshot {v} is a "
                    f"{op} (rewrite); set skip_rewrites=true to cross it "
                    "(skipped snapshots deliver no rows)"
                )
            if op in _RETRACT_OPS and not self._skip_deletes:
                raise ValueError(
                    f"snaptable stream {self._path}: snapshot {v} is an "
                    f"{op} (retraction); set skip_deletes=true to cross it"
                )
            if op not in _REWRITE_OPS and op not in _RETRACT_OPS:
                added.extend(sorted(cur - prev))
            prev = cur
        return added

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        s, e = int(start["version"]), int(end["version"])
        if self._max_versions is not None:
            # advance the persisted high-water mark from every planned
            # batch — including WAL replays after a restart, which is
            # how the cap recovers without an admission-control API
            hw = max(s, e)
            if hw > self._hw_load():
                self._hw_store(hw)
        if e <= s:
            return []
        return [
            InputPartition(
                {"abs_path": os.path.join(self._path, p), "deletes": []}
            )
            for p in self._added_files(s, e)
        ]

    def read(self, partition: InputPartition):
        v = partition.value
        yield from _arrow_batches(v["abs_path"], self._schema, v["deletes"])

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's streaming checkpoint

    def stop(self) -> None:
        pass


class SnaptableDataSource(DataSource):
    """format("snaptable"). Options:
    - path (or .load(path)): table root
    - snapshot_id (batch): time travel to a committed snapshot
    - ref (batch): time travel to a TAG name (snaptable.tag)
    - predicates (batch): JSON [[col, op, value], ...] — manifest +
      partition pruning, re-applied row-wise (== snaptable.scan)
    - initial_snapshot (stream): 'earliest' (default) | 'latest' | int
    - max_versions_per_batch + stream_id (stream): micro-batch rate
      limit (Iceberg max-files admission control); the stream_id keys
      the persisted high-water mark that keeps the cap restart-safe.
      With Trigger.AvailableNow each run advances at most the cap —
      loop until drained, or use a processingTime trigger
    - skip_rewrites / skip_deletes (stream): cross non-append snapshots
    """

    @classmethod
    def name(cls) -> str:
        return "snaptable"

    def schema(self) -> StructType:
        from mundipy_spark.sources import snaptable

        path = _table_path(self.options)
        snap_opt = _snapshot_opt(self.options, path)
        self._pinned_snapshot = snap_opt  # reused by reader()
        head = (
            snap_opt
            if snap_opt is not None
            else snaptable.current_version(path)
        )
        if head == 0:
            raise ValueError(f"snaptable {path}: no committed snapshot")
        snap = snaptable._load_snapshot(path, head)
        stored = StructType.fromJson(json.loads(snap["schema"]))
        # report every field nullable, like Spark's own parquet scan:
        # the writer's not-null flags don't survive the format, and
        # additive schema evolution null-fills late columns in old
        # files — a non-null claim here would be a lie the planner
        # optimizes on
        out = StructType(
            [
                type(f)(f.name, f.dataType, True, f.metadata)
                for f in stored.fields
            ]
        )
        cols_opt = self.options.get("columns")
        if cols_opt:
            # EXPLICIT projection pushdown, the column twin of the
            # `predicates` option: the Python Data Source API gives a
            # source no requiredSchema hook, so without this every
            # scan decodes every column — ruinous when the table
            # carries a binary html payload next to thin metadata
            # columns. Like `predicates`, the option is relation-
            # constant state, immune to the cached-partitions
            # poisoning that killed automatic pushdown (module
            # docstring). Kept in STORED field order.
            want = json.loads(cols_opt)
            unknown = [c for c in want if c not in {f.name for f in out}]
            if unknown or not want:
                raise ValueError(
                    f"snaptable columns option: unknown columns {unknown}"
                    if unknown
                    else "snaptable columns option: empty list"
                )
            keep = set(want)
            out = StructType([f for f in out.fields if f.name in keep])
        return out

    def reader(self, schema: StructType) -> SnaptableBatchReader:
        return SnaptableBatchReader(
            self.options, schema, getattr(self, "_pinned_snapshot", None)
        )

    def streamReader(self, schema: StructType) -> SnaptableStreamReader:
        return SnaptableStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool):
        return SnaptableBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return SnaptableStreamWriter(self.options, schema)


class _WriteMessage(WriterCommitMessage):
    """Per-task commit message: the manifest entries (table-relative
    path, rows, stats, partition tuple) for each file the task wrote.
    This must be picklable; entries are plain JSON-safe dicts."""

    def __init__(self, entries: list[dict]):
        self.entries = entries


def _naive_utc(v):
    """Normalize a tz-aware datetime to the naive-UTC wall clock the
    library's stats collection records (Spark collect under the
    pinned UTC session returns naive datetimes); other values pass
    through untouched."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def _hive_component(name: str, value) -> str:
    """Directory name for one partition value. Values are NEVER parsed
    back from directory names (the manifest carries the tuple; see the
    session-9 review note in snaptable._stats_rows_to_entries), so the
    encoding only needs to be filesystem-safe and distinct per value.

    Distinctness includes the null sentinel (ADVICE r4): quote() leaves
    `_` verbatim, so the literal string value "__HIVE_DEFAULT_PARTITION__"
    used to collide with None — both tuples computed the same
    part-{task}.parquet path and the second ParquetWriter truncated the
    first. Fix: percent-encode a LEADING underscore of real values.
    quote(safe='') always escapes '%' itself (as %25), so its output
    never contains a literal "%5F" — the rewrite is injective, and no
    non-null value can ever encode to a string starting with '_'."""
    from urllib.parse import quote

    if value is None:
        return f"{name}=__HIVE_DEFAULT_PARTITION__"
    s = quote(str(value), safe="")
    if s.startswith("_"):
        s = "%5F" + s[1:]
    return f"{name}={s}"


class SnaptableBatchWriter(DataSourceArrowWriter):
    """`df.write.format("snaptable").mode("append"|"overwrite")` — the
    WRITE half of the format surface, so code that never imports
    mundipy_spark can land data in the Iceberg-role table.

    Semantics match the library writers exactly:
    - append  -> one `append` snapshot (additive schema evolution
      allowed, same guard as snaptable.append); table must exist.
    - overwrite -> one `replace` snapshot (INSERT OVERWRITE: all prior
      files dropped from the head, outstanding eq-deletes cleared,
      history stays time-travelable); creates the table when missing
      (`stats_cols` / `partition_by` options apply only then).

    Scale + atomicity shape:
    - each task STREAMS its Arrow batches straight into parquet
      (ParquetWriter per partition tuple — peak memory is one batch
      per open tuple), collecting the manifest stats (rows, min/max,
      nulls per stats col) incrementally as it writes — the Iceberg
      writer's inline stats pass, no second read;
    - files land under data/<job-uuid>/ with unique names: invisible
      until the driver's single atomic `_commit`, a crashed/killed job
      leaves only orphans that `remove_orphans` reclaims, and `abort`
      unlinks the reported ones eagerly;
    - hidden-partition tuples are computed per row with the SAME
      `_transform_py` the planner prunes with (exact by construction).
      This is the one Python-per-row spot in the path (a Data Source
      writer cannot run JVM expressions); bulk ingest that needs the
      JVM transform path should call snaptable.append — this writer is
      the interoperability surface, and partition-aligned upstreams
      (the compact_small discipline) see a handful of tuples per task.
    """

    def __init__(self, options, schema: StructType, overwrite: bool):
        from mundipy_spark.sources import snaptable as st

        self._path = _table_path(options)
        self._schema = schema
        self._overwrite = overwrite
        self._job = __import__("uuid").uuid4().hex[:12]
        head = st.current_version(self._path)
        if head == 0:
            if not overwrite:
                raise ValueError(
                    f"snaptable {self._path}: append to missing table — "
                    "create it first (snaptable.create or "
                    "mode('overwrite'))"
                )
            self._creating = True
            self._stats_cols = list(
                json.loads(options.get("stats_cols") or "[]")
            )
            names = {f.name for f in schema.fields}
            bad = [c for c in self._stats_cols if c not in names]
            if bad:
                raise ValueError(
                    f"snaptable writer: stats_cols {bad} not in the "
                    "DataFrame schema"
                )
            pby = options.get("partition_by")
            self._spec = (
                st._parse_partition_by(json.loads(pby), schema)
                if pby
                else None
            )
            self._hist = None
        else:
            snap = st._load_snapshot(self._path, head)
            st._check_additive_schema(
                self._path, snap, schema,
                "overwrite" if overwrite else "append",
            )
            self._creating = False
            self._stats_cols = snap["stats_cols"]
            self._spec = snap.get("partition_spec")
            self._hist = snap.get("partition_spec_history")

    # ---------------------------------------------------------- task side

    def write(self, iterator):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mundipy_spark.sources import snaptable as st

        task_id = __import__("uuid").uuid4().hex[:12]
        spec = self._spec or []
        src_cols = [f["source"] for f in spec]
        writers: dict[tuple, tuple] = {}  # tuple -> (writer, absp, rel, stats)

        def _open(ptuple):
            comps = [
                _hive_component(f["name"], v)
                for f, v in zip(spec, ptuple)
            ]
            rel = os.path.join(
                "data", self._job, *comps, f"part-{task_id}.parquet"
            )
            absp = os.path.join(self._path, rel)
            os.makedirs(os.path.dirname(absp), exist_ok=True)
            return absp, rel

        def _update_stats(state, batch):
            state["rows"] += batch.num_rows
            for c in self._stats_cols:
                col = batch.column(c)
                nulls = col.null_count
                s = state["stats"].setdefault(
                    c, {"min": None, "max": None, "nulls": 0}
                )
                s["nulls"] += nulls
                if nulls < len(col):
                    import pyarrow.compute as pc

                    mm = pc.min_max(col).as_py()
                    mn = st._json_safe(_naive_utc(mm["min"]))
                    mx = st._json_safe(_naive_utc(mm["max"]))
                    s["min"] = mn if s["min"] is None else min(s["min"], mn)
                    s["max"] = mx if s["max"] is None else max(s["max"], mx)

        def _sink(ptuple, batch):
            got = writers.get(ptuple)
            if got is None:
                absp, rel = _open(ptuple)
                w = pq.ParquetWriter(absp, batch.schema)
                got = writers[ptuple] = (
                    w, absp, rel, {"rows": 0, "stats": {}},
                )
            got[0].write_batch(batch)
            _update_stats(got[3], batch)

        for batch in iterator:
            if not spec:
                _sink((), batch)
                continue
            # per-row partition tuples via the SAME transform the
            # planner prunes with
            src = [
                [_naive_utc(v) for v in batch.column(c).to_pylist()]
                for c in src_cols
            ]
            groups: dict[tuple, list[int]] = {}
            for i in range(batch.num_rows):
                key = tuple(
                    st._transform_py(f, src[k][i])
                    for k, f in enumerate(spec)
                )
                groups.setdefault(key, []).append(i)
            tbl = pa.Table.from_batches([batch])
            for key, idx in groups.items():
                for sub in tbl.take(idx).to_batches():
                    if sub.num_rows:
                        _sink(key, sub)

        entries = []
        for key, (w, absp, rel, state) in writers.items():
            w.close()
            entry = {
                "path": rel,
                "rows": state["rows"],
                "stats": {
                    c: state["stats"].get(
                        c, {"min": None, "max": None, "nulls": 0}
                    )
                    for c in self._stats_cols
                },
            }
            if spec:
                entry["partition"] = {
                    f["name"]: st._json_safe(v)
                    for f, v in zip(spec, key)
                }
            entries.append(entry)
        return _WriteMessage(entries)

    # -------------------------------------------------------- driver side

    def _fence_concurrent_evolution(self) -> None:
        """The writer stamped partition tuples and carries a schema
        captured at INIT time; committing after a concurrent
        evolve_partition_by (or a concurrent append that widened the
        schema) would silently REVERT that evolution in the new head —
        the publish_staged race from review pass 10. The entries'
        tuples are unrecomputable post-write, so fail loudly; the
        caller (or the restarted streaming query) re-plans against the
        evolved table."""
        from mundipy_spark.sources import snaptable as st

        head = st.current_version(self._path)
        if head == 0:
            return
        snap = st._load_snapshot(self._path, head)
        if json.dumps(snap.get("partition_spec"), sort_keys=True) != json.dumps(
            self._spec, sort_keys=True
        ):
            raise st.ConflictError(
                f"snaptable {self._path}: partition spec evolved since "
                "this writer planned — restart the write"
            )
        ours = {f.name for f in self._schema.fields}
        theirs = {
            f["name"] for f in json.loads(snap["schema"])["fields"]
        }
        if not theirs <= ours:
            raise st.ConflictError(
                f"snaptable {self._path}: table schema gained columns "
                f"{sorted(theirs - ours)} since this writer planned — "
                "restart the write"
            )

    def commit(self, messages) -> None:
        from mundipy_spark.sources import snaptable as st

        entries = [
            e for m in messages if m is not None for e in m.entries
        ]
        if not (self._overwrite and self._creating):
            self._fence_concurrent_evolution()
        if self._overwrite:
            st._commit(
                self._path, entries,
                "create" if self._creating else "replace",
                self._stats_cols, self._schema.json(),
                carry_parent_files=False,
                partition_spec=self._spec,
                partition_spec_history=self._hist,
                delete_files=[],
            )
        else:
            st._commit(
                self._path, entries, "append",
                self._stats_cols, self._schema.json(),
                carry_parent_files=True,
                partition_spec=self._spec,
                partition_spec_history=self._hist,
            )

    def abort(self, messages) -> None:
        # eager best-effort cleanup of the files successful tasks
        # reported; anything a dead task left behind is an orphan under
        # data/<job-uuid>/ that remove_orphans reclaims (never visible:
        # no manifest references it)
        import shutil

        for m in messages:
            for e in getattr(m, "entries", None) or []:
                try:
                    os.unlink(os.path.join(self._path, e["path"]))
                except OSError:
                    pass
        try:
            shutil.rmtree(
                os.path.join(self._path, "data", self._job),
                ignore_errors=True,
            )
        except OSError:
            pass


class SnaptableStreamWriter(SnaptableBatchWriter, DataSourceStreamArrowWriter):
    """`df.writeStream.format("snaptable")` — the format twin of
    `stream_ops.snaptable_sink`: every micro-batch lands as ONE atomic
    append snapshot, exactly-once across restarts.

    Replay idempotence is the sink's exact contract: the engine
    re-runs an uncommitted batchId after a crash between the table
    commit and Spark's streaming-checkpoint commit, so each snapshot
    records (sink_id, sink_epoch=batchId) and `commit` SKIPS a batch
    some committed snapshot already carries (unlinking the replay's
    freshly written, never-referenced files). sink_id defaults to the
    query's checkpointLocation — stable across restarts and distinct
    across queries writing the same table; without one, a fresh uuid
    per writer (no replay exists, and a shared constant would make a
    second run's epoch 0 look like a replay of the first's — the
    session-4b cross-query finding on the foreachBatch sink)."""

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema, overwrite=False)
        self._sink_id = (
            options.get("sink_id")
            or options.get("checkpointlocation")
            or options.get("checkpointLocation")
            or f"nockpt-{__import__('uuid').uuid4()}"
        )

    def _committed(self, batch_id: int) -> bool:
        from mundipy_spark.sources import snaptable as st

        return any(
            s.get("sink_id") == self._sink_id
            and s.get("sink_epoch") == batch_id
            for s in st.snapshots(self._path)
        )

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        from mundipy_spark.sources import snaptable as st

        entries = [
            e for m in messages if m is not None for e in m.entries
        ]
        if self._committed(batchId):
            # crash-replay of an already-committed epoch: this run's
            # files were written before commit() could decide — they
            # are unreferenced; drop them eagerly
            for e in entries:
                try:
                    os.unlink(os.path.join(self._path, e["path"]))
                except OSError:
                    pass
            return
        self._fence_concurrent_evolution()
        st._commit(
            self._path, entries, "append",
            self._stats_cols, self._schema.json(),
            carry_parent_files=True,
            partition_spec=self._spec,
            partition_spec_history=self._hist,
            extra={"sink_id": self._sink_id, "sink_epoch": batchId},
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        SnaptableBatchWriter.abort(self, messages)


# ---------------------------------------------------------------------------
# JVM auto-routing: plan big no-delete format reads as native parquet scans
# ---------------------------------------------------------------------------

#: options a JVM-routed read can honor with identical semantics; any
#: other key (columns, streaming knobs, unknown) keeps the Python path
_ROUTABLE_KEYS = {"path", "snapshot_id", "ref", "predicates", "use_python_reader"}

_ROUTING_INSTALLED = False


def _route_jvm_scan(spark, opts: dict):
    """If this batch read qualifies, return the SAME rows/schema as a
    JVM-native `snaptable.scan` DataFrame; else None (Python DSv2 path).

    Why (VERDICT r4 #3): every DSv2 batch necessarily crosses
    Arrow→Python per task — measured at this host's Python-decode
    ceiling (snapread 8→32 = 0.431). The library `scan()` path hands
    Spark a plain JVM parquet scan over the SAME manifest-pruned file
    list — identical rows, identical schema, no Python in the plan —
    so filter-only reads should get it automatically.

    Qualifies when: no user schema (checked by caller), option keys ⊆
    {path, snapshot_id, ref, predicates} and the target snapshot has
    NO outstanding equality deletes (`use_python_reader=true` opts
    out; MOR reads keep the DSv2 per-file delete grouping, which the
    datasource tests pin). Additive schema evolution needs no gate:
    `spark.read.schema(table_schema).parquet(files)` null-fills
    missing columns natively, same as the Arrow reader.

    Any error here falls back to the Python path so failure modes
    (missing table, bad options) keep their canonical messages."""
    from mundipy_spark.sources import snaptable

    low = {str(k).lower(): v for k, v in opts.items()}
    if str(low.get("use_python_reader", "")).lower() in ("1", "true", "yes"):
        return None
    if not set(low) <= _ROUTABLE_KEYS:
        return None
    if not low.get("path"):
        return None
    try:
        path = _table_path(low)
        snap_id = _snapshot_opt(low, path)
        preds = _parse_predicates(low) or None
        plan = snaptable.plan_scan(path, preds, snap_id)
        if plan["delete_files"]:
            return None
        # pin the resolved version: the routed DataFrame must not move
        # with later commits (same convention as a DSv2 ref read)
        return snaptable.scan(spark, path, preds, plan["snapshot"])
    except Exception:
        return None


def _install_reader_routing() -> None:
    """Wrap DataFrameReader so `spark.read.format("snaptable")...
    .load(path)` plans the JVM scan when `_route_jvm_scan` allows —
    the one seam through which every batch `.load()` flows (the
    Python Data Source API offers no hook to emit a JVM relation from
    inside the source). Wrappers stash format/options/schema on the
    reader instance (fresh per `spark.read`) and delegate everything
    else; non-snaptable reads are untouched."""
    global _ROUTING_INSTALLED
    if _ROUTING_INSTALLED:
        return
    from pyspark.sql.readwriter import DataFrameReader as _R

    orig_format, orig_option = _R.format, _R.option
    orig_options, orig_schema, orig_load = _R.options, _R.schema, _R.load

    def _format(self, source):
        self._st_src = source
        return orig_format(self, source)

    def _option(self, key, value):
        d = getattr(self, "_st_opts", None)
        if d is None:
            d = self._st_opts = {}
        d[key] = value
        return orig_option(self, key, value)

    def _options(self, **options):
        d = getattr(self, "_st_opts", None)
        if d is None:
            d = self._st_opts = {}
        d.update(options)
        return orig_options(self, **options)

    def _schema(self, schema):
        self._st_user_schema = True
        return orig_schema(self, schema)

    def _load(self, path=None, format=None, schema=None, **options):
        src = format or getattr(self, "_st_src", None)
        if (
            src == "snaptable"
            and schema is None
            and not getattr(self, "_st_user_schema", False)
            and isinstance(path, (str, type(None)))
        ):
            opts = dict(getattr(self, "_st_opts", {}))
            opts.update(options)
            if path is not None:
                opts["path"] = path
            routed = _route_jvm_scan(self._spark, opts)
            if routed is not None:
                return routed
        return orig_load(self, path=path, format=format, schema=schema, **options)

    _R.format, _R.option, _R.options = _format, _option, _options
    _R.schema, _R.load = _schema, _load
    _ROUTING_INSTALLED = True


def register(spark) -> None:
    """Make format("snaptable") available on this session, and route
    qualifying batch reads straight to the JVM parquet scan (see
    _route_jvm_scan)."""
    spark.dataSource.register(SnaptableDataSource)
    _install_reader_routing()
