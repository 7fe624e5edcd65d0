"""Temporal operators: as-of join (point-in-time lookup).

Spark has no native ASOF JOIN (DuckDB/Pandas do); the scalable
composition is the classic union-and-window plan:

  1. union the probe (left) and reference (right) streams with a
     source marker, right rows carrying their payload columns and left
     rows carrying null payloads;
  2. one shuffle partitioned by the `by` keys, sorted by (ts, marker)
     with right rows ordered BEFORE left rows at equal timestamps (so
     a reference row effective exactly at the probe ts is visible —
     backward as-of is ts_right <= ts_left);
  3. pack the right payload columns into ONE struct (non-null even
     when every member is null) and fill left rows with
     `last(struct, ignorenulls=True)` over the running window — the
     struct keeps the payload row-atomic: filling each column
     independently would let a genuine NULL in one right column be
     back-filled from an OLDER right row, emitting a row that never
     existed (and diverging from DuckDB's native ASOF JOIN, the
     oracle twin);
  4. keep left rows, unpack the struct.

Cost: exactly ONE shuffle on `by` (same as any keyed join), no
broadcast needed, no range explosion — this is how production
point-in-time-correct feature lookups are built on Spark at 10^12-row
scale. Skewed `by` keys behave like any windowed aggregation (AQE
skew handling applies to the shuffle; the window itself is a
sequential scan per key, which matches the semantics — values must be
resolved in time order).

Reference parity: the engine's oracle twin is DuckDB's native
`ASOF LEFT JOIN` (tests and __spark_entry__), an independent
implementation of the same public semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    right_ts: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the value
    columns of the latest right row with the same `by` key and
    right ts <= left ts (NULLs when no such row exists).

    `right_ts` names the right timestamp column when it differs from
    `ts_col`; it is not kept in the output.

    Determinism: if the right side has several rows at the same
    (by, ts) the filled payload is order-ambiguous (same as DuckDB /
    pandas asof) — pre-aggregate the right side to one row per
    (by, ts) when exact reproducibility matters.
    """
    right_ts = right_ts or ts_col
    # a NULL right timestamp can never satisfy ts_right <= ts_left
    # (SQL comparison semantics — DuckDB's native ASOF matches it to
    # nothing), but under the union-window plan it would sort FIRST
    # (asc = nulls first) and back-fill every probe before the first
    # real reference row; drop such rows up front
    right = right.filter(F.col(right_ts).isNotNull())
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (by, right_ts)]
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")

    from pyspark.sql import types as T

    payload_t = T.StructType(
        [T.StructField(v, right.schema[v].dataType) for v in value_cols]
    )
    l_cols = left.columns
    lu = left.select(
        *l_cols,
        F.lit(None).cast(payload_t).alias("_payload"),
        F.lit(1).alias("_src"),
        F.col(ts_col).alias("_ts"),
    )
    ru = right.select(
        *[
            F.col(by).alias(by) if c == by else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_cols
        ],
        F.struct(*[F.col(v) for v in value_cols]).alias("_payload"),
        F.lit(0).alias("_src"),
        F.col(right_ts).alias("_ts"),
    )
    unioned = lu.unionByName(ru)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col("_ts").asc(), F.col("_src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *l_cols,
        "_src",
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return filled.filter(F.col("_src") == 1).select(
        *l_cols, *[F.col(f"_payload.{v}").alias(v) for v in value_cols]
    )
