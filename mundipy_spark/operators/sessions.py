"""Event sessionization: gap-based sessions over an event log.

Batch path: pure window functions (lag -> flag -> running-sum session
number) — JVM-side, one shuffle on user_id, SQL-oracle-expressible.
Streaming path: streaming.stream_ops.sessionize_stream (stateful
applyInPandasWithState twin, tested equivalent).
"""

from __future__ import annotations


def sessionize(events, gap_s: int = 1800):
    """Gap-based sessionization of an event log — pure window functions
    (lag -> new-session flag -> running sum = session number), fully
    JVM-side and SQL-oracle-expressible. One shuffle on user_id.

    Output: (user_id, session_no, session_start, session_end, n_events,
    sum_value)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = (
        prev.isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > gap_s)
    ).cast("long")
    sess = F.sum(new_sess).over(
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        events.withColumn("_sess", sess)
        .groupBy("user_id", F.col("_sess").alias("session_no"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )


def sessionize_sql(gap_s: int = 1800, table: str = "events") -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {gap_s}
              THEN 1 ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
FROM sess GROUP BY user_id, session_no
"""
