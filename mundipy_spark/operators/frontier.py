"""Crawl-frontier scheduling — the politeness shard of a crawler:
each host may be fetched at most `k_per_round` times per round, so a
URL's round is ceil(rank-within-host / k). Real frontiers (Heritrix,
Nutch, the Common Crawl fetcher) implement exactly this host-keyed
round assignment; downstream, round becomes the batch/partition key.

Scale shape (10^12 candidate URLs): ONE window shuffle keyed by host.
Host skew is intrinsic (a mega-site contributes millions of
candidates); the window is rank-only (no full-partition buffering
beyond Spark's window frame) and a per-host `max_rounds` cap bounds
the tail — capped URLs are dropped with a flag so the caller can
defer them to the next cycle, which is how real frontiers bound
per-host queue depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mundipy_spark.operators.robots import url_host_expr


def schedule_frontier(
    urls: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    k_per_round: int = 1,
    max_rounds: int | None = None,
) -> DataFrame:
    """urls + (host, host_rank, round, deferred); highest priority first
    within each host (ties: url asc, deterministic). URLs scheduled
    beyond `max_rounds` are NOT silently dropped: they come back with
    deferred=true so the caller can carry them into the next frontier
    cycle without re-running the host window (filter ~deferred for this
    cycle's fetch set). round uses integer `div`, exact at any rank —
    double division truncated by cast drifts from the integer twin
    beyond 2^53."""
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    out = (
        urls.withColumn("host", url_host_expr(F.col(url_col)))
        .withColumn("host_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "round",
            F.expr(f"(host_rank - 1) div {int(k_per_round)}") + F.lit(1).cast("long"),
        )
    )
    if max_rounds is not None:
        return out.withColumn("deferred", F.col("round") > max_rounds)
    return out.withColumn("deferred", F.lit(False))


def schedule_frontier_sql(
    urls_sql: str,
    url_col: str = "url",
    priority_col: str = "priority",
    k_per_round: int = 1,
    max_rounds: int | None = None,
) -> str:
    """DuckDB twin."""
    host = (
        f"lower(regexp_extract({url_col},"
        " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )
    deferred = (
        f"round > {max_rounds}" if max_rounds is not None else "FALSE"
    )
    return f"""
WITH u AS ({urls_sql}),
ranked AS (
  SELECT u.*, {host} AS host,
         CAST(row_number() OVER (
           PARTITION BY {host}
           ORDER BY {priority_col} DESC, {url_col} ASC
         ) AS BIGINT) AS host_rank
  FROM u
), rounds AS (
  SELECT *, CAST((host_rank - 1) // {k_per_round} + 1 AS BIGINT) AS round
  FROM ranked
)
SELECT *, {deferred} AS deferred FROM rounds
"""
