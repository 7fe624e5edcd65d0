"""Bucketed tables: shuffle-free co-located equi-joins.

At 100 TB the dominant cost of a repeated big-big equi-join (pages x
crawl-metadata on url, events x sessions on user_id, tile joins on a
shared cell layout) is re-shuffling both sides every query. Spark's
answer is bucketing: write both tables hash-partitioned AND sorted by
the join key into the same number of buckets; every later join or
aggregation on that key is planned as a zero-Exchange sort-merge join
(bucket i joins bucket i locally).

This module wraps the saveAsTable bucketing surface (bucketBy is only
valid for managed tables) and pins the contract with a plan assertion
helper used by tests:

    write_bucketed(df, "pages_b", keys=["url"], buckets=64)
    write_bucketed(meta, "meta_b", keys=["url"], buckets=64)
    joined = spark.table("pages_b").join(spark.table("meta_b"), "url")
    assert_no_shuffle(joined)   # no Exchange on either side

Bucket-count discipline at scale: pick buckets ~= cluster cores x
small-integer, identical on BOTH sides (mismatched counts fall back to
a shuffle); at 10^12 rows, 2-4k buckets keeps per-bucket files in the
GB range. Sorting within buckets makes the merge side of the join
streaming (no hash table) and gives min/max pruning inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — plans with
    zero Exchange (verify with assert_no_shuffle / .explain)."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def assert_no_shuffle(df: DataFrame) -> str:
    """Raise if the physical plan contains an Exchange (other than a
    broadcast exchange); returns the plan string for logging."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle:\n{plan}")
    return plan
