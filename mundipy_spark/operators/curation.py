"""Training-data curation operators: deterministic sampling and
per-group quality selection.

Production corpus curation needs REPRODUCIBLE sampling (the same rows
selected on every run, resumable mid-job, no RNG state shipped between
executors) and bounded per-source selection (cap boilerplate-heavy
domains). Both are pure column arithmetic — JVM-side, partition-count
independent, and exactly reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx

_SAMPLE_MOD = 1_000_000


def sample_by_hash(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose md5-derived
    hash bucket falls under rate. Same input -> same sample, regardless
    of partitioning or executor count (unlike df.sample, whose output
    depends on the split layout)."""
    h = tx.md5_int_expr(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.filter(F.pmod(h, F.lit(_SAMPLE_MOD)) < int(rate * _SAMPLE_MOD))


def sample_by_hash_sql(rate: float, key_col: str = "doc_id", salt: str = "") -> str:
    """WHERE-clause twin of sample_by_hash."""
    h = tx.md5_int_sql(f"(CAST({key_col} AS VARCHAR) || '{salt}')")
    return f"(({h}) % {_SAMPLE_MOD}) < {int(rate * _SAMPLE_MOD)}"


def assign_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 bucket of the
    row key picks the split, so membership is stable across runs,
    partitionings, and cluster sizes, and train/val never leak into
    each other when the corpus grows (a row's split never changes).
    weights default to 98/1/1."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    h = tx.md5_int_expr(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    bucket = F.pmod(h, F.lit(_SAMPLE_MOD))
    expr = None
    acc = 0.0
    for name, wt in weights.items():
        acc += wt / total
        cond = bucket < int(round(acc * _SAMPLE_MOD))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = list(weights)[-1]
    return df.withColumn(out, expr.otherwise(last))


def assign_split_sql(
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """CASE-expression twin of assign_split."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    h = tx.md5_int_sql(f"(CAST({key_col} AS VARCHAR) || '{salt}')")
    bucket = f"(({h}) % {_SAMPLE_MOD})"
    parts, acc = [], 0.0
    for name, wt in weights.items():
        acc += wt / total
        parts.append(f"WHEN {bucket} < {int(round(acc * _SAMPLE_MOD))} THEN '{name}'")
    last = list(weights)[-1]
    return "CASE " + " ".join(parts) + f" ELSE '{last}' END"


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Keep the k best rows per group (source/domain caps, quality
    selection). One window shuffle on the group key; ties broken
    deterministically by tie_break so reruns select identical rows."""
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = W.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
