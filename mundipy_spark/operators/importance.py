"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
public): score every raw web document by how target-like its hashed
n-gram feature distribution is — weight(doc) = sum over the doc's
grams of [log p_target(bucket(gram)) - log p_raw(bucket(gram))] —
then resample the corpus by weight. The published method uses exactly
this hashed-bucket bag-of-ngrams model, which is what makes it
tractable at 10^12 docs: the "model" is two B-bucket count vectors.

ENGINE-EXACT integer variant: per-gram contribution is
ilog2(target_cnt+1) - ilog2(raw_cnt+1) (bit-length arithmetic, same
quantization as operators/lm.py), so every emitted value is a long
and the DuckDB twin is bit-for-bit.

Scale shape (10^12 docs):
- the bucket-count "model" is built with ONE partial-agg shuffle per
  side over at most B distinct keys (B ~ 10^4-10^6), then full-outer
  merged into a single <=B-row table -> BROADCAST;
- scoring is map-only: grams staged + exploded, bucket = fp % B
  computed in codegen, broadcast-LEFT-joined, one uniform doc_id agg
  shuffle. Nothing text-sized crosses the wire;
- the raw corpus is scanned TWICE by default (once to count buckets,
  once to score) — aggregate-then-join can't pipeline. At 10^12 docs
  pass `raw_counts=` built from a deterministic sample
  (operators/curation.sample), which is exactly the paper's fit-on-
  held-out-sample shape and drops the second full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx
from mundipy_spark.operators.lm import ilog2_expr


def _grams(n: int) -> Column:
    """n-gram strings of the staged `_toks` array (guarded empty)."""
    cnt = F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(0))
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _stage(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_toks", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Hash bucket of a gram: 56-bit md5 (non-negative) mod B — both
    engines agree because the operand never goes negative."""
    return (tx.md5_int_expr(gram) % n_buckets).cast("long")


def bucket_counts(
    df: DataFrame, text_col: str = "text", n: int = 2, n_buckets: int = 10007
) -> DataFrame:
    """(bucket, cnt) hashed n-gram counts — at most n_buckets rows."""
    return (
        _stage(df, text_col)
        .select(F.explode(_grams(n)).alias("gram"))
        .select(_bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10007,
    raw_counts: DataFrame | None = None,
) -> DataFrame:
    """Per raw doc: (id, n_grams, dsir_sum) with dsir_sum =
    sum over grams of ilog2(target_cnt[b]+1) - ilog2(raw_cnt[b]+1).
    Consumers resample by dsir_sum / n_grams; both stay exact longs.
    `raw_counts` substitutes a precomputed/sampled (bucket, cnt) table
    for the raw side (see module docstring on the 10^12-doc shape)."""
    t_cnt = bucket_counts(target, text_col, n, n_buckets).withColumnRenamed(
        "cnt", "t_cnt"
    )
    if raw_counts is None:
        raw_counts = bucket_counts(raw, text_col, n, n_buckets)
    r_cnt = raw_counts.withColumnRenamed("cnt", "r_cnt")
    model = t_cnt.join(r_cnt, on="bucket", how="full").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )
    cnt = F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(0))
    exploded = _stage(raw, text_col).select(
        id_col,
        cnt.cast("long").alias("n_grams"),
        F.explode_outer(_grams(n)).alias("gram"),
    )
    scored = exploded.withColumn(
        "bucket", _bucket(F.col("gram"), n_buckets)
    ).join(F.broadcast(model), on="bucket", how="left")
    contrib = ilog2_expr(F.coalesce("t_cnt", F.lit(0)) + 1) - ilog2_expr(
        F.coalesce("r_cnt", F.lit(0)) + 1
    )
    return scored.groupBy(id_col).agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.coalesce(
            F.sum(F.when(F.col("gram").isNotNull(), contrib)), F.lit(0)
        )
        .cast("long")
        .alias("dsir_sum"),
    )


def importance_weights_sql(
    docs_table: str,
    target_where: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 10007,
) -> str:
    """DuckDB twin; `target_where` picks the target slice out of
    `docs_table` via alias `d` (the raw side is the whole table,
    mirroring decontam/lm twins)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '[\\s\\x0b]+')"
    gram = f"array_to_string(t[i:(i + {n - 1})], ' ')"
    ilog = "length(bin({v})) - 1"
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS t FROM {docs_table}
), grams AS (
  SELECT {id_col}, ({tx.md5_int_sql(gram)}) % {n_buckets} AS bucket,
         greatest(len(t) - {n - 1}, 0) AS ng
  FROM tk, UNNEST(range(1, greatest(len(t) - {n - 1}, 0) + 1)) u(i)
), t_cnt AS (
  SELECT bucket, count(*) AS t_cnt FROM grams g
  JOIN {docs_table} d ON d.{id_col} = g.{id_col}
  WHERE {target_where} GROUP BY bucket
), r_cnt AS (
  SELECT bucket, count(*) AS r_cnt FROM grams GROUP BY bucket
), scored AS (
  SELECT g.{id_col}, max(g.ng) AS n_grams,
         sum(({ilog.format(v="coalesce(t.t_cnt, 0) + 1")})
           - ({ilog.format(v="coalesce(r.r_cnt, 0) + 1")})) AS dsir_sum
  FROM grams g
  LEFT JOIN t_cnt t ON t.bucket = g.bucket
  LEFT JOIN r_cnt r ON r.bucket = g.bucket
  GROUP BY g.{id_col}
)
SELECT k.{id_col},
       CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(s.dsir_sum, 0) AS BIGINT) AS dsir_sum
FROM (SELECT DISTINCT {id_col} FROM {docs_table}) k
LEFT JOIN scored s ON s.{id_col} = k.{id_col}
"""
