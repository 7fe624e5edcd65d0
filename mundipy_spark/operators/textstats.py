"""Text-analysis operators over the documents table.

Thin DataFrame compositions of functions.text — kept as named operators
so they appear in the engine's operator inventory and the entry-point
query registry with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx


def doc_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document: token count, char count, quality score, fingerprint."""
    return df.select(
        F.col(id_col),
        tx.token_count_expr(F.col(text_col)).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        tx.quality_score_expr(F.col(text_col)).alias("quality"),
        tx.fingerprint_expr(F.col(text_col)).alias("fingerprint"),
    )


def doc_stats_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col},
       {tx.token_count_sql(text_col)} AS n_tokens,
       length({text_col}) AS n_chars,
       {tx.quality_score_sql(text_col)} AS quality,
       {tx.fingerprint_sql(text_col)} AS fingerprint
FROM {table}
"""


def lang_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detected language x document count + mean quality. The detector is
    the n-gram/stopword heuristic UDF (functions.text.lang_id)."""
    return (
        df.withColumn("lang_detected", tx.lang_id(F.col(text_col)))
        .groupBy("lang_detected")
        .agg(
            F.count("*").alias("n_docs"),
            F.avg(tx.quality_score_expr(F.col(text_col))).alias("avg_quality"),
        )
    )


def token_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Corpus token frequency table (explode + hash agg with map-side
    combine; the standard zipf audit for a training corpus)."""
    return (
        df.select(F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_count)
    )


def token_frequencies_sql(table: str = "documents", text_col: str = "text", min_count: int = 2) -> str:
    return f"""
SELECT token, count(*) AS freq
FROM (
  SELECT unnest(regexp_split_to_array(lower(trim({text_col})), '\\s+')) AS token
  FROM {table}
)
WHERE length(token) > 0
GROUP BY token
HAVING count(*) >= {min_count}
"""

