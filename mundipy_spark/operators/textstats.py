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


def lang_profile_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB oracle twin of lang_profile: same marker sets, same
    first-wins argmax as functions.text.lang_id (en, de, fr, es order),
    same CJK pre-check."""
    hit_cols = []
    for lang, markers in tx._LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in sorted(markers))
        hit_cols.append(
            f"len(list_filter(toks, x -> list_contains([{lst}], x))) AS h_{lang}"
        )
    hits = ",\n         ".join(hit_cols)
    order = list(tx._LANG_MARKERS.keys())
    m = "greatest(" + ", ".join(f"h_{g}" for g in order) + ")"
    pick = " ".join(f"WHEN h_{g} = m THEN '{g}'" for g in order[:-1])
    return f"""
WITH t AS (
  SELECT {text_col} AS txt,
         substr({text_col}, 1, 2000) AS head
  FROM {table}
), feat AS (
  SELECT txt,
         length(regexp_replace(head, '[^一-鿿]', '', 'g')) AS n_cjk,
         length(head) AS n_head,
         regexp_split_to_array(lower(txt), '[\\s\\x0b]+') AS toks
  FROM t
), hits AS (
  SELECT n_cjk, n_head,
         {hits}
  FROM feat
), lab AS (
  SELECT CASE
           WHEN n_cjk > greatest(4, n_head * 0.05) THEN 'zh'
           WHEN m = 0 THEN 'und'
           {pick}
           ELSE '{order[-1]}'
         END AS lang_detected
  FROM (SELECT *, {m} AS m FROM hits)
)
SELECT lang_detected, count(*) AS n_docs FROM lab GROUP BY lang_detected
"""


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
  SELECT unnest(regexp_split_to_array(lower(trim({text_col})), '[\\s\\x0b]+')) AS token
  FROM {table}
)
WHERE length(token) > 0
GROUP BY token
HAVING count(*) >= {min_count}
"""

