"""N-gram LM familiarity scoring — the CCNet quality dimension
(Wenzek et al. 2020: score each doc against an LM trained on a
reference corpus; keep the head/middle of the distribution).

A real deployment plugs KenLM into a pandas UDF; this sandbox has no
LM library, so the score is an ENGINE-EXACT stand-in with the same
dataflow: per-bigram log2-count quantized to integers
(ilog2(c) = bit-length(c) - 1 — `bin()` string length in both Spark
and DuckDB, no floating log whose last-ulp could break the value-hash
oracle). Scores are returned as exact longs (sum + count); consumers
divide.

Scale shape (10^12 docs):
- `train_bigram_counts` is one partial-agg shuffle on the bigram key
  over the (much smaller) REFERENCE corpus, pruned by min_count so
  the model stays broadcast-sized — the same prune KenLM pipelines
  apply;
- `lm_score` is map-only on the training side: bigrams are staged as
  a real column (operators/scrub.py lambda-re-evaluation note),
  exploded, broadcast-LEFT-joined against the model, and re-aggregated
  per doc — ONE uniform doc_id shuffle; nothing text-sized crosses
  the wire after the explode stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bigrams(text_col: str) -> Column:
    """Array of lowercase token bigrams of the staged `_toks` array
    (empty below 2 tokens; sequence(1,0) counts DOWN, hence guard)."""
    n = F.greatest(F.size(F.col("_toks")) - 1, F.lit(0))
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _stage_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_toks", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )


def ilog2_expr(c: Column) -> Column:
    """floor(log2(c)) for c >= 1, exactly: bit length - 1."""
    return (F.length(F.bin(c)) - 1).cast("long")


def train_bigram_counts(
    ref: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """(gram, cnt) over the reference corpus, pruned to cnt >=
    min_count so the model broadcasts."""
    grams = _stage_tokens(ref, text_col).select(
        F.explode(_bigrams(text_col)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc: (id, n_bigrams, sum_ilog) where sum_ilog adds
    ilog2(cnt + 1) over the doc's bigrams (unknown gram -> ilog2(1)
    = 0). Familiarity = sum_ilog / n_bigrams, left to the consumer so
    every emitted value is an exact integer."""
    exploded = _stage_tokens(docs, text_col).select(
        id_col,
        F.greatest(F.size(F.col("_toks")) - 1, F.lit(0)).alias("n_bigrams"),
        F.explode_outer(_bigrams(text_col)).alias("gram"),
    )
    joined = exploded.join(F.broadcast(model), on="gram", how="left")
    return joined.groupBy(id_col).agg(
        F.max("n_bigrams").cast("long").alias("n_bigrams"),
        F.coalesce(
            F.sum(ilog2_expr(F.coalesce(F.col("cnt"), F.lit(0)) + 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_ilog"),
    )


def lm_score_sql(
    docs_table: str,
    ref_where: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> str:
    """DuckDB twin; `ref_where` picks the reference rows out of
    `docs_table` via alias `d` (mirrors decontam.decontaminate_sql)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '[\\s\\x0b]+')"
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS t FROM {docs_table}
), grams AS (
  SELECT {id_col}, t[i] || ' ' || t[i + 1] AS gram,
         greatest(len(t) - 1, 0) AS nb
  FROM tk, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) u(i)
), model AS (
  SELECT gram, count(*) AS cnt FROM grams g
  JOIN {docs_table} d ON d.{id_col} = g.{id_col}
  WHERE {ref_where}
  GROUP BY gram HAVING count(*) >= {min_count}
), scored AS (
  SELECT g.{id_col},
         max(g.nb) AS n_bigrams,
         sum(length(bin(coalesce(m.cnt, 0) + 1)) - 1) AS sum_ilog
  FROM grams g LEFT JOIN model m ON m.gram = g.gram
  GROUP BY g.{id_col}
)
SELECT k.{id_col},
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.sum_ilog, 0) AS BIGINT) AS sum_ilog
FROM (SELECT DISTINCT {id_col} FROM {docs_table}) k
LEFT JOIN scored s ON s.{id_col} = k.{id_col}
"""
