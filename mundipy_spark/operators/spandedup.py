"""Exact duplicate-SPAN detection — the Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better")
refinement of document dedup: find token spans that occur more than
once ANYWHERE in the corpus, at every position (stride-1 overlapping
windows), not just at paragraph boundaries like
operators/paragraphs.py. The published implementation builds a
monolithic suffix array; the distributed re-expression below gets the
same "which tokens sit inside a repeated n-token window" signal from
corpus-wide n-gram fingerprint frequencies — the standard
shuffle-friendly substitute (suffix arrays don't shard; hashed grams
do).

Per doc the operator reports n_tokens, n_grams, n_dup_grams (window
positions whose fingerprint occurs >1 time corpus-wide, including
self-repeats within one doc) and dup_tokens (tokens covered by at
least one duplicated window — the mass a span-level trim would cut).

Scale shape (10^12 docs):
- gram fingerprints are the portable 56-bit md5 primitive, generated
  map-side from a STAGED token array (one split per doc; see
  operators/scrub.py on lambda re-evaluation);
- duplicate marking is ONE shuffle: a count window over the uniform
  fp key (no second join-back scan of the gram stream). Boilerplate
  grams ("all rights reserved ...") are the classic hot keys — they
  hash to ONE fp each, so a hot fp's rows land in one partition; the
  window is a count (no sort) and the per-row state is three longs,
  so a 10^9-occurrence gram costs memory proportional to nothing —
  Spark's window count streams the buffered partition; if a single
  fp ever exceeds a partition's disk, pre-aggregate per (fp, doc_id)
  first (noted, not needed at tested scales);
- coverage explode is bounded by n per marked gram and collapses
  immediately into ONE doc_id agg computing both countDistincts
  (Expand doubles the agg input rows — three-long rows, one uniform
  shuffle); the window subtree executes exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx


def _gram_count(n: int) -> Column:
    return F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(0))


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 12,
) -> DataFrame:
    """One row per input doc:
    (id, n_tokens, n_grams, n_dup_grams, dup_tokens)."""
    staged = docs.select(
        id_col, F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks")
    )
    totals = staged.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        _gram_count(n).cast("long").alias("n_grams"),
    )
    grams = staged.select(
        id_col,
        F.posexplode(
            F.when(
                _gram_count(n) >= 1,
                F.transform(
                    F.sequence(F.lit(1), _gram_count(n)),
                    lambda i: tx.md5_int_expr(
                        F.concat_ws(" ", F.slice(F.col("_toks"), i, n))
                    ),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("_pos0", "_fp"),
    ).select(id_col, (F.col("_pos0") + 1).alias("start"), "_fp")
    # ONE fp shuffle marks duplicates (count window, no orderBy -> no
    # sort, streams the partition)
    marked = grams.withColumn(
        "_occ", F.count("*").over(Window.partitionBy("_fp"))
    ).filter(F.col("_occ") > 1)
    # BOTH per-doc stats come out of one pass over `marked` (start
    # positions are unique per doc, so countDistinct(start) recovers the
    # dup-gram count after the coverage explode) — the naive two-agg
    # shape re-executed the whole scan+explode+window subtree twice
    # (plan-asserted single Window in tests).
    dup = (
        marked.select(
            id_col,
            "start",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("_tok"),
        )
        .groupBy(id_col)
        .agg(
            F.countDistinct("start").cast("long").alias("n_dup_grams"),
            F.countDistinct("_tok").cast("long").alias("dup_tokens"),
        )
    )
    return totals.join(dup, on=id_col, how="left").select(
        id_col,
        "n_tokens",
        "n_grams",
        F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
    )


def duplicate_spans_sql(
    docs_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 12,
) -> str:
    """DuckDB twin (value-exact: same tokenizer, same 56-bit md5)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '[\\s\\x0b]+')"
    gram = f"array_to_string(t[i:(i + {n - 1})], ' ')"
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS t FROM {docs_table}
), totals AS (
  SELECT {id_col}, len(t) AS n_tokens,
         greatest(len(t) - {n - 1}, 0) AS n_grams FROM tk
), grams AS (
  SELECT {id_col}, i AS start, {tx.md5_int_sql(gram)} AS fp
  FROM tk, UNNEST(range(1, greatest(len(t) - {n - 1}, 0) + 1)) u(i)
), marked AS (
  SELECT * FROM (
    SELECT {id_col}, start, count(*) OVER (PARTITION BY fp) AS occ
    FROM grams
  ) WHERE occ > 1
), dup_counts AS (
  SELECT {id_col}, count(*) AS n_dup_grams FROM marked GROUP BY {id_col}
), covered AS (
  SELECT {id_col}, count(DISTINCT p) AS dup_tokens
  FROM marked, UNNEST(range(start, start + {n})) v(p)
  GROUP BY {id_col}
)
SELECT t.{id_col},
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(d.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM totals t
LEFT JOIN dup_counts d ON d.{id_col} = t.{id_col}
LEFT JOIN covered c ON c.{id_col} = t.{id_col}
"""
