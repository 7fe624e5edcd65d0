"""Benchmark decontamination: flag training documents that share any
token n-gram with a (small) evaluation/benchmark set — the standard
pre-training hygiene pass (GPT-3 App. C / PaLM-style 8-to-13-gram
overlap; public methodology).

Scale shape (10^12 training docs vs a few-MB eval set):
- eval n-gram fingerprints are tiny -> BROADCAST hash side; the
  training side never shuffles its text;
- training n-grams are generated map-side (token array staged as a
  real column once — see operators/scrub.py on lambda re-evaluation
  — then one `transform` over a `sequence`), exploded, and
  broadcast-SEMI-joined; only (doc_id, hit-gram fp) longs survive;
- the single shuffle is the per-doc count agg on uniform doc_id.
The explode multiplies rows by ~tokens-per-doc, but every exploded
row is two longs wide and dies in the same stage (broadcast join +
partial agg), so nothing n-gram-sized ever crosses the wire.

Fingerprints are the shared portable 56-bit md5 primitive
(functions/text.md5_int_expr), so the DuckDB oracle reproduces hit
counts exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx


def _n_grams(n: int) -> Column:
    """Number of token n-grams in the staged `_toks` array."""
    return F.greatest(F.size(F.col("_toks")) - (n - 1), F.lit(0))


def _ngram_fps(n: int) -> Column:
    """Array of 56-bit fingerprints of the staged `_toks` array's token
    n-grams (empty when the doc has fewer than n tokens — guarded,
    since sequence(1, 0) would count DOWN, not produce an empty
    array)."""
    return F.when(
        _n_grams(n) >= 1,
        F.transform(
            F.sequence(F.lit(1), _n_grams(n)),
            lambda i: tx.md5_int_expr(
                F.concat_ws(" ", F.slice(F.col("_toks"), i, n))
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_toks", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    )


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """One row per training doc: (id, n_grams, n_hits, contaminated).
    `n_hits` counts the doc's n-gram POSITIONS whose fingerprint occurs
    anywhere in the eval set; `contaminated` = n_hits > 0. Docs shorter
    than n tokens have n_grams = 0 and are clean by definition."""
    eval_fps = (
        _with_tokens(eval_set, text_col)
        .select(F.explode(_ngram_fps(n)).alias("_fp"))
        .distinct()
    )
    # ONE pass over docs: explode_outer keeps zero-gram docs, the
    # broadcast LEFT join tags hits, and the doc_id agg rebuilds both
    # the total and the hit count (n_grams is constant per doc, so
    # max() recovers it without a second scan of the source).
    exploded = _with_tokens(docs, text_col).select(
        id_col,
        _n_grams(n).alias("n_grams"),
        F.explode_outer(_ngram_fps(n)).alias("_fp"),
    )
    tagged = exploded.join(
        F.broadcast(eval_fps.withColumn("_hit", F.lit(1))),
        on="_fp",
        how="left",
    )
    return tagged.groupBy(id_col).agg(
        F.max("n_grams").cast("long").alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.sum("_hit"), F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate_sql(
    docs_table: str,
    eval_where: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> str:
    """DuckDB twin: `eval_where` selects the eval rows out of
    `docs_table` (the tests derive the eval set from the same corpus,
    so one table serves both sides); reference its columns through the
    alias `d` (e.g. ``d.doc_id % 97 = 0``)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '[\\s\\x0b]+')"
    gram = f"array_to_string(t[i:(i + {n - 1})], ' ')"
    return f"""
WITH tk AS (
  SELECT {id_col}, {toks} AS t FROM {docs_table}
), grams AS (
  SELECT {id_col}, {tx.md5_int_sql(gram)} AS fp
  FROM tk, UNNEST(range(1, greatest(len(t) - {n - 1}, 0) + 1)) u(i)
), eval_fps AS (
  SELECT DISTINCT g.fp FROM grams g
  JOIN {docs_table} d ON d.{id_col} = g.{id_col}
  WHERE {eval_where}
), totals AS (
  SELECT {id_col}, greatest(len(t) - {n - 1}, 0) AS n_grams FROM tk
), hits AS (
  SELECT {id_col}, count(*) AS n_hits FROM grams
  WHERE fp IN (SELECT fp FROM eval_fps)
  GROUP BY {id_col}
)
SELECT t.{id_col},
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM totals t LEFT JOIN hits h ON h.{id_col} = t.{id_col}
"""
