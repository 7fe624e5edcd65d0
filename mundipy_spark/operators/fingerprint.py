"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS local fingerprinting algorithm): hash every character k-gram,
slide a window of w hashes, keep each window's minimum. Any shared
substring of length >= k + w - 1 between two documents is GUARANTEED to
share a fingerprint, which is what makes the exploded (fp -> doc) index
a sound near-dup / plagiarism candidate generator.

All JVM higher-order functions (substr / transform / slice /
array_min), no Python in the path, and the 56-bit md5 hash is the same
portable primitive as MinHash/SimHash so the DuckDB oracle reproduces
every fingerprint bit-for-bit.

Scale notes: per-doc cost is O(len * (k + w)) string hashing inside
codegen; the output explodes to ~len/w fingerprints per doc — orders of
magnitude smaller than the k-gram stream. Candidate pairs bucket on
fp with the same cap discipline as LSH banding (no all-pairs blowup on
boilerplate). For BOOK-length docs prefer chunking upstream; the
window-min via slice is O(n*w), which at w<=16 stays cheap relative to
the md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx

FP_P = 1_000_000_007  # same modulus discipline as MinHash (ANSI-safe)


def _norm(text):
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 16,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, fp) — the distinct winnowing fingerprints of each doc
    (whitespace-normalized, lowercased). Docs shorter than k chars
    fingerprint their whole text."""
    # materialize the normalized text and the gram-hash array as REAL
    # columns between steps: referencing a regexp/array EXPRESSION
    # inside a transform lambda would re-evaluate it once per element
    # (O(n^2) regexp work per doc — no CSE into lambda bodies)
    base = df.select(F.col(id_col), _norm(F.col(text_col)).alias("_t"))
    txt = F.col("_t")
    n_grams = F.greatest(F.length(txt) - (k - 1), F.lit(1))
    gdf = base.select(
        id_col,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: tx.md5_int_expr(txt.substr(i, F.lit(k))) % F.lit(FP_P),
        ).alias("_g"),
    )
    grams = F.col("_g")
    n_windows = F.greatest(F.size(grams) - (w - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda p: F.array_min(F.slice(grams, p, w)),
    )
    return gdf.select(
        F.col(id_col), F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_fingerprints_sql(
    k: int = 16,
    w: int = 8,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: identical normalization, k-gram md5-56 hashes, and
    window minima."""
    txt = f"regexp_replace(lower(trim({text_col})), '[\\s\\x0b]+', ' ', 'g')"
    gram_hash = tx.md5_int_sql(f"substr(t, CAST(i AS INT), {k})")
    return f"""
WITH base AS (
  SELECT {id_col}, {txt} AS t FROM {table}
), g AS (
  SELECT {id_col},
         list_transform(
           range(1, greatest(length(t) - {k - 1}, 1) + 1),
           i -> {gram_hash} % {FP_P}
         ) AS grams
  FROM base
), m AS (
  SELECT {id_col},
         list_transform(
           range(1, greatest(len(grams) - {w - 1}, 1) + 1),
           p -> list_min(grams[CAST(p AS INT) : CAST(p AS INT) + {w - 1}])
         ) AS mins
  FROM g
)
SELECT {id_col}, unnest(list_distinct(mins)) AS fp FROM m
"""


def fingerprint_candidate_pairs(
    fps: DataFrame, id_col: str = "doc_id", bucket_cap: int = 200
) -> DataFrame:
    """(a, b, n_shared) candidate pairs sharing >= 1 fingerprint — the
    winnowing index join. bucket_cap drops boilerplate fingerprints
    shared by more than cap docs before the self-join (same guard as
    LSH banding; nothing quadratic survives)."""
    from pyspark.sql import Window as W

    capped = fps.withColumn(
        "_n", F.count("*").over(W.partitionBy("fp"))
    ).filter(F.col("_n") <= bucket_cap)
    a = capped.select(F.col(id_col).alias("a"), "fp")
    b = capped.select(F.col(id_col).alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
    )
