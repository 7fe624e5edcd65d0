"""Content-scrubbing and repetition-quality operators for training data.

Both operators are MAP-ONLY: pure column expressions (regexp + array
higher-order functions) that stay inside whole-stage codegen — zero
shuffles, so at 10^12 docs they scale linearly with input splits and
never repartition. Each has a character-exact DuckDB twin.

PII scrubbing is the standard pre-training redaction pass (emails,
phone numbers, IPv4) — patterns are deliberately lookaround-free so the
Java regex engine (Spark) and RE2 (DuckDB) match identically, and
redaction order is fixed (email -> phone -> ip) so the output text is
byte-identical across engines.

Repetition signals are the Gopher-style quality heuristics (Rae et al.
2021, public): duplicate-token fraction, top-bigram fraction, token
entropy. Computed WITHIN each row via array ops (array_distinct /
filter / aggregate) rather than explode+groupBy — a per-doc O(d*n)
loop beats a (doc_id, ngram) shuffle at any scale because documents
are short and the shuffle would carry every n-gram occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx

# lookaround-free, anchored by \b (ASCII word boundary in both Java
# regex and RE2). Redaction order is fixed (email, phone, IP) so the
# output is byte-identical across engines; note the email TLD must be
# alphabetic, so `user@10.0.0.1`-style hosts fall to the IP pass.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_REDACTIONS = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ip", IPV4_RE, "<IP>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-type PII counts and a fully redacted text column.

    Counts are taken on the ORIGINAL text (each pattern independently);
    redaction applies the three replacements in fixed order. Everything
    is `regexp_count` / `regexp_replace` — JVM codegen, no UDF.
    """
    out = df
    for name, pat, _ in _REDACTIONS:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    red = F.col(text_col)
    for _, pat, repl in _REDACTIONS:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn("text_redacted", red)


def scrub_pii_sql(text: str) -> dict[str, str]:
    """DuckDB twin: SQL fragments keyed by output column name."""
    frags = {}
    for name, pat, _ in _REDACTIONS:
        frags[f"n_{name}"] = f"len(regexp_extract_all({text}, '{pat}'))"
    red = text
    for _, pat, repl in _REDACTIONS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    frags["text_redacted"] = red
    return frags


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition/quality signals (Gopher-style), rounded
    to 6 dp:

    - dup_token_frac: 1 - distinct_tokens / tokens (0 for empty docs)
    - top_bigram_frac: occurrences of the most frequent bigram over all
      bigram occurrences (0 when < 2 tokens)
    - token_entropy: Shannon entropy (nats) of the token frequency
      distribution, folded in sorted-distinct-token order so the
      floating summation order matches the oracle exactly.
    """
    # Materialize every array as a REAL column between select stages
    # (same discipline as operators/fingerprint.py): a compound
    # expression referenced inside a transform/filter lambda body is
    # re-evaluated once per ELEMENT — inlining `bigrams` into the
    # bg_counts lambda would rebuild the O(n) bigram array per distinct
    # bigram (O(n^3) per doc; measured 20 s for 500 docs vs <0.5 s
    # staged).
    base = df.select(
        F.col(id_col),
        (F.length(F.trim(F.col(text_col))) == 0).alias("_empty"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    s2 = base.select(
        id_col,
        "_empty",
        "_toks",
        F.size(toks).cast("double").alias("_n"),
        F.array_sort(F.array_distinct(toks)).alias("_dist"),
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 2),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_bigrams"),
    )
    s3 = s2.withColumn("_dist_bg", F.array_sort(F.array_distinct(F.col("_bigrams"))))
    s4 = s3.select(
        id_col,
        "_empty",
        "_n",
        F.size(F.col("_dist")).alias("_ndist"),
        F.size(F.col("_bigrams")).alias("_nbg"),
        F.transform(
            F.col("_dist"),
            lambda d: F.size(F.filter(F.col("_toks"), lambda x: x == d)),
        ).alias("_tok_counts"),
        F.transform(
            F.col("_dist_bg"),
            lambda g: F.size(F.filter(F.col("_bigrams"), lambda x: x == g)),
        ).alias("_bg_counts"),
    )

    n = F.col("_n")
    empty = F.col("_empty")
    dup_frac = F.when(empty, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("_ndist") / n
    )
    top_bg = F.when(
        F.col("_nbg") > 0,
        F.array_max(F.col("_bg_counts")).cast("double") / F.col("_nbg"),
    ).otherwise(F.lit(0.0))
    entropy = F.when(empty, F.lit(0.0)).otherwise(
        F.aggregate(
            F.col("_tok_counts"),
            F.lit(0.0),
            lambda acc, c: acc - (c.cast("double") / n) * F.log(c.cast("double") / n),
        )
    )
    return s4.select(
        F.col(id_col),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(top_bg, 6).alias("top_bigram_frac"),
        F.round(entropy, 6).alias("token_entropy"),
    )


def repetition_signals_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB oracle twin of repetition_signals: same token/bigram
    derivations via list functions, same sorted-distinct fold order."""
    return f"""
WITH t AS (
  SELECT {id_col},
         length(trim({text_col})) = 0 AS empty,
         regexp_split_to_array(trim({text_col}), '[\\s\\x0b]+') AS toks
  FROM {table}
), d AS (
  SELECT {id_col}, empty, toks,
         CAST(len(toks) AS DOUBLE) AS n,
         list_sort(list_distinct(toks)) AS dist,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END AS bigrams
  FROM t
), c AS (
  SELECT {id_col}, empty, n, dist, toks, bigrams,
         list_sort(list_distinct(bigrams)) AS dist_bg
  FROM d
), m AS (
  SELECT {id_col}, empty, n, toks, bigrams, dist,
         list_transform(dist_bg, g -> len(list_filter(bigrams, x -> x = g))) AS bg_counts,
         list_transform(dist, g -> len(list_filter(toks, x -> x = g))) AS tok_counts
  FROM c
)
SELECT {id_col},
       round(CASE WHEN empty THEN 0.0 ELSE 1.0 - len(dist) / n END, 6) AS dup_token_frac,
       round(CASE WHEN len(bigrams) > 0
                  THEN CAST(list_max(bg_counts) AS DOUBLE) / len(bigrams)
                  ELSE 0.0 END, 6) AS top_bigram_frac,
       round(CASE WHEN empty THEN 0.0 ELSE
             coalesce(list_sum(list_transform(tok_counts,
                 c2 -> -(CAST(c2 AS DOUBLE) / n) * ln(CAST(c2 AS DOUBLE) / n))), 0.0)
             END, 6) AS token_entropy
FROM m
"""
