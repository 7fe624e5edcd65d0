"""Gopher quality rules (Rae et al. 2021, Appendix A — public): the
per-document heuristic gate most modern pretraining pipelines run
before model-based filtering. All seven signals are computed WITHIN
the row via array higher-order functions — map-only, zero shuffles,
whole-stage codegen — so the gate costs one scan at 10^12 docs and
composes with any downstream stage.

Thresholds are the published ones:
  1. 50 <= word count <= 100_000
  2. 3 <= mean word length <= 10
  3. symbol-to-word ratio (# and ...) <= 0.1
  4. <= 90% of lines start with a bullet
  5. <= 30% of lines end with an ellipsis
  6. >= 80% of words contain an alphabetic character
  7. >= 2 distinct stop words present

Ratios are emitted round(, 6) (the repetition_signals float policy);
rule booleans and the final `keep` are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOP_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
BULLETS = ["-", "*", "•"]


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Per doc: the seven signals, each rule's boolean, and `keep` =
    AND of all rules. `carry` columns pass through untouched so the
    gate composes into pipelines as a pure projection (no join-back
    needed to recover the text)."""
    text = F.col(text_col)
    staged = docs.select(
        id_col,
        *carry,
        F.split(F.trim(text), r"\s+").alias("_toks"),
        F.split(text, r"\n").alias("_lines"),
        (
            F.regexp_count(text, F.lit("#")) + F.regexp_count(text, F.lit(r"\.\.\."))
        ).cast("long").alias("_symbols"),
    )
    n = F.size("_toks")
    nl = F.size("_lines")
    mean_len = F.length(F.concat_ws("", F.col("_toks"))) / n
    bullet = F.size(
        F.filter(
            F.col("_lines"),
            lambda l: F.trim(l).substr(1, 1).isin(BULLETS),
        )
    ) / nl
    ellipsis = F.size(
        F.filter(F.col("_lines"), lambda l: F.trim(l).endswith("..."))
    ) / nl
    alpha = F.size(
        F.filter(F.col("_toks"), lambda t: t.rlike("[a-zA-Z]"))
    ) / n
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(F.col("_toks"), F.lower)),
            F.array(*[F.lit(w) for w in STOP_WORDS]),
        )
    )
    sym_ratio = F.col("_symbols") / n
    out = staged.select(
        id_col,
        *carry,
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(bullet, 6).alias("bullet_ratio"),
        F.round(ellipsis, 6).alias("ellipsis_ratio"),
        F.round(alpha, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop"),
    )
    rules = {
        "r_words": (F.col("n_words") >= 50) & (F.col("n_words") <= 100000),
        "r_word_len": (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10),
        "r_symbols": F.col("symbol_ratio") <= 0.1,
        "r_bullets": F.col("bullet_ratio") <= 0.9,
        "r_ellipsis": F.col("ellipsis_ratio") <= 0.3,
        "r_alpha": F.col("alpha_frac") >= 0.8,
        "r_stop": F.col("n_stop") >= 2,
    }
    out = out.select("*", *[c.alias(name) for name, c in rules.items()])
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)


def gopher_rules_sql(
    docs_table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> str:
    """DuckDB twin (same tokenizer, same thresholds, same rounding)."""
    stops = ", ".join(f"'{w}'" for w in STOP_WORDS)
    bullets = ", ".join(f"'{b}'" for b in BULLETS)
    cq = "".join(f"{c}, " for c in carry)
    return f"""
WITH s AS (
  SELECT {id_col}, {cq}
         regexp_split_to_array(trim({text_col}), '[\\s\\x0b]+') AS t,
         string_split({text_col}, chr(10)) AS l,
         len(regexp_extract_all({text_col}, '#'))
           + len(regexp_extract_all({text_col}, '\\.\\.\\.')) AS symbols
  FROM {docs_table}
), m AS (
  SELECT {id_col}, {cq}
         CAST(len(t) AS BIGINT) AS n_words,
         round(length(array_to_string(t, '')) * 1.0 / len(t), 6) AS mean_word_len,
         round(symbols * 1.0 / len(t), 6) AS symbol_ratio,
         round(len(list_filter(l, x -> substr(trim(x), 1, 1) IN ({bullets})))
               * 1.0 / len(l), 6) AS bullet_ratio,
         round(len(list_filter(l, x -> trim(x) LIKE '%...'))
               * 1.0 / len(l), 6) AS ellipsis_ratio,
         round(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))
               * 1.0 / len(t), 6) AS alpha_frac,
         CAST(len(list_intersect(list_distinct(list_transform(t, x -> lower(x))),
                                 [{stops}])) AS BIGINT) AS n_stop
  FROM s
)
SELECT *,
       (n_words >= 50 AND n_words <= 100000) AS r_words,
       (mean_word_len >= 3 AND mean_word_len <= 10) AS r_word_len,
       (symbol_ratio <= 0.1) AS r_symbols,
       (bullet_ratio <= 0.9) AS r_bullets,
       (ellipsis_ratio <= 0.3) AS r_ellipsis,
       (alpha_frac >= 0.8) AS r_alpha,
       (n_stop >= 2) AS r_stop,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3 AND mean_word_len <= 10
        AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        AND ellipsis_ratio <= 0.3 AND alpha_frac >= 0.8
        AND n_stop >= 2) AS keep
FROM m
"""
