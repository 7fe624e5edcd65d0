"""Trained document classifier — the supervised filter stage of real
curation pipelines (C4's quality classifier, CCNet's fastText
language-ID; public methodology). fastText in a pandas UDF is the
production drop-in; this sandbox version is multinomial Naive Bayes,
whose TRAINING is pure counting and whose SCORING is a sum of
integer-log2 quantized log-likelihoods (operators/lm.py arithmetic) —
so both halves are partitioning-independent, value-exact, and
reproducible bit-for-bit by the DuckDB twin.

Per-class score of a doc with tokens t_1..t_m:

    ilog2(n_docs_c + 1)                        (prior)
  + sum_i ilog2(cnt_c(t_i) + 1)                (likelihood numerators)
  - m * ilog2(tok_total_c + 1)                 (shared denominator)

argmax over classes, ties broken label-ascending. Unknown tokens
contribute ilog2(1) = 0 — additive smoothing's quantized shape.

Scale shape (10^12 docs, labeled set much smaller):
- training = two partial-agg shuffles over the LABELED corpus
  ((label, token) counts pruned by min_count, per-class totals);
  the model broadcasts like the lm.py bigram table;
- scoring = map-only explode + broadcast token join, then TWO uniform
  shuffles: one (doc_id, label) partial agg, one doc_id argmax agg.
  Nothing text-sized crosses the wire; classes multiply rows only
  AFTER per-doc aggregation (k rows per doc, k = #classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.operators.lm import ilog2_expr


def _toks_expr(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _stage(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_toks", _toks_expr(text_col))


def train_nb(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(token_model, class_stats): (label, token, cnt) pruned to
    cnt >= min_count, and (label, tok_total, n_docs). tok_total counts
    ALL tokens (pre-prune) so the denominator stays honest."""
    staged = _stage(labeled, text_col)
    # tokenizer lives INSIDE the Generate: exploding a just-staged
    # array column costs ~2.4x (the array is copied into unsafe format
    # in the Project before the Generate reads it) — measured 7.9s vs
    # 3.3s at 2M pages, local[8]; same pitfall as operators/paragraphs
    tokens = labeled.select(
        F.col(label_col).alias("label"),
        F.explode(_toks_expr(text_col)).alias("token"),
    )
    token_model = (
        tokens.groupBy("label", "token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    class_stats = staged.groupBy(F.col(label_col).alias("label")).agg(
        F.sum(F.size("_toks")).cast("long").alias("tok_total"),
        F.count("*").cast("long").alias("n_docs"),
    )
    return token_model, class_stats


def nb_score(
    docs: DataFrame,
    token_model: DataFrame,
    class_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per doc: (id, pred_label, best_score, n_tokens); best_score is
    the exact quantized log-posterior (a long)."""
    staged = _stage(docs, text_col)
    totals = staged.select(
        id_col, F.size("_toks").cast("long").alias("n_tokens")
    )
    likel = (
        docs.select(id_col, F.explode(_toks_expr(text_col)).alias("token"))
        .join(F.broadcast(token_model), on="token")
        .groupBy(id_col, "label")
        .agg(F.sum(ilog2_expr(F.col("cnt") + 1)).cast("long").alias("_lik"))
    )
    base = totals.crossJoin(F.broadcast(class_stats))
    scored = base.join(likel, on=[id_col, "label"], how="left").select(
        id_col,
        "label",
        "n_tokens",
        (
            ilog2_expr(F.col("n_docs") + 1)
            + F.coalesce("_lik", F.lit(0))
            - F.col("n_tokens") * ilog2_expr(F.col("tok_total") + 1)
        )
        .cast("long")
        .alias("score"),
    )
    # argmax with deterministic ties (score desc, label asc) in ONE
    # doc_id agg: max over (score, reversed-label) structs would need a
    # string negation, so pack the tie-break as min over (neg score,
    # label)
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("label"))).alias(
            "_b"
        ),
        F.max("n_tokens").alias("n_tokens"),
    )
    return best.select(
        id_col,
        F.col("_b.label").alias("pred_label"),
        (-F.col("_b.ns")).cast("long").alias("best_score"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def nb_classify_sql(
    docs_table: str,
    labeled_where: str,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> str:
    """DuckDB twin of train-on-slice + score-all: `labeled_where`
    selects the training rows out of `docs_table` via alias `d` (the
    decontam/lm twin convention)."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '[\\s\\x0b]+')"
    ilog = "length(bin({v})) - 1"
    return f"""
WITH tk AS (
  SELECT {id_col}, {label_col} AS label, {toks} AS t FROM {docs_table}
), labeled AS (
  SELECT tk.* FROM tk JOIN {docs_table} d ON d.{id_col} = tk.{id_col}
  WHERE {labeled_where}
), tokens AS (
  SELECT label, u.token FROM labeled, UNNEST(t) u(token)
), token_model AS (
  SELECT label, token, count(*) AS cnt FROM tokens
  GROUP BY label, token HAVING count(*) >= {min_count}
), class_stats AS (
  SELECT label, sum(len(t)) AS tok_total, count(*) AS n_docs
  FROM labeled GROUP BY label
), doc_tokens AS (
  SELECT {id_col}, u.token FROM tk, UNNEST(t) u(token)
), likel AS (
  SELECT dt.{id_col}, m.label,
         sum({ilog.format(v="m.cnt + 1")}) AS lik
  FROM doc_tokens dt JOIN token_model m ON m.token = dt.token
  GROUP BY dt.{id_col}, m.label
), scored AS (
  SELECT tk.{id_col}, cs.label, len(tk.t) AS n_tokens,
         ({ilog.format(v="cs.n_docs + 1")})
           + coalesce(l.lik, 0)
           - len(tk.t) * ({ilog.format(v="cs.tok_total + 1")}) AS score
  FROM tk CROSS JOIN class_stats cs
  LEFT JOIN likel l ON l.{id_col} = tk.{id_col} AND l.label = cs.label
), ranked AS (
  SELECT {id_col}, label, score, n_tokens,
         row_number() OVER (
           PARTITION BY {id_col} ORDER BY score DESC, label ASC
         ) AS rk
  FROM scored
)
SELECT {id_col}, label AS pred_label,
       CAST(score AS BIGINT) AS best_score,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM ranked WHERE rk = 1
"""
