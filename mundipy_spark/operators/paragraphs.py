"""Paragraph-level corpus dedup (the CCNet pass, Wenzek et al. 2020 —
public): split every document into paragraphs, fingerprint each, keep
only the globally FIRST occurrence of each fingerprint (ordered by
doc_id, then position), and reassemble the surviving paragraphs in
their original in-document order.

The synthetic corpus has no newlines, so "paragraph" is a fixed
`chunk_tokens`-token window — the operator takes any paragraph
splitter expression, and the 56-bit md5 fingerprint is the same
portable primitive as MinHash, so the DuckDB oracle reproduces the
kept text byte-for-byte.

Scale shape (10^12 docs): ONE scan of the corpus, two shuffles.
- paragraph explode is map-side (arrays staged as real columns — see
  operators/scrub.py on lambda re-evaluation); empty docs survive as
  a single null-paragraph row (posexplode_outer), fingerprinted with
  a per-doc unique sentinel so they never pile into one hot window
  partition;
- first-occurrence selection is ONE window shuffle keyed by the
  uniform fingerprint (row_number over (fp) ordered by (doc_id, idx)
  — no groupBy+join-back round trip). The survivor is FLAGGED, not
  filtered, so totals ride along instead of forcing a second scan;
- reassembly + totals are one shuffle back on doc_id with a
  partial-agg collect_list. Both keys are uniform; boilerplate
  paragraphs make hot fingerprint groups, but the window only ranks
  them (no quadratic pairing), so skew degrades one task's sort, not
  the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx


def split_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 12,
) -> DataFrame:
    """(id, idx, par): fixed-size token-window paragraphs, in order.
    Empty/whitespace-only docs produce no rows."""
    c = chunk_tokens
    base = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    ).filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = F.col("_toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(c))).cast("int")
    pars = base.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * c + 1, c)),
        ).alias("_pars"),
    )
    return pars.select(
        id_col, F.posexplode(F.col("_pars")).alias("idx", "par")
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 12,
) -> DataFrame:
    """Corpus-wide paragraph dedup. Returns one row per input doc:
    (id, n_pars, n_kept, kept_text) where kept_text joins the
    surviving paragraphs with a single space ('' when every paragraph
    of the doc occurred earlier in the corpus)."""
    c = chunk_tokens
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.when(
        F.length(F.trim(F.col(text_col))) > 0,
        F.ceil(F.size(toks) / F.lit(float(c))).cast("int"),
    ).otherwise(F.lit(0))
    staged = df.select(F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc"))
    pars = staged.select(
        id_col,
        F.posexplode_outer(
            F.when(
                F.col("_nc") > 0,
                F.transform(
                    F.sequence(F.lit(0), F.col("_nc") - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_toks"), i * c + 1, c)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("idx", "par"),
    )
    # empty docs carry a null paragraph; give each a UNIQUE sentinel
    # fingerprint (negative, outside md5's 56-bit range) so the null
    # rows don't all land in one window partition.
    fp = pars.withColumn(
        "_fp",
        F.coalesce(
            tx.md5_int_expr(F.col("par")), -F.col(id_col) - F.lit(1)
        ),
    )
    first = Window.partitionBy("_fp").orderBy(
        F.col(id_col).asc(), F.col("idx").asc()
    )
    flagged = fp.withColumn(
        "_kept",
        (F.row_number().over(first) == 1) & F.col("par").isNotNull(),
    )
    return flagged.groupBy(id_col).agg(
        F.sum(F.col("par").isNotNull().cast("long")).alias("n_pars"),
        F.sum(F.col("_kept").cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("idx", "par"))
                    )
                ),
                lambda s: s["par"],
            ),
        ).alias("kept_text"),
    )


def dedup_paragraphs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 12,
) -> str:
    """DuckDB twin: same chunking, same 56-bit fingerprints, same
    first-occurrence rule, kept text re-joined in idx order."""
    c = chunk_tokens
    return f"""
WITH toks AS (
  SELECT {id_col}, regexp_split_to_array(trim({text_col}), '\\s+') AS t
  FROM {table} WHERE length(trim({text_col})) > 0
), pars AS (
  SELECT {id_col}, CAST(i AS BIGINT) AS idx,
         array_to_string(t[(i * {c} + 1):(i * {c} + {c})], ' ') AS par
  FROM toks, UNNEST(range(0, CAST(ceil(len(t) / {float(c)}) AS BIGINT))) u(i)
), fp AS (
  SELECT {id_col}, idx, par, {tx.md5_int_sql('par')} AS f FROM pars
), ranked AS (
  SELECT {id_col}, idx, par,
         row_number() OVER (PARTITION BY f ORDER BY {id_col}, idx) AS rn
  FROM fp
), kept AS (
  SELECT {id_col}, count(*) AS n_kept,
         string_agg(par, ' ' ORDER BY idx) AS kept_text
  FROM ranked WHERE rn = 1 GROUP BY {id_col}
), totals AS (
  SELECT {id_col}, count(*) AS n_pars FROM pars GROUP BY {id_col}
)
SELECT d.{id_col},
       coalesce(t.n_pars, 0) AS n_pars,
       coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.kept_text, '') AS kept_text
FROM (SELECT DISTINCT {id_col} FROM {table}) d
LEFT JOIN totals t ON t.{id_col} = d.{id_col}
LEFT JOIN kept k ON k.{id_col} = d.{id_col}
"""
