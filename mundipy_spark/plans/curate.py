"""The composed C4/CCNet-style curation pipeline — the end-to-end
"user story" a training-data engineer runs: language + quality gate,
corpus-wide paragraph dedup, keep-ratio selection, benchmark
decontamination. Each stage is one of the engine's standalone
operators; this module only wires them.

Scale shape (10^12 docs): the stages compose without materialization —
Catalyst fuses the map-side gates into the paragraph explode, so the
whole pipeline is: the paragraph-dedup subplan (map-side-combined
fingerprint agg + per-doc winner agg + rebuild join — see
operators/paragraphs.py), the decontam explode + broadcast join, and
the final doc_id agg. The keep-ratio test is integer
cross-multiplication (n_kept * 10 >= n_pars * keep_ratio_tenths), so
selection is engine-exact with no float thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx
from mundipy_spark.operators import decontam, paragraphs


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    chunk_tokens: int = 12,
    keep_ratio_tenths: int = 3,
    eval_mod: int = 97,
    ngram: int = 8,
    gopher: bool = False,
) -> DataFrame:
    """Per surviving doc: (id, n_grams, n_hits, selected) where
    selected = passed every gate AND not contaminated. Docs failing
    the language/quality/keep-ratio gates are absent from the output
    (they were filtered before decontamination, the expensive stage).
    `gopher=True` prepends the Rae et al. rule gate — a pure
    projection (quality.gopher_rules carry-through), so the pipeline
    stays one corpus scan."""
    if gopher:
        from mundipy_spark.operators.quality import gopher_rules

        docs = gopher_rules(
            docs, text_col=text_col, id_col=id_col, carry=(text_col, "lang")
        ).filter(F.col("keep"))
    qual = docs.filter(
        F.col("lang").isin(*langs)
        & (tx.quality_score_expr(F.col(text_col)) >= min_quality)
    ).select(id_col, text_col)
    pd = paragraphs.dedup_paragraphs(
        qual, text_col=text_col, id_col=id_col, chunk_tokens=chunk_tokens
    )
    sel = pd.filter(
        (F.col("n_kept") * 10 >= F.col("n_pars") * keep_ratio_tenths)
        & (F.col("n_kept") > 0)
    ).select(id_col, "kept_text")
    # decontaminate consumes sel TWICE (corpus side + eval-slice side);
    # without a cache the eval side re-executes the whole quality-gate +
    # paragraph-dedup subplan — the pipeline's most expensive stage —
    # just to keep ~1/eval_mod of its rows. Persist so the subplan runs
    # once and the eval side reads the cached table.
    sel = sel.persist()
    dc = decontam.decontaminate(
        sel,
        sel.filter(F.col(id_col) % eval_mod == 0),
        text_col="kept_text",
        id_col=id_col,
        n=ngram,
    )
    return dc.select(
        id_col,
        "n_grams",
        "n_hits",
        (~F.col("contaminated")).alias("selected"),
    )


def curate_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    chunk_tokens: int = 12,
    keep_ratio_tenths: int = 3,
    eval_mod: int = 97,
    ngram: int = 8,
    gopher: bool = False,
) -> str:
    """DuckDB twin: the same stages composed from each operator's own
    SQL builder (nested WITH subqueries reference the outer CTEs)."""
    if gopher:
        from mundipy_spark.operators.quality import gopher_rules_sql

        table = (
            f"(SELECT {id_col}, {text_col}, lang FROM ("
            + gopher_rules_sql(
                table, text_col=text_col, id_col=id_col, carry=(text_col, "lang")
            )
            + ") WHERE keep)"
        )
    lang_list = ", ".join(f"'{l}'" for l in langs)
    inner = decontam.decontaminate_sql(
        "sel",
        f"d.{id_col} % {eval_mod} = 0",
        text_col="kept_text",
        id_col=id_col,
        n=ngram,
    )
    return f"""
WITH qual AS (
  SELECT {id_col}, {text_col} FROM {table}
  WHERE lang IN ({lang_list})
    AND {tx.quality_score_sql(text_col)} >= {min_quality}
), pd AS (
  {paragraphs.dedup_paragraphs_sql(table='qual', text_col=text_col,
                                   id_col=id_col, chunk_tokens=chunk_tokens)}
), sel AS (
  SELECT {id_col}, kept_text FROM pd
  WHERE n_kept * 10 >= n_pars * {keep_ratio_tenths} AND n_kept > 0
)
SELECT {id_col}, n_grams, n_hits, NOT contaminated AS selected
FROM ({inner}) dcq
"""
