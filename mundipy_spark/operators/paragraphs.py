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

Scale shape (10^12 docs): first-occurrence selection is a PARTIAL
AGGREGATE over a packed primitive, not a window —
`groupBy(fp).agg(min(doc_id<<IDX_BITS | idx))` is algebraically identical
to `row_number() over (partition by fp order by doc_id, idx) = 1`,
but it runs as whole-stage-codegen HashAggregate and map-side combine
collapses every duplicate BEFORE the shuffle: the exchange carries
one slim (fp, long) row per DISTINCT paragraph instead of a full
paragraph string per occurrence. Boilerplate hot fingerprints are
absorbed map-side for the same reason — skew never reaches the wire,
and nothing is ever sorted cluster-wide. Kept text is REBUILT from
the winning doc's own text (token-slice by winning idx) after one
hash join whose build side is the per-doc winner list, so:
- paragraph strings exist only transiently map-side (for md5);
- the text column crosses the wire exactly once (the join exchange);
- per-doc totals (n_pars = ceil(tokens/chunk)) come from text length
  alone, on the same row, no explode.
Cost: the text column is scanned twice (explode + rebuild) — two
sequential column scans are far cheaper at scale than shuffling AND
sorting the exploded corpus once, which is what the window plan did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx

# (doc_id, idx) packed into one BIGINT for the winner min(): low
# _IDX_BITS bits hold the paragraph index, the rest the doc id —
# supports |doc_id| < 2^43 (8.8e12, clear of the module's 10^12-doc
# contract) with up to 1M paragraphs per doc (12.6M tokens at the
# default 12-token chunking). Out-of-range ids/idx RAISE rather than
# silently corrupt the packing.
_IDX_BITS = 20


def _tokens(text: "F.Column") -> "F.Column":
    """trim + whitespace-split: the operator's single tokenizer seam.
    Measured dead end (local[32], 1.5M pages, within one JVM window):
    normalizing first (regexp_replace('\\s+',' ') + literal-space
    split) is ~20% SLOWER than this one regex split — the replace is a
    second full regex pass plus a whole-text copy, which outweighs the
    cheaper split automaton."""
    return F.split(F.trim(text), r"\s+")


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
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    ).filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = F.col("_toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(c))).cast("int")
    # the transform lives INSIDE the generator: materializing the
    # paragraph array as its own Project column first and exploding
    # the column reference costs ~3x (the array is copied into unsafe
    # format row-by-row before the Generate); measured 23.7s vs 8.1s
    # at 2M pages, local[8]
    return base.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * c + 1, c)),
            )
        ).alias("idx", "par"),
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
    txt = F.trim(F.col(text_col))
    toks = _tokens(F.col(text_col))
    n_pars = F.when(
        F.length(txt) > 0,
        F.ceil(F.size(toks) / F.lit(float(c))).cast("long"),
    ).otherwise(F.lit(0).cast("long"))

    # first occurrence per fingerprint via a PACKED primitive key:
    # strings can never ride a HashAggregate buffer (min(struct)/
    # min_by/first over a string all fall back to SortAggregate, which
    # is interpreted and sorts the full exploded set map-side), so the
    # winner is min(doc_id<<IDX_BITS | idx) — codegen hash agg, map-
    # side combine. Packed order == (doc_id, idx) lexicographic order,
    # incl. negative ids (arithmetic shift round-trips the sign); both
    # fields are range-checked so an out-of-contract id raises instead
    # of corrupting the packing.
    pars = split_paragraphs(df, text_col, id_col, c)
    id_bound = F.lit(1 << (63 - _IDX_BITS))
    # cast BEFORE shifting: shiftleft preserves its input type, so an
    # IntegerType id column would wrap in 32-bit silently while the
    # 64-bit range guard below still passes
    id64 = F.col(id_col).cast("long")
    idx64 = F.col("idx").cast("long")
    packed = F.when(
        (idx64 < F.lit(1 << _IDX_BITS))
        & (id64 < id_bound)
        & (id64 >= -id_bound),
        F.shiftleft(id64, _IDX_BITS).bitwiseOR(idx64),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"dedup_paragraphs: |{id_col}| >= 2^{63 - _IDX_BITS} or more "
                f"than 2^{_IDX_BITS} paragraphs in one doc"
            )
        ).cast("long")
    )
    winners = (
        pars.select(tx.md5_int_expr(F.col("par")).alias("_fp"), packed.alias("_pk"))
        .groupBy("_fp")
        .agg(F.min("_pk").alias("_pk"))
        .select(
            F.shiftright(F.col("_pk"), _IDX_BITS).alias(id_col),
            F.col("_pk").bitwiseAND(F.lit((1 << _IDX_BITS) - 1)).alias("idx"),
        )
    )
    kept = winners.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_sort(F.collect_list("idx")).alias("_kidx"),
    )

    # kept paragraphs are REBUILT from the doc's own text after one
    # join against the per-doc winner lists, so paragraph strings are
    # never aggregated. With a high dup rate the winner side is small
    # and Spark/AQE broadcasts it — the text column then never crosses
    # the wire at all; when it outgrows broadcast, AQE's shuffled-hash
    # conversion keeps the text side sort-free (one exchange, the same
    # bytes the window formulation shuffled anyway). Requires ids
    # unique per row (the twin's dup-id order is undefined anyway:
    # string_agg ORDER BY idx with tied idx).
    docs = df.select(F.col(id_col), txt.alias("_txt"), n_pars.alias("n_pars"))
    # explicit shuffle_hash: without the hint the planner picks
    # SortMergeJoin, which SORTS the full text corpus inside the join
    # exchange — pure overhead at 100 TB (the build side is the slim
    # per-doc winner list, bounded by one row per doc and hash-
    # partitioned, so the per-partition hash map stays small at any
    # corpus size given sane shuffle-partition sizing)
    joined = docs.join(kept.hint("shuffle_hash"), on=id_col, how="left")
    staged = joined.select(
        id_col,
        "n_pars",
        "n_kept",
        "_kidx",
        # split only the docs that kept something — in a heavily
        # replicated corpus that skips the re-tokenize for ~all rows
        F.when(F.col("_kidx").isNotNull(), _tokens(F.col("_txt"))).alias(
            "_toks"
        ),
    )
    return staged.select(
        F.col(id_col),
        F.col("n_pars"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(
            F.concat_ws(
                " ",
                F.transform(
                    F.col("_kidx"),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("_toks"), i * c + 1, c)
                    ),
                ),
            ),
            F.lit(""),
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
  SELECT {id_col}, regexp_split_to_array(trim({text_col}), '[\\s\\x0b]+') AS t
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
