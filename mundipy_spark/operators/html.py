"""HTML -> text extraction: the first stage of every Common-Crawl
pipeline (WARC html payload -> readable text; trafilatura/jusText do
this with a DOM, C4 did it with rules). The reference engine consumes
already-extracted text (mundipy operates on properties/geometries);
this operator supplies the step that PRODUCES that text column from
`html: binary`, keeping the per-url invariant: for well-formed body
content the extracted text is byte-identical to the authored text
(pinned by tests/test_html_spandedup_dsir.py and the q_extract_text
oracle).

Pure-expression design (no UDF): a fixed chain of regexp_replace
steps, every pattern written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — inline (?is) flags, \\b, non-greedy
repetition; NO backreferences or lookaround, which RE2 lacks. The
DuckDB twin runs the same chain with the 'g' flag, so extraction is
value-exact across engines.

Scale shape (10^12 pages): map-only — zero shuffles, whole-stage
codegen end to end; the html column is pruned immediately after the
extraction projection, so only the (much smaller) text survives into
downstream shuffles. Extraction cost is linear in payload bytes and
embarrassingly parallel, the ideal 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) chain, applied in order. Replacement "\n" is a
# literal newline character on both engines (DuckDB side uses chr(10)).
# script/style/comment removal is ONE alternation pass (no backrefs —
# RE2-safe; each scan is a full pass over 10^12 pages, so fewer passes
# matter more than pattern elegance).
_TAG_STEPS: list[tuple[str, str]] = [
    (
        r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>"
        r"|<!--.*?-->",
        "",
    ),
    # block-level boundaries become newlines so paragraphs survive
    (
        r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|"
        r"article|header|footer|title)>|<br\s*/?>",
        "\n",
    ),
    # every remaining tag (incl. attributes spanning lines) vanishes
    (r"(?s)<[^>]*>", ""),
]

# minimal entity set C4-style rule extraction decodes; &amp; MUST be
# last or authored "&amp;lt;" would double-decode.
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_STEPS: list[tuple[str, str]] = [
    # horizontal whitespace runs collapse to one space
    (r"[ \t\r\f]+", " "),
    # newlines absorb surrounding spaces and collapse runs
    (r" *\n[ \n]*", "\n"),
]

def extract_text_expr(html: Column) -> Column:
    """Extracted text from an html STRING column (decode binary first
    with F.decode(col, 'UTF-8')). Deterministic regexp chain; output
    is trimmed of leading/trailing whitespace (btrim over the space/
    newline set — after the collapse steps the edges hold only those
    two characters, and a char-set trim is ~20% of the whole chain
    cheaper than the anchored-regex equivalent)."""
    s = html
    for pat, repl in _TAG_STEPS:
        s = F.regexp_replace(s, pat, repl)
    for ent, ch in _ENTITY_STEPS:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    for pat, repl in _WS_STEPS:
        s = F.regexp_replace(s, pat, repl)
    return F.btrim(s, F.lit(" \n"))


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """pages with `out_col` = text extracted from the binary/string
    `html_col`. Map-only; html stays prunable (drop it downstream)."""
    src = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        src = F.decode(src, "UTF-8")
    return pages.withColumn(out_col, extract_text_expr(src))


def _sql_str(v: str) -> str:
    """DuckDB string literal; a bare newline replacement becomes
    chr(10) so no escape-processing ambiguity exists."""
    if v == "\n":
        return "chr(10)"
    return "'" + v.replace("'", "''") + "'"


def extract_text_sql(html_expr: str) -> str:
    """DuckDB twin of extract_text_expr over `html_expr` (a VARCHAR
    SQL expression). Same chain, RE2 + the 'g' option standing in for
    Spark's always-global regexp_replace."""
    s = html_expr
    for pat, repl in _TAG_STEPS:
        s = f"regexp_replace({s}, {_sql_str(pat)}, {_sql_str(repl)}, 'g')"
    for ent, ch in _ENTITY_STEPS:
        s = f"replace({s}, {_sql_str(ent)}, {_sql_str(ch)})"
    for pat, repl in _WS_STEPS:
        s = f"regexp_replace({s}, {_sql_str(pat)}, {_sql_str(repl)}, 'g')"
    return f"trim({s}, ' ' || chr(10))"


# <meta name=robots content=...noindex...> in either attribute order;
# written without lookaround (RE2-safe) as two alternates.
_NOINDEX_PAT = (
    r"(?is)<meta\s[^>]*(?:"
    r"name\s*=\s*[\"']?robots[\"']?[^>]*content\s*=\s*[\"']?[^\"'>]*noindex"
    r"|"
    r"content\s*=\s*[\"']?[^\"'>]*noindex[^>]*name\s*=\s*[\"']?robots"
    r")"
)


def robots_noindex_expr(html: Column) -> Column:
    """True when the page opts out of indexing via a robots meta tag —
    the polite-corpus rule (REP, RFC 9309 family) every crawl-derived
    training set applies before keeping a page."""
    return html.rlike(_NOINDEX_PAT)


def drop_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Map-only filter removing noindex pages (binary html decoded on
    the fly; the predicate stays in codegen)."""
    src = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        src = F.decode(src, "UTF-8")
    return pages.filter(~robots_noindex_expr(src))


def robots_noindex_sql(html_expr: str) -> str:
    """DuckDB twin of robots_noindex_expr."""
    return f"regexp_matches({html_expr}, {_sql_str(_NOINDEX_PAT)})"
