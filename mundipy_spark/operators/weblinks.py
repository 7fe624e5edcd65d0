"""HTML outlink extraction + host-graph edges — the link-extraction
pass that feeds crawl frontiers and the host-level PageRank
(operators/pagerank.py).

All extraction is JVM `regexp_extract_all` inside whole-stage codegen
(an href regexp, not an HTML parser — exactly what crawl-scale link
extractors do; a DOM parser would be a pandas-UDF seam). Reference
resolution handles absolute, protocol-relative (//host/x) and
root-relative (/x) links; path-relative links are dropped (documented
— resolving them needs the base path, rarely worth it for host
graphs).

Scale shape (10^12 pages): extraction + resolution + domain mapping
are map-only; `host_edges` ends in one partial-agg shuffle keyed by
the (src,dst) domain pair. Hot pairs (everyone links to
wikipedia.org) partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mundipy_spark.operators.domains import (
    registrable_domain_expr,
    registrable_domain_sql,
)

_HREF_RE = r'href="([^"#]*)'


def extract_links_expr(html: Column, base_url: Column) -> Column:
    """Array of absolute link URLs found in `html` (href="..."
    attributes): absolute kept as-is, //host and /path resolved
    against base_url's scheme/host, path-relative dropped."""
    scheme = F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(base_url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    raw = F.regexp_extract_all(html, F.lit(_HREF_RE), 1)
    resolved = F.transform(
        raw,
        lambda u: F.when(
            u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), u
        )
        .when(u.startswith("//"), F.concat(scheme, F.lit(":"), u))
        .when(u.startswith("/"), F.concat(origin, u))
        .otherwise(F.lit(None)),
    )
    return F.filter(resolved, lambda u: u.isNotNull())


def extract_links_sql(html: str, base_url: str) -> str:
    """DuckDB twin of extract_links_expr."""
    scheme = f"regexp_extract({base_url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)"
    origin = f"regexp_extract({base_url}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    raw = f"regexp_extract_all({html}, 'href=\"([^\"#]*)', 1)"
    return f"""list_filter(list_transform({raw},
      u -> CASE
        WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN u
        WHEN u LIKE '//%' THEN {scheme} || ':' || u
        WHEN u LIKE '/%' THEN {origin} || u
        ELSE NULL END),
      u -> u IS NOT NULL)"""


def host_edges(
    pages: DataFrame, html_col: str = "html_text", url_col: str = "url"
) -> DataFrame:
    """(src_domain, dst_domain, n_links) — self-links dropped,
    weights = link multiplicity. One partial-agg shuffle."""
    links = pages.select(
        registrable_domain_expr(F.col(url_col)).alias("src_domain"),
        F.explode(
            extract_links_expr(F.col(html_col), F.col(url_col))
        ).alias("link"),
    )
    edges = links.select(
        "src_domain",
        registrable_domain_expr(F.col("link")).alias("dst_domain"),
    ).filter(
        (F.col("dst_domain") != "")
        & (F.col("dst_domain") != F.col("src_domain"))
    )
    return edges.groupBy("src_domain", "dst_domain").agg(
        F.count("*").alias("n_links")
    )


# full <a ...href="..."...>inner</a> elements; groups: 1=href, 2=inner
_ANCHOR_RE = r'(?is)<a\s[^>]*href="([^"#]*)"[^>]*>(.*?)</a>'


def anchor_terms(
    pages: DataFrame, html_col: str = "html_text", url_col: str = "url"
) -> DataFrame:
    """(dst_domain, term, n) — aggregated anchor-text vocabulary per
    linked-to domain, the classic link-context signal (search engines
    and LLM corpus builders both weight a page by the words OTHERS use
    to link to it).

    Extraction/resolution/cleanup are map-only regexps in codegen
    (same resolution rules as extract_links_expr); the one shuffle is
    the (dst_domain, term) partial agg. Hot domains partial-aggregate
    map-side, so skew reaches the wire as at most #partitions rows
    per (domain, term)."""
    scheme = F.regexp_extract(F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    origin = F.regexp_extract(
        F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1
    )
    elems = pages.select(
        scheme.alias("_scheme"),
        origin.alias("_origin"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 0)
        ).alias("_a"),
    )
    href = F.regexp_extract(F.col("_a"), _ANCHOR_RE, 1)
    inner = F.regexp_extract(F.col("_a"), _ANCHOR_RE, 2)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(inner), r"(?s)<[^>]*>", ""), r"\s+", " "
        )
    )
    resolved = (
        F.when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(F.col("_origin"), href))
        .otherwise(F.lit(None))
    )
    pairs = elems.select(
        registrable_domain_expr(resolved).alias("dst_domain"),
        cleaned.alias("_text"),
    ).filter(resolved.isNotNull() & (F.col("_text") != ""))
    terms = pairs.select(
        "dst_domain", F.explode(F.split("_text", " ")).alias("term")
    )
    return terms.groupBy("dst_domain", "term").agg(
        F.count("*").cast("long").alias("n")
    )


def anchor_terms_sql(pages_sql: str, html: str = "html_text", url: str = "url") -> str:
    """DuckDB twin of anchor_terms; `pages_sql` yields (url, html_text)."""
    pat = _ANCHOR_RE.replace("'", "''")
    scheme = f"regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)"
    origin = f"regexp_extract({url}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
    return f"""
WITH pages AS ({pages_sql}),
elems AS (
  SELECT {scheme} AS s, {origin} AS o, unnest(regexp_extract_all({html}, '{pat}', 0)) AS a
  FROM pages
), pairs AS (
  SELECT CASE
           WHEN regexp_matches(regexp_extract(a, '{pat}', 1), '^[A-Za-z][A-Za-z0-9+.-]*://')
             THEN regexp_extract(a, '{pat}', 1)
           WHEN regexp_extract(a, '{pat}', 1) LIKE '//%' THEN s || ':' || regexp_extract(a, '{pat}', 1)
           WHEN regexp_extract(a, '{pat}', 1) LIKE '/%' THEN o || regexp_extract(a, '{pat}', 1)
           ELSE NULL END AS link,
         trim(regexp_replace(regexp_replace(lower(regexp_extract(a, '{pat}', 2)), '(?s)<[^>]*>', '', 'g'), '[\\s\\x0b]+', ' ', 'g')) AS t
  FROM elems
), terms AS (
  SELECT {registrable_domain_sql('link')} AS dst_domain, unnest(string_split(t, ' ')) AS term
  FROM pairs WHERE link IS NOT NULL AND t <> ''
)
SELECT dst_domain, term, CAST(count(*) AS BIGINT) AS n
FROM terms GROUP BY dst_domain, term
"""
