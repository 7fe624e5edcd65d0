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
