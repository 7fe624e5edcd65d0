"""Domain-level curation: registrable-domain extraction (public-suffix
rule), per-domain reputation stats, and blocklist filtering — the
domain-reputation pass webtext pipelines (C4, RefinedWeb, Dolma; all
public methodology) run before any per-document scoring.

Scale shape (10^12 pages):
- registrable-domain extraction is map-only string work inside
  whole-stage codegen (regexp host extract + label slicing — no UDF);
- `domain_stats` is ONE partial-agg shuffle keyed by the registrable
  domain; web domains are Zipfian, but partial aggregation collapses
  each map partition's hot-domain rows to one row before the wire, so
  the skew reaches the shuffle as at most #partitions rows per domain;
- `filter_blocklist` is a broadcast LEFT ANTI join (blocklists are
  ~10^5 rows) — the page side never shuffles.

The public-suffix list here is a deliberately small embedded subset of
the common multi-label suffixes (publicsuffix.org is the full public
dataset; at prod scale ship it as a broadcast table instead of a
literal — the expression shape stays identical). Everything is
reproducible in DuckDB for the value-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mundipy_spark.functions import text as tx
from mundipy_spark.operators.weburl import _HOST_RE

# two-label public suffixes: a registrable domain under these keeps
# THREE labels (bbc.co.uk), not two (co.uk).
TWO_LABEL_SUFFIXES = (
    "co.uk ac.uk gov.uk org.uk com.au net.au org.au co.jp or.jp ne.jp "
    "com.br org.br co.in co.nz com.cn com.mx co.za com.sg com.tr"
).split()


def host_expr(url: Column) -> Column:
    """Lowercased host with any :port stripped ('' for schemeless)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), r":[0-9]+$", ""
    )


def registrable_domain_expr(url: Column) -> Column:
    """eTLD+1: last two host labels, or last three when the last two
    form a listed public suffix. IPv4 hosts pass through whole."""
    host = host_expr(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, -2, 2))
    last3 = F.concat_ws(".", F.slice(labels, -3, 3))
    is_ip = host.rlike(r"^[0-9.]+$")
    suffixes = F.array(*[F.lit(s) for s in TWO_LABEL_SUFFIXES])
    return (
        F.when(host == "", F.lit(""))
        .when(is_ip | (n <= 2), host)
        .when(F.array_contains(suffixes, last2), last3)
        .otherwise(last2)
    )


def registrable_domain_sql(url: str) -> str:
    """DuckDB twin of registrable_domain_expr."""
    host = (
        f"regexp_replace(lower(regexp_extract({url}, '{_HOST_RE}', 1)),"
        " ':[0-9]+$', '')"
    )
    in_list = ", ".join(f"'{s}'" for s in TWO_LABEL_SUFFIXES)
    return f"""CASE
  WHEN {host} = '' THEN ''
  WHEN regexp_matches({host}, '^[0-9.]+$')
       OR len(string_split({host}, '.')) <= 2 THEN {host}
  WHEN array_to_string(string_split({host}, '.')[-2:], '.')
       IN ({in_list})
    THEN array_to_string(string_split({host}, '.')[-3:], '.')
  ELSE array_to_string(string_split({host}, '.')[-2:], '.')
END"""


def domain_stats(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per registrable domain: page count, summed quality score, token
    total — the reputation table later passes broadcast against.
    Quality sums go through decimal(18,6) so the result is independent
    of partial-agg addition order (the repo-wide oracle pattern)."""
    tagged = df.select(
        registrable_domain_expr(F.col(url_col)).alias("domain"),
        F.round(tx.quality_score_expr(F.col(text_col)), 6)
        .cast("decimal(18,6)")
        .alias("_q"),
        tx.token_count_expr(F.col(text_col)).alias("_t"),
    )
    return tagged.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.round(F.sum("_q"), 2).cast("double").alias("sum_quality"),
        F.sum("_t").cast("long").alias("total_tokens"),
    )


def filter_blocklist(
    df: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose registrable domain appears in `blocked`
    (one column `domain`). Broadcast anti-join; page side keeps its
    partitioning."""
    tagged = df.withColumn(
        "_dom", registrable_domain_expr(F.col(url_col))
    )
    return (
        tagged.join(F.broadcast(blocked), tagged["_dom"] == blocked["domain"], "left_anti")
        .drop("_dom")
    )
