"""robots.txt parsing + URL permission evaluation — the crawl-side
gate of the Robots Exclusion Protocol (RFC 9309, public spec). A
corpus builder replaying raw crawls re-checks permission before
keeping a page; this implements the standard longest-match semantics
for the wildcard agent group.

Both halves are pure DataFrame ops, value-exact against the DuckDB
twin:

- `parse_robots`: robots.txt BODIES (one row per host) -> rule rows
  (host, allow, prefix). Group attribution (which user-agent block a
  rule belongs to) follows RFC 9309 §2.2.1: consecutive `User-agent:`
  lines form ONE group (a new group starts only at a user-agent line
  whose predecessor was a rule line), so in
  `User-agent: *\nUser-agent: googlebot\nDisallow: /x` the rule
  belongs to both agents. Implemented as a lag + running-sum window
  per host ordered by line number; groups naming `*` apply. Rules
  with empty paths are ignored per the RFC.
- `robots_allowed`: longest-matching-prefix rule decides; Allow wins
  prefix-length ties (Google/RFC tie-break); no matching rule =>
  allowed. Wildcards inside patterns (*, $) are intentionally out of
  scope (documented subset — plain-prefix rules dominate real files).

Scale shape (10^12 urls, ~10^8 hosts): the parsed rule table is
host-keyed and small relative to the URL stream -> BROADCAST; the
probe side computes (host, path) map-side and the per-URL decision is
a higher-order-function fold over that host's rules INSIDE the join
projection — zero shuffles on the URL stream. The only shuffles are
the tiny robots-side window and agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#?]*)"


def url_host_expr(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_path_expr(url: Column) -> Column:
    """Path component; empty becomes '/' (RFC: bare host means '/')."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, allow: boolean, prefix) for every Allow/Disallow rule in
    a `*` user-agent group. Lines are trimmed; comments (#...) are
    stripped; directive names are case-insensitive."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(body_col), r"\n")).alias("ln", "_raw"),
    ).select(
        host_col,
        "ln",
        F.trim(F.regexp_replace(F.col("_raw"), r"#.*$", "")).alias("line"),
    )
    directive = F.lower(F.regexp_extract(F.col("line"), r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(F.col("line"), r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    typed = lines.select(
        host_col, "ln", directive.alias("d"), value.alias("v")
    ).filter(F.col("d").isin("user-agent", "allow", "disallow"))
    # group id: a user-agent line OPENS a new group only when the
    # previous typed line was not itself a user-agent line (RFC 9309
    # multi-agent groups: consecutive UA lines share one rule block)
    w = Window.partitionBy(host_col).orderBy("ln")
    is_ua = F.col("d") == "user-agent"
    opens = is_ua & (
        F.lag("d").over(w).isNull() | (F.lag("d").over(w) != "user-agent")
    )
    grouped = typed.withColumn(
        "grp", F.sum(F.when(opens, 1).otherwise(0)).over(w)
    )
    star_groups = (
        grouped.filter((F.col("d") == "user-agent") & (F.col("v") == "*"))
        .select(host_col, "grp")
        .distinct()
    )
    return (
        grouped.filter(F.col("d").isin("allow", "disallow") & (F.col("v") != ""))
        .join(star_groups, on=[host_col, "grp"])
        .select(
            host_col,
            (F.col("d") == "allow").alias("allow"),
            F.col("v").alias("prefix"),
        )
    )


def robots_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """urls + (host, path, allowed). Longest matching prefix decides;
    Allow wins length ties; no match => allowed. The rule table is
    collapsed to one array per host and BROADCAST; the decision is a
    fold inside the join projection, so the URL stream never
    shuffles."""
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("allow", "prefix")).alias("_rules")
    )
    probe = urls.withColumn("host", url_host_expr(F.col(url_col))).withColumn(
        "path", url_path_expr(F.col(url_col))
    )
    joined = probe.join(F.broadcast(per_host), on="host", how="left")
    matching = F.filter(
        F.col("_rules"), lambda r: F.col("path").startswith(r["prefix"])
    )
    # best = max by (prefix length, allow) — allow=true sorts after
    # false, so ties at equal length resolve to allow
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"), r["allow"].alias("a")
            ),
        )
    )
    allowed = F.when(
        F.col("_rules").isNull() | (F.size(matching) == 0), F.lit(True)
    ).otherwise(best["a"])
    return joined.select(
        *[c for c in urls.columns], "host", "path", allowed.alias("allowed")
    )


def robots_rules_sql(robots_sql: str, host_col: str = "host", body_col: str = "body") -> str:
    """DuckDB twin of parse_robots over `robots_sql` (host, body)."""
    return f"""
WITH robots AS ({robots_sql}),
split AS (
  SELECT {host_col} AS host, string_split({body_col}, chr(10)) AS ls
  FROM robots
), lines AS (
  SELECT host, ln, trim(regexp_replace(ls[ln], '#.*$', '')) AS line
  FROM split, UNNEST(range(1, len(ls) + 1)) u(ln)
), typed AS (
  SELECT host, ln,
         lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS d,
         trim(regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1)) AS v
  FROM lines
  WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1))
        IN ('user-agent', 'allow', 'disallow')
), lagged AS (
  SELECT *, lag(d) OVER (PARTITION BY host ORDER BY ln) AS prev_d
  FROM typed
), grouped AS (
  SELECT host, ln, d, v,
         sum(CASE WHEN d = 'user-agent'
                   AND (prev_d IS NULL OR prev_d <> 'user-agent')
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY host ORDER BY ln) AS grp
  FROM lagged
), star_groups AS (
  SELECT DISTINCT host, grp FROM grouped
  WHERE d = 'user-agent' AND v = '*'
)
SELECT g.host, g.d = 'allow' AS allow, g.v AS prefix
FROM grouped g JOIN star_groups s ON s.host = g.host AND s.grp = g.grp
WHERE g.d IN ('allow', 'disallow') AND g.v <> ''
"""


def robots_allowed_sql(urls_sql: str, robots_sql: str, url_col: str = "url") -> str:
    """DuckDB twin of parse_robots + robots_allowed composed."""
    host = f"lower(regexp_extract({url_col}, '{_HOST_RE}', 1))"
    path = f"""CASE WHEN regexp_extract({url_col}, '{_PATH_RE}', 1) = ''
               THEN '/' ELSE regexp_extract({url_col}, '{_PATH_RE}', 1) END"""
    return f"""
WITH urls AS ({urls_sql}),
rules AS ({robots_rules_sql(robots_sql)}),
probe AS (
  SELECT u.*, {host} AS host, {path} AS path FROM urls u
), matched AS (
  SELECT p.{url_col}, p.host, p.path, r.allow, r.prefix,
         row_number() OVER (
           PARTITION BY p.{url_col}
           ORDER BY length(r.prefix) DESC, r.allow DESC
         ) AS rk
  FROM probe p JOIN rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
)
SELECT p.*, coalesce(m.allow, TRUE) AS allowed
FROM probe p
LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m
  ON m.{url_col} = p.{url_col}
"""
