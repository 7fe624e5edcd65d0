"""URL canonicalization + recrawl dedup for web-crawl pipelines.

Canonicalization is the standard crawl-frontier normal form:
lowercase scheme and host, strip a leading `www.`, drop the scheme's
default port (:80 http / :443 https), drop the fragment, strip all
trailing slashes from the path (one-pass idempotent — the property
tests caught that '/$' left '//' non-idempotent), remove tracking query params
(utm_*, gclid, fbclid) and SORT the surviving params.

Everything is engine-portable regexp_extract / split / filter /
sort — no lookarounds, no Python — so the DuckDB oracle reproduces
the canonical string byte-for-byte, and on Spark the whole transform
is map-only inside whole-stage codegen (at 10^12 pages the only
shuffle in recrawl_dedup is the one window on the canonical key).

URLs without a `scheme://` prefix pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
# path+query = everything after host up to the fragment
_PATHQ_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
_TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid)="


def canonical_url_expr(url: Column) -> Column:
    """Column expression: canonical form of `url` (see module doc)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport),
        r"^www\.",
        "",
    )
    pathq = F.regexp_extract(url, _PATHQ_RE, 1)
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"^[^?]*\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    canon_q = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(rebuilt)


def canonical_url_sql(url: str) -> str:
    """DuckDB twin of canonical_url_expr over the SQL expression `url`."""
    scheme = f"lower(regexp_extract({url}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({url}, '{_HOST_RE}', 1))"
    host = f"""regexp_replace(
        CASE WHEN {scheme} = 'http' THEN regexp_replace({hostport}, ':80$', '')
             WHEN {scheme} = 'https' THEN regexp_replace({hostport}, ':443$', '')
             ELSE {hostport} END,
        '^www\\.', '')"""
    pathq = f"regexp_extract({url}, '{_PATHQ_RE}', 1)"
    path = f"regexp_replace(regexp_extract({pathq}, '^([^?]*)', 1), '/+$', '')"
    query = f"regexp_extract({pathq}, '^[^?]*\\?(.*)$', 1)"
    params = f"""list_sort(list_filter(string_split({query}, '&'),
        p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"""
    canon_q = f"array_to_string({params}, '&')"
    return f"""CASE WHEN {scheme} = '' THEN {url} ELSE
        {scheme} || '://' || {host} || {path} ||
        CASE WHEN {canon_q} <> '' THEN '?' || {canon_q} ELSE '' END END"""


def recrawl_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the LATEST crawl per canonical URL (ties -> min id):
    the recrawl-collapse pass every Common-Crawl-style pipeline runs
    before content dedup. Adds `canon_url` and `n_forms` (how many
    raw rows collapsed into the survivor). Exactly one shuffle, keyed
    by the canonical URL (uniform — no skew beyond genuinely
    hot URLs, which AQE skew-join handling covers)."""
    canon = df.withColumn("canon_url", canonical_url_expr(F.col(url_col)))
    # NULL urls canonicalize to NULL, and window partitioning treats
    # NULL as one group — distinct null-url documents would collapse to
    # a single survivor. Key such rows by their own id instead: each
    # passes through unchanged (canon_url stays NULL in the output).
    dedup_key = F.coalesce(
        F.col("canon_url"),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(dedup_key)
    ordered = Window.partitionBy(dedup_key).orderBy(
        F.col(ts_col).desc(), F.col(id_col).asc()
    )
    return (
        canon.withColumn("n_forms", F.count("*").over(w))
        .withColumn("_rn", F.row_number().over(ordered))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "canon_url",
    fp_col: str = "fingerprint",
    key_expr=None,
) -> DataFrame:
    """Recrawl change detection between two crawl snapshots (already
    collapsed per canonical URL, e.g. by recrawl_dedup): one row per
    URL present in either snapshot with status 'added' / 'removed' /
    'changed' / 'unchanged' plus both content fingerprints.

    Scale shape: ONE full-outer shuffle join keyed by the compact
    56-bit hash of the canonical URL (functions/text.md5_int_expr) —
    the string key never becomes the shuffle key (the r01 text-keyed-
    join lesson); each side carries (key, url, fp) only. Freshness
    dashboards and selective-recrawl schedulers are the consumers.

    Collision safety (the 10^12-URL contract): a matched key is
    CONFIRMED by string equality on the carried URLs; a hash-collided
    mismatch is split into an `added` + a `removed` row instead of a
    spurious `changed`, so cross-snapshot birthday collisions at
    2^56 never pair unrelated URLs. Residual assumption: each
    snapshot holds at most one URL per 56-bit key (recrawl_dedup
    collapses per canonical URL; a WITHIN-snapshot collision is
    ~n^2/2^57 — at 10^9 rows/snapshot ~7 pairs, at which point widen
    the key)."""
    from mundipy_spark.functions import text as tx

    key = key_expr if key_expr is not None else tx.md5_int_expr
    o = old.select(
        key(F.col(url_col)).alias("_k"),
        F.col(url_col).alias("_ourl"),
        F.col(fp_col).alias("old_fp"),
    )
    n = new.select(
        key(F.col(url_col)).alias("_k"),
        F.col(url_col).alias("_nurl"),
        F.col(fp_col).alias("new_fp"),
    )
    joined = o.join(n, on="_k", how="full")
    row = lambda url, status, ofp, nfp: F.struct(  # noqa: E731
        url.alias("u"), status.alias("s"), ofp.alias("of"), nfp.alias("nf")
    )
    # type-matched NULLs (fp_col may be any comparable type)
    null_ofp = F.when(F.lit(False), F.col("old_fp"))
    null_nfp = F.when(F.lit(False), F.col("new_fp"))
    collided = (
        F.col("_ourl").isNotNull()
        & F.col("_nurl").isNotNull()
        & (F.col("_ourl") != F.col("_nurl"))
    )
    status = (
        F.when(F.col("_ourl").isNull(), F.lit("added"))
        .when(F.col("_nurl").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    rows = F.when(
        collided,
        F.array(
            row(F.col("_ourl"), F.lit("removed"), F.col("old_fp"), null_nfp),
            row(F.col("_nurl"), F.lit("added"), null_ofp, F.col("new_fp")),
        ),
    ).otherwise(
        F.array(
            row(
                F.coalesce("_ourl", "_nurl"),
                status,
                F.col("old_fp"),
                F.col("new_fp"),
            )
        )
    )
    return joined.select(F.explode(rows).alias("_r")).select(
        F.col("_r.u").alias(url_col),
        F.col("_r.s").alias("status"),
        F.col("_r.of").alias("old_fp"),
        F.col("_r.nf").alias("new_fp"),
    )


def snapshot_diff_sql(old_sql: str, new_sql: str, url_col: str = "canon_url") -> str:
    """DuckDB twin: `old_sql` / `new_sql` are subqueries yielding
    (canon_url, fingerprint)."""
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql}),
j AS (
  SELECT o.{url_col} AS ourl, n.{url_col} AS nurl,
         o.fingerprint AS old_fp, n.fingerprint AS new_fp
  FROM o FULL OUTER JOIN n ON n.{url_col} = o.{url_col}
)
SELECT coalesce(ourl, nurl) AS {url_col},
       CASE WHEN ourl IS NULL THEN 'added'
            WHEN nurl IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_fp, new_fp
FROM j
"""
