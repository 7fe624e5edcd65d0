"""Registrable-domain extraction, domain stats, blocklist filter."""

from pyspark.sql import functions as F

from mundipy_spark.operators import domains


def _doms(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.d
        for r in df.select(
            domains.registrable_domain_expr(F.col("url")).alias("d")
        ).collect()
    ]


def test_registrable_domain_rules(spark):
    got = _doms(
        spark,
        [
            "https://example.org/x",
            "https://news.example.org/x",
            "https://a.b.news.example.org:8443/x",
            "https://WWW.BBC.CO.UK/news",
            "https://media.bbc.co.uk/clip",
            "https://shop.example.com.au/item",
            "http://192.168.0.1:8080/admin",
            "https://localhost/x",
            "not-a-url",
        ],
    )
    assert got == [
        "example.org",
        "example.org",
        "example.org",
        "bbc.co.uk",          # co.uk is a public suffix -> 3 labels
        "bbc.co.uk",
        "example.com.au",
        "192.168.0.1",        # IPs pass through whole
        "localhost",
        "",                   # schemeless: no host
    ]


def test_domain_stats_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.example.org/1", "good long text here"),
            (2, "https://b.example.org/2", "more text content"),
            (3, "https://bbc.co.uk/3", "uk text"),
        ],
        "doc_id long, url string, text string",
    )
    stats = {r.domain: r for r in domains.domain_stats(df).collect()}
    assert stats["example.org"].n_pages == 2
    assert stats["example.org"].total_tokens == 7
    assert stats["bbc.co.uk"].n_pages == 1

    blocked = spark.createDataFrame([("bbc.co.uk",)], "domain string")
    kept = domains.filter_blocklist(df, blocked)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    # anti-join is broadcast: page side must not shuffle
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
