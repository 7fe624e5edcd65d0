"""Outlink extraction + host-graph edges."""

from pyspark.sql import functions as F

from mundipy_spark.operators import weblinks


def test_extract_links_resolution(spark):
    html = (
        '<a href="https://other.org/x">a</a>'
        '<a href="//cdn.example.org/lib.js">b</a>'
        '<a href="/local/page">c</a>'
        '<a href="relative/skip">d</a>'
        '<a href="https://frag.org/p#sec">e</a>'
    )
    df = spark.createDataFrame(
        [(html, "https://news.example.org/base/dir")], "h string, u string"
    )
    got = df.select(
        weblinks.extract_links_expr(F.col("h"), F.col("u")).alias("l")
    ).collect()[0].l
    assert got == [
        "https://other.org/x",
        "https://cdn.example.org/lib.js",
        "https://news.example.org/local/page",
        "https://frag.org/p",
    ]


def test_host_edges_weights_and_self_drop(spark):
    rows = [
        (
            '<a href="https://b.org/1">.</a><a href="https://b.org/2">.</a>'
            '<a href="https://a.org/self">.</a>',
            "https://www.a.org/p",
        ),
        ('<a href="https://a.org/x">.</a>', "https://b.org/q"),
    ]
    df = spark.createDataFrame(rows, "html_text string, url string")
    got = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in weblinks.host_edges(df).collect()
    }
    assert got == {("a.org", "b.org"): 2, ("b.org", "a.org"): 1}
