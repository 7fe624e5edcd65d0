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


def test_anchor_terms_resolution_and_cleanup(spark):
    """Anchors resolve like links (absolute / protocol-relative /
    root-relative; path-relative dropped); inner markup is stripped,
    case folded, whitespace collapsed."""
    from mundipy_spark.operators import weblinks

    html = (
        '<a href="https://other.example.com/a">Read <b>This</b>  Now</a>'
        '<a href="//cdn.example.net/b">CDN   page</a>'
        '<a href="/local/c">Local Page</a>'
        '<a href="relative/d">dropped anchor</a>'
        '<a href="https://other.example.com/e"><img src="x"></a>'
    )
    pages = spark.createDataFrame(
        [("https://www.site.org/p/1", html)], "url string, html_text string"
    )
    got = {
        (r.dst_domain, r.term): r.n
        for r in weblinks.anchor_terms(pages).collect()
    }
    assert got == {
        ("example.com", "read"): 1,
        ("example.com", "this"): 1,
        ("example.com", "now"): 1,
        ("example.net", "cdn"): 1,
        ("example.net", "page"): 1,
        ("site.org", "local"): 1,
        ("site.org", "page"): 1,
    }
