"""Property-based webtext invariants (hypothesis): canonicalization
idempotence, span-dedup bounds, frontier round arithmetic. These run
the COLUMN EXPRESSIONS through Spark once per example batch (examples
are collected into one DataFrame per test to keep Spark round-trips
bounded)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mundipy_spark.operators import spandedup, weburl

url_chars = st.text(
    alphabet="abcXYZ019-._~/?&=#%:", min_size=0, max_size=30
)
urls = st.builds(
    lambda host, tail: f"https://{host}.org/{tail}",
    st.sampled_from(["a", "WWW.B", "c.d", "E:443"]),
    url_chars,
)

texts = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=0, max_size=24
).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(st.lists(urls, min_size=1, max_size=16))
def test_canonical_url_idempotent(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "u string")
    once = weburl.canonical_url_expr(F.col("u"))
    rows = df.select(
        once.alias("c1"), weburl.canonical_url_expr(once).alias("c2")
    ).collect()
    for r in rows:
        assert r.c1 == r.c2, (r.c1, r.c2)


@settings(max_examples=10, deadline=None)
@given(st.lists(texts, min_size=1, max_size=10))
def test_span_dedup_bounds(spark, batch):
    n = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    for r in spandedup.duplicate_spans(df, n=n).collect():
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert r.dup_tokens <= r.n_dup_grams * n
        # a duplicated window implies at least n covered tokens
        if r.n_dup_grams > 0:
            assert r.dup_tokens >= n
