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


def _pardedup_model(docs, c):
    """Pure-Python reference for dedup_paragraphs: first occurrence
    per paragraph fingerprint ordered by (doc_id, idx)."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.strip().split()
        pars = [
            " ".join(toks[i : i + c]) for i in range(0, len(toks), c)
        ]
        kept = []
        for p in pars:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[doc_id] = (len(pars), len(kept), " ".join(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(texts, min_size=1, max_size=12),
    st.sampled_from([1, 2, 3, 5]),
)
def test_dedup_paragraphs_matches_model(spark, batch, c):
    """The packed-key agg + rebuild-join plan is semantically identical
    to the straightforward first-occurrence model — including empty and
    whitespace-only docs, within-doc repeats, and chunk sizes that
    leave ragged tails."""
    from mundipy_spark.operators import paragraphs

    docs = [(i, t) for i, t in enumerate(batch)]
    model = _pardedup_model(docs, c)
    got = {
        r.doc_id: (r.n_pars, r.n_kept, r.kept_text)
        for r in paragraphs.dedup_paragraphs(
            spark.createDataFrame(docs, "doc_id long, text string"),
            chunk_tokens=c,
        ).collect()
    }
    assert got == model
