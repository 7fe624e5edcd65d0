"""Tests for URL canonicalization / recrawl dedup and CCNet-style
paragraph dedup."""

from pyspark.sql import functions as F

from mundipy_spark.operators import paragraphs, weburl


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c for r in df.select(weburl.canonical_url_expr(F.col("url")).alias("c")).collect()
    ]


def test_canonical_url_forms(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.ORG:443/a/b/",
            "http://example.org:80/a",
            "http://example.org:8080/a",
            "https://example.org/p?utm_source=x&b=2&a=1#frag",
            "https://example.org/p?gclid=1&fbclid=2",
            "https://example.org/",
            "relative/path/only",
            "ftp://Files.Example.org:443/x",
        ],
    )
    assert got == [
        "https://example.org/a/b",
        "http://example.org/a",
        "http://example.org:8080/a",   # non-default port kept
        "https://example.org/p?a=1&b=2",  # sorted, tracking + frag gone
        "https://example.org/p",
        "https://example.org",
        "relative/path/only",          # schemeless passthrough
        "ftp://files.example.org:443/x",  # :443 only default for https
    ]


def test_recrawl_dedup_keeps_latest(spark):
    df = spark.createDataFrame(
        [
            (1, "https://example.org/p", 100),
            (2, "HTTPS://WWW.example.org/p/", 200),
            (3, "https://example.org/p?utm_source=x", 150),
            (4, "https://example.org/other", 50),
        ],
        "doc_id long, url string, warc_ts long",
    )
    out = {r.canon_url: r for r in weburl.recrawl_dedup(df).collect()}
    assert set(out) == {"https://example.org/p", "https://example.org/other"}
    surv = out["https://example.org/p"]
    assert (surv.doc_id, surv.n_forms) == (2, 3)
    assert out["https://example.org/other"].n_forms == 1


def test_split_paragraphs_chunking(spark):
    text = " ".join(f"w{i}" for i in range(25))
    df = spark.createDataFrame(
        [(0, text), (1, "a b"), (2, "   ")], "doc_id long, text string"
    )
    rows = paragraphs.split_paragraphs(df, chunk_tokens=12).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.idx, r.par))
    assert len(by_doc[0]) == 3  # 12 + 12 + 1
    assert by_doc[0][0][1].split() == [f"w{i}" for i in range(12)]
    assert by_doc[0][2][1] == "w24"
    assert by_doc[1] == [(0, "a b")]
    assert 2 not in by_doc  # whitespace-only -> no paragraphs


def test_dedup_paragraphs_first_occurrence(spark):
    # P tokens repeated across docs: doc 0 owns chunk A and B;
    # doc 1 repeats A then adds C; doc 2 is A+B again entirely.
    A = " ".join(["a"] * 12)
    B = " ".join(["b"] * 12)
    C = " ".join(["c"] * 12)
    df = spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{A} {C}"), (2, f"{A} {B}"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in paragraphs.dedup_paragraphs(df, chunk_tokens=12).collect()}
    assert (got[0].n_pars, got[0].n_kept) == (2, 2)
    assert got[0].kept_text == f"{A} {B}"
    assert (got[1].n_pars, got[1].n_kept) == (2, 1)
    assert got[1].kept_text == C
    assert (got[2].n_pars, got[2].n_kept) == (2, 0)
    assert got[2].kept_text == ""
    assert (got[3].n_pars, got[3].n_kept, got[3].kept_text) == (0, 0, "")


def test_dedup_paragraphs_plan_shape(spark, tmp_path):
    """The scale contract: winner selection is a whole-stage-codegen
    HashAggregate over the packed primitive (map-side combine collapses
    duplicates BEFORE the exchange) — never a Window and never a
    SortAggregate (strings in an agg buffer force the interpreted
    sorting fallback). Paragraph strings must not cross an exchange:
    the only string shuffle is the doc text feeding the rebuild join.
    Two column scans (explode + rebuild) are the accepted cost."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, " ".join(f"t{i % 3}_{j}" for j in range(30))) for i in range(12)],
        "doc_id long, text string",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (
        paragraphs.dedup_paragraphs(df, chunk_tokens=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 2
    assert "Window" not in plan
    assert "SortAggregate" not in plan
    assert "partial_min" in plan  # map-side combine of the packed key


def test_dedup_paragraphs_within_doc_repeat(spark):
    # a paragraph repeated INSIDE one doc is kept once (first idx)
    A = " ".join(["x"] * 12)
    df = spark.createDataFrame([(7, f"{A} {A}")], "doc_id long, text string")
    r = paragraphs.dedup_paragraphs(df, chunk_tokens=12).collect()[0]
    assert (r.n_pars, r.n_kept, r.kept_text) == (2, 1, A)


def test_dedup_paragraphs_packed_key_boundaries(spark):
    """The packed (doc_id<<IDX_BITS | idx) winner key: negative ids
    round-trip through the arithmetic shift with first-occurrence
    order preserved, and an out-of-contract doc_id raises instead of
    silently corrupting the packing."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bits = paragraphs._IDX_BITS
    # doc -5 precedes doc -2 precedes doc 3: the shared paragraph
    # survives only in doc -5
    df = spark.createDataFrame(
        [(-5, "a b c"), (-2, "a b c"), (3, "a b c x y z")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_kept, r.kept_text)
        for r in paragraphs.dedup_paragraphs(df, chunk_tokens=3).collect()
    }
    assert got[-5] == (1, "a b c")
    assert got[-2] == (0, "")
    assert got[3] == (1, "x y z")

    big = spark.createDataFrame(
        [(1 << (63 - bits), "a b c")], "doc_id long, text string"
    )
    with pytest.raises(SparkRuntimeException, match="dedup_paragraphs"):
        paragraphs.dedup_paragraphs(big, chunk_tokens=3).collect()


def test_dedup_paragraphs_integer_typed_ids(spark):
    """IntegerType id columns (the common parquet int) must not wrap in
    32-bit inside the packed key: shiftleft preserves its input type,
    so the id is cast to long BEFORE shifting. Regression: ids >= 2^11
    overflowed int32 (id<<20), decoded to garbage doc ids, and the
    rebuild join silently dropped every kept paragraph."""
    df = spark.createDataFrame(
        [(4096, "a b c"), (5000, "a b c"), (70000, "p q r")],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_pars, r.n_kept, r.kept_text)
        for r in paragraphs.dedup_paragraphs(df, chunk_tokens=3).collect()
    }
    assert got[4096] == (1, 1, "a b c")
    assert got[5000] == (1, 0, "")
    assert got[70000] == (1, 1, "p q r")


def test_recrawl_dedup_null_urls_pass_through(spark):
    """Distinct documents with NULL urls must each survive (window
    partitioning treats NULL as one group; the dedup key falls back to
    the row's own id)."""
    df = spark.createDataFrame(
        [
            (1, None, 100),
            (2, None, 200),
            (3, "https://example.org/p", 150),
            (4, "https://example.org/p", 160),
        ],
        "doc_id long, url string, warc_ts long",
    )
    out = {r.doc_id: r for r in weburl.recrawl_dedup(df).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].canon_url is None and out[1].n_forms == 1
    assert out[2].canon_url is None and out[2].n_forms == 1
    assert out[4].n_forms == 2
