"""HTML->text extraction, duplicate-span detection, DSIR importance
weights — the three late-round-3 webtext operators."""

import pytest
from pyspark.sql import functions as F

from mundipy_spark.operators import html as H
from mundipy_spark.operators import importance, spandedup


def test_extract_text_full_markup(spark):
    doc = (
        '<html><head><title>My Title</title><script>var x="<p>";</script>'
        "<style>p {color:red}</style></head><body><!-- note -->"
        '<h1 class="big">Header &amp; more</h1>\n'
        "<p>first   para with &lt;tags&gt; and &quot;quotes&quot;</p>"
        "<div>second\tdiv&nbsp;here</div><ul><li>item one</li>"
        '<li>item two</li></ul><br/><a href="/x">link text</a> tail</body>'
    )
    df = spark.createDataFrame([(doc,)], "html string")
    out = df.select(H.extract_text_expr(F.col("html")).alias("t")).first().t
    assert out == (
        "My Title\nHeader & more\n"
        'first para with <tags> and "quotes"\n'
        "second div here\nitem one\nitem two\nlink text tail"
    )


def test_extract_text_binary_column_and_passthrough(spark):
    """The per-url invariant: body text with no markup round-trips
    byte-identically through encode -> extract."""
    texts = ["plain words only", "a  b", "x"]
    df = spark.createDataFrame([(t,) for t in texts], "t string").withColumn(
        "html", F.encode(F.concat(F.lit("<p>"), F.col("t"), F.lit("</p>")), "UTF-8")
    )
    rows = H.extract_text(df, html_col="html", out_col="e").collect()
    for r in rows:
        # whitespace collapse is part of the canonical form; single-space
        # text is untouched
        expect = " ".join(r.t.split())
        assert r.e == expect


def test_extract_text_is_map_only(spark):
    """Zero exchanges: extraction must stay embarrassingly parallel."""
    df = spark.range(10).withColumn(
        "html", F.concat(F.lit("<p>x "), F.col("id"), F.lit("</p>"))
    )
    plan = (
        H.extract_text(df, html_col="html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_duplicate_spans_cross_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x b c d y")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in spandedup.duplicate_spans(docs, n=3).collect()
    }
    for i in (1, 2):
        assert rows[i].n_tokens == 5
        assert rows[i].n_grams == 3
        # only "b c d" repeats; it covers token positions 2..4
        assert rows[i].n_dup_grams == 1
        assert rows[i].dup_tokens == 3


def test_duplicate_spans_self_repeat_and_short_doc(spark):
    docs = spark.createDataFrame(
        [(1, "p q p q p q"), (2, "solo")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in spandedup.duplicate_spans(docs, n=2).collect()
    }
    # grams: "p q" x3, "q p" x2 -> all 5 window positions duplicated,
    # all 6 tokens covered
    assert rows[1].n_dup_grams == 5
    assert rows[1].dup_tokens == 6
    assert rows[2].n_grams == 0
    assert rows[2].n_dup_grams == 0
    assert rows[2].dup_tokens == 0


def test_dsir_exact_tiny_case(spark):
    raw = spark.createDataFrame(
        [(1, "a b"), (2, "z z")], "doc_id long, text string"
    )
    target = raw.filter(F.col("doc_id") == 1)
    rows = {
        r.doc_id: r
        for r in importance.importance_weights(
            raw, target, n=2, n_buckets=997
        ).collect()
    }
    # doc1's bigram bucket: t_cnt=1, r_cnt=1 -> ilog2(2)-ilog2(2)=0
    # doc2's bigram bucket: t_cnt=0, r_cnt=1 -> ilog2(1)-ilog2(2)=-1
    assert rows[1].n_grams == 1 and rows[1].dsir_sum == 0
    assert rows[2].n_grams == 1 and rows[2].dsir_sum == -1


def test_dsir_prefers_target_like_docs(spark):
    target_like = "the quick brown fox jumps over the lazy dog " * 3
    off_domain = "zzz qqq vvv kkk jjj www eee rrr ttt yyy " * 3
    raw = spark.createDataFrame(
        [(i, target_like) for i in range(5)]
        + [(i + 10, off_domain) for i in range(5)],
        "doc_id long, text string",
    )
    target = raw.filter(F.col("doc_id") < 5)
    rows = importance.importance_weights(raw, target).collect()
    mean = {
        True: [r.dsir_sum for r in rows if r.doc_id < 5],
        False: [r.dsir_sum for r in rows if r.doc_id >= 10],
    }
    assert min(mean[True]) > max(mean[False])


def test_dsir_model_is_bounded_and_broadcast(spark):
    """The merged model can never exceed n_buckets rows, and the scoring
    join is a broadcast."""
    raw = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} common tail") for i in range(40)],
        "doc_id long, text string",
    )
    out = importance.importance_weights(raw, raw.limit(10), n_buckets=31)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 40


def test_duplicate_spans_single_window_pass(spark, tmp_path):
    """The fp-window subtree must execute once: the naive two-agg shape
    re-ran scan+explode+window for the coverage count."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"w{i % 4} common words here w{i % 3}") for i in range(50)],
        "doc_id long, text string",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = (
        spandedup.duplicate_spans(docs, n=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1
    assert plan.count("Scan parquet") <= 2  # totals + grams


def test_dsir_raw_counts_injection(spark):
    """Precomputed raw_counts (the 10^12-doc sampled-fit path) gives
    identical results when built from the full raw side."""
    raw = spark.createDataFrame(
        [(i, f"a{i % 5} b{i % 3} c common") for i in range(20)],
        "doc_id long, text string",
    )
    target = raw.filter(F.col("doc_id") % 4 == 0)
    full = importance.importance_weights(raw, target, n_buckets=97)
    pre = importance.bucket_counts(raw, n=2, n_buckets=97)
    inj = importance.importance_weights(
        raw, target, n_buckets=97, raw_counts=pre
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, inj.collect())
    )


def test_robots_noindex_both_attribute_orders(spark):
    samples = [
        ('<meta name="robots" content="noindex, nofollow">', True),
        ("<META CONTENT='NOINDEX' NAME='ROBOTS'>", True),
        ('<meta name="robots" content="index, follow">', False),
        ('<meta name="viewport" content="noindex-like">', False),
        ("no meta at all", False),
        ('<meta name=robots content=noindex>', True),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(samples)], "i int, html string"
    )
    got = {
        r.i: r.f
        for r in df.select(
            "i", H.robots_noindex_expr(F.col("html")).alias("f")
        ).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(samples)}

    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE s(i int, html varchar)")
    con.executemany(
        "INSERT INTO s VALUES (?, ?)", [(i, s) for i, (s, _) in enumerate(samples)]
    )
    dk = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {H.robots_noindex_sql('html')} FROM s"
        ).fetchall()
    }
    assert dk == got


def test_snapshot_diff_statuses(spark):
    from mundipy_spark.operators import weburl

    old = spark.createDataFrame(
        [("u1", 10), ("u2", 20), ("u3", 30)], "canon_url string, fingerprint long"
    )
    new = spark.createDataFrame(
        [("u1", 10), ("u2", 99), ("u4", 40)], "canon_url string, fingerprint long"
    )
    got = {
        r.canon_url: r.status
        for r in weburl.snapshot_diff(old, new).collect()
    }
    assert got == {
        "u1": "unchanged",
        "u2": "changed",
        "u3": "removed",
        "u4": "added",
    }


def test_snapshot_diff_hash_collision_split(spark):
    """A hash-collided key pairing two DIFFERENT urls must not yield a
    spurious 'changed' row — it splits into added + removed. Forced
    via the key_expr seam (everything hashes to 0)."""
    from pyspark.sql import functions as F

    from mundipy_spark.operators import weburl

    old = spark.createDataFrame(
        [("uA", 10)], "canon_url string, fingerprint long"
    )
    new = spark.createDataFrame(
        [("uB", 11)], "canon_url string, fingerprint long"
    )
    rows = {
        r.canon_url: (r.status, r.old_fp, r.new_fp)
        for r in weburl.snapshot_diff(
            old, new, key_expr=lambda c: F.lit(0)
        ).collect()
    }
    assert rows == {"uA": ("removed", 10, None), "uB": ("added", None, 11)}

    # same seam, same url: still matches normally
    got = weburl.snapshot_diff(
        old,
        spark.createDataFrame([("uA", 99)], "canon_url string, fingerprint long"),
        key_expr=lambda c: F.lit(0),
    ).collect()
    assert [(r.canon_url, r.status) for r in got] == [("uA", "changed")]


def test_extract_text_cross_engine_fuzz(spark):
    """Randomized Spark-vs-DuckDB parity over adversarial html-ish
    strings: tags, partial tags, entities, script/style/comment
    fragments, mixed whitespace. Guards the Java-regex/RE2
    common-subset claim the value-exact oracle rests on."""
    import random

    import duckdb

    rng = random.Random(1234)
    frags = [
        "<p>", "</p>", "<div >", "</div>", "<br/>", "<br >", "<BR>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "<a href='x'>", "</a>", "<h1 class='t'>", "</h1>", "<li>", "</li>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;",
        "word", "two words", "  ", "\t", "\n", "\r\n", "...", "#", "<",
        ">", "x<y", "a&b", "<p", "p>", "<>", "</>", "<!---->",
        '<meta name="robots" content="noindex">',
        "<meta content='noindex' name='robots'>",
    ]
    samples = []
    for _ in range(300):
        k = rng.randint(0, 12)
        samples.append("".join(rng.choice(frags) for _ in range(k)))
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, html string"
    )
    srows = {
        r.i: (r.t, r.n)
        for r in df.select(
            "i",
            H.extract_text_expr(F.col("html")).alias("t"),
            H.robots_noindex_expr(F.col("html")).alias("n"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE s(i int, html varchar)")
    con.executemany("INSERT INTO s VALUES (?, ?)", list(enumerate(samples)))
    drows = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT i, {H.extract_text_sql('html')}, {H.robots_noindex_sql('html')} FROM s"
        ).fetchall()
    }
    bad = [
        (i, samples[i], srows[i], drows[i])
        for i in range(len(samples))
        if srows[i] != drows[i]
    ]
    assert not bad, bad[:3]
