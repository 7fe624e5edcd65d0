"""Gopher rule gate: per-rule behavior on crafted documents."""

from pyspark.sql import functions as F

from mundipy_spark.operators import quality


def _rules(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return quality.gopher_rules(df).collect()[0]


def test_gopher_passes_clean_prose(spark):
    text = (
        "the quick brown fox jumps over and over the lazy dog that it "
        "met with great joy near the old stone bridge where children "
        "have played for years and the river bends to meet the sea "
        "while birds of every kind sing songs that carry far and wide "
        "across quiet valleys below"
    )
    r = _rules(spark, text)
    assert r.keep
    assert r.n_words >= 50 and r.n_stop >= 2 and r.r_alpha


def test_gopher_short_doc_fails_word_count_only(spark):
    r = _rules(spark, "the small and neat doc with that thing")
    assert not r.r_words and not r.keep
    assert r.r_word_len and r.r_symbols and r.r_alpha and r.r_stop


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join("- item number " + str(i) for i in range(10))
    r = _rules(spark, bullets)
    assert r.bullet_ratio == 1.0 and not r.r_bullets

    dots = "\n".join(f"this line number {i} trails off..." for i in range(10))
    r2 = _rules(spark, dots)
    assert r2.ellipsis_ratio == 1.0 and not r2.r_ellipsis


def test_gopher_symbol_and_alpha_rules(spark):
    hashy = " ".join("#tag" + str(i) for i in range(60))
    r = _rules(spark, hashy)
    assert r.symbol_ratio >= 1.0 and not r.r_symbols

    numeric = " ".join(str(i) for i in range(100))
    r2 = _rules(spark, numeric)
    assert r2.alpha_frac == 0.0 and not r2.r_alpha


def test_gopher_is_map_only(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.lit("the and with that words go here").alias("text"),
    )
    plan = (
        quality.gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
