"""Multinomial NB classifier: learning on separable vocab, tie-break
determinism, unknown-token smoothing."""

from pyspark.sql import functions as F

from mundipy_spark.operators import classifier


def _corpus(spark):
    rows = []
    for i in range(30):
        rows.append((i, "bonjour le monde les mots francais ici", "fr"))
        rows.append((100 + i, "hello the world these english words here", "en"))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_learns_separable_vocab(spark):
    labeled = _corpus(spark)
    tm, cs = classifier.train_nb(labeled)
    test = spark.createDataFrame(
        [
            (1000, "bonjour les mots"),
            (1001, "hello english words"),
        ],
        "doc_id long, text string",
    )
    preds = {r.doc_id: r.pred_label for r in classifier.nb_score(test, tm, cs).collect()}
    assert preds == {1000: "fr", 1001: "en"}


def test_nb_unknown_tokens_score_prior_minus_denominator(spark):
    """A doc of never-seen tokens scores each class exactly
    ilog2(n_docs+1) - m*ilog2(tok_total+1): verify the closed form.
    en: 50 docs, 310 tokens -> 5 - 3*8 = -19;
    fr: 30 docs, 210 tokens -> 4 - 3*7 = -17 -> fr wins."""
    labeled = _corpus(spark).union(
        spark.createDataFrame(
            [(500 + i, "hello again extra english data", "en") for i in range(20)],
            "doc_id long, text string, label string",
        )
    )
    tm, cs = classifier.train_nb(labeled)
    test = spark.createDataFrame(
        [(2000, "zzz qqq vvv")], "doc_id long, text string"
    )
    r = classifier.nb_score(test, tm, cs).collect()[0]
    assert (r.pred_label, r.best_score) == ("fr", -17)


def test_nb_tie_breaks_label_ascending(spark):
    """Perfectly symmetric classes -> equal scores -> label asc wins."""
    labeled = spark.createDataFrame(
        [(1, "aa bb", "x"), (2, "aa bb", "y")],
        "doc_id long, text string, label string",
    )
    tm, cs = classifier.train_nb(labeled)
    test = spark.createDataFrame([(10, "aa bb")], "doc_id long, text string")
    r = classifier.nb_score(test, tm, cs).collect()[0]
    assert r.pred_label == "x"


def test_nb_scoring_join_is_broadcast(spark):
    labeled = _corpus(spark)
    tm, cs = classifier.train_nb(labeled)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hello word "), F.col("id")).alias("text"),
    )
    out = classifier.nb_score(docs, tm, cs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 100
