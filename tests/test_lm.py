"""Integer-log2 n-gram LM familiarity scoring."""

from pyspark.sql import functions as F

from mundipy_spark.operators import lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bigram_counts_prunes(spark):
    ref = _docs(spark, [(1, "the cat sat"), (2, "the cat ran")])
    model = {r.gram: r.cnt for r in lm.train_bigram_counts(ref).collect()}
    # "the cat" x2 survives min_count=2; "cat sat"/"cat ran" pruned
    assert model == {"the cat": 2}


def test_lm_score_exact_integers(spark):
    ref = _docs(spark, [(1, "a b a b a b"), (2, "a b c")])
    # model: "a b" cnt 4 (3 + 1), "b a" cnt 2; "b c" cnt 1 pruned
    model = lm.train_bigram_counts(ref)
    docs = _docs(
        spark,
        [
            (10, "a b a"),   # grams: "a b"(cnt 4 -> ilog2(5)=2), "b a"(cnt 2 -> ilog2(3)=1)
            (11, "z z z"),   # unknown grams -> ilog2(1)=0
            (12, "one"),     # 1 token -> 0 bigrams
            (13, ""),        # empty
        ],
    )
    got = {r.doc_id: r for r in lm.lm_score(docs, model).collect()}
    assert (got[10].n_bigrams, got[10].sum_ilog) == (2, 3)
    assert (got[11].n_bigrams, got[11].sum_ilog) == (2, 0)
    assert (got[12].n_bigrams, got[12].sum_ilog) == (0, 0)
    assert (got[13].n_bigrams, got[13].sum_ilog) == (0, 0)


def test_lm_score_single_scan_and_broadcast(spark, tmp_path):
    p = str(tmp_path / "d.parquet")
    _docs(
        spark, [(i, f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4}") for i in range(16)]
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    model = lm.train_bigram_counts(docs.filter(F.col("doc_id") % 4 == 0))
    plan = (
        lm.lm_score(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan for the model side, one for the scoring side; model joins broadcast
    assert plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan
