"""Benchmark-decontamination operator: n-gram overlap flags, counts,
single-scan plan shape."""

from pyspark.sql import functions as F

from mundipy_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontam_flags_overlap(spark):
    eval_text = "alpha beta gamma delta"
    docs = _docs(
        spark,
        [
            # contains the eval trigram "alpha beta gamma" once
            (1, "x y alpha beta gamma z"),
            # contains BOTH eval trigrams -> 2 hits
            (2, "alpha beta gamma delta tail"),
            # same tokens, different order -> clean
            (3, "gamma beta alpha delta x y"),
            # shorter than n -> 0 grams, clean
            (4, "just two"),
            # case-insensitive match
            (5, "ALPHA Beta GAMMA and more words"),
        ],
    )
    eval_set = _docs(spark, [(100, eval_text)])
    out = {
        r.doc_id: r
        for r in decontam.decontaminate(docs, eval_set, n=3).collect()
    }
    assert len(out) == 5
    assert (out[1].n_hits, out[1].contaminated) == (1, True)
    assert (out[2].n_hits, out[2].contaminated) == (2, True)
    assert (out[3].n_hits, out[3].contaminated) == (0, False)
    assert (out[4].n_grams, out[4].n_hits, out[4].contaminated) == (
        0,
        0,
        False,
    )
    assert out[5].contaminated
    # n_grams = tokens - n + 1
    assert out[1].n_grams == 4
    assert out[2].n_grams == 3


def test_decontam_repeated_gram_counts_positions(spark):
    docs = _docs(spark, [(1, "a b a b a b")])
    eval_set = _docs(spark, [(9, "a b")])
    row = decontam.decontaminate(docs, eval_set, n=2).collect()[0]
    # grams: (a b)(b a)(a b)(b a)(a b) -> "a b" at 3 positions
    assert (row.n_grams, row.n_hits) == (5, 3)


def test_decontam_single_scan_of_docs(spark, tmp_path):
    """The training side is scanned ONCE: n_grams rides through the
    explode + broadcast join instead of a second pass (the Mundi.q
    multi-scan class of bug)."""
    p = str(tmp_path / "docs.parquet")
    _docs(
        spark, [(i, f"tok{i} " * 12) for i in range(20)]
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    eval_set = docs.filter(F.col("doc_id") % 5 == 0)
    plan = decontam.decontaminate(docs, eval_set, n=8)._jdf.queryExecution().executedPlan().toString()
    # one scan for the (broadcast) eval side, one for the training side
    assert plan.count("Scan parquet") <= 2
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
