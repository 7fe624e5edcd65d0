"""Connected components + curation operators."""

from pyspark.sql import functions as F

from mundipy_spark.operators import curation, graph

SF = "/root/testdata/sf0.001"


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4-5 (diameter 4 -> exercises pointer jumping),
    # clique {10,11,12}, isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    cc = {r.node: r.component for r in graph.connected_components(pairs).collect()}
    assert {cc[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {cc[i] for i in (10, 11, 12)} == {10}
    assert {cc[i] for i in (20, 21)} == {20}


def test_connected_components_long_path_converges(spark):
    # a 40-node path: naive one-hop propagation needs 39 rounds; pointer
    # jumping must converge within the default max_iter=25
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a long, b long"
    )
    cc = graph.connected_components(pairs, max_iter=12)
    comps = {r.component for r in cc.collect()}
    assert comps == {0}


def test_dedup_clusters_canonical_flags(spark):
    pairs = spark.createDataFrame([(7, 3), (3, 9)], "a long, b long")
    docs = spark.createDataFrame([(i,) for i in (3, 7, 9, 99)], "doc_id long")
    out = {r.doc_id: (r.component, r.is_canonical) for r in graph.dedup_clusters(docs, pairs).collect()}
    assert out == {3: (3, True), 7: (3, False), 9: (3, False)}


def test_sample_by_hash_deterministic_and_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id for r in curation.sample_by_hash(docs, 0.25).select("doc_id").collect()}
    b = {r.doc_id for r in curation.sample_by_hash(docs.repartition(13), 0.25).select("doc_id").collect()}
    assert a == b  # partition layout cannot change the sample
    assert 0.1 < len(a) / docs.count() < 0.4
    # salt changes the sample
    c = {r.doc_id for r in curation.sample_by_hash(docs, 0.25, salt="v2").select("doc_id").collect()}
    assert c != a


def test_top_k_per_group(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "nc", F.length("text")
    )
    out = curation.top_k_per_group(docs, "source", "nc", k=2, tie_break="doc_id")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    full = {r.source: r.nc for r in docs.groupBy("source").agg(F.max("nc").alias("nc")).collect()}
    for src, grp in by_src.items():
        assert len(grp) <= 2
        assert max(g.nc for g in grp) == full[src]


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_every=N routes lineage truncation through reliable
    checkpoint() (survives executor loss in prod) — identical labels."""
    from mundipy_spark.operators import graph

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)] + [(1, 3), (5, 9), (20, 24)],
        "a long, b long",
    )
    base = {(r.node, r.component) for r in graph.connected_components(pairs).collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    ck = {
        (r.node, r.component)
        for r in graph.connected_components(pairs, checkpoint_every=2).collect()
    }
    assert ck == base


def test_ivf_probe_udf_no_centroid_literals(spark):
    """IVF query-side centroid scoring goes through the Arrow matmul UDF:
    the plan carries no n_clusters x dim float literal array, and results
    are unchanged vs brute force recall-wise."""
    from pyspark.sql import functions as F

    from mundipy_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    q = emb.filter(F.col("vec_id") < 10)
    out = similarity.ivf_topk(emb, q, k=5, n_clusters=8, n_probe=3, dim=64)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # a literal centroid array would appear as hundreds of float literals
    import re

    n_float_lits = len(re.findall(r"-?\d+\.\d{6,}", plan))
    assert n_float_lits < 64, n_float_lits
    rows = out.collect()
    assert len(rows) == 50
    assert {r.qid for r in rows} == set(range(10))


def test_assign_split_deterministic_and_proportional(spark):
    """Split membership is a pure function of the key: identical across
    partitionings, roughly proportional, and stable when the corpus
    grows (old rows keep their split)."""
    from mundipy_spark.operators import curation

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in curation.assign_split(df).collect()}
    s2 = {r.doc_id: r.split
          for r in curation.assign_split(df.repartition(13)).collect()}
    assert s1 == s2
    from collections import Counter

    c = Counter(s1.values())
    assert c["train"] > 4700 and 10 < c["val"] < 120 and 10 < c["test"] < 120
    # growth stability: the first 1000 rows keep their assignment
    s3 = {r.doc_id: r.split
          for r in curation.assign_split(df.filter("doc_id < 1000")).collect()}
    assert all(s1[k] == v for k, v in s3.items())
    # custom weights cover all rows
    s4 = curation.assign_split(df, {"a": 0.5, "b": 0.5}).groupBy("split").count()
    got = {r.split: r["count"] for r in s4.collect()}
    assert set(got) == {"a", "b"} and abs(got["a"] - got["b"]) < 500


def test_bpe_token_count_shapes(spark):
    """BPE-ish estimator: alpha runs ~len/4, digits and punctuation one
    each, whitespace free."""
    from pyspark.sql import functions as F

    from mundipy_spark.functions import text as tx

    df = spark.createDataFrame(
        [("internationalization",), ("a b c",), ("42!",), ("",), ("hello, world 99",)],
        "text string",
    )
    got = [r.n for r in df.select(tx.bpe_token_count_expr(F.col("text")).alias("n")).collect()]
    assert got[0] == 5   # ceil(20/4)
    assert got[1] == 3   # three 1-char words
    assert got[2] == 3   # 2 digits + '!'
    assert got[3] == 0
    assert got[4] == 2 + 1 + 2 + 2  # hello(2) ','(1) world(2) 99(2)
