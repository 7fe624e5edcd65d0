"""Bucketed co-located joins: zero-Exchange plans on repeated big-big
equi-joins (the 100 TB answer to re-shuffling both sides every query)."""

import pytest
from pyspark.sql import functions as F

from mundipy_spark.sources import bucketed

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in the session warehouse dir; DROP TABLE below
    # removes their files
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        left = docs.select("doc_id", "text")
        right = docs.select("doc_id", F.length("text").alias("n_chars"))
        bucketed.write_bucketed(left, "docs_text_b", keys="doc_id", buckets=8)
        bucketed.write_bucketed(right, "docs_len_b", keys="doc_id", buckets=8)

        # disable auto-broadcast so the plan shows the big-big shape
        # bucketing exists for (fixture tables would broadcast otherwise)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed.bucketed_join(spark, "docs_text_b", "docs_len_b", on="doc_id")
        plan = bucketed.assert_no_shuffle(joined)  # raises on any Exchange
        assert "SortMergeJoin" in plan
        rows = joined.collect()
        assert len(rows) == docs.count()
        assert all(len(r.text) == r.n_chars for r in rows)

        # same-key aggregation is also Exchange-free on a bucketed table
        agg = spark.table("docs_text_b").groupBy("doc_id").agg(
            F.count("*").alias("n")
        )
        bucketed.assert_no_shuffle(agg)

        # a mis-bucketed pair (different bucket counts) must NOT pass
        bucketed.write_bucketed(right, "docs_len_b16", keys="doc_id", buckets=16)
        bad = bucketed.bucketed_join(spark, "docs_text_b", "docs_len_b16", on="doc_id")
        with pytest.raises(AssertionError):
            bucketed.assert_no_shuffle(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("docs_text_b", "docs_len_b", "docs_len_b16"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
