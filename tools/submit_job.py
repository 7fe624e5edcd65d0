"""spark-submit entry point: the geocode pipeline as a shipped job.

Usage (see tools/package.sh):
    spark-submit --master local[8] --py-files /tmp/mundipy_spark.zip \
        tools/submit_job.py [sf_dir] [out_dir]

Prints one JSON line with the run's lineage summary. The package zip is
the only code dependency — exactly how the job lands on a real cluster.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mundipy_spark_submit_out"

    spark = SparkSession.builder.appName("mundipy-spark-geocode").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from mundipy_spark.plans import pipeline

    result = pipeline.run_pipeline(spark, sf_dir, out_dir, resume=True)
    n_out = spark.read.parquet(result["out"]).count()
    result["rows_out"] = n_out
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
