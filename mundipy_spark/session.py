"""SparkSession factory tuned for the engine.

Local-mode defaults sized for the sandbox (local[N] single JVM); on a real
cluster the same confs apply per-executor. AQE is on so skewed tile joins
re-plan at runtime; Arrow is on because every geometry kernel crosses the
JVM<->Python boundary as Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mundipy_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. Shuffle
    partitions default to the core count — the right size for local mode;
    at cluster scale callers override (rule of thumb: 2-3x total cores,
    bounded by ~128MB per shuffle partition at the target SF).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        # raise on unsafe pandas->Arrow casts instead of silently
        # truncating (e.g. a process fn returning 2.5 into a column the
        # first result typed as long would otherwise become 2)
        .config("spark.sql.execution.pandas.convertToArrowArraySafely", "true")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # Whole-stage codegen can emit consume() methods past HotSpot's
        # 8000-byte DontCompileHugeMethods threshold (e.g. the unrolled
        # JVM PIP refinement inside a broadcast-join condition); the JIT
        # then silently leaves the WHOLE probe loop interpreted —
        # measured 11s vs 5.5s on the 30M-page geocode join. Standard
        # Spark production setting; applies at JVM launch, so it lives
        # here in the session factory (driver == executor in local mode;
        # spark-submit clusters set the executor twin below).
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
    )
    return builder.getOrCreate()
