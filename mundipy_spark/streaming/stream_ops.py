"""Streaming operators: streamed geocode pipeline + watermarked windows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mundipy_spark.operators import geoparse, joins


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding window counts + sums per event_type with a
    watermark for late data — the standard Structured Streaming shape
    (append-mode capable)."""
    # parquet NTZ timestamps are not valid event-time columns; normalize
    # to session-TZ timestamps (session is pinned UTC)
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window(F.col("ts"), window, slide) if slide else F.window(F.col("ts"), window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def geocode_stream(
    pages_stream: DataFrame,
    regions: DataFrame,
    out_path: str,
    checkpoint_path: str,
    res: int = 8,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Stream pages through the geoparse -> tile -> broadcast-join plan.

    foreachBatch reuses the exact batch operator (joins.tile_join_points)
    so stream and batch results are identical by construction; Spark's
    streaming checkpoint gives exactly-once parquet output per batch.
    """

    def handle(batch: DataFrame, epoch_id: int) -> None:
        geo = geoparse.parse_geo_tokens(batch).filter(F.col("lat").isNotNull())
        tagged = joins.tile_join_points(geo, regions, res=res, how="inner")
        (
            tagged.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    writer = (
        pages_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(handle)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
