"""Structured Streaming layer.

The reference is batch-only (SURVEY.md §1.4: no event-time/watermark
notion), but the engine's web-page ingest is stream-shaped, so the
windowed aggregation is provided in both batch and streaming forms
with identical semantics; the streaming test drives parquet files
through readStream -> memory sink and asserts equality with the batch
plan.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_batch(events: DataFrame, window: str = "5 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
    )


def windowed_counts_stream(
    spark: SparkSession,
    path_glob: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    query_name: str = "events_windowed_stream",
):
    """readStream over parquet -> watermarked tumbling window -> memory
    sink. Returns the started StreamingQuery; call
    q.processAllAvailable() then read `SELECT * FROM <query_name>`."""
    events = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .load(path_glob)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "sum_value"
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative gap count (batch form of
    session_window): one shuffle on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_id",
        F.concat_ws(
            "-",
            F.col("user_id").cast("string"),
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).cast("string"),
        ),
    )
