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


def attribution_pairs_batch(
    events: DataFrame, max_lag_minutes: int = 30
) -> DataFrame:
    """All (click -> purchase) pairs for the same user with the click
    inside the attribution window before the purchase — the batch twin
    of attribution_pairs_stream, and the input to last-click
    attribution. One shuffle on user_id; per-user event counts are
    bounded in practice, AQE skew-split covers hot users."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.col("value").alias("buy_value"),
    )
    lag = F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
    return buys.join(
        clicks,
        on=[
            buys["user_id"] == clicks["user_id"],
            clicks["click_ts"] <= buys["buy_ts"],
            clicks["click_ts"] >= buys["buy_ts"] - lag,
        ],
    ).select(
        buys["user_id"],
        "buy_id",
        "buy_ts",
        "buy_value",
        "click_id",
        "click_ts",
    )


def attribution_pairs_stream(
    spark: SparkSession,
    path_glob: str,
    max_lag_minutes: int = 30,
    watermark: str = "60 minutes",
    query_name: str = "attribution_stream",
):
    """STREAM-STREAM inner join (the one streaming join shape the
    engine hadn't covered): two branches of the same event stream,
    each watermarked, joined on user + a time-range predicate so Spark
    can bound both join states (clicks retained only `watermark +
    max_lag` past their event time). Append mode — every emitted row
    is final; equality with attribution_pairs_batch is pytest-held."""
    ev = (
        spark.readStream.format("parquet").schema(EVENT_SCHEMA).load(path_glob)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("buy_ts"),
            F.col("value").alias("buy_value"),
        )
        .withWatermark("buy_ts", watermark)
    )
    joined = buys.join(
        clicks,
        on=F.expr(
            "user_id = c_user AND click_ts <= buy_ts "
            f"AND click_ts >= buy_ts - INTERVAL {int(max_lag_minutes)} MINUTES"
        ),
    ).select("user_id", "buy_id", "buy_ts", "buy_value", "click_id", "click_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def last_click_attribution(
    events: DataFrame, max_lag_minutes: int = 30
) -> DataFrame:
    """Last-click attribution: each purchase attributed to the LATEST
    in-window click (ties on click_id DESC — fully deterministic).
    Returns (buy_id, user_id, buy_ts, buy_value, click_id, click_ts,
    n_candidate_clicks)."""
    from pyspark.sql import Window

    pairs = attribution_pairs_batch(events, max_lag_minutes)
    w = Window.partitionBy("buy_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_candidate_clicks",
            F.count(F.lit(1)).over(Window.partitionBy("buy_id")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "buy_id",
            "user_id",
            "buy_ts",
            "buy_value",
            "click_id",
            "click_ts",
            "n_candidate_clicks",
        )
    )
