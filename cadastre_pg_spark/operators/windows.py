"""Sliding-window event analytics — time-RANGE window frames over the
user timeline (the batch twin of the streaming windowed aggregations in
streaming/events.py; reference analog: the A-family per-entity stats).

Scale shape: the canonical window plan — ONE exchange on user_id, one
per-partition sort on the event time, then a running frame scan; no
self-join, no explode. Sums go through DECIMAL(18,2) casts so the
frame aggregation is order-independent and exactly replayable by the
DuckDB oracle (repo invariant). The frame is anchored on
microsecond epochs (unix_micros == DuckDB epoch_us) because the test
events carry sub-second timestamps — truncating to seconds would move
frame boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HOUR_US = 3_600_000_000


def sliding_user_stats(events: DataFrame, window_us: int = HOUR_US) -> DataFrame:
    """Per event: count / exact sum / mean of `value` over the trailing
    `window_us` microseconds of the same user's events (RANGE frame —
    simultaneous events are peers and always share a frame)."""
    w = (
        Window.partitionBy("user_id")
        # ts is TIMESTAMP_NTZ in the driver parquet; unix_micros wants
        # TIMESTAMP — the cast is value-identical under the UTC session
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-window_us, 0)
    )
    sum_dec = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        cnt.alias("n_win"),
        sum_dec.cast("double").alias("sum_win"),
        (sum_dec.cast("double") / cnt).alias("avg_win"),
    )
