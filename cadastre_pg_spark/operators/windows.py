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


PATH_UNIT = 1e12  # 1 unit = 1e-12 deg; country-scale paths stay < 2^53


def user_path_length(points: DataFrame) -> DataFrame:
    """Per-user trajectory length — the movement analytics join of the
    event timeline with the point derivation (geospatial x events):
    order each user's points by (ts, event_id), take consecutive
    planar step distances, and sum them EXACTLY by flooring each step
    to integer 1e-12-degree units (the pagerank quantization trick:
    floor-on-double is bitwise-portable across engines where
    double->DECIMAL casts are not; BIGINT sums are order-independent).

    Input: (event_id, user_id, ts, lon, lat). Output per user:
    n_steps, path_len (units /1e12, double), max_step (exact MAX on
    doubles — no quantization needed for comparisons).

    Scale shape: one exchange on user_id + per-partition sort (the
    canonical window plan), then a hash aggregate with map-side
    partials. Nothing wider than 5 narrow columns ever shuffles.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    dx = F.col("lon") - F.lag("lon").over(w)
    dy = F.col("lat") - F.lag("lat").over(w)
    dist = F.sqrt(dx * dx + dy * dy)
    stepped = points.select(
        "user_id",
        dist.alias("dist"),
        F.floor(dist * F.lit(PATH_UNIT)).alias("du"),
    )
    return stepped.groupBy("user_id").agg(
        F.count("du").alias("n_steps"),  # count skips the lag-null first row
        (F.coalesce(F.sum("du"), F.lit(0)).cast("double") / F.lit(PATH_UNIT)).alias(
            "path_len"
        ),
        F.max("dist").alias("max_step"),
    )
