"""1D interval-point containment join via time-bucket co-partitioning
— the temporal analog of the cell-bucketed spatial join (J9,
operators/spatial_join.py), for "which intervals cover this instant"
workloads (session concurrency, validity windows, outage overlap).

A naive formulation is a range-predicate cross join — Catalyst can
only nested-loop it (BroadcastNestedLoopJoin), which dies at scale.
Bucketing both sides on floor(epoch / bucket) turns it into an
equi-join whose residual is the exact containment predicate: intervals
explode to the buckets they cover, points carry their single bucket,
so every qualifying pair meets in exactly one bucket (no dedup needed)
and the exchange is a plain hash partition on the bucket key.

Scale notes:
- choose bucket_seconds near the median interval length: the interval
  fan-out is ~len/bucket + 1 rows, the per-bucket probe population is
  what the residual filter scans;
- a degenerate long interval fans out wide — `max_buckets_per_interval`
  bounds it LOUDLY (raise, not silent truncation);
- hot buckets (everyone online at the same hour) ride AQE's skew-join
  split, same as hot cells in the spatial join.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = 1_000_000


def _bucket(col, bucket_seconds: int):
    return F.floor(
        F.unix_micros(col.cast("timestamp")) / F.lit(bucket_seconds * US)
    )


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    bucket_seconds: int = 3600,
    iv_id: str = "interval_id",
    start: str = "start_ts",
    end: str = "end_ts",
    pt_id: str = "point_id",
    ts: str = "ts",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """All (point, interval) pairs with start <= ts <= end (closed
    bounds, microsecond grain). Output: (pt_id, iv_id) plus the three
    timestamp columns. Each qualifying pair appears exactly once."""
    lo = _bucket(F.col(start), bucket_seconds)
    hi = _bucket(F.col(end), bucket_seconds)
    # loud fan-out bound INSIDE the explode expression (raise_error) —
    # no extra validation pass over the interval table
    guarded = F.when(
        hi - lo + F.lit(1) > F.lit(max_buckets_per_interval),
        F.raise_error(
            F.concat(
                F.lit("interval_point_join: interval "),
                F.col(iv_id).cast("string"),
                F.lit(
                    f" spans more than {max_buckets_per_interval} buckets"
                    f" of {bucket_seconds}s; raise bucket_seconds"
                ),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(lo, hi))
    b_iv = intervals.select(iv_id, start, end, F.explode(guarded).alias("bucket"))
    b_pt = points.select(
        pt_id, ts, _bucket(F.col(ts), bucket_seconds).alias("bucket")
    )
    return (
        b_pt.join(b_iv, "bucket")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) <= F.col(end)))
        .select(pt_id, iv_id, ts, start, end)
    )
