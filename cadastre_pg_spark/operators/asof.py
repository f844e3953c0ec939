"""As-of join (most-recent-match by time) — SURVEY.md J8 generalized.

Spark lacks a native as-of join; the scalable form used here is the
union + window trick: tag both sides, union on (key, ts), and carry
the last seen right-side value forward with last_value(ignorenulls)
over a key-partitioned time window. ONE shuffle on the key — no
per-row lookups (the reference does a point SELECT per entity,
upsert.rs:83-135; this is the set-oriented restatement).
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_l: str,
    key_r: str,
    ts_l: str,
    ts_r: str,
    value_r: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """For each left row: the `value_r` of the right row with the
    greatest ts_r <= ts_l for the same key (ties on equal ts: right row
    counts — right events sort before left at the same timestamp)."""
    l_tag = left.select(
        F.col(key_l).alias("k"),
        F.col(ts_l).alias("t"),
        F.lit(1).alias("side"),
        F.struct(*left.columns).alias("l_payload"),
        F.lit(None).cast(dict(right.dtypes)[value_r]).alias("rv"),
    )
    r_tag = right.select(
        F.col(key_r).alias("k"),
        F.col(ts_r).alias("t"),
        F.lit(0).alias("side"),
        F.lit(None).cast(l_tag.schema["l_payload"].dataType).alias("l_payload"),
        F.col(value_r).alias("rv"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        out_col, F.last("rv", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(F.col("l_payload.*"), F.col(out_col))
    )
