"""Batch sessionization over event streams — the gap-rule session
assignment every behavioural pipeline needs (the batch twin of
streaming/sessions; identical rule, exact SQL oracle).

Pure window functions (lag -> boundary flag -> running sum), one
shuffle on the session key, whole-stage codegen throughout.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per event: (key, session_idx, event cols). A new session
    starts when the gap to the previous event of the same key exceeds
    gap_minutes. session_idx is 1-based per key, deterministic (ties on
    ts break by order_tiebreak)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(order_tiebreak).asc())
    prev = F.lag(F.col(ts)).over(w)
    # microsecond integer arithmetic: exact, and identical in the SQL
    # oracle (epoch_us) — a seconds cast would truncate sub-second gaps
    # cast("timestamp"): events carry TIMESTAMP_NTZ; with the session
    # in UTC the reinterpretation is identity, and gap DIFFERENCES are
    # tz-invariant regardless
    boundary = (
        prev.isNull()
        | (
            F.unix_micros(F.col(ts).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_minutes * 60_000_000
        )
    ).cast("long")
    running = Window.partitionBy(key).orderBy(
        F.col(ts).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_idx", F.sum(boundary).over(running))


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session aggregate: (key, session_idx, n_events,
    session_start, session_end)."""
    s = sessionize(events, key, ts, order_tiebreak, gap_minutes)
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
    )
