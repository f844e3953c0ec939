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


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per key, the longest prefix of `steps`
    matchable in event-time order, each step STRICTLY after the one
    before (greedy earliest-match — equivalent to the cascaded-min
    formulation t_i = min(ts of step_i with ts > t_{i-1}), which is
    what the SQL oracle computes).

    Output: (key, steps_reached, t_1..t_n) with NULL t for unreached
    steps; every key that has any event appears (steps_reached 0 if it
    never enters the funnel).

    Scale shape: events are pre-filtered to the funnel types, then ONE
    groupBy(key) builds the time-sorted (ts, type) array and a
    Catalyst `aggregate` fold walks it JVM-side — a single exchange,
    no per-step join cascade. The distinct-keys base is its own
    partial-agg exchange. Per-key array size is bounded by that key's
    funnel-type event count; a pathological power key should be capped
    upstream (quality filters), not here — the fold is linear either
    way.
    """
    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    base = events.select(F.col(key)).distinct()
    seq = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(key)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts).alias("t"), F.col(type_col).alias("y")))
            ).alias("seq")
        )
    )
    t_fields = [f"t{i + 1}" for i in range(n)]
    init = F.struct(
        F.lit(0).alias("step"),
        *[F.lit(None).cast("timestamp").alias(f) for f in t_fields],
    )

    def advance(acc, e):
        out = acc
        for i, s in enumerate(steps):
            cond = (acc["step"] == i) & (e["y"] == s)
            if i > 0:
                cond = cond & (e["t"] > acc[f"t{i}"])
            new = F.struct(
                F.lit(i + 1).alias("step"),
                *[
                    (e["t"] if j == i else acc[f]).alias(f)
                    for j, f in enumerate(t_fields)
                ],
            )
            out = F.when(cond, new).otherwise(out)
        return out

    folded = seq.select(
        key, F.aggregate("seq", init, advance).alias("f")
    )
    return base.join(folded, key, "left").select(
        key,
        F.coalesce(F.col("f.step"), F.lit(0)).alias("steps_reached"),
        *[F.col(f"f.{f}").alias(f) for f in t_fields],
    )
