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


def transition_matrix(events: DataFrame) -> DataFrame:
    """Per-user event-type bigram transitions -> (src_type, dst_type,
    n, p): the Markov-chain view of the event stream (journey
    analytics). Ordering is the house (ts, event_id) tie rule; p is
    the exact BIGINT ratio n / total-from-src evaluated in doubles
    (single correctly-rounded division — identical across engines).

    Scale shape: one user-keyed window (exchange + sort) for the lag,
    then a (src, dst) hash aggregate; the src totals come from a
    window over the aggregate itself (a few hundred rows), not a
    second scan."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = events.select(
        F.lag("event_type").over(w).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).filter(F.col("src_type").isNotNull())
    counts = pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = F.sum("n").over(W.partitionBy("src_type"))
    return counts.select(
        "src_type",
        "dst_type",
        "n",
        (F.col("n").cast("double") / tot).alias("p"),
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention -> (cohort_week, week_offset, n_users):
    users bucketed by the Monday week of their FIRST event; each later
    active week counts them once at its integer week offset. All
    arithmetic on date_trunc'd microsecond epochs — exact integer
    multiples of a week, so the offset division is exact in both
    engines.

    Scale shape: one user-keyed aggregate for the cohort, a broadcast
    join back (users << events at scale this is the one heavy join —
    the cohort table is one row per user; at 100 TB bucket both sides
    by user_id), then a distinct-user count per (cohort, offset)."""
    wk = F.date_trunc("week", F.col("ts").cast("timestamp"))
    ev = events.select("user_id", F.unix_micros(wk).alias("wk_us"))
    first = ev.groupBy("user_id").agg(F.min("wk_us").alias("cohort_us"))
    j = ev.join(first, "user_id")
    week_us = 7 * 86400 * 1_000_000
    return (
        j.select(
            "user_id",
            F.col("cohort_us"),
            ((F.col("wk_us") - F.col("cohort_us")) / F.lit(week_us))
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_us", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            F.timestamp_micros(F.col("cohort_us")).alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )
