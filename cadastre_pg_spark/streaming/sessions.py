"""Streaming sessionization — the stream twin of
operators/sessions.sessionize (identical gap rule, microsecond
arithmetic), built on applyInPandasWithState.

Per-user state is two longs: (last event-time in epoch micros, current
session index). Each micro-batch sorts its own rows per user (ts,
event_id) and continues the running session count across batches, so
feeding the batches in event-time order reproduces the batch operator
row for row — asserted in tests/test_streaming.py.

Cross-batch disorder (an event older than the user's state) cannot be
sessionized incrementally — the batch rule would re-split history.
Policy is explicit: 'error' (default; loud failure, the engine rule)
or 'current' (assign to the open session and move on — the bounded
approximation for sources with bounded lateness).

Scale: state is O(active users) x 16 bytes; the shuffle is the state
operator's own hash exchange on user_id — same key a batch window
would shuffle on.
"""

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cadastre_pg_spark.streaming.stateful import EVENT_SCHEMA

OUTPUT_SCHEMA = "event_id long, user_id long, session_idx long"
STATE_SCHEMA = "last_us long, idx long"


def _make_update(gap_us: int, on_disorder: str):
    def _update(key, pdfs, state: GroupState):
        last_us, idx = state.get if state.exists else (None, 0)
        out_ids, out_sidx = [], []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for eid, t in zip(pdf["event_id"].to_numpy(), ts_us):
                if last_us is not None and t < last_us:
                    if on_disorder == "error":
                        raise RuntimeError(
                            f"disordered event {eid} for user {key[0]}: "
                            f"{t} < state {last_us}"
                        )
                    # 'current': keep the open session, don't move time back
                    out_ids.append(int(eid))
                    out_sidx.append(idx)
                    continue
                if last_us is None or t - last_us > gap_us:
                    idx += 1
                last_us = int(t)
                out_ids.append(int(eid))
                out_sidx.append(idx)
        state.update((last_us if last_us is not None else 0, idx))
        if out_ids:
            yield pd.DataFrame(
                {
                    "event_id": out_ids,
                    "user_id": [int(key[0])] * len(out_ids),
                    "session_idx": out_sidx,
                }
            )

    return _update


def sessionize_stream(
    spark: SparkSession,
    path: str,
    gap_minutes: int = 30,
    query_name: str = "sessions",
    max_files_per_trigger: int = 1,
    on_disorder: str = "error",
):
    """readStream parquet -> per-event session assignment with running
    per-user state. Memory sink (tests); swap for a parquet sink at
    scale (see streaming/placement.py for the throughput shape)."""
    if on_disorder not in ("error", "current"):
        raise ValueError(f"unknown on_disorder {on_disorder!r}")
    events = (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )
    out = events.groupBy("user_id").applyInPandasWithState(
        _make_update(gap_minutes * 60_000_000, on_disorder),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .start()
    )
