"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only 'state' is the SCD-2 table in PostGIS; a
streaming engine over web-page ingest needs per-key running state.
This operator keeps a per-user running (count, sum) across
micro-batches — the building block for streaming dedup counters and
rate trackers.
"""

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update(key, pdfs, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals_stream(
    spark: SparkSession, path: str, query_name: str = "user_totals"
):
    """readStream parquet -> per-user running totals with explicit
    state. Memory sink; each micro-batch emits the updated totals for
    users seen in that batch (latest row per user = current state)."""
    events = spark.readStream.format("parquet").schema(EVENT_SCHEMA).load(path)
    out = events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
