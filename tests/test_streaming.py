"""Structured Streaming smoke: the streaming windowed aggregation must
equal the batch plan on the same parquet input."""

import pyspark.sql.functions as F

from cadastre_pg_spark.streaming.events import (
    sessionize,
    windowed_counts_batch,
    windowed_counts_stream,
)
from conftest import SF_UNIT


def test_stream_equals_batch(spark, tmp_path):
    # the streaming parquet source wants a directory of files
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF_UNIT}/events.parquet", src_dir / "part-0.parquet")
    q = windowed_counts_stream(spark, str(src_dir), query_name="ewtest")
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT * FROM ewtest ORDER BY win_start, event_type"
        ).collect()
    finally:
        q.stop()
    events = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    exp = (
        windowed_counts_batch(events).orderBy("win_start", "event_type").collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    assert len(got) > 0


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState totals must equal the batch aggregate."""
    import shutil

    from cadastre_pg_spark.streaming.stateful import running_user_totals_stream

    src = tmp_path / "ev"
    src.mkdir()
    shutil.copy(f"{SF_UNIT}/events.parquet", src / "part-0.parquet")
    q = running_user_totals_stream(spark, str(src), query_name="ut_test")
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.n_events, round(r.total_value, 2))
            for r in spark.sql(
                """SELECT user_id, n_events, total_value FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id
                         ORDER BY n_events DESC) rn FROM ut_test) WHERE rn=1"""
            ).collect()
        }
    finally:
        q.stop()
    ev = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    exp = {
        r.user_id: (r.n, round(r.t, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == exp


def test_sessionize(spark):
    events = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    out = sessionize(events, gap_minutes=30)
    assert out.select("session_id").distinct().count() >= out.select(
        "user_id"
    ).distinct().count()
    # sessions are per-user
    assert (
        out.filter(~F.col("session_id").startswith(F.col("user_id").cast("string")))
        .count()
        == 0
    )
