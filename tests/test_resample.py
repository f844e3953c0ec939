"""resample_interpolate goldens."""

from datetime import datetime

import pytest

from cadastre_pg_spark.operators.windows import resample_interpolate

H6 = 6 * 3_600_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )


def test_linear_between_brackets(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 0), 0.0),
        (2, 1, datetime(2024, 1, 1, 12), 12.0),
    ]
    out = {r.grid_ts: r.value for r in
           resample_interpolate(_ev(spark, rows), H6).collect()}
    assert out == {
        datetime(2024, 1, 1, 0): 0.0,    # exact hit
        datetime(2024, 1, 1, 6): 6.0,    # midpoint
        datetime(2024, 1, 1, 12): 12.0,  # exact hit at the end
    }


def test_uneven_bracket_proportion(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 0), 0.0),
        (2, 1, datetime(2024, 1, 1, 9), 9.0),
    ]
    out = {r.grid_ts: r.value for r in
           resample_interpolate(_ev(spark, rows), H6).collect()}
    assert out[datetime(2024, 1, 1, 6)] == pytest.approx(6.0)
    assert datetime(2024, 1, 1, 12) not in out  # beyond last event


def test_tied_timestamps_use_min_event_id(spark):
    rows = [
        (5, 1, datetime(2024, 1, 1, 0), 0.0),
        (2, 1, datetime(2024, 1, 1, 6), 50.0),   # min event_id wins
        (3, 1, datetime(2024, 1, 1, 6), 99.0),
        (4, 1, datetime(2024, 1, 1, 12), 0.0),
    ]
    out = {r.grid_ts: r.value for r in
           resample_interpolate(_ev(spark, rows), H6).collect()}
    assert out[datetime(2024, 1, 1, 6)] == 50.0


def test_span_without_grid_point_is_empty(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 1), 1.0),
        (2, 1, datetime(2024, 1, 1, 2), 2.0),
    ]
    assert resample_interpolate(_ev(spark, rows), H6).count() == 0


def test_two_users_independent_grids(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 0), 0.0),
        (2, 1, datetime(2024, 1, 1, 6), 6.0),
        (3, 2, datetime(2024, 2, 1, 0), 100.0),
        (4, 2, datetime(2024, 2, 1, 6), 106.0),
    ]
    out = resample_interpolate(_ev(spark, rows), H6).collect()
    by = {}
    for r in out:
        by.setdefault(r.user_id, set()).add(r.grid_ts)
    assert by[1] == {datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 6)}
    assert by[2] == {datetime(2024, 2, 1, 0), datetime(2024, 2, 1, 6)}


def test_ewma_hand_computed(spark):
    from cadastre_pg_spark.operators.windows import ewma

    rows = [
        (1, 1, datetime(2024, 1, 1, 0), 10.0),
        (2, 1, datetime(2024, 1, 1, 1), 20.0),
        (3, 1, datetime(2024, 1, 1, 2), 30.0),
        (4, 2, datetime(2024, 1, 1, 0), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {r.user_id: r for r in ewma(df, alpha=0.25).collect()}
    # s1=10, s2=10*.75+20*.25=12.5, s3=12.5*.75+30*.25=16.875
    assert out[1].ewma == 16.875 and out[1].n == 3
    assert out[2].ewma == 7.0 and out[2].n == 1


def test_ewma_order_is_ts_then_event_id(spark):
    from cadastre_pg_spark.operators.windows import ewma

    t = datetime(2024, 1, 1, 0)
    rows = [(2, 1, t, 100.0), (1, 1, t, 0.0)]  # tie: event_id decides
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    r = ewma(df, alpha=0.25).collect()[0]
    assert r.ewma == 0.0 * 0.75 + 100.0 * 0.25  # seed 0.0 then 100.0
