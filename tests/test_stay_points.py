"""stay_points (trajectory dwell) goldens."""

from datetime import datetime

from cadastre_pg_spark.operators.windows import stay_points


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, cell long"
    )


def _t(h):
    return datetime(2024, 1, 1, h)


def test_runs_split_and_counted(spark):
    rows = [
        (1, _t(0), 1, 5),
        (1, _t(1), 2, 5),
        (1, _t(2), 3, 7),   # breaks the run
        (1, _t(3), 4, 5),
        (1, _t(4), 5, 5),
        (1, _t(5), 6, 5),
    ]
    out = sorted(
        stay_points(_pts(spark, rows), min_pts=2).collect(),
        key=lambda r: r.enter_ts,
    )
    assert [(r.cell, r.n_points) for r in out] == [(5, 2), (5, 3)]
    assert out[0].enter_ts == _t(0) and out[0].exit_ts == _t(1)
    assert out[1].enter_ts == _t(3) and out[1].exit_ts == _t(5)


def test_min_duration_filter(spark):
    rows = [
        (1, _t(0), 1, 5),
        (1, _t(0), 2, 5),       # same-instant pair: 0 duration
        (2, _t(0), 3, 9),
        (2, _t(3), 4, 9),       # 3h dwell
    ]
    out = stay_points(
        _pts(spark, rows), min_pts=2, min_us=3_600_000_000
    ).collect()
    assert [(r.user_id, r.cell) for r in out] == [(2, 9)]


def test_tie_order_is_event_id(spark):
    # two same-ts events in different cells: order by event_id decides
    # the run structure deterministically (no 2-run here)
    rows = [
        (1, _t(0), 2, 5),
        (1, _t(0), 1, 7),
        (1, _t(1), 3, 5),
    ]
    out = stay_points(_pts(spark, rows), min_pts=2).collect()
    # order: (t0,e1,c7) (t0,e2,c5) (t1,e3,c5) -> run c5 has 2 points
    assert [(r.cell, r.n_points) for r in out] == [(5, 2)]
