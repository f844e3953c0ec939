"""transition_matrix, cohort_retention, smooth_cell_counts goldens."""

from datetime import datetime

import pytest

from cadastre_pg_spark.operators.density import smooth_cell_counts
from cadastre_pg_spark.operators.sessions import (
    cohort_retention,
    transition_matrix,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )


def test_transitions_counts_and_probs(spark):
    t = datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, 7, t.replace(minute=1), "view"),
        (2, 7, t.replace(minute=2), "click"),
        (3, 7, t.replace(minute=3), "view"),
        (4, 7, t.replace(minute=4), "buy"),
        (5, 8, t.replace(minute=1), "view"),
        (6, 8, t.replace(minute=2), "click"),
    ]
    out = {(r.src_type, r.dst_type): (r.n, r.p) for r in
           transition_matrix(_ev(spark, rows)).collect()}
    assert out[("view", "click")] == (2, pytest.approx(2 / 3))
    assert out[("click", "view")] == (1, 1.0)
    assert out[("view", "buy")] == (1, pytest.approx(1 / 3))


def test_transitions_tie_order_by_event_id(spark):
    t = datetime(2024, 1, 1, 10, 0)
    rows = [(2, 7, t, "b"), (1, 7, t, "a"), (3, 7, t, "c")]
    out = {(r.src_type, r.dst_type) for r in
           transition_matrix(_ev(spark, rows)).collect()}
    assert out == {("a", "b"), ("b", "c")}


def test_cohort_retention_offsets(spark):
    # user 1 active in week0 and week2; user 2 only week0 (same cohort);
    # user 3 starts a week later (own cohort)
    rows = [
        (1, 1, datetime(2024, 1, 1, 9), "x"),    # Mon wk0
        (2, 1, datetime(2024, 1, 17, 9), "x"),   # Wed wk2
        (3, 2, datetime(2024, 1, 3, 9), "x"),    # Wed wk0
        (4, 3, datetime(2024, 1, 10, 9), "x"),   # Wed wk1 cohort
    ]
    out = {(r.cohort_week, r.week_offset): r.n_users for r in
           cohort_retention(_ev(spark, rows)).collect()}
    wk0 = datetime(2024, 1, 1)
    wk1 = datetime(2024, 1, 8)
    assert out[(wk0, 0)] == 2
    assert out[(wk0, 2)] == 1
    assert out[(wk1, 0)] == 1
    assert (wk0, 1) not in out


def test_smooth_conserves_interior_mass(spark):
    # one point deep inside the grid: density spreads 1/4+4/8+4/16 = 1
    level, n = 3, 8
    cell = 3 * n + 4
    df = spark.createDataFrame([(cell,)], "cell long")
    rows = {r.cell: r.density for r in
            smooth_cell_counts(df, level).collect()}
    assert rows[cell] == 0.25
    assert sum(rows.values()) == 1.0
    assert len(rows) == 9


def test_smooth_corner_loses_mass(spark):
    level = 3
    df = spark.createDataFrame([(0,)], "cell long")  # corner (0,0)
    rows = {r.cell: r.density for r in
            smooth_cell_counts(df, level).collect()}
    # corner keeps self + 2 edge + 1 diagonal = 1/4 + 2/8 + 1/16
    assert len(rows) == 4
    assert sum(rows.values()) == 0.25 + 0.25 + 0.0625
