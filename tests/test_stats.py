"""zscore_outliers and group_corr goldens."""

import pytest

from cadastre_pg_spark.operators.stats import group_corr, zscore_outliers


def test_zscore_flags_the_outlier(spark):
    vals = [10.0] * 9 + [100.0]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    out = zscore_outliers(df, "event_type", "value", "event_id", threshold=2.0)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].event_id == 9
    assert rows[0].z == pytest.approx(3.0, abs=1e-9)  # 9-low-1-high layout


def test_zscore_constant_group_emits_nothing(spark):
    df = spark.createDataFrame(
        [(i, "c", 5.0) for i in range(10)],
        "event_id long, event_type string, value double",
    )
    assert zscore_outliers(df, "event_type", "value", "event_id").count() == 0


def test_corr_perfect_and_inverse(spark):
    rows = [("up", float(i), float(2 * i + 1)) for i in range(10)]
    rows += [("down", float(i), float(-3 * i)) for i in range(10)]
    rows += [("flat", float(i), 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    out = {r.grp: r.corr for r in group_corr(df, "grp", "x", "y").collect()}
    assert out["up"] == pytest.approx(1.0, abs=1e-6)
    assert out["down"] == pytest.approx(-1.0, abs=1e-6)
    assert out["flat"] is None
