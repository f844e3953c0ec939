"""winsorized_stats: clamp semantics vs a NumPy replay, outlier
robustness, single-value groups."""

import numpy as np

from cadastre_pg_spark.operators.stats import winsorized_stats


def _replay(vals, p_lo=0.05, p_hi=0.95, unit=1e6):
    v = np.asarray(vals, dtype=np.float64)
    lo = np.quantile(v, p_lo)  # linear interpolation == percentile
    hi = np.quantile(v, p_hi)
    clamped = np.minimum(np.maximum(v, lo), hi)
    units = np.floor(clamped * unit)
    return lo, hi, len(v), (units.sum() / len(v)) / unit


def test_matches_numpy_replay(spark):
    vals_a = [1.0, 2.0, 3.0, 4.0, 100.0]  # one wild outlier
    vals_b = [10.0] * 7 + [-50.0]
    rows = [("a", x) for x in vals_a] + [("b", x) for x in vals_b]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {
        r.grp: (r.lo, r.hi, r.n, r.wmean)
        for r in winsorized_stats(df, "grp", "value").collect()
    }
    for g, vals in [("a", vals_a), ("b", vals_b)]:
        lo, hi, n, wmean = _replay(vals)
        # np.quantile interpolates with a different op order than
        # Spark's percentile — the BITWISE parity claim is
        # Spark<->DuckDB (the oracle), NumPy is a semantic check only
        assert abs(got[g][0] - lo) < 1e-9 and abs(got[g][1] - hi) < 1e-9
        assert got[g][2] == n
        assert abs(got[g][3] - wmean) < 1e-6, g


def test_outlier_robustness(spark):
    base = [5.0] * 99 + [1e9]
    df = spark.createDataFrame([("g", x) for x in base], "grp string, value double")
    r = winsorized_stats(df, "grp", "value").collect()[0]
    assert r.wmean < 10.0  # the 1e9 outlier is clamped to p95


def test_single_value_group(spark):
    df = spark.createDataFrame([("g", 7.25)], "grp string, value double")
    r = winsorized_stats(df, "grp", "value").collect()[0]
    assert (r.lo, r.hi, r.n) == (7.25, 7.25, 1)
    assert abs(r.wmean - 7.25) < 1e-6
