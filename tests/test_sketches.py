"""HyperLogLog sketch: accuracy envelope and branch coverage."""

import math

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.sketches import hll_distinct


def _est(spark, values, p=7, hash_fn="xxhash64"):
    df = spark.createDataFrame([("g", v) for v in values], "grp string, v string")
    row = hll_distinct(df, "grp", "v", p=p, hash_fn=hash_fn).collect()[0]
    return row.est, row.used_buckets


def test_hll_branch_large_cardinality(spark):
    n = 20000
    est, used = _est(spark, [f"val{i}" for i in range(n)])
    assert used > 120  # registers saturated -> raw HLL branch
    # m=128 -> relative sigma ~1.04/sqrt(128) ~ 9.2%; allow 3.5 sigma
    assert abs(est - n) / n < 0.33


def test_linear_counting_branch_small_cardinality(spark):
    vals = [f"v{i}" for i in range(30)] * 5  # duplicates collapse
    est, used = _est(spark, vals)
    assert used <= 30
    # linear counting: m * ln(m / empty) — near-exact at tiny loads
    assert abs(est - 30) < 6


def test_duplicates_do_not_inflate(spark):
    base = [f"x{i}" for i in range(1000)]
    e1, _ = _est(spark, base)
    e2, _ = _est(spark, base * 3)
    assert e1 == e2  # max-register sketch is duplicate-insensitive


def test_md5_mode_deterministic(spark):
    vals = [f"doc{i}" for i in range(500)]
    a, _ = _est(spark, vals, hash_fn="md5")
    b, _ = _est(spark, vals, hash_fn="md5")
    assert a == b
    assert abs(a - 500) / 500 < 0.33


def test_histogram_quantile_golden(spark):
    from cadastre_pg_spark.operators.sketches import histogram_quantile

    # 100 values 0.5..99.5 in [0,100) with 100 bins: bin i holds i+0.5
    rows = [("a", i + 0.5) for i in range(100)]
    rows += [("b", 999.0), ("b", -5.0)]  # clamped into last/first bin
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {(r.grp, r.q): r.est for r in histogram_quantile(
        df, "grp", "v", 0.0, 100.0, 100, qs=(0.5, 0.9, 0.99)
    ).collect()}
    # q=0.5 -> ceil(50) = 50th value -> bin 49 -> upper edge 50.0
    assert out[("a", 0.5)] == 50.0
    assert out[("a", 0.9)] == 90.0
    assert out[("a", 0.99)] == 99.0
    assert out[("b", 0.5)] == 1.0     # clamped -5 -> bin 0
    assert out[("b", 0.99)] == 100.0  # clamped 999 -> bin 99
