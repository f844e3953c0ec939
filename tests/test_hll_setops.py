"""hll_set_ops: accuracy goldens + exact union-merge algebra check."""

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.sketches import hll_distinct, hll_set_ops


def _df(spark, groups):
    rows = [(g, str(v)) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "grp string, v string")


def test_overlap_estimates_within_hll_error(spark):
    df = _df(
        spark,
        {"A": range(0, 1000), "B": range(500, 1500)},
    )
    r = hll_set_ops(df, "grp", "v", p=7).collect()[0]
    # p=7 -> ~9% relative error on each estimate; intersection
    # compounds three of them
    assert r.est_a == pytest.approx(1000, rel=0.2)
    assert r.est_b == pytest.approx(1000, rel=0.2)
    assert r.est_union == pytest.approx(1500, rel=0.2)
    assert r.est_intersect == pytest.approx(500, abs=350)


def test_identical_groups(spark):
    df = _df(spark, {"A": range(500), "B": range(500)})
    r = hll_set_ops(df, "grp", "v", p=7).collect()[0]
    # identical register tables: union == each side exactly
    assert r.est_union == r.est_a == r.est_b
    assert r.est_intersect == pytest.approx(r.est_a, abs=1e-6)


def test_disjoint_groups_clamped_nonnegative(spark):
    df = _df(spark, {"A": range(0, 400), "B": range(10000, 10400)})
    r = hll_set_ops(df, "grp", "v", p=7).collect()[0]
    assert r.est_intersect >= 0.0
    assert r.est_union == pytest.approx(800, rel=0.25)


def test_union_decomposition_matches_single_scan_exactly(spark):
    """The engine's sa+sb-s_min register algebra must equal the
    single-sketch estimate of the concatenated data BITWISE — the
    mergeability property, not an approximation."""
    df = _df(spark, {"A": range(0, 700), "B": range(300, 900)})
    r = hll_set_ops(df, "grp", "v", p=7).collect()[0]
    merged = df.select(F.lit("all").alias("grp"), "v")
    direct = hll_distinct(merged, "grp", "v", p=7).collect()[0]
    assert r.est_union == direct.est  # exact, not approx


def test_three_groups_make_three_pairs(spark):
    df = _df(spark, {"A": range(100), "B": range(100), "C": range(100)})
    out = hll_set_ops(df, "grp", "v", p=7).collect()
    assert {(r.grp_a, r.grp_b) for r in out} == {
        ("A", "B"), ("A", "C"), ("B", "C")
    }
