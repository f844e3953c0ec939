"""count-min sketch goldens: overestimate property, exactness, merge."""

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.sketches import cms_estimate, cms_table


def _vals(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_never_underestimates_and_exact_when_sparse(spark):
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 1
    df = _vals(spark, vals)
    cms = cms_table(df, "v", width=4096, depth=4)
    probes = _vals(spark, ["a", "b", "c", "zzz"])
    est = {r.v: r.est for r in
           cms_estimate(cms, probes, "v", width=4096, depth=4).collect()}
    true = {"a": 5, "b": 3, "c": 1, "zzz": 0}
    for k, t in true.items():
        assert est[k] >= t
    # at width 4096 with 3 distinct values, collisions are absent
    assert est == true


def test_collisions_only_inflate(spark):
    # tiny width forces collisions: estimates must still dominate truth
    vals = [f"k{i}" for i in range(50)] * 2
    df = _vals(spark, vals)
    cms = cms_table(df, "v", width=8, depth=2)
    probes = _vals(spark, [f"k{i}" for i in range(50)])
    out = cms_estimate(cms, probes, "v", width=8, depth=2).collect()
    assert all(r.est >= 2 for r in out)


def test_sketch_merge_is_count_sum(spark):
    a = cms_table(_vals(spark, ["x"] * 4), "v", width=64, depth=3)
    b = cms_table(_vals(spark, ["x"] * 6 + ["y"]), "v", width=64, depth=3)
    merged = (
        a.unionByName(b)
        .groupBy("row", "b")
        .agg(F.sum("n").alias("n"))
    )
    direct = cms_table(_vals(spark, ["x"] * 10 + ["y"]), "v", width=64, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
