"""Derived-partsupp invariants + the q2/q11/q20 adaptations.

The relation itself is synthesized (data/synthetic.py twins) — these
tests pin the properties the three queries rely on; value parity vs
DuckDB is held by the registry oracles (tests/test_driver_contract.py
covers the compare harness itself).
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ps(spark):
    import __spark_entry__ as E

    return E._partsupp(spark, SF)


def test_partsupp_primary_key_and_ranges(spark):
    from cadastre_pg_spark.data import synthetic as S

    ps = _ps(spark).persist()
    n_part = spark.read.parquet(f"{SF}/part.parquet").count()
    n_supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert ps.count() == n_part * S.PS_PER_PART
    # (partkey, suppkey) is a real PK: the stride spread keeps the 4
    # slots distinct mod n_supp
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == ps.count()
    agg = ps.agg(
        F.min("ps_suppkey"), F.max("ps_suppkey"),
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_cost_cents"), F.max("ps_cost_cents"),
    ).first()
    assert 0 <= agg[0] and agg[1] < n_supp
    assert 1 <= agg[2] and agg[3] <= S.PS_QTY_MOD
    assert 100 <= agg[4] and agg[5] <= 99 + S.PS_COST_MOD
    ps.unpersist()


def test_partsupp_deterministic(spark):
    a = sorted(map(tuple, _ps(spark).collect()))
    b = sorted(map(tuple, _ps(spark).collect()))
    assert a == b and len(a) > 0


def test_q2_rows_are_region_minima(spark):
    import __spark_entry__ as E

    rows = E.q_tpch_q2(spark, SF).collect()
    assert rows, "q2 empty at sf0.001"
    # every surfaced (part, cost) is the minimum cost among the
    # surfaced rows of that part (the window-min filter's fixpoint)
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supplycost)
    assert all(len(v) == 1 for v in by_part.values())


def test_q11_threshold_semantics(spark):
    import __spark_entry__ as E

    # sf0.001's 10-supplier dim may leave NATION_7 empty — the test is
    # pure equality vs the recomputed threshold, at a SF with rows
    sf = "/root/testdata/sf0.01"
    out = E.q_tpch_q11(spark, sf)
    rows = out.collect()
    assert rows
    # recompute the nation total from the unfiltered grouped values
    ps = E._partsupp(spark, sf)
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet").filter(
        F.col("n_name") == "NATION_7"
    )
    g = (
        ps.join(sup, ps.ps_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_cost_cents") * F.col("ps_availqty")).alias("vc"))
    )
    total = g.agg(F.sum("vc")).first()[0]
    expect = {
        r.ps_partkey: r.vc / 100.0
        for r in g.collect()
        if r.vc * E.TPCH_Q11_FRACTION_DEN > total
    }
    assert {r.ps_partkey: r.value for r in rows} == expect


def test_q20_excess_condition(spark):
    import __spark_entry__ as E

    # every returned supplier is in ASIA and holds at least one
    # qualifying excess (small-part, 1996) position
    rows = E.q_tpch_q20(spark, SF).collect()
    sup = spark.read.parquet(f"{SF}/supplier.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    reg = spark.read.parquet(f"{SF}/region.parquet")
    asia = {
        r.s_suppkey
        for r in sup.join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .collect()
    }
    assert all(r.s_suppkey in asia for r in rows)
