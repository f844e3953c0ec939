"""knn_grid vs the O(n^2) brute-force oracle, including the adversarial
concentration case the density estimate gets wrong (everything in one
'city' = one cell of the uniform-density level). The measured
occupancy refinement must keep the join sub-quadratic AND exact."""

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.knn import knn_grid, pick_level


def _brute(pts, qs, k):
    """{(query_id, rank): neighbor_id} via pure python."""
    out = {}
    for qid, qx, qy in qs:
        cands = sorted(
            ((px - qx) ** 2 + (py - qy) ** 2, pid)
            for pid, px, py in pts
            if pid != qid
        )
        for r, (d, pid) in enumerate(cands[:k], 1):
            out[(qid, r)] = pid
    return out


def _rows(df):
    return {(r.query_id, r.rank): r.neighbor_id for r in df.collect()}


def test_knn_uniform_matches_brute(spark):
    pts = [(i, -4.0 + (i * 37 % 1000) / 80.0, 42.0 + (i * 91 % 800) / 100.0) for i in range(400)]
    qs = [p for p in pts if p[0] % 10 == 0]
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    qdf = spark.createDataFrame(
        [(q[0], q[1], q[2]) for q in qs], "query_id long, lon double, lat double"
    )
    got = _rows(knn_grid(pdf, qdf, k=5))
    assert got == _brute(pts, qs, 5)


def test_knn_concentrated_city_is_subquadratic_and_exact(spark):
    """All 2000 points inside a 0.01-degree square — ONE cell at the
    density-estimate level. The occupancy refinement must pick a finer
    grid (sub-quadratic candidate volume) and still match brute force."""
    pts = [
        (i, 2.30 + (i * 37 % 500) / 50000.0, 48.85 + (i * 91 % 500) / 50000.0)
        for i in range(2000)
    ]
    qs = [p for p in pts if p[0] % 100 == 0]
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    qdf = spark.createDataFrame(
        [(q[0], q[1], q[2]) for q in qs], "query_id long, lon double, lat double"
    )
    # the uniform-density estimate would pick a coarse level where all
    # points share one cell; the measured refinement must go finer
    level = pick_level(2000, pdf, 5, 3.0, 12, occ_cap=64)
    assert level > 12, f"occupancy refinement did not fire (level={level})"
    got = _rows(knn_grid(pdf, qdf, k=5, occ_cap=64))
    assert got == _brute(pts, qs, 5)


def test_knn_budget_raises_loudly(spark):
    """Duplicate-coordinate mass (cells cannot separate points) with a
    tiny budget must fail with measured numbers, not melt quietly."""
    pts = [(i, 2.3, 48.85) for i in range(50)] + [(1000, 8.0, 50.0)]
    qdf = spark.createDataFrame(
        [(9999, -4.9, 41.1)], "query_id long, lon double, lat double"
    )
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    with pytest.raises(RuntimeError, match="budget_pairs"):
        # isolated far-corner query: no round settles it before level 0
        knn_grid(pdf, qdf, k=5, budget_pairs=10).collect()


def test_knn_fewer_points_than_k(spark):
    pts = [(1, 2.0, 45.0), (2, 2.1, 45.1), (3, 2.2, 45.2)]
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    qdf = spark.createDataFrame([(1, 2.0, 45.0)], "query_id long, lon double, lat double")
    rows = knn_grid(pdf, qdf, k=5).collect()
    assert {(r.query_id, r.rank): r.neighbor_id for r in rows} == {
        (1, 1): 2,
        (1, 2): 3,
    }


def test_knn_explicit_level_skips_probe_and_stays_exact(spark):
    """A pipeline-supplied level (pick_level run once, reused) must
    give the identical exact result at any reasonable level."""
    pts = [(i, -4.0 + (i * 37 % 1000) / 80.0, 42.0 + (i * 91 % 800) / 100.0) for i in range(400)]
    qs = [p for p in pts if p[0] % 20 == 0]
    pdf = spark.createDataFrame(pts, "point_id long, lon double, lat double")
    qdf = spark.createDataFrame(qs, "query_id long, lon double, lat double")
    expected = _brute(pts, qs, 5)
    for lvl in (3, 5, 8):
        assert _rows(knn_grid(pdf, qdf, k=5, level=lvl)) == expected, lvl
