"""Radial-distance ring simplification."""

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.simplify import simplify_radial


def _run(spark, xs, ys, offs, tol):
    df = spark.createDataFrame(
        [(1, xs, ys, offs)],
        "parcel_id long, xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    return sorted(
        (r.ring_idx, r.pos, r.x, r.y)
        for r in simplify_radial(df, tol=tol).collect()
    )


def test_drops_jitter_keeps_corners(spark):
    # unit square with a mid-edge jitter vertex 0.01 from the corner path
    xs = [0.0, 0.5, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.01, 0.0, 1.0, 1.0, 0.0]
    out = _run(spark, xs, ys, [0, 6], tol=0.6)
    kept_pos = [p for (_, p, _, _) in out]
    # first kept; 0.5-jitter vertex dropped (dist ~0.5 < 0.6); corners kept
    assert 0 in kept_pos and 5 in kept_pos and 1 not in kept_pos
    assert 2 in kept_pos and 3 in kept_pos and 4 in kept_pos


def test_tol_zero_keeps_everything(spark):
    xs = [0.0, 1.0, 1.0, 0.0, 0.0]
    ys = [0.0, 0.0, 1.0, 1.0, 0.0]
    out = _run(spark, xs, ys, [0, 5], tol=0.0)
    assert [p for (_, p, _, _) in out] == [0, 1, 2, 3, 4]


def test_rings_independent(spark):
    sq = ([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0])
    hole = ([1.0, 3.0, 3.0, 1.0, 1.0], [1.0, 1.0, 3.0, 3.0, 1.0])
    out = _run(spark, sq[0] + hole[0], sq[1] + hole[1], [0, 5, 10], tol=2.5)
    rings = {r for (r, _, _, _) in out}
    assert rings == {0, 1}
    # hole edges are length 2 < 2.5, but the diagonal from the last
    # kept corner is sqrt(8) >= 2.5 — so the opposite corner survives
    hole_pos = sorted(p for (r, p, _, _) in out if r == 1)
    assert hole_pos == [0, 2, 4]
    # outer edges are length 4 >= 2.5: all corners survive
    outer_pos = sorted(p for (r, p, _, _) in out if r == 0)
    assert outer_pos == [0, 1, 2, 3, 4]


def test_closure_always_kept(spark):
    xs = [0.0, 0.001, 0.002, 0.0]
    ys = [0.0, 0.0, 0.001, 0.0]
    out = _run(spark, xs, ys, [0, 4], tol=10.0)
    assert [p for (_, p, _, _) in out] == [0, 3]


def test_star_parcels_reduce(spark):
    from cadastre_pg_spark.data.parcels import generate_star_parcels

    df = generate_star_parcels(spark, 100, partitions=4, size_scale=20.0)
    n_orig = df.select(F.sum(F.size("xs"))).first()[0]
    n_kept = simplify_radial(df, tol=0.05).count()
    assert 0 < n_kept < n_orig
