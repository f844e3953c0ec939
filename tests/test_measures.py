"""Geometry measures: kernel == Spark bitwise, goldens, edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.kernels import measures as K
from cadastre_pg_spark.operators.measures import geometry_measures

SQ = ([0.0, 2.0, 2.0, 0.0, 0.0], [0.0, 0.0, 2.0, 2.0, 0.0])  # CCW unit-2 square


def test_kernel_square_golden():
    n_rings, area, perim, cx, cy = K.polygon_measures(SQ[0], SQ[1], [0, 5])
    assert (n_rings, area, perim) == (1, 4.0, 8.0)
    assert (cx, cy) == (1.0, 1.0)


def test_kernel_square_cw_same_measures():
    xs, ys = list(reversed(SQ[0])), list(reversed(SQ[1]))
    n_rings, area, perim, cx, cy = K.polygon_measures(xs, ys, [0, 5])
    assert (area, perim, cx, cy) == (4.0, 8.0, 1.0, 1.0)


def test_kernel_square_with_hole():
    # concentric half-size square hole, SAME winding as the exterior
    hx = [0.5 + 0.5 * x for x in SQ[0]]
    hy = [0.5 + 0.5 * y for y in SQ[1]]
    xs, ys = SQ[0] + hx, SQ[1] + hy
    n_rings, area, perim, cx, cy = K.polygon_measures(xs, ys, [0, 5, 10])
    assert n_rings == 2
    assert area == 4.0 - 1.0
    assert perim == 8.0 + 4.0
    assert abs(cx - 1.0) < 1e-12 and abs(cy - 1.0) < 1e-12


def test_kernel_offcenter_hole_shifts_centroid():
    # quarter-size hole in the right half pulls the centroid left
    hx = [1.25 + 0.25 * x for x in SQ[0]]
    hy = [0.75 + 0.25 * y for y in SQ[1]]
    xs, ys = SQ[0] + hx, SQ[1] + hy
    _, area, _, cx, cy = K.polygon_measures(xs, ys, [0, 5, 10])
    assert area == pytest.approx(4.0 - 0.25)
    # exact even-odd weighted centroid: (4*1 - 0.25*1.5) / 3.75
    assert cx == pytest.approx((4.0 * 1.0 - 0.25 * 1.5) / 3.75)
    assert cy == pytest.approx(1.0)


def test_kernel_zero_area_null_centroid():
    n_rings, area, perim, cx, cy = K.polygon_measures(
        [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0, 3]
    )
    assert area == 0.0 and cx is None and cy is None


def test_spark_matches_kernel_bitwise(spark):
    from cadastre_pg_spark.data.parcels import generate_star_parcels

    df = generate_star_parcels(spark, 120, partitions=4, size_scale=20.0).persist()
    out = {r.parcel_id: r for r in geometry_measures(df).collect()}
    n_holes = 0
    for row in df.collect():
        n_rings, area, perim, cx, cy = K.polygon_measures(
            row.xs, row.ys, row.ring_offsets
        )
        o = out[row.parcel_id]
        n_holes += n_rings == 2
        # BITWISE equality: both sides fold left-to-right in doubles
        assert (o.n_rings, o.area, o.perimeter, o.cx, o.cy) == (
            n_rings,
            area,
            perim,
            cx,
            cy,
        )
    assert n_holes >= 5  # hole rung actually exercised
    df.unpersist()


def test_spark_degenerate_ring_contributes_nothing(spark):
    # consecutive equal offsets (empty ring) and a 1-vertex ring: both
    # masked, never an INVALID_ARRAY_INDEX under ANSI mode
    df = spark.createDataFrame(
        [(1, SQ[0] + [9.9], SQ[1] + [9.9], [0, 5, 5, 6])],
        "parcel_id long, xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    row = geometry_measures(df).collect()[0]
    assert (row.area, row.perimeter) == (4.0, 8.0)
    assert row.n_rings == 3


def test_spark_plan_is_map_only(spark):
    """The measure plan must not shuffle — no Exchange node at all."""
    from cadastre_pg_spark.data.parcels import generate_star_parcels

    df = generate_star_parcels(spark, 50, partitions=4, size_scale=20.0)
    plan = geometry_measures(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_vec_matches_fold_bitwise(spark):
    """Arrow fast path == Catalyst fold, bit-for-bit (incl. holes)."""
    import struct

    from cadastre_pg_spark.data.parcels import generate_star_parcels
    from cadastre_pg_spark.operators.measures import geometry_measures_vec

    df = generate_star_parcels(spark, 400, partitions=4, size_scale=20.0)
    a = geometry_measures(df).orderBy("parcel_id").collect()
    b = geometry_measures_vec(df).orderBy("parcel_id").collect()

    def key(r):
        return [
            struct.pack("<d", v) if isinstance(v, float) else v for v in r
        ]

    assert len(a) == len(b) == 400
    for r1, r2 in zip(a, b):
        assert key(r1) == key(r2)


def test_vec_degenerate_rings(spark):
    from cadastre_pg_spark.operators.measures import geometry_measures_vec

    df = spark.createDataFrame(
        [(1, SQ[0] + [9.9], SQ[1] + [9.9], [0, 5, 5, 6])],
        "parcel_id long, xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    row = geometry_measures_vec(df).collect()[0]
    assert (row.area, row.perimeter, row.n_rings) == (4.0, 8.0, 3)
