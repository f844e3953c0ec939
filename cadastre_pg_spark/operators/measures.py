"""Geometry measures operator — per-polygon area / perimeter / centroid
entirely JVM-side (ST_Area / ST_Perimeter / ST_Centroid analog; the
reference computes these through its geometry walker, geo/src/geom.rs).

Scale shape: a MAP-ONLY plan. Every measure is a per-row fold over the
polygon's own vertex arrays (Catalyst ArrayAggregate — strictly
left-to-right, so the sequential-double kernel and DuckDB's
list_reduce replay it bitwise; see kernels/measures.py docstring for
the parity contract). No explode, no groupBy, no exchange: at 100 TB
this runs as one whole-stage-codegen pass over the parquet scan, and
partial results never leave their input partition. The usual
explode+DECIMAL-SUM shape would be exact too but costs a shuffle keyed
on (polygon, ring) for zero benefit — rings are bounded-size arrays
already colocated in the row. Each ring is walked ONCE: the fold
accumulator is a struct of all four running sums (a2, perim, mx, my),
not four separate folds.

Rings follow the engine's flat-array model (closed rings segmented by
ring_offsets; ring 0 exterior, rest even-odd holes wound the same
way). Degenerate rings (< 2 vertices between offsets) contribute
nothing — F.sequence(start, end-2) with end-2 < start would yield a
DESCENDING sequence, so they are masked explicitly rather than
relying on an empty fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _zero4() -> Column:
    # built lazily — F.lit at module import would require a live session
    return F.struct(
        F.lit(0.0).alias("a2"),
        F.lit(0.0).alias("perim"),
        F.lit(0.0).alias("mx"),
        F.lit(0.0).alias("my"),
    )


def _ring_sums(xs: Column, ys: Column, start: Column, end: Column) -> Column:
    """One left-to-right pass over the closed ring's edges (i in
    [start, end-2], 0-based) accumulating struct(a2, perim, mx, my)."""
    idx = F.when(
        end - start >= F.lit(2),
        F.sequence(start.cast("int"), (end - F.lit(2)).cast("int")),
    ).otherwise(F.array().cast("array<int>"))

    def step(acc, i):
        x1 = F.element_at(xs, i + F.lit(1))
        y1 = F.element_at(ys, i + F.lit(1))
        x2 = F.element_at(xs, i + F.lit(2))
        y2 = F.element_at(ys, i + F.lit(2))
        cross = x1 * y2 - x2 * y1
        dx = x2 - x1
        dy = y2 - y1
        return F.struct(
            (acc.a2 + cross).alias("a2"),
            (acc.perim + F.sqrt(dx * dx + dy * dy)).alias("perim"),
            (acc.mx + (x1 + x2) * cross).alias("mx"),
            (acc.my + (y1 + y2) * cross).alias("my"),
        )

    return F.aggregate(idx, _zero4(), step)


def geometry_measures(
    df: DataFrame,
    id_col: str = "parcel_id",
    xs: str = "xs",
    ys: str = "ys",
    offsets: str = "ring_offsets",
) -> DataFrame:
    """-> (id, n_rings, area, perimeter, cx, cy); cx/cy null for
    zero-area polygons. All arithmetic is IEEE-double in fixed order —
    see module docstring for the oracle-parity contract."""
    x = F.col(xs)
    y = F.col(ys)
    off = F.col(offsets)
    n_rings = (F.size(off) - F.lit(1)).cast("int")

    rings_expr = F.transform(
        F.sequence(F.lit(1), F.size(off) - F.lit(1)),
        lambda r: F.struct(
            r.alias("r"),
            _ring_sums(
                x, y, F.element_at(off, r), F.element_at(off, r + F.lit(1))
            ).alias("s"),
        ),
    )
    # Hoist into its own projection: the four combining folds below each
    # reference the rings array, and CollapseProject keeps a
    # multi-referenced non-cheap alias in its own Project instead of
    # inlining four copies of the per-ring edge walk.
    df = df.withColumn("_rings", rings_expr)
    rings = F.col("_rings")

    def signed(ring, m):
        # orientation-correct the moment, then even-odd weight by ring pos
        s = F.when(ring.s.a2 < F.lit(0.0), -m).otherwise(m)
        return F.when(ring.r == F.lit(1), s).otherwise(-s)

    area2_eff = F.aggregate(
        rings,
        F.lit(0.0),
        lambda acc, ring: acc
        + F.when(ring.r == F.lit(1), F.abs(ring.s.a2)).otherwise(-F.abs(ring.s.a2)),
    )
    perimeter = F.aggregate(rings, F.lit(0.0), lambda acc, ring: acc + ring.s.perim)
    numx = F.aggregate(
        rings, F.lit(0.0), lambda acc, ring: acc + signed(ring, ring.s.mx)
    )
    numy = F.aggregate(
        rings, F.lit(0.0), lambda acc, ring: acc + signed(ring, ring.s.my)
    )

    zero = area2_eff == F.lit(0.0)
    return df.select(
        F.col(id_col),
        n_rings.alias("n_rings"),
        (area2_eff / F.lit(2)).alias("area"),
        perimeter.alias("perimeter"),
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(numx / (F.lit(3.0) * area2_eff))
        .alias("cx"),
        F.when(zero, F.lit(None).cast("double"))
        .otherwise(numy / (F.lit(3.0) * area2_eff))
        .alias("cy"),
    )
