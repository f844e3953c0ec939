"""Geometry simplification — radial-distance vertex reduction (the
"simplify before export/tiling" step next to the GeoJSON sink and the
tile pipeline; reference geometry-walker family, geo/src/geom.rs).

Rule (sequential per ring, deterministic):
- the first vertex is always kept and seeds `last`;
- an interior vertex is kept iff its SQUARED planar distance from the
  last KEPT vertex is >= tol^2 (squared on both sides — no sqrt, so
  the decision is pure +,-,*,>= and replays bitwise anywhere);
- the closing vertex (== first) is always kept.

Radial-distance rather than Douglas-Peucker: DP's stack recursion has
no bounded-depth SQL replay, while this rule is a single sequential
pass — Catalyst fold (query path), recursive CTE walking the vertex
index (DuckDB oracle; list_reduce can't carry list-typed accumulator
fields in DuckDB 1.0), and a NumPy column-sequential sweep (fast
path) all produce identical keep flags.

Output is EXPLODED (id, ring_idx, pos, x, y): one row per kept vertex
(driver-comparable scalars; reassembly into flat arrays is the
inverse of the explode and callers that need it can groupBy back
through sort_array, like line_assembly's consumers).

Scale shape: map-only — the fold runs inside the row, the explode
fans out only KEPT vertices. No exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simplify_radial(
    df: DataFrame,
    tol: float,
    id_col: str = "parcel_id",
    xs: str = "xs",
    ys: str = "ys",
    offsets: str = "ring_offsets",
) -> DataFrame:
    """-> (id, ring_idx, pos, x, y): kept vertices per the module rule.
    `pos` is the vertex's 0-based position within its ORIGINAL ring.
    Rings with fewer than 2 vertices are dropped (nothing to keep)."""
    tol2 = float(tol) * float(tol)
    x = F.col(xs)
    y = F.col(ys)
    off = F.col(offsets)

    def ring_kept(r):
        start = F.element_at(off, r)
        end = F.element_at(off, r + F.lit(1))
        n = (end - start).cast("int")

        def vx(i):  # ring-local 0-based -> 1-based global element_at
            return F.element_at(x, (start + i + F.lit(1)).cast("int"))

        def vy(i):
            return F.element_at(y, (start + i + F.lit(1)).cast("int"))

        interior = F.when(
            n >= F.lit(3), F.sequence(F.lit(1), n - F.lit(2))
        ).otherwise(F.array().cast("array<int>"))
        acc0 = F.struct(
            vx(F.lit(0)).alias("lx"),
            vy(F.lit(0)).alias("ly"),
            F.array(F.lit(0)).alias("kept"),
        )

        def step(acc, i):
            dx = vx(i) - acc.lx
            dy = vy(i) - acc.ly
            keep = (dx * dx + dy * dy) >= F.lit(tol2)
            return F.struct(
                F.when(keep, vx(i)).otherwise(acc.lx).alias("lx"),
                F.when(keep, vy(i)).otherwise(acc.ly).alias("ly"),
                F.when(keep, F.concat(acc.kept, F.array(i)))
                .otherwise(acc.kept)
                .alias("kept"),
            )

        folded = F.aggregate(interior, acc0, step)
        kept = F.when(
            n >= F.lit(2), F.concat(folded.kept, F.array(n - F.lit(1)))
        ).otherwise(F.array().cast("array<int>"))
        return F.struct(r.alias("ring"), kept.alias("kept"), start.alias("start"))

    rings = F.transform(F.sequence(F.lit(1), F.size(off) - F.lit(1)), ring_kept)
    exploded = (
        df.select(F.col(id_col), x.alias("_x"), y.alias("_y"), F.explode(rings).alias("rk"))
        .select(
            F.col(id_col),
            (F.col("rk.ring") - F.lit(1)).alias("ring_idx"),
            F.col("rk.start").alias("_start"),
            F.explode("rk.kept").alias("pos"),
            F.col("_x"),
            F.col("_y"),
        )
        .select(
            F.col(id_col),
            "ring_idx",
            F.col("pos").cast("int").alias("pos"),
            F.element_at(
                F.col("_x"), (F.col("_start") + F.col("pos") + F.lit(1)).cast("int")
            ).alias("x"),
            F.element_at(
                F.col("_y"), (F.col("_start") + F.col("pos") + F.lit(1)).cast("int")
            ).alias("y"),
        )
    )
    return exploded
