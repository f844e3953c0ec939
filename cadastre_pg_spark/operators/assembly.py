"""Distributed geometry assembly: unordered arcs -> repaired polygons.

The Spark form of the reference's central build (SURVEY.md J1/J2 +
G-group): associate arcs to features (equi-join), then per feature run
the repair ladder — self-closing detection, greedy ring stitching
(ring.rs:8-109), dead-end pruning (topology.rs:66-107), shell/hole
organization (topology.rs:6-63), convex-hull fallback
(fallback.rs:8-26) — inside an applyInPandas over feature groups,
with the validity filter (P6, cli.rs:1034-1070) and the normalized
geometry hash (H1, versioning/diff.rs:13-114) applied on the way out.

Failures never kill the run: rows route to a quarantine status column
(graceful degradation, cli.rs:487-497).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.geomhash import geometry_hash
from ..kernels.hull import convex_hull
from ..kernels.rings import (
    organize_rings,
    polygon_to_flat,
    reconstruct_rings,
    remove_dead_ends,
)

ARC_SCHEMA = (
    "feature_id string, arc_id long, xs array<double>, ys array<double>"
)
ASSEMBLED_SCHEMA = (
    "feature_id string, xs array<double>, ys array<double>, "
    "ring_offsets array<int>, geometry_hash binary, n_polygons int, "
    "status string"
)


def _assemble_one(arcs_xs, arcs_ys, prune_dead_ends: bool):
    arcs = [
        np.column_stack([np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)])
        for x, y in zip(arcs_xs, arcs_ys)
    ]
    if prune_dead_ends:
        kept = remove_dead_ends(arcs)
        if kept:
            arcs = kept
    try:
        rings = reconstruct_rings(arcs)
        status = "ok"
    except ValueError:
        # hull fallback over all arc points (>=3 required)
        allpts = np.concatenate(arcs) if arcs else np.empty((0, 2))
        hx, hy = convex_hull(allpts[:, 0], allpts[:, 1])
        ring = np.column_stack([hx, hy])
        rings = [np.vstack([ring, ring[:1]])]
        status = "hull_fallback"
    # validity filter (P6): rings need >= 4 points incl. closure
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        raise ValueError("no valid ring")
    polys = organize_rings(rings)
    xs, ys, offs = polygon_to_flat(polys)
    return xs, ys, offs, len(polys), status


def assemble_polygons(
    arcs: DataFrame, prune_dead_ends: bool = False
) -> DataFrame:
    """arcs (feature_id, arc_id, xs, ys) -> one repaired polygon row per
    feature (+ quarantined failures with status='error')."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for fid, g in pdf.groupby("feature_id", sort=False):
            try:
                xs, ys, offs, npoly, status = _assemble_one(
                    g["xs"].tolist(), g["ys"].tolist(), prune_dead_ends
                )
                out.append(
                    {
                        "feature_id": fid,
                        "xs": xs.tolist(),
                        "ys": ys.tolist(),
                        "ring_offsets": offs.astype("int32").tolist(),
                        "geometry_hash": geometry_hash(xs, ys, offs),
                        "n_polygons": npoly,
                        "status": status,
                    }
                )
            except (ValueError, IndexError) as ex:
                out.append(
                    {
                        "feature_id": fid,
                        "xs": [],
                        "ys": [],
                        "ring_offsets": [],
                        "geometry_hash": None,
                        "n_polygons": 0,
                        "status": f"error:{type(ex).__name__}",
                    }
                )
        return pd.DataFrame(out)

    return arcs.groupBy("feature_id").applyInPandas(
        per_group, schema=ASSEMBLED_SCHEMA
    )


LINES_SCHEMA = (
    "feature_id string, geom_type string, xs array<double>, ys array<double>, "
    "part_offsets array<int>, n_parts int, status string"
)


def assemble_lines(arcs: DataFrame) -> DataFrame:
    """G5 line builder (reference edigeo/src/repair/mod.rs:123-153):
    one PAR arc -> LineString, several -> MultiLineString; parts with
    < 2 coordinates are dropped, a feature with no usable part is
    quarantined (status='error:empty') instead of killing the run.

    Spark-first: the whole build is JVM expressions — sort_array over
    collected (arc_id, xs, ys) structs, flatten for the coordinates,
    and an aggregate fold for the part offsets. No Python anywhere
    (the Rust reference loops per feature; Catalyst's array algebra
    replaces the loop)."""
    parts = F.filter(
        F.sort_array(F.collect_list(F.struct("arc_id", "xs", "ys"))),
        lambda p: F.size(p.xs) >= 2,
    )
    grouped = arcs.groupBy("feature_id").agg(parts.alias("parts"))
    offsets = F.aggregate(
        F.col("parts"),
        F.array(F.lit(0)),
        lambda acc, p: F.concat(
            acc, F.array(F.element_at(acc, -1) + F.size(p.xs))
        ),
    )
    return grouped.select(
        "feature_id",
        F.when(F.size("parts") == 0, F.lit(None))
        .when(F.size("parts") == 1, F.lit("LineString"))
        .otherwise(F.lit("MultiLineString"))
        .alias("geom_type"),
        F.flatten(F.transform("parts", lambda p: p.xs)).alias("xs"),
        F.flatten(F.transform("parts", lambda p: p.ys)).alias("ys"),
        F.transform(offsets, lambda o: o.cast("int")).alias("part_offsets"),
        F.size("parts").cast("int").alias("n_parts"),
        F.when(F.size("parts") == 0, F.lit("error:empty"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def repair_flat_polygons(df: DataFrame) -> DataFrame:
    """ST_MakeValid analog at the MERGE boundary (reference repairs as
    it writes: cadastre-pg/src/export/postgres.rs:229-234). Upstream
    assembly already runs the repair ladder; this rung re-validates
    whatever reaches a sink/merge, because merged inputs may come from
    other writers:

    - unclosed rings are auto-closed (first vertex appended),
    - degenerate rings (< 3 distinct vertices, i.e. closed length < 4)
      are dropped,
    - a feature left with no ring is quarantined, not crashed.

    Pure JVM expressions (transform/filter/flatten/aggregate) — the
    repair runs inside whole-stage codegen, no Python. Adds
    repair_status: 'ok' | 'auto_closed' | 'dropped_ring' |
    'auto_closed+dropped_ring' | 'error:empty'."""
    n_rings = F.size("ring_offsets") - F.lit(1)
    idx = F.sequence(F.lit(0), n_rings - F.lit(1))

    def ring_slice(col, i):
        return F.slice(
            F.col(col),
            F.col("ring_offsets")[i] + 1,
            F.col("ring_offsets")[i + 1] - F.col("ring_offsets")[i],
        )

    rings = F.transform(
        idx, lambda i: F.struct(ring_slice("xs", i).alias("x"), ring_slice("ys", i).alias("y"))
    )
    closed = F.transform(
        rings,
        # rings with < 2 vertices pass through unchanged (ANSI
        # element_at on an empty array would raise; they are dropped by
        # the size>=4 keep filter below and counted as dropped_ring —
        # quarantined, not crashed, per this rung's contract)
        lambda r: F.when(F.size(r.x) < 2, r)
        .when(
            (F.element_at(r.x, 1) == F.element_at(r.x, -1))
            & (F.element_at(r.y, 1) == F.element_at(r.y, -1)),
            r,
        )
        .otherwise(
            F.struct(
                F.concat(r.x, F.slice(r.x, 1, 1)).alias("x"),
                F.concat(r.y, F.slice(r.y, 1, 1)).alias("y"),
            )
        ),
    )
    kept = F.filter(closed, lambda r: F.size(r.x) >= 4)
    out = df.withColumn("_rings", rings).withColumn("_closed", closed).withColumn(
        "_kept", kept
    )
    offsets = F.aggregate(
        F.col("_kept"),
        F.array(F.lit(0)),
        lambda acc, r: F.concat(acc, F.array(F.element_at(acc, -1) + F.size(r.x))),
    )
    # auto_closed reported only for rings that SURVIVE (a degenerate
    # ring that was closed and then dropped is just dropped_ring)
    n_autoclosed = F.size(
        F.filter(
            F.zip_with(
                F.col("_rings"),
                F.col("_closed"),
                lambda a, b: (F.size(a.x) != F.size(b.x)) & (F.size(b.x) >= 4),
            ),
            lambda v: v,
        )
    )
    n_dropped = F.size("_closed") - F.size("_kept")
    status = (
        F.when(F.size("_kept") == 0, F.lit("error:empty"))
        .when(
            (n_autoclosed > 0) & (n_dropped > 0), F.lit("auto_closed+dropped_ring")
        )
        .when(n_autoclosed > 0, F.lit("auto_closed"))
        .when(n_dropped > 0, F.lit("dropped_ring"))
        .otherwise(F.lit("ok"))
    )
    return out.select(
        *[c for c in df.columns if c not in ("xs", "ys", "ring_offsets")],
        F.flatten(F.transform("_kept", lambda r: r.x)).alias("xs"),
        F.flatten(F.transform("_kept", lambda r: r.y)).alias("ys"),
        F.transform(offsets, lambda o: o.cast("int")).alias("ring_offsets"),
        status.alias("repair_status"),
    )


def assembly_report(assembled: DataFrame) -> DataFrame:
    """A4-style ImportReport: counts by status + derived run status
    (Success / Partial / Failed — report.rs:211-226)."""
    counts = assembled.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    total = assembled.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("status").startswith("error"), 1).otherwise(0)).alias(
            "errors"
        ),
    )
    return total.select(
        "total",
        "errors",
        F.when(F.col("errors") == 0, F.lit("Success"))
        .when(F.col("errors") < F.col("total"), F.lit("Partial"))
        .otherwise(F.lit("Failed"))
        .alias("run_status"),
    ), counts
