"""Distributed geometry assembly vs the single-process repair ladder."""

import numpy as np
import pyspark.sql.functions as F

from cadastre_pg_spark.kernels.geomhash import geometry_hash
from cadastre_pg_spark.operators.assembly import assemble_polygons, assembly_report

SQUARE_ARCS = [
    ([0.0, 1.0], [0.0, 0.0]),
    ([1.0, 1.0], [0.0, 1.0]),
    ([1.0, 0.0], [1.0, 1.0]),
    ([0.0, 0.0], [1.0, 0.0]),
]


def _arcs_df(spark, feats):
    rows = []
    for fid, arcs in feats.items():
        for j, (xs, ys) in enumerate(arcs):
            rows.append((fid, j, xs, ys))
    return spark.createDataFrame(
        rows, "feature_id string, arc_id long, xs array<double>, ys array<double>"
    )


def test_assemble_square_from_unordered_arcs(spark):
    df = _arcs_df(spark, {"f1": SQUARE_ARCS})
    out = assemble_polygons(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == "ok"
    assert r.n_polygons == 1
    assert len(r.xs) == 5  # closed ring
    # hash matches the single-process kernel on the same geometry
    assert bytes(r.geometry_hash) == geometry_hash(
        np.asarray(r.xs), np.asarray(r.ys), np.asarray(r.ring_offsets)
    )


def test_assemble_hole_and_multipolygon(spark):
    hole = [
        ([0.25, 0.75], [0.25, 0.25]),
        ([0.75, 0.75], [0.25, 0.75]),
        ([0.75, 0.25], [0.75, 0.75]),
        ([0.25, 0.25], [0.75, 0.25]),
    ]
    far = [([10.0, 11.0, 11.0, 10.0, 10.0], [10.0, 10.0, 11.0, 11.0, 10.0])]
    out = {
        r.feature_id: r
        for r in assemble_polygons(
            _arcs_df(spark, {"holed": SQUARE_ARCS + hole, "multi": SQUARE_ARCS + far})
        ).collect()
    }
    assert out["holed"].n_polygons == 1
    assert len(out["holed"].ring_offsets) == 3  # exterior + hole
    assert out["multi"].n_polygons == 2


def test_hull_fallback_and_report(spark):
    # two disjoint open arcs that cannot close -> hull fallback
    bad = [([0.0, 1.0], [0.0, 0.0]), ([5.0, 6.0], [5.0, 5.0])]
    # a single 2-point arc -> hull fails (collinear) -> quarantined
    worse = [([0.0, 1.0], [0.0, 0.0])]
    out = {
        r.feature_id: r
        for r in assemble_polygons(
            _arcs_df(spark, {"ok": SQUARE_ARCS, "bad": bad, "worse": worse})
        ).collect()
    }
    assert out["ok"].status == "ok"
    assert out["bad"].status == "hull_fallback"
    assert out["worse"].status.startswith("error")
    report, counts = assembly_report(
        assemble_polygons(_arcs_df(spark, {"ok": SQUARE_ARCS, "worse": worse}))
    )
    r = report.head()
    assert r.total == 2 and r.errors == 1 and r.run_status == "Partial"


def test_repair_flat_polygons_merge_rung(spark):
    """J4 merge-boundary validity rung (postgres.rs:229-234 analog):
    auto-close, degenerate-ring drop, empty quarantine — and a no-op on
    already-valid input."""
    from cadastre_pg_spark.operators.assembly import repair_flat_polygons

    rows = [
        # valid closed square
        ("ok", [0.0, 1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0], [0, 5]),
        # unclosed square -> auto_closed
        ("open", [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0], [0, 4]),
        # valid shell + degenerate 2-point ring -> dropped_ring
        (
            "degen",
            [0.0, 1.0, 1.0, 0.0, 0.0, 5.0, 6.0],
            [0.0, 0.0, 1.0, 1.0, 0.0, 5.0, 6.0],
            [0, 5, 7],
        ),
        # nothing valid -> quarantined
        ("empty", [5.0, 6.0], [5.0, 6.0], [0, 2]),
        # ZERO-LENGTH ring (consecutive equal offsets, plausible from
        # merged foreign writers): must quarantine, not raise ANSI
        # INVALID_ARRAY_INDEX in the close step
        ("zero_ring", [], [], [0, 0]),
        # valid shell + zero-length ring -> the empty ring is dropped
        (
            "shell_plus_zero",
            [0.0, 1.0, 1.0, 0.0, 0.0],
            [0.0, 0.0, 1.0, 1.0, 0.0],
            [0, 5, 5],
        ),
        # single-vertex ring -> dropped, not crashed
        ("one_pt", [3.0], [3.0], [0, 1]),
    ]
    df = spark.createDataFrame(
        rows,
        "feature_id string, xs array<double>, ys array<double>, ring_offsets array<int>",
    )
    got = {r.feature_id: r for r in repair_flat_polygons(df).collect()}
    assert got["ok"].repair_status == "ok"
    assert got["ok"].xs == [0.0, 1.0, 1.0, 0.0, 0.0]
    assert got["open"].repair_status == "auto_closed"
    assert got["open"].xs == [0.0, 1.0, 1.0, 0.0, 0.0]
    assert got["open"].ring_offsets == [0, 5]
    assert got["degen"].repair_status == "dropped_ring"
    assert got["degen"].ring_offsets == [0, 5]
    assert got["empty"].repair_status == "error:empty"
    assert got["empty"].xs == []
    assert got["zero_ring"].repair_status == "error:empty"
    assert got["zero_ring"].xs == []
    assert got["shell_plus_zero"].repair_status == "dropped_ring"
    assert got["shell_plus_zero"].ring_offsets == [0, 5]
    assert got["one_pt"].repair_status == "error:empty"
    # auto-closed geometry still contains its points (PIP sanity)
    import numpy as np
    from cadastre_pg_spark.kernels.pip import points_in_polygon

    r = got["open"]
    assert points_in_polygon(
        np.array([0.5]), np.array([0.5]),
        np.array(r.xs), np.array(r.ys), np.array(r.ring_offsets),
    )[0]
