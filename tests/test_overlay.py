"""rect_overlap_join goldens: pair-once semantics, area, guards."""

import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.operators.overlay import rect_overlap_join


def _rects(spark, rows):
    return spark.createDataFrame(
        rows, "rect_id long, x0 double, y0 double, x1 double, y1 double"
    )


def test_pair_once_across_many_shared_cells(spark):
    # two big rects overlapping across many level-6 cells -> one pair
    df = _rects(
        spark,
        [
            (1, 0.0, 44.0, 2.0, 46.0),
            (2, 1.0, 45.0, 3.0, 47.0),
            (3, 6.0, 49.0, 6.5, 49.5),  # far away, no pair
        ],
    )
    out = rect_overlap_join(df, level=6).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_id, r.b_id) == (1, 2)
    assert r.area == pytest.approx(1.0 * 1.0)


def test_touching_edges_do_not_pair(spark):
    df = _rects(spark, [(1, 0.0, 44.0, 1.0, 45.0), (2, 1.0, 44.0, 2.0, 45.0)])
    assert rect_overlap_join(df, level=6).count() == 0


def test_nested_rect_area(spark):
    df = _rects(spark, [(1, 0.0, 44.0, 4.0, 48.0), (2, 1.0, 45.0, 2.0, 46.0)])
    out = rect_overlap_join(df, level=6).collect()
    assert len(out) == 1 and out[0].area == pytest.approx(1.0)


def test_identical_rects(spark):
    df = _rects(spark, [(1, 0.0, 44.0, 1.0, 45.0), (2, 0.0, 44.0, 1.0, 45.0)])
    out = rect_overlap_join(df, level=6).collect()
    assert len(out) == 1 and out[0].area == pytest.approx(1.0)


def test_fanout_guard_raises(spark):
    df = _rects(spark, [(1, -4.9, 41.1, 8.9, 50.9), (2, 0.0, 44.0, 1.0, 45.0)])
    with pytest.raises(Exception, match="covers more than"):
        rect_overlap_join(df, level=8, max_cells_per_rect=100).count()


def test_mega_cell_cap_skips_and_reports(spark):
    # 40 tiny rects stacked in one spot; cap at 10 -> all skipped,
    # zero pairs, metric populated
    rows = [(i, 1.0, 44.5, 1.001, 44.501) for i in range(40)]
    out = rect_overlap_join(_rects(spark, rows), level=6, max_per_cell=10)
    assert out.count() == 0
    sk = out._skipped_cells.collect()
    assert len(sk) >= 1 and all(r.n > 10 for r in sk)


def test_cap_keeps_untouched_cells(spark):
    rows = [(i, 1.0, 44.5, 1.001, 44.501) for i in range(40)]
    rows += [(100, 5.0, 47.0, 5.1, 47.1), (101, 5.05, 47.05, 5.2, 47.2)]
    out = rect_overlap_join(_rects(spark, rows), level=6, max_per_cell=10)
    got = {(r.a_id, r.b_id) for r in out.collect()}
    assert got == {(100, 101)}


def test_out_of_bbox_rects_still_pair_via_clamped_cells(spark):
    # both rects fully west of the grid bbox: covers clamp to the
    # border cells; geometry predicate still decides the pair
    df = _rects(
        spark,
        [
            (1, -20.0, 44.0, -19.0, 45.0),
            (2, -19.5, 44.5, -18.5, 45.5),
            (3, -19.5, 48.0, -18.5, 49.0),  # same clamp column, no overlap
        ],
    )
    out = rect_overlap_join(df, level=6).collect()
    assert {(r.a_id, r.b_id) for r in out} == {(1, 2)}
    assert out[0].area == pytest.approx(0.25)


# ---------------------------------------------------------------- areal


def _areal(spark, rows, level=7):
    from cadastre_pg_spark.operators.overlay import areal_interpolate

    df = spark.createDataFrame(
        rows, "rect_id long, value double, x0 double, y0 double, x1 double, y1 double"
    )
    return areal_interpolate(df, level=level)


def test_areal_single_cell_keeps_full_value(spark):
    # a tiny rect strictly inside one level-7 cell: est == value
    rows = [(1, 250.0, 0.01, 45.01, 0.02, 45.02)]
    out = _areal(spark, rows).collect()
    assert len(out) == 1
    assert out[0].n_rects == 1
    assert abs(out[0].est - 250.0) < 1e-9


def test_areal_mass_conservation_across_cells(spark):
    # rects straddling several cells: total est == total value up to
    # one quantization ulp (1e-12) per (rect, cell) contribution
    rows = [
        (1, 100.0, -0.3, 44.9, 0.4, 45.3),
        (2, 40.0, 2.0, 47.0, 2.5, 47.9),
        (3, 7.5, -4.99, 41.01, -4.8, 41.2),
    ]
    out = _areal(spark, rows).collect()
    total = sum(r.est for r in out)
    n_contrib = sum(r.n_rects for r in out)
    assert abs(total - 147.5) <= n_contrib * 1e-12
    # every covered cell got a strictly positive share
    assert all(r.units > 0 for r in out)


def test_areal_clamps_out_of_grid_rect(spark):
    # rect entirely west of the grid: clamped to edge cells, zero-area
    # slivers filtered, so it contributes nothing
    rows = [(1, 99.0, -20.0, 45.0, -19.0, 45.5)]
    assert _areal(spark, rows).count() == 0


def test_areal_cover_guard_raises_loudly(spark):
    from cadastre_pg_spark.operators.overlay import areal_interpolate

    df = spark.createDataFrame(
        [(1, 5.0, -4.9, 41.1, 8.9, 50.9)],
        "rect_id long, value double, x0 double, y0 double, x1 double, y1 double",
    )
    import pytest as _pt

    with _pt.raises(Exception, match="covers more than"):
        areal_interpolate(df, level=7, max_cells_per_rect=16).collect()
