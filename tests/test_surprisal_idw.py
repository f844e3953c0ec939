"""surprisal and idw_grid goldens."""

import math

import pytest

from cadastre_pg_spark.kernels import cells as C
from cadastre_pg_spark.operators.density import idw_grid
from cadastre_pg_spark.operators.textanalysis import surprisal


def _u(x):
    return round(math.log(x) * 1e6)


def test_surprisal_hand_computed(spark):
    # corpus: a a b | b c  ->  n(a)=2 n(b)=2 n(c)=1, N=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in surprisal(df).collect()}
    ln2u, ln5u = _u(2), _u(5)
    assert out[1].n_tokens == 3
    # the operator rounds to 6 dp at the end
    assert out[1].surprisal == pytest.approx(
        (ln5u - (3 * ln2u) / 3) / 1e6, abs=1e-6
    )
    assert out[2].surprisal == pytest.approx(
        (ln5u - (ln2u + 0) / 2) / 1e6, abs=1e-6
    )


def test_surprisal_uniform_is_ln_vocab(spark):
    # 4 equally frequent tokens -> mean surprisal == ln 4 for every doc
    df = spark.createDataFrame(
        [(1, "p q"), (2, "r s")], "doc_id long, text string"
    )
    for r in surprisal(df).collect():
        assert r.surprisal == pytest.approx(math.log(4), abs=1e-5)


def _center(ix, iy, level):
    n = 1 << level
    wx = (C.GRID_LON1 - C.GRID_LON0) / n
    wy = (C.GRID_LAT1 - C.GRID_LAT0) / n
    return C.GRID_LON0 + (ix + 0.5) * wx, C.GRID_LAT0 + (iy + 0.5) * wy


def _pts(spark, rows, level):
    df = spark.createDataFrame(rows, "x double, y double, v double")
    from cadastre_pg_spark.data import synthetic as S

    return df.select(
        S.grid_cell_col(df.x, df.y, level).alias("cell"), "x", "y", "v"
    )


def test_idw_exact_hit_returns_sample_value(spark):
    level = 3
    cx, cy = _center(3, 4, level)
    out = {r.cell: r for r in
           idw_grid(_pts(spark, [(cx, cy, 7.5)], level), level).collect()}
    n = 1 << level
    assert out[3 * n + 4].est == 7.5  # exact hit short-circuit
    assert len(out) == 9  # interior: all 9 neighbors get an estimate
    # neighbors interpolate from the single sample: est ~ v
    for cell, r in out.items():
        assert r.est == pytest.approx(7.5, rel=1e-3)
        assert r.n_samples == 1


def test_idw_equidistant_average(spark):
    level = 3
    cx, cy = _center(2, 2, level)
    n = 1 << level
    wx = (C.GRID_LON1 - C.GRID_LON0) / n
    rows = [(cx - 0.3 * wx, cy, 1.0), (cx + 0.3 * wx, cy, 3.0)]
    out = {r.cell: r for r in idw_grid(_pts(spark, rows, level), level).collect()}
    c = out[2 * n + 2]
    assert c.n_samples == 2
    assert c.est == pytest.approx(2.0, rel=1e-3)


def test_idw_corner_targets(spark):
    level = 3
    cx, cy = _center(0, 0, level)
    out = idw_grid(_pts(spark, [(cx, cy, 1.0)], level), level).collect()
    assert len(out) == 4  # corner cell only has 4 in-grid neighbors
