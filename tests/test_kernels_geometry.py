"""Ring stitching / topology / hull / PIP / hash kernel tests, mirroring
the reference's unit layer (SURVEY.md §5: ring.rs:117-150,
topology.rs:109-126, fallback.rs:28-42, diff.rs:126-201)."""

import numpy as np
import pytest

from cadastre_pg_spark.kernels.geomhash import geometry_hash, point_hash
from cadastre_pg_spark.kernels.hull import convex_hull
from cadastre_pg_spark.kernels.numparse import (
    parse_coord_pair,
    parse_edigeo_int,
    parse_edigeo_number,
    validate_date,
)
from cadastre_pg_spark.kernels.pip import points_in_polygon, points_in_ring
from cadastre_pg_spark.kernels.rings import (
    organize_rings,
    polygon_to_flat,
    reconstruct_rings,
    remove_dead_ends,
)

SQUARE = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)


def test_ring_from_four_unordered_arcs():
    arcs = [
        np.array([[1, 1], [0, 1]], float),
        np.array([[0, 0], [1, 0]], float),
        np.array([[0, 1], [0, 0]], float),
        np.array([[1, 0], [1, 1]], float),
    ]
    rings = reconstruct_rings(arcs)
    assert len(rings) == 1
    r = rings[0]
    assert np.array_equal(r[0], r[-1])
    assert len(np.unique(r[:-1], axis=0)) == 4


def test_self_closing_arc():
    rings = reconstruct_rings([SQUARE.copy()])
    assert len(rings) == 1


def test_ring_autoclose_gap():
    arcs = [np.array([[0, 0], [1, 0], [1, 1], [0, 0.9999999]], float)]
    rings = reconstruct_rings(arcs)
    assert len(rings) == 1
    assert np.array_equal(rings[0][0], rings[0][-1])


def test_no_ring_raises():
    with pytest.raises(ValueError):
        reconstruct_rings([])


def test_organize_single_ring():
    polys = organize_rings([SQUARE])
    assert len(polys) == 1
    assert polys[0][1] == []


def test_organize_hole():
    hole = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]], float
    )
    polys = organize_rings([hole, SQUARE])
    assert len(polys) == 1
    ext, holes = polys[0]
    assert len(holes) == 1
    assert np.array_equal(ext, SQUARE)


def test_organize_multipolygon():
    far = SQUARE + 10.0
    polys = organize_rings([SQUARE, far])
    assert len(polys) == 2


def test_remove_dead_ends():
    loop = [
        np.array([[0, 0], [1, 0]], float),
        np.array([[1, 0], [1, 1]], float),
        np.array([[1, 1], [0, 0]], float),
    ]
    culdesac = np.array([[1, 1], [5, 5]], float)
    kept = remove_dead_ends(loop + [culdesac])
    assert len(kept) == 3


def test_convex_hull():
    xs = np.array([0, 1, 1, 0, 0.5])
    ys = np.array([0, 0, 1, 1, 0.5])
    hx, hy = convex_hull(xs, ys)
    assert len(hx) == 4
    with pytest.raises(ValueError):
        convex_hull([0, 1], [0, 1])


def test_pip_square():
    inside = points_in_ring([0.5, 1.5, -0.1], [0.5, 0.5, 0.5], SQUARE[:, 0], SQUARE[:, 1])
    assert inside.tolist() == [True, False, False]


def test_pip_with_hole():
    hole = np.array(
        [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]], float
    )
    xs, ys, offs = polygon_to_flat([(SQUARE, [hole])])
    res = points_in_polygon([0.5, 0.1, 2.0], [0.5, 0.1, 0.5], xs, ys, offs)
    assert res.tolist() == [False, True, False]  # center is in the hole


def test_hash_rotation_invariance():
    """Same square under ring rotation hashes identically (diff.rs:159-200)."""
    base = SQUARE[:-1]
    hashes = set()
    for k in range(4):
        ring = np.roll(base, k, axis=0)
        ring = np.vstack([ring, ring[:1]])
        xs, ys, offs = polygon_to_flat([(ring, [])])
        hashes.add(geometry_hash(xs, ys, offs))
    assert len(hashes) == 1
    h = hashes.pop()
    assert len(h) == 32


def test_hash_inequality_and_reflection():
    other = SQUARE.copy()
    other[:, 0] += 1.0
    xs1, ys1, o1 = polygon_to_flat([(SQUARE, [])])
    xs2, ys2, o2 = polygon_to_flat([(other, [])])
    assert geometry_hash(xs1, ys1, o1) != geometry_hash(xs2, ys2, o2)
    # reflection (reversed orientation) is NOT invariant (diff.rs semantics)
    rev = SQUARE[::-1].copy()
    xs3, ys3, o3 = polygon_to_flat([(rev, [])])
    assert geometry_hash(xs1, ys1, o1) != geometry_hash(xs3, ys3, o3)
    assert len(point_hash(1.0, 2.0)) == 32


def test_numparse_goldens():
    assert parse_edigeo_number("+1895.") == 1895.0
    assert parse_edigeo_int("01") == 1
    assert parse_edigeo_number("  +2.5 ") == 2.5
    assert parse_edigeo_number("abc") is None
    assert parse_coord_pair("+881824.53;+6663821.17;") == (881824.53, 6663821.17)
    assert validate_date("2024-01")
    assert not validate_date("2024-13")
    assert not validate_date("24-01")
    assert not validate_date("2024/01")
