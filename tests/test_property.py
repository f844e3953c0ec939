"""Property-based kernel tests (hypothesis) — beyond the reference's
example-based layer (SURVEY.md §5: 'no property-based testing' there)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cadastre_pg_spark.kernels import cells as C
from cadastre_pg_spark.kernels.geomhash import geometry_hash, normalize_ring
from cadastre_pg_spark.kernels.lambert import lambert93_to_wgs84, wgs84_to_lambert93
from cadastre_pg_spark.kernels.mercator import mercator_to_wgs84, wgs84_to_mercator
from cadastre_pg_spark.kernels.pip import points_in_ring
from cadastre_pg_spark.kernels.rings import polygon_to_flat, reconstruct_rings

lons = st.floats(min_value=-4.99, max_value=8.99, allow_nan=False)
lats = st.floats(min_value=41.01, max_value=50.99, allow_nan=False)


@given(lons, lats)
@settings(max_examples=200, deadline=None)
def test_grid_cell_in_range_and_stable(lon, lat):
    for level in (7, 10, 12):
        c = int(C.grid_cell(lon, lat, level)[0])
        n = 1 << level
        assert 0 <= c < n * n
        assert c == int(C.grid_cell(lon, lat, level)[0])


@given(lons, lats)
@settings(max_examples=100, deadline=None)
def test_mercator_roundtrip(lon, lat):
    x, y = wgs84_to_mercator([lon], [lat])
    lon2, lat2 = mercator_to_wgs84(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@given(lons, lats)
@settings(max_examples=100, deadline=None)
def test_lambert_roundtrip(lon, lat):
    x, y = wgs84_to_lambert93([lon], [lat])
    lon2, lat2 = lambert93_to_wgs84(x, y)
    assert abs(lon2[0] - lon) < 1e-8
    assert abs(lat2[0] - lat) < 1e-8


@given(lons, lats)
@settings(max_examples=100, deadline=None)
def test_hex_cell_stable_and_packable(lon, lat):
    for res in (7, 9, 11):
        c = C.hex_cell([lon], [lat], res)
        q, r, rr = C.hex_unpack(c)
        assert int(rr[0]) == res
        assert int(C.hex_pack(q, r, res)[0]) == int(c[0])


@st.composite
def rings_with_center(draw):
    m = draw(st.integers(min_value=4, max_value=10))
    cx = draw(st.floats(min_value=-3, max_value=7, allow_nan=False))
    cy = draw(st.floats(min_value=42, max_value=50, allow_nan=False))
    jit = [draw(st.floats(min_value=-0.35, max_value=0.35)) for _ in range(m)]
    rad = [draw(st.floats(min_value=0.01, max_value=0.1)) for _ in range(m)]
    ang = 2 * np.pi * (np.arange(m) + np.asarray(jit)) / m
    ring = np.column_stack(
        [cx + np.asarray(rad) * np.cos(ang), cy + np.asarray(rad) * np.sin(ang)]
    )
    return np.vstack([ring, ring[:1]]), cx, cy


def rings():
    return rings_with_center().map(lambda t: t[0])


@given(rings(), st.integers(min_value=0, max_value=9))
@settings(max_examples=60, deadline=None)
def test_hash_rotation_invariant_property(ring, k):
    base = ring[:-1]
    rot = np.roll(base, k % len(base), axis=0)
    rot = np.vstack([rot, rot[:1]])
    xs1, ys1, o1 = polygon_to_flat([(ring, [])])
    xs2, ys2, o2 = polygon_to_flat([(rot, [])])
    assert geometry_hash(xs1, ys1, o1) == geometry_hash(xs2, ys2, o2)


@given(rings())
@settings(max_examples=60, deadline=None)
def test_stitching_recovers_ring(ring):
    k = len(ring) - 1
    arcs = [ring[j : j + 2] for j in range(k)]
    rng = np.random.default_rng(int(abs(ring[0, 0] * 1e6)) % 2**31)
    order = rng.permutation(k)
    arcs = [arcs[j] if j % 2 else arcs[j][::-1] for j in order]
    out = reconstruct_rings(arcs)
    assert len(out) == 1
    # same vertex set, same geometry hash after normalization
    xs1, ys1, o1 = polygon_to_flat([(ring, [])])
    xs2, ys2, o2 = polygon_to_flat([(out[0], [])])
    n1 = np.column_stack(normalize_ring(xs1, ys1))
    n2 = np.column_stack(normalize_ring(xs2, ys2))
    assert {tuple(p) for p in n1} == {tuple(p) for p in n2}


@given(rings_with_center())
@settings(max_examples=100, deadline=None)
def test_pip_center_inside(ring_c):
    # rings are star-shaped around their GENERATION center (bounded
    # angular gaps), so that center — not the vertex mean, which a
    # long-radius vertex can drag outside — must be inside
    ring, cx, cy = ring_c
    assert points_in_ring([cx], [cy], ring[:, 0], ring[:, 1])[0]


# ---- geodesic series kernel (round 5) ----

import math

from cadastre_pg_spark.kernels import geodesic as GD


@given(lons, lats, lons, lats)
@settings(max_examples=200, deadline=None)
def test_haversine_symmetric_nonneg_accurate(lon1, lat1, lon2, lat2):
    a = np.array
    d_ab = GD.haversine_m(a([lon1]), a([lat1]), a([lon2]), a([lat2]), np.sqrt)[0]
    d_ba = GD.haversine_m(a([lon2]), a([lat2]), a([lon1]), a([lat1]), np.sqrt)[0]
    # bitwise symmetry: sin_poly is exactly odd (sign-bit flip), the
    # squares kill the sign, and the cos product commutes bitwise
    assert d_ab == d_ba
    assert d_ab >= 0.0
    # identity of indiscernibles, exactly: all half-deltas are 0.0
    d_aa = GD.haversine_m(a([lon1]), a([lat1]), a([lon1]), a([lat1]), np.sqrt)[0]
    assert d_aa == 0.0
    # accuracy vs libm haversine everywhere hypothesis wanders
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1) / 2, math.radians(lon2 - lon1) / 2
    s = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    want = 2.0 * GD.R_EARTH * math.asin(math.sqrt(s))
    assert abs(d_ab - want) < 1e-4
