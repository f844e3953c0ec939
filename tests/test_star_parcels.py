"""Star-parcel generator invariants: the polygons must be SIMPLE
(star-shaped around their center by construction) and the planted
holes strictly interior — otherwise the even-odd PIP and the cover
kernel disagree about what 'inside' means."""

import numpy as np

from cadastre_pg_spark.data.parcels import generate_star_parcels
from cadastre_pg_spark.kernels.pip import points_in_polygon


def test_star_parcels_simple_and_holes_interior(spark):
    rows = generate_star_parcels(spark, 120, size_scale=20.0).collect()
    n_holes = 0
    for r in rows:
        xs, ys, offs = np.array(r.xs), np.array(r.ys), np.array(r.ring_offsets)
        m = len(xs[offs[0] : offs[1]]) - 1
        assert 4 <= m <= 7
        ext_x, ext_y = xs[: offs[1]], ys[: offs[1]]
        assert ext_x[0] == ext_x[-1] and ext_y[0] == ext_y[-1]
        # star-shaped around the vertex centroid: polar angles of the
        # open ring must be strictly monotone (mod 2pi) — this is the
        # simplicity guarantee (no self-intersection)
        gx, gy = ext_x[:-1], ext_y[:-1]
        ang = np.arctan2(gy - gy.mean(), gx - gx.mean())
        rolled = np.unwrap(ang - ang[0])
        assert np.all(np.diff(rolled) > 0) or np.all(np.diff(rolled) < 0), r.parcel_id
        if len(offs) == 3:
            n_holes += 1
            hx, hy = xs[offs[1] : offs[2]], ys[offs[1] : offs[2]]
            # every hole vertex strictly inside the exterior ring
            inside = points_in_polygon(hx[:-1], hy[:-1], ext_x, ext_y, np.array([0, len(ext_x)]))
            assert inside.all(), r.parcel_id
    assert n_holes == 6  # 120/20


def test_star_parcels_deterministic(spark):
    a = generate_star_parcels(spark, 30).collect()
    b = generate_star_parcels(spark, 30).collect()
    ka = sorted((r.parcel_id, tuple(r.xs), tuple(r.ys)) for r in a)
    kb = sorted((r.parcel_id, tuple(r.xs), tuple(r.ys)) for r in b)
    assert ka == kb
