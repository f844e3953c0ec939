"""path_interpolate: quantized-crossing midpoint vs a Python replay,
vertex-boundary targets, degenerate users."""

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from cadastre_pg_spark.operators.windows import PATH_UNIT, path_interpolate


def _df(spark, rows):
    # rows: (event_id, user_id, minute, lon, lat)
    t0 = datetime(2024, 1, 1)
    data = [
        (eid, uid, t0 + timedelta(minutes=m), float(x), float(y))
        for eid, uid, m, x, y in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, lon double, lat double"
    )


def _brute(rows, num=1, den=2):
    """Replay the exact quantized rule per user."""
    byu = {}
    for eid, uid, m, x, y in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        byu.setdefault(uid, []).append((eid, float(x), float(y)))
    out = {}
    for uid, pts in byu.items():
        segs = []
        for (e0, x0, y0), (e1, x1, y1) in zip(pts, pts[1:]):
            d = math.sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
            segs.append((e1, x0, y0, x1, y1, int(math.floor(d * PATH_UNIT))))
        total = sum(s[-1] for s in segs)
        if total <= 0:
            continue
        target = (total * num) // den
        csum = 0
        for e1, x0, y0, x1, y1, du in segs:
            prev = csum
            csum += du
            if csum > target and prev <= target:
                f = (target - prev) / du
                out[uid] = (e1, x0 + f * (x1 - x0), y0 + f * (y1 - y0))
                break
    return out


def test_midpoint_matches_python_replay(spark):
    rows = [
        (1, 10, 0, 0.0, 0.0),
        (2, 10, 1, 3.0, 0.0),
        (3, 10, 2, 3.0, 4.0),
        (4, 20, 0, 1.0, 1.0),
        (5, 20, 1, 1.0, 1.0),  # zero-length step mid-path
        (6, 20, 2, 1.0, 5.0),
        (7, 30, 0, 2.0, 2.0),  # single point -> no output
        (8, 40, 0, 9.0, 9.0),  # all-identical -> total 0 -> no output
        (9, 40, 1, 9.0, 9.0),
    ]
    got = {
        r.user_id: (r.seg_event_id, r.px, r.py)
        for r in path_interpolate(_df(spark, rows)).collect()
    }
    want = _brute(rows)
    assert set(got) == set(want) == {10, 20}
    for uid in want:
        assert got[uid][0] == want[uid][0]
        assert got[uid][1] == want[uid][1]  # bitwise: same op order
        assert got[uid][2] == want[uid][2]


def test_target_on_vertex_boundary_picks_next_segment(spark):
    # two equal-length segments: target == csum of segment 1 exactly,
    # so the hit is segment 2 with f=0 -> the shared vertex
    rows = [(1, 1, 0, 0.0, 0.0), (2, 1, 1, 1.0, 0.0), (3, 1, 2, 2.0, 0.0)]
    out = path_interpolate(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.seg_event_id, r.px, r.py) == (3, 1.0, 0.0)


def test_quarter_fraction(spark):
    rows = [(1, 1, 0, 0.0, 0.0), (2, 1, 1, 4.0, 0.0)]
    out = path_interpolate(_df(spark, rows), frac_num=1, frac_den=4).collect()
    assert len(out) == 1
    assert abs(out[0].px - 1.0) < 1e-9 and out[0].py == 0.0


def test_frac_zero_returns_path_start(spark):
    rows = [(1, 1, 0, 5.0, 5.0), (2, 1, 1, 6.0, 5.0)]
    out = path_interpolate(_df(spark, rows), frac_num=0, frac_den=2).collect()
    assert len(out) == 1
    assert (out[0].px, out[0].py) == (5.0, 5.0)
