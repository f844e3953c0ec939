"""Geodesic kernel invariants: the truncated-series haversine must be
(a) accurate vs libm haversine on the engine bbox (<0.1 mm), and
(b) BITWISE identical across NumPy, Spark Columns, and the DuckDB SQL
twin — the cross-engine portability contract every oracle rests on.
"""

import math
import struct

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from cadastre_pg_spark.kernels import geodesic as GD
from cadastre_pg_spark.kernels.cells import (
    GRID_LAT0,
    GRID_LAT1,
    GRID_LON0,
    GRID_LON1,
)


def _libm_haversine(lon1, lat1, lon2, lat2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2.0
    dl = math.radians(lon2 - lon1) / 2.0
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2.0 * GD.R_EARTH * math.asin(math.sqrt(a))


def _bbox_samples(n_side=12, seed=7):
    """Deterministic point pairs spanning the bbox, incl. corners."""
    rng = np.random.RandomState(seed)
    lons = np.linspace(GRID_LON0, GRID_LON1, n_side)
    lats = np.linspace(GRID_LAT0, GRID_LAT1, n_side)
    g_lon, g_lat = np.meshgrid(lons, lats)
    lon1 = g_lon.ravel()
    lat1 = g_lat.ravel()
    lon2 = rng.uniform(GRID_LON0, GRID_LON1, lon1.size)
    lat2 = rng.uniform(GRID_LAT0, GRID_LAT1, lat1.size)
    # corner-to-corner worst case + zero-distance + tiny-delta rows
    lon1 = np.concatenate([lon1, [GRID_LON0, 2.0, 2.0]])
    lat1 = np.concatenate([lat1, [GRID_LAT0, 45.0, 45.0]])
    lon2 = np.concatenate([lon2, [GRID_LON1, 2.0, 2.0 + 1e-9]])
    lat2 = np.concatenate([lat2, [GRID_LAT1, 45.0, 45.0]])
    return lon1, lat1, lon2, lat2


def _bits(arr):
    return [struct.pack("<d", float(v)) for v in arr]


@pytest.fixture(scope="module")
def samples():
    return _bbox_samples()


def test_series_accuracy_vs_libm(samples):
    lon1, lat1, lon2, lat2 = samples
    got = GD.haversine_m(lon1, lat1, lon2, lat2, np.sqrt)
    want = np.array(
        [
            _libm_haversine(a, b, c, d)
            for a, b, c, d in zip(lon1, lat1, lon2, lat2)
        ]
    )
    err = np.abs(got - want)
    assert err.max() < 1e-4  # < 0.1 mm everywhere on the bbox
    # and the worst case really is a long leg, not a degenerate one
    assert want.max() > 1.5e6  # corner-to-corner ~1600 km is covered


def test_numpy_vs_duckdb_bitwise(samples):
    lon1, lat1, lon2, lat2 = samples
    np_d = GD.haversine_m(lon1, lat1, lon2, lat2, np.sqrt)
    tab = pa.table(
        {"lon1": lon1, "lat1": lat1, "lon2": lon2, "lat2": lat2}
    )
    con = duckdb.connect()
    con.register("pts", tab)
    sql = GD.haversine_m_sql("lon1", "lat1", "lon2", "lat2")
    duck_d = con.execute(f"SELECT {sql} AS d FROM pts").fetchnumpy()["d"]
    assert _bits(np_d) == _bits(duck_d)


def test_numpy_vs_spark_bitwise(spark, samples):
    lon1, lat1, lon2, lat2 = samples
    np_d = GD.haversine_m(lon1, lat1, lon2, lat2, np.sqrt)
    df = spark.createDataFrame(
        list(
            zip(
                range(len(lon1)),
                lon1.tolist(),
                lat1.tolist(),
                lon2.tolist(),
                lat2.tolist(),
            )
        ),
        "i long, lon1 double, lat1 double, lon2 double, lat2 double",
    )
    col = GD.haversine_m(
        F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2"), F.sqrt
    )
    rows = df.select("i", col.alias("d")).orderBy("i").collect()
    spark_d = [r["d"] for r in rows]
    assert _bits(np_d) == _bits(spark_d)


def test_haversine_legs_golden(spark):
    from cadastre_pg_spark.operators.measures import haversine_legs

    # user 1: three points -> two legs; user 2: single point -> absent
    pts = spark.createDataFrame(
        [
            (1, 10, 2.0, 45.0),
            (1, 20, 2.0, 45.1),
            (1, 30, 2.1, 45.1),
            (2, 40, 3.0, 46.0),
        ],
        "user_id long, event_id long, lon double, lat double",
    )
    out = {r["user_id"]: r.asDict() for r in haversine_legs(pts).collect()}
    assert set(out) == {1}
    r = out[1]
    d1 = float(
        GD.haversine_m(
            np.array([2.0]), np.array([45.0]),
            np.array([2.0]), np.array([45.1]), np.sqrt,
        )[0]
    )
    d2 = float(
        GD.haversine_m(
            np.array([2.0]), np.array([45.1]),
            np.array([2.1]), np.array([45.1]), np.sqrt,
        )[0]
    )
    mm1, mm2 = math.floor(d1 * 1000.0), math.floor(d2 * 1000.0)
    assert r["n_legs"] == 2
    assert r["total_mm"] == mm1 + mm2
    assert r["max_mm"] == max(mm1, mm2)
    assert r["mean_leg_m"] == ((mm1 + mm2) / 2.0) / 1000.0
    # sanity: ~11.1 km per 0.1 deg lat; ~7.8 km per 0.1 deg lon at 45N
    assert 11_000_000 < mm1 < 11_200_000
    assert 7_700_000 < mm2 < 7_900_000


def test_radius_of_gyration_golden(spark):
    from cadastre_pg_spark.operators.measures import radius_of_gyration

    pts = spark.createDataFrame(
        [
            (1, 2.0, 45.0),
            (1, 2.2, 45.0),
            (1, 2.1, 45.2),
            (2, 3.0, 46.0),  # single point -> rg exactly 0
        ],
        "user_id long, lon double, lat double",
    )
    out = {r["user_id"]: r.asDict() for r in radius_of_gyration(pts).collect()}
    assert out[2]["n_points"] == 1 and out[2]["rg_m"] == 0.0
    r = out[1]
    assert r["n_points"] == 3
    # replay the spec in NumPy: 1e-7-unit integer centroid, series
    # haversine to centroid, floor-metre second moment
    lons = np.array([2.0, 2.2, 2.1])
    lats = np.array([45.0, 45.0, 45.2])
    sx = int(np.floor(lons * 1e7).astype(np.int64).sum())
    sy = int(np.floor(lats * 1e7).astype(np.int64).sum())
    clon = (float(sx) / 3.0) / 1e7
    clat = (float(sy) / 3.0) / 1e7
    assert r["centroid_lon"] == clon and r["centroid_lat"] == clat
    d = GD.haversine_m(
        np.full(3, clon), np.full(3, clat), lons, lats, np.sqrt
    )
    dm = np.floor(d).astype(np.int64)
    want = math.sqrt(float((dm * dm).sum()) / 3.0)
    assert r["rg_m"] == want
    # magnitude sanity: points ~10-20 km around the centroid
    assert 8_000 < r["rg_m"] < 20_000


def test_trip_segments_golden(spark):
    import datetime as dt

    from cadastre_pg_spark.operators.measures import trip_segments

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # trip 1: three points a minute apart, 0.1 deg lat hops
        (1, 10, t0, 2.0, 45.0),
        (1, 20, t0 + 1 * m, 2.0, 45.1),
        (1, 30, t0 + 2 * m, 2.0, 45.2),
        # > 60 min gap -> trip 2: a single point (0 distance/duration)
        (1, 40, t0 + 70 * m, 3.0, 46.0),
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
    )
    out = {
        (r["user_id"], r["trip_id"]): r.asDict()
        for r in trip_segments(pts, gap_minutes=60).collect()
    }
    assert set(out) == {(1, 1), (1, 2)}
    r1, r2 = out[(1, 1)], out[(1, 2)]
    d = GD.haversine_m(
        np.array([2.0, 2.0]), np.array([45.0, 45.1]),
        np.array([2.0, 2.0]), np.array([45.1, 45.2]), np.sqrt,
    )
    want_mm = int(np.floor(d[0] * 1000.0) + np.floor(d[1] * 1000.0))
    assert r1["n_points"] == 3 and r1["total_mm"] == want_mm
    assert r1["duration_us"] == 120_000_000
    assert r1["speed_mps"] == (float(want_mm) / 120_000_000.0) * 1000.0
    # ~22.2 km in 2 min ≈ 185 m/s (synthetic hops, not physical)
    assert 180 < r1["speed_mps"] < 190
    assert r2["n_points"] == 1 and r2["total_mm"] == 0
    assert r2["duration_us"] == 0 and r2["speed_mps"] is None


def test_trip_exactly_at_gap_stays_one_trip(spark):
    import datetime as dt

    from cadastre_pg_spark.operators.measures import trip_segments

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        (1, 10, t0, 2.0, 45.0),
        (1, 20, t0 + dt.timedelta(minutes=60), 2.0, 45.1),  # == gap
        (1, 30, t0 + dt.timedelta(minutes=120, microseconds=1), 2.0, 45.2),
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
    )
    out = trip_segments(pts, gap_minutes=60).collect()
    trips = sorted((r["trip_id"], r["n_points"]) for r in out)
    # sessionize splits STRICTLY beyond the gap: 60:00.000000 merges,
    # 60:00.000001 splits
    assert trips == [(1, 2), (2, 1)]


def test_od_matrix_golden(spark):
    import datetime as dt

    from cadastre_pg_spark.operators.measures import od_matrix

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, trip 1: cell 100 -> 200 (two legs)
        (1, 10, t0, 2.0, 45.0, 100),
        (1, 20, t0 + m, 2.0, 45.1, 150),
        (1, 30, t0 + 2 * m, 2.0, 45.2, 200),
        # user 1, trip 2 after gap: single point, round trip 300->300
        (1, 40, t0 + 90 * m, 3.0, 46.0, 300),
        # user 2: same OD pair as user 1 trip 1, one leg
        (2, 50, t0, 2.0, 45.0, 100),
        (2, 60, t0 + m, 2.0, 45.2, 200),
    ]
    pts = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, lon double,"
        " lat double, cell long",
    )
    out = {
        (r["o_cell"], r["d_cell"]): r.asDict()
        for r in od_matrix(pts, gap_minutes=60).collect()
    }
    assert set(out) == {(100, 200), (300, 300)}
    d = GD.haversine_m(
        np.array([2.0, 2.0, 2.0]),
        np.array([45.0, 45.1, 45.0]),
        np.array([2.0, 2.0, 2.0]),
        np.array([45.1, 45.2, 45.2]),
        np.sqrt,
    )
    mm = np.floor(d * 1000.0).astype(np.int64)
    want_mm = int(mm[0] + mm[1] + mm[2])  # u1 two legs + u2 one leg
    r = out[(100, 200)]
    assert r["n_trips"] == 2 and r["n_round"] == 0
    assert r["total_mm"] == want_mm
    assert r["mean_trip_m"] == (float(want_mm) / 2.0) / 1000.0
    r2 = out[(300, 300)]
    assert r2["n_trips"] == 1 and r2["n_round"] == 1
    assert r2["total_mm"] == 0


def test_radius_of_gyration_negative_lon(spark):
    """floor() on negative coordinates rounds toward -inf in all three
    engines — the west-of-Greenwich half of the bbox must quantize
    identically (explicit golden next to the sweep's empirical pass)."""
    from cadastre_pg_spark.operators.measures import radius_of_gyration

    pts = spark.createDataFrame(
        [(1, -4.35, 48.4), (1, -4.25, 48.4), (1, -4.3, 48.5)],
        "user_id long, lon double, lat double",
    )
    r = radius_of_gyration(pts).collect()[0].asDict()
    lons = np.array([-4.35, -4.25, -4.3])
    lats = np.array([48.4, 48.4, 48.5])
    sx = int(np.floor(lons * 1e7).astype(np.int64).sum())
    sy = int(np.floor(lats * 1e7).astype(np.int64).sum())
    clon = (float(sx) / 3.0) / 1e7
    clat = (float(sy) / 3.0) / 1e7
    assert r["centroid_lon"] == clon and r["centroid_lat"] == clat
    d = GD.haversine_m(np.full(3, clon), np.full(3, clat), lons, lats, np.sqrt)
    dm = np.floor(d).astype(np.int64)
    assert r["rg_m"] == math.sqrt(float((dm * dm).sum()) / 3.0)


def test_trip_segments_ts_tie_breaks_by_event_id(spark):
    import datetime as dt

    from cadastre_pg_spark.operators.measures import trip_segments

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    # two points share a timestamp: leg order must follow event_id
    rows = [
        (1, 20, t0, 2.0, 45.1),
        (1, 10, t0, 2.0, 45.0),
        (1, 30, t0 + dt.timedelta(minutes=1), 2.0, 45.3),
    ]
    pts = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, lon double, lat double"
    )
    r = trip_segments(pts, gap_minutes=60).collect()[0].asDict()
    d = GD.haversine_m(
        np.array([2.0, 2.0]), np.array([45.0, 45.1]),
        np.array([2.0, 2.0]), np.array([45.1, 45.3]), np.sqrt,
    )
    want = int(np.floor(d[0] * 1000.0) + np.floor(d[1] * 1000.0))
    assert r["n_points"] == 3 and r["total_mm"] == want
