"""Z-order encoding: JVM Columns == NumPy kernel; clustered writes."""

import numpy as np
import pyspark.sql.functions as F

from cadastre_pg_spark.data import synthetic as S
from cadastre_pg_spark.functions.zorder import morton_col, zorder_write
from cadastre_pg_spark.kernels import cells as C


def test_jvm_morton_equals_kernel(spark):
    df = (
        spark.range(2000)
        .select(
            F.col("id"),
            S.lon_col(F.col("id")).alias("lon"),
            S.lat_col(F.col("id")).alias("lat"),
        )
        .withColumn("z", morton_col(F.col("lon"), F.col("lat"), 10))
    )
    pdf = df.toPandas()
    expected = C.morton_cell(
        pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64), 10
    )
    np.testing.assert_array_equal(pdf["z"].to_numpy(np.int64), expected)


def test_zorder_write_clusters(spark, tmp_path):
    out = str(tmp_path / "zsorted")
    df = spark.range(0, 20000, 1, 4).select(
        F.col("id"),
        S.lon_col(F.col("id")).alias("lon"),
        S.lat_col(F.col("id")).alias("lat"),
    )
    zorder_write(df, out)
    back = spark.read.parquet(out)
    assert back.count() == 20000
    # within each file, rows are z-ordered -> consecutive rows are
    # spatially near: mean |z-delta| far below the random baseline
    pdf = back.withColumn(
        "z", morton_col(F.col("lon"), F.col("lat"), 10)
    ).toPandas()
    z = pdf["z"].to_numpy(np.int64)
    sorted_gap = np.abs(np.diff(np.sort(z))).mean()
    file_gap = np.abs(np.diff(z)).mean()  # order as read back
    rng = np.random.default_rng(0)
    rand_gap = np.abs(np.diff(z[rng.permutation(len(z))])).mean()
    assert file_gap < rand_gap / 10, (file_gap, rand_gap, sorted_gap)


def test_hilbert_kernel_bijective_and_unit_adjacent():
    """Full order-4 grid: codes are a bijection onto [0, n^2) and
    consecutive codes are ALWAYS grid-adjacent (the Hilbert property
    Morton lacks)."""
    from cadastre_pg_spark.kernels import cells as C

    order = 4
    n = 1 << order
    lons, lats = [], []
    for ix in range(n):
        for iy in range(n):
            lons.append(C.GRID_LON0 + (ix + 0.5) * (C.GRID_LON1 - C.GRID_LON0) / n)
            lats.append(C.GRID_LAT0 + (iy + 0.5) * (C.GRID_LAT1 - C.GRID_LAT0) / n)
    d = C.hilbert_cell(np.asarray(lons), np.asarray(lats), order)
    ix, iy = C.grid_cell_xy(np.asarray(lons), np.asarray(lats), order)
    assert sorted(d.tolist()) == list(range(n * n))
    pos = {int(dd): (int(a), int(b)) for a, b, dd in zip(ix, iy, d)}
    for k in range(n * n - 1):
        (x0, y0), (x1, y1) = pos[k], pos[k + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, k


def test_hilbert_spark_equals_kernel(spark):
    from cadastre_pg_spark.functions.zorder import with_hilbert
    from cadastre_pg_spark.kernels import cells as C

    df = spark.range(0, 3000, 1, 4).select(
        F.col("id"),
        S.lon_col(F.col("id")).alias("lon"),
        S.lat_col(F.col("id")).alias("lat"),
    )
    pdf = with_hilbert(df, "lon", "lat", 10).toPandas()
    want = C.hilbert_cell(
        pdf["lon"].to_numpy(np.float64), pdf["lat"].to_numpy(np.float64), 10
    )
    assert (pdf["hcell"].to_numpy(np.int64) == want).all()
