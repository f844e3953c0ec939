"""k-nearest-neighbors via cell-neighborhood expansion (north-star op;
the PostGIS KNN `<->` GIST workload (postgres.rs:320-329) is the
downstream analog — designed fresh here, SURVEY.md §7.3 step 5).

Exact algorithm, two phases, all JVM-side (no Python anywhere):

1. **Density-derived cell level.** From the measured point count,
   estimate the radius that holds ~`expansion * k` neighbors and pick
   the grid level whose cell width is >= that radius. Points are
   replicated to their 3x3 cell neighborhood (constant 9x blow-up —
   scale-independent, unlike per-query ring explosion); queries join
   on their single cell. Any point within one cell-width of a query is
   guaranteed captured, so a query whose k-th candidate distance is
   <= min(cell_w, cell_h) is provably final.

2. **Exact fallback for sparse tails.** Queries not settled by phase 1
   (sparse regions, bbox corners) are brute-forced against the full
   point table — few by construction, so the cross join stays small.

Ties broken by neighbor_id; output matches brute force exactly (the
DuckDB oracle is the full O(n^2) scan).
"""

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernels import cells as C


def _with_cell_xy(df, level, lon="lon", lat="lat"):
    n = 1 << level
    ix = F.floor(
        (F.col(lon) - F.lit(C.GRID_LON0))
        / F.lit(C.GRID_LON1 - C.GRID_LON0)
        * F.lit(float(n))
    )
    iy = F.floor(
        (F.col(lat) - F.lit(C.GRID_LAT0))
        / F.lit(C.GRID_LAT1 - C.GRID_LAT0)
        * F.lit(float(n))
    )
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    return df.withColumn("ix", ix.cast("long")).withColumn("iy", iy.cast("long"))


def _dist_sq():
    return (
        (F.col("nlon") - F.col("lon")) * (F.col("nlon") - F.col("lon"))
        + (F.col("nlat") - F.col("lat")) * (F.col("nlat") - F.col("lat"))
    )


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_sq").asc(), F.col("neighbor_id").asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_grid(
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    expansion: float = 3.0,
    max_level: int = 12,
) -> DataFrame:
    """points: (point_id, lon, lat); queries: (query_id, lon, lat) ->
    (query_id, neighbor_id, dist_sq, rank<=k). Exact (== brute force);
    rows with point_id == query_id are excluded as self-matches."""
    n_pts = points.count()
    area = (C.GRID_LON1 - C.GRID_LON0) * (C.GRID_LAT1 - C.GRID_LAT0)
    density = max(n_pts, 1) / area
    radius = math.sqrt(expansion * k / (math.pi * density))
    lx = math.floor(math.log2((C.GRID_LON1 - C.GRID_LON0) / radius)) if radius > 0 else max_level
    ly = math.floor(math.log2((C.GRID_LAT1 - C.GRID_LAT0) / radius)) if radius > 0 else max_level
    level = max(0, min(max_level, lx, ly))
    n = 1 << level
    wx, wy = C.grid_cell_size(level)
    w_min = min(wx, wy)

    pts = _with_cell_xy(points, level).select(
        F.col("point_id").alias("neighbor_id"),
        F.col("lon").alias("nlon"),
        F.col("lat").alias("nlat"),
        "ix",
        "iy",
    )
    # replicate each point into its 3x3 neighborhood (build side, 9x)
    neigh = pts.select(
        "neighbor_id",
        "nlon",
        "nlat",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(
                            (F.col("ix") + F.lit(dx)).between(0, n - 1)
                            & (F.col("iy") + F.lit(dy)).between(0, n - 1),
                            (F.col("ix") + F.lit(dx)) * F.lit(n)
                            + (F.col("iy") + F.lit(dy)),
                        )
                        for dx in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                    ]
                ),
                lambda c: c.isNotNull(),
            )
        ).alias("cell"),
    )
    qs = _with_cell_xy(queries, level).select(
        "query_id",
        "lon",
        "lat",
        (F.col("ix") * F.lit(n) + F.col("iy")).alias("cell"),
    )
    cand = (
        qs.join(neigh, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "lon", "lat", "neighbor_id", _dist_sq().alias("dist_sq"))
    )
    ranked = _topk(cand, k).persist()
    settled_ids = (
        ranked.filter(F.col("rank") == k)
        .filter(F.col("dist_sq") <= F.lit(w_min * w_min))
        .select("query_id")
    )
    settled = ranked.join(settled_ids, "query_id", "left_semi").select(
        "query_id", "neighbor_id", "dist_sq", "rank"
    )

    # exact fallback for the sparse tail
    stragglers = queries.join(settled_ids, "query_id", "left_anti")
    brute = (
        stragglers.crossJoin(
            points.select(
                F.col("point_id").alias("neighbor_id"),
                F.col("lon").alias("nlon"),
                F.col("lat").alias("nlat"),
            )
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "lon", "lat", "neighbor_id", _dist_sq().alias("dist_sq"))
    )
    brute_topk = _topk(brute, k).select("query_id", "neighbor_id", "dist_sq", "rank")
    return settled.unionByName(brute_topk)
