"""Raster <-> vector tiling (north-star op; the reference's PostGIS
raster would be the downstream analog — no reference implementation).

- tile_assign: polygon -> covering tiles at a coarse grid level
  (polyfill at the tile level; for the synthetic rectangles this
  equals the bbox tile range, which is what the SQL oracle enumerates
  with lateral ranges).
- raster_burn: polygon -> per-tile fine-cell mask counts at `fine`
  level, tile = parent cell at `tile_level` (ix >> d, iy >> d).
- tile_extract (vector extraction): tile set -> parcels whose burn
  mask intersects those tiles (semi-join on tile id).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import cells as C
from .spatial_join import polyfill


def tile_assign(parcels: DataFrame, tile_level: int = 7) -> DataFrame:
    """(parcel_id, tile) — every tile the polygon touches."""
    cover = polyfill(parcels, level=tile_level, scheme="grid")
    return cover.select("parcel_id", F.col("cell").alias("tile")).distinct()


def raster_burn(
    parcels: DataFrame, fine_level: int = 10, tile_level: int = 7
) -> DataFrame:
    """(parcel_id, tile, n_cells): count of fine-level cover cells per
    tile — the engine's raster mask, aggregated JVM-side from the
    polyfill output (cell -> parent tile is pure integer arithmetic)."""
    d = fine_level - tile_level
    if d <= 0:
        raise ValueError("fine_level must exceed tile_level")
    nf = 1 << fine_level
    nt = 1 << tile_level
    cover = polyfill(parcels, level=fine_level, scheme="grid")
    ix = (F.col("cell") / F.lit(nf)).cast("long")  # cell = ix*nf + iy
    iy = F.col("cell") % F.lit(nf)
    tile = (
        F.shiftright(ix, d) * F.lit(nt) + F.shiftright(iy, d)
    ).alias("tile")
    return (
        cover.select("parcel_id", tile)
        .groupBy("parcel_id", "tile")
        .agg(F.count(F.lit(1)).alias("n_cells"))
    )


def tile_extract(tiles: DataFrame, burn: DataFrame) -> DataFrame:
    """Vector extraction: for each requested tile, the parcels whose
    mask intersects it. tiles: (tile); burn: raster_burn output."""
    return burn.join(tiles.select("tile").distinct(), "tile").select(
        "tile", "parcel_id", "n_cells"
    )


def top_per_cell(
    points: DataFrame,
    k: int,
    cell_col: str = "cell",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Top-k rows per grid cell by (score DESC, id ASC) — the tile
    labeling / per-tile feature selection primitive (which k documents
    to render or keep per map tile). The id tiebreak makes the ranking
    total, hence deterministic and exactly SQL-replayable.

    Scale shape: one window partitioned BY THE CELL (thousands of
    partitions — parallel, never the single-task global-sort shape);
    rank <= k filter pushes nothing extra through the exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy(cell_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        points.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(cell_col, F.col("rank").cast("long").alias("rank"), id_col, score_col)
    )
