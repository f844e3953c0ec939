"""Morton (Z-order) cell encoding as JVM Column expressions — the
locality-preserving id used to cluster output files so downstream
range scans of nearby cells touch few files (the engine's replacement
for the reference's 'indexes built last' physical technique,
postgres.rs:304-344 — SURVEY.md §4).

The identical magic-mask interleave exists in three forms that must
agree bit-for-bit: NumPy (kernels/cells.morton_cell), these Spark
Columns (whole-stage codegen), and the DuckDB oracle SQL below.
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..data import synthetic as S
from ..kernels import cells as C

_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _part1by1_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton_col(lon: Column, lat: Column, level: int = C.DEFAULT_LEVEL) -> Column:
    """Z-order code of the grid cell — same (ix, iy) mapping as
    grid_cell_col, bits interleaved."""
    n = 1 << level
    ix = F.floor((lon - F.lit(C.GRID_LON0)) / F.lit(C.GRID_LON1 - C.GRID_LON0) * F.lit(float(n)))
    iy = F.floor((lat - F.lit(C.GRID_LAT0)) / F.lit(C.GRID_LAT1 - C.GRID_LAT0) * F.lit(float(n)))
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1)).cast("long")
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1)).cast("long")
    return _part1by1_col(ix).bitwiseOR(
        F.shiftleft(_part1by1_col(iy), 1)
    ).cast("long")


def _part1by1_sql(v: str) -> str:
    out = f"(({v}) & {0xFFFFFFFF})"
    for shift, mask in _MASKS:
        out = f"((({out}) | (({out}) << {shift})) & {mask})"
    return out


def morton_sql(lon_expr: str, lat_expr: str, level: int = C.DEFAULT_LEVEL) -> str:
    ix = S.grid_ix_sql(lon_expr, level)
    iy = S.grid_iy_sql(lat_expr, level)
    return (
        f"CAST(({_part1by1_sql(ix)}) | (({_part1by1_sql(iy)}) << 1) AS BIGINT)"
    )


def zorder_write(df, out_dir: str, lon: str = "lon", lat: str = "lat",
                 level: int = C.DEFAULT_LEVEL, mode: str = "overwrite"):
    """Cluster output files by Z-order: sort within partitions by the
    morton code (no extra shuffle) so nearby cells co-locate in files."""
    return (
        df.withColumn("_z", morton_col(F.col(lon), F.col(lat), level))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(out_dir)
    )
