"""Deterministic point/polygon derivations over the driver tables.

Every page/document gets a reproducible location (FIXTURES.md §1:
"every page has a reproducible location"), and every `part` row
becomes a rectangular parcel. The SAME arithmetic is emitted twice:

- as JVM-side Spark Column expressions (codegen'd, zero Python), and
- as ANSI-SQL strings for the DuckDB oracle,

with identical operation order so IEEE double results match bitwise.
This module is the single source of truth for those formulas — the
engine and oracle can only drift if this file does.

The multiplicative hashes are Knuth/Weyl-style LCG mixes on the int64
key — chosen over sha256 so the derivation stays SQL-expressible and
JVM-side (SURVEY.md: "UDFs are the slow path").
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels import cells as C

MOD = 4294967296  # 2^32
MULT_LON = 2654435761  # Knuth multiplicative hash
MULT_LAT = 1597334677
MULT_W = 2246822519
MULT_H = 3266489917
MULT_HOT = 668265263

LON0, LON1 = C.GRID_LON0, C.GRID_LON1
LAT0, LAT1 = C.GRID_LAT0, C.GRID_LAT1

# parcel geometry envelope (kept strictly inside the grid bbox so cell
# clamping never merges out-of-range columns — see operators/spatial_join)
P_CX0, P_CX_SPAN = -4.0, 12.0
P_CY0, P_CY_SPAN = 41.6, 8.8
P_HW0, P_HW_SPAN = 0.01, 0.09  # half-width degrees
P_HH0, P_HH_SPAN = 0.008, 0.06
HOT_PERIOD = 5  # every 5th parcel is pulled into a hot cluster
HOT_SCALE_PERIOD = 37  # every 37th parcel is a big polygon (skew)
HOT_CENTERS = [(2.30, 48.85), (5.35, 43.30), (4.85, 45.75)]  # urban hot spots


# ------------------------------------------------------------- Spark side


def u_col(key: Column, mult: int) -> Column:
    """Uniform [0,1) double from an int64 key — JVM-side arithmetic."""
    return ((key * F.lit(mult)) % F.lit(MOD)) / F.lit(float(MOD))


def lon_col(key: Column) -> Column:
    return F.lit(LON0) + F.lit(LON1 - LON0) * u_col(key, MULT_LON)


def lat_col(key: Column) -> Column:
    return F.lit(LAT0) + F.lit(LAT1 - LAT0) * u_col(key, MULT_LAT)


def grid_cell_col(lon: Column, lat: Column, level: int = C.DEFAULT_LEVEL) -> Column:
    """JVM-side grid cell id — identical floor arithmetic to
    kernels.cells.grid_cell (and to grid_cell_sql below)."""
    n = 1 << level
    ix = F.floor((lon - F.lit(LON0)) / F.lit(LON1 - LON0) * F.lit(float(n)))
    iy = F.floor((lat - F.lit(LAT0)) / F.lit(LAT1 - LAT0) * F.lit(float(n)))
    ix = F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1))
    iy = F.least(F.greatest(iy, F.lit(0)), F.lit(n - 1))
    return (ix * F.lit(n) + iy).cast("long")


def parcel_box_cols(key: Column):
    """(cx, cy, hw, hh) Columns for the rectangle parcel derived from an
    int64 key. ~20% of parcels cluster near 3 urban hot centers and
    every 37th parcel is 8x larger (exercises salting/AQE — FIXTURES §2)."""
    base_cx = F.lit(P_CX0) + F.lit(P_CX_SPAN) * u_col(key, MULT_LON)
    base_cy = F.lit(P_CY0) + F.lit(P_CY_SPAN) * u_col(key, MULT_LAT)
    jitter_x = F.lit(0.08) * u_col(key, MULT_HOT) - F.lit(0.04)
    jitter_y = F.lit(0.08) * u_col(key, MULT_W) - F.lit(0.04)
    hot_idx = key % F.lit(3)
    hot_cx = (
        F.when(hot_idx == 0, F.lit(HOT_CENTERS[0][0]))
        .when(hot_idx == 1, F.lit(HOT_CENTERS[1][0]))
        .otherwise(F.lit(HOT_CENTERS[2][0]))
    )
    hot_cy = (
        F.when(hot_idx == 0, F.lit(HOT_CENTERS[0][1]))
        .when(hot_idx == 1, F.lit(HOT_CENTERS[1][1]))
        .otherwise(F.lit(HOT_CENTERS[2][1]))
    )
    is_hot = (key % F.lit(HOT_PERIOD)) == F.lit(0)
    cx = F.when(is_hot, hot_cx + jitter_x).otherwise(base_cx)
    cy = F.when(is_hot, hot_cy + jitter_y).otherwise(base_cy)
    scale = F.when((key % F.lit(HOT_SCALE_PERIOD)) == F.lit(0), F.lit(8.0)).otherwise(
        F.lit(1.0)
    )
    hw = (F.lit(P_HW0) + F.lit(P_HW_SPAN) * u_col(key, MULT_W)) * scale
    hh = (F.lit(P_HH0) + F.lit(P_HH_SPAN) * u_col(key, MULT_H)) * scale
    return cx, cy, hw, hh


# --------------------------------------------------------------- SQL side


def u_sql(expr: str, mult: int) -> str:
    # CAST to DOUBLE: a bare 4294967296.0 literal is DECIMAL in DuckDB and
    # decimal division would diverge from Spark's IEEE double division.
    return f"((({expr}) * {mult}) % {MOD}) / CAST({MOD} AS DOUBLE)"


def lon_sql(expr: str) -> str:
    return f"({LON0} + {LON1 - LON0} * ({u_sql(expr, MULT_LON)}))"


def lat_sql(expr: str) -> str:
    return f"({LAT0} + {LAT1 - LAT0} * ({u_sql(expr, MULT_LAT)}))"


def grid_cell_sql(lon_expr: str, lat_expr: str, level: int = C.DEFAULT_LEVEL) -> str:
    n = 1 << level
    ix = f"floor(({lon_expr} - {LON0}) / {LON1 - LON0} * {float(n)})"
    iy = f"floor(({lat_expr} - {LAT0}) / {LAT1 - LAT0} * {float(n)})"
    ix = f"least(greatest({ix}, 0), {n - 1})"
    iy = f"least(greatest({iy}, 0), {n - 1})"
    return f"CAST({ix} * {n} + {iy} AS BIGINT)"


def grid_ix_sql(x_expr: str, level: int = C.DEFAULT_LEVEL) -> str:
    """Clamped x cell index — same op order as kernels.cells.grid_cell_xy."""
    n = 1 << level
    ix = f"floor(({x_expr} - ({LON0})) / ({LON1 - LON0}) * {float(n)})"
    return f"CAST(least(greatest({ix}, 0), {n - 1}) AS BIGINT)"


def grid_iy_sql(y_expr: str, level: int = C.DEFAULT_LEVEL) -> str:
    n = 1 << level
    iy = f"floor(({y_expr} - ({LAT0})) / ({LAT1 - LAT0}) * {float(n)})"
    return f"CAST(least(greatest({iy}, 0), {n - 1}) AS BIGINT)"


def parcel_box_sql(expr: str):
    """(cx, cy, hw, hh) SQL strings — mirrors parcel_box_cols exactly."""
    base_cx = f"({P_CX0} + {P_CX_SPAN} * ({u_sql(expr, MULT_LON)}))"
    base_cy = f"({P_CY0} + {P_CY_SPAN} * ({u_sql(expr, MULT_LAT)}))"
    jitter_x = f"(0.08 * ({u_sql(expr, MULT_HOT)}) - 0.04)"
    jitter_y = f"(0.08 * ({u_sql(expr, MULT_W)}) - 0.04)"
    hot_cx = (
        f"(CASE ({expr}) % 3 WHEN 0 THEN {HOT_CENTERS[0][0]} "
        f"WHEN 1 THEN {HOT_CENTERS[1][0]} ELSE {HOT_CENTERS[2][0]} END)"
    )
    hot_cy = (
        f"(CASE ({expr}) % 3 WHEN 0 THEN {HOT_CENTERS[0][1]} "
        f"WHEN 1 THEN {HOT_CENTERS[1][1]} ELSE {HOT_CENTERS[2][1]} END)"
    )
    is_hot = f"(({expr}) % {HOT_PERIOD} = 0)"
    cx = f"(CASE WHEN {is_hot} THEN {hot_cx} + {jitter_x} ELSE {base_cx} END)"
    cy = f"(CASE WHEN {is_hot} THEN {hot_cy} + {jitter_y} ELSE {base_cy} END)"
    scale = f"(CASE WHEN ({expr}) % {HOT_SCALE_PERIOD} = 0 THEN 8.0 ELSE 1.0 END)"
    hw = f"(({P_HW0} + {P_HW_SPAN} * ({u_sql(expr, MULT_W)})) * {scale})"
    hh = f"(({P_HH0} + {P_HH_SPAN} * ({u_sql(expr, MULT_H)})) * {scale})"
    return cx, cy, hw, hh
