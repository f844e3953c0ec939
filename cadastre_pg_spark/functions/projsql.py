"""ANSI-SQL emitter for the Lambert-93 inverse — the DuckDB-oracle twin
of kernels/lambert.py::lambert93_to_wgs84 (reference math:
cadastre-pg/src/reproject_lite/lambert.rs:68-112, 10 fixed iterations).

The 10-iteration isometric-latitude inversion is unrolled into chained
CTEs with identical op order to the NumPy kernel. Projection constants
(n, A*F, R0, e) are hoisted in Python and embedded as
CAST('<repr>' AS DOUBLE) literals, so the oracle starts from the same
bit patterns. atan/pow are ~1 ulp apart between DuckDB (libm) and
NumPy — after round(.,7) that only matters within 1e-14 deg of a
rounding boundary, ruled out empirically on the deterministic data.
"""

from ..kernels import lambert as L


def _d(v: float) -> str:
    return f"CAST('{float(v)!r}' AS DOUBLE)"


N_ITERS = L._ITERS


def lambert93_point_query_sql(
    source_sql: str, id_col: str, x_expr: str, y_expr: str, decimals: int = 7
) -> str:
    """SELECT {id_col}, lon, lat FROM <source> with the full unrolled
    inverse, rounded half-even to `decimals` (np.round semantics)."""
    half_e = L._E / 2.0
    ctes = [
        f"""_b AS (
          SELECT {id_col},
                 ({x_expr}) - {_d(L._X0)} AS dx,
                 {_d(L._R0)} - (({y_expr}) - {_d(L._Y0)}) AS dy
          FROM {source_sql}
        )""",
        f"""_t AS (
          SELECT {id_col},
                 degrees(atan2(dx, dy) / {_d(L._N)} + {_d(L._LON0)}) AS lon_deg,
                 pow(sqrt(dx*dx + dy*dy) / {_d(L._A * L._F)},
                     {_d(1.0 / L._N)}) AS t
          FROM _b
        )""",
        f"""_p0 AS (
          SELECT {id_col}, lon_deg, t,
                 {_d(L.math.pi / 2.0)} - 2.0 * atan(t) AS phi
          FROM _t
        )""",
    ]
    prev = "_p0"
    for i in range(1, N_ITERS + 1):
        ctes.append(
            f"""_p{i} AS (
              SELECT {id_col}, lon_deg, t,
                     {_d(L.math.pi / 2.0)} - 2.0 * atan(
                       t * pow((1.0 - {_d(L._E)} * sin(phi))
                             / (1.0 + {_d(L._E)} * sin(phi)), {_d(half_e)})
                     ) AS phi
              FROM {prev}
            )"""
        )
        prev = f"_p{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT {id_col},
               round_even(lon_deg, {decimals}) AS lon,
               round_even(degrees(phi), {decimals}) AS lat
        FROM {prev}
    """
    )
