"""ANSI-SQL emitter for the hex cell codec — the DuckDB-oracle twin of
kernels/cells.py (hex_axial/hex_pack) + kernels/mercator.py.

Mirrors the NumPy op order exactly:
  mercator:  x = R*radians(lon); y = R*ln(tan(pi/4 + radians(lat)/2))
  axial:     qf = (sqrt(3)/3*x - y/3)/a ; rf = (2/3*y)/a
  round:     cube-round with round-half-EVEN (np.round semantics —
             DuckDB round() is half-away, round_even() matches)
  pack:      res<<52 | (q+2^25)<<26 | (r+2^25)  (disjoint fields, so
             the OR is emitted as +)

Float constants are embedded as CAST('<repr>' AS DOUBLE): repr is the
shortest round-trip form and string->double parsing is correctly
rounded, so the oracle sees the identical bit pattern (a bare decimal
literal would become DECIMAL and re-round). ln/tan are libm in DuckDB
vs NumPy SIMD (~1 ulp apart) — a cell can only flip if a point sits
within ~1e-10 m of a hex boundary, which the parity test rules out on
the deterministic test data.
"""

import numpy as np

from ..kernels import cells as C
from ..kernels.mercator import MAX_LAT, R


def _d(v: float) -> str:
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def mercator_sql(lon_expr: str, lat_expr: str) -> tuple[str, str]:
    lat = f"least(greatest({lat_expr}, {_d(-MAX_LAT)}), {_d(MAX_LAT)})"
    x = f"({_d(R)} * radians({lon_expr}))"
    y = f"({_d(R)} * ln(tan({_d(np.pi / 4.0)} + radians({lat}) / 2.0)))"
    return x, y


def hex_cell_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    a = C.hex_edge(res)
    x, y = mercator_sql(lon_expr, lat_expr)
    qf = f"(({_d(C._SQRT3 / 3.0)} * {x} - {y} / 3.0) / {_d(a)})"
    rf = f"(({_d(2.0 / 3.0)} * {y}) / {_d(a)})"
    # cube round (half-even). fix_r rows have fix_q false, so using the
    # pre-fix q there matches the NumPy sequential update.
    body = f"""(
      WITH _ax AS (SELECT {qf} AS qf, {rf} AS rf),
      _r AS (
        SELECT qf, rf, (-qf - rf) AS sf,
               round_even(qf, 0) AS q0, round_even(rf, 0) AS r0,
               round_even(-qf - rf, 0) AS s0
        FROM _ax
      ),
      _fx AS (
        SELECT q0, r0, s0, qf, rf, sf,
               (abs(q0 - qf) > abs(r0 - rf) AND abs(q0 - qf) > abs(s0 - sf))
                 AS fix_q,
               (NOT (abs(q0 - qf) > abs(r0 - rf) AND abs(q0 - qf) > abs(s0 - sf))
                AND abs(r0 - rf) > abs(s0 - sf)) AS fix_r
        FROM _r
      )
      SELECT CAST({res} AS BIGINT) * 4503599627370496
           + (CAST(CASE WHEN fix_q THEN -r0 - s0 ELSE q0 END AS BIGINT)
              + 33554432) * 67108864
           + (CAST(CASE WHEN fix_r THEN -q0 - s0 ELSE r0 END AS BIGINT)
              + 33554432)
      FROM _fx
    )"""
    return body
