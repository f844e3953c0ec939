"""Portable truncated-series great-circle (haversine) distance.

Why a series and not Math.sin: the engine/oracle invariant requires
bitwise-identical doubles from Spark, DuckDB, and NumPy, but libm
trig differs ~1ulp between engines (CLAUDE.md round-2 parity notes),
and 1ulp straddles any rounding grid at scale. +, -, *, / and sqrt
ARE IEEE correctly-rounded everywhere, so this module defines the
spherical distance as a fixed Horner-form polynomial spec: every
engine evaluates the same literals in the same order and gets the
same bits. Truncation error vs true haversine is bounded by the term
after the cut on the engine bbox (lon [-5,9], lat [41,51]):
sin ≤ 2e-13 rel, cos ≤ 4e-12 rel, asin ≤ 3.4e-12 abs → total under
1e-4 m on legs up to ~1800 km, i.e. below 0.1 mm — quantizing legs
to floor(mm) is deterministic and exact cross-engine.

The polynomial evaluators are written over generic `x` so the SAME
function body serves NumPy arrays and Spark Columns (both overload
the float arithmetic); `*_sql` emits the identical expression for
DuckDB with every coefficient injected as CAST('<repr>' AS DOUBLE)
(float-const rule, CLAUDE.md). No Spark imports here — this file is
the single-process oracle for tests (kernel invariant).

Reference lineage: generalizes the reference's planar geometry
measures (cadastre-pg geo double maths, proj.rs/measures) to the
spherical metric a web-scale geotagged-page engine needs.
"""

from __future__ import annotations

import math

# mean Earth radius (IUGG), metres
R_EARTH = 6371008.8
PI_180 = math.pi / 180.0

# Horner coefficients (exact doubles; repr round-trips them)
S3, S5, S7 = -1.0 / 6.0, 1.0 / 120.0, -1.0 / 5040.0
C2, C4, C6 = -0.5, 1.0 / 24.0, -1.0 / 720.0
C8, C10, C12 = 1.0 / 40320.0, -1.0 / 3628800.0, 1.0 / 479001600.0
A3, A5, A7, A9 = 1.0 / 6.0, 3.0 / 40.0, 15.0 / 336.0, 105.0 / 3456.0


def sin_poly(x):
    """sin(x) for |x| <= ~0.13 rad (half-deltas on the bbox)."""
    x2 = x * x
    return x * (1.0 + x2 * (S3 + x2 * (S5 + x2 * S7)))


def cos_poly(x):
    """cos(x) for |x| <= ~0.90 rad (bbox latitudes in radians)."""
    x2 = x * x
    return 1.0 + x2 * (
        C2 + x2 * (C4 + x2 * (C6 + x2 * (C8 + x2 * (C10 + x2 * C12))))
    )


def asin_poly(y):
    """asin(y) for |y| <= ~0.13 (sin of the max half central angle)."""
    y2 = y * y
    return y * (1.0 + y2 * (A3 + y2 * (A5 + y2 * (A7 + y2 * A9))))


def haversine_m(lon1, lat1, lon2, lat2, sqrt):
    """Series haversine in metres; pass the engine's sqrt (np.sqrt
    for arrays, F.sqrt for Columns) — the only non-arithmetic op."""
    phi1 = lat1 * PI_180
    phi2 = lat2 * PI_180
    hdphi = ((lat2 - lat1) * PI_180) * 0.5
    hdlmb = ((lon2 - lon1) * PI_180) * 0.5
    sp = sin_poly(hdphi)
    sl = sin_poly(hdlmb)
    a = sp * sp + (cos_poly(phi1) * cos_poly(phi2)) * (sl * sl)
    return (2.0 * R_EARTH) * asin_poly(sqrt(a))


# ------------------------------------------------------------- SQL twin


def _d(v: float) -> str:
    return f"CAST('{v!r}' AS DOUBLE)"


def sin_poly_sql(x: str) -> str:
    x2 = f"(({x}) * ({x}))"
    return (
        f"(({x}) * ({_d(1.0)} + {x2} * ({_d(S3)} + {x2} * "
        f"({_d(S5)} + {x2} * {_d(S7)}))))"
    )


def cos_poly_sql(x: str) -> str:
    x2 = f"(({x}) * ({x}))"
    return (
        f"({_d(1.0)} + {x2} * ({_d(C2)} + {x2} * ({_d(C4)} + {x2} * "
        f"({_d(C6)} + {x2} * ({_d(C8)} + {x2} * ({_d(C10)} + {x2} * "
        f"{_d(C12)}))))))"
    )


def asin_poly_sql(y: str) -> str:
    y2 = f"(({y}) * ({y}))"
    return (
        f"(({y}) * ({_d(1.0)} + {y2} * ({_d(A3)} + {y2} * "
        f"({_d(A5)} + {y2} * ({_d(A7)} + {y2} * {_d(A9)})))))"
    )


def haversine_m_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    phi1 = f"(({lat1}) * {_d(PI_180)})"
    phi2 = f"(({lat2}) * {_d(PI_180)})"
    hdphi = f"(((({lat2}) - ({lat1})) * {_d(PI_180)}) * {_d(0.5)})"
    hdlmb = f"(((({lon2}) - ({lon1})) * {_d(PI_180)}) * {_d(0.5)})"
    sp = sin_poly_sql(hdphi)
    sl = sin_poly_sql(hdlmb)
    a = (
        f"(({sp}) * ({sp}) + ({cos_poly_sql(phi1)} * {cos_poly_sql(phi2)})"
        f" * (({sl}) * ({sl})))"
    )
    return f"(({_d(2.0 * R_EARTH)}) * {asin_poly_sql(f'sqrt({a})')})"
