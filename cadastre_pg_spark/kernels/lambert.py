"""Lambert-93 (EPSG:2154, LCC 2SP on GRS80) forward + inverse, vectorized.

Semantics follow the reference kernel
(cadastre-pg/src/reproject_lite/lambert.rs:25-112) but operate on whole
NumPy arrays at once and hoist the projection constants n, C(F), R0 to
module scope instead of recomputing them per point (lambert.rs:74-90).

Golden oracles (FIXTURES.md §4): (648237, 6862107) -> (2.2945E, 48.8584N).
"""

import math

import numpy as np

from .ellipsoid import GRS80

# RGF93 / Lambert-93 defining parameters (public EPSG:2154 definition).
_PHI0 = math.radians(46.5)
_PHI1 = math.radians(44.0)
_PHI2 = math.radians(49.0)
_LON0 = math.radians(3.0)
_X0 = 700000.0
_Y0 = 6600000.0

_E = GRS80.e
_A = GRS80.a


def _m(phi: float) -> float:
    s = math.sin(phi)
    return math.cos(phi) / math.sqrt(1.0 - GRS80.e2 * s * s)


def _t(phi: float) -> float:
    s = math.sin(phi)
    return math.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - _E * s) / (1.0 + _E * s)
    ) ** (_E / 2.0)


# Hoisted constants (true constant folding — SURVEY.md §4).
_N = (math.log(_m(_PHI1)) - math.log(_m(_PHI2))) / (
    math.log(_t(_PHI1)) - math.log(_t(_PHI2))
)
_F = _m(_PHI1) / (_N * _t(_PHI1) ** _N)
_R0 = _A * _F * _t(_PHI0) ** _N

_ITERS = 10  # matches reference iteration budget (lambert.rs:96-108)


def lambert93_to_wgs84(x, y):
    """(x, y) Lambert-93 meters -> (lon_deg, lat_deg). Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dx = x - _X0
    dy = _R0 - (y - _Y0)
    # sqrt(dx^2+dy^2) instead of np.hypot: same value to ~1 ulp, and
    # exactly reproducible in ANSI SQL (the DuckDB oracle unrolls this
    # whole inverse — hypot has no SQL twin with matching bits)
    rho = np.sign(_N) * np.sqrt(dx * dx + dy * dy)
    theta = np.arctan2(dx, dy)
    lon = theta / _N + _LON0
    t = (rho / (_A * _F)) ** (1.0 / _N)
    # iterative latitude recovery (isometric latitude inversion)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(_ITERS):
        s = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_E / 2.0)
        )
    return np.degrees(lon), np.degrees(phi)


def wgs84_to_lambert93(lon_deg, lat_deg):
    """(lon, lat) degrees -> (x, y) Lambert-93 meters. Vectorized forward."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(lat)
    t = np.tan(np.pi / 4.0 - lat / 2.0) / ((1.0 - _E * s) / (1.0 + _E * s)) ** (
        _E / 2.0
    )
    rho = _A * _F * t**_N
    theta = _N * (lon - _LON0)
    x = _X0 + rho * np.sin(theta)
    y = _Y0 + _R0 - rho * np.cos(theta)
    return x, y
