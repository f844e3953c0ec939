"""UTM inverse (Transverse Mercator, Krüger series) for the DOM zones the
reference supports: 20N (EPSG:32620), 22N (32622), 38S (32738), 40S (32740).

Semantics follow cadastre-pg/src/reproject_lite/utm.rs:14-74 (k0=0.9996,
FE=500000, FN=1e7 south), vectorized over NumPy arrays.

Golden oracles (FIXTURES.md §4): 20N (708000,1615000)->(-61.07,14.60)±0.2.
"""

import math

import numpy as np

from .ellipsoid import WGS84

_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0

_A = WGS84.a
_E2 = WGS84.e2
_EP2 = WGS84.ep2

_E1 = (1.0 - math.sqrt(1.0 - _E2)) / (1.0 + math.sqrt(1.0 - _E2))
_M_FACTOR = _A * (1.0 - _E2 / 4.0 - 3.0 * _E2**2 / 64.0 - 5.0 * _E2**3 / 256.0)

# epsg -> (zone central meridian deg, southern hemisphere)
UTM_ZONES = {
    32620: (-63.0, False),
    32622: (-51.0, False),
    32738: (45.0, True),
    32740: (57.0, True),
}


def utm_to_wgs84(x, y, epsg: int):
    """(easting, northing) in the given UTM zone -> (lon_deg, lat_deg)."""
    lon0_deg, south = UTM_ZONES[epsg]
    lon0 = math.radians(lon0_deg)
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64)
    if south:
        y = y - _FN_SOUTH
    m = y / _K0
    mu = m / _M_FACTOR
    phi1 = (
        mu
        + (3.0 * _E1 / 2.0 - 27.0 * _E1**3 / 32.0) * np.sin(2.0 * mu)
        + (21.0 * _E1**2 / 16.0 - 55.0 * _E1**4 / 32.0) * np.sin(4.0 * mu)
        + (151.0 * _E1**3 / 96.0) * np.sin(6.0 * mu)
        + (1097.0 * _E1**4 / 512.0) * np.sin(8.0 * mu)
    )
    sin1 = np.sin(phi1)
    cos1 = np.cos(phi1)
    tan1 = np.tan(phi1)
    c1 = _EP2 * cos1**2
    t1 = tan1**2
    n1 = _A / np.sqrt(1.0 - _E2 * sin1**2)
    r1 = _A * (1.0 - _E2) / (1.0 - _E2 * sin1**2) ** 1.5
    d = x / (n1 * _K0)
    lat = phi1 - (n1 * tan1 / r1) * (
        d**2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1**2 - 9.0 * _EP2) * d**4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1**2 - 252.0 * _EP2 - 3.0 * c1**2)
        * d**6
        / 720.0
    )
    lon = lon0 + (
        d
        - (1.0 + 2.0 * t1 + c1) * d**3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1**2 + 8.0 * _EP2 + 24.0 * t1**2)
        * d**5
        / 120.0
    ) / cos1
    return np.degrees(lon), np.degrees(lat)
