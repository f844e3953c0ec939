"""Projection dispatch (reference: reproject_lite/smart.rs:24-74) and the
EPSG name->code map (edigeo/src/parser/geo.rs:9-25).

`reproject(x, y, src, dst)` is Identity when src==dst, uses the pure
kernels when (src in LITE_SOURCES and dst in {4326, 3857}), else raises
— exactly the reference's dispatch ladder, minus the libproj fallback
(reproject.rs:21-141) which the supported domain makes unnecessary.
"""

import numpy as np

from .lambert import lambert93_to_wgs84
from .mercator import wgs84_to_mercator
from .utm import UTM_ZONES, utm_to_wgs84

# EDIGEO projection-name -> EPSG (geo.rs:9-25)
NAME_TO_EPSG = {
    "LAMB93": 2154,
    "RGF93CC42": 3942,
    "RGF93CC43": 3943,
    "RGF93CC44": 3944,
    "RGF93CC45": 3945,
    "RGF93CC46": 3946,
    "RGF93CC47": 3947,
    "RGF93CC48": 3948,
    "RGF93CC49": 3949,
    "RGF93CC50": 3950,
    "GUAD48UTM20": 32620,
    "MART38UTM20": 32620,
    "UTM22RGFG95": 32622,
    "RGM04UTM38S": 32738,
    "RGR92UTM40S": 32740,
}

LITE_SOURCES = frozenset({2154}) | frozenset(UTM_ZONES)
LITE_TARGETS = frozenset({4326, 3857})


class UnsupportedProjection(ValueError):
    pass


def reproject(x, y, src_epsg: int, dst_epsg: int):
    """Vectorized coordinate transform. Returns (x', y') float64 arrays."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if src_epsg == dst_epsg:
        return x, y
    if src_epsg not in LITE_SOURCES or dst_epsg not in LITE_TARGETS:
        raise UnsupportedProjection(f"{src_epsg} -> {dst_epsg} not supported")
    if src_epsg == 2154:
        lon, lat = lambert93_to_wgs84(x, y)
    else:
        lon, lat = utm_to_wgs84(x, y, src_epsg)
    if dst_epsg == 4326:
        return lon, lat
    return wgs84_to_mercator(lon, lat)


def round_coords(arr, decimals: int):
    """Coordinate rounding (reference cli.rs:864-910; default 7 for 4326,
    2 for metric SRIDs)."""
    return np.round(np.asarray(arr, dtype=np.float64), decimals)


def default_precision(epsg: int) -> int:
    return 7 if epsg == 4326 else 2
