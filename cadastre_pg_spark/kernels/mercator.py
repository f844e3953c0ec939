"""Spherical Web Mercator (EPSG:3857) forward/inverse, vectorized.

Semantics follow cadastre-pg/src/reproject_lite/mercator.rs:11-39
(lat clamped to ±85.05113°). Also the planar base of the cell codecs.
"""

import math

import numpy as np

R = 6378137.0
MAX_LAT = 85.05112877980659
EXTENT = math.pi * R  # half-width of the mercator square


def wgs84_to_mercator(lon_deg, lat_deg):
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_wgs84(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat
