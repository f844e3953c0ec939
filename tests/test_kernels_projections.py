"""Golden-oracle tests for the projection kernels (FIXTURES.md §4;
coordinates reused verbatim from the reference's unit tests —
lambert.rs:114-139, utm.rs:76-115, mercator.rs:41-68, smart.rs:77-98)."""

import numpy as np
import pytest

from cadastre_pg_spark.kernels.lambert import lambert93_to_wgs84, wgs84_to_lambert93
from cadastre_pg_spark.kernels.mercator import mercator_to_wgs84, wgs84_to_mercator
from cadastre_pg_spark.kernels.smart import (
    NAME_TO_EPSG,
    UnsupportedProjection,
    default_precision,
    reproject,
)
from cadastre_pg_spark.kernels.utm import utm_to_wgs84


def test_lambert93_paris():
    lon, lat = lambert93_to_wgs84([648237.0], [6862107.0])
    assert lon[0] == pytest.approx(2.2945, abs=0.01)
    assert lat[0] == pytest.approx(48.8584, abs=0.01)


def test_lambert93_marseille():
    lon, lat = lambert93_to_wgs84([893193.0], [6245829.0])
    assert lon[0] == pytest.approx(5.37, abs=0.1)
    assert lat[0] == pytest.approx(43.30, abs=0.1)


def test_lambert93_paris_2():
    lon, lat = lambert93_to_wgs84([652381.0], [6862047.0])
    assert lon[0] == pytest.approx(2.35, abs=0.1)
    assert lat[0] == pytest.approx(48.85, abs=0.1)


def test_lambert93_roundtrip():
    x, y = wgs84_to_lambert93([2.35, 5.37], [48.85, 43.30])
    lon, lat = lambert93_to_wgs84(x, y)
    np.testing.assert_allclose(lon, [2.35, 5.37], atol=1e-9)
    np.testing.assert_allclose(lat, [48.85, 43.30], atol=1e-9)


def test_utm_20n_martinique():
    lon, lat = utm_to_wgs84([708000.0], [1615000.0], 32620)
    assert lon[0] == pytest.approx(-61.07, abs=0.2)
    assert lat[0] == pytest.approx(14.60, abs=0.2)


def test_utm_40s_reunion():
    lon, lat = utm_to_wgs84([338000.0], [7691000.0], 32740)
    assert lon[0] == pytest.approx(55.45, abs=0.2)
    assert lat[0] == pytest.approx(-20.88, abs=0.2)


def test_utm_22n_guyane():
    lon, lat = utm_to_wgs84([352000.0], [546000.0], 32622)
    assert lon[0] == pytest.approx(-52.33, abs=0.2)
    assert lat[0] == pytest.approx(4.93, abs=0.2)


def test_mercator_paris_and_roundtrip():
    x, y = wgs84_to_mercator([2.35], [48.85])
    assert x[0] == pytest.approx(261600, rel=0.01)
    assert y[0] == pytest.approx(6250000, rel=0.01)
    lon, lat = mercator_to_wgs84(x, y)
    assert lon[0] == pytest.approx(2.35, abs=1e-9)
    assert lat[0] == pytest.approx(48.85, abs=1e-9)


def test_smart_dispatch():
    x, y = reproject([648237.0], [6862107.0], 2154, 4326)
    assert x[0] == pytest.approx(2.2945, abs=0.01)
    # identity
    x, y = reproject([1.0], [2.0], 4326, 4326)
    assert (x[0], y[0]) == (1.0, 2.0)
    with pytest.raises(UnsupportedProjection):
        reproject([0.0], [0.0], 9999, 4326)


def test_epsg_name_map():
    assert NAME_TO_EPSG["LAMB93"] == 2154
    assert NAME_TO_EPSG["RGM04UTM38S"] == 32738
    assert default_precision(4326) == 7
    assert default_precision(2154) == 2
