"""Coordinate reference system transforms: WGS84 (EPSG:4326) <-> British
National Grid (EPSG:27700, OSGB36 / Transverse Mercator).

Pure-numpy, fully vectorized implementation of the standard Ordnance Survey
formulas ("A guide to coordinate systems in Great Britain", OS, public) plus
the 7-parameter Helmert datum shift between WGS84 and OSGB36 (the same
transform pyproj applies for EPSG:27700 when no OSTN15 grid is installed).

Replaces the reference's pyproj usage (``/root/reference/geocode/utilities.py:335-391``
``bng2latlon`` / ``latlon2bng``) with batch-level numpy so it can run inside
Arrow-vectorized pandas UDFs with no per-row Python.

All functions take/return numpy arrays (float64) and are safe for NaN input
(NaN propagates).
"""

from __future__ import annotations

import numpy as np

# --- Ellipsoid constants -----------------------------------------------------
# Airy 1830 (OSGB36)
AIRY_A = 6377563.396
AIRY_B = 6356256.909
# GRS80 / WGS84
WGS_A = 6378137.000
WGS_B = 6356752.3141

# Transverse Mercator projection constants for the National Grid
TM_F0 = 0.9996012717          # scale factor on central meridian
TM_LAT0 = np.deg2rad(49.0)    # true origin latitude
TM_LON0 = np.deg2rad(-2.0)    # true origin longitude
TM_E0 = 400000.0              # false easting
TM_N0 = -100000.0             # false northing

# Helmert transform WGS84 -> OSGB36 (OS small-angle 7-parameter, units: m, ppm, arcsec)
HELMERT_TX = -446.448
HELMERT_TY = 125.157
HELMERT_TZ = -542.060
HELMERT_S = 20.4894e-6  # scale ppm -> absolute
HELMERT_RX = np.deg2rad(-0.1502 / 3600.0)
HELMERT_RY = np.deg2rad(-0.2470 / 3600.0)
HELMERT_RZ = np.deg2rad(-0.8421 / 3600.0)


def _ecc2(a: float, b: float) -> float:
    return (a * a - b * b) / (a * a)


def _geodetic_to_cartesian(lat, lon, a, b):
    e2 = _ecc2(a, b)
    sin_lat = np.sin(lat)
    nu = a / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
    x = nu * np.cos(lat) * np.cos(lon)
    y = nu * np.cos(lat) * np.sin(lon)
    z = (1.0 - e2) * nu * sin_lat
    return x, y, z


def _cartesian_to_geodetic(x, y, z, a, b):
    e2 = _ecc2(a, b)
    p = np.sqrt(x * x + y * y)
    lon = np.arctan2(y, x)
    lat = np.arctan2(z, p * (1.0 - e2))
    # iterate (converges to << 1e-12 rad in a handful of rounds)
    for _ in range(8):
        sin_lat = np.sin(lat)
        nu = a / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
        lat = np.arctan2(z + e2 * nu * sin_lat, p)
    return lat, lon


def _helmert(x, y, z, tx, ty, tz, s, rx, ry, rz):
    sp1 = 1.0 + s
    x2 = tx + sp1 * x - rz * y + ry * z
    y2 = ty + rz * x + sp1 * y - rx * z
    z2 = tz - ry * x + rx * y + sp1 * z
    return x2, y2, z2


def _wgs84_to_osgb36(lat, lon):
    x, y, z = _geodetic_to_cartesian(lat, lon, WGS_A, WGS_B)
    x, y, z = _helmert(
        x, y, z, HELMERT_TX, HELMERT_TY, HELMERT_TZ,
        HELMERT_S, HELMERT_RX, HELMERT_RY, HELMERT_RZ,
    )
    return _cartesian_to_geodetic(x, y, z, AIRY_A, AIRY_B)


def _osgb36_to_wgs84(lat, lon):
    x, y, z = _geodetic_to_cartesian(lat, lon, AIRY_A, AIRY_B)
    # inverse Helmert: negate parameters (small-angle approximation, exact to
    # the accuracy class of the transform itself)
    x, y, z = _helmert(
        x, y, z, -HELMERT_TX, -HELMERT_TY, -HELMERT_TZ,
        -HELMERT_S, -HELMERT_RX, -HELMERT_RY, -HELMERT_RZ,
    )
    return _cartesian_to_geodetic(x, y, z, WGS_A, WGS_B)


def _tm_meridional_arc(lat):
    """OS meridional arc M for the Airy ellipsoid."""
    a, b = AIRY_A, AIRY_B
    n = (a - b) / (a + b)
    n2, n3 = n * n, n * n * n
    dlat = lat - TM_LAT0
    slat = lat + TM_LAT0
    m = (1.0 + n + 1.25 * n2 + 1.25 * n3) * dlat
    m -= (3.0 * n + 3.0 * n2 + (21.0 / 8.0) * n3) * np.sin(dlat) * np.cos(slat)
    m += ((15.0 / 8.0) * (n2 + n3)) * np.sin(2.0 * dlat) * np.cos(2.0 * slat)
    m -= (35.0 / 24.0) * n3 * np.sin(3.0 * dlat) * np.cos(3.0 * slat)
    return b * TM_F0 * m


def _osgb36_to_en(lat, lon):
    """Project OSGB36 geodetic -> National Grid eastings/northings."""
    a = AIRY_A
    e2 = _ecc2(AIRY_A, AIRY_B)
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    tan_lat = np.tan(lat)
    nu = a * TM_F0 / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
    rho = a * TM_F0 * (1.0 - e2) * (1.0 - e2 * sin_lat * sin_lat) ** -1.5
    eta2 = nu / rho - 1.0

    m = _tm_meridional_arc(lat)
    I = m + TM_N0
    II = (nu / 2.0) * sin_lat * cos_lat
    III = (nu / 24.0) * sin_lat * cos_lat**3 * (5.0 - tan_lat**2 + 9.0 * eta2)
    IIIA = (nu / 720.0) * sin_lat * cos_lat**5 * (61.0 - 58.0 * tan_lat**2 + tan_lat**4)
    IV = nu * cos_lat
    V = (nu / 6.0) * cos_lat**3 * (nu / rho - tan_lat**2)
    VI = (nu / 120.0) * cos_lat**5 * (
        5.0 - 18.0 * tan_lat**2 + tan_lat**4 + 14.0 * eta2 - 58.0 * tan_lat**2 * eta2
    )
    dl = lon - TM_LON0
    northing = I + II * dl**2 + III * dl**4 + IIIA * dl**6
    easting = TM_E0 + IV * dl + V * dl**3 + VI * dl**5
    return easting, northing


def _en_to_osgb36(easting, northing):
    """Unproject National Grid eastings/northings -> OSGB36 geodetic."""
    a = AIRY_A
    e2 = _ecc2(AIRY_A, AIRY_B)
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)

    lat = TM_LAT0 + (northing - TM_N0) / (a * TM_F0)
    # iterate M to convergence
    for _ in range(10):
        m = _tm_meridional_arc(lat)
        lat = lat + (northing - TM_N0 - m) / (a * TM_F0)

    sin_lat = np.sin(lat)
    tan_lat = np.tan(lat)
    sec_lat = 1.0 / np.cos(lat)
    nu = a * TM_F0 / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
    rho = a * TM_F0 * (1.0 - e2) * (1.0 - e2 * sin_lat * sin_lat) ** -1.5
    eta2 = nu / rho - 1.0

    VII = tan_lat / (2.0 * rho * nu)
    VIII = tan_lat / (24.0 * rho * nu**3) * (5.0 + 3.0 * tan_lat**2 + eta2 - 9.0 * tan_lat**2 * eta2)
    IX = tan_lat / (720.0 * rho * nu**5) * (61.0 + 90.0 * tan_lat**2 + 45.0 * tan_lat**4)
    X = sec_lat / nu
    XI = sec_lat / (6.0 * nu**3) * (nu / rho + 2.0 * tan_lat**2)
    XII = sec_lat / (120.0 * nu**5) * (5.0 + 28.0 * tan_lat**2 + 24.0 * tan_lat**4)
    XIIA = sec_lat / (5040.0 * nu**7) * (
        61.0 + 662.0 * tan_lat**2 + 1320.0 * tan_lat**4 + 720.0 * tan_lat**6
    )
    de = easting - TM_E0
    lat_out = lat - VII * de**2 + VIII * de**4 - IX * de**6
    lon_out = TM_LON0 + X * de - XI * de**3 + XII * de**5 - XIIA * de**7
    return lat_out, lon_out


# --- Public API (mirrors utilities.py:335-391 signatures, numpy batch) -------

def bng_to_latlon(eastings: np.ndarray, northings: np.ndarray):
    """E/N (EPSG:27700) -> (lats, lons) in WGS84. Vectorized."""
    eastings = np.asarray(eastings, dtype=np.float64)
    northings = np.asarray(northings, dtype=np.float64)
    lat36, lon36 = _en_to_osgb36(eastings, northings)
    lat, lon = _osgb36_to_wgs84(lat36, lon36)
    return np.rad2deg(lat), np.rad2deg(lon)


def latlon_to_bng(lats: np.ndarray, lons: np.ndarray):
    """WGS84 (lats, lons) -> (eastings, northings) in EPSG:27700. Vectorized."""
    lat = np.deg2rad(np.asarray(lats, dtype=np.float64))
    lon = np.deg2rad(np.asarray(lons, dtype=np.float64))
    lat36, lon36 = _wgs84_to_osgb36(lat, lon)
    return _osgb36_to_en(lat36, lon36)
